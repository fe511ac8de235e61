package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table registry for the TPC-H-ish test schema plus the
  * documents/embeddings corpus tables.
  *
  * Reads go through `spark.read.parquet` so Catalyst handles column
  * pruning and predicate pushdown; callers select only the columns they
  * need and keep filters as plain comparisons so they reach the scan
  * (`PushedFilters` in explain output).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Type-adaptive events loader — the canonical `ts` contract. The
    * testdata's `ts` has shipped both as TIMESTAMP(NANOS) (which, under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, arrives as Long
    * nanoseconds) and as plain timestamp[us] (TIMESTAMP_NTZ); no
    * consumer may assume either shape. This maps both to a single
    * TimestampType (µs, session-TZ UTC) column so downstream code can
    * use `unix_timestamp`/`unix_micros`/`window` uniformly. The
    * streaming twin is `graft.streaming.Events.withEventTs`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(s, d, "events")
    // integer division (`div`), not `/`: Long `/` is double division in
    // Spark SQL, and ns epochs (~1.7e18) exceed double's 2^53 integer
    // precision — a ±1 µs drift that can flip floor-second boundaries
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      // NTZ → LTZ under the UTC session timezone is value-preserving;
      // some functions (unix_micros) reject TIMESTAMP_NTZ outright
      raw.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
