package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configs this engine expects.
  *
  * Local testing runs `local[32]` in one JVM; on a real cluster the
  * master/memory settings come from spark-submit and only the SQL knobs
  * below apply. AQE is on so 100 TB runs re-plan shuffles at runtime
  * (coalescing small partitions, splitting skewed ones).
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // the events table stores TIMESTAMP(NANOS) which Spark's parquet
      // reader rejects; read as raw Long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // classic (non-ANSI) semantics: MinHash/SimHash/rolling-hash use
      // deliberate 64-bit wrap-around multiplication
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")

  /** Local session for tests: N threads, shuffle partitions sized to match. */
  def local(threads: Int = 4): SparkSession = {
    val s = builder("graft-local")
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
