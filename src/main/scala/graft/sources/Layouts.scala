package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators (SURVEY §2.4): the two levers that decide
  * whether a 100 TB table is scanned or skipped.
  *
  *  - Partitioned writes: `partitionBy` lays data out as one directory
  *    per key value; a filter on the partition column prunes whole
  *    directories before any I/O (`PartitionFilters` in the scan node,
  *    asserted by LayoutsSpec).
  *  - Bucketed tables: both join sides pre-hashed into the same bucket
  *    count on the join key join WITHOUT a shuffle exchange (asserted
  *    by BucketingSpec) — the co-location strategy for repeated big
  *    fact-to-fact joins.
  */
object Layouts {

  private def tmpDir(kind: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_layout",
      s"${kind}_$tag")
    Files.createDirectories(p.getParent)
    p.toString
  }

  /** Where [[partitionedPrune]] lays out the partitioned copy (exposed
    * for the pruning plan assertion in LayoutsSpec). */
  def partitionedPath(d: String): String = tmpDir("orders_byyear", d)

  /** Write orders partitioned by order year, read back with a year
    * filter (pruned to one directory), aggregate per status. */
  def partitionedPrune(s: SparkSession, d: String): DataFrame = {
    val path = partitionedPath(d)
    Tables.orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(path)
    s.read.parquet(path)
      .filter(col("o_year") === 1997)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** Small-file compaction: a fragmented table (64 shards — the
    * many-writers aftermath every long-lived 100 TB table suffers) is
    * rewritten to a handful of right-sized files with one
    * `repartition`. The contract output proves rows survived and the
    * file count actually collapsed; at scale the same job runs per
    * partition-directory with `maxRecordsPerFile` bounding shard size. */
  def compaction(s: SparkSession, d: String): DataFrame = {
    val fragmented = tmpDir("orders_fragmented", d)
    val compacted = tmpDir("orders_compacted", d)
    val ord = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
    ord.repartition(64).write.mode(SaveMode.Overwrite).parquet(fragmented)
    s.read.parquet(fragmented)
      .repartition(4)
      .write.mode(SaveMode.Overwrite).parquet(compacted)
    def nFiles(p: String): Long =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    val before = nFiles(fragmented)
    val after = nFiles(compacted)
    s.read.parquet(compacted)
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .select(col("n_rows"), col("total"),
        lit(before > after).as("compacted"),
        lit(after <= 4).as("bounded"))
  }

  /** Per-file storage audit via the `_metadata` hidden column: rows
    * and key span per physical file — the operational probe that finds
    * skewed, runt, or overlapping files in a 100 TB table (file-level
    * min/max spans decide how well data skipping can work). Pure
    * metadata projection + one |files|-row aggregate; the oracle reads
    * the same files with DuckDB's `filename=true`. */
  def filesAudit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("_metadata.file_name").as("fname"), col("o_orderkey"))
      .groupBy(col("fname"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("fname"))

  /** Bucket orders and customer on the join key (8 buckets, external
    * tables so the files land under tmp, not the repo), join and
    * aggregate. The join itself is exchange-free — see BucketingSpec
    * for the plan assertion. */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    val ordT = s"graft_b_orders_$tag"
    val custT = s"graft_b_cust_$tag"
    Tables.orders(s, d).select("o_custkey", "o_totalprice")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", tmpDir(ordT, d))
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(ordT)
    Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", tmpDir(custT, d))
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(custT)
    s.table(ordT)
      .join(s.table(custT), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("c_mktsegment"))
  }

  /** Zone-map skipping audit over a TIME-CLUSTERED rewrite — the
    * third skipping lever beside directory pruning
    * ([[partitionedPrune]]) and bucketing: lineitem is rewritten
    * clustered into chronological 6-month zones (the sorted-write
    * layout a 100 TB fact table keeps for its time dimension), each
    * zone's min/max day span is read BACK from the written files (the
    * file-footer statistics a real zone map serves from), and a
    * 3-month predicate is audited span-vs-span: a zone is skippable
    * iff its span misses the predicate window. `n_match` per zone
    * proves skip soundness (skippable ⇒ 0 matching rows inside) — the
    * same guarantee parquet row-group skipping gives, surfaced as an
    * auditable result. The zone key is explicit integer arithmetic
    * (month-index div 6), so the layout is deterministic and the
    * oracle replays the audit from the source table. */
  /** Parquet footer-statistics audit: write a status-partitioned copy,
    * then read back ONLY the file footers (row counts + o_orderkey
    * min/max statistics per row group — no data pages touched) and
    * prove the metadata matches the data. This certifies exactly what
    * zone-map / row-group skipping trusts: that footer statistics are
    * sound. Footer reads are DISTRIBUTED (a Dataset of file paths
    * mapPartitions through ParquetFileReader — the driver only lists
    * the directory), so the audit scales to any file count; the
    * oracle replays the per-status census from the raw source. */
  def parquetFooterAudit(s: SparkSession, d: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val path = tmpDir("orders_footer", d)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode(SaveMode.Overwrite).partitionBy("o_orderstatus")
      .parquet(path)
    val fs = new Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(new Path(path + "/o_orderstatus=*/*.parquet"))
      .map(_.getPath.toString).toSeq
    import s.implicits._
    s.createDataset(files)
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(f), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val status = f.replaceAll(".*o_orderstatus=", "").split("/")(0)
            var rows = 0L
            var mn = Long.MaxValue
            var mx = Long.MinValue
            reader.getFooter.getBlocks.forEach { b =>
              rows += b.getRowCount
              b.getColumns.forEach { c =>
                if (c.getPath.toDotString == "o_orderkey") {
                  val st = c.getStatistics
                  mn = math.min(mn,
                    st.genericGetMin.asInstanceOf[java.lang.Long])
                  mx = math.max(mx,
                    st.genericGetMax.asInstanceOf[java.lang.Long])
                }
              }
            }
            (status, rows, mn, mx)
          } finally reader.close()
        }
      }
      .toDF("o_orderstatus", "rows", "mn", "mx")
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("rows")).as("footer_rows"),
        min(col("mn")).as("footer_min_key"),
        max(col("mx")).as("footer_max_key"))
      .orderBy(col("o_orderstatus"))
  }

  def zonemapPrune(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("lineitem_zones", d)
    val lo = "1996-01-01"
    val hi = "1996-06-30"
    Tables.lineitem(s, d)
      .select(to_date(col("l_shipdate")).as("day"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"))
      .withColumn("zone", expr(
        "CAST(((year(day) - 1995) * 12 + month(day) - 1) div 6 AS BIGINT)"))
      .write.mode(SaveMode.Overwrite).partitionBy("zone").parquet(path)
    s.read.parquet(path)
      // the partition column reads back as INT — re-widen so the
      // emitted schema matches the BIGINT zone key the oracle computes
      .withColumn("zone", col("zone").cast("long"))
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"),
        sum(when(col("day").between(lit(lo), lit(hi)), 1L).otherwise(0L))
          .as("n_match"),
        sum(col("pc")).as("price_checksum"))
      .withColumn("skippable",
        (col("max_day") < lit(lo) || col("min_day") > lit(hi)).cast("int"))
      .select(col("zone"), col("n_rows"), col("min_day"), col("max_day"),
        col("skippable"), col("n_match"), col("price_checksum"))
      .orderBy(col("zone"))
  }
}
