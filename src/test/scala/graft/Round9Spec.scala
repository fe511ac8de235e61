package graft

import org.apache.spark.sql.functions._

import graft.ops.PipelineQueries
import graft.streaming.Events

/** Round-9 regressions. The short-doc corpus exercises the case the
  * shared sf testdata never does: documents with <3 tokens have EMPTY
  * shingle sets, which (a) must not form a mega-bucket in the band
  * index (every empty signature shares every band key) and (b) must
  * not produce 0/0 = NaN Jaccard "near" verdicts — nan-safe `>=`
  * treats NaN as greater than any number. Batch dedupIncremental was
  * always safe (its exact path is an md5 join and its near path
  * filters empty shingles); the streaming twin must stay in parity. */
class Round9Spec extends SparkSuite {

  test("stream minhash dedup matches batch on a short-doc corpus") {
    import spark.implicits._
    val long3 = "the quick brown fox jumps over the lazy dog " +
      "then sits down by the river and waits for the evening train"
    val docs = Seq(
      // batch side (doc_id % 5 == 0)
      0L -> "hi",                      // short, unique
      5L -> "yo",                      // short, exact dup of old 1
      10L -> long3,                    // exact dup of old 3
      15L -> (long3 + " forever"),     // near dup of old 3
      20L -> "completely different words about gardening tools here today",
      // corpus side
      1L -> "yo",                      // short
      2L -> "ab",                      // short
      3L -> long3,
      4L -> "unrelated essay on the economics of medieval trade routes",
      6L -> "cd",                      // short
      7L -> "another unrelated note regarding astronomy and small comets"
    ).toDF("doc_id", "text")
    val dir = graft.util.Scratch.dir("graft_r9_shortdoc").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val batch = PipelineQueries.dedupIncremental(spark, dir).collect().toSeq
    val stream = Events.streamDedupMinhash(spark, dir).collect().toSeq
    assert(stream == batch, "stream/batch dedup parity broke on short docs")

    val verdicts = stream.map(r =>
      r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(verdicts(0L) == ("unique", -1L))
    assert(verdicts(5L) == ("exact", 1L))
    assert(verdicts(10L) == ("exact", 3L))
    assert(verdicts(15L)._1 == "near")
    assert(verdicts(20L) == ("unique", -1L))
  }

  test("rank-free globalScan skips rank bookkeeping; windows stay bounded") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    import graft.ops.Ranks
    import graft.sources.Tables
    val per = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val df = Ranks.globalScan(per,
      Seq(col("cents").asc, col("o_orderkey").asc),
      sums = Seq(col("cents") -> "cum"))
    val plan = df.queryExecution.optimizedPlan
    // sums-only scans must not pay the rank bookkeeping (per-range
    // counts/min-id and the _offN broadcast column)
    val planStr = plan.toString
    assert(!planStr.contains("_offN") && !planStr.contains("_mn"),
      "rank bookkeeping leaked into a sums-only globalScan")
    // the ONLY unpartitioned window allowed is over the |partitions|-row
    // offsets frame (identified by its _pid grouping key) — never over
    // a data-scaled frame
    plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
      .foreach { w =>
        assert(w.child.output.exists(_.name == "_pid"),
          s"unpartitioned window over a data-scaled frame:\n$w")
      }
    // and the scan itself is correct vs the window formulation
    val got = df.select(col("o_orderkey"), col("cum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cents").asc, col("o_orderkey").asc)
      .rowsBetween(Long.MinValue, 0)
    val want = per.withColumn("cum", sum(col("cents")).over(w))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want)
  }
}
