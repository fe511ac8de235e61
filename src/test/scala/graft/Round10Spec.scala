package graft

import org.apache.spark.sql.functions._

import graft.ops.{Mining, PipelineQueries}

/** Round-10 regressions: the bench stall-band rule (the r9 official
  * run's blind spot), the A-ES weighted reservoir, the approx-path
  * contract rows, and the post-filter streamScd2Build guard. */
class Round10Spec extends SparkSuite {

  test("band rule flags the both-runs-slow stall min-of-2 trusts") {
    // BENCH_r09 replay: source_orc_roundtrip ran raw [45.4, 24.0] —
    // the run-disagreement rule saw ratio <3x and stayed silent while
    // the isolated reference is 0.51s. The band rule must flag it.
    val band = Map("source_orc_roundtrip" -> 0.51, "q_weighted_median" -> 1.13,
      "type_infer" -> 0.05, "q_topk_global" -> 0.15)
    val best = Map(
      "source_orc_roundtrip" -> 24.0, // stall spanning both runs
      "q_weighted_median" -> 1.30,    // within band: no flag
      "type_infer" -> 0.20,           // >3x but <0.5s absolute: no flag
      "q_topk_global" -> -1.0,        // failure sentinel: never flagged
      "brand_new_key" -> 9.9)         // no band yet: no flag
    assert(Bench.bandStallFlags(best, band) == Seq("source_orc_roundtrip"))
    assert(Bench.bandStallFlags(best, Map.empty).isEmpty)
  }

  test("parseBand reads the flat committed band file") {
    val m = Bench.parseBand(
      """{"q1_pricing":0.123,"q_ewma":1.5e-1,"stream_topk":2.0}""")
    assert(m == Map("q1_pricing" -> 0.123, "q_ewma" -> 0.15,
      "stream_topk" -> 2.0))
  }

  test("weighted reservoir equals the A-ES reference draw") {
    // independent JVM replay of the exponential race: same portable
    // uniform, same key, smallest-50 by (key, doc_id)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0)
    val expected = docs.map { case (id, w) =>
      val h = graft.functions.Kernels.md5Lower64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$id:wr")) &
        ((1L << 50) - 1)
      val u = (h + 1).toDouble / 1125899906842624.0
      (-math.log(u) / w, id, w)
    }.sortBy(t => (t._1, t._2)).take(50)
    val got = PipelineQueries.sampleWeightedReservoir(spark, sf).collect()
    assert(got.length == 50)
    got.zip(expected).zipWithIndex.foreach { case ((row, (k, id, w)), i) =>
      assert(row.getLong(0) == i + 1L)
      assert(row.getLong(1) == id, s"rank ${i + 1} picked wrong doc")
      assert(row.getLong(2) == w)
      assert(row.getLong(3) == math.floor(k * 1e12 + 0.5).toLong)
    }
    // weighting sanity: the draw must skew long — selected docs are
    // on average longer than the corpus
    val meanSel = expected.map(_._3).sum.toDouble / expected.length
    val meanAll = docs.map(_._2).sum.toDouble / docs.length
    assert(meanSel > meanAll, "weighted draw did not favor long docs")
  }

  test("approx contract rows hold their error bounds") {
    Mining.qAnomalyMadApprox(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(r.fieldIndex("med_within_1pct")))
      assert(r.getBoolean(r.fieldIndex("mad_within_1pct")))
      assert(r.getBoolean(r.fieldIndex("outliers_within_tol")))
    }
    Mining.qQuantileHistApprox(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(r.fieldIndex("p50_within_1pct")))
      assert(r.getBoolean(r.fieldIndex("p99_within_1pct")))
    }
  }

  test("stream SCD2 converges to the batch build under the new guard") {
    val batch = graft.ops.Analytics.qScd2Build(spark, sf).collect().toSeq
    val stream = graft.streaming.Events.streamScd2Build(spark, sf)
      .collect().toSeq
    assert(stream == batch, "stream/batch SCD2 parity broke")
  }
}
