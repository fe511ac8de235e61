package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every driver-contract query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query gets one untimed warmup execution first (whole-stage
  * codegen compiles a class per stage; first execution pays JIT +
  * compilation, measured at 5-20x steady-state). The reported number is
  * the steady-state run — the figure that scales to a long-lived
  * cluster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 1 untimed warmup + best of 2 measured runs: the JIT pays off in
    // the warmup, and min-of-N filters multi-second host stalls that
    // otherwise land on random queries (observed 10x run-to-run noise).
    val results = SparkEntry.queries.map { case (name, fn) =>
      try { fn(spark, sfDir).count() }
      catch { case _: Throwable => () } // warmup; failure recorded below
      var failed = false
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => failed = true }
        (System.nanoTime() - t0) / 1e9
      }
      // a failing query reports -1, not its time-to-exception — the
      // bench JSON must carry an unambiguous failure signal
      // drop caches the query pinned (LSH signature/doc frames): the
      // accumulated storage would otherwise LRU-churn later timings
      spark.catalog.clearCache()
      name -> (if (failed) -1.0 else times.min)
    }
    val (ok, bad) = results.partition(_._2 >= 0)
    def fmt(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    val fails = bad.keys.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    // The driver captures only the LAST 2000 chars of stdout and sbt
    // appends its own "[success] ..." trailer, so a line carrying all
    // ~100 per-query times (~3000 chars) loses its opening brace and
    // never parses (BENCH_r01..r03 all have parsed:null). The stdout
    // line therefore carries a fixed headline subset — one per operator
    // family plus every historically slow query — and the full map goes
    // to BENCH_LAST.json (committed alongside the round snapshots).
    val headline = Seq(
      "q1_pricing", "q3_shipping", "q5_local_supplier", "q6_forecast",
      "q_window_topn", "q_topk_per_key", "q_asof_join", "q_range_join",
      "q_percentile", "q_corr_subquery", "q_bucketed_join",
      "shred_flatten", "shred_children", "assemble_nested",
      "json_roundtrip_count", "engine_save_get", "upsert",
      "stream_window", "stream_sessionize", "stream_join",
      "stream_watermark_append", "stream_upsert",
      "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
      "dedup_clusters", "dedup_clean", "dedup_keep_best",
      "ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk",
      "text_tfidf_top", "text_tokens", "multimodal_decode",
      "sink_compaction", "source_json_roundtrip")
    val head = results.filter { case (k, _) => headline.contains(k) }
    val stdoutLine =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","n_queries":${results.size},"queries":${fmt(head)},"failures":$fails,"sf":"$sfDir","full":"BENCH_LAST.json"}"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(results)},"failures":$fails,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LAST.json"), fullLine + "\n")
    spark.stop()
    // last line on stdout, after the SparkSession's shutdown chatter
    println(stdoutLine)
  }
}
