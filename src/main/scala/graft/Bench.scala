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
  /** Parse `{"key": sec, ...}` without a JSON lib (the band file is
    * flat — written by tools/, read here and by the judge). */
  private[graft] def parseBand(txt: String): Map[String, Double] =
    """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  /** Band rule (r9 verdict #1): a key is stall-flagged when its MIN —
    * the value min-of-2 would otherwise trust — exceeds 3x its
    * committed isolated reference AND by >0.5s absolute. Catches the
    * both-runs-slow stall the run-disagreement rule is blind to
    * (BENCH_r09: source_orc_roundtrip raw [45.4, 24.0] vs 0.51s
    * isolated — unflagged then, flagged by this). */
  private[graft] def bandStallFlags(best: Map[String, Double],
      band: Map[String, Double]): Seq[String] =
    best.collect {
      case (k, t) if t > 0 && band.get(k).exists(b =>
        t > 3.0 * b && t - b > 0.5) => k
    }.toSeq

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    // ERROR, not WARN: the end-of-run state-store/checkpoint WARN spam
    // (ChecksumCheckpointFileManager etc.) lands in the same 2000-char
    // stdout tail the driver parses and has pushed the JSON line out of
    // the window for four straight rounds (BENCH_r01..r04 parsed:null).
    spark.sparkContext.setLogLevel("ERROR")
    // 1 untimed warmup + best of 2 measured runs: the JIT pays off in
    // the warmup, and min-of-N filters multi-second host stalls that
    // otherwise land on random queries (observed 10x run-to-run noise).
    // SPARK_GRAFT_ONLY=q1,q2 times a subset for local iteration; the
    // driver never sets it, so per-round benches always run everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val starts = scala.collection.mutable.Map[String, Seq[Double]]()
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      try { fn(spark, sfDir).count() }
      catch { case _: Throwable => () } // warmup; failure recorded below
      var failed = false
      // wall-clock start stamp per measurement: a host-stall window is
      // identifiable post-hoc by lining flagged keys' starts against it
      val measured = (1 to 2).map { _ =>
        val wall = System.currentTimeMillis() / 1000.0
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => failed = true }
        ((System.nanoTime() - t0) / 1e9, wall)
      }
      val times = measured.map(_._1)
      starts(name) = measured.map(_._2)
      // a failing query reports -1, not its time-to-exception — the
      // bench JSON must carry an unambiguous failure signal
      // drop caches the query pinned (LSH signature/doc frames): the
      // accumulated storage would otherwise LRU-churn later timings
      spark.catalog.clearCache()
      name -> (if (failed) Seq(-1.0) else times)
    }
    val best = results.map { case (k, ts) => k -> ts.min }
    // Host stalls are real on this box (multi-second freezes landing on
    // random queries — r8's official run inflated 10-40x on untouched
    // codegen'd scans). min-of-2 already filters ONE stall per query;
    // this makes a residual polluted run machine-detectable: both raw
    // timings are recorded, and a key is stall-flagged when the two
    // runs disagree >3x AND by >0.5s absolute (so µs-scale jitter on
    // trivial queries doesn't flag).
    val disagree = results.collect {
      case (k, ts) if ts.min > 0 && ts.max / ts.min > 3.0 &&
        ts.max - ts.min > 0.5 => k
    }.toSeq
    // Blind spot closed (r9 verdict #1): BENCH_BAND.json commits each
    // key's isolated reference min; see bandStallFlags. Band misses
    // (new keys) simply don't band-flag until the band is reseeded.
    val band: Map[String, Double] = {
      val p = java.nio.file.Paths.get("BENCH_BAND.json")
      if (java.nio.file.Files.exists(p))
        parseBand(java.nio.file.Files.readString(p))
      else Map.empty
    }
    val stalls = (disagree ++ bandStallFlags(best.toMap, band))
      .distinct.sorted
    val (ok, bad) = best.partition(_._2 >= 0)
    def fmt(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    val fails = bad.keys.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    // The driver captures only the LAST 2000 chars of stdout and sbt
    // appends its own "[success] ..." trailer. Rounds 1-4 all ended with
    // parsed:null because anything sharing that window (per-query maps,
    // shutdown WARN spam) pushes the opening brace out. So: the stdout
    // line is MINIMAL (~140 chars, no per-query map), printed after
    // spark.stop(), with the root log level at ERROR; the full
    // per-query map goes to BENCH_LAST.json (committed per round).
    val stallsJson = stalls.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Subset runs (SPARK_GRAFT_ONLY, local iteration only) must not
    // clobber the committed full per-round record — they land in an
    // uncommitted sibling instead (r9 ADVICE).
    val outFile = if (only.isDefined) "BENCH_SUBSET.json" else "BENCH_LAST.json"
    val stdoutLine =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","n_queries":${results.size},"failures":$fails,"stall_flags":$stallsJson,"full":"$outFile"}"""
    // per-stream input-rate probe: end-to-end seconds hide state-store
    // regressions behind ~1 s of fixed micro-batch machinery; rows/s
    // from each query's own progress makes them visible round-to-round
    val streamRates = graft.streaming.StreamMeter.ratesJson
    val rawJson = results
      .map { case (k, ts) =>
        "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val startsJson = results.keys
      .map { k =>
        "\"" + k + "\":" + starts.getOrElse(k, Seq.empty)
          .map(t => f"$t%.1f").mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(best)},"raw_times":$rawJson,"start_epochs":$startsJson,"stall_flags":$stallsJson,"failures":$fails,"stream_rates":$streamRates,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), fullLine + "\n")
    spark.stop()
    // last line on stdout, after the SparkSession's shutdown chatter
    println(stdoutLine)
  }
}
