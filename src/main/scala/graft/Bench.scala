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
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fails = bad.keys.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fails,"sf":"$sfDir"}"""
    // sbt log noise buried the r01 JSON line (BENCH_r01 parsed:null) —
    // also persist it to a file so the driver can always recover it
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LAST.json"), line + "\n")
    spark.stop()
    // last line on stdout, after the SparkSession's shutdown chatter
    println(line)
  }
}
