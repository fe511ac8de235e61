package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Isolated document-kernel throughput (the r1 kernel-audit protocol,
  * re-run on demand): times the EXACT per-doc map work
  * `stream_dedup_minhash` does in flight — 3-token shingles → 64-perm
  * MinHash signature → 8 band keys — on one core (local[1]), no
  * shuffle, no stream harness, no state store. The printed docs/s/core
  * is the number that scales: a 1000-core crawl ingests ~docs/s/core ×
  * 1000. Compare it against the end-to-end `stream_rates` figure to
  * see how much of the stream number is fixed micro-batch machinery
  * vs kernel-bound work.
  *
  * Usage: sbt "runMain graft.tools.KernelBench [sfDir] [reps]"
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.builder("graft-kernel-bench")
      .master("local[1]")
      .config("spark.sql.shuffle.partitions", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.exprs
    // materialize the text column once so reps time the kernel, not
    // parquet decode
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val nDocs = docs.count()
    def kernelPass(): Long = docs
      .select(explode(graft.dedup.MinHashLSH.bandKeys(
        exprs.minhashSigs(exprs.shingles(col("text"), 3), 64))).as("b"))
      .selectExpr("sum(b.bh) AS s").head.getLong(0)
    kernelPass() // warmup: JIT + codegen compile
    val t0 = System.nanoTime()
    var sink = 0L
    (1 to reps).foreach(_ => sink ^= kernelPass())
    val sec = (System.nanoTime() - t0) / 1e9
    val docsPerSec = nDocs * reps / sec
    val usPerDoc = sec * 1e6 / (nDocs * reps)
    // the fused batch-signature path (MinHashLSH.signatures): no
    // shingle materialization — same band keys, same checksum
    def fusedPass(): Long = docs
      .select(explode(graft.dedup.MinHashLSH.bandKeys(
        exprs.minhashDoc(col("text"), 3, 64))).as("b"))
      .selectExpr("sum(b.bh) AS s").head.getLong(0)
    fusedPass()
    val t1 = System.nanoTime()
    var sink2 = 0L
    (1 to reps).foreach(_ => sink2 ^= fusedPass())
    val fsec = (System.nanoTime() - t1) / 1e9
    spark.stop()
    println(f"""{"metric":"minhash_kernel","docs":$nDocs,"reps":$reps,"sec":$sec%.3f,"docs_per_sec_core":$docsPerSec%.0f,"us_per_doc":$usPerDoc%.1f,"checksum":$sink,"fused_sec":$fsec%.3f,"fused_docs_per_sec_core":${nDocs * reps / fsec}%.0f,"fused_us_per_doc":${fsec * 1e6 / (nDocs * reps)}%.1f,"fused_checksum":$sink2}""")
  }
}
