package graft.util

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for kernel-heavy map stages (r17, guide §2.5
  * "input skew" / §6): the fixture tables are single-file,
  * single-row-group parquet, so every scan yields ONE partition and the
  * per-row kernel work upstream of the first exchange (shingling,
  * minhash, codecs, window hashing) runs on ONE core — the measured
  * reason the whole suite looked fixed-overhead-bound at sf0.1 (32c vs
  * 8c ratio ≈ 1.01). `widen` round-robins the rows across the session's
  * default parallelism ONLY when the frame has fewer partitions — at
  * production scale the scan already yields thousands of splits, so the
  * gate makes this a structural no-op there (no always-on corpus
  * shuffle is introduced; the condition is data-layout-adaptive, not
  * fixture-tuned). Call it on a narrow projection (id + payload about
  * to enter the kernel), never above a pushable filter.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
