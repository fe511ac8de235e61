package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** High-level corpus cleaning: the one-call API a training-data
  * pipeline uses (SURVEY §2.3).
  *
  * Two passes, cheapest first:
  *  1. exact/canonical dedup on the fingerprint (hash groupBy — this
  *     also absorbs the boilerplate clusters that would blow up LSH
  *     buckets);
  *  2. MinHash-LSH near-dup candidates above `minSim`, resolved to
  *     keepers via connected components.
  * Returns the corpus with duplicates dropped (smallest doc_id of each
  * cluster survives).
  */
object Dedup {

  /** `precomputedPairs`: an already-verified near-dup pair frame
    * (`id_a`/`id_b`, true Jaccard ≥ minSim) over the SAME corpus, if
    * one exists. Band collisions are a per-pair property of the two
    * signatures, so the full-corpus pair set restricted to pass-1
    * survivors IS the survivor pair set — a caller that has already
    * paid the shingle→minhash→band→verify pipeline (e.g. the clusters
    * query) lets pass 2 become a semi-join filter instead of a second
    * full pipeline. */
  def clean(spark: SparkSession, docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minSim: Double = 0.5,
      precomputedPairs: Option[DataFrame] = None): DataFrame = {
    // pass 1: canonical-form exact dedup. Cached: the survivor frame is
    // read four times downstream (signatures, both verify sides, the
    // final anti-join) — without the cache each read re-pays the
    // fingerprint groupBy + semi-join (measured as the r4 bench
    // doubling once inter-query cache reuse went away).
    val withFp = docs.withColumn("_fp", TextOps.fingerprint(col(textCol)))
    val keepIds = withFp.groupBy(col("_fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val exactKept = docs.join(keepIds, Seq(idCol), "left_semi").cache()

    // pass 2: near-dup clusters among the survivors — LSH candidates
    // verified against exact Jaccard, so the removal threshold acts on
    // TRUE similarity, not the minhash estimate
    val pairs = precomputedPairs match {
      case Some(p) =>
        p.join(keepIds.withColumnRenamed(idCol, "id_a"), Seq("id_a"),
            "left_semi")
          .join(keepIds.withColumnRenamed(idCol, "id_b"), Seq("id_b"),
            "left_semi")
      case None =>
        MinHashLSH.verifiedPairs(exactKept, idCol, textCol, minSim)
    }
    val losers = Components.keepers(pairs)
      .filter(col("id") =!= col("keeper"))
      .select(col("id").as(idCol))
    exactKept.join(losers, Seq(idCol), "left_anti")
  }
}
