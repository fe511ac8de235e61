package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor (SURVEY §2.3).
  *
  * Coarse quantizer: k-means over a bounded sample of the corpus. Each
  * corpus vector lands in one cell; a query probes its `nProbe` nearest
  * cells and ranks only those vectors — |corpus|·nProbe/k work instead
  * of |corpus| per query. The cell assignment is one narrow map
  * (centroids are a driver-side constant folded into the plan), the
  * probe join is an equi-join on cell id: both scale linearly at
  * 100 TB, and the cell table is the natural unit for partition
  * pruning (partition the corpus by cell on disk).
  *
  * The quantizer is a MODEL, not part of the query: `fit` trains once
  * on a hash-spread sample capped at `maxSample` vectors (never the
  * full corpus — at scale that would bury an ML training job inside
  * every query), and `topK(..., model)` reuses it across query
  * batches. The sample is deterministic (hash filter + early-
  * terminating limit), so centroids are reproducible run to run.
  */
object Ivf {

  /** Trained coarse quantizer: k cell centroids. */
  case class IvfModel(centroids: Array[Array[Double]])

  /** Train the coarse quantizer on a bounded sample: a cheap hash
    * filter spreads the picks across the corpus and the limit
    * early-terminates the scan at `maxSample` vectors. If the filter
    * leaves fewer than k vectors (tiny corpus / unlucky ids), fall
    * back to the unfiltered head so KMeans always has enough points.
    * Reproducible for a fixed partition layout (limit() takes the
    * first-answering partitions, so a cluster relayout can shift the
    * sample — persist the model when exact reproducibility matters). */
  def fit(corpus: DataFrame, k: Int, seed: Long = 11L,
      maxSample: Int = 2048): IvfModel = {
    val spread = corpus
      .filter(pmod(xxhash64(col("vec_id"), lit(seed)), lit(4)) === 0)
      .limit(maxSample)
      .select(array_to_vector(col("embedding").cast("array<double>"))
        .as("features"))
      .cache()
    val sample =
      if (spread.count() >= k) spread
      else corpus.limit(maxSample)
        .select(array_to_vector(col("embedding").cast("array<double>"))
          .as("features"))
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(10).fit(sample)
    spread.unpersist()
    IvfModel(km.clusterCenters.map(_.toArray))
  }

  /** Nearest-cell id for each corpus vector. Cell assignment runs over
    * the WHOLE corpus, so it uses the codegen'd `NearestCells` kernel
    * (squared-L2, ties to the lower cell id) — the interpreted
    * HOF formulation costs k×dim lambda evaluations per row. */
  def assignCells(corpus: DataFrame, model: IvfModel): DataFrame =
    corpus
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("_ce"))
      .withColumn("cell", element_at(
        graft.functions.exprs.nearestCells(col("_ce"), model.centroids, 1), 1))

  /** Approximate top-k with a pre-trained quantizer: each query probes
    * its `nProbe` nearest cells. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, model: IvfModel,
      nProbe: Int): DataFrame = {
    val cells = assignCells(corpus, model)
    val probes = queries
      .select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("_qe"))
      .withColumn("cell", explode(
        graft.functions.exprs.nearestCells(col("_qe"), model.centroids,
          nProbe)))
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("score", round(Ann.cosine(col("_qe"), col("_ce")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "score")
  }

  /** Convenience: fit-and-query in one call (tests/small corpora). */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, nCells: Int = 16,
      nProbe: Int = 2): DataFrame =
    topK(corpus, queries, k, fit(corpus, nCells), nProbe)
}
