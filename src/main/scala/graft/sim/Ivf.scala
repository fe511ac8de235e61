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

  /** Train the coarse quantizer on a bounded sample. The sample is the
    * `maxSample` lowest values of a seeded id hash with an id tiebreak:
    * a deterministic FUNCTION OF THE DATA, independent of partition
    * count, file layout, or which partitions answer first (the hazard
    * of a bare `limit()`). Physically this is TakeOrderedAndProject —
    * per-partition bounded heaps, no full sort/shuffle — and the
    * single-partition, deterministically-ordered sample makes the
    * seeded KMeans fit itself reproducible, so the SAME centroids come
    * out on any cluster relayout. For cross-process reuse persist with
    * `save`/`load`. */
  def fit(corpus: DataFrame, k: Int, seed: Long = 11L,
      maxSample: Int = 2048): IvfModel = {
    val sample = corpus
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(maxSample)
      .select(array_to_vector(col("embedding").cast("array<double>"))
        .as("features"))
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(10).fit(sample)
    IvfModel(km.clusterCenters.map(_.toArray))
  }

  /** Persist the quantizer as a text artifact: one line per centroid,
    * comma-joined shortest-round-trip doubles — bit-exact on reload,
    * engine-portable, and diffable. Goes through the Hadoop FileSystem
    * API so the same code writes `file:`/`hdfs:`/`s3a:` model stores. */
  def save(spark: org.apache.spark.sql.SparkSession, model: IvfModel,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(model.centroids.map(_.mkString(","))
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Reload a persisted quantizer; None when no artifact exists. */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[IvfModel] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      Some(IvfModel(text.split("\n").filter(_.nonEmpty)
        .map(_.split(",").map(_.toDouble))))
    }
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
