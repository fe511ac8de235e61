package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor (SURVEY §2.3).
  *
  * Coarse quantizer: k-means over (a sample of) the corpus. Each corpus
  * vector lands in one cell; a query probes its `nProbe` nearest cells
  * and ranks only those vectors — |corpus|·nProbe/k work instead of
  * |corpus| per query. The cell assignment is one narrow map (centroids
  * are a driver-side constant folded into the plan), the probe join is
  * an equi-join on cell id: both scale linearly at 100 TB, and the
  * cell table is the natural unit for partition pruning (partition the
  * corpus by cell on disk).
  */
object Ivf {

  /** Train the coarse quantizer; returns centroids as plain arrays. */
  def fitCentroids(corpus: DataFrame, k: Int, seed: Long = 11L): Array[Array[Double]] = {
    val feats = corpus
      .select(array_to_vector(col("embedding").cast("array<double>")).as("features"))
    new KMeans().setK(k).setSeed(seed).setMaxIter(10)
      .fit(feats).clusterCenters.map(_.toArray)
  }

  /** Squared L2 distance to a constant centroid. */
  private def sqDist(emb: Column, centroid: Array[Double]): Column = {
    val c = array(centroid.map(lit): _*)
    aggregate(zip_with(emb, c, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
  }

  /** (dist, cell) structs sorted ascending — struct ordering compares
    * field-by-field, so array_sort ranks cells by distance. */
  private def cellsByDist(emb: Column, cents: Array[Array[Double]]): Column =
    array_sort(array(cents.zipWithIndex.map { case (c, i) =>
      struct(sqDist(emb, c).as("d"), lit(i).as("c"))
    }: _*))

  /** Nearest-cell id for each corpus vector. */
  def assignCells(corpus: DataFrame, cents: Array[Array[Double]]): DataFrame =
    corpus
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("_ce"))
      .withColumn("cell", element_at(cellsByDist(col("_ce"), cents), 1)
        .getField("c"))

  /** Approximate top-k: each query probes its nProbe nearest cells. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, nCells: Int = 16,
      nProbe: Int = 2): DataFrame = {
    val cents = fitCentroids(corpus, nCells)
    val cells = assignCells(corpus, cents)
    val probes = queries
      .select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("_qe"))
      .withColumn("cell", explode(transform(
        slice(cellsByDist(col("_qe"), cents), 1, nProbe),
        s => s.getField("c"))))
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("score", round(Ann.cosine(col("_qe"), col("_ce")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "score")
  }
}
