package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2.3).
  *
  * Brute force is the exact baseline: the (small) query set is
  * broadcast, the corpus is scanned once — no corpus shuffle, linear in
  * |corpus|·|queries|. The LSH variant buckets the corpus by
  * random-hyperplane sign codes so each query probes ~|corpus|/2^planes
  * rows — the 100 TB path, trading recall for a bucket-join.
  */
object Ann {

  /** Cosine similarity between two array<double> columns. Delegates to
    * the native `CosineSim` expression (same sequential arithmetic as
    * the aggregate/zip_with formulation, so oracle parity holds; the
    * HOF version is interpreted and ~10× slower per pair). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.exprs.cosineSim(a, b)

  /** Exact top-k cosine neighbors for each query vector.
    * Ranking uses the 4-dp-rounded score (ties broken by corpus id) so
    * results are reproducible across engines. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("c_id"),
      col("embedding").cast("array<double>").as("_ce"))
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("_qe"))
    val scored = c.join(broadcast(q), col("c_id") =!= col("q_id"))
      .withColumn("score", round(cosine(col("_qe"), col("_ce")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "score")
  }

  /** Deterministic random hyperplanes (Gaussian, seed 7). Public so
    * the SQL oracle can fold the same constants into its query and
    * replicate the bucket codes exactly. */
  def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket code for an embedding column. Runs over the whole
    * corpus → codegen'd `LshCodeExpr` kernel (identical sequential dot
    * arithmetic to the HOF form, so the literal-folded SQL oracle
    * still reproduces every bucket). */
  def lshCode(emb: Column, nPlanes: Int, dim: Int): Column =
    graft.functions.exprs.lshCode(emb, planes(nPlanes, dim))

  /** Approximate top-k: queries probe only their own LSH bucket.
    * At scale the corpus bucketing is computed once and reused across
    * query batches. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val c = corpus.select(col("vec_id").as("c_id"),
      col("embedding").cast("array<double>").as("_ce"))
      .withColumn("_bucket", lshCode(col("_ce"), nPlanes, dim))
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("_qe"))
      .withColumn("_bucket", lshCode(col("_qe"), nPlanes, dim))
    val scored = c.join(broadcast(q), Seq("_bucket"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("score", round(cosine(col("_qe"), col("_ce")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "score")
  }
}
