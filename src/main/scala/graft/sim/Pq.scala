package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) approximate nearest neighbor
  * (SURVEY §2.3): split each vector into `m` contiguous subspaces, fit
  * a small k-means codebook per subspace, and store each corpus vector
  * as `m` byte-sized codes instead of `dim` floats — a 64-dim float32
  * vector compresses 64× (256 B → 4 B). Ranking is asymmetric distance
  * computation (ADC): the query stays uncompressed and scores against
  * each candidate's RECONSTRUCTION (the concatenation of its chosen
  * codewords), so quantization error applies to only one side.
  *
  * Scale shape: the codebooks are a driver-side model folded into the
  * plan as literals (m·k·subDim doubles ≈ 16 kB — nothing at any
  * scale); encoding is one codegen'd map over the corpus (the
  * `NearestCells` kernel per subspace); scoring touches only the
  * 4-byte codes plus the broadcast queries, which is exactly why PQ is
  * the standard way to keep billion-vector indexes in RAM. At 100 TB
  * PQ composes with IVF (IVF-PQ): cells prune the candidate set,
  * codes compress what remains — both pieces exist here
  * ([[Ivf]], [[Pq]]) with the same fit/encode/score contract.
  *
  * Like [[Ivf.fit]], the codebook fit is a MODEL: trained once on a
  * deterministic bounded hash-spread sample (layout-independent —
  * TakeOrderedAndProject sample, seeded per-subspace KMeans), cached
  * and persistable, never re-fit per query.
  */
object Pq {

  /** Trained quantizer: `m` codebooks of `k` codewords each. */
  case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def subDim: Int = codebooks.head.head.length
  }

  /** Fit per-subspace codebooks on a bounded deterministic sample
    * (same sampling contract as [[Ivf.fit]]: a function of the data,
    * not of partition layout). */
  def fit(corpus: DataFrame, m: Int = 8, k: Int = 32, seed: Long = 11L,
      maxSample: Int = 2048): PqModel = {
    val sample = corpus
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(maxSample)
      .select(col("embedding").cast("array<double>").as("e"))
      .cache()
    val dim = sample.select(size(col("e"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val books = (0 until m).map { j =>
      val feats = sample
        .select(array_to_vector(slice(col("e"), j * sub + 1, sub))
          .as("features"))
      new KMeans().setK(k).setSeed(seed + j).setMaxIter(10).fit(feats)
        .clusterCenters.map(_.toArray)
    }.toArray
    sample.unpersist()
    PqModel(books)
  }

  /** Persist the codebooks (text, shortest-round-trip doubles —
    * bit-exact on reload, like [[Ivf.save]]): one line per codeword,
    * `j,code,v1,...,vSub`. */
  def save(spark: org.apache.spark.sql.SparkSession, model: PqModel,
      path: String): Unit = {
    val lines = for {
      j <- model.codebooks.indices
      c <- model.codebooks(j).indices
    } yield s"$j,$c,${model.codebooks(j)(c).mkString(",")}"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(lines.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Reload a persisted quantizer; None when no artifact exists. */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[PqModel] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      val rows = text.split("\n").filter(_.nonEmpty).map { l =>
        val parts = l.split(",")
        (parts(0).toInt, parts(1).toInt, parts.drop(2).map(_.toDouble))
      }
      val m = rows.map(_._1).max + 1
      Some(PqModel((0 until m).map { j =>
        rows.filter(_._1 == j).sortBy(_._2).map(_._3)
      }.toArray))
    }
  }

  /** Per-subspace code assignment over the whole corpus — one
    * codegen'd `NearestCells` (squared-L2 argmin, ties to the lower
    * code) per subspace on a sliced view of the vector. */
  def encode(corpus: DataFrame, model: PqModel): DataFrame = {
    val sub = model.subDim
    val codeCols = (0 until model.m).map { j =>
      element_at(graft.functions.exprs.nearestCells(
        slice(col("_ce"), j * sub + 1, sub), model.codebooks(j), 1), 1)
        .as(s"code$j")
    }
    corpus
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("_ce"))
      .select(col("c_id") +: codeCols: _*)
  }

  /** Reconstruction from codes: concatenated codeword literals — the
    * compressed representation materialized back to a vector for ADC
    * scoring. */
  def reconstruct(model: PqModel): Column = {
    val parts = (0 until model.m).map { j =>
      val bookLit = array(model.codebooks(j).map(cw =>
        array(cw.map(lit): _*)): _*)
      element_at(bookLit, col(s"code$j") + 1)
    }
    flatten(array(parts: _*))
  }

  /** Two-stage PQ search, the production shape: (1) ADC scan — the
    * uncompressed query scores every candidate's reconstruction, which
    * touches only the code columns + broadcast codebook literals — and
    * keeps a `shortlist`-sized top-R per query; (2) exact re-rank —
    * the R shortlisted ids (|q|·R rows, broadcastable at any scale)
    * equi-join the corpus for their true vectors and the final top-k
    * is exact cosine over the shortlist. Compression does the heavy
    * scan; precision only pays for R vectors per query. Both stages
    * rank on rounded scores with an id tiebreak, so the selection is
    * engine-deterministic and the oracle replays it end to end. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, model: PqModel,
      shortlist: Int = 100): DataFrame = {
    val codes = encode(corpus, model).withColumn("_re", reconstruct(model))
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("_qe"))
    val adc = codes.crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("adc", round(Ann.cosine(col("_qe"), col("_re")), 4))
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("c_id"))
    val short = adc.withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= shortlist)
      .select(col("q_id"), col("c_id"), col("_qe"))
    val exact = short
      .join(corpus.select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("_ce")), Seq("c_id"))
      .withColumn("score", round(Ann.cosine(col("_qe"), col("_ce")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    exact.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "score")
  }
}
