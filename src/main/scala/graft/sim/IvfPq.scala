package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite IVF-PQ approximate nearest neighbor (SURVEY §2.3) — the
  * production billion-vector index shape: the coarse quantizer
  * ([[Ivf]]) PRUNES (a query touches only its `nProbe` cells,
  * |corpus|·nProbe/k candidates instead of |corpus|), and product
  * quantization ([[Pq]]) COMPRESSES what remains (the ADC scan reads
  * m byte-codes + broadcast codebook literals, never the float
  * vectors), with an exact-cosine re-rank paying full precision for
  * only the shortlist. Both models are fit-once driver-side constants
  * folded into the plan; cell assignment, encoding, and reconstruction
  * are one map-only pass over the corpus (codegen'd `NearestCells`
  * kernels), the probe join is an equi-join on cell id, and every
  * ranking stage rounds with an id tiebreak so the whole pipeline —
  * assignment, probing, ADC shortlist, re-rank — replays
  * engine-deterministically in the SQL oracle.
  *
  * At 100 TB: cells are the disk-partitioning unit (partition pruning
  * does the probe), codes keep the scan RAM-resident, and the
  * shortlist join touches |q|·shortlist rows — nothing scales with the
  * corpus except the map-only encode.
  */
object IvfPq {

  /** The stored-index build: one map-only pass over the corpus — cell
    * assignment + per-subspace codes + codeword reconstruction (the
    * float vector is DROPPED after this projection — downstream stages
    * see only `c_id`, `cell`, `_re`). In production this is the
    * persisted artifact the ingestion pipeline maintains; [[topK]]
    * computes it inline and the streaming probe
    * ([[graft.streaming.Events.streamAnnProbe]]) caches it as the
    * static side of a stream-static join. */
  def encode(corpus: DataFrame, ivf: Ivf.IvfModel,
      pq: Pq.PqModel): DataFrame = {
    val sub = pq.subDim
    val codeCols = (0 until pq.m).map { j =>
      element_at(graft.functions.exprs.nearestCells(
        slice(col("_ce"), j * sub + 1, sub), pq.codebooks(j), 1), 1)
        .as(s"code$j")
    }
    corpus
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("_ce"))
      .withColumn("cell", element_at(
        graft.functions.exprs.nearestCells(col("_ce"), ivf.centroids, 1), 1))
      .select(col("c_id") +: col("cell") +: codeCols: _*)
      .withColumn("_re", Pq.reconstruct(pq))
      .select(col("c_id"), col("cell"), col("_re"))
  }

  /** Approximate top-k: IVF probe → in-cell ADC shortlist → exact
    * re-rank. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      ivf: Ivf.IvfModel, pq: Pq.PqModel, nProbe: Int,
      shortlist: Int): DataFrame =
    serve(encode(corpus, ivf, pq), corpus, queries, k, ivf, nProbe,
      shortlist)

  /** The SERVING half of [[topK]], over an index frame that may come
    * from anywhere — the inline [[encode]] (topK), the cached
    * stream-static side (streamAnnProbe), or a PERSISTED index read
    * back from storage (ann_index_upsert). `coded` must carry
    * (c_id, cell, _re); `corpus` supplies the full-precision vectors
    * for the exact re-rank only (|q|·shortlist rows touched). Because
    * every stage is deterministic per-row with pinned tie-breaks, the
    * result depends on the index only as a SET — an index assembled
    * incrementally (base + delta appends + partial cell rebuilds)
    * serves identically to a full rebuild. */
  def serve(coded: DataFrame, corpus: DataFrame, queries: DataFrame,
      k: Int, ivf: Ivf.IvfModel, nProbe: Int,
      shortlist: Int): DataFrame = {
    val probes = queries
      .select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("_qe"))
      .withColumn("cell", explode(
        graft.functions.exprs.nearestCells(col("_qe"), ivf.centroids,
          nProbe)))
    val adc = coded.join(broadcast(probes), Seq("cell"))
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
