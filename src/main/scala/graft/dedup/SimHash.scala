package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** 64-bit SimHash near-duplicate detection (SURVEY §2.3).
  *
  * Each distinct token votes its hash bits ±1; the sign of each bit's
  * vote total forms the 64-bit signature. Hamming-close signatures ⇒
  * similar token distributions. The token hash is md5-lower-64 —
  * replicable by DuckDB's `md5_number_lower`, so the whole signature
  * (and therefore the candidate pair set) has an independent SQL
  * oracle.
  *
  * Candidate generation uses the pigeonhole chunk trick: split the 64
  * bits into `nChunks` equal chunks; any pair within hamming distance
  * `nChunks - 1` must agree on at least one whole chunk, so a
  * self-join per chunk finds ALL such pairs with one shuffle keyed on
  * (chunk-index, chunk-value). The guarantee is enforced:
  * `maxHamming < nChunks` is required — a looser filter would return
  * only the pairs that luckily share a chunk, a silent recall hole.
  * More chunks widen the guarantee but shrink chunk width (64/nChunks
  * bits), which grows bucket collision rates — at corpus scale keep
  * chunks ≥ 8 bits and run exact dedup first (see Dedup.clean).
  */
object SimHash {

  /** id, simhash (bigint). Distinct tokens = 1-gram shingles; the
    * bit-vote fold runs in the custom `SimHash64` expression (the HOF
    * formulation is interpreted and ~1000× slower per doc). */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // Par.widen: single-split scans would run the bit-vote kernel on
    // one core (r17, guide §2.5)
    graft.util.Par.widen(
        docs.select(col(idCol).as("id"), col(textCol).as("_t")))
      .select(col("id"),
        graft.functions.exprs.shingles(col("_t"), 1).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col("id"),
        graft.functions.exprs.simhash64(col("_toks")).as("simhash"))

  /** Pairs (id_a < id_b) within `maxHamming`, found exhaustively via
    * the chunk pigeonhole (requires maxHamming < nChunks). */
  def candidatePairs(sigs: DataFrame, maxHamming: Int = 3,
      nChunks: Int = 4): DataFrame = {
    require(64 % nChunks == 0, s"nChunks=$nChunks must divide 64")
    require(maxHamming < nChunks,
      s"pigeonhole completeness needs maxHamming ($maxHamming) < " +
        s"nChunks ($nChunks): a pair differing in every chunk would be " +
        "missed — raise nChunks or lower maxHamming")
    val width = 64 / nChunks
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val chunks = (0 until nChunks).map { c =>
      struct(lit(c).as("c"),
        (shiftright(col("simhash"), width * c).bitwiseAND(lit(mask))).as("v"))
    }
    val ex = sigs.select(col("id"), col("simhash"),
      explode(array(chunks: _*)).as("ch"))
      .select(col("id"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
    val a = ex.select(col("c"), col("v"), col("id").as("id_a"),
      col("simhash").as("_ha"))
    val b = ex.select(col("c"), col("v"), col("id").as("id_b"),
      col("simhash").as("_hb"))
    a.join(b, Seq("c", "v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
