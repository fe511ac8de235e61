package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** 64-bit SimHash near-duplicate detection (SURVEY §2.3).
  *
  * Each distinct token votes its hash bits ±1; the sign of each bit's
  * vote total forms the 64-bit signature. Hamming-close signatures ⇒
  * similar token distributions.
  *
  * Candidate generation uses the pigeonhole chunk trick: split the 64
  * bits into 4×16-bit chunks; any pair within hamming distance 3 must
  * agree on at least one whole chunk, so a self-join per chunk finds all
  * such pairs with one shuffle keyed on (chunk-index, chunk-value).
  */
object SimHash {

  /** id, simhash (bigint). Distinct tokens = 1-gram shingles; the
    * bit-vote fold runs in the custom `SimHash64` expression (the HOF
    * formulation is interpreted and ~1000× slower per doc). */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        graft.functions.exprs.shingles(col(textCol), 1).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col("id"),
        graft.functions.exprs.simhash64(col("_toks")).as("simhash"))

  /** Pairs (id_a < id_b) agreeing on ≥1 of 4 16-bit chunks, with exact
    * hamming distance, filtered to `maxHamming`. */
  def candidatePairs(sigs: DataFrame, maxHamming: Int = 8): DataFrame = {
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("c"),
        (shiftright(col("simhash"), 16 * c).bitwiseAND(lit(65535L))).as("v"))
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
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
