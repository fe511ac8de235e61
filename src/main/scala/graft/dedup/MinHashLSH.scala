package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/** MinHash + LSH banding near-duplicate detection (SURVEY §2.3).
  *
  * Pipeline: shingle → xxhash64 → `numPerms` affine permutations
  * (wrap-around 64-bit arithmetic, classic (a·h + b) family) → per-band
  * bucket keys → self-join on (band, bucket).
  *
  * Scale shape: signatures are a narrow map over the corpus (no
  * shuffle); the only shuffle is the band-bucket self-join, keyed on
  * (band, bucket-hash). Boilerplate-heavy buckets (the skew killer at
  * 100 TB) are capped by `maxBucket` — members of over-full buckets are
  * better handled by the exact-dup pass first.
  */
object MinHashLSH {

  case class Config(
      numPerms: Int = 64,
      bands: Int = 32,
      shingleK: Int = 3,
      maxBucket: Int = 100) {
    require(numPerms % bands == 0, "bands must divide numPerms")
    def rowsPerBand: Int = numPerms / bands
  }

  /** id, sigs(array<bigint> of numPerms minhashes). Docs with no
    * shingles are dropped (nothing to compare).
    *
    * Uses the custom `Shingles`/`MinHashSigs` Catalyst expressions: the
    * built-in higher-order-function formulation is interpreted and
    * measured ~28 ms/doc at 64 permutations; the primitive-loop
    * expressions do the identical kernel in µs/doc. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame =
    // Fused kernel: value-identical to
    // minhashSigs(shingles(text)).filter(size > 0) — see
    // Kernels.minhashDoc — without materializing the shingle array
    // (the doc's shingles exist only as a scratch buffer in flight).
    // Par.widen: the kernel is the hot path, and a single-split scan
    // would otherwise run it on one core (r17, guide §2.5).
    graft.util.Par.widen(
        docs.select(col(idCol).as("id"), col(textCol).as("_t")))
      .select(col("id"),
        graft.functions.exprs.minhashDoc(col("_t"), cfg.shingleK,
          cfg.numPerms).as("sigs"))
      .filter(col("sigs").isNotNull)

  /** Candidate near-dup pairs (id_a < id_b) with the estimated Jaccard
    * similarity (fraction of agreeing minhashes).
    *
    * One shuffle builds the (band, bucket) → member-id lists; pairs are
    * generated inside each bucket (narrow), deduped across bands, and
    * the signature table is re-joined once per side for the estimate.
    * The `maxBucket` filter drops boilerplate mega-buckets — run exact/
    * canonical dedup first (see Dedup.clean) so those never form; a
    * bucket's ids materialize in one aggregation buffer, which is
    * exactly why the cap exists. */
  /** (id, band, bucket-hash) rows — the LSH index relation. In
    * production this is the stored, bucketed artifact ingestion
    * maintains; here it is recomputed per call. */
  /** array<struct<band,bh>> of per-band bucket keys for a signature
    * column — the stateless banding projection, shared by the batch
    * index and the STREAMING probe (it composes into any frame,
    * including a `readStream` one, because it is a pure map). */
  def bandKeys(sigs: Column, cfg: Config = Config()): Column =
    // Single codegen'd kernel call, value-identical to the declarative
    // `array(struct(j, xxhash64(concat_ws(",", slice(sigs, j*r+1, r)))))`
    // per-band form it replaces — which duplicated the whole sigs
    // subtree (shingles+minhash) once per band when collapsed into a
    // Generate: 32× recompute, ~690 µs/doc vs ~56 measured at sf0.1.
    graft.functions.exprs.bandKeys(sigs, cfg.bands, cfg.rowsPerBand)

  private def bandedIds(sigs: DataFrame, cfg: Config): DataFrame =
    sigs
      .select(col("id"), explode(bandKeys(col("sigs"), cfg)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))

  /** Cross-set candidates for INCREMENTAL dedup: the new batch's band
    * buckets are equi-joined against the existing corpus's index, so
    * only buckets the batch touches are read — cost scales with the
    * batch, not with corpus². Returns distinct (old_id, new_id). */
  def crossCandidates(oldSigs: DataFrame, newSigs: DataFrame,
      cfg: Config = Config()): DataFrame =
    bandedIds(newSigs, cfg).select(
        col("band"), col("bh"), col("id").as("new_id"))
      .join(bandedIds(oldSigs, cfg).select(
        col("band"), col("bh"), col("id").as("old_id")), Seq("band", "bh"))
      .select("old_id", "new_id")
      .distinct()

  def candidatePairs(sigs: DataFrame, cfg: Config = Config()): DataFrame = {
    val exploded = bandedIds(sigs, cfg)
    val buckets = exploded.groupBy("band", "bh")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    // sorted ids ⇒ generated pairs already satisfy id_a < id_b.
    // Buckets over `maxBucket` (boilerplate mega-clusters) fall back to
    // a STAR around the bucket minimum — O(n) pairs instead of O(n²),
    // and connectivity is preserved so downstream connected-components
    // still merges the whole cluster (dropping the bucket outright
    // would silently let >maxBucket near-dup families survive
    // Dedup.clean). Run exact dedup first so these rarely form.
    val pairs = buckets
      .select(explode(when(size(col("ids")) <= cfg.maxBucket,
        expr(
          """flatten(transform(ids, (a, i) ->
            |  transform(slice(ids, i + 2, size(ids)),
            |    b -> struct(a AS id_a, b AS id_b))))""".stripMargin))
        .otherwise(expr(
          """transform(slice(ids, 2, size(ids)),
            |  b -> struct(ids[0] AS id_a, b AS id_b))""".stripMargin)))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    val sa = sigs.select(col("id").as("id_a"), col("sigs").as("_sa"))
    val sb = sigs.select(col("id").as("id_b"), col("sigs").as("_sb"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      // kernel, not aggregate(zip_with(...)): the estimate runs once
      // per candidate pair — interpreted HOFs here become the
      // verify-stage bottleneck at crawl scale. Same integer count,
      // same rounding.
      .withColumn("est_sim", round(
        graft.functions.exprs.sigAgreement(col("_sa"), col("_sb"))
          .cast("double") / cfg.numPerms, 4))
      .select("id_a", "id_b", "est_sim")
  }

  /** The full candidate→verify LSH pipeline: generate candidates with
    * banding, then recompute the EXACT shingle Jaccard on the (small)
    * candidate set and keep pairs with true similarity ≥ `minJaccard`.
    *
    * This is the production shape — LSH for recall, exact verification
    * for precision: downstream consumers (clustering, removal) act on
    * true near-duplicates, not hash estimates. It is also what makes
    * the result independently checkable: exact Jaccard over all pairs
    * is computable by a SQL oracle at verify scale, and with the
    * banding parameters' ≈1-1e-4 recall at J=0.5 the verified candidate
    * set equals the true pair set. The exact join touches only
    * candidates (|pairs| ≪ |corpus|²) — two broadcast-size joins at
    * sane thresholds. `minEst` pre-filters candidates ~5σ below
    * `minJaccard` to bound the verify stage. */
  def verifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, cfg: Config = Config()): DataFrame = {
    val (sh, sigs) = index(docs, idCol, textCol, cfg)
    verifiedPairsFrom(sh, sigs, minJaccard, cfg)
  }

  /** Cached (shingles, signatures) frames for `docs` — the reusable
    * building block when one caller needs the same corpus slice for
    * several stages (in-corpus pairs AND a cross-probe, as
    * dedup_incremental_clusters does): ONE shingle pass feeds the
    * signature stage and every exact-verification side, instead of
    * re-shingling the slice per stage. The cached frames are the
    * in-process stand-in for the stored signature index a production
    * pipeline maintains; Dedup.clean reuses them for its second
    * pass. */
  def index(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    val sh = graft.util.Par.widen(
        docs.select(col(idCol).as("id"), col(textCol).as("_t")))
      .select(col("id"),
        graft.functions.exprs.shingles(col("_t"), cfg.shingleK).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .cache()
    val sigs = sh
      .select(col("id"),
        graft.functions.exprs.minhashSigs(col("_sh"), cfg.numPerms).as("sigs"))
      .cache()
    (sh, sigs)
  }

  /** [[verifiedPairs]] over pre-built [[index]] frames. */
  def verifiedPairsFrom(sh: DataFrame, sigs: DataFrame,
      minJaccard: Double, cfg: Config = Config()): DataFrame = {
    val minEst = math.max(0.0, minJaccard - 0.3)
    val cands = candidatePairs(sigs, cfg)
      .filter(col("est_sim") >= minEst)
    val sa = sh.select(col("id").as("id_a"), col("_sh").as("_sha"))
    val sb = sh.select(col("id").as("id_b"), col("_sh").as("_shb"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("_sha"), col("_shb"))).cast("double") /
          size(array_union(col("_sha"), col("_shb"))), 4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
