package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{MinHashLSH, SimHash}
import graft.mm.Multimodal
import graft.sim.Ann
import graft.sources.Tables
import graft.text.TextOps

/** SURVEY §2.3 — LLM-training-data pipeline operators as driver-contract
  * queries over the documents/embeddings corpus tables.
  */
object PipelineQueries {

  /** Exact dedup: group by content hash, keep the smallest id.
    * Map-side combine makes the shuffle proportional to |distinct|. */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("_h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .select("keeper", "n_copies")
      .orderBy(col("keeper"))

  /** Session-scoped memo of the exact-verified LSH pair frame: three
    * contract queries (pairs, clusters, keep-best) consume the same
    * candidate set, and each used to re-pay the full shingle → minhash
    * → band → verify pipeline. Weak-keyed on the SparkSession object
    * itself (identity equality, weak reference): entries die with
    * their session — no pinning of stopped sessions in long-lived
    * JVMs, and no hash-collision route to another session's frame. */
  private val lshPairs =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]

  private def lshPairsFor(s: SparkSession, d: String): DataFrame =
    lshPairs.synchronized {
      var perSession = lshPairs.get(s)
      if (perSession == null) {
        perSession = scala.collection.mutable.Map.empty[String, DataFrame]
        lshPairs.put(s, perSession)
      }
      val df = perSession.getOrElseUpdate(d,
        MinHashLSH.verifiedPairs(Tables.documents(s, d), "doc_id", "text",
          minJaccard = 0.5).cache())
      // re-register after an external spark.catalog.clearCache() (Bench
      // clears between queries): unpersist drops the CacheManager entry
      // but not the memoized Dataset, so without this every later
      // dedup-family query silently re-pays the full LSH pipeline per
      // action instead of reading the pair index once (r11: the
      // permanently-band-flagged dedup_minhash_lsh was exactly this —
      // its 0.10s band was measured memo-warm, later rounds memo-cold)
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.cache()
      df
    }

  /** MinHash+LSH near-dup pairs, exact-verified: banding generates
    * candidates (the only corpus-wide shuffle), exact shingle Jaccard
    * over the candidate set filters to true similarity ≥ 0.5. The
    * output is hash-verifiable against an all-pairs exact-Jaccard
    * oracle — equality also PROVES the LSH recall at this threshold. */
  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame =
    lshPairsFor(s, d)
      .orderBy(col("id_a"), col("id_b"))

  /** EXACT set-similarity self-join via PREFIX FILTERING (the
    * AllPairs/PPJoin family) — the deterministic alternative to LSH
    * banding: order every doc's distinct shingles by one global
    * rarity order (df asc, shingle asc), index only each doc's first
    * `n - ceil(τ·n) + 1` shingles, and equi-join on those prefix
    * shingles. The prefix theorem guarantees every pair with true
    * Jaccard ≥ τ shares a prefix shingle under ANY fixed total order
    * — so unlike LSH there is no recall parameter to tune: the
    * candidate set provably covers the answer, and rarest-first
    * ordering minimizes it (common shingles never enter short
    * prefixes). Exact Jaccard verification then filters candidates,
    * same as the LSH pipeline's verify stage. By construction the
    * result EQUALS [[dedupMinhashLsh]]'s verified pair relation — the
    * two keys share one oracle, and their equality at the gate is a
    * measured recall-1.0 certificate for the banding parameters.
    * Scale shape: one df aggregation, one per-doc sort of its own
    * shingles, prefix explode ≈ half the shingle occurrences, and the
    * equi-join touches only rare-shingle buckets (max shingle df ~25
    * on this corpus vs 3923 for tokens — grain matters). */
  def dedupSetsimJoin(s: SparkSession, d: String): DataFrame = {
    import graft.functions.exprs
    val docs = graft.util.Par.widen(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), exprs.shingles(col("text"), 3).as("toks"))
      .filter(size(col("toks")) > 0)
      .cache()
    val freq = docs.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val ordered = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(freq, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(expr("transform(array_sort(collect_list(struct(f, tok))), x -> x.tok)")
        .as("stoks"))
    // τ = 0.5: prefix p = n - ceil(n/2) + 1 = n div 2 + 1.
    // localCheckpoint(true): the candidate self-join reads this frame
    // on BOTH sides, and without the eager materialization the whole
    // upstream (shingle explode → df join → per-doc sort → prefix
    // explode, freq aggregation included) executes twice — the r17
    // before-plan showed two full copies of operators 8-44 with no
    // ReusedExchange (guide §2.4: don't recompute what one exchange
    // can serve). `n` rides along for the length filter below.
    val pref = ordered
      .withColumn("n", size(col("stoks")))
      .select(col("doc_id"), col("n"),
        explode(expr("slice(stoks, 1, n div 2 + 1)")).as("tok"))
      .cache()
    // PPJoin length filter (guide §3.2 — prune before the shuffle):
    // J(a,b) ≥ 0.5 ⇒ |a∩b| ≥ ½|a∪b| ≥ ½·max(na,nb), and |a∩b| ≤
    // min(na,nb), so max ≤ 2·min. Pairs failing it can never verify —
    // dropping them here (a pure function of the sizes, independent of
    // which prefix token matched) only removes rows the exact-Jaccard
    // filter would discard anyway, BEFORE the distinct and the two
    // verify joins pay for them.
    val cands = pref.select(col("tok"), col("doc_id").as("id_a"),
        col("n").as("_na"))
      .join(pref.select(col("tok"), col("doc_id").as("id_b"),
        col("n").as("_nb")), Seq("tok"))
      .filter(col("id_a") < col("id_b") &&
        col("_na") <= lit(2) * col("_nb") &&
        col("_nb") <= lit(2) * col("_na"))
      .select("id_a", "id_b").distinct()
    val ta = docs.select(col("doc_id").as("id_a"), col("toks").as("_ta"))
    val tb = docs.select(col("doc_id").as("id_b"), col("toks").as("_tb"))
    cands.join(ta, "id_a").join(tb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("_ta"), col("_tb"))).cast("double") /
          size(array_union(col("_ta"), col("_tb"))), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash hamming-neighborhood near-dup pairs. maxHamming=3 is the
    * 4-chunk pigeonhole guarantee — every qualifying pair is found,
    * which (with the md5-based token hash) makes the pair set exactly
    * reproducible by the SQL oracle. */
  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val sigs = SimHash.signatures(Tables.documents(s, d), "doc_id", "text")
    SimHash.candidatePairs(sigs, maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Cluster resolution over the verified near-dup graph: connected
    * components → (doc, keeper) mapping, the actionable dedup output.
    * Edges are exact-verified (true Jaccard ≥ 0.5), so the clustering
    * matches a recursive-CTE components oracle over the same edges. */
  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = lshPairsFor(s, d)
    graft.dedup.Components.keepers(pairs)
      .orderBy(col("id"))
  }

  /** Round-half-up to `dp` decimals via the explicit floor lattice
    * (identical both engines). */
  private def rnd(c: org.apache.spark.sql.Column, dp: Int) = {
    val sc = math.pow(10, dp)
    floor(c * sc + 0.5) / sc
  }

  /** Cross-source duplication matrix — which source PAIRS share
    * near-dup clusters (the corpus-contamination readout a mixture
    * designer needs before weighting sources): every LSH cluster
    * ([[dedupClusters]]' verified-pairs machinery, shared frame) maps
    * to its distinct source set, and each ordered source pair counts
    * the clusters containing docs from BOTH. The pair stage runs on
    * the |clusters|×|sources| frame — nothing corpus-scaled beyond
    * the shared LSH pass. */
  def dedupCrossSource(s: SparkSession, d: String): DataFrame = {
    val labels = graft.dedup.Components.keepers(lshPairsFor(s, d))
    val src = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("source"))
    val cs = labels.join(src, "id")
      .select(col("keeper"), col("source")).distinct()
    cs.as("a").join(cs.as("b"),
        col("a.keeper") === col("b.keeper") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_clusters"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Participation ratio of the embedding covariance spectrum —
    * PR = (tr C)²/tr C² = (Σλ)²/Σλ², the eigenvalue-free effective
    * dimensionality (how many directions the embedding space really
    * uses; PR/d → 1 is isotropic, → 1/d is collapsed) beside
    * [[embedIsotropy]]'s top-eigenvalue probe. The full 64×64
    * covariance comes from ONE generator pass (per-row upper-triangle
    * products on the e6 lattice, map-side combined to 2080 cells —
    * no self-join, nothing corpus-scaled shuffles); each C_ij is
    * FIXED to the pico lattice by floor on identical doubles (num is
    * exact DECIMAL both engines; negative covariances make div
    * unusable — floor(x) agrees both engines on either sign), and
    * both traces fold those integers exactly. */
  def embedParticipationRatio(s: SparkSession, d: String): DataFrame = {
    val v = Tables.embeddings(s, d)
      .select(expr("transform(CAST(embedding AS ARRAY<DOUBLE>)," +
        " x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))").as("x6"))
    val cells = v
      .select(posexplode(col("x6")).as(Seq("i", "xi")), col("x6"))
      .select(col("i"), col("xi"),
        posexplode(col("x6")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("si"),
        sum(col("xj")).as("sj"),
        sum(expr("CAST(xi AS DECIMAL(38,0)) * xj")).as("sij"))
      .withColumn("c12", floor(
        // x6 products already carry the 1e12 scale (x6 = x·1e6), so
        // num/n² IS the raw covariance in pico units
        expr("CAST(CAST(n AS DECIMAL(38,0)) * sij" +
          " - CAST(si AS DECIMAL(38,0)) * sj AS DOUBLE)") /
          (col("n").cast("double") * col("n"))).cast("long"))
    cells.agg(
        sum(when(col("i") === col("j"), col("c12"))).as("tr6"),
        sum(expr("(CASE WHEN i = j THEN 1 ELSE 2 END)" +
          " * CAST(c12 AS DECIMAL(38,0)) * c12")).as("tr2"),
        max(col("i")).as("_dmax"))
      .select((col("_dmax") + 1).cast("long").as("dims"),
        rnd(expr("CAST(tr6 AS DOUBLE) / 1e12"), 6).as("trace_c"),
        rnd(expr("CAST(tr6 AS DOUBLE) * tr6 / CAST(tr2 AS DOUBLE)"), 4)
          .as("participation_ratio"),
        rnd(expr("CAST(tr6 AS DOUBLE) * tr6 / CAST(tr2 AS DOUBLE)" +
          " / (_dmax + 1)"), 6).as("pr_normalized"))
  }

  /** Exact n-gram Jaccard similarity on adjacent-id pairs (the
    * SQL-verifiable window into the pairwise similarity kernel). */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    // shingling is interpreted (HOF) — compute once, reuse on both
    // sides of the self-join
    val docs = graft.util.Par.widen(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
      .cache()
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("_sa"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("_sb"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .filter(size(col("_sa")) > 0 && size(col("_sb")) > 0)
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("_sa"), col("_sb"))).cast("double") /
          size(array_union(col("_sa"), col("_sb"))), 4).as("jaccard"))
      .orderBy(col("doc_a"))
  }

  /** Embedding cosine on adjacent-id pairs (SQL-verifiable kernel of
    * embedding near-dup detection). */
  def dedupEmbedCos(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val a = e.select(col("vec_id").as("vec_a"), col("emb").as("_ea"))
    val b = e.select(col("vec_id").as("vec_b"), col("emb").as("_eb"))
    a.join(b, col("vec_b") === col("vec_a") + 1)
      .select(col("vec_a"), col("vec_b"),
        round(Ann.cosine(col("_ea"), col("_eb")), 4).as("cos"))
      .orderBy(col("vec_a"))
  }

  /** INCREMENTAL dedup — the production ingestion pattern: classify an
    * incoming batch (doc_id % 5 == 0 here) against the already-ingested
    * corpus without re-clustering it. Exact verdicts come from one
    * hash-join; near verdicts from LSH cross-candidates (batch buckets
    * probe the corpus index — cost scales with the batch) verified
    * against TRUE shingle Jaccard ≥ 0.5. */
  def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.functions.exprs
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val exact = batch.select(col("doc_id"), md5(col("text")).as("_h"))
      .join(old.select(md5(col("text")).as("_h"), col("doc_id").as("_oid")),
        "_h")
      .groupBy(col("doc_id")).agg(min(col("_oid")).as("exact_id"))
    val cands = MinHashLSH.crossCandidates(
      MinHashLSH.signatures(old, "doc_id", "text"),
      MinHashLSH.signatures(batch, "doc_id", "text"))
    def sh(df: DataFrame, idAs: String, shAs: String) =
      df.select(col("doc_id").as(idAs),
          exprs.shingles(col("text"), 3).as(shAs))
        .filter(size(col(shAs)) > 0)
    val near = cands
      .join(sh(batch, "new_id", "_shn"), "new_id")
      .join(sh(old, "old_id", "_sho"), "old_id")
      .filter(size(array_intersect(col("_shn"), col("_sho")))
        .cast("double") /
        size(array_union(col("_shn"), col("_sho"))) >= 0.5)
      .groupBy(col("new_id").as("doc_id"))
      .agg(min(col("old_id")).as("near_id"))
    batch.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_id").isNotNull, "exact")
          .when(col("near_id").isNotNull, "near")
          .otherwise("unique").as("verdict"),
        coalesce(col("exact_id"), col("near_id"), lit(-1L)).as("match_id"))
      .orderBy(col("doc_id"))
  }

  /** Sub-document (passage-level) dedup: documents are chunked into
    * consecutive 10-token passages and EXACT-deduped at passage grain —
    * the training-data op that catches boilerplate shared across
    * otherwise-distinct documents, which doc-level dedup cannot see.
    * First occurrence (smallest doc_id, then position) keeps a
    * passage; later copies count as duplication. One shuffle keyed on
    * md5-lower-64 of the passage (8 bytes instead of ~60 of raw text —
    * the 100 TB shuffle-width fix; DuckDB's `md5_number_lower` computes
    * the identical key, so collisions — already ~impossible at 2⁻⁶⁴ —
    * are bit-identical across engines), one |sources|-row rollup. */
  def dedupPassage(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
    val pass = toks
      .select(col("doc_id"), col("source"),
        posexplode(expr(
          """transform(sequence(0, cast(ceil(size(t) / 10.0) as int) - 1),
            |  i -> array_join(slice(t, i * 10 + 1, 10), ' '))"""
            .stripMargin)).as(Seq("pidx", "passage")))
    val w = Window.partitionBy(col("pkey"))
      .orderBy(col("doc_id"), col("pidx"))
    pass
      .withColumn("pkey", graft.functions.exprs.md5Lower64(col("passage")))
      .drop("passage")
      .withColumn("rn", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("rn") > 1, 1).otherwise(0)).as("n_dup_passages"))
      .select(col("source"), col("n_passages"), col("n_dup_passages"),
        round(col("n_dup_passages") / col("n_passages"), 4)
          .as("dup_frac"))
      .orderBy(col("source"))
  }

  /** Per-source corpus QA profile (the report a pipeline owner reads
    * before training): doc counts, char-length distribution, short-doc
    * fraction. One grouped pass; percentile is the only sort-bearing
    * aggregate and it runs per-group, not global. */
  def corpusProfile(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        round(expr("percentile(n_chars, 0.5)"), 2).as("p50_chars"),
        round(count_if(col("n_chars") < 150).cast("double") /
          count(lit(1)), 4).as("short_frac"))
      .orderBy(col("source"))

  /** Corpus vocabulary with document frequency + IDF (the tf-idf /
    * quality-classifier building block): distinct (doc, token) then one
    * token-keyed aggregation — map-side combine keeps the shuffle at
    * |vocab| rows per partition. Top 30 terms by document frequency. */
  def textVocabIdf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // corpus size joined in as a 1-row broadcast, not a driver action
    val totals = docs.agg(count(lit(1)).cast("double").as("_total"))
    docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals))
      .select(col("token"), col("df"),
        round(log(col("_total") / col("df")), 6).as("idf"))
      .orderBy(col("df").desc, col("token"))
      .limit(30)
  }

  /** Per-label embedding centroids (the building block for IVF cell
    * fitting, cluster summaries, and semantic-dedup pivots): posexplode
    * to (label, dim, component) then one grouped average — |labels|×dim
    * result rows from a single shuffle, no vector ever collected to
    * the driver. */
  def embedCentroid(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "component")))
      .groupBy(col("label"), (col("dim") + 1).cast("long").as("dim"))
      .agg(round(avg(col("component")), 5).as("centroid"),
        count(lit(1)).as("n_vecs"))
      .orderBy(col("label"), col("dim"))

  /** Scalar int8 quantization of the embedding corpus — the 4×
    * memory-compression path that makes billion-vector ANN serving
    * fit in RAM. Per-dimension min/max define the affine code (the
    * standard symmetric-free scalar quantizer); the operator reports,
    * per dimension, the reconstruction error of round-tripping every
    * vector through the 0..255 code. min/max are exact (float→double
    * widening is lossless, min/max are order-free), so both engines
    * quantize bit-identically; only the error averages need the usual
    * rounding absorb. Two corpus passes (min/max, then error), both
    * partial-aggregable single shuffles keyed on dim. */
  def embedInt8Quant(s: SparkSession, d: String): DataFrame = {
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "x")))
    val mm = v.groupBy(col("dim"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val step = (col("hi") - col("lo")) / 255
    v.join(broadcast(mm), "dim")
      // constant dimension (hi == lo) quantizes losslessly to one code
      // — guard the 0/0 step division that would otherwise emit NaN
      .withColumn("err",
        when(col("hi") === col("lo"), lit(0.0)).otherwise(
          col("x") - (col("lo") + round((col("x") - col("lo")) / step) * step)))
      .groupBy(col("dim").cast("long").as("dim"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_vals"),
        round(avg(col("err") * col("err")) * 1e6, 6).as("mse_ppm"),
        round(max(abs(col("err"))), 6).as("max_abs_err"))
      .select(col("dim"), round(col("lo"), 6).as("lo"),
        round(col("hi"), 6).as("hi"), col("n_vals"), col("mse_ppm"),
        col("max_abs_err"))
      .orderBy(col("dim"))
  }

  /** Training-shard manifest: hash-assign every document to one of 16
    * shards (the pack-the-corpus-into-shards step before training) and
    * report per-shard stats. The md5-based hash is deterministic and
    * engine-portable; one grouped pass, |shards| result rows. */
  def shardManifest(s: SparkSession, d: String): DataFrame = {
    import graft.functions.exprs
    Tables.documents(s, d)
      .withColumn("shard",
        (exprs.md5Lower64(col("doc_id").cast("string"))
          .bitwiseAND(lit(2147483647L)) % 16).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("shard"))
  }

  /** Centroid classification (embedding-based quality/topic routing):
    * every vector is assigned the label whose centroid it is closest to
    * by cosine. The |labels|×dim centroid matrix is collapsed into a
    * broadcast build side; the corpus never shuffles — per-vector
    * argmax is a partial-aggregable max_by, so the one shuffle carries
    * a single row per vector. */
  def embedAssign(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("_e"))
    val centroids = emb
      .select(col("label"), posexplode(col("_e")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("x")).as("c"))
      .groupBy(col("label").as("c_label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("c"))))
        .getField("c").as("_c"))
    emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("label"), col("c_label"),
        Ann.cosine(col("_e"), col("_c")).as("cos"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max_by(col("c_label"), struct(col("cos"), -col("c_label")))
        .as("assigned"),
        round(max(col("cos")), 4).as("best_cos"))
      .withColumn("correct", col("label") === col("assigned"))
      .orderBy(col("vec_id"))
  }

  /** Exact top-5 cosine neighbors for the first 10 vectors. */
  def annBruteTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.bruteTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** FILTERED vector search — top-5 cosine neighbors restricted to the
    * query's own label (the metadata-predicate retrieval every real
    * serving system needs: "similar AND in-category"). Realized as
    * PRE-filtering: the predicate joins into the candidate set BEFORE
    * scoring, so k results are guaranteed (post-filtering an
    * unconstrained top-k can return fewer than k). The label equality
    * rides the same broadcast join as the kernel — zero extra
    * shuffles. */
  def annFilteredTopK(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val c = emb.select(col("vec_id").as("c_id"), col("label").as("c_lbl"),
      col("embedding").cast("array<double>").as("_ce"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_lbl"),
        col("embedding").cast("array<double>").as("_qe"))
    val scored = c.join(broadcast(q),
        col("c_id") =!= col("q_id") && col("c_lbl") === col("q_lbl"))
      .withColumn("score",
        round(graft.sim.Ann.cosine(col("_qe"), col("_ce")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("c_id"),
        col("c_lbl").cast("long").as("label"), col("score"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Embedding-corpus health probe: per-label L2-norm profile (mean /
    * median / p95, plus degenerate zero-norm count). Unnormalized or
    * collapsed embeddings are the silent killers of cosine retrieval;
    * this is the one-scan QA report run before any ANN indexing. Norms
    * are rounded to 6 dp BEFORE the percentile/mean so both engines
    * aggregate identical values; the per-vector sumsq is one
    * partial-aggregable shuffle keyed on vec_id. */
  def embedNormStats(s: SparkSession, d: String): DataFrame = {
    val norms = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "x")))
      .groupBy(col("vec_id"), col("label"))
      .agg(round(sqrt(sum(col("x") * col("x"))), 6).as("nrm"))
    norms.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("nrm")), 4).as("mean_norm"),
        round(expr("percentile(nrm, 0.5)"), 4).as("p50_norm"),
        round(expr("percentile(nrm, 0.95)"), 4).as("p95_norm"),
        sum(when(col("nrm") === 0.0, 1).otherwise(0)).as("n_zero"))
      .orderBy(col("label"))
  }

  /** Approximate top-5 via random-hyperplane LSH buckets. */
  def annLshTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Cached IVF quantizers, keyed by corpus dir: fit once (on a bounded
    * sample), query many — a per-query KMeans fit would bury an ML
    * training job inside every search at scale. Backed by a persisted
    * model artifact (Ivf.save/load) so separate processes over the same
    * corpus reuse one quantizer instead of refitting; the fit itself is
    * also layout-independent (see Ivf.fit), so a cold refit reproduces
    * the artifact bit-for-bit. */
  private val ivfModels =
    new java.util.concurrent.ConcurrentHashMap[String, graft.sim.Ivf.IvfModel]

  private[graft] def ivfModelFor(s: SparkSession, d: String): graft.sim.Ivf.IvfModel =
    ivfModels.computeIfAbsent(d, _ => {
      val store = sys.props("java.io.tmpdir") + "/graft_ivf_" +
        java.util.UUID.nameUUIDFromBytes(
          d.getBytes(java.nio.charset.StandardCharsets.UTF_8)) + ".txt"
      graft.sim.Ivf.load(s, store).getOrElse {
        val m = graft.sim.Ivf.fit(Tables.embeddings(s, d), 16)
        graft.sim.Ivf.save(s, m, store)
        m
      }
    })

  /** Read-only view of the fitted quantizer for `d` (present once the
    * ann_ivf queries have run in this process). The Verify dump uses it
    * to fold the trained centroids into the DuckDB oracle as literals —
    * the same constant-folding pattern as the LSH hyperplane oracle. */
  def cachedIvfModel(d: String): Option[graft.sim.Ivf.IvfModel] =
    Option(ivfModels.get(d))

  /** Cached PQ codebooks, keyed by corpus dir — fit-once / persist /
    * reload, same model-lifecycle contract as [[ivfModelFor]]. */
  private val pqModels =
    new java.util.concurrent.ConcurrentHashMap[String, graft.sim.Pq.PqModel]

  private[graft] def pqModelFor(s: SparkSession, d: String): graft.sim.Pq.PqModel =
    pqModels.computeIfAbsent(d, _ => {
      val store = sys.props("java.io.tmpdir") + "/graft_pq_" +
        java.util.UUID.nameUUIDFromBytes(
          d.getBytes(java.nio.charset.StandardCharsets.UTF_8)) + ".txt"
      graft.sim.Pq.load(s, store).getOrElse {
        val m = graft.sim.Pq.fit(Tables.embeddings(s, d))
        graft.sim.Pq.save(s, m, store)
        m
      }
    })

  /** Read-only view of the fitted PQ codebooks for `d` (for the
    * Verify-time constant-folded oracle). */
  def cachedPqModel(d: String): Option[graft.sim.Pq.PqModel] =
    Option(pqModels.get(d))

  /** Approximate top-5 via product quantization: the corpus compressed
    * to 4 sub-codes per vector (64× smaller than float32), queries
    * ranked by asymmetric distance against the reconstructions. The
    * RAM-residency half of IVF-PQ ([[annIvfTopK]] is the pruning
    * half). */
  def annPqTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.sim.Pq.topK(emb, emb.filter(col("vec_id") < 10), 5,
      pqModelFor(s, d))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Approximate top-5 via IVF (k-means coarse quantizer, 4 probes —
    * tuned so recall@5 clears the ann_ivf_recall bound across scales;
    * 4/16 cells still scans ~25% of the corpus per query vs 100% for
    * brute force). */
  def annIvfTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val model = ivfModelFor(s, d)
    graft.sim.Ivf.topK(emb, emb.filter(col("vec_id") < 10), 5, model, 4)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Approximate top-5 via composite IVF-PQ — the production
    * billion-vector shape assembled from the two halves that already
    * exist separately: IVF cells PRUNE (4/16 probed), PQ codes
    * COMPRESS the ADC scan inside the probed cells, and the exact
    * re-rank pays float precision only for the 50-vector shortlist.
    * Both fitted models fold into the oracle as literals, so DuckDB
    * replays the entire pipeline — cell argmin, probe selection,
    * per-subspace code argmin, reconstruction, rounded-ADC shortlist,
    * exact re-rank — value for value. */
  def annIvfPqTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.sim.IvfPq.topK(emb, emb.filter(col("vec_id") < 10), 5,
      ivfModelFor(s, d), pqModelFor(s, d), nProbe = 4, shortlist = 50)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Approximate top-5 via SQ8 scalar quantization — the int8 index
    * format most disk-resident vector stores actually ship (4× smaller
    * than float32, simpler than PQ): per-dim [min, max] fitted over
    * the corpus (one narrow aggregation collected driver-side — the
    * model, 2·dim doubles), every vector quantized to 8-bit codes and
    * reconstructed in ONE codegen'd map pass ([[graft.functions
    * .exprs.sq8Recon]]), queries scored asymmetrically (full-precision
    * query vs reconstruction), exact cosine re-ranking the 50-vector
    * shortlist — [[annPqTopK]]'s two-stage shape with a scalar
    * codebook. Every step is exactly-rounded IEEE arithmetic in a
    * pinned op order, so unlike PQ (k-means codebooks folded as
    * literals) the oracle needs NO model literals: DuckDB re-derives
    * min/max and replays quantize→reconstruct→ADC→re-rank
    * bit-for-bit. */
  def annSq8TopK(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val stats = emb
      .select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("dim"))
      .collect()
    val mins = stats.map(_.getDouble(1))
    val maxs = stats.map(_.getDouble(2))
    val c = emb
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("_ce"))
      .withColumn("_re",
        graft.functions.exprs.sq8Recon(col("_ce"), mins, maxs))
      .select(col("c_id"), col("_re"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("_qe"))
    val adc = c.join(broadcast(q), col("c_id") =!= col("q_id"))
      .withColumn("adc", round(Ann.cosine(col("_qe"), col("_re")), 4))
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("c_id"))
    val short = adc.withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= 50)
      .select(col("q_id"), col("c_id"), col("_qe"))
    val exact = short
      .join(emb.select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("_ce")), Seq("c_id"))
      .withColumn("score", round(Ann.cosine(col("_qe"), col("_ce")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    exact.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("q_id", "rnk", "c_id", "score")
      .orderBy(col("q_id"), col("rnk"))
  }

  /** FILTERED IVF-PQ top-k — approximate search under a metadata
    * predicate (`label = 1`), the retrieval shape every production
    * vector store needs ("nearest docs WHERE lang='en'"). The filter
    * lands on the CANDIDATE stream: cell assignment and codes are
    * precomputed corpus-wide (the stored index), and the predicate
    * prunes candidates before the ADC scan — so the probe cost drops
    * WITH the filter selectivity instead of post-filtering a top-k
    * that may then come up short. Same fitted models as
    * [[annIvfPqTopK]]; the oracle replays the whole pipeline with the
    * same predicate on the candidate set. */
  def annIvfPqFiltered(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.sim.IvfPq.topK(emb.filter(col("label") === 1),
      emb.filter(col("vec_id") < 10), 5,
      ivfModelFor(s, d), pqModelFor(s, d), nProbe = 4, shortlist = 50)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** INCREMENTAL ANN index maintenance — the vector twin of
    * engine_index_rebuild's lifecycle: a PERSISTED IVF-PQ index
    * (cell-partitioned parquet — cells are the disk-partitioning unit,
    * so a probe is partition pruning) is built from the base corpus,
    * then a vector batch (every 5th vec_id) is UPSERTED: the delta
    * alone is encoded (map-only over the batch, never a corpus
    * re-encode) and appended into its cell partitions. A drift audit
    * then compares per-cell occupancy shares base-vs-batch; any cell
    * whose share drifted > 5 points is rebuilt IN PLACE from its
    * member vectors via dynamic partition overwrite — only the drifted
    * partitions rewrite, the index stays serving throughout. Because
    * the quantizers are the fit-once persisted artifacts
    * ([[ivfModelFor]]/[[pqModelFor]] — production retrains them on
    * schedule, not per upsert) and encoding is per-row deterministic,
    * the maintained index equals the full rebuild as a SET, so serving
    * from the read-back index must reproduce [[annIvfPqTopK]]'s answer
    * exactly — the shared model-folded oracle certifies upsert ≡
    * rebuild at value level (the dedup_incremental_clusters proof
    * pattern). */
  def annIndexUpsert(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val ivf = ivfModelFor(s, d)
    val pq = pqModelFor(s, d)
    val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 0L)
    val batch = emb.filter(pmod(col("vec_id"), lit(5L)) === 0L)
    val idx = graft.util.Scratch.dir("graft_ann_idx").toString + "/index"
    val bi = graft.sim.IvfPq.encode(base, ivf, pq).localCheckpoint(true)
    val di = graft.sim.IvfPq.encode(batch, ivf, pq).localCheckpoint(true)
    bi.write.partitionBy("cell").mode("overwrite").parquet(idx)
    di.write.partitionBy("cell").mode("append").parquet(idx)
    // drift audit: per-cell occupancy share, base vs batch
    def shares(f: DataFrame, out: String): DataFrame = f
      .groupBy(col("cell")).agg(count(lit(1)).as("_n"))
      .select(col("cell"),
        (col("_n") / sum(col("_n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy())).as(out))
    val drifted = shares(bi, "sb").join(shares(di, "sd"), Seq("cell"), "full")
      .na.fill(0.0, Seq("sb", "sd"))
      .filter(abs(col("sb") - col("sd")) > 0.05)
      .select(col("cell").cast("long")).collect().map(_.getLong(0)).toSeq
    if (drifted.nonEmpty) {
      // partial rebuild: re-encode the drifted cells' members from the
      // unioned corpus; dynamic overwrite touches ONLY those partitions
      val members = s.read.parquet(idx)
        .filter(col("cell").isin(drifted: _*))
        .select(col("c_id")).distinct()
      graft.sim.IvfPq.encode(
          emb.join(members, col("vec_id") === col("c_id")).drop("c_id"),
          ivf, pq)
        .write.partitionBy("cell")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(idx)
    }
    graft.sim.IvfPq.serve(s.read.parquet(idx), emb,
        emb.filter(col("vec_id") < 10), 5, ivf, nProbe = 4, shortlist = 50)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Near-dup resolution keeping the BEST cluster member (longest
    * text, doc_id tiebreak) instead of the smallest id — what corpus
    * cleaning actually wants: the most complete representative
    * survives. One extra broadcast-size join + per-cluster argmax over
    * the (tiny) clustered-doc set. */
  def dedupKeepBest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val clusters = graft.dedup.Components.keepers(lshPairsFor(s, d))
    val w = Window.partitionBy(col("keeper"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    clusters
      .join(docs.select(col("doc_id").as("id"),
        length(col("text")).cast("long").as("n_chars")), Seq("id"))
      .select(col("keeper"), col("id").as("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("keeper").as("cluster_id"), col("doc_id").as("best_doc"),
        col("n_chars"))
      .orderBy(col("cluster_id"))
  }

  /** One-call corpus cleaning: exact + near-dup removal, keepers
    * survive. Output is the cleaned corpus size per source (stable). */
  def dedupClean(s: SparkSession, d: String): DataFrame =
    graft.dedup.Dedup.clean(s, Tables.documents(s, d),
        precomputedPairs = Some(lshPairsFor(s, d)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"))
      .orderBy(col("source"))

  /** Sketch aggregates for the 100 TB path: approximate distinct and
    * quantiles (sketch-mergeable, one pass). The sketch values are
    * engine-specific, so the contract output asserts their ERROR
    * BOUNDS against the exact answers instead: the oracle computes the
    * exact side and expects the within-bounds flags to be true. */
  def approxStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("_acd"),
        countDistinct(col("l_partkey")).as("n_parts_exact"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("_amed"),
        expr("percentile(l_extendedprice, 0.5)").as("_emed"))
      .select(col("l_returnflag"), col("n_parts_exact"),
        (abs(col("_acd") - col("n_parts_exact")) <=
          col("n_parts_exact") * 0.05).as("acd_within_5pct"),
        (abs(col("_amed") - col("_emed")) <=
          abs(col("_emed")) * 0.05).as("med_within_5pct"))
      .orderBy(col("l_returnflag"))

  /** Driver-visible IVF quality gate: recall@5 of the IVF result
    * against the (hash-verified) brute-force ranking, asserted as a
    * bound the oracle predicts. Complements the rows-only
    * ann_ivf_topk — the quantizer itself is not SQL-expressible, but
    * its quality contract is. */
  def annIvfRecall(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 10)
    val model = ivfModelFor(s, d)
    val ivf = graft.sim.Ivf.topK(emb, q, 5, model, 4)
      .select(col("q_id"), col("c_id"))
    val brute = Ann.bruteTopK(emb, q, 5)
      .select(col("q_id"), col("c_id"))
    val nHits = ivf.join(brute, Seq("q_id", "c_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    val nBrute = brute.agg(count(lit(1)).as("n_brute"))
    nHits.crossJoin(nBrute)
      .select(col("n_brute"),
        (col("n_hits").cast("double") / col("n_brute") >= 0.5)
          .as("recall_ge_half"))
  }

  /** HyperLogLog sketch merge — the cross-shard distinct-counting
    * story: each source builds its own HLL sketch of its token
    * vocabulary (`hll_sketch_agg`, the Apache DataSketches aggregate),
    * the per-shard sketches UNION into a corpus-wide estimate
    * (`hll_union_agg`), and every estimate is checked against its
    * exact `countDistinct` with a 5% bound the oracle predicts TRUE
    * (HLL at default lgK=12 is ~1.6% rse). At 100 TB the sketches are
    * a few kB per shard and merge associatively — distinct counts
    * across shards/days/reruns without ever re-scanning, which an
    * exact countDistinct cannot do. Same error-bound-flag oracle
    * pattern as q_approx_stats. */
  def hllMerge(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .cache()
    val perSrc = tok.groupBy(col("source"))
      .agg(expr("hll_sketch_agg(tok)").as("sk"),
        countDistinct(col("tok")).as("n_exact"))
    val union = perSrc
      .agg(expr("hll_union_agg(sk)").as("usk"))
      .crossJoin(broadcast(tok.agg(countDistinct(col("tok")).as("ne"))))
      .select(lit("__union__").as("source"), col("ne").as("n_exact"),
        expr("hll_sketch_estimate(usk)").as("est"))
    perSrc
      .select(col("source"), col("n_exact"),
        expr("hll_sketch_estimate(sk)").as("est"))
      .unionByName(union)
      .select(col("source"), col("n_exact"),
        (abs(col("est") - col("n_exact")) / col("n_exact") <= 0.05)
          .as("within_5pct"))
      .orderBy(col("source"))
  }

  /** Exact duplicated-SPAN detection — the substring-level dedup story
    * (the "dedup training data at the substring level" result from the
    * published dedup literature) that shingle/minhash misses: a
    * boilerplate span pasted into otherwise-different documents.
    * Every 50-char window at stride 10 hashes to md5-lower-64; a span
    * is duplicated when its hash occurs in >1 DISTINCT document
    * (within-doc repetition is `text_repetition`'s domain). Per doc:
    * window count, duplicated-window count, duplicated fraction in
    * basis points (exact integer arithmetic — no float on the
    * comparison path). Scale shape: windows shuffle as 8-byte hashes
    * (never text), the duplicated-hash set is tiny and broadcasts
    * back, and stride/width tune the cost-recall trade at 100 TB. The
    * oracle replays windows, hashes, and counts verbatim in SQL
    * (`md5_number_lower(substr(...))`). */
  def dedupSubstringSpans(s: SparkSession, d: String): DataFrame = {
    val W = 50
    val St = 10
    val wins = graft.util.Par.widen(
        Tables.documents(s, d).select(col("doc_id"), col("text"))
          .filter(length(col("text")) >= W))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          expr(s"(length(text) - $W) div $St").cast("int"))).as("i"))
      .select(col("doc_id"),
        graft.functions.exprs.md5Lower64(
          expr(s"substring(text, i * $St + 1, $W)")).as("h"))
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("h"), lit(1).as("_dup"))
    // no broadcast HINT: the dup-hash set is tiny here but unbounded
    // on boilerplate-heavy corpora — AQE broadcasts when it fits and
    // falls back to a hash join when it doesn't
    wins.join(dup, Seq("h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        count(col("_dup")).as("n_dup_windows"))
      .filter(col("n_dup_windows") > 0)
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        floor(col("n_dup_windows") * lit(10000.0) / col("n_windows")
          + lit(0.5)).cast("long").as("dup_frac_bp"))
      .orderBy(col("doc_id"))
  }

  /** FINE-GRAIN short-span dedup — the second window grain that closes
    * [[dedupSubstringSpans]]'s detection gap (r15 verdict order #5): a
    * W/St grid guarantees a full aligned window only for duplicated
    * spans ≥ W+St−1 chars, so the coarse 50/10 grid (≥59) lets
    * one-line boilerplate (~30-char copyright stubs) evade. This pass
    * runs 20-char windows at stride 4 (guarantee ≥23 chars) at 2.5×
    * the coarse grid's shuffle — still 8-byte hashes, never text; the
    * two grains ARE the cost/recall knob at 100 TB (coarse everywhere,
    * fine where the corpus profile demands it). The fixture PLANTS a
    * deterministic 30-char boilerplate line on every 7th doc,
    * stride-aligned by space padding so every planted doc shares
    * identical aligned windows (planted in-query — testdata is
    * read-only); the census must catch every planted doc
    * (Round16Spec asserts it), and the oracle replays windows, hashes
    * and counts verbatim. */
  def dedupShortSpans(s: SparkSession, d: String): DataFrame = {
    val W = 20
    val St = 4
    val B = " (C) 2026 GRAFT CORP RESERVED."
    val t = graft.util.Par.widen(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), (col("doc_id") % 7 === 0).as("planted"),
        when(col("doc_id") % 7 === 0,
          expr(s"concat(text, substring('    ', 1, " +
            s"(4 - pmod(length(text), 4)) % 4), '$B')"))
          .otherwise(col("text")).as("tx"))
    val wins = t.filter(length(col("tx")) >= W)
      .select(col("doc_id"), col("planted"),
        explode(sequence(lit(0),
          expr(s"(length(tx) - $W) div $St").cast("int"))).as("i"),
        col("tx"))
      .select(col("doc_id"), col("planted"),
        graft.functions.exprs.md5Lower64(
          expr(s"substring(tx, i * $St + 1, $W)")).as("h"))
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("h"), lit(1).as("_dup"))
    wins.join(dup, Seq("h"), "left_outer")
      .groupBy(col("doc_id"), col("planted"))
      .agg(count(lit(1)).as("n_windows"),
        count(col("_dup")).as("n_dup_windows"))
      .filter(col("n_dup_windows") > 0)
      .select(col("doc_id"), col("planted"), col("n_windows"),
        col("n_dup_windows"),
        floor(col("n_dup_windows") * lit(10000.0) / col("n_windows")
          + lit(0.5)).cast("long").as("dup_frac_bp"))
      .orderBy(col("doc_id"))
  }

  /** Substring-span EXCISION — the second half of
    * [[dedupSubstringSpans]] (which reports the duplicated-window
    * census): coalesce overlapping duplicated windows into MAXIMAL
    * (start, end) character spans per doc and emit the cleaned-doc
    * census — spans found, chars removed, chars kept. This is the
    * published exact-substring dedup behavior (remove the duplicated
    * spans, keep the rest), realized as gaps-and-islands over window
    * char offsets: a window opens a new island when its start lies
    * beyond the running max end of all earlier windows (stride-aware —
    * windows overlap whenever starts are within W chars, regardless of
    * stride). All arithmetic is exact integers; the per-doc window
    * frames are bounded (O(len/stride) rows per doc, partitioned by
    * doc — no data-scaled global window), so the oracle replays the
    * merge verbatim in SQL. */
  /** The maximal duplicated-span frame (doc_id, island, ss, se) shared
    * by [[dedupSpanExcise]] (per-doc census) and [[dedupSpanExtents]]
    * (the span table itself). */
  private def spanIslands(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val W = 50
    val St = 10
    val wins = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= W)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          expr(s"(length(text) - $W) div $St").cast("int"))).as("i"))
      .select(col("doc_id"), col("i"),
        graft.functions.exprs.md5Lower64(
          expr(s"substring(text, i * $St + 1, $W)")).as("h"))
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("h"))
    // duplicated windows as [start, end) char intervals; the dup-hash
    // set joins back without a broadcast hint (dedupSubstringSpans'
    // AQE rationale — unbounded on boilerplate-heavy corpora)
    val dw = wins.join(dup, Seq("h"), "left_semi")
      .select(col("doc_id"), (col("i") * St).cast("long").as("s"),
        (col("i") * St + W).cast("long").as("e"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    dw
      .withColumn("_pme", max(col("e")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new",
        when(col("_pme").isNull || col("s") > col("_pme"), 1).otherwise(0))
      .withColumn("island", sum(col("_new")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("ss"), max(col("e")).as("se"))
  }

  /** The maximal (start, end) duplicated-span TABLE itself — the
    * actionable output of substring-level dedup (what a cleaning job
    * feeds to `substring` excision): every coalesced span per doc with
    * its char extent. Same pipeline as [[dedupSpanExcise]] up to the
    * island merge; emitted per span instead of rolled up per doc. */
  def dedupSpanExtents(s: SparkSession, d: String): DataFrame =
    spanIslands(s, d)
      .select(col("doc_id"), col("ss").as("span_start"),
        col("se").as("span_end"),
        (col("se") - col("ss")).as("span_chars"))
      .orderBy(col("doc_id"), col("span_start"))

  def dedupSpanExcise(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    spanIslands(s, d)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("se") - col("ss")).as("chars_removed"))
      .join(docs.select(col("doc_id"),
        length(col("text")).cast("long").as("_len")), Seq("doc_id"))
      .select(col("doc_id"), col("n_spans"), col("chars_removed"),
        (col("_len") - col("chars_removed")).as("chars_kept"))
      .orderBy(col("doc_id"))
  }

  /** Hybrid retrieval fusion — reciprocal-rank fusion (k=60) of the
    * lexical BM25 ranking ([[textBm25Rank]]'s model, widened to
    * top-20) and a semantic exact-cosine ranking (query = vec_id 0's
    * embedding over the corpus, the [[annBruteTopK]] kernel): the
    * standard RAG-stack retrieval shape. Both input rankings are
    * integer ranks from already-oracle-verified orderings, and the RRF
    * score 1/(60+r) is a single exactly-rounded IEEE division per
    * list, so the fused ranking is a pure SQL replay. Scale shape: the
    * two top-k lists are k-row frames (TakeOrderedAndProject on each
    * side), the fusion is a k-row full outer join — nothing here
    * scales with the corpus beyond the two scoring passes. */
  def textHybridRrf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = 20
    val rrfK = 60
    // lexical: BM25 over the fixed 3-term query, top-20 with ranks
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
    val perDoc = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"),
        count(when(col("w") === "spark", 1)).as("tf_a"),
        count(when(col("w") === "vector", 1)).as("tf_b"),
        count(when(col("w") === "stream", 1)).as("tf_c"))
    val model = perDoc.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"),
      count(when(col("tf_a") > 0, 1)).as("df_a"),
      count(when(col("tf_b") > 0, 1)).as("df_b"),
      count(when(col("tf_c") > 0, 1)).as("df_c"))
    def contrib(tf: org.apache.spark.sql.Column,
        dfc: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val idf = log(lit(1.0) +
        (col("n_docs") - dfc + lit(0.5)) / (dfc + lit(0.5)))
      val tfd = tf.cast("double")
      val norm = lit(1.2) * (lit(0.25) +
        lit(0.75) * (col("dl").cast("double") /
          (col("tot").cast("double") / col("n_docs"))))
      when(tf > 0, idf * (tfd * lit(2.2) / (tfd + norm))).otherwise(lit(0.0))
    }
    val lex = perDoc.crossJoin(broadcast(model))
      .withColumn("score", round(
        contrib(col("tf_a"), col("df_a")) +
          contrib(col("tf_b"), col("df_b")) +
          contrib(col("tf_c"), col("df_c")), 4))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(K)
      .withColumn("lex_rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lex_rnk"))
    // semantic: exact cosine of every corpus vector against vec_id 0
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("_e"))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("_e").as("_qe"))
    val sem = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(Ann.cosine(col("_qe"), col("_e")), 4))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(K)
      .withColumn("sem_rnk", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("sem_rnk"))
    // fusion: RRF with the standard k=60 constant; the 20-row lists
    // full-outer join on doc id (documents and embeddings share the
    // id space: vec_id i is doc i's embedding)
    val rrf =
      coalesce(lit(1.0) / (lit(rrfK) + col("lex_rnk")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK) + col("sem_rnk")), lit(0.0))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score", round(rrf, 6))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(10)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rrf_score").desc, col("doc_id"))).cast("long"))
      .select(col("rnk"), col("doc_id"),
        coalesce(col("lex_rnk"), lit(-1L)).as("lex_rnk"),
        coalesce(col("sem_rnk"), lit(-1L)).as("sem_rnk"),
        col("rrf_score"))
      .orderBy(col("rnk"))
  }

  /** Multimodal REAL lossy image codec — JPEG roundtrip through
    * `javax.imageio` (the lossy twin of [[multimodalPngCodec]]): each
    * doc's deterministic grayscale image is encoded to genuine JPEG
    * bytes (DCT + quantization at explicit quality 0.95) and decoded
    * back per-partition. JPEG is lossy, so the pixel values cannot be
    * oracle-replayed; the contract is decoded DIMENSIONS (exact — a
    * corrupted header or mis-decoded container fails loudly) plus
    * BOUNDED pixel error flags the oracle predicts TRUE (measured
    * worst case over the generator family: max |Δ| = 7, mean ≤ 1.86;
    * bounds 16 / 4.0 are 2× headroom without being vacuous). Same
    * mapPartitions codec seam; map-only at any corpus size. */
  def multimodalJpegCodec(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // spread ids across cores before the codec map (r17: the
      // single-split scan otherwise serializes the whole kernel on
      // one task — see multimodalVideoScenecut's note)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodeJpeg(id)
        val (w, h, maxD, sumD) = graft.mm.Codecs.decodeJpegDelta(bytes, id)
        (id, w.toLong, h.toLong, maxD <= 16L,
          sumD.toDouble / (w * h) <= 4.0)
      })
      .toDF("doc_id", "width", "height", "max_delta_ok", "mean_delta_ok")
      .orderBy(col("doc_id"))
  }

  /** INCREMENTAL cluster maintenance — the missing half of
    * [[dedupIncremental]] (which classifies a batch but leaves the
    * persisted cluster labels stale): fold the batch's verified
    * near-dup edges into the existing corpus clustering WITHOUT
    * re-clustering the corpus. The persisted labels stand in as the
    * old-corpus components; the batch contributes (a) batch↔corpus
    * edges from the LSH cross-probe and (b) batch↔batch edges from
    * banding the batch alone — both exact-verified on true shingle
    * Jaccard ≥ 0.5. The relabel graph contracts every old cluster to
    * its keeper, so its size is bounded by |batch| + batch-touched
    * clusters, never the corpus ([[graft.dedup.Components
    * .incrementalKeepers]]). Contracted output = the full re-cluster
    * of the unioned corpus — [[dedupClusters]]' oracle, shared
    * verbatim, which PROVES the incremental fold equals the batch
    * rebuild. */
  def dedupIncrementalClusters(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    // ONE cached shingle+signature index per side feeds all three edge
    // stages (old pairs, batch pairs, cross-probe + its verification)
    // — without this the corpus slice re-shingles once per stage
    val (shOld, sigsOld) = MinHashLSH.index(old, "doc_id", "text")
    val (shBatch, sigsBatch) = MinHashLSH.index(batch, "doc_id", "text")
    // persisted old-corpus clustering (stand-in for the stored labels)
    val oldLabels = graft.dedup.Components.keepers(
      MinHashLSH.verifiedPairsFrom(shOld, sigsOld, minJaccard = 0.5))
    // batch↔batch verified edges: the batch banded + verified alone
    val batchPairs = MinHashLSH
      .verifiedPairsFrom(shBatch, sigsBatch, minJaccard = 0.5)
      .select(col("id_a"), col("id_b"))
    // batch↔corpus verified edges: cross-probe candidates verified on
    // true Jaccard (dedupIncremental's near path, kept as edges)
    val crossPairs = MinHashLSH.crossCandidates(sigsOld, sigsBatch)
      .join(shBatch.select(col("id").as("new_id"), col("_sh").as("_shn")),
        "new_id")
      .join(shOld.select(col("id").as("old_id"), col("_sh").as("_sho")),
        "old_id")
      .filter(size(array_intersect(col("_shn"), col("_sho")))
        .cast("double") /
        size(array_union(col("_shn"), col("_sho"))) >= 0.5)
      .select(col("new_id").as("id_a"), col("old_id").as("id_b"))
    graft.dedup.Components.incrementalKeepers(oldLabels,
        batchPairs.unionByName(crossPairs))
      .orderBy(col("id"))
  }

  /** Theta-sketch set algebra — the capability HLL lacks: theta
    * sketches (KMV) support INTERSECTION and DIFFERENCE, so audience
    * overlap ("users who did A and B / A but not B") is an operation
    * on two fixed-size blobs instead of a |users|-row distinct join.
    * One pass builds a mergeable per-event-type sketch of user_ids
    * ([[graft.functions.Theta]], lgK=14: exact below 16 384 distinct
    * users, ~0.8% rse above); every pair's ∩/∪/\ estimates are then
    * column ops over the 5-row sketch table. A theta sketch is a pure
    * set function (the k smallest hashes), so the estimates are
    * deterministic across partitionings AND exact at gate scales —
    * the oracle computes the exact pair overlaps in SQL and predicts
    * every within-2%-of-|A∪B| flag TRUE. At 100 TB the per-shard
    * sketches merge associatively like [[hllMerge]]'s, and overlap
    * questions never re-scan the corpus. */
  def thetaSetOps(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Theta
    val ev = Tables.events(s, d).select(col("event_type"), col("user_id"))
    val sk = ev.groupBy(col("event_type"))
      .agg(Theta.sketch(col("user_id"), 14).as("sk"),
        countDistinct(col("user_id")).as("n"))
    val pairs = sk
      .select(col("event_type").as("type_a"), col("sk").as("sk_a"),
        col("n").as("n_a"))
      .join(sk.select(col("event_type").as("type_b"), col("sk").as("sk_b"),
        col("n").as("n_b")), col("type_a") < col("type_b"))
    val du = ev.distinct()
    val exact = du.select(col("event_type").as("type_a"), col("user_id"))
      .join(du.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_and_exact"))
    val nOr = col("n_a") + col("n_b") - col("n_and_exact")
    val tol = nOr.cast("double") * 0.02 + 0.5
    pairs.join(exact, Seq("type_a", "type_b"), "left_outer")
      .na.fill(0L, Seq("n_and_exact"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_and_exact"),
        nOr.as("n_or_exact"),
        (abs(Theta.intersectEst(col("sk_a"), col("sk_b"))
          - col("n_and_exact")) <= tol).as("and_ok"),
        (abs(Theta.unionEst(col("sk_a"), col("sk_b")) - nOr) <= tol)
          .as("or_ok"),
        (abs(Theta.aNotBEst(col("sk_a"), col("sk_b"))
          - (col("n_a") - col("n_and_exact"))) <= tol).as("diff_ok"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** KLL quantile-sketch merge — the quantile twin of [[hllMerge]]'s
    * cross-shard story, filling the gap Spark's SQL surface leaves
    * (hll_sketch_agg ships for distinct counts; nothing mergeable
    * ships for quantiles): each source builds its own
    * [[graft.functions.KllSketchAgg]] over document lengths (a few kB
    * regardless of shard size), the per-shard sketches UNION
    * associatively ([[graft.functions.KllMergeAgg]]), and any
    * quantile of the whole corpus is a sketch read — across
    * shards/days/reruns without re-scanning, which exact `percentile`
    * fundamentally cannot do. KLL compaction is randomized (not
    * replayable), so the contract is the strongest checkable one: the
    * TRUE rank of each merged estimate, computed exactly with one
    * corpus pass against the broadcast 1-row estimate frame, must sit
    * within ±2% of its target — vs the sketch's ~0.6% guarantee at
    * k=800 (3σ headroom). Exact quantile values ride along for the
    * oracle's value check. */
  def kllQuantileMerge(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Kll
    val docs = Tables.documents(s, d)
      .select(col("source"), col("n_chars").cast("double").as("v"))
    val perSrc = docs.groupBy(col("source"))
      .agg(Kll.sketch(col("v"), 800).as("sk"))
    val merged = perSrc
      .agg(Kll.merge(col("sk"), 800).as("sk"),
        count(lit(1)).as("n_sources"))
      .select(col("n_sources"),
        Kll.quantile(col("sk"), 0.25).as("e25"),
        Kll.quantile(col("sk"), 0.50).as("e50"),
        Kll.quantile(col("sk"), 0.90).as("e90"),
        Kll.quantile(col("sk"), 0.99).as("e99"))
    def rankOf(est: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(when(col("v") <= est, 1L).otherwise(0L)).cast("double") /
        count(lit(1))
    docs.crossJoin(broadcast(merged))
      .agg(count(lit(1)).as("n_rows"),
        first(col("n_sources")).as("n_sources"),
        round(expr("percentile(v, 0.25)"), 4).as("exact_p25"),
        round(expr("percentile(v, 0.5)"), 4).as("exact_p50"),
        round(expr("percentile(v, 0.9)"), 4).as("exact_p90"),
        round(expr("percentile(v, 0.99)"), 4).as("exact_p99"),
        (abs(rankOf(col("e25")) - 0.25) <= 0.02).as("r25_within_2pct"),
        (abs(rankOf(col("e50")) - 0.50) <= 0.02).as("r50_within_2pct"),
        (abs(rankOf(col("e90")) - 0.90) <= 0.02).as("r90_within_2pct"),
        (abs(rankOf(col("e99")) - 0.99) <= 0.02).as("r99_within_2pct"))
  }

  /** Rolling distinct via MERGEABLE daily sketches — the
    * recompute-free scale answer to rolling window distincts (the
    * exact variant is `q_rolling_wau`): one HLL sketch per day is
    * built ONCE, and any window is a cheap union of daily sketches —
    * at 100 TB the daily pass never re-reads history and a 7-day (or
    * 90-day) window costs |days| sketch merges, not a re-scan. Output
    * pins each day's exact 7-day distinct alongside the sketch
    * estimate's 5% envelope, so the oracle value-verifies the exact
    * path and the invariant the sketches must satisfy. */
  def rollingHllWau(s: SparkSession, d: String): DataFrame = {
    // `div` (integral), not `/` (double division in Spark SQL)
    val days = Tables.events(s, d)
      .select(expr("unix_timestamp(ts) div 86400").as("day"),
        col("user_id"))
    // lgConfigK=16 (64 KiB/day sketch): std-err ≈ 1.04/√2¹⁶ ≈ 0.41%,
    // so the asserted 5% envelope sits ~12σ out — the probabilistic
    // bound can't realistically fail the gate (default lgK=12 is
    // ~1.6%, only ~3σ: an envelope escape across hundreds of
    // window-days would be statistically plausible)
    val daily = days.groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id, 16)").as("sk"))
    // explode each daily sketch to the ≤7 window-end days it serves:
    // the merge fan-out is bounded by the window, never by history
    val contrib = daily.select(col("day"),
        explode(sequence(col("day"), col("day") + 6)).as("w_day"),
        col("sk"))
      .join(daily.select(col("day").as("w_day")).distinct(), Seq("w_day"))
    val est = contrib.groupBy(col("w_day"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = days
      .select(explode(sequence(col("day"), col("day") + 6)).as("w_day"),
        col("user_id"))
      .join(daily.select(col("day").as("w_day")).distinct(), Seq("w_day"))
      .groupBy(col("w_day"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(est, Seq("w_day"))
      .select(col("w_day").as("day"), col("n_exact"),
        (abs(col("est") - col("n_exact")) / col("n_exact") <= 0.05)
          .as("within_5pct"))
      .orderBy(col("day"))
  }

  /** Count-min-sketch heavy hitters: one fixed-size mergeable sketch
    * (4×256 counters, [[graft.functions.CountMinSketch]]) over the
    * lineitem supplier stream, then the exact top-10 suppliers each
    * read their estimate back out of the sketch with pure column
    * arithmetic (`element_at` at the md5-salted bucket). The output
    * carries exact count, sketch estimate, and the never-underestimate
    * invariant; the oracle reconstructs every counter from the same
    * md5 hashes, so the ESTIMATES are value-verified, not just
    * bounded. At scale: the sketch shuffles 8 kB per partition
    * (map-side merged) where an exact per-key table shuffles |keys| —
    * the monitoring-loop primitive for skew/hot-key detection. */
  def countMinTopK(s: SparkSession, d: String): DataFrame = {
    import graft.functions.{exprs, CountMinSketch}
    val (dep, w) = (4, 256)
    val li = Tables.lineitem(s, d)
    val sketch = li.agg(CountMinSketch.sketch(col("l_suppkey"), dep, w)
      .as("sk"))
    val top = li.groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("s_suppkey")).limit(10)
    val est = least((0 until dep).map { r =>
      element_at(col("sk"),
        (lit(r * w) + pmod(exprs.md5Lower64(
          concat(lit(s"$r|"), col("s_suppkey").cast("string")))
          .bitwiseAND(lit(Long.MaxValue)), lit(w.toLong))).cast("int") + 1)
    }: _*)
    top.crossJoin(broadcast(sketch))
      .select(col("s_suppkey"), col("n_exact"), est.as("est"),
        (est >= col("n_exact")).as("never_under"))
      .orderBy(col("n_exact").desc, col("s_suppkey"))
  }

  /** Embedding near-dup candidate generation at corpus scale: LSH
    * sign-bucket the vectors (codegen'd `LshCodeExpr`, 8 hyperplanes),
    * generate pairs only WITHIN buckets, score them with exact cosine,
    * and report each multi-member bucket's density (members, pairs,
    * max pairwise cosine). This is the not-all-pairs shape —
    * |corpus|²/2^planes expected pair work instead of |corpus|² — that
    * [[dedupEmbedCos]]'s adjacent-pair kernel deliberately avoids
    * claiming; together they are the kernel and the scale harness.
    * The oracle folds the deterministic hyperplanes into SQL and
    * replays bucketing, pair-gen, and scoring exactly. */
  def dedupEmbedBuckets(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("_e"))
      .withColumn("bucket", Ann.lshCode(col("_e"), 8, 64))
    val sizes = emb.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs")).filter(col("n_vecs") >= 2)
    val a = emb.select(col("bucket"), col("vec_id").as("id_a"),
      col("_e").as("_ea"))
    val b = emb.select(col("bucket"), col("vec_id").as("id_b"),
      col("_e").as("_eb"))
    val pairs = a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(Ann.cosine(col("_ea"), col("_eb")), 4))
    val agg = pairs.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"), max(col("cos")).as("max_cos"))
    sizes.join(agg, Seq("bucket")).orderBy(col("bucket"))
  }

  /** Approximate k-NN GRAPH over the embedding corpus — the
    * graph-construction primitive under embedding clustering,
    * label propagation, and graph-based dedup: every vector's top-3
    * neighbors among its LSH-bucket peers (8 deterministic
    * hyperplanes, [[graft.sim.Ann.lshCode]]), exact-cosine re-ranked.
    * This is the self-join shape [[dedupEmbedBuckets]] bounds —
    * |corpus|²/2^planes expected pair work — emitted as an adjacency
    * list instead of bucket stats. Ranking is on integer
    * basis-point cosine (floor(cos·1e4+0.5): multiply/add/floor are
    * exactly-rounded IEEE ops, identical cross-engine) with
    * neighbor-id tie-break, so the top-3 cut is deterministic and the
    * window top-k rewrites to the bounded-heap aggregate. The oracle
    * folds the hyperplanes as literals and replays bucketing, pair
    * generation, scoring, and ranking. */
  def embedKnnGraph(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("_e"))
      .withColumn("bucket", Ann.lshCode(col("_e"), 8, 64))
    val a = emb.select(col("bucket"), col("vec_id"), col("_e").as("_ea"))
    val b = emb.select(col("bucket"), col("vec_id").as("nbr_id"),
      col("_e").as("_eb"))
    val scored = a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        floor(Ann.cosine(col("_ea"), col("_eb")) * 1e4 + 0.5)
          .cast("long").as("cos_bp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cos_bp").desc, col("nbr_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("vec_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("cos_bp"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** Embedding-space near-dup CLUSTERS — the SemDeDup-shaped
    * grouping built on [[embedKnnGraph]]: mutual-kNN edges (a and b
    * each in the other's LSH-bucket top-3 — the parameter-free
    * criterion that works even when no absolute cosine threshold
    * separates dups, as with this corpus's max pairwise cos ≈ 0.48)
    * resolved to connected components with a keeper per vector. The
    * mutual filter is one self-join of the ≤3·|corpus|-row adjacency
    * (reciprocity is the standard symmetrization that kills LSH
    * one-way artifacts); components run on the resulting ≤1.5·|corpus|
    * edges via the same pointer-jumping [[graft.dedup.Components]] the
    * text family uses. Oracle: the embed_knn_graph hyperplane-folded
    * replay extended with the mutual join and a recursive-CTE
    * components pass. */
  def dedupEmbedClusters(s: SparkSession, d: String): DataFrame = {
    val knn = embedKnnGraph(s, d).select(col("vec_id"), col("nbr_id"))
    val mutual = knn.select(col("vec_id").as("_a1"), col("nbr_id").as("_b1"))
      .join(knn.select(col("vec_id").as("_b1"), col("nbr_id").as("_a1")),
        Seq("_a1", "_b1"))
      .filter(col("_a1") < col("_b1"))
      .select(col("_a1").as("id_a"), col("_b1").as("id_b"))
    graft.dedup.Components.keepers(mutual)
      .orderBy(col("id"))
  }

  /** Deterministic hash-stratified sampling: per-source keep rates
    * decided by md5-lower-64 of the doc id — reproducible across runs,
    * engines (the oracle replays it via `md5_number_lower`), and
    * cluster topologies, unlike `rand()`-based sampling. The 31-bit
    * mask keeps the modulus in non-negative territory on both the
    * signed (Spark) and unsigned (DuckDB) reading of the hash. */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val pct = when(col("source").isin("src0", "src1", "src2", "src3", "src4"),
      lit(50)).otherwise(lit(20))
    Tables.documents(s, d)
      .withColumn("_h",
        graft.functions.exprs.md5Lower64(col("doc_id").cast("string"))
          .bitwiseAND(lit(2147483647L)) % 100)
      .filter(col("_h") < pct)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic per-epoch training order — the shuffle a trainer
    * streams each epoch without ever materializing a permutation: for
    * epoch e every doc's order key is the 50-bit
    * md5(doc_id:e) and its shard is `key % 16`, so shard assignment is
    * a MAP-ONLY pass (the hash IS the order — no global sort at any
    * scale) and writers just range-partition the key space within a
    * shard. Different epochs draw independent permutations from the
    * same corpus with zero extra state. Emits the per-(epoch, shard)
    * manifest: row count, the shard's first doc in shuffle order, and
    * its minimum key. The epochs frame is broadcast (3 rows); the only
    * shuffle is the |epochs×shards|-bounded rollup. */
  def dataEpochShuffle(s: SparkSession, d: String): DataFrame = {
    val epochs = s.range(3).select(col("id").as("epoch"))
    Tables.documents(s, d).select(col("doc_id"))
      .crossJoin(broadcast(epochs))
      .withColumn("k",
        graft.functions.exprs.md5Lower64(
            concat(col("doc_id").cast("string"), lit(":"),
              col("epoch").cast("string")))
          .bitwiseAND(lit((1L << 50) - 1)))
      .withColumn("shard", col("k") % 16)
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min_by(col("doc_id"), struct(col("k"), col("doc_id")))
          .as("first_doc"),
        min(col("k")).as("min_key"))
      .orderBy(col("epoch"), col("shard"))
  }

  /** Deterministic per-group reservoir sample: the k docs per source
    * with the lowest md5(doc_id) — a uniform-at-random draw that is
    * reproducible across runs, engines, and cluster topologies (no
    * rand()). Plans as the bounded-heap window top-k (RewriteWindowTopK
    * applies), so each partition forwards ≤k rows per group — the only
    * per-group sampling shape that survives 100 TB. */
  def sampleReservoir(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // score = NEGATED 50-bit hash as double: lowest-hash-first becomes
    // the (score DESC, id ASC) shape RewriteWindowTopK turns into the
    // bounded-heap aggregate. 50 bits keeps the long→double conversion
    // exact (< 2^53); doc_id breaks the (negligible) collisions.
    val w = Window.partitionBy(col("source"))
      .orderBy(col("_score").desc, col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        // coalesce-with-literal makes _score non-nullable BY TYPE (the
        // branch never fires: doc_id is filtered non-null below), which
        // together with the doc_id isNotNull constraint proves the
        // null-safety the rewrite demands — parquet attrs are nullable
        coalesce((graft.functions.exprs.md5Lower64(col("doc_id").cast("string"))
          .bitwiseAND(lit((1L << 50) - 1)) * -1).cast("double"), lit(0.0))
          .as("_score"))
      .filter(col("doc_id").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("source"), col("rn").cast("long").as("rn"), col("doc_id"))
      .orderBy(col("source"), col("rn"))
  }

  /** Asymmetric n-gram containment |A∩B|/|A| on adjacent-id pairs —
    * catches sub-document duplication (one doc embedded in another)
    * that symmetric Jaccard under-scores. */
  def dedupContainment(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.exprs.shingles(col("text"), 3).as("sh"))
      .cache()
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("_sa"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("_sb"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .filter(size(col("_sa")) > 0 && size(col("_sb")) > 0)
      .withColumn("_i", size(array_intersect(col("_sa"), col("_sb"))))
      .select(col("doc_a"), col("doc_b"),
        round(col("_i").cast("double") / size(col("_sa")), 4).as("contain_a"),
        round(col("_i").cast("double") / size(col("_sb")), 4).as("contain_b"))
      .orderBy(col("doc_a"))
  }

  /** Benchmark-contamination probe: shared 3-grams between each corpus
    * doc and a benchmark set (docs 0-9 here). The benchmark n-gram set
    * is one broadcast array — the corpus never shuffles, the standard
    * decontamination shape for training data at scale. */
  def textContamination(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bench = docs.filter(col("doc_id") < 10)
      .select(explode(graft.functions.exprs.shingles(col("text"), 3)).as("g"))
      .agg(collect_set(col("g")).as("bg"))
    docs.crossJoin(broadcast(bench))
      .select(col("doc_id"),
        size(array_intersect(graft.functions.exprs.shingles(col("text"), 3),
          col("bg"))).as("n_shared"))
      .withColumn("contaminated", col("n_shared") >= 5)
      .orderBy(col("doc_id"))
  }

  /** Bigram association strength by document-frequency lift:
    * lift(x,y) = N · df(xy) / (df(x) · df(y)), the collocation /
    * boilerplate-phrase probe. Exact integer-derived arithmetic (no
    * logs), so the oracle reproduces it bit-for-bit. Two shuffles
    * (bigram count + unigram count), top-k via TakeOrdered. */
  def textBigramLift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).cache()
    val n = docs.select(count(lit(1)).as("n_docs"))
    val uni = docs
      .select(explode(graft.functions.exprs.shingles(col("text"), 1)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("df_w"))
    val bi = docs
      .select(explode(graft.functions.exprs.shingles(col("text"), 2)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("df_xy"))
      .filter(col("df_xy") >= 5)
      .withColumn("x", split(col("b"), " ").getItem(0))
      .withColumn("y", split(col("b"), " ").getItem(1))
    bi
      .join(uni.select(col("w").as("x"), col("df_w").as("df_x")), Seq("x"))
      .join(uni.select(col("w").as("y"), col("df_w").as("df_y")), Seq("y"))
      .crossJoin(broadcast(n))
      .select(col("b").as("bigram"), col("df_xy"),
        round(col("n_docs") * col("df_xy").cast("double") /
          (col("df_x") * col("df_y")), 4).as("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(20)
  }

  /** Per-document top term by log-free TF-IDF (tf · N / df): the
    * keyword/topic probe. Integer-derived arithmetic keeps the oracle
    * bit-exact; the per-doc argmax is a deterministic window top-1. */
  def textTfidfTop(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val n = docs.select(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df_w"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("w"))
    tf.join(df, "w").crossJoin(broadcast(n))
      .withColumn("score",
        round((col("tf") * col("n_docs")).cast("double") / col("df_w"), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("w").as("top_term"), col("score"))
      .orderBy(col("doc_id"))
  }

  /** BM25 retrieval ranking for a fixed 3-term query — the lexical
    * scorer every contamination/retrieval pipeline needs beside the
    * embedding ANN family. Classic Robertson k1=1.2 / b=0.75 with the
    * +1 idf (always positive). Per-doc term frequencies and lengths
    * are one token-keyed aggregation; the 3 document frequencies
    * reduce to ONE broadcast row, so the corpus never shuffles for
    * the model — the scoring pass is map-only. The three term
    * contributions are summed in FIXED literal order (conditional-agg
    * pivot, not a per-term rollup) and every non-log step is
    * exactly-rounded IEEE arithmetic with identical expression trees
    * in the oracle, so the rounded scores agree cross-engine; the
    * top-10 is `orderBy.limit` (TakeOrderedAndProject — per-partition
    * heads merge, no global sort). */
  def textBm25Rank(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
    val perDoc = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"),
        count(when(col("w") === "spark", 1)).as("tf_a"),
        count(when(col("w") === "vector", 1)).as("tf_b"),
        count(when(col("w") === "stream", 1)).as("tf_c"))
    val model = perDoc.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"),
      count(when(col("tf_a") > 0, 1)).as("df_a"),
      count(when(col("tf_b") > 0, 1)).as("df_b"),
      count(when(col("tf_c") > 0, 1)).as("df_c"))
    def contrib(tf: org.apache.spark.sql.Column,
        dfc: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val idf = log(lit(1.0) +
        (col("n_docs") - dfc + lit(0.5)) / (dfc + lit(0.5)))
      val tfd = tf.cast("double")
      val norm = lit(1.2) * (lit(0.25) +
        lit(0.75) * (col("dl").cast("double") /
          (col("tot").cast("double") / col("n_docs"))))
      when(tf > 0, idf * (tfd * lit(2.2) / (tfd + norm))).otherwise(lit(0.0))
    }
    perDoc.crossJoin(broadcast(model))
      .withColumn("score", round(
        contrib(col("tf_a"), col("df_a")) +
          contrib(col("tf_b"), col("df_b")) +
          contrib(col("tf_c"), col("df_c")), 4))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))))
      .select(col("rnk").cast("long").as("rnk"), col("doc_id"),
        col("dl"), col("score"))
      .orderBy(col("rnk"))
  }

  /** The BPE-training inner loop at corpus scale: count adjacent
    * CHARACTER pairs inside words and rank the top-20 merge
    * candidates — the statistic a byte-pair-encoding tokenizer
    * trainer recomputes every merge round (this is one round; the
    * trainer loops it with the winning pair merged). One
    * explode→count shuffle, partial-aggregable (map-side combine
    * collapses each partition to its |pair-vocab| counts before the
    * exchange), top-20 via `orderBy.limit`. Distinct from
    * [[textBigramLift]], which scores WORD co-occurrence. */
  def textBpePairs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)

  /** Iterative BPE TRAINER — [[textBpePairs]]' one-round statistic
    * promoted to the actual tokenizer-training inner loop: count
    * adjacent symbol pairs → merge the top pair → re-segment, for 6
    * rounds. The corpus collapses FIRST to the word-frequency table
    * (the classic BPE training representation — |vocab| rows, bounded
    * by the language, not the corpus), so every round's pair count is
    * a rollup over vocab rows weighted by `cnt` and every merge is a
    * map over the same tiny frame; `localCheckpoint` per round bounds
    * lineage exactly like the q_kcore/Components folds, and the ONLY
    * driver state is the 1-row argmax per round (the dbscan-radius
    * precedent) — the corpus never leaves the cluster. Words ride a
    * \u0001-delimited symbol string ('␁c␁a␁t␁'), so a merge is ONE
    * `replace` of '␁a␁b␁' with '␁ab␁' — and the merge CONTRACT is
    * exactly replace()'s left-to-right non-overlapping scan, which
    * Spark (UTF8String.replace) and DuckDB (replace) implement
    * identically: a chain of occurrences sharing a delimiter defers
    * its tail to a later round, deterministically on both engines.
    * Top-pair tie-break is (count desc, lhs, rhs). The oracle unrolls
    * the same 6 rounds as chained CTEs — constant-folded, no
    * recursion, value-exact. */
  def textBpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    bpeFold(s, d, 6)._2.toDF("round", "lhs", "rhs", "pair_count")
      .orderBy(col("round"))
  }

  private val BpeDelim = "\u0001"

  /** The shared BPE fold: word-frequency vocab -> `rounds` iterations
    * of (pair count -> argmax -> merge). Returns the fully merged vocab
    * frame (w: delimited symbol string, cnt) and the merge table. */
  private def bpeFold(s: SparkSession, d: String, rounds: Int)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    val delim = BpeDelim
    var vocab = Tables.documents(s, d)
      .select(explode(TextOps.tokens(col("text"))).as("w0"))
      .filter(col("w0").rlike("^[a-z]+$") && length(col("w0")) >= 2)
      .groupBy(col("w0")).agg(count(lit(1)).as("cnt"))
      .select(concat(lit(delim),
        regexp_replace(col("w0"), "(.)", "$1" + delim)).as("w"), col("cnt"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (r <- 1 to rounds) {
      val top = vocab
        .select(expr(s"filter(split(w, '$delim'), x -> x <> '')").as("s"),
          col("cnt"))
        .select(explode(expr(
          """transform(sequence(1, size(s) - 1),
            |  i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))"""
            .stripMargin)).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect().head
      val (a, b, n) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((r.toLong, a, b, n))
      vocab = vocab
        .withColumn("w", regexp_replace(col("w"),
          java.util.regex.Pattern.quote(delim + a + delim + b + delim),
          java.util.regex.Matcher.quoteReplacement(delim + a + b + delim)))
        .localCheckpoint(true)
    }
    (vocab, merges.toSeq)
  }

  /** The tokenizer ENCODE step — apply the 6 trained merges
    * ([[textBpeTrain]]'s table) and report the resulting segmentation:
    * top-20 emitted tokens by corpus frequency, with the number of
    * distinct words each token appears in. Shares [[bpeFold]], so the
    * applied merges are BY CONSTRUCTION the trained ones (production
    * splits this: train once, persist the merge table, encode shards
    * map-only — which is exactly what the fold's per-round literal
    * replaces are); the census is one explode→rollup over the
    * |vocab|-row frame, corpus counts riding the `cnt` weights. */
  def textBpeApply(s: SparkSession, d: String): DataFrame = {
    val vocab = bpeFold(s, d, 6)._1
    vocab
      .select(explode(expr(
        s"filter(split(w, '$BpeDelim'), x -> x <> '')")).as("tok"),
        col("cnt"))
      .groupBy(col("tok"))
      .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_words"))
      .orderBy(col("n_tokens").desc, col("tok"))
      .limit(20)
  }

  /** Tokenizer FERTILITY report — the QA metric a tokenizer ships
    * with: after applying the 6 trained merges, how many tokens does a
    * word cost? One row: word/instance/token counts, mean fertility
    * (tokens per word instance), instance-weighted single-token share,
    * the exact instance-weighted p90 token count (smallest t with
    * cum·10 ≥ 9·total — pure integer comparison, no float quantile),
    * and the max. Shares [[bpeFold]]; the histogram is ≤ max-word-len
    * rows, so the cumulative window is trivial, and every ratio is a
    * final micro-fixed division of identical integers. */
  def textTokenizerFertility(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = bpeFold(s, d, 6)._1
    val hist = vocab
      .select(expr(s"size(filter(split(w, '$BpeDelim'), x -> x <> ''))")
        .cast("long").as("t"), col("cnt"))
      .groupBy(col("t"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("nw"))
    val wOrd = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    hist
      .withColumn("cum", sum(col("n")).over(wOrd))
      .withColumn("tot", sum(col("n")).over(wAll))
      .agg(sum(col("nw")).as("n_words"),
        first(col("tot")).as("n_instances"),
        sum(col("t") * col("n")).as("n_tokens"),
        (floor(sum(col("t") * col("n")).cast("double") /
          first(col("tot")) * 1e6 + 0.5) / 1e6).as("fertility"),
        (floor(coalesce(sum(when(col("t") === 1L, col("n"))), lit(0L))
          .cast("double") / first(col("tot")) * 1e6 + 0.5) / 1e6)
          .as("single_tok_share"),
        min(when(col("cum") * 10 >= col("tot") * 9, col("t")))
          .as("p90_tokens"),
        max(col("t")).as("max_tokens"))
  }

  /** Class-balanced downsampling — equalize label frequencies before
    * training: every label keeps exactly min-class-size vectors,
    * chosen deterministically by md5-hash order (the portable
    * coin-flip every sampler here uses). The per-label rank is a
    * partitioned window (labels spread across partitions); the
    * min-class size is ONE broadcast row; output is the per-label
    * census plus an id checksum so the oracle verifies the exact
    * selected set, not just counts. */
  def sampleBalanced(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        (graft.functions.exprs.md5Lower64(col("vec_id").cast("string"))
          .bitwiseAND(lit((1L << 50) - 1))).as("h"))
    val m = v.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
      .agg(min(col("n_label")).as("m"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("h"), col("vec_id"))
    v.withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(m))
      .filter(col("rn") <= col("m"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("vec_id")).as("id_checksum"))
      .orderBy(col("label"))
  }

  /** END-TO-END corpus cleaning funnel — the CCNet-style composition a
    * pipeline owner actually ships, expressed as ONE declarative plan:
    * ingest → language filter (metadata) → lexical quality gate
    * (integer distinct-token permille ≥ 400 AND n_chars ≥ 150) →
    * exact dedup (md5 first-occurrence) → boilerplate drop (docs where
    * >50% of their 10-token passages also occur elsewhere in the
    * SURVIVING corpus). Every stage decision is integer/hash
    * arithmetic, so the whole funnel replays in SQL; the output is
    * the per-stage retention census (the report that justifies a
    * cleaning config). Scale: each stage is one keyed
    * shuffle (md5 / passage-hash) or a map — no stage is quadratic,
    * and the passage stats run on stage-4 survivors only. */
  def pipelineCleanFunnel(s: SparkSession, d: String): DataFrame = {
    import graft.functions.exprs
    val s1 = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
    val s2 = s1.filter(col("lang") === "en")
    val s3 = s2
      .withColumn("_toks", TextOps.tokens(col("text")))
      .filter(col("n_chars") >= 150 &&
        expr("""CAST(size(array_distinct(_toks)) AS BIGINT) * 1000
                div CAST(size(_toks) AS BIGINT)""") >= 400)
      .drop("_toks")
    val s4 = s3
      .withColumn("_h", md5(col("text")))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("_h")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1).drop("_h", "_rn")
    // passage stats over the SURVIVING corpus: a passage key seen at
    // >1 (doc, position) is boilerplate
    val pass = s4
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, cast(ceil(size(t) / 10.0) as int) - 1),
          |  i -> array_join(slice(t, i * 10 + 1, 10), ' '))"""
          .stripMargin)).as(Seq("pidx", "passage")))
      .withColumn("pkey", exprs.md5Lower64(col("passage")))
      .drop("passage")
    val keyCounts = pass.groupBy(col("pkey"))
      .agg(count(lit(1)).as("n_occ"))
    val s5 = pass.join(keyCounts, "pkey")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pass"),
        count(when(col("n_occ") > 1, 1)).as("n_boiler"))
      .filter(col("n_boiler") * 2 <= col("n_pass"))
    def census(idx: Int, name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"))
    census(1, "ingest", s1)
      .unionByName(census(2, "lang_en", s2))
      .unionByName(census(3, "quality", s3))
      .unionByName(census(4, "exact_dedup", s4))
      .unionByName(census(5, "boilerplate", s5))
      .orderBy(col("stage_idx"))
  }

  /** Length bucketing — the padding-efficiency step before batching:
    * each document lands in the smallest power-of-two token bucket
    * (32…1024, clamp at the rails) and the per-bucket census carries
    * the exact padded-token waste, the number a batching config is
    * tuned on. Pure integer compares (no log2 on the data path), one
    * partial-aggregable rollup to ≤7 rows. */
  def dataLengthBuckets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("bucket",
        when(col("n_tok") <= 32, 32L).when(col("n_tok") <= 64, 64L)
          .when(col("n_tok") <= 128, 128L).when(col("n_tok") <= 256, 256L)
          .when(col("n_tok") <= 512, 512L).otherwise(1024L))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        sum(least(col("bucket"), greatest(col("bucket") - col("n_tok"),
          lit(0L)))).as("pad_waste"))
      .orderBy(col("bucket"))

  /** Multimodal REAL audio resample — decode → decimate-by-2 (16 kHz →
    * 8 kHz) → re-encode at the halved rate → decode again, all through
    * `javax.sound.sampled`; the reported energy comes from the SECOND
    * decode, proving the full chain, and decimation is index
    * arithmetic so the oracle replays the out-energy from the
    * generator formula. Map-only, same codec seam. */
  def multimodalWavDecimate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // NO id-spread here (r17, measured): javax.sound's provider
      // registry serializes concurrent AudioSystem lookups, so the
      // parallel map CONTENDS and ran ~2-3x slower than the serial
      // single-split scan (wav_codec 0.66 -> 1.54 s etc.) — the WAV
      // keys keep the one-task map; the imageio keys keep the spread.
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodeWav(id)
        val (nOut, rate, energy) = graft.mm.Codecs.decimateWavStats(bytes)
        (id, nOut, rate, energy)
      })
      .toDF("doc_id", "n_samples", "sample_rate", "energy")
      .orderBy(col("doc_id"))
  }

  /** Sequential probability ratio test (Wald SPRT) — the streaming A/B
    * decision rule: walk purchase/click events in event-time order and
    * stop at the FIRST crossing of the log-likelihood boundaries
    * (H0 p=0.3 vs H1 p=0.4 purchase share, α=β=0.05). The cumulative
    * purchase count is a ranged [[graft.ops.Ranks.globalRunningSum]]
    * (exact longs — no single-task walk over the trial sequence);
    * LLR_k = n1·a + (k−n1)·b is two integer-scaled constants, so the
    * crossing decision is deterministic to ~1e-12. Output is the one
    * decision row a dashboard shows: verdict, trials consumed,
    * purchases seen, the LLR at stopping. */
  def qSprtTest(s: SparkSession, d: String): DataFrame = {
    val a = math.log(0.4 / 0.3)
    val b = math.log(0.6 / 0.7)
    val upper = math.log(0.95 / 0.05)
    val lower = math.log(0.05 / 0.95)
    val trials = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("x"))
    val walked = Ranks.globalScan(trials,
        Seq(col("ts_us").asc, col("event_id").asc),
        rank = Some("k"), sums = Seq(col("x") -> "n1"))
      .withColumn("llr",
        col("n1") * lit(a) + (col("k") - col("n1")) * lit(b))
      .filter(col("llr") >= upper || col("llr") <= lower)
    walked
      .agg(min_by(struct(col("k"), col("n1"), col("llr")), col("k"))
        .as("_d"))
      .select(
        when(col("_d.llr") >= upper, "accept_h1")
          .when(col("_d").isNull, "undecided")
          .otherwise("accept_h0").as("decision"),
        coalesce(col("_d.k"), lit(0L)).as("n_trials"),
        coalesce(col("_d.n1"), lit(0L)).as("n_purchases"),
        round(coalesce(col("_d.llr"), lit(0.0)), 4).as("llr"))
  }

  /** Token counting: whitespace + BPE-ish regex classes. */
  def textTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextOps.wsCount(col("text")).as("n_ws"),
        TextOps.bpeishCount(col("text")).as("n_bpe"))
      .orderBy(col("doc_id"))

  /** Quality scoring from cheap surface signals. */
  def textQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("_toks", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("_toks")).cast("long").as("n_tok"),
        round(TextOps.stopCount(col("_toks")).cast("double") /
          size(col("_toks")), 4).as("stop_ratio"),
        round(size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
          .cast("double") / length(col("text")), 4).as("punct_ratio"))
      .withColumn("quality",
        round(least(lit(1.0), col("n_tok") / 200.0) *
          (lit(1.0) - col("stop_ratio")), 4))
      .orderBy(col("doc_id"))

  /** Intra-document repetition ratio — the duplicate-5-gram-fraction
    * quality filter (Gopher-style repetition rule): 1 − distinct/total
    * 5-grams. Pure per-row column arithmetic on the codegen'd shingle
    * kernel; no shuffle at any scale. */
  def textRepetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        greatest(size(TextOps.tokens(col("text"))) - 4, lit(0)).as("_total"),
        size(graft.functions.exprs.shingles(col("text"), 5)).as("_distinct"))
      .select(col("doc_id"),
        col("_total").cast("long").as("n_grams"),
        when(col("_total") > 0,
          round(lit(1.0) - col("_distinct").cast("double") / col("_total"), 4))
          .otherwise(lit(0.0)).as("rep_ratio"))
      .orderBy(col("doc_id"))

  /** Per-document token Shannon entropy — the vocabulary-diversity
    * quality signal (boilerplate and template spam score low). Two
    * narrow shuffles, both keyed and partial-aggregable: (doc, token)
    * counts then per-doc fold of log2(n) − Σ c·log2(c) / n. */
  def textEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("_n"),
        sum(col("c").cast("double") * log2(col("c"))).as("_s"))
      .select(col("doc_id"),
        col("_n").cast("long").as("n_tokens"),
        round(log2(col("_n")) - col("_s") / col("_n"), 4).as("entropy"))
      .orderBy(col("doc_id"))

  /** PII scrubbing: count and redact email/phone patterns. The corpus
    * is word salad, so deterministic synthetic PII is injected per doc
    * first — the scrub machinery (regexp count + nested redact) is
    * real, and the oracle replays injection and scrub exactly. Per-row
    * regex work, embarrassingly parallel at any scale. */
  def textPiiScrub(s: SparkSession, d: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val phone = "\\d{3}-\\d{4}"
    val withPii = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("t"))
    withPii.select(col("doc_id"),
      regexp_count(col("t"), lit(email)).cast("long").as("n_emails"),
      regexp_count(col("t"), lit(phone)).cast("long").as("n_phones"),
      length(regexp_replace(regexp_replace(col("t"), email, "<EMAIL>"),
        phone, "<PHONE>")).cast("long").as("scrubbed_len"))
      .orderBy(col("doc_id"))
  }

  /** Stopword-marker language ID (n-gram heuristic family). */
  def textLangid(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .withColumn("_toks", TextOps.tokens(lower(col("text"))))
    val withScores = TextOps.langMarkers.foldLeft(base) {
      case (df, (lang, markers)) =>
        df.withColumn(s"s_$lang", TextOps.markerCount(col("_toks"), markers))
    }
    withScores
      .withColumn("guess",
        when(col("s_en") > 0 && col("s_en") >= col("s_de") &&
          col("s_en") >= col("s_fr") && col("s_en") >= col("s_es"), "en")
          .when(col("s_de") > 0 && col("s_de") >= col("s_fr") &&
            col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") > 0 && col("s_fr") >= col("s_es"), "fr")
          .when(col("s_es") > 0, "es")
          .otherwise("unknown"))
      .select("doc_id", "s_en", "s_de", "s_fr", "s_es", "guess")
      .orderBy(col("doc_id"))
  }

  /** Edit-distance similarity on adjacent-id pairs (prefixes bound the
    * O(n·m) cost — at scale this runs on LSH candidates, not all pairs). */
  def textLevenshtein(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), substring(col("text"), 1, 80).as("pfx"))
    val a = docs.select(col("doc_id").as("doc_a"), col("pfx").as("_pa"))
    val b = docs.select(col("doc_id").as("doc_b"), col("pfx").as("_pb"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("_pa"), col("_pb")).cast("long").as("edit_dist"))
      .orderBy(col("doc_a"))
  }

  /** Corpus-level n-gram frequency: global top-20 3-grams — the
    * contamination/boilerplate probe over training data. Explode is
    * narrow; the count shuffles once; top-k is TakeOrdered. */
  def textTopNgrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(TextOps.shingles(col("text"), 3)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(20)

  /** Multimodal post-decode plan: resize metadata to a 256-px box and
    * choose ≤4 evenly spaced frames per doc (all stub-deterministic). */
  def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.decode(s, Multimodal.withPayload(Tables.documents(s, d)))
      .map { m =>
        val r = Multimodal.resizeMeta(m, 256)
        (m.doc_id, r.width, r.height,
          Multimodal.sampleFrames(m.n_frames, 4).mkString(","))
      }
      .toDF("doc_id", "rs_width", "rs_height", "frame_plan")
      .orderBy(col("doc_id"))
  }

  /** Canonical-form fingerprint (dedup key). */
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Multimodal: opaque payload byte-level metadata (SQL-verifiable). */
  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.withPayload(Tables.documents(s, d))
      .select("doc_id", "n_bytes", "sha")
      .orderBy(col("doc_id"))

  /** Multimodal: batch-shaped stub decode (plumbing under test;
    * rows-only check — the codec is a deterministic fake). */
  def multimodalDecode(s: SparkSession, d: String): DataFrame =
    Multimodal.decode(s, Multimodal.withPayload(Tables.documents(s, d)),
        partitions = s.sparkContext.defaultParallelism)
      .toDF()
      .orderBy(col("doc_id"))

  /** Multimodal: bounded-box resize planning over the stub decode —
    * the thumbnail/preprocess step of an image pipeline. The aspect-
    * preserving scale arithmetic is the REAL part (a production
    * resize keeps exactly this metadata contract around the pixel
    * kernel); output is the resized-dimension census so the shape is
    * SQL-verifiable. Decode + resize compose per-partition — no
    * shuffle until the |dims|-bounded rollup. */
  def multimodalResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.decode(s, Multimodal.withPayload(Tables.documents(s, d)))
      .map { m =>
        val r = Multimodal.resizeMeta(m, maxSide = 256)
        (m.doc_id, r.width, r.height)
      }
      .toDF("doc_id", "rs_width", "rs_height")
      .groupBy(col("rs_width"), col("rs_height"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .orderBy(col("rs_width"), col("rs_height"))
  }

  /** Multimodal: stub feature extraction → embedding column, then a
    * cheap checksum per doc so the row shape is verifiable. */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeatures(
        s, Multimodal.withPayload(Tables.documents(s, d)))
      .select(col("doc_id"), size(col("features")).as("dim"),
        round(expr("aggregate(features, 0D, (acc, x) -> acc + x)"), 4)
          .as("feat_sum"))
      .orderBy(col("doc_id"))

  /** Multimodal REAL image codec — PNG roundtrip through
    * `javax.imageio` (see [[graft.mm.Codecs]]): each doc's
    * deterministic grayscale image is encoded to genuine PNG container
    * bytes and decoded back per-partition; the emitted dimensions and
    * pixel checksum come from the DECODED image, so the oracle's
    * generator replay verifies the whole encode→decode loop preserved
    * every pixel (PNG is lossless). This retires the stub-codec caveat
    * on the decode boundary: same mapPartitions batch seam, real
    * codec. No shuffle — the only exchange is the final ORDER BY. */
  def multimodalPngCodec(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // spread ids across cores before the codec map (r17: the
      // single-split scan otherwise serializes the whole kernel on
      // one task — see multimodalVideoScenecut's note)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodePng(id)
        val (w, h, sum) = graft.mm.Codecs.decodePngStats(bytes)
        (id, w.toLong, h.toLong, sum)
      })
      .toDF("doc_id", "width", "height", "px_sum")
      .orderBy(col("doc_id"))
  }

  /** Token-budget corpus selection — "the best corpus that fits in N
    * tokens": docs rank by an exact lexical-diversity score (distinct
    * tokens per token, basis points — integer arithmetic), and the
    * greedy prefix under the budget is ONE exact running token sum
    * over that order via [[Ranks.globalRunningSum]] — no loop, no
    * driver-side knapsack, no single-task sort. Budget = 20% of the
    * corpus's total tokens (computed exactly, broadcast as one row).
    * The deterministic skeleton of data curation's final step. */
  def dataBudgetSelect(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val scored = toks.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("tok")).as("n_dist"))
      .withColumn("score_bp", expr("n_dist * 10000 div n_tok"))
    val budget = broadcast(scored.agg(
      expr("sum(n_tok) div 5").as("_budget")))
    val ranked = Ranks.globalRunningSum(scored,
      Seq(col("score_bp").desc, col("doc_id")), col("n_tok"), "_cum")
    ranked.crossJoin(budget)
      .withColumn("_sel", col("_cum") <= col("_budget"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_sel"), 1L).otherwise(0L)).as("n_selected"),
        sum(col("n_tok")).as("tokens_total"),
        sum(when(col("_sel"), col("n_tok")).otherwise(0L))
          .as("tokens_selected"))
      .withColumn("selected_share",
        round(col("n_selected").cast("double") / col("n_docs"), 6))
      .orderBy(col("source"))
  }

  /** REAL palette-indexed image codec: the deterministic grayscale
    * images through genuine GIF bytes (LZW, explicit 256-gray
    * palette) — the indexed-format counterpart of
    * [[multimodalPngCodec]]. With the explicit palette the roundtrip
    * is LOSSLESS (index i = gray i), so the decoded-pixel checksum is
    * exact and the key shares the PNG oracle verbatim; without it the
    * writer would quantize — the trap this key documents. Same
    * mapPartitions codec seam, map-only at any corpus size. */
  def multimodalGifCodec(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // spread ids across cores before the codec map (r17: the
      // single-split scan otherwise serializes the whole kernel on
      // one task — see multimodalVideoScenecut's note)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodeGif(id)
        val (w, h, sum) = graft.mm.Codecs.decodeGifStats(bytes)
        (id, w.toLong, h.toLong, sum)
      })
      .toDF("doc_id", "width", "height", "px_sum")
      .orderBy(col("doc_id"))
  }

  /** Multimodal REAL image transform — decode → nearest-neighbor 8×8
    * resize → re-encode → decode again, all through `javax.imageio`:
    * the thumbnail/feature-grid step every vision pipeline runs after
    * decode, proven end to end because the emitted checksum is read
    * from the SECOND decode of the re-encoded thumbnail. Nearest
    * neighbor is integer arithmetic (`sx = x·w/8`), so the oracle
    * replays the resized sum from the deterministic generator formula
    * alone — a value-level check of the whole
    * decode→transform→encode→decode chain. Same mapPartitions codec
    * seam as [[multimodalPngCodec]]; map-only at any corpus size. */
  def multimodalPngResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // spread ids across cores before the codec map (r17: the
      // single-split scan otherwise serializes the whole kernel on
      // one task — see multimodalVideoScenecut's note)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodePng(id)
        val (w, h, sum) = graft.mm.Codecs.resizePngStats(bytes, 8)
        (id, w.toLong, h.toLong, sum)
      })
      .toDF("doc_id", "width", "height", "resized_sum")
      .orderBy(col("doc_id"))
  }

  /** Curriculum ordering — easy-to-hard training phases: documents
    * ranked by an integer lexical-diversity score (distinct-token
    * permille — repetitive docs first, diverse docs last) and split
    * into 5 exact quintile phases via [[graft.ops.Ranks.globalNtile]]
    * (range-partitioned, bit-identical to SQL `ntile(5)`, no
    * single-task sort). The score is pure integer arithmetic
    * (`distinct·1000 div total`), so phase boundaries can never drift
    * cross-engine; per-phase census is one partial-aggregable rollup. */
  def dataCurriculumOrder(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("_toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("n_chars"),
        expr("""CAST(size(array_distinct(_toks)) AS BIGINT) * 1000
                div CAST(size(_toks) AS BIGINT)""").as("quality"))
    graft.ops.Ranks.globalNtile(docs,
        Seq(col("quality").asc, col("doc_id").asc), 5, "phase")
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        min(col("quality")).as("min_q"),
        max(col("quality")).as("max_q"))
      .orderBy(col("phase"))
  }

  /** Multimodal REAL audio codec — RIFF/WAVE roundtrip through
    * `javax.sound.sampled`: deterministic PCM16 signals are encoded to
    * genuine WAV container bytes and decoded back per-partition, with
    * the sample count, sample rate, and Σ sample² taken from the
    * DECODED stream (rate parsed from the container header). Exact
    * integer energy, so the oracle replays it bit-for-bit. */
  def multimodalWavCodec(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // NO id-spread here (r17, measured): javax.sound's provider
      // registry serializes concurrent AudioSystem lookups, so the
      // parallel map CONTENDS and ran ~2-3x slower than the serial
      // single-split scan (wav_codec 0.66 -> 1.54 s etc.) — the WAV
      // keys keep the one-task map; the imageio keys keep the spread.
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodeWav(id)
        val (n, rate, energy) = graft.mm.Codecs.decodeWavStats(bytes)
        (id, n, rate, energy)
      })
      .toDF("doc_id", "n_samples", "sample_rate", "energy")
      .orderBy(col("doc_id"))
  }

  /** Multimodal AUDIO: per-doc loudness profile from the stub PCM
    * chunker — n chunks, total/peak energy, silent-chunk count (energy
    * below a fixed integer threshold), the audio feature-extraction
    * member of the multimodal family (meta/decode/resize/frames/phash
    * cover images+video). Decode + chunking compose per-partition with
    * no shuffle; all arithmetic is exact integers so the byte-replay
    * oracle matches bit-for-bit. */
  def multimodalAudioEnergy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.withPayload(Tables.documents(s, d))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val chunks = Multimodal.fakeAudioChunks(bytes)
        if (chunks.isEmpty) None
        else Some((id, chunks.size.toLong, chunks.map(_._2).sum,
          chunks.map(_._2).max,
          chunks.count(_._2 < 16384L).toLong))
      }
      .toDF("doc_id", "n_chunks", "total_energy", "peak_energy",
        "n_silent")
      .orderBy(col("doc_id"))
  }

  /** Zipf-law fit over the corpus vocabulary: OLS slope of ln(freq) on
    * ln(rank) for the top-100 tokens. Natural-language corpora sit near
    * −1; a flat slope flags template/boilerplate corpora, a steep one
    * flags degenerate repetition — a one-number corpus-health probe.
    * One token-count shuffle; the rank/regression runs on the 100-row
    * head (`regr_slope` — closed-form moments, no iteration). */
  def textZipfSlope(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .cache()
    val totals = counts.agg(sum(col("cnt")).as("n_tokens"),
      count(lit(1)).as("vocab_size"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(100)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("cnt").desc, col("token")))
          .cast("double"))
    top.agg(
        round(expr("regr_slope(ln(cnt), ln(rnk))"), 4).as("zipf_slope"),
        round(expr("regr_r2(ln(cnt), ln(rnk))"), 4).as("fit_r2"))
      .crossJoin(broadcast(totals))
      .select(col("n_tokens"), col("vocab_size"),
        col("zipf_slope"), col("fit_r2"))
  }

  /** Multimodal near-duplicate detection by perceptual hash: the
    * 16-dim stub features are thresholded against the corpus per-dim
    * mean into a 16-bit pHash (SimHash over media features), bucketed
    * by 4×4-bit chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal),
    * and candidates are verified on exact hamming distance. Same
    * bucket-join shape as text SimHash — no all-pairs stage, the
    * feature frame shuffles once on (chunk, value). With a real codec
    * the features come from the decoder; everything downstream is
    * codec-agnostic. */
  def multimodalPhashDedup(s: SparkSession, d: String): DataFrame = {
    val fd = Multimodal.extractFeatures(
        s, Multimodal.withPayload(Tables.documents(s, d)))
      .select(col("doc_id"), posexplode(col("features")).as(Seq("dim", "f")))
      .withColumn("f", col("f").cast("double"))
    val means = fd.groupBy(col("dim"))
      .agg(round(avg(col("f")), 6).as("mu"))
    val codes = fd.join(broadcast(means), "dim")
      .withColumn("bit",
        when(col("f") > col("mu"), 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(sum(col("bit") * pow(lit(2.0), col("dim"))).cast("long")
        .as("code"))
      .cache()
    val chunks = codes
      .select(col("doc_id"), col("code"),
        explode(array((0 until 4).map(lit): _*)).as("c"))
      .withColumn("cv",
        floor(col("code") / pow(lit(2.0), col("c") * 4)).cast("long") % 16)
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.code").bitwiseXOR(col("b.code"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(100)
  }

  /** Unigram-LM quality score: per-document mean token surprisal
    * (cross-entropy in bits) under the corpus's own unigram language
    * model — the classic perplexity-proxy filter for training data
    * (template spam scores low, lexically-unusual noise scores high).
    *
    * Three partial-aggregable shuffles: (doc,token) counts, the
    * vocabulary-keyed frequency table, and the per-doc fold; the 1-row
    * corpus total broadcasts. The token-keyed join is vocabulary-sized,
    * not corpus-sized — at 100 TB the frequency table is a few GB and
    * broadcast-joins against the (doc,token) stream. */
  def textLmScore(s: SparkSession, d: String): DataFrame = {
    val c = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .cache()
    val f = c.groupBy(col("tok")).agg(sum(col("c")).as("f"))
    val n = broadcast(c.agg(sum(col("c")).as("n")))
    c.join(f, Seq("tok")).crossJoin(n)
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        round(sum(col("c") * -log2(col("f") / col("n"))) / sum(col("c")), 4)
          .as("lm_bits"))
      .orderBy(col("doc_id"))
  }

  /** URL-canonicalization dedup — the first dedup pass every web-crawl
    * corpus runs (CommonCrawl-style): normalize scheme/host case, strip
    * the default port, the fragment, tracking (`utm_*`) parameters and
    * the trailing slash, sort the surviving query parameters, then
    * group by the canonical form. The corpus is synthetic, so messy
    * URL variants are injected deterministically per doc (same pattern
    * as `text_pii_scrub`) and the oracle replays injection and
    * canonicalization exactly. Per-row string work + one grouped pass —
    * embarrassingly parallel, one |URLs|-keyed shuffle. */
  def dedupUrl(s: SparkSession, d: String): DataFrame = {
    val url = concat(
      when(col("doc_id") % 2 === 0, "HTTPS://WWW.Example")
        .otherwise("https://www.example"),
      (col("doc_id") % 50).cast("string"), lit(".COM:443/items/"),
      (col("doc_id") % 20).cast("string"),
      when(col("doc_id") % 4 === 0, "/").otherwise(""),
      lit("?utm_source=feed&b=2&id="), (col("doc_id") % 10).cast("string"),
      lit("&a=1"),
      when(col("doc_id") % 3 === 0, "#section").otherwise(""))
    val noFrag = regexp_replace(url, "#.*$", "")
    val base = regexp_replace(
      regexp_replace(lower(regexp_extract(noFrag, "^[^?]*", 0)),
        ":443", ""), "/$", "")
    val params = array_sort(filter(split(
      regexp_extract(noFrag, "\\?(.*)$", 1), "&"),
      p => !p.like("utm_%")))
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat(base, lit("?"), array_join(params, "&")).as("canon"))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy(col("canon"))
  }

  /** Deterministic weighted sample: k docs per source drawn with
    * probability increasing in document length, via hash-priority keys
    * `hash(id)/weight` (smallest-key-first — the priority-sampling
    * analogue of [[sampleReservoir]]'s uniform draw). The 50-bit hash
    * and the integer weight are both exact in a double, and IEEE
    * division is exactly rounded, so the key — and therefore the
    * selection — is bit-identical on any engine or topology. The
    * passthrough weight column keeps this outside the TopKByScore
    * rewrite's shape, so Spark's native WindowGroupLimit supplies the
    * scale bound instead: ≤k rows per group forwarded from each
    * partition ahead of the shuffle (asserted in OpsSpec). */
  def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("_score").desc, col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"),
        coalesce(-(graft.functions.exprs.md5Lower64(col("doc_id").cast("string"))
          .bitwiseAND(lit((1L << 50) - 1)).cast("double") / col("n_chars")),
          lit(0.0)).as("_score"))
      .filter(col("doc_id").isNotNull && col("n_chars") > 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("source"), col("rn").cast("long").as("rn"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("rn"))
  }

  /** Weighted RESERVOIR sample (Efraimidis–Spirakis A-ES): one global
    * draw of k=50 docs with inclusion probability proportional to
    * `n_chars`, the streaming-compatible weighted sampler (each item's
    * key is computable in isolation, so the sample maintains itself
    * under appends with a k-row heap). The exponential race
    * key = −ln(u)/w uses a PORTABLE uniform — u = (md5-lower-50-bits
    * + 1)/2⁵⁰, the [[sampleWeighted]]/bootstrap inverse-CDF trick — so
    * both engines draw the identical u exactly ((h+1)/2⁵⁰ is one
    * exactly-rounded IEEE division), and ln/negate/divide are each
    * ≤1-ulp ops on values whose cross-doc spacing is ~10 orders above
    * an ulp, so the smallest-k set is stable. Selection is a global
    * ascending top-k: TakeOrderedAndProject, a bounded per-partition
    * heap — no sort, no single-task stage, the 100 TB shape. The
    * reported key is floor-scaled to an exact integer (the verify
    * skill's cross-engine rounding rule). */
  def sampleWeightedReservoir(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = Tables.documents(s, d)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        (-log((graft.functions.exprs
            .md5Lower64(concat(col("doc_id").cast("string"), lit(":wr")))
            .bitwiseAND(lit((1L << 50) - 1)) + lit(1L)).cast("double") /
          lit(1125899906842624.0)) / col("n_chars")).as("_key"))
    val top = keyed.orderBy(col("_key").asc, col("doc_id").asc).limit(50)
    // rank window runs over the 50 selected rows only — bounded frame
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("_key").asc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_chars"),
        floor(col("_key") * 1e12 + 0.5).cast("long").as("key_1e12"))
      .orderBy(col("rank"))
  }

  /** Weighted SYSTEMATIC resampling — the particle-filter/data-mixing
    * draw: lay every document's integer weight (`n_chars`) end-to-end
    * along a line in a deterministic hash order, then pick the 20 docs
    * covering the equally-spaced positions `(2i+1)·W/40`. Selection
    * probability is exactly proportional to weight, sample spread is
    * strictly better than independent draws (one doc per stratum), and
    * — unlike exponential-key A-ES — EVERY step is integer arithmetic
    * (the md5-50-bit order key, the ranged weight cumsum via
    * [[graft.ops.Ranks.globalRunningSum]], the position floor-div), so
    * both engines select bit-identically with no pow/log in sight. The
    * only non-map stage is the one range exchange inside the cumsum;
    * the 20-row position frame broadcasts onto the corpus. */
  def sampleSystematic(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        (graft.functions.exprs.md5Lower64(col("doc_id").cast("string"))
          .bitwiseAND(lit((1L << 50) - 1))).as("hkey"))
    val cum = graft.ops.Ranks.globalRunningSum(docs,
      Seq(col("hkey").asc, col("doc_id").asc), col("n_chars"), "cum")
    val tot = docs.agg(sum(col("n_chars")).as("tot"))
    val pos = s.range(20).select(col("id").as("sample_idx"))
      .crossJoin(broadcast(tot))
      .select(col("sample_idx"),
        expr("(sample_idx * 2 + 1) * tot div 40").as("pos"))
    cum.join(broadcast(pos),
        col("pos") >= col("cum") - col("n_chars") && col("pos") < col("cum"))
      .select(col("sample_idx"), col("pos"), col("doc_id"), col("n_chars"))
      .orderBy(col("sample_idx"))
  }

  /** Mixture-weighted INTERLEAVE — the training-order half of
    * [[dataMixturePlan]]: given per-source mixture weights, emit the
    * deterministic global feed order in which source s's i-th document
    * appears at virtual time `i/w_s` (the classic weighted-fair-queue
    * schedule: a weight-0.4 source fills 2× the stream of a weight-0.2
    * one, perfectly paced rather than block-by-block). Per-source
    * sequence numbers come from a source-partitioned window (each
    * group spreads over the range partitions); the global order is
    * EXACT because rank and weight are integers ≤2⁵³ and one IEEE
    * division is correctly rounded — both engines compute the
    * identical double. First 50 schedule slots, globally ranked by
    * [[graft.ops.Ranks.globalRowNumber]] (no single-task sort). */
  def dataInterleaveMixture(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // weights in integer basis points per source bucket (src0-4
    // heavy, rest light) — the dataMixturePlan convention
    val wexpr = when(col("source").isin("src0", "src1", "src2", "src3",
      "src4"), 40L).otherwise(15L)
    val seq0 = Tables.documents(s, d)
      .select(col("doc_id"), col("source"))
      .withColumn("seq", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .withColumn("vtime", col("seq").cast("double") / wexpr)
    graft.ops.Ranks.globalRowNumber(seq0,
        Seq(col("vtime").asc, col("source").asc, col("doc_id").asc),
        "slot")
      .filter(col("slot") <= 50)
      .select(col("slot"), col("source"), col("seq").cast("long").as("seq"),
        col("doc_id"))
      .orderBy(col("slot"))
  }

  /** Embedding-cosine near-duplicate PAIRS — completes the embedding
    * branch of the dedup family: [[dedupEmbedCos]] is the verifiable
    * adjacent-pair kernel, [[dedupEmbedBuckets]] the single-code
    * bucket-density probe, and THIS the end-to-end pair miner with
    * multi-probe recall. Banded random-hyperplane LSH, the
    * minhash-banding shape transplanted to cosine space: 4 bands × 4
    * sign bits (seed-7 planes shared with the ann family), candidates
    * = pairs agreeing on ALL bits of ≥1 band, then EXACT cosine ≥ 0.42
    * verifies every candidate — precision is exact by construction,
    * recall is the banded collision probability (the documented LSH
    * trade; ~60 % at cos 0.5 with these parameters). The only
    * corpus-wide shuffle is the band-bucket self-join (bucket sizes
    * capped by the band width) — no all-pairs stage anywhere, so the
    * plan survives a billion-vector corpus. The oracle replays bands
    * AND verification from the constant-folded planes, checking the
    * algorithm bit-for-bit, not just the survivors. */
  def dedupEmbedCosine(s: SparkSession, d: String): DataFrame = {
    val planes = graft.sim.Ann.planes(16, 64)
    // ONE corpus pass computes all 16 sign bits; each band's bucket is
    // a 4-bit slice of that code (band b = bits 4b..4b+3, exactly the
    // slice the constant-folded oracle rebuilds)
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("c16", graft.functions.exprs.lshCode(col("e"), planes))
    val banded = v
      .select(col("vec_id"), col("e"), col("c16"),
        explode(array((0 until 4).map(lit): _*)).as("band"))
      .withColumn("bkt",
        expr("shiftright(c16, CAST(band * 4 AS INT)) & 15"))
    val a = banded.select(col("band"), col("bkt"),
      col("vec_id").as("a_id"), col("e").as("ae"))
    val b = banded.select(col("band"), col("bkt"),
      col("vec_id").as("b_id"), col("e").as("be"))
    // verify BEFORE dedup: a pair re-found by k bands re-scores k≤4
    // times (64 codegen'd mults each) but only the tiny surviving
    // (a, b, cos) rows travel through the distinct — no array shuffle
    a.join(b, Seq("band", "bkt"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", round(graft.sim.Ann.cosine(col("ae"), col("be")), 4))
      .filter(col("cos") >= 0.42)
      .select(col("a_id"), col("b_id"), col("cos"))
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Concat-and-chunk sequence packing — the GPT-style pretraining
    * step that concatenates the tokenized corpus in a fixed order and
    * slices it into 512-token training sequences. Each document is
    * assigned to the pack containing its first token; `n_spill` counts
    * docs crossing a pack boundary (truncation/attention-reset
    * candidates). The token cumsum runs as [[Ranks.globalRunningSum]]
    * — parallel per-range running sums + broadcast offsets, exact for
    * BIGINTs — so the pack assignment never funnels the corpus through
    * one task; pack boundaries are pure integer division. Output is
    * |corpus|/512 pack rows. */
  def dataPackSequences(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), TextOps.bpeishCount(col("text")).as("n_tok"))
    Ranks.globalRunningSum(toks, Seq(col("doc_id")), col("n_tok"), "cum")
      .withColumn("start_off", col("cum") - col("n_tok"))
      .withColumn("pack_id", expr("start_off div 512"))
      .withColumn("spill",
        col("n_tok") > 0 && expr("(cum - 1) div 512") > col("pack_id"))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        sum(when(col("spill"), 1L).otherwise(0L)).as("n_spill"))
      .orderBy(col("pack_id"))
  }

  /** Overlapping token-window chunking — the RAG / long-context
    * slicing step: each document split into 64-token windows with a
    * 48-token stride (16-token overlap), every chunk carrying its
    * offset and an md5 of the actual sliced text (so the contract
    * verifies the slicing, not just the arithmetic). One narrow
    * transform — split, per-doc window count, `explode(sequence)`,
    * `slice` — no shuffle at all until the output sort, and chunk
    * count scales with corpus tokens / stride. Empty-tail windows are
    * impossible by construction (the window-count formula lands the
    * last start inside the doc). */
  def textChunkWindows(s: SparkSession, d: String): DataFrame = {
    val win = 64
    val stride = 48
    Tables.documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_win", greatest(lit(1L),
        (ceil((col("n_tok") - win).cast("double") / stride) + 1)
          .cast("long")))
      .withColumn("win_id", explode(sequence(lit(0L), col("n_win") - 1)))
      .withColumn("start_tok", col("win_id") * stride)
      .select(col("doc_id"), col("win_id"), col("start_tok"),
        least(lit(win.toLong), col("n_tok") - col("start_tok"))
          .as("n_chunk_tok"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("win_id") * stride + 1).cast("int"),
            lit(win)))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("win_id"))
  }

  /** Temperature-based source-mixture plan — the data-mixing table a
    * pretraining run needs: per source, the raw token share and the
    * τ=0.7 temperature-adjusted sampling weight (`share^0.7`
    * renormalized — upweights small sources, the standard multilingual
    * recipe), plus the resulting sample rate (effective epochs over
    * that source). One partial-aggregable rollup to |sources| rows;
    * everything after is window math on that tiny frame, with shares
    * and weights 6-dp pre-rounded so both engines renormalize
    * identical doubles. */
  def dataMixturePlan(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    Tables.documents(s, d)
      .select(col("source"), TextOps.bpeishCount(col("text")).as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("share",
        round(col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(w), 6))
      .withColumn("w_raw", round(pow(col("share"), 0.7), 6))
      .withColumn("weight", round(col("w_raw") / sum(col("w_raw")).over(w), 6))
      .withColumn("sample_rate", round(col("weight") / col("share"), 4))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share"),
        col("weight"), col("sample_rate"))
      .orderBy(col("source"))
  }

  /** DSIR-style importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw-pool document by how target-domain-like its hashed
    * unigram distribution is, then keep the top of the pool. The
    * target exemplar here is the `src0` slice; features are tokens
    * hashed into 256 buckets (md5-lower-64, the portable hash DuckDB
    * replays bit-identically); bucket weights are Laplace-smoothed
    * log-likelihood ratios ln(p_target/p_raw). Per-token weights are
    * fixed to integer micro-nats before the per-doc sum, so the fold
    * is exact Long arithmetic in BOTH engines — no float-order drift.
    * Scale shape: the model fit is one partial-aggregable rollup of
    * the token stream to 256 rows; scoring is a broadcast join of
    * that 256-row model back onto the stream plus a doc-keyed partial
    * agg; the final top-100 is a TakeOrdered, never a full sort. At
    * 100 TB the only wide exchanges are two doc/bucket-keyed partial
    * aggregations of 8-byte keys. */
  /** The hashed-unigram token stream (doc_id, source, bucket) feeding
    * both the batch and streaming DSIR scorers. */
  private[graft] def dsirTok(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .withColumn("bucket",
        graft.functions.exprs.md5Lower64(col("token"))
          .bitwiseAND(lit(2147483647L)) % 256)
      .drop("token")

  /** The fitted 256-row DSIR model (bucket, w_micro): Laplace-smoothed
    * log-likelihood ratios of the target slice vs the raw pool, fixed
    * to integer micro-nats so downstream folds are exact Long
    * arithmetic. One partial-aggregable rollup of the token stream. */
  private[graft] def dsirModel(s: SparkSession, d: String): DataFrame = {
    val b = 256
    val isTgt = col("source") === "src0"
    val counts = dsirTok(Tables.documents(s, d)).groupBy(col("bucket"))
      .agg(sum(when(isTgt, 1L).otherwise(0L)).as("t_cnt"),
        sum(when(isTgt, 0L).otherwise(1L)).as("r_cnt"))
    val totals = counts.agg(sum(col("t_cnt")).as("t_total"),
      sum(col("r_cnt")).as("r_total"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round((log((col("t_cnt") + 1).cast("double") /
            (col("t_total") + b)) -
          log((col("r_cnt") + 1).cast("double") /
            (col("r_total") + b))) * 1e6)
          .cast("long").as("w_micro"))
  }

  def dataImportanceResample(s: SparkSession, d: String): DataFrame =
    dsirTok(Tables.documents(s, d))
      .filter(col("source") =!= "src0")
      .join(broadcast(dsirModel(s, d)), Seq("bucket"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tok"), sum(col("w_micro")).as("_sm"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        round(col("_sm").cast("double") / 1e6, 6).as("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(100)

  /** MMR (maximal-marginal-relevance, Carbonell & Goldstein 1998)
    * re-rank of the exact-cosine shortlist — the standard RAG
    * diversification pass: from the top-20 candidates for query vector
    * 0, greedily select 10, each step maximizing
    * 0.7·rel − 0.3·max-sim-to-already-selected. Relevance and the
    * 20×19 pairwise sims are 4-dp-rounded cosines (the repo's
    * portable-score contract) and every MMR score is 6-dp-rounded
    * BEFORE comparison, so selection is decided on identical doubles
    * in both engines (ties → smallest vec_id). Scale shape: the only
    * corpus-sized work is the shortlist scan (broadcast query, corpus
    * never shuffles — ann_brute_topk's shape); the pairwise-sim
    * self-join and the greedy fold run on the CONSTANT-k 20-row
    * frame. The greedy is inherently sequential, so like Ivf.fit's
    * sampled quantizer it folds driver-side — O(k²·10) ≈ 4k scalar
    * ops, independent of corpus scale. */
  def annMmrRerank(s: SparkSession, d: String): DataFrame = {
    val k = 20
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("_e"))
    val q = emb.filter(col("vec_id") === 0).select(col("_e").as("_qe"))
    val cand = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("rel", round(Ann.cosine(col("_qe"), col("_e")), 4))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("rel"), col("_e"))
      .cache()
    val ps = cand.as("a")
      .join(broadcast(cand.select(col("vec_id").as("bv"), col("_e").as("_be"))),
        col("vec_id") =!= col("bv"))
      .select(col("vec_id").as("u"), col("bv").as("v"),
        round(Ann.cosine(col("_e"), col("_be")), 4).as("sim"))
    val rels = cand.select(col("vec_id"), col("rel")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toVector.sortBy(_._1)
    val sims = ps.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var picked = Vector.empty[(Int, Long, Double)]
    var remaining = rels
    for (step <- 1 to 10) {
      val scored = remaining.map { case (vid, rel) =>
        val maxSim =
          if (picked.isEmpty) 0.0
          else picked.map(p => sims((vid, p._2))).max
        (vid, r6(0.7 * rel - 0.3 * maxSim))
      }
      val (vid, mmr) = scored.minBy { case (v, m) => (-m, v) }
      picked = picked :+ ((step, vid, mmr))
      remaining = remaining.filterNot(_._1 == vid)
    }
    cand.unpersist()
    import s.implicits._
    picked.toDF("step", "vec_id", "mmr").orderBy(col("step"))
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-delimited token runs; each word scores
    * degree/frequency (degree = Σ length of the phrases it appears
    * in), and a phrase scores the sum of its word scores. Word scores
    * are fixed to integer micro-units BEFORE the per-phrase sum —
    * the DSIR trick — so the fold is order-free Long arithmetic in
    * both engines. All shuffles are token- or phrase-keyed partial
    * aggregations; the per-doc windows (phrase segmentation by
    * running stopword count) partition by doc_id, so no data-scaled
    * single-task frame exists, and the final top-30 is a TakeOrdered.
    * Phrase text reassembles positionally (sort_array / ORDER BY pos)
    * — identical strings both engines. */
  def textKeywordRake(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stop = Seq("the", "a", "and", "of", "to", "in", "is")
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = tok
      .withColumn("pid",
        sum(when(col("w").isin(stop: _*), 1L).otherwise(0L)).over(wDoc))
      .filter(!col("w").isin(stop: _*))
    val phraseLen = seg.groupBy(col("doc_id"), col("pid"))
      .agg(count(lit(1)).as("plen"))
    val occ = seg.join(phraseLen, Seq("doc_id", "pid"))
    val wordScore = occ.groupBy(col("w"))
      .agg(round(sum(col("plen")).cast("double") * 1e6 / count(lit(1)))
        .cast("long").as("w_micro"))
    occ.join(wordScore, Seq("w"))
      .groupBy(col("doc_id"), col("pid"))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("w_micro")).as("_sm"))
      .select(col("doc_id"), col("phrase"), col("n_words"),
        round(col("_sm").cast("double") / 1e6, 6).as("rake_score"))
      .orderBy(col("rake_score").desc, col("doc_id"), col("phrase"))
      .limit(30)
  }

  /** Diagonal-Mahalanobis embedding outliers — the vector-space
    * anomaly audit a curation pipeline runs before training: each
    * vector's distance from the corpus mean, per-dimension normalized
    * by that dimension's variance, top-20. Inputs quantize to a 1e-4
    * lattice, so per-dimension moment sums (n, Σx, Σx²) are exact
    * order-free Longs and each dimension's term
    * (n·x − Σx)² / (n·Σx² − (Σx)²) is a ratio of exact integers — ONE
    * identical IEEE division, fixed to micro-units before the per-
    * vector fold (exact Long sum). Scale shape: a 64× narrow explode,
    * one 64-row moment rollup (broadcast back), one vector-keyed
    * partial agg, TakeOrdered — no pairwise work at all. */
  def embedOutlierMaha(s: SparkSession, d: String): DataFrame = {
    val dims = Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "_x")))
      .withColumn("_q", round(col("_x") * 1e4).cast("long"))
    val stats = dims.groupBy(col("dim"))
      .agg(count(lit(1)).as("_n"), sum(col("_q")).as("_sx"),
        sum(col("_q") * col("_q")).as("_sxx"))
    dims.join(broadcast(stats), Seq("dim"))
      .withColumn("_num",
        (col("_n") * col("_q") - col("_sx")) *
          (col("_n") * col("_q") - col("_sx")))
      .withColumn("_den",
        col("_n") * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn("_t", floor(col("_num").cast("double") / col("_den")
        * 1e6 + 0.5).cast("long"))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"), sum(col("_t")).as("maha_micro"))
      .select(col("vec_id"), col("n_dims"), col("maha_micro"),
        (col("maha_micro").cast("double") / 1e6).as("maha_sq"))
      .orderBy(col("maha_micro").desc, col("vec_id"))
      .limit(20)
  }

  /** GROUP-aware k-fold assignment — the split a training pipeline
    * must use when rows share an entity (all of a user's events go to
    * ONE fold, or the eval leaks): fold = portable hash of the GROUP
    * key, so assignment is stateless, reproducible, and needs no
    * shuffle at all (a map-side expression on every row). The output
    * census carries the integrity proof: `n_cross_fold_users` counts
    * users observed in more than one fold — structurally zero here,
    * and the check is the regression harness a real pipeline keeps. */
  def dataGroupKfold(s: SparkSession, d: String): DataFrame = {
    val k = 5
    val folded = Tables.events(s, d)
      .select(col("user_id"), col("value"),
        pmod(graft.functions.exprs.md5Lower64(col("user_id").cast("string"))
          .bitwiseAND(lit(Long.MaxValue)), lit(k.toLong)).as("fold"))
    val perUser = folded.groupBy(col("user_id"))
      .agg(countDistinct(col("fold")).as("_nf"), max(col("fold")).as("fold"),
        count(lit(1)).as("_n"), sum(col("value")).as("_v"))
    val cross = perUser.agg(
      sum(when(col("_nf") > 1, 1L).otherwise(0L)).as("n_cross_fold_users"))
    val tot = folded.agg(count(lit(1)).as("_tot"))
    perUser.groupBy(col("fold"))
      .agg(count(lit(1)).as("n_users"), sum(col("_n")).as("n_rows"),
        round(sum(col("_v")), 2).as("sum_value"))
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(cross))
      .select(col("fold"), col("n_users"), col("n_rows"),
        round(col("n_rows").cast("double") / col("_tot"), 6)
          .as("rows_share"),
        col("sum_value"), col("n_cross_fold_users"))
      .orderBy(col("fold"))
  }

  /** Train/test near-duplicate LEAKAGE census — the audit between
    * splitting and training: documents hash into 2 splits
    * (group-aware, like [[dataGroupKfold]]), and every VERIFIED
    * near-dup pair (the τ≥0.5 relation the dedup family shares) is
    * classified by whether it crosses the split boundary. A crossing
    * pair is memorization leakage: its test half is near-identical to
    * a training doc. Cost beyond the shared cached pair index: one
    * map-side hash per pair endpoint + a \|pairs\|-row rollup. The
    * published eval-contamination methodology, applied at split time
    * instead of after the eval is burned. */
  def dataSplitLeakage(s: SparkSession, d: String): DataFrame = {
    def splitOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      pmod(graft.functions.exprs.md5Lower64(c.cast("string"))
        .bitwiseAND(lit(Long.MaxValue)), lit(2L))
    lshPairsFor(s, d)
      .select(floor(col("jaccard") * 10).cast("long").as("j_bucket"),
        (splitOf(col("id_a")) =!= splitOf(col("id_b"))).as("_x"))
      .groupBy(col("j_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("_x"), 1L).otherwise(0L)).as("n_cross"))
      .select(col("j_bucket"), col("n_pairs"), col("n_cross"),
        round(col("n_cross").cast("double") / col("n_pairs"), 6)
          .as("cross_share"))
      .orderBy(col("j_bucket"))
  }

  /** Bigram language-model perplexity scoring — [[textLmScore]]'s
    * conditional twin and the classic KenLM-shaped quality filter: a
    * Laplace-smoothed bigram LM fits on the reference slice
    * (src0–src9), and every candidate doc is scored by its average
    * negative log-likelihood per bigram. Per-bigram NLLs are fixed to
    * integer micro-nats before the per-doc fold (exact Long
    * arithmetic, the dsir portability trick). Scale shape: the model
    * is a (bigram → count) frame built by one partial-aggregable
    * rollup; scoring joins candidate bigrams against it on the bigram
    * key (AQE broadcasts when the vocabulary fits) with unseen
    * bigrams falling back to the smoothed floor via the left join;
    * output is a per-source rollup. */
  def textBigramPpl(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        graft.text.TextOps.tokens(col("text")).as("_t"))
      .select(col("doc_id"), col("source"),
        expr("filter(_t, x -> x <> '')").as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(expr(
          "transform(slice(_t, 1, size(_t) - 1), (x, i) -> " +
            "named_struct('w1', x, 'w2', element_at(_t, i + 2)))")).as("_b"))
      .select(col("doc_id"), col("source"),
        col("_b.w1").as("w1"), col("_b.w2").as("w2"))
    val isRef = length(col("source")) === 4
    val ref = toks.filter(isRef)
    val big = ref.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val uni = ref.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = broadcast(ref.agg(countDistinct(col("w2")).as("_v")))
    // micro-nat NLL of each candidate bigram: seen → −ln((c2+1)/(c1+V)),
    // unseen w1-seen → −ln(1/(c1+V)), unseen w1 → −ln(1/V)
    val scored = toks.filter(!isRef)
      .join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(v)
      .withColumn("_nll",
        round(-log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("_v"))) * 1e6).cast("long"))
    scored.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_bigrams"),
        sum(col("_nll")).as("nll_micro_total"))
      .select(col("source"), col("n_docs"), col("n_bigrams"),
        col("nll_micro_total"),
        round(col("nll_micro_total").cast("double") / col("n_bigrams")
          / 1e6, 6).as("avg_nll"))
      .orderBy(col("source"))
  }

  /** Per-document n-gram NOVELTY score — the pretraining-corpus
    * freshness metric: the fraction of a doc's distinct 3-gram
    * shingles whose FIRST corpus occurrence (min doc_id) is this doc.
    * Crawl pipelines rank later snapshots by novelty to avoid paying
    * tokens for re-crawled content. One shingle-keyed shuffle carries
    * 8-byte md5 hashes (never shingle text); first-occurrence is a
    * partial-aggregable min; the rejoin hashes on the same 8-byte key.
    * At 100 TB this is the dedup_passage shape with an argmin instead
    * of a distinct. Novelty is the exact rational of two integers,
    * micro-fixed. */
  def textNgramNovelty(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.text.TextOps.shingles(col("text"), 3)).as("g"))
      .select(col("doc_id"),
        graft.functions.exprs.md5Lower64(col("g")).as("gh"))
    val first = sh.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        (floor(col("n_novel").cast("double") / col("n_shingles")
          * 1e6 + 0.5) / 1e6).as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** Voice-activity detection through the REAL WAV codec: each doc's
    * deterministic PCM audio is encoded to genuine WAV bytes, decoded
    * back through javax.sound.sampled, chopped into 40-sample frames,
    * and frames whose DECODED energy exceeds the threshold are
    * "speech"; maximal speech runs are segments — the preprocessing
    * that carves raw audio into trainable utterances. Map-only
    * per-partition codec seam; exact integer energies, so the oracle
    * replays the generator arithmetic frame by frame. */
  def multimodalAudioVad(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // NO id-spread here (r17, measured): javax.sound's provider
      // registry serializes concurrent AudioSystem lookups, so the
      // parallel map CONTENDS and ran ~2-3x slower than the serial
      // single-split scan (wav_codec 0.66 -> 1.54 s etc.) — the WAV
      // keys keep the one-task map; the imageio keys keep the spread.
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodeWav(id)
        val (nf, ns, nseg) =
          graft.mm.Codecs.decodeWavVad(bytes, 40, 14300000000L)
        (id, nf, ns, nseg)
      })
      .toDF("doc_id", "n_frames", "n_speech", "n_segments")
      .withColumn("speech_ratio",
        floor(col("n_speech").cast("double") / col("n_frames")
          * 1e6 + 0.5) / 1e6)
      .orderBy(col("doc_id"))
  }

  /** Feature HASHING (the hashing trick) census: every token
    * occurrence lands in one of 64 signed buckets (bucket = md5-64
    * mod 64, sign from the next hash bit) — the fixed-width featurizer
    * cheap classifiers and dedup prefilters run when a learned
    * vocabulary is too expensive. One map-side pass over token
    * occurrences, one 64-row rollup; the census (occurrences, signed
    * sum, distinct tokens per bucket) is exact integers. */
  def textHashFeatures(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(graft.functions.exprs.md5Lower64(col("tok"))
        .bitwiseAND(lit(Long.MaxValue)).as("th"))
      .select(col("th"), pmod(col("th"), lit(64L)).as("bucket"),
        when(expr("(th div 64) % 2") === 0, 1L).otherwise(-1L).as("sign"))
    toks.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_occurrences"),
        sum(col("sign")).as("signed_sum"),
        count_distinct(col("th")).as("n_tokens"))
      .orderBy(col("bucket"))
  }

  /** Held-out OOV (out-of-vocabulary) rate — the vocabulary-coverage
    * audit run before freezing a tokenizer: build the vocab from the
    * TRAIN half of the portable md5 doc split, then count what share
    * of the VAL half's token OCCURRENCES falls outside it. Tokens
    * shuffle as 8-byte md5 hashes (never strings); the vocab is one
    * distinct rollup; the OOV test is one left-anti-shaped join
    * (a broadcast when the vocab is small, a hash join at corpus
    * scale). One census row of exact integers; the rate is
    * micro-fixed. */
  def textOovRate(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(
        (pmod(graft.functions.exprs.md5Lower64(
          col("doc_id").cast("string"))
          .bitwiseAND(lit(Long.MaxValue)), lit(2L)) === 0)
          .as("is_train"),
        graft.functions.exprs.md5Lower64(col("tok"))
          .bitwiseAND(lit(Long.MaxValue)).as("th"))
    val vocab = toks.filter(col("is_train"))
      .select(col("th")).distinct()
    val vsz = vocab.count()
    toks.filter(!col("is_train"))
      .join(vocab.withColumn("_in", lit(1L)), Seq("th"), "left")
      .agg(count(lit(1)).as("n_val_tokens"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(lit(vsz).as("vocab_size"), col("n_val_tokens"),
        col("n_oov"),
        (floor(col("n_oov").cast("double") / col("n_val_tokens")
          * 1e6 + 0.5) / 1e6).as("oov_rate"))
  }

  /** Greedy k-CENTER CORESET selection (farthest-first traversal) —
    * the data-pruning selector modern pipelines run to pick a maximally
    * diverse training subset: seed with the min-id vector, then k−1
    * times pick the candidate FARTHEST from everything already chosen
    * (min over candidates of max-cosine-to-selected; ties → min id).
    * Each round is ONE distributed scan holding a running
    * max-similarity column (the corpus never pairs with itself — only
    * with the single new center, broadcast), with per-round
    * localCheckpoint keeping the lineage flat, so k centers over a
    * billion vectors cost k broadcast scans. The greedy's sequential
    * core is inherently k-deep; everything corpus-sized stays
    * distributed. Oracle = recursive CTE carrying the selected set as
    * a list (the ann_mmr_rerank recipe) over the same 4-dp cosines. */
  def embedCoresetKcenter(s: SparkSession, d: String): DataFrame = {
    val pool = Tables.embeddings(s, d)
      .filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("_e"))
      .cache()
    val seed = pool.agg(min(col("vec_id"))).head.getLong(0)
    var clo = pool.select(col("vec_id"), lit(-1.0).as("clo"))
    val picked =
      scala.collection.mutable.ArrayBuffer[(Int, Long, Double)]()
    picked += ((1, seed, 1.0))
    var lastId = seed
    for (step <- 2 to 8) {
      val center = pool.filter(col("vec_id") === lastId)
        .select(col("_e").as("_ce"))
      val sims = pool.crossJoin(broadcast(center))
        .select(col("vec_id"),
          round(graft.sim.Ann.cosine(col("_e"), col("_ce")), 4).as("_sim"))
      clo = clo.join(sims, Seq("vec_id"))
        .select(col("vec_id"), greatest(col("clo"), col("_sim")).as("clo"))
        .localCheckpoint(true)
      val nxt = clo.filter(!col("vec_id").isin(picked.map(_._2).toSeq: _*))
        .orderBy(col("clo").asc, col("vec_id").asc).limit(1).head
      lastId = nxt.getLong(0)
      picked += ((step, lastId, nxt.getDouble(1)))
    }
    import s.implicits._
    picked.toSeq.toDF("rnk", "vec_id", "closeness")
      .orderBy(col("rnk"))
  }

  /** Video SCENE-CUT detection through the real PNG codec: each doc
    * carries a deterministic 6-frame sequence whose generator seed
    * jumps at frame `2 + doc_id % 3` (the "cut"); every frame is
    * encoded to genuine PNG bytes, decoded back through javax.imageio,
    * and consecutive DECODED frames are diffed — the argmax
    * mean-abs-diff transition is the detected cut, exactly how
    * threshold-based scene detection segments video for multimodal
    * training. Map-only per-partition codec seam; at 100 TB the decode
    * cost dominates and parallelizes embarrassingly. The oracle
    * replays the generator arithmetic per pixel, so a detector reading
    * anything but pixel-exact decodes fails. */
  def multimodalVideoScenecut(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // the docs table reads as ONE split at fixture scale, so the
      // whole 6·|docs| codec loop ran on a single core (r17 plan
      // audit; this is the suite's most CPU-bound map, slope 10.0 at
      // the §4.0 decade). Spread the 8-byte ids across the session's
      // cores before the heavy map — scale-adaptive (defaultParallelism
      // follows $SPARK_GRAFT_CPUS locally, the cluster in production),
      // and at 100 TB the scan itself already yields many splits, so
      // the round-robin exchange stays a no-op-sized id shuffle.
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        // one fused kernel per doc (r17 diet): same 6 encode→decode
        // codec round-trips, buffers/writer/reader reused — pinned
        // equal to the composed per-frame functions by Opt17Spec
        val (cutAt, maxDiff, nStatic) = graft.mm.Codecs.sceneCutStats(id)
        (id, 6L, cutAt, maxDiff, nStatic)
      })
      .toDF("doc_id", "n_frames", "cut_at", "max_diff",
        "n_static_transitions")
      .orderBy(col("doc_id"))
  }

  /** HARD-NEGATIVE mining for contrastive / embedding training: for
    * each query vector, the top-5 highest-cosine neighbors with a
    * DIFFERENT label — the near-miss examples a contrastive loss needs
    * to sharpen the decision boundary (random negatives are too easy
    * to teach anything). [[annFilteredTopK]]'s exact broadcast-query
    * scan with the predicate inverted: the label filter rides the join
    * condition, so mismatched pairs are dropped BEFORE scoring, and
    * the corpus never shuffles. At 100 TB this runs per training batch
    * against the frozen corpus — the same index family serves it. */
  def embedHardNegatives(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val c = emb.select(col("vec_id").as("c_id"), col("label").as("c_lbl"),
      col("embedding").cast("array<double>").as("_ce"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_lbl"),
        col("embedding").cast("array<double>").as("_qe"))
    val scored = c.join(broadcast(q),
        col("c_id") =!= col("q_id") && col("c_lbl") =!= col("q_lbl"))
      .withColumn("score",
        round(graft.sim.Ann.cosine(col("_qe"), col("_ce")), 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("c_id"),
        col("c_lbl").cast("long").as("label"), col("score"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Matryoshka truncation probe — the MRL serving question: how much
    * recall@k survives if retrieval runs on the embedding's FIRST 32
    * of 64 dimensions (half the memory, half the FLOPs)? Both
    * rankings are the exact brute-force scan ([[graft.sim.Ann]]'s
    * broadcast-queries shape — the corpus never shuffles), the
    * truncated side just slices the vector column, and per-query
    * recall is the exact integer overlap of the two top-10 id sets.
    * At 100 TB this is the audit run BEFORE flipping an index to
    * truncated vectors; both rankings fold into the SQL oracle, so the
    * recall numbers are value-verified end to end. */
  def embedMatryoshkaProbe(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val emb32 = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 32).as("embedding"))
    val full = graft.sim.Ann.bruteTopK(emb,
      emb.filter(col("vec_id") < 20), k = 10)
    val trunc = graft.sim.Ann.bruteTopK(emb32,
      emb32.filter(col("vec_id") < 20), k = 10)
    full.select(col("q_id"), col("c_id"))
      .join(trunc.select(col("q_id"), col("c_id"), lit(1L).as("_hit")),
        Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_overlap"))
      .select(col("q_id"), col("k"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("k")).as("recall"))
      .orderBy(col("q_id"))
  }

  /** ViT-style PATCH EXTRACTION through the real PNG codec: each doc's
    * deterministic image is encoded to actual PNG bytes, decoded back
    * through javax.imageio, and chopped into non-overlapping 8×8
    * patches — the exact preprocessing a vision-transformer training
    * pipeline runs per image. Emitted per doc: the patch-grid shape
    * and a position-weighted exact integer checksum over DECODED patch
    * sums, so the oracle (replaying the generator arithmetic + the
    * same grid in SQL) verifies the full encode→decode→patch loop
    * pixel-exactly. Map-only per-partition seam, the
    * [[multimodalPngCodec]] batch shape — at 100 TB the codec cost
    * dominates and parallelizes embarrassingly. */
  def multimodalImageTiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // spread ids across cores before the codec map (r17: the
      // single-split scan otherwise serializes the whole kernel on
      // one task — see multimodalVideoScenecut's note)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodePng(id)
        val (ntx, nty, cks) = graft.mm.Codecs.decodePngTileStats(bytes, 8)
        (id, ntx.toLong, nty.toLong, ntx.toLong * nty, cks)
      })
      .toDF("doc_id", "n_tiles_x", "n_tiles_y", "n_tiles",
        "tiles_checksum")
      .orderBy(col("doc_id"))
  }

  /** BMP roundtrip through the JDK's uncompressed image codec:
    * deterministic image → real BITMAPFILEHEADER+DIB bytes → decode →
    * (dims, Σ red) off the DECODED pixels. Same map-only codec-seam
    * contract as [[multimodalPngCodec]] (the oracle replays the
    * generator arithmetic; BMP is lossless so equality proves the
    * roundtrip), but exercising the row-padded uncompressed path the
    * zlib formats never touch. */
  def multimodalBmpCodec(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // spread ids across cores before the codec map (r17: the
      // single-split scan otherwise serializes the whole kernel on
      // one task — see multimodalVideoScenecut's note)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodeBmp(id)
        val (w, h, sum) = graft.mm.Codecs.decodePngStats(bytes)
        (id, w.toLong, h.toLong, sum)
      })
      .toDF("doc_id", "width", "height", "px_sum")
      .orderBy(col("doc_id"))
  }

  /** Per-image luminance histogram (8 buckets of 32 gray levels) off
    * DECODED PNG pixels — the exposure/contrast QA scan a vision
    * pipeline runs before training. Map-only through the codec seam;
    * bucket counts are exact integers so the oracle replays the
    * generator. */
  def multimodalImageHist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // spread ids across cores before the codec map (r17: the
      // single-split scan otherwise serializes the whole kernel on
      // one task — see multimodalVideoScenecut's note)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val h = graft.mm.Codecs.decodeImageHist(graft.mm.Codecs.encodePng(id))
        (id, h(0), h(1), h(2), h(3), h(4), h(5), h(6), h(7))
      })
      .toDF("doc_id", "h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7")
      .orderBy(col("doc_id"))
  }

  /** Autocorrelation pitch probe over DECODED WAV samples: best lag in
    * [20, 40] by the exact integer autocorrelation R(τ) = Σ vᵢ·vᵢ₊τ,
    * f0 = rate/lag — the feature-extraction shape of a real F0
    * estimator (YIN's first stage) on the synthetic deterministic
    * signal. Map-only; the oracle replays the generator arithmetic
    * with a lag×sample self-join, so the decode path is proven
    * sample-exact. */
  def multimodalAudioPitch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // NO id-spread here (r17, measured): javax.sound's provider
      // registry serializes concurrent AudioSystem lookups, so the
      // parallel map CONTENDS and ran ~2-3x slower than the serial
      // single-split scan (wav_codec 0.66 -> 1.54 s etc.) — the WAV
      // keys keep the one-task map; the imageio keys keep the spread.
      .mapPartitions(_.map { id =>
        val (n, lag, r) = graft.mm.Codecs.decodeWavPitch(
          graft.mm.Codecs.encodeWav(id), 20, 40)
        (id, n, lag, r)
      })
      .toDF("doc_id", "n_samples", "best_lag", "r_peak")
      .withColumn("f0_hz",
        floor(expr("16000.0 / best_lag") * 1e4 + 0.5) / 1e4)
      .orderBy(col("doc_id"))
  }

  /** 1-bit (sign) quantized ANN: embeddings binarize to two 32-bit
    * codes (bit i = 1 iff dim i > 0 — two longs instead of one so no
    * shift ever reaches bit 63, where BIGINT `<<` semantics diverge
    * across engines), queries (vec_id < 10) broadcast, and top-10 per
    * query ranks by EXACT Hamming distance bit_count(xor) — the
    * 64×-compression serving tier below [[annSq8TopK]]'s int8. Codes
    * are one partial-aggregable posexplode rollup (integer bit sums —
    * no float ever shuffles); distance is 2 codegen'd bit ops per
    * pair; per-query top-k is the WindowGroupLimit pre-shuffle
    * pattern. At 100 TB the corpus never moves: codes are 16 bytes/vec
    * and the query side broadcasts. */
  def embedHammingTopk(s: SparkSession, d: String): DataFrame = {
    val codes = Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("vec_id"))
      .agg(
        sum(when(col("x") > 0 && col("dim") < 32,
          expr("shiftleft(1L, dim)")).otherwise(0L)).as("code1"),
        sum(when(col("x") > 0 && col("dim") >= 32,
          expr("shiftleft(1L, dim - 32)")).otherwise(0L)).as("code2"))
      .localCheckpoint(true)
    val q = codes.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("code1").as("q1"),
        col("code2").as("q2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("hamming"), col("vec_id"))
    codes.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("hamming", expr(
        "CAST(bit_count(code1 ^ q1) + bit_count(code2 ^ q2) AS BIGINT)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"),
        col("vec_id").as("c_id"), col("hamming"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Per-source unigram KL divergence from the corpus distribution —
    * the domain-shift report a mixture owner reads before reweighting:
    * KL(P_src ‖ P_corpus) = (1/n_s)·Σ_w c_sw·ln(c_sw·n_c / (n_s·c_w)).
    * Each token's log-ratio is fixed to integer micro-nats (the dsir /
    * bigram-ppl portability trick) so the per-source fold is an exact
    * long sum; P_corpus dominates every P_src by construction (the
    * corpus includes the source), so no smoothing term is needed.
    * Scale: two token rollups (corpus-keyed and (source, token)-keyed)
    * + one join on the token key — all partial-aggregable. */
  def textUnigramKl(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"),
        explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
    val corpus = toks.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val nC = broadcast(toks.agg(count(lit(1)).as("n_c")))
    val src = toks.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c_sw"))
    val nS = toks.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    src.join(corpus, "w").join(nS, "source").crossJoin(nC)
      .withColumn("k_micro", expr(
        "CAST(round(ln(CAST(c_sw AS DOUBLE) * n_c" +
          " / (CAST(n_s AS DOUBLE) * c_w)) * 1e6) AS BIGINT)"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(col("c_sw") * col("k_micro")).as("kl_weighted_micro"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("kl_weighted_micro"),
        // round(w/n) micro-nats → 6-dp nats: one division + floor of
        // identical longs on both engines
        (floor(col("kl_weighted_micro").cast("double") / col("n_tokens")
          + 0.5) / 1e6).as("kl_nats"))
      .orderBy(col("source"))
  }

  /** Token burstiness (Church & Gale): for the 20 highest-frequency
    * corpus tokens, the variance-to-mean ratio of per-document counts
    * — VMR ≈ 1 is Poisson background vocabulary, VMR ≫ 1 is bursty
    * content terms; the statistic that separates them where raw
    * frequency can't. Zero-count documents enter the moments via the
    * n·Σx²/tot algebra (never materialized); everything to the final
    * divisions is exact integer moments from two partial-aggregable
    * rollups. */
  def textBurstiness(s: SparkSession, d: String): DataFrame = {
    val docToks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
    val nDocs = broadcast(Tables.documents(s, d)
      .agg(count(lit(1)).as("n_docs")))
    val perDoc = docToks.groupBy(col("w"), col("doc_id"))
      .agg(count(lit(1)).as("x"))
    perDoc.groupBy(col("w"))
      .agg(sum(col("x")).as("total_cnt"),
        sum(col("x") * col("x")).as("sx2"),
        count(lit(1)).as("doc_freq"))
      .crossJoin(nDocs)
      .withColumn("mean", expr(
        "CAST(total_cnt AS DOUBLE) / n_docs"))
      .withColumn("vmr", expr(
        "(CAST(sx2 AS DOUBLE) / n_docs - mean * mean) / mean"))
      .select(col("w").as("token"), col("total_cnt"), col("doc_freq"),
        (floor(col("mean") * 1e6 + 0.5) / 1e6).as("mean_per_doc"),
        (floor(col("vmr") * 1e4 + 0.5) / 1e4).as("vmr"))
      .orderBy(col("total_cnt").desc, col("token"))
      .limit(20)
  }

  /** Per-label embedding-distribution divergence (the MAUVE-style
    * drift probe, quantize-then-compare form): embeddings quantize to
    * 16 sign cells (first 4 dims — the 1-bit kit from
    * [[embedHammingTopk]]), and each label's Laplace-smoothed cell
    * histogram is scored by KL(P_label ‖ P_corpus) in integer
    * micro-nats — the cheap answer to "did this source/label drift
    * away from the corpus in embedding space". The full label×cell
    * lattice is materialized (16·|labels| rows) so zero cells enter
    * the smoothing; everything data-scaled is two partial-aggregable
    * rollups and the fold is an exact long sum. */
  def embedLabelDivergence(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .filter(col("dim") < 4)
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(when(col("x") > 0, expr("shiftleft(1L, dim)"))
        .otherwise(0L)).as("cell"))
    val corpus = cells.groupBy(col("cell")).agg(count(lit(1)).as("c_c"))
    val n = broadcast(cells.agg(count(lit(1)).as("n")))
    val labels = cells.select(col("label")).distinct()
    val nL = cells.groupBy(col("label")).agg(count(lit(1)).as("n_l"))
    val lattice = labels.crossJoin(s.range(16).select(col("id").as("cell")))
    val lc = cells.groupBy(col("label"), col("cell"))
      .agg(count(lit(1)).as("c_lc"))
    lattice
      .join(lc, Seq("label", "cell"), "left").na.fill(0L, Seq("c_lc"))
      .join(corpus, Seq("cell"), "left").na.fill(0L, Seq("c_c"))
      .join(nL, "label").crossJoin(n)
      .withColumn("k_micro", expr(
        "CAST(round(ln(CAST(c_lc + 1 AS DOUBLE) * (n + 16)" +
          " / (CAST(n_l + 16 AS DOUBLE) * (c_c + 1))) * 1e6) AS BIGINT)"))
      .groupBy(col("label"))
      .agg(max(col("n_l")).as("n_vecs"),
        sum((col("c_lc") + 1) * col("k_micro")).as("kl_weighted_micro"))
      .select(col("label"), col("n_vecs"), col("kl_weighted_micro"),
        (floor(col("kl_weighted_micro").cast("double")
          / (col("n_vecs") + 16) + 0.5) / 1e6).as("kl_nats"))
      .orderBy(col("label"))
  }

  /** Temperature-scaled mixture sampling (T = 2, i.e. w ∝ n^(1/2)) —
    * the multilingual/multi-domain rebalancing rule (mT5 §3.1 shape):
    * per-source weights are √n fixed to integer micro-units (sqrt is
    * exactly rounded IEEE, so the lattice is cross-engine exact),
    * quotas are integer division of a fixed 200-doc budget, and each
    * source's quota fills by portable md5 order via the exact ranged
    * [[graft.ops.Ranks.groupRowNumber]] — no per-source window sort,
    * and rounding-down quotas means the budget is never exceeded.
    * Output is the per-source census + selected-id checksum. */
  def dataTemperatureMix(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        (graft.functions.exprs.md5Lower64(col("doc_id").cast("string"))
          .bitwiseAND(lit((1L << 50) - 1))).as("h"))
    val wts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("weight_micro", expr(
        "CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT)"))
    val quotas = wts
      .crossJoin(broadcast(wts.agg(sum(col("weight_micro")).as("tw"))))
      .withColumn("quota", expr("(200 * weight_micro) div tw"))
      .select(col("source"), col("n_docs"), col("weight_micro"),
        col("quota"))
    Ranks.groupRowNumber(docs, Seq(col("source")),
        Seq(col("h"), col("doc_id")), "rn", "tot")
      .join(broadcast(quotas), "source")
      .filter(col("rn") <= col("quota"))
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"),
        max(col("weight_micro")).as("weight_micro"),
        max(col("quota")).as("quota"),
        count(lit(1)).as("n_selected"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("source"))
  }

  /** Heaps' law fit V = K·Nᵝ over the 10 portable-hash corpus
    * checkpoints (the [[dataCoverageCurve]] deciles): vocabulary
    * growth exponent β + ln K from a closed-form OLS on
    * (ln N, ln V) — the companion exponent to text_zipf_slope.
    * Cumulative token/type counts are exact longs; their logs fix to
    * micro-nats, so the 10-point OLS moments are exact
    * DECIMAL⇄HUGEINT and β/ln K are pinned doubles. */
  def textHeapsLaw(s: SparkSession, d: String): DataFrame = {
    import graft.functions.exprs
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        exprs.md5Lower64(col("doc_id").cast("string")).as("h"))
    val ranked = graft.ops.Ranks.globalRowNumber(docs,
      Seq(col("h"), col("doc_id")), "rk")
    val n = ranked.agg(count(lit(1)).as("n_docs"))
    val withBucket = ranked.crossJoin(broadcast(n))
      .withColumn("bucket", expr("((rk - 1) * 10) div n_docs"))
      .localCheckpoint(true)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .localCheckpoint(true)
    val tokPer = toks.join(withBucket, "doc_id")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_tok"))
    val typePer = toks.distinct().join(withBucket, "doc_id")
      .groupBy(col("w")).agg(min(col("rk")).as("first_rk"))
      .crossJoin(broadcast(n))
      .select(expr("((first_rk - 1) * 10) div n_docs").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_type"))
    val cum = Ranks.globalScan(
      tokPer.join(typePer, Seq("bucket"), "left")
        .withColumn("n_type", coalesce(col("n_type"), lit(0L))),
      Seq(col("bucket")),
      sums = Seq(col("n_tok") -> "cum_tok", col("n_type") -> "cum_type"))
    val pts = cum.select(
      expr("CAST(round(ln(CAST(cum_tok AS DOUBLE)) * 1e6) AS BIGINT)")
        .as("x"),
      expr("CAST(round(ln(CAST(cum_type AS DOUBLE)) * 1e6) AS BIGINT)")
        .as("y"))
    pts.agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .withColumn("beta", expr(
        "CAST(CAST(m AS DECIMAL(38,0)) * sxy" +
          " - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)" +
          " / CAST(CAST(m AS DECIMAL(38,0)) * sxx" +
          " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"))
      .select(col("m").as("n_points"),
        (floor(col("beta") * 1e6 + 0.5) / 1e6).as("heaps_beta"),
        (floor(expr("(CAST(sy AS DOUBLE) - beta * sx) / m / 1e6")
          * 1e6 + 0.5) / 1e6).as("heaps_ln_k"))
  }

  /** 3-shingle document-frequency histogram — the GRAIN-SELECTION
    * evidence behind the dedup design (shingle max-df ~25 vs
    * thousands for tokens is why the prefix-filter and LSH buckets
    * stay small): shingles exploded once, df counted, df bucketed by
    * integer bounds. Two partial-aggregable rollups, integer
    * everything. */
  def textShingleDfHist(s: SparkSession, d: String): DataFrame = {
    import graft.functions.exprs
    val df = Tables.documents(s, d)
      .select(col("doc_id"), explode(exprs.shingles(col("text"), 3))
        .as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val tot = df.agg(count(lit(1)).as("n_shingles"),
      max(col("df")).as("max_df"))
    df.select(
        expr("CAST(CASE WHEN df = 1 THEN 1 WHEN df = 2 THEN 2" +
          " WHEN df <= 5 THEN 3 WHEN df <= 10 THEN 6" +
          " WHEN df <= 25 THEN 11 ELSE 26 END AS BIGINT)")
          .as("bucket_lo"),
        expr("CASE WHEN df = 1 THEN '1' WHEN df = 2 THEN '2'" +
          " WHEN df <= 5 THEN '3-5' WHEN df <= 10 THEN '6-10'" +
          " WHEN df <= 25 THEN '11-25' ELSE '26+' END").as("df_bucket"))
      .groupBy(col("bucket_lo"), col("df_bucket"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("bucket_lo"), col("df_bucket"), col("n"),
        (floor(expr("CAST(n AS DOUBLE) / n_shingles") * 1e6 + 0.5)
          / 1e6).as("share"),
        col("n_shingles"), col("max_df"))
      .orderBy(col("bucket_lo"))
  }

  /** Retrieval-quality metrics (mean NDCG@10, MRR, P@10) of the
    * brute-force cosine ranking against label-match relevance — the
    * IR-eval readout beside ann_ivf_recall's index-recall gate. The
    * 20-query top-10 frame comes from the same broadcast-query kernel
    * as ann_brute_topk (corpus never shuffles); every discount/gain
    * is an integer micro-unit of a CONSTANT (1e6/ln(rank+1) of ranks
    * 1..10), IDCG truncates by the query label's corpus prevalence,
    * and per-query scores are re-fixed to the 1e-6 lattice before the
    * cross-query mean — order-free long sums throughout. */
  def embedRetrievalMetrics(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val c = emb.select(col("vec_id").as("c_id"),
      col("label").as("c_lbl"),
      col("embedding").cast("array<double>").as("_ce"))
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("label").as("q_lbl"),
        col("embedding").cast("array<double>").as("_qe"))
    val lblCnt = emb.groupBy(col("label").as("q_lbl"))
      .agg(count(lit(1)).as("_lc"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    val top = c.join(broadcast(q), col("c_id") =!= col("q_id"))
      .withColumn("score",
        round(graft.sim.Ann.cosine(col("_qe"), col("_ce")), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .join(broadcast(lblCnt), "q_lbl")
      .select(col("q_id"), col("rnk"),
        when(col("c_lbl") === col("q_lbl"), 1L).otherwise(0L).as("rel"),
        (col("_lc") - 1).as("n_rel"))
    val perQ = top
      .withColumn("disc6", expr("CAST(round(1e6 / ln(rnk + 1)) AS BIGINT)"))
      .groupBy(col("q_id"))
      .agg(sum(col("rel") * col("disc6")).as("dcg6"),
        sum(when(col("rnk") <= col("n_rel"), col("disc6"))
          .otherwise(lit(0L))).as("idcg6"),
        max(when(col("rel") === 1,
          expr("CAST(round(1e6 / rnk) AS BIGINT)"))).as("rr6"),
        sum(col("rel")).as("n_rel_10"))
      .select(col("q_id"),
        // a query whose label has exactly one corpus member (or whose
        // top-10 has idcg6 = 0) would give 0/0 = NaN, and NaN→BIGINT
        // casts disagree cross-engine (Spark yields 0, DuckDB raises):
        // guard the zero case identically on both sides
        expr("CASE WHEN idcg6 = 0 THEN 0 ELSE " +
          "CAST(round(CAST(dcg6 AS DOUBLE) / idcg6 * 1e6) AS BIGINT) END")
          .as("ndcg6"),
        coalesce(col("rr6"), lit(0L)).as("rr6"), col("n_rel_10"))
    perQ.agg(count(lit(1)).as("n_queries"),
        sum(col("ndcg6")).as("sn"), sum(col("rr6")).as("sr"),
        sum(col("n_rel_10")).as("sp"))
      .select(col("n_queries"),
        (floor(expr("CAST(sn AS DOUBLE) / n_queries / 1e6") * 1e6 + 0.5)
          / 1e6).as("mean_ndcg10"),
        (floor(expr("CAST(sr AS DOUBLE) / n_queries / 1e6") * 1e6 + 0.5)
          / 1e6).as("mrr"),
        (floor(expr("CAST(sp AS DOUBLE) / n_queries / 10") * 1e6 + 0.5)
          / 1e6).as("p_at_10"))
  }

  /** Per-source token-count overdispersion census with the
    * negative-binomial method-of-moments fit — the "are doc lengths
    * Poisson or bursty" readout that decides padding/packing strategy.
    * Variance via the exact integer moment identity (nΣx²−S² on
    * DECIMAL⇄HUGEINT, shared denominator n²); dispersion and the NB
    * (r, p) are pinned doubles; the var≤mean degenerate case emits
    * NULL r/p identically on both engines (the comparison is between
    * identical doubles). */
  def textOverdispersion(s: SparkSession, d: String): DataFrame = {
    val perDoc = Tables.documents(s, d)
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("s1"),
        sum(expr("CAST(n_tok AS DECIMAL(38,0)) * n_tok")).as("s2"))
      .withColumn("mean", expr("CAST(s1 AS DOUBLE) / n_docs"))
      .withColumn("variance", expr(
        "CAST(CAST(n_docs AS DECIMAL(38,0)) * s2" +
          " - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)" +
          " / (CAST(n_docs AS DOUBLE) * n_docs)"))
      .select(col("source"), col("n_docs"),
        (floor(col("mean") * 1e4 + 0.5) / 1e4).as("mean_tokens"),
        (floor(col("variance") * 1e4 + 0.5) / 1e4).as("var_tokens"),
        (floor(expr("variance / mean") * 1e6 + 0.5) / 1e6)
          .as("dispersion"),
        (floor(expr("CASE WHEN variance <= mean THEN NULL" +
          " ELSE mean * mean / (variance - mean) END") * 1e4 + 0.5)
          / 1e4).as("nb_r"),
        (floor(expr("CASE WHEN variance <= mean THEN NULL" +
          " ELSE mean / variance END") * 1e6 + 0.5) / 1e6).as("nb_p"))
      .orderBy(col("source"))
  }

  /** Per-source Jensen–Shannon divergence from the corpus unigram
    * distribution — the SYMMETRIC, bounded drift measure beside
    * [[textUnigramKl]]. The corpus-side KL needs every corpus token
    * (q > 0 where p = 0), but those absent-from-source tokens
    * contribute exactly (n_c − Σ_src cc)·ln2, so the whole statistic
    * folds over the source-token join alone — no source×vocab grid.
    * Both ln arguments are exact integer ratios fixed to micro-nats,
    * so every fold is an order-free long sum; two token rollups + one
    * token-keyed join, all partial-aggregable. */
  def textJsDivergence(s: SparkSession, d: String): DataFrame = {
    val ln2Micro = 693147L // round(ln(2) * 1e6)
    val toks = Tables.documents(s, d)
      .select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .localCheckpoint(true)
    val srcCnt = toks.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("cs"))
    val srcTot = toks.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val corpCnt = toks.groupBy(col("w")).agg(count(lit(1)).as("cc"))
    val corpTot = toks.agg(count(lit(1)).as("nc"))
    srcCnt.join(corpCnt, "w")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(corpTot))
      .select(col("source"), col("ns"), col("nc"),
        (col("cs") * expr("CAST(round(ln((2.0 * cs * nc) / " +
          "(CAST(cs AS DOUBLE) * nc + CAST(cc AS DOUBLE) * ns)) * 1e6)" +
          " AS BIGINT)")).as("p_term"),
        (col("cc") * expr("CAST(round(ln((2.0 * cc * ns) / " +
          "(CAST(cs AS DOUBLE) * nc + CAST(cc AS DOUBLE) * ns)) * 1e6)" +
          " AS BIGINT)")).as("q_term"),
        col("cc"))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_tokens"), max(col("nc")).as("nc"),
        sum(col("p_term")).as("p_sum"), sum(col("q_term")).as("q_sum"),
        sum(col("cc")).as("cc_seen"))
      .withColumn("q_tail", (col("nc") - col("cc_seen")) * lit(ln2Micro))
      .select(col("source"), col("n_tokens"),
        (floor(expr("(CAST(p_sum AS DOUBLE) / n_tokens" +
          " + CAST(q_sum + q_tail AS DOUBLE) / nc) / 2 / 1e6") * 1e6
          + 0.5) / 1e6).as("js_divergence"))
      .orderBy(col("source"))
  }

  /** TIFF roundtrip through the JDK's fourth genuine image codec (the
    * javax.imageio TIFF plugin): deterministic image → real TIFF bytes
    * (IFD/tag directory structure) → decode → dims + Σ red off the
    * DECODED pixels. Map-only codec seam (never shuffles); TIFF here
    * is lossless, so the generator-replay oracle proves the roundtrip
    * pixel-exact — the [[multimodalBmpCodec]] contract on the
    * directory-based container format. */
  def multimodalTiffCodec(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // spread ids across cores before the codec map (r17: the
      // single-split scan otherwise serializes the whole kernel on
      // one task — see multimodalVideoScenecut's note)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodeTiff(id)
        val (w, h, sum) = graft.mm.Codecs.decodePngStats(bytes)
        (id, w.toLong, h.toLong, sum)
      })
      .toDF("doc_id", "width", "height", "px_sum")
      .orderBy(col("doc_id"))
  }

  /** Flesch Reading Ease + Flesch–Kincaid grade per document via the
    * classic vowel-group syllable heuristic: words = [a-z0-9]+ runs,
    * sentences = [.!?]+ runs (min 1), syllables = [aeiouy]+ runs,
    * all counted on the lowercased text. Map-only (no shuffle at any
    * corpus size); the three counts are exact integers, the two
    * scores pinned-order double expressions over them — and both
    * regex dialects (Java, RE2) agree on these character-class
    * patterns by construction. */
  def textReadability(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_words"),
        greatest(size(regexp_extract_all(col("t"), lit("[.!?]+"),
          lit(0))), lit(1)).cast("long").as("n_sents"),
        size(regexp_extract_all(col("t"), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("n_syll"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("n_words"), col("n_sents"),
        col("n_syll"),
        (floor(expr("206.835 - 1.015 * (CAST(n_words AS DOUBLE)" +
          " / n_sents) - 84.6 * (CAST(n_syll AS DOUBLE) / n_words)")
          * 1e4 + 0.5) / 1e4).as("flesch_ease"),
        (floor(expr("0.39 * (CAST(n_words AS DOUBLE) / n_sents)" +
          " + 11.8 * (CAST(n_syll AS DOUBLE) / n_words) - 15.59")
          * 1e4 + 0.5) / 1e4).as("fk_grade"))
      .orderBy(col("doc_id"))
  }

  /** Windowed word co-occurrence PMI (window ±2): the collocation
    * extractor run before phrase-vocab induction. Token positions via
    * posexplode; the pair relation is TWO EQUI-JOINS on (doc,
    * pos + k), k ∈ {1,2} — keys unique per side, so the join is
    * perfectly distributed with no per-doc quadratic term. PMI =
    * ln(n_ab·T²/(P·n_a·n_b)) evaluated only for the top-30 pairs
    * (unigram counts joined AFTER the cut, broadcast-small), in exact
    * integer ratios under one pinned ln. */
  def textCoocPmi(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .localCheckpoint(true)
    val pairs = (1 to 2).map { k =>
      toks.as("x").join(toks.as("y"),
        col("x.doc_id") === col("y.doc_id") &&
          col("y.pos") === col("x.pos") + k)
        .select(least(col("x.w"), col("y.w")).as("w1"),
          greatest(col("x.w"), col("y.w")).as("w2"))
    }.reduce(_ unionByName _)
    val pc = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
    val totPair = pairs.agg(count(lit(1)).as("t_pair"))
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val totTok = toks.agg(count(lit(1)).as("t_tok"))
    val top = pc.filter(col("n_pair") >= 20)
      .orderBy(col("n_pair").desc, col("w1"), col("w2"))
      .limit(30)
    top
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_w1")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_w2")), "w2")
      .crossJoin(broadcast(totPair))
      .crossJoin(broadcast(totTok))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"),
        col("n_w2"),
        (floor(expr("ln(CAST(n_pair AS DOUBLE) * t_tok * t_tok" +
          " / (CAST(t_pair AS DOUBLE) * n_w1 * n_w2))") * 1e6 + 0.5)
          / 1e6).as("pmi"))
      .orderBy(col("n_pair").desc, col("w1"), col("w2"))
  }

  /** Vocabulary coverage curve: stream the corpus in portable-hash
    * order and report, per corpus decile, how many NEW distinct
    * tokens appear — the saturation diagnostic read before deciding
    * corpus size. Doc ranks ride the exact ranged
    * [[graft.ops.Ranks.globalRowNumber]]; a token's first-seen rank
    * is one min-aggregation over the distinct (doc, token) relation;
    * the 10-row curve is integer arithmetic end to end. */
  def dataCoverageCurve(s: SparkSession, d: String): DataFrame = {
    import graft.functions.exprs
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        exprs.md5Lower64(col("doc_id").cast("string")).as("h"))
    val ranked = graft.ops.Ranks.globalRowNumber(docs,
      Seq(col("h"), col("doc_id")), "rk")
    val n = ranked.agg(count(lit(1)).as("n_docs"))
    val withBucket = ranked.crossJoin(broadcast(n))
      .withColumn("bucket", expr("((rk - 1) * 10) div n_docs"))
      .localCheckpoint(true)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct()
    val firstSeen = toks.join(withBucket, "doc_id")
      .groupBy(col("w")).agg(min(col("rk")).as("first_rk"))
      .crossJoin(broadcast(n))
      .select(expr("((first_rk - 1) * 10) div n_docs").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_tokens"))
    val docsPer = withBucket.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs_bucket"))
    val cum = Ranks.globalRunningSum(
      docsPer.join(firstSeen, Seq("bucket"), "left")
        .withColumn("new_tokens", coalesce(col("new_tokens"), lit(0L))),
      Seq(col("bucket")), col("new_tokens"), "cum_tokens")
    cum.select(col("bucket"), col("n_docs_bucket"), col("new_tokens"),
        col("cum_tokens"))
      .orderBy(col("bucket"))
  }

  /** WBMP roundtrip census — the FIFTH real javax.imageio codec
    * (1-bit WAP bitmap): encode the thresholded deterministic image,
    * decode through the shared stats kernel, emit (w, h, px_sum).
    * Bit-packed rows are the one container shape the byte/int codecs
    * never exercise; the generator-replay oracle thresholds the same
    * arithmetic, so the roundtrip is pixel-exact by equality. Map-only
    * codec seam (the documented mapPartitions exception). */
  def multimodalWbmpCodec(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // spread ids across cores before the codec map (r17: the
      // single-split scan otherwise serializes the whole kernel on
      // one task — see multimodalVideoScenecut's note)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodeWbmp(id)
        val (w, h, sum) = graft.mm.Codecs.decodePngStats(bytes)
        (id, w.toLong, h.toLong, sum)
      })
      .toDF("doc_id", "width", "height", "px_sum")
      .orderBy(col("doc_id"))
  }

  /** Chao1 vocabulary-richness estimate per source: how many token
    * TYPES exist that the corpus never sampled —
    * Chao1 = V + F₁(F₁−1)/(2(F₂+1)) (the bias-corrected form, defined
    * even at F₂ = 0) from the singleton/doubleton census — the
    * coverage companion to text_heaps_law's growth exponent (Heaps
    * extrapolates, Chao1 bounds). Two grouped integer rollups over
    * the token census; the estimate is one pinned double per
    * source. */
  def textChao1Richness(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"),
        sum(col("c")).as("n_tokens"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("f1"), col("f2"),
        (floor((col("vocab") + expr(
          "CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1))"))
          * 100.0 + 0.5) / 100.0).as("chao1"),
        (floor(expr("CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1))")
          / col("vocab") * 1e6 + 0.5) / 1e6).as("unseen_share"))
      .orderBy(col("source"))

  /** Embedding-space ISOTROPY census: the mean pairwise cosine and the
    * dominant-direction mass — the "is this embedding space collapsed
    * toward a common direction" health check every retrieval corpus
    * needs before trusting cosine similarity (anisotropic spaces
    * inflate all similarities). Components quantize to the e6 integer
    * lattice, each vector normalizes AGAINST ITS EXACT integer norm
    * (sqrt of a DECIMAL sum — one correctly-rounded double per vec,
    * identical both engines) and re-quantizes, so the per-dim sums
    * S_d, Σ‖c‖² and Σ S_d² are ALL exact integers and the pairwise-
    * mean identity mean_cos = (Σ S_d² − Σ‖c‖²)/(n(n−1)) never touches
    * a float fold. One posexplode + two grouped rollups — linear in
    * n·dim, never pairwise. */
  def embedIsotropy(s: SparkSession, d: String): DataFrame = {
    val comps = Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "x")))
      .withColumn("x6", expr("CAST(floor(x * 1e6 + 0.5) AS BIGINT)"))
    val norm2 = comps.groupBy(col("vec_id"))
      .agg(sum(expr("CAST(x6 AS DECIMAL(38,0)) * x6")).as("n2"))
    val unit = comps.join(norm2, "vec_id")
      .withColumn("c6", expr(
        "CAST(floor(x6 / sqrt(CAST(n2 AS DOUBLE)) * 1e6 + 0.5)" +
          " AS BIGINT)"))
    val dimSums = unit.groupBy(col("dim"))
      .agg(sum(col("c6")).as("sd"),
        sum(expr("CAST(c6 AS DECIMAL(38,0)) * c6")).as("sc2"))
    val nv = Tables.embeddings(s, d).count()
    dimSums
      .agg(sum(expr("CAST(sd AS DECIMAL(38,0)) * sd")).as("ss2"),
        sum(col("sc2")).as("snorm"),
        max(abs(col("sd"))).as("max_abs_sd"),
        count(lit(1)).as("dim"))
      .select(lit(nv).as("n_vecs"), col("dim"),
        (floor(expr(s"CAST(ss2 - snorm AS DOUBLE)" +
          s" / (CAST($nv AS DOUBLE) * ($nv - 1)) / 1e12") * 1e6 + 0.5)
          / 1e6).as("mean_cos"),
        // the mean-direction mass: ‖Σc‖/n in unit-norm e6 terms
        (floor(sqrt(expr("CAST(ss2 AS DOUBLE)")) / nv / 1e6 * 1e6
          + 0.5) / 1e6).as("mean_dir_mass"))
  }

  /** Per-dimension quantile-clipping census of the embedding corpus:
    * p1/p99 per dim plus how many values each bound would clip — the
    * feature-prep readout (outlier clamping) run before quantization
    * (embed_int8_quant) or indexing. Components on the exact e6
    * lattice; the interpolated percentiles run on identical integers
    * both engines (the embed_norm_stats convention) and the clip
    * counts compare integers against those identical doubles. One
    * posexplode + one grouped fold per dim. */
  def embedQuantileClip(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "x")))
      .withColumn("x6", expr("CAST(floor(x * 1e6 + 0.5) AS BIGINT)"))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(x6, 0.01)").as("_p01"),
        expr("percentile(x6, 0.99)").as("_p99"))
      .join(
        Tables.embeddings(s, d)
          .select(posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "x")))
          .withColumn("x6", expr("CAST(floor(x * 1e6 + 0.5) AS BIGINT)"))
          .select(col("dim").cast("long").as("dim"), col("x6")),
        Seq("dim"))
      .groupBy(col("dim"), col("n"), col("_p01"), col("_p99"))
      .agg(sum(when(col("x6") < col("_p01"), 1L).otherwise(0L))
        .as("n_below"),
        sum(when(col("x6") > col("_p99"), 1L).otherwise(0L))
          .as("n_above"))
      .select(col("dim"), col("n"),
        (floor(col("_p01") / 1e6 * 1e6 + 0.5) / 1e6).as("p01"),
        (floor(col("_p99") / 1e6 * 1e6 + 0.5) / 1e6).as("p99"),
        col("n_below"), col("n_above"))
      .orderBy(col("dim"))

  /** Binary-PPM (P6) roundtrip census — the SIXTH real codec, this one
    * hand-rolled at the byte level (graft.mm.Codecs.encodePnm /
    * decodePnmStats): NetPBM's ASCII-header/binary-raster split with
    * comment tolerance, the interchange container javax.imageio never
    * ships. Same map-only codec seam and generator-replay oracle as
    * the other five. */
  /** SEVENTH real codec: QOI (qoiformat.org), hand-rolled encode AND
    * decode at the byte level (graft.mm.Codecs.encodeQoi /
    * decodeQoiStats) — the modern run/index/delta-chunk format no
    * JDK plugin ships; the gray ramp exercises the full op alphabet
    * (RUN, INDEX, LUMA, RGB). Same map-only codec seam and
    * generator-replay oracle as the other six. */
  def multimodalQoiCodec(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // spread ids across cores before the codec map (r17: the
      // single-split scan otherwise serializes the whole kernel on
      // one task — see multimodalVideoScenecut's note)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodeQoi(id)
        val (w, h, sum) = graft.mm.Codecs.decodeQoiStats(bytes)
        (id, w.toLong, h.toLong, sum)
      })
      .toDF("doc_id", "width", "height", "px_sum")
      .orderBy(col("doc_id"))
  }

  def multimodalPnmCodec(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      // spread ids across cores before the codec map (r17: the
      // single-split scan otherwise serializes the whole kernel on
      // one task — see multimodalVideoScenecut's note)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val bytes = graft.mm.Codecs.encodePnm(id)
        val (w, h, sum) = graft.mm.Codecs.decodePnmStats(bytes)
        (id, w.toLong, h.toLong, sum)
      })
      .toDF("doc_id", "width", "height", "px_sum")
      .orderBy(col("doc_id"))
  }

  /** Per-source lexical diversity via Simpson's D (repeat-draw
    * probability of the same token): the mean per-doc D and the
    * POOLED source-level D — the complementary diversity readout
    * beside text_entropy (Shannon) and text_heaps_law (growth). Each
    * doc's D is FIXED to the micro lattice by integer division
    * (Σc(c−1)·10⁶ div N(N−1) — both engines floor the same
    * integers), so the per-source mean is an order-free long sum; the
    * pooled D divides DECIMAL⇄HUGEINT census sums once. Two grouped
    * rollups over the token census — 100 TB-shaped like
    * text_vocab_idf. */
  /** Classical vocabulary-richness indexes per source — Yule's K
    * (repeat-rate, via the frequency-spectrum identity Σm²Vₘ = Σc²),
    * Guiraud's R = V/√N and Honoré's H = 100·ln N/(1−V₁/V) (hapax
    * weight) — the closed-form companions to [[textHeapsLaw]]'s
    * growth fit and text_chao1_richness's coverage bound. One token
    * census per source (Σc² on DECIMAL(38,0)⇄HUGEINT); each index is
    * a constant pinned double tail, ln on identical integers (the
    * micro-nat acceptance), V₁=V guarded by nullif identically both
    * engines. */
  def textYuleRichness(s: SparkSession, d: String): DataFrame = {
    val c = Tables.documents(s, d)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    c.groupBy(col("source"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("v"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("v1"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
      .select(col("source"), col("n"), col("v"), col("v1"),
        (floor(expr("1e4 * (CAST(s2 AS DOUBLE) - n)" +
          " / (CAST(n AS DOUBLE) * n)") * 1e4 + 0.5) / 1e4)
          .as("yule_k"),
        (floor(expr("CAST(v AS DOUBLE) / sqrt(CAST(n AS DOUBLE))")
          * 1e4 + 0.5) / 1e4).as("guiraud_r"),
        (floor(expr("100 * ln(CAST(n AS DOUBLE)) / nullif(1.0" +
          " - CAST(v1 AS DOUBLE) / v, 0.0)") * 100 + 0.5) / 100)
          .as("honore_h"))
      .orderBy(col("source"))
  }

  /** Mean segmental type-token ratio (MSTTR-50) per source: each
    * doc's token stream chops into consecutive 50-token segments,
    * full segments score TTR = V·10⁴ div 50 on the exact basis-point
    * lattice (integer — no length-confounded raw TTR), and the
    * source mean is one division of exact integers. The
    * length-robust diversity readout beside text_simpson_diversity;
    * two grouped rollups, 100 TB-shaped. */
  def textMsttr(s: SparkSession, d: String): DataFrame = {
    val seg = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
      .withColumn("seg", expr("pos div 50"))
      .groupBy(col("source"), col("doc_id"), col("seg"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok")).as("v"))
      .filter(col("n_tok") === 50)
      .withColumn("ttr_bp", col("v") * 200)
    seg.groupBy(col("source"))
      .agg(count(lit(1)).as("n_segments"), sum(col("ttr_bp")).as("_s"))
      .select(col("source"), col("n_segments"),
        (floor(expr("CAST(_s AS DOUBLE) / n_segments") * 100 + 0.5)
          / 100).as("mean_ttr_bp"))
      .orderBy(col("source"))
  }

  /** Burrows' Delta between sources — the classical stylometric
    * attribution distance: relative frequencies of the top-20 corpus
    * words per source (micro lattice, c·10⁶ div N), z-scored across
    * the 20 sources per word (doubles over identical integers, then
    * FIXED to the micro lattice so the word fold is order-free), and
    * Δ(a,b) = mean over words of |z_a − z_b|. Corpus-scaled work is
    * one token census; the z/Δ stage lives on the
    * 20-source × 20-word grid. Emits the full ordered pair matrix. */
  def textBurrowsDelta(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val top = tok.groupBy(col("tok")).agg(count(lit(1)).as("ct"))
      .orderBy(col("ct").desc, col("tok")).limit(20)
      .select(col("tok"))
    val nS = tok.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val grid = nS.crossJoin(broadcast(top))
    val f = grid.join(
        tok.join(broadcast(top), Seq("tok"))
          .groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("c")),
        Seq("source", "tok"), "left")
      .na.fill(0L, Seq("c"))
      .select(col("source"), col("tok"),
        expr("(c * 1000000) div n_s").as("f6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tok"))
    val z = f
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("sf", sum(col("f6")).over(w))
      .withColumn("sff", sum(col("f6") * col("f6")).over(w))
      .withColumn("z6", floor(
        expr("(CAST(k AS DOUBLE) * f6 - sf)" +
          " / nullif(sqrt(CAST(k AS DOUBLE) * sff" +
          " - CAST(sf AS DOUBLE) * sf), 0.0)")
          * 1e6).cast("long"))
      .select(col("source"), col("tok"), col("z6"))
    z.as("a").join(z.as("b"), col("a.tok") === col("b.tok") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_words"),
        sum(abs(col("a.z6") - col("b.z6"))).as("_s6"))
      .select(col("source_a"), col("source_b"), col("n_words"),
        (floor(expr("CAST(_s6 AS DOUBLE) / n_words / 1e6") * 1e6 + 0.5)
          / 1e6).as("delta"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def textSimpsonDiversity(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val perDoc = toks
      .groupBy(col("source"), col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"), col("doc_id"))
      .agg(sum(col("c")).as("n"),
        sum(col("c") * (col("c") - 1)).as("rep"))
      .withColumn("d_micro", expr("(rep * 1000000) div nullif(n * (n - 1), 0)"))
    val pooled = toks
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * (c - 1)")).as("rep"))
      .withColumn("pooled_micro", expr(
        "(rep * 1000000) div nullif(CAST(n AS DECIMAL(38,0)) * (n - 1), 0)"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("d_micro")).as("_sd"))
      .join(pooled.select(col("source"), col("pooled_micro")), "source")
      .select(col("source"), col("n_docs"),
        (floor(col("_sd").cast("double") / col("n_docs") / 1e6 * 1e6
          + 0.5) / 1e6).as("mean_doc_simpson"),
        (floor(col("pooled_micro").cast("double") / 1e6 * 1e6 + 0.5)
          / 1e6).as("pooled_simpson"))
      .orderBy(col("source"))
  }

  /** Unicode-canonical dedup census: three deterministic variants of
    * every document — the original, a FULLWIDTH-letter homoglyph
    * (ａ–ｚ, the width dup an ASCII lower() cannot see), and an
    * uppercased combining-acute-vowel form (casefold + mark-strip
    * dup) — must all collapse to ONE fingerprint under
    * [[graft.functions.exprs.nfkcCanon]] (NFKC + ROOT casefold + NFD
    * combining-mark strip, java.text.Normalizer). The census per doc
    * (n_variants, n_canon, canonical hash) is matched value-for-value
    * by the generator-replay oracle, which derives the expected hash
    * from the CLEAN lowered text — the corpus is ASCII, so the
    * canonical form of every variant must equal lower(text) exactly
    * (the multimodal-codec replay pattern: the oracle knows the
    * answer because it replays the generation; the engine must UNDO
    * it). Map-only variant fan-out + one grouped census — no text
    * ever shuffles twice, 100 TB-shaped like dedup_exact. */
  def dedupUnicode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val ascii = "abcdefghijklmnopqrstuvwxyz"
    val fullwidth = (0 until 26).map(i => (0xFF41 + i).toChar).mkString
    val variants = docs
      .select(col("doc_id"), lit("orig").as("variant"),
        col("text").as("vtext"))
      .union(docs.select(col("doc_id"), lit("fullwidth").as("variant"),
        translate(col("text"), ascii, fullwidth).as("vtext")))
      .union(docs.select(col("doc_id"), lit("accent").as("variant"),
        upper(regexp_replace(col("text"), "([aeiou])", "$1\u0301"))
          .as("vtext")))
    variants
      .withColumn("canon_h", graft.functions.exprs.md5Lower64(
          graft.functions.exprs.nfkcCanon(col("vtext")))
        .bitwiseAND(lit(Long.MaxValue)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_variants"),
        countDistinct(col("canon_h")).as("n_canon"),
        min(col("canon_h")).as("canon_h"))
      .orderBy(col("doc_id"))
  }
}
