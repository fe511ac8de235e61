package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Analytics, Behavior, JsonQueries, Mining, MlEval, PipelineQueries, Profiling, Stats, Warehouse}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator has a `queries` entry; SQL-expressible ones
  * also have an `oracleSql` entry (DuckDB, same parquet tables). Column
  * names are aliased identically on both sides; doubles rounded on both
  * sides; deterministic total ORDER BY on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(spark, "/root/testdata/sf0.001")

  /** The distinct-3-gram shingle CTE shared by every document-pair
    * oracle — ONE definition so shingle semantics (trim/split/k) can
    * never silently diverge between oracles. `rel` is the table/CTE
    * the shingles are computed over. */
  private def shingleCte(rel: String): String =
    s"""sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(greatest(len(t) - 2, 0)),
       |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS s
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |        FROM $rel) d)""".stripMargin

  /** Adjacent shingle CTE fragments for the pair/edge oracles.
    *
    * Candidate pairs come from a shingle inverted-index self-join, not
    * an all-pairs cross product: Jaccard(a,b) ≥ 0.5 > 0 requires
    * |a∩b| ≥ 1, so every qualifying pair shares at least one shingle
    * and the blocking is provably COMPLETE — the truth set is
    * unchanged, only unreachable pairs are skipped. At sf0.1 that is
    * ~1.3M candidates (max shingle doc-frequency 25) instead of the
    * 1.8·10⁹-pair cross join that made DuckDB replay in hours. */
  private def pairEdgeCtes(rel: String): String =
    s"""${shingleCte(rel)},
       |u AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) > 0),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM u a JOIN u b ON b.g = a.g AND b.doc_id > a.doc_id),
       |p AS (
       |  SELECT id_a, id_b, sa.s AS sa, sb.s AS sb
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = id_a
       |  JOIN sh sb ON sb.doc_id = id_b),
       |e AS (
       |  SELECT id_a, id_b FROM p
       |  WHERE round(len(list_intersect(sa, sb))::DOUBLE /
       |        len(list_distinct(list_concat(sa, sb))), 4) >= 0.5),
       |reach(id, r) AS (
       |  SELECT id_a, id_a FROM e UNION SELECT id_b, id_b FROM e
       |  UNION
       |  SELECT reach.id,
       |    CASE WHEN e.id_a = reach.r THEN e.id_b ELSE e.id_a END
       |  FROM reach JOIN e ON e.id_a = reach.r OR e.id_b = reach.r)""".stripMargin

  /** Oracle SQL with per-run substitutions applied — Verify dumps THIS
    * so the gate works at any scale dir (source_binary_files globs the
    * actual sfDir instead of a hardcoded one). */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    oracleSql + ("source_binary_files" ->
      s"""SELECT regexp_extract(filename, '[^/]+$$', 0) AS fname,
         |  size AS length
         |FROM read_blob('$sfDir/*.parquet')
         |ORDER BY fname""".stripMargin) +
      ("source_files_audit" ->
        s"""SELECT regexp_extract(filename, '[^/]+$$', 0) AS fname,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
           |FROM read_parquet('$sfDir/orders.parquet', filename=true)
           |GROUP BY 1 ORDER BY 1""".stripMargin) ++
      graft.ops.PipelineQueries.cachedIvfModel(sfDir)
        .map(m => "ann_ivf_topk" -> annIvfOracle(m)).toMap ++
      graft.ops.PipelineQueries.cachedPqModel(sfDir)
        .map(m => "ann_pq_topk" -> annPqOracle(m)).toMap ++
      (for {
        i <- graft.ops.PipelineQueries.cachedIvfModel(sfDir)
        p <- graft.ops.PipelineQueries.cachedPqModel(sfDir)
      } yield "ann_ivfpq_topk" -> annIvfPqOracle(i, p)).toMap ++
      (for {
        i <- graft.ops.PipelineQueries.cachedIvfModel(sfDir)
        p <- graft.ops.PipelineQueries.cachedPqModel(sfDir)
      } yield "ann_ivfpq_filtered" ->
        annIvfPqOracle(i, p, candCond = "label = 1")).toMap ++
      // the streaming probe is contracted to converge to the batch
      // IVF-PQ answer — the same model-folded oracle, shared verbatim
      (for {
        i <- graft.ops.PipelineQueries.cachedIvfModel(sfDir)
        p <- graft.ops.PipelineQueries.cachedPqModel(sfDir)
      } yield "stream_ann_probe" -> annIvfPqOracle(i, p)).toMap ++
      // the incrementally-maintained index is contracted to SERVE
      // identically to the full rebuild — the same model-folded
      // oracle, shared verbatim (upsert ≡ rebuild at value level)
      (for {
        i <- graft.ops.PipelineQueries.cachedIvfModel(sfDir)
        p <- graft.ops.PipelineQueries.cachedPqModel(sfDir)
      } yield "ann_index_upsert" -> annIvfPqOracle(i, p)).toMap

  /** Bounded-staleness as-of oracle, shared by the batch composition
    * (q_asof_tolerance) and its native watermarked interval-join
    * streaming twin (stream_asof_interval). */
  private val asofToleranceOracle: String =
    """WITH p AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
      |    arg_max(value, event_id) AS pval
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |e AS (
      |  SELECT event_id, user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      |  FROM events)
      |SELECT e.event_id,
      |  CASE WHEN e.ts_s - p.ts_s <= 3600 THEN round(p.pval, 2) END
      |    AS purchase_1h
      |FROM e ASOF LEFT JOIN p
      |  ON e.user_id = p.user_id AND e.ts_s >= p.ts_s
      |ORDER BY e.event_id""".stripMargin

  /** text_bpe_train oracle: the N trainer rounds unrolled as chained
    * CTEs (constant-folded — no recursive aggregation, which standard
    * SQL recursion disallows). Round k derives pair counts from the
    * previous round's merged word-frequency table, picks the (count
    * DESC, lhs, rhs) argmax, and applies the merge via replace() on
    * the chr(1)-delimited symbol string — the identical left-to-right
    * non-overlapping literal scan the Spark side runs. */
  /** The shared CTE chain for the BPE oracles: word-frequency base +
    * `rounds` (pair-count argmax, merge) steps. `withFinalMerge`
    * controls whether the last round's merged vocab w{rounds} is
    * emitted (the apply oracle reads it; the train oracle stops at
    * t{rounds}). */
  private def bpeChainSql(rounds: Int, withFinalMerge: Boolean): String = {
    val base =
      """WITH w0 AS (
        |  SELECT chr(1) || regexp_replace(w, '(.)', '\1' || chr(1), 'g')
        |      AS w,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
        |      AS w FROM documents)
        |  WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
        |  GROUP BY 1)""".stripMargin
    val steps = (1 to rounds).map { r =>
      val merge =
        if (r == rounds && !withFinalMerge) ""
        else
          s""",
             |w$r AS (
             |  SELECT replace(w${r - 1}.w,
             |      chr(1) || t$r.a || chr(1) || t$r.b || chr(1),
             |      chr(1) || t$r.a || t$r.b || chr(1)) AS w, cnt
             |  FROM w${r - 1}, t$r)""".stripMargin
      s""",
         |t$r AS (
         |  SELECT p[1] AS a, p[2] AS b, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (
         |    SELECT unnest(list_transform(range(1, len(s)),
         |        i -> [s[i], s[i + 1]])) AS p, cnt
         |    FROM (SELECT list_filter(string_split(w, chr(1)),
         |        x -> x <> '') AS s, cnt FROM w${r - 1}))
         |  GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 1)$merge""".stripMargin
    }.mkString
    base + steps
  }

  private def bpeTrainOracle(rounds: Int): String =
    bpeChainSql(rounds, withFinalMerge = false) + (1 to rounds)
      .map(r => s"SELECT CAST($r AS BIGINT) AS round, a AS lhs, b AS rhs," +
        s" n AS pair_count FROM t$r")
      .mkString("\n", "\nUNION ALL ", "\nORDER BY round")

  private def bpeApplyOracle(rounds: Int): String =
    bpeChainSql(rounds, withFinalMerge = true) +
      s"""
         |SELECT tok, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_words
         |FROM (SELECT unnest(list_filter(string_split(w, chr(1)),
         |    x -> x <> '')) AS tok, cnt FROM w$rounds)
         |GROUP BY 1 ORDER BY n_tokens DESC, tok LIMIT 20""".stripMargin

  /** ann_ivf_topk oracle, built from the quantizer that the query run
    * itself fitted (deterministic seeded fit, cached per corpus dir):
    * the centroids become VALUES literals, and DuckDB replays cell
    * assignment (squared-L2 argmin, ties to the lower cell), 4-probe
    * selection, and the in-cell cosine ranking — so even the ML-model-
    * backed approximate operator gets a full value-level oracle.
    * Double.toString emits shortest-round-trip decimals: the parsed
    * constants are bit-identical on both engines. */
  private def annIvfOracle(m: graft.sim.Ivf.IvfModel): String = {
    val dim = m.centroids.head.length
    val values = m.centroids.zipWithIndex
      .map { case (c, j) => s"($j, [${c.mkString(", ")}])" }
      .mkString(", ")
    s"""WITH cents(cell, cv) AS (VALUES $values),
       |cd AS (SELECT cell, unnest(range(0, $dim)) AS dim,
       |         unnest(cv)::DOUBLE AS c FROM cents),
       |v AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
       |        unnest(embedding)::DOUBLE AS x FROM embeddings),
       |d2 AS (SELECT v.vec_id, cd.cell,
       |         sum((v.x - cd.c) * (v.x - cd.c)) AS d
       |       FROM v JOIN cd ON v.dim = cd.dim GROUP BY 1, 2),
       |rk AS (SELECT vec_id, cell, row_number() OVER (
       |         PARTITION BY vec_id ORDER BY d, cell) AS rn FROM d2),
       |assign AS (SELECT vec_id AS c_id, cell FROM rk WHERE rn = 1),
       |probes AS (SELECT vec_id AS q_id, cell FROM rk
       |           WHERE vec_id < 10 AND rn <= 4),
       |pair AS (SELECT p.q_id, a.c_id
       |         FROM probes p JOIN assign a USING (cell)
       |         WHERE a.c_id <> p.q_id),
       |z AS (SELECT pr.q_id, pr.c_id, qv.x AS x, cv2.x AS y
       |      FROM pair pr
       |      JOIN v qv ON qv.vec_id = pr.q_id
       |      JOIN v cv2 ON cv2.vec_id = pr.c_id AND cv2.dim = qv.dim),
       |sums AS (SELECT q_id, c_id, sum(x*y) AS dt, sum(x*x) AS na,
       |                sum(y*y) AS nb FROM z GROUP BY 1, 2),
       |sc AS (SELECT q_id, c_id,
       |         round(dt / (sqrt(na) * sqrt(nb)), 4) AS score FROM sums),
       |r AS (SELECT q_id, c_id, score,
       |        CAST(row_number() OVER (PARTITION BY q_id
       |          ORDER BY score DESC, c_id) AS INTEGER) AS rnk FROM sc)
       |SELECT q_id, rnk, c_id, score FROM r WHERE rnk <= 5
       |ORDER BY 1, 2""".stripMargin
  }

  /** ann_pq_topk oracle, built from the codebooks the query run itself
    * fitted: every codeword becomes a VALUES literal and DuckDB replays
    * the whole two-stage PQ pipeline — per-subspace squared-L2 argmin
    * assignment (ties to the lower code, matching NearestCells),
    * codeword reconstruction, the rounded-ADC top-100 shortlist, and
    * the exact-cosine re-rank of the shortlist. */
  private def annPqOracle(m: graft.sim.Pq.PqModel): String = {
    val sub = m.subDim
    val values = (for {
      j <- m.codebooks.indices
      c <- m.codebooks(j).indices
    } yield s"($j, $c, [${m.codebooks(j)(c).mkString(", ")}])")
      .mkString(", ")
    s"""WITH cb(j, code, cw) AS (VALUES $values),
       |cd AS (SELECT j, code, unnest(range(0, $sub)) AS sd,
       |         unnest(cw)::DOUBLE AS c FROM cb),
       |v AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
       |        unnest(embedding)::DOUBLE AS x FROM embeddings),
       |sv AS (SELECT vec_id, CAST(dim // $sub AS INTEGER) AS j,
       |         CAST(dim % $sub AS INTEGER) AS sd, x FROM v),
       |d2 AS (SELECT sv.vec_id, cd.j, cd.code,
       |         sum((sv.x - cd.c) * (sv.x - cd.c)) AS d
       |       FROM sv JOIN cd ON sv.j = cd.j AND sv.sd = cd.sd
       |       GROUP BY 1, 2, 3),
       |rk AS (SELECT vec_id, j, code, row_number() OVER (
       |         PARTITION BY vec_id, j ORDER BY d, code) AS rn FROM d2),
       |codes AS (SELECT vec_id, j, code FROM rk WHERE rn = 1),
       |recon AS (SELECT codes.vec_id AS c_id, cd.j * $sub + cd.sd AS dim,
       |            cd.c AS y
       |          FROM codes JOIN cd ON cd.j = codes.j
       |            AND cd.code = codes.code),
       |q AS (SELECT vec_id AS q_id, dim, x FROM v WHERE vec_id < 10),
       |z AS (SELECT q.q_id, r.c_id, q.x, r.y
       |      FROM q JOIN recon r ON q.dim = r.dim AND r.c_id <> q.q_id),
       |sums AS (SELECT q_id, c_id, sum(x*y) AS dt, sum(x*x) AS na,
       |           sum(y*y) AS nb FROM z GROUP BY 1, 2),
       |adc AS (SELECT q_id, c_id,
       |          round(dt / (sqrt(na) * sqrt(nb)), 4) AS a FROM sums),
       |short AS (SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY a DESC, c_id) AS srn FROM adc)
       |  WHERE srn <= 100),
       |z2 AS (SELECT s.q_id, s.c_id, qv.x, cv.x AS y
       |       FROM short s
       |       JOIN v qv ON qv.vec_id = s.q_id
       |       JOIN v cv ON cv.vec_id = s.c_id AND cv.dim = qv.dim),
       |sums2 AS (SELECT q_id, c_id, sum(x*y) AS dt, sum(x*x) AS na,
       |            sum(y*y) AS nb FROM z2 GROUP BY 1, 2),
       |sc AS (SELECT q_id, c_id,
       |         round(dt / (sqrt(na) * sqrt(nb)), 4) AS score FROM sums2),
       |r AS (SELECT q_id, c_id, score,
       |        CAST(row_number() OVER (PARTITION BY q_id
       |          ORDER BY score DESC, c_id) AS INTEGER) AS rnk FROM sc)
       |SELECT q_id, rnk, c_id, score FROM r WHERE rnk <= 5
       |ORDER BY 1, 2""".stripMargin
  }

  /** ann_ivfpq_topk oracle — the composite replay: IVF centroids AND
    * PQ codebooks fold in as VALUES literals, and DuckDB runs the full
    * production pipeline (cell argmin + 4-probe selection from the IVF
    * oracle, per-subspace code argmin + reconstruction from the PQ
    * oracle, then the rounded-ADC shortlist restricted to probed-cell
    * candidates and the exact-cosine re-rank). */
  private def annIvfPqOracle(iv: graft.sim.Ivf.IvfModel,
      m: graft.sim.Pq.PqModel, candCond: String = "TRUE"): String = {
    val dim = iv.centroids.head.length
    val cellValues = iv.centroids.zipWithIndex
      .map { case (c, j) => s"($j, [${c.mkString(", ")}])" }
      .mkString(", ")
    val sub = m.subDim
    val cbValues = (for {
      j <- m.codebooks.indices
      c <- m.codebooks(j).indices
    } yield s"($j, $c, [${m.codebooks(j)(c).mkString(", ")}])")
      .mkString(", ")
    s"""WITH cents(cell, cv) AS (VALUES $cellValues),
       |ccd AS (SELECT cell, unnest(range(0, $dim)) AS dim,
       |          unnest(cv)::DOUBLE AS c FROM cents),
       |v AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
       |        unnest(embedding)::DOUBLE AS x FROM embeddings),
       |cd2 AS (SELECT v.vec_id, ccd.cell,
       |          sum((v.x - ccd.c) * (v.x - ccd.c)) AS d
       |        FROM v JOIN ccd ON v.dim = ccd.dim GROUP BY 1, 2),
       |crk AS (SELECT vec_id, cell, row_number() OVER (
       |          PARTITION BY vec_id ORDER BY d, cell) AS rn FROM cd2),
       |assign AS (SELECT vec_id AS c_id, cell FROM crk WHERE rn = 1
       |           AND vec_id IN (SELECT vec_id FROM embeddings
       |                          WHERE $candCond)),
       |probes AS (SELECT vec_id AS q_id, cell FROM crk
       |           WHERE vec_id < 10 AND rn <= 4),
       |pair AS (SELECT p.q_id, a.c_id
       |         FROM probes p JOIN assign a USING (cell)
       |         WHERE a.c_id <> p.q_id),
       |cb(j, code, cw) AS (VALUES $cbValues),
       |cd AS (SELECT j, code, unnest(range(0, $sub)) AS sd,
       |         unnest(cw)::DOUBLE AS c FROM cb),
       |sv AS (SELECT vec_id, CAST(dim // $sub AS INTEGER) AS j,
       |         CAST(dim % $sub AS INTEGER) AS sd, x FROM v),
       |d2 AS (SELECT sv.vec_id, cd.j, cd.code,
       |         sum((sv.x - cd.c) * (sv.x - cd.c)) AS d
       |       FROM sv JOIN cd ON sv.j = cd.j AND sv.sd = cd.sd
       |       GROUP BY 1, 2, 3),
       |rk AS (SELECT vec_id, j, code, row_number() OVER (
       |         PARTITION BY vec_id, j ORDER BY d, code) AS rn FROM d2),
       |codes AS (SELECT vec_id, j, code FROM rk WHERE rn = 1),
       |recon AS (SELECT codes.vec_id AS c_id, cd.j * $sub + cd.sd AS dim,
       |            cd.c AS y
       |          FROM codes JOIN cd ON cd.j = codes.j
       |            AND cd.code = codes.code),
       |z AS (SELECT pr.q_id, pr.c_id, qv.x, r.y
       |      FROM pair pr
       |      JOIN v qv ON qv.vec_id = pr.q_id
       |      JOIN recon r ON r.c_id = pr.c_id AND r.dim = qv.dim),
       |sums AS (SELECT q_id, c_id, sum(x*y) AS dt, sum(x*x) AS na,
       |           sum(y*y) AS nb FROM z GROUP BY 1, 2),
       |adc AS (SELECT q_id, c_id,
       |          round(dt / (sqrt(na) * sqrt(nb)), 4) AS a FROM sums),
       |short AS (SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY a DESC, c_id) AS srn FROM adc)
       |  WHERE srn <= 50),
       |z2 AS (SELECT s.q_id, s.c_id, qv.x, cv.x AS y
       |       FROM short s
       |       JOIN v qv ON qv.vec_id = s.q_id
       |       JOIN v cv ON cv.vec_id = s.c_id AND cv.dim = qv.dim),
       |sums2 AS (SELECT q_id, c_id, sum(x*y) AS dt, sum(x*x) AS na,
       |            sum(y*y) AS nb FROM z2 GROUP BY 1, 2),
       |sc AS (SELECT q_id, c_id,
       |         round(dt / (sqrt(na) * sqrt(nb)), 4) AS score FROM sums2),
       |r AS (SELECT q_id, c_id, score,
       |        CAST(row_number() OVER (PARTITION BY q_id
       |          ORDER BY score DESC, c_id) AS INTEGER) AS rnk FROM sc)
       |SELECT q_id, rnk, c_id, score FROM r WHERE rnk <= 5
       |ORDER BY 1, 2""".stripMargin
  }

  /** Shared by q_sliding_window (batch) and stream_sliding_window
    * (Structured Streaming): same windows, same totals — the streaming
    * run must converge to the batch answer. */
  private def slidingWindowOracle: String =
    """WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
      |    event_type, value FROM events),
      |w AS (SELECT ts_s, event_type, value,
      |    (ts_s // 1800) * 1800 AS w0 FROM e),
      |x AS (SELECT event_type, value, ts_s,
      |    unnest([w0, w0 - 1800]) AS ws FROM w),
      |f AS (SELECT * FROM x WHERE ts_s >= ws AND ts_s < ws + 3600)
      |SELECT ws AS win_start_s, event_type,
      |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
      |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** dedup_embed_buckets oracle: same deterministic hyperplanes as the
    * LSH oracle, folded as literals; DuckDB replays sign-bucketing,
    * in-bucket pair generation, and the exact cosine scoring. */
  private def embedBucketsOracle: String = {
    val values = graft.sim.Ann.planes(8, 64).zipWithIndex
      .map { case (p, j) => s"($j, [${p.mkString(", ")}])" }
      .mkString(", ")
    s"""WITH pl(j, p) AS (VALUES $values),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |z AS (SELECT vec_id, j, unnest(e.embedding)::DOUBLE AS x,
       |        unnest(pl.p) AS y
       |      FROM e CROSS JOIN pl),
       |dots AS (SELECT vec_id, j, sum(x * y) AS dot FROM z GROUP BY 1, 2),
       |bkt AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN dot > 0
       |      THEN (1::BIGINT << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT)
       |      AS bucket
       |  FROM dots GROUP BY 1),
       |v AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
       |        unnest(embedding)::DOUBLE AS x FROM e),
       |pairs AS (SELECT a.bucket, a.vec_id AS ia, b.vec_id AS ib
       |  FROM bkt a JOIN bkt b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |z2 AS (SELECT pr.bucket, pr.ia, pr.ib, ea.x, eb.x AS y
       |  FROM pairs pr
       |  JOIN v ea ON ea.vec_id = pr.ia
       |  JOIN v eb ON eb.vec_id = pr.ib AND eb.dim = ea.dim),
       |cs AS (SELECT bucket, ia, ib,
       |    round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 4)
       |      AS cos
       |  FROM z2 GROUP BY 1, 2, 3),
       |sizes AS (SELECT bucket, count(*) AS n_vecs FROM bkt
       |  GROUP BY 1 HAVING count(*) >= 2),
       |agg AS (SELECT bucket, count(*) AS n_pairs, max(cos) AS max_cos
       |  FROM cs GROUP BY 1)
       |SELECT s.bucket, CAST(s.n_vecs AS BIGINT) AS n_vecs,
       |  CAST(a.n_pairs AS BIGINT) AS n_pairs, a.max_cos
       |FROM sizes s JOIN agg a USING (bucket) ORDER BY s.bucket""".stripMargin
  }

  /** embed_knn_graph oracle: same folded hyperplanes as
    * [[embedBucketsOracle]]; replays bucketing, directed pair
    * generation, basis-point cosine scoring, and the (cos_bp desc,
    * nbr asc) top-3 ranking. */
  /** Shared CTE head for the embed_knn_graph family: hyperplane
    * literals → sign buckets → in-bucket pairs → basis-point cosine →
    * per-vector rank (`rk`). */
  private def knnCtes: String = {
    val values = graft.sim.Ann.planes(8, 64).zipWithIndex
      .map { case (p, j) => s"($j, [${p.mkString(", ")}])" }
      .mkString(", ")
    s"""pl(j, p) AS (VALUES $values),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |z AS (SELECT vec_id, j, unnest(e.embedding)::DOUBLE AS x,
       |        unnest(pl.p) AS y
       |      FROM e CROSS JOIN pl),
       |dots AS (SELECT vec_id, j, sum(x * y) AS dot FROM z GROUP BY 1, 2),
       |bkt AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN dot > 0
       |      THEN (1::BIGINT << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT)
       |      AS bucket
       |  FROM dots GROUP BY 1),
       |v AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
       |        unnest(embedding)::DOUBLE AS x FROM e),
       |pairs AS (SELECT a.vec_id AS ia, b.vec_id AS ib
       |  FROM bkt a JOIN bkt b
       |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |z2 AS (SELECT pr.ia, pr.ib, ea.x, eb.x AS y
       |  FROM pairs pr
       |  JOIN v ea ON ea.vec_id = pr.ia
       |  JOIN v eb ON eb.vec_id = pr.ib AND eb.dim = ea.dim),
       |cs AS (SELECT ia, ib,
       |    CAST(floor(sum(x * y) /
       |      (sqrt(sum(x * x)) * sqrt(sum(y * y))) * 10000 + 0.5)
       |      AS BIGINT) AS cos_bp
       |  FROM z2 GROUP BY 1, 2),
       |rk AS (SELECT ia, ib, cos_bp, row_number() OVER
       |    (PARTITION BY ia ORDER BY cos_bp DESC, ib) AS r
       |  FROM cs)""".stripMargin
  }

  private def embedKnnOracle: String =
    s"""WITH $knnCtes
       |SELECT ia AS vec_id, CAST(r AS BIGINT) AS rank, ib AS nbr_id,
       |  cos_bp
       |FROM rk WHERE r <= 3 ORDER BY vec_id, rank""".stripMargin

  /** dedup_embed_clusters oracle: the knn replay extended with the
    * mutual-edge join and a recursive-CTE components pass (the
    * dedup_clusters `reach` recipe on the ≤1.5·|corpus| mutual
    * edges). */
  private def embedClustersOracle: String =
    s"""WITH RECURSIVE $knnCtes,
       |knn AS (SELECT ia, ib FROM rk WHERE r <= 3),
       |m AS (SELECT a.ia AS id_a, a.ib AS id_b FROM knn a JOIN knn b
       |  ON a.ia = b.ib AND a.ib = b.ia WHERE a.ia < a.ib),
       |reach(id, rr) AS (SELECT id_a, id_a FROM m
       |  UNION SELECT id_b, id_b FROM m
       |  UNION
       |  SELECT reach.id,
       |    CASE WHEN m.id_a = reach.rr THEN m.id_b ELSE m.id_a END
       |  FROM reach JOIN m ON m.id_a = reach.rr OR m.id_b = reach.rr)
       |SELECT id, min(rr) AS keeper FROM reach GROUP BY id
       |ORDER BY id""".stripMargin

  /** ann_lsh_topk oracle: the hyperplanes are deterministic constants
    * (Ann.planes, seed 7) — folding the same literals into the SQL lets
    * DuckDB reproduce the bucket codes, the bucket-restricted scoring,
    * and therefore the exact approximate result. Double.toString emits
    * the shortest round-tripping decimal, so the parsed constants are
    * bit-identical on both engines. */
  private def annLshOracle: String = {
    val values = graft.sim.Ann.planes(8, 64).zipWithIndex
      .map { case (p, j) => s"($j, [${p.mkString(", ")}])" }
      .mkString(", ")
    s"""WITH pl(j, p) AS (VALUES $values),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |z AS (SELECT vec_id, j, unnest(e.embedding)::DOUBLE AS x,
       |        unnest(pl.p) AS y
       |      FROM e CROSS JOIN pl),
       |dots AS (SELECT vec_id, j, sum(x * y) AS dot FROM z GROUP BY 1, 2),
       |bkt AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN dot > 0
       |      THEN (1::BIGINT << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT)
       |      AS b
       |  FROM dots GROUP BY 1),
       |q AS (SELECT e.vec_id AS q_id, e.embedding AS qe, bkt.b
       |      FROM e JOIN bkt ON bkt.vec_id = e.vec_id WHERE e.vec_id < 10),
       |c AS (SELECT e.vec_id AS c_id, e.embedding AS ce, bkt.b
       |      FROM e JOIN bkt ON bkt.vec_id = e.vec_id),
       |p2 AS (SELECT q_id, c_id, qe, ce
       |       FROM q JOIN c ON q.b = c.b AND c_id <> q_id),
       |z2 AS (SELECT q_id, c_id, unnest(qe)::DOUBLE AS x,
       |         unnest(ce)::DOUBLE AS y FROM p2),
       |sums AS (SELECT q_id, c_id, sum(x*y) AS d, sum(x*x) AS na,
       |           sum(y*y) AS nb FROM z2 GROUP BY 1, 2),
       |sc AS (SELECT q_id, c_id,
       |         round(d / (sqrt(na) * sqrt(nb)), 4) AS score FROM sums),
       |r AS (SELECT q_id, c_id, score,
       |        CAST(row_number() OVER (PARTITION BY q_id
       |          ORDER BY score DESC, c_id) AS INTEGER) AS rnk FROM sc)
       |SELECT q_id, rnk, c_id, score FROM r WHERE rnk <= 5
       |ORDER BY 1, 2""".stripMargin
  }

  /** dedup_embed_cosine oracle: constant-folds the seed-7 hyperplanes
    * (16 planes = 4 bands × 4 sign bits) so DuckDB reproduces band
    * codes, candidate generation AND the exact-cosine verification —
    * the algorithm replayed end to end, same pattern as annLshOracle. */
  private def dedupEmbedCosineOracle: String = {
    val values = graft.sim.Ann.planes(16, 64).zipWithIndex
      .map { case (p, j) => s"($j, [${p.mkString(", ")}])" }
      .mkString(", ")
    s"""WITH pl(j, p) AS (VALUES $values),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |z AS (SELECT vec_id, j, unnest(e.embedding)::DOUBLE AS x,
       |        unnest(pl.p) AS y
       |      FROM e CROSS JOIN pl),
       |dots AS (SELECT vec_id, j, sum(x * y) AS dot FROM z GROUP BY 1, 2),
       |bkt AS (SELECT vec_id, CAST(j // 4 AS INTEGER) AS band,
       |    CAST(sum(CASE WHEN dot > 0
       |      THEN (1::BIGINT << CAST(j % 4 AS INTEGER)) ELSE 0 END)
       |      AS BIGINT) AS b
       |  FROM dots GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
       |  FROM bkt x JOIN bkt y
       |    ON x.band = y.band AND x.b = y.b AND x.vec_id < y.vec_id),
       |pz AS (SELECT a_id, b_id, unnest(ea.embedding)::DOUBLE AS xa,
       |    unnest(eb.embedding)::DOUBLE AS xb
       |  FROM cand JOIN e ea ON ea.vec_id = a_id
       |    JOIN e eb ON eb.vec_id = b_id),
       |sums AS (SELECT a_id, b_id, sum(xa * xb) AS d, sum(xa * xa) AS na,
       |    sum(xb * xb) AS nb FROM pz GROUP BY 1, 2),
       |sc AS (SELECT a_id, b_id,
       |    round(d / (sqrt(na) * sqrt(nb)), 4) AS cos FROM sums)
       |SELECT a_id, b_id, cos FROM sc WHERE cos >= 0.42
       |ORDER BY a_id, b_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 JSON↔relational engine (reference core)
    "shred_flatten" -> (JsonQueries.shredFlatten _),
    "shred_children" -> (JsonQueries.shredChildren _),
    "shred_prim_subobj" -> (JsonQueries.shredPrimSubobj _),
    "shred_prim_array" -> (JsonQueries.shredPrimArray _),
    "shred_typed_children" -> (JsonQueries.shredTypedChildren _),
    "assemble_nested" -> (JsonQueries.assembleNested _),
    "type_infer" -> (JsonQueries.typeInfer _),
    "point_lookup" -> (JsonQueries.pointLookup _),
    "upsert" -> (JsonQueries.upsert _),
    "schema_evolution" -> (JsonQueries.schemaEvolution _),
    "json_roundtrip_count" -> (JsonQueries.roundtripCount _),
    "engine_save_get" -> (JsonQueries.engineSaveGet _),
    "engine_delete" -> (JsonQueries.engineDelete _),
    "engine_time_travel" -> (JsonQueries.engineTimeTravel _),
    "engine_snapshot_diff" -> (JsonQueries.engineSnapshotDiff _),
    "engine_vacuum" -> (JsonQueries.engineVacuum _),
    "engine_evolve_upsert" -> (JsonQueries.engineEvolveUpsert _),
    "engine_nested_sql" -> (JsonQueries.engineNestedSql _),
    // §2.2 bulk analytic SQL
    "q1_pricing" -> (Analytics.q1Pricing _),
    "q3_shipping" -> (Analytics.q3Shipping _),
    "q5_local_supplier" -> (Analytics.q5LocalSupplier _),
    "q6_forecast" -> (Analytics.q6Forecast _),
    "q_window_topn" -> (Analytics.qWindowTopN _),
    "q_topk_per_key" -> (Analytics.qTopKPerKey _),
    "q_running_sum" -> (Analytics.qRunningSum _),
    "q_distinct_agg" -> (Analytics.qDistinctAgg _),
    "q_semi_anti" -> (Analytics.qSemiAnti _),
    "q_outer_join" -> (Analytics.qOuterJoin _),
    "q_null_handling" -> (Analytics.qNullHandling _),
    "q_case_having" -> (Analytics.qCaseHaving _),
    "q_date_funcs" -> (Analytics.qDateFuncs _),
    "q_string_funcs" -> (Analytics.qStringFuncs _),
    "q_set_ops" -> (Analytics.qSetOps _),
    "q_set_ops_all" -> (Analytics.qSetOpsAll _),
    "q_string_funcs2" -> (Analytics.qStringFuncs2 _),
    "q_date_funcs2" -> (Analytics.qDateFuncs2 _),
    "q_rollup" -> (Analytics.qRollup _),
    "q_cube" -> (Analytics.qCube _),
    "q_grouping_sets" -> (Analytics.qGroupingSets _),
    "q_rank_funcs" -> (Analytics.qRankFuncs _),
    "q_date_interval" -> (Analytics.qDateInterval _),
    "q_json_funcs" -> (Analytics.qJsonFuncs _),
    "q_conditional_agg" -> (Analytics.qConditionalAgg _),
    "q_array_funcs" -> (Analytics.qArrayFuncs _),
    "q_bitwise_agg" -> (Analytics.qBitwiseAgg _),
    "q_higher_order" -> (Analytics.qHigherOrder _),
    "q_regex_funcs" -> (Analytics.qRegexFuncs _),
    "q_null_sort" -> (Analytics.qNullSort _),
    "q_decimal_arith" -> (Analytics.qDecimalArith _),
    "q_window_range" -> (Analytics.qWindowRange _),
    "q_corr_subquery" -> (Analytics.qCorrSubquery _),
    "q_first_last" -> (Analytics.qFirstLast _),
    "q_ntile" -> (Analytics.qNtile _),
    "q_sessionize" -> (Analytics.qSessionize _),
    "q_topk_global" -> (Analytics.qTopKGlobal _),
    "q_percentile" -> (Analytics.qPercentile _),
    "q_sql_subquery" -> (Analytics.qSqlSubquery _),
    "q_asof_join" -> (Analytics.qAsofJoin _),
    "q_asof_tolerance" -> (Analytics.qAsofTolerance _),
    "q_interval_align" -> (Analytics.qIntervalAlign _),
    "q_interp_impute" -> (Analytics.qInterpImpute _),
    "q_range_join" -> (Analytics.qRangeJoin _),
    "q_session_window" -> (Analytics.qSessionWindow _),
    "q_pivot" -> (Analytics.qPivot _),
    "q_unpivot" -> (Analytics.qUnpivot _),
    "q_salted_agg" -> (Analytics.qSaltedAgg _),
    "q_stats_agg" -> (Analytics.qStatsAgg _),
    "q_histogram" -> (Analytics.qHistogram _),
    "q_funnel" -> (Analytics.qFunnel _),
    "q_time_weighted_avg" -> (Analytics.qTimeWeightedAvg _),
    "q_gap_islands" -> (Analytics.qGapIslands _),
    "q_latest_per_key" -> (Analytics.qLatestPerKey _),
    "q_skew_join_salted" -> (Analytics.qSkewJoinSalted _),
    "q_date_spine" -> (Analytics.qDateSpine _),
    "q_mode" -> (Analytics.qMode _),
    "q_integrity_audit" -> (Analytics.qIntegrityAudit _),
    "q_scd2_build" -> (Analytics.qScd2Build _),
    "q_lateral_topn" -> (Analytics.qLateralTopN _),
    "q_market_basket" -> (Analytics.qMarketBasket _),
    "q_recursive_bom" -> (Analytics.qRecursiveBom _),
    "q_pagerank" -> (Analytics.qPagerank _),
    "q_table_checksum" -> (Analytics.qTableChecksum _),
    "q_zorder_cluster" -> (Analytics.qZorderCluster _),
    "q_cdc_apply" -> (Warehouse.qCdcApply _),
    "q_incremental_agg" -> (Warehouse.qIncrementalAgg _),
    "q_dynamic_prune" -> (Warehouse.qDynamicPrune _),
    "q_delta_detect" -> (Warehouse.qDeltaDetect _),
    "q_weighted_median" -> (Analytics.qWeightedMedian _),
    "q_triangle_count" -> (Analytics.qTriangleCount _),
    "q_sliding_window" -> (Analytics.qSlidingWindow _),
    "q_cohort_retention" -> (Behavior.qCohortRetention _),
    "q_attribution" -> (Behavior.qAttribution _),
    "q_anomaly_zscore" -> (Behavior.qAnomalyZscore _),
    "q_ewma" -> (Behavior.qEwma _),
    "q_degree_dist" -> (Behavior.qDegreeDist _),
    "q_cusum_change" -> (Behavior.qCusumChange _),
    "q_rolling_corr" -> (Behavior.qRollingCorr _),
    "q_seasonality" -> (Behavior.qSeasonality _),
    "q_holt_winters" -> (Behavior.qHoltWinters _),
    "q_graph_jaccard" -> (Mining.qGraphJaccard _),
    "q_funnel_paths" -> (Behavior.qFunnelPaths _),
    "q_power_users_pareto" -> (Mining.qPowerUsersPareto _),
    "q_histogram_2d" -> (Analytics.qHistogram2d _),
    "q_skyline" -> (Mining.qSkyline _),
    "q_new_vs_returning" -> (Behavior.qNewVsReturning _),
    "q_ks_test" -> (Mining.qKsTest _),
    "q_locf_impute" -> (Behavior.qLocfImpute _),
    "q_kcore" -> (Mining.qKcore _),
    "q_rolling_wau" -> (Behavior.qRollingWau _),
    "q_conversion_lag" -> (Behavior.qConversionLag _),
    "q_decay_score" -> (Behavior.qDecayScore _),
    "q_inter_arrival" -> (Behavior.qInterArrival _),
    "dedup_passage" -> (PipelineQueries.dedupPassage _),
    "q_rank_movers" -> (Mining.qRankMovers _),
    "source_json_malformed" -> (graft.sources.Formats.jsonMalformed _),
    "q_masked_export" -> (Warehouse.qMaskedExport _),
    "q_rolling_median" -> (Behavior.qRollingMedian _),
    "q_autocorr" -> (Behavior.qAutocorr _),
    "q_abc_class" -> (Mining.qAbcClass _),
    "q_spearman" -> (Mining.qSpearman _),
    "q_event_pattern" -> (Behavior.qEventPattern _),
    "q_event_pattern_absence" -> (Behavior.qEventPatternAbsence _),
    "dedup_embed_cosine" -> (PipelineQueries.dedupEmbedCosine _),
    "stream_chained_windows" ->
      (graft.streaming.Events.streamChainedWindows _),
    "stream_session_native" ->
      (graft.streaming.Events.streamSessionNative _),
    "stream_dq_quarantine" ->
      (graft.streaming.Events.streamDqQuarantine _),
    "ann_filtered_topk" -> (PipelineQueries.annFilteredTopK _),
    "embed_norm_stats" -> (PipelineQueries.embedNormStats _),
    "source_csv_quoted" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      graft.sources.Formats.csvQuoted(s, d)
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("total"),
          sum(length(col("note"))).as("note_chars"),
          sum(when(col("note").contains("\n"), 1).otherwise(0))
            .as("n_multiline"))
    }),
    "q_bloom_semi_filter" -> (Warehouse.qBloomSemiFilter _),
    "q_rfm" -> (Mining.qRfm _),
    "q_linreg_trend" -> (Mining.qLinregTrend _),
    "q_markov_chain" -> (Mining.qMarkovChain _),
    "q_anomaly_mad" -> (Mining.qAnomalyMad _),
    "q_anomaly_mad_approx" -> (Mining.qAnomalyMadApprox _),
    "q_gini" -> (Mining.qGini _),
    "q_item_cosine" -> (Mining.qItemCosine _),
    "q_connected_components" -> (Mining.qConnectedComponents _),
    "q_label_prop" -> (Mining.qLabelProp _),
    "q_modularity" -> (Mining.qModularity _),
    "q_bfs_hops" -> (Mining.qBfsHops _),
    "q_sssp_weighted" -> (Mining.qSsspWeighted _),
    "q_inventory_balance" -> (Mining.qInventoryBalance _),
    "q_mann_whitney" -> (Mining.qMannWhitney _),
    "q_cohort_ltv" -> (Mining.qCohortLtv _),
    "q_ab_ztest" -> (Mining.qAbZtest _),
    "q_benford_audit" -> (Mining.qBenfordAudit _),
    "q_chi_square" -> (Mining.qChiSquare _),
    "q_welch_ttest" -> (Mining.qWelchTtest _),
    "q_survival_km" -> (Mining.qSurvivalKm _),
    "q_elasticity" -> (Mining.qElasticity _),
    "q_kmeans" -> (Mining.qKmeans _),
    "embed_pca_power" -> (Mining.qPcaPower _),
    "engine_merge_patch" -> (JsonQueries.engineMergePatch _),
    "q_betweenness_approx" -> (Mining.qBetweennessApprox _),
    "q_closeness_approx" -> (Mining.qClosenessApprox _),
    "q_gains_lift" -> (Mining.qGainsLift _),
    "q_quantile_hist" -> (Mining.qQuantileHist _),
    "q_quantile_hist_approx" -> (Mining.qQuantileHistApprox _),
    "q_bootstrap_ci" -> (Mining.qBootstrapCi _),
    "q_funnel_window" -> (Mining.qFunnelWindow _),
    "q_mutual_info" -> (Mining.qMutualInfo _),
    "q_scd2_lookup" -> (Warehouse.qScd2Lookup _),
    "q_dq_rules" -> (Warehouse.qDqRules _),
    "q_fuzzy_join" -> (Warehouse.qFuzzyJoin _),
    "q_bitmap_overlap" -> (Warehouse.qBitmapOverlap _),
    "q_mutual_best_match" -> (Warehouse.qMutualBestMatch _),
    "q_edit_distance_join" -> (Warehouse.qEditDistanceJoin _),
    "q_grid_distance_join" -> (Warehouse.qGridDistanceJoin _),
    "stream_funnel" -> (graft.streaming.Events.streamFunnel _),
    "stream_gap_detect" -> (graft.streaming.Events.streamGapDetect _),
    "q_graph_cluster_coeff" -> (Mining.qGraphClusterCoeff _),
    "q_kendall_tau" -> (Mining.qKendallTau _),
    "text_ngram_novelty" -> (PipelineQueries.textNgramNovelty _),
    "multimodal_image_tiles" -> (PipelineQueries.multimodalImageTiles _),
    "embed_matryoshka_probe" -> (PipelineQueries.embedMatryoshkaProbe _),
    "stream_cdc_apply" -> (graft.streaming.Events.streamCdcApply _),
    "q_entity_clusters" -> (Warehouse.qEntityClusters _),
    "q_seq_pattern_mining" -> (Behavior.qSeqPatternMining _),
    "embed_hard_negatives" -> (PipelineQueries.embedHardNegatives _),
    "sink_parquet_zstd" -> ((s: SparkSession, d: String) =>
      graft.sources.Formats.parquetZstdRoundtrip(s, d)
        .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))),
    "multimodal_video_scenecut" ->
      (PipelineQueries.multimodalVideoScenecut _),
    "q_dbscan_grid" -> (Mining.qDbscanGrid _),
    "q_forecast_backtest" -> (Behavior.qForecastBacktest _),
    "embed_coreset_kcenter" -> (PipelineQueries.embedCoresetKcenter _),
    "q_json_patch" -> (JsonQueries.qJsonPatch _),
    "q_graph_conductance" -> (Mining.qGraphConductance _),
    "text_oov_rate" -> (PipelineQueries.textOovRate _),
    "multimodal_audio_vad" -> (PipelineQueries.multimodalAudioVad _),
    "text_hash_features" -> (PipelineQueries.textHashFeatures _),
    "q_simpson_audit" -> (Mining.qSimpsonAudit _),
    "q_rich_club" -> (Mining.qRichClub _),
    "q_k_anonymity" -> (Profiling.qKAnonymity _),
    "q_fd_violations" -> (Profiling.qFdViolations _),
    "q_inclusion_deps" -> (Profiling.qInclusionDeps _),
    "q_psi_drift" -> (Profiling.qPsiDrift _),
    "q_conformal_coverage" -> (Profiling.qConformalCoverage _),
    "q_interval_overlap_join" -> (Profiling.qIntervalOverlapJoin _),
    "q_hits_ranking" -> (Mining.qHitsRanking _),
    "q_skew_audit" -> (Profiling.qSkewAudit _),
    "q_graph_anf" -> (Mining.qGraphAnf _),
    "q_ohlc_bars" -> (Behavior.qOhlcBars _),
    "stream_ohlc_bars" -> (graft.streaming.Events.streamOhlcBars _),
    "q_asof_nearest" -> (Analytics.qAsofNearest _),
    "q_fifo_allocation" -> (Warehouse.qFifoAllocation _),
    "stream_abandoned_carts" ->
      (graft.streaming.Events.streamAbandonedCarts _),
    "engine_index_lookup" -> (JsonQueries.engineIndexLookup _),
    "q_rolling_slope" -> (Behavior.qRollingSlope _),
    "embed_outlier_maha" -> (PipelineQueries.embedOutlierMaha _),
    "q_anova_f" -> (Mining.qAnovaF _),
    "q_ab_srm" -> (Mining.qAbSrm _),
    "engine_index_rebuild" -> (JsonQueries.engineIndexRebuild _),
    "stream_srm" -> (graft.streaming.Events.streamSrm _),
    "data_budget_select" -> (PipelineQueries.dataBudgetSelect _),
    "q_assortativity" -> (Mining.qAssortativity _),
    "multimodal_gif_codec" -> (PipelineQueries.multimodalGifCodec _),
    "q_winsorized_stats" -> (Mining.qWinsorizedStats _),
    "source_csv_multiline" -> (graft.sources.Formats.csvMultiline _),
    "q_bitemporal_asof" -> (Warehouse.qBitemporalAsof _),
    "q_column_profile" -> (Profiling.qColumnProfile _),
    "data_group_kfold" -> (PipelineQueries.dataGroupKfold _),
    "data_split_leakage" -> (PipelineQueries.dataSplitLeakage _),
    "text_bigram_ppl" -> (PipelineQueries.textBigramPpl _),
    "q_stl_decompose" -> (Behavior.qStlDecompose _),
    "q_theil_sen" -> (Behavior.qTheilSen _),
    "source_avro_roundtrip" -> ((s: SparkSession, d: String) =>
      graft.sources.Formats.avroRoundtrip(s, d)),
    "source_fixed_width" -> (graft.sources.Formats.fixedWidthRoundtrip _),
    "text_zipf_slope" -> (PipelineQueries.textZipfSlope _),
    "data_pack_sequences" -> (PipelineQueries.dataPackSequences _),
    "data_mixture_plan" -> (PipelineQueries.dataMixturePlan _),
    "data_importance_resample" -> (PipelineQueries.dataImportanceResample _),
    "text_keyword_rake" -> (PipelineQueries.textKeywordRake _),
    "stream_importance_score" ->
      (graft.streaming.Events.streamImportanceScore _),
    "stream_drift_psi" -> (graft.streaming.Events.streamDriftPsi _),
    "text_chunk_windows" -> (PipelineQueries.textChunkWindows _),
    "multimodal_phash_dedup" -> (PipelineQueries.multimodalPhashDedup _),
    "stream_latest_per_key" -> (graft.streaming.Events.streamLatestPerKey _),
    "stream_event_pattern" -> (graft.streaming.Events.streamEventPattern _),
    "stream_dedup_minhash" -> (graft.streaming.Events.streamDedupMinhash _),
    "stream_scd2_build" -> (graft.streaming.Events.streamScd2Build _),
    "stream_asof_join" -> (graft.streaming.Events.streamAsofJoin _),
    "stream_asof_interval" -> (graft.streaming.Events.streamAsofInterval _),
    "stream_count_min_topk" ->
      (graft.streaming.Events.streamCountMinTopk _),
    "stream_kll_quantiles" ->
      (graft.streaming.Events.streamKllQuantiles _),
    "stream_theta_distinct" ->
      (graft.streaming.Events.streamThetaDistinct _),
    "stream_window" -> (graft.streaming.Events.streamWindow _),
    "stream_dedup" -> (graft.streaming.Events.streamDedup _),
    "stream_sessionize" -> (graft.streaming.Events.streamSessionize _),
    "stream_join" -> (graft.streaming.Events.streamJoin _),
    "stream_static_join" -> (graft.streaming.Events.streamStaticJoin _),
    "stream_incremental_ingest" ->
      (graft.streaming.Events.streamIncrementalIngest _),
    "stream_watermark_append" ->
      (graft.streaming.Events.streamWatermarkAppend _),
    "stream_upsert" -> (graft.streaming.Events.streamUpsert _),
    "stream_left_outer" -> (graft.streaming.Events.streamLeftOuter _),
    "stream_full_outer" -> (graft.streaming.Events.streamFullOuter _),
    "stream_sliding_window" ->
      (graft.streaming.Events.streamSlidingWindow _),
    "stream_histogram" -> (graft.streaming.Events.streamHistogram _),
    "stream_anomaly" -> (graft.streaming.Events.streamAnomaly _),
    "stream_topk" -> (graft.streaming.Events.streamTopK _),
    "multimodal_resize" -> (PipelineQueries.multimodalResize _),
    // §2.4 source/sink formats
    "source_json_roundtrip" -> ((s: SparkSession, d: String) =>
      graft.sources.Formats.jsonRoundtrip(s, d)
        .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))),
    "source_csv_roundtrip" -> ((s: SparkSession, d: String) =>
      graft.sources.Formats.csvRoundtrip(s, d)
        .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))),
    "source_binary_files" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      graft.sources.Formats.binaryFiles(s, d, "*.parquet")
        .select(regexp_extract(col("path"), "[^/]+$", 0).as("fname"),
          col("length"))
        .orderBy(col("fname"))
    }),
    // §2.3 LLM-training-data pipeline
    "dedup_exact" -> (PipelineQueries.dedupExact _),
    "dedup_minhash_lsh" -> (PipelineQueries.dedupMinhashLsh _),
    "dedup_clusters" -> (PipelineQueries.dedupClusters _),
    "dedup_keep_best" -> (PipelineQueries.dedupKeepBest _),
    "dedup_clean" -> (PipelineQueries.dedupClean _),
    "q_approx_stats" -> (PipelineQueries.approxStats _),
    "dedup_simhash" -> (PipelineQueries.dedupSimhash _),
    "ngram_jaccard" -> (PipelineQueries.ngramJaccard _),
    "dedup_embed_cos" -> (PipelineQueries.dedupEmbedCos _),
    "embed_centroid" -> (PipelineQueries.embedCentroid _),
    "embed_int8_quant" -> (PipelineQueries.embedInt8Quant _),
    "corpus_profile" -> (PipelineQueries.corpusProfile _),
    "dedup_incremental" -> (PipelineQueries.dedupIncremental _),
    "embed_assign" -> (PipelineQueries.embedAssign _),
    "data_shard_manifest" -> (PipelineQueries.shardManifest _),
    "text_vocab_idf" -> (PipelineQueries.textVocabIdf _),
    "ann_brute_topk" -> (PipelineQueries.annBruteTopK _),
    "ann_lsh_topk" -> (PipelineQueries.annLshTopK _),
    "ann_ivf_topk" -> (PipelineQueries.annIvfTopK _),
    "ann_ivf_recall" -> (PipelineQueries.annIvfRecall _),
    "ann_pq_topk" -> (PipelineQueries.annPqTopK _),
    "ann_ivfpq_topk" -> (PipelineQueries.annIvfPqTopK _),
    "ann_index_upsert" -> (PipelineQueries.annIndexUpsert _),
    "ann_ivfpq_filtered" -> (PipelineQueries.annIvfPqFiltered _),
    "dedup_embed_buckets" -> (PipelineQueries.dedupEmbedBuckets _),
    "embed_knn_graph" -> (PipelineQueries.embedKnnGraph _),
    "q_count_min_topk" -> (PipelineQueries.countMinTopK _),
    "q_theta_setops" -> (PipelineQueries.thetaSetOps _),
    "dedup_substring_spans" -> (PipelineQueries.dedupSubstringSpans _),
    "dedup_short_spans" -> (PipelineQueries.dedupShortSpans _),
    "dedup_span_excise" -> (PipelineQueries.dedupSpanExcise _),
    "dedup_span_extents" -> (PipelineQueries.dedupSpanExtents _),
    "dedup_setsim_join" -> (PipelineQueries.dedupSetsimJoin _),
    "q_shapley_attribution" -> (graft.ops.Behavior.qShapleyAttribution _),
    "source_json_lz4" -> ((s: SparkSession, d: String) =>
      graft.sources.Formats.jsonLz4Roundtrip(s, d)
        .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))),
    "dedup_incremental_clusters" ->
      (PipelineQueries.dedupIncrementalClusters _),
    "dedup_embed_clusters" -> (PipelineQueries.dedupEmbedClusters _),
    "ann_sq8_topk" -> (PipelineQueries.annSq8TopK _),
    "ann_mmr_rerank" -> (PipelineQueries.annMmrRerank _),
    "text_hybrid_rrf" -> (PipelineQueries.textHybridRrf _),
    "multimodal_jpeg_codec" -> (PipelineQueries.multimodalJpegCodec _),
    "multimodal_qoi_codec" -> (PipelineQueries.multimodalQoiCodec _),
    "stream_ann_probe" -> (graft.streaming.Events.streamAnnProbe _),
    "q_hll_merge" -> (PipelineQueries.hllMerge _),
    "q_kll_quantile_merge" -> (PipelineQueries.kllQuantileMerge _),
    "q_rolling_hll_wau" -> (PipelineQueries.rollingHllWau _),
    "q_sample_stratified" -> (PipelineQueries.sampleStratified _),
    "data_epoch_shuffle" -> (PipelineQueries.dataEpochShuffle _),
    "q_sample_reservoir" -> (PipelineQueries.sampleReservoir _),
    "text_bigram_lift" -> (PipelineQueries.textBigramLift _),
    "text_tfidf_top" -> (PipelineQueries.textTfidfTop _),
    "dedup_containment" -> (PipelineQueries.dedupContainment _),
    "text_contamination" -> (PipelineQueries.textContamination _),
    "text_tokens" -> (PipelineQueries.textTokens _),
    "text_quality" -> (PipelineQueries.textQuality _),
    "text_langid" -> (PipelineQueries.textLangid _),
    "text_repetition" -> (PipelineQueries.textRepetition _),
    "text_entropy" -> (PipelineQueries.textEntropy _),
    "text_pii_scrub" -> (PipelineQueries.textPiiScrub _),
    "text_lm_score" -> (PipelineQueries.textLmScore _),
    "dedup_url" -> (PipelineQueries.dedupUrl _),
    "q_sample_weighted" -> (PipelineQueries.sampleWeighted _),
    "q_sample_weighted_reservoir" ->
      (PipelineQueries.sampleWeightedReservoir _),
    "q_sample_systematic" -> (PipelineQueries.sampleSystematic _),
    "data_interleave_mixture" -> (PipelineQueries.dataInterleaveMixture _),
    "text_bm25_rank" -> (PipelineQueries.textBm25Rank _),
    "text_bpe_pairs" -> (PipelineQueries.textBpePairs _),
    "text_bpe_train" -> (PipelineQueries.textBpeTrain _),
    "text_bpe_apply" -> (PipelineQueries.textBpeApply _),
    "text_tokenizer_fertility" -> (PipelineQueries.textTokenizerFertility _),
    "q_mann_kendall" -> (Behavior.qMannKendall _),
    "q_jarque_bera" -> (Stats.qJarqueBera _),
    "q_theil_index" -> (Stats.qTheilIndex _),
    "q_pvm_bridge" -> (Stats.qPvmBridge _),
    "q_ljung_box" -> (Stats.qLjungBox _),
    "q_hurst_exponent" -> (Stats.qHurstExponent _),
    "q_two_way_anova" -> (Stats.qTwoWayAnova _),
    "q_gumbel_maxima" -> (Stats.qGumbelMaxima _),
    "q_harmonic_centrality" -> (Mining.qHarmonicCentrality _),
    "engine_json_pointer" -> (JsonQueries.engineJsonPointer _),
    "q_perm_entropy" -> (Stats.qPermEntropy _),
    "q_cramer_von_mises" -> (Stats.qCramerVonMises _),
    "q_iqr_outliers" -> (Stats.qIqrOutliers _),
    "stream_quota_mix" -> (graft.streaming.Events.streamQuotaMix _),
    "q_string_agg" -> (Analytics.qStringAgg _),
    "embed_label_divergence" -> (PipelineQueries.embedLabelDivergence _),
    "q_brown_forsythe" -> (Stats.qBrownForsythe _),
    "q_ols_diagnostics" -> (Stats.qOlsDiagnostics _),
    "sink_zonemap_prune" -> (graft.sources.Layouts.zonemapPrune _),
    "embed_hamming_topk" -> (PipelineQueries.embedHammingTopk _),
    "multimodal_bmp_codec" -> (PipelineQueries.multimodalBmpCodec _),
    "multimodal_image_hist" -> (PipelineQueries.multimodalImageHist _),
    "multimodal_audio_pitch" -> (PipelineQueries.multimodalAudioPitch _),
    "text_unigram_kl" -> (PipelineQueries.textUnigramKl _),
    "text_burstiness" -> (PipelineQueries.textBurstiness _),
    "data_temperature_mix" -> (PipelineQueries.dataTemperatureMix _),
    "q_katz_centrality" -> (Mining.qKatzCentrality _),
    "q_eigenvector_centrality" -> (Mining.qEigenvectorCentrality _),
    "q_bollinger" -> (Behavior.qBollinger _),
    "q_rsi" -> (Behavior.qRsi _),
    "q_drawdown" -> (Behavior.qDrawdown _),
    "q_obv" -> (Behavior.qObv _),
    "q_ulcer_index" -> (Behavior.qUlcerIndex _),
    "q_parkinson_vol" -> (Behavior.qParkinsonVol _),
    "q_croston" -> (Behavior.qCroston _),
    "q_kruskal_wallis" -> (Stats.qKruskalWallis _),
    "q_runs_test" -> (Stats.qRunsTest _),
    "q_herfindahl" -> (Stats.qHerfindahl _),
    "q_price_index" -> (Stats.qPriceIndex _),
    "pipeline_clean_funnel" -> (PipelineQueries.pipelineCleanFunnel _),
    "data_length_buckets" -> (PipelineQueries.dataLengthBuckets _),
    "multimodal_wav_decimate" -> (PipelineQueries.multimodalWavDecimate _),
    "q_sprt_test" -> (PipelineQueries.qSprtTest _),
    "q_ab_cuped" -> (Mining.qAbCuped _),
    "q_diff_in_diff" -> (Mining.qDiffInDiff _),
    "q_sample_balanced" -> (PipelineQueries.sampleBalanced _),
    "text_fingerprint" -> (PipelineQueries.textFingerprint _),
    "text_levenshtein" -> (PipelineQueries.textLevenshtein _),
    "text_top_ngrams" -> (PipelineQueries.textTopNgrams _),
    "multimodal_meta" -> (PipelineQueries.multimodalMeta _),
    "multimodal_decode" -> (PipelineQueries.multimodalDecode _),
    "multimodal_features" -> (PipelineQueries.multimodalFeatures _),
    "multimodal_frames" -> (PipelineQueries.multimodalFrames _),
    "multimodal_audio_energy" ->
      (PipelineQueries.multimodalAudioEnergy _),
    "multimodal_png_codec" -> (PipelineQueries.multimodalPngCodec _),
    "multimodal_png_resize" -> (PipelineQueries.multimodalPngResize _),
    "data_curriculum_order" -> (PipelineQueries.dataCurriculumOrder _),
    "multimodal_wav_codec" -> (PipelineQueries.multimodalWavCodec _),
    "source_orc_roundtrip" -> ((s: SparkSession, d: String) =>
      graft.sources.Formats.orcRoundtrip(s, d)
        .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))),
    "source_text_roundtrip" -> ((s: SparkSession, d: String) =>
      graft.sources.Formats.textRoundtrip(s, d)
        .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))),
    "source_xml_roundtrip" -> ((s: SparkSession, d: String) =>
      graft.sources.Formats.xmlRoundtrip(s, d)
        .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))),
    "source_json_gzip" -> ((s: SparkSession, d: String) =>
      graft.sources.Formats.jsonGzipRoundtrip(s, d)
        .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))),
    "source_csv_malformed" -> (graft.sources.Formats.csvMalformed _),
    "sink_partitioned_prune" -> (graft.sources.Layouts.partitionedPrune _),
    "sink_schema_merge" -> (graft.sources.Formats.schemaMergeRoundtrip _),
    "source_files_audit" -> (graft.sources.Layouts.filesAudit _),
    "q_bucketed_join" -> (graft.sources.Layouts.bucketedJoin _),
    "sink_compaction" -> (graft.sources.Layouts.compaction _),
    "q_roc_auc" -> (MlEval.qRocAuc _),
    "q_brier_decomp" -> (MlEval.qBrierDecomp _),
    "q_cohens_kappa" -> (MlEval.qCohensKappa _),
    "q_naive_bayes" -> (MlEval.qNaiveBayes _),
    "q_var_cvar" -> (graft.ops.Series.qVarCvar _),
    "q_nelson_aalen" -> (graft.ops.Series.qNelsonAalen _),
    "q_macd" -> (graft.ops.Series.qMacd _),
    "q_sax_paa" -> (graft.ops.Series.qSaxPaa _),
    "q_ktruss" -> (Mining.qKtruss _),
    "text_readability" -> (PipelineQueries.textReadability _),
    "text_cooc_pmi" -> (PipelineQueries.textCoocPmi _),
    "data_coverage_curve" -> (PipelineQueries.dataCoverageCurve _),
    "engine_schema_validate" -> (JsonQueries.engineSchemaValidate _),
    "q_cronbach_alpha" -> (Stats.qCronbachAlpha _),
    "q_wilcoxon_signed_rank" -> (Stats.qWilcoxonSignedRank _),
    "q_personalized_pagerank" -> (Mining.qPersonalizedPagerank _),
    "q_scc" -> (Mining.qScc _),
    "dedup_unicode" -> (PipelineQueries.dedupUnicode _),
    "engine_concurrent_upsert" -> (JsonQueries.engineConcurrentUpsert _),
    "shred_nested_arrays" -> (JsonQueries.shredNestedArrays _),
    "q_timezone_funcs" -> (Analytics.qTimezoneFuncs _),
    "q_dyad_census" -> (Mining.qDyadCensus _),
    "engine_index_covering" -> (JsonQueries.engineIndexCovering _),
    "multimodal_wbmp_codec" -> (PipelineQueries.multimodalWbmpCodec _),
    "multimodal_pnm_codec" -> (PipelineQueries.multimodalPnmCodec _),
    "text_yule_richness" -> (PipelineQueries.textYuleRichness _),
    "text_msttr" -> (PipelineQueries.textMsttr _),
    "text_burrows_delta" -> (PipelineQueries.textBurrowsDelta _),
    "text_simpson_diversity" ->
      (PipelineQueries.textSimpsonDiversity _),
    "q_adamic_adar" -> (Mining.qAdamicAdar _),
    "stream_vwap" -> (graft.streaming.Events.streamVwap _),
    "stream_parkinson" -> (graft.streaming.Events.streamParkinson _),
    "stream_hellinger" -> (graft.streaming.Events.streamHellinger _),
    "q_atkinson_index" -> (Mining.qAtkinsonIndex _),
    "q_bartlett_test" -> (Stats.qBartlettTest _),
    "q_capture_recapture" -> (Stats.qCaptureRecapture _),
    "text_chao1_richness" -> (PipelineQueries.textChao1Richness _),
    "q_tail_dependence" -> (Stats.qTailDependence _),
    "q_information_ratio" -> (graft.ops.Series.qInformationRatio _),
    "stream_atkinson" -> (graft.streaming.Events.streamAtkinson _),
    "embed_isotropy" -> (PipelineQueries.embedIsotropy _),
    "embed_quantile_clip" -> (PipelineQueries.embedQuantileClip _),
    "q_palma_ratio" -> (Mining.qPalmaRatio _),
    "q_page_hinkley" -> (graft.ops.Series.qPageHinkley _),
    "stream_new_vs_returning" ->
      (graft.streaming.Events.streamNewVsReturning _),
    "q_tost_equivalence" -> (Stats.qTostEquivalence _),
    "q_beta_hedge" -> (graft.ops.Series.qBetaHedge _),
    "q_vwap" -> (graft.ops.Series.qVwap _),
    "q_atr" -> (graft.ops.Series.qAtr _),
    "q_stochastic_osc" -> (graft.ops.Series.qStochasticOsc _),
    "q_amihud_illiq" -> (graft.ops.Series.qAmihudIlliq _),
    "q_sharpe_sortino" -> (graft.ops.Series.qSharpeSortino _),
    "stream_late_data_audit" ->
      (graft.streaming.Events.streamLateDataAudit _),
    "q_corr_matrix" -> (Profiling.qCorrMatrix _),
    "q_growth_accounting" -> (Behavior.qGrowthAccounting _),
    "q_durbin_watson" -> (Stats.qDurbinWatson _),
    "q_pr_auc" -> (MlEval.qPrAuc _),
    "q_wasserstein_1d" -> (Stats.qWasserstein1d _),
    "q_markov_entropy_rate" -> (Stats.qMarkovEntropyRate _),
    "q_cohens_d" -> (Stats.qCohensD _),
    "q_odds_ratio" -> (Stats.qOddsRatio _),
    "q_mcnemar" -> (Stats.qMcnemar _),
    "q_mantel_haenszel" -> (Stats.qMantelHaenszel _),
    "q_cochran_armitage" -> (Stats.qCochranArmitage _),
    "q_fisher_z" -> (Stats.qFisherZ _),
    "q_kpss" -> (Stats.qKpss _),
    "q_moods_median" -> (Stats.qMoodsMedian _),
    "q_stratified_ate" -> (Stats.qStratifiedAte _),
    "q_jonckheere" -> (Stats.qJonckheere _),
    "q_cliffs_delta" -> (Stats.qCliffsDelta _),
    "q_page_trend" -> (Stats.qPageTrend _),
    "q_partial_corr" -> (Stats.qPartialCorr _),
    "q_icc" -> (Stats.qIcc _),
    "q_hellinger_bc" -> (Stats.qHellingerBc _),
    "q_anderson_darling" -> (Stats.qAndersonDarling _),
    "engine_partitioned_save" -> (JsonQueries.enginePartitionedSave _),
    "engine_atomic_save" -> (JsonQueries.engineAtomicSave _),
    "engine_rename" -> (JsonQueries.engineRename _),
    "engine_alter_column" -> (JsonQueries.engineAlterColumn _),
    "engine_check_constraint" -> (JsonQueries.engineCheckConstraint _),
    "engine_optimize" -> (JsonQueries.engineOptimize _),
    "q_seasonal_mann_kendall" -> (Behavior.qSeasonalMannKendall _),
    "q_calibration_bins" -> (MlEval.qCalibrationBins _),
    "stream_calibration" ->
      (graft.streaming.Events.streamCalibration _),
    "dedup_cross_source" -> (PipelineQueries.dedupCrossSource _),
    "embed_participation_ratio" ->
      (PipelineQueries.embedParticipationRatio _),
    "q_youden_j" -> (MlEval.qYoudenJ _),
    "stream_corr_matrix" ->
      (graft.streaming.Events.streamCorrMatrix _),
    "q_dag_longest_path" -> (Mining.qDagLongestPath _),
    "q_bh_fdr" -> (Mining.qBhFdr _),
    "q_benjamini_yekutieli" -> (Mining.qByFdr _),
    "q_kendall_w" -> (Mining.qKendallW _),
    "q_quantile_normalize" -> (Stats.qQuantileNormalize _),
    "q_apportionment" -> (Stats.qApportionment _),
    "stream_timezone" -> (graft.streaming.Events.streamTimezone _),
    "q_changepoint" -> (graft.ops.Series.qChangepoint _),
    "q_dickey_fuller" -> (graft.ops.Series.qDickeyFuller _),
    "q_tukey_hsd" -> (Stats.qTukeyHsd _),
    "multimodal_tiff_codec" -> (PipelineQueries.multimodalTiffCodec _),
    "q_silhouette" -> (Mining.qSilhouette _),
    "text_js_divergence" -> (PipelineQueries.textJsDivergence _),
    "q_poisson_rate" -> (Stats.qPoissonRate _),
    "q_cochran_q" -> (Stats.qCochranQ _),
    "q_dau_mau" -> (Behavior.qDauMau _),
    "q_rfm_migration" -> (Behavior.qRfmMigration _),
    "source_parquet_footer" -> (graft.sources.Layouts.parquetFooterAudit _),
    "text_overdispersion" -> (PipelineQueries.textOverdispersion _),
    "stream_dau_mau" -> (graft.streaming.Events.streamDauMau _),
    "q_itemset3" -> (Mining.qItemset3 _),
    "q_lorenz_deciles" -> (Mining.qLorenzDeciles _),
    "embed_cluster_nmi" -> (Mining.qClusterNmi _),
    "embed_retrieval_metrics" ->
      (PipelineQueries.embedRetrievalMetrics _),
    "q_log_rank" -> (graft.ops.Series.qLogRank _),
    "q_pacf" -> (graft.ops.Series.qPacf _),
    "q_hill_tail" -> (Stats.qHillTail _),
    "q_friedman" -> (Stats.qFriedman _),
    "q_cramers_v" -> (Stats.qCramersV _),
    "q_xyz_class" -> (Mining.qXyzClass _),
    "text_shingle_df_hist" -> (PipelineQueries.textShingleDfHist _),
    "q_turning_points" -> (graft.ops.Series.qTurningPoints _),
    "q_control_chart" -> (graft.ops.Series.qControlChart _),
    "q_eta_squared" -> (Stats.qEtaSquared _),
    "text_heaps_law" -> (PipelineQueries.textHeapsLaw _),
    "q_absorbing_markov" -> (Behavior.qAbsorbingMarkov _),
  )

  /** q_personalized_pagerank oracle: 4 unrolled integer-lattice
    * rounds (the q_kcore unroll convention). */
  private def pprOracle: String = {
    val seeds = "(3, 5, 7)"
    val rounds = (1 to 4).map { i =>
      s"""i$i AS (SELECT e.b AS node,
         |    CAST(sum(r.rk // d2.deg) AS BIGINT) AS infl
         |  FROM e JOIN r${i - 1} r ON r.node = e.a
         |  JOIN deg d2 ON d2.node = e.a GROUP BY 1),
         |r$i AS (SELECT deg.node, (85 * coalesce(infl, 0)) // 100 +
         |    CASE WHEN deg.node IN $seeds THEN 50000000000 ELSE 0 END
         |    AS rk
         |  FROM deg LEFT JOIN i$i USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH pr0 AS (SELECT DISTINCT o_custkey * 2 AS a,
       |    l_suppkey * 2 + 1 AS b
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS (SELECT a, b FROM pr0 UNION ALL SELECT b, a FROM pr0),
       |deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
       |  FROM e GROUP BY 1),
       |r0 AS (SELECT node, CASE WHEN node IN $seeds
       |    THEN 333333333333 ELSE 0 END AS rk FROM deg),
       |$rounds
       |SELECT CAST((node - 1) // 2 AS BIGINT) AS s_suppkey,
       |  CAST(rk AS BIGINT) AS rank_u
       |FROM r4 WHERE node % 2 = 1 AND rk > 0
       |ORDER BY rank_u DESC, s_suppkey LIMIT 20""".stripMargin
  }

  /** q_ktruss oracle: the three support-peel rounds unrolled (the
    * q_kcore convention), each round re-deriving the symmetrized
    * adjacency and counting wedge closures per surviving edge. */
  private def ktrussOracle: String = {
    val rounds = (1 to 3).map { i =>
      val p = s"e${i - 1}"
      s"""s${i - 1} AS (SELECT u AS a, v AS b FROM $p
         |  UNION ALL SELECT v, u FROM $p),
         |p$i AS (SELECT $p.u, $p.v, count(*) AS c FROM $p
         |  JOIN s${i - 1} x1 ON x1.a = $p.u
         |  JOIN s${i - 1} x2 ON x2.a = $p.v AND x2.b = x1.b
         |  GROUP BY 1, 2),
         |e$i AS (SELECT u, v FROM p$i WHERE c >= 2)""".stripMargin
    }.mkString(",\n")
    val census = (1 to 3).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS iter,
         |  (SELECT CAST(count(DISTINCT id) AS BIGINT) FROM
         |    (SELECT u AS id FROM e$i UNION ALL SELECT v FROM e$i))
         |    AS n_nodes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM e$i) AS n_edges""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH sp AS (SELECT p_partkey FROM part WHERE p_size <= 3),
       |ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
       |e0 AS (SELECT u, v FROM (
       |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
       |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2) WHERE w >= 1),
       |$rounds
       |$census
       |ORDER BY iter""".stripMargin
  }

  /** Shared two-iteration k-means CTE prefix (q_kmeans +
    * q_silhouette): s2 is the vec×centroid cosine frame with scores
    * ROUNDED to 6 dp, so every downstream statistic reads identical
    * doubles on both engines. */
  private val kmeansOracleCtes: String =
    """WITH v AS (
      |  SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
      |    unnest(embedding)::DOUBLE AS x
      |  FROM embeddings),
      |ids AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
      |c0 AS (SELECT ids.cid, v.dim, v.x AS c FROM ids JOIN v USING (vec_id)),
      |s1 AS (SELECT v.vec_id, c.cid,
      |    round(sum(v.x * c.c) / (sqrt(sum(v.x * v.x)) *
      |      sqrt(sum(c.c * c.c))), 6) AS cos
      |  FROM v JOIN c0 c ON v.dim = c.dim GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY cos DESC, cid) AS rn FROM s1)
      |  WHERE rn = 1),
      |c1 AS (SELECT a1.cid, v.dim, avg(v.x) AS c
      |  FROM a1 JOIN v USING (vec_id) GROUP BY 1, 2),
      |s2 AS (SELECT v.vec_id, c.cid,
      |    round(sum(v.x * c.c) / (sqrt(sum(v.x * v.x)) *
      |      sqrt(sum(c.c * c.c))), 6) AS cos
      |  FROM v JOIN c1 c ON v.dim = c.dim GROUP BY 1, 2),
      |""".stripMargin

  /** q_absorbing_markov oracle: the transition census in SQL, then
    * graft.ops.MarkovAlg's EXACT SAME formula text for the 3×3
    * fundamental-matrix algebra — both engines compile one
    * expression tree. */
  private def absorbingMarkovOracle: String = {
    val names = Seq("view" -> "v", "click" -> "c", "signup" -> "s",
      "purchase" -> "p", "error" -> "e")
    val cells = (for ((sn, st) <- names if st != "p" && st != "e";
                      (dn, dt) <- names)
      yield s"    CAST(sum(CASE WHEN src = '$sn' AND dst = '$dn'" +
        s" THEN n ELSE 0 END) AS BIGINT) AS n_$st$dt").mkString(",\n")
    val states = Seq("view", "click", "signup")
    val outs = states.indices.flatMap { i =>
      Seq(
        s"  floor(${graft.ops.MarkovAlg.steps(i)} * 1e4 + 0.5) / 1e4" +
          s" AS steps_${states(i)}",
        s"  floor(${graft.ops.MarkovAlg.absorb(i, "p")} * 1e6 + 0.5)" +
          s" / 1e6 AS p_purchase_${states(i)}",
        s"  floor(${graft.ops.MarkovAlg.absorb(i, "e")} * 1e6 + 0.5)" +
          s" / 1e6 AS p_error_${states(i)}")
    }.mkString(",\n")
    s"""WITH ev AS (SELECT user_id, event_id, event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
       |    COALESCE(CAST(sum(CASE WHEN event_type IN
       |      ('purchase', 'error') THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY user_id ORDER BY CAST(floor(epoch(ts))
       |      AS BIGINT), event_id ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND 1 PRECEDING) AS BIGINT), 0) AS abs_before
       |  FROM events),
       |kept AS (SELECT * FROM ev WHERE abs_before = 0),
       |pr AS (SELECT event_type AS src, lead(event_type) OVER (
       |    PARTITION BY user_id ORDER BY ts_s, event_id) AS dst
       |  FROM kept),
       |tc AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM pr
       |  WHERE dst IS NOT NULL GROUP BY 1, 2),
       |one AS (SELECT
       |$cells
       |  FROM tc)
       |SELECT
       |$outs
       |FROM one""".stripMargin
  }

  private val dailyFlagCte: String =
    """daily AS (SELECT l_returnflag AS flag,
      |    CAST(l_shipdate AS DATE) AS day,
      |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** q_macd oracle, generated from the SAME Scala weight vectors the
    * Spark plan embeds (graft.ops.Series.macdFast/Slow/Sig) so neither
    * engine executes `pow`. Every weight literal is CAST to DOUBLE:
    * DuckDB parses a bare decimal literal as DECIMAL(18,17) and would
    * fold the EMA numerator in exact decimal while Spark folds binary
    * doubles (measured ~6e-5 e4-unit divergence). With the casts both
    * engines run the identical left-associated double chain, and each
    * EMA stage is re-pinned to the integer e7 lattice before the next
    * stage / output rounding consumes it, matching the Spark plan. */
  private def macdOracle: String = {
    def num(src: String, ws: Seq[Double]) = ws.zipWithIndex.map {
      case (w, k) =>
        s"coalesce(lag($src, $k) OVER win * CAST($w AS DOUBLE), 0.0)"
    }.mkString(" + ")
    def den(src: String, ws: Seq[Double]) = ws.zipWithIndex.map {
      case (w, k) =>
        s"CASE WHEN lag($src, $k) OVER win IS NULL THEN 0.0" +
          s" ELSE CAST($w AS DOUBLE) END"
    }.mkString(" + ")
    val f = graft.ops.Series.macdFast
    val sl = graft.ops.Series.macdSlow
    val sg = graft.ops.Series.macdSig
    s"""WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
       |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
       |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
       |  FROM lineitem GROUP BY 1),
       |m AS (SELECT day, e4,
       |    CAST(floor((${num("e4", f)}) / (${den("e4", f)})
       |      * 1000 + 0.5) AS BIGINT)
       |    - CAST(floor((${num("e4", sl)}) / (${den("e4", sl)})
       |      * 1000 + 0.5) AS BIGINT) AS macd_e7
       |  FROM daily WINDOW win AS (ORDER BY day)),
       |g AS (SELECT day, e4, macd_e7,
       |    CAST(floor((${num("macd_e7", sg)}) / (${den("macd_e7", sg)})
       |      + 0.5) AS BIGINT) AS sig_e7
       |  FROM m WINDOW win AS (ORDER BY day))
       |SELECT day,
       |  floor(CAST(e4 AS DOUBLE) / 10000 * 100.0 + 0.5) / 100.0
       |    AS revenue,
       |  floor(CAST(macd_e7 AS DOUBLE) / 1e7 * 10000.0 + 0.5) / 10000.0
       |    AS macd,
       |  floor(CAST(sig_e7 AS DOUBLE) / 1e7 * 10000.0 + 0.5) / 10000.0
       |    AS signal,
       |  floor(CAST(macd_e7 - sig_e7 AS DOUBLE) / 1e7 * 10000.0 + 0.5)
       |    / 10000.0 AS histogram
       |FROM g ORDER BY day""".stripMargin
  }

  /** q_bh_fdr oracle, generated with the SAME per-rank critical
    * z-values the Spark plan embeds (Mining.invNorm, computed once in
    * Scala — neither engine evaluates Φ⁻¹) and the same
    * integer-lattice moment arithmetic token for token, so every z is
    * an identical double cross-engine. Weight literals CAST to DOUBLE
    * (the macd DECIMAL-parse convention). */
  /** Shared BH/BY step-up oracle: `cm` = 1 for BH, the harmonic
    * Σ1/i correction for BY — criticals folded once from Scala. */
  private def fdrOracle(cm: Double): String = {
    val m = 25
    val crit = (1 to m).map(k =>
      graft.ops.Mining.invNorm(1.0 - k * 0.05 / (2.0 * m * cm)))
    val vals = crit.zipWithIndex
      .map { case (v, i) => s"(${i + 1}, CAST($v AS DOUBLE))" }
      .mkString(", ")
    s"""WITH cust AS (SELECT CAST(c_nationkey AS BIGINT) AS g,
       |    CAST(round(c_acctbal) AS BIGINT) AS v FROM customer),
       |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(v) AS BIGINT) AS sx,
       |    sum(CAST(v AS HUGEINT) * v) AS sx2 FROM cust GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
       |    CAST(sum(sx) AS BIGINT) AS st, sum(sx2) AS st2 FROM grp),
       |z AS (SELECT g, n,
       |    (CAST(sx AS DOUBLE) / n
       |      - CAST(st - sx AS DOUBLE) / (nt - n)) /
       |    sqrt(CAST(sx2 * n - CAST(sx AS HUGEINT) * sx AS DOUBLE)
       |        / (CAST(n AS DOUBLE) * n * (n - 1)) * n / n
       |      + CAST((st2 - sx2) * (nt - n)
       |          - CAST(st - sx AS HUGEINT) * (st - sx) AS DOUBLE)
       |        / (CAST(nt - n AS DOUBLE) * (nt - n) * (nt - n - 1))
       |        * (nt - n) / (nt - n)) AS zs
       |  FROM grp, tot),
       |ranked AS (SELECT g, n, zs, CAST(row_number() OVER (
       |    ORDER BY abs(zs) DESC, g) AS BIGINT) AS rnk FROM z),
       |cv(rnk, z_crit) AS (VALUES $vals),
       |j AS (SELECT r.g, r.n, r.zs, r.rnk, cv.z_crit FROM ranked r
       |  JOIN cv ON cv.rnk = r.rnk),
       |ks AS (SELECT coalesce(max(CASE WHEN abs(zs) >= z_crit
       |    THEN rnk ELSE 0 END), 0) AS k_star FROM j)
       |SELECT g AS nation, n AS n_cust,
       |  floor(zs * 1e4 + 0.5) / 1e4 AS z, rnk,
       |  floor(z_crit * 1e4 + 0.5) / 1e4 AS z_crit,
       |  rnk <= k_star AS rejected
       |FROM j, ks ORDER BY rnk""".stripMargin
  }

  /** q_tost_equivalence oracle — z_α = Φ⁻¹(0.95) folded once from
    * Scala as a DOUBLE-cast literal; moments mirrored token for token
    * so every z compares identical doubles. */
  private def tostOracle: String = {
    val zA = graft.ops.Mining.invNorm(0.95)
    s"""WITH cust AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    c_custkey % 2 AS arm, CAST(round(c_acctbal) AS BIGINT) AS v
       |  FROM customer),
       |g AS (SELECT nation, arm, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(v) AS BIGINT) AS sx,
       |    sum(CAST(v AS HUGEINT) * v) AS sx2
       |  FROM cust GROUP BY 1, 2),
       |j AS (SELECT o.nation,
       |    o.n AS no, o.sx AS sxo, o.sx2 AS sx2o,
       |    e.n AS ne, e.sx AS sxe, e.sx2 AS sx2e
       |  FROM g o JOIN g e ON o.nation = e.nation
       |  WHERE o.arm = 1 AND e.arm = 0
       |    AND o.n >= 2 AND e.n >= 2),
       |z AS (SELECT nation, no + ne AS n_cust,
       |    CAST(sxo AS DOUBLE) / no - CAST(sxe AS DOUBLE) / ne AS delta,
       |    sqrt(CAST(sx2o * no - CAST(sxo AS HUGEINT) * sxo AS DOUBLE)
       |        / (CAST(no AS DOUBLE) * no * (no - 1)) * no / no
       |      + CAST(sx2e * ne - CAST(sxe AS HUGEINT) * sxe AS DOUBLE)
       |        / (CAST(ne AS DOUBLE) * ne * (ne - 1)) * ne / ne) AS se
       |  FROM j)
       |SELECT nation, n_cust,
       |  floor(delta * 1e4 + 0.5) / 1e4 AS delta,
       |  floor(se * 1e4 + 0.5) / 1e4 AS se,
       |  floor((delta + 100.0) / se * 1e4 + 0.5) / 1e4 AS z_low,
       |  floor((delta - 100.0) / se * 1e4 + 0.5) / 1e4 AS z_high,
       |  (delta + 100.0) / se >= CAST($zA AS DOUBLE)
       |    AND (delta - 100.0) / se <= -CAST($zA AS DOUBLE)
       |    AS equivalent
       |FROM z ORDER BY nation""".stripMargin
  }

  /** q_corr_matrix oracle — the six pair blocks generated from the
    * same column list as the Spark plan, moments mirrored
    * DECIMAL⇄HUGEINT token for token, sqrt factors taken separately
    * (their integer product would overflow both engines' decimals). */
  private def corrMatrixOracle: String = {
    val cols = Seq("qty", "price", "disc", "tax")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val moments =
      cols.flatMap(c => Seq(
        s"CAST(sum($c) AS BIGINT) AS s_$c",
        s"sum(CAST($c AS HUGEINT) * $c) AS ss_$c")) ++
      pairs.map { case (a, b) =>
        s"sum(CAST($a AS HUGEINT) * $b) AS sp_${a}_$b" }
    val blocks = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS x_col, '$b' AS y_col, n,
         |  floor(CAST(sp_${a}_$b * n
         |      - CAST(s_$a AS HUGEINT) * s_$b AS DOUBLE)
         |    / (sqrt(CAST(ss_$a * n
         |        - CAST(s_$a AS HUGEINT) * s_$a AS DOUBLE))
         |      * sqrt(CAST(ss_$b * n
         |        - CAST(s_$b AS HUGEINT) * s_$b AS DOUBLE)))
         |    * 1e6 + 0.5) / 1e6 AS corr FROM m""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH base AS (SELECT
       |    CAST(round(l_quantity) AS BIGINT) AS qty,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
       |    CAST(round(l_discount * 100) AS BIGINT) AS disc,
       |    CAST(round(l_tax * 100) AS BIGINT) AS tax FROM lineitem),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    ${moments.mkString(",\n    ")}
       |  FROM base)
       |SELECT * FROM (
       |  $blocks
       |) ORDER BY x_col, y_col""".stripMargin
  }

  private lazy val extraOracles: Map[String, String] =
    Map("q_absorbing_markov" -> absorbingMarkovOracle)

  /** stream_event_pattern and stream_dedup_minhash are contracted to
    * equal their batch twins, so they share the batch oracle SQL
    * verbatim. */
  def oracleSql: Map[String, String] =
    oracleSqlBase ++ extraOracles +
      ("stream_dau_mau" -> oracleSqlBase("q_dau_mau")) +
      // per-day integer folds are partial-aggregable: the converged
      // complete-mode state equals the batch census — stream≡batch
      ("stream_vwap" -> oracleSqlBase("q_vwap")) +
      // per-day max/min bars are associative+commutative state; the
      // monthly pico-lattice fold runs post-sink on the converged
      // frame — stream≡batch by construction
      ("stream_parkinson" -> oracleSqlBase("q_parkinson_vol")) +
      // 20-bin additive histograms converge to the batch census; the
      // BC/H fold is a post-sink expression over them — stream≡batch
      ("stream_hellinger" -> oracleSqlBase("q_hellinger_bc")) +
      // 10-bin additive sufficient statistics converge to the batch
      // bins; reliability/ECE are post-sink folds — stream≡batch
      ("stream_calibration" -> oracleSqlBase("q_calibration_bins")) +
      // first-seen (user, day) compaction under the bounded watermark
      // recipe equals the batch distinct daily frame — stream≡batch
      ("stream_new_vs_returning" ->
        oracleSqlBase("q_new_vs_returning")) +
      // the per-customer spend fold is partial-aggregable; the
      // inequality tail unfolds from the converged state — stream≡batch
      ("stream_atkinson" -> oracleSqlBase("q_atkinson_index")) +
      // order-insensitive counts/sums over a stateless zone projection
      // converge to the batch census — stream≡batch by construction
      ("stream_timezone" -> oracleSqlBase("q_timezone_funcs")) +
      // every moment is a partial-aggregable fold: the converged state
      // row equals the batch census — stream≡batch by construction
      ("stream_corr_matrix" -> corrMatrixOracle) +
      ("stream_event_pattern" -> oracleSqlBase("q_event_pattern")) +
      ("stream_dedup_minhash" -> oracleSqlBase("dedup_incremental")) +
      ("stream_scd2_build" -> oracleSqlBase("q_scd2_build")) +
      // streaming bottom-k-by-portable-hash is order-insensitive, so
      // the final state EQUALS the batch temperature-mix selection —
      // the shared oracle is the stream≡batch certificate
      ("stream_quota_mix" -> oracleSqlBase("data_temperature_mix")) +
      // the incremental fold is CONTRACTED to equal the full
      // re-cluster of the unioned corpus — dedup_clusters' oracle,
      // shared verbatim, proves the equivalence value-for-value
      ("dedup_incremental_clusters" -> oracleSqlBase("dedup_clusters")) +
      // the exact prefix-filter join computes the same pair relation
      // the LSH pipeline approximates — one oracle, two algorithms;
      // equality at the gate is a recall-1.0 certificate for banding
      ("dedup_setsim_join" -> oracleSqlBase("dedup_minhash_lsh")) +
      // the streaming scorer folds the same integer micro-nat weights
      // under the same fitted model — converges to the batch answer
      ("stream_importance_score" ->
        oracleSqlBase("data_importance_resample")) +
      // the streamed candidate histogram folds into the identical
      // nano-nat PSI terms — converges to the batch drift monitor
      ("stream_drift_psi" -> oracleSqlBase("q_psi_drift")) +
      // open/close are partial-aggregable argmins over the total
      // (ts, event_id) order — micro-batch chopping cannot move them
      ("stream_ohlc_bars" -> oracleSqlBase("q_ohlc_bars")) +
      // first-seen user dedup + associative arm counts converge to
      // the batch census; chi-square runs post-stream on 2 rows
      ("stream_srm" -> oracleSqlBase("q_ab_srm")) +
      // stage transitions only move forward on in-order input, so the
      // O(1)-state fold converges to the batch three-join funnel
      ("stream_funnel" -> oracleSqlBase("q_funnel")) +
      // the explicit 256-gray palette makes the indexed roundtrip
      // lossless — identical decoded checksums to the PNG path
      ("multimodal_gif_codec" -> oracleSqlBase("multimodal_png_codec")) +
      // the leakage census folds the SAME verified pair relation the
      // dedup family shares (wrapped as a derived table) under the
      // portable md5 split hash
      ("data_split_leakage" ->
        s"""WITH pr AS (SELECT * FROM (
           |${oracleSqlBase("dedup_minhash_lsh")}
           |))
           |SELECT CAST(floor(jaccard * 10) AS BIGINT) AS j_bucket,
           |  CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(CASE WHEN
           |      (md5_number_lower(CAST(id_a AS VARCHAR))
           |        & 9223372036854775807) % 2 <>
           |      (md5_number_lower(CAST(id_b AS VARCHAR))
           |        & 9223372036854775807) % 2
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
           |  round(CAST(sum(CASE WHEN
           |      (md5_number_lower(CAST(id_a AS VARCHAR))
           |        & 9223372036854775807) % 2 <>
           |      (md5_number_lower(CAST(id_b AS VARCHAR))
           |        & 9223372036854775807) % 2
           |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS cross_share
           |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin)

  /** q_sprt_test oracle — the SPRT constants are computed ONCE here in
    * JVM math and folded into the SQL as shortest-round-trip literals,
    * so both engines walk the identical LLR line (the annIvfOracle
    * constant-folding recipe applied to ln()). */
  private def qSprtOracle: String = {
    val a = math.log(0.4 / 0.3)
    val b = math.log(0.6 / 0.7)
    val up = math.log(0.95 / 0.05)
    val lo = math.log(0.05 / 0.95)
    s"""WITH t AS (
       |  SELECT event_id, epoch_us(ts) AS ts_us,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
       |  FROM events WHERE event_type IN ('purchase', 'click')),
       |w AS (
       |  SELECT CAST(row_number() OVER (ORDER BY ts_us, event_id)
       |      AS BIGINT) AS k,
       |    CAST(sum(x) OVER (ORDER BY ts_us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS n1
       |  FROM t),
       |l AS (SELECT k, n1, n1 * ($a) + (k - n1) * ($b) AS llr FROM w),
       |c AS (SELECT k, n1, llr FROM l
       |      WHERE llr >= $up OR llr <= $lo ORDER BY k LIMIT 1)
       |SELECT CASE WHEN c.llr >= $up THEN 'accept_h1'
       |    WHEN c.llr IS NULL THEN 'undecided'
       |    ELSE 'accept_h0' END AS decision,
       |  CAST(coalesce(c.k, 0) AS BIGINT) AS n_trials,
       |  CAST(coalesce(c.n1, 0) AS BIGINT) AS n_purchases,
       |  round(coalesce(c.llr, 0.0), 4) AS llr
       |FROM (SELECT 1 AS one) anchor LEFT JOIN c ON TRUE""".stripMargin
  }

  private val oracleSqlBase: Map[String, String] = Map(
    "shred_flatten" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "shred_children" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey % 20 = 0 ORDER BY 1, 2""".stripMargin,
    "shred_prim_subobj" ->
      """SELECT o_orderkey, c_name AS "customer$c_name",
        |  c_mktsegment AS "customer$c_mktsegment"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 20 = 0 ORDER BY 1""".stripMargin,
    "shred_prim_array" ->
      """SELECT l_orderkey, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "assemble_nested" ->
      """SELECT o_orderkey, c_name AS cust_name, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderkey % 25 = 0 GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "type_infer" ->
      """WITH nv AS (
        |  SELECT 'k' AS name, json_extract_string(props, '$.k') AS value
        |  FROM events
        |  UNION ALL
        |  SELECT 'amount', json_extract_string(props, '$.k') || '.5'
        |  FROM events
        |  UNION ALL
        |  SELECT 'event_time', strftime(ts, '%Y-%m-%dT%H:%M:%S') FROM events
        |  UNION ALL
        |  SELECT 'props_raw', props FROM events)
        |SELECT name,
        |  CASE WHEN regexp_full_match(value, '-?[0-9]+(\.[0-9]+)?')
        |         THEN 'NUMBER'
        |       WHEN contains(lower(name), 'time') AND contains(value, ':')
        |            AND contains(value, 'T') THEN 'DATE'
        |       WHEN length(value) < 128 THEN 'MEDIUM_STRING'
        |       ELSE 'TEXT' END AS vclass,
        |  count(*) AS n
        |FROM nv GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  CAST(o_orderdate AS DATE) AS o_orderdate
        |FROM orders WHERE o_orderkey = 100""".stripMargin,
    "upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus,
        |    round(o_totalprice * 1.1, 2) AS o_totalprice
        |  FROM orders WHERE o_orderkey % 100 = 0
        |  UNION ALL SELECT -1, 'N', 123.45),
        |merged AS (
        |  SELECT * FROM upd
        |  UNION ALL
        |  SELECT * FROM base
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd))
        |SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "schema_evolution" ->
      """WITH v1 AS (
        |  SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS pri
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |v2 AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority AS pri
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT coalesce(pri, '<missing>') AS priority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2) u
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "json_roundtrip_count" ->
      "SELECT count(*) AS n_total, count(*) AS n_match FROM orders",
    "engine_save_get" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |   WHERE l_orderkey = 100) AS n_items
        |FROM orders WHERE o_orderkey = 100""".stripMargin,
    "engine_delete" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderkey % 7 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "engine_time_travel" ->
      """WITH base AS (SELECT c_custkey AS k, c_acctbal AS bal
        |  FROM customer),
        |v1 AS (SELECT k, CASE WHEN k % 5 = 0 THEN round(bal + 100, 2)
        |    ELSE bal END AS bal FROM base),
        |v2 AS (SELECT * FROM v1 WHERE k % 11 <> 0),
        |u AS (
        |  SELECT 'v0' AS version, CAST(count(*) AS BIGINT) AS n_rows,
        |    round(sum(bal), 2) AS balance FROM base
        |  UNION ALL SELECT 'v1', CAST(count(*) AS BIGINT),
        |    round(sum(bal), 2) FROM v1
        |  UNION ALL SELECT 'live', CAST(count(*) AS BIGINT),
        |    round(sum(bal), 2) FROM v2)
        |SELECT version, n_rows, balance FROM u
        |ORDER BY version""".stripMargin,
    "engine_vacuum" ->
      """WITH live AS (
        |  SELECT c_custkey AS k,
        |    CASE WHEN c_custkey % 5 = 0 THEN round(c_acctbal + 100, 2)
        |      ELSE c_acctbal END AS bal
        |  FROM customer WHERE c_custkey % 11 <> 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(bal), 2) AS balance,
        |  CAST(2 AS BIGINT) AS n_dirs_removed,
        |  CAST(0 AS BIGINT) AS n_versions_left
        |FROM live""".stripMargin,
    "engine_snapshot_diff" ->
      """WITH c AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
        |cls AS (
        |  SELECT CASE WHEN k % 11 = 0 THEN 'deleted'
        |      WHEN k % 5 = 0 THEN 'changed'
        |      ELSE 'unchanged' END AS change_type,
        |    CASE WHEN k % 11 = 0 THEN -CAST(round(bal * 100, 0) AS BIGINT)
        |      WHEN k % 5 = 0 THEN CAST(round((round(bal + 100, 2) - bal)
        |        * 100, 0) AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS delta_cents
        |  FROM c
        |  UNION ALL
        |  SELECT 'added', CAST(round(bal * 100, 0) AS BIGINT)
        |  FROM c WHERE k % 7 = 0)
        |SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(delta_cents) AS BIGINT) / 100.0 AS balance_delta
        |FROM cls GROUP BY 1 ORDER BY change_type""".stripMargin,
    "engine_nested_sql" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY r_name""".stripMargin,
    "engine_evolve_upsert" ->
      """WITH upd AS (SELECT o_orderkey AS k, o_totalprice AS p,
        |    o_orderstatus AS st FROM orders WHERE o_orderkey % 4 = 0),
        |merged AS (SELECT k, p, st FROM upd
        |  UNION ALL SELECT o_orderkey, o_totalprice, NULL FROM orders
        |  WHERE o_orderkey NOT IN (SELECT k FROM upd))
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(p), 2) AS total,
        |  CAST(count(st) AS BIGINT) AS n_with_status
        |FROM merged""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  CAST(o_orderdate AS DATE) AS o_orderdate
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_forecast" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS UNBOUNDED PRECEDING), 2) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 2
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_custkey, c_name,
        |  CAST(CASE WHEN EXISTS
        |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |    THEN 1 ELSE 0 END AS BIGINT) AS has_orders
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_outer_join" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_custkey % 3 = 0),
        |ord AS (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders
        |  WHERE o_custkey % 2 = 0 GROUP BY 1)
        |SELECT coalesce(c_custkey, o_custkey) AS key,
        |  coalesce(c_mktsegment, '<no-cust>') AS segment,
        |  coalesce(n_orders, 0) AS n_orders
        |FROM cust FULL OUTER JOIN ord ON c_custkey = o_custkey
        |ORDER BY key""".stripMargin,
    "q_null_handling" ->
      """WITH t AS (
        |  SELECT nullif(o_orderstatus, 'F') AS st, o_orderstatus,
        |    o_totalprice
        |  FROM orders)
        |SELECT coalesce(st, '<null>') AS status,
        |  count(*) AS n_rows,
        |  count(st) AS n_nonnull,
        |  CAST(sum(CASE WHEN st IS NOT DISTINCT FROM o_orderstatus
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
        |  round(avg(CASE WHEN st IS NULL THEN o_totalprice END), 2)
        |    AS avg_null_price
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_case_having" ->
      """SELECT o_orderstatus,
        |  CASE WHEN o_totalprice < 50000 THEN 'small'
        |       WHEN o_totalprice < 150000 THEN 'medium'
        |       ELSE 'large' END AS bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2 HAVING count(*) > 5
        |ORDER BY 1, 2""".stripMargin,
    "q_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_string_funcs" ->
      """SELECT upper(p_brand) AS brand_u, substr(p_type, 1, 5) AS type_pfx,
        |  count(*) AS n,
        |  round(avg(length(p_name)), 2) AS avg_name_len,
        |  min(p_brand || '#' || p_name) AS min_tag
        |FROM part GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_set_ops" ->
      """SELECT key, tag FROM (
        |  SELECT key, 'both' AS tag FROM
        |    (SELECT c_custkey AS key FROM customer
        |     INTERSECT SELECT o_custkey FROM orders) i
        |  UNION ALL
        |  SELECT key, 'cust_only' AS tag FROM
        |    (SELECT c_custkey AS key FROM customer
        |     EXCEPT SELECT o_custkey FROM orders) e) u
        |ORDER BY tag, key""".stripMargin,
    "q_set_ops_all" ->
      """WITH a AS (SELECT o_custkey AS key FROM orders),
        |b AS (SELECT o_custkey AS key FROM orders
        |      WHERE o_orderstatus = 'F')
        |SELECT key, n, op FROM (
        |  SELECT key, count(*) AS n, 'except_all' AS op
        |  FROM (SELECT key FROM a EXCEPT ALL SELECT key FROM b) e
        |  GROUP BY key
        |  UNION ALL
        |  SELECT key, count(*) AS n, 'intersect_all' AS op
        |  FROM (SELECT key FROM a INTERSECT ALL SELECT key FROM b) i
        |  GROUP BY key) u
        |ORDER BY op, key""".stripMargin,
    "q_string_funcs2" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS padded,
        |  reverse(p_brand) AS rev,
        |  translate(p_type, 'aeiou', 'AEIOU') AS xlate,
        |  CAST(strpos(p_name, 'o') AS BIGINT) AS first_o,
        |  repeat('ab', 3) AS rep
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs2" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |  CAST(isodow(o_orderdate) - 1 AS BIGINT) AS wd,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name,
        |  coalesce(n_name, 'ALL') AS n_name,
        |  count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY 1, 2""".stripMargin,
    "q_ntile" ->
      """SELECT o_orderstatus, quartile, count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM (
        |  SELECT o_orderstatus, o_totalprice,
        |    CAST(ntile(4) OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
        |  FROM orders) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(st, 'ALL') AS status, coalesce(yr, -1) AS yr,
        |  count(*) AS n, round(sum(tp), 2) AS total
        |FROM (SELECT o_orderstatus AS st,
        |        CAST(year(o_orderdate) AS BIGINT) AS yr,
        |        o_totalprice AS tp FROM orders) t
        |GROUP BY CUBE(st, yr) ORDER BY 1, 2""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(st, 'ALL') AS status, coalesce(yr, -1) AS yr,
        |  count(*) AS n, round(sum(tp), 2) AS total
        |FROM (SELECT o_orderstatus AS st,
        |        CAST(year(o_orderdate) AS BIGINT) AS yr,
        |        o_totalprice AS tp FROM orders) t
        |GROUP BY GROUPING SETS ((st, yr), (st), ())
        |ORDER BY 1, 2""".stripMargin,
    "q_rank_funcs" ->
      """SELECT o_orderstatus, o_orderkey,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders WHERE o_orderkey % 10 = 0
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "q_date_interval" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30d,
        |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  CAST(o_orderdate AS DATE) - 7 AS minus7d,
        |  CAST(date_diff('day', DATE '1995-01-01',
        |    CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // the oracle computes expected extracts from the base columns, so
    // it checks the whole construct->extract JSON roundtrip
    "q_json_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  event_type AS t,
        |  CAST(2 AS BIGINT) AS n_vals,
        |  round(value * 2, 2) AS val2
        |FROM events WHERE event_id % 10 = 0
        |ORDER BY event_id""".stripMargin,
    "q_conditional_agg" ->
      """SELECT l_returnflag,
        |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT)
        |    AS n_bulk,
        |  bool_or(l_discount > 0.05) AS any_deep_disc,
        |  bool_and(l_quantity > 0) AS all_positive,
        |  round(sum(l_extendedprice) FILTER (WHERE l_discount = 0), 2)
        |    AS full_price_rev
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_array_funcs" ->
      """WITH g AS (
        |  SELECT l_orderkey, list_sort(list(l_quantity)) AS arr
        |  FROM lineitem WHERE l_orderkey % 25 = 0 GROUP BY 1)
        |SELECT l_orderkey,
        |  CAST(len(arr) AS BIGINT) AS n_items,
        |  arr[1] AS min_qty,
        |  arr[-1] AS max_qty,
        |  list_contains(arr, 20.0) AS has20,
        |  round(coalesce(arr[1], 0) + coalesce(arr[2], 0) +
        |    coalesce(arr[3], 0), 2) AS sum_low3
        |FROM g ORDER BY l_orderkey""".stripMargin,
    "q_bitwise_agg" ->
      """SELECT l_orderkey,
        |  CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS ln_and,
        |  CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS ln_or,
        |  CAST(bit_xor(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS ln_xor
        |FROM lineitem WHERE l_orderkey % 50 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_bigram_lift" ->
      """WITH uni AS (
        |  SELECT t AS w, count(*) AS df_w FROM (
        |    SELECT unnest(list_distinct(
        |      regexp_split_to_array(trim(text), '\s+'))) AS t
        |    FROM documents) u GROUP BY 1),
        |bi AS (
        |  SELECT b, count(*) AS df_xy FROM (
        |    SELECT unnest(list_distinct(list_transform(
        |      range(greatest(len(t) - 1, 0)),
        |      i -> t[i+1] || ' ' || t[i+2]))) AS b
        |    FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS t
        |          FROM documents) d) x
        |  GROUP BY 1 HAVING count(*) >= 5),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |j AS (
        |  SELECT b AS bigram, df_xy,
        |    round(n_docs * df_xy::DOUBLE /
        |      (ux.df_w * uy.df_w), 4) AS lift
        |  FROM bi
        |  JOIN uni ux ON ux.w = split_part(b, ' ', 1)
        |  JOIN uni uy ON uy.w = split_part(b, ' ', 2)
        |  CROSS JOIN n)
        |SELECT bigram, df_xy, lift FROM j
        |ORDER BY lift DESC, bigram LIMIT 20""".stripMargin,
    "q_regex_funcs" ->
      """SELECT p_partkey,
        |  regexp_extract(p_type, '^(\w+) (\w+)', 1) AS fam,
        |  regexp_extract(p_type, '^(\w+) (\w+)', 2) AS sub,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT)
        |    AS n_vowels,
        |  regexp_replace(p_brand, '[0-9]', '#', 'g') AS brand_masked
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_null_sort" ->
      """SELECT o_orderkey, coalesce(st, '<null>') AS st, o_totalprice,
        |  CAST(row_number() OVER (ORDER BY st ASC NULLS FIRST,
        |    o_totalprice DESC NULLS LAST, o_orderkey) AS BIGINT) AS pos
        |FROM (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st,
        |        o_totalprice
        |      FROM orders WHERE o_orderkey % 100 = 0) t
        |ORDER BY pos""".stripMargin,
    "q_decimal_arith" ->
      """SELECT l_returnflag,
        |  ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
        |    AS DOUBLE), 2) AS sum_price,
        |  ROUND(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(14,4)))
        |    AS DOUBLE), 4) AS sum_net,
        |  ROUND(CAST(max(CAST(l_extendedprice AS DECIMAL(12,2)))
        |    AS DOUBLE), 2) AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_higher_order" ->
      """WITH g AS (
        |  SELECT l_orderkey, list_sort(list(l_quantity)) AS arr
        |  FROM lineitem WHERE l_orderkey % 25 = 0 GROUP BY 1)
        |SELECT l_orderkey,
        |  CAST(len(list_filter(arr, x -> x > 25)) AS BIGINT) AS n_bulk,
        |  len(list_filter(arr, x -> x > 40)) > 0 AS any40,
        |  len(list_filter(arr, x -> x <= 0)) = 0 AS all_pos,
        |  round(list_sum(list_transform(arr, x -> x * 2)), 2)
        |    AS doubled_sum
        |FROM g ORDER BY l_orderkey""".stripMargin,
    "text_tfidf_top" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT w, count(*) AS df_w FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (
        |  SELECT doc_id, w,
        |    round((tf * n_docs)::DOUBLE / df_w, 4) AS score
        |  FROM tf JOIN df USING (w) CROSS JOIN n),
        |r AS (SELECT doc_id, w, score, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, w) AS rn FROM sc)
        |SELECT doc_id, w AS top_term, score FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "q_window_range" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  count(*) OVER w AS n_in_band,
        |  round(sum(l_quantity) OVER w, 2) AS sum_in_band
        |FROM lineitem WHERE l_suppkey <= 2
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity
        |  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_corr_subquery" ->
      """SELECT o_orderkey,
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_orderkey = o_orderkey) AS n_items,
        |  (SELECT round(max(l_extendedprice), 2) FROM lineitem
        |   WHERE l_orderkey = o_orderkey) AS max_price
        |FROM orders WHERE o_orderkey % 50 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  round(first_value(o_totalprice) OVER w, 2) AS first_price,
        |  round(last_value(o_totalprice) OVER w, 2) AS last_price,
        |  round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
        |FROM orders WHERE o_custkey <= 200
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // md5_number_lower replays the engine's sampling hash exactly
    "data_epoch_shuffle" ->
      """WITH ks AS (
        |  SELECT e.epoch, doc_id,
        |    CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || ':' ||
        |      CAST(e.epoch AS VARCHAR)) & 1125899906842623 AS BIGINT) AS k
        |  FROM documents, (SELECT unnest([0, 1, 2]) AS epoch) e),
        |s AS (SELECT epoch, doc_id, k, k % 16 AS shard FROM ks),
        |r AS (SELECT epoch, shard, doc_id, k, row_number() OVER (
        |    PARTITION BY epoch, shard ORDER BY k, doc_id) AS rn
        |  FROM s),
        |g AS (SELECT epoch, shard, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(min(k) AS BIGINT) AS min_key
        |  FROM s GROUP BY 1, 2)
        |SELECT CAST(g.epoch AS BIGINT) AS epoch,
        |  CAST(g.shard AS BIGINT) AS shard, g.n_docs,
        |  r.doc_id AS first_doc, g.min_key
        |FROM g JOIN r ON g.epoch = r.epoch AND g.shard = r.shard
        |  AND r.rn = 1
        |ORDER BY epoch, shard""".stripMargin,
    "q_sample_stratified" ->
      """SELECT doc_id, source FROM documents
        |WHERE (md5_number_lower(CAST(doc_id AS VARCHAR)) & 2147483647)
        |    % 100 <
        |  CASE WHEN source IN ('src0','src1','src2','src3','src4')
        |       THEN 50 ELSE 20 END
        |ORDER BY doc_id""".stripMargin,
    "q_sample_reservoir" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 1125899906842623 AS BIGINT) AS hh
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, CAST(row_number() OVER (
        |    PARTITION BY source ORDER BY hh, doc_id) AS BIGINT) AS rn
        |  FROM h)
        |SELECT source, rn, doc_id FROM r WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin,
    "dedup_containment" ->
      s"""WITH ${shingleCte("documents")},
         |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_intersect(a.s, b.s)) AS i,
        |    len(a.s) AS la, len(b.s) AS lb
        |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        |  WHERE len(a.s) > 0 AND len(b.s) > 0)
        |SELECT doc_a, doc_b,
        |  round(i::DOUBLE / la, 4) AS contain_a,
        |  round(i::DOUBLE / lb, 4) AS contain_b
        |FROM p ORDER BY doc_a""".stripMargin,
    "text_contamination" ->
      s"""WITH ${shingleCte("documents")},
        |bg AS (SELECT list_distinct(flatten(list(s))) AS g
        |       FROM sh WHERE doc_id < 10)
        |SELECT doc_id,
        |  CAST(len(list_intersect(s, g)) AS INTEGER) AS n_shared,
        |  len(list_intersect(s, g)) >= 5 AS contaminated
        |FROM sh CROSS JOIN bg ORDER BY doc_id""".stripMargin,
    "text_levenshtein" ->
      """WITH p AS (
        |  SELECT doc_id, substr(text, 1, 80) AS pfx FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_dist
        |FROM p a JOIN p b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_a""".stripMargin,
    "text_top_ngrams" ->
      s"""WITH ${shingleCte("documents")},
        |u AS (SELECT unnest(s) AS ngram FROM sh)
        |SELECT ngram, count(*) AS n FROM u
        |GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev IS NULL
        |           OR CAST(floor(epoch(ts)) AS BIGINT)
        |              - CAST(floor(epoch(prev)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |x AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM s)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |  count(*) AS n_events,
        |  min(CAST(floor(epoch(ts)) AS BIGINT)) AS start_s,
        |  max(CAST(floor(epoch(ts)) AS BIGINT)) AS end_s
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "stream_window" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
        |    AS win_start_s,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_extendedprice), 2) AS var_price,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_discount), 6) AS cov_qd,
        |  round(avg(l_tax), 6) AS avg_tax
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS BIGINT)
        |    AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events WHERE CAST(floor(epoch(ts)) AS BIGINT) < 1704240000),
        |t1 AS (SELECT user_id, min(ts_s) AS t_view FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, t1.t_view, min(e.ts_s) AS t_click
        |       FROM e JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'click' AND e.ts_s > t1.t_view
        |       GROUP BY 1, 2),
        |t3 AS (SELECT e.user_id, min(e.ts_s) AS t_purchase
        |       FROM e JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts_s > t2.t_click
        |       GROUP BY 1)
        |SELECT (SELECT count(*) FROM t1) AS n_view,
        |       (SELECT count(*) FROM t2) AS n_click,
        |       (SELECT count(*) FROM t3) AS n_purchase""".stripMargin,
    "q_time_weighted_avg" ->
      """WITH x AS (
        |  SELECT user_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS t0,
        |    lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS t1
        |  FROM events)
        |SELECT user_id,
        |  round(sum(value * (t1 - t0)) / sum(t1 - t0), 6) AS twa,
        |  count(*) AS n_intervals
        |FROM x WHERE t1 IS NOT NULL AND t1 > t0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gap_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS day
        |  FROM orders WHERE o_totalprice > 400000),
        |g AS (
        |  SELECT day,
        |    day - CAST(row_number() OVER (ORDER BY day) AS INTEGER) AS grp
        |  FROM days)
        |SELECT CAST(min(day) AS VARCHAR) AS island_start,
        |  CAST(max(day) AS VARCHAR) AS island_end,
        |  count(*) AS n_days
        |FROM g GROUP BY grp HAVING count(*) >= 2
        |ORDER BY 1""".stripMargin,
    // both latest-per-key oracles rank on epoch_us(ts): the engine
    // canonicalizes event time to microseconds, while DuckDB reads
    // TIMESTAMP(NANOS) testdata at ns precision — two same-user events
    // inside the same microsecond must pick the same winner both sides
    "stream_latest_per_key" ->
      """WITH r AS (
        |  SELECT user_id, event_id, event_type, ts, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |  round(value, 2) AS value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_latest_per_key" ->
      """WITH r AS (
        |  SELECT user_id, event_id, event_type, ts, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |  round(value, 2) AS value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_skew_join_salted" ->
      """SELECT s_nationkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_date_spine" ->
      """WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
        |                  max(CAST(o_orderdate AS DATE)) AS hi
        |           FROM orders),
        |spine AS (SELECT unnest(generate_series(lo, hi,
        |            INTERVAL 1 DAY))::DATE AS day FROM b),
        |daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |            count(*) AS n, round(sum(o_totalprice), 2) AS total
        |          FROM orders WHERE o_totalprice > 400000 GROUP BY 1)
        |SELECT CAST(s.day AS VARCHAR) AS day, coalesce(d.n, 0) AS n,
        |  coalesce(d.total, 0.0) AS total
        |FROM spine s LEFT JOIN daily d ON s.day = d.day
        |ORDER BY 1""".stripMargin,
    "q_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n
        |           FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |        ORDER BY n DESC, l_quantity) AS rn FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, n
        |FROM r WHERE rn = 1 ORDER BY 1""".stripMargin,
    "q_integrity_audit" ->
      """SELECT
        |  (SELECT count(*) FROM orders) AS n_orders,
        |  (SELECT count(*) FROM lineitem) AS n_lineitem,
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |    AS orphan_orders,
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |    AS orphan_li_orders,
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |    AS orphan_li_parts,
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |    AS orphan_li_supps""".stripMargin,
    "q_market_basket" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem)
        |SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_orders
        |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2 ORDER BY n_orders DESC, part_a, part_b
        |LIMIT 20""".stripMargin,
    "q_recursive_bom" ->
      """WITH RECURSIVE anc(node, a) AS (
        |  SELECT p_partkey, p_partkey FROM part
        |  UNION ALL
        |  SELECT node, CAST(floor(a / 10) AS BIGINT) FROM anc WHERE a > 0
        |)
        |SELECT a AS anc_key, CAST(count(*) AS BIGINT) AS n_desc,
        |  round(sum(p.p_retailprice), 2) AS subtree_value
        |FROM anc JOIN part p ON p.p_partkey = anc.node
        |GROUP BY a ORDER BY a""".stripMargin,
    "q_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a, b FROM pairs
        |      UNION ALL SELECT b AS a, a AS b FROM pairs),
        |deg AS (SELECT a AS node, count(*)::DOUBLE AS deg
        |        FROM e GROUP BY 1),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM deg),
        |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM deg, nn),
        |r1 AS (SELECT e.b AS node,
        |         0.15 / any_value(nn.n) + 0.85 * sum(r.rank / d.deg) AS rank
        |       FROM e JOIN r0 r ON r.node = e.a
        |         JOIN deg d ON d.node = e.a, nn GROUP BY e.b),
        |r2 AS (SELECT e.b AS node,
        |         0.15 / any_value(nn.n) + 0.85 * sum(r.rank / d.deg) AS rank
        |       FROM e JOIN r1 r ON r.node = e.a
        |         JOIN deg d ON d.node = e.a, nn GROUP BY e.b),
        |r3 AS (SELECT e.b AS node,
        |         0.15 / any_value(nn.n) + 0.85 * sum(r.rank / d.deg) AS rank
        |       FROM e JOIN r2 r ON r.node = e.a
        |         JOIN deg d ON d.node = e.a, nn GROUP BY e.b)
        |SELECT * FROM (
        |  SELECT CAST((node - 1) / 2 AS BIGINT) AS s_suppkey,
        |    round(rank, 6) AS rank
        |  FROM r3 WHERE node % 2 = 1)
        |ORDER BY rank DESC, s_suppkey LIMIT 20""".stripMargin,
    "q_table_checksum" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  bit_xor(CAST(md5_number_lower(concat_ws('|',
        |      l_orderkey, l_linenumber, l_returnflag, l_linestatus,
        |      CAST(CAST(l_shipdate AS DATE) AS VARCHAR)))
        |    & 9223372036854775807 AS BIGINT)) AS checksum
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_zorder_cluster" ->
      """WITH b AS (
        |  SELECT CAST(floor(o_custkey / 8) AS INTEGER) AS x,
        |    CAST(floor(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) / 16) AS INTEGER) AS y
        |  FROM orders),
        |zz AS (
        |  SELECT x, y,
        |    ((x >> 0) & 1) * 1 + ((y >> 0) & 1) * 2 +
        |    ((x >> 1) & 1) * 4 + ((y >> 1) & 1) * 8 +
        |    ((x >> 2) & 1) * 16 + ((y >> 2) & 1) * 32 +
        |    ((x >> 3) & 1) * 64 + ((y >> 3) & 1) * 128 +
        |    ((x >> 4) & 1) * 256 + ((y >> 4) & 1) * 512 +
        |    ((x >> 5) & 1) * 1024 + ((y >> 5) & 1) * 2048 +
        |    ((x >> 6) & 1) * 4096 + ((y >> 6) & 1) * 8192 +
        |    ((x >> 7) & 1) * 16384 + ((y >> 7) & 1) * 32768 AS zv
        |  FROM b)
        |SELECT zv >> 8 AS zbucket, count(*) AS n,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y
        |FROM zz GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cdc_apply" ->
      """WITH ranked AS (
        |  SELECT o_custkey AS k, o_orderkey AS ok, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders),
        |chg AS (
        |  SELECT k,
        |    CASE WHEN ok % 3 = 0 THEN 'D' WHEN ok % 3 = 1 THEN 'U'
        |         ELSE 'I' END AS op,
        |    o_totalprice AS newbal
        |  FROM ranked WHERE rn = 1),
        |base AS (SELECT c_custkey AS k, c_acctbal AS bal,
        |    c_mktsegment AS seg FROM customer),
        |surv AS (SELECT k, bal, seg FROM base WHERE k NOT IN
        |  (SELECT k FROM chg WHERE op IN ('D', 'U'))),
        |upd AS (SELECT b.k, c.newbal AS bal, b.seg
        |  FROM base b JOIN chg c ON b.k = c.k AND c.op = 'U'),
        |ins AS (SELECT k + 1000000 AS k, newbal AS bal, 'NEW' AS seg
        |  FROM chg WHERE op = 'I'),
        |fin AS (SELECT * FROM surv UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins)
        |SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(bal), 2) AS total_bal
        |FROM fin GROUP BY seg ORDER BY seg""".stripMargin,
    "q_incremental_agg" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    o_totalprice, o_orderdate FROM orders),
        |state AS (SELECT month, count(*) AS n, sum(o_totalprice) AS t
        |  FROM m WHERE o_orderdate < TIMESTAMP '1997-07-01' GROUP BY 1),
        |delta AS (SELECT month, count(*) AS n, sum(o_totalprice) AS t
        |  FROM m WHERE o_orderdate >= TIMESTAMP '1997-07-01' GROUP BY 1),
        |merged AS (
        |  SELECT coalesce(s.month, d.month) AS month,
        |    coalesce(s.n, 0) + coalesce(d.n, 0) AS n,
        |    coalesce(s.t, 0) + coalesce(d.t, 0) AS tot
        |  FROM state s FULL OUTER JOIN delta d ON s.month = d.month),
        |fullr AS (SELECT month, count(*) AS fn, sum(o_totalprice) AS ftot
        |  FROM m GROUP BY 1)
        |SELECT mg.month, CAST(mg.n AS BIGINT) AS n,
        |  round(mg.tot, 2) AS total,
        |  (mg.n = f.fn AND abs(mg.tot - f.ftot) < 0.01) AS matches_full
        |FROM merged mg JOIN fullr f ON mg.month = f.month
        |ORDER BY mg.month""".stripMargin,
    "q_dynamic_prune" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE year(o_orderdate) % 3 = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_delta_detect" ->
      """WITH v1 AS (SELECT c_custkey AS k, c_acctbal AS bal,
        |    c_mktsegment AS seg FROM customer),
        |v2 AS (
        |  SELECT k, CASE WHEN k % 7 = 0 THEN round(bal + 100.0, 2)
        |    ELSE bal END AS bal, seg
        |  FROM v1 WHERE k % 11 <> 0
        |  UNION ALL
        |  SELECT k + 1000000 AS k, bal, 'NEW' AS seg
        |  FROM v1 WHERE k % 13 = 0),
        |d1 AS (SELECT k, md5(concat_ws('|', CAST(bal AS VARCHAR), seg))
        |    AS h1 FROM v1),
        |d2 AS (SELECT k, md5(concat_ws('|', CAST(bal AS VARCHAR), seg))
        |    AS h2 FROM v2),
        |j AS (SELECT coalesce(d1.k, d2.k) AS k, h1, h2
        |  FROM d1 FULL OUTER JOIN d2 ON d1.k = d2.k)
        |SELECT CASE WHEN h1 IS NULL THEN 'added'
        |    WHEN h2 IS NULL THEN 'deleted'
        |    WHEN h1 <> h2 THEN 'changed'
        |    ELSE 'unchanged' END AS status,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_weighted_median" ->
      """WITH b AS (SELECT l_returnflag, l_orderkey, l_linenumber,
        |    l_extendedprice,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)
        |      AS BIGINT) AS w FROM lineitem),
        |c AS (SELECT l_returnflag, l_extendedprice,
        |    CAST(sum(w) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM b),
        |t AS (SELECT l_returnflag, l_extendedprice, cum,
        |    max(cum) OVER (PARTITION BY l_returnflag) AS tot FROM c)
        |SELECT l_returnflag,
        |  round(min(l_extendedprice), 2) AS weighted_median
        |FROM t WHERE cum * 2 >= tot
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sliding_window" -> slidingWindowOracle,
    "stream_sliding_window" -> slidingWindowOracle,
    "q_hll_merge" ->
      """WITH tk AS (SELECT source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |t2 AS (SELECT source, tok FROM tk WHERE tok <> ''),
        |per AS (SELECT source, count(DISTINCT tok) AS n_exact
        |  FROM t2 GROUP BY 1),
        |uni AS (SELECT '__union__' AS source, count(DISTINCT tok) AS n_exact
        |  FROM t2)
        |SELECT source, CAST(n_exact AS BIGINT) AS n_exact,
        |  TRUE AS within_5pct
        |FROM (SELECT * FROM per UNION ALL SELECT * FROM uni)
        |ORDER BY source""".stripMargin,
    "q_triangle_count" ->
      """WITH ls AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM ls x JOIN ls y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey < y.l_partkey),
        |n AS (SELECT count(*) AS n_nodes FROM
        |  (SELECT a AS v FROM e UNION SELECT b FROM e)),
        |m AS (SELECT count(*) AS n_edges FROM e),
        |t AS (SELECT count(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b)
        |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
        |  CAST(n_edges AS BIGINT) AS n_edges,
        |  CAST(n_triangles AS BIGINT) AS n_triangles
        |FROM n, m, t""".stripMargin,
    "q_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(floor((floor(epoch(ts)) - 1704067200) / 604800)
        |      AS BIGINT) AS wk
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1),
        |s AS (SELECT cohort_wk, count(*) AS cohort_size FROM c GROUP BY 1),
        |a AS (SELECT c.cohort_wk, uw.wk - c.cohort_wk AS week_offset,
        |    count(*) AS n_active
        |  FROM uw JOIN c ON uw.user_id = c.user_id GROUP BY 1, 2)
        |SELECT a.cohort_wk, a.week_offset, a.n_active,
        |  round(a.n_active::DOUBLE / s.cohort_size, 4) AS retention
        |FROM a JOIN s USING (cohort_wk) ORDER BY 1, 2""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |x AS (SELECT *,
        |    max(CASE WHEN event_type = 'click' THEN ts_s END) OVER w
        |      AS last_click,
        |    min(CASE WHEN event_type = 'click' THEN ts_s END) OVER w
        |      AS first_click
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT coalesce(CAST(least(floor((ts_s - last_click) / 600), 5)
        |    AS BIGINT), -1) AS gap_bucket,
        |  count(*) AS n_purchases, round(sum(value), 2) AS revenue,
        |  CAST(count(CASE WHEN first_click < last_click THEN 1 END)
        |    AS BIGINT) AS n_multi_touch
        |FROM x WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anomaly_zscore" ->
      """WITH s AS (SELECT l_returnflag,
        |    round(avg(l_extendedprice) + 2.0 * stddev_samp(l_extendedprice),
        |      4) AS hi,
        |    round(avg(l_extendedprice) - 2.0 * stddev_samp(l_extendedprice),
        |      4) AS lo
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, count(*) AS n_rows,
        |  CAST(count(CASE WHEN l.l_extendedprice > s.hi THEN 1 END)
        |    AS BIGINT) AS n_high,
        |  CAST(count(CASE WHEN l.l_extendedprice < s.lo THEN 1 END)
        |    AS BIGINT) AS n_low,
        |  round(max(CASE WHEN l.l_extendedprice > s.hi
        |    THEN l.l_extendedprice END), 2) AS max_outlier
        |FROM lineitem l JOIN s USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ewma" ->
      """WITH m AS (SELECT l_returnflag,
        |    strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem GROUP BY 1, 2),
        |x AS (SELECT l_returnflag, month, revenue,
        |    lag(revenue, 1) OVER w AS r1, lag(revenue, 2) OVER w AS r2,
        |    lag(revenue, 3) OVER w AS r3, lag(revenue, 4) OVER w AS r4,
        |    lag(revenue, 5) OVER w AS r5
        |  FROM m WINDOW w AS (PARTITION BY l_returnflag ORDER BY month))
        |SELECT l_returnflag, month, revenue,
        |  round((coalesce(revenue * 1.0, 0) + coalesce(r1 * 0.5, 0)
        |      + coalesce(r2 * 0.25, 0) + coalesce(r3 * 0.125, 0)
        |      + coalesce(r4 * 0.0625, 0) + coalesce(r5 * 0.03125, 0))
        |    / (coalesce(CASE WHEN revenue IS NOT NULL THEN 1.0 END, 0)
        |      + coalesce(CASE WHEN r1 IS NOT NULL THEN 0.5 END, 0)
        |      + coalesce(CASE WHEN r2 IS NOT NULL THEN 0.25 END, 0)
        |      + coalesce(CASE WHEN r3 IS NOT NULL THEN 0.125 END, 0)
        |      + coalesce(CASE WHEN r4 IS NOT NULL THEN 0.0625 END, 0)
        |      + coalesce(CASE WHEN r5 IS NOT NULL THEN 0.03125 END, 0)),
        |    4) AS ewma
        |FROM x ORDER BY 1, 2""".stripMargin,
    "q_degree_dist" ->
      """WITH e AS (SELECT DISTINCT o_custkey, l_suppkey
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |d AS (SELECT l_suppkey, count(*) AS degree FROM e GROUP BY 1)
        |SELECT degree, count(*) AS n_suppliers,
        |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bloom_semi_filter" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_order,
        |    count(*) AS frequency, round(sum(o_totalprice), 2) AS monetary
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT max(last_order) AS mx FROM per),
        |sc AS (
        |  SELECT o_custkey, monetary,
        |    ntile(4) OVER (ORDER BY date_diff('day', last_order, mx.mx)
        |      DESC, o_custkey) AS r_score,
        |    ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
        |    ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_score
        |  FROM per, mx)
        |SELECT r_score, f_score, m_score, count(*) AS n_customers,
        |  round(sum(monetary), 2) AS cell_monetary, min(o_custkey) AS min_cust
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_linreg_trend" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1
        |      AS DOUBLE) AS x,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, count(*) AS n_months,
        |  round(regr_slope(revenue, x), 4) AS slope,
        |  round(regr_intercept(revenue, x), 2) AS intercept,
        |  round(regr_r2(revenue, x), 4) AS r2
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_markov_chain" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |p AS (SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id) AS dst
        |  FROM e),
        |t AS (SELECT src, dst, count(*) AS n FROM p
        |  WHERE dst IS NOT NULL GROUP BY 1, 2)
        |SELECT src, dst, n,
        |  round(n::DOUBLE / sum(n) OVER (PARTITION BY src), 4) AS p
        |FROM t ORDER BY src, dst""".stripMargin,
    "q_anomaly_mad" ->
      """WITH med AS (
        |  SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.5), 4) AS med
        |  FROM lineitem GROUP BY 1),
        |d AS (SELECT l.l_returnflag, m.med,
        |    abs(l.l_extendedprice - m.med) AS dev
        |  FROM lineitem l JOIN med m USING (l_returnflag)),
        |mad AS (SELECT l_returnflag, round(quantile_cont(dev, 0.5), 4) AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.l_returnflag, count(*) AS n_rows,
        |  any_value(d.med) AS med, any_value(mad.mad) AS mad,
        |  count(CASE WHEN d.dev > round(3 * 1.4826 * mad.mad, 4) THEN 1 END)
        |    AS n_outliers,
        |  round(max(d.dev), 2) AS max_dev
        |FROM d JOIN mad USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // approx-path contract: oracle computes the exact med/MAD/outlier
    // census and predicts the sketch bounds TRUE (q_approx_stats
    // pattern — the sketch itself is not replayable, its contract is)
    "q_anomaly_mad_approx" ->
      """WITH med AS (
        |  SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.5), 4) AS med
        |  FROM lineitem GROUP BY 1),
        |d AS (SELECT l.l_returnflag, m.med,
        |    abs(l.l_extendedprice - m.med) AS dev
        |  FROM lineitem l JOIN med m USING (l_returnflag)),
        |mad AS (SELECT l_returnflag, round(quantile_cont(dev, 0.5), 4) AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.l_returnflag, count(*) AS n_rows,
        |  any_value(d.med) AS med, any_value(mad.mad) AS mad,
        |  count(CASE WHEN d.dev > round(3 * 1.4826 * mad.mad, 4) THEN 1 END)
        |    AS n_outliers,
        |  TRUE AS med_within_1pct, TRUE AS mad_within_1pct,
        |  TRUE AS outliers_within_tol
        |FROM d JOIN mad USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_quantile_hist_approx" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99,
        |  TRUE AS p50_within_1pct, TRUE AS p99_within_1pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gini" ->
      """WITH rev AS (SELECT o_custkey,
        |    CAST(round(round(sum(o_totalprice), 2) * 100, 0) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |j AS (SELECT c.c_nationkey, rev.o_custkey, rev.cents
        |  FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY c_nationkey
        |    ORDER BY cents, o_custkey) AS BIGINT) AS r FROM j),
        |g AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
        |    round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS total_rev,
        |    round(2.0 * CAST(sum(r * cents) AS DOUBLE) /
        |        (CAST(count(*) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
        |      - (count(*) + 1.0) / count(*), 4) AS gini
        |  FROM r GROUP BY 1)
        |SELECT n.n_name, g.n_customers, g.total_rev, g.gini
        |FROM g JOIN nation n ON g.c_nationkey = n.n_nationkey
        |ORDER BY n.n_name""".stripMargin,
    "q_item_cosine" ->
      """WITH ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |f AS (SELECT pk, count(*) AS freq FROM ls GROUP BY 1),
        |p AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_ab
        |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2)
        |SELECT part_a, part_b, n_ab,
        |  round(n_ab / sqrt(fa.freq * fb.freq), 4) AS cosine
        |FROM p JOIN f fa ON fa.pk = part_a JOIN f fb ON fb.pk = part_b
        |ORDER BY cosine DESC, part_a, part_b LIMIT 20""".stripMargin,
    "q_connected_components" ->
      """WITH RECURSIVE sp AS (SELECT p_partkey FROM part WHERE p_size <= 3),
        |ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |e AS (SELECT u, v FROM (
        |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
        |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2) WHERE w >= 2),
        |reach(id, r) AS (
        |  SELECT u, u FROM e UNION SELECT v, v FROM e
        |  UNION
        |  SELECT reach.id, CASE WHEN e.u = reach.r THEN e.v ELSE e.u END
        |  FROM reach JOIN e ON e.u = reach.r OR e.v = reach.r),
        |lbl AS (SELECT id, min(r) AS component FROM reach GROUP BY 1)
        |SELECT component, count(*) AS n_members
        |FROM lbl GROUP BY 1 ORDER BY n_members DESC, component
        |LIMIT 20""".stripMargin,
    "q_label_prop" ->
      """WITH sp AS (SELECT p_partkey FROM part WHERE p_size <= 3),
        |ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |e AS (SELECT u, v FROM (
        |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
        |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2) WHERE w >= 1),
        |sym AS (SELECT u AS src, v AS dst FROM e
        |  UNION ALL SELECT v, u FROM e),
        |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM sym),
        |l1 AS (SELECT src AS id, lbl FROM (
        |  SELECT s.src, l.lbl, row_number() OVER (PARTITION BY s.src
        |    ORDER BY count(*) DESC, l.lbl) AS rn
        |  FROM sym s JOIN l0 l ON s.dst = l.id GROUP BY s.src, l.lbl)
        |  WHERE rn = 1),
        |l2 AS (SELECT src AS id, lbl FROM (
        |  SELECT s.src, l.lbl, row_number() OVER (PARTITION BY s.src
        |    ORDER BY count(*) DESC, l.lbl) AS rn
        |  FROM sym s JOIN l1 l ON s.dst = l.id GROUP BY s.src, l.lbl)
        |  WHERE rn = 1),
        |l3 AS (SELECT src AS id, lbl FROM (
        |  SELECT s.src, l.lbl, row_number() OVER (PARTITION BY s.src
        |    ORDER BY count(*) DESC, l.lbl) AS rn
        |  FROM sym s JOIN l2 l ON s.dst = l.id GROUP BY s.src, l.lbl)
        |  WHERE rn = 1)
        |SELECT lbl AS community, count(*) AS n_members
        |FROM l3 GROUP BY 1 ORDER BY n_members DESC, community
        |LIMIT 20""".stripMargin,
    // same unrolled 3-round LPA; modularity terms are exact integer
    // numerators over the constant 4m² denominator — one IEEE division
    // per row in both engines, no float accumulation anywhere
    "q_modularity" ->
      """WITH sp AS (SELECT p_partkey FROM part WHERE p_size <= 3),
        |ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |e AS (SELECT u, v FROM (
        |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
        |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2) WHERE w >= 1),
        |sym AS (SELECT u AS src, v AS dst FROM e
        |  UNION ALL SELECT v, u FROM e),
        |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM sym),
        |l1 AS (SELECT src AS id, lbl FROM (
        |  SELECT s.src, l.lbl, row_number() OVER (PARTITION BY s.src
        |    ORDER BY count(*) DESC, l.lbl) AS rn
        |  FROM sym s JOIN l0 l ON s.dst = l.id GROUP BY s.src, l.lbl)
        |  WHERE rn = 1),
        |l2 AS (SELECT src AS id, lbl FROM (
        |  SELECT s.src, l.lbl, row_number() OVER (PARTITION BY s.src
        |    ORDER BY count(*) DESC, l.lbl) AS rn
        |  FROM sym s JOIN l1 l ON s.dst = l.id GROUP BY s.src, l.lbl)
        |  WHERE rn = 1),
        |l3 AS (SELECT src AS id, lbl FROM (
        |  SELECT s.src, l.lbl, row_number() OVER (PARTITION BY s.src
        |    ORDER BY count(*) DESC, l.lbl) AS rn
        |  FROM sym s JOIN l2 l ON s.dst = l.id GROUP BY s.src, l.lbl)
        |  WHERE rn = 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        |deg AS (SELECT x AS id, CAST(count(*) AS BIGINT) AS deg FROM (
        |  SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |ie AS (SELECT la.lbl AS community,
        |    CAST(count(*) AS BIGINT) AS internal_edges
        |  FROM e JOIN l3 la ON e.u = la.id JOIN l3 lb ON e.v = lb.id
        |  WHERE la.lbl = lb.lbl GROUP BY 1),
        |cm AS (SELECT l.lbl AS community,
        |    CAST(count(*) AS BIGINT) AS n_members,
        |    CAST(sum(d.deg) AS BIGINT) AS degree_sum
        |  FROM l3 l JOIN deg d ON l.id = d.id GROUP BY 1),
        |j AS (SELECT c.community, c.n_members, c.degree_sum,
        |    coalesce(i.internal_edges, 0) AS internal_edges,
        |    4 * m.m * coalesce(i.internal_edges, 0) -
        |      c.degree_sum * c.degree_sum AS num
        |  FROM cm c LEFT JOIN ie i USING (community), m),
        |qt AS (SELECT round(CAST(sum(num) AS DOUBLE) /
        |    (4.0 * m.m * m.m), 6) AS q_total FROM j, m GROUP BY m.m)
        |SELECT j.community, j.n_members, j.internal_edges, j.degree_sum,
        |  round(CAST(j.num AS DOUBLE) / (4.0 * m.m * m.m), 6) AS q_c,
        |  qt.q_total
        |FROM j, m, qt
        |ORDER BY j.n_members DESC, j.community
        |LIMIT 10""".stripMargin,
    // independent replay: ENUMERATE the hop-capped shortest walks from
    // the same 6 md5-sampled sources as path arrays and count interior
    // memberships — the walk census the two-pass sigma*P fold must
    // match integer-exactly
    "q_betweenness_approx" ->
      """WITH RECURSIVE sp AS (SELECT p_partkey FROM part WHERE p_size <= 3),
        |ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |e AS (SELECT u, v FROM (
        |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
        |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2) WHERE w >= 1),
        |es AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |srcs AS (SELECT node AS src FROM (SELECT DISTINCT u AS node
        |    FROM es)
        |  ORDER BY md5_number_lower(CAST(node AS VARCHAR))
        |    & 9223372036854775807, node LIMIT 6),
        |reach(src, id, h) AS (
        |  SELECT src, src, 0 FROM srcs
        |  UNION
        |  SELECT r.src, es.v, r.h + 1 FROM reach r JOIN es ON es.u = r.id
        |  WHERE r.h < 4),
        |d AS (SELECT src, id, min(h) AS h FROM reach GROUP BY 1, 2),
        |walks(src, node, path, h) AS (
        |  SELECT src, src, [src], 0 FROM srcs
        |  UNION ALL
        |  SELECT w.src, es.v, list_append(w.path, es.v), w.h + 1
        |  FROM walks w JOIN es ON es.u = w.node
        |  WHERE w.h < 4 AND NOT list_contains(w.path, es.v)),
        |sw AS (SELECT w.src, w.path FROM walks w
        |  JOIN d ON d.src = w.src AND d.id = w.node
        |  WHERE w.h = d.h AND len(w.path) >= 3),
        |i AS (SELECT unnest(path[2:len(path) - 1]) AS node FROM sw)
        |SELECT node, CAST(count(*) AS BIGINT) AS stress
        |FROM i GROUP BY 1
        |ORDER BY stress DESC, node LIMIT 20""".stripMargin,
    // same sampled-BFS relation, folded to the per-node integer
    // (n_src, farness, ecc) triple; closeness is one micro-floored
    // division of identical integers
    "q_closeness_approx" ->
      """WITH RECURSIVE sp AS (SELECT p_partkey FROM part WHERE p_size <= 3),
        |ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |e AS (SELECT u, v FROM (
        |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
        |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2) WHERE w >= 1),
        |es AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |srcs AS (SELECT node AS src FROM (SELECT DISTINCT u AS node
        |    FROM es)
        |  ORDER BY md5_number_lower(CAST(node AS VARCHAR))
        |    & 9223372036854775807, node LIMIT 6),
        |reach(src, id, h) AS (
        |  SELECT src, src, 0 FROM srcs
        |  UNION
        |  SELECT r.src, es.v, r.h + 1 FROM reach r JOIN es ON es.u = r.id
        |  WHERE r.h < 4),
        |d AS (SELECT src, id, min(h) AS h FROM reach GROUP BY 1, 2)
        |SELECT id AS node, CAST(count(*) AS BIGINT) AS n_src,
        |  CAST(sum(h) AS BIGINT) AS farness,
        |  CAST(max(h) AS BIGINT) AS ecc,
        |  floor(CAST(count(*) AS DOUBLE) / sum(h) * 1e6 + 0.5) / 1e6
        |    AS closeness
        |FROM d GROUP BY 1 HAVING sum(h) > 0
        |ORDER BY closeness DESC, node LIMIT 20""".stripMargin,
    "q_harmonic_centrality" ->
      """WITH RECURSIVE sp AS (SELECT p_partkey FROM part WHERE p_size <= 3),
        |ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |e AS (SELECT u, v FROM (
        |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
        |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2) WHERE w >= 1),
        |es AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |srcs AS (SELECT node AS src FROM (SELECT DISTINCT u AS node
        |    FROM es)
        |  ORDER BY md5_number_lower(CAST(node AS VARCHAR))
        |    & 9223372036854775807, node LIMIT 6),
        |reach(src, id, h) AS (
        |  SELECT src, src, 0 FROM srcs
        |  UNION
        |  SELECT r.src, es.v, r.h + 1 FROM reach r JOIN es ON es.u = r.id
        |  WHERE r.h < 4),
        |d AS (SELECT src, id, CAST(min(h) AS BIGINT) AS h
        |  FROM reach GROUP BY 1, 2)
        |SELECT id AS node, CAST(count(*) AS BIGINT) AS n_src,
        |  CAST(min(h) AS BIGINT) AS min_dist,
        |  CAST(sum(1000000 // h) AS BIGINT) AS harm_micro,
        |  CAST(sum(1000000 // h) AS DOUBLE) / 1e6 AS harmonic
        |FROM d WHERE h > 0 GROUP BY 1
        |ORDER BY harm_micro DESC, node LIMIT 20""".stripMargin,
    // exact ntile deciles over (score desc, custkey); census integers;
    // rate/lift as pinned-order IEEE divisions of identical integers
    "q_gains_lift" ->
      """WITH resp AS (SELECT DISTINCT o_custkey FROM orders),
        |sc AS (SELECT c_custkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS score,
        |    CASE WHEN o_custkey IS NULL THEN 0 ELSE 1 END AS r
        |  FROM customer LEFT JOIN resp ON c_custkey = o_custkey),
        |dec AS (SELECT CAST(ntile(10) OVER (ORDER BY score DESC,
        |    c_custkey) AS BIGINT) AS decile, r FROM sc),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(r) AS BIGINT) AS n_resp
        |  FROM dec GROUP BY 1),
        |c AS (SELECT decile, n_cust, n_resp,
        |    CAST(sum(n_cust) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_n,
        |    CAST(sum(n_resp) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_resp,
        |    CAST(sum(n_cust) OVER () AS BIGINT) AS tot_n,
        |    CAST(sum(n_resp) OVER () AS BIGINT) AS tot_resp
        |  FROM g)
        |SELECT decile, n_cust, n_resp,
        |  floor(CAST(n_resp AS DOUBLE) / n_cust * 1e4 + 0.5) / 1e4
        |    AS resp_rate,
        |  cum_resp,
        |  floor(CAST(cum_resp AS DOUBLE) / cum_n /
        |    (CAST(tot_resp AS DOUBLE) / tot_n) * 1e6 + 0.5) / 1e6
        |    AS cum_lift
        |FROM c ORDER BY decile""".stripMargin,
    "q_bfs_hops" ->
      """WITH RECURSIVE sp AS (SELECT p_partkey FROM part WHERE p_size <= 3),
        |ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |e AS (SELECT u, v FROM (
        |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
        |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2) WHERE w >= 1),
        |s0 AS (SELECT x AS sid FROM (
        |  SELECT x, count(*) AS deg FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1 ORDER BY deg DESC, x LIMIT 1)),
        |reach(id, h) AS (
        |  SELECT sid, 0 FROM s0
        |  UNION
        |  SELECT CASE WHEN e.u = r.id THEN e.v ELSE e.u END, r.h + 1
        |  FROM reach r JOIN e ON e.u = r.id OR e.v = r.id
        |  WHERE r.h < 4),
        |d AS (SELECT id, CAST(min(h) AS INT) AS h FROM reach GROUP BY 1)
        |SELECT h, count(*) AS n_nodes, min(id) AS min_id, max(id) AS max_id
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sssp_weighted" ->
      """WITH RECURSIVE sp AS (SELECT p_partkey FROM part WHERE p_size <= 3),
        |ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |e AS (SELECT a.pk AS u, b.pk AS v, CAST(count(*) AS BIGINT) AS w
        |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 1),
        |s0 AS (SELECT x AS sid FROM (
        |  SELECT x, count(*) AS deg FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1 ORDER BY deg DESC, x LIMIT 1)),
        |walk(id, cost, h) AS (
        |  SELECT sid, CAST(0 AS BIGINT), 0 FROM s0
        |  UNION
        |  SELECT CASE WHEN e.u = r.id THEN e.v ELSE e.u END,
        |    r.cost + e.w, r.h + 1
        |  FROM walk r JOIN e ON e.u = r.id OR e.v = r.id
        |  WHERE r.h < 3)
        |SELECT id, CAST(min(cost) AS BIGINT) AS cost FROM walk
        |GROUP BY 1 ORDER BY id""".stripMargin,
    "q_mann_whitney" ->
      """WITH per AS (SELECT value,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS np_v,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT) AS nc_v
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |    AND value IS NOT NULL GROUP BY 1),
        |r AS (SELECT *, np_v + nc_v AS cnt,
        |    COALESCE(CAST(sum(np_v + nc_v) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cum_before
        |  FROM per),
        |g AS (SELECT CAST(sum(np_v) AS BIGINT) AS n_purchase,
        |    CAST(sum(nc_v) AS BIGINT) AS n_click,
        |    CAST(sum(np_v * (2 * cum_before + cnt + 1)) AS BIGINT)
        |      AS two_r1,
        |    CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term
        |  FROM r),
        |u AS (SELECT *,
        |    (two_r1 - n_purchase * (n_purchase + 1)) / 2.0 AS u_stat,
        |    CAST(n_purchase AS DOUBLE) * n_click / 2.0 AS mu,
        |    round(sqrt(CAST(n_purchase AS DOUBLE) * n_click / 12.0 *
        |      ((n_purchase + n_click + 1) - CAST(tie_term AS DOUBLE) /
        |        ((n_purchase + n_click) * (n_purchase + n_click - 1.0)))),
        |      6) AS sigma
        |  FROM g)
        |SELECT n_purchase, n_click, u_stat, sigma,
        |  round((u_stat - mu) / sigma, 4) AS z_score,
        |  abs(round((u_stat - mu) / sigma, 4)) >= 1.96 AS significant
        |FROM u""".stripMargin,
    "q_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
        |    CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1
        |      AS BIGINT) AS mth,
        |    o_totalprice FROM orders),
        |c AS (SELECT o_custkey, min(mth) AS cohort_mth FROM o GROUP BY 1),
        |sz AS (SELECT cohort_mth, CAST(count(*) AS BIGINT) AS cohort_size
        |  FROM c GROUP BY 1),
        |cells AS (SELECT cohort_mth, mth - cohort_mth AS mth_offset,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS rev_cents
        |  FROM o JOIN c USING (o_custkey) GROUP BY 1, 2),
        |cc AS (SELECT *, rev_cents / 100.0 AS rev FROM cells),
        |cum AS (SELECT *, CAST(sum(rev_cents) OVER (PARTITION BY
        |    cohort_mth ORDER BY mth_offset ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |  FROM cc)
        |SELECT cohort_mth, mth_offset, rev,
        |  ((2 * cum_cents + cohort_size) // (2 * cohort_size)) / 100.0
        |    AS ltv_per_cust
        |FROM cum JOIN sz USING (cohort_mth)
        |ORDER BY cohort_mth, mth_offset""".stripMargin,
    "q_inventory_balance" ->
      """WITH mv AS (SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CASE WHEN l_returnflag IN ('A', 'R')
        |      THEN l_quantity ELSE -l_quantity END) AS BIGINT) AS net
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT *,
        |    CAST(sum(net) OVER w AS BIGINT) AS cum
        |  FROM mv WINDOW w AS (PARTITION BY l_partkey ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |b AS (SELECT *,
        |    cum - least(CAST(0 AS BIGINT), CAST(min(cum) OVER w
        |      AS BIGINT)) AS balance
        |  FROM c WINDOW w AS (PARTITION BY l_partkey ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_days,
        |  max(balance) AS peak_balance,
        |  max_by(balance, day) AS end_balance,
        |  CAST(sum(CASE WHEN balance = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_stockout_days
        |FROM b GROUP BY 1 ORDER BY l_partkey""".stripMargin,
    "q_ab_ztest" ->
      """WITH per AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value >= 200
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |g AS (SELECT
        |  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END)
        |    AS BIGINT) AS conv_a,
        |  CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN user_id % 2 <> 0 THEN conv ELSE 0 END)
        |    AS BIGINT) AS conv_b
        |  FROM per),
        |p AS (SELECT *,
        |  round(conv_a / CAST(n_a AS DOUBLE), 6) AS p_a,
        |  round(conv_b / CAST(n_b AS DOUBLE), 6) AS p_b,
        |  round((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE), 6) AS p_pool
        |  FROM g),
        |z AS (SELECT *,
        |  round((p_a - p_b) / sqrt(p_pool * (1 - p_pool) *
        |    (1.0 / n_a + 1.0 / n_b)), 4) AS z_score FROM p)
        |SELECT n_a, conv_a, n_b, conv_b, p_a, p_b, p_pool, z_score,
        |  abs(z_score) >= 1.96 AS significant
        |FROM z""".stripMargin,
    "q_benford_audit" ->
      """WITH dig AS (SELECT
        |    CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INT) AS digit,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT digit, n,
        |    CAST(sum(n) OVER () AS DOUBLE) AS td FROM dig),
        |b AS (SELECT *,
        |  round(n / td, 6) AS obs_pct,
        |  round(log10(1 + 1.0 / digit), 6) AS benford_pct FROM t)
        |SELECT digit, n, obs_pct, benford_pct,
        |  round(sum(pow(n - benford_pct * td, 2) /
        |    (benford_pct * td)) OVER (), 4) AS chi2
        |FROM b ORDER BY digit""".stripMargin,
    "q_chi_square" ->
      """WITH cell AS (SELECT event_type, isodow(ts) >= 6 AS is_weekend,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |dims AS (SELECT CAST((count(DISTINCT event_type) - 1) *
        |    (count(DISTINCT is_weekend) - 1) AS BIGINT) AS df
        |  FROM cell),
        |t AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS total,
        |    round(CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) *
        |      sum(n) OVER (PARTITION BY is_weekend) /
        |      sum(n) OVER (), 6) AS expected
        |  FROM cell),
        |c AS (SELECT *,
        |    round(pow(n - expected, 2) / expected, 4) AS contrib FROM t),
        |x AS (SELECT *, round(sum(contrib) OVER (), 4) AS chi2 FROM c)
        |SELECT event_type, is_weekend, n, expected, contrib, chi2, df,
        |  round(sqrt(chi2 / total), 4) AS cramers_v
        |FROM x, dims ORDER BY event_type, is_weekend""".stripMargin,
    "q_welch_ttest" ->
      """WITH v AS (SELECT (user_id % 2) = 0 AS in_a, value FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL),
        |g AS (SELECT
        |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    round(sum(CASE WHEN in_a THEN value ELSE 0 END), 2) AS s_a,
        |    round(sum(CASE WHEN in_a THEN value * value ELSE 0 END), 1)
        |      AS ss_a,
        |    CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    round(sum(CASE WHEN NOT in_a THEN value ELSE 0 END), 2)
        |      AS s_b,
        |    round(sum(CASE WHEN NOT in_a THEN value * value ELSE 0 END),
        |      1) AS ss_b
        |  FROM v),
        |m AS (SELECT n_a, n_b,
        |    round(s_a / n_a, 6) AS mean_a, round(s_b / n_b, 6) AS mean_b,
        |    round(ss_a / n_a - (s_a / n_a) * (s_a / n_a), 6) AS var_a,
        |    round(ss_b / n_b - (s_b / n_b) * (s_b / n_b), 6) AS var_b
        |  FROM g),
        |se AS (SELECT *,
        |    round(var_a / n_a + var_b / n_b, 6) AS se2 FROM m),
        |z AS (SELECT *,
        |    round((mean_a - mean_b) / sqrt(se2), 4) AS t_stat,
        |    round(se2 * se2 / (pow(var_a / n_a, 2) / (n_a - 1) +
        |      pow(var_b / n_b, 2) / (n_b - 1)), 2) AS df_welch
        |  FROM se)
        |SELECT n_a, n_b, mean_a, mean_b, var_a, var_b, se2, t_stat,
        |  df_welch, abs(t_stat) >= 1.96 AS significant
        |FROM z""".stripMargin,
    "q_survival_km" ->
      """WITH pe AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(ts_s) AS hz FROM pe),
        |nx AS (SELECT user_id, ts_s, lead(ts_s) OVER (
        |    PARTITION BY user_id ORDER BY ts_s, event_id) AS nxt
        |  FROM pe),
        |lives AS (SELECT
        |    CAST(floor((COALESCE(nxt, hz) - ts_s) / 3600.0) AS BIGINT)
        |      AS t,
        |    nxt IS NOT NULL AS observed
        |  FROM nx, h),
        |byt AS (SELECT t,
        |    CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d_events,
        |    CAST(sum(CASE WHEN NOT observed THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c_censored
        |  FROM lives GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lives),
        |r AS (SELECT t, d_events,
        |    n_total - COALESCE(CAST(sum(d_events + c_censored) OVER (
        |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS at_risk
        |  FROM byt, tot),
        |f AS (SELECT t, at_risk, d_events,
        |    round(1.0 - CAST(d_events AS DOUBLE) / at_risk, 6) AS factor
        |  FROM r WHERE d_events > 0)
        |SELECT t, at_risk, d_events, factor,
        |  CASE WHEN sum(CASE WHEN factor = 0 THEN 1 ELSE 0 END) OVER (
        |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
        |      ROW) > 0 THEN 0.0
        |    ELSE round(exp(sum(round(ln(CASE WHEN factor > 0 THEN factor
        |      END), 8)) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW)), 4) END AS km_survival
        |FROM f ORDER BY t""".stripMargin,
    "q_elasticity" ->
      """WITH li AS (SELECT l_partkey,
        |    round(ln(1.0 - l_discount), 6) AS x,
        |    round(ln(l_quantity), 6) AS y
        |  FROM lineitem),
        |j AS (SELECT p_brand, x, y
        |  FROM li JOIN part ON l_partkey = p_partkey)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
        |  round(regr_slope(y, x), 4) AS elasticity,
        |  round(regr_r2(y, x), 4) AS r2
        |FROM j GROUP BY 1 ORDER BY p_brand""".stripMargin,
    "q_cusum_change" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem GROUP BY 1),
        |st AS (SELECT round(avg(revenue), 6) AS mu,
        |    round(stddev_pop(revenue), 6) AS sigma FROM daily),
        |z AS (SELECT day, revenue,
        |    round((revenue - mu) / sigma, 6) AS zscore,
        |    CAST(round(round((revenue - mu) / sigma, 6) * 1e6, 0)
        |      AS BIGINT) AS micro_z FROM daily, st),
        |c AS (SELECT *, round(CAST(sum(micro_z) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    / 1e6, 4) AS cusum FROM z)
        |SELECT day, revenue, zscore, cusum FROM c
        |ORDER BY abs(cusum) DESC, day LIMIT 10""".stripMargin,
    "q_event_pattern" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |s1 AS (SELECT *, max(CASE WHEN event_type = 'view' THEN ts_s END)
        |    OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_view FROM e),
        |s2 AS (SELECT *, CASE WHEN event_type = 'click'
        |      AND last_view IS NOT NULL AND ts_s >= last_view
        |      AND ts_s <= last_view + 86400
        |      THEN ts_s * 131072 + (ts_s - last_view) END AS click_enc
        |  FROM s1),
        |s3 AS (SELECT *, CAST(max(click_enc) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS best_click FROM s2),
        |m AS (SELECT user_id, ts_s,
        |    best_click // 131072 AS click_ts,
        |    best_click // 131072 - best_click % 131072 AS view_ts
        |  FROM s3 WHERE event_type = 'purchase' AND best_click IS NOT NULL
        |    AND ts_s >= best_click // 131072
        |    AND ts_s <= best_click // 131072 + 86400)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches,
        |  min(ts_s) AS first_match_ts,
        |  min(ts_s - view_ts) AS min_dur_s,
        |  max(ts_s - view_ts) AS max_dur_s
        |FROM m GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q_event_pattern_absence" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |s AS (SELECT *,
        |    max(CASE WHEN event_type = 'view' THEN ts_s END)
        |      OVER w AS last_view,
        |    max(CASE WHEN event_type = 'click' THEN ts_s END)
        |      OVER w AS last_click
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT user_id, ts_s,
        |    (last_view IS NOT NULL AND ts_s - last_view <= 86400
        |     AND (last_click IS NULL OR ts_s - last_click > 86400))
        |      AS organic
        |  FROM s WHERE event_type = 'purchase')
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(CASE WHEN organic THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_organic,
        |  min(CASE WHEN organic THEN ts_s END) AS first_organic_ts
        |FROM m GROUP BY 1 ORDER BY user_id""".stripMargin,
    "dedup_embed_cosine" -> dedupEmbedCosineOracle,
    "stream_dq_quarantine" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |f AS (SELECT *,
        |    (value IS NULL OR value < 0 OR value > 400) AS r1,
        |    (event_type = 'error') AS r2,
        |    (event_type NOT IN
        |      ('view','click','purchase','signup','error')) AS r3,
        |    (ts_s < 1704067200 OR ts_s >= 1706745600) AS r4
        |  FROM e),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM f)
        |SELECT rule_id, n_violations, n_checked FROM (
        |  SELECT 'value_in_band' AS rule_id,
        |    CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violations,
        |    (SELECT total FROM t) AS n_checked FROM f
        |  UNION ALL
        |  SELECT 'no_error_events',
        |    CAST(sum(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT),
        |    (SELECT total FROM t) FROM f
        |  UNION ALL
        |  SELECT 'known_event_type',
        |    CAST(sum(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT),
        |    (SELECT total FROM t) FROM f
        |  UNION ALL
        |  SELECT 'ts_in_era',
        |    CAST(sum(CASE WHEN r4 THEN 1 ELSE 0 END) AS BIGINT),
        |    (SELECT total FROM t) FROM f
        |  UNION ALL
        |  SELECT '_quarantined',
        |    CAST(sum(CASE WHEN r1 OR r2 OR r3 OR r4 THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    (SELECT total FROM t) FROM f
        |  UNION ALL
        |  SELECT '_clean',
        |    CAST(sum(CASE WHEN NOT (r1 OR r2 OR r3 OR r4) THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    (SELECT total FROM t) FROM f)
        |ORDER BY rule_id""".stripMargin,
    "stream_session_native" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch(ts) AS tsec,
        |    lag(epoch(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts, tsec,
        |    CASE WHEN prev IS NULL OR tsec - prev >= 1800.0
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |x AS (
        |  SELECT user_id, ts, tsec,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM s),
        |g AS (
        |  SELECT user_id, count(*) AS n_events,
        |    min(CAST(floor(epoch(ts)) AS BIGINT)) AS start_s,
        |    max(CAST(floor(epoch(ts)) AS BIGINT)) AS end_s,
        |    max(tsec) AS last_t
        |  FROM x GROUP BY user_id, sess_id),
        |wm AS (SELECT max(epoch(ts)) - 600 AS wm FROM events)
        |SELECT user_id, n_events, start_s, end_s
        |FROM g, wm WHERE g.last_t + 1800 < wm.wm
        |ORDER BY user_id, start_s""".stripMargin,
    "stream_chained_windows" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value FROM events),
        |wm AS (SELECT max(ts_s) - 600 AS wm FROM e),
        |b AS (SELECT (ts_s // 300) * 300 AS b_start, event_type,
        |    CAST(count(*) AS BIGINT) AS n5,
        |    round(sum(value), 2) AS v5
        |  FROM e GROUP BY 1, 2),
        |h AS (SELECT (b_start // 3600) * 3600 AS hour_start_s, event_type,
        |    CAST(count(*) AS BIGINT) AS n_buckets,
        |    CAST(sum(n5) AS BIGINT) AS n_events,
        |    round(sum(v5), 2) AS sum_value
        |  FROM b GROUP BY 1, 2)
        |SELECT hour_start_s, event_type, n_buckets, n_events, sum_value
        |FROM h, wm WHERE hour_start_s + 3600 <= wm.wm
        |ORDER BY hour_start_s, event_type""".stripMargin,
    "q_abc_class" ->
      """WITH per AS (SELECT l_partkey,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(14,4)))
        |      AS rev_d
        |  FROM lineitem GROUP BY 1),
        |pc AS (SELECT l_partkey,
        |    CAST(round(rev_d, 2) * 100 AS BIGINT) AS cents FROM per),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM pc),
        |c AS (SELECT cents, total_cents,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_cents
        |  FROM pc, t),
        |cl AS (SELECT cents, total_cents,
        |    CASE WHEN cum_cents * 10 <= total_cents * 7 THEN 'A'
        |      WHEN cum_cents * 20 <= total_cents * 19 THEN 'B'
        |      ELSE 'C' END AS cls
        |  FROM c)
        |SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
        |  round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS class_rev,
        |  round(CAST(sum(cents) AS DOUBLE) / max(total_cents), 4)
        |    AS rev_share
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_spearman" ->
      """WITH per AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1),
        |j AS (SELECT per.o_custkey, rev, c_acctbal
        |  FROM per JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT o_custkey,
        |    row_number() OVER (ORDER BY c_acctbal, o_custkey) AS r_bal,
        |    row_number() OVER (ORDER BY rev, o_custkey) AS r_rev
        |  FROM j)
        |SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |  round(corr(CAST(r_bal AS DOUBLE), CAST(r_rev AS DOUBLE)), 4)
        |    AS spearman_rho
        |FROM r""".stripMargin,
    "q_rolling_median" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT day, revenue,
        |    row_number() OVER (ORDER BY day) AS rn,
        |    round(quantile_cont(revenue, 0.5) OVER (ORDER BY day
        |      ROWS BETWEEN 27 PRECEDING AND CURRENT ROW), 2) AS med28,
        |    round(avg(revenue) OVER (ORDER BY day
        |      ROWS BETWEEN 27 PRECEDING AND CURRENT ROW), 2) AS mean28
        |  FROM daily),
        |f AS (SELECT day, revenue, med28, mean28,
        |    round(mean28 - med28, 2) AS skew_gap
        |  FROM c WHERE rn >= 28)
        |SELECT day, revenue, med28, mean28, skew_gap FROM f
        |ORDER BY abs(skew_gap) DESC, day LIMIT 15""".stripMargin,
    "q_autocorr" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem GROUP BY 1),
        |lg AS (SELECT revenue,
        |    lag(revenue, 1) OVER (ORDER BY day) AS lag1,
        |    lag(revenue, 7) OVER (ORDER BY day) AS lag7,
        |    lag(revenue, 28) OVER (ORDER BY day) AS lag28
        |  FROM daily),
        |u AS (
        |  SELECT 1 AS lag_days, CAST(count(*) AS BIGINT) AS n_pairs,
        |    round(corr(revenue, lag1), 4) AS autocorr
        |  FROM lg WHERE lag1 IS NOT NULL
        |  UNION ALL SELECT 7, CAST(count(*) AS BIGINT),
        |    round(corr(revenue, lag7), 4)
        |  FROM lg WHERE lag7 IS NOT NULL
        |  UNION ALL SELECT 28, CAST(count(*) AS BIGINT),
        |    round(corr(revenue, lag28), 4)
        |  FROM lg WHERE lag28 IS NOT NULL)
        |SELECT lag_days, n_pairs, autocorr FROM u
        |ORDER BY lag_days""".stripMargin,
    "q_rolling_corr" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    round(avg(l_discount), 6) AS avg_disc,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT day, avg_disc, revenue,
        |    row_number() OVER (ORDER BY day) AS rn,
        |    round(corr(avg_disc, revenue) OVER (ORDER BY day
        |      ROWS BETWEEN 27 PRECEDING AND CURRENT ROW), 4) AS corr28
        |  FROM daily)
        |SELECT day, avg_disc, revenue, corr28 FROM c
        |WHERE rn >= 28 AND corr28 IS NOT NULL
        |ORDER BY abs(corr28) DESC, day LIMIT 15""".stripMargin,
    "q_seasonality" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem GROUP BY 1),
        |o AS (SELECT round(avg(revenue), 6) AS mu FROM daily),
        |g AS (SELECT CAST(isodow(day) - 1 AS INT) AS dow,
        |    CAST(count(*) AS BIGINT) AS n_days,
        |    round(avg(revenue), 6) AS dow_avg
        |  FROM daily GROUP BY 1)
        |SELECT dow, n_days, dow_avg, round(dow_avg / mu, 4)
        |  AS seasonal_index
        |FROM g, o ORDER BY dow""".stripMargin,
    // recursive-CTE replay of the Holt-Winters fold, generated from
    // the SAME expression strings as the Spark lambda (HoltWinters.scala)
    "q_holt_winters" -> graft.ops.HoltWinters.oracle,
    // streaming as-of: converges to the batch window formulation —
    // last prior click per purchase in (µs, event_id) order
    "stream_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |w AS (SELECT user_id, event_id, event_type, ts_s,
        |    last_value(CASE WHEN event_type = 'click' THEN ts_s END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS click_ts
        |  FROM e)
        |SELECT user_id, event_id, ts_s,
        |  coalesce(click_ts, -1) AS click_ts_s,
        |  coalesce(ts_s - click_ts, -1) AS lag_s
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,
    // KLL sketch contract: oracle checks the exact quantile values and
    // predicts the rank-error flags TRUE (q_approx_stats pattern —
    // randomized compaction isn't replayable, its guarantee is)
    "q_kll_quantile_merge" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.25), 4)
        |    AS exact_p25,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4)
        |    AS exact_p50,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 4)
        |    AS exact_p90,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.99), 4)
        |    AS exact_p99,
        |  TRUE AS r25_within_2pct, TRUE AS r50_within_2pct,
        |  TRUE AS r90_within_2pct, TRUE AS r99_within_2pct
        |FROM documents""".stripMargin,
    // single-sketch streaming variant: same exact quantiles, same
    // rank-bound flags; no per-source stage so no n_sources column
    "stream_kll_quantiles" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.25), 4)
        |    AS exact_p25,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4)
        |    AS exact_p50,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 4)
        |    AS exact_p90,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.99), 4)
        |    AS exact_p99,
        |  TRUE AS r25_within_2pct, TRUE AS r50_within_2pct,
        |  TRUE AS r90_within_2pct, TRUE AS r99_within_2pct
        |FROM documents""".stripMargin,
    // theta sketches are exact below 2^14 distinct users, so the
    // emitted estimate equals the exact distinct count at gate scales
    "stream_theta_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS est_users,
        |  TRUE AS within_1pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_graph_jaccard" ->
      """WITH sp AS (SELECT p_partkey FROM part WHERE p_size <= 3),
        |ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |e AS (SELECT u, v FROM (
        |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
        |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2) WHERE w >= 1),
        |sym AS (SELECT u AS src, v AS dst FROM e
        |  UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
        |  FROM sym GROUP BY 1),
        |cn AS (SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS common
        |  FROM e JOIN sym a ON a.src = e.u
        |  JOIN sym b ON b.src = e.v AND b.dst = a.dst
        |  GROUP BY 1, 2)
        |SELECT e.u AS id_a, e.v AS id_b,
        |  COALESCE(cn.common, 0) AS common,
        |  da.deg AS deg_a, db.deg AS deg_b,
        |  round(COALESCE(cn.common, 0) /
        |    CAST(da.deg + db.deg - COALESCE(cn.common, 0) AS DOUBLE), 6)
        |    AS jaccard
        |FROM e LEFT JOIN cn ON cn.u = e.u AND cn.v = e.v
        |JOIN deg da ON da.id = e.u
        |JOIN deg db ON db.id = e.v
        |ORDER BY jaccard DESC, id_a, id_b LIMIT 25""".stripMargin,
    "q_funnel_paths" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id) AS rn FROM e),
        |p AS (SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY 1)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users,
        |  min(user_id) AS example_user
        |FROM p GROUP BY 1 ORDER BY n_users DESC, path
        |LIMIT 15""".stripMargin,
    "q_power_users_pareto" ->
      """WITH per AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1),
        |pc AS (SELECT o_custkey,
        |    CAST(round(rev * 100, 0) AS BIGINT) AS cents FROM per),
        |r AS (SELECT o_custkey, cents,
        |    row_number() OVER (ORDER BY cents DESC, o_custkey) AS rnk,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_cents
        |  FROM pc),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(cents) AS BIGINT) AS total_cents FROM pc)
        |SELECT n_customers,
        |  round(CAST(total_cents AS DOUBLE) / 100, 2) AS total_rev,
        |  CAST(min(CASE WHEN cum_cents * 5 >= total_cents * 4 THEN rnk END)
        |    AS INT) AS n_for_80pct,
        |  round(min(CASE WHEN cum_cents * 5 >= total_cents * 4 THEN rnk END)
        |    / CAST(n_customers AS DOUBLE), 4) AS pct_for_80pct,
        |  round(CAST(sum(CASE WHEN rnk <= (n_customers + 9) // 10
        |    THEN cents ELSE 0 END) AS DOUBLE) / total_cents, 4)
        |    AS top_decile_share
        |FROM r, t GROUP BY n_customers, total_cents""".stripMargin,
    "q_histogram_2d" ->
      """SELECT CAST(least(9, floor((l_quantity - 1) / 5)) AS INT)
        |    AS qty_bin,
        |  CAST(least(9, floor(l_discount * 100)) AS INT) AS disc_bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_skyline" ->
      """WITH per AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS rev,
        |    max(CAST(o_orderdate AS DATE)) AS last_day
        |  FROM orders GROUP BY 1),
        |pts AS (SELECT rev, last_day, min(o_custkey) AS example_cust,
        |    CAST(count(*) AS BIGINT) AS n_ties
        |  FROM per GROUP BY 1, 2),
        |sk AS (SELECT *, max(last_day) OVER (
        |    ORDER BY rev DESC, last_day DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |  AS best_prev FROM pts)
        |SELECT rev, last_day, example_cust, n_ties FROM sk
        |WHERE best_prev IS NULL OR last_day > best_prev
        |ORDER BY rev DESC""".stripMargin,
    "q_new_vs_returning" ->
      """WITH daily AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM daily
        |  GROUP BY 1),
        |g AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active,
        |    CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_new
        |  FROM daily JOIN f USING (user_id) GROUP BY 1)
        |SELECT day, n_active, n_new, n_active - n_new AS n_returning,
        |  round(n_new / CAST(n_active AS DOUBLE), 4) AS pct_new
        |FROM g ORDER BY day""".stripMargin,
    "q_ks_test" ->
      """WITH v AS (SELECT event_type, value FROM events
        |  WHERE event_type IN ('purchase', 'click')
        |    AND value IS NOT NULL),
        |per AS (SELECT value,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS np_v,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT) AS nc_v
        |  FROM v GROUP BY 1),
        |t AS (SELECT CAST(sum(np_v) AS BIGINT) AS n_purchase,
        |    CAST(sum(nc_v) AS BIGINT) AS n_click FROM per),
        |c AS (SELECT value,
        |    sum(np_v) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
        |    sum(nc_v) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
        |  FROM per),
        |m AS (SELECT n_purchase, n_click,
        |    round(max(abs(cp / CAST(n_purchase AS DOUBLE) -
        |      cc / CAST(n_click AS DOUBLE))), 4) AS ks_d
        |  FROM c, t GROUP BY 1, 2)
        |SELECT n_purchase, n_click, ks_d,
        |  round(1.358 * sqrt((n_purchase + n_click) /
        |    (CAST(n_purchase AS DOUBLE) * n_click)), 4) AS d_crit,
        |  ks_d > round(1.358 * sqrt((n_purchase + n_click) /
        |    (CAST(n_purchase AS DOUBLE) * n_click)), 4) AS significant
        |FROM m""".stripMargin,
    "q_locf_impute" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    o_orderpriority AS prio,
        |    round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1, 2),
        |spine AS (SELECT day, prio FROM
        |  (SELECT DISTINCT day FROM daily),
        |  (SELECT DISTINCT prio FROM daily)),
        |g AS (SELECT s.day, s.prio, daily.rev,
        |    last_value(daily.rev IGNORE NULLS) OVER (
        |      PARTITION BY s.prio ORDER BY s.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled
        |  FROM spine s LEFT JOIN daily
        |    ON s.day = daily.day AND s.prio = daily.prio)
        |SELECT prio, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(count(rev) AS BIGINT) AS n_observed,
        |  CAST(sum(CASE WHEN rev IS NULL AND filled IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |  CAST(sum(CASE WHEN filled IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_leading,
        |  round(sum(COALESCE(filled, 0)), 2) AS filled_total
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_kcore" ->
      """WITH sp AS (SELECT p_partkey FROM part WHERE p_size <= 3),
        |ls AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |e AS (SELECT u, v FROM (
        |  SELECT a.pk AS u, b.pk AS v, count(*) AS w
        |  FROM ls a JOIN ls b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2) WHERE w >= 1),
        |k1 AS (SELECT id FROM (SELECT id, count(*) AS c FROM (
        |    SELECT u AS id FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1) WHERE c >= 2),
        |f1 AS (SELECT u, v FROM e WHERE u IN (SELECT id FROM k1)
        |  AND v IN (SELECT id FROM k1)),
        |k2 AS (SELECT id FROM (SELECT id, count(*) AS c FROM (
        |    SELECT u AS id FROM f1 UNION ALL SELECT v FROM f1)
        |  GROUP BY 1) WHERE c >= 2),
        |f2 AS (SELECT u, v FROM f1 WHERE u IN (SELECT id FROM k2)
        |  AND v IN (SELECT id FROM k2)),
        |k3 AS (SELECT id FROM (SELECT id, count(*) AS c FROM (
        |    SELECT u AS id FROM f2 UNION ALL SELECT v FROM f2)
        |  GROUP BY 1) WHERE c >= 2),
        |f3 AS (SELECT u, v FROM f2 WHERE u IN (SELECT id FROM k3)
        |  AND v IN (SELECT id FROM k3)),
        |u AS (
        |  SELECT 1 AS iter,
        |    (SELECT CAST(count(DISTINCT id) AS BIGINT) FROM (
        |      SELECT u AS id FROM f1 UNION ALL SELECT v FROM f1))
        |      AS n_nodes,
        |    (SELECT CAST(count(*) AS BIGINT) FROM f1) AS n_edges
        |  UNION ALL SELECT 2,
        |    (SELECT CAST(count(DISTINCT id) AS BIGINT) FROM (
        |      SELECT u AS id FROM f2 UNION ALL SELECT v FROM f2)),
        |    (SELECT CAST(count(*) AS BIGINT) FROM f2)
        |  UNION ALL SELECT 3,
        |    (SELECT CAST(count(DISTINCT id) AS BIGINT) FROM (
        |      SELECT u AS id FROM f3 UNION ALL SELECT v FROM f3)),
        |    (SELECT CAST(count(*) AS BIGINT) FROM f3))
        |SELECT iter, n_nodes, n_edges FROM u ORDER BY iter""".stripMargin,
    "dedup_passage" ->
      """WITH toks AS (SELECT doc_id, source,
        |    string_split(text, ' ') AS t FROM documents),
        |pass AS (SELECT doc_id, source, i AS pidx,
        |    array_to_string(t[i * 10 + 1 : i * 10 + 10], ' ') AS passage
        |  FROM toks, unnest(range(CAST(ceil(len(t) / 10.0) AS BIGINT)))
        |    AS r(i)),
        |rk AS (SELECT source,
        |    row_number() OVER (PARTITION BY md5_number_lower(passage)
        |      ORDER BY doc_id, pidx) AS rn
        |  FROM pass),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_passages,
        |    CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dup_passages
        |  FROM rk GROUP BY 1)
        |SELECT source, n_passages, n_dup_passages,
        |  round(n_dup_passages / CAST(n_passages AS DOUBLE), 4)
        |    AS dup_frac
        |FROM g ORDER BY source""".stripMargin,
    "q_rank_movers" ->
      """WITH rev AS (SELECT p_name, year(l_shipdate) AS yr,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE year(l_shipdate) IN (1996, 1997)
        |  GROUP BY 1, 2),
        |rk AS (SELECT p_name, yr, rev,
        |    CAST(row_number() OVER (PARTITION BY yr
        |      ORDER BY rev DESC, p_name) AS INT) AS rnk FROM rev)
        |SELECT a.p_name, a.rnk AS rank_1996, a.rev AS rev_1996,
        |  b.rnk AS rank_1997, b.rev AS rev_1997,
        |  a.rnk - b.rnk AS delta
        |FROM rk a JOIN rk b ON a.p_name = b.p_name
        |  AND a.yr = 1996 AND b.yr = 1997
        |ORDER BY abs(a.rnk - b.rnk) DESC, a.p_name
        |LIMIT 10""".stripMargin,
    "q_decay_score" ->
      """WITH o AS (SELECT o_custkey, o_totalprice,
        |    CAST(o_orderdate AS DATE) AS day FROM orders),
        |a AS (SELECT max(day) AS max_day FROM o),
        |w AS (SELECT o_custkey,
        |    o_totalprice * pow(0.5,
        |      date_diff('day', day, max_day) / 180.0) AS w
        |  FROM o, a)
        |SELECT o_custkey, round(sum(w), 2) AS decayed_value,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM w GROUP BY 1
        |ORDER BY decayed_value DESC, o_custkey LIMIT 15""".stripMargin,
    "q_inter_arrival" ->
      """WITH e AS (SELECT event_type, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |g AS (SELECT event_type,
        |    ts_s - lag(ts_s, 1) OVER (PARTITION BY event_type
        |      ORDER BY ts_s, event_id) AS gap_s
        |  FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |  round(quantile_cont(gap_s, 0.5), 2) AS p50_gap_s,
        |  round(quantile_cont(gap_s, 0.9), 2) AS p90_gap_s,
        |  max(gap_s) AS max_gap_s
        |FROM g WHERE gap_s IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rolling_wau" ->
      """WITH daily AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM daily),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
        |  FROM daily GROUP BY 1),
        |wau AS (SELECT s.day, CAST(count(DISTINCT u.user_id) AS BIGINT)
        |    AS wau
        |  FROM days s JOIN daily u
        |    ON date_diff('day', u.day, s.day) BETWEEN 0 AND 6
        |  GROUP BY 1)
        |SELECT day, dau, wau,
        |  round(dau / CAST(wau AS DOUBLE), 4) AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    "q_conversion_lag" ->
      """WITH fv AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view'
        |      THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS first_view
        |  FROM events GROUP BY 1),
        |fp AS (SELECT e.user_id, fv.first_view,
        |    min(CAST(floor(epoch(ts)) AS BIGINT)) AS first_purchase
        |  FROM events e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'purchase' AND fv.first_view IS NOT NULL
        |    AND CAST(floor(epoch(ts)) AS BIGINT) >= fv.first_view
        |  GROUP BY 1, 2),
        |l AS (SELECT first_purchase - first_view AS lag_s FROM fp)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  round(quantile_cont(lag_s, 0.5), 2) AS p50_lag_s,
        |  round(quantile_cont(lag_s, 0.9), 2) AS p90_lag_s,
        |  round(avg(lag_s), 2) AS mean_lag_s
        |FROM l""".stripMargin,
    "source_csv_quoted" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(o_totalprice), 2) AS total,
        |  CAST(sum(length(o_orderpriority) + 4 +
        |    length(o_orderstatus)) AS BIGINT) AS note_chars,
        |  CAST(count(*) AS BIGINT) AS n_multiline
        |FROM orders""".stripMargin,
    "q_dq_rules" ->
      """WITH li AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS qty,
        |  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS disc
        |  FROM lineitem),
        |cu AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS bal FROM customer),
        |sh AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
        |    AS BIGINT) AS v
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |orph AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
        |    AS n,
        |  CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders)) AS BIGINT) AS v),
        |u AS (
        |  SELECT 'lineitem_qty_leq_45' AS rule_id, n AS n_checked,
        |    qty AS n_violations FROM li
        |  UNION ALL SELECT 'lineitem_discount_range', n, disc FROM li
        |  UNION ALL SELECT 'customer_acctbal_nonneg', n, bal FROM cu
        |  UNION ALL SELECT 'lineitem_ship_after_order', n, v FROM sh
        |  UNION ALL SELECT 'lineitem_orphan', n, v FROM orph)
        |SELECT rule_id, n_checked, n_violations,
        |  round(n_violations / CAST(n_checked AS DOUBLE), 6)
        |    AS violation_rate
        |FROM u ORDER BY rule_id""".stripMargin,
    // reciprocal-best-hit linkage: the argmin replays as a windowed
    // row_number with the identical (dist, name) tie order
    "q_mutual_best_match" ->
      """WITH names AS (SELECT p_name, split_part(p_name, ' ', 2) AS block
        |  FROM part GROUP BY 1),
        |pairs AS (
        |  SELECT a.p_name AS na, b.p_name AS nb,
        |    levenshtein(a.p_name, b.p_name) AS dist
        |  FROM names a JOIN names b
        |    ON a.block = b.block AND a.p_name < b.p_name
        |  WHERE levenshtein(a.p_name, b.p_name) <= 4),
        |directed AS (
        |  SELECT na AS src, nb AS dst, dist FROM pairs
        |  UNION ALL SELECT nb, na, dist FROM pairs),
        |best AS (
        |  SELECT src, dst AS best, dist FROM (
        |    SELECT src, dst, dist, row_number() OVER (PARTITION BY src
        |      ORDER BY dist, dst) AS rn FROM directed)
        |  WHERE rn = 1)
        |SELECT x.src AS name_a, y.src AS name_b,
        |  CAST(x.dist AS INTEGER) AS dist
        |FROM best x JOIN best y
        |  ON x.best = y.src AND y.best = x.src AND x.src < y.src
        |ORDER BY name_a""".stripMargin,
    // identical shift/AND/popcount arithmetic both engines — the
    // bitmap compression is exact, so values match bit-for-bit
    "q_bitmap_overlap" ->
      """WITH member AS (
        |  SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS yr, o_custkey
        |  FROM orders),
        |blocks AS (
        |  SELECT yr, o_custkey // 32 AS block,
        |    bit_or(1::BIGINT << CAST(o_custkey % 32 AS INT)) AS bits
        |  FROM member GROUP BY 1, 2),
        |sizes AS (SELECT yr, CAST(count(*) AS BIGINT) AS n
        |  FROM member GROUP BY 1),
        |pair AS (
        |  SELECT a.yr AS yr_a, b.yr AS yr_b,
        |    CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) AS n_overlap
        |  FROM blocks a JOIN blocks b
        |    ON a.block = b.block AND a.yr < b.yr
        |  GROUP BY 1, 2)
        |SELECT p.yr_a, p.yr_b, sa.n AS n_a, sb.n AS n_b, p.n_overlap,
        |  round(CAST(p.n_overlap AS DOUBLE) /
        |    (sa.n + sb.n - p.n_overlap), 6) AS jaccard
        |FROM pair p
        |JOIN sizes sa ON sa.yr = p.yr_a
        |JOIN sizes sb ON sb.yr = p.yr_b
        |ORDER BY p.yr_a, p.yr_b""".stripMargin,
    "q_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_groups,
        |  CAST(sum(n) AS BIGINT) AS total_rows,
        |  CAST(min(n) AS BIGINT) AS min_group_size FROM g),
        |ks AS (SELECT CAST(k AS BIGINT) AS k
        |  FROM (VALUES (2), (5), (10), (25)) t(k)),
        |r AS (SELECT k,
        |    CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
        |      AS groups_at_risk,
        |    CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
        |      AS rows_at_risk
        |  FROM g CROSS JOIN ks GROUP BY k)
        |SELECT r.k, r.groups_at_risk, r.rows_at_risk, t.total_groups,
        |  t.total_rows, t.min_group_size,
        |  round(CAST(r.rows_at_risk AS DOUBLE) / t.total_rows, 6)
        |    AS risk_rate
        |FROM r CROSS JOIN tot t ORDER BY r.k""".stripMargin,
    "q_fd_violations" ->
      """WITH c1 AS (SELECT o_orderkey AS l, o_orderstatus AS r, count(*) AS c
        |    FROM orders GROUP BY 1, 2),
        |c2 AS (SELECT o_custkey AS l, o_orderpriority AS r, count(*) AS c
        |    FROM orders GROUP BY 1, 2),
        |c3 AS (SELECT p_name AS l, p_brand AS r, count(*) AS c
        |    FROM part GROUP BY 1, 2),
        |c4 AS (SELECT p_brand AS l, p_type AS r, count(*) AS c
        |    FROM part GROUP BY 1, 2),
        |c5 AS (SELECT p_type AS l, p_size AS r, count(*) AS c
        |    FROM part GROUP BY 1, 2),
        |c6 AS (SELECT c_nationkey AS l, c_mktsegment AS r, count(*) AS c
        |    FROM customer GROUP BY 1, 2),
        |u AS (
        |  SELECT 'orders:o_orderkey->o_orderstatus' AS fd, l, sum(c) AS rws,
        |    count(*) AS nr, max(c) AS mx FROM c1 GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'orders:o_custkey->o_orderpriority', l, sum(c),
        |    count(*), max(c) FROM c2 GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'part:p_name->p_brand', l, sum(c), count(*), max(c)
        |    FROM c3 GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'part:p_brand->p_type', l, sum(c), count(*), max(c)
        |    FROM c4 GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'part:p_type->p_size', CAST(l AS VARCHAR), sum(c),
        |    count(*), max(c) FROM c5 GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'customer:c_nationkey->c_mktsegment', CAST(l AS VARCHAR),
        |    sum(c), count(*), max(c) FROM c6 GROUP BY 1, 2)
        |SELECT fd, CAST(sum(rws) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_lhs,
        |  CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating,
        |  CAST(sum(rws) - sum(mx) AS BIGINT) AS g3_remove,
        |  round(CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS violation_rate
        |FROM u GROUP BY fd ORDER BY fd""".stripMargin,
    "q_inclusion_deps" ->
      """WITH pairs AS (
        |  SELECT 'orders.o_custkey<customer.c_custkey' AS ind,
        |    count(*) AS n_distinct, count(b._w) AS n_contained
        |  FROM (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS _v
        |      FROM orders WHERE o_custkey IS NOT NULL) a
        |  LEFT JOIN (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS _w
        |      FROM customer WHERE c_custkey IS NOT NULL) b ON a._v = b._w
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey<part.p_partkey',
        |    count(*), count(b._w)
        |  FROM (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS _v
        |      FROM lineitem WHERE l_partkey IS NOT NULL) a
        |  LEFT JOIN (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS _w
        |      FROM part WHERE p_partkey IS NOT NULL) b ON a._v = b._w
        |  UNION ALL
        |  SELECT 'supplier.s_nationkey<nation.n_nationkey',
        |    count(*), count(b._w)
        |  FROM (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS _v
        |      FROM supplier WHERE s_nationkey IS NOT NULL) a
        |  LEFT JOIN (SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS _w
        |      FROM nation WHERE n_nationkey IS NOT NULL) b ON a._v = b._w
        |  UNION ALL
        |  SELECT 'events.user_id<customer.c_custkey',
        |    count(*), count(b._w)
        |  FROM (SELECT DISTINCT CAST(user_id AS BIGINT) AS _v
        |      FROM events WHERE user_id IS NOT NULL) a
        |  LEFT JOIN (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS _w
        |      FROM customer WHERE c_custkey IS NOT NULL) b ON a._v = b._w
        |  UNION ALL
        |  SELECT 'customer.c_custkey<orders.o_custkey',
        |    count(*), count(b._w)
        |  FROM (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS _v
        |      FROM customer WHERE c_custkey IS NOT NULL) a
        |  LEFT JOIN (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS _w
        |      FROM orders WHERE o_custkey IS NOT NULL) b ON a._v = b._w
        |  UNION ALL
        |  SELECT 'part.p_size<nation.n_nationkey',
        |    count(*), count(b._w)
        |  FROM (SELECT DISTINCT CAST(p_size AS BIGINT) AS _v
        |      FROM part WHERE p_size IS NOT NULL) a
        |  LEFT JOIN (SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS _w
        |      FROM nation WHERE n_nationkey IS NOT NULL) b ON a._v = b._w)
        |SELECT ind, CAST(n_distinct AS BIGINT) AS n_distinct,
        |  CAST(n_contained AS BIGINT) AS n_contained,
        |  round(CAST(n_contained AS DOUBLE) / n_distinct, 6) AS containment,
        |  CAST(CASE WHEN n_contained = n_distinct THEN 1 ELSE 0 END
        |    AS BIGINT) AS holds
        |FROM pairs ORDER BY ind""".stripMargin,
    // per-bucket PSI terms fixed to integer nano-nats BEFORE the total
    // fold (the dsir micro-nat trick): ln runs on identical rationals
    // in both engines and the cross-bucket sum is exact Long arithmetic
    "q_psi_drift" ->
      """WITH h AS (
        |  SELECT least(9, n_chars // 64) AS bucket,
        |    CAST(sum(CASE WHEN length(source) = 4 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_ref,
        |    CAST(sum(CASE WHEN length(source) = 4 THEN 0 ELSE 1 END)
        |      AS BIGINT) AS n_tgt
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT sum(n_ref) AS tr, sum(n_tgt) AS tt FROM h),
        |terms AS (
        |  SELECT CAST(bucket AS BIGINT) AS bucket, n_ref, n_tgt,
        |    CAST(round(((n_tgt + 1.0) / (tt + 10) - (n_ref + 1.0) / (tr + 10))
        |      * ln(((n_tgt + 1.0) / (tt + 10)) / ((n_ref + 1.0) / (tr + 10)))
        |      * 1e9) AS BIGINT) AS psi_nano
        |  FROM h CROSS JOIN tot)
        |SELECT bucket, n_ref, n_tgt, psi_nano FROM terms
        |UNION ALL
        |SELECT -1, CAST(sum(n_ref) AS BIGINT), CAST(sum(n_tgt) AS BIGINT),
        |  CAST(sum(psi_nano) AS BIGINT) FROM terms
        |ORDER BY bucket""".stripMargin,
    // both order statistics (median, q-hat) are exact rank selections:
    // the window replay picks the identical k-th value in DuckDB
    "q_conformal_coverage" ->
      """WITH o AS (SELECT o_orderpriority AS prio, o_orderkey,
        |    o_totalprice AS price FROM orders),
        |cal AS (SELECT * FROM o WHERE o_orderkey % 2 = 1),
        |tst AS (SELECT * FROM o WHERE o_orderkey % 2 = 0),
        |calr AS (SELECT prio, price,
        |    row_number() OVER (PARTITION BY prio
        |      ORDER BY price, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY prio) AS n FROM cal),
        |med AS (SELECT prio, price AS med, CAST(n AS BIGINT) AS n_cal
        |  FROM calr WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)),
        |resid AS (SELECT c.prio, c.o_orderkey, abs(c.price - m.med) AS score
        |  FROM cal c JOIN med m ON c.prio = m.prio),
        |residr AS (SELECT prio, score,
        |    row_number() OVER (PARTITION BY prio
        |      ORDER BY score, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY prio) AS n FROM resid),
        |qhat AS (SELECT prio, score AS q_hat FROM residr
        |  WHERE rn = least(CAST(ceil((n + 1) * 0.9) AS BIGINT), n)),
        |cov AS (SELECT t.prio, any_value(m.n_cal) AS n_cal,
        |    CAST(count(*) AS BIGINT) AS n_test,
        |    any_value(m.med) AS med, any_value(q.q_hat) AS q_hat,
        |    CAST(sum(CASE WHEN abs(t.price - m.med) <= q.q_hat
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        |  FROM tst t JOIN med m ON t.prio = m.prio
        |  JOIN qhat q ON t.prio = q.prio
        |  GROUP BY t.prio)
        |SELECT prio, n_cal, n_test, round(med, 2) AS med,
        |  round(q_hat, 2) AS q_hat, n_covered,
        |  round(CAST(n_covered AS DOUBLE) / n_test, 6) AS coverage
        |FROM cov ORDER BY prio""".stripMargin,
    // sweep-line replay: identical event order (date, starts-first,
    // orderkey, linenumber), so every window value matches exactly
    "q_interval_overlap_join" ->
      """WITH li AS (SELECT l_partkey, l_orderkey, l_linenumber,
        |    CAST(l_shipdate AS DATE) AS s,
        |    CAST(l_shipdate AS DATE)
        |      + CAST(l_quantity AS INTEGER) AS e
        |  FROM lineitem),
        |ev AS (
        |  SELECT l_partkey, s AS d, 1 AS is_start, l_orderkey, l_linenumber
        |    FROM li
        |  UNION ALL
        |  SELECT l_partkey, e, 0, l_orderkey, l_linenumber FROM li),
        |sc AS (
        |  SELECT l_partkey, is_start,
        |    coalesce(sum(1 - is_start) OVER (PARTITION BY l_partkey
        |      ORDER BY d, is_start DESC, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS ends_before,
        |    sum(CASE WHEN is_start = 1 THEN 1 ELSE -1 END)
        |      OVER (PARTITION BY l_partkey
        |      ORDER BY d, is_start DESC, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
        |  FROM ev),
        |pp AS (
        |  SELECT l_partkey, sum(is_start) AS n_items,
        |    sum(CASE WHEN is_start = 1 THEN ends_before ELSE 0 END) AS disj,
        |    max(active) AS mc
        |  FROM sc GROUP BY 1)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(n_items) AS BIGINT) AS n_items,
        |  CAST(sum(n_items * (n_items - 1) // 2 - disj) AS BIGINT)
        |    AS n_overlap_pairs,
        |  CAST(max(mc) AS BIGINT) AS max_concurrent
        |FROM pp JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "data_budget_select" ->
      """WITH tk AS (SELECT doc_id, source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |t2 AS (SELECT * FROM tk WHERE tok <> ''),
        |sc AS (SELECT doc_id, source, count(*) AS n_tok,
        |    count(DISTINCT tok) * 10000 // count(*) AS score_bp
        |  FROM t2 GROUP BY 1, 2),
        |b AS (SELECT CAST(sum(n_tok) // 5 AS BIGINT) AS budget FROM sc),
        |r AS (SELECT *, sum(n_tok) OVER (ORDER BY score_bp DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM sc)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN cum <= budget THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_selected,
        |  CAST(sum(n_tok) AS BIGINT) AS tokens_total,
        |  CAST(sum(CASE WHEN cum <= budget THEN n_tok ELSE 0 END)
        |    AS BIGINT) AS tokens_selected,
        |  round(CAST(sum(CASE WHEN cum <= budget THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS selected_share
        |FROM r, b GROUP BY 1 ORDER BY 1""".stripMargin,
    // five exact integer moments; doubles of identical exact longs;
    // IEEE sqrt is correctly rounded (portable, unlike ln)
    "q_assortativity" ->
      """WITH ls AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM ls x JOIN ls y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey < y.l_partkey),
        |e AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
        |dg AS (SELECT a AS node, count(*) AS deg FROM e GROUP BY 1),
        |m AS (SELECT count(*) AS n, sum(da.deg) AS sx, sum(db.deg) AS sy,
        |    sum(da.deg * db.deg) AS sxy, sum(da.deg * da.deg) AS sxx,
        |    sum(db.deg * db.deg) AS syy
        |  FROM e JOIN dg da ON e.a = da.node JOIN dg db ON e.b = db.node)
        |SELECT CAST(n // 2 AS BIGINT) AS n_edges,
        |  floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |    sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
        |      (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
        |    * 1e6 + 0.5) / 1e6 AS assortativity
        |FROM m""".stripMargin,
    // upsert replay: updates overwrite base by key, inserts append;
    // the rebuilt index must serve the post-mutation truth
    "engine_index_rebuild" ->
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |    o_totalprice AS tp FROM orders),
        |upd AS (
        |  SELECT k, 'P' AS st, tp FROM base WHERE k % 5 = 0
        |  UNION ALL
        |  SELECT k + 10000000, 'P', tp FROM base WHERE k % 11 = 0),
        |merged AS (
        |  SELECT * FROM upd
        |  UNION ALL
        |  SELECT * FROM base WHERE k NOT IN (SELECT k FROM upd))
        |SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(tp), 2) AS total_price,
        |  CAST(max(k) AS BIGINT) AS max_key
        |FROM merged WHERE st = 'P'""".stripMargin,
    "q_ab_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |a AS (SELECT (md5_number_lower(CAST(user_id AS VARCHAR))
        |    & 9223372036854775807) % 2 AS arm FROM u),
        |c AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b FROM a),
        |e AS (SELECT n_a, n_b, CAST(n_a + n_b AS DOUBLE) / 2 AS ex FROM c)
        |SELECT n_a, n_b,
        |  floor(((n_a - ex) * (n_a - ex) / ex +
        |    (n_b - ex) * (n_b - ex) / ex) * 1e6 + 0.5) / 1e6 AS chi2,
        |  ((n_a - ex) * (n_a - ex) / ex +
        |    (n_b - ex) * (n_b - ex) / ex) > 6.63 AS srm_detected
        |FROM e""".stripMargin,
    // whole-dollar lattice (cent squares overflow ANSI longs at
    // scale); per-group S^2/n floor-fixed before the exact Long fold
    "q_anova_f" ->
      """WITH g AS (SELECT o_orderpriority AS grp, count(*) AS n,
        |    sum(CAST(round(o_totalprice) AS BIGINT)) AS sx,
        |    sum(CAST(round(o_totalprice) AS BIGINT) *
        |      CAST(round(o_totalprice) AS BIGINT)) AS sxx
        |  FROM orders GROUP BY 1),
        |t AS (SELECT n, sx, sxx,
        |    CAST(floor(CAST(sx AS DOUBLE) * sx / n + 0.5) AS BIGINT)
        |      AS ssq_t FROM g),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS n, sum(sx) AS sx, sum(sxx) AS sxx,
        |    sum(ssq_t) AS ssq FROM t)
        |SELECT k, n,
        |  floor((CAST(ssq AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
        |    / (k - 1) /
        |    ((CAST(sxx AS DOUBLE) - CAST(ssq AS DOUBLE)) / (n - k))
        |    * 1e4 + 0.5) / 1e4 AS f_stat,
        |  ((CAST(ssq AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (k - 1) /
        |    ((CAST(sxx AS DOUBLE) - CAST(ssq AS DOUBLE)) / (n - k)))
        |    > 3.32 AS significant_1pct
        |FROM a""".stripMargin,
    // exact rank-selected p05/p95 cut points; winsorized mean is an
    // exact Long cent sum over one division
    "q_winsorized_stats" ->
      """WITH o AS (SELECT o_orderpriority AS grp, o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (SELECT grp, cents,
        |    row_number() OVER (PARTITION BY grp
        |      ORDER BY cents, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY grp) AS n FROM o),
        |b AS (SELECT grp, CAST(max(n) AS BIGINT) AS n_rows,
        |    max(CASE WHEN rn = greatest(1, CAST(ceil(n * 0.05) AS BIGINT))
        |      THEN cents END) AS lo,
        |    max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT)
        |      THEN cents END) AS hi
        |  FROM r GROUP BY 1),
        |w AS (SELECT o.grp, b.n_rows, b.lo, b.hi,
        |    greatest(b.lo, least(b.hi, o.cents)) AS wv, o.cents
        |  FROM o JOIN b USING (grp))
        |SELECT grp, n_rows, CAST(lo AS DOUBLE) / 100.0 AS p05,
        |  CAST(hi AS DOUBLE) / 100.0 AS p95,
        |  CAST(sum(wv) AS DOUBLE) / (n_rows * 100.0) AS winsorized_mean,
        |  CAST(sum(CASE WHEN wv <> cents THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped,
        |  round(CAST(sum(CASE WHEN wv <> cents THEN 1 ELSE 0 END)
        |    AS DOUBLE) / n_rows, 6) AS clip_share
        |FROM w GROUP BY 1, 2, 3, 4 ORDER BY grp""".stripMargin,
    "source_csv_multiline" ->
      """WITH s AS (SELECT doc_id, lang,
        |    substr(text, 1, 40) || chr(10) || substr(text, 41, 40)
        |      AS snippet
        |  FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN contains(snippet, chr(10)) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_with_newline,
        |  CAST(sum(length(snippet)) AS BIGINT) AS total_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM s""".stripMargin,
    // five exact Long window sums on the 1e-4 lattice; one identical
    // IEEE division per slope, fixed to integer micro-units
    "q_rolling_slope" ->
      """WITH daily AS (SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS x,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS y
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT x, count(*) OVER w AS n, sum(x) OVER w AS sx,
        |    sum(y) OVER w AS sy, sum(x * y) OVER w AS sxy,
        |    sum(x * x) OVER w AS sxx
        |  FROM daily WINDOW w AS (ORDER BY x
        |    ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)),
        |m AS (SELECT x, sy,
        |    CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE) * 100 + 0.5) AS BIGINT)
        |      AS slope_micro
        |  FROM r WHERE n = 30)
        |SELECT x AS day_idx,
        |  CAST(sy AS DOUBLE) / (30 * 10000.0) AS avg_revenue_30d,
        |  slope_micro, slope_micro / 1e6 AS slope
        |FROM m ORDER BY day_idx""".stripMargin,
    // per-dim moment sums are exact lattice Longs; each term is a
    // ratio of exact integers fixed to micro-units before the fold
    "embed_outlier_maha" ->
      """WITH e AS (SELECT vec_id,
        |    unnest(range(0, len(embedding))) AS dim,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings),
        |q AS (SELECT vec_id, dim,
        |    CAST(round(x * 1e4) AS BIGINT) AS qv FROM e),
        |st AS (SELECT dim, count(*) AS n, sum(qv) AS sx,
        |    sum(qv * qv) AS sxx FROM q GROUP BY 1),
        |t AS (SELECT q.vec_id,
        |    CAST(floor(CAST((st.n * q.qv - st.sx) * (st.n * q.qv - st.sx)
        |        AS DOUBLE) /
        |      CAST(st.n * st.sxx - st.sx * st.sx AS DOUBLE) * 1e6 + 0.5)
        |      AS BIGINT) AS t
        |  FROM q JOIN st USING (dim))
        |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
        |  CAST(sum(t) AS BIGINT) AS maha_micro,
        |  CAST(sum(t) AS BIGINT) / 1e6 AS maha_sq
        |FROM t GROUP BY 1
        |ORDER BY maha_micro DESC, vec_id LIMIT 20""".stripMargin,
    "engine_index_lookup" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders
        |WHERE o_orderkey % 20 = 0 AND o_orderstatus = 'P'""".stripMargin,
    "q_bitemporal_asof" ->
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(o_orderdate AS DATE) AS od FROM orders),
        |v AS (
        |  SELECT k, st, cents, od AS valid_from, od AS tx_from FROM base
        |  UNION ALL
        |  SELECT k, st, cents + cents // 10, od + 60, od + 30
        |  FROM base WHERE k % 7 = 0),
        |pick AS (
        |  SELECT '1996-07-01' AS known_at, k, st, cents,
        |    row_number() OVER (PARTITION BY k
        |      ORDER BY valid_from DESC, tx_from DESC) AS rn
        |  FROM v WHERE tx_from <= DATE '1996-07-01'
        |    AND valid_from <= DATE '1996-09-01'
        |  UNION ALL
        |  SELECT '1996-12-01', k, st, cents,
        |    row_number() OVER (PARTITION BY k
        |      ORDER BY valid_from DESC, tx_from DESC)
        |  FROM v WHERE tx_from <= DATE '1996-12-01'
        |    AND valid_from <= DATE '1996-09-01')
        |SELECT known_at, st, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS DOUBLE) / 100.0 AS total
        |FROM pick WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // value-count frames per column; entropy terms in integer
    // micro-nats (PSI trick); doubles render via decimal cast so both
    // engines print identical strings
    "q_column_profile" ->
      """WITH c1 AS (SELECT CAST(c_custkey AS VARCHAR) AS v, count(*) AS c
        |    FROM customer GROUP BY 1),
        |t1 AS (SELECT v FROM c1 ORDER BY c DESC, v DESC LIMIT 1),
        |p1 AS (SELECT 'c_custkey' AS "column",
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN v IS NULL THEN c ELSE 0 END) AS BIGINT)
        |      AS n_null,
        |    CAST(count(v) AS BIGINT) AS n_distinct,
        |    (SELECT v FROM t1) AS top_value,
        |    CAST(max(c) AS BIGINT) AS top_count,
        |    CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / (SELECT sum(c)
        |        FROM c1)) * ln(CAST(c AS DOUBLE) / (SELECT sum(c)
        |        FROM c1)) * 1e6) AS BIGINT)) AS BIGINT) AS entropy_micro
        |  FROM c1),
        |c2 AS (SELECT CAST(c_nationkey AS VARCHAR) AS v, count(*) AS c
        |    FROM customer GROUP BY 1),
        |t2 AS (SELECT v FROM c2 ORDER BY c DESC, v DESC LIMIT 1),
        |p2 AS (SELECT 'c_nationkey' AS "column",
        |    CAST(sum(c) AS BIGINT), CAST(sum(CASE WHEN v IS NULL THEN c
        |      ELSE 0 END) AS BIGINT), CAST(count(v) AS BIGINT),
        |    (SELECT v FROM t2), CAST(max(c) AS BIGINT),
        |    CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / (SELECT sum(c)
        |        FROM c2)) * ln(CAST(c AS DOUBLE) / (SELECT sum(c)
        |        FROM c2)) * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM c2),
        |c3 AS (SELECT c_mktsegment AS v, count(*) AS c
        |    FROM customer GROUP BY 1),
        |t3 AS (SELECT v FROM c3 ORDER BY c DESC, v DESC LIMIT 1),
        |p3 AS (SELECT 'c_mktsegment' AS "column",
        |    CAST(sum(c) AS BIGINT), CAST(sum(CASE WHEN v IS NULL THEN c
        |      ELSE 0 END) AS BIGINT), CAST(count(v) AS BIGINT),
        |    (SELECT v FROM t3), CAST(max(c) AS BIGINT),
        |    CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / (SELECT sum(c)
        |        FROM c3)) * ln(CAST(c AS DOUBLE) / (SELECT sum(c)
        |        FROM c3)) * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM c3),
        |c4 AS (SELECT c_name AS v, count(*) AS c
        |    FROM customer GROUP BY 1),
        |t4 AS (SELECT v FROM c4 ORDER BY c DESC, v DESC LIMIT 1),
        |p4 AS (SELECT 'c_name' AS "column",
        |    CAST(sum(c) AS BIGINT), CAST(sum(CASE WHEN v IS NULL THEN c
        |      ELSE 0 END) AS BIGINT), CAST(count(v) AS BIGINT),
        |    (SELECT v FROM t4), CAST(max(c) AS BIGINT),
        |    CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / (SELECT sum(c)
        |        FROM c4)) * ln(CAST(c AS DOUBLE) / (SELECT sum(c)
        |        FROM c4)) * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM c4),
        |c5 AS (SELECT CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
        |      AS v, count(*) AS c
        |    FROM customer GROUP BY 1),
        |t5 AS (SELECT v FROM c5 ORDER BY c DESC, v DESC LIMIT 1),
        |p5 AS (SELECT 'c_acctbal' AS "column",
        |    CAST(sum(c) AS BIGINT), CAST(sum(CASE WHEN v IS NULL THEN c
        |      ELSE 0 END) AS BIGINT), CAST(count(v) AS BIGINT),
        |    (SELECT v FROM t5), CAST(max(c) AS BIGINT),
        |    CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / (SELECT sum(c)
        |        FROM c5)) * ln(CAST(c AS DOUBLE) / (SELECT sum(c)
        |        FROM c5)) * 1e6) AS BIGINT)) AS BIGINT)
        |  FROM c5)
        |SELECT * FROM p1 UNION ALL SELECT * FROM p2
        |UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
        |UNION ALL SELECT * FROM p5 ORDER BY "column"""".stripMargin,
    "data_group_kfold" ->
      """WITH f AS (SELECT user_id, value,
        |    (md5_number_lower(CAST(user_id AS VARCHAR))
        |      & 9223372036854775807) % 5 AS fold
        |  FROM events),
        |pu AS (SELECT user_id, count(DISTINCT fold) AS nf,
        |    max(fold) AS fold, count(*) AS n, sum(value) AS v
        |  FROM f GROUP BY 1),
        |cr AS (SELECT CAST(sum(CASE WHEN nf > 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_cross_fold_users FROM pu),
        |t AS (SELECT count(*) AS tot FROM f)
        |SELECT CAST(fold AS BIGINT) AS fold,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  round(CAST(sum(n) AS DOUBLE) / t.tot, 6) AS rows_share,
        |  round(sum(v), 2) AS sum_value, cr.n_cross_fold_users
        |FROM pu, t, cr GROUP BY 1, t.tot, cr.n_cross_fold_users
        |ORDER BY 1""".stripMargin,
    // exact integer lattice end-to-end: per-item revenue is exact in
    // 1e-4 units (2dp price x 2dp discount), all sums are order-free
    // longs (float groupBy/segment-tree window sums are NOT portable),
    // doubles only at final divisions of identical rationals
    "q_stl_decompose" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |tr AS (SELECT day, e4, count(*) OVER w AS n7,
        |    sum(e4) OVER w AS s7
        |  FROM daily WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (SELECT day, e4, s7, e4 * 700 - s7 * 100 AS du
        |  FROM tr WHERE n7 = 7),
        |se AS (SELECT CAST(isodow(day) - 1 AS INT) AS dow,
        |    count(*) AS nd, sum(du) AS sdu
        |  FROM det GROUP BY 1)
        |SELECT CAST(det.day AS VARCHAR) AS day,
        |  CAST(det.e4 AS DOUBLE) / 10000.0 AS revenue,
        |  CAST(det.s7 * 100 AS DOUBLE) / 7000000.0 AS trend,
        |  CAST(se.sdu AS DOUBLE) / (se.nd * 7000000.0) AS seasonal,
        |  CAST(det.du AS DOUBLE) / 7000000.0 -
        |    CAST(se.sdu AS DOUBLE) / (se.nd * 7000000.0) AS remainder
        |FROM det JOIN se ON CAST(isodow(det.day) - 1 AS INT) = se.dow
        |ORDER BY day""".stripMargin,
    // slopes as integer micro-units via floor(x*1e6 + 0.5): exactly-
    // rounded IEEE ops, identical both engines (round(x,6) is not)
    "q_theil_sen" ->
      """WITH daily AS (SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS x,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS y_e4
        |  FROM lineitem GROUP BY 1),
        |pairs AS (SELECT a.x AS xa, b.x AS xb,
        |    CAST(floor(CAST((b.y_e4 - a.y_e4) * 100 AS DOUBLE)
        |      / (b.x - a.x) + 0.5) AS BIGINT) AS slope_micro
        |  FROM daily a JOIN daily b ON a.x < b.x),
        |r AS (SELECT slope_micro,
        |    row_number() OVER (ORDER BY slope_micro, xa, xb) AS rn,
        |    count(*) OVER () AS np FROM pairs),
        |m AS (SELECT slope_micro, np FROM r WHERE rn = (np + 1) // 2)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
        |  CAST(m.np AS BIGINT) AS n_pairs, m.slope_micro,
        |  m.slope_micro / 1e6 AS ts_slope
        |FROM m""".stripMargin,
    "source_avro_roundtrip" ->
      """SELECT o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS cents,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "source_fixed_width" ->
      """SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // per-bigram NLLs as integer micro-nats before the per-doc fold
    // (the dsir trick); tokenization mirrors q_hll_merge's oracle
    "text_bigram_ppl" ->
      """WITH tk AS (SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> x <> '') AS t
        |  FROM documents),
        |idx AS (SELECT doc_id, source, t,
        |    unnest(range(1, len(t))) AS i
        |  FROM tk WHERE len(t) >= 2),
        |bg AS (SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
        |  FROM idx),
        |ref AS (SELECT * FROM bg WHERE length(source) = 4),
        |big AS (SELECT w1, w2, count(*) AS c2 FROM ref GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS c1 FROM ref GROUP BY 1),
        |v AS (SELECT count(DISTINCT w2) AS nv FROM ref),
        |sc AS (SELECT t.doc_id, t.source,
        |    CAST(round(-ln((coalesce(big.c2, 0) + 1.0) /
        |      (coalesce(uni.c1, 0) + v.nv)) * 1e6) AS BIGINT) AS nll
        |  FROM (SELECT * FROM bg WHERE length(source) <> 4) t
        |  LEFT JOIN big ON t.w1 = big.w1 AND t.w2 = big.w2
        |  LEFT JOIN uni ON t.w1 = uni.w1
        |  CROSS JOIN v)
        |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(nll) AS BIGINT) AS nll_micro_total,
        |  round(CAST(sum(nll) AS DOUBLE) / count(*) / 1e6, 6) AS avg_nll
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    // nearest pick replayed on identical integer second distances;
    // equal-time purchases land in the backward fill on both sides
    "q_asof_nearest" ->
      """WITH p AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |    arg_max(value, event_id) AS pval
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |e AS (SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |u AS (
        |  SELECT user_id, ts_s AS t, 1 AS side, NULL::BIGINT AS rt,
        |    NULL::DOUBLE AS pv, event_id FROM e
        |  UNION ALL
        |  SELECT user_id, ts_s, 0, ts_s, pval, NULL FROM p),
        |f AS (SELECT *,
        |    last_value(rt IGNORE NULLS) OVER wb AS brt,
        |    last_value(pv IGNORE NULLS) OVER wb AS bpv,
        |    first_value(rt IGNORE NULLS) OVER wf AS frt,
        |    first_value(pv IGNORE NULLS) OVER wf AS fpv
        |  FROM u
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY t, side
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY t, side
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id,
        |  round(CASE WHEN frt IS NULL THEN bpv WHEN brt IS NULL THEN fpv
        |    WHEN t - brt <= frt - t THEN bpv ELSE fpv END, 2)
        |    AS nearest_purchase,
        |  CASE WHEN frt IS NULL THEN t - brt WHEN brt IS NULL THEN t - frt
        |    WHEN t - brt <= frt - t THEN t - brt ELSE t - frt END AS lag_s
        |FROM f WHERE side = 1 ORDER BY event_id""".stripMargin,
    // running-sum interval intersection replay: identical FIFO order
    // (shipdate, orderkey, linenumber), exact integer quantities
    "q_fifo_allocation" ->
      """WITH cum AS (
        |  SELECT l_partkey, l_linestatus,
        |    CAST(l_quantity AS BIGINT) AS q,
        |    sum(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_partkey, l_linestatus
        |      ORDER BY CAST(l_shipdate AS DATE), l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
        |  FROM lineitem),
        |iv AS (SELECT l_partkey, l_linestatus, hi - q AS lo, hi FROM cum),
        |alloc AS (
        |  SELECT f.l_partkey, count(*) AS n_matches,
        |    sum(least(f.hi, o.hi) - greatest(f.lo, o.lo)) AS qty_allocated
        |  FROM (SELECT * FROM iv WHERE l_linestatus = 'F') f
        |  JOIN (SELECT * FROM iv WHERE l_linestatus = 'O') o
        |    ON f.l_partkey = o.l_partkey
        |      AND f.lo < o.hi AND o.lo < f.hi
        |  GROUP BY 1),
        |tot AS (
        |  SELECT l_partkey,
        |    sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS n_lots,
        |    sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS n_issues,
        |    sum(CASE WHEN l_linestatus = 'F' THEN q ELSE 0 END) AS supply,
        |    sum(CASE WHEN l_linestatus = 'O' THEN q ELSE 0 END) AS demand
        |  FROM cum GROUP BY 1)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(t.n_lots) AS BIGINT) AS n_lots,
        |  CAST(sum(t.n_issues) AS BIGINT) AS n_issues,
        |  CAST(sum(coalesce(a.n_matches, 0)) AS BIGINT) AS n_matches,
        |  CAST(sum(coalesce(a.qty_allocated, 0)) AS BIGINT)
        |    AS qty_allocated,
        |  CAST(sum(t.demand - coalesce(a.qty_allocated, 0)) AS BIGINT)
        |    AS qty_unfilled,
        |  CAST(sum(t.supply - coalesce(a.qty_allocated, 0)) AS BIGINT)
        |    AS qty_leftover
        |FROM tot t
        |LEFT JOIN alloc a ON t.l_partkey = a.l_partkey
        |JOIN part ON t.l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the streaming state machine converges to this NOT-EXISTS
    // anti-join: a click is abandoned iff no same-user purchase lands
    // in its (click, click+30min] window
    "stream_abandoned_carts" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |    FROM events),
        |c AS (SELECT user_id, us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, us FROM e WHERE event_type = 'purchase'),
        |ab AS (SELECT c.user_id, c.us FROM c WHERE NOT EXISTS (
        |    SELECT 1 FROM p WHERE p.user_id = c.user_id
        |      AND p.us > c.us AND p.us <= c.us + 1800000000))
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_abandoned,
        |  CAST(min(us // 1000000) AS BIGINT) AS first_abandoned_s,
        |  CAST(max(us // 1000000) AS BIGINT) AS last_abandoned_s
        |FROM ab GROUP BY 1 ORDER BY 1""".stripMargin,
    // OHLC first/last replay as µs-ranked row_number (the
    // latest-per-key tie convention: total order on (us, event_id))
    "q_ohlc_bars" ->
      """WITH e AS (SELECT event_type, value, epoch_us(ts) AS us, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 AS bar
        |  FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY bar, event_type
        |      ORDER BY us, event_id) AS ra,
        |    row_number() OVER (PARTITION BY bar, event_type
        |      ORDER BY us DESC, event_id DESC) AS rz
        |  FROM e)
        |SELECT bar, event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  round(max(CASE WHEN ra = 1 THEN value END), 2) AS open,
        |  round(max(value), 2) AS high, round(min(value), 2) AS low,
        |  round(max(CASE WHEN rz = 1 THEN value END), 2) AS close,
        |  round(sum(value), 2) AS sum_value
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_skew_audit" ->
      """WITH fc1 AS (SELECT l_partkey AS k, count(*) AS c
        |    FROM lineitem GROUP BY 1),
        |dc1 AS (SELECT p_partkey AS k, count(*) AS c2 FROM part GROUP BY 1),
        |a1 AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(max(c) AS BIGINT) AS max_cnt FROM fc1),
        |h1 AS (SELECT CAST(count(*) AS BIGINT) AS n_hot_keys,
        |    CAST(coalesce(sum(c), 0) AS BIGINT) AS hot_rows
        |  FROM fc1, a1 WHERE CAST(c AS DOUBLE) > 10.0 * n_rows / n_keys),
        |e1 AS (SELECT CAST(coalesce(sum(fc1.c * dc1.c2), 0) AS BIGINT)
        |    AS est_join_rows FROM fc1 JOIN dc1 USING (k)),
        |fc2 AS (SELECT l_orderkey AS k, count(*) AS c
        |    FROM lineitem GROUP BY 1),
        |dc2 AS (SELECT o_orderkey AS k, count(*) AS c2
        |    FROM orders GROUP BY 1),
        |a2 AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(max(c) AS BIGINT) AS max_cnt FROM fc2),
        |h2 AS (SELECT CAST(count(*) AS BIGINT) AS n_hot_keys,
        |    CAST(coalesce(sum(c), 0) AS BIGINT) AS hot_rows
        |  FROM fc2, a2 WHERE CAST(c AS DOUBLE) > 10.0 * n_rows / n_keys),
        |e2 AS (SELECT CAST(coalesce(sum(fc2.c * dc2.c2), 0) AS BIGINT)
        |    AS est_join_rows FROM fc2 JOIN dc2 USING (k)),
        |fc3 AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
        |dc3 AS (SELECT c_custkey AS k, count(*) AS c2
        |    FROM customer GROUP BY 1),
        |a3 AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(max(c) AS BIGINT) AS max_cnt FROM fc3),
        |h3 AS (SELECT CAST(count(*) AS BIGINT) AS n_hot_keys,
        |    CAST(coalesce(sum(c), 0) AS BIGINT) AS hot_rows
        |  FROM fc3, a3 WHERE CAST(c AS DOUBLE) > 10.0 * n_rows / n_keys),
        |e3 AS (SELECT CAST(coalesce(sum(fc3.c * dc3.c2), 0) AS BIGINT)
        |    AS est_join_rows FROM fc3 JOIN dc3 USING (k)),
        |u AS (
        |  SELECT 'lineitem.l_partkey*part' AS audit, a1.*, h1.*, e1.*
        |    FROM a1, h1, e1
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey*orders', a2.*, h2.*, e2.*
        |    FROM a2, h2, e2
        |  UNION ALL
        |  SELECT 'events.user_id*customer', a3.*, h3.*, e3.*
        |    FROM a3, h3, e3)
        |SELECT audit, n_keys, n_rows, max_cnt,
        |  round(CAST(n_rows AS DOUBLE) / n_keys, 4) AS avg_cnt,
        |  round(max_cnt * CAST(n_keys AS DOUBLE) / n_rows, 4)
        |    AS skew_ratio,
        |  n_hot_keys,
        |  round(CAST(hot_rows AS DOUBLE) / n_rows, 6) AS hot_rows_share,
        |  est_join_rows
        |FROM u ORDER BY audit""".stripMargin,
    // exact-reach replay (the sketch side is Spark-only; the gate
    // asserts its within-5% flag — the q_hll_merge contract)
    "q_graph_anf" ->
      """WITH custs AS (SELECT c_custkey FROM customer
        |    WHERE c_nationkey = 0),
        |pairs AS (SELECT DISTINCT o_custkey * 2 AS a,
        |    l_suppkey * 2 + 1 AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN custs ON o_custkey = c_custkey),
        |e AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |ex1 AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(sum(r) AS BIGINT) AS exact_reach FROM (
        |    SELECT a, count(DISTINCT b) + 1 AS r FROM e GROUP BY 1)),
        |two AS (SELECT e1.a AS a, e2.b AS b FROM e e1
        |    JOIN e e2 ON e1.b = e2.a
        |  UNION ALL SELECT a, b FROM e),
        |ex2 AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(sum(r) AS BIGINT) AS exact_reach FROM (
        |    SELECT a, count(DISTINCT b) AS r FROM two GROUP BY 1))
        |SELECT CAST(1 AS BIGINT) AS t, n_nodes, exact_reach,
        |  round(CAST(exact_reach AS DOUBLE) / n_nodes, 4) AS avg_reach,
        |  TRUE AS within_5pct FROM ex1
        |UNION ALL
        |SELECT 2, n_nodes, exact_reach,
        |  round(CAST(exact_reach AS DOUBLE) / n_nodes, 4), TRUE FROM ex2
        |ORDER BY t""".stripMargin,
    // pagerank's float-order precedent: per-node sums of identical
    // doubles, rounded to 6 dp only at the final projection
    "q_hits_ranking" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS hub, l_suppkey AS auth
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h0 AS (SELECT DISTINCT hub, 1.0 AS h FROM e),
        |a1r AS (SELECT e.auth, sum(h0.h) AS a FROM e
        |  JOIN h0 USING (hub) GROUP BY 1),
        |a1 AS (SELECT auth, a / (SELECT sum(a) FROM a1r) AS a FROM a1r),
        |h1r AS (SELECT e.hub, sum(a1.a) AS h FROM e
        |  JOIN a1 USING (auth) GROUP BY 1),
        |h1 AS (SELECT hub, h / (SELECT sum(h) FROM h1r) AS h FROM h1r),
        |a2r AS (SELECT e.auth, sum(h1.h) AS a FROM e
        |  JOIN h1 USING (hub) GROUP BY 1),
        |a2 AS (SELECT auth, a / (SELECT sum(a) FROM a2r) AS a FROM a2r),
        |h2r AS (SELECT e.hub, sum(a2.a) AS h FROM e
        |  JOIN a2 USING (auth) GROUP BY 1),
        |h2 AS (SELECT hub, h / (SELECT sum(h) FROM h2r) AS h FROM h2r),
        |a3r AS (SELECT e.auth, sum(h2.h) AS a FROM e
        |  JOIN h2 USING (hub) GROUP BY 1)
        |SELECT auth AS s_suppkey,
        |  round(a / (SELECT sum(a) FROM a3r), 6) AS authority
        |FROM a3r ORDER BY authority DESC, s_suppkey LIMIT 20""".stripMargin,
    "q_fuzzy_join" ->
      """WITH names AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
        |    split_part(p_name, ' ', 2) AS block FROM part GROUP BY 1)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
        |  a.n_parts AS n_a, b.n_parts AS n_b
        |FROM names a JOIN names b
        |  ON a.block = b.block AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 4
        |ORDER BY dist, name_a, name_b""".stripMargin,
    // deletion-neighborhood (SymSpell) blocking replayed in SQL via a
    // lateral generate_series; the census integers (incl. the custkey
    // checksum) value-verify the full lev<=1 pair relation
    "q_edit_distance_join" ->
      """WITH names AS (SELECT c_custkey AS k, c_name AS name FROM customer),
        |keyed AS (
        |  SELECT k, name, name AS key FROM names
        |  UNION ALL
        |  SELECT k, name,
        |    substr(name, 1, i - 1) || substr(name, i + 1) AS key
        |  FROM names, generate_series(1, 64) AS t(i)
        |  WHERE i <= length(name)),
        |cand AS (
        |  SELECT DISTINCT a.k AS ka, a.name AS name_a,
        |    b.k AS kb, b.name AS name_b
        |  FROM keyed a JOIN keyed b
        |    ON a.key = b.key AND a.name < b.name),
        |v AS (SELECT ka, name_a, kb, name_b,
        |    levenshtein(name_a, name_b) AS dist FROM cand)
        |SELECT CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(CASE WHEN dist <= 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pairs,
        |  CAST(count(DISTINCT CASE WHEN dist <= 1 THEN name_a END) +
        |    count(DISTINCT CASE WHEN dist <= 1 THEN name_b END) AS BIGINT)
        |    AS n_linked_names_ub,
        |  CAST(sum(CASE WHEN dist <= 1 THEN ka * 31 + kb END) AS BIGINT)
        |    AS pair_checksum
        |FROM v""".stripMargin,
    // degree-filtered subgraph census per k — exact integer edge and
    // node counts over the same edge relation
    "q_rich_club" ->
      """WITH ls AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM ls x JOIN ls y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey < y.l_partkey),
        |dg AS (SELECT node, count(*) AS dgc FROM
        |  (SELECT a AS node FROM p UNION ALL SELECT b FROM p)
        |  GROUP BY 1),
        |ks AS (SELECT CAST(unnest([4, 8, 16, 32]) AS BIGINT) AS k),
        |t AS (SELECT p.a, p.b, da.dgc AS da, db.dgc AS db
        |  FROM p JOIN dg da ON p.a = da.node JOIN dg db ON p.b = db.node),
        |ek AS (SELECT k, CAST(count(*) AS BIGINT) AS n_edges
        |  FROM t, ks WHERE da > k AND db > k GROUP BY 1),
        |nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM dg, ks WHERE dgc > k GROUP BY 1)
        |SELECT nk.k, nk.n_nodes,
        |  CAST(coalesce(ek.n_edges, 0) AS BIGINT) AS n_edges,
        |  CASE WHEN nk.n_nodes >= 2 THEN
        |    floor(CAST(coalesce(ek.n_edges, 0) AS DOUBLE) * 2 /
        |      (nk.n_nodes * (nk.n_nodes - 1)) * 1e6 + 0.5) / 1e6
        |  END AS phi
        |FROM nk LEFT JOIN ek ON nk.k = ek.k ORDER BY nk.k""".stripMargin,
    // dollar-floored lattice moments; slope signs from doubles of
    // identical exact longs (the assortativity recipe)
    "q_simpson_audit" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100
        |      AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |pts AS (SELECT CAST(c_nationkey AS BIGINT) AS g,
        |    CAST(floor(c_acctbal) AS BIGINT) AS x, y
        |  FROM customer JOIN spend ON c_custkey = o_custkey),
        |pm AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy FROM pts),
        |ps AS (SELECT CAST(sign(CAST(n AS DOUBLE) * sxy -
        |    CAST(sx AS DOUBLE) * sy) AS BIGINT) AS pooled_sign FROM pm),
        |gm AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy FROM pts GROUP BY 1),
        |gs AS (SELECT CAST(sign(CAST(n AS DOUBLE) * sxy -
        |    CAST(sx AS DOUBLE) * sy) AS BIGINT) AS s FROM gm)
        |SELECT ps.pooled_sign,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN gs.s <> ps.pooled_sign THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_reversed,
        |  floor(CAST(sum(CASE WHEN gs.s <> ps.pooled_sign
        |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
        |    AS reversal_share
        |FROM gs, ps GROUP BY ps.pooled_sign""".stripMargin,
    // generator replay of per-frame energies: exact integer sums,
    // islands counted with a lag over the frame order
    "multimodal_audio_vad" ->
      """WITH d AS (SELECT doc_id, 200 + doc_id % 256 AS n
        |    FROM documents),
        |s AS (SELECT doc_id, unnest(range(n)) AS i FROM d),
        |sv AS (SELECT doc_id, i // 40 AS fr,
        |    ((i * 37 + doc_id * 101) % 65536 - 32768) AS v FROM s),
        |f AS (SELECT doc_id, fr, sum(v * v) AS e FROM sv GROUP BY 1, 2),
        |g AS (SELECT doc_id, fr, e > 14300000000 AS sp,
        |    lag(e > 14300000000) OVER (PARTITION BY doc_id ORDER BY fr)
        |      AS psp
        |  FROM f)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(CASE WHEN sp THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_speech,
        |  CAST(sum(CASE WHEN sp AND (psp IS NULL OR NOT psp)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_segments,
        |  floor(CAST(sum(CASE WHEN sp THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) * 1e6 + 0.5) / 1e6 AS speech_ratio
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // identical md5-64 bucket/sign arithmetic both engines; census of
    // exact integers per bucket
    "text_hash_features" ->
      """WITH t AS (SELECT
        |    CAST(md5_number_lower(unnest(
        |      regexp_split_to_array(trim(text), '\s+')))
        |      & 9223372036854775807 AS BIGINT) AS th
        |  FROM documents)
        |SELECT th % 64 AS bucket, CAST(count(*) AS BIGINT)
        |    AS n_occurrences,
        |  CAST(sum(CASE WHEN (th // 64) % 2 = 0 THEN 1 ELSE -1 END)
        |    AS BIGINT) AS signed_sum,
        |  CAST(count(DISTINCT th) AS BIGINT) AS n_tokens
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    // same md5 doc split + token hashing; vocab membership replayed
    // as an anti-join over 8-byte hashes
    "text_oov_rate" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(md5_number_lower(unnest(
        |      regexp_split_to_array(trim(text), '\s+')))
        |      & 9223372036854775807 AS BIGINT) AS th,
        |    (md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 9223372036854775807) % 2 = 0 AS is_train
        |  FROM documents),
        |v AS (SELECT DISTINCT th FROM t WHERE is_train),
        |vz AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size FROM v),
        |val AS (SELECT t.th, v.th IS NOT NULL AS known
        |  FROM t LEFT JOIN v ON t.th = v.th WHERE NOT t.is_train)
        |SELECT vz.vocab_size,
        |  CAST(count(*) AS BIGINT) AS n_val_tokens,
        |  CAST(sum(CASE WHEN known THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_oov,
        |  floor(CAST(sum(CASE WHEN known THEN 0 ELSE 1 END) AS DOUBLE)
        |    / count(*) * 1e6 + 0.5) / 1e6 AS oov_rate
        |FROM val, vz GROUP BY vz.vocab_size""".stripMargin,
    // exact integer cut/volume counts per brand over the same edge
    // relation; phi micro-fixed at the final division
    "q_graph_conductance" ->
      """WITH ls AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM ls x JOIN ls y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey < y.l_partkey),
        |e AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
        |t AS (SELECT e.a, e.b, pa.p_brand AS ba, pb.p_brand AS bb
        |  FROM e JOIN part pa ON e.a = pa.p_partkey
        |  JOIN part pb ON e.b = pb.p_partkey),
        |m AS (SELECT count(*) AS m2 FROM t)
        |SELECT ba AS brand, CAST(count(DISTINCT a) AS BIGINT) AS n_nodes,
        |  CAST(count(*) AS BIGINT) AS volume,
        |  CAST(sum(CASE WHEN ba <> bb THEN 1 ELSE 0 END) AS BIGINT)
        |    AS cut,
        |  floor(CAST(sum(CASE WHEN ba <> bb THEN 1 ELSE 0 END) AS DOUBLE)
        |    / least(count(*), m2 - count(*)) * 1e6 + 0.5) / 1e6 AS phi
        |FROM t, m GROUP BY ba, m2 ORDER BY brand""".stripMargin,
    // recursive CTE carrying the selected set as a list (the MMR
    // recipe): same 4-dp cosines, same argmin/tie rules per round
    "embed_coreset_kcenter" ->
      """WITH RECURSIVE
        |pool AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id % 4 = 0),
        |v AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
        |  unnest(embedding)::DOUBLE AS x FROM pool),
        |nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS nn FROM v GROUP BY 1),
        |ps AS (SELECT a.vec_id AS u, b.vec_id AS v2,
        |    round(sum(a.x * b.x) /
        |      (any_value(na.nn) * any_value(nb.nn)), 4) AS sim
        |  FROM v a JOIN v b ON a.dim = b.dim AND a.vec_id <> b.vec_id
        |  JOIN nrm na ON na.vec_id = a.vec_id
        |  JOIN nrm nb ON nb.vec_id = b.vec_id
        |  GROUP BY 1, 2),
        |sd AS (SELECT min(vec_id) AS s FROM pool),
        |sel AS (
        |  SELECT 1 AS step, (SELECT s FROM sd) AS vid,
        |    [(SELECT s FROM sd)] AS picked, CAST(1.0 AS DOUBLE) AS clo
        |  UNION ALL
        |  SELECT sel.step + 1, nxt.vid, list_append(sel.picked, nxt.vid),
        |    nxt.clo
        |  FROM sel, LATERAL (
        |    SELECT p.u AS vid, max(p.sim) AS clo
        |    FROM ps p
        |    WHERE list_contains(sel.picked, p.v2)
        |      AND NOT list_contains(sel.picked, p.u)
        |    GROUP BY p.u
        |    ORDER BY clo ASC, vid
        |    LIMIT 1) nxt
        |  WHERE sel.step < 8)
        |SELECT CAST(step AS INTEGER) AS rnk, vid AS vec_id,
        |  clo AS closeness
        |FROM sel ORDER BY rnk""".stripMargin,
    // semantic replay of the three patch verbs over the original
    // documents — the Spark side must roundtrip them through real
    // JSON text and land on the same census
    "q_json_patch" ->
      """WITH base AS (SELECT event_id % 3 AS op,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT op, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(CASE WHEN op = 0 THEN coalesce(sum(k * 2), 0)
        |    WHEN op = 1 THEN coalesce(sum(k), 0)
        |    ELSE 0 END AS BIGINT) AS sum_k_after,
        |  CAST(CASE WHEN op = 1 THEN count(*) ELSE 0 END AS BIGINT)
        |    AS n_with_tag
        |FROM base GROUP BY op ORDER BY op""".stripMargin,
    // exact-lattice walk-forward: the x7-scaled MA error keeps every
    // sum an exact long; MAEs are final divisions of identical ints
    "q_forecast_backtest" ->
      """WITH daily AS (SELECT
        |    datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))
        |      AS x,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT x, y,
        |    CAST(sum(y) OVER (ORDER BY x
        |      ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING) AS BIGINT)
        |      AS prev,
        |    CAST(count(*) OVER (ORDER BY x
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS n7,
        |    CAST(sum(y) OVER (ORDER BY x
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s7
        |  FROM daily),
        |er AS (SELECT abs(y - prev) AS e1, abs(y * 7 - s7) AS e7
        |  FROM w WHERE n7 = 7),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_evals,
        |    CAST(sum(e1) AS BIGINT) AS se1, CAST(sum(e7) AS BIGINT) AS se7
        |  FROM er)
        |SELECT n_evals,
        |  floor(CAST(se1 AS DOUBLE) / n_evals / 1e4 * 100 + 0.5) / 100
        |    AS mae_naive,
        |  floor(CAST(se7 AS DOUBLE) / n_evals / 7e4 * 100 + 0.5) / 100
        |    AS mae_ma7,
        |  CAST(se7 AS DOUBLE) / 7 < CAST(se1 AS DOUBLE) AS ma7_wins
        |FROM ag""".stripMargin,
    // naive quadratic neighbor relation + recursive-CTE closure over
    // core-core edges — the independent replay of the full DBSCAN
    "q_dbscan_grid" ->
      """WITH pts AS (SELECT c_custkey AS k,
        |    CAST((md5_number_lower('x' || CAST(c_custkey AS VARCHAR))
        |      & 9223372036854775807) % 4096 AS BIGINT) AS x,
        |    CAST((md5_number_lower('y' || CAST(c_custkey AS VARCHAR))
        |      & 9223372036854775807) % 4096 AS BIGINT) AS y
        |  FROM customer),
        |nv AS (SELECT CAST(8724152 // count(*) AS BIGINT) AS r2 FROM pts),
        |e AS (SELECT a.k AS ka, b.k AS kb
        |  FROM pts a JOIN pts b ON a.k <> b.k, nv
        |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |    <= nv.r2),
        |dg AS (SELECT ka AS k, count(*) AS dgc FROM e GROUP BY 1),
        |core AS (SELECT k FROM dg WHERE dgc >= 3),
        |ce AS (SELECT e.ka AS src, e.kb AS dst FROM e
        |  JOIN core c1 ON e.ka = c1.k JOIN core c2 ON e.kb = c2.k),
        |r AS (
        |  WITH RECURSIVE reach(id, lbl) AS (
        |    SELECT k, k FROM core
        |    UNION
        |    SELECT ce.src, reach.lbl FROM ce
        |      JOIN reach ON ce.dst = reach.id)
        |  SELECT id, min(lbl) AS lbl FROM reach GROUP BY 1),
        |bq AS (SELECT e.ka AS k, min(r.lbl) AS lbl FROM e
        |  JOIN r ON e.kb = r.id
        |  WHERE e.ka NOT IN (SELECT k FROM core) GROUP BY 1),
        |cl AS (SELECT lbl AS cluster_id, count(*) AS n_core
        |  FROM r GROUP BY 1),
        |bc AS (SELECT lbl AS cluster_id, count(*) AS n_border
        |  FROM bq GROUP BY 1),
        |base AS (SELECT cl.cluster_id, cl.n_core,
        |    coalesce(bc.n_border, 0) AS n_border
        |  FROM cl LEFT JOIN bc ON cl.cluster_id = bc.cluster_id),
        |noise AS (SELECT count(*) AS nn FROM pts
        |  WHERE k NOT IN (SELECT k FROM core)
        |    AND k NOT IN (SELECT k FROM bq))
        |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
        |  CAST(n_core AS BIGINT) AS n_core,
        |  CAST(n_border AS BIGINT) AS n_border,
        |  CAST(n_core + n_border AS BIGINT) AS n_total FROM base
        |UNION ALL
        |SELECT -1, 0, 0, CAST(nn AS BIGINT) FROM noise
        |ORDER BY cluster_id""".stripMargin,
    // codec-asserted zstd parquet roundtrip: the reread frame must
    // equal the plain table projection
    "sink_parquet_zstd" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // generator replay of the frame-pair pixel diffs: only the cut
    // transition is nonzero, and its magnitude is the pixel census
    "multimodal_video_scenecut" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w,
        |    8 + (doc_id * 7) % 24 AS h, 2 + doc_id % 3 AS cut
        |  FROM documents),
        |xs AS (SELECT doc_id, w, h, cut, unnest(range(w)) AS i FROM d),
        |ys AS (SELECT doc_id, w, h, cut, i, unnest(range(h)) AS j
        |  FROM xs),
        |px AS (SELECT doc_id, cut,
        |    abs(((i * 31 + j * 17 + doc_id) % 256) -
        |        ((i * 31 + j * 17 + doc_id + 500000) % 256)) AS dd
        |  FROM ys)
        |SELECT doc_id, CAST(6 AS BIGINT) AS n_frames,
        |  CAST(cut AS BIGINT) AS cut_at,
        |  CAST(sum(dd) AS BIGINT) AS max_diff,
        |  CAST(4 AS BIGINT) AS n_static_transitions
        |FROM px GROUP BY doc_id, cut ORDER BY doc_id""".stripMargin,
    // recursive-CTE transitive closure over the same blocked fuzzy
    // pair relation — min-reachable-id labels, the dedup_clusters
    // pattern on the name graph
    "q_entity_clusters" ->
      """WITH names AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
        |    min(p_partkey) AS nid, split_part(p_name, ' ', 2) AS block
        |  FROM part GROUP BY 1),
        |pairs AS (SELECT a.nid AS ia, b.nid AS ib
        |  FROM names a JOIN names b ON a.block = b.block
        |    AND a.p_name < b.p_name
        |    AND levenshtein(a.p_name, b.p_name) <= 4),
        |edges AS (SELECT ia AS src, ib AS dst FROM pairs
        |  UNION SELECT ib, ia FROM pairs),
        |r AS (
        |  WITH RECURSIVE reach(id, lbl) AS (
        |    SELECT nid, nid FROM names
        |    UNION
        |    SELECT e.src, reach.lbl FROM edges e
        |      JOIN reach ON e.dst = reach.id)
        |  SELECT id, min(lbl) AS keeper FROM reach GROUP BY 1),
        |lab AS (SELECT n.p_name, n.n_parts, r.keeper
        |  FROM names n JOIN r ON n.nid = r.id)
        |SELECT k.p_name AS canonical_name,
        |  CAST(count(*) AS BIGINT) AS n_names,
        |  CAST(sum(lab.n_parts) AS BIGINT) AS n_parts
        |FROM lab JOIN names k ON lab.keeper = k.nid
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // one (user,type) span rollup; A-before-B ⟺ min(A) < max(B)
    "q_seq_pattern_mining" ->
      """WITH sp AS (SELECT user_id, event_type,
        |    min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
        |  FROM events GROUP BY 1, 2),
        |u AS (SELECT count(DISTINCT user_id) AS nu FROM sp)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  CAST(count(*) AS BIGINT) AS support,
        |  floor(CAST(count(*) AS DOUBLE) / nu * 1e6 + 0.5) / 1e6 AS share
        |FROM sp a JOIN sp b ON a.user_id = b.user_id
        |  AND a.event_type <> b.event_type AND a.mn < b.mx, u
        |GROUP BY a.event_type, b.event_type, nu
        |ORDER BY type_a, type_b""".stripMargin,
    // the filtered-ANN oracle with the predicate inverted: different-
    // label near neighbors are the hard negatives
    "embed_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS q_id, label AS q_lbl,
        |             embedding AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, label AS c_lbl, embedding AS ce
        |      FROM embeddings),
        |p AS (SELECT q_id, c_id, c_lbl, qe, ce FROM q JOIN c
        |      ON c_id <> q_id AND c_lbl <> q_lbl),
        |z AS (SELECT q_id, c_id, c_lbl, unnest(qe)::DOUBLE AS x,
        |             unnest(ce)::DOUBLE AS y FROM p),
        |sums AS (SELECT q_id, c_id, c_lbl, sum(x*y) AS d,
        |                sum(x*x) AS na, sum(y*y) AS nb
        |         FROM z GROUP BY 1, 2, 3),
        |sc AS (SELECT q_id, c_id, c_lbl,
        |         round(d / (sqrt(na) * sqrt(nb)), 4) AS score FROM sums),
        |r AS (SELECT q_id, c_id, c_lbl, score,
        |        CAST(row_number() OVER (PARTITION BY q_id
        |          ORDER BY score DESC, c_id) AS INTEGER) AS rnk FROM sc)
        |SELECT q_id, rnk, c_id, CAST(c_lbl AS BIGINT) AS label, score
        |FROM r WHERE rnk <= 5 ORDER BY 1, 2""".stripMargin,
    // both the full-dim and the sliced-dim exact rankings replay in
    // SQL; the recall integers are value-verified end to end
    "embed_matryoshka_probe" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS c_id, embedding AS ce FROM embeddings),
        |p AS (SELECT q_id, c_id, qe, ce FROM q JOIN c ON c_id <> q_id),
        |zf AS (SELECT q_id, c_id, unnest(qe)::DOUBLE AS x,
        |             unnest(ce)::DOUBLE AS y FROM p),
        |sf AS (SELECT q_id, c_id, sum(x*y) AS d, sum(x*x) AS na,
        |             sum(y*y) AS nb FROM zf GROUP BY 1, 2),
        |rf AS (SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY round(d / (sqrt(na) * sqrt(nb)), 4) DESC, c_id)
        |      AS rnk FROM sf) WHERE rnk <= 10),
        |zt AS (SELECT q_id, c_id, unnest(qe[1:32])::DOUBLE AS x,
        |             unnest(ce[1:32])::DOUBLE AS y FROM p),
        |st AS (SELECT q_id, c_id, sum(x*y) AS d, sum(x*x) AS na,
        |             sum(y*y) AS nb FROM zt GROUP BY 1, 2),
        |rt AS (SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY round(d / (sqrt(na) * sqrt(nb)), 4) DESC, c_id)
        |      AS rnk FROM st) WHERE rnk <= 10)
        |SELECT rf.q_id AS q_id, CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(CASE WHEN rt.c_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_overlap,
        |  CAST(sum(CASE WHEN rt.c_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS recall
        |FROM rf LEFT JOIN rt ON rf.q_id = rt.q_id AND rf.c_id = rt.c_id
        |GROUP BY rf.q_id ORDER BY q_id""".stripMargin,
    // last-signup replay: live rows are signups with no later
    // tombstone; applied clicks are those after the last signup
    "stream_cdc_apply" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('signup', 'click', 'error')),
        |su AS (SELECT user_id, us, event_id, cents FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY us DESC, event_id DESC) AS rn
        |    FROM e WHERE event_type = 'signup') WHERE rn = 1),
        |dead AS (SELECT DISTINCT su.user_id FROM su JOIN e
        |    ON e.user_id = su.user_id AND e.event_type = 'error'
        |    AND (e.us > su.us
        |      OR (e.us = su.us AND e.event_id > su.event_id))),
        |cl AS (SELECT su.user_id,
        |    CAST(sum(e.cents) AS BIGINT) AS add_cents,
        |    CAST(count(*) AS BIGINT) AS n_applied
        |  FROM su JOIN e ON e.user_id = su.user_id
        |    AND e.event_type = 'click'
        |    AND (e.us > su.us
        |      OR (e.us = su.us AND e.event_id > su.event_id))
        |  GROUP BY 1)
        |SELECT su.user_id AS user_id,
        |  CAST(su.cents + coalesce(cl.add_cents, 0) AS BIGINT) AS v_cents,
        |  CAST(coalesce(cl.n_applied, 0) AS BIGINT) AS n_applied
        |FROM su LEFT JOIN cl ON su.user_id = cl.user_id
        |WHERE su.user_id NOT IN (SELECT user_id FROM dead)
        |ORDER BY user_id""".stripMargin,
    // first-occurrence argmin over the shared shingle CTE under the
    // same md5-64 key the Spark side shuffles
    "text_ngram_novelty" ->
      s"""WITH ${shingleCte("documents")},
        |u AS (SELECT doc_id,
        |    CAST(md5_number_lower(unnest(s)) & 9223372036854775807
        |      AS BIGINT) AS gh
        |  FROM sh WHERE len(s) > 0),
        |f AS (SELECT gh, min(doc_id) AS first_doc FROM u GROUP BY 1)
        |SELECT u.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN f.first_doc = u.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  floor(CAST(sum(CASE WHEN f.first_doc = u.doc_id THEN 1 ELSE 0
        |    END) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS novelty
        |FROM u JOIN f USING (gh)
        |GROUP BY u.doc_id ORDER BY doc_id""".stripMargin,
    // generator-replay of the patch grid: pixel (i,j) lands in tile
    // (j//8, i//8); the position-weighted tile checksum pins content
    // AND grid position of every decoded patch
    "multimodal_image_tiles" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w,
        |    8 + (doc_id * 7) % 24 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS i FROM d),
        |ys AS (SELECT doc_id, w, h, i, unnest(range(h)) AS j FROM xs),
        |px AS (SELECT doc_id, (w + 7) // 8 AS ntx, (h + 7) // 8 AS nty,
        |    (j // 8) AS tr, (i // 8) AS tc,
        |    (i * 31 + j * 17 + doc_id) % 256 AS g
        |  FROM ys),
        |t AS (SELECT doc_id, ntx, nty, tr, tc, sum(g) AS ts
        |  FROM px GROUP BY 1, 2, 3, 4, 5)
        |SELECT doc_id, CAST(ntx AS BIGINT) AS n_tiles_x,
        |  CAST(nty AS BIGINT) AS n_tiles_y,
        |  CAST(ntx * nty AS BIGINT) AS n_tiles,
        |  CAST(sum((tr * ntx + tc + 1) * ts) AS BIGINT) AS tiles_checksum
        |FROM t GROUP BY doc_id, ntx, nty ORDER BY doc_id""".stripMargin,
    // per-node triangle credits from the classic three-way edge join —
    // an independent method for the same integer (tri, deg) relation
    "q_graph_cluster_coeff" ->
      """WITH ls AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM ls x JOIN ls y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey < y.l_partkey),
        |tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |cr AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri),
        |tn AS (SELECT node, count(*) AS n_tri FROM cr GROUP BY 1),
        |dg AS (SELECT node, count(*) AS deg FROM
        |  (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1)
        |SELECT dg.node AS node, CAST(deg AS BIGINT) AS deg,
        |  CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri,
        |  floor(CAST(coalesce(n_tri, 0) * 2 AS DOUBLE) /
        |    (deg * (deg - 1)) * 1e6 + 0.5) / 1e6 AS lcc
        |FROM dg LEFT JOIN tn ON dg.node = tn.node
        |WHERE deg >= 2 ORDER BY node""".stripMargin,
    // exact integer concordance counts; tau-b is one final division of
    // identical integers (sqrt is correctly rounded — portable)
    "q_kendall_tau" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS y_cents
        |  FROM orders GROUP BY 1),
        |pts AS (SELECT c_nationkey AS nation, c_custkey AS k,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS x_cents, y_cents
        |  FROM customer JOIN spend ON c_custkey = o_custkey),
        |pr AS (SELECT p.nation AS nation,
        |    sign(p.x_cents - q.x_cents) AS sx,
        |    sign(p.y_cents - q.y_cents) AS sy
        |  FROM pts p JOIN pts q ON p.nation = q.nation AND p.k < q.k),
        |ag AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nc,
        |    CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nd,
        |    CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
        |    CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
        |  FROM pr GROUP BY 1)
        |SELECT nation, n_pairs, nc, nd,
        |  floor(CAST(nc - nd AS DOUBLE) /
        |    sqrt(CAST((n_pairs - tx) * (n_pairs - ty) AS DOUBLE))
        |    * 1e6 + 0.5) / 1e6 AS tau_b
        |FROM ag ORDER BY nation""".stripMargin,
    // per-user inter-arrival gaps replayed as the batch lag window —
    // the O(1)-state streaming fold must converge to it exactly
    "stream_gap_detect" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |g AS (SELECT user_id,
        |    ts_s - lag(ts_s) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS gap
        |  FROM e)
        |SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
        |  CAST(sum(CASE WHEN gap > 86400 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alerts,
        |  CAST(max(gap) AS BIGINT) AS max_gap_s
        |FROM g GROUP BY user_id
        |HAVING sum(CASE WHEN gap > 86400 THEN 1 ELSE 0 END) >= 1
        |ORDER BY user_id""".stripMargin,
    // the oracle is the NAIVE quadratic radius filter — an independent
    // method whose exact-integer relation the grid-blocked join must
    // reproduce row for row
    "q_grid_distance_join" ->
      """WITH pts AS (SELECT c_custkey AS k,
        |    CAST((md5_number_lower('x' || CAST(c_custkey AS VARCHAR))
        |      & 9223372036854775807) % 4096 AS BIGINT) AS x,
        |    CAST((md5_number_lower('y' || CAST(c_custkey AS VARCHAR))
        |      & 9223372036854775807) % 4096 AS BIGINT) AS y
        |  FROM customer)
        |SELECT a.k AS k_a, b.k AS k_b,
        |  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |    AS BIGINT) AS dist2
        |FROM pts a JOIN pts b ON a.k < b.k
        |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4096
        |ORDER BY dist2, k_a, k_b""".stripMargin,
    "embed_int8_quant" ->
      """WITH v AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings),
        |mm AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM v GROUP BY 1),
        |e AS (SELECT v.dim, lo, hi,
        |    CASE WHEN hi = lo THEN 0.0
        |      ELSE x - (lo + round((x - lo) / ((hi - lo) / 255)) *
        |        ((hi - lo) / 255)) END AS err
        |  FROM v JOIN mm USING (dim))
        |SELECT CAST(dim AS BIGINT) AS dim, round(lo, 6) AS lo,
        |  round(hi, 6) AS hi, CAST(count(*) AS BIGINT) AS n_vals,
        |  round(avg(err * err) * 1e6, 6) AS mse_ppm,
        |  round(max(abs(err)), 6) AS max_abs_err
        |FROM e GROUP BY dim, lo, hi ORDER BY dim""".stripMargin,
    "q_kmeans" ->
      (kmeansOracleCtes +
      """a2 AS (SELECT vec_id, cid, cos FROM (
        |    SELECT vec_id, cid, cos, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos DESC, cid) AS rn FROM s2)
        |  WHERE rn = 1)
        |SELECT cid AS cluster, count(*) AS n_members, min(vec_id) AS exemplar,
        |  round(avg(cos), 4) AS avg_cos
        |FROM a2 GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_silhouette" ->
      (kmeansOracleCtes +
      """rk2 AS (SELECT vec_id, cid, cos, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM s2),
        |per AS (SELECT vec_id,
        |    max(CASE WHEN rn = 1 THEN cid END) AS cid,
        |    max(CASE WHEN rn = 1 THEN cos END) AS cos_own,
        |    max(CASE WHEN rn = 2 THEN cos END) AS cos_2nd
        |  FROM rk2 WHERE rn <= 2 GROUP BY 1),
        |s6 AS (SELECT cid, CAST(round(CASE
        |    WHEN greatest(1 - cos_own, 1 - cos_2nd) = 0 THEN 0.0
        |    ELSE ((1 - cos_2nd) - (1 - cos_own))
        |      / greatest(1 - cos_own, 1 - cos_2nd) END * 1e6)
        |    AS BIGINT) AS s6
        |  FROM per)
        |SELECT cid AS cluster, CAST(count(*) AS BIGINT) AS n_members,
        |  floor(CAST(sum(s6) AS DOUBLE) / count(*) / 1e6 * 1e6 + 0.5)
        |    / 1e6 AS avg_silhouette
        |FROM s6 GROUP BY 1 ORDER BY 1""".stripMargin),
    "embed_pca_power" ->
      """WITH v AS (
        |  SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
        |    unnest(embedding)::DOUBLE AS x
        |  FROM embeddings),
        |mu AS (SELECT dim, round(avg(x), 6) AS mu FROM v GROUP BY 1),
        |cen AS (SELECT v.vec_id, v.dim, v.x - mu.mu AS xc
        |  FROM v JOIN mu USING (dim)),
        |cov AS (SELECT a.dim AS di, b.dim AS dj,
        |    round(avg(a.xc * b.xc), 6) AS cv
        |  FROM cen a JOIN cen b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        |b0 AS (SELECT dim AS bdim, 0.125 AS bv FROM mu),
        |r1 AS (SELECT di, sum(cv * b0.bv) AS raw
        |  FROM cov JOIN b0 ON dj = bdim GROUP BY 1),
        |n1 AS (SELECT sqrt(sum(raw * raw)) AS nrm FROM r1),
        |b1 AS (SELECT di AS bdim, round(raw / n1.nrm, 6) AS bv FROM r1, n1),
        |r2 AS (SELECT di, sum(cv * b1.bv) AS raw
        |  FROM cov JOIN b1 ON dj = bdim GROUP BY 1),
        |n2 AS (SELECT sqrt(sum(raw * raw)) AS nrm FROM r2),
        |b2 AS (SELECT di AS bdim, round(raw / n2.nrm, 6) AS bv FROM r2, n2),
        |lam AS (SELECT round(sum(bi.bv * cov.cv * bj.bv), 4) AS eigval
        |  FROM cov JOIN b2 bi ON cov.di = bi.bdim
        |    JOIN b2 bj ON cov.dj = bj.bdim)
        |SELECT bdim AS dim, round(bv, 4) AS loading, lam.eigval
        |FROM b2, lam ORDER BY dim""".stripMargin,
    "q_quantile_hist" ->
      """WITH b AS (SELECT l_returnflag, min(l_extendedprice) AS mn,
        |    max(l_extendedprice) AS mx
        |  FROM lineitem GROUP BY 1),
        |binned AS (SELECT l.l_returnflag,
        |    CAST(least(floor((l.l_extendedprice - b.mn) * 100.0 /
        |      (b.mx - b.mn)), 99.0) AS BIGINT) AS bin
        |  FROM lineitem l JOIN b USING (l_returnflag)),
        |h AS (SELECT l_returnflag, bin, count(*) AS n
        |  FROM binned GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, bin, n,
        |    sum(n) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
        |    sum(n) OVER (PARTITION BY l_returnflag) AS total FROM h),
        |e AS (SELECT c.l_returnflag, max(c.total) AS n_rows,
        |    round(any_value(b.mn) +
        |      (min(CASE WHEN cum >= total * 0.5 THEN bin END) + 0.5) *
        |      (any_value(b.mx) - any_value(b.mn)) / 100.0, 4) AS est_p50,
        |    round(any_value(b.mn) +
        |      (min(CASE WHEN cum >= total * 0.99 THEN bin END) + 0.5) *
        |      (any_value(b.mx) - any_value(b.mn)) / 100.0, 4) AS est_p99
        |  FROM c JOIN b USING (l_returnflag) GROUP BY 1),
        |x AS (SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        |    round(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99
        |  FROM lineitem GROUP BY 1)
        |SELECT e.l_returnflag, CAST(e.n_rows AS BIGINT) AS n_rows,
        |  e.est_p50, x.exact_p50, e.est_p99, x.exact_p99
        |FROM e JOIN x USING (l_returnflag) ORDER BY 1""".stripMargin,
    "q_bootstrap_ci" ->
      """WITH li AS (SELECT l_returnflag, l_extendedprice,
        |    l_orderkey || '-' || l_linenumber AS rk FROM lineitem),
        |x AS (SELECT l_returnflag, l_extendedprice, rk,
        |    unnest(range(32)) AS b FROM li),
        |uw AS (SELECT l_returnflag, l_extendedprice, b,
        |    CAST(md5_number_lower(rk || '|' || b) & 1125899906842623
        |      AS DOUBLE) / 1125899906842624.0 AS u
        |  FROM x),
        |ww AS (SELECT l_returnflag, b, l_extendedprice,
        |    CASE WHEN u < 0.36787944117144233 THEN 0.0
        |         WHEN u < 0.7357588823428847 THEN 1.0
        |         WHEN u < 0.9196986029286058 THEN 2.0
        |         WHEN u < 0.9810118431238462 THEN 3.0
        |         ELSE 4.0 END AS w FROM uw),
        |boot AS (SELECT l_returnflag, b,
        |    round(sum(w * l_extendedprice) / sum(w), 6) AS m
        |  FROM ww GROUP BY 1, 2),
        |e AS (SELECT l_returnflag, round(avg(l_extendedprice), 4)
        |    AS mean_exact FROM lineitem GROUP BY 1),
        |s AS (SELECT l_returnflag, count(*) AS n_resamples,
        |    round(avg(m), 4) AS boot_mean,
        |    round(stddev_samp(m), 4) AS boot_se FROM boot GROUP BY 1)
        |SELECT s.l_returnflag, s.n_resamples, e.mean_exact, s.boot_mean,
        |  s.boot_se,
        |  round(s.boot_mean - 2.0 * s.boot_se, 4) AS ci_lo,
        |  round(s.boot_mean + 2.0 * s.boot_se, 4) AS ci_hi
        |FROM s JOIN e USING (l_returnflag) ORDER BY 1""".stripMargin,
    "q_funnel_window" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |t1 AS (SELECT user_id, min(ts_s) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(e.ts_s) AS t_click
        |  FROM e JOIN t1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts_s > t1.t_view
        |    AND e.ts_s <= t1.t_view + 3600 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ts_s) AS t_purchase
        |  FROM e JOIN t2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts_s > t2.t_click
        |    AND e.ts_s <= t2.t_click + 3600 GROUP BY 1)
        |SELECT (SELECT count(*) FROM t1) AS n_view,
        |  (SELECT count(*) FROM t2) AS n_click_1h,
        |  (SELECT count(*) FROM t3) AS n_purchase_1h""".stripMargin,
    "q_mutual_info" ->
      """WITH e AS (SELECT event_type AS x,
        |    (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600 AS y
        |  FROM events),
        |nxy AS (SELECT x, y, count(*) AS nxy FROM e GROUP BY 1, 2),
        |nx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM nxy GROUP BY 1),
        |ny AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM nxy GROUP BY 1),
        |nn AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM nxy),
        |t AS (SELECT
        |    nxy.nxy / nn.n *
        |      (ln(nxy.nxy * nn.n / (nx.nx * ny.ny)) / ln(2)) AS mi_term,
        |    power(nxy.nxy - nx.nx * ny.ny / nn.n, 2) /
        |      (nx.nx * ny.ny / nn.n) AS chi_term,
        |    nn.n AS n
        |  FROM nxy JOIN nx USING (x) JOIN ny USING (y), nn)
        |SELECT CAST(max(n) AS BIGINT) AS n_events, count(*) AS n_cells,
        |  round(sum(mi_term), 6) AS mi_bits,
        |  round(sum(chi_term), 4) AS chi2
        |FROM t""".stripMargin,
    "q_scd2_lookup" ->
      """WITH e AS (SELECT user_id, event_type, event_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events
        |  WHERE user_id < 10),
        |dim AS (SELECT user_id, event_type AS attr, ts_s AS valid_from_s,
        |    coalesce(lead(ts_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id), 9999999999) AS valid_to_s
        |  FROM e WHERE event_type <> 'purchase'),
        |f AS (SELECT user_id, ts_s, value FROM e
        |  WHERE event_type = 'purchase')
        |SELECT dim.attr, count(*) AS n_purchases,
        |  round(sum(f.value), 2) AS revenue
        |FROM f JOIN dim ON f.user_id = dim.user_id
        |  AND f.ts_s >= dim.valid_from_s AND f.ts_s < dim.valid_to_s
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_zipf_slope" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM tok
        |  WHERE token <> '' GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    count(*) AS vocab_size FROM c),
        |top AS (SELECT cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, token) AS DOUBLE)
        |      AS rnk
        |  FROM c ORDER BY cnt DESC, token LIMIT 100),
        |f AS (SELECT round(regr_slope(ln(cnt), ln(rnk)), 4) AS zipf_slope,
        |    round(regr_r2(ln(cnt), ln(rnk)), 4) AS fit_r2 FROM top)
        |SELECT t.n_tokens, t.vocab_size, f.zipf_slope, f.fit_r2
        |FROM t, f""".stripMargin,
    "stream_histogram" ->
      """SELECT event_type,
        |  CAST(least(floor(value / 30.0), 19.0) AS BIGINT) AS bin,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_topk" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS INTEGER) AS rnk
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, rnk, event_id, round(value, 2) AS value
        |FROM r WHERE rnk <= 5
        |ORDER BY event_type, rnk""".stripMargin,
    "stream_anomaly" ->
      """WITH e AS (SELECT event_type, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value
        |  FROM events WHERE value IS NOT NULL),
        |w AS (SELECT *,
        |    count(*) OVER win AS n_prior,
        |    sum(value) OVER win AS sum_prior,
        |    sum(value * value) OVER win AS sumsq_prior
        |  FROM e WINDOW win AS (PARTITION BY event_type
        |    ORDER BY ts_s, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |f AS (SELECT event_type, event_id, value,
        |    sum_prior / n_prior AS mean,
        |    sqrt(greatest(sumsq_prior / n_prior -
        |      (sum_prior / n_prior) * (sum_prior / n_prior), 0)) AS sd
        |  FROM w WHERE n_prior >= 30)
        |SELECT event_type, event_id, value,
        |  round((value - mean) / sd, 4) AS zscore
        |FROM f WHERE sd > 0 AND abs(value - mean) > 3 * sd
        |ORDER BY event_type, event_id""".stripMargin,
    "multimodal_phash_dedup" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(range(length(text))) AS i
        |  FROM documents),
        |bysum AS (
        |  SELECT doc_id, i % 16 AS j,
        |    sum(ascii(substr(text, CAST(i + 1 AS INTEGER), 1))) AS sb
        |  FROM pos GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.doc_id, r.j FROM documents d
        |  CROSS JOIN (SELECT unnest(range(16)) AS j) r),
        |f AS (
        |  SELECT g.doc_id, g.j,
        |    CAST(CAST(coalesce(b.sb, 0) / 255.0 AS REAL) AS DOUBLE) AS fv
        |  FROM grid g LEFT JOIN bysum b
        |    ON b.doc_id = g.doc_id AND b.j = g.j),
        |m AS (SELECT j, round(avg(fv), 6) AS mu FROM f GROUP BY 1),
        |bits AS (SELECT f.doc_id, f.j,
        |    CASE WHEN f.fv > m.mu THEN 1 ELSE 0 END AS bit
        |  FROM f JOIN m USING (j)),
        |codes AS (SELECT doc_id,
        |    CAST(sum(bit * power(2, j)) AS BIGINT) AS code
        |  FROM bits GROUP BY 1),
        |ch AS (SELECT doc_id, code, c,
        |    CAST(floor(code / power(2, c * 4)) AS BIGINT) % 16 AS cv
        |  FROM codes CROSS JOIN (SELECT unnest(range(4)) AS c) r),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(bit_count(xor(a.code, b.code)) AS BIGINT) AS hamming
        |  FROM ch a JOIN ch b
        |    ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 3
        |ORDER BY hamming, doc_a, doc_b LIMIT 100""".stripMargin,
    "source_csv_malformed" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(CASE WHEN o_orderkey % 10 <> 0 THEN 1 END) AS BIGINT)
        |    AS n_good,
        |  CAST(count(CASE WHEN o_orderkey % 10 = 0 THEN 1 END) AS BIGINT)
        |    AS n_corrupt,
        |  round(sum(CASE WHEN o_orderkey % 10 <> 0
        |    THEN round(o_totalprice, 2) END), 2) AS clean_revenue
        |FROM orders""".stripMargin,
    "source_json_malformed" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(CASE WHEN o_orderkey % 10 <> 0 THEN 1 END) AS BIGINT)
        |    AS n_good,
        |  CAST(count(CASE WHEN o_orderkey % 10 = 0 THEN 1 END) AS BIGINT)
        |    AS n_corrupt,
        |  round(sum(CASE WHEN o_orderkey % 10 <> 0
        |    THEN round(o_totalprice, 2) END), 2) AS clean_revenue
        |FROM orders""".stripMargin,
    "source_json_gzip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "source_json_lz4" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "text_lm_score" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM tk
        |      WHERE tok <> '' GROUP BY 1, 2),
        |f AS (SELECT tok, sum(c) AS f FROM c GROUP BY 1),
        |n AS (SELECT sum(c) AS n FROM c)
        |SELECT c.doc_id, CAST(sum(c.c) AS BIGINT) AS n_tokens,
        |  round(sum(c.c * -log2(f.f / n.n)) / sum(c.c), 4) AS lm_bits
        |FROM c JOIN f USING (tok) CROSS JOIN n
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.Example'
        |                ELSE 'https://www.example' END,
        |      CAST(doc_id % 50 AS VARCHAR), '.COM:443/items/',
        |      CAST(doc_id % 20 AS VARCHAR),
        |      CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
        |      '?utm_source=feed&b=2&id=', CAST(doc_id % 10 AS VARCHAR),
        |      '&a=1',
        |      CASE WHEN doc_id % 3 = 0 THEN '#section' ELSE '' END) AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM u),
        |s2 AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    lower(regexp_extract(nf, '^[^?]*', 0)), ':443', ''),
        |    '/$', '') AS base,
        |  regexp_extract(nf, '\?(.*)$', 1) AS q FROM s1),
        |s3 AS (SELECT doc_id, concat(base, '?',
        |  array_to_string(list_sort(list_filter(string_split(q, '&'),
        |    p -> p NOT LIKE 'utm_%')), '&')) AS canon FROM s2)
        |SELECT canon, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS keeper
        |FROM s3 GROUP BY canon ORDER BY canon""".stripMargin,
    "pipeline_clean_funnel" ->
      """WITH s1 AS (SELECT doc_id, lang, text, n_chars FROM documents),
        |s2 AS (SELECT doc_id, text, n_chars FROM s1 WHERE lang = 'en'),
        |s3 AS (SELECT doc_id, text FROM s2
        |  WHERE n_chars >= 150 AND
        |    CAST(len(list_distinct(regexp_split_to_array(trim(text),
        |      '\s+'))) AS BIGINT) * 1000 //
        |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |      AS BIGINT) >= 400),
        |s4 AS (SELECT doc_id, text FROM (
        |    SELECT doc_id, text, row_number() OVER (
        |      PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM s3) WHERE rn = 1),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM s4),
        |pass AS (SELECT doc_id, i AS pidx,
        |    md5_number_lower(
        |      array_to_string(t[i * 10 + 1 : i * 10 + 10], ' ')) AS pkey
        |  FROM toks, unnest(range(CAST(ceil(len(t) / 10.0) AS BIGINT)))
        |    AS r(i)),
        |kc AS (SELECT pkey, count(*) AS n_occ FROM pass GROUP BY 1),
        |s5 AS (SELECT doc_id FROM pass JOIN kc USING (pkey)
        |  GROUP BY doc_id
        |  HAVING sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) * 2
        |    <= count(*))
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_idx, 'ingest' AS stage,
        |    CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_docs
        |  UNION ALL SELECT 2, 'lang_en',
        |    CAST((SELECT count(*) FROM s2) AS BIGINT)
        |  UNION ALL SELECT 3, 'quality',
        |    CAST((SELECT count(*) FROM s3) AS BIGINT)
        |  UNION ALL SELECT 4, 'exact_dedup',
        |    CAST((SELECT count(*) FROM s4) AS BIGINT)
        |  UNION ALL SELECT 5, 'boilerplate',
        |    CAST((SELECT count(*) FROM s5) AS BIGINT))
        |ORDER BY stage_idx""".stripMargin,
    "data_length_buckets" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |b AS (SELECT n_tok,
        |    CASE WHEN n_tok <= 32 THEN 32 WHEN n_tok <= 64 THEN 64
        |         WHEN n_tok <= 128 THEN 128 WHEN n_tok <= 256 THEN 256
        |         WHEN n_tok <= 512 THEN 512 ELSE 1024 END AS bucket
        |  FROM d)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        |  CAST(sum(least(bucket, greatest(bucket - n_tok, 0)))
        |    AS BIGINT) AS pad_waste
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "multimodal_wav_decimate" ->
      """WITH d AS (SELECT doc_id, 200 + doc_id % 256 AS n
        |    FROM documents),
        |s AS (SELECT doc_id,
        |    ((unnest(range((n + 1) // 2)) * 74 + doc_id * 101) % 65536
        |      - 32768) AS v
        |  FROM d)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(sum(v * v) AS BIGINT) AS energy
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_sprt_test" -> qSprtOracle,
    "q_ab_cuped" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT (min(ts_s) + max(ts_s)) // 2 AS mid FROM ev),
        |perc AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN ts_s < mid THEN cents
        |      ELSE 0 END) AS BIGINT) AS xc,
        |    CAST(sum(CASE WHEN ts_s >= mid THEN cents
        |      ELSE 0 END) AS BIGINT) AS yc,
        |    (user_id % 2 = 0) AS treat
        |  FROM ev CROSS JOIN b GROUP BY user_id),
        |per AS (
        |  SELECT user_id, treat,
        |    CASE WHEN xc < 0 THEN -((-xc + 50) // 100)
        |         ELSE (xc + 50) // 100 END AS x,
        |    CASE WHEN yc < 0 THEN -((-yc + 50) // 100)
        |         ELSE (yc + 50) // 100 END AS y
        |  FROM perc),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN treat THEN x ELSE 0 END) AS BIGINT) AS sxt,
        |    CAST(sum(CASE WHEN treat THEN y ELSE 0 END) AS BIGINT) AS syt
        |  FROM per)
        |SELECT n AS n_users,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta,
        |  round(CAST(syt AS DOUBLE) / nt -
        |    CAST(sy - syt AS DOUBLE) / (n - nt), 4) AS raw_lift,
        |  round(CAST(syt AS DOUBLE) / nt -
        |    CAST(sy - syt AS DOUBLE) / (n - nt) -
        |    (CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE)) *
        |      (CAST(sxt AS DOUBLE) / nt -
        |        CAST(sx - sxt AS DOUBLE) / (n - nt)), 4) AS adj_lift,
        |  round((CAST(n * sxy - sx * sy AS DOUBLE) *
        |    CAST(n * sxy - sx * sy AS DOUBLE)) /
        |    (CAST(n * sxx - sx * sx AS DOUBLE) *
        |      CAST(n * syy - sy * sy AS DOUBLE)), 4) AS var_reduction
        |FROM g""".stripMargin,
    "q_diff_in_diff" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |    value
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT (min(ts_s) + max(ts_s)) // 2 AS mid FROM ev),
        |cells AS (
        |  SELECT (user_id % 2 = 0) AS treat, (ts_s >= mid) AS post,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
        |      AS BIGINT) AS sc
        |  FROM ev CROSS JOIN b GROUP BY 1, 2),
        |one AS (SELECT
        |    CAST(sum(CASE WHEN treat AND post THEN sc END) AS BIGINT)
        |      AS tp,
        |    CAST(sum(CASE WHEN treat AND post THEN n END) AS BIGINT)
        |      AS ntp,
        |    CAST(sum(CASE WHEN treat AND NOT post THEN sc END) AS BIGINT)
        |      AS tr,
        |    CAST(sum(CASE WHEN treat AND NOT post THEN n END) AS BIGINT)
        |      AS ntr,
        |    CAST(sum(CASE WHEN NOT treat AND post THEN sc END) AS BIGINT)
        |      AS cp,
        |    CAST(sum(CASE WHEN NOT treat AND post THEN n END) AS BIGINT)
        |      AS ncp,
        |    CAST(sum(CASE WHEN NOT treat AND NOT post THEN sc END)
        |      AS BIGINT) AS cr,
        |    CAST(sum(CASE WHEN NOT treat AND NOT post THEN n END)
        |      AS BIGINT) AS ncr
        |  FROM cells)
        |SELECT
        |  round(CAST(tp AS DOUBLE) / ntp / 100.0, 4) AS treat_post,
        |  round(CAST(tr AS DOUBLE) / ntr / 100.0, 4) AS treat_pre,
        |  round(CAST(cp AS DOUBLE) / ncp / 100.0, 4) AS control_post,
        |  round(CAST(cr AS DOUBLE) / ncr / 100.0, 4) AS control_pre,
        |  round((CAST(tp AS DOUBLE) / ntp / 100.0 -
        |      CAST(tr AS DOUBLE) / ntr / 100.0) -
        |    (CAST(cp AS DOUBLE) / ncp / 100.0 -
        |      CAST(cr AS DOUBLE) / ncr / 100.0), 4) AS did
        |FROM one""".stripMargin,

    "text_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |p AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i:i+1])) AS pair
        |  FROM w WHERE len(w) >= 2)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n
        |FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    // the 6 trainer rounds unrolled as chained CTEs — each round
    // re-derives pair counts from the merged vocab and picks the same
    // (count desc, lhs, rhs) argmax; replace() shares Spark's
    // left-to-right non-overlapping literal-scan semantics
    "text_bpe_train" -> bpeTrainOracle(6),
    // encode census from the SAME unrolled chain, reading the final
    // merged vocab w6 instead of the per-round argmaxes
    "text_bpe_apply" -> bpeApplyOracle(6),
    // fertility stats over the same final vocab: integer histogram,
    // integer p90 threshold (cum*10 >= 9*tot), micro-fixed ratios
    "text_tokenizer_fertility" ->
      (bpeChainSql(6, withFinalMerge = true) +
        """,
          |f AS (SELECT len(list_filter(string_split(w, chr(1)),
          |    x -> x <> '')) AS t, cnt FROM w6),
          |h AS (SELECT t, CAST(sum(cnt) AS BIGINT) AS n,
          |    CAST(count(*) AS BIGINT) AS nw FROM f GROUP BY 1),
          |c AS (SELECT t, n, nw,
          |    CAST(sum(n) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
          |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          |    CAST(sum(n) OVER () AS BIGINT) AS tot,
          |    CAST(sum(t * n) OVER () AS BIGINT) AS toks FROM h)
          |SELECT CAST(sum(nw) AS BIGINT) AS n_words,
          |  CAST(min(tot) AS BIGINT) AS n_instances,
          |  CAST(min(toks) AS BIGINT) AS n_tokens,
          |  floor(CAST(min(toks) AS DOUBLE) / min(tot) * 1e6 + 0.5) / 1e6
          |    AS fertility,
          |  floor(CAST(coalesce(min(CASE WHEN t = 1 THEN n END), 0)
          |    AS DOUBLE) / min(tot) * 1e6 + 0.5) / 1e6
          |    AS single_tok_share,
          |  CAST(min(CASE WHEN cum * 10 >= tot * 9 THEN t END) AS BIGINT)
          |    AS p90_tokens,
          |  CAST(max(t) AS BIGINT) AS max_tokens
          |FROM c""".stripMargin),
    // the same four patch classes replayed through DuckDB's NATIVE
    // json_merge_patch — an independent RFC 7386 implementation the
    // schema-driven projection must match value-for-value
    "engine_merge_patch" ->
      """WITH docs AS (SELECT o_orderkey % 4 AS op,
        |    json_object('id', o_orderkey, 'status', o_orderstatus,
        |      'meta', json_object('price_cents',
        |        CAST(round(o_totalprice * 100) AS BIGINT),
        |        'prio', o_orderpriority)) AS doc
        |  FROM orders),
        |p AS (SELECT op, json_merge_patch(doc,
        |    CASE op WHEN 0 THEN '{"status":"XX"}'
        |            WHEN 1 THEN '{"meta":{"price_cents":null}}'
        |            WHEN 2 THEN '{"meta":null}'
        |            ELSE '{"extra":{"src":"patch"},"meta":{"audited":true}}'
        |    END) AS m
        |  FROM docs)
        |SELECT CAST(op AS BIGINT) AS op,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN json_extract_string(m, '$.status') = 'XX'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_status_x,
        |  CAST(count(json_extract(m, '$.meta.price_cents')) AS BIGINT)
        |    AS n_price,
        |  CAST(coalesce(sum(CAST(json_extract(m, '$.meta.price_cents')
        |    AS BIGINT)), 0) AS BIGINT) AS sum_price_cents,
        |  CAST(count(json_extract(m, '$.meta')) AS BIGINT) AS n_meta,
        |  CAST(count(json_extract(m, '$.extra.src')) AS BIGINT) AS n_extra,
        |  CAST(sum(CASE WHEN json_extract_string(m, '$.meta.audited')
        |    = 'true' THEN 1 ELSE 0 END) AS BIGINT) AS n_audited
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // naive quadratic sign census per month — the independent replay
    // the dominance-count S must match integer-exactly
    "q_mann_kendall" ->
      """WITH daily AS (
        |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
        |    CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1, 2),
        |pr AS (SELECT a.month AS month, sign(b.e4 - a.e4) AS sg
        |  FROM daily a JOIN daily b
        |    ON a.month = b.month AND a.day < b.day),
        |ag AS (SELECT month, CAST(count(*) AS BIGINT) AS n0,
        |    CAST(sum(sg) AS BIGINT) AS s FROM pr GROUP BY 1),
        |nc AS (SELECT month, CAST(count(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1)
        |SELECT nc.month, nc.n_days, ag.s AS s_stat,
        |  floor(CAST(ag.s AS DOUBLE) / ag.n0 * 1e6 + 0.5) / 1e6 AS tau_a
        |FROM nc JOIN ag ON nc.month = ag.month
        |ORDER BY 1""".stripMargin,
    "q_two_way_anova" ->
      """WITH cells AS (
        |  SELECT l_returnflag AS fa, l_linestatus AS fb,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT) *
        |      CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s2
        |  FROM lineitem GROUP BY 1, 2),
        |am AS (SELECT fa, CAST(sum(n) AS BIGINT) AS n_a,
        |    CAST(sum(s) AS BIGINT) AS s_a FROM cells GROUP BY 1),
        |bm AS (SELECT fb, CAST(sum(n) AS BIGINT) AS n_b,
        |    CAST(sum(s) AS BIGINT) AS s_b FROM cells GROUP BY 1),
        |g AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(s) AS BIGINT) AS ss, CAST(sum(s2) AS BIGINT) AS sq,
        |    CAST(count(DISTINCT fa) AS BIGINT) AS ka,
        |    CAST(count(DISTINCT fb) AS BIGINT) AS kb,
        |    CAST(count(*) AS BIGINT) AS kc,
        |    sum((CAST(s AS HUGEINT) * s * 10000) // n) AS cellsq
        |  FROM cells),
        |asq AS (SELECT sum((CAST(s_a AS HUGEINT) * s_a * 10000) // n_a)
        |    AS asq
        |  FROM am),
        |bsq AS (SELECT sum((CAST(s_b AS HUGEINT) * s_b * 10000) // n_b)
        |    AS bsq
        |  FROM bm),
        |m AS (SELECT *,
        |    CAST((CAST(ss AS HUGEINT) * ss * 10000) // nn AS DOUBLE)
        |      AS corr
        |  FROM g CROSS JOIN asq CROSS JOIN bsq),
        |m2 AS (SELECT *,
        |    CAST(asq AS DOUBLE) - corr AS ss_a,
        |    CAST(bsq AS DOUBLE) - corr AS ss_b,
        |    CAST(cellsq AS DOUBLE) - corr AS ss_cells,
        |    CAST(sq AS DOUBLE) * 10000 - CAST(cellsq AS DOUBLE) AS ss_w,
        |    ka - 1 AS df_a, kb - 1 AS df_b,
        |    (ka - 1) * (kb - 1) AS df_ab, nn - kc AS df_w
        |  FROM m),
        |f AS (SELECT nn AS n_total, df_a, df_b, df_ab, df_w,
        |    floor((ss_a / df_a) / (ss_w / df_w) * 10000 + 0.5) / 10000
        |      AS f_a,
        |    floor((ss_b / df_b) / (ss_w / df_w) * 10000 + 0.5) / 10000
        |      AS f_b,
        |    floor(((ss_cells - ss_a - ss_b) / df_ab) / (ss_w / df_w)
        |      * 10000 + 0.5) / 10000 AS f_ab
        |  FROM m2)
        |SELECT fa, fb, n,
        |  floor(CAST(s AS DOUBLE) / n * 10000 + 0.5) / 10000 AS cell_mean,
        |  n_total, df_a, df_b, df_ab, df_w, f_a, f_b, f_ab
        |FROM cells CROSS JOIN f ORDER BY fa, fb""".stripMargin,
    "q_gumbel_maxima" ->
      """WITH daily AS (
        |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
        |    CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1, 2),
        |mx AS (SELECT month, CAST(max(e4) AS BIGINT) AS m
        |  FROM daily GROUP BY 1),
        |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(m) AS BIGINT) AS sm,
        |    sum(CAST(m AS HUGEINT) * m) AS sm2 FROM mx),
        |fit AS (SELECT *,
        |    CAST(sm AS DOUBLE) / n AS mean,
        |    sqrt((CAST(sm2 AS DOUBLE) - CAST(sm AS DOUBLE)
        |      * (CAST(sm AS DOUBLE) / n)) / (n - 1)) AS sd
        |  FROM mo),
        |fit2 AS (SELECT *, sd * sqrt(6.0) / pi() AS beta FROM fit),
        |fit3 AS (SELECT *, mean - 0.5772156649015329 * beta AS mu
        |  FROM fit2)
        |SELECT n AS n_blocks,
        |  floor(mean / 10000 * 100 + 0.5) / 100 AS mean_max,
        |  floor(beta / 10000 * 100 + 0.5) / 100 AS beta,
        |  floor(mu / 10000 * 100 + 0.5) / 100 AS mu,
        |  floor((mu - beta * ln(-ln(1 - 1.0 / 10))) / 10000 * 100 + 0.5)
        |    / 100 AS rl_10,
        |  floor((mu - beta * ln(-ln(1 - 1.0 / 100))) / 10000 * 100 + 0.5)
        |    / 100 AS rl_100
        |FROM fit3""".stripMargin,
    "engine_json_pointer" ->
      """WITH docs AS (
        |  SELECT o_orderstatus AS status,
        |    json_object('id', o_orderkey, 'a/b', o_orderpriority,
        |      'meta', json_object('price_cents',
        |        CAST(round(o_totalprice * 100) AS BIGINT)),
        |      'tags', json_array(o_orderstatus, o_orderpriority)) AS doc
        |  FROM orders),
        |p AS (SELECT status,
        |    CAST(json_extract(doc, '/meta/price_cents') AS BIGINT)
        |      AS p_price,
        |    json_extract_string(doc, '/a~1b') AS p_esc,
        |    json_extract_string(doc, '/tags/1') AS p_tag1,
        |    json_extract(doc, '/meta/none') AS p_missing
        |  FROM docs)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(p_price) AS BIGINT) AS sum_price_cents,
        |  CAST(sum(CASE WHEN p_esc = p_tag1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_esc_eq_tag,
        |  CAST(count(p_missing) AS BIGINT) AS n_missing_resolved
        |FROM p GROUP BY status ORDER BY status""".stripMargin,
    "q_hurst_exponent" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |dx AS (SELECT e4,
        |    CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS idx
        |  FROM daily),
        |sz AS (SELECT CAST(unnest([8, 16, 32, 64]) AS BIGINT) AS bs),
        |e AS (SELECT bs, idx // bs AS b, idx, e4 FROM dx CROSS JOIN sz),
        |f AS (SELECT bs, b, e4,
        |    count(*) OVER (PARTITION BY bs, b) AS cnt,
        |    CAST(sum(e4) OVER (PARTITION BY bs, b) AS BIGINT) AS s,
        |    CAST(row_number() OVER (PARTITION BY bs, b ORDER BY idx)
        |      AS BIGINT) AS j,
        |    CAST(sum(e4) OVER (PARTITION BY bs, b ORDER BY idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cumx
        |  FROM e),
        |g AS (SELECT bs, b,
        |    CAST(max(bs * cumx - j * s) - min(bs * cumx - j * s) AS BIGINT)
        |      AS r_scaled,
        |    sum(CAST(bs * e4 - s AS HUGEINT) * (bs * e4 - s)) AS ssq
        |  FROM f WHERE cnt = bs GROUP BY 1, 2),
        |rs AS (SELECT bs, CAST(round(CAST(r_scaled AS DOUBLE)
        |      / sqrt(CAST(ssq AS DOUBLE) / bs) * 1e6) AS BIGINT) AS rs_micro
        |  FROM g WHERE ssq > 0),
        |ps AS (SELECT bs AS block_size, CAST(count(*) AS BIGINT)
        |      AS n_blocks,
        |    CAST(sum(rs_micro) AS BIGINT) AS rs_sum FROM rs GROUP BY 1),
        |pa AS (SELECT *, CAST(rs_sum AS DOUBLE) / n_blocks / 1e6 AS avg_rs
        |  FROM ps),
        |h AS (SELECT floor((
        |    -1.5 * max(CASE WHEN block_size = 8 THEN ln(avg_rs) END)
        |    - 0.5 * max(CASE WHEN block_size = 16 THEN ln(avg_rs) END)
        |    + 0.5 * max(CASE WHEN block_size = 32 THEN ln(avg_rs) END)
        |    + 1.5 * max(CASE WHEN block_size = 64 THEN ln(avg_rs) END))
        |    / (5 * ln(2)) * 1e4 + 0.5) / 1e4 AS hurst FROM pa)
        |SELECT block_size, n_blocks,
        |  floor(avg_rs * 1e6 + 0.5) / 1e6 AS avg_rs, hurst
        |FROM pa CROSS JOIN h ORDER BY block_size""".stripMargin,
    "q_perm_entropy" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS x1
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT x1,
        |    lead(x1, 1) OVER (ORDER BY day) AS x2,
        |    lead(x1, 2) OVER (ORDER BY day) AS x3
        |  FROM daily),
        |coded AS (SELECT CAST(
        |    (CASE WHEN x2 < x1 THEN 1 ELSE 0 END
        |       + CASE WHEN x3 < x1 THEN 1 ELSE 0 END) * 9 +
        |    (CASE WHEN x1 <= x2 THEN 1 ELSE 0 END
        |       + CASE WHEN x3 < x2 THEN 1 ELSE 0 END) * 3 +
        |    (CASE WHEN x1 <= x3 THEN 1 ELSE 0 END
        |       + CASE WHEN x2 <= x3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS pattern
        |  FROM t WHERE x3 IS NOT NULL),
        |counts AS (SELECT pattern, CAST(count(*) AS BIGINT) AS cnt
        |  FROM coded GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM counts),
        |terms AS (SELECT pattern, cnt, t,
        |    CAST(round(-ln(CAST(cnt AS DOUBLE) / t) * 1e6) AS BIGINT)
        |      AS k_micro
        |  FROM counts CROSS JOIN tot),
        |h AS (SELECT
        |    floor(CAST(sum(cnt * k_micro) AS DOUBLE) / max(t) + 0.5) / 1e6
        |      AS entropy_nats
        |  FROM terms),
        |h2 AS (SELECT entropy_nats,
        |    floor(entropy_nats / ln(6) * 1e4 + 0.5) / 1e4 AS entropy_norm
        |  FROM h)
        |SELECT pattern, cnt,
        |  floor(CAST(cnt AS DOUBLE) / t * 1e6 + 0.5) / 1e6 AS p,
        |  entropy_nats, entropy_norm
        |FROM terms CROSS JOIN h2 ORDER BY pattern""".stripMargin,
    "q_cramer_von_mises" ->
      """WITH x AS (
        |  SELECT (c_custkey % 2 = 0) AS in_a, c_custkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer),
        |r AS (SELECT in_a,
        |    CAST(row_number() OVER (ORDER BY v, c_custkey) AS BIGINT) AS r,
        |    CAST(row_number() OVER (PARTITION BY in_a ORDER BY v, c_custkey)
        |      AS BIGINT) AS i
        |  FROM x),
        |sums AS (SELECT in_a, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum((r - i) * (r - i)) AS BIGINT) AS t2
        |  FROM r GROUP BY 1),
        |ab AS (SELECT
        |    max(CASE WHEN in_a THEN n END) AS n_a,
        |    max(CASE WHEN in_a THEN t2 END) AS t2_a,
        |    max(CASE WHEN NOT in_a THEN n END) AS n_b,
        |    max(CASE WHEN NOT in_a THEN t2 END) AS t2_b
        |  FROM sums),
        |u AS (SELECT *, CAST(n_a AS HUGEINT) * t2_a
        |    + CAST(n_b AS HUGEINT) * t2_b AS u FROM ab)
        |SELECT n_a, n_b, t2_a, t2_b,
        |  floor((CAST(u AS DOUBLE)
        |    / (CAST(n_a AS DOUBLE) * n_b * (n_a + n_b))
        |    - (4.0 * n_a * n_b - 1) / (6.0 * (n_a + n_b)))
        |    * 1e6 + 0.5) / 1e6 AS t_stat
        |FROM u""".stripMargin,
    "q_ljung_box" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(e4) AS BIGINT) AS sx FROM daily),
        |y AS (SELECT day, n, n * e4 - sx AS y FROM daily CROSS JOIN m),
        |l AS (SELECT day, n, y,
        |    lag(y, 1) OVER (ORDER BY day) AS y1,
        |    lag(y, 2) OVER (ORDER BY day) AS y2,
        |    lag(y, 3) OVER (ORDER BY day) AS y3,
        |    lag(y, 4) OVER (ORDER BY day) AS y4,
        |    lag(y, 5) OVER (ORDER BY day) AS y5,
        |    lag(y, 6) OVER (ORDER BY day) AS y6,
        |    lag(y, 7) OVER (ORDER BY day) AS y7
        |  FROM y),
        |s AS (SELECT max(n) AS n,
        |    sum(CAST(y AS HUGEINT) * y) AS den,
        |    sum(CAST(y AS HUGEINT) * y1) AS num1,
        |    sum(CAST(y AS HUGEINT) * y2) AS num2,
        |    sum(CAST(y AS HUGEINT) * y3) AS num3,
        |    sum(CAST(y AS HUGEINT) * y4) AS num4,
        |    sum(CAST(y AS HUGEINT) * y5) AS num5,
        |    sum(CAST(y AS HUGEINT) * y6) AS num6,
        |    sum(CAST(y AS HUGEINT) * y7) AS num7
        |  FROM l),
        |pl AS (
        |  SELECT lag_k, n, r,
        |    CAST(round(r * r / (n - lag_k) * 1e12) AS BIGINT) AS t_pico
        |  FROM (
        |    SELECT 1 AS lag_k, n,
        |      CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS r FROM s
        |    UNION ALL SELECT 2, n,
        |      CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) FROM s
        |    UNION ALL SELECT 3, n,
        |      CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) FROM s
        |    UNION ALL SELECT 4, n,
        |      CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE) FROM s
        |    UNION ALL SELECT 5, n,
        |      CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE) FROM s
        |    UNION ALL SELECT 6, n,
        |      CAST(num6 AS DOUBLE) / CAST(den AS DOUBLE) FROM s
        |    UNION ALL SELECT 7, n,
        |      CAST(num7 AS DOUBLE) / CAST(den AS DOUBLE) FROM s))
        |SELECT CAST(lag_k AS BIGINT) AS lag_k,
        |  floor(r * 1e6 + 0.5) / 1e6 AS acf,
        |  floor(n * (n + 2) * (CAST(sum(t_pico) OVER (ORDER BY lag_k
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 1e12) * 1e4 + 0.5) / 1e4 AS q_stat
        |FROM pl ORDER BY lag_k""".stripMargin,
    "q_iqr_outliers" ->
      """WITH x AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS g, c_custkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer),
        |r AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v, c_custkey)
        |      AS rn,
        |    count(*) OVER (PARTITION BY g) AS tot
        |  FROM x),
        |qs AS (SELECT g, CAST(min(v) AS BIGINT) AS q1,
        |    CAST(max(v) AS BIGINT) AS q3
        |  FROM r WHERE rn = (tot + 3) // 4 OR rn = (3 * tot + 3) // 4
        |  GROUP BY g)
        |SELECT x.g AS nationkey, CAST(count(*) AS BIGINT) AS n,
        |  max(q1) AS q1, max(q3) AS q3, max(q3) - max(q1) AS iqr,
        |  CAST(sum(CASE WHEN 2 * v < 2 * q1 - 3 * (q3 - q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN 2 * v > 2 * q3 + 3 * (q3 - q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  floor(CAST(sum(CASE WHEN 2 * v < 2 * q1 - 3 * (q3 - q1)
        |      OR 2 * v > 2 * q3 + 3 * (q3 - q1) THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4 AS outlier_rate
        |FROM x JOIN qs ON x.g = qs.g
        |GROUP BY x.g ORDER BY nationkey""".stripMargin,
    "q_pvm_bridge" ->
      """WITH pm AS (
        |  SELECT CAST((year(CAST(l_shipdate AS DATE)) - 1995) * 12
        |      + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS mi,
        |    l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS rev,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |pm2 AS (SELECT *, (rev * 100) // qty AS uv2 FROM pm),
        |prev AS (SELECT l_partkey, mi + 1 AS mi, uv2 AS uv_p, qty AS q_p,
        |    rev AS rev_p FROM pm2),
        |j AS (SELECT coalesce(pm2.mi, prev.mi) AS mi,
        |    pm2.uv2, pm2.qty, pm2.rev, prev.uv_p, prev.q_p, prev.rev_p
        |  FROM pm2 FULL JOIN prev
        |    ON pm2.l_partkey = prev.l_partkey AND pm2.mi = prev.mi),
        |g AS (SELECT mi,
        |    CAST(count(CASE WHEN uv2 IS NOT NULL AND uv_p IS NOT NULL
        |      THEN 1 END) AS BIGINT) AS n_matched,
        |    CAST(sum(CASE WHEN uv2 IS NOT NULL AND uv_p IS NOT NULL
        |      THEN (uv2 - uv_p) * q_p END) AS BIGINT) AS price_eff,
        |    CAST(sum(CASE WHEN uv2 IS NOT NULL AND uv_p IS NOT NULL
        |      THEN uv_p * (qty - q_p) END) AS BIGINT) AS volume_eff,
        |    CAST(sum(CASE WHEN uv2 IS NOT NULL AND uv_p IS NOT NULL
        |      THEN (uv2 - uv_p) * (qty - q_p) END) AS BIGINT) AS cross_eff,
        |    CAST(sum(CASE WHEN uv2 IS NOT NULL AND uv_p IS NOT NULL
        |      THEN uv2 * qty - uv_p * q_p END) AS BIGINT) AS matched_delta,
        |    CAST(coalesce(sum(CASE WHEN uv_p IS NULL THEN rev END), 0)
        |      AS BIGINT) AS entry_rev,
        |    CAST(coalesce(sum(CASE WHEN uv2 IS NULL THEN rev_p END), 0)
        |      AS BIGINT) AS exit_rev
        |  FROM j GROUP BY 1)
        |SELECT mi AS month_idx, n_matched, price_eff, volume_eff,
        |  cross_eff, price_eff + volume_eff + cross_eff AS bridge_delta,
        |  matched_delta, entry_rev, exit_rev
        |FROM g WHERE n_matched > 0 ORDER BY month_idx""".stripMargin,
    "q_string_agg" ->
      """WITH r AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_name,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
        |        c_custkey) AS rn
        |  FROM customer)
        |SELECT nationkey, CAST(count(*) AS BIGINT) AS n_top,
        |  string_agg(c_name, ',' ORDER BY rn) AS top_names
        |FROM r WHERE rn <= 5
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "embed_label_divergence" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    unnest(embedding[1:4]) AS x,
        |    generate_subscripts(embedding[1:4], 1) AS i
        |  FROM embeddings),
        |cells AS (
        |  SELECT vec_id, label,
        |    CAST(sum(CASE WHEN x > 0 THEN (CAST(1 AS BIGINT) << (i - 1))
        |      ELSE 0 END) AS BIGINT) AS cell
        |  FROM e GROUP BY 1, 2),
        |corpus AS (SELECT cell, CAST(count(*) AS BIGINT) AS c_c
        |  FROM cells GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cells),
        |nl AS (SELECT label, CAST(count(*) AS BIGINT) AS n_l
        |  FROM cells GROUP BY 1),
        |lattice AS (SELECT label, CAST(range AS BIGINT) AS cell
        |  FROM nl CROSS JOIN range(16)),
        |lc AS (SELECT label, cell, CAST(count(*) AS BIGINT) AS c_lc
        |  FROM cells GROUP BY 1, 2),
        |k AS (SELECT lattice.label, lattice.cell,
        |    coalesce(lc.c_lc, 0) AS c_lc, coalesce(corpus.c_c, 0) AS c_c,
        |    nl.n_l, n.n,
        |    CAST(round(ln(CAST(coalesce(lc.c_lc, 0) + 1 AS DOUBLE)
        |      * (n.n + 16) / (CAST(nl.n_l + 16 AS DOUBLE)
        |      * (coalesce(corpus.c_c, 0) + 1))) * 1e6) AS BIGINT) AS k_micro
        |  FROM lattice
        |    LEFT JOIN lc ON lattice.label = lc.label
        |      AND lattice.cell = lc.cell
        |    LEFT JOIN corpus ON lattice.cell = corpus.cell
        |    JOIN nl ON lattice.label = nl.label
        |    CROSS JOIN n)
        |SELECT label, max(n_l) AS n_vecs,
        |  CAST(sum((c_lc + 1) * k_micro) AS BIGINT) AS kl_weighted_micro,
        |  floor(CAST(sum((c_lc + 1) * k_micro) AS DOUBLE)
        |    / (max(n_l) + 16) + 0.5) / 1e6 AS kl_nats
        |FROM k GROUP BY label ORDER BY label""".stripMargin,
    "q_theil_index" ->
      """WITH x AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS g,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS x
        |  FROM customer WHERE c_acctbal > 0),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS tot FROM x),
        |gt AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(x) AS BIGINT) AS tot_g FROM x GROUP BY 1),
        |c AS (SELECT x.g,
        |    CAST(sum(x * CAST(round(ln(CAST(x AS DOUBLE) * n /
        |      (CAST(tot AS DOUBLE))) * 1e6) AS BIGINT)) AS BIGINT) AS t_num,
        |    CAST(sum(x * CAST(round(ln(CAST(x AS DOUBLE) * n_g /
        |      (CAST(tot_g AS DOUBLE))) * 1e6) AS BIGINT)) AS BIGINT) AS w_num
        |  FROM x JOIN gt USING (g) CROSS JOIN tot GROUP BY 1),
        |b AS (SELECT g, n_g, tot_g,
        |    tot_g * CAST(round(ln(CAST(tot_g AS DOUBLE) * n /
        |      (CAST(tot AS DOUBLE) * n_g)) * 1e6) AS BIGINT) AS b_num
        |  FROM gt CROSS JOIN tot),
        |s AS (SELECT max(n) AS n, max(tot) AS tot,
        |    floor(CAST(sum(t_num) AS DOUBLE) / max(tot) + 0.5) / 1e6
        |      AS theil_total,
        |    floor(CAST(sum(b_num) AS DOUBLE) / max(tot) + 0.5) / 1e6
        |      AS theil_between,
        |    floor(CAST(sum(w_num) AS DOUBLE) / max(tot) + 0.5) / 1e6
        |      AS theil_within
        |  FROM c JOIN b USING (g) CROSS JOIN tot)
        |SELECT c.g AS nationkey, b.n_g, b.tot_g,
        |  floor(CAST(c.w_num AS DOUBLE) / b.tot_g + 0.5) / 1e6 AS theil_g,
        |  s.n, s.tot, s.theil_total, s.theil_between, s.theil_within
        |FROM c JOIN b USING (g) CROSS JOIN s
        |ORDER BY nationkey""".stripMargin,
    "q_brown_forsythe" ->
      """WITH x AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS g, c_custkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer),
        |med AS (SELECT g, min(v) AS med FROM (
        |    SELECT g, v,
        |      row_number() OVER (PARTITION BY g ORDER BY v, c_custkey)
        |        AS rn,
        |      count(*) OVER (PARTITION BY g) AS tot
        |    FROM x)
        |  WHERE rn = (tot + 1) // 2 GROUP BY g),
        |z AS (SELECT x.g, abs(v - med) AS z, med
        |  FROM x JOIN med USING (g)),
        |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(z) AS BIGINT) AS s_g,
        |    sum(CAST(z AS HUGEINT) * z) AS s2_g,
        |    CAST(max(med) AS BIGINT) AS median_cents
        |  FROM z GROUP BY 1),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(sum(s_g) AS BIGINT) AS s,
        |    sum(s2_g) AS s2,
        |    sum((CAST(s_g AS HUGEINT) * s_g) // n_g) AS sb
        |  FROM grp),
        |f2 AS (SELECT k, n, k - 1 AS df1, n - k AS df2,
        |    CAST(sb AS DOUBLE)
        |      - CAST((CAST(s AS HUGEINT) * s) // n AS DOUBLE) AS ssb,
        |    CAST(s2 AS DOUBLE) - CAST(sb AS DOUBLE) AS ssw
        |  FROM f)
        |SELECT g AS nationkey, n_g, median_cents,
        |  floor(CAST(s_g AS DOUBLE) / n_g * 1e4 + 0.5) / 1e4 AS mean_absdev,
        |  k, df1, df2,
        |  floor((ssb / (k - 1)) / (ssw / (n - k)) * 1e4 + 0.5) / 1e4
        |    AS f_stat
        |FROM grp CROSS JOIN f2 ORDER BY nationkey""".stripMargin,
    "q_ols_diagnostics" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |dx AS (SELECT day, e4,
        |    CAST(date_diff('day', DATE '1995-01-01', day) AS BIGINT) AS x
        |  FROM daily),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(e4) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * e4) AS sxy,
        |    sum(CAST(e4 AS HUGEINT) * e4) AS syy
        |  FROM dx),
        |b AS (SELECT *,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta
        |  FROM m),
        |a AS (SELECT *,
        |    (CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE)) / n AS alpha,
        |    CAST(sx AS DOUBLE) / n AS xbar
        |  FROM b),
        |s AS (SELECT *,
        |    (CAST(syy AS DOUBLE) - alpha * CAST(sy AS DOUBLE)
        |      - beta * CAST(sxy AS DOUBLE)) / (n - 2) AS s2,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * xbar AS sxxc
        |  FROM a),
        |r AS (SELECT day, e4, x, beta, alpha, s2, xbar, sxxc, n,
        |    CAST(e4 AS DOUBLE) - alpha - beta * x AS resid,
        |    1.0 / n + (x - xbar) * (x - xbar) / sxxc AS lev
        |  FROM dx CROSS JOIN s)
        |SELECT day,
        |  floor(CAST(e4 AS DOUBLE) / 10000 * 100 + 0.5) / 100 AS rev,
        |  floor(beta / 10000 * 1e4 + 0.5) / 1e4 AS slope,
        |  floor(resid / 10000 * 100 + 0.5) / 100 AS residual,
        |  floor(lev * 1e6 + 0.5) / 1e6 AS leverage,
        |  floor(resid * resid * lev / (2 * s2 * (1 - lev) * (1 - lev))
        |    * 1e6 + 0.5) / 1e6 AS cook_d
        |FROM r
        |ORDER BY resid * resid * lev / (2 * s2 * (1 - lev) * (1 - lev))
        |  DESC, day LIMIT 10""".stripMargin,
    "sink_zonemap_prune" ->
      """WITH li AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
        |    CAST(((year(CAST(l_shipdate AS DATE)) - 1995) * 12 +
        |      month(CAST(l_shipdate AS DATE)) - 1) // 6 AS BIGINT) AS zone
        |  FROM lineitem)
        |SELECT zone, CAST(count(*) AS BIGINT) AS n_rows,
        |  min(day) AS min_day, max(day) AS max_day,
        |  CAST(max(day) < DATE '1996-01-01'
        |    OR min(day) > DATE '1996-06-30' AS INT) AS skippable,
        |  CAST(sum(CASE WHEN day BETWEEN DATE '1996-01-01'
        |    AND DATE '1996-06-30' THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
        |  CAST(sum(pc) AS BIGINT) AS price_checksum
        |FROM li GROUP BY zone ORDER BY zone""".stripMargin,
    "multimodal_bmp_codec" ->
      """WITH d AS (SELECT doc_id, 8 + (doc_id * 3) % 24 AS w,
        |    8 + (doc_id * 5) % 24 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS i FROM d),
        |ys AS (SELECT doc_id, w, h, i, unnest(range(h)) AS j FROM xs)
        |SELECT doc_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(sum((i * 31 + j * 17 + doc_id) % 256) AS BIGINT) AS px_sum
        |FROM ys GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    "multimodal_image_hist" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w,
        |    8 + (doc_id * 7) % 24 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS i FROM d),
        |ys AS (SELECT doc_id, i,
        |    ((i * 31 + unnest(range(h)) * 17 + doc_id) % 256) // 32 AS b
        |  FROM xs)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
        |  CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
        |  CAST(sum(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
        |  CAST(sum(CASE WHEN b = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3,
        |  CAST(sum(CASE WHEN b = 4 THEN 1 ELSE 0 END) AS BIGINT) AS h4,
        |  CAST(sum(CASE WHEN b = 5 THEN 1 ELSE 0 END) AS BIGINT) AS h5,
        |  CAST(sum(CASE WHEN b = 6 THEN 1 ELSE 0 END) AS BIGINT) AS h6,
        |  CAST(sum(CASE WHEN b = 7 THEN 1 ELSE 0 END) AS BIGINT) AS h7
        |FROM ys GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "multimodal_audio_pitch" ->
      """WITH d AS (SELECT doc_id, 200 + doc_id % 256 AS n
        |    FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(n)) AS i FROM d),
        |v AS (SELECT doc_id, n, i,
        |    (i * 37 + doc_id * 101) % 65536 - 32768 AS v FROM s),
        |lags AS (SELECT unnest(range(20, 41)) AS lag),
        |al AS (SELECT doc_id, n, lag, i + lag AS j, v
        |  FROM v CROSS JOIN lags),
        |r AS (SELECT al.doc_id, al.n, al.lag,
        |    CAST(sum(al.v * b.v) AS BIGINT) AS r
        |  FROM al JOIN v b ON b.doc_id = al.doc_id AND b.i = al.j
        |  GROUP BY 1, 2, 3),
        |best AS (SELECT doc_id, n, lag, r,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY r DESC, lag) AS rk
        |  FROM r)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST(lag AS BIGINT) AS best_lag, r AS r_peak,
        |  floor(16000.0 / lag * 1e4 + 0.5) / 1e4 AS f0_hz
        |FROM best WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    "embed_hamming_topk" ->
      """WITH e AS (
        |  SELECT vec_id, unnest(embedding) AS x,
        |    generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |codes AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN x > 0 AND i <= 32
        |      THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END) AS BIGINT)
        |      AS code1,
        |    CAST(sum(CASE WHEN x > 0 AND i > 32
        |      THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END) AS BIGINT)
        |      AS code2
        |  FROM e GROUP BY 1),
        |q AS (SELECT vec_id AS q_id, code1 AS q1, code2 AS q2
        |  FROM codes WHERE vec_id < 10),
        |h AS (SELECT q.q_id, c.vec_id AS c_id,
        |    CAST(bit_count(xor(c.code1, q.q1)) +
        |      bit_count(xor(c.code2, q.q2)) AS BIGINT) AS hamming
        |  FROM codes c CROSS JOIN q WHERE c.vec_id <> q.q_id),
        |r AS (SELECT q_id, c_id, hamming,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY hamming, c_id) AS BIGINT) AS rnk
        |  FROM h)
        |SELECT q_id, rnk, c_id, hamming FROM r
        |WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin,
    "text_unigram_kl" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+'))
        |    AS w
        |  FROM documents),
        |t AS (SELECT source, w FROM toks WHERE w <> ''),
        |corpus AS (SELECT w, CAST(count(*) AS BIGINT) AS c_w
        |  FROM t GROUP BY 1),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_c FROM t),
        |src AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw
        |  FROM t GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        |  FROM t GROUP BY 1),
        |k AS (SELECT src.source, src.c_sw,
        |    CAST(round(ln(CAST(src.c_sw AS DOUBLE) * n_c
        |      / (CAST(n_s AS DOUBLE) * c_w)) * 1e6) AS BIGINT) AS k_micro
        |  FROM src JOIN corpus USING (w) JOIN ns USING (source)
        |    CROSS JOIN nc),
        |agg AS (SELECT source,
        |    CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(c_sw * k_micro) AS BIGINT) AS kl_weighted_micro
        |  FROM k GROUP BY 1)
        |SELECT source, n_s AS n_tokens, vocab, kl_weighted_micro,
        |  floor(CAST(kl_weighted_micro AS DOUBLE) / n_s + 0.5) / 1e6
        |    AS kl_nats
        |FROM agg JOIN ns USING (source) ORDER BY source""".stripMargin,
    "text_burstiness" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
        |    AS w
        |  FROM documents),
        |t AS (SELECT doc_id, w FROM toks WHERE w <> ''),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |pd AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS x
        |  FROM t GROUP BY 1, 2),
        |m AS (SELECT w,
        |    CAST(sum(x) AS BIGINT) AS total_cnt,
        |    CAST(sum(x * x) AS BIGINT) AS sx2,
        |    CAST(count(*) AS BIGINT) AS doc_freq
        |  FROM pd GROUP BY 1),
        |v AS (SELECT w, total_cnt, sx2, doc_freq, n_docs,
        |    CAST(total_cnt AS DOUBLE) / n_docs AS mean
        |  FROM m CROSS JOIN nd)
        |SELECT w AS token, total_cnt, doc_freq,
        |  floor(mean * 1e6 + 0.5) / 1e6 AS mean_per_doc,
        |  floor((CAST(sx2 AS DOUBLE) / n_docs - mean * mean) / mean
        |    * 1e4 + 0.5) / 1e4 AS vmr
        |FROM v ORDER BY total_cnt DESC, token LIMIT 20""".stripMargin,
    "data_temperature_mix" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 1125899906842623 AS BIGINT) AS h
        |  FROM documents),
        |wts AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT)
        |      AS weight_micro
        |  FROM docs GROUP BY 1),
        |tw AS (SELECT CAST(sum(weight_micro) AS BIGINT) AS tw FROM wts),
        |quotas AS (SELECT source, n_docs, weight_micro,
        |    (200 * weight_micro) // tw AS quota
        |  FROM wts CROSS JOIN tw),
        |r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
        |      AS rn
        |  FROM docs)
        |SELECT source, n_docs, weight_micro, quota,
        |  CAST(count(*) AS BIGINT) AS n_selected,
        |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
        |FROM r JOIN quotas USING (source) WHERE rn <= quota
        |GROUP BY source, n_docs, weight_micro, quota
        |ORDER BY source""".stripMargin,
    "q_katz_centrality" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT a, b FROM pairs
        |  UNION ALL SELECT b AS a, a AS b FROM pairs),
        |w1 AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS w1
        |  FROM edges GROUP BY 1),
        |w2 AS (SELECT e.a AS node, CAST(sum(w1.w1) AS BIGINT) AS w2
        |  FROM edges e JOIN w1 ON e.b = w1.node GROUP BY 1),
        |w3 AS (SELECT e.a AS node, CAST(sum(w2.w2) AS BIGINT) AS w3
        |  FROM edges e JOIN w2 ON e.b = w2.node GROUP BY 1),
        |k AS (SELECT w1.node, w1.w1, w2.w2, w3.w3,
        |    16 * w1.w1 + 4 * w2.w2 + w3.w3 AS katz_x64
        |  FROM w1 JOIN w2 ON w1.node = w2.node
        |    JOIN w3 ON w1.node = w3.node
        |  WHERE w1.node % 2 = 1)
        |SELECT CAST((node - 1) // 2 AS BIGINT) AS s_suppkey, w1, w2, w3,
        |  katz_x64,
        |  floor(CAST(katz_x64 AS DOUBLE) / 64 * 1e6 + 0.5) / 1e6 AS katz
        |FROM k ORDER BY katz_x64 DESC, s_suppkey LIMIT 20""".stripMargin,
    "q_eigenvector_centrality" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lp x JOIN lp y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey < y.l_partkey),
        |edges AS (SELECT a, b FROM pairs
        |  UNION ALL SELECT b AS a, a AS b FROM pairs),
        |w1 AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS w1
        |  FROM edges GROUP BY 1),
        |w2 AS (SELECT e.a AS node, CAST(sum(w1.w1) AS BIGINT) AS w2
        |  FROM edges e JOIN w1 ON e.b = w1.node GROUP BY 1),
        |w3 AS (SELECT e.a AS node, CAST(sum(w2.w2) AS BIGINT) AS w3
        |  FROM edges e JOIN w2 ON e.b = w2.node GROUP BY 1),
        |mx AS (SELECT max(w3) AS mx FROM w3)
        |SELECT w1.node AS l_partkey, w1.w1 AS degree, w3.w3 AS walks3,
        |  floor(CAST(w3.w3 AS DOUBLE) / mx * 1e6 + 0.5) / 1e6 AS centrality
        |FROM w1 JOIN w3 ON w1.node = w3.node CROSS JOIN mx
        |ORDER BY walks3 DESC, l_partkey LIMIT 20""".stripMargin,
    "q_bollinger" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT day, e4,
        |    row_number() OVER (ORDER BY day) AS rn,
        |    CAST(sum(e4) OVER (ORDER BY day
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
        |    sum(CAST(e4 AS HUGEINT) * e4) OVER (ORDER BY day
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s2
        |  FROM daily),
        |b AS (SELECT day, e4,
        |    CAST(s1 AS DOUBLE) / 20 / 10000 AS ma,
        |    sqrt(CAST(20 * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
        |      / 20 / 10000 AS sd
        |  FROM w WHERE rn >= 20)
        |SELECT day,
        |  floor(CAST(e4 AS DOUBLE) / 10000 * 100 + 0.5) / 100 AS rev,
        |  floor(ma * 10000 + 0.5) / 10000 AS ma20,
        |  floor(sd * 10000 + 0.5) / 10000 AS sd20,
        |  floor((ma + 2 * sd) * 10000 + 0.5) / 10000 AS upper_band,
        |  floor((ma - 2 * sd) * 10000 + 0.5) / 10000 AS lower_band,
        |  CASE WHEN CAST(e4 AS DOUBLE) / 10000 > ma + 2 * sd THEN 1
        |       WHEN CAST(e4 AS DOUBLE) / 10000 < ma - 2 * sd THEN -1
        |       ELSE 0 END AS breakout
        |FROM b ORDER BY day""".stripMargin,
    "q_rsi" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |df AS (SELECT day, e4 - lag(e4) OVER (ORDER BY day) AS diff
        |  FROM daily),
        |g AS (SELECT day,
        |    row_number() OVER (ORDER BY day) AS rn,
        |    CAST(sum(greatest(diff, 0)) OVER (ORDER BY day
        |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS gsum,
        |    CAST(sum(greatest(-diff, 0)) OVER (ORDER BY day
        |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS lsum
        |  FROM df WHERE diff IS NOT NULL)
        |SELECT day, gsum AS gain_sum, lsum AS loss_sum,
        |  CASE WHEN gsum + lsum > 0 THEN
        |    floor(100 * CAST(gsum AS DOUBLE) / (gsum + lsum)
        |      * 10000 + 0.5) / 10000 END AS rsi
        |FROM g WHERE rn >= 14 ORDER BY day""".stripMargin,
    "q_cliffs_delta" ->
      """WITH cells AS (SELECT l_returnflag = 'R' AS ret,
        |    CAST(round(l_quantity) AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT
        |    sum(CASE WHEN a.q > b.q THEN CAST(a.c AS HUGEINT) * b.c
        |      ELSE 0 END) AS gt,
        |    sum(CASE WHEN a.q < b.q THEN CAST(a.c AS HUGEINT) * b.c
        |      ELSE 0 END) AS lt,
        |    sum(CAST(a.c AS HUGEINT) * b.c) AS nn
        |  FROM (SELECT q, c FROM cells WHERE ret) a,
        |    (SELECT q, c FROM cells WHERE NOT ret) b)
        |SELECT
        |  floor((CAST(gt AS DOUBLE) / CAST(nn AS DOUBLE)
        |    - CAST(lt AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e6 + 0.5)
        |    / 1e6 AS cliffs_delta,
        |  floor((CAST(gt AS DOUBLE) / CAST(nn AS DOUBLE)
        |    - CAST(lt AS DOUBLE) / CAST(nn AS DOUBLE) + 1) / 2 * 1e6
        |    + 0.5) / 1e6 AS vargha_delaney_a,
        |  abs(CAST(gt AS DOUBLE) / CAST(nn AS DOUBLE)
        |    - CAST(lt AS DOUBLE) / CAST(nn AS DOUBLE)) < 0.147
        |    AS negligible_effect
        |FROM t""".stripMargin,
    "q_jonckheere" ->
      """WITH cells AS (SELECT o_orderpriority AS g,
        |    CAST(round(l_quantity) AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |j AS (SELECT sum(CAST(a.c AS HUGEINT) * b.c
        |      * (CASE WHEN a.q < b.q THEN 2
        |        WHEN a.q = b.q THEN 1 ELSE 0 END)) AS j2
        |  FROM cells a JOIN cells b ON a.g < b.g),
        |m AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |    sum(CAST(n_g AS HUGEINT) * n_g) AS sn2,
        |    sum(CAST(n_g AS HUGEINT) * n_g * (2 * n_g + 3)) AS sn3,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM (SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM cells
        |    GROUP BY 1)),
        |t AS (SELECT n, k, CAST(j2 AS DOUBLE) / 2 AS j,
        |    (CAST(n AS DOUBLE) * n - CAST(sn2 AS DOUBLE)) / 4 AS e,
        |    (CAST(n AS DOUBLE) * n * (2 * n + 3)
        |      - CAST(sn3 AS DOUBLE)) / 72 AS v
        |  FROM j, m)
        |SELECT n, k, floor(j * 10 + 0.5) / 10 AS j_stat,
        |  floor(e * 10 + 0.5) / 10 AS j_mean,
        |  floor((j - e) / sqrt(v) * 1e4 + 0.5) / 1e4 AS z_notie,
        |  (j - e) / sqrt(v) > 1.645 AS increasing_5pct
        |FROM t""".stripMargin,
    "q_page_trend" ->
      """WITH cells AS (SELECT l_orderkey,
        |    max(CASE WHEN l_linenumber = 1
        |      THEN CAST(round(l_quantity) AS BIGINT) END) AS q1,
        |    max(CASE WHEN l_linenumber = 2
        |      THEN CAST(round(l_quantity) AS BIGINT) END) AS q2,
        |    max(CASE WHEN l_linenumber = 3
        |      THEN CAST(round(l_quantity) AS BIGINT) END) AS q3
        |  FROM lineitem WHERE l_linenumber <= 3 GROUP BY 1),
        |f AS (SELECT * FROM cells WHERE q1 IS NOT NULL
        |  AND q2 IS NOT NULL AND q3 IS NOT NULL),
        |r AS (SELECT
        |    2 * ((CASE WHEN q2 < q1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN q3 < q1 THEN 1 ELSE 0 END))
        |      + (CASE WHEN q2 = q1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN q3 = q1 THEN 1 ELSE 0 END) + 2 AS r2_1,
        |    2 * ((CASE WHEN q1 < q2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN q3 < q2 THEN 1 ELSE 0 END))
        |      + (CASE WHEN q1 = q2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN q3 = q2 THEN 1 ELSE 0 END) + 2 AS r2_2,
        |    2 * ((CASE WHEN q1 < q3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN q2 < q3 THEN 1 ELSE 0 END))
        |      + (CASE WHEN q1 = q3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN q2 = q3 THEN 1 ELSE 0 END) + 2 AS r2_3
        |  FROM f),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(r2_1) + 2 * sum(r2_2) + 3 * sum(r2_3) AS BIGINT)
        |      AS l2
        |  FROM r)
        |SELECT n_blocks,
        |  floor(CAST(l2 AS DOUBLE) / 2 * 10 + 0.5) / 10 AS page_l,
        |  floor((12 * (CAST(l2 AS DOUBLE) / 2)
        |    - 3 * CAST(n_blocks AS DOUBLE) * 3 * 16)
        |    / sqrt(CAST(n_blocks AS DOUBLE) * 9 * 8 * 4) * 1e4 + 0.5)
        |    / 1e4 AS z_stat,
        |  (12 * (CAST(l2 AS DOUBLE) / 2)
        |    - 3 * CAST(n_blocks AS DOUBLE) * 3 * 16)
        |    / sqrt(CAST(n_blocks AS DOUBLE) * 9 * 8 * 4) > 1.645
        |    AS increasing_5pct
        |FROM t""".stripMargin,
    "q_stratified_ate" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |a AS (SELECT n_ev, cents,
        |    (md5_number_lower(CAST(user_id AS VARCHAR))
        |      & 9223372036854775807) % 2 AS arm,
        |    CAST(ntile(5) OVER (ORDER BY n_ev, user_id) AS BIGINT)
        |      AS stratum
        |  FROM u),
        |c AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n_s,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN arm = 1 THEN cents ELSE 0 END)
        |      AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0,
        |    CAST(sum(CASE WHEN arm = 0 THEN cents ELSE 0 END)
        |      AS BIGINT) AS s0
        |  FROM a GROUP BY 1),
        |d AS (SELECT *, (s1 * 1000000) // nullif(n1, 0)
        |    - (s0 * 1000000) // nullif(n0, 0) AS d6 FROM c),
        |t AS (SELECT CAST(sum(CASE WHEN d6 IS NOT NULL THEN n_s END)
        |      AS BIGINT) AS nn,
        |    CAST(sum(n_s * d6) AS BIGINT) AS w6 FROM d)
        |SELECT stratum, n_s, n1, n0,
        |  floor(CAST(d6 AS DOUBLE) / 1e6 / 100 * 1e4 + 0.5) / 1e4
        |    AS diff_dollars,
        |  (SELECT floor(CAST(w6 AS DOUBLE) / nn / 1e6 / 100 * 1e4
        |    + 0.5) / 1e4 FROM t) AS ate_dollars
        |FROM d ORDER BY stratum""".stripMargin,
    "q_moods_median" ->
      """WITH x AS (SELECT c_nationkey AS g, c_custkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, c_custkey)
        |      AS rn, count(*) OVER () AS tot FROM x),
        |m AS (SELECT min(v) AS med FROM r WHERE rn = (tot + 1) // 2),
        |cell AS (SELECT g,
        |    CAST(sum(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS above,
        |    CAST(sum(CASE WHEN v <= med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS at_below,
        |    max(med) AS median_cents
        |  FROM x, m GROUP BY 1),
        |e AS (SELECT *, above + at_below AS n_g,
        |    sum(above + at_below) OVER () AS n,
        |    sum(above) OVER () AS ta, sum(at_below) OVER () AS tb
        |  FROM cell),
        |f AS (SELECT g, median_cents, above, at_below,
        |    floor(CAST(n_g AS DOUBLE) * ta / n * 1e6 + 0.5) / 1e6 AS ea,
        |    floor(CAST(n_g AS DOUBLE) * tb / n * 1e6 + 0.5) / 1e6 AS eb
        |  FROM e),
        |c2 AS (SELECT g, median_cents, above, at_below,
        |    floor((pow(above - ea, 2) / ea
        |      + pow(at_below - eb, 2) / eb) * 1e4 + 0.5) / 1e4
        |      AS contrib
        |  FROM f)
        |SELECT g AS nationkey, median_cents, above, at_below, contrib,
        |  floor(sum(contrib) OVER () * 1e4 + 0.5) / 1e4 AS chi2
        |FROM c2 ORDER BY nationkey""".stripMargin,
    "q_partial_corr" ->
      """WITH x AS (SELECT l_returnflag AS g,
        |    CAST(round(l_quantity) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
        |    CAST(round(l_discount * 100) AS BIGINT) AS z
        |  FROM lineitem),
        |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(z) AS BIGINT) AS sz,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(z AS HUGEINT) * z) AS szz,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * z) AS sxz,
        |    sum(CAST(y AS HUGEINT) * z) AS syz
        |  FROM x GROUP BY 1),
        |r AS (SELECT g, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |   / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
        |  (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
        |   / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
        |      - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
        |  (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
        |    - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
        |   / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
        |      - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz
        |  FROM m)
        |SELECT g AS returnflag, n,
        |  floor(rxy * 1e4 + 0.5) / 1e4 AS r_xy,
        |  floor(rxz * 1e4 + 0.5) / 1e4 AS r_xz,
        |  floor(ryz * 1e4 + 0.5) / 1e4 AS r_yz,
        |  floor((rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz)
        |    * (1.0 - ryz * ryz)) * 1e4 + 0.5) / 1e4 AS r_xy_given_z
        |FROM r ORDER BY returnflag""".stripMargin,
    "q_icc" ->
      """WITH g AS (SELECT c_nationkey AS g,
        |    CAST(round(c_acctbal) AS BIGINT) + 1000 AS c
        |  FROM customer),
        |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(c) AS BIGINT) AS sx,
        |    sum(CAST(c AS HUGEINT) * c) AS sxx FROM g GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(sum(sx) AS BIGINT) AS s, sum(sxx) AS s2,
        |    sum(CAST(sx // n_g AS HUGEINT) * sx
        |      + (CAST(sx % n_g AS HUGEINT) * sx) // n_g) AS sb,
        |    sum(CAST(n_g AS HUGEINT) * n_g) AS sn2 FROM m),
        |u AS (SELECT k, n,
        |    CAST(sb AS DOUBLE) - CAST(CAST(s // n AS HUGEINT) * s
        |      + (CAST(s % n AS HUGEINT) * s) // n AS DOUBLE) AS ssb,
        |    CAST(s2 AS DOUBLE) - CAST(sb AS DOUBLE) AS ssw,
        |    (n - CAST(sn2 AS DOUBLE) / n) / (k - 1) AS n0
        |  FROM t),
        |v AS (SELECT k, n, ssb / (k - 1) AS msb,
        |    ssw / (n - k) AS msw, n0 FROM u)
        |SELECT k, n, floor(msb * 100 + 0.5) / 100 AS msb,
        |  floor(msw * 100 + 0.5) / 100 AS msw,
        |  floor(n0 * 1e4 + 0.5) / 1e4 AS n0,
        |  floor((msb - msw) / (msb + (n0 - 1) * msw) * 1e6 + 0.5)
        |    / 1e6 AS icc1
        |FROM v""".stripMargin,
    "q_hellinger_bc" ->
      """WITH b AS (SELECT
        |    least(19, CAST(round(value * 10000) AS BIGINT) // 300000)
        |      AS bin,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS p
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase')
        |    AND value IS NOT NULL
        |  GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
        |    CAST(sum(c) AS BIGINT) AS nc, CAST(sum(p) AS BIGINT) AS np,
        |    CAST(sum(CAST(floor(sqrt(CAST(c * p AS DOUBLE)) * 1e6)
        |      AS BIGINT)) AS BIGINT) AS t6
        |  FROM b)
        |SELECT n_bins, nc, np,
        |  floor(CAST(t6 AS DOUBLE) / 1e6
        |    / sqrt(CAST(nc AS DOUBLE) * np) * 1e6 + 0.5) / 1e6
        |    AS bhattacharyya,
        |  floor(sqrt(1.0 - CAST(t6 AS DOUBLE) / 1e6
        |    / sqrt(CAST(nc AS DOUBLE) * np)) * 1e6 + 0.5) / 1e6
        |    AS hellinger
        |FROM t""".stripMargin,
    "q_anderson_darling" ->
      """WITH secs AS (SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT)
        |      AS t FROM events WHERE event_type = 'purchase'),
        |g0 AS (SELECT t - lag(t) OVER (ORDER BY t) AS gap FROM secs),
        |gg AS (SELECT gap FROM g0 WHERE gap IS NOT NULL),
        |r AS (SELECT gap, row_number() OVER (ORDER BY gap) AS i,
        |    count(*) OVER () AS n FROM gg),
        |l AS (SELECT CAST(count(*) AS BIGINT) AS _n,
        |    CAST(sum(gap) AS BIGINT) AS _sx FROM gg),
        |term AS (SELECT n, _sx,
        |    CAST(floor(((2 * i - 1)
        |      * ln(1.0 - exp(-(CAST(_n AS DOUBLE) / _sx * gap)))
        |      + (2 * n - 2 * i + 1)
        |      * (-(CAST(_n AS DOUBLE) / _sx * gap))) * 1e6 / n)
        |      AS BIGINT) AS t6
        |  FROM r, l)
        |SELECT CAST(max(n) AS BIGINT) AS n_gaps,
        |  CAST(max(_sx) AS BIGINT) AS sum_gap_s,
        |  floor(CAST(max(n) AS DOUBLE) / max(_sx) * 1e6 + 0.5) / 1e6
        |    AS lambda,
        |  floor((-max(n) - sum(t6) / 1e6) * 1e4 + 0.5) / 1e4 AS a2_stat,
        |  (-max(n) - sum(t6) / 1e6) > 1.321
        |    AS reject_exponential_5pct
        |FROM term""".stripMargin,
    "q_obv" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |      AS vol
        |  FROM lineitem GROUP BY 1),
        |s AS (SELECT day, vol,
        |    CAST(coalesce(sign(e4 - lag(e4) OVER (ORDER BY day)), 0)
        |      AS BIGINT) AS direction
        |  FROM daily)
        |SELECT day, vol AS volume, direction,
        |  CAST(sum(direction * vol) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS obv
        |FROM s ORDER BY day""".stripMargin,
    "q_ulcer_index" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |p AS (SELECT day, e4,
        |    CAST(max(e4) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS peak
        |  FROM daily),
        |r AS (SELECT (CAST(peak - e4 AS HUGEINT) * (peak - e4)
        |      * 100000000) // (CAST(peak AS HUGEINT) * peak) AS r8
        |  FROM p)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  floor(sqrt(CAST(max(r8) AS DOUBLE) / 1e8) * 100 * 1e4 + 0.5)
        |    / 1e4 AS max_dd_pct,
        |  floor(sqrt(CAST(sum(r8) AS DOUBLE) / count(*) / 1e8) * 100
        |    * 1e4 + 0.5) / 1e4 AS ulcer_index
        |FROM r""".stripMargin,
    "q_parkinson_vol" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS h,
        |    CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS l
        |  FROM lineitem GROUP BY 1),
        |p AS (SELECT strftime(day, '%Y-%m') AS month,
        |    CAST(floor(pow(ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE)),
        |      2) * 1e12) AS BIGINT) AS p12
        |  FROM daily)
        |SELECT month, CAST(count(*) AS BIGINT) AS n_days,
        |  floor(sqrt(CAST(sum(p12) AS DOUBLE) / 1e12
        |    / (4 * ln(2) * count(*))) * 1e6 + 0.5) / 1e6
        |    AS parkinson_vol
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_drawdown" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |p AS (SELECT day, e4,
        |    CAST(max(e4) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS peak
        |  FROM daily)
        |SELECT day,
        |  floor(CAST(e4 AS DOUBLE) / 10000 * 100 + 0.5) / 100 AS rev,
        |  floor(CAST(peak AS DOUBLE) / 10000 * 100 + 0.5) / 100 AS peak_rev,
        |  floor(CAST(peak - e4 AS DOUBLE) / 10000 * 100 + 0.5) / 100
        |    AS drawdown,
        |  floor(CAST(peak - e4 AS DOUBLE) / CAST(peak AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS dd_pct,
        |  CAST(e4 = peak AS INT) AS is_peak
        |FROM p ORDER BY day""".stripMargin,
    "q_croston" ->
      """WITH dd AS (
        |  SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT l_partkey,
        |    CAST(count(*) AS BIGINT) AS n_demand_days,
        |    CAST(sum(q) AS BIGINT) AS qty_total,
        |    CAST(sum(q * q) AS BIGINT) AS q2,
        |    CAST(date_diff('day', min(day), max(day)) AS BIGINT)
        |      AS span_days
        |  FROM dd GROUP BY 1)
        |SELECT l_partkey, n_demand_days, qty_total, span_days,
        |  floor(CAST(span_days AS DOUBLE) / (n_demand_days - 1)
        |    * 10000 + 0.5) / 10000 AS adi,
        |  floor(CAST(n_demand_days * q2 - qty_total * qty_total AS DOUBLE)
        |    / (CAST(qty_total AS DOUBLE) * qty_total) * 10000 + 0.5) / 10000
        |    AS cv2,
        |  floor(CAST(qty_total AS DOUBLE) * (n_demand_days - 1)
        |    / (CAST(n_demand_days AS DOUBLE) * span_days) * 10000 + 0.5)
        |    / 10000 AS forecast_daily,
        |  CASE WHEN span_days * 100 > 132 * (n_demand_days - 1) THEN
        |    CASE WHEN (n_demand_days * q2 - qty_total * qty_total) * 100
        |      > 49 * qty_total * qty_total THEN 'lumpy'
        |      ELSE 'intermittent' END
        |  ELSE
        |    CASE WHEN (n_demand_days * q2 - qty_total * qty_total) * 100
        |      > 49 * qty_total * qty_total THEN 'erratic'
        |      ELSE 'smooth' END END AS demand_class
        |FROM m WHERE n_demand_days >= 2
        |ORDER BY l_partkey""".stripMargin,
    "q_jarque_bera" ->
      """WITH m AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(q) AS BIGINT) AS s1, CAST(sum(q*q) AS BIGINT) AS s2,
        |    CAST(sum(q*q*q) AS BIGINT) AS s3,
        |    CAST(sum(q*q*q*q) AS BIGINT) AS s4
        |  FROM (SELECT l_returnflag, l_linestatus,
        |          CAST(round(l_quantity) AS BIGINT) AS q FROM lineitem)
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT *, CAST(s1 AS DOUBLE) / n AS mu FROM m),
        |c AS (
        |  SELECT *,
        |    CAST(s2 AS DOUBLE) / n - mu * mu AS m2,
        |    CAST(s3 AS DOUBLE) / n - 3 * mu * (CAST(s2 AS DOUBLE) / n)
        |      + 2 * mu * mu * mu AS m3,
        |    CAST(s4 AS DOUBLE) / n - 4 * mu * (CAST(s3 AS DOUBLE) / n)
        |      + 6 * mu * mu * (CAST(s2 AS DOUBLE) / n)
        |      - 3 * mu * mu * mu * mu AS m4
        |  FROM e),
        |k AS (
        |  SELECT *, m3 / sqrt(m2 * m2 * m2) AS skew, m4 / (m2 * m2) AS kurt
        |  FROM c)
        |SELECT l_returnflag, l_linestatus, n,
        |  floor(mu * 10000 + 0.5) / 10000 AS mean_q,
        |  floor(skew * 10000 + 0.5) / 10000 AS skewness,
        |  floor(kurt * 10000 + 0.5) / 10000 AS kurtosis,
        |  floor(n * (skew * skew + (kurt - 3) * (kurt - 3) / 4) / 6
        |    * 10000 + 0.5) / 10000 AS jb_stat
        |FROM k ORDER BY 1, 2""".stripMargin,
    "q_kruskal_wallis" ->
      """WITH cust AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS g,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer),
        |vals AS (SELECT v, CAST(count(*) AS BIGINT) AS t
        |  FROM cust GROUP BY 1),
        |rk AS (SELECT v, t,
        |    2 * CAST(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - t + 1 AS r2
        |  FROM vals),
        |cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM cust GROUP BY 1, 2),
        |grp AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_j,
        |    CAST(sum(c * r2) AS BIGINT) AS r2_sum
        |  FROM cells JOIN rk USING (v) GROUP BY 1),
        |tt AS (SELECT CAST(sum(t) AS BIGINT) AS n_total,
        |    sum(CAST(t AS HUGEINT) * t * t - t) AS tie_term FROM vals),
        |hn AS (SELECT
        |    sum((CAST(r2_sum AS HUGEINT) * r2_sum * 3) // n_j) AS s3q,
        |    CAST(count(*) AS BIGINT) AS n_groups FROM grp),
        |h AS (SELECT n_groups, n_total,
        |    CAST(s3q AS DOUBLE) / (CAST(n_total AS DOUBLE) * (n_total + 1))
        |      - 3 * (n_total + 1) AS h_stat,
        |    CAST(n_total AS HUGEINT) * n_total * n_total - n_total AS nn,
        |    tie_term
        |  FROM hn CROSS JOIN tt)
        |SELECT g AS nationkey, n_j, r2_sum,
        |  floor(CAST(r2_sum AS DOUBLE) / (2 * n_j) * 10000 + 0.5) / 10000
        |    AS mean_rank,
        |  n_groups, n_total,
        |  floor(h_stat * 10000 + 0.5) / 10000 AS h_stat,
        |  floor(h_stat * CAST(nn AS DOUBLE) / CAST(nn - tie_term AS DOUBLE)
        |    * 10000 + 0.5) / 10000 AS h_adj
        |FROM grp CROSS JOIN h ORDER BY 1""".stripMargin,
    "q_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |med AS (SELECT e4 AS med FROM (
        |    SELECT e4, row_number() OVER (ORDER BY e4, day) AS rn,
        |      count(*) OVER () AS nd FROM daily)
        |  WHERE rn = (nd + 1) // 2),
        |sg AS (SELECT day, CAST(e4 > med AS INT) AS s
        |  FROM daily CROSS JOIN med WHERE e4 <> med),
        |runs AS (SELECT
        |    CAST(sum(s) AS BIGINT) AS n_above,
        |    CAST(sum(1 - s) AS BIGINT) AS n_below,
        |    1 + CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> s
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
        |  FROM (SELECT s, lag(s) OVER (ORDER BY day) AS prev FROM sg)),
        |z AS (SELECT *,
        |    2.0 * n_above * n_below / (n_above + n_below) + 1 AS mu
        |  FROM runs)
        |SELECT n_above, n_below, n_runs,
        |  floor(mu * 10000 + 0.5) / 10000 AS mu_runs,
        |  floor((n_runs - mu) / sqrt((mu - 1) * (mu - 2)
        |    / (n_above + n_below - 1)) * 10000 + 0.5) / 10000 AS z_stat
        |FROM z""".stripMargin,
    "q_herfindahl" ->
      """WITH rev AS (
        |  SELECT CAST(s_nationkey AS BIGINT) AS nationkey, s_suppkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS rev
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |agg AS (SELECT nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
        |    CAST(sum(rev) AS BIGINT) AS tot,
        |    sum(CAST(rev AS HUGEINT) * rev) AS ssq,
        |    CAST(max(rev) AS BIGINT) AS mx
        |  FROM rev GROUP BY 1),
        |hh AS (SELECT *, floor(CAST(ssq AS DOUBLE) /
        |    (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) * 1000000 + 0.5)
        |    / 1000000 AS hhi
        |  FROM agg)
        |SELECT nationkey, n_suppliers, hhi,
        |  CASE WHEN n_suppliers >= 2 THEN
        |    floor((hhi - 1.0 / n_suppliers) / (1 - 1.0 / n_suppliers)
        |      * 1000000 + 0.5) / 1000000 END AS hhi_norm,
        |  floor(CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS top_share
        |FROM hh ORDER BY 1""".stripMargin,
    "q_price_index" ->
      """WITH pm AS (
        |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
        |    l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS rev,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |pm2 AS (SELECT *, (rev * 100) // qty AS uv2 FROM pm),
        |base AS (SELECT l_partkey, uv2 AS uv0, qty AS q0
        |  FROM pm2 WHERE month = (SELECT min(month) FROM pm2)),
        |j AS (SELECT month, CAST(count(*) AS BIGINT) AS n_parts,
        |    CAST(sum(uv2 * q0) AS BIGINT) AS lnum,
        |    CAST(sum(uv0 * q0) AS BIGINT) AS lden,
        |    CAST(sum(uv2 * qty) AS BIGINT) AS pnum,
        |    CAST(sum(uv0 * qty) AS BIGINT) AS pden
        |  FROM pm2 JOIN base USING (l_partkey) GROUP BY 1),
        |r AS (SELECT month, n_parts,
        |    floor(CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE)
        |      * 1000000 + 0.5) / 1000000 AS laspeyres,
        |    floor(CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE)
        |      * 1000000 + 0.5) / 1000000 AS paasche
        |  FROM j)
        |SELECT month, n_parts, laspeyres, paasche,
        |  floor(sqrt(laspeyres * paasche) * 1000000 + 0.5) / 1000000
        |    AS fisher
        |FROM r ORDER BY 1""".stripMargin,
    "q_sample_balanced" ->
      """WITH v AS (
        |  SELECT vec_id, label,
        |    CAST(md5_number_lower(CAST(vec_id AS VARCHAR))
        |      & 1125899906842623 AS BIGINT) AS h
        |  FROM embeddings),
        |m AS (SELECT min(n) AS m FROM (
        |    SELECT count(*) AS n FROM v GROUP BY label)),
        |r AS (SELECT vec_id, label,
        |    row_number() OVER (PARTITION BY label ORDER BY h, vec_id)
        |      AS rn
        |  FROM v)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(vec_id) AS BIGINT) AS id_checksum
        |FROM r CROSS JOIN m WHERE rn <= m
        |GROUP BY label ORDER BY label""".stripMargin,
    "q_sample_systematic" ->
      """WITH w AS (
        |  SELECT doc_id, n_chars,
        |    CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 1125899906842623 AS BIGINT) AS hkey
        |  FROM documents WHERE n_chars > 0),
        |c AS (
        |  SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY hkey, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM w),
        |t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tot FROM w),
        |p AS (
        |  SELECT CAST(range AS BIGINT) AS sample_idx,
        |    CAST((2 * range + 1) * tot // 40 AS BIGINT) AS pos
        |  FROM range(20) CROSS JOIN t)
        |SELECT sample_idx, pos, doc_id, n_chars
        |FROM p JOIN c ON pos >= cum - n_chars AND pos < cum
        |ORDER BY sample_idx""".stripMargin,
    "data_interleave_mixture" ->
      """WITH s AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS BIGINT) AS seq
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, source, seq,
        |    CAST(seq AS DOUBLE) /
        |      (CASE WHEN source IN ('src0','src1','src2','src3','src4')
        |            THEN 40 ELSE 15 END) AS vtime
        |  FROM s),
        |r AS (
        |  SELECT doc_id, source, seq,
        |    CAST(row_number() OVER (ORDER BY vtime, source, doc_id)
        |      AS BIGINT) AS slot
        |  FROM v)
        |SELECT slot, source, seq, doc_id FROM r WHERE slot <= 50
        |ORDER BY slot""".stripMargin,
    // bm25: every non-ln step is exactly-rounded IEEE arithmetic with
    // the identical expression tree as the Spark side; the 4-dp round
    // absorbs any last-ulp ln() difference between libms
    "text_bm25_rank" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |pd AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl,
        |    CAST(count(*) FILTER (w = 'spark') AS BIGINT) AS tf_a,
        |    CAST(count(*) FILTER (w = 'vector') AS BIGINT) AS tf_b,
        |    CAST(count(*) FILTER (w = 'stream') AS BIGINT) AS tf_c
        |  FROM tok GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS tot,
        |    CAST(count(*) FILTER (tf_a > 0) AS BIGINT) AS df_a,
        |    CAST(count(*) FILTER (tf_b > 0) AS BIGINT) AS df_b,
        |    CAST(count(*) FILTER (tf_c > 0) AS BIGINT) AS df_c
        |  FROM pd),
        |sc AS (
        |  SELECT doc_id, dl, round(
        |    (CASE WHEN tf_a > 0
        |      THEN ln(1.0 + (n_docs - df_a + 0.5) / (df_a + 0.5)) *
        |        (CAST(tf_a AS DOUBLE) * 2.2 / (CAST(tf_a AS DOUBLE) +
        |          1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
        |            (CAST(tot AS DOUBLE) / n_docs)))))
        |      ELSE 0.0 END) +
        |    (CASE WHEN tf_b > 0
        |      THEN ln(1.0 + (n_docs - df_b + 0.5) / (df_b + 0.5)) *
        |        (CAST(tf_b AS DOUBLE) * 2.2 / (CAST(tf_b AS DOUBLE) +
        |          1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
        |            (CAST(tot AS DOUBLE) / n_docs)))))
        |      ELSE 0.0 END) +
        |    (CASE WHEN tf_c > 0
        |      THEN ln(1.0 + (n_docs - df_c + 0.5) / (df_c + 0.5)) *
        |        (CAST(tf_c AS DOUBLE) * 2.2 / (CAST(tf_c AS DOUBLE) +
        |          1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
        |            (CAST(tot AS DOUBLE) / n_docs)))))
        |      ELSE 0.0 END), 4) AS score
        |  FROM pd CROSS JOIN m)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |    AS BIGINT) AS rnk,
        |  doc_id, dl, score
        |FROM sc ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    // A-ES weighted reservoir: the exponential race key −ln(u)/w from
    // the identical portable uniform u = (md5-lower-50 + 1)/2⁵⁰; ln,
    // negate, divide are each ≤1-ulp, key spacing ~10 orders above an
    // ulp, and the reported key is floor-scaled (the verify skill's
    // cross-engine rounding rule)
    "q_sample_weighted_reservoir" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |    -ln(CAST((md5_number_lower(concat(CAST(doc_id AS VARCHAR),
        |          ':wr')) & 1125899906842623) + 1 AS DOUBLE)
        |        / 1125899906842624.0) / n_chars AS _key
        |  FROM documents WHERE n_chars > 0),
        |r AS (
        |  SELECT doc_id, n_chars, _key,
        |    CAST(row_number() OVER (ORDER BY _key, doc_id) AS BIGINT)
        |      AS rank
        |  FROM k)
        |SELECT rank, doc_id, n_chars,
        |  CAST(floor(_key * 1e12 + 0.5) AS BIGINT) AS key_1e12
        |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin,
    "q_sample_weighted" ->
      """WITH h AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
        |        & 1125899906842623 AS BIGINT)::DOUBLE / n_chars AS k
        |  FROM documents WHERE n_chars > 0),
        |r AS (
        |  SELECT source, doc_id, n_chars, CAST(row_number() OVER (
        |    PARTITION BY source ORDER BY k, doc_id) AS BIGINT) AS rn
        |  FROM h)
        |SELECT source, rn, doc_id, n_chars
        |FROM r WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin,
    "q_lateral_topn" ->
      """SELECT n_name, s.s_name, s.s_acctbal
        |FROM nation n, LATERAL (
        |  SELECT s_name, s_acctbal FROM supplier
        |  WHERE s_nationkey = n.n_nationkey
        |  ORDER BY s_acctbal DESC, s_name LIMIT 2) s
        |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin,
    "q_scd2_build" ->
      """WITH x AS (
        |  SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
        |    lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS vt
        |  FROM events WHERE user_id < 10)
        |SELECT user_id, event_type, valid_from_s,
        |  coalesce(vt, 9999999999) AS valid_to_s,
        |  (vt IS NULL) AS is_current
        |FROM x ORDER BY user_id, valid_from_s""".stripMargin,
    "q_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |    arg_max(value, event_id) AS pval
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |e AS (
        |  SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events)
        |SELECT e.event_id, round(p.pval, 2) AS last_purchase
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts_s >= p.ts_s
        |ORDER BY e.event_id""".stripMargin,
    "q_asof_tolerance" -> asofToleranceOracle,
    // the native watermarked interval-join formulation is contracted
    // to converge to the SAME bounded-staleness as-of answer — the
    // batch oracle shared verbatim
    "stream_asof_interval" -> asofToleranceOracle,
    "q_interval_align" ->
      """WITH li AS (
        |  SELECT CAST(l_shipdate AS DATE) AS ship,
        |    CAST(l_shipdate AS DATE) +
        |      CAST((l_orderkey * 7 + l_linenumber) % 45 + 1 AS INTEGER)
        |      AS rcpt,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
        |      AS BIGINT) AS cents
        |  FROM lineitem),
        |mo AS (
        |  SELECT ship, rcpt, cents,
        |    unnest(generate_series(date_trunc('month', ship),
        |      date_trunc('month', rcpt), INTERVAL 1 MONTH))::DATE AS m
        |  FROM li),
        |a AS (
        |  SELECT strftime(m, '%Y-%m') AS month, cents,
        |    datediff('day', greatest(ship, m),
        |      least(rcpt, (m + INTERVAL 1 MONTH - INTERVAL 1 DAY)::DATE))
        |      + 1 AS ov_days,
        |    datediff('day', ship, rcpt) + 1 AS tot_days
        |  FROM mo)
        |SELECT month, CAST(count(*) AS BIGINT) AS n_legs,
        |  round(CAST(sum(cents * ov_days // tot_days) AS DOUBLE) / 100,
        |    2) AS alloc_rev
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_interp_impute" ->
      """WITH k AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
        |    round(max(value), 2) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |g AS (
        |  SELECT user_id,
        |    unnest(generate_series(min(hr), max(hr))) AS hr
        |  FROM k GROUP BY user_id),
        |j AS (
        |  SELECT g.user_id, g.hr, k.v
        |  FROM g LEFT JOIN k ON g.user_id = k.user_id AND g.hr = k.hr),
        |f AS (
        |  SELECT user_id, hr, v,
        |    last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |    last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pval,
        |    first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh,
        |    first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hr
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nval
        |  FROM j)
        |SELECT user_id, hr,
        |  CAST(floor((CASE WHEN v IS NOT NULL THEN v
        |    ELSE pval + (nval - pval) *
        |      CAST(hr - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE) END)
        |    * 10000.0 + 0.5) AS BIGINT) AS val_e4,
        |  v IS NULL AS interpolated
        |FROM f ORDER BY user_id, hr""".stripMargin,
    "q_range_join" ->
      """WITH bands AS (
        |  SELECT CAST(range AS BIGINT) AS band_id,
        |    range * 100000.0 AS lo, (range + 1) * 100000.0 AS hi
        |  FROM range(5))
        |SELECT band_id, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN bands
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch(ts) AS tsec,
        |    lag(epoch(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts, tsec,
        |    CASE WHEN prev IS NULL OR tsec - prev >= 1800.0
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |x AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM s)
        |SELECT user_id, count(*) AS n_events,
        |  min(CAST(floor(epoch(ts)) AS BIGINT)) AS start_s,
        |  max(CAST(floor(epoch(ts)) AS BIGINT)) AS end_s
        |FROM x GROUP BY user_id, sess_id
        |ORDER BY user_id, start_s""".stripMargin,
    "source_orc_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "source_xml_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  round(sum(CASE WHEN o_orderstatus = 'F'
        |    THEN o_totalprice END), 2) AS F,
        |  round(sum(CASE WHEN o_orderstatus = 'O'
        |    THEN o_totalprice END), 2) AS O,
        |  round(sum(CASE WHEN o_orderstatus = 'P'
        |    THEN o_totalprice END), 2) AS P
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_unpivot" ->
      """WITH w AS (
        |  SELECT o_orderstatus, round(avg(o_totalprice), 2) AS avg_price,
        |    CAST(count(*) AS DOUBLE) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT o_orderstatus, metric, value FROM (
        |  SELECT o_orderstatus, 'avg_price' AS metric, avg_price AS value
        |  FROM w
        |  UNION ALL
        |  SELECT o_orderstatus, 'n_orders', n_orders FROM w) u
        |ORDER BY o_orderstatus, metric""".stripMargin,
    "q_sql_subquery" ->
      """WITH pricey AS (
        |  SELECT o_custkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders))
        |SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM pricey GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_watermark_append" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
        |    AS win_start_s,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev IS NULL
        |           OR CAST(floor(epoch(ts)) AS BIGINT)
        |              - CAST(floor(epoch(prev)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |x AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM s),
        |g AS (
        |  SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |    count(*) AS n_events,
        |    min(CAST(floor(epoch(ts)) AS BIGINT)) AS start_s,
        |    max(CAST(floor(epoch(ts)) AS BIGINT)) AS end_s
        |  FROM x GROUP BY 1, 2)
        |SELECT user_id, sess_id, n_events, start_s, end_s FROM (
        |  SELECT g.*, max(sess_id) OVER (PARTITION BY user_id) AS mx FROM g) t
        |WHERE sess_id < mx ORDER BY user_id, sess_id""".stripMargin,
    "stream_incremental_ingest" ->
      """WITH u AS (
        |  SELECT user_id, value FROM events
        |  UNION ALL
        |  SELECT user_id, value FROM events WHERE event_type = 'purchase')
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rolling_hll_wau" ->
      """WITH e AS (
        |  SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400
        |    AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM e),
        |r AS (SELECT d.day, count(DISTINCT e.user_id) AS n_exact
        |  FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY 1)
        |SELECT day, CAST(n_exact AS BIGINT) AS n_exact,
        |  true AS within_5pct
        |FROM r ORDER BY day""".stripMargin,
    "stream_static_join" ->
      """SELECT 't' || CAST(c_custkey % 4 AS VARCHAR) AS tier,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_join" ->
      """WITH c AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS c_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS p_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, count(*) AS n_pairs
        |FROM c JOIN p ON p.user_id = c.user_id
        |  AND p.p_ts >= c.c_ts AND p.p_ts <= c.c_ts + 3600
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "source_json_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "source_csv_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // §2.3 — every approximate-family query carries a real oracle:
    // LSH/cluster outputs are exact-verified (true-Jaccard ⊇ check also
    // proves recall), SimHash signatures are md5-replicated in SQL,
    // sketches assert error bounds, multimodal stubs are replayed
    // byte-for-byte. The single remaining rows-only query is
    // ann_ivf_topk (an ML-trained KMeans quantizer is not
    // ANSI-expressible; its recall is spec-asserted in IvfSpec).
    "shred_typed_children" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    CASE WHEN l_linenumber = 7 THEN 'exotic'
        |         WHEN l_quantity > 25 THEN 'big'
        |         ELSE 'small' END AS t
        |  FROM lineitem WHERE l_orderkey % 20 = 0)
        |SELECT t AS item_type, count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM src WHERE t IN ('big', 'small')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "source_text_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "sink_partitioned_prune" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE year(o_orderdate) = 1997
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_schema_merge" ->
      """SELECT doc_id, n_chars,
        |  CASE WHEN doc_id % 2 = 0 THEN '<v1>' ELSE lang END AS lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "sink_compaction" ->
      """SELECT count(*) AS n_rows,
        |  round(sum(o_totalprice), 2) AS total,
        |  TRUE AS compacted, TRUE AS bounded
        |FROM orders""".stripMargin,
    "q_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // recall-proving oracle: the exact all-pairs Jaccard ≥ 0.5 set must
    // EQUAL the LSH-candidate → exact-verified set (a missed true pair
    // would surface as an oracle row Spark lacks)
    "dedup_minhash_lsh" ->
      s"""WITH ${shingleCte("documents")},
         |u AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) > 0),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM u a JOIN u b ON b.g = a.g AND b.doc_id > a.doc_id),
         |p AS (
         |  SELECT id_a, id_b, sa.s AS sa, sb.s AS sb
         |  FROM cand
         |  JOIN sh sa ON sa.doc_id = id_a
         |  JOIN sh sb ON sb.doc_id = id_b),
         |j AS (
         |  SELECT id_a, id_b,
         |    round(len(list_intersect(sa, sb))::DOUBLE /
         |          len(list_distinct(list_concat(sa, sb))), 4) AS jaccard
         |  FROM p)
         |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY 1, 2""".stripMargin,
    "dedup_cross_source" ->
      s"""WITH RECURSIVE ${pairEdgeCtes("documents")},
         |keep AS (SELECT id, min(r) AS keeper FROM reach GROUP BY id),
         |cs AS (SELECT DISTINCT k.keeper, d.source
         |  FROM keep k JOIN documents d ON d.doc_id = k.id)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_shared_clusters
         |FROM cs a JOIN cs b
         |  ON a.keeper = b.keeper AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE ${pairEdgeCtes("documents")}
         |SELECT id, min(r) AS keeper FROM reach GROUP BY id
         |ORDER BY id""".stripMargin,
    "dedup_keep_best" ->
      s"""WITH RECURSIVE ${pairEdgeCtes("documents")},
         |keep AS (SELECT id, min(r) AS keeper FROM reach GROUP BY id),
         |q AS (
         |  SELECT k.keeper AS cluster_id, k.id AS doc_id,
         |    CAST(length(d.text) AS BIGINT) AS n_chars
         |  FROM keep k JOIN documents d ON d.doc_id = k.id),
         |rb AS (SELECT cluster_id, doc_id, n_chars, row_number() OVER (
         |    PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM q)
         |SELECT cluster_id, doc_id AS best_doc, n_chars FROM rb
         |WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "dedup_clean" ->
      s"""WITH RECURSIVE fp AS (
         |  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS f
         |  FROM documents),
         |k1 AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
         |surv AS (
         |  SELECT d.doc_id, d.source, d.text FROM documents d
         |  JOIN k1 ON k1.doc_id = d.doc_id),
         |${pairEdgeCtes("surv")},
         |keep AS (SELECT id, min(r) AS keeper FROM reach GROUP BY id),
         |fin AS (
         |  SELECT s.doc_id, s.source FROM surv s
         |  WHERE s.doc_id NOT IN
         |    (SELECT id FROM keep WHERE id <> keeper))
         |SELECT source, count(*) AS n_docs, min(doc_id) AS min_id
         |FROM fin GROUP BY source ORDER BY source""".stripMargin,
    // full signature replication: md5_number_lower == the kernel's
    // md5-lower-64 token hash, so the oracle computes the same 64-bit
    // simhash and the same exhaustive hamming ≤ 3 pair set
    "dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(regexp_split_to_array(trim(text), '\s+')))
        |      AS t
        |  FROM documents),
        |hv AS (SELECT doc_id, md5_number_lower(t) AS h FROM toks),
        |votes AS (
        |  SELECT doc_id, j,
        |    sum(CASE WHEN (h >> CAST(j AS INTEGER)) & 1 = 1
        |        THEN 1 ELSE -1 END) AS v
        |  FROM hv CROSS JOIN range(64) r(j) GROUP BY 1, 2),
        |rawsig AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN v > 0
        |        THEN (1::UBIGINT << CAST(j AS INTEGER))::HUGEINT
        |        ELSE 0::HUGEINT END) AS s
        |  FROM votes GROUP BY 1),
        |sigs AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN s >= 9223372036854775808
        |         THEN s - 18446744073709551616 ELSE s END AS BIGINT) AS sig
        |  FROM rawsig)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        |FROM sigs a JOIN sigs b ON b.doc_id > a.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3
        |ORDER BY 1, 2""".stripMargin,
    // IVF quality contract: 10 queries × k=5 brute rows; recall@5 of
    // the quantized search must clear 0.5 (deterministic: seeded
    // sampled fit)
    "ann_ivf_recall" ->
      """SELECT CAST(50 AS BIGINT) AS n_brute,
        |  TRUE AS recall_ge_half""".stripMargin,
    "stream_upsert" ->
      """SELECT user_id, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // sketch error-bound oracle: exact answers + literal TRUE flags —
    // Spark computes both sketch and exact and asserts the bounds
    "q_approx_stats" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts_exact,
        |  TRUE AS acd_within_5pct, TRUE AS med_within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_lsh_topk" -> annLshOracle,
    "dedup_embed_buckets" -> embedBucketsOracle,
    "embed_knn_graph" -> embedKnnOracle,
    "dedup_embed_clusters" -> embedClustersOracle,
    // greedy MMR replayed as a recursive CTE carrying the selected
    // set as a list; every comparison happens on 6-dp-rounded scores
    // built from 4-dp-rounded cosines, so selection order is decided
    // on identical doubles in both engines
    "ann_mmr_rerank" ->
      """WITH RECURSIVE
        |v AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
        |  unnest(embedding)::DOUBLE AS x FROM embeddings),
        |q AS (SELECT dim, x AS qx FROM v WHERE vec_id = 0),
        |s0 AS (SELECT v.vec_id, sum(v.x * q.qx) AS dt,
        |    sum(q.qx * q.qx) AS na, sum(v.x * v.x) AS nb
        |  FROM v JOIN q USING (dim) WHERE v.vec_id <> 0 GROUP BY 1),
        |cand AS (SELECT vec_id, round(dt / (sqrt(na) * sqrt(nb)), 4) AS rel
        |  FROM s0 ORDER BY rel DESC, vec_id LIMIT 20),
        |cv AS (SELECT v.* FROM v JOIN cand USING (vec_id)),
        |nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS nn FROM cv GROUP BY 1),
        |ps AS (SELECT a.vec_id AS u, b.vec_id AS v2,
        |    round(sum(a.x * b.x) /
        |      (any_value(na.nn) * any_value(nb.nn)), 4) AS sim
        |  FROM cv a JOIN cv b ON a.dim = b.dim AND a.vec_id <> b.vec_id
        |  JOIN nrm na ON na.vec_id = a.vec_id
        |  JOIN nrm nb ON nb.vec_id = b.vec_id
        |  GROUP BY 1, 2),
        |sel AS (
        |  SELECT 1 AS step,
        |    (SELECT vec_id FROM cand ORDER BY rel DESC, vec_id LIMIT 1)
        |      AS vid,
        |    [(SELECT vec_id FROM cand ORDER BY rel DESC, vec_id LIMIT 1)]
        |      AS picked,
        |    (SELECT round(0.7 * rel, 6) FROM cand
        |      ORDER BY rel DESC, vec_id LIMIT 1) AS mmr
        |  UNION ALL
        |  SELECT sel.step + 1, nxt.vid, list_append(sel.picked, nxt.vid),
        |    nxt.mmr
        |  FROM sel, LATERAL (
        |    SELECT c.vec_id AS vid,
        |      round(0.7 * c.rel - 0.3 * max(p.sim), 6) AS mmr
        |    FROM cand c JOIN ps p ON p.u = c.vec_id
        |      AND list_contains(sel.picked, p.v2)
        |    WHERE NOT list_contains(sel.picked, c.vec_id)
        |    GROUP BY c.vec_id, c.rel
        |    ORDER BY mmr DESC, c.vec_id
        |    LIMIT 1
        |  ) nxt
        |  WHERE sel.step < 10)
        |SELECT step, vid AS vec_id, mmr FROM sel ORDER BY step""".stripMargin,
    // SQ8 needs no model literals: min/max re-derive in SQL, and the
    // quantize→reconstruct op order is pinned identically both sides
    "ann_sq8_topk" ->
      """WITH v AS (SELECT vec_id,
        |    unnest(range(0, len(embedding))) AS dim,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings),
        |st AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM v GROUP BY 1),
        |r AS (SELECT v.vec_id, v.dim,
        |    CASE WHEN st.mx = st.mn THEN st.mn
        |      ELSE st.mn +
        |        floor((v.x - st.mn) * 255.0 / (st.mx - st.mn) + 0.5) *
        |        (st.mx - st.mn) / 255.0 END AS y
        |  FROM v JOIN st USING (dim)),
        |q AS (SELECT vec_id AS q_id, dim, x FROM v WHERE vec_id < 10),
        |z AS (SELECT q.q_id, r.vec_id AS c_id, q.x, r.y
        |  FROM q JOIN r ON q.dim = r.dim AND r.vec_id <> q.q_id),
        |sums AS (SELECT q_id, c_id, sum(x*y) AS dt, sum(x*x) AS na,
        |    sum(y*y) AS nb FROM z GROUP BY 1, 2),
        |adc AS (SELECT q_id, c_id,
        |    round(dt / (sqrt(na) * sqrt(nb)), 4) AS a FROM sums),
        |short AS (SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY a DESC, c_id) AS srn FROM adc)
        |  WHERE srn <= 50),
        |z2 AS (SELECT s.q_id, s.c_id, qv.x, cv.x AS y
        |  FROM short s
        |  JOIN v qv ON qv.vec_id = s.q_id
        |  JOIN v cv ON cv.vec_id = s.c_id AND cv.dim = qv.dim),
        |sums2 AS (SELECT q_id, c_id, sum(x*y) AS dt, sum(x*x) AS na,
        |    sum(y*y) AS nb FROM z2 GROUP BY 1, 2),
        |sc AS (SELECT q_id, c_id,
        |    round(dt / (sqrt(na) * sqrt(nb)), 4) AS score FROM sums2),
        |rr AS (SELECT q_id, c_id, score,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, c_id) AS INTEGER) AS rnk FROM sc)
        |SELECT q_id, rnk, c_id, score FROM rr WHERE rnk <= 5
        |ORDER BY 1, 2""".stripMargin,
    "dedup_short_spans" ->
      """WITH t AS (SELECT doc_id, doc_id % 7 = 0 AS planted,
        |    CASE WHEN doc_id % 7 = 0 THEN text ||
        |      substr('    ', 1, (4 - length(text) % 4) % 4) ||
        |      ' (C) 2026 GRAFT CORP RESERVED.' ELSE text END AS tx
        |  FROM documents),
        |w0 AS (SELECT doc_id, planted,
        |    unnest(range(0, (length(tx) - 20) // 4 + 1)) AS i, tx
        |  FROM t WHERE length(tx) >= 20),
        |w AS (SELECT doc_id, planted,
        |    md5_number_lower(substr(tx, CAST(i * 4 + 1 AS BIGINT), 20))
        |      AS h
        |  FROM w0),
        |dup AS (SELECT h FROM w GROUP BY h
        |  HAVING count(DISTINCT doc_id) > 1),
        |per AS (SELECT w.doc_id, planted, count(*) AS n_windows,
        |    count(dup.h) AS n_dup_windows
        |  FROM w LEFT JOIN dup ON w.h = dup.h GROUP BY 1, 2)
        |SELECT doc_id, planted, CAST(n_windows AS BIGINT) AS n_windows,
        |  CAST(n_dup_windows AS BIGINT) AS n_dup_windows,
        |  CAST(floor(n_dup_windows * 10000.0 / n_windows + 0.5)
        |    AS BIGINT) AS dup_frac_bp
        |FROM per WHERE n_dup_windows > 0 ORDER BY doc_id""".stripMargin,
    "dedup_substring_spans" ->
      """WITH w0 AS (SELECT doc_id,
        |    unnest(range(0, (length(text) - 50) // 10 + 1)) AS i, text
        |  FROM documents WHERE length(text) >= 50),
        |w AS (SELECT doc_id,
        |    md5_number_lower(substr(text, CAST(i * 10 + 1 AS BIGINT), 50))
        |      AS h
        |  FROM w0),
        |dup AS (SELECT h FROM w GROUP BY h
        |  HAVING count(DISTINCT doc_id) > 1),
        |per AS (SELECT w.doc_id, count(*) AS n_windows,
        |    count(dup.h) AS n_dup_windows
        |  FROM w LEFT JOIN dup ON w.h = dup.h GROUP BY 1)
        |SELECT doc_id, CAST(n_windows AS BIGINT) AS n_windows,
        |  CAST(n_dup_windows AS BIGINT) AS n_dup_windows,
        |  CAST(floor(n_dup_windows * 10000.0 / n_windows + 0.5)
        |    AS BIGINT) AS dup_frac_bp
        |FROM per WHERE n_dup_windows > 0 ORDER BY doc_id""".stripMargin,
    // same window/hash/dup-set pipeline as dedup_substring_spans, then
    // the gaps-and-islands merge replayed verbatim: a window opens a
    // new island when its start exceeds the running max end of all
    // earlier windows in the doc — exact integers end to end
    "dedup_span_excise" ->
      """WITH w0 AS (SELECT doc_id,
        |    unnest(range(0, (length(text) - 50) // 10 + 1)) AS i, text
        |  FROM documents WHERE length(text) >= 50),
        |w AS (SELECT doc_id, i,
        |    md5_number_lower(substr(text, CAST(i * 10 + 1 AS BIGINT), 50))
        |      AS h
        |  FROM w0),
        |dup AS (SELECT h FROM w GROUP BY h
        |  HAVING count(DISTINCT doc_id) > 1),
        |dw AS (SELECT w.doc_id, CAST(w.i * 10 AS BIGINT) AS s,
        |    CAST(w.i * 10 + 50 AS BIGINT) AS e
        |  FROM w JOIN dup ON w.h = dup.h),
        |m AS (SELECT doc_id, s, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM dw),
        |isl AS (SELECT doc_id, s, e,
        |    sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY s) AS island
        |  FROM m),
        |sp AS (SELECT doc_id, island, min(s) AS ss, max(e) AS se
        |  FROM isl GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(sum(se - ss) AS BIGINT) AS chars_removed
        |  FROM sp GROUP BY 1)
        |SELECT a.doc_id, a.n_spans, a.chars_removed,
        |  CAST(length(d.text) - a.chars_removed AS BIGINT) AS chars_kept
        |FROM agg a JOIN documents d ON d.doc_id = a.doc_id
        |ORDER BY a.doc_id""".stripMargin,
    // the span TABLE: same window/dup/island CTEs, emitted per span
    "dedup_span_extents" ->
      """WITH w0 AS (SELECT doc_id,
        |    unnest(range(0, (length(text) - 50) // 10 + 1)) AS i, text
        |  FROM documents WHERE length(text) >= 50),
        |w AS (SELECT doc_id, i,
        |    md5_number_lower(substr(text, CAST(i * 10 + 1 AS BIGINT), 50))
        |      AS h
        |  FROM w0),
        |dup AS (SELECT h FROM w GROUP BY h
        |  HAVING count(DISTINCT doc_id) > 1),
        |dw AS (SELECT w.doc_id, CAST(w.i * 10 AS BIGINT) AS s,
        |    CAST(w.i * 10 + 50 AS BIGINT) AS e
        |  FROM w JOIN dup ON w.h = dup.h),
        |m AS (SELECT doc_id, s, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM dw),
        |isl AS (SELECT doc_id, s, e,
        |    sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY s) AS island
        |  FROM m)
        |SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
        |  CAST(max(e) - min(s) AS BIGINT) AS span_chars
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
    // text_bm25_rank's model widened to top-20, a brute exact-cosine
    // top-20 against vec_id 0, fused by reciprocal rank (k=60): ranks
    // are exact integers from already-verified orderings, the RRF
    // score is one IEEE division per list — identical trees, 6-dp
    // round absorbs nothing (the values are exactly representable
    // sums of two divisions both engines compute identically)
    "text_hybrid_rrf" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |pd AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl,
        |    CAST(count(*) FILTER (w = 'spark') AS BIGINT) AS tf_a,
        |    CAST(count(*) FILTER (w = 'vector') AS BIGINT) AS tf_b,
        |    CAST(count(*) FILTER (w = 'stream') AS BIGINT) AS tf_c
        |  FROM tok GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS tot,
        |    CAST(count(*) FILTER (tf_a > 0) AS BIGINT) AS df_a,
        |    CAST(count(*) FILTER (tf_b > 0) AS BIGINT) AS df_b,
        |    CAST(count(*) FILTER (tf_c > 0) AS BIGINT) AS df_c
        |  FROM pd),
        |sc AS (
        |  SELECT doc_id, round(
        |    (CASE WHEN tf_a > 0
        |      THEN ln(1.0 + (n_docs - df_a + 0.5) / (df_a + 0.5)) *
        |        (CAST(tf_a AS DOUBLE) * 2.2 / (CAST(tf_a AS DOUBLE) +
        |          1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
        |            (CAST(tot AS DOUBLE) / n_docs)))))
        |      ELSE 0.0 END) +
        |    (CASE WHEN tf_b > 0
        |      THEN ln(1.0 + (n_docs - df_b + 0.5) / (df_b + 0.5)) *
        |        (CAST(tf_b AS DOUBLE) * 2.2 / (CAST(tf_b AS DOUBLE) +
        |          1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
        |            (CAST(tot AS DOUBLE) / n_docs)))))
        |      ELSE 0.0 END) +
        |    (CASE WHEN tf_c > 0
        |      THEN ln(1.0 + (n_docs - df_c + 0.5) / (df_c + 0.5)) *
        |        (CAST(tf_c AS DOUBLE) * 2.2 / (CAST(tf_c AS DOUBLE) +
        |          1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
        |            (CAST(tot AS DOUBLE) / n_docs)))))
        |      ELSE 0.0 END), 4) AS score
        |  FROM pd CROSS JOIN m),
        |lexall AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS lr
        |  FROM sc),
        |lex AS (SELECT doc_id, lr FROM lexall WHERE lr <= 20),
        |v AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings),
        |q AS (SELECT dim, x AS qx FROM v WHERE vec_id = 0),
        |z AS (SELECT v.vec_id, v.x, q.qx FROM v JOIN q ON v.dim = q.dim
        |  WHERE v.vec_id <> 0),
        |sums AS (SELECT vec_id, sum(x * qx) AS dt, sum(qx * qx) AS na,
        |    sum(x * x) AS nb
        |  FROM z GROUP BY 1),
        |cs AS (SELECT vec_id,
        |    round(dt / (sqrt(na) * sqrt(nb)), 4) AS cos FROM sums),
        |semall AS (SELECT vec_id AS doc_id,
        |    row_number() OVER (ORDER BY cos DESC, vec_id) AS sr
        |  FROM cs),
        |sem AS (SELECT doc_id, sr FROM semall WHERE sr <= 20),
        |f AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
        |    lex.lr, sem.sr
        |  FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id),
        |r AS (SELECT doc_id, coalesce(lr, -1) AS lex_rnk,
        |    coalesce(sr, -1) AS sem_rnk,
        |    round(coalesce(1.0::DOUBLE / (60 + lr), 0) +
        |      coalesce(1.0::DOUBLE / (60 + sr), 0), 6) AS rrf_score
        |  FROM f)
        |SELECT CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
        |    AS BIGINT) AS rnk,
        |  doc_id, CAST(lex_rnk AS BIGINT) AS lex_rnk,
        |  CAST(sem_rnk AS BIGINT) AS sem_rnk, rrf_score
        |FROM r ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin,
    // exact Shapley: integer numerator over n!=6, one final IEEE
    // division; weights CASE-encoded (|S|!(2-|S|)! = 2,1,1,2)
    "q_shapley_attribution" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu
        |  FROM events),
        |p AS (SELECT user_id, min(tu) AS pt FROM e
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |f AS (SELECT p.user_id,
        |    coalesce(max(CASE WHEN t.event_type = 'view' THEN 1 END), 0)
        |      AS bv,
        |    coalesce(max(CASE WHEN t.event_type = 'click' THEN 1 END), 0)
        |      AS bc,
        |    coalesce(max(CASE WHEN t.event_type = 'signup' THEN 1 END), 0)
        |      AS bs
        |  FROM p LEFT JOIN e t ON t.user_id = p.user_id
        |    AND t.tu < p.pt
        |    AND t.event_type IN ('view', 'click', 'signup')
        |  GROUP BY 1),
        |sc AS (SELECT bv + bc * 2 + bs * 4 AS m, count(*) AS cnt
        |  FROM f GROUP BY 1),
        |ss AS (SELECT CAST(unnest(range(8)) AS INTEGER) AS ss),
        |v AS (SELECT ss.ss,
        |    coalesce(sum(CASE WHEN (sc.m & ss.ss) = sc.m
        |      THEN sc.cnt END), 0) AS v
        |  FROM ss CROSS JOIN sc GROUP BY 1),
        |ch(channel, b) AS (VALUES ('click', 2), ('signup', 4),
        |  ('view', 1)),
        |terms AS (SELECT ch.channel, v0.ss, v0.v AS v0, v1.v AS v1,
        |    CASE WHEN v0.ss = 0 THEN 2 WHEN v0.ss IN (3, 5, 6) THEN 2
        |      ELSE 1 END AS w
        |  FROM ch JOIN v v0 ON (v0.ss & ch.b) = 0
        |  JOIN v v1 ON v1.ss = (v0.ss | ch.b))
        |SELECT channel, CAST(sum(w * (v1 - v0)) AS BIGINT) AS phi_num,
        |  round(sum(w * (v1 - v0)) / 6.0, 4) AS phi
        |FROM terms GROUP BY 1 ORDER BY channel""".stripMargin,
    // JPEG is lossy: dims replay exactly from the generator; the
    // bounded-error flags (max |delta| <= 16, mean <= 4.0 — 2x the
    // measured worst case over the generator family) are predicted
    // TRUE, the q_approx_stats error-bound oracle pattern
    "multimodal_jpeg_codec" ->
      """SELECT doc_id, CAST(8 + doc_id % 24 AS BIGINT) AS width,
        |  CAST(8 + (doc_id * 7) % 24 AS BIGINT) AS height,
        |  TRUE AS max_delta_ok, TRUE AS mean_delta_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_theta_setops" ->
      """WITH ev AS (SELECT DISTINCT event_type, user_id FROM events),
        |n AS (SELECT event_type, count(*) AS n FROM ev GROUP BY 1),
        |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_and
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type GROUP BY 1, 2),
        |pairs AS (SELECT na.event_type AS type_a,
        |    nb.event_type AS type_b, na.n AS n_a, nb.n AS n_b,
        |    coalesce(pr.n_and, 0) AS n_and
        |  FROM n na JOIN n nb ON na.event_type < nb.event_type
        |  LEFT JOIN pr ON pr.type_a = na.event_type
        |    AND pr.type_b = nb.event_type)
        |SELECT type_a, type_b, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_b AS BIGINT) AS n_b,
        |  CAST(n_and AS BIGINT) AS n_and_exact,
        |  CAST(n_a + n_b - n_and AS BIGINT) AS n_or_exact,
        |  TRUE AS and_ok, TRUE AS or_ok, TRUE AS diff_ok
        |FROM pairs ORDER BY type_a, type_b""".stripMargin,
    "q_count_min_topk" ->
      """WITH cnt AS (SELECT l_suppkey AS k, count(*) AS c
        |  FROM lineitem GROUP BY 1),
        |hs AS (SELECT k, c, r,
        |    (md5_number_lower(concat(CAST(r AS VARCHAR), '|',
        |       CAST(k AS VARCHAR))) & 9223372036854775807) % 256 AS h
        |  FROM cnt CROSS JOIN (SELECT unnest(range(0, 4)) AS r)),
        |buckets AS (SELECT r, h, sum(c) AS bc FROM hs GROUP BY 1, 2),
        |top AS (SELECT k, c FROM cnt ORDER BY c DESC, k LIMIT 10),
        |est AS (SELECT t.k, t.c, min(b.bc) AS e
        |  FROM top t JOIN hs ON hs.k = t.k
        |  JOIN buckets b ON b.r = hs.r AND b.h = hs.h GROUP BY 1, 2)
        |SELECT k AS s_suppkey, CAST(c AS BIGINT) AS n_exact,
        |  CAST(e AS BIGINT) AS est, e >= c AS never_under
        |FROM est ORDER BY n_exact DESC, s_suppkey""".stripMargin,
    // identical to q_count_min_topk: the streaming sketch is linear,
    // so chopping the input into micro-batches must not change a
    // single counter — the batch oracle IS the streaming oracle
    "stream_count_min_topk" ->
      """WITH cnt AS (SELECT l_suppkey AS k, count(*) AS c
        |  FROM lineitem GROUP BY 1),
        |hs AS (SELECT k, c, r,
        |    (md5_number_lower(concat(CAST(r AS VARCHAR), '|',
        |       CAST(k AS VARCHAR))) & 9223372036854775807) % 256 AS h
        |  FROM cnt CROSS JOIN (SELECT unnest(range(0, 4)) AS r)),
        |buckets AS (SELECT r, h, sum(c) AS bc FROM hs GROUP BY 1, 2),
        |top AS (SELECT k, c FROM cnt ORDER BY c DESC, k LIMIT 10),
        |est AS (SELECT t.k, t.c, min(b.bc) AS e
        |  FROM top t JOIN hs ON hs.k = t.k
        |  JOIN buckets b ON b.r = hs.r AND b.h = hs.h GROUP BY 1, 2)
        |SELECT k AS s_suppkey, CAST(c AS BIGINT) AS n_exact,
        |  CAST(e AS BIGINT) AS est, e >= c AS never_under
        |FROM est ORDER BY n_exact DESC, s_suppkey""".stripMargin,
    "stream_left_outer" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |c AS (SELECT user_id, ts_s AS c_ts FROM e
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, ts_s AS p_ts FROM e
        |      WHERE event_type = 'purchase'),
        |mx AS (SELECT least((SELECT max(c_ts) FROM c),
        |                    (SELECT max(p_ts) FROM p)) - 600 AS wm),
        |j AS (SELECT c.user_id, c.c_ts, p.p_ts FROM c LEFT JOIN p
        |      ON c.user_id = p.p_user AND p.p_ts >= c.c_ts
        |        AND p.p_ts <= c.c_ts + 3600),
        |emitted AS (
        |  SELECT user_id, p_ts FROM j WHERE p_ts IS NOT NULL
        |  UNION ALL
        |  SELECT j.user_id, NULL AS p_ts FROM j, mx
        |  WHERE j.p_ts IS NULL AND j.c_ts + 3600 < mx.wm)
        |SELECT user_id, CAST(count(p_ts) AS BIGINT) AS n_matched,
        |  CAST(count(*) - count(p_ts) AS BIGINT) AS n_expired_unmatched
        |FROM emitted GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_full_outer" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |c AS (SELECT user_id, ts_s AS c_ts FROM e
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, ts_s AS p_ts FROM e
        |      WHERE event_type = 'purchase'),
        |mx AS (SELECT least((SELECT max(c_ts) FROM c),
        |                    (SELECT max(p_ts) FROM p)) - 600 AS wm),
        |j AS (SELECT c.user_id, c.c_ts, p.p_ts FROM c LEFT JOIN p
        |      ON c.user_id = p.p_user AND p.p_ts >= c.c_ts
        |        AND p.p_ts <= c.c_ts + 3600),
        |pu AS (SELECT p.p_user, p.p_ts FROM p LEFT JOIN c
        |      ON c.user_id = p.p_user AND p.p_ts >= c.c_ts
        |        AND p.p_ts <= c.c_ts + 3600
        |      WHERE c.user_id IS NULL),
        |emitted AS (
        |  SELECT user_id AS uid, c_ts, p_ts FROM j WHERE p_ts IS NOT NULL
        |  UNION ALL
        |  SELECT j.user_id AS uid, j.c_ts, NULL AS p_ts FROM j, mx
        |  WHERE j.p_ts IS NULL AND j.c_ts + 3600 < mx.wm
        |  UNION ALL
        |  SELECT pu.p_user AS uid, NULL AS c_ts, pu.p_ts FROM pu, mx
        |  WHERE pu.p_ts < mx.wm)
        |SELECT uid, CAST(sum(CASE WHEN c_ts IS NOT NULL
        |      AND p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_matched,
        |  CAST(sum(CASE WHEN p_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_click_only,
        |  CAST(sum(CASE WHEN c_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_purchase_only
        |FROM emitted GROUP BY uid ORDER BY uid""".stripMargin,
    // the stub codec is deterministic byte arithmetic — replayed here
    // (documents.text is ASCII in this corpus, so ascii(substr(..)) is
    // exactly the payload byte)
    "multimodal_resize" ->
      """WITH m AS (SELECT doc_id,
        |    16 * (1 + (CASE WHEN length(text) >= 1
        |      THEN ascii(substr(text, 1, 1)) ELSE 0 END) % 32) AS w,
        |    16 * (1 + (CASE WHEN length(text) >= 2
        |      THEN ascii(substr(text, 2, 1)) ELSE 0 END) % 32) AS h
        |  FROM documents),
        |r AS (SELECT doc_id,
        |    greatest(1, CAST(round(w * least(1.0,
        |      256.0 / greatest(w, h))) AS INT)) AS rs_width,
        |    greatest(1, CAST(round(h * least(1.0,
        |      256.0 / greatest(w, h))) AS INT)) AS rs_height
        |  FROM m)
        |SELECT rs_width, rs_height, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_doc
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // stub PCM: payload bytes are documents.text (ASCII corpus), so
    // ascii(substr(..)) is exactly the byte; all-integer energy math
    "multimodal_audio_energy" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 512) AS t
        |  FROM documents WHERE length(text) >= 1),
        |b AS (SELECT doc_id,
        |    (i - 1) // 256 AS chunk,
        |    CAST(ascii(substr(t, CAST(i AS INT), 1)) - 128 AS BIGINT) AS s
        |  FROM d, unnest(range(1, CAST(length(t) AS BIGINT) + 1))
        |    AS u(i)),
        |c AS (SELECT doc_id, chunk, CAST(sum(s * s) AS BIGINT) AS energy
        |  FROM b GROUP BY 1, 2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(energy) AS BIGINT) AS total_energy,
        |  CAST(max(energy) AS BIGINT) AS peak_energy,
        |  CAST(sum(CASE WHEN energy < 16384 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_silent
        |FROM c GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(16 * (1 + (CASE WHEN length(text) >= 1
        |    THEN ascii(substr(text, 1, 1)) ELSE 0 END) % 32) AS INTEGER)
        |    AS width,
        |  CAST(16 * (1 + (CASE WHEN length(text) >= 2
        |    THEN ascii(substr(text, 2, 1)) ELSE 0 END) % 32) AS INTEGER)
        |    AS height,
        |  CAST(1 + length(text) % 8 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    16 * (1 + (CASE WHEN length(text) >= 1
        |      THEN ascii(substr(text, 1, 1)) ELSE 0 END) % 32) AS w,
        |    16 * (1 + (CASE WHEN length(text) >= 2
        |      THEN ascii(substr(text, 2, 1)) ELSE 0 END) % 32) AS h,
        |    1 + length(text) % 8 AS nf
        |  FROM documents),
        |sc AS (SELECT doc_id, nf, w, h,
        |    least(1.0, 256.0 / greatest(w, h)) AS s FROM m)
        |SELECT doc_id,
        |  CAST(greatest(1, CAST(floor(w * s + 0.5) AS BIGINT)) AS INTEGER)
        |    AS rs_width,
        |  CAST(greatest(1, CAST(floor(h * s + 0.5) AS BIGINT)) AS INTEGER)
        |    AS rs_height,
        |  CASE nf WHEN 1 THEN '0' WHEN 2 THEN '0,1' WHEN 3 THEN '0,1,2'
        |    WHEN 4 THEN '0,1,2,3' WHEN 5 THEN '0,1,2,3'
        |    WHEN 6 THEN '0,1,3,4' WHEN 7 THEN '0,1,3,5'
        |    WHEN 8 THEN '0,2,4,6' END AS frame_plan
        |FROM sc ORDER BY doc_id""".stripMargin,
    // integer byte-bucket sums ÷ 255 → float32 → double: every step is
    // an exact or correctly-rounded IEEE op on both engines, and the
    // final sum replays Spark's sequential fold as left-assoc addition
    "multimodal_features" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(range(length(text))) AS i
        |  FROM documents),
        |bysum AS (
        |  SELECT doc_id, i % 16 AS j,
        |    sum(ascii(substr(text, CAST(i + 1 AS INTEGER), 1))) AS sb
        |  FROM pos GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.doc_id, r.j FROM documents d
        |  CROSS JOIN (SELECT unnest(range(16)) AS j) r),
        |f AS (
        |  SELECT g.doc_id, g.j,
        |    CAST(CAST(coalesce(b.sb, 0) / 255.0 AS REAL) AS DOUBLE) AS fv
        |  FROM grid g LEFT JOIN bysum b
        |    ON b.doc_id = g.doc_id AND b.j = g.j),
        |agg AS (SELECT doc_id, list(fv ORDER BY j) AS fl FROM f GROUP BY 1)
        |SELECT doc_id, CAST(16 AS INTEGER) AS dim,
        |  round(fl[1] + fl[2] + fl[3] + fl[4] + fl[5] + fl[6] + fl[7] +
        |    fl[8] + fl[9] + fl[10] + fl[11] + fl[12] + fl[13] + fl[14] +
        |    fl[15] + fl[16], 4) AS feat_sum
        |FROM agg ORDER BY doc_id""".stripMargin,
    // the driver's verify gate runs at sf0.01 — the glob is pinned to
    // the same dir the Spark query receives
    "source_binary_files" ->
      """SELECT regexp_extract(filename, '[^/]+$', 0) AS fname,
        |  size AS length
        |FROM read_blob('/root/testdata/sf0.01/*.parquet')
        |ORDER BY fname""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY 1""".stripMargin,
    "ngram_jaccard" ->
      s"""WITH ${shingleCte("documents")},
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS sa, b.s AS sb
        |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1)
        |SELECT doc_a, doc_b,
        |  round(len(list_intersect(sa, sb))::DOUBLE /
        |        len(list_distinct(list_concat(sa, sb))), 4) AS jaccard
        |FROM p WHERE len(sa) > 0 AND len(sb) > 0 ORDER BY 1""".stripMargin,
    "dedup_embed_cos" ->
      """WITH p AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |         a.embedding AS ea, b.embedding AS eb
        |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1),
        |z AS (
        |  SELECT va, vb, unnest(ea)::DOUBLE AS x, unnest(eb)::DOUBLE AS y
        |  FROM p),
        |sums AS (
        |  SELECT va, vb, sum(x*y) AS d, sum(x*x) AS na, sum(y*y) AS nb
        |  FROM z GROUP BY 1, 2)
        |SELECT va AS vec_a, vb AS vec_b,
        |  round(d / (sqrt(na) * sqrt(nb)), 4) AS cos
        |FROM sums ORDER BY 1""".stripMargin,
    "dedup_incremental" ->
      """WITH batch AS (SELECT doc_id, text FROM documents
        |              WHERE doc_id % 5 = 0),
        |old AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
        |ex AS (
        |  SELECT b.doc_id, min(o.doc_id) AS m
        |  FROM batch b JOIN old o ON md5(b.text) = md5(o.text)
        |  GROUP BY 1),
        |shb AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(greatest(len(t) - 2, 0)),
        |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS s
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |        FROM batch) d),
        |sho AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(greatest(len(t) - 2, 0)),
        |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS s
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |        FROM old) d),
        |nr AS (
        |  SELECT b.doc_id, min(o.doc_id) AS m
        |  FROM shb b JOIN sho o ON len(b.s) > 0 AND len(o.s) > 0
        |    AND len(list_intersect(b.s, o.s))::DOUBLE /
        |        len(list_distinct(list_concat(b.s, o.s))) >= 0.5
        |  GROUP BY 1)
        |SELECT b.doc_id,
        |  CASE WHEN e.m IS NOT NULL THEN 'exact'
        |       WHEN n.m IS NOT NULL THEN 'near' ELSE 'unique' END AS verdict,
        |  coalesce(e.m, n.m, -1) AS match_id
        |FROM batch b LEFT JOIN ex e ON b.doc_id = e.doc_id
        |LEFT JOIN nr n ON b.doc_id = n.doc_id
        |ORDER BY 1""".stripMargin,
    "corpus_profile" ->
      """SELECT source, count(*) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars,
        |  round(quantile_cont(n_chars, 0.5), 2) AS p50_chars,
        |  round(count_if(n_chars < 150)::DOUBLE / count(*), 4)
        |    AS short_frac
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_vocab_idf" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |n AS (SELECT count(*)::DOUBLE AS total FROM documents)
        |SELECT token, count(*) AS df,
        |  round(ln((SELECT total FROM n) / count(*)), 6) AS idf
        |FROM tok WHERE token <> '' GROUP BY 1
        |ORDER BY df DESC, token LIMIT 30""".stripMargin,
    "q_masked_export" ->
      """WITH m AS (SELECT c_nationkey,
        |    md5_number_lower(CAST(c_custkey AS VARCHAR)) & 2147483647
        |      AS pseudo_id,
        |    CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_bucket
        |  FROM customer)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(count(DISTINCT pseudo_id) AS BIGINT) AS n_distinct_pseudo,
        |  min(bal_bucket) AS min_bucket, max(bal_bucket) AS max_bucket,
        |  CAST(sum(bal_bucket) AS BIGINT) AS sum_buckets
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "data_shard_manifest" ->
      """SELECT CAST((md5_number_lower(CAST(doc_id AS VARCHAR))
        |    & 2147483647) % 16 AS BIGINT) AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "embed_assign" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    unnest(range(0, len(embedding))) AS dim,
        |    unnest(embedding)::DOUBLE AS x
        |  FROM embeddings),
        |c AS (
        |  SELECT label AS c_label, dim, avg(x) AS c
        |  FROM v GROUP BY 1, 2),
        |s AS (
        |  SELECT v.vec_id, v.label, c.c_label,
        |    sum(v.x * c.c) AS dot, sum(v.x * v.x) AS n1,
        |    sum(c.c * c.c) AS n2
        |  FROM v JOIN c ON v.dim = c.dim
        |  GROUP BY 1, 2, 3),
        |r AS (
        |  SELECT vec_id, label, c_label,
        |    dot / (sqrt(n1) * sqrt(n2)) AS cos,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dot / (sqrt(n1) * sqrt(n2)) DESC, c_label) AS rn
        |  FROM s)
        |SELECT vec_id, label, c_label AS assigned,
        |  round(cos, 4) AS best_cos, (label = c_label) AS correct
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "embed_centroid" ->
      """WITH z AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    unnest(range(1, len(embedding) + 1)) AS dim,
        |    unnest(embedding)::DOUBLE AS component
        |  FROM embeddings)
        |SELECT label, CAST(dim AS BIGINT) AS dim,
        |  round(avg(component), 5) AS centroid, count(*) AS n_vecs
        |FROM z GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ann_brute_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, embedding AS ce FROM embeddings),
        |p AS (SELECT q_id, c_id, qe, ce FROM q JOIN c ON c_id <> q_id),
        |z AS (SELECT q_id, c_id, unnest(qe)::DOUBLE AS x,
        |             unnest(ce)::DOUBLE AS y FROM p),
        |sums AS (SELECT q_id, c_id, sum(x*y) AS d, sum(x*x) AS na,
        |                sum(y*y) AS nb FROM z GROUP BY 1, 2),
        |sc AS (SELECT q_id, c_id,
        |         round(d / (sqrt(na) * sqrt(nb)), 4) AS score FROM sums),
        |r AS (SELECT q_id, c_id, score,
        |        CAST(row_number() OVER (PARTITION BY q_id
        |          ORDER BY score DESC, c_id) AS INTEGER) AS rnk FROM sc)
        |SELECT q_id, rnk, c_id, score FROM r WHERE rnk <= 5
        |ORDER BY 1, 2""".stripMargin,
    "ann_filtered_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, label AS q_lbl,
        |             embedding AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, label AS c_lbl, embedding AS ce
        |      FROM embeddings),
        |p AS (SELECT q_id, c_id, c_lbl, qe, ce FROM q JOIN c
        |      ON c_id <> q_id AND c_lbl = q_lbl),
        |z AS (SELECT q_id, c_id, c_lbl, unnest(qe)::DOUBLE AS x,
        |             unnest(ce)::DOUBLE AS y FROM p),
        |sums AS (SELECT q_id, c_id, c_lbl, sum(x*y) AS d,
        |                sum(x*x) AS na, sum(y*y) AS nb
        |         FROM z GROUP BY 1, 2, 3),
        |sc AS (SELECT q_id, c_id, c_lbl,
        |         round(d / (sqrt(na) * sqrt(nb)), 4) AS score FROM sums),
        |r AS (SELECT q_id, c_id, c_lbl, score,
        |        CAST(row_number() OVER (PARTITION BY q_id
        |          ORDER BY score DESC, c_id) AS INTEGER) AS rnk FROM sc)
        |SELECT q_id, rnk, c_id, CAST(c_lbl AS BIGINT) AS label, score
        |FROM r WHERE rnk <= 5 ORDER BY 1, 2""".stripMargin,
    "embed_norm_stats" ->
      """WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings),
        |n AS (SELECT vec_id, label,
        |    round(sqrt(sum(x * x)), 6) AS nrm FROM v GROUP BY 1, 2)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(avg(nrm), 4) AS mean_norm,
        |  round(quantile_cont(nrm, 0.5), 4) AS p50_norm,
        |  round(quantile_cont(nrm, 0.95), 4) AS p95_norm,
        |  CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    AS n_ws,
        |  CAST(len(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "data_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |    CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM t),
        |p AS (SELECT *, cum - n_tok AS start_off,
        |    (cum - n_tok) // 512 AS pack_id,
        |    n_tok > 0 AND (cum - 1) // 512 > (cum - n_tok) // 512 AS spill
        |  FROM c)
        |SELECT pack_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc,
        |  CAST(sum(CASE WHEN spill THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_spill
        |FROM p GROUP BY 1 ORDER BY pack_id""".stripMargin,
    "text_chunk_windows" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok
        |  FROM t),
        |w AS (SELECT *, greatest(CAST(1 AS BIGINT),
        |    CAST(ceil((n_tok - 64) / 48.0) AS BIGINT) + 1) AS n_win
        |  FROM n),
        |x AS (SELECT doc_id, n_tok, toks, CAST(u.win AS BIGINT) AS win_id
        |  FROM w, LATERAL unnest(range(0, n_win)) AS u(win))
        |SELECT doc_id, win_id, win_id * 48 AS start_tok,
        |  least(64, n_tok - win_id * 48) AS n_chunk_tok,
        |  md5(array_to_string(toks[(win_id * 48 + 1):(win_id * 48 + 64)],
        |    ' ')) AS chunk_md5
        |FROM x ORDER BY doc_id, win_id""".stripMargin,
    "data_mixture_plan" ->
      """WITH per AS (SELECT source,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(regexp_extract_all(lower(text),
        |      '[a-z]+|[0-9]|[^a-z0-9\s]'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |sh AS (SELECT *,
        |    round(n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE), 6)
        |      AS share
        |  FROM per),
        |wr AS (SELECT *, round(pow(share, 0.7), 6) AS w_raw FROM sh),
        |wt AS (SELECT *, round(w_raw / sum(w_raw) OVER (), 6) AS weight
        |  FROM wr)
        |SELECT source, n_docs, n_tokens, share, weight,
        |  round(weight / share, 4) AS sample_rate
        |FROM wt ORDER BY source""".stripMargin,
    // word scores fixed to integer micro-units before the per-phrase
    // sum (the DSIR trick): the fold is order-free Long arithmetic,
    // and phrase text reassembles positionally in both engines
    "text_keyword_rake" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(range(0, len(toks))) AS pos,
        |  unnest(toks) AS w FROM t),
        |tk AS (SELECT * FROM tok WHERE w <> ''),
        |seg AS (SELECT doc_id, pos, w,
        |    sum(CASE WHEN w IN ('the','a','and','of','to','in','is')
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
        |  FROM tk),
        |ns AS (SELECT * FROM seg
        |  WHERE w NOT IN ('the','a','and','of','to','in','is')),
        |pl AS (SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS plen
        |  FROM ns GROUP BY 1, 2),
        |occ AS (SELECT ns.*, pl.plen FROM ns
        |  JOIN pl USING (doc_id, pid)),
        |ws AS (SELECT w, CAST(round(CAST(sum(plen) AS DOUBLE) * 1e6 /
        |    count(*)) AS BIGINT) AS w_micro
        |  FROM occ GROUP BY 1),
        |ph AS (SELECT o.doc_id, o.pid,
        |    string_agg(o.w, ' ' ORDER BY o.pos) AS phrase,
        |    CAST(count(*) AS BIGINT) AS n_words,
        |    sum(ws.w_micro) AS sm
        |  FROM occ o JOIN ws USING (w) GROUP BY 1, 2)
        |SELECT doc_id, phrase, n_words,
        |  round(CAST(sm AS DOUBLE) / 1e6, 6) AS rake_score
        |FROM ph ORDER BY rake_score DESC, doc_id, phrase
        |LIMIT 30""".stripMargin,
    // the 256-bucket hashed-unigram model replays exactly: integer
    // micro-nat weights make the per-doc fold Long arithmetic in both
    // engines, so even the float division at the end is bit-stable
    "data_importance_resample" ->
      """WITH tok AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tk AS (SELECT doc_id, source,
        |    CAST((md5_number_lower(token) & 2147483647) % 256 AS BIGINT)
        |      AS bucket
        |  FROM tok WHERE token <> ''),
        |c AS (SELECT bucket,
        |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS t_cnt,
        |    sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS r_cnt
        |  FROM tk GROUP BY 1),
        |tot AS (SELECT sum(t_cnt) AS t_total, sum(r_cnt) AS r_total FROM c),
        |m AS (SELECT bucket,
        |    CAST(round((ln((t_cnt + 1) / (t_total + 256.0)) -
        |      ln((r_cnt + 1) / (r_total + 256.0))) * 1e6) AS BIGINT)
        |      AS w_micro
        |  FROM c, tot)
        |SELECT t.doc_id, t.source, CAST(count(*) AS BIGINT) AS n_tok,
        |  round(sum(w_micro) / 1e6, 6) AS dsir_score
        |FROM tk t JOIN m USING (bucket)
        |WHERE t.source <> 'src0'
        |GROUP BY 1, 2
        |ORDER BY dsir_score DESC, doc_id
        |LIMIT 100""".stripMargin,
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(toks) AS BIGINT) AS n_tok,
        |    round(len(list_filter(toks, x -> x IN
        |      ('the','a','and','of','to','in','is')))::DOUBLE / len(toks), 4)
        |      AS stop_ratio,
        |    round(len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE /
        |      length(text), 4) AS punct_ratio
        |  FROM t)
        |SELECT doc_id, n_chars, n_tok, stop_ratio, punct_ratio,
        |  round(least(1.0, n_tok / 200.0) * (1.0 - stop_ratio), 4) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(toks, x -> x IN ('the','and','is')))
        |      AS BIGINT) AS s_en,
        |    CAST(len(list_filter(toks, x -> x IN ('der','und','die')))
        |      AS BIGINT) AS s_de,
        |    CAST(len(list_filter(toks, x -> x IN ('le','et','les')))
        |      AS BIGINT) AS s_fr,
        |    CAST(len(list_filter(toks, x -> x IN ('el','los','y')))
        |      AS BIGINT) AS s_es
        |  FROM t)
        |SELECT doc_id, s_en, s_de, s_fr, s_es,
        |  CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr
        |         AND s_en >= s_es THEN 'en'
        |       WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
        |       WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
        |       WHEN s_es > 0 THEN 'es'
        |       ELSE 'unknown' END AS guess
        |FROM sc ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, greatest(len(t) - 4, 0) AS total,
        |    list_transform(range(greatest(len(t) - 4, 0)),
        |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |           t[i+4] || ' ' || t[i+5]) AS grams
        |  FROM t)
        |SELECT doc_id, CAST(total AS BIGINT) AS n_grams,
        |  CASE WHEN total > 0
        |    THEN round(1.0 - len(list_distinct(grams))::DOUBLE / total, 4)
        |    ELSE 0.0 END AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_entropy" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM tk
        |      WHERE tok <> '' GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id, text || ' contact user' || doc_id ||
        |    '@example.com or 555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\d{3}-\d{4}')) AS BIGINT)
        |    AS n_phones,
        |  CAST(length(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '\d{3}-\d{4}', '<PHONE>', 'g')) AS BIGINT) AS scrubbed_len
        |FROM p ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin,
    // generator replays: the Spark side emits stats of the DECODED
    // media after a real PNG/WAV encode→decode roundtrip (lossless
    // codecs), so matching the pure-arithmetic generator here proves
    // the codec preserved every pixel/sample
    "multimodal_png_resize" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w,
        |    8 + (doc_id * 7) % 24 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(8)) AS i FROM d),
        |ys AS (SELECT doc_id, w, h, i, unnest(range(8)) AS j FROM xs)
        |SELECT doc_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(sum(((i * w // 8) * 31 + (j * h // 8) * 17 + doc_id)
        |    % 256) AS BIGINT) AS resized_sum
        |FROM ys GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    "data_curriculum_order" ->
      """WITH q AS (SELECT doc_id, n_chars,
        |    CAST(len(list_distinct(regexp_split_to_array(trim(text),
        |      '\s+'))) AS BIGINT) * 1000 //
        |      CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |        AS BIGINT) AS quality
        |  FROM documents),
        |p AS (SELECT doc_id, n_chars, quality,
        |    CAST(ntile(5) OVER (ORDER BY quality, doc_id) AS BIGINT)
        |      AS phase
        |  FROM q)
        |SELECT phase, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars,
        |  CAST(min(quality) AS BIGINT) AS min_q,
        |  CAST(max(quality) AS BIGINT) AS max_q
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "multimodal_png_codec" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w,
        |    8 + (doc_id * 7) % 24 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS i FROM d),
        |ys AS (SELECT doc_id, w, h, i, unnest(range(h)) AS j FROM xs)
        |SELECT doc_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(sum((i * 31 + j * 17 + doc_id) % 256) AS BIGINT) AS px_sum
        |FROM ys GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    "multimodal_wav_codec" ->
      """WITH d AS (SELECT doc_id, 200 + doc_id % 256 AS n
        |    FROM documents),
        |s AS (SELECT doc_id,
        |    ((unnest(range(n)) * 37 + doc_id * 101) % 65536 - 32768) AS v
        |  FROM d)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(16000 AS BIGINT) AS sample_rate,
        |  CAST(sum(v * v) AS BIGINT) AS energy
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_roc_auc" ->
      """WITH s AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) * 101
        |      + CAST(round(l_discount * 100) AS BIGINT) AS v,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |h AS (SELECT v, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(sum(1 - y) AS BIGINT) AS neg FROM s GROUP BY 1),
        |c AS (SELECT v, pos, neg,
        |    CAST(sum(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
        |    CAST(sum(neg) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_neg
        |  FROM h),
        |t AS (SELECT max(cum_pos) AS n_pos, max(cum_neg) AS n_neg FROM c),
        |a AS (SELECT
        |    sum(CAST(pos AS HUGEINT) * (2 * (cum_neg - neg) + neg))
        |      AS auc_num2,
        |    max(abs(CAST(cum_pos AS HUGEINT) * n_neg
        |      - CAST(cum_neg AS HUGEINT) * n_pos)) AS ks_num,
        |    max(n_pos) AS n_pos, max(n_neg) AS n_neg
        |  FROM c CROSS JOIN t)
        |SELECT n_pos, n_neg,
        |  floor(CAST(auc_num2 AS DOUBLE) / (2 * CAST(n_pos AS DOUBLE)
        |    * CAST(n_neg AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS auc,
        |  floor((CAST(auc_num2 AS DOUBLE) / (2 * CAST(n_pos AS DOUBLE)
        |    * CAST(n_neg AS DOUBLE)) * 2 - 1) * 1e6 + 0.5) / 1e6
        |    AS gini_coef,
        |  floor(CAST(ks_num AS DOUBLE) / (CAST(n_pos AS DOUBLE)
        |    * CAST(n_neg AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS ks_stat
        |FROM a""".stripMargin,
    "q_brier_decomp" ->
      """WITH r AS (
        |  SELECT CAST(round(l_discount * 100) AS BIGINT) AS bin,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |    (md5_number_lower(CAST(l_orderkey * 8 + l_linenumber
        |      AS VARCHAR)) & 9223372036854775807) % 2 AS split
        |  FROM lineitem),
        |tr AS (SELECT bin, CAST(count(*) AS BIGINT) AS tn,
        |    CAST(sum(y) AS BIGINT) AS tp FROM r WHERE split = 0
        |  GROUP BY 1),
        |te AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS o FROM r WHERE split = 1
        |  GROUP BY 1),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
        |    CAST(sum(o) AS BIGINT) AS o_tot FROM te),
        |b AS (SELECT te.bin, n, o, tn, tp, n_tot,
        |    CAST(tp AS DOUBLE) / tn AS p,
        |    CAST(o_tot AS DOUBLE) / n_tot AS obar
        |  FROM te JOIN tr USING (bin) CROSS JOIN tt),
        |b2 AS (SELECT *,
        |    CAST(round(n * (p - CAST(o AS DOUBLE) / n)
        |      * (p - CAST(o AS DOUBLE) / n) * 1e9) AS BIGINT) AS rel9,
        |    CAST(round(n * (CAST(o AS DOUBLE) / n - obar)
        |      * (CAST(o AS DOUBLE) / n - obar) * 1e9) AS BIGINT) AS res9,
        |    CAST(round((n * p * p - 2 * p * o + o) * 1e9) AS BIGINT)
        |      AS bri9
        |  FROM b),
        |g AS (SELECT
        |    floor(CAST(sum(rel9) AS DOUBLE) / 1e9 / max(n_tot) * 1e6
        |      + 0.5) / 1e6 AS reliability,
        |    floor(CAST(sum(res9) AS DOUBLE) / 1e9 / max(n_tot) * 1e6
        |      + 0.5) / 1e6 AS resolution,
        |    floor(max(obar) * (1 - max(obar)) * 1e6 + 0.5) / 1e6
        |      AS uncertainty,
        |    floor(CAST(sum(bri9) AS DOUBLE) / 1e9 / max(n_tot) * 1e6
        |      + 0.5) / 1e6 AS brier
        |  FROM b2)
        |SELECT bin, n AS n_test,
        |  floor(p * 1e6 + 0.5) / 1e6 AS forecast_p,
        |  floor(CAST(o AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS obs_rate,
        |  reliability, resolution, uncertainty, brier
        |FROM b2 CROSS JOIN g ORDER BY bin""".stripMargin,
    "q_cohens_kappa" ->
      """WITH a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a * b) AS BIGINT) AS n11,
        |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
        |    CAST(sum((1 - a) * b) AS BIGINT) AS n01
        |  FROM (SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END
        |      AS a,
        |      CASE WHEN l_tax >= 0.04 THEN 1 ELSE 0 END AS b
        |    FROM lineitem)),
        |k AS (SELECT *, n - n11 - n10 - n01 AS n00 FROM a),
        |p AS (SELECT *, CAST(n11 + n00 AS DOUBLE) / n AS po,
        |    (CAST(n11 + n10 AS DOUBLE) / n)
        |      * (CAST(n11 + n01 AS DOUBLE) / n)
        |      + (CAST(n01 + n00 AS DOUBLE) / n)
        |      * (CAST(n10 + n00 AS DOUBLE) / n) AS pe
        |  FROM k)
        |SELECT n, n11, n10, n01, n00,
        |  floor(po * 1e6 + 0.5) / 1e6 AS p_observed,
        |  floor(pe * 1e6 + 0.5) / 1e6 AS p_expected,
        |  floor((po - pe) / (1 - pe) * 1e6 + 0.5) / 1e6 AS kappa,
        |  floor(CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / (n10 + n01)
        |    * 1e6 + 0.5) / 1e6 AS mcnemar_chi2
        |FROM p""".stripMargin,
    "q_naive_bayes" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS cls,
        |    c_mktsegment AS f1,
        |    CAST(CAST(c_nationkey AS BIGINT) AS VARCHAR) AS f2,
        |    CAST(CAST(month(o_orderdate) AS BIGINT) AS VARCHAR) AS f3,
        |    (md5_number_lower(CAST(o_orderkey AS VARCHAR))
        |      & 9223372036854775807) % 2 AS split
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |tr AS (SELECT * FROM base WHERE split = 0),
        |te AS (SELECT * FROM base WHERE split = 1),
        |cl AS (SELECT cls, CAST(count(*) AS BIGINT) AS n_c FROM tr
        |  GROUP BY 1),
        |ntr AS (SELECT CAST(count(*) AS BIGINT) AS n_train FROM tr),
        |cls2 AS (SELECT cls, n_c,
        |    CAST(round(ln(CAST(n_c + 1 AS DOUBLE) / (n_train + 5)) * 1e6)
        |      AS BIGINT) AS prior6
        |  FROM cl CROSS JOIN ntr),
        |g1 AS (SELECT cls, f1, CAST(count(*) AS BIGINT) AS cnt FROM tr
        |  GROUP BY 1, 2),
        |v1 AS (SELECT DISTINCT f1 FROM tr),
        |k1 AS (SELECT CAST(count(*) AS BIGINT) AS v_card FROM v1),
        |ll1 AS (SELECT c.cls, v1.f1,
        |    CAST(round(ln(CAST(coalesce(cnt, 0) + 1 AS DOUBLE)
        |      / (n_c + v_card)) * 1e6) AS BIGINT) AS ll_f1
        |  FROM cls2 c CROSS JOIN v1
        |  LEFT JOIN g1 ON g1.cls = c.cls AND g1.f1 = v1.f1
        |  CROSS JOIN k1),
        |g2 AS (SELECT cls, f2, CAST(count(*) AS BIGINT) AS cnt FROM tr
        |  GROUP BY 1, 2),
        |v2 AS (SELECT DISTINCT f2 FROM tr),
        |k2 AS (SELECT CAST(count(*) AS BIGINT) AS v_card FROM v2),
        |ll2 AS (SELECT c.cls, v2.f2,
        |    CAST(round(ln(CAST(coalesce(cnt, 0) + 1 AS DOUBLE)
        |      / (n_c + v_card)) * 1e6) AS BIGINT) AS ll_f2
        |  FROM cls2 c CROSS JOIN v2
        |  LEFT JOIN g2 ON g2.cls = c.cls AND g2.f2 = v2.f2
        |  CROSS JOIN k2),
        |g3 AS (SELECT cls, f3, CAST(count(*) AS BIGINT) AS cnt FROM tr
        |  GROUP BY 1, 2),
        |v3 AS (SELECT DISTINCT f3 FROM tr),
        |k3 AS (SELECT CAST(count(*) AS BIGINT) AS v_card FROM v3),
        |ll3 AS (SELECT c.cls, v3.f3,
        |    CAST(round(ln(CAST(coalesce(cnt, 0) + 1 AS DOUBLE)
        |      / (n_c + v_card)) * 1e6) AS BIGINT) AS ll_f3
        |  FROM cls2 c CROSS JOIN v3
        |  LEFT JOIN g3 ON g3.cls = c.cls AND g3.f3 = v3.f3
        |  CROSS JOIN k3),
        |sc AS (SELECT te.k, te.cls AS actual, c.cls AS cand,
        |    c.prior6 + coalesce(ll1.ll_f1, -1152921504606846976)
        |      + coalesce(ll2.ll_f2, -1152921504606846976)
        |      + coalesce(ll3.ll_f3, -1152921504606846976) AS score
        |  FROM te CROSS JOIN cls2 c
        |  LEFT JOIN ll1 ON ll1.cls = c.cls AND ll1.f1 = te.f1
        |  LEFT JOIN ll2 ON ll2.cls = c.cls AND ll2.f2 = te.f2
        |  LEFT JOIN ll3 ON ll3.cls = c.cls AND ll3.f3 = te.f3),
        |pr AS (SELECT actual, cand AS predicted FROM (
        |    SELECT *, row_number() OVER (PARTITION BY k
        |      ORDER BY score DESC, cand) AS rn FROM sc)
        |  WHERE rn = 1),
        |ac AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
        |    floor(CAST(sum(CASE WHEN actual = predicted THEN 1 ELSE 0
        |      END) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS accuracy
        |  FROM pr)
        |SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n,
        |  n_test, accuracy
        |FROM pr CROSS JOIN ac GROUP BY 1, 2, n_test, accuracy
        |ORDER BY 1, 2""".stripMargin,
    "q_var_cvar" ->
      """WITH daily AS (SELECT l_returnflag AS flag,
        |    CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1, 2),
        |dl AS (SELECT flag, day,
        |    e4 - lag(e4) OVER (PARTITION BY flag ORDER BY day) AS delta
        |  FROM daily),
        |d2 AS (SELECT flag, day, delta,
        |    row_number() OVER (PARTITION BY flag ORDER BY delta, day)
        |      AS rn,
        |    count(*) OVER (PARTITION BY flag) AS n
        |  FROM dl WHERE delta IS NOT NULL),
        |j AS (SELECT *, (n * 5 + 99) // 100 AS k95, (n + 99) // 100
        |    AS k99 FROM d2)
        |SELECT flag, CAST(max(n) AS BIGINT) AS n_deltas,
        |  CAST(max(k95) AS BIGINT) AS k95,
        |  CAST(max(k99) AS BIGINT) AS k99,
        |  floor(-CAST(max(CASE WHEN rn = k95 THEN delta END) AS DOUBLE)
        |    / 10000 * 100.0 + 0.5) / 100.0 AS var_95,
        |  floor(-(CAST(sum(CASE WHEN rn <= k95 THEN delta END)
        |    AS DOUBLE) / max(k95)) / 10000 * 100.0 + 0.5) / 100.0
        |    AS cvar_95,
        |  floor(-CAST(max(CASE WHEN rn = k99 THEN delta END) AS DOUBLE)
        |    / 10000 * 100.0 + 0.5) / 100.0 AS var_99,
        |  floor(-(CAST(sum(CASE WHEN rn <= k99 THEN delta END)
        |    AS DOUBLE) / max(k99)) / 10000 * 100.0 + 0.5) / 100.0
        |    AS cvar_99
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_nelson_aalen" ->
      """WITH pe AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(ts_s) AS hz FROM pe),
        |nx AS (SELECT user_id, ts_s, lead(ts_s) OVER (
        |    PARTITION BY user_id ORDER BY ts_s, event_id) AS nxt
        |  FROM pe),
        |lives AS (SELECT
        |    CAST(floor((COALESCE(nxt, hz) - ts_s) / 3600.0) AS BIGINT)
        |      AS t,
        |    nxt IS NOT NULL AS observed
        |  FROM nx, h),
        |byt AS (SELECT t,
        |    CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d_events,
        |    CAST(sum(CASE WHEN NOT observed THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c_censored
        |  FROM lives GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lives),
        |r AS (SELECT t, d_events,
        |    n_total - COALESCE(CAST(sum(d_events + c_censored) OVER (
        |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      1 PRECEDING) AS BIGINT), 0) AS at_risk
        |  FROM byt, tot),
        |f AS (SELECT t, at_risk, d_events,
        |    CAST(round(1e9 * d_events / at_risk) AS BIGINT) AS inc9
        |  FROM r WHERE d_events > 0)
        |SELECT t, at_risk, d_events,
        |  CAST(inc9 AS DOUBLE) / 1e9 AS na_increment,
        |  CAST(CAST(sum(inc9) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE) / 1e9
        |    AS na_cum_hazard
        |FROM f ORDER BY t""".stripMargin,
    "q_sax_paa" ->
      """WITH daily AS (SELECT l_returnflag AS flag,
        |    CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1, 2),
        |idx AS (SELECT flag, e4,
        |    row_number() OVER (PARTITION BY flag ORDER BY day) AS rn,
        |    count(*) OVER (PARTITION BY flag) AS n_days
        |  FROM daily),
        |sg AS (SELECT flag, ((rn - 1) * 16) // n_days AS seg, e4
        |  FROM idx),
        |segs AS (SELECT flag, seg, CAST(count(*) AS BIGINT)
        |      AS n_seg_days,
        |    CAST(sum(e4) AS BIGINT) AS seg_e4
        |  FROM sg GROUP BY 1, 2),
        |m AS (SELECT *, seg_e4 // n_seg_days AS mean_e4 FROM segs),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY flag
        |    ORDER BY mean_e4, seg) AS srank FROM m),
        |sy AS (SELECT *, chr(CAST(97 + ((srank - 1) * 4) // 16 AS INT))
        |    AS sym FROM rk),
        |wd AS (SELECT flag, string_agg(sym, '' ORDER BY seg)
        |    AS sax_word FROM sy GROUP BY 1)
        |SELECT sy.flag, CAST(seg AS BIGINT) AS seg, n_seg_days,
        |  floor(CAST(mean_e4 AS DOUBLE) / 10000 * 100.0 + 0.5) / 100.0
        |    AS seg_mean,
        |  sym, sax_word
        |FROM sy JOIN wd USING (flag) ORDER BY 1, 2""".stripMargin,
    "q_macd" -> macdOracle,
    "q_ktruss" -> ktrussOracle,
    "text_readability" ->
      """WITH c AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS n_words,
        |    CAST(greatest(len(regexp_extract_all(lower(text),
        |      '[.!?]+')), 1) AS BIGINT) AS n_sents,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syll
        |  FROM documents)
        |SELECT doc_id, n_words, n_sents, n_syll,
        |  floor((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
        |    - 84.6 * (CAST(n_syll AS DOUBLE) / n_words)) * 1e4 + 0.5)
        |    / 1e4 AS flesch_ease,
        |  floor((0.39 * (CAST(n_words AS DOUBLE) / n_sents)
        |    + 11.8 * (CAST(n_syll AS DOUBLE) / n_words) - 15.59) * 1e4
        |    + 0.5) / 1e4 AS fk_grade
        |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    "text_cooc_pmi" ->
      """WITH dcs AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |r AS (SELECT doc_id, t, unnest(range(len(t))) AS i FROM dcs),
        |tk AS (SELECT doc_id, i AS pos, t[i+1] AS w FROM r
        |  WHERE t[i+1] <> ''),
        |pr AS (
        |  SELECT least(x.w, y.w) AS w1, greatest(x.w, y.w) AS w2
        |  FROM tk x JOIN tk y ON x.doc_id = y.doc_id
        |    AND y.pos = x.pos + 1
        |  UNION ALL
        |  SELECT least(x.w, y.w), greatest(x.w, y.w)
        |  FROM tk x JOIN tk y ON x.doc_id = y.doc_id
        |    AND y.pos = x.pos + 2),
        |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
        |  FROM pr GROUP BY 1, 2),
        |tp AS (SELECT CAST(count(*) AS BIGINT) AS t_pair FROM pr),
        |un AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM tk
        |  GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS t_tok FROM tk),
        |top AS (SELECT * FROM pc WHERE n_pair >= 20
        |  ORDER BY n_pair DESC, w1, w2 LIMIT 30)
        |SELECT top.w1, top.w2, n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
        |  floor(ln(CAST(n_pair AS DOUBLE) * t_tok * t_tok
        |    / (CAST(t_pair AS DOUBLE) * u1.n_w * u2.n_w)) * 1e6 + 0.5)
        |    / 1e6 AS pmi
        |FROM top JOIN un u1 ON u1.w = top.w1
        |JOIN un u2 ON u2.w = top.w2
        |CROSS JOIN tp CROSS JOIN tt
        |ORDER BY n_pair DESC, w1, w2""".stripMargin,
    "data_coverage_curve" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS nd
        |    FROM documents),
        |dk AS (SELECT doc_id,
        |    md5_number_lower(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |r1 AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY h, doc_id) AS rk FROM dk),
        |wb AS (SELECT doc_id, rk, ((rk - 1) * 10) // nd AS bucket
        |  FROM r1 CROSS JOIN n),
        |tok AS (SELECT DISTINCT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |tok2 AS (SELECT doc_id, w FROM tok WHERE w <> ''),
        |fs AS (SELECT w, min(rk) AS first_rk
        |  FROM tok2 JOIN wb USING (doc_id) GROUP BY 1),
        |nw AS (SELECT ((first_rk - 1) * 10) // nd AS bucket,
        |    CAST(count(*) AS BIGINT) AS new_tokens
        |  FROM fs CROSS JOIN n GROUP BY 1),
        |dp AS (SELECT bucket, CAST(count(*) AS BIGINT)
        |    AS n_docs_bucket FROM wb GROUP BY 1)
        |SELECT CAST(dp.bucket AS BIGINT) AS bucket, n_docs_bucket,
        |  coalesce(new_tokens, 0) AS new_tokens,
        |  CAST(sum(coalesce(new_tokens, 0)) OVER (ORDER BY dp.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_tokens
        |FROM dp LEFT JOIN nw USING (bucket) ORDER BY 1""".stripMargin,
    "q_personalized_pagerank" -> pprOracle,
    // transitive-closure SCC: mutual-reachability pairs off the
    // recursive CTE; scc = min mutual partner (the graph is the small
    // p_size=1 slice, so the closure stays oracle-sized)
    "q_scc" ->
      """WITH RECURSIVE sp AS (SELECT p_partkey FROM part
        |  WHERE p_size = 1),
        |li AS (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |nxt AS (SELECT l_partkey, lead(l_partkey) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey)
        |    AS np
        |  FROM li),
        |e AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src,
        |    CAST(np AS BIGINT) AS dst FROM nxt
        |  WHERE np IS NOT NULL AND np <> l_partkey),
        |reach(src, dst) AS (SELECT src, dst FROM e
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
        |nodes AS (SELECT DISTINCT src AS id FROM e
        |  UNION SELECT DISTINCT dst FROM e),
        |mut AS (SELECT a.src AS u, a.dst AS v FROM reach a
        |  JOIN reach b ON a.src = b.dst AND a.dst = b.src),
        |lab AS (SELECT n.id, least(n.id, coalesce(min(m.v), n.id)) AS scc
        |  FROM nodes n LEFT JOIN mut m ON m.u = n.id GROUP BY n.id),
        |cs AS (SELECT scc, CAST(count(*) AS BIGINT) AS scc_size
        |  FROM lab GROUP BY scc)
        |SELECT l.id, l.scc, cs.scc_size FROM lab l JOIN cs USING (scc)
        |ORDER BY l.id""".stripMargin,
    // sequential replay: A's +100 on %5 keys, then B's -50 on %7 keys
    // on top — equality proves the conflict fired exactly once AND
    // neither racing update was lost
    "engine_concurrent_upsert" ->
      """WITH fin AS (SELECT c_custkey AS rowNum,
        |    CASE WHEN c_custkey % 7 = 0 THEN round(c_acctbal - 50, 2)
        |      WHEN c_custkey % 5 = 0 THEN round(c_acctbal + 100, 2)
        |      ELSE c_acctbal END AS bal
        |  FROM customer)
        |SELECT CAST(1 AS BIGINT) AS n_conflicts,
        |  CAST(1 AS BIGINT) AS racer_fired,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(bal), 2) AS balance FROM fin""".stripMargin,
    // positional replay straight off lineitem: pos = linenumber rank,
    // ipos enumerates the [Σqty, min pk%100, n] cells — equality
    // proves the 2-d shred + re-assembly preserved cells AND order
    "shred_nested_arrays" ->
      """WITH cell AS (SELECT l_orderkey AS doc, l_linenumber AS ln,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q,
        |    CAST(min(l_partkey % 100) AS BIGINT) AS p,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |posd AS (SELECT doc, q, p, c,
        |    CAST(row_number() OVER (PARTITION BY doc ORDER BY ln) - 1
        |      AS BIGINT) AS pos
        |  FROM cell),
        |cells AS (
        |  SELECT doc, pos, 0 AS ipos, q AS value FROM posd
        |  UNION ALL SELECT doc, pos, 1, p FROM posd
        |  UNION ALL SELECT doc, pos, 2, c FROM posd)
        |SELECT pos, CAST(ipos AS BIGINT) AS ipos,
        |  CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(value) AS BIGINT) AS sum_val,
        |  min(doc) AS min_doc, max(doc) AS max_doc
        |FROM cells GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // instants via the floor-epoch convention; timezone(zone,
    // timezone('UTC', t)) is the naive→instant→zone-wall double hop
    "q_timezone_funcs" ->
      """WITH ev AS (SELECT
        |    to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS uts,
        |    CAST(round(value * 100) AS BIGINT) AS vc FROM events),
        |census AS (
        |  SELECT 'America/New_York' AS zone,
        |    strftime(timezone('America/New_York', uts), '%Y-%m-%d')
        |      AS local_key,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(vc) AS BIGINT) AS v_cents
        |  FROM ev GROUP BY 2
        |  UNION ALL
        |  SELECT 'Asia/Tokyo',
        |    strftime(timezone('Asia/Tokyo', uts), '%Y-%m-%d'),
        |    CAST(count(*) AS BIGINT), CAST(sum(vc) AS BIGINT)
        |  FROM ev GROUP BY 2),
        |spine AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-03-10 05:00:00',
        |    TIMESTAMP '2024-03-10 09:00:00', INTERVAL 1 HOUR)) AS t
        |  UNION ALL
        |  SELECT unnest(generate_series(TIMESTAMP '2024-11-03 04:00:00',
        |    TIMESTAMP '2024-11-03 08:00:00', INTERVAL 1 HOUR))),
        |probes AS (
        |  SELECT 'ny_dst_probe' AS zone,
        |    strftime(t, '%m-%dT%H:%M') || 'Z->' ||
        |      strftime(timezone('America/New_York', timezone('UTC', t)),
        |        '%m-%d %H:%M') AS local_key,
        |    CAST(1 AS BIGINT) AS n, CAST(0 AS BIGINT) AS v_cents
        |  FROM spine)
        |SELECT zone, local_key, n, v_cents FROM census
        |UNION ALL SELECT zone, local_key, n, v_cents FROM probes
        |ORDER BY zone, local_key""".stripMargin,
    // partition-pruned readout: the oracle aggregates the raw source —
    // equality proves the hive-partitioned layout serves the same truth
    "engine_partitioned_save" ->
      """SELECT o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY 1""".stripMargin,
    // mid-commit readout (marker live, data dir not yet moved) and the
    // final readout must BOTH be the source truth
    "engine_optimize" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS cents,
        |  CAST(8 AS BIGINT) AS files_before,
        |  CAST(2 AS BIGINT) AS files_after
        |FROM orders""".stripMargin,
    "q_seasonal_mann_kendall" ->
      """WITH sy AS (SELECT
        |    strftime(CAST(l_shipdate AS DATE), '%m') AS season,
        |    CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS yr,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1, 2),
        |per AS (SELECT a.season,
        |    CAST(count(DISTINCT a.yr) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a.yr < b.yr
        |      THEN CAST(sign(b.e4 - a.e4) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS s_m
        |  FROM sy a JOIN sy b ON a.season = b.season GROUP BY 1),
        |p2 AS (SELECT * FROM per WHERE n >= 2),
        |tot AS (SELECT CAST(sum(s_m) AS BIGINT) AS s_total,
        |    CAST(sum(n * (n - 1) * (2 * n + 5)) AS BIGINT) AS v18,
        |    CAST(count(*) AS BIGINT) AS n_seasons FROM p2)
        |SELECT season, n AS n_years, s_m AS s_stat,
        |  CAST(NULL AS BIGINT) AS s_total, CAST(NULL AS DOUBLE) AS z_stat
        |FROM p2
        |UNION ALL
        |SELECT 'total', n_seasons, CAST(NULL AS BIGINT), s_total,
        |  floor((CAST(s_total AS DOUBLE)
        |    - CAST(sign(s_total) AS DOUBLE))
        |    / sqrt(CAST(v18 AS DOUBLE) / 18) * 1e4 + 0.5) / 1e4
        |FROM tot
        |ORDER BY season""".stripMargin,
    "q_calibration_bins" ->
      """WITH scored AS (SELECT CAST(round(l_quantity) AS BIGINT) * 101
        |    + CAST(round(l_discount * 100) AS BIGINT) AS v,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |mx AS (SELECT max(v) AS vmax FROM scored),
        |b AS (SELECT least(9, (v * 10) // (vmax + 1)) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT)
        |      AS pos,
        |    CAST(sum(v) AS BIGINT) AS sv, max(vmax) AS vmax
        |  FROM scored, mx GROUP BY 1),
        |c AS (SELECT bin, n, pos,
        |    (CAST(sv AS HUGEINT) * 1000000)
        |      // (CAST(n AS HUGEINT) * vmax) AS conf6,
        |    (pos * 1000000) // n AS acc6 FROM b),
        |e AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(abs(acc6 - conf6) * n) AS BIGINT) AS e6 FROM c)
        |SELECT bin, n, pos,
        |  floor(CAST(conf6 AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6
        |    AS mean_pred,
        |  floor(CAST(acc6 AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6
        |    AS frac_pos,
        |  (SELECT floor(CAST(e6 AS DOUBLE) / nn / 1e6 * 1e6 + 0.5)
        |    / 1e6 FROM e) AS ece
        |FROM c ORDER BY bin""".stripMargin,
    "engine_check_constraint" ->
      """SELECT
        |  CAST(sum(CASE WHEN o_totalprice < 400000
        |    AND o_orderstatus IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_ok,
        |  CAST(sum(CASE WHEN o_totalprice < 400000
        |    AND o_orderstatus IN ('O', 'F', 'P')
        |    THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS ok_cents,
        |  CAST(sum(CASE WHEN NOT (o_totalprice < 400000
        |    AND o_orderstatus IN ('O', 'F', 'P')) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_rejected,
        |  CAST(sum(CASE WHEN NOT (o_totalprice < 400000
        |    AND o_orderstatus IN ('O', 'F', 'P'))
        |    THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS rej_cents
        |FROM orders""".stripMargin,
    "engine_alter_column" ->
      """SELECT 'o_orderstatus,price,rowNum' AS schema_cols,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS price_cents,
        |  CAST(1 AS BIGINT) AS idx_alive,
        |  CAST(0 AS BIGINT) AS cidx_alive,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS f_rows
        |FROM orders""".stripMargin,
    "engine_rename" ->
      """WITH o AS (SELECT count(*) AS n,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS cents FROM orders),
        |c AS (SELECT count(*) AS n,
        |    CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
        |      AS BIGINT) AS cents FROM customer
        |  WHERE c_nationkey IN (SELECT n_nationkey FROM nation))
        |SELECT o.n AS mid_rows, o.cents AS mid_cents,
        |  o.n AS final_rows, o.cents AS final_cents,
        |  c.n AS woven_rows, c.cents AS woven_cents
        |FROM o, c""".stripMargin,
    // same histogram + ranged scan as q_roc_auc; the argmax rides the
    // total (J, v) order
    "q_youden_j" ->
      """WITH scored AS (SELECT CAST(round(l_quantity) AS BIGINT) * 101
        |    + CAST(round(l_discount * 100) AS BIGINT) AS v,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |hist AS (SELECT v, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(sum(1 - y) AS BIGINT) AS neg FROM scored GROUP BY 1),
        |cum AS (SELECT v, pos, neg,
        |    CAST(sum(pos) OVER (ORDER BY v) AS BIGINT) AS cum_pos,
        |    CAST(sum(neg) OVER (ORDER BY v) AS BIGINT) AS cum_neg
        |  FROM hist),
        |tot AS (SELECT max(cum_pos) AS n_pos, max(cum_neg) AS n_neg
        |  FROM cum),
        |j AS (SELECT v, n_pos - cum_pos + pos AS tp,
        |    n_neg - cum_neg + neg AS fp,
        |    CAST(n_pos - cum_pos + pos AS HUGEINT) * n_neg
        |      - CAST(n_neg - cum_neg + neg AS HUGEINT) * n_pos AS jnum,
        |    n_pos, n_neg
        |  FROM cum, tot),
        |r AS (SELECT *, row_number() OVER (ORDER BY jnum DESC, v)
        |    AS rk FROM j)
        |SELECT v AS threshold, tp, fp,
        |  floor(CAST(tp AS DOUBLE) / n_pos * 1e6 + 0.5) / 1e6 AS tpr,
        |  floor(CAST(fp AS DOUBLE) / n_neg * 1e6 + 0.5) / 1e6 AS fpr,
        |  floor(CAST(jnum AS DOUBLE)
        |    / (CAST(n_pos AS DOUBLE) * n_neg) * 1e6 + 0.5) / 1e6
        |    AS youden_j
        |FROM r WHERE rk = 1""".stripMargin,
    // atomic multi-table save: the two seam readouts must equal the
    // v1 truth (before the commit-marker rename) and the v2 truth
    // (mid-commit, first table already swapped) — the oracle replays
    // both truths off the source parquet, certifying the commit point
    "engine_atomic_save" ->
      """SELECT count(*) AS n_members,
        |  CAST(sum(CAST(round(round(c_acctbal, 2) * 100, 0)
        |    AS BIGINT)) AS BIGINT) AS pre_cents,
        |  CAST(0 AS BIGINT) AS pre_rev,
        |  CAST(sum(CAST(round(round(c_acctbal + 10, 2) * 100, 0)
        |    AS BIGINT)) AS BIGINT) AS mid_cents,
        |  count(*) AS mid_rev,
        |  CAST(sum(CAST(round(round(c_acctbal + 10, 2) * 100, 0)
        |    AS BIGINT)) AS BIGINT) AS final_cents,
        |  count(*) AS final_rev
        |FROM customer""".stripMargin,
    // index-only readout: the oracle computes the same aggregate from
    // the raw source — equality proves the covering index carries the
    // full answer
    "engine_index_covering" ->
      """SELECT CAST(o_custkey AS BIGINT) AS custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_custkey % 97 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // generator replay with the 128 threshold: white pixels decode to
    // red 255, so px_sum = 255 x white census
    "multimodal_wbmp_codec" ->
      """WITH d AS (SELECT doc_id, 8 + (doc_id * 17) % 24 AS w,
        |    8 + (doc_id * 19) % 24 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS i FROM d),
        |ys AS (SELECT doc_id, w, h, i, unnest(range(h)) AS j FROM xs)
        |SELECT doc_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(sum(CASE WHEN (i * 31 + j * 17 + doc_id) % 256 >= 128
        |    THEN 255 ELSE 0 END) AS BIGINT) AS px_sum
        |FROM ys GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    "q_tost_equivalence" -> tostOracle,
    // the watermark's drop rule replayed exactly: only rows at or
    // above the quartile boundary (the on-time three quarters) count —
    // the same integer boundary arithmetic the source chunker runs
    "stream_late_data_audit" ->
      """WITH b AS (SELECT min(epoch_us(CAST(ts AS TIMESTAMP))) AS lo,
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS hi FROM events),
        |kept AS (SELECT e.* FROM events e, b
        |  WHERE epoch_us(CAST(ts AS TIMESTAMP))
        |    >= lo + (hi - lo + 1) // 4)
        |SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS v_cents
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_corr_matrix" -> corrMatrixOracle,
    // user-day-keyed classification joins; churn=0 days NULL both sides
    "q_growth_accounting" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS fd FROM ud GROUP BY 1),
        |pa AS (SELECT user_id, day + 1 AS day FROM ud),
        |cls AS (SELECT u.day,
        |    CAST(count(*) AS BIGINT) AS active,
        |    CAST(sum(CASE WHEN f.fd = u.day THEN 1 ELSE 0 END)
        |      AS BIGINT) AS new_u,
        |    CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS retained,
        |    CAST(sum(CASE WHEN p.user_id IS NULL AND f.fd < u.day
        |      THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
        |  FROM ud u JOIN f USING (user_id)
        |  LEFT JOIN pa p ON p.user_id = u.user_id AND p.day = u.day
        |  GROUP BY 1),
        |ch AS (SELECT pa.day, CAST(count(*) AS BIGINT) AS churned
        |  FROM pa LEFT JOIN ud ON ud.user_id = pa.user_id
        |    AND ud.day = pa.day
        |  WHERE ud.user_id IS NULL GROUP BY 1)
        |SELECT c.day, active, new_u, retained, resurrected,
        |  coalesce(ch.churned, 0) AS churned,
        |  CASE WHEN coalesce(ch.churned, 0) = 0 THEN NULL
        |    ELSE floor(CAST(new_u + resurrected AS DOUBLE) / ch.churned
        |      * 1e6 + 0.5) / 1e6 END AS quick_ratio
        |FROM cls c LEFT JOIN ch ON ch.day = c.day
        |ORDER BY c.day""".stripMargin,
    // same histogram CTE as q_roc_auc; descending-inclusive cums by
    // identity; per-bucket pos·precision an exact integer micro div
    "q_pr_auc" ->
      """WITH s AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) * 101
        |      + CAST(round(l_discount * 100) AS BIGINT) AS v,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |h AS (SELECT v, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(sum(1 - y) AS BIGINT) AS neg FROM s GROUP BY 1),
        |c AS (SELECT v, pos, neg,
        |    CAST(sum(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
        |    CAST(sum(neg) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_neg
        |  FROM h),
        |t AS (SELECT max(cum_pos) AS n_pos, max(cum_neg) AS n_neg FROM c),
        |a AS (SELECT
        |    sum((CAST(pos AS HUGEINT) * (n_pos - cum_pos + pos)
        |        * 1000000)
        |      // ((n_pos - cum_pos + pos) + (n_neg - cum_neg + neg)))
        |      AS ap_micro,
        |    max(n_pos) AS n_pos, max(n_neg) AS n_neg
        |  FROM c CROSS JOIN t)
        |SELECT n_pos, n_neg,
        |  floor(CAST(ap_micro AS DOUBLE) / 1e6 / n_pos * 1e6 + 0.5)
        |    / 1e6 AS avg_precision,
        |  floor(CAST(n_pos AS DOUBLE) / (n_pos + n_neg) * 1e6 + 0.5)
        |    / 1e6 AS prevalence,
        |  floor(CAST(ap_micro AS DOUBLE) / 1e6 / n_pos
        |    / (CAST(n_pos AS DOUBLE) / (n_pos + n_neg)) * 1e4 + 0.5)
        |    / 1e4 AS lift
        |FROM a""".stripMargin,
    // rank-paired sorted samples on both-flag days; exact long |delta|
    // fold, doubles only at the final divisions
    "q_wasserstein_1d" ->
      """WITH daily AS (SELECT l_returnflag AS flag,
        |    CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')
        |  GROUP BY 1, 2),
        |b2 AS (SELECT day FROM daily GROUP BY 1 HAVING count(*) = 2),
        |ranked AS (SELECT flag, e4, CAST(row_number() OVER (
        |    PARTITION BY flag ORDER BY e4, day) AS BIGINT) AS rn
        |  FROM daily JOIN b2 USING (day)),
        |j AS (SELECT a.rn, a.e4 AS xa, r.e4 AS xr FROM ranked a
        |  JOIN ranked r ON a.rn = r.rn
        |  WHERE a.flag = 'A' AND r.flag = 'R')
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  floor(CAST(sum(abs(xa - xr)) AS DOUBLE) / count(*) / 10000
        |    * 100.0 + 0.5) / 100.0 AS w1_dollars,
        |  floor(CAST(max(abs(xa - xr)) AS DOUBLE) / 10000 * 100.0
        |    + 0.5) / 100.0 AS max_gap_dollars
        |FROM j""".stripMargin,
    // q_markov_chain's exact transition census; per-cell ln of an
    // integer ratio fixed to nano-nats, exact HUGEINT fold
    "q_markov_entropy_rate" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
        |p AS (SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id) AS dst
        |  FROM e),
        |t AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS nij FROM p
        |  WHERE dst IS NOT NULL GROUP BY 1, 2),
        |rt AS (SELECT src, CAST(sum(nij) AS BIGINT) AS ni FROM t
        |  GROUP BY 1),
        |l AS (SELECT t.nij, CAST(round(ln(CAST(ni AS DOUBLE) / nij)
        |    * 1e9) AS BIGINT) AS ln9 FROM t JOIN rt USING (src)),
        |a AS (SELECT CAST(sum(nij) AS BIGINT) AS n_transitions,
        |    CAST(count(*) AS BIGINT) AS n_cells,
        |    sum(CAST(nij AS HUGEINT) * ln9) AS h9 FROM l)
        |SELECT n_transitions, n_cells,
        |  floor(CAST(h9 AS DOUBLE) / 1e9 / n_transitions * 1e6 + 0.5)
        |    / 1e6 AS entropy_rate_nats,
        |  floor(exp(CAST(h9 AS DOUBLE) / 1e9 / n_transitions) * 1e4
        |    + 0.5) / 1e4 AS perplexity
        |FROM a""".stripMargin,
    // residuals fixed to the milli-e4 lattice after an exact-moment
    // fit — Σe² and Σ(Δe)² are order-free HUGEINT sums
    "q_durbin_watson" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |dx AS (SELECT day, e4,
        |    CAST(day - DATE '1970-01-01' AS BIGINT) AS x FROM daily),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(e4) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * e4) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx FROM dx),
        |fit AS (SELECT day, e4, x,
        |    CAST(sxy * n - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |      / CAST(sxx * n - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS b,
        |    n, sx, sy FROM dx, m),
        |ef AS (SELECT day, b,
        |    CAST(floor((CAST(e4 AS DOUBLE)
        |      - ((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / n
        |        + b * CAST(x AS DOUBLE))) * 1000 + 0.5) AS BIGINT) AS ef
        |  FROM fit),
        |lg AS (SELECT day, b, ef, lag(ef) OVER (ORDER BY day) AS ep
        |  FROM ef),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_days, max(b) AS b,
        |    sum(CAST(ef AS HUGEINT) * ef) AS see,
        |    sum(CAST(CASE WHEN ep IS NULL THEN 0 ELSE ef - ep END
        |        AS HUGEINT)
        |      * (CASE WHEN ep IS NULL THEN 0 ELSE ef - ep END)) AS sdd
        |  FROM lg)
        |SELECT n_days,
        |  floor(b / 10000 * 1e6 + 0.5) / 1e6 AS beta_per_day,
        |  floor(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE) * 1e6 + 0.5)
        |    / 1e6 AS dw,
        |  floor((1.0 - CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE) / 2)
        |    * 1e4 + 0.5) / 1e4 AS rho1_approx
        |FROM agg""".stripMargin,
    // hedge-ratio OLS on exact HUGEINT moments; actual traded days
    // only (the q_pacf calendar-gap rule)
    "q_beta_hedge" ->
      """WITH daily AS (SELECT l_returnflag AS flag,
        |    CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1, 2),
        |tot AS (SELECT day, CAST(sum(e4) AS BIGINT) AS y4 FROM daily
        |  GROUP BY 1),
        |m AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(e4) AS BIGINT) AS sx, CAST(sum(y4) AS BIGINT) AS sy,
        |    sum(CAST(e4 AS HUGEINT) * y4) AS sxy,
        |    sum(CAST(y4 AS HUGEINT) * y4) AS syy
        |  FROM daily JOIN tot USING (day) GROUP BY 1)
        |SELECT flag, n AS n_days,
        |  floor(CAST(sxy * n - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |    / CAST(syy * n - CAST(sy AS HUGEINT) * sy AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS beta,
        |  floor((CAST(sx AS DOUBLE)
        |    - CAST(sxy * n - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |      / CAST(syy * n - CAST(sy AS HUGEINT) * sy AS DOUBLE)
        |      * CAST(sy AS DOUBLE))
        |    / n / 10000 * 100.0 + 0.5) / 100.0 AS alpha
        |FROM m ORDER BY flag""".stripMargin,
    "q_cohens_d" ->
      """WITH g AS (SELECT o_orderstatus AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
        |      AS s1,
        |    sum(CAST(round(o_totalprice) AS HUGEINT)
        |      * CAST(round(o_totalprice) AS BIGINT)) AS s2
        |  FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1),
        |p AS (SELECT
        |    max(CASE WHEN g = 'F' THEN n END) AS n1,
        |    max(CASE WHEN g = 'F' THEN s1 END) AS sa,
        |    max(CASE WHEN g = 'F' THEN s2 END) AS qa,
        |    max(CASE WHEN g = 'O' THEN n END) AS n2,
        |    max(CASE WHEN g = 'O' THEN s1 END) AS sb,
        |    max(CASE WHEN g = 'O' THEN s2 END) AS qb FROM g),
        |v AS (SELECT *,
        |    CAST(qa * n1 - CAST(sa AS HUGEINT) * sa AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) * (n1 - 1)) AS va,
        |    CAST(qb * n2 - CAST(sb AS HUGEINT) * sb AS DOUBLE)
        |      / (CAST(n2 AS DOUBLE) * (n2 - 1)) AS vb FROM p),
        |w AS (SELECT *, sqrt(((n1 - 1) * va + (n2 - 1) * vb)
        |    / (n1 + n2 - 2)) AS sp FROM v),
        |x AS (SELECT *, (CAST(sa AS DOUBLE) / n1
        |    - CAST(sb AS DOUBLE) / n2) / sp AS dd FROM w)
        |SELECT n1, n2,
        |  floor((CAST(sa AS DOUBLE) / n1 - CAST(sb AS DOUBLE) / n2)
        |    * 100.0 + 0.5) / 100.0 AS mean_diff,
        |  floor(sp * 100.0 + 0.5) / 100.0 AS pooled_sd,
        |  floor(dd * 1e6 + 0.5) / 1e6 AS cohens_d,
        |  floor(dd * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)) * 1e6 + 0.5)
        |    / 1e6 AS hedges_g
        |FROM x""".stripMargin,
    "q_odds_ratio" ->
      """WITH per AS (SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS sc,
        |    CAST(count(*) AS BIGINT) AS nu
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(sc) AS BIGINT) AS gc,
        |    CAST(sum(nu) AS BIGINT) AS gn FROM per),
        |a AS (SELECT (md5_number_lower(CAST(user_id AS VARCHAR))
        |    & 9223372036854775807) % 2 AS arm,
        |    CASE WHEN CAST(sc AS HUGEINT) * gn
        |      > CAST(gc AS HUGEINT) * nu THEN 1 ELSE 0 END AS y
        |  FROM per, t),
        |c AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN arm = 0 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN arm = 1 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN arm = 1 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d FROM a)
        |SELECT a, b, c, d,
        |  floor(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c)
        |    * 1e6 + 0.5) / 1e6 AS odds_ratio,
        |  floor(sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
        |    * 1e6 + 0.5) / 1e6 AS se_log_or,
        |  floor(CAST(a + b + c + d AS DOUBLE)
        |    * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
        |    * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
        |    / ((a + b) * (CAST(c AS DOUBLE) + d) * (a + c) * (b + d))
        |    * 1e4 + 0.5) / 1e4 AS chi2
        |FROM c""".stripMargin,
    "q_mcnemar" ->
      """WITH b AS (SELECT (min(CAST(floor(epoch(ts)) AS BIGINT))
        |      + max(CAST(floor(epoch(ts)) AS BIGINT))) // 2
        |    AS mid FROM events),
        |u AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'click'
        |      AND CAST(floor(epoch(ts)) AS BIGINT) < mid
        |      THEN 1 ELSE 0 END) AS x1,
        |    sum(CASE WHEN event_type = 'click'
        |      AND CAST(floor(epoch(ts)) AS BIGINT) >= mid
        |      THEN 1 ELSE 0 END) AS x2
        |  FROM events, b GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(CASE WHEN x1 > x2 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN x2 > x1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c FROM u)
        |SELECT n_users, b, c,
        |  floor(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
        |    / nullif(b + c, 0) * 1e4 + 0.5) / 1e4 AS mcnemar_chi2,
        |  CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
        |    / nullif(b + c, 0) > 3.841 AS significant_5pct
        |FROM m""".stripMargin,
    // per-stratum ad/n, bc/n micro-fixed by floor-division (all
    // non-negative, so // = Spark div); crude OR for the Simpson
    // contrast
    "q_mantel_haenszel" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day,
        |    (md5_number_lower(CAST(user_id AS VARCHAR))
        |      & 9223372036854775807) % 2 AS arm,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |s AS (SELECT day,
        |    CAST(sum(CASE WHEN arm = 0 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN arm = 0 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN arm = 1 AND y = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN arm = 1 AND y = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM e GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum((CAST(a AS HUGEINT) * d * 1000000)
        |      // (a + b + c + d)) AS BIGINT) AS ad,
        |    CAST(sum((CAST(b AS HUGEINT) * c * 1000000)
        |      // (a + b + c + d)) AS BIGINT) AS bc,
        |    CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
        |    CAST(sum(c) AS BIGINT) AS tc, CAST(sum(d) AS BIGINT) AS td
        |  FROM s)
        |SELECT n_strata,
        |  floor(CAST(ad AS DOUBLE) / bc * 1e6 + 0.5) / 1e6 AS or_mh,
        |  floor(CAST(ta AS DOUBLE) * td / (CAST(tb AS DOUBLE) * tc)
        |    * 1e6 + 0.5) / 1e6 AS or_crude
        |FROM m""".stripMargin,
    "q_cochran_armitage" ->
      """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS rr,
        |    CAST(sum(CAST(substr(o_orderpriority, 1, 1) AS BIGINT))
        |      AS BIGINT) AS swn,
        |    CAST(sum(CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
        |      * CAST(substr(o_orderpriority, 1, 1) AS BIGINT))
        |      AS BIGINT) AS sw2n,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F'
        |      THEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS swr
        |  FROM orders),
        |z AS (SELECT n, rr,
        |    CAST(CAST(n AS HUGEINT) * swr
        |      - CAST(rr AS HUGEINT) * swn AS DOUBLE)
        |    * CAST(CAST(n AS HUGEINT) * swr
        |      - CAST(rr AS HUGEINT) * swn AS DOUBLE)
        |    * (n - 1)
        |    / (CAST(rr AS DOUBLE) * (n - rr))
        |    / CAST(CAST(n AS HUGEINT) * sw2n
        |      - CAST(swn AS HUGEINT) * swn AS DOUBLE) AS z2 FROM m)
        |SELECT n, rr AS n_success,
        |  floor(z2 * 1e4 + 0.5) / 1e4 AS z2,
        |  z2 > 3.841 AS significant_5pct
        |FROM z""".stripMargin,
    "q_fisher_z" ->
      """WITH g AS (SELECT l_returnflag AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |      AS sx,
        |    CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT)
        |      AS sy,
        |    sum(CAST(round(l_quantity) AS HUGEINT)
        |      * CAST(round(l_extendedprice) AS BIGINT)) AS sxy,
        |    sum(CAST(round(l_quantity) AS HUGEINT)
        |      * CAST(round(l_quantity) AS BIGINT)) AS sxx,
        |    sum(CAST(round(l_extendedprice) AS HUGEINT)
        |      * CAST(round(l_extendedprice) AS BIGINT)) AS syy
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A') GROUP BY 1),
        |r AS (SELECT g, n,
        |    CAST(sxy * n - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |      / sqrt(CAST(sxx * n - CAST(sx AS HUGEINT) * sx
        |        AS DOUBLE))
        |      / sqrt(CAST(syy * n - CAST(sy AS HUGEINT) * sy
        |        AS DOUBLE)) AS r FROM g),
        |p AS (SELECT
        |    max(CASE WHEN g = 'R' THEN r END) AS r1,
        |    max(CASE WHEN g = 'R' THEN n END) AS n1,
        |    max(CASE WHEN g = 'A' THEN r END) AS r2,
        |    max(CASE WHEN g = 'A' THEN n END) AS n2 FROM r),
        |z AS (SELECT *, (ln((1 + r1) / (1 - r1)) / 2
        |    - ln((1 + r2) / (1 - r2)) / 2)
        |    / sqrt(1.0 / (n1 - 3) + 1.0 / (n2 - 3)) AS z FROM p)
        |SELECT n1, n2,
        |  floor(r1 * 1e6 + 0.5) / 1e6 AS corr_r,
        |  floor(r2 * 1e6 + 0.5) / 1e6 AS corr_a,
        |  floor(z * 1e4 + 0.5) / 1e4 AS z,
        |  abs(z) > 1.96 AS significant_5pct
        |FROM z""".stripMargin,
    // n-scaled residual lattice (no float mean); x in tens of dollars
    // keeps the squared folds inside DECIMAL/HUGEINT comfortably
    "q_kpss" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) // 100000 AS x
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s FROM daily),
        |e AS (SELECT day, CAST(n AS HUGEINT) * x - s AS e, n
        |  FROM daily, t),
        |c AS (SELECT n, e, sum(e) OVER (ORDER BY day) AS st FROM e),
        |m AS (SELECT max(n) AS n_days, sum(st * st) AS ss2,
        |    sum(e * e) AS se2 FROM c)
        |SELECT CAST(n_days AS BIGINT) AS n_days,
        |  floor(CAST(ss2 AS DOUBLE) / (CAST(se2 AS DOUBLE) * n_days)
        |    * 1e6 + 0.5) / 1e6 AS kpss_eta,
        |  CAST(ss2 AS DOUBLE) / (CAST(se2 AS DOUBLE) * n_days) > 0.463
        |    AS reject_stationarity_5pct
        |FROM m""".stripMargin,
    "q_vwap" ->
      """SELECT CAST(l_shipdate AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_trades,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |    AS qty_sum,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS rev_cents,
        |  floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS DOUBLE)
        |    / sum(CAST(round(l_quantity) AS BIGINT)) / 100
        |    * 1e4 + 0.5) / 1e4 AS vwap
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // shared daily-close CTE: last-of-day tie rule (us, event_id)
    // matches the Spark max_by struct exactly
    "q_atr" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS c,
        |    epoch_us(ts) AS us, event_id FROM events),
        |dd AS (SELECT day, max(c) AS h, min(c) AS l,
        |    max(CASE WHEN rz = 1 THEN c END) AS cl
        |  FROM (SELECT *, row_number() OVER (PARTITION BY day
        |      ORDER BY us DESC, event_id DESC) AS rz FROM e)
        |  GROUP BY 1),
        |t AS (SELECT day, h, l, cl, lag(cl) OVER (ORDER BY day) AS cp
        |  FROM dd),
        |tr AS (SELECT day,
        |    greatest(h - l, abs(h - cp), abs(l - cp)) AS tr,
        |    row_number() OVER (ORDER BY day) AS rn
        |  FROM t WHERE cp IS NOT NULL),
        |a AS (SELECT day, tr, rn, sum(tr) OVER (ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS s14 FROM tr)
        |SELECT day, CAST(tr AS BIGINT) AS tr_cents,
        |  floor(CAST(s14 AS DOUBLE) / 14 / 100 * 1e4 + 0.5) / 1e4
        |    AS atr14
        |FROM a WHERE rn >= 14 ORDER BY day""".stripMargin,
    // %K fixed to the micro lattice by integer floor-division (// on
    // non-negative = Spark div), so %D is an exact 3-row long mean
    "q_stochastic_osc" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS c,
        |    epoch_us(ts) AS us, event_id FROM events),
        |dd AS (SELECT day, max(c) AS h, min(c) AS l,
        |    max(CASE WHEN rz = 1 THEN c END) AS cl
        |  FROM (SELECT *, row_number() OVER (PARTITION BY day
        |      ORDER BY us DESC, event_id DESC) AS rz FROM e)
        |  GROUP BY 1),
        |w AS (SELECT day, cl,
        |    min(l) OVER w14 AS l14, max(h) OVER w14 AS h14,
        |    row_number() OVER (ORDER BY day) AS rn
        |  FROM dd WINDOW w14 AS (ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |k AS (SELECT day,
        |    ((cl - l14) * 100000000) // nullif(h14 - l14, 0) AS k_micro,
        |    row_number() OVER (ORDER BY day) AS rn2
        |  FROM w WHERE rn >= 14),
        |ds AS (SELECT day, k_micro, rn2,
        |    sum(k_micro) OVER w3 AS d_sum, count(k_micro) OVER w3 AS d_n
        |  FROM k WINDOW w3 AS (ORDER BY day
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |SELECT day,
        |  floor(CAST(k_micro AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4
        |    AS pct_k,
        |  floor(CAST(d_sum AS DOUBLE) / d_n / 1e6 * 1e4 + 0.5) / 1e4
        |    AS pct_d
        |FROM ds WHERE rn2 >= 3 ORDER BY day""".stripMargin,
    // per-day term is one HUGEINT floor-division (non-negative), so
    // the mean is an order-free integer sum
    "q_amihud_illiq" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) AS e4,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |      AS vol
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT day, e4, vol, lag(e4) OVER (ORDER BY day) AS pe4
        |  FROM daily),
        |terms AS (SELECT (CAST(abs(e4 - pe4) AS HUGEINT)
        |      * 1000000000000) // (CAST(pe4 AS HUGEINT) * vol) AS t12
        |  FROM t WHERE pe4 IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  floor(CAST(sum(t12) AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4
        |    AS mean_illiq_e12,
        |  CAST(max(t12) AS BIGINT) AS max_illiq_e12
        |FROM terms""".stripMargin,
    // returns on the exact e-9 lattice; moments HUGEINT; the e-9
    // units cancel inside both ratios
    "q_sharpe_sortino" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) AS e4
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT day, e4, lag(e4) OVER (ORDER BY day) AS pe4
        |  FROM daily),
        |r AS (SELECT (CAST(e4 AS HUGEINT) * 1000000000) // pe4
        |    - 1000000000 AS r
        |  FROM t WHERE pe4 IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(r) AS BIGINT) AS sr,
        |    sum(CAST(r AS HUGEINT) * r) AS srr,
        |    sum(CASE WHEN r < 0 THEN CAST(r AS HUGEINT) * r
        |      ELSE CAST(0 AS HUGEINT) END) AS sdn,
        |    CAST(sum(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_down
        |  FROM r)
        |SELECT n_days, n_down,
        |  floor(CAST(sr AS DOUBLE) / n_days / 1e9 * 1e6 + 0.5) / 1e6
        |    AS mean_ret,
        |  floor((CAST(sr AS DOUBLE) / n_days)
        |    / sqrt(CAST(srr * n_days - CAST(sr AS HUGEINT) * sr
        |        AS DOUBLE)
        |      / (CAST(n_days AS DOUBLE) * (n_days - 1)))
        |    * 1e4 + 0.5) / 1e4 AS sharpe,
        |  floor((CAST(sr AS DOUBLE) / n_days)
        |    / sqrt(CAST(sdn AS DOUBLE) / n_days)
        |    * 1e4 + 0.5) / 1e4 AS sortino
        |FROM m""".stripMargin,
    // same succession-edge CTE prefix as q_scc; reciprocated edges by
    // one reversed self-join
    // doubled-rank deviation lattice: T = 2ΣR − m(n+1) keeps the
    // half-integer mean integral; W one division of identical integers
    "q_kendall_w" ->
      """WITH monthly AS (SELECT l_returnflag AS flag,
        |    strftime(l_shipdate, '%Y-%m') AS mon,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) AS e4
        |  FROM lineitem GROUP BY 1, 2),
        |common AS (SELECT mon FROM monthly GROUP BY mon
        |  HAVING count(*) = 3),
        |r AS (SELECT flag, mon, row_number() OVER (
        |    PARTITION BY flag ORDER BY e4, mon) AS r
        |  FROM monthly JOIN common USING (mon)),
        |pm AS (SELECT mon, CAST(sum(r) AS BIGINT) AS rs
        |  FROM r GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pm),
        |tt AS (SELECT 2 * rs - 3 * (n + 1) AS t, n FROM pm, nn),
        |m AS (SELECT sum(CAST(t AS HUGEINT) * t) AS s4,
        |    max(n) AS n FROM tt)
        |SELECT n AS n_months,
        |  floor(CAST(s4 AS DOUBLE)
        |    / (3.0 * (CAST(n AS DOUBLE) * n * n - n)) * 1e6 + 0.5)
        |    / 1e6 AS kendall_w,
        |  floor(3 * (n - 1) * (CAST(s4 AS DOUBLE)
        |    / (3.0 * (CAST(n AS DOUBLE) * n * n - n))) * 1e4 + 0.5)
        |    / 1e4 AS chi2
        |FROM m""".stripMargin,
    // e6-quantized components re-normalized against each vector's
    // EXACT integer norm: every fold below is integer, and the
    // pairwise mean comes from the sum-of-sums identity
    "embed_participation_ratio" ->
      """WITH x AS (SELECT vec_id,
        |    CAST(floor(unnest(embedding)::DOUBLE * 1000000 + 0.5)
        |      AS BIGINT) AS xv,
        |    unnest(range(0, len(embedding))) AS dim
        |  FROM embeddings),
        |cells AS (SELECT a.dim AS i, b.dim AS j,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a.xv) AS BIGINT) AS si,
        |    CAST(sum(b.xv) AS BIGINT) AS sj,
        |    sum(CAST(a.xv AS HUGEINT) * b.xv) AS sij
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.dim >= a.dim
        |  GROUP BY 1, 2),
        |c AS (SELECT i, j,
        |    CAST(floor(CAST(CAST(n AS HUGEINT) * sij
        |      - CAST(si AS HUGEINT) * sj AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n)) AS BIGINT) AS c12
        |  FROM cells),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN i = j THEN c12 END) AS BIGINT) AS tr6,
        |    sum((CASE WHEN i = j THEN 1 ELSE 2 END)
        |      * CAST(c12 AS HUGEINT) * c12) AS tr2,
        |    max(i) AS dmax
        |  FROM c)
        |SELECT CAST(dmax + 1 AS BIGINT) AS dims,
        |  floor(CAST(tr6 AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6
        |    AS trace_c,
        |  floor(CAST(tr6 AS DOUBLE) * tr6 / CAST(tr2 AS DOUBLE) * 1e4
        |    + 0.5) / 1e4 AS participation_ratio,
        |  floor(CAST(tr6 AS DOUBLE) * tr6 / CAST(tr2 AS DOUBLE)
        |    / (dmax + 1) * 1e6 + 0.5) / 1e6 AS pr_normalized
        |FROM t""".stripMargin,
    "embed_isotropy" ->
      """WITH c AS (SELECT vec_id,
        |    unnest(range(0, len(embedding))) AS dim,
        |    CAST(floor(unnest(embedding)::DOUBLE * 1e6 + 0.5)
        |      AS BIGINT) AS x6
        |  FROM embeddings),
        |n2 AS (SELECT vec_id, sum(CAST(x6 AS HUGEINT) * x6) AS n2
        |  FROM c GROUP BY 1),
        |u AS (SELECT c.vec_id, dim,
        |    CAST(floor(x6 / sqrt(CAST(n2 AS DOUBLE)) * 1e6 + 0.5)
        |      AS BIGINT) AS c6
        |  FROM c JOIN n2 ON n2.vec_id = c.vec_id),
        |ds AS (SELECT dim, CAST(sum(c6) AS BIGINT) AS sd,
        |    sum(CAST(c6 AS HUGEINT) * c6) AS sc2 FROM u GROUP BY 1),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
        |m AS (SELECT sum(CAST(sd AS HUGEINT) * sd) AS ss2,
        |    sum(sc2) AS snorm, max(abs(sd)) AS max_abs_sd,
        |    CAST(count(*) AS BIGINT) AS dim FROM ds)
        |SELECT n AS n_vecs, dim,
        |  floor(CAST(ss2 - snorm AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * (n - 1)) / 1e12 * 1e6 + 0.5) / 1e6
        |    AS mean_cos,
        |  floor(sqrt(CAST(ss2 AS DOUBLE)) / n / 1e6 * 1e6 + 0.5) / 1e6
        |    AS mean_dir_mass
        |FROM m, nv""".stripMargin,
    // interpolated per-dim percentiles on identical e6 integers (the
    // embed_norm_stats quantile convention); clip counts compare
    // integers against those identical doubles
    "embed_quantile_clip" ->
      """WITH c AS (SELECT
        |    unnest(range(0, len(embedding))) AS dim,
        |    CAST(floor(unnest(embedding)::DOUBLE * 1e6 + 0.5)
        |      AS BIGINT) AS x6
        |  FROM embeddings),
        |q AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    quantile_cont(x6, 0.01) AS p01,
        |    quantile_cont(x6, 0.99) AS p99
        |  FROM c GROUP BY 1)
        |SELECT CAST(q.dim AS BIGINT) AS dim, n,
        |  floor(p01 / 1e6 * 1e6 + 0.5) / 1e6 AS p01,
        |  floor(p99 / 1e6 * 1e6 + 0.5) / 1e6 AS p99,
        |  CAST(sum(CASE WHEN x6 < q.p01 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_below,
        |  CAST(sum(CASE WHEN x6 > q.p99 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_above
        |FROM c JOIN q ON c.dim = q.dim
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    "q_capture_recapture" ->
      """WITH b AS (SELECT (min(CAST(floor(epoch(ts)) AS BIGINT))
        |      + max(CAST(floor(epoch(ts)) AS BIGINT))) // 2
        |    AS mid FROM events),
        |u AS (SELECT user_id,
        |    max(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < mid
        |      THEN 1 ELSE 0 END) AS h1,
        |    max(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= mid
        |      THEN 1 ELSE 0 END) AS h2
        |  FROM events, b GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_seen,
        |    CAST(sum(h1) AS BIGINT) AS n1,
        |    CAST(sum(h2) AS BIGINT) AS n2,
        |    CAST(sum(h1 * h2) AS BIGINT) AS m FROM u)
        |SELECT n_seen, n1, n2, m,
        |  floor(((CAST(n1 AS DOUBLE) + 1) * (n2 + 1) / (m + 1) - 1)
        |    * 100.0 + 0.5) / 100.0 AS n_hat_chapman,
        |  floor(sqrt((CAST(n1 AS DOUBLE) + 1) * (n2 + 1)
        |    * (n1 - m) * (n2 - m)
        |    / ((CAST(m AS DOUBLE) + 1) * (m + 1) * (m + 2)))
        |    * 100.0 + 0.5) / 100.0 AS se_n_hat
        |FROM m""".stripMargin,
    "text_chao1_richness" ->
      """WITH tk AS (
        |  SELECT source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tk WHERE tok <> '' GROUP BY 1, 2),
        |m AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f2,
        |    CAST(sum(c) AS BIGINT) AS n_tokens FROM c GROUP BY 1)
        |SELECT source, n_tokens, vocab, f1, f2,
        |  floor((vocab + CAST(f1 AS DOUBLE) * (f1 - 1)
        |    / (2.0 * (f2 + 1))) * 100.0 + 0.5) / 100.0 AS chao1,
        |  floor(CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1))
        |    / vocab * 1e6 + 0.5) / 1e6 AS unseen_share
        |FROM m ORDER BY source""".stripMargin,
    // per-group ln v nano-nat fixed, 1/(n-1) e-12 fixed, pooled var an
    // integer fold — no 25-row float sum anywhere
    "q_bartlett_test" ->
      """WITH g AS (SELECT CAST(c_nationkey AS BIGINT) AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(c_acctbal) AS BIGINT)) AS BIGINT)
        |      AS s1,
        |    sum(CAST(round(c_acctbal) AS HUGEINT)
        |      * CAST(round(c_acctbal) AS BIGINT)) AS s2
        |  FROM customer GROUP BY 1),
        |v AS (SELECT g, n,
        |    CAST(s2 * n - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n * (n - 1)) AS v,
        |    (s2 * n - CAST(s1 AS HUGEINT) * s1) // n AS svg
        |  FROM g),
        |w AS (SELECT n,
        |    CAST(floor(ln(v) * 1e9 + 0.5) AS BIGINT) AS lnv9,
        |    1000000000000 // (n - 1) AS inv12, svg FROM v),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum((n - 1) * lnv9) AS BIGINT) AS swl,
        |    CAST(sum(inv12) AS BIGINT) AS sinv,
        |    CAST(sum(svg) AS BIGINT) AS sv FROM w),
        |p AS (SELECT *, CAST(sv AS DOUBLE) / (nn - k) AS sp2 FROM m)
        |SELECT k, nn AS n_total,
        |  floor(sp2 * 1e4 + 0.5) / 1e4 AS pooled_var,
        |  floor(((nn - k) * ln(sp2) - CAST(swl AS DOUBLE) / 1e9)
        |    / (1.0 + (CAST(sinv AS DOUBLE) / 1e12 - 1.0 / (nn - k))
        |      / (3.0 * (k - 1))) * 1e4 + 0.5) / 1e4 AS bartlett_chi2
        |FROM p""".stripMargin,
    // both tail memberships compare integer ranks against n·q computed
    // in DOUBLE on both sides (a DECIMAL threshold would flip boundary
    // rows where n·q lands on an integer)
    "q_tail_dependence" ->
      """WITH per AS (SELECT c_custkey AS cust,
        |    max(CAST(round(c_acctbal * 100) AS BIGINT)) AS bal,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS spend
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1),
        |r AS (SELECT cust,
        |    row_number() OVER (ORDER BY bal, cust) AS rx,
        |    row_number() OVER (ORDER BY spend, cust) AS ry,
        |    count(*) OVER () AS tot FROM per),
        |qq(q) AS (VALUES (CAST(0.90 AS DOUBLE)),
        |  (CAST(0.95 AS DOUBLE)), (CAST(0.99 AS DOUBLE))),
        |m AS (SELECT q, CAST(max(tot) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN rx > CAST(tot AS DOUBLE) * q
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nx,
        |    CAST(sum(CASE WHEN rx > CAST(tot AS DOUBLE) * q
        |      AND ry > CAST(tot AS DOUBLE) * q
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nboth
        |  FROM r, qq GROUP BY 1)
        |SELECT q, n, nx, nboth,
        |  floor(CAST(nboth AS DOUBLE) / nx * 1e6 + 0.5) / 1e6
        |    AS lambda_u
        |FROM m ORDER BY q""".stripMargin,
    // active-vs-market returns on the e-9 lattice over ACTUAL traded
    // days; moments integer, IR/TE pinned doubles
    "q_information_ratio" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CASE WHEN l_returnflag = 'A'
        |      THEN CAST(round(l_extendedprice * 100) AS BIGINT)
        |        * CAST(round((1 - l_discount) * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS a4,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) AS m4
        |  FROM lineitem GROUP BY 1),
        |f AS (SELECT * FROM daily WHERE a4 > 0),
        |t AS (SELECT day, a4, m4, lag(a4) OVER (ORDER BY day) AS pa,
        |    lag(m4) OVER (ORDER BY day) AS pm FROM f),
        |r AS (SELECT (CAST(a4 AS HUGEINT) * 1000000000) // pa
        |    - (CAST(m4 AS HUGEINT) * 1000000000) // pm AS d
        |  FROM t WHERE pa IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(d) AS BIGINT) AS sd,
        |    sum(CAST(d AS HUGEINT) * d) AS sdd FROM r)
        |SELECT n_days,
        |  floor(CAST(sd AS DOUBLE) / n_days / 1e9 * 1e6 + 0.5) / 1e6
        |    AS mean_active_ret,
        |  floor(sqrt(CAST(sdd * n_days - CAST(sd AS HUGEINT) * sd
        |      AS DOUBLE)
        |    / (CAST(n_days AS DOUBLE) * (n_days - 1))) / 1e9
        |    * 1e6 + 0.5) / 1e6 AS tracking_error,
        |  floor((CAST(sd AS DOUBLE) / n_days)
        |    / sqrt(CAST(sdd * n_days - CAST(sd AS HUGEINT) * sd
        |        AS DOUBLE)
        |      / (CAST(n_days AS DOUBLE) * (n_days - 1)))
        |    * 1e4 + 0.5) / 1e4 AS information_ratio
        |FROM m""".stripMargin,
    // nano-nat ln + e-12 reciprocal lattices: both folds order-free
    // long sums; geometric/harmonic means and the two indexes are
    // pinned doubles
    "q_atkinson_index" ->
      """WITH sp AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |f AS (SELECT cents,
        |    CAST(floor(ln(CAST(cents AS DOUBLE)) * 1e9 + 0.5)
        |      AS BIGINT) AS l9,
        |    1000000000000 // cents AS inv12
        |  FROM sp WHERE cents > 0),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS sc,
        |    CAST(sum(l9) AS BIGINT) AS sl,
        |    CAST(sum(inv12) AS BIGINT) AS si FROM f)
        |SELECT n,
        |  floor(CAST(sc AS DOUBLE) / n / 100 * 100 + 0.5) / 100
        |    AS mean_spend,
        |  floor((1.0 - exp(CAST(sl AS DOUBLE) / n / 1e9)
        |    / (CAST(sc AS DOUBLE) / n)) * 1e6 + 0.5) / 1e6
        |    AS atkinson_e1,
        |  floor((1.0 - CAST(n AS DOUBLE) / (CAST(si AS DOUBLE) / 1e12)
        |    / (CAST(sc AS DOUBLE) / n)) * 1e6 + 0.5) / 1e6
        |    AS atkinson_e2
        |FROM m""".stripMargin,
    "q_palma_ratio" ->
      """WITH sp AS (SELECT o_custkey AS cust,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM sp),
        |r AS (SELECT cents, tot,
        |    row_number() OVER (ORDER BY cents, cust) AS rn
        |  FROM sp, t),
        |m AS (SELECT max(tot) AS n, CAST(sum(cents) AS BIGINT) AS total,
        |    CAST(sum(CASE WHEN rn > tot - tot // 10 THEN cents
        |      ELSE 0 END) AS BIGINT) AS top_cents,
        |    CAST(sum(CASE WHEN rn <= (4 * tot) // 10 THEN cents
        |      ELSE 0 END) AS BIGINT) AS bottom_cents FROM r)
        |SELECT n,
        |  floor(CAST(top_cents AS DOUBLE) / total * 1e6 + 0.5) / 1e6
        |    AS top10_share,
        |  floor(CAST(bottom_cents AS DOUBLE) / total * 1e6 + 0.5) / 1e6
        |    AS bottom40_share,
        |  floor(CAST(top_cents AS DOUBLE) / bottom_cents * 1e4 + 0.5)
        |    / 1e4 AS palma_ratio
        |FROM m""".stripMargin,
    // n-scaled cumulative path (q_kpss convention): path, running min
    // and max gap all exact integers; first argmax on the total order
    "q_page_hinkley" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT))
        |      AS BIGINT) AS e4
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(e4) AS BIGINT) AS s FROM daily),
        |u AS (SELECT day, n,
        |    sum(CAST(n AS HUGEINT) * e4 - s) OVER (ORDER BY day) AS u
        |  FROM daily, t),
        |g AS (SELECT day, n, u - min(u) OVER (ORDER BY day) AS gap
        |  FROM u),
        |r AS (SELECT *, row_number() OVER (ORDER BY gap DESC, day)
        |    AS rk FROM g)
        |SELECT n AS n_days, day AS alarm_day,
        |  floor(CAST(gap AS DOUBLE) / n / 10000 * 100 + 0.5) / 100
        |    AS ph_dollars
        |FROM r WHERE rk = 1""".stripMargin,
    // same succession CTE; undirected adjacency, centers weight their
    // pair contributions by floor(1e6/ln(deg)+0.5); NOT EXISTS drops
    // existing edges; ties in the top-20 break on the (u, w) order
    "q_adamic_adar" ->
      """WITH sp AS (SELECT p_partkey FROM part WHERE p_size = 1),
        |li AS (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |nxt AS (SELECT l_partkey, lead(l_partkey) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey)
        |    AS np
        |  FROM li),
        |e AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src,
        |    CAST(np AS BIGINT) AS dst FROM nxt
        |  WHERE np IS NOT NULL AND np <> l_partkey),
        |und AS (SELECT DISTINCT a, b FROM (
        |  SELECT src AS a, dst AS b FROM e
        |  UNION ALL SELECT dst, src FROM e)),
        |deg AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS deg
        |  FROM und GROUP BY 1),
        |adj AS (SELECT a AS v, b AS n FROM und),
        |pr AS (SELECT x.n AS u, y.n AS w,
        |    CAST(count(*) AS BIGINT) AS n_common,
        |    CAST(sum(CAST(floor(1e6 / ln(CAST(deg AS DOUBLE)) + 0.5)
        |      AS BIGINT)) AS BIGINT) AS aa_micro
        |  FROM adj x JOIN adj y ON x.v = y.v AND x.n < y.n
        |  JOIN deg ON deg.v = x.v
        |  GROUP BY 1, 2),
        |cand AS (SELECT * FROM pr WHERE NOT EXISTS (
        |  SELECT 1 FROM und WHERE und.a = pr.u AND und.b = pr.w)),
        |rk AS (SELECT *, row_number() OVER (
        |    ORDER BY aa_micro DESC, u, w) AS rk FROM cand)
        |SELECT CAST(rk AS BIGINT) AS rk, u, w, n_common, aa_micro
        |FROM rk WHERE rk <= 20 ORDER BY rk""".stripMargin,
    // per-doc D micro-fixed by floor-division (// = Spark div on
    // non-negatives); pooled D divides the HUGEINT census sums once
    "text_yule_richness" ->
      """WITH tk AS (SELECT source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tk WHERE tok <> '' GROUP BY 1, 2),
        |m AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v1,
        |    sum(CAST(c AS HUGEINT) * c) AS s2
        |  FROM c GROUP BY 1)
        |SELECT source, n, v, v1,
        |  floor(1e4 * (CAST(s2 AS DOUBLE) - n)
        |    / (CAST(n AS DOUBLE) * n) * 1e4 + 0.5) / 1e4 AS yule_k,
        |  floor(CAST(v AS DOUBLE) / sqrt(CAST(n AS DOUBLE)) * 1e4
        |    + 0.5) / 1e4 AS guiraud_r,
        |  floor(100 * ln(CAST(n AS DOUBLE)) / nullif(1.0
        |    - CAST(v1 AS DOUBLE) / v, 0.0) * 100 + 0.5) / 100
        |    AS honore_h
        |FROM m ORDER BY source""".stripMargin,
    "text_msttr" ->
      """WITH tk AS (SELECT source, doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
        |    generate_subscripts(
        |      regexp_split_to_array(trim(text), '\s+'), 1) - 1 AS pos
        |  FROM documents),
        |seg AS (SELECT source, doc_id, pos // 50 AS seg,
        |    CAST(count(*) AS BIGINT) AS n_tok,
        |    CAST(count(DISTINCT tok) AS BIGINT) AS v
        |  FROM tk WHERE tok <> '' GROUP BY 1, 2, 3),
        |f AS (SELECT source, v * 200 AS ttr_bp FROM seg
        |  WHERE n_tok = 50)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_segments,
        |  floor(CAST(sum(ttr_bp) AS DOUBLE) / count(*) * 100 + 0.5)
        |    / 100 AS mean_ttr_bp
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_burrows_delta" ->
      """WITH tk AS (SELECT source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |t0 AS (SELECT source, tok FROM tk WHERE tok <> ''),
        |top AS (SELECT tok FROM (SELECT tok, count(*) AS ct FROM t0
        |    GROUP BY 1) ORDER BY ct DESC, tok LIMIT 20),
        |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        |  FROM t0 GROUP BY 1),
        |cw AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM t0 WHERE tok IN (SELECT tok FROM top) GROUP BY 1, 2),
        |f AS (SELECT ns.source, top.tok,
        |    (coalesce(cw.c, 0) * 1000000) // ns.n_s AS f6
        |  FROM ns CROSS JOIN top
        |  LEFT JOIN cw ON cw.source = ns.source AND cw.tok = top.tok),
        |z AS (SELECT source, tok,
        |    CAST(floor((CAST(count(*) OVER (PARTITION BY tok)
        |        AS DOUBLE) * f6 - sum(f6) OVER (PARTITION BY tok))
        |      / nullif(sqrt(CAST(count(*) OVER (PARTITION BY tok)
        |          AS DOUBLE) * sum(f6 * f6) OVER (PARTITION BY tok)
        |        - CAST(sum(f6) OVER (PARTITION BY tok) AS DOUBLE)
        |          * sum(f6) OVER (PARTITION BY tok)), 0.0)
        |      * 1e6) AS BIGINT) AS z6
        |  FROM f)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(count(*) AS BIGINT) AS n_words,
        |  floor(CAST(sum(abs(a.z6 - b.z6)) AS DOUBLE) / count(*)
        |    / 1e6 * 1e6 + 0.5) / 1e6 AS delta
        |FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_simpson_diversity" ->
      """WITH tk AS (
        |  SELECT doc_id, source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT source, doc_id, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tk WHERE tok <> '' GROUP BY 1, 2, 3),
        |pd AS (SELECT source, doc_id, sum(c) AS n,
        |    sum(c * (c - 1)) AS rep FROM c GROUP BY 1, 2),
        |dm AS (SELECT source, doc_id,
        |    (rep * 1000000) // nullif(n * (n - 1), 0) AS d_micro FROM pd),
        |pc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tk WHERE tok <> '' GROUP BY 1, 2),
        |pool AS (SELECT source, sum(c) AS n,
        |    sum(CAST(c AS HUGEINT) * (c - 1)) AS rep FROM pc GROUP BY 1),
        |pm AS (SELECT source,
        |    (rep * 1000000) // nullif(CAST(n AS HUGEINT) * (n - 1), 0)
        |      AS pooled_micro FROM pool)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  floor(CAST(sum(d_micro) AS DOUBLE) / count(*) / 1e6 * 1e6
        |    + 0.5) / 1e6 AS mean_doc_simpson,
        |  floor(CAST(max(pooled_micro) AS DOUBLE) / 1e6 * 1e6 + 0.5)
        |    / 1e6 AS pooled_simpson
        |FROM dm JOIN pm USING (source)
        |GROUP BY source ORDER BY source""".stripMargin,
    // generator replay: the P6 raster carries gray
    // (i*31 + j*17 + doc) % 256 in every channel
    "multimodal_qoi_codec" ->
      """WITH d AS (SELECT doc_id, 8 + (doc_id * 17) % 24 AS w,
        |    8 + (doc_id * 19) % 24 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS i FROM d),
        |ys AS (SELECT doc_id, w, h, i, unnest(range(h)) AS j FROM xs)
        |SELECT doc_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(sum((i * 31 + j * 17 + doc_id) % 256) AS BIGINT)
        |    AS px_sum
        |FROM ys GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    "multimodal_pnm_codec" ->
      """WITH d AS (SELECT doc_id, 8 + (doc_id * 23) % 24 AS w,
        |    8 + (doc_id * 29) % 24 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS i FROM d),
        |ys AS (SELECT doc_id, w, h, i, unnest(range(h)) AS j FROM xs)
        |SELECT doc_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(sum((i * 31 + j * 17 + doc_id) % 256) AS BIGINT)
        |    AS px_sum
        |FROM ys GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    "q_dyad_census" ->
      """WITH sp AS (SELECT p_partkey FROM part WHERE p_size = 1),
        |li AS (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |nxt AS (SELECT l_partkey, lead(l_partkey) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey)
        |    AS np
        |  FROM li),
        |e AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src,
        |    CAST(np AS BIGINT) AS dst FROM nxt
        |  WHERE np IS NOT NULL AND np <> l_partkey),
        |nn AS (SELECT CAST(count(DISTINCT id) AS BIGINT) AS n_nodes
        |  FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
        |nr AS (SELECT CAST(count(*) AS BIGINT) AS n_recip FROM e a
        |  JOIN e b ON b.src = a.dst AND b.dst = a.src)
        |SELECT n_nodes, n_edges,
        |  CAST(n_recip // 2 AS BIGINT) AS n_mutual_dyads,
        |  n_edges - n_recip AS n_asym_dyads,
        |  floor(CAST(n_recip AS DOUBLE) / n_edges * 1e6 + 0.5) / 1e6
        |    AS reciprocity
        |FROM nn, ne, nr""".stripMargin,
    // id-increasing edges are a DAG by construction, so the recursive
    // (node, depth) walk is finite; longest path = max depth per node
    "q_dag_longest_path" ->
      """WITH RECURSIVE sp AS (SELECT p_partkey FROM part
        |  WHERE p_size = 1),
        |li AS (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey
        |  FROM lineitem JOIN sp ON l_partkey = p_partkey),
        |nxt AS (SELECT l_partkey, lead(l_partkey) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey)
        |    AS np
        |  FROM li),
        |e AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src,
        |    CAST(np AS BIGINT) AS dst FROM nxt
        |  WHERE np IS NOT NULL AND np <> l_partkey
        |    AND l_partkey < np),
        |nodes AS (SELECT DISTINCT src AS id FROM e
        |  UNION SELECT DISTINCT dst FROM e),
        |walk(v, dd) AS (SELECT id, 0 FROM nodes
        |  UNION
        |  SELECT e.dst, w.dd + 1 FROM walk w JOIN e ON e.src = w.v),
        |ld AS (SELECT v, CAST(max(dd) AS BIGINT) AS dist FROM walk
        |  GROUP BY v)
        |SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes,
        |  min(v) AS min_id, max(v) AS max_id
        |FROM ld GROUP BY dist ORDER BY dist""".stripMargin,
    "q_bh_fdr" -> fdrOracle(1.0),
    "q_benjamini_yekutieli" ->
      fdrOracle((1 to 25).map(1.0 / _.toDouble).sum),
    // rank-wise cross-flag mean as the shared reference distribution;
    // exact integer div of the e4 sum, ties broken by day both sides
    "q_quantile_normalize" ->
      """WITH daily AS (SELECT l_returnflag AS flag,
        |    CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1, 2),
        |full_d AS (SELECT day FROM daily GROUP BY day
        |  HAVING count(*) = 3),
        |common AS (SELECT d.* FROM daily d JOIN full_d USING (day)),
        |ranked AS (SELECT flag, day, e4, CAST(row_number() OVER (
        |    PARTITION BY flag ORDER BY e4, day) AS BIGINT) AS rn
        |  FROM common),
        |ref AS (SELECT rn, CAST(sum(e4) // 3 AS BIGINT) AS norm_e4
        |  FROM ranked GROUP BY rn)
        |SELECT flag, rn, day,
        |  floor(CAST(e4 AS DOUBLE) / 10000 * 100.0 + 0.5) / 100.0
        |    AS revenue,
        |  floor(CAST(norm_e4 AS DOUBLE) / 10000 * 100.0 + 0.5) / 100.0
        |    AS norm_revenue
        |FROM ranked JOIN ref USING (rn) ORDER BY flag, rn""".stripMargin,
    // Hamilton largest remainder, pure integer arithmetic; numerators
    // non-negative so // (floor) equals Spark's truncating div
    "q_apportionment" ->
      """WITH g AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    CAST(count(*) AS BIGINT) AS n_cust FROM customer
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(n_cust) AS BIGINT) AS nt FROM g),
        |b AS (SELECT nation, n_cust,
        |    CAST((n_cust * 1000) // nt AS BIGINT) AS base,
        |    n_cust * 1000 - ((n_cust * 1000) // nt) * nt AS rem
        |  FROM g, t),
        |k AS (SELECT 1000 - CAST(sum(base) AS BIGINT) AS kk FROM b),
        |r AS (SELECT b.*, row_number() OVER (
        |    ORDER BY rem DESC, nation) AS rrank FROM b)
        |SELECT nation, n_cust, base,
        |  CAST(CASE WHEN rrank <= kk THEN 1 ELSE 0 END AS BIGINT)
        |    AS bonus,
        |  base + CAST(CASE WHEN rrank <= kk THEN 1 ELSE 0 END
        |    AS BIGINT) AS seats
        |FROM r, k ORDER BY nation""".stripMargin,
    // generator-replay oracle: the three injected variants MUST
    // collapse to the clean lowered text's fingerprint (ASCII corpus:
    // NFKC+casefold+mark-strip of every variant = lower(text))
    "dedup_unicode" ->
      """SELECT doc_id, CAST(3 AS BIGINT) AS n_variants,
        |  CAST(1 AS BIGINT) AS n_canon,
        |  CAST(md5_number_lower(lower(text))
        |    & 9223372036854775807 AS BIGINT) AS canon_h
        |FROM documents ORDER BY doc_id""".stripMargin,
    "engine_schema_validate" ->
      """WITH nv AS (
        |  SELECT event_id, 'k' AS name,
        |    json_extract_string(props, '$.k') AS value FROM events
        |  UNION ALL
        |  SELECT event_id, 'mixed_id',
        |    CASE WHEN event_id % 7 = 0
        |      THEN 'id-' || json_extract_string(props, '$.k')
        |      ELSE json_extract_string(props, '$.k') END FROM events
        |  UNION ALL
        |  SELECT event_id, 'note',
        |    CASE WHEN event_id % 13 = 0 THEN repeat('x', 130)
        |      ELSE 'ok' END FROM events
        |  UNION ALL
        |  SELECT event_id, 'event_time',
        |    strftime(ts, '%Y-%m-%dT%H:%M:%S') FROM events),
        |census AS (SELECT name,
        |    CASE WHEN regexp_full_match(value, '-?[0-9]+(\.[0-9]+)?')
        |           THEN 'NUMBER'
        |         WHEN contains(lower(name), 'time')
        |           AND contains(value, ':') AND contains(value, 'T')
        |           THEN 'DATE'
        |         WHEN length(value) < 128 THEN 'MEDIUM_STRING'
        |         ELSE 'TEXT' END AS vclass,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM nv GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY name
        |      ORDER BY n DESC, vclass) AS rn,
        |    CAST(sum(n) OVER (PARTITION BY name) AS BIGINT) AS n_rows
        |  FROM census)
        |SELECT name, vclass AS majority_class, n_rows, n AS n_conform,
        |  n_rows - n AS n_violations,
        |  floor(CAST(n_rows - n AS DOUBLE) / n_rows * 1e6 + 0.5) / 1e6
        |    AS violation_rate
        |FROM r WHERE rn = 1 ORDER BY name""".stripMargin,
    "q_cronbach_alpha" ->
      """WITH li AS (SELECT o, item, CAST(sum(q) AS BIGINT) AS q
        |  FROM (SELECT l_orderkey AS o, l_linenumber AS item,
        |      CAST(round(l_quantity) AS BIGINT) AS q FROM lineitem)
        |  GROUP BY 1, 2),
        |comp AS (SELECT o, CAST(sum(q) AS BIGINT) AS total
        |  FROM li GROUP BY 1 HAVING count(*) = 7),
        |sc AS (SELECT li.* FROM li JOIN comp USING (o)),
        |itm AS (SELECT item, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(q) AS BIGINT) AS s1,
        |    CAST(sum(q * q) AS BIGINT) AS s2 FROM sc GROUP BY 1),
        |inum AS (SELECT sum(CAST(n AS HUGEINT) * s2
        |      - CAST(s1 AS HUGEINT) * s1) AS item_vnum,
        |    CAST(count(*) AS BIGINT) AS k_items FROM itm),
        |tm AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(total) AS BIGINT) AS s1,
        |    CAST(sum(total * total) AS BIGINT) AS s2 FROM comp),
        |tnum AS (SELECT n, CAST(n AS HUGEINT) * s2
        |    - CAST(s1 AS HUGEINT) * s1 AS tot_vnum FROM tm)
        |SELECT k_items, n AS n_orders,
        |  floor(CAST(item_vnum AS DOUBLE) / (CAST(n AS DOUBLE) * n)
        |    * 1e4 + 0.5) / 1e4 AS sum_item_var,
        |  floor(CAST(tot_vnum AS DOUBLE) / (CAST(n AS DOUBLE) * n)
        |    * 1e4 + 0.5) / 1e4 AS total_var,
        |  floor((7 / CAST(7 - 1 AS DOUBLE)) * (1 -
        |    CAST(item_vnum AS DOUBLE) / CAST(tot_vnum AS DOUBLE))
        |    * 1e6 + 0.5) / 1e6 AS cronbach_alpha
        |FROM inum CROSS JOIN tnum""".stripMargin,
    "q_wilcoxon_signed_rank" ->
      """WITH pq AS (SELECT l_orderkey,
        |    max(CASE WHEN l_linenumber = 1
        |      THEN CAST(round(l_quantity) AS BIGINT) END) AS q1,
        |    max(CASE WHEN l_linenumber = 2
        |      THEN CAST(round(l_quantity) AS BIGINT) END) AS q2
        |  FROM lineitem WHERE l_linenumber <= 2 GROUP BY 1),
        |df AS (SELECT q1 - q2 AS diff FROM pq
        |  WHERE q1 IS NOT NULL AND q2 IS NOT NULL AND q1 - q2 <> 0),
        |vals AS (SELECT abs(diff) AS ad, diff > 0 AS pos,
        |    CAST(count(*) AS BIGINT) AS c FROM df GROUP BY 1, 2),
        |hist AS (SELECT ad, CAST(sum(c) AS BIGINT) AS t FROM vals
        |  GROUP BY 1),
        |rk AS (SELECT ad, t,
        |    2 * CAST(sum(t) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) - t + 1 AS r2
        |  FROM hist),
        |ag AS (SELECT
        |    CAST(sum(CASE WHEN pos THEN c ELSE 0 END * r2) AS BIGINT)
        |      AS w2_plus,
        |    CAST(sum(c * r2) AS BIGINT) AS w2_all
        |  FROM vals JOIN rk USING (ad)),
        |ti AS (SELECT CAST(sum(t) AS BIGINT) AS n_pairs,
        |    sum(CAST(t AS HUGEINT) * t * t - t) AS tie_term FROM hist),
        |z AS (SELECT *, 2 * CAST(n_pairs AS HUGEINT) * (n_pairs + 1)
        |    * (2 * n_pairs + 1) - tie_term AS sig48
        |  FROM ag CROSS JOIN ti)
        |SELECT n_pairs, CAST(w2_plus AS DOUBLE) / 2 AS w_plus,
        |  CAST(w2_all - w2_plus AS DOUBLE) / 2 AS w_minus,
        |  floor((CAST(w2_plus AS DOUBLE) / 2 - CAST(n_pairs AS DOUBLE)
        |    * (n_pairs + 1) / 4) / sqrt(CAST(sig48 AS DOUBLE) / 48)
        |    * 1e6 + 0.5) / 1e6 AS z_stat
        |FROM z""".stripMargin,
    "q_changepoint" ->
      (s"WITH $dailyFlagCte,\n" +
      """idx AS (SELECT flag, day, e4,
        |    row_number() OVER (PARTITION BY flag ORDER BY day) AS rn,
        |    count(*) OVER (PARTITION BY flag) AS n,
        |    CAST(sum(e4) OVER (PARTITION BY flag ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS s_t,
        |    CAST(sum(e4) OVER (PARTITION BY flag) AS BIGINT) AS s_all
        |  FROM daily),
        |g AS (SELECT *, CAST(s_t AS HUGEINT) * n
        |    - CAST(s_all AS HUGEINT) * rn AS num
        |  FROM idx WHERE rn < n),
        |g2 AS (SELECT *, CAST(num * num AS DOUBLE)
        |    / (CAST(rn AS DOUBLE) * (n - rn)) AS gain FROM g),
        |p AS (SELECT *, row_number() OVER (PARTITION BY flag
        |    ORDER BY gain DESC, rn) AS rk FROM g2)
        |SELECT flag, day AS cp_day, CAST(rn AS BIGINT) AS t,
        |  CAST(n AS BIGINT) AS n_days,
        |  floor(CAST(s_t AS DOUBLE) / rn / 10000 * 100.0 + 0.5) / 100.0
        |    AS mean_before,
        |  floor(CAST(s_all - s_t AS DOUBLE) / (n - rn) / 10000 * 100.0
        |    + 0.5) / 100.0 AS mean_after
        |FROM p WHERE rk = 1 ORDER BY flag""".stripMargin),
    "q_dickey_fuller" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |pr AS (SELECT e4 - ylag AS dy, ylag AS x FROM (
        |    SELECT e4, lag(e4) OVER (ORDER BY day) AS ylag FROM daily)
        |  WHERE ylag IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    CAST(sum(dy) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * dy) AS sxy,
        |    sum(CAST(dy AS HUGEINT) * dy) AS syy
        |  FROM pr),
        |b AS (SELECT *, (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta FROM m),
        |a AS (SELECT *, (CAST(sy AS DOUBLE)
        |    - beta * CAST(sx AS DOUBLE)) / n AS alpha FROM b),
        |e AS (SELECT *, CAST(syy AS DOUBLE)
        |    - alpha * CAST(sy AS DOUBLE)
        |    - beta * CAST(sxy AS DOUBLE) AS sse,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |    * (CAST(sx AS DOUBLE) / n) AS sxxc FROM a)
        |SELECT n,
        |  floor(alpha / 10000 * 100.0 + 0.5) / 100.0 AS alpha_dollars,
        |  floor(beta * 1e8 * 1e4 + 0.5) / 1e4 AS beta_e8,
        |  floor(beta / sqrt(sse / (n - 2) / sxxc) * 1e4 + 0.5) / 1e4
        |    AS t_df
        |FROM e""".stripMargin,
    "q_tukey_hsd" ->
      """WITH cust AS (SELECT CAST(c_nationkey AS BIGINT) AS g,
        |    CAST(round(c_acctbal) AS BIGINT) AS v FROM customer),
        |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(v) AS BIGINT) AS s,
        |    sum(CAST(v AS HUGEINT) * v) AS s2 FROM cust GROUP BY 1),
        |mw AS (SELECT CAST(sum(CAST(s2 AS HUGEINT) * 10000
        |    - (CAST(s AS HUGEINT) * s * 10000) // n_g) AS DOUBLE)
        |    / 10000 / (sum(n_g) - count(*)) AS msw FROM grp)
        |SELECT a.g AS g_i, b.g AS g_j, a.n_g AS n_i, b.n_g AS n_j,
        |  floor(CAST(a.s AS DOUBLE) / a.n_g * 1e4 + 0.5) / 1e4
        |    AS mean_i,
        |  floor(CAST(b.s AS DOUBLE) / b.n_g * 1e4 + 0.5) / 1e4
        |    AS mean_j,
        |  floor(abs(CAST(a.s AS DOUBLE) / a.n_g
        |    - CAST(b.s AS DOUBLE) / b.n_g)
        |    / sqrt(msw / 2 * (1.0 / a.n_g + 1.0 / b.n_g)) * 1e4 + 0.5)
        |    / 1e4 AS q_stat,
        |  abs(CAST(a.s AS DOUBLE) / a.n_g - CAST(b.s AS DOUBLE) / b.n_g)
        |    / sqrt(msw / 2 * (1.0 / a.n_g + 1.0 / b.n_g)) > 5.03
        |    AS significant
        |FROM grp a JOIN grp b ON a.g < b.g CROSS JOIN mw
        |ORDER BY 1, 2""".stripMargin,
    "multimodal_tiff_codec" ->
      """WITH d AS (SELECT doc_id, 8 + (doc_id * 11) % 24 AS w,
        |    8 + (doc_id * 13) % 24 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS i FROM d),
        |ys AS (SELECT doc_id, w, h, i, unnest(range(h)) AS j FROM xs)
        |SELECT doc_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(sum((i * 31 + j * 17 + doc_id) % 256) AS BIGINT)
        |    AS px_sum
        |FROM ys GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    "text_js_divergence" ->
      """WITH tok AS (SELECT source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |tk AS (SELECT source, w FROM tok WHERE w <> ''),
        |sc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS cs
        |  FROM tk GROUP BY 1, 2),
        |st AS (SELECT source, CAST(count(*) AS BIGINT) AS ns FROM tk
        |  GROUP BY 1),
        |cq AS (SELECT w, CAST(count(*) AS BIGINT) AS cc FROM tk
        |  GROUP BY 1),
        |ct AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM tk),
        |terms AS (SELECT source, ns, nc,
        |    cs * CAST(round(ln((2.0 * cs * nc) /
        |      (CAST(cs AS DOUBLE) * nc + CAST(cc AS DOUBLE) * ns))
        |      * 1e6) AS BIGINT) AS p_term,
        |    cc * CAST(round(ln((2.0 * cc * ns) /
        |      (CAST(cs AS DOUBLE) * nc + CAST(cc AS DOUBLE) * ns))
        |      * 1e6) AS BIGINT) AS q_term,
        |    cc
        |  FROM sc JOIN cq USING (w) JOIN st USING (source)
        |  CROSS JOIN ct),
        |ag AS (SELECT source, max(ns) AS n_tokens, max(nc) AS nc,
        |    CAST(sum(p_term) AS BIGINT) AS p_sum,
        |    CAST(sum(q_term) AS BIGINT) AS q_sum,
        |    CAST(sum(cc) AS BIGINT) AS cc_seen
        |  FROM terms GROUP BY 1)
        |SELECT source, n_tokens,
        |  floor((CAST(p_sum AS DOUBLE) / n_tokens
        |    + CAST(q_sum + (nc - cc_seen) * 693147 AS DOUBLE) / nc)
        |    / 2 / 1e6 * 1e6 + 0.5) / 1e6 AS js_divergence
        |FROM ag ORDER BY source""".stripMargin,
    "q_poisson_rate" ->
      """WITH pe AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events WHERE event_type = 'purchase'),
        |sp AS (SELECT min(ts_s) AS t0, max(ts_s) AS t1,
        |    (min(ts_s) + max(ts_s)) // 2 AS mid FROM pe),
        |ag AS (SELECT
        |    CAST(sum(CASE WHEN ts_s < mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN ts_s >= mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    CAST(max(mid - t0) AS BIGINT) AS t1_s,
        |    CAST(max(t1 - mid + 1) AS BIGINT) AS t2_s
        |  FROM pe CROSS JOIN sp)
        |SELECT n1, n2, t1_s, t2_s,
        |  floor(CAST(n1 AS DOUBLE) / t1_s * 3600 * 1e6 + 0.5) / 1e6
        |    AS rate1_per_h,
        |  floor(CAST(n2 AS DOUBLE) / t2_s * 3600 * 1e6 + 0.5) / 1e6
        |    AS rate2_per_h,
        |  floor((CAST(n1 AS DOUBLE) / t1_s - CAST(n2 AS DOUBLE) / t2_s)
        |    / sqrt(CAST(n1 AS DOUBLE) / (CAST(t1_s AS DOUBLE) * t1_s)
        |    + CAST(n2 AS DOUBLE) / (CAST(t2_s AS DOUBLE) * t2_s))
        |    * 1e4 + 0.5) / 1e4 AS z_stat
        |FROM ag""".stripMargin,
    "q_cochran_q" ->
      """WITH b AS (SELECT l_orderkey,
        |    CAST(max(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x1,
        |    CAST(max(CASE WHEN l_tax >= 0.04 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x2,
        |    CAST(max(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x3
        |  FROM lineitem GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(x1) AS BIGINT) AS g1,
        |    CAST(sum(x2) AS BIGINT) AS g2,
        |    CAST(sum(x3) AS BIGINT) AS g3,
        |    CAST(sum(x1 + x2 + x3) AS BIGINT) AS sl,
        |    CAST(sum((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS sl2
        |  FROM b)
        |SELECT n_blocks, g1, g2, g3,
        |  floor(CAST((3 - 1) * (3 * (CAST(g1 AS HUGEINT) * g1
        |    + CAST(g2 AS HUGEINT) * g2 + CAST(g3 AS HUGEINT) * g3)
        |    - CAST(g1 + g2 + g3 AS HUGEINT) * (g1 + g2 + g3))
        |    AS DOUBLE) / (3 * sl - sl2) * 1e4 + 0.5) / 1e4 AS q_stat
        |FROM a""".stripMargin,
    "q_dau_mau" ->
      """WITH ev AS (SELECT user_id, strftime(ts, '%Y-%m') AS month,
        |    CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT month, day,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM ev GROUP BY 1, 2),
        |dm AS (SELECT month, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(dau) AS BIGINT) AS dau_sum FROM dau GROUP BY 1),
        |mau AS (SELECT month,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        |  FROM ev GROUP BY 1)
        |SELECT month, n_days,
        |  floor(CAST(dau_sum AS DOUBLE) / n_days * 1e4 + 0.5) / 1e4
        |    AS avg_dau,
        |  mau,
        |  floor(CAST(dau_sum AS DOUBLE) / n_days / mau * 1e6 + 0.5)
        |    / 1e6 AS stickiness
        |FROM dm JOIN mau USING (month) ORDER BY month""".stripMargin,
    "q_rfm_migration" ->
      """WITH ord AS (SELECT o_custkey AS cust,
        |    CAST(o_orderdate AS DATE) AS dt,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |md AS (SELECT min(dt)
        |    + CAST(date_diff('day', min(dt), max(dt)) // 2 AS INTEGER)
        |    AS mid
        |  FROM ord),
        |sp AS (SELECT CASE WHEN dt < mid THEN 'before' ELSE 'after' END
        |    AS half, cust, CAST(sum(cents) AS BIGINT) AS spend
        |  FROM ord CROSS JOIN md GROUP BY 1, 2),
        |sg AS (SELECT half, cust, CAST(ntile(5) OVER (PARTITION BY half
        |    ORDER BY spend, cust) AS BIGINT) AS seg FROM sp),
        |b AS (SELECT cust, seg AS seg_before FROM sg
        |  WHERE half = 'before'),
        |a AS (SELECT cust, seg AS seg_after FROM sg
        |  WHERE half = 'after')
        |SELECT coalesce(seg_before, 0) AS seg_before,
        |  coalesce(seg_after, 0) AS seg_after,
        |  CAST(count(*) AS BIGINT) AS n_customers
        |FROM b FULL OUTER JOIN a USING (cust)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "source_parquet_footer" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS footer_rows,
        |  CAST(min(o_orderkey) AS BIGINT) AS footer_min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS footer_max_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_overdispersion" ->
      """WITH pd AS (SELECT source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |      AS BIGINT) AS n_tok FROM documents),
        |ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS s1,
        |    sum(CAST(n_tok AS HUGEINT) * n_tok) AS s2
        |  FROM pd GROUP BY 1),
        |m AS (SELECT *, CAST(s1 AS DOUBLE) / n_docs AS mean,
        |    CAST(CAST(n_docs AS HUGEINT) * s2
        |      - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
        |      / (CAST(n_docs AS DOUBLE) * n_docs) AS variance
        |  FROM ag)
        |SELECT source, n_docs,
        |  floor(mean * 1e4 + 0.5) / 1e4 AS mean_tokens,
        |  floor(variance * 1e4 + 0.5) / 1e4 AS var_tokens,
        |  floor(variance / mean * 1e6 + 0.5) / 1e6 AS dispersion,
        |  floor(CASE WHEN variance <= mean THEN NULL
        |    ELSE mean * mean / (variance - mean) END * 1e4 + 0.5) / 1e4
        |    AS nb_r,
        |  floor(CASE WHEN variance <= mean THEN NULL
        |    ELSE mean / variance END * 1e6 + 0.5) / 1e6 AS nb_p
        |FROM m ORDER BY source""".stripMargin,
    "q_itemset3" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS o,
        |    l_partkey % 25 AS p FROM lineitem),
        |mp AS (SELECT greatest(count(DISTINCT o) // 500, 2)
        |    AS min_pair FROM it),
        |pi AS (SELECT x.o, x.p AS a, y.p AS b FROM it x
        |  JOIN it y ON x.o = y.o AND x.p < y.p),
        |fp AS (SELECT a, b FROM (SELECT a, b, count(*) AS sup
        |    FROM pi GROUP BY 1, 2) CROSS JOIN mp
        |  WHERE sup >= min_pair),
        |ti AS (SELECT w.o, w.a, w.b, z.p AS c
        |  FROM (SELECT pi.* FROM pi JOIN fp USING (a, b)) w
        |  JOIN it z ON w.o = z.o AND z.p > w.b
        |  WHERE EXISTS (SELECT 1 FROM fp
        |      WHERE fp.a = w.a AND fp.b = z.p)
        |    AND EXISTS (SELECT 1 FROM fp
        |      WHERE fp.a = w.b AND fp.b = z.p))
        |SELECT a, b, c, CAST(count(*) AS BIGINT) AS support
        |FROM ti GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY support DESC, 1, 2, 3 LIMIT 50""".stripMargin,
    "q_lorenz_deciles" ->
      """WITH spd AS (SELECT o_custkey AS cust,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents FROM orders GROUP BY 1),
        |dc AS (SELECT *, CAST(ntile(10) OVER (ORDER BY cents, cust)
        |    AS BIGINT) AS decile FROM spd),
        |ag AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(cents) AS BIGINT) AS spnd FROM dc GROUP BY 1),
        |t AS (SELECT CAST(sum(spnd) AS BIGINT) AS total FROM ag)
        |SELECT decile, n_customers,
        |  floor(CAST(spnd AS DOUBLE) / total * 1e6 + 0.5) / 1e6
        |    AS spend_share,
        |  floor(CAST(CAST(sum(spnd) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS DOUBLE) / total * 1e6 + 0.5) / 1e6
        |    AS cum_share
        |FROM ag CROSS JOIN t ORDER BY decile""".stripMargin,
    "embed_cluster_nmi" ->
      (kmeansOracleCtes +
      """a2 AS (SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos DESC, cid) AS rn FROM s2)
        |  WHERE rn = 1),
        |ct AS (SELECT a2.cid, CAST(e.label AS BIGINT) AS label,
        |    CAST(count(*) AS BIGINT) AS n_cl
        |  FROM a2 JOIN embeddings e ON a2.vec_id = e.vec_id
        |  GROUP BY 1, 2),
        |bc AS (SELECT cid, CAST(sum(n_cl) AS BIGINT) AS n_c FROM ct
        |  GROUP BY 1),
        |bl AS (SELECT label, CAST(sum(n_cl) AS BIGINT) AS n_l FROM ct
        |  GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_cl) AS BIGINT) AS n_tot FROM ct),
        |mi AS (SELECT CAST(sum(n_cl * CAST(round(ln(
        |      CAST(n_cl AS DOUBLE) * n_tot
        |      / (CAST(n_c AS DOUBLE) * n_l)) * 1e6) AS BIGINT))
        |    AS BIGINT) AS mi6
        |  FROM ct JOIN bc USING (cid) JOIN bl USING (label)
        |  CROSS JOIN tt),
        |hc AS (SELECT CAST(sum(n_c * CAST(round(ln(
        |      CAST(n_c AS DOUBLE) / n_tot) * 1e6) AS BIGINT))
        |    AS BIGINT) AS hc6,
        |    CAST(count(*) AS BIGINT) AS n_clusters
        |  FROM bc CROSS JOIN tt),
        |hl AS (SELECT CAST(sum(n_l * CAST(round(ln(
        |      CAST(n_l AS DOUBLE) / n_tot) * 1e6) AS BIGINT))
        |    AS BIGINT) AS hl6,
        |    CAST(count(*) AS BIGINT) AS n_labels
        |  FROM bl CROSS JOIN tt)
        |SELECT n_tot AS n_vecs, n_clusters, n_labels,
        |  floor(CAST(mi6 AS DOUBLE) / n_tot / 1e6 * 1e6 + 0.5) / 1e6
        |    AS mutual_info,
        |  floor(-CAST(hc6 AS DOUBLE) / n_tot / 1e6 * 1e6 + 0.5) / 1e6
        |    AS h_clusters,
        |  floor(-CAST(hl6 AS DOUBLE) / n_tot / 1e6 * 1e6 + 0.5) / 1e6
        |    AS h_labels,
        |  floor((CAST(mi6 AS DOUBLE) / n_tot)
        |    / sqrt((-CAST(hc6 AS DOUBLE) / n_tot)
        |    * (-CAST(hl6 AS DOUBLE) / n_tot)) * 1e6 + 0.5) / 1e6 AS nmi
        |FROM mi CROSS JOIN hc CROSS JOIN hl CROSS JOIN tt""".stripMargin),
    "embed_retrieval_metrics" ->
      """WITH q AS (SELECT vec_id AS q_id, label AS q_lbl,
        |    embedding AS qe FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS c_id, label AS c_lbl, embedding AS ce
        |  FROM embeddings),
        |lc AS (SELECT label AS q_lbl, CAST(count(*) AS BIGINT) AS lcnt
        |  FROM embeddings GROUP BY 1),
        |p AS (SELECT q_id, q_lbl, c_id, c_lbl, qe, ce FROM q
        |  JOIN c ON c_id <> q_id),
        |z AS (SELECT q_id, q_lbl, c_id, c_lbl,
        |    unnest(qe)::DOUBLE AS x, unnest(ce)::DOUBLE AS y FROM p),
        |sums AS (SELECT q_id, q_lbl, c_id, c_lbl, sum(x*y) AS d,
        |    sum(x*x) AS na, sum(y*y) AS nb FROM z GROUP BY 1, 2, 3, 4),
        |sc AS (SELECT q_id, q_lbl, c_id, c_lbl,
        |    round(d / (sqrt(na) * sqrt(nb)), 4) AS score FROM sums),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY score DESC, c_id) AS rnk FROM sc),
        |t AS (SELECT q_id, rnk,
        |    CASE WHEN c_lbl = q_lbl THEN 1 ELSE 0 END AS rel,
        |    lcnt - 1 AS n_rel,
        |    CAST(round(1e6 / ln(rnk + 1)) AS BIGINT) AS disc6
        |  FROM r JOIN lc USING (q_lbl) WHERE rnk <= 10),
        |pq AS (SELECT q_id,
        |    CASE WHEN sum(CASE WHEN rnk <= n_rel THEN disc6 ELSE 0 END)
        |        = 0 THEN 0
        |      ELSE CAST(round(CAST(sum(rel * disc6) AS DOUBLE)
        |        / sum(CASE WHEN rnk <= n_rel THEN disc6 ELSE 0 END)
        |        * 1e6) AS BIGINT) END AS ndcg6,
        |    coalesce(max(CASE WHEN rel = 1
        |      THEN CAST(round(1e6 / rnk) AS BIGINT) END), 0) AS rr6,
        |    CAST(sum(rel) AS BIGINT) AS n_rel_10
        |  FROM t GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  floor(CAST(sum(ndcg6) AS DOUBLE) / count(*) / 1e6 * 1e6
        |    + 0.5) / 1e6 AS mean_ndcg10,
        |  floor(CAST(sum(rr6) AS DOUBLE) / count(*) / 1e6 * 1e6 + 0.5)
        |    / 1e6 AS mrr,
        |  floor(CAST(sum(n_rel_10) AS DOUBLE) / count(*) / 10 * 1e6
        |    + 0.5) / 1e6 AS p_at_10
        |FROM pq""".stripMargin,
    "q_log_rank" ->
      """WITH pe AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |    (md5_number_lower(CAST(user_id AS VARCHAR))
        |      & 9223372036854775807) % 2 AS grp
        |  FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(ts_s) AS hz FROM pe),
        |nx AS (SELECT user_id, grp, ts_s, lead(ts_s) OVER (
        |    PARTITION BY user_id ORDER BY ts_s, event_id) AS nxt
        |  FROM pe),
        |lives AS (SELECT grp,
        |    CAST(floor((COALESCE(nxt, hz) - ts_s) / 3600.0) AS BIGINT)
        |      AS t,
        |    nxt IS NOT NULL AS observed
        |  FROM nx, h),
        |byt AS (SELECT t,
        |    CAST(sum(CASE WHEN observed AND grp = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d0,
        |    CAST(sum(CASE WHEN observed AND grp = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d1,
        |    CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS r0,
        |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS r1
        |  FROM lives GROUP BY 1),
        |tt AS (SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n0_tot,
        |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1_tot
        |  FROM lives),
        |rr AS (SELECT t, d0, d1,
        |    n0_tot - COALESCE(CAST(sum(r0) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS n0,
        |    n1_tot - COALESCE(CAST(sum(r1) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS n1
        |  FROM byt, tt),
        |f AS (SELECT *, d0 + d1 AS dd, n0 + n1 AS nn FROM rr),
        |g AS (SELECT *,
        |    CAST(round(1e6 * dd * n1 / CAST(nn AS DOUBLE)) AS BIGINT)
        |      AS e1_6,
        |    CAST(round(1e6 * dd * (CAST(n1 AS DOUBLE) / nn)
        |      * (CAST(n0 AS DOUBLE) / nn) * (nn - dd) / (nn - 1))
        |      AS BIGINT) AS v6
        |  FROM f WHERE dd > 0 AND nn > 1)
        |SELECT CAST(sum(d0) AS BIGINT) AS o0,
        |  CAST(sum(d1) AS BIGINT) AS o1,
        |  floor(CAST(sum(e1_6) AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4
        |    AS e1,
        |  floor((CAST(sum(d1) AS BIGINT)
        |    - CAST(sum(e1_6) AS DOUBLE) / 1e6)
        |    * (CAST(sum(d1) AS BIGINT)
        |    - CAST(sum(e1_6) AS DOUBLE) / 1e6)
        |    / (CAST(sum(v6) AS DOUBLE) / 1e6) * 1e4 + 0.5) / 1e4
        |    AS chi2
        |FROM g""".stripMargin,
    "q_pacf" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(e4) AS BIGINT) AS s1,
        |    sum(CAST(e4 AS HUGEINT) * e4) AS sxx FROM daily),
        |l1 AS (SELECT sum(CAST(x.e4 AS HUGEINT) * y.e4) AS sp1,
        |    CAST(sum(x.e4) AS BIGINT) AS sh1,
        |    CAST(sum(y.e4) AS BIGINT) AS st1,
        |    CAST(count(*) AS BIGINT) AS m1
        |  FROM daily x JOIN daily y ON x.day + 1 = y.day),
        |l2 AS (SELECT sum(CAST(x.e4 AS HUGEINT) * y.e4) AS sp2,
        |    CAST(sum(x.e4) AS BIGINT) AS sh2,
        |    CAST(sum(y.e4) AS BIGINT) AS st2,
        |    CAST(count(*) AS BIGINT) AS m2
        |  FROM daily x JOIN daily y ON x.day + 2 = y.day),
        |l3 AS (SELECT sum(CAST(x.e4 AS HUGEINT) * y.e4) AS sp3,
        |    CAST(sum(x.e4) AS BIGINT) AS sh3,
        |    CAST(sum(y.e4) AS BIGINT) AS st3,
        |    CAST(count(*) AS BIGINT) AS m3
        |  FROM daily x JOIN daily y ON x.day + 3 = y.day),
        |m AS (SELECT * FROM l1 CROSS JOIN l2 CROSS JOIN l3
        |  CROSS JOIN b),
        |rh AS (SELECT n,
        |    CAST(CAST(n AS HUGEINT) * n * sp1
        |      - CAST(n AS HUGEINT) * s1 * (sh1 + st1)
        |      + CAST(m1 AS HUGEINT) * s1 * s1 AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * sxx
        |      - CAST(s1 AS HUGEINT) * s1) AS DOUBLE) AS r1,
        |    CAST(CAST(n AS HUGEINT) * n * sp2
        |      - CAST(n AS HUGEINT) * s1 * (sh2 + st2)
        |      + CAST(m2 AS HUGEINT) * s1 * s1 AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * sxx
        |      - CAST(s1 AS HUGEINT) * s1) AS DOUBLE) AS r2,
        |    CAST(CAST(n AS HUGEINT) * n * sp3
        |      - CAST(n AS HUGEINT) * s1 * (sh3 + st3)
        |      + CAST(m3 AS HUGEINT) * s1 * s1 AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * sxx
        |      - CAST(s1 AS HUGEINT) * s1) AS DOUBLE) AS r3
        |  FROM m),
        |dl AS (SELECT *, (r2 - r1 * r1) / (1 - r1 * r1) AS p22 FROM rh),
        |dl2 AS (SELECT *, r1 - p22 * r1 AS p21 FROM dl)
        |SELECT n,
        |  floor(r1 * 1e6 + 0.5) / 1e6 AS rho1,
        |  floor(r2 * 1e6 + 0.5) / 1e6 AS rho2,
        |  floor(r3 * 1e6 + 0.5) / 1e6 AS rho3,
        |  floor(r1 * 1e6 + 0.5) / 1e6 AS pacf1,
        |  floor(p22 * 1e6 + 0.5) / 1e6 AS pacf2,
        |  floor((r3 - p21 * r2 - p22 * r1)
        |    / (1 - p21 * r1 - p22 * r2) * 1e6 + 0.5) / 1e6 AS pacf3
        |FROM dl2""".stripMargin,
    "q_hill_tail" ->
      """WITH sp AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |    AS cents, o_orderkey FROM orders),
        |r AS (SELECT *, row_number() OVER (ORDER BY cents DESC,
        |    o_orderkey) AS rn FROM sp),
        |th AS (SELECT cents AS x_k1 FROM r WHERE rn = 101),
        |l AS (SELECT CAST(round(ln(CAST(cents AS DOUBLE) / x_k1)
        |      * 1e6) AS BIGINT) AS l6, x_k1
        |  FROM r CROSS JOIN th WHERE rn <= 100)
        |SELECT CAST(count(*) AS BIGINT) AS k,
        |  floor(CAST(max(x_k1) AS DOUBLE) / 100 * 100.0 + 0.5) / 100.0
        |    AS threshold,
        |  floor(CAST(sum(l6) AS DOUBLE) / count(*) / 1e6 * 1e6 + 0.5)
        |    / 1e6 AS hill_h,
        |  floor(CAST(count(*) AS DOUBLE) * 1e6 / sum(l6) * 1e6 + 0.5)
        |    / 1e6 AS tail_alpha
        |FROM l""".stripMargin,
    "q_friedman" ->
      """WITH cells AS (SELECT l_orderkey,
        |    max(CASE WHEN l_linenumber = 1
        |      THEN CAST(round(l_quantity) AS BIGINT) END) AS q1,
        |    max(CASE WHEN l_linenumber = 2
        |      THEN CAST(round(l_quantity) AS BIGINT) END) AS q2,
        |    max(CASE WHEN l_linenumber = 3
        |      THEN CAST(round(l_quantity) AS BIGINT) END) AS q3
        |  FROM lineitem WHERE l_linenumber <= 3 GROUP BY 1),
        |f AS (SELECT * FROM cells WHERE q1 IS NOT NULL
        |  AND q2 IS NOT NULL AND q3 IS NOT NULL),
        |r AS (SELECT
        |    2 * (CASE WHEN q2 < q1 THEN 1 ELSE 0 END
        |      + CASE WHEN q3 < q1 THEN 1 ELSE 0 END)
        |      + CASE WHEN q2 = q1 THEN 1 ELSE 0 END
        |      + CASE WHEN q3 = q1 THEN 1 ELSE 0 END + 2 AS r2_1,
        |    2 * (CASE WHEN q1 < q2 THEN 1 ELSE 0 END
        |      + CASE WHEN q3 < q2 THEN 1 ELSE 0 END)
        |      + CASE WHEN q1 = q2 THEN 1 ELSE 0 END
        |      + CASE WHEN q3 = q2 THEN 1 ELSE 0 END + 2 AS r2_2,
        |    2 * (CASE WHEN q1 < q3 THEN 1 ELSE 0 END
        |      + CASE WHEN q2 < q3 THEN 1 ELSE 0 END)
        |      + CASE WHEN q1 = q3 THEN 1 ELSE 0 END
        |      + CASE WHEN q2 = q3 THEN 1 ELSE 0 END + 2 AS r2_3
        |  FROM f),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(r2_1) AS BIGINT) AS s1,
        |    CAST(sum(r2_2) AS BIGINT) AS s2,
        |    CAST(sum(r2_3) AS BIGINT) AS s3 FROM r)
        |SELECT n_blocks,
        |  floor(CAST(s1 AS DOUBLE) / 2 / n_blocks * 1e4 + 0.5) / 1e4
        |    AS mean_rank_1,
        |  floor(CAST(s2 AS DOUBLE) / 2 / n_blocks * 1e4 + 0.5) / 1e4
        |    AS mean_rank_2,
        |  floor(CAST(s3 AS DOUBLE) / 2 / n_blocks * 1e4 + 0.5) / 1e4
        |    AS mean_rank_3,
        |  floor((CAST(CAST(s1 AS HUGEINT) * s1 + CAST(s2 AS HUGEINT)
        |    * s2 + CAST(s3 AS HUGEINT) * s3 AS DOUBLE)
        |    / (CAST(n_blocks AS DOUBLE) * 4)
        |    - 12 * CAST(n_blocks AS DOUBLE)) * 1e4 + 0.5) / 1e4
        |    AS chi2_f
        |FROM a""".stripMargin,
    "q_cramers_v" ->
      """WITH cust AS (SELECT CAST(c_nationkey AS BIGINT) AS r,
        |    c_mktsegment AS c FROM customer),
        |cells AS (SELECT r, c, CAST(count(*) AS BIGINT) AS o
        |  FROM cust GROUP BY 1, 2),
        |rw AS (SELECT r, CAST(sum(o) AS BIGINT) AS n_r FROM cells
        |  GROUP BY 1),
        |cl AS (SELECT c, CAST(sum(o) AS BIGINT) AS n_c FROM cells
        |  GROUP BY 1),
        |tt AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(DISTINCT r) AS BIGINT) AS df_r,
        |    CAST(count(DISTINCT c) AS BIGINT) AS df_c FROM cells),
        |t AS (SELECT n, df_r, df_c,
        |    CAST(round((CAST(o AS DOUBLE) * n
        |      - CAST(n_r AS DOUBLE) * n_c)
        |      * (CAST(o AS DOUBLE) * n - CAST(n_r AS DOUBLE) * n_c)
        |      / (CAST(n AS DOUBLE) * n_r * n_c) * 1e6) AS BIGINT)
        |      AS t6
        |  FROM cells JOIN rw USING (r) JOIN cl USING (c)
        |  CROSS JOIN tt),
        |g AS (SELECT n, df_r, df_c, CAST(sum(t6) AS BIGINT) AS chi6
        |  FROM t GROUP BY 1, 2, 3)
        |SELECT n, df_r, df_c,
        |  floor(CAST(chi6 AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS chi2,
        |  floor(sqrt(CAST(chi6 AS DOUBLE) / 1e6 / (CAST(n AS DOUBLE)
        |    * least(df_r - 1, df_c - 1))) * 1e6 + 0.5) / 1e6
        |    AS cramers_v
        |FROM g""".stripMargin,
    "q_xyz_class" ->
      """WITH monthly AS (SELECT l_partkey AS part,
        |    strftime(date_trunc('month', l_shipdate), '%Y-%m')
        |      AS month,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |      AS q
        |  FROM lineitem GROUP BY 1, 2),
        |p AS (SELECT part, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(q) AS BIGINT) AS s1,
        |    sum(CAST(q AS HUGEINT) * q) AS s2 FROM monthly GROUP BY 1),
        |v AS (SELECT *, CAST(m AS HUGEINT) * s2
        |    - CAST(s1 AS HUGEINT) * s1 AS vnum FROM p),
        |cx AS (SELECT *, CASE WHEN 4 * vnum <= CAST(s1 AS HUGEINT)
        |      * s1 THEN 'X' WHEN vnum <= CAST(s1 AS HUGEINT) * s1
        |      THEN 'Y' ELSE 'Z' END AS xyz,
        |    CAST(round(sqrt(CAST(vnum AS DOUBLE)) / s1 * 1e6)
        |      AS BIGINT) AS cv6 FROM v)
        |SELECT xyz, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(m) AS BIGINT) AS part_months,
        |  floor(CAST(sum(cv6) AS DOUBLE) / count(*) / 1e6 * 1e4 + 0.5)
        |    / 1e4 AS avg_cv
        |FROM cx GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_shingle_df_hist" ->
      """WITH shs AS (SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      range(greatest(len(t) - 2, 0)),
        |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS sh
        |  FROM (SELECT doc_id,
        |      regexp_split_to_array(trim(text), '\s+') AS t
        |    FROM documents)),
        |dfq AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM shs
        |  GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS n_shingles,
        |    CAST(max(df) AS BIGINT) AS max_df FROM dfq),
        |b AS (SELECT CAST(CASE WHEN df = 1 THEN 1 WHEN df = 2 THEN 2
        |      WHEN df <= 5 THEN 3 WHEN df <= 10 THEN 6
        |      WHEN df <= 25 THEN 11 ELSE 26 END AS BIGINT)
        |      AS bucket_lo,
        |    CASE WHEN df = 1 THEN '1' WHEN df = 2 THEN '2'
        |      WHEN df <= 5 THEN '3-5' WHEN df <= 10 THEN '6-10'
        |      WHEN df <= 25 THEN '11-25' ELSE '26+' END AS df_bucket
        |  FROM dfq)
        |SELECT bucket_lo, df_bucket, CAST(count(*) AS BIGINT) AS n,
        |  floor(CAST(count(*) AS DOUBLE) / n_shingles * 1e6 + 0.5)
        |    / 1e6 AS share,
        |  n_shingles, max_df
        |FROM b CROSS JOIN tt GROUP BY 1, 2, n_shingles, max_df
        |ORDER BY 1""".stripMargin,
    "q_turning_points" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT e4, lag(e4) OVER (ORDER BY day) AS prev,
        |    lead(e4) OVER (ORDER BY day) AS nxt FROM daily),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_interior,
        |    CAST(sum(CASE WHEN (e4 > prev AND e4 > nxt)
        |      OR (e4 < prev AND e4 < nxt) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_turns
        |  FROM t WHERE prev IS NOT NULL AND nxt IS NOT NULL),
        |b AS (SELECT n_interior + 2 AS n, n_turns FROM a)
        |SELECT n, n_turns,
        |  floor(2.0 * (n - 2) / 3 * 1e4 + 0.5) / 1e4
        |    AS expected_turns,
        |  floor((n_turns - 2.0 * (n - 2) / 3)
        |    / sqrt((16.0 * n - 29) / 90) * 1e4 + 0.5) / 1e4 AS z_stat
        |FROM b""".stripMargin,
    "q_control_chart" ->
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS e4
        |  FROM lineitem GROUP BY 1),
        |wk AS (SELECT CAST(date_trunc('week', day) AS DATE) AS week,
        |    CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(e4) AS BIGINT) AS s,
        |    CAST(max(e4) - min(e4) AS BIGINT) AS r
        |  FROM daily GROUP BY 1 HAVING count(*) = 7),
        |lm AS (SELECT CAST(count(*) AS BIGINT) AS n_weeks,
        |    CAST(sum(s) AS BIGINT) AS ss, CAST(sum(r) AS BIGINT) AS sr
        |  FROM wk),
        |l2 AS (SELECT n_weeks, CAST(ss AS DOUBLE) / n_weeks / 7 AS xbb,
        |    CAST(sr AS DOUBLE) / n_weeks AS rb FROM lm)
        |SELECT week,
        |  floor(CAST(s AS DOUBLE) / 7 / 10000 * 100.0 + 0.5) / 100.0
        |    AS xbar,
        |  floor(CAST(r AS DOUBLE) / 10000 * 100.0 + 0.5) / 100.0
        |    AS range_w,
        |  floor(xbb / 10000 * 100.0 + 0.5) / 100.0 AS center,
        |  floor((xbb + 0.419 * rb) / 10000 * 100.0 + 0.5) / 100.0
        |    AS ucl_x,
        |  floor((xbb - 0.419 * rb) / 10000 * 100.0 + 0.5) / 100.0
        |    AS lcl_x,
        |  (CAST(s AS DOUBLE) / 7 > xbb + 0.419 * rb)
        |    OR (CAST(s AS DOUBLE) / 7 < xbb - 0.419 * rb) AS ooc_mean,
        |  (CAST(r AS DOUBLE) > 1.924 * rb)
        |    OR (CAST(r AS DOUBLE) < 0.076 * rb) AS ooc_range
        |FROM wk CROSS JOIN l2 ORDER BY week""".stripMargin,
    "q_eta_squared" ->
      """WITH cust AS (SELECT CAST(c_nationkey AS BIGINT) AS g,
        |    CAST(round(c_acctbal) AS BIGINT) AS v FROM customer),
        |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(v) AS BIGINT) AS s_g FROM cust GROUP BY 1),
        |gl AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s1,
        |    sum(CAST(v AS HUGEINT) * v) AS s2 FROM cust),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    sum(CAST((CAST(s_g AS HUGEINT) * s_g * 10000) // n_g
        |      AS BIGINT)) AS ssb_grp4,
        |    max(n) AS n, max(s1) AS s1, max(s2) AS s2
        |  FROM grp CROSS JOIN gl),
        |a2 AS (SELECT *, CAST((CAST(s1 AS HUGEINT) * s1 * 10000) // n
        |    AS BIGINT) AS mean4 FROM a),
        |b AS (SELECT *,
        |    CAST(ssb_grp4 - mean4 AS DOUBLE) AS ssb4,
        |    CAST(CAST(s2 AS HUGEINT) * 10000 - mean4 AS DOUBLE)
        |      AS sst4 FROM a2),
        |c AS (SELECT *, (sst4 - ssb4) / (n - k) AS msw4 FROM b)
        |SELECT k, n,
        |  floor(ssb4 / sst4 * 1e6 + 0.5) / 1e6 AS eta_squared,
        |  floor((ssb4 - (k - 1) * msw4) / (sst4 + msw4) * 1e6 + 0.5)
        |    / 1e6 AS omega_squared
        |FROM c""".stripMargin,
    "text_heaps_law" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS nd
        |    FROM documents),
        |dk AS (SELECT doc_id,
        |    md5_number_lower(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |r1 AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY h, doc_id) AS rk FROM dk),
        |wb AS (SELECT doc_id, rk, ((rk - 1) * 10) // nd AS bucket
        |  FROM r1 CROSS JOIN n),
        |tok AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |tk AS (SELECT doc_id, w FROM tok WHERE w <> ''),
        |tp AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tok
        |  FROM tk JOIN wb USING (doc_id) GROUP BY 1),
        |dt AS (SELECT DISTINCT doc_id, w FROM tk),
        |fs AS (SELECT w, min(rk) AS first_rk
        |  FROM dt JOIN wb USING (doc_id) GROUP BY 1),
        |ty AS (SELECT ((first_rk - 1) * 10) // nd AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_type
        |  FROM fs CROSS JOIN n GROUP BY 1),
        |cm AS (SELECT tp.bucket,
        |    CAST(sum(n_tok) OVER (ORDER BY tp.bucket ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tok,
        |    CAST(sum(coalesce(n_type, 0)) OVER (ORDER BY tp.bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_type
        |  FROM tp LEFT JOIN ty ON tp.bucket = ty.bucket),
        |pts AS (SELECT
        |    CAST(round(ln(CAST(cum_tok AS DOUBLE)) * 1e6) AS BIGINT)
        |      AS x,
        |    CAST(round(ln(CAST(cum_type AS DOUBLE)) * 1e6) AS BIGINT)
        |      AS y FROM cm),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx FROM pts),
        |b AS (SELECT *, CAST(CAST(m AS HUGEINT) * sxy
        |    - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |    / CAST(CAST(m AS HUGEINT) * sxx
        |    - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS beta FROM m)
        |SELECT m AS n_points,
        |  floor(beta * 1e6 + 0.5) / 1e6 AS heaps_beta,
        |  floor((CAST(sy AS DOUBLE) - beta * sx) / m / 1e6 * 1e6 + 0.5)
        |    / 1e6 AS heaps_ln_k
        |FROM b""".stripMargin,
  )
}
