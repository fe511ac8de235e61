package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-profiling / compliance operators: the discovery queries a
  * warehouse team runs BEFORE trusting a 100 TB corpus — k-anonymity
  * risk census, functional-dependency checks, inclusion-dependency
  * (foreign-key) discovery, distribution-drift (PSI) monitoring, and
  * split-conformal calibration coverage.
  *
  * Scale stance shared by the family: every check reduces the raw
  * table to a bounded profile frame FIRST (QI-cell sizes, per-LHS
  * counts, distinct key projections, fixed bucket histograms) with
  * one partial-aggregable rollup, and all cross-frame work happens on
  * those bounded profiles — nothing here ever pairs, sorts, or
  * windows the raw rows globally. */
object Profiling {

  /** k-anonymity risk census over the classic quasi-identifier triple
    * (nation, market segment, account-balance band). One groupBy
    * produces the QI-cell size frame (bounded by the QI domain, NOT
    * the row count — ~1.4 k cells here, still thousands at 100 TB);
    * the per-threshold risk rollup then runs on that tiny frame. Rows
    * in cells smaller than k are re-identifiable at anonymity level
    * k — the table a privacy review reads before an export ships. */
  def qKAnonymity(s: SparkSession, d: String): DataFrame = {
    val sizes = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("n"))
    val tot = sizes.agg(count(lit(1)).as("total_groups"),
      sum(col("n")).as("total_rows"), min(col("n")).as("min_group_size"))
    val ks = s.range(0, 4).select(
      element_at(array(lit(2L), lit(5L), lit(10L), lit(25L)),
        col("id").cast("int") + 1).as("k"))
    sizes.crossJoin(broadcast(ks))
      .groupBy(col("k"))
      .agg(sum(when(col("n") < col("k"), 1L).otherwise(0L))
          .as("groups_at_risk"),
        sum(when(col("n") < col("k"), col("n")).otherwise(0L))
          .as("rows_at_risk"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("groups_at_risk"), col("rows_at_risk"),
        col("total_groups"), col("total_rows"), col("min_group_size"),
        round(col("rows_at_risk").cast("double") / col("total_rows"), 6)
          .as("risk_rate"))
      .orderBy(col("k"))
  }

  /** One candidate FD `lhs → rhs`: per-LHS distinct-RHS census plus
    * the g3 repair size (minimum rows to delete so the FD holds =
    * total − Σ max per-LHS RHS count — Kivinen & Mannila's measure).
    * Two nested partial-aggregable rollups; the first reduces the
    * table to its (lhs, rhs) value-pair frame, so everything after is
    * bounded by the attribute domain. */
  private def fdCheck(name: String, df: DataFrame, lhs: Column,
      rhs: Column): DataFrame =
    df.select(lhs.as("_l"), rhs.as("_r"))
      .groupBy(col("_l"), col("_r")).agg(count(lit(1)).as("_c"))
      .groupBy(col("_l"))
      .agg(sum(col("_c")).as("_rows"), count(lit(1)).as("_nr"),
        max(col("_c")).as("_mx"))
      .agg(count(lit(1)).as("n_lhs"),
        sum(col("_rows")).as("n_rows"),
        sum(when(col("_nr") > 1, 1L).otherwise(0L)).as("n_violating"),
        (sum(col("_rows")) - sum(col("_mx"))).as("g3_remove"))
      .select(lit(name).as("fd"), col("n_rows"), col("n_lhs"),
        col("n_violating"), col("g3_remove"),
        round(col("n_violating").cast("double") / col("n_lhs"), 6)
          .as("violation_rate"))

  /** Functional-dependency validation census over six candidate FDs
    * (one a true key dependency for the zero baseline, five genuinely
    * violated). Each check is independent and unions into one report —
    * the approximate-FD profile (g3 error) data-quality tooling
    * publishes. */
  def qFdViolations(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d)
    Seq(
      fdCheck("orders:o_orderkey->o_orderstatus", Tables.orders(s, d),
        col("o_orderkey"), col("o_orderstatus")),
      fdCheck("orders:o_custkey->o_orderpriority", Tables.orders(s, d),
        col("o_custkey"), col("o_orderpriority")),
      fdCheck("part:p_name->p_brand", part, col("p_name"), col("p_brand")),
      fdCheck("part:p_brand->p_type", part, col("p_brand"), col("p_type")),
      fdCheck("part:p_type->p_size", part,
        col("p_type"), col("p_size").cast("long").cast("string")),
      fdCheck("customer:c_nationkey->c_mktsegment", Tables.customer(s, d),
        col("c_nationkey").cast("long").cast("string"),
        col("c_mktsegment")))
      .reduce(_ unionByName _)
      .orderBy(col("fd"))
  }

  /** One candidate inclusion dependency `A ⊆ B`: distinct-project both
    * columns FIRST (the profiling move — the join runs on value
    * domains, not rows), then a keyed left join counts how many A
    * values find a B partner. AQE picks broadcast when a domain is
    * small; neither raw table is ever shuffled whole. */
  private def indCheck(name: String, a: DataFrame, av: Column,
      b: DataFrame, bv: Column): DataFrame = {
    val da = a.select(av.cast("long").as("_v")).filter(col("_v").isNotNull)
      .distinct()
    val db = b.select(bv.cast("long").as("_w")).filter(col("_w").isNotNull)
      .distinct()
    da.join(db, col("_v") === col("_w"), "left")
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col("_w").isNotNull, 1L).otherwise(0L)).as("n_contained"))
      .select(lit(name).as("ind"), col("n_distinct"), col("n_contained"),
        round(col("n_contained").cast("double") / col("n_distinct"), 6)
          .as("containment"),
        when(col("n_contained") === col("n_distinct"), 1L).otherwise(0L)
          .as("holds"))
  }

  /** Inclusion-dependency (foreign-key) discovery over six candidate
    * column pairs: the genuine FKs report containment 1.0, the two
    * accidental/partial candidates report their true containment —
    * the signal schema-inference tools rank join paths by. */
  def qInclusionDeps(s: SparkSession, d: String): DataFrame =
    Seq(
      indCheck("orders.o_custkey<customer.c_custkey",
        Tables.orders(s, d), col("o_custkey"),
        Tables.customer(s, d), col("c_custkey")),
      indCheck("lineitem.l_partkey<part.p_partkey",
        Tables.lineitem(s, d), col("l_partkey"),
        Tables.part(s, d), col("p_partkey")),
      indCheck("supplier.s_nationkey<nation.n_nationkey",
        Tables.supplier(s, d), col("s_nationkey"),
        Tables.nation(s, d), col("n_nationkey")),
      indCheck("events.user_id<customer.c_custkey",
        Tables.events(s, d), col("user_id"),
        Tables.customer(s, d), col("c_custkey")),
      indCheck("customer.c_custkey<orders.o_custkey",
        Tables.customer(s, d), col("c_custkey"),
        Tables.orders(s, d), col("o_custkey")),
      indCheck("part.p_size<nation.n_nationkey",
        Tables.part(s, d), col("p_size"),
        Tables.nation(s, d), col("n_nationkey")))
      .reduce(_ unionByName _)
      .orderBy(col("ind"))

  /** Population-stability-index drift report between the reference
    * corpus slice (sources src0–src9) and the candidate slice
    * (src10–src19) over fixed document-length buckets. Laplace-(+1)
    * smoothed shares; each bucket's PSI term `(p_t−p_r)·ln(p_t/p_r)`
    * is fixed to integer nano-nats BEFORE the total fold (the
    * [[PipelineQueries.dsirModel]] portability trick — ln is the only
    * libm call, applied to identical rationals in both engines, and
    * the cross-bucket sum is exact Long arithmetic). One conditional
    * rollup to a 10-row histogram; everything after is constant-size.
    * The monitoring query a training-data pipeline schedules on every
    * new crawl snapshot. */
  def qPsiDrift(s: SparkSession, d: String): DataFrame = {
    val b = 10
    val hist = Tables.documents(s, d)
      .select(
        (length(col("source")) === 4).as("_is_ref"),
        least(lit(b.toLong - 1), expr("n_chars div 64")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("_is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("_is_ref"), 0L).otherwise(1L)).as("n_tgt"))
    val tot = hist.agg(sum(col("n_ref")).as("_tr"),
      sum(col("n_tgt")).as("_tt"))
    val terms = hist.crossJoin(broadcast(tot))
      .withColumn("_pr",
        (col("n_ref") + 1).cast("double") / (col("_tr") + b))
      .withColumn("_pt",
        (col("n_tgt") + 1).cast("double") / (col("_tt") + b))
      .select(col("bucket"), col("n_ref"), col("n_tgt"),
        round((col("_pt") - col("_pr")) * log(col("_pt") / col("_pr"))
          * 1e9).cast("long").as("psi_nano"))
    terms.unionByName(
        terms.agg(sum(col("n_ref")).as("n_ref"),
          sum(col("n_tgt")).as("n_tgt"),
          sum(col("psi_nano")).as("psi_nano"))
          .select(lit(-1L).as("bucket"), col("n_ref"), col("n_tgt"),
            col("psi_nano")))
      .orderBy(col("bucket"))
  }

  /** Split-conformal calibration over order prices: per priority
    * class, fit the point predictor (exact calibration median), take
    * the conformal radius q̂ = the ⌈0.9·(n+1)⌉-th smallest absolute
    * residual, and report empirical coverage on the held-out half —
    * the distribution-free 90 % interval check an eval pipeline runs
    * on every model refresh. Both order statistics (median, q̂) are
    * exact rank selections via [[Ranks.groupRowNumber]]: the group key
    * rides a range shuffle, so a 5-value priority column over 10⁹ rows
    * never funnels a whole class through one task — no
    * `PARTITION BY priority ORDER BY price` window anywhere. */
  def qConformalCoverage(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderpriority").as("prio"),
      col("o_orderkey"), col("o_totalprice").as("price"))
    val cal = o.filter(col("o_orderkey") % 2 === 1)
    val test = o.filter(col("o_orderkey") % 2 === 0)
    val med = Ranks.groupRowNumber(cal, Seq(col("prio")),
        Seq(col("price"), col("o_orderkey")), "_rn", "_n")
      .filter(col("_rn") === ceil(col("_n") / 2.0).cast("long"))
      .select(col("prio"), col("price").as("med"), col("_n").as("n_cal"))
    val resid = cal.join(broadcast(med), Seq("prio"))
      .withColumn("score", abs(col("price") - col("med")))
    val qhat = Ranks.groupRowNumber(resid, Seq(col("prio")),
        Seq(col("score"), col("o_orderkey")), "_rn", "_n")
      .filter(col("_rn") ===
        least(ceil((col("_n") + 1) * 0.9).cast("long"), col("_n")))
      .select(col("prio"), col("score").as("q_hat"))
    test.join(broadcast(med), Seq("prio"))
      .join(broadcast(qhat), Seq("prio"))
      .groupBy(col("prio"), col("n_cal"), col("med"), col("q_hat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("price") - col("med")) <= col("q_hat"), 1L)
          .otherwise(0L)).as("n_covered"))
      .select(col("prio"), col("n_cal"), col("n_test"),
        round(col("med"), 2).as("med"), round(col("q_hat"), 2).as("q_hat"),
        col("n_covered"),
        round(col("n_covered").cast("double") / col("n_test"), 6)
          .as("coverage"))
      .orderBy(col("prio"))
  }

  /** Interval-overlap self-join census, sweep-line form: per part, how
    * many pairs of its shipments' handling windows [shipdate,
    * shipdate + quantity days] overlap, and the peak number
    * simultaneously open — WITHOUT materializing a single pair. The
    * classic identity `overlapping = C(n,2) − disjoint` turns the
    * quadratic join into two linear window scans over the part's
    * start/end event stream (a start is disjoint from exactly the
    * intervals that ended strictly before it). Windows partition on
    * partkey, whose fan-in is a fixed per-part shipment count (TPC-H
    * holds lineitem/part ≈ 30 at every SF), so no window ever scales
    * with corpus size; the brand rollup is partial-aggregable. */
  def qIntervalOverlapJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_partkey"),
      col("l_orderkey"), col("l_linenumber"),
      to_date(col("l_shipdate")).as("_s"),
      date_add(to_date(col("l_shipdate")),
        col("l_quantity").cast("int")).as("_e"))
    val ev = li.select(col("l_partkey"), col("_s").as("d"),
        lit(1).as("is_start"), col("l_orderkey"), col("l_linenumber"))
      .unionByName(li.select(col("l_partkey"), col("_e").as("d"),
        lit(0).as("is_start"), col("l_orderkey"), col("l_linenumber")))
    // total order: date asc, starts BEFORE ends at equal date (closed
    // intervals — an interval ending the day another starts overlaps
    // it, so its end event must not land in the start's prefix)
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("d"), col("is_start").desc, col("l_orderkey"),
        col("l_linenumber"))
    val scanned = ev
      .withColumn("_ends_before", coalesce(sum(lit(1) - col("is_start"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_active", sum(when(col("is_start") === 1, 1)
        .otherwise(-1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perPart = scanned.groupBy(col("l_partkey"))
      .agg(sum(col("is_start")).as("n_items"),
        sum(when(col("is_start") === 1, col("_ends_before"))
          .otherwise(0L)).as("_disjoint"),
        max(col("_active")).as("max_concurrent"))
      .withColumn("n_overlap_pairs",
        expr("n_items * (n_items - 1) div 2") - col("_disjoint"))
    perPart
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"), sum(col("n_items")).as("n_items"),
        sum(col("n_overlap_pairs")).as("n_overlap_pairs"),
        max(col("max_concurrent")).as("max_concurrent"))
      .orderBy(col("p_brand"))
  }

  /** One join-key skew audit: reduce the fact table to its per-key
    * count frame (ONE partial-aggregable rollup — the frame is
    * |keys|-sized, never |rows|), then report the numbers that decide
    * a shuffle plan: key count, max/avg fan-in, how many keys exceed
    * 10× the mean (the salting candidates) and what row share they
    * carry, plus the exact join output size Σ cntA·cntB against the
    * dimension's key counts. */
  private def skewAudit(name: String, fact: DataFrame, key: Column,
      dim: DataFrame, dimKey: Column): DataFrame = {
    val fc = fact.groupBy(key.as("_k")).agg(count(lit(1)).as("_c"))
    val dc = dim.groupBy(dimKey.as("_k")).agg(count(lit(1)).as("_c2"))
    val stats = fc.agg(count(lit(1)).as("n_keys"), sum(col("_c")).as("n_rows"),
      max(col("_c")).as("max_cnt"))
    val hot = fc.crossJoin(broadcast(stats))
      .filter(col("_c").cast("double") >
        lit(10.0) * col("n_rows") / col("n_keys"))
      .agg(count(lit(1)).as("n_hot_keys"),
        coalesce(sum(col("_c")), lit(0L)).as("_hot_rows"))
    val est = fc.join(dc, Seq("_k"))
      .agg(coalesce(sum(col("_c") * col("_c2")), lit(0L))
        .as("est_join_rows"))
    stats.crossJoin(hot).crossJoin(est)
      .select(lit(name).as("audit"), col("n_keys"), col("n_rows"),
        col("max_cnt"),
        round(col("n_rows").cast("double") / col("n_keys"), 4)
          .as("avg_cnt"),
        round(col("max_cnt") * col("n_keys").cast("double")
          / col("n_rows"), 4).as("skew_ratio"),
        col("n_hot_keys"),
        round(col("_hot_rows").cast("double") / col("n_rows"), 6)
          .as("hot_rows_share"),
        col("est_join_rows"))
  }

  /** One column's profile from its (value, count) frame: row/null/
    * distinct counts, top value with tie-break, Shannon entropy of the
    * value distribution in integer micro-nats (per-value terms fixed
    * before the fold — the PSI portability trick). The value arrives
    * pre-rendered as a STRING by the caller (decimal-cast for doubles,
    * so both engines print identically). */
  private def colProfile(name: String, df: DataFrame,
      value: Column): DataFrame = {
    val counts = df.select(value.as("_v"))
      .groupBy(col("_v")).agg(count(lit(1)).as("_c"))
    val tot = counts.agg(sum(col("_c")).as("_n"))
    counts.crossJoin(broadcast(tot))
      .select(col("_v"), col("_c"), col("_n"),
        round(-(col("_c").cast("double") / col("_n")) *
          log(col("_c").cast("double") / col("_n")) * 1e6)
          .cast("long").as("_h"))
      .agg(max(col("_n")).as("n_rows"),
        sum(when(col("_v").isNull, col("_c")).otherwise(0L)).as("n_null"),
        sum(when(col("_v").isNotNull, 1L).otherwise(0L)).as("n_distinct"),
        max_by(col("_v"), struct(col("_c"), col("_v"))).as("top_value"),
        max(struct(col("_c"), col("_v"))).getField("_c").as("top_count"),
        sum(col("_h")).as("entropy_micro"))
      .select(lit(name).as("column"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("top_value"), col("top_count"),
        col("entropy_micro"))
  }

  /** Whole-table column profile — the first query anyone runs on an
    * unfamiliar table: per column, null rate, cardinality, modal
    * value, and value-distribution entropy. Each column's profile is
    * ONE partial-aggregable rollup to its value-count frame (bounded
    * by the column's domain); numeric values render through a decimal
    * cast so both engines print the identical string. */
  def qColumnProfile(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    Seq(
      colProfile("c_custkey", c, col("c_custkey").cast("string")),
      colProfile("c_nationkey", c, col("c_nationkey").cast("string")),
      colProfile("c_mktsegment", c, col("c_mktsegment")),
      colProfile("c_name", c, col("c_name")),
      colProfile("c_acctbal", c,
        col("c_acctbal").cast("decimal(12,2)").cast("string")))
      .reduce(_ unionByName _)
      .orderBy(col("column"))
  }

  /** Shuffle-skew audit over three join keyspaces — the query a data
    * engineer runs BEFORE sizing a 100 TB join: is the key fan-in
    * uniform enough for a plain hash join, which keys need salting,
    * and how many rows will the join emit. Exact by construction
    * (integer counts, one rounded ratio each). */
  def qSkewAudit(s: SparkSession, d: String): DataFrame =
    Seq(
      skewAudit("lineitem.l_partkey*part", Tables.lineitem(s, d),
        col("l_partkey"), Tables.part(s, d), col("p_partkey")),
      skewAudit("lineitem.l_orderkey*orders", Tables.lineitem(s, d),
        col("l_orderkey"), Tables.orders(s, d), col("o_orderkey")),
      skewAudit("events.user_id*customer", Tables.events(s, d),
        col("user_id"), Tables.customer(s, d), col("c_custkey")))
      .reduce(_ unionByName _)
      .orderBy(col("audit"))

  /** Pairwise Pearson correlation matrix over the four lineitem
    * measures (quantity, price, discount, tax) — the numeric-profiling
    * readout a data catalog attaches to every table. ONE map-side-
    * combinable aggregation computes every moment (4 sums, 4 squares,
    * 6 cross-products) on exact integer lattices (qty integer, the
    * others cents) in DECIMAL(38,0)⇄HUGEINT — sized so n·Σxy ≈ 1e31
    * at sf100 — and the 6-row matrix unfolds from the single
    * broadcast-sized census row. Denominator factors are square-rooted
    * SEPARATELY (their decimal product would overflow), both engines
    * computing sqrt over the identical exact numerators. */
  def qCorrMatrix(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("qty", "price", "disc", "tax")
    val pairsL = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val base = Tables.lineitem(s, d).select(
      round(col("l_quantity")).cast("long").as("qty"),
      round(col("l_extendedprice") * 100).cast("long").as("price"),
      round(col("l_discount") * 100).cast("long").as("disc"),
      round(col("l_tax") * 100).cast("long").as("tax"))
    val aggs = cols.flatMap(c => Seq(
        sum(col(c)).as(s"s_$c"),
        sum(expr(s"CAST($c AS DECIMAL(38,0)) * $c")).as(s"ss_$c"))) ++
      pairsL.map { case (a, b) =>
        sum(expr(s"CAST($a AS DECIMAL(38,0)) * $b")).as(s"sp_${a}_$b") } :+
      count(lit(1)).as("n")
    val m = base.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    pairsL.map { case (a, b) =>
      m.select(lit(a).as("x_col"), lit(b).as("y_col"), col("n"),
        (floor(
          expr(s"CAST(sp_${a}_$b * n - CAST(s_$a AS DECIMAL(38,0))" +
            s" * s_$b AS DOUBLE)") /
          (sqrt(expr(s"CAST(ss_$a * n - CAST(s_$a AS DECIMAL(38,0))" +
            s" * s_$a AS DOUBLE)")) *
           sqrt(expr(s"CAST(ss_$b * n - CAST(s_$b AS DECIMAL(38,0))" +
            s" * s_$b AS DOUBLE)"))) * 1e6 + 0.5) / 1e6).as("corr"))
    }.reduce(_ unionByName _)
      .orderBy(col("x_col"), col("y_col"))
  }
}
