package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Warehouse-maintenance operators (SURVEY §2.2): the change-apply and
  * view-refresh primitives a 100 TB serving layer runs every few
  * minutes. All three follow the same scale rule: the BIG side (the
  * base table / the partitioned fact) is never shuffled — changes and
  * dimensions broadcast, and refresh work is proportional to the delta,
  * not the history.
  */
object Warehouse {

  /** MERGE-style CDC apply: fold a keyed changelog of
    * insert/update/delete ops into a base table in one pass.
    *
    * The changelog is derived deterministically from each customer's
    * latest order (latest `o_orderdate`, then highest `o_orderkey` —
    * the standard "last change wins" compaction), so the oracle replays
    * it exactly: orderkey%3 = 0 deletes the customer, 1 updates the
    * account balance to that order's total, 2 inserts a new customer
    * row under key+1,000,000 (guaranteed fresh).
    *
    * Scale shape: the changelog is |keys|-bounded and broadcasts; the
    * base table is touched by ONE broadcast anti-join (drop D/U
    * targets) plus one broadcast inner join (U rewrites) — it never
    * shuffles, which is the property that makes minute-cadence MERGE
    * viable on a 100 TB base.
    */
  def qCdcApply(s: SparkSession, d: String): DataFrame = {
    val latest = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("k"))
      .agg(max_by(col("o_orderkey"),
        struct(col("o_orderdate"), col("o_orderkey"))).as("ok"),
        max_by(col("o_totalprice"),
          struct(col("o_orderdate"), col("o_orderkey"))).as("newbal"))
    val changelog = latest.select(col("k"),
      when(col("ok") % 3 === 0, "D")
        .when(col("ok") % 3 === 1, "U")
        .otherwise("I").as("op"),
      col("newbal"))
    val base = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
        col("c_mktsegment").as("seg"))
    val survivors = base.join(
      broadcast(changelog.filter(col("op").isin("D", "U")).select("k")),
      Seq("k"), "left_anti")
    val updated = base
      .join(broadcast(changelog.filter(col("op") === "U")), Seq("k"))
      .select(col("k"), col("newbal").as("bal"), col("seg"))
    val inserted = changelog.filter(col("op") === "I")
      .select((col("k") + 1000000).as("k"), col("newbal").as("bal"),
        lit("NEW").as("seg"))
    survivors.select("k", "bal", "seg")
      .unionByName(updated).unionByName(inserted)
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), round(sum(col("bal")), 2).as("total_bal"))
      .orderBy(col("seg"))
  }

  /** Incremental materialized-view maintenance: a monthly-revenue view
    * kept fresh by merging the stored aggregate STATE (history before
    * the refresh cutoff) with the aggregate of the DELTA (new orders
    * only) — sum/count are commutative monoids, so
    * merge(state, agg(delta)) ≡ agg(everything).
    *
    * The contract output carries that equivalence as data: each month
    * row holds the merged values plus a `matches_full` flag against a
    * full recompute, which the oracle predicts TRUE. At scale the
    * refresh cost is the delta scan + a |months|-row merge — the
    * history is never re-read (here both sides ARE computed only so
    * the equivalence is checkable).
    */
  def qIncrementalAgg(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1997-07-01").cast("timestamp")
    val monthOf = date_format(col("o_orderdate"), "yyyy-MM")
    def aggBy(df: DataFrame): DataFrame = df
      .groupBy(monthOf.as("month"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("tot"))
    val orders = Tables.orders(s, d)
    val state = aggBy(orders.filter(col("o_orderdate") < cutoff))
    val delta = aggBy(orders.filter(col("o_orderdate") >= cutoff))
    val merged = state.select(col("month"), col("n").as("n0"), col("tot").as("t0"))
      .join(delta.select(col("month"), col("n").as("n1"), col("tot").as("t1")),
        Seq("month"), "full_outer")
      .select(col("month"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L))).as("n"),
        (coalesce(col("t0"), lit(0.0)) + coalesce(col("t1"), lit(0.0))).as("tot"))
    val full = aggBy(orders)
      .select(col("month"), col("n").as("fn"), col("tot").as("ftot"))
    merged.join(full, Seq("month"))
      .select(col("month"), col("n"), round(col("tot"), 2).as("total"),
        (col("n") === col("fn") &&
          abs(col("tot") - col("ftot")) < 0.01).as("matches_full"))
      .orderBy(col("month"))
  }

  /** Snapshot diff / reconciliation: classify every key across two
    * table versions as added, deleted, changed, or unchanged — the
    * audit primitive behind CDC backfills, replica reconciliation, and
    * "what did last night's load do" forensics. Version 2 is derived
    * deterministically from version 1 (balance rewrite on key%7,
    * delete on key%11, fresh insert on key%13), so the oracle replays
    * the derivation and the diff.
    *
    * Scale shape: one key-keyed full-outer join (both sides shuffle
    * once on the key — or zero times if both snapshots are bucketed on
    * it, the layout [[graft.sources.Layouts.bucketedJoin]] proves),
    * row payloads compared as md5 digests so wide rows diff without
    * dragging every column through the join. */
  def qDeltaDetect(s: SparkSession, d: String): DataFrame = {
    val v1 = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
        col("c_mktsegment").as("seg"))
    val v2 = v1
      .filter(col("k") % 11 =!= 0)
      .select(col("k"),
        when(col("k") % 7 === 0, round(col("bal") + 100.0, 2))
          .otherwise(col("bal")).as("bal"), col("seg"))
      .unionByName(v1.filter(col("k") % 13 === 0)
        .select((col("k") + 1000000).as("k"), col("bal"),
          lit("NEW").as("seg")))
    def digest(df: DataFrame): DataFrame = df.select(col("k"),
      md5(concat_ws("|", col("bal").cast("string"), col("seg"))).as("h"))
    val joined = digest(v1).withColumnRenamed("h", "h1")
      .join(digest(v2).withColumnRenamed("h", "h2"), Seq("k"), "full_outer")
    joined.select(
      when(col("h1").isNull, "added")
        .when(col("h2").isNull, "deleted")
        .when(col("h1") =!= col("h2"), "changed")
        .otherwise("unchanged").as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
  }

  /** Where [[qDynamicPrune]] lays out the partitioned fact + the dim
    * (exposed for the plan assertion in LayoutsSpec). */
  def dppPath(d: String): (String, String) = {
    val tag = d.replaceAll("[^a-zA-Z0-9.]", "_")
    val p = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_layout", s"dpp_$tag")
    java.nio.file.Files.createDirectories(p)
    (p.resolve("fact").toString, p.resolve("dim").toString)
  }

  /** Dynamic partition pruning: the fact is partitioned by year, and
    * the year filter arrives only THROUGH a join with a filtered dim —
    * no static partition predicate exists at plan time. Catalyst
    * inserts a `dynamicpruning` subquery on the fact's partition
    * column (asserted in LayoutsSpec), reusing the dim's broadcast, so
    * at 100 TB the scan reads only the joined years' directories
    * instead of the whole table. Static pruning (a literal partition
    * filter) is covered by `sink_partitioned_prune`; this is the
    * join-driven variant every star-schema query needs.
    */
  def qDynamicPrune(s: SparkSession, d: String): DataFrame = {
    val (factPath, dimPath) = dppPath(d)
    Tables.orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(factPath)
    Tables.orders(s, d)
      .select(year(col("o_orderdate")).as("dy")).distinct()
      .withColumn("tag", col("dy") % 3)
      .write.mode(SaveMode.Overwrite).parquet(dimPath)
    dynamicPrunePlan(s, factPath, dimPath)
  }

  /** The read-side plan of [[qDynamicPrune]], separated so the spec can
    * `.explain` it without re-writing the layout. */
  def dynamicPrunePlan(s: SparkSession, factPath: String,
      dimPath: String): DataFrame =
    s.read.parquet(factPath)
      .join(broadcast(s.read.parquet(dimPath).filter(col("tag") === 1)),
        col("o_year") === col("dy"))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_year"))

  /** Bloom-prefiltered semi-join: revenue of lineitems whose order is
    * URGENT, with the fact prefiltered by a Bloom sketch of the key set
    * before the exact semi-join. The sketch (fixed KBs for any key-set
    * size) is built in one partial-aggregable pass and folded into the
    * fact scan as a plan constant, so at 100 TB — where the key set is
    * too big to broadcast and the fact would otherwise shuffle in full —
    * the shuffle carries only probable-match rows. Zero false negatives
    * means prefilter + exact join ≡ plain semi-join, so the oracle is
    * the plain semi-join: the speedup is free of approximation.
    * (Catalyst's InjectRuntimeFilter plants this shape automatically
    * inside one query; building it explicitly lets a pipeline reuse one
    * sketch across MANY jobs, e.g. a contaminated-id or dedup-keeper
    * filter applied to every downstream read.) */
  def qBloomSemiFilter(s: SparkSession, d: String): DataFrame = {
    val keys = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val sketch = keys
      .agg(graft.functions.Bloom.sketchAgg(xxhash64(col("o_orderkey")),
        nItems = 40000L, nBits = 400000L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    Tables.lineitem(s, d)
      .filter(graft.functions.Bloom.mightContain(sketch,
        xxhash64(col("l_orderkey"))))
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** SCD2 range lookup — the consumption side of `q_scd2_build`: each
    * purchase is joined to the dimension version (the user's most
    * recent non-purchase activity) valid AT purchase time, via
    * `valid_from ≤ ts < valid_to`. The dimension is |versions|-bounded
    * per key and broadcasts; the fact never shuffles — the standard
    * point-in-time-correct feature join for training-data assembly
    * (avoiding label leakage from future attribute values). */
  def qScd2Lookup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), unix_timestamp(col("ts")).as("ts_s"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val dim = ev.filter(col("event_type") =!= "purchase")
      .withColumn("valid_to_s",
        coalesce(lead(col("ts_s"), 1).over(w), lit(9999999999L)))
      .select(col("user_id").as("d_user"), col("event_type").as("attr"),
        col("ts_s").as("valid_from_s"), col("valid_to_s"))
    val fact = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_s"), col("value"))
    fact.join(broadcast(dim),
        col("user_id") === col("d_user") &&
          col("ts_s") >= col("valid_from_s") &&
          col("ts_s") < col("valid_to_s"))
      .groupBy(col("attr"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("revenue"))
      .orderBy(col("attr"))
  }

  /** Declarative data-quality rule engine: rules are DATA (id +
    * violation predicate), and all predicate rules against one table
    * collapse into a SINGLE scan of conditional aggregates — N rules
    * cost one pass, not N. Cross-table rules (ordering between fact
    * and its parent, referential orphans) are joins keyed on the fact's
    * own key, so the big side never reshuffles for the audit. This is
    * the shape a 100 TB nightly DQ run needs: rule count grows, scan
    * count doesn't. */
  def qDqRules(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_orderdate"))
    // predicate rules per table: one scan, one conditional agg each
    def scanRules(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame =
      df.agg(count(lit(1)).as("n"),
          rules.map { case (id, pred) =>
            sum(when(pred, 1).otherwise(0)).as(id)
          }: _*)
        .select(explode(map(
          rules.flatMap { case (id, _) =>
            Seq(lit(id), col(id))
          }: _*)).as(Seq("rule_id", "n_violations")),
          col("n").as("n_checked"))
    val liRules = scanRules(li, Seq(
      "lineitem_qty_leq_45" -> (col("l_quantity") > 45),
      "lineitem_discount_range" ->
        (col("l_discount") < 0 || col("l_discount") > 0.1)))
    val custRules = scanRules(cust, Seq(
      "customer_acctbal_nonneg" -> (col("c_acctbal") < 0)))
    // cross-table ordering rule: line must not ship before its order
    val shipRule = li.select(col("l_orderkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("l_shipdate") < col("o_orderdate"), 1).otherwise(0))
          .as("n_violations"))
      .select(lit("lineitem_ship_after_order").as("rule_id"),
        col("n_violations"), col("n_checked"))
    // referential rule: every lineitem must have a parent order
    val orphanRule = li.select(col("l_orderkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(li.agg(count(lit(1)).as("n_checked")))
      .select(lit("lineitem_orphan").as("rule_id"), col("n_violations"),
        col("n_checked"))
    liRules.unionByName(custRules).unionByName(shipRule)
      .unionByName(orphanRule)
      .select(col("rule_id"), col("n_checked"), col("n_violations"),
        round(col("n_violations") / col("n_checked"), 6)
          .as("violation_rate"))
      .orderBy(col("rule_id"))
  }

  /** Privacy-preserving export: the de-identified view of the customer
    * base safe to hand to an external analytics vendor — keys
    * pseudonymized by keyed hash (deterministic, joinable across
    * exports, irreversible without the raw key space), quasi-
    * identifiers GENERALIZED (balances bucketed to 1000s) instead of
    * dropped, direct identifiers (names/addresses) omitted entirely.
    * The masking is per-row scalar math — codegen'd, no shuffle beyond
    * the verification rollup — so exporting 100 TB costs one scan.
    * Output is the per-nation masked census proving the export
    * preserves analytic utility (counts, bucketed distributions)
    * while carrying zero raw identifiers. */
  def qMaskedExport(s: SparkSession, d: String): DataFrame = {
    import graft.functions.exprs
    Tables.customer(s, d)
      .select(
        exprs.md5Lower64(col("c_custkey").cast("string"))
          .bitwiseAND(lit(2147483647L)).as("pseudo_id"),
        col("c_nationkey"),
        (floor(col("c_acctbal") / 1000) * 1000).cast("long")
          .as("bal_bucket"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        countDistinct(col("pseudo_id")).as("n_distinct_pseudo"),
        min(col("bal_bucket")).as("min_bucket"),
        max(col("bal_bucket")).as("max_bucket"),
        sum(col("bal_bucket")).as("sum_buckets"))
      .orderBy(col("c_nationkey"))
  }

  /** Blocked fuzzy-match join (entity resolution): part names are
    * linked when their edit distance is small, but candidate pairs are
    * generated ONLY within a blocking key (the product noun), never by
    * the O(n²) cross product — the classic record-linkage shape. The
    * name dictionary is distinct-collapsed first (64 names, not 2 000
    * parts), so the quadratic step runs on the vocabulary, and the
    * per-name part counts rejoin after. At 100 TB: block, dedupe the
    * join key space, THEN pair — the pairing cost depends on block
    * sizes, not corpus size, and a skewed block is a salting candidate,
    * not a plan rewrite. */
  def qFuzzyJoin(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("block", element_at(split(col("p_name"), " "), 2))
    names.as("a").join(names.as("b"),
        col("a.block") === col("b.block") &&
          col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).as("dist"),
        col("a.n_parts").as("n_a"), col("b.n_parts").as("n_b"))
      .filter(col("dist") <= 4)
      .orderBy(col("dist"), col("name_a"), col("name_b"))
  }

  /** One-to-one entity resolution by MUTUAL best match: from the same
    * blocked fuzzy-candidate pairs as [[qFuzzyJoin]], each name keeps
    * only its single best partner (min edit distance, ties → smallest
    * name), and a link survives only when BOTH endpoints choose each
    * other — the standard reciprocal-best-hit linkage that prevents
    * one hub record from absorbing a whole block. Cost beyond the
    * blocked pairing: one symmetrize union + one name-keyed argmin
    * (partial-aggregable min_by) + one self-join of the |names|-sized
    * best table — nothing quadratic outside the blocks. */
  def qMutualBestMatch(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("block", element_at(split(col("p_name"), " "), 2))
    val pairs = names.as("a").join(names.as("b"),
        col("a.block") === col("b.block") &&
          col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name").as("na"), col("b.p_name").as("nb"),
        levenshtein(col("a.p_name"), col("b.p_name")).as("dist"))
      .filter(col("dist") <= 4)
    val directed = pairs
      .select(col("na").as("src"), col("nb").as("dst"), col("dist"))
      .union(pairs
        .select(col("nb").as("src"), col("na").as("dst"), col("dist")))
    val best = directed.groupBy(col("src"))
      .agg(min_by(struct(col("dst"), col("dist")),
        struct(col("dist"), col("dst"))).as("_b"))
      .select(col("src"), col("_b.dst").as("best"),
        col("_b.dist").as("dist"))
    best.as("x").join(best.as("y"),
        col("x.best") === col("y.src") && col("y.best") === col("x.src") &&
          col("x.src") < col("y.src"))
      .select(col("x.src").as("name_a"), col("y.src").as("name_b"),
        col("x.dist").as("dist"))
      .orderBy(col("name_a"))
  }

  /** Bitmap-block audience overlap (the roaring-bitmap shape): yearly
    * order cohorts compressed into 32-id bitmap blocks, pairwise
    * intersections computed with bitwise AND + popcount on the
    * 8-byte blocks — never an id-level join. This is THE 100 TB
    * set-intersection pattern: a billion-member cohort is ~31 M
    * blocks instead of 10⁹ join rows, the block build is one
    * partial-aggregable `bit_or` rollup, and every pairwise AND
    * shuffles fixed-width longs keyed on block id. Exact by
    * construction — the oracle replays the identical shift/AND/
    * popcount arithmetic. */
  /** Bitemporal as-of query — the two-axis time-travel warehouses need
    * when facts are corrected after the fact: every order has a v1
    * recorded (transaction time) and valid (business time) from its
    * order date; every 7th order receives a prospective price revision
    * (+10%, exact cents) VALID 60 days after the order but RECORDED 30
    * days after it. "As known at T, valid at V" then picks, per key,
    * the max-valid_from version among those with tx_from ≤ T and
    * valid_from ≤ V (tx breaks valid ties) — one filter + one
    * partial-aggregable max_by argmax, no window, no self-join. The
    * report runs the SAME corpus at two knowledge dates, showing the
    * revision visible only once recorded. */
  def qBitemporalAsof(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("st"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      to_date(col("o_orderdate")).as("od"))
    val versions = base
      .select(col("k"), col("st"), col("cents"),
        col("od").as("valid_from"), col("od").as("tx_from"))
      .unionByName(base.filter(col("k") % 7 === 0)
        .select(col("k"), col("st"),
          (col("cents") + expr("cents div 10")).as("cents"),
          date_add(col("od"), 60).as("valid_from"),
          date_add(col("od"), 30).as("tx_from")))
    def asOf(tag: String, t: String, v: String): DataFrame = versions
      .filter(col("tx_from") <= lit(t).cast("date") &&
        col("valid_from") <= lit(v).cast("date"))
      .groupBy(col("k"))
      .agg(max_by(struct(col("st"), col("cents")),
        struct(col("valid_from"), col("tx_from"))).as("_v"))
      .groupBy(col("_v.st").as("st"))
      .agg(count(lit(1)).as("n"),
        (sum(col("_v.cents")).cast("double") / 100.0).as("total"))
      .select(lit(tag).as("known_at"), col("st"), col("n"), col("total"))
    // same valid date, two knowledge dates: the 1996-07-15 revision
    // wave is visible only to the later observer
    asOf("1996-07-01", "1996-07-01", "1996-09-01")
      .unionByName(asOf("1996-12-01", "1996-12-01", "1996-09-01"))
      .orderBy(col("known_at"), col("st"))
  }

  /** FIFO lot allocation — the inventory/cost-basis matching problem
    * ("which receipt lot funded which issue?") that naive SQL can only
    * do with a procedural loop. The declarative trick: running-sum
    * both streams per part in FIFO order, so lot i occupies quantity
    * interval [cumF_{i−1}, cumF_i) and issue j occupies
    * [cumO_{j−1}, cumO_j) on the SAME axis — FIFO allocation is then
    * exactly the pairwise intersection of two interval partitions, an
    * equi+overlap join producing ≤ lots+issues−1 matches per part
    * (each match ends a lot or an issue). Windows partition on
    * partkey (fixed fan-in per part at every SF); quantities are
    * exact integers; the brand census is partial-aggregable. */
  def qFifoAllocation(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_partkey"), col("l_linestatus"))
      .orderBy(col("_sd"), col("l_orderkey"), col("l_linenumber"))
    val cum = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_linestatus"), to_date(col("l_shipdate")).as("_sd"),
        col("l_quantity").cast("long").as("_q"))
      .withColumn("_hi", sum(col("_q")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_lo", col("_hi") - col("_q"))
    val lots = cum.filter(col("l_linestatus") === "F")
      .select(col("l_partkey"), col("_lo").as("f_lo"), col("_hi").as("f_hi"))
    val issues = cum.filter(col("l_linestatus") === "O")
      .select(col("l_partkey"), col("_lo").as("o_lo"), col("_hi").as("o_hi"))
    val alloc = lots.join(issues, Seq("l_partkey"))
      .filter(col("f_lo") < col("o_hi") && col("o_lo") < col("f_hi"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_matches"),
        sum(least(col("f_hi"), col("o_hi")) -
          greatest(col("f_lo"), col("o_lo"))).as("qty_allocated"))
    val totals = cum.groupBy(col("l_partkey"))
      .agg(sum(when(col("l_linestatus") === "F", 1L).otherwise(0L))
          .as("n_lots"),
        sum(when(col("l_linestatus") === "O", 1L).otherwise(0L))
          .as("n_issues"),
        sum(when(col("l_linestatus") === "F", col("_q")).otherwise(0L))
          .as("_supply"),
        sum(when(col("l_linestatus") === "O", col("_q")).otherwise(0L))
          .as("_demand"))
    totals.join(alloc, Seq("l_partkey"), "left")
      .na.fill(0L, Seq("n_matches", "qty_allocated"))
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"), sum(col("n_lots")).as("n_lots"),
        sum(col("n_issues")).as("n_issues"),
        sum(col("n_matches")).as("n_matches"),
        sum(col("qty_allocated")).as("qty_allocated"),
        sum(col("_demand") - col("qty_allocated")).as("qty_unfilled"),
        sum(col("_supply") - col("qty_allocated")).as("qty_leftover"))
      .orderBy(col("p_brand"))
  }

  /** Entity RESOLUTION closure — the third stage of the record-linkage
    * family: [[qFuzzyJoin]]'s blocked fuzzy pairs promoted to canonical
    * entities via connected components (min-label pointer jumping, the
    * same log-diameter [[graft.dedup.Components]] engine the document
    * dedup family runs), so A↔B and B↔C merge into one entity even
    * when A↔C was never scored. Names map to their min part id, the
    * component keeper's name becomes the canonical form, and singletons
    * survive as their own entity. Per-cluster census (canonical name,
    * member names, covered parts) — the table a catalog team ships.
    * Oracle = recursive-CTE transitive closure over the same pair
    * relation (the dedup_clusters pattern on the name graph). */
  def qEntityClusters(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("nid"))
      .withColumn("block", element_at(split(col("p_name"), " "), 2))
      .cache()
    val pairs = names.as("a").join(names.as("b"),
        col("a.block") === col("b.block") &&
          col("a.p_name") < col("b.p_name") &&
          levenshtein(col("a.p_name"), col("b.p_name")) <= 4)
      .select(col("a.nid").as("id_a"), col("b.nid").as("id_b"))
    val labels = graft.dedup.Components.keepers(pairs)
    val labeled = names
      .join(labels.withColumnRenamed("id", "nid"), Seq("nid"), "left")
      .select(col("p_name"), col("n_parts"),
        coalesce(col("keeper"), col("nid")).as("keeper"))
    labeled
      .join(names.select(col("nid").as("keeper"),
        col("p_name").as("canonical_name")), Seq("keeper"))
      .groupBy(col("canonical_name"))
      .agg(count(lit(1)).as("n_names"), sum(col("n_parts")).as("n_parts"))
      .orderBy(col("canonical_name"))
  }

  /** Deletion-neighborhood edit-distance self-join (the SymSpell
    * blocking rule): two strings are within Levenshtein 1 iff they
    * share a key in {s} ∪ del1(s) (delete the differing position from
    * both sides of a substitution; an insert/delete hits the shorter
    * string verbatim). Candidate generation is therefore O(n·L) keys —
    * never a cross product — and bucket sizes are bounded by how many
    * strings agree on all-but-one position, so the quadratic step is
    * confined to tiny buckets even at a billion names. The key
    * condition is NECESSARY but not SUFFICIENT (transpositions like
    * ab/ba share del1 keys at distance 2), so the levenshtein verify
    * after the bucket join is load-bearing, exactly like the Jaccard
    * verify after MinHash banding. Output is a one-row census over the
    * verified pair relation: candidate/verified counts, linked-name
    * count, and an exact integer custkey checksum so the oracle
    * value-verifies the full pair set without dumping it. */
  def qEditDistanceJoin(s: SparkSession, d: String): DataFrame = {
    val names = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_name").as("name"))
    // vocabulary-level op: 1 + length(name) keys per name via an
    // interpreted HOF — fine OFF the per-row hot path (|names| rows,
    // not |facts|); a corpus-sized variant would use a Kernels batch
    // expression per the BandKeys rule
    // deletion keys share ONE domain with the oracle's
    // generate_series(1, 64): cap at 64 positions and guard the empty
    // string (sequence(1, 0) would yield a DESCENDING [1, 0] and
    // fabricate keys the oracle never generates)
    val keyed = names.select(col("k"), col("name"),
      explode(array_union(array(col("name")),
        expr("""CASE WHEN length(name) >= 1 THEN
               |  transform(sequence(1, least(length(name), 64)),
               |    i -> concat(substr(name, 1, i - 1),
               |                substr(name, i + 1, length(name))))
               |ELSE array(name) END"""
          .stripMargin))).as("key"))
    val cand = keyed.as("a").join(keyed.as("b"),
        col("a.key") === col("b.key") && col("a.name") < col("b.name"))
      .select(col("a.k").as("ka"), col("a.name").as("name_a"),
        col("b.k").as("kb"), col("b.name").as("name_b"))
      .distinct()
    val verified = cand
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
    verified.agg(
      count(lit(1)).as("n_candidates"),
      sum(when(col("dist") <= 1, 1L).otherwise(0L)).as("n_pairs"),
      (count_distinct(when(col("dist") <= 1, col("name_a"))) +
        count_distinct(when(col("dist") <= 1, col("name_b"))))
        .as("n_linked_names_ub"),
      sum(when(col("dist") <= 1, col("ka") * 31L + col("kb")))
        .as("pair_checksum"))
  }

  /** Grid-bucketed radius self-join — the spatial/embedding
    * fixed-radius shape: points land on an integer 4096² lattice
    * (coordinates are portable md5 hashes of the key, so both engines
    * derive identical points), each point is bucketed into an R-sized
    * cell, one side explodes its 3×3 cell neighborhood, the join runs
    * on cell ids, and candidates are verified on EXACT integer squared
    * distance ≤ R² (R = 64 on a 4096² lattice). Completeness is geometric: any partner within R
    * lies in the 3×3 neighborhood when the cell edge is ≥ R. At 100 TB
    * this is the canonical alternative to a distance cross-join —
    * candidate volume is n·(9R²/area)·n in expectation, shuffles key
    * on small integers, and a dense cell is a salting candidate, not a
    * plan rewrite. All arithmetic is integer, so the oracle replays
    * the relation from the naive quadratic filter and must match
    * exactly. */
  def qGridDistanceJoin(s: SparkSession, d: String): DataFrame = {
    import graft.functions.exprs.md5Lower64
    def coord(prefix: String): Column =
      pmod(md5Lower64(concat(lit(prefix), col("c_custkey").cast("string")))
        .bitwiseAND(lit(Long.MaxValue)), lit(4096L))
    val pts = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), coord("x").as("x"), coord("y").as("y"))
      .withColumn("cx", expr("x div 64"))
      .withColumn("cy", expr("y div 64"))
    val probes = pts
      .withColumn("dxy", explode(expr(
        "flatten(transform(sequence(-1,1), dx -> " +
          "transform(sequence(-1,1), dy -> struct(dx, dy))))")))
      .select(col("k"), col("x"), col("y"),
        (col("cx") + col("dxy.dx")).as("cx"),
        (col("cy") + col("dxy.dy")).as("cy"))
    probes.as("a").join(pts.as("b"),
        Seq("cx", "cy"))
      .filter(col("a.k") < col("b.k"))
      .select(col("a.k").as("k_a"), col("b.k").as("k_b"),
        ((col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
          (col("a.y") - col("b.y")) * (col("a.y") - col("b.y")))
          .as("dist2"))
      .filter(col("dist2") <= 4096L)
      .orderBy(col("dist2"), col("k_a"), col("k_b"))
  }

  def qBitmapOverlap(s: SparkSession, d: String): DataFrame = {
    val member = Tables.orders(s, d)
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_custkey"))
      .distinct()
    val blocks = member
      .withColumn("block", expr("o_custkey div 32"))
      .withColumn("bit",
        expr("shiftleft(cast(1 as bigint), cast(o_custkey % 32 as int))"))
      .groupBy(col("yr"), col("block"))
      .agg(expr("bit_or(bit)").as("bits"))
    val sizes = member.groupBy(col("yr"))
      .agg(count(lit(1)).as("n"))
    val pair = blocks.as("a")
      .join(blocks.as("b"),
        col("a.block") === col("b.block") && col("a.yr") < col("b.yr"))
      .groupBy(col("a.yr").as("yr_a"), col("b.yr").as("yr_b"))
      .agg(sum(expr("bit_count(a.bits & b.bits)")).as("n_overlap"))
    pair
      .join(broadcast(sizes.select(col("yr").as("yr_a"), col("n").as("n_a"))),
        Seq("yr_a"))
      .join(broadcast(sizes.select(col("yr").as("yr_b"), col("n").as("n_b"))),
        Seq("yr_b"))
      .select(col("yr_a"), col("yr_b"), col("n_a"), col("n_b"),
        col("n_overlap"),
        round(col("n_overlap").cast("double") /
          (col("n_a") + col("n_b") - col("n_overlap")), 6).as("jaccard"))
      .orderBy(col("yr_a"), col("yr_b"))
  }
}
