package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bulk analytic SQL surface (SURVEY §2.2).
  *
  * Every query is expressed with `functions._` columns so the whole plan
  * stays inside Catalyst/whole-stage-codegen: filters and projections
  * reach the parquet scan, small dimensions are broadcast, and top-k is
  * `orderBy.limit` (TakeOrderedAndProject) rather than a global sort.
  *
  * Determinism conventions (for the DuckDB oracle hash-compare): double
  * aggregates rounded, total ORDER BY on output, event timestamps
  * surfaced as floor-epoch seconds.
  */
object Analytics {

  /** Seconds-since-epoch as Long (floor), matching duckdb
    * `CAST(floor(epoch(ts)) AS BIGINT)`. */
  private def epochS(c: Column): Column = unix_timestamp(c)

  /** TPC-H Q1 shape: scan + multi-aggregate groupBy. Map-side partial
    * aggregation makes this one narrow shuffle of ~|groups| rows. */
  def q1Pricing(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3 shape: 3-way join + agg + top-k. Customer (small) is
    * broadcast; lineitem⋈orders shuffles on the order key; the final
    * top-10 is TakeOrderedAndProject, never a full sort. */
  def q3Shipping(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: star join (region→nation→customer/supplier→orders→
    * lineitem) + agg. All dimensions broadcast; single fact shuffle. */
  def q5LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, d)
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6 shape: selective filter + global sum; filters are plain
    * comparisons so they push to parquet row-group statistics. */
  def q6Forecast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  /** Per-group top-N via row_number window: one shuffle on the partition
    * key; tie-broken on the unique order key for determinism. */
  def qWindowTopN(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      // the isNotNull constraints make the TopKByScore rewrite legal
      // (parquet attributes are nullable; TPC-H keys never are in fact)
      .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Same result as [[qWindowTopN]] through the scale-path operator:
    * the custom TopKByScore aggregate keeps k-bounded heaps with
    * map-side combine, so the shuffle carries ≤k rows per group per
    * partition instead of every row (window+row_number shuffles all). */
  def qTopKPerKey(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .groupBy(col("o_custkey"))
      .agg(graft.functions.TopKByScore.topK(
        col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"),
        col("col.id").as("o_orderkey"),
        col("col.score").as("o_totalprice"),
        (col("pos") + 1).cast("int").as("rn"))
      .orderBy(col("o_custkey"), col("rn"))

  /** Running (cumulative) sum window over a unique total order. */
  def qRunningSum(s: SparkSession, d: String): DataFrame = {
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 2)
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
      .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
      .drop("l_shipdate")
      .orderBy(col("l_suppkey") +: order.tail: _*)
  }

  /** Exact distinct aggregation (2-phase distinct under the hood). */
  def qDistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** EXISTS / NOT EXISTS as semi/anti joins: customers without orders. */
  def qSemiAnti(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")
    val ordKeys = Tables.orders(s, d).select(col("o_custkey"))
    val without = cust.join(ordKeys, col("c_custkey") === col("o_custkey"),
      "left_anti").withColumn("has_orders", lit(0L))
    val withO = cust.join(ordKeys, col("c_custkey") === col("o_custkey"),
      "left_semi").withColumn("has_orders", lit(1L))
    without.unionByName(withO)
      .select(col("c_custkey"), col("c_name"), col("has_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Full outer join with null-fill accounting on both sides. */
  def qOuterJoin(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val ord = Tables.orders(s, d)
      .filter(col("o_custkey") % 2 === 0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("key"),
        coalesce(col("c_mktsegment"), lit("<no-cust>")).as("segment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("key"))
  }

  /** NULL semantics: null-safe equality, NULLIF/COALESCE, count(col)
    * vs count(*), null-excluding aggregates. */
  def qNullHandling(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      // manufacture NULLs: 'F' rows lose their status
      .withColumn("st", nullif(col("o_orderstatus"), lit("F")))
      .withColumn("same_as_o",
        (col("st") <=> col("o_orderstatus")).cast("long"))
      .groupBy(coalesce(col("st"), lit("<null>")).as("status"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("st")).as("n_nonnull"),
        sum(col("same_as_o")).as("n_nullsafe_eq"),
        round(avg(when(col("st").isNull, col("o_totalprice"))), 2)
          .as("avg_null_price"))
      .orderBy(col("status"))

  /** CASE WHEN bucketing + HAVING (post-aggregation filter). */
  def qCaseHaving(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("bucket",
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .otherwise("large"))
      .groupBy(col("o_orderstatus"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .filter(col("n") > 5)
      .orderBy(col("o_orderstatus"), col("bucket"))

  /** Date part extraction and arithmetic. */
  def qDateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .withColumn("mo", month(col("o_orderdate")).cast("long"))
      .groupBy(col("yr"), col("mo"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("yr"), col("mo"))

  /** String function suite: upper/substr/concat/length. */
  def qStringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("brand_u", upper(col("p_brand")))
      .withColumn("type_pfx", substring(col("p_type"), 1, 5))
      .groupBy(col("brand_u"), col("type_pfx"))
      .agg(count(lit(1)).as("n"),
        round(avg(length(col("p_name"))), 2).as("avg_name_len"),
        min(concat(col("p_brand"), lit("#"), col("p_name"))).as("min_tag"))
      .orderBy(col("brand_u"), col("type_pfx"))

  /** Set operations: INTERSECT and EXCEPT branches, tagged + unioned. */
  def qSetOps(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(col("c_custkey").as("key"))
    val ordCust = Tables.orders(s, d).select(col("o_custkey").as("key"))
    val both = cust.intersect(ordCust).withColumn("tag", lit("both"))
    val custOnly = cust.except(ordCust).withColumn("tag", lit("cust_only"))
    both.unionByName(custOnly).orderBy(col("tag"), col("key"))
  }

  /** Multiset (ALL) set operations — duplicates preserved. */
  def qSetOpsAll(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).select(col("o_custkey").as("key"))
    val b = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("key"))
    val except = a.exceptAll(b).groupBy(col("key"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    val intersect = a.intersectAll(b).groupBy(col("key"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    except.unionByName(intersect).orderBy(col("op"), col("key"))
  }

  /** Extended string function suite. */
  def qStringFuncs2(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        reverse(col("p_brand")).as("rev"),
        translate(col("p_type"), "aeiou", "AEIOU").as("xlate"),
        instr(col("p_name"), "o").cast("long").as("first_o"),
        repeat(lit("ab"), 3).as("rep"))
      .orderBy(col("p_partkey"))

  /** Extended date function suite (weekday ≡ DuckDB isodow-1). */
  def qDateFuncs2(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        weekday(col("o_orderdate")).cast("long").as("wd"),
        quarter(col("o_orderdate")).cast("long").as("qtr"))
      .orderBy(col("o_orderkey"))

  /** ROLLUP hierarchical aggregation over region→nation. */
  def qRollup(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey", "c_acctbal")
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"))
      // coalesce the rollup NULLs so ordering/hashing is engine-neutral
      .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        col("n_cust"), col("sum_bal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Quantile binning: per-status quartiles of the order book. ntile
    * partitioned by a THREE-value key is the classic global-window
    * scale hazard (each task would sort a third of all orders), so the
    * quartile comes from [[Ranks.groupNtile]] — the status key rides
    * the range partitioning and every stage stays parallel while the
    * result is bit-identical to the window ntile (the oracle keeps the
    * plain SQL formulation). */
  def qNtile(s: SparkSession, d: String): DataFrame = {
    graft.ops.Ranks.groupNtile(
        Tables.orders(s, d)
          .select(col("o_orderstatus"), col("o_orderkey"),
            col("o_totalprice")),
        part = Seq(col("o_orderstatus")),
        order = Seq(col("o_totalprice"), col("o_orderkey")),
        k = 4, out = "quartile")
      // the window ntile this replaces produced IntegerType
      .groupBy(col("o_orderstatus"), col("quartile").cast("int").as("quartile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy(col("o_orderstatus"), col("quartile"))
  }

  /** CUBE: all grouping-set combinations over two dimensions. */
  def qCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .cube(col("o_orderstatus"), col("yr"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("yr"), lit(-1L)).as("yr"), col("n"), col("total"))
      .orderBy(col("status"), col("yr"))

  /** GROUPING SETS: explicit subtotal combinations — finer control
    * than rollup/cube, one shuffle, expanded map-side. */
  def qGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("yr")), Seq(col("o_orderstatus")),
          Seq.empty),
        col("o_orderstatus"), col("yr"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("yr"), lit(-1L)).as("yr"), col("n"), col("total"))
      .orderBy(col("status"), col("yr"))

  /** Value-based RANGE window frame (quantity band, peers included —
    * deterministic regardless of tie order). */
  def qWindowRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))
      .rangeBetween(-5, 0)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 2)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .withColumn("n_in_band", count(lit(1)).over(w))
      .withColumn("sum_in_band", round(sum(col("l_quantity")).over(w), 2))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Correlated scalar subqueries through the SQL front end — Catalyst
    * decorrelates both into aggregated joins (no per-row execution). */
  def qCorrSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_corr_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_corr_lineitem")
    s.sql("""
      SELECT o_orderkey,
        (SELECT count(*) FROM graft_corr_lineitem
         WHERE l_orderkey = o_orderkey) AS n_items,
        (SELECT round(max(l_extendedprice), 2) FROM graft_corr_lineitem
         WHERE l_orderkey = o_orderkey) AS max_price
      FROM graft_corr_orders
      WHERE o_orderkey % 50 = 0
      ORDER BY o_orderkey""")
  }

  /** first/last/nth window functions over the full-partition frame. */
  def qFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 200)
      .select(col("o_custkey"), col("o_orderkey"),
        round(first(col("o_totalprice")).over(w), 2).as("first_price"),
        round(last(col("o_totalprice")).over(w), 2).as("last_price"),
        round(nth_value(col("o_totalprice"), 2).over(w), 2).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Ranking window family: rank / dense_rank / percent_rank /
    * cume_dist over a unique total order (deterministic). */
  def qRankFuncs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderstatus"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
  }

  /** Date interval arithmetic: day/month adds, day differences. */
  def qDateInterval(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        date_add(col("o_orderdate"), 30).as("plus30d"),
        add_months(col("o_orderdate"), 2).as("plus2m"),
        date_sub(col("o_orderdate"), 7).as("minus7d"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"))
      .orderBy(col("o_orderkey"))

  /** JSON function family (the reference's home turf): construct a
    * document with to_json, extract typed values back out. The oracle
    * computes the expected extracts directly from the base columns, so
    * it checks the whole construct→extract roundtrip. */
  def qJsonFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") % 10 === 0)
      .withColumn("_doc", to_json(struct(
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("event_type").as("t"),
        array(col("value"), col("value") * 2).as("vals"))))
      .select(col("event_id"),
        get_json_object(col("_doc"), "$.k").cast("long").as("k"),
        get_json_object(col("_doc"), "$.t").as("t"),
        expr("json_array_length(get_json_object(_doc, '$.vals'))")
          .cast("long").as("n_vals"),
        round(get_json_object(col("_doc"), "$.vals[1]").cast("double"), 2)
          .as("val2"))
      .orderBy(col("event_id"))

  /** Conditional aggregation: count_if / bool_or / bool_and /
    * filtered sums (ANSI FILTER-clause semantics). */
  def qConditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count_if(col("l_quantity") > 25).as("n_bulk"),
        bool_or(col("l_discount") > 0.05).as("any_deep_disc"),
        bool_and(col("l_quantity") > 0).as("all_positive"),
        round(sum(when(col("l_discount") === 0, col("l_extendedprice"))), 2)
          .as("full_price_rev"))
      .orderBy(col("l_returnflag"))

  /** Array function family over per-order quantity lists: sorted
    * collect, element access, membership, bounded prefix sum. */
  def qArrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 25 === 0)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity"))).as("arr"))
      .select(col("l_orderkey"),
        size(col("arr")).cast("long").as("n_items"),
        element_at(col("arr"), 1).as("min_qty"),
        element_at(col("arr"), -1).as("max_qty"),
        array_contains(col("arr"), 20.0).as("has20"),
        round(expr("aggregate(slice(arr, 1, 3), 0D, (acc, x) -> acc + x)"),
          2).as("sum_low3"))
      .orderBy(col("l_orderkey"))

  /** Regex function family: group extraction, match counting,
    * global replacement (Spark replaces all matches by default; the
    * DuckDB oracle needs the 'g' flag — a known parity trap). */
  def qRegexFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        regexp_extract(col("p_type"), "^(\\w+) (\\w+)", 1).as("fam"),
        regexp_extract(col("p_type"), "^(\\w+) (\\w+)", 2).as("sub"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0)))
          .cast("long").as("n_vowels"),
        regexp_replace(col("p_brand"), "[0-9]", "#").as("brand_masked"))
      .orderBy(col("p_partkey"))

  /** Explicit NULLS FIRST / NULLS LAST ordering semantics, captured
    * as a rank column — the driver's compare sorts rows before
    * hashing, so the ordering must be IN the data to be checked. */
  def qNullSort(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("st"),
        col("o_totalprice"))
    // ranged global rank (Ranks.globalRowNumber) — the nulls-ordering
    // directives ride the range partitioner's SortOrder, so the
    // explicit NULLS FIRST/LAST semantics hold with no single-task sort
    Ranks.globalRowNumber(base,
        Seq(col("st").asc_nulls_first,
          col("o_totalprice").desc_nulls_last, col("o_orderkey").asc),
        "pos")
      .select(col("o_orderkey"), coalesce(col("st"), lit("<null>")).as("st"),
        col("o_totalprice"), col("pos"))
      .orderBy(col("pos"))
  }

  /** Exact DECIMAL money arithmetic (no binary-float drift): cast,
    * multiply, sum all run in DECIMAL — the correctness-critical path
    * for financial aggregates at scale. Presentation only: the final
    * exact decimals are emitted as rounded doubles, because the gate's
    * readers represent DECIMAL differently per engine (pyarrow keeps
    * `decimal.Decimal`, DuckDB's df() yields float64), so a decimal
    * output column can never value-hash-match across engines. */
  def qDecimalArith(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)").as("p"),
        col("l_discount").cast("decimal(12,2)").as("disc"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("p")).as("sp"),
        sum(expr("CAST(p * (1 - disc) AS DECIMAL(14,4))")).as("sn"),
        max(col("p")).as("mp"))
      .select(col("l_returnflag"),
        round(col("sp").cast("double"), 2).as("sum_price"),
        round(col("sn").cast("double"), 4).as("sum_net"),
        round(col("mp").cast("double"), 2).as("max_price"))
      .orderBy(col("l_returnflag"))

  /** Higher-order array functions: filter / exists / forall /
    * transform+fold over per-order quantity lists. (l_quantity is
    * integral-valued, so sums are order-independent-exact.) */
  def qHigherOrder(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 25 === 0)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity"))).as("arr"))
      .select(col("l_orderkey"),
        size(expr("filter(arr, x -> x > 25)")).cast("long").as("n_bulk"),
        expr("exists(arr, x -> x > 40)").as("any40"),
        expr("forall(arr, x -> x > 0)").as("all_pos"),
        round(expr("aggregate(transform(arr, x -> x * 2), 0D, " +
          "(acc, x) -> acc + x)"), 2).as("doubled_sum"))
      .orderBy(col("l_orderkey"))

  /** Bitwise aggregates over line numbers per order. */
  def qBitwiseAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 50 === 0)
      .withColumn("_ln", col("l_linenumber").cast("long"))
      .groupBy(col("l_orderkey"))
      .agg(bit_and(col("_ln")).as("ln_and"),
        bit_or(col("_ln")).as("ln_or"),
        bit_xor(col("_ln")).as("ln_xor"))
      .orderBy(col("l_orderkey"))

  /** Event sessionization: a new session starts after a >30 min gap.
    * lag + cumulative sum over a (user, ts, event_id) total order —
    * exactly one shuffle on user_id shared by both windows. */
  def qSessionize(s: SparkSession, d: String): DataFrame = {
    val order = Seq(col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_s", epochS(lag(col("ts"), 1).over(w)))
      .withColumn("new_sess",
        when(col("prev_s").isNull ||
          epochS(col("ts")) - col("prev_s") > 1800, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(wRows))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        min(epochS(col("ts"))).as("start_s"),
        max(epochS(col("ts"))).as("end_s"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ≡
    * DuckDB `quantile_cont`, both linear-interpolation). */
  def qPercentile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("price_p90"))
      .orderBy(col("l_returnflag"))

  /** Two-phase salted aggregation — the skew-mitigation pattern: a hot
    * group key is split across `salt` sub-keys for the first (heavy)
    * shuffle, then the tiny salted partials re-aggregate. Result is
    * provably identical to the direct aggregation (the oracle). */
  def qSaltedAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("_salt", pmod(hash(col("l_orderkey")), lit(8)))
      .groupBy(col("l_returnflag"), col("_salt"))
      .agg(sum(col("l_quantity")).as("_sq"), count(lit(1)).as("_n"))
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("_sq")), 2).as("sum_qty"),
        sum(col("_n")).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Pivot: one column per order status, explicit value list so the
    * output schema is static (required at scale — no discovery scan). */
  def qPivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .groupBy(col("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum(col("o_totalprice")), 2))
      .orderBy(col("yr"))

  /** Unpivot/melt: wide aggregate back to long (metric, value) rows. */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(round(avg(col("o_totalprice")), 2).as("avg_price"),
        count(lit(1)).cast("double").as("n_orders"))
      .unpivot(Array(col("o_orderstatus")),
        Array(col("avg_price"), col("n_orders")), "metric", "value")
      .orderBy(col("o_orderstatus"), col("metric"))

  /** Range (interval) join: facts against a small band dimension on a
    * BETWEEN predicate — the band table broadcasts, so the range join
    * is a broadcast nested loop over 5 rows, never a shuffle. */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val bands = s.range(5).select(
      col("id").as("band_id"),
      (col("id") * 100000.0).as("lo"),
      ((col("id") + 1) * 100000.0).as("hi"))
    Tables.orders(s, d)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("band_id"))
  }

  /** Native session windows: same 30-minute-gap semantics as the
    * lag-window formulation, via Spark's `session_window` operator. */
  def qSessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(epochS(col("ts"))).as("start_s"),
        max(epochS(col("ts"))).as("end_s"))
      .select("user_id", "n_events", "start_s", "end_s")
      .orderBy(col("user_id"), col("start_s"))

  /** As-of join: each event annotated with the user's most recent
    * purchase value at-or-before its timestamp. DuckDB's native ASOF
    * JOIN is the (independent) oracle. */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        epochS(col("ts")).as("ts_s"))
    // right side unique per (user, second): latest purchase wins
    val purchases = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), epochS(col("ts")).as("ts_s"))
      .agg(max_by(col("value"), col("event_id")).as("pval"))
    AsOf.join(ev, purchases, keys = Seq("user_id"),
      leftTime = "ts_s", rightTime = "ts_s", payload = "pval")
      .select(col("event_id"), round(col("pval"), 2).as("last_purchase"))
      .orderBy(col("event_id"))
  }

  /** As-of join with a STALENESS TOLERANCE — the production variant of
    * [[qAsofJoin]]: a matched quote/purchase older than 1 hour is no
    * match at all (bounded-staleness point-in-time semantics; the
    * difference between "last known price" and "price if fresh").
    * Composed from the SAME [[AsOf.join]] one-shuffle union+forward-
    * fill kernel: the payload rides as a (time, value) struct, so the
    * fill carries the match's own timestamp and the tolerance check is
    * a post-fill map — no second shuffle, no plan change vs the
    * unbounded as-of. */
  def qAsofTolerance(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        epochS(col("ts")).as("ts_s"))
    val purchases = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), epochS(col("ts")).as("ts_s"))
      .agg(max_by(col("value"), col("event_id")).as("pval"))
      .withColumn("_tp",
        struct(col("ts_s").as("rt"), col("pval").as("pv")))
      .drop("pval")
    AsOf.join(ev, purchases, keys = Seq("user_id"),
        leftTime = "ts_s", rightTime = "ts_s", payload = "_tp")
      .select(col("event_id"),
        when(col("ts_s") - col("_tp.rt") <= 3600,
          round(col("_tp.pv"), 2)).as("purchase_1h"))
      .orderBy(col("event_id"))
  }

  /** Nearest as-of join — the third member of the as-of family
    * (backward [[qAsofJoin]], bounded [[qAsofTolerance]], and this:
    * pandas `merge_asof(direction='nearest')`): each event matches the
    * CLOSEST purchase in either direction, ties to the backward match.
    * Composed from [[AsOf.nearestFills]] — the same one-shuffle
    * union+tag kernel running the backward and forward fills over one
    * sort; the distance pick is a post-fill map. `lag_s` is signed
    * (positive = matched backward). */
  def qAsofNearest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        epochS(col("ts")).as("ts_s"))
    val purchases = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), epochS(col("ts")).as("ts_s"))
      .agg(max_by(col("value"), col("event_id")).as("pval"))
      .withColumn("_tp",
        struct(col("ts_s").as("rt"), col("pval").as("pv")))
      .drop("pval")
    val filled = AsOf.nearestFills(ev, purchases, keys = Seq("user_id"),
      leftTime = "ts_s", rightTime = "ts_s", payload = "_tp")
    val pick = when(col("_f").isNull, col("_b"))
      .when(col("_b").isNull, col("_f"))
      .when(col("ts_s") - col("_b.rt") <= col("_f.rt") - col("ts_s"),
        col("_b"))
      .otherwise(col("_f"))
    filled
      .select(col("event_id"),
        round(pick.getField("pv"), 2).as("nearest_purchase"),
        (col("ts_s") - pick.getField("rt")).as("lag_s"))
      .orderBy(col("event_id"))
  }

  /** Interval → calendar allocation: each lineitem's revenue is spread
    * pro-rata by day over the months its [ship, receipt] interval
    * touches — the warehouse "revenue recognition" / interval-align
    * shape date-grain joins cannot express. Allocation is EXACT
    * integer arithmetic (`cents·overlap_days div total_days`), so the
    * per-month sums are order-independent longs; the month explode
    * fans each row out ≤3 rows (transit ≤ ~90 days), map-only, and
    * the only shuffle is the final |months|-row rollup. */
  def qIntervalAlign(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      // the schema carries no receipt date: derive a deterministic
      // 1..45-day transit from the keys (integer arithmetic, so both
      // engines build the identical interval)
      .select(
        to_date(col("l_shipdate")).as("ship"),
        expr("""date_add(to_date(l_shipdate),
                CAST((l_orderkey * 7 + l_linenumber) % 45 + 1 AS INT))""")
          .as("rcpt"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100,
          0).cast("long").as("cents"))
      .withColumn("m", explode(expr(
        "sequence(trunc(ship, 'MM'), trunc(rcpt, 'MM'), interval 1 month)")))
      .withColumn("ov_days",
        datediff(least(col("rcpt"), last_day(col("m"))),
          greatest(col("ship"), col("m"))) + 1)
      .withColumn("tot_days", datediff(col("rcpt"), col("ship")) + 1)
      .withColumn("alloc_cents", expr("cents * ov_days div tot_days"))
      .groupBy(date_format(col("m"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_legs"),
        round(sum(col("alloc_cents")) / 100.0, 2).as("alloc_rev"))
      .orderBy(col("month"))

  /** Linear-interpolation imputation on an hourly grid — the
    * time-series gap filler that complements [[graft.ops.Behavior]]'s
    * LOCF: each user's purchase-value series is resampled to every
    * hour between their first and last purchase, known hours pass
    * through, and gap hours take the line between the surrounding
    * points. Forward/backward fills are ignoreNulls window
    * passes over (user, hour) — one shuffle on the user key; grid
    * size is bounded by the timeline, not the corpus. The
    * interpolation arithmetic is the identical exactly-rounded IEEE
    * expression tree in the oracle, so values hash-match
    * bit-for-bit. */
  def qInterpImpute(s: SparkSession, d: String): DataFrame = {
    val known = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), expr("unix_timestamp(ts) div 3600").as("hr"))
      .agg(round(max(col("value")), 2).as("v"))
    val grid = known.groupBy(col("user_id"))
      .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("hr"))
    val joined = grid.join(known, Seq("user_id", "hr"), "left")
    val wAsc = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined
      .withColumn("pv", last(when(col("v").isNotNull,
        struct(col("hr").as("ph"), col("v").as("pval"))),
        ignoreNulls = true).over(wAsc))
      .withColumn("nv", first(when(col("v").isNotNull,
        struct(col("hr").as("nh"), col("v").as("nval"))),
        ignoreNulls = true).over(wDesc))
      // integer ten-thousandths via floor(x·10⁴ + 0.5): floor is exact
      // on doubles, so both engines emit the identical BIGINT —
      // decimal round() implementations diverge on .xxxx5 boundaries
      // (Spark rounds the exact decimal expansion, DuckDB the float),
      // which 300k interpolated values WILL hit
      .withColumn("val_e4", floor(
        (when(col("v").isNotNull, col("v"))
          .otherwise(col("pv.pval") +
            (col("nv.nval") - col("pv.pval")) *
              (col("hr") - col("pv.ph")).cast("double") /
              (col("nv.nh") - col("pv.ph")).cast("double")))
          * lit(10000.0) + lit(0.5)).cast("long"))
      .select(col("user_id"), col("hr"), col("val_e4"),
        col("v").isNull.as("interpolated"))
      .orderBy(col("user_id"), col("hr"))
  }

  /** The SQL front end proper: temp views + `spark.sql` with a CTE and
    * a correlated-scalar subquery — the same text a reference user's
    * SQL would arrive as. */
  def qSqlSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """WITH pricey AS (
        |  SELECT o_custkey, o_orderstatus, o_totalprice FROM orders_v
        |  WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_v))
        |SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM pricey GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Global top-k: TakeOrderedAndProject (per-partition heaps + driver
    * merge of k rows), never a cluster-wide sort. */
  def qTopKGlobal(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  /** Statistical aggregates: stddev/variance/correlation/covariance —
    * all single-pass partial-aggregable (sum/sumsq/sumxy moments), so
    * one narrow shuffle of |groups| moment rows at any scale. */
  def qStatsAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_extendedprice")), 2).as("var_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6)
          .as("cov_qd"),
        round(avg(col("l_tax")), 6).as("avg_tax"))
      .orderBy(col("l_returnflag"))

  /** Fixed-width histogram (data profiling): bucket bounds are literals
    * so the whole histogram is one scan + one |buckets|-row shuffle —
    * the profile-100-TB-in-one-pass shape (vs. sort-based quantiles). */
  def qHistogram(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(least(floor(col("o_totalprice") / 50000.0), lit(9L))
        .cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** 2-D fixed-grid histogram (quantity × discount heatmap): both bin
    * assignments are pure arithmetic on literals, so the entire
    * |grid|-cell surface is one scan + one partial-aggregable shuffle —
    * the 2-D profile at 100 TB costs the same pass as the 1-D one.
    * Binning avoids float log/pow: (qty−1)/5 and disc×100 are exact on
    * the same doubles in both engines. */
  def qHistogram2d(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        least(lit(9), floor((col("l_quantity") - 1) / 5)).cast("int")
          .as("qty_bin"),
        least(lit(9), floor(col("l_discount") * 100)).cast("int")
          .as("disc_bin"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .groupBy(col("qty_bin"), col("disc_bin"))
      .agg(count(lit(1)).as("n"), round(sum(col("rev")), 2).as("revenue"))
      .orderBy(col("qty_bin"), col("disc_bin"))

  /** Funnel analysis over the event stream: per-user earliest view →
    * first click after it → first purchase after that. Three grouped
    * passes over one user-partitioned shuffle — no self-join explosion;
    * conditional min-aggregates carry the stage timestamps. */
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    // first ~2 days only, so the three stages genuinely attrite
    // (over the full month every user completes the funnel)
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), epochS(col("ts")).as("ts_s"))
      .filter(col("ts_s") < 1704240000L)
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t_view"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("ts_s") > col("t_view"))
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(col("ts_s")).as("t_click"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("ts_s") > col("t_click"))
      .groupBy(col("user_id"))
      .agg(min(col("ts_s")).as("t_purchase"))
    t1.select(count(lit(1)).as("n_view"))
      .crossJoin(t2.select(count(lit(1)).as("n_click")))
      .crossJoin(t3.select(count(lit(1)).as("n_purchase")))
  }

  /** Time-weighted average (sensor/metric rollup): each event's value
    * holds until the user's next event; weight = holding seconds. One
    * lead window per user, then a grouped weighted sum. */
  def qTimeWeightedAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("t0", epochS(col("ts")))
      .withColumn("t1", lead(epochS(col("ts")), 1).over(w))
      .filter(col("t1").isNotNull && col("t1") > col("t0"))
      .groupBy(col("user_id"))
      .agg(round(sum(col("value") * (col("t1") - col("t0"))) /
        sum(col("t1") - col("t0")), 6).as("twa"),
        count(lit(1)).as("n_intervals"))
      .orderBy(col("user_id"))
  }

  /** Gaps-and-islands: runs of consecutive order days. The classic
    * date-minus-row_number trick — one global window over |distinct
    * days| rows (small after the distinct), not over the fact table. */
  def qGapIslands(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("day"))
    Tables.orders(s, d)
      .filter(col("o_totalprice") > 400000)
      .select(to_date(col("o_orderdate")).as("day")).distinct()
      .withColumn("grp", date_sub(col("day"),
        row_number().over(w)))
      .groupBy(col("grp"))
      .agg(min(col("day")).cast("string").as("island_start"),
        max(col("day")).cast("string").as("island_end"),
        count(lit(1)).as("n_days"))
      .drop("grp")
      .filter(col("n_days") >= 2)
      .orderBy(col("island_start"))
  }

  /** Keep-latest-per-key (CDC/warehouse compaction): the newest event
    * row per user. row_number over a per-key shuffle; at scale this is
    * the standard changelog-compaction pattern (and the window rewrite
    * rule turns top-1 into a bounded heap). */
  def qLatestPerKey(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), col("value"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        epochS(col("ts")).as("ts_s"), round(col("value"), 2).as("value"))
      .orderBy(col("user_id"))
  }

  /** Market-basket co-occurrence: part pairs ordered together. The
    * self-join shuffles on order key once; pair generation is bounded
    * by order size (≤7 lines in TPC-H), so output is O(|orders|·k²),
    * never corpus² — and top-20 is a total order (count desc, pair),
    * fully deterministic. */
  def qMarketBasket(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val a = li.select(col("ok"), col("pk").as("part_a"))
    val b = li.select(col("ok"), col("pk").as("part_b"))
    a.join(b, "ok").filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Correlated LATERAL subquery (per-nation top-2 suppliers) through
    * the SQL front end — Catalyst plans the correlated limit as a
    * partitioned rank, not a per-row re-scan. */
  def qLateralTopN(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("nation_v")
    Tables.supplier(s, d).createOrReplaceTempView("supplier_v")
    s.sql(
      """SELECT n_name, s.s_name, s.s_acctbal
        |FROM nation_v n, LATERAL (
        |  SELECT s_name, s_acctbal FROM supplier_v
        |  WHERE s_nationkey = n.n_nationkey
        |  ORDER BY s_acctbal DESC, s_name LIMIT 2) s
        |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin)
  }

  /** Calendar-spine gap filling: build the full day spine with
    * `sequence` (from one aggregated (min,max) row — never a driver
    * loop), left-join sparse daily aggregates, zero-fill the holes.
    * The spine side is |days| rows, so the join broadcasts. */
  def qDateSpine(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val bounds = orders.agg(
      min(to_date(col("o_orderdate"))).as("lo"),
      max(to_date(col("o_orderdate"))).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("day"))
    val daily = orders.filter(col("o_totalprice") > 400000)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day").cast("string").as("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total"), lit(0.0)).as("total"))
      .orderBy(col("day"))
  }

  /** Deterministic MODE (most frequent value, smallest-value tiebreak):
    * count per (group, value) then top-1 — two narrow shuffles, no
    * whole-group materialization. */
  def qMode(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("n").desc, col("l_quantity"))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Referential-integrity audit (warehouse QA): orphan counts via
    * anti-joins plus the base totals that make the report
    * discriminating. Each anti-join shuffles on its key once; dims
    * (customer/part/supplier) broadcast. */
  def qIntegrityAudit(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val nOrders = orders.agg(count(lit(1)).as("n_orders"))
    val nLi = li.agg(count(lit(1)).as("n_lineitem"))
    def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String,
        out: String) =
      fact.join(dim, fact(fk) === dim(pk), "left_anti")
        .agg(count(lit(1)).as(out))
    nOrders.crossJoin(nLi)
      .crossJoin(orphans(orders, "o_custkey",
        Tables.customer(s, d), "c_custkey", "orphan_orders"))
      .crossJoin(orphans(li, "l_orderkey", orders, "o_orderkey",
        "orphan_li_orders"))
      .crossJoin(orphans(li, "l_partkey",
        Tables.part(s, d), "p_partkey", "orphan_li_parts"))
      .crossJoin(orphans(li, "l_suppkey",
        Tables.supplier(s, d), "s_suppkey", "orphan_li_supps"))
  }

  /** SCD type-2 dimension build from a changelog: each event opens a
    * validity interval closed by the user's next event; the open row is
    * flagged current. One lead window per key — the standard
    * history-table construction. */
  def qScd2Build(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("valid_from_s", epochS(col("ts")))
      .withColumn("_vt", lead(epochS(col("ts")), 1).over(w))
      .select(col("user_id"), col("event_type"), col("valid_from_s"),
        coalesce(col("_vt"), lit(9999999999L)).as("valid_to_s"),
        col("_vt").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from_s"))
  }

  /** Skew-mitigating salted JOIN: replicate the small side across
    * `salts` copies and scatter the fact side by hash-salt, so one hot
    * join key spreads over `salts` tasks instead of one straggler.
    * Result is provably identical to the plain join (each fact row
    * meets exactly the one replica matching its salt). */
  def qSkewJoinSalted(s: SparkSession, d: String): DataFrame = {
    val salts = 8
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"))
      .crossJoin(s.range(salts).select(col("id").cast("int").as("_ssalt")))
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .withColumn("_fsalt", pmod(hash(col("l_suppkey")), lit(salts)).cast("int"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("_fsalt") === col("_ssalt"))
      .groupBy(col("s_nationkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("s_nationkey"))
  }

  /** Hierarchy rollup via a NATIVE recursive CTE (Spark 4.1 UnionLoop):
    * each part's ancestor chain in the decimal-digit tree
    * (parent(k) = ⌊k/10⌋) is walked bottom-up, then retail value is
    * summed per ancestor — the BOM-explosion shape. Recursion is safe
    * here because a tree gives every node ONE path to the root (Spark
    * recursion is UNION ALL-only, see RecursiveCteSpec); depth is
    * log₁₀(maxKey), so the loop runs ~4 iterations regardless of row
    * count. Cyclic graphs stay on the iterative alternating-min join
    * (graft.dedup.Components), which scales without per-step dedup. */
  def qRecursiveBom(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d).createOrReplaceTempView("part")
    s.sql(
      """WITH RECURSIVE anc(node, a) AS (
        |  SELECT p_partkey, p_partkey FROM part
        |  UNION ALL
        |  SELECT node, CAST(floor(a / 10) AS BIGINT) FROM anc WHERE a > 0
        |)
        |SELECT a AS anc_key, CAST(count(*) AS BIGINT) AS n_desc,
        |  round(sum(p.p_retailprice), 2) AS subtree_value
        |FROM anc JOIN part p ON p.p_partkey = anc.node
        |GROUP BY a ORDER BY a""".stripMargin)
  }

  /** Order-independent table fingerprint: per-row md5-lower-64 of a
    * canonical field encoding, masked to 63 bits, XOR-folded per group.
    * XOR is commutative/associative → map-side combinable, one
    * ~|groups|-row shuffle, no sort — the only audit shape that is
    * practical at 100 TB (compare fingerprints across replicas /
    * before-after migrations without moving data). DuckDB's
    * `md5_number_lower` is the same hash, so the oracle recomputes the
    * checksum bit-for-bit. */
  def qTableChecksum(s: SparkSession, d: String): DataFrame = {
    import graft.functions.exprs
    val rowStr = concat_ws("|",
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate").cast("date").cast("string"))
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        exprs.md5Lower64(rowStr).bitwiseAND(lit(Long.MaxValue)).as("_h"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(_h)").as("checksum"))
      .orderBy(col("l_returnflag"))
  }

  /** Z-order (Morton) clustering audit: interleave the bits of two
    * bucketed dimensions (customer, order day) into one sort key, then
    * report the per-z-bucket bounding box of both dimensions. Sorting /
    * partitioning 100 TB by this key gives every file a SMALL min-max
    * envelope on BOTH columns, so scans filtered on either dimension
    * prune most files — multi-dimensional data skipping that a
    * single-column sort cannot provide. Pure integer bit arithmetic,
    * fully codegen'd; the oracle replays the same 16 terms. */
  def qZorderCluster(s: SparkSession, d: String): DataFrame = {
    val x = floor(col("o_custkey") / 8).cast("int")
    val y = floor(
      datediff(to_date(col("o_orderdate")),
        lit("1995-01-01").cast("date")) / 16).cast("int")
    val z = (0 until 8).map { i =>
      shiftright(col("_x"), i).bitwiseAND(lit(1)) * lit(1 << (2 * i)) +
        shiftright(col("_y"), i).bitwiseAND(lit(1)) * lit(1 << (2 * i + 1))
    }.reduce(_ + _)
    Tables.orders(s, d)
      .select(x.as("_x"), y.as("_y"))
      .select(col("_x"), col("_y"), z.as("_z"))
      .groupBy(shiftright(col("_z"), 8).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("_x")).as("min_x"), max(col("_x")).as("max_x"),
        min(col("_y")).as("min_y"), max(col("_y")).as("max_y"))
      .orderBy(col("zbucket"))
  }

  /** PageRank (3 iterations, damping 0.85) over the bipartite
    * customer↔supplier trade graph — the iterative-graph-analytics
    * shape beyond connected components (graft.dedup.Components):
    * each iteration is one join of the rank vector against the edge
    * list plus one node-keyed aggregation, both partial-aggregable,
    * so an iteration costs exactly one |edges|-row shuffle at any
    * scale. The iteration count is FIXED (not run-to-convergence), so
    * the DuckDB oracle replays the same three unrolled steps exactly.
    * Node ids: customers even (2k), suppliers odd (2k+1). */
  def qPagerank(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    // materialize the edge list / degree frame once and truncate
    // lineage (same recipe as qBfsHops): each of the 3 rank iterations
    // replans from in-memory blocks instead of stacking the
    // lineitem⋈orders build three plans deep
    val edges = pairs
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    val deg = edges.groupBy(col("a").as("node"))
      .agg(count(lit(1)).cast("double").as("deg"))
      .localCheckpoint(true)
    val nNodes = broadcast(deg.agg(count(lit(1)).cast("double").as("_n")))
    var ranks = deg.crossJoin(nNodes)
      .select(col("node"), (lit(1.0) / col("_n")).as("rank"))
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "a"), Seq("a"))
        .join(deg.withColumnRenamed("node", "a"), Seq("a"))
        .groupBy(col("b").as("node"))
        .agg(sum(col("rank") / col("deg")).as("_in"))
      ranks = contrib.crossJoin(nNodes)
        .select(col("node"),
          (lit(0.15) / col("_n") + lit(0.85) * col("_in")).as("rank"))
        .localCheckpoint(true)
    }
    ranks
      .filter(col("node") % 2 === 1)
      .select(((col("node") - 1) / 2).cast("long").as("s_suppkey"),
        round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("s_suppkey"))
      .limit(20)
  }

  /** Sliding (hopping) windows: 1-hour windows every 30 minutes, so
    * each event lands in exactly windowDuration/slide = 2 overlapping
    * windows — the smoothing shape tumbling windows can't express.
    * Spark expands the window set row-side (a 2× narrow explode, no
    * extra shuffle); the oracle regenerates the same epoch-aligned
    * window starts per event. */
  def qSlidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start_s"), col("event_type"))

  /** Weighted median: the revenue-weighted median unit price per
    * return flag — each price weighted by its line's revenue share,
    * the robust-statistics answer to "what price does a typical dollar
    * trade at". No native weighted quantile exists in either engine,
    * so it composes as a cumulative-weight window over the per-group
    * price order: median = first price whose running weight reaches
    * half the group total. One shuffle on (group, price order);
    * running sums are the same window machinery as q_running_sum. */
  def qWeightedMedian(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("l_returnflag"))
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"),
        // EXACT tenth-mill integer weight: price and discount each
        // carry ≤2 decimals, so revenue has ≤4 — round(w·10⁴) is
        // lossless, and the running sum + half-mass compare below
        // become integer arithmetic immune to cross-engine float
        // association order (the q_abc_class r5 lesson)
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000,
          0).cast("long").as("_w"))
      .withColumn("_cum", sum(col("_w")).over(w))
      .withColumn("_tot", max(col("_cum")).over(tot))
      .filter(col("_cum") * 2 >= col("_tot"))
      .groupBy(col("l_returnflag"))
      .agg(round(min(col("l_extendedprice")), 2).as("weighted_median"))
      .orderBy(col("l_returnflag"))
  }

  /** Triangle counting on the part co-purchase graph (parts ordered
    * together) — the clustering-coefficient / community-density
    * primitive next to PageRank and connected components. The PART
    * graph is the sparse one (|parts| ≫ per-order degree; the supplier
    * variant is near-complete on this data and triangle counting on a
    * complete graph is O(n³) by definition). Edges are oriented
    * low-id → high-id so each triangle is counted exactly once — at its
    * lowest-id edge, as the out-neighbor intersection of that edge's
    * endpoints. Pair-gen is bounded by per-order line count k
    * (O(|orders|·k²), the market-basket bound); at 100 TB the standard
    * refinement is orienting edges by degree instead of id, which caps
    * per-node adjacency at O(√E) and total intersection work at
    * O(E^1.5). */
  def qTriangleCount(s: SparkSession, d: String): DataFrame = {
    val ls = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = ls.as("x")
      .join(ls.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct()
      .cache()
    // Edge-iterator closure: per-node OUT-neighbor lists (id order), then
    // each edge (a,b) counts |N+(a) ∩ N+(b)| — its closing third
    // vertices. The wedge set (Σ indeg·outdeg rows, ~45× |E| here) is
    // never materialized or shuffled: the intersection runs in-core
    // against the |nodes|-row adjacency side. Adjacency is
    // degree-bounded (≲ KBs/node), so at 100 TB it either broadcasts or
    // equi-joins on the edge endpoint — still one |E|-row shuffle, vs
    // the wedge join's |wedges|-row one.
    val adj = e.groupBy(col("a").as("v"))
      .agg(collect_list(col("b")).as("nbrs"))
      .cache()
    val nNodes = e.select(col("a").as("v"))
      .union(e.select(col("b"))).distinct()
      .agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val nTri = e
      .join(broadcast(adj.select(col("v"), col("nbrs").as("na"))),
        col("a") === col("v"))
      .join(broadcast(adj.select(col("v").as("w"), col("nbrs").as("nb"))),
        col("b") === col("w"))
      .agg(coalesce(sum(size(array_intersect(col("na"), col("nb")))), lit(0L))
        .as("n_triangles"))
    nNodes.crossJoin(nEdges).crossJoin(nTri)
  }

  /** Ordered string aggregation (SQL LISTAGG / string_agg WITHIN
    * GROUP): each nation's top-5 customers by balance, concatenated in
    * rank order — the report-formatting surface every SQL engine
    * ships. Ranking rides the exact ranged [[Ranks.groupRowNumber]]
    * (no per-nation window sort); the ORDER inside the aggregate is
    * made deterministic by collecting (rank, name) structs and
    * array_sort-ing BEFORE the join — collect_list order itself is
    * never trusted. */
  def qStringAgg(s: SparkSession, d: String): DataFrame = {
    val ranked = Ranks.groupRowNumber(
      Tables.customer(s, d)
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("c_custkey"), col("c_name"),
          round(col("c_acctbal") * 100).cast("long").as("bal")),
      Seq(col("nationkey")),
      Seq(col("bal").desc, col("c_custkey")), "rn", "tot")
    ranked.filter(col("rn") <= 5)
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n_top"),
        array_join(expr("transform(array_sort(" +
          "collect_list(named_struct('rn', rn, 'name', c_name)))," +
          " x -> x.name)"), ",").as("top_names"))
      .orderBy(col("nationkey"))
  }

  /** Time-zone-aware date surface (the one date-function family that
    * was still unkeyed): UTC event instants re-bucketed into
    * America/New_York and Asia/Tokyo LOCAL days (cross-zone bucketing
    * — the −5h/+9h day boundaries move rows between buckets), plus
    * hourly probes across the 2024 US spring-forward and fall-back DST
    * transitions, where the NY wall clock SKIPS 02:xx and repeats
    * 01:xx. Instants ride the floor-epoch-seconds convention;
    * `convert_timezone('UTC', zone, ts)` under the pinned-UTC session
    * ⟷ DuckDB `timezone(zone, timezone('UTC', ts))` (naive → instant
    * → zone wall); the probe spine is generated identically in both
    * engines (sequence ⟷ generate_series), so every DST edge is
    * value-verified, not assumed. Map-only zone projection + one
    * grouped census per zone — the 100 TB shape of any localized
    * rollup. */
  def qTimezoneFuncs(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(timestamp_seconds(unix_timestamp(col("ts"))).as("uts"),
        round(col("value") * 100).cast("long").as("vc"))
    tzCensus(ev).unionByName(tzProbes(s))
      .orderBy(col("zone"), col("local_key"))
  }

  private[graft] def tzWall(zone: String, ts: Column): Column =
    convert_timezone(lit("UTC"), lit(zone), ts)

  /** The zone/local-day rollup shared by q_timezone_funcs and its
    * streaming twin: input = (uts TIMESTAMP instant, vc cent long). */
  private[graft] def tzCensus(ev: DataFrame): DataFrame =
    Seq("America/New_York", "Asia/Tokyo").map { z =>
      ev.groupBy(lit(z).as("zone"),
          date_format(tzWall(z, col("uts")), "yyyy-MM-dd").as("local_key"))
        .agg(count(lit(1)).as("n"), sum(col("vc")).as("v_cents"))
    }.reduce(_ unionByName _)

  /** The constant DST-boundary probe frame (both 2024 US transitions,
    * hourly) shared by q_timezone_funcs and its streaming twin. */
  private[graft] def tzProbes(s: SparkSession): DataFrame = {
    def spine(from: String, to: String) = s.range(1)
      .select(explode(expr(s"sequence(to_timestamp('$from'), " +
        s"to_timestamp('$to'), interval 1 hour)")).as("uts"))
    spine("2024-03-10 05:00:00", "2024-03-10 09:00:00")
      .unionByName(spine("2024-11-03 04:00:00", "2024-11-03 08:00:00"))
      .select(lit("ny_dst_probe").as("zone"),
        concat(date_format(col("uts"), "MM-dd'T'HH:mm'Z'"), lit("->"),
          date_format(tzWall("America/New_York", col("uts")),
            "MM-dd HH:mm")).as("local_key"),
        lit(1L).as("n"), lit(0L).as("v_cents"))
  }
}
