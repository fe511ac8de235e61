package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Analytics, JsonQueries}

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 JSON↔relational engine (reference core)
    "shred_flatten" -> (JsonQueries.shredFlatten _),
    "shred_children" -> (JsonQueries.shredChildren _),
    "shred_prim_subobj" -> (JsonQueries.shredPrimSubobj _),
    "shred_prim_array" -> (JsonQueries.shredPrimArray _),
    "assemble_nested" -> (JsonQueries.assembleNested _),
    "type_infer" -> (JsonQueries.typeInfer _),
    "point_lookup" -> (JsonQueries.pointLookup _),
    "upsert" -> (JsonQueries.upsert _),
    "schema_evolution" -> (JsonQueries.schemaEvolution _),
    "json_roundtrip_count" -> (JsonQueries.roundtripCount _),
    // §2.2 bulk analytic SQL
    "q1_pricing" -> (Analytics.q1Pricing _),
    "q3_shipping" -> (Analytics.q3Shipping _),
    "q5_local_supplier" -> (Analytics.q5LocalSupplier _),
    "q6_forecast" -> (Analytics.q6Forecast _),
    "q_window_topn" -> (Analytics.qWindowTopN _),
    "q_running_sum" -> (Analytics.qRunningSum _),
    "q_distinct_agg" -> (Analytics.qDistinctAgg _),
    "q_semi_anti" -> (Analytics.qSemiAnti _),
    "q_case_having" -> (Analytics.qCaseHaving _),
    "q_date_funcs" -> (Analytics.qDateFuncs _),
    "q_string_funcs" -> (Analytics.qStringFuncs _),
    "q_set_ops" -> (Analytics.qSetOps _),
    "q_rollup" -> (Analytics.qRollup _),
    "q_sessionize" -> (Analytics.qSessionize _),
    "q_topk_global" -> (Analytics.qTopKGlobal _),
  )

  def oracleSql: Map[String, String] = Map(
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
        |  SELECT 'event_time', strftime(ts, '%Y-%m-%dT%H:%M:%S') FROM events
        |  UNION ALL
        |  SELECT 'props_raw', props FROM events)
        |SELECT name,
        |  CASE WHEN regexp_full_match(value, '-?[0-9]+') THEN 'NUMBER'
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
    "q_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name,
        |  coalesce(n_name, 'ALL') AS n_name,
        |  count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY 1, 2""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
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
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
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
  )
}
