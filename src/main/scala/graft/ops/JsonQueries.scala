package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.json.{Assemble, Shred}
import graft.sources.Tables

/** SURVEY §2.1 — the reference's JSON↔relational capabilities as
  * verifiable queries over the test tables.
  *
  * Docs are synthesized from the relational tables, pushed through the
  * real shred/assemble machinery, and the results land back in relational
  * form so a plain-SQL DuckDB oracle can check them.
  */
object JsonQueries {

  /** Nested documents built from orders: root carries the key
    * ("rowNum" in reference terms), a key-less customer object
    * (→ `customer$…` flatten path), and an items array (→ child table
    * path). Restricted to keys %20==0 to keep bench bounded. */
  private def orderDocs(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderkey") % 20 === 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_custkey")
    val cust = Tables.customer(s, d).select("c_custkey", "c_name", "c_mktsegment")
    val items = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 20 === 0)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("rowNum"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))))
        .as("items"))
    ord
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(items, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey").as("rowNum"),
        col("o_orderstatus"), col("o_totalprice"),
        struct(col("c_name"), col("c_mktsegment")).as("customer"),
        coalesce(col("items"), array()).as("items"))
  }

  /** Secondary-index point lookup through the Engine facade — the
    * reference's SQLite column-index analogue on the parquet store:
    * save the order docs, build a sorted (value, rowNum) index on the
    * status column, and resolve every 'P' order through the index
    * (narrow index scan → broadcast semi probe of the base table by
    * key — the base is never scanned for the value). Census output;
    * oracle replays the same filter over the raw source. */
  def engineIndexLookup(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_idx").toString
    val eng = new graft.Engine(s, wh)
    eng.save(orderDocs(s, d), "order")
    eng.buildIndex("order", "o_orderstatus")
    eng.lookupByIndex("order", "o_orderstatus", "P")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"),
        min(col("rowNum")).as("min_key"), max(col("rowNum")).as("max_key"))
  }

  /** Index maintenance across MUTATION — the lifecycle claim
    * [[engineIndexLookup]] only states: save, index, UPSERT a batch
    * that flips every 5th order's status to 'P' (and inserts new
    * far-key rows, also 'P'), rebuild the index — the reference
    * recreates schema-dependent structures on mutation the same way —
    * and prove the rebuilt index serves the post-mutation truth: the
    * lookup census includes every flipped and inserted row. Oracle
    * replays upsert + filter over the raw source. */
  def engineIndexRebuild(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_idxr").toString
    val eng = new graft.Engine(s, wh)
    val docs = Tables.orders(s, d)
      .select(col("o_orderkey").as("rowNum"), col("o_orderstatus"),
        col("o_totalprice"))
    eng.save(docs, "order")
    eng.buildIndex("order", "o_orderstatus")
    val updates = docs.filter(col("rowNum") % 5 === 0)
      .select(col("rowNum"), lit("P").as("o_orderstatus"),
        col("o_totalprice"))
      .unionByName(docs.filter(col("rowNum") % 11 === 0)
        .select((col("rowNum") + 10000000L).as("rowNum"),
          lit("P").as("o_orderstatus"), col("o_totalprice")))
    eng.upsert("order", updates)
    eng.buildIndex("order", "o_orderstatus") // rebuild after mutate
    eng.lookupByIndex("order", "o_orderstatus", "P")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"),
        max(col("rowNum")).as("max_key"))
  }

  /** Flat shred of the events.props JSON column. */
  def shredFlatten(s: SparkSession, d: String): DataFrame =
    Shred.flatten(
      Tables.events(s, d).select("event_id", "event_type", "props"),
      "props", StructType(Seq(StructField("k", LongType))),
      keep = Seq("event_id", "event_type"))
      .orderBy(col("event_id"))

  /** Array-of-objects → child table with parent-named FK (reference's
    * `{check:}` path) via the generic normalizer. */
  def shredChildren(s: SparkSession, d: String): DataFrame = {
    val tables = Shred.normalize(orderDocs(s, d), "order")
    tables("items")
      .select(col("order").as("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Key-less primitive object → `parent$sub` flattened columns. */
  def shredPrimSubobj(s: SparkSession, d: String): DataFrame = {
    val tables = Shred.normalize(orderDocs(s, d), "order")
    tables("order")
      .select(col("rowNum").as("o_orderkey"),
        col("customer$c_name"), col("customer$c_mktsegment"))
      .orderBy(col("o_orderkey"))
  }

  /** Primitive array ⇄ JSON-text column roundtrip: quantities per order
    * are serialized to a JSON string (reference storage form), parsed
    * back, exploded, and re-aggregated. */
  def shredPrimArray(s: SparkSession, d: String): DataFrame = {
    val qtyJson = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(to_json(expr(
        "transform(array_sort(collect_list(struct(l_linenumber, l_quantity)))," +
          " x -> x.l_quantity)")).as("qty_json"))
    // aggregate the parsed array in place — no second shuffle; the
    // explode path is exercised by shred_children
    qtyJson
      .select(col("l_orderkey"),
        from_json(col("qty_json"), ArrayType(DoubleType)).as("qtys"))
      .select(col("l_orderkey"),
        size(col("qtys")).cast("long").as("n_items"),
        round(aggregate(col("qtys"), lit(0.0), (acc, x) => acc + x), 2)
          .as("sum_qty"))
      .orderBy(col("l_orderkey"))
  }

  /** Assemble: nest customer object + items array into a JSON doc, then
    * prove the doc's integrity by re-extracting fields from the JSON. */
  def assembleNested(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderkey") % 25 === 0)
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    val cust = Tables.customer(s, d).select("c_custkey", "c_name")
    val li = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 25 === 0)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val withCust = Assemble.nestObject(
      ord, broadcast(cust), "o_custkey", "c_custkey", "customer")
    val withItems = Assemble.nestArray(
      withCust, "o_orderkey", li, "l_orderkey", "items",
      orderCols = Seq("l_linenumber"))
      .filter(col("items").isNotNull) // inner semantics to match oracle
    withItems
      .select(col("o_orderkey"),
        Assemble.toJsonDoc(
          col("o_orderkey"), col("customer"),
          size(col("items")).as("n_items"),
          round(expr("aggregate(items, 0D, (acc, x) -> acc + x.l_quantity)"), 2)
            .as("sum_qty")).as("doc"))
      .select(
        col("o_orderkey"),
        get_json_object(col("doc"), "$.customer.c_name").as("cust_name"),
        get_json_object(col("doc"), "$.n_items").cast("long").as("n_items"),
        get_json_object(col("doc"), "$.sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_orderkey"))
  }

  /** Heterogeneous child arrays (reference DatabaseManager.java:168-202,
    * 231-238): one array mixing object types is routed to per-`type`
    * child tables; rows with undeclared types are dropped (the
    * reference logs and skips them, java:180-183). Items are tagged
    * big/small by quantity — plus a rare 'exotic' tag left undeclared
    * to exercise the drop path — shredded through
    * `Shred.normalizeTyped`, and summarized per routed table. */
  def shredTypedChildren(s: SparkSession, d: String): DataFrame = {
    val itemSchema = StructType(Seq(
      StructField("l_linenumber", LongType),
      StructField("l_quantity", DoubleType)))
    val docs = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 20 === 0)
      .groupBy(col("l_orderkey").as("rowNum"))
      .agg(collect_list(struct(
        when(col("l_linenumber") === 7, "exotic")
          .when(col("l_quantity") > 25, "big")
          .otherwise("small").as("type"),
        to_json(struct(col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity").cast("double").as("l_quantity"))).as("json")))
        .as("items"))
    val tables = Shred.normalizeTyped(docs, "items", "rowNum", "order",
      Map("big" -> itemSchema, "small" -> itemSchema))
    tables.toSeq.sortBy(_._1)
      .map { case (tpe, df) =>
        df.select(lit(tpe).as("item_type"), col("order"), col("l_quantity"))
      }
      .reduce(_ unionByName _)
      .groupBy(col("item_type"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("order")).as("n_orders"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("item_type"))
  }

  /** Reference getType classification over (name, value) pairs drawn
    * from events: a JSON int, a decimal (the Gson getAsInt edge — still
    * NUMBER), an ISO timestamp string, a JSON blob. */
  def typeInfer(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(explode(array(
        struct(lit("k").as("name"),
          get_json_object(col("props"), "$.k").as("value")),
        struct(lit("amount").as("name"),
          concat(get_json_object(col("props"), "$.k"), lit(".5")).as("value")),
        struct(lit("event_time").as("name"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("value")),
        struct(lit("props_raw").as("name"), col("props").as("value"))))
        .as("nv"))
      .select(col("nv.name").as("name"), col("nv.value").as("value"))
      .groupBy(col("name"), Shred.inferType(col("name"), col("value")).as("vclass"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("name"), col("vclass"))

  /** Point lookup by key (reference getFromDatabaseJson): the filter
    * pushes to parquet so only matching row groups are read. */
  def pointLookup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") === 100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").cast("date").as("o_orderdate"))

  /** Keyed upsert: modified rows replace, a fresh key appends. */
  def upsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val mods = base.filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        round(col("o_totalprice") * 1.1, 2).as("o_totalprice"))
    val fresh = s.range(1).select(lit(-1L).as("o_orderkey"),
      lit("N").as("o_orderstatus"), lit(123.45).as("o_totalprice"))
    Upsert(base, mods.unionByName(fresh), Seq("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** Schema evolution: a later batch carries a new column; old rows
    * surface NULL → coalesced marker. */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val v1 = ord.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_totalprice")
    val v2 = ord.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    Upsert.evolve(v1, v2)
      .groupBy(coalesce(col("o_orderpriority"), lit("<missing>")).as("priority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("priority"))
  }

  /** Full engine facade roundtrip — the reference's own API shape:
    * bulk `save` (≙ saveIntoDatabase) then point `getJson`
    * (≙ getFromDatabaseJson), verified by re-extracting fields from
    * the returned JSON document. */
  def engineSaveGet(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wh = graft.util.Scratch.dir("graft_engine").toString
    val eng = new graft.Engine(s, wh)
    eng.save(orderDocs(s, d), "order")
    val doc = eng.getJson("order", 100L).getOrElse("{}")
    Seq(doc).toDF("doc").select(
      get_json_object(col("doc"), "$.rowNum").cast("long").as("o_orderkey"),
      get_json_object(col("doc"), "$.o_orderstatus").as("o_orderstatus"),
      get_json_object(col("doc"), "$.o_totalprice").cast("double")
        .as("o_totalprice"),
      expr("json_array_length(get_json_object(doc, '$.items'))")
        .cast("long").as("n_items"))
  }

  /** Depth-3 documents through the FULL engine surface: every nation
    * as a doc carrying a keyed child OBJECT (its region) and a child
    * ARRAY (its customers), saved via the facade — the shred routes
    * the region to its own table (keyed sub-object, java:145-155),
    * the customers to an FK'd child table (java:168-202) — then
    * queried back through `eng.sql` by joining all three shredded
    * tables. The oracle replays the same rollup from the raw source
    * tables, proving the shred/manifest/SQL path preserves the
    * relational content at depth. */
  def engineNestedSql(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_ns").toString
    val eng = new graft.Engine(s, wh)
    val cust = Tables.customer(s, d)
      .select(col("c_nationkey"),
        struct(col("c_custkey").as("rowNum"), col("c_acctbal")).as("c"))
      .groupBy(col("c_nationkey"))
      .agg(sort_array(collect_list(col("c"))).as("members"))
    val docs = Tables.nation(s, d)
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .join(cust, col("n_nationkey") === col("c_nationkey"))
      .select(col("n_nationkey").as("rowNum"), col("n_name"),
        struct(col("r_regionkey").as("rowNum"), col("r_name"))
          .as("home_region"),
        col("members"))
    eng.save(docs, "nation_doc")
    // each parent doc shreds its OWN copy of the region sub-object
    // (reference stores one row per embedded object, java:145-155), so
    // the shared dimension must be distinct-collapsed before the join
    eng.sql("""SELECT hr.r_name AS r_name,
        count(*) AS n_customers,
        round(sum(m.c_acctbal), 2) AS total_bal
      FROM members m
      JOIN nation_doc nd ON m.nation_doc = nd.rowNum
      JOIN (SELECT DISTINCT rowNum, r_name FROM home_region) hr
        ON nd.home_region = hr.rowNum
      GROUP BY hr.r_name ORDER BY r_name""")
  }

  /** Engine keyed delete (reference DELETE-by-rowNum analogue): save a
    * table through the facade, staged-rewrite-delete every 7th key, and
    * aggregate what survives — so the driver gate exercises the same
    * `rewriteStaged` swap path crash-tested in EngineSpec. Oracle is the
    * equivalent anti-filter over the source parquet. */
  def engineDelete(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_del").toString
    val eng = new graft.Engine(s, wh)
    val docs = Tables.orders(s, d)
      .select(col("o_orderkey").as("rowNum"), col("o_orderstatus"),
        col("o_totalprice"))
    eng.save(docs, "order")
    eng.delete("order", docs.filter(col("rowNum") % 7 === 0).select("rowNum"))
    eng.table("order")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** Schema evolution THROUGH the Engine mutation path (the reference
    * runs assertColumn on update too, java:129-131): an upsert batch
    * carrying a column the stored table has never seen widens the
    * table — surviving rows read NULL there — without any separate
    * migration step. The staged rewrite makes the widening atomic:
    * readers see the old schema or the new one, never a half-written
    * mix. */
  def engineEvolveUpsert(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_ev").toString
    val eng = new graft.Engine(s, wh)
    val base = Tables.orders(s, d)
      .select(col("o_orderkey").as("rowNum"), col("o_totalprice"))
    eng.save(base, "order")
    eng.upsert("order", Tables.orders(s, d)
      .filter(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey").as("rowNum"), col("o_totalprice"),
        col("o_orderstatus")))
    eng.table("order")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("o_totalprice")), 2).as("total"),
        count(col("o_orderstatus")).as("n_with_status"))
  }

  /** Engine bounded time travel: save a table, mutate it twice through
    * the staged-swap path (upsert then delete), and aggregate all three
    * retained states — v0 (original), v1 (post-upsert), live
    * (post-delete). Each archived version is a rename of parquet the
    * swap already wrote (never a copy), so history is free at any
    * scale. Oracle replays the same two mutations over the source
    * parquet in SQL. */
  def engineTimeTravel(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_tt").toString
    val eng = new graft.Engine(s, wh)
    val docs = Tables.customer(s, d)
      .select(col("c_custkey").as("rowNum"), col("c_acctbal"))
    eng.save(docs, "cust")
    eng.upsert("cust", docs.filter(col("rowNum") % 5 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 100, 2)))
    eng.delete("cust", docs.filter(col("rowNum") % 11 === 0)
      .select("rowNum"))
    def snap(df: org.apache.spark.sql.DataFrame, label: String) =
      df.agg(count(lit(1)).as("n_rows"),
          round(sum(col("c_acctbal")), 2).as("balance"))
        .select(lit(label).as("version"), col("n_rows"), col("balance"))
    snap(eng.tableAt("cust", 0), "v0")
      .unionByName(snap(eng.tableAt("cust", 1), "v1"))
      .unionByName(snap(eng.table("cust"), "live"))
      .orderBy(col("version"))
  }

  /** Snapshot diff — the CDC between two time-travel versions that
    * completes the Engine verb story: after a mixed mutation batch
    * (update-upserts, insert-upserts, deletes), diff v0 against the
    * live table with ONE full-outer join on the row key and classify
    * every row added / deleted / changed / unchanged, with the balance
    * delta per class in EXACT cents (a float delta sum can straddle a
    * half-cent boundary between engines). The join keys both sides on
    * rowNum — at scale both snapshots share that partitioning, so the
    * diff is a co-partitioned join, not a broadcast or a sort. */
  def engineSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_sd").toString
    // three mutations between v0 and live → retain 3 snapshots
    val eng = new graft.Engine(s, wh, retainVersions = 3)
    val docs = Tables.customer(s, d)
      .select(col("c_custkey").as("rowNum"), col("c_acctbal"))
    eng.save(docs, "cust")
    eng.upsert("cust", docs.filter(col("rowNum") % 5 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 100, 2)))
    eng.upsert("cust", docs.filter(col("rowNum") % 7 === 0)
      .select((col("rowNum") + 100000L).as("rowNum"), col("c_acctbal")))
    eng.delete("cust", docs.filter(col("rowNum") % 11 === 0)
      .select("rowNum"))
    val v0 = eng.tableAt("cust", 0)
      .select(col("rowNum"), col("c_acctbal").as("old_bal"))
    val live = eng.table("cust")
      .select(col("rowNum"), col("c_acctbal").as("new_bal"))
    v0.join(live, Seq("rowNum"), "full_outer")
      .withColumn("change_type",
        when(col("old_bal").isNull, "added")
          .when(col("new_bal").isNull, "deleted")
          .when(col("new_bal") =!= col("old_bal"), "changed")
          .otherwise("unchanged"))
      .withColumn("delta_cents",
        round((coalesce(col("new_bal"), lit(0.0)) -
          coalesce(col("old_bal"), lit(0.0))) * 100, 0).cast("long"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("delta_cents")).cast("double") / 100.0)
          .as("balance_delta"))
      .orderBy(col("change_type"))
  }

  /** Storage-lifecycle close-out — completes the Engine verb story
    * (save / upsert / delete / time-travel / diff / VACUUM): after two
    * mutations leave two retained snapshots behind, vacuum reclaims
    * every archived version dir while the live table survives
    * bit-for-bit. Retention dirs are renames of parquet the staged
    * swap already wrote, so vacuum is pure metadata+delete — no data
    * pass at any scale. Output: live-content census plus the reclaim
    * counts; the oracle replays both mutations over the source parquet
    * and pins the vacuum invariant (2 dirs removed, 0 versions left,
    * live content untouched). */
  def engineVacuum(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_vac").toString
    val eng = new graft.Engine(s, wh)
    val docs = Tables.customer(s, d)
      .select(col("c_custkey").as("rowNum"), col("c_acctbal"))
    eng.save(docs, "cust")
    eng.upsert("cust", docs.filter(col("rowNum") % 5 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 100, 2)))
    eng.delete("cust", docs.filter(col("rowNum") % 11 === 0)
      .select("rowNum"))
    val removed = eng.vacuum("cust")
    val left = eng.versions("cust").size
    eng.table("cust")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")), 2).as("balance"))
      .select(col("n_rows"), col("balance"),
        lit(removed.toLong).as("n_dirs_removed"),
        lit(left.toLong).as("n_versions_left"))
  }

  /** Shred→assemble roundtrip integrity over all orders. */
  def roundtripCount(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val docs = ord.select(Assemble.toJsonDoc(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")).as("doc"))
    val back = Shred.flatten(docs, "doc", StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType))))
    back.join(ord.withColumnRenamed("o_orderstatus", "st")
      .withColumnRenamed("o_totalprice", "tp"), Seq("o_orderkey"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("o_orderstatus") === col("st") &&
          col("o_totalprice") === col("tp"), 1L).otherwise(0L)).as("n_match"))
  }

  /** JSON-Patch-style document mutation (RFC 6902's replace/add/remove
    * verbs) over the event props documents: op 0 REPLACEs k with 2k,
    * op 1 ADDs a tag field, op 2 REMOVEs k (leaving {}). The patched
    * document is MATERIALIZED as real JSON text (`to_json`) and then
    * re-parsed, so the census proves the patch round-trips through the
    * serialized form — the document-store mutation path the reference
    * covers only via whole-object upsert (DatabaseManager.java:211-229
    * replaces whole rows; field-level patch is the natural extension).
    * Map-only: parse → branch → serialize → re-parse, one scan, one
    * |ops|-row rollup. */
  /** RFC 7386 JSON MERGE PATCH over nested order documents — the
    * declarative partial-update verb the reference only covers via
    * whole-row upsert: four deterministic patch classes (scalar
    * replace; nested remove-one-member; remove whole sub-object;
    * add-nested + merge-into-existing) applied through the generic
    * schema-driven [[graft.json.MergePatch]] projection, then censused
    * from the RE-PARSED patched text so the contract covers the full
    * serialize→patch→serialize round trip. The oracle replays the
    * identical patches through DuckDB's NATIVE json_merge_patch — an
    * independent RFC 7386 implementation. Map-only: one scan, one
    * |ops|-row rollup. */
  def engineMergePatch(s: SparkSession, d: String): DataFrame = {
    import graft.json.{MergePatch, Patch}
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("status", StringType),
      StructField("meta", StructType(Seq(
        StructField("price_cents", LongType),
        StructField("prio", StringType))))))
    val docs = Tables.orders(s, d).select(
      (col("o_orderkey") % 4).cast("long").as("op"),
      to_json(struct(col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        struct(round(col("o_totalprice") * 100).cast("long")
          .as("price_cents"),
          col("o_orderpriority").as("prio")).as("meta"))).as("doc"))
    def patched(p: Seq[(String, Patch)]): Column =
      MergePatch(col("doc"), schema, p)
    val m = docs.withColumn("m",
      when(col("op") === 0,
        patched(Seq("status" -> Patch.Set(lit("XX")))))
        .when(col("op") === 1, patched(Seq(
          "meta" -> Patch.Obj(Seq("price_cents" -> Patch.Remove)))))
        .when(col("op") === 2, patched(Seq("meta" -> Patch.Remove)))
        .otherwise(patched(Seq(
          "extra" -> Patch.Obj(Seq("src" -> Patch.Set(lit("patch")))),
          "meta" -> Patch.Obj(Seq("audited" -> Patch.Set(lit(true))))))))
    m.groupBy(col("op"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(get_json_object(col("m"), "$.status") === "XX", 1L)
          .otherwise(0L)).as("n_status_x"),
        count(get_json_object(col("m"), "$.meta.price_cents"))
          .as("n_price"),
        coalesce(sum(get_json_object(col("m"), "$.meta.price_cents")
          .cast("long")), lit(0L)).as("sum_price_cents"),
        count(get_json_object(col("m"), "$.meta")).as("n_meta"),
        count(get_json_object(col("m"), "$.extra.src")).as("n_extra"),
        sum(when(get_json_object(col("m"), "$.meta.audited") === "true",
          1L).otherwise(0L)).as("n_audited"))
      .orderBy(col("op"))
  }

  def qJsonPatch(s: SparkSession, d: String): DataFrame = {
    val base = graft.sources.Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        (col("event_id") % 3).as("op"))
    val patched = base.withColumn("doc",
      when(col("op") === 0,
        to_json(struct((col("k") * 2).as("k"))))
        .when(col("op") === 1,
          to_json(struct(col("k"), col("event_type").as("tag"))))
        .otherwise(lit("{}")))
    patched
      .select(col("op"),
        get_json_object(col("doc"), "$.k").cast("long").as("k2"),
        get_json_object(col("doc"), "$.tag").as("tag"))
      .groupBy(col("op"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("k2")), lit(0L)).as("sum_k_after"),
        count(col("tag")).as("n_with_tag"))
      .orderBy(col("op"))
  }

  /** RFC 6901 JSON Pointer lookup ([[graft.json.JsonPointer]]) —
    * reference-core growth to the third JSON-RFC verb beside
    * q_json_patch (6902 subset) and engine_merge_patch (7386). Docs
    * carry an escaped key (`a/b` → pointer `/a~1b`), a nested object
    * and an array; four pointers (nested scalar, escaped key, array
    * index, non-resolving) are evaluated per doc and rolled up per
    * status. The oracle builds the same docs with DuckDB json_object
    * and resolves the RAW pointers through DuckDB's NATIVE JSONPointer
    * path support — two independent RFC implementations certified to
    * agree. */
  def engineJsonPointer(s: SparkSession, d: String): DataFrame = {
    import graft.json.JsonPointer
    val docs = Tables.orders(s, d).select(
      col("o_orderstatus").as("status"),
      to_json(struct(
        col("o_orderkey").as("id"),
        col("o_orderpriority").as("a/b"),
        struct(round(col("o_totalprice") * 100).cast("long")
          .as("price_cents")).as("meta"),
        array(col("o_orderstatus"), col("o_orderpriority")).as("tags")))
        .as("doc"))
    docs
      .withColumn("p_price", JsonPointer.get(col("doc"),
        "/meta/price_cents").cast("long"))
      .withColumn("p_esc", JsonPointer.get(col("doc"), "/a~1b"))
      .withColumn("p_tag1", JsonPointer.get(col("doc"), "/tags/1"))
      .withColumn("p_missing", JsonPointer.get(col("doc"), "/meta/none"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("p_price")).as("sum_price_cents"),
        sum(when(col("p_esc") === col("p_tag1"), 1L).otherwise(0L))
          .as("n_esc_eq_tag"),
        count(col("p_missing")).as("n_missing_resolved"))
      .orderBy(col("status"))
  }

  /** Schema-conformance validation against the corpus-inferred type
    * (reference DatabaseManager.java:514-534's getType generalized
    * from per-value inference to a corpus CONTRACT): per field, the
    * majority-inferred class becomes the declared type and every
    * differently-classed value is a violation — the dirty-ingest
    * audit the reference's per-row try/catch silently swallows. Two
    * synthesized drift fields guarantee a non-trivial census; ONE
    * grouped pass over the exploded field/value relation, then
    * integer arithmetic on the ≤|fields|×|classes| census frame
    * (majority by row_number over (n DESC, class) — tie-proof). */
  def engineSchemaValidate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = get_json_object(col("props"), "$.k")
    val nv = Tables.events(s, d)
      .select(col("event_id"), col("props"), col("ts"))
      .select(explode(array(
        struct(lit("k").as("name"), k.as("value")),
        struct(lit("mixed_id").as("name"),
          when(col("event_id") % 7 === 0, concat(lit("id-"), k))
            .otherwise(k).as("value")),
        struct(lit("note").as("name"),
          when(col("event_id") % 13 === 0, repeat(lit("x"), 130))
            .otherwise(lit("ok")).as("value")),
        struct(lit("event_time").as("name"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("value"))))
        .as("nv"))
      .select(col("nv.name").as("name"), col("nv.value").as("value"))
    val census = nv
      .groupBy(col("name"),
        graft.json.Shred.inferType(col("name"), col("value")).as("vclass"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("name"))
      .orderBy(col("n").desc, col("vclass"))
    census
      .withColumn("rn", row_number().over(w))
      .withColumn("n_rows", sum(col("n")).over(
        Window.partitionBy(col("name"))))
      .filter(col("rn") === 1)
      .select(col("name"), col("vclass").as("majority_class"),
        col("n_rows"), col("n").as("n_conform"),
        (col("n_rows") - col("n")).as("n_violations"),
        (floor(expr("CAST(n_rows - n AS DOUBLE) / n_rows") * 1e6 + 0.5)
          / 1e6).as("violation_rate"))
      .orderBy(col("name"))
  }

  /** Covering-index-only aggregation — the reference's SQLite
    * column-index story taken one step further: a
    * `(value, rowNum, include…)` covering index answers a
    * filter+aggregate over the indexed value WITHOUT touching the base
    * table at all (one narrow sorted scan, predicate pushed into the
    * row groups — vs engine_index_lookup's resolve-then-probe). The
    * query builds the index through the facade and serves the whole
    * readout from [[graft.Engine.coveringIndex]]; the oracle computes
    * the same aggregate from the raw source, so equality proves the
    * index carries the full answer. */
  def engineIndexCovering(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_cidx").toString
    val eng = new graft.Engine(s, wh)
    val docs = Tables.orders(s, d)
      .select(col("o_orderkey").as("rowNum"), col("o_custkey"),
        col("o_totalprice"))
    eng.save(docs, "ord")
    eng.buildCoveringIndex("ord", "o_custkey", Seq("o_totalprice"))
    eng.coveringIndex("ord", "o_custkey")
      .filter(col("v") % 97 === 0)
      .groupBy(col("v").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("custkey"))
  }

  /** Hive-partitioned warehouse layout through the facade: orders
    * saved partitioned by status, the status-filtered readout pruning
    * whole partition directories at the scan (PartitionFilters — no
    * non-matching file is even opened; Round14Spec pins the plan).
    * The reference's one-table-per-type instinct (java:175-201) done
    * the Spark way; the oracle aggregates the raw source, so equality
    * proves the partitioned layout serves the same truth. */
  def enginePartitionedSave(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_part").toString
    val eng = new graft.Engine(s, wh)
    val docs = Tables.orders(s, d)
      .select(col("o_orderkey").as("rowNum"), col("o_orderstatus"),
        col("o_totalprice"), col("o_custkey"))
    eng.savePartitioned(docs, "ord", Seq("o_orderstatus"))
    eng.table("ord")
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"),
        countDistinct(col("o_custkey")).as("n_customers"))
  }

  /** Optimistic-concurrency lost-update detection on the Engine's
    * staged swap — the distributed re-expression of the reference's
    * serialized writer queue (DatabaseManager.java:76-106): where the
    * reference makes racing writes IMPOSSIBLE by queueing them, this
    * engine makes the loser FAIL LOUDLY (dir-etag captured at read,
    * re-checked after the atomic moveaside rename; see
    * Engine.rewriteStaged). The query races two writers via the
    * beforeSwap seam: writer B reads and stages, writer A publishes
    * inside B's window, B's publish detects the displaced table is not
    * the one it read → rolls back (A's update survives intact) and
    * throws; B retries on a fresh read and lands on top. Output is the
    * conflict census + final-table aggregate; the oracle replays the
    * two updates sequentially (A then B) over the source parquet —
    * equality proves BOTH that the conflict fired exactly once AND
    * that no update was lost. */
  def engineConcurrentUpsert(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_cc").toString
    val engA = new graft.Engine(s, wh)
    val engB = new graft.Engine(s, wh)
    val docs = Tables.customer(s, d)
      .select(col("c_custkey").as("rowNum"), col("c_acctbal"))
    engB.save(docs, "cust")
    val updA = docs.filter(col("rowNum") % 5 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 100, 2))
    val updB = docs.filter(col("rowNum") % 7 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") - 50, 2))
    // arm writer A inside writer B's read→publish window, exactly once
    var fired = false
    engB.beforeSwap = _ => if (!fired) { fired = true
      engA.upsert("cust", updA) }
    val conflicts =
      try { engB.upsert("cust", updB); 0L }
      catch { case _: java.util.ConcurrentModificationException => 1L }
    engB.beforeSwap = _ => ()
    engB.upsert("cust", updB) // retry on a fresh read
    engB.table("cust")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")), 2).as("balance"))
      .select(lit(conflicts).as("n_conflicts"),
        lit(if (fired) 1L else 0L).as("racer_fired"),
        col("n_rows"), col("balance"))
  }

  /** 2-d array shred + re-assembly roundtrip — closes the reference's
    * own unshipped TODO (java:172: arrays-of-arrays have no child-table
    * path there): per-order integer matrices (one inner row per
    * lineitem, [quantity, partkey%100]) saved through the Engine shred
    * to the positional `(parentFK, pos, ipos, value)` cell table, then
    * re-nested by [[graft.Engine.nested]] and RE-EXTRACTED with a
    * double posexplode. The census groups by re-extracted (pos, ipos)
    * — equality with the oracle (which computes positions straight off
    * lineitem via row_number) proves both shred and re-assembly
    * preserved every cell AND both orderings. */
  def shredNestedArrays(s: SparkSession, d: String): DataFrame = {
    // the corpus carries duplicate (orderkey, linenumber) rows, so the
    // inner row is the per-linenumber rollup — [Σqty, min pk%100, n],
    // all order-free — and linenumber is unique per order, making the
    // matrix row order total (the q_scc tie-proof convention)
    val docs = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("rowNum"), col("l_linenumber"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("q"),
        min(pmod(col("l_partkey"), lit(100)).cast("long")).as("p"),
        count(lit(1)).as("c"))
      .select(col("rowNum"),
        struct(col("l_linenumber"),
          array(col("q"), col("p"), col("c")).as("cells")).as("_r"))
      .groupBy(col("rowNum"))
      .agg(expr("transform(array_sort(collect_list(_r)), x -> x.cells)")
        .as("matrix"))
    val wh = graft.util.Scratch.dir("graft_engine_mx").toString
    val eng = new graft.Engine(s, wh)
    eng.save(docs, "order_mx")
    val back = eng.nested("order_mx")
    back
      .select(col("rowNum"), posexplode(col("matrix")).as(Seq("pos", "_in")))
      .select(col("rowNum"), col("pos"),
        posexplode(col("_in")).as(Seq("ipos", "value")))
      .groupBy(col("pos").cast("long").as("pos"),
        col("ipos").cast("long").as("ipos"))
      .agg(count(lit(1)).as("n_cells"), sum(col("value")).as("sum_val"),
        min(col("rowNum")).as("min_doc"), max(col("rowNum")).as("max_doc"))
      .orderBy(col("pos"), col("ipos"))
  }

  /** Atomic table RENAME through the facade (ALTER TABLE RENAME, the
    * metadata verb the reference gets from SQLite): the commit marker
    * carries the `ren` pledge plus the renamed manifest in ONE rename,
    * so a concurrent reader of the NEW name already resolves the old
    * data dir in the window before the dir move lands — probed here
    * through the afterPublish seam with a second engine instance. The
    * oracle replays the census from the raw source; equality proves
    * the renamed table serves the same truth at the committed instant
    * AND after the move. */
  def engineRename(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_ren").toString
    val eng = new graft.Engine(s, wh)
    val reader = new graft.Engine(s, wh)
    val docs = Tables.orders(s, d)
      .select(col("o_orderkey").as("rowNum"), col("o_orderstatus"),
        col("o_totalprice"))
    eng.save(docs, "ord_v1")
    def readout(): (Long, Long) = {
      val r = reader.sql("""SELECT count(*) AS n,
          sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM ord_live""").collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var mid: (Long, Long) = null
    eng.afterPublish = _ => if (mid == null) mid = readout()
    eng.renameTable("ord_v1", "ord_live")
    eng.afterPublish = _ => ()
    val fin = readout()
    // RELATION-WOVEN rename (r15 verdict order #6): a shredded
    // parent/child tree renames on BOTH levels through manifest-level
    // FK indirection — the in-data FK column keeps its shred-time
    // name ("nation_doc"), exactly SQLite's ALTER TABLE semantics
    val members = Tables.customer(s, d)
      .select(col("c_nationkey"),
        struct(col("c_custkey").as("rowNum"), col("c_acctbal")).as("c"))
      .groupBy(col("c_nationkey"))
      .agg(sort_array(collect_list(col("c"))).as("members"))
    val tree = Tables.nation(s, d)
      .join(members, col("n_nationkey") === col("c_nationkey"))
      .select(col("n_nationkey").as("rowNum"), col("n_name"),
        col("members"))
    eng.save(tree, "nation_doc")
    eng.renameTable("nation_doc", "nation_live")
    eng.renameTable("members", "roster")
    val w = reader.sql("""SELECT count(*) AS n,
        sum(CAST(round(m.c_acctbal * 100, 0) AS BIGINT)) AS cents
      FROM roster m JOIN nation_live nd ON m.nation_doc = nd.rowNum""")
      .collect()(0)
    s.range(1).select(
      lit(mid._1).as("mid_rows"), lit(mid._2).as("mid_cents"),
      lit(fin._1).as("final_rows"), lit(fin._2).as("final_cents"),
      lit(w.getLong(0)).as("woven_rows"),
      lit(w.getLong(1)).as("woven_cents"))
  }

  /** Atomic multi-table RE-save (r14 verdict orders #1/#6): one shred
    * writes a parent table AND a child table, and a reader must never
    * join a new parent against old children mid-save. The save
    * publishes through staged dirs + ONE commit-marker rename (see
    * graft.Engine's durability contract); this query probes the two
    * critical instants through the Engine's seams with a SECOND engine
    * instance as the concurrent reader:
    *
    *  - `beforeMark` (every staged dir written, marker not yet
    *    renamed): the readout must still be the v1 truth —
    *    old-EVERYTHING (`pre_bal` sums the original balances, `pre_rev`
    *    the v1 revision tag via the parent join);
    *  - `afterPublish` of the FIRST table (marker live, child table
    *    already swapped, parent still pending): the readout must
    *    already be the v2 truth — new-EVERYTHING (`mid_bal` sums the
    *    bumped balances AND `mid_rev` reads the new parent revision
    *    through the same join — a torn new-child/old-parent mix would
    *    split them).
    *
    * The oracle replays both truths straight off the source parquet,
    * so equality certifies the commit point end to end: before the
    * marker rename nothing changed, after it everything did. */
  def engineAtomicSave(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_at").toString
    val eng = new graft.Engine(s, wh)
    val reader = new graft.Engine(s, wh)
    def docs(rev: Int) = {
      val members = Tables.customer(s, d)
        .select(col("c_nationkey"),
          struct(col("c_custkey").as("rowNum"),
            round(col("c_acctbal") + rev * 10, 2).as("c_acctbal"))
            .as("c"))
        .groupBy(col("c_nationkey"))
        .agg(sort_array(collect_list(col("c"))).as("members"))
      Tables.nation(s, d)
        .join(members, col("n_nationkey") === col("c_nationkey"))
        .select(col("n_nationkey").as("rowNum"), col("n_name"),
          lit(rev.toLong).as("doc_rev"), col("members"))
    }
    // balances fold as exact cents (order-free long sums — float sums
    // are not cross-engine portable under downstream comparison)
    def readout(): (Long, Long, Long) = {
      val r = reader.sql("""SELECT count(*) AS n,
          sum(CAST(round(m.c_acctbal * 100, 0) AS BIGINT)) AS bal_cents,
          sum(nd.doc_rev) AS rev
        FROM members m JOIN nation_doc nd ON m.nation_doc = nd.rowNum""")
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    eng.save(docs(0), "nation_doc")
    var pre: (Long, Long, Long) = null
    var mid: (Long, Long, Long) = null
    eng.beforeMark = () => if (pre == null) pre = readout()
    eng.afterPublish = _ => if (mid == null) mid = readout()
    eng.save(docs(1), "nation_doc") // atomic re-save of BOTH tables
    eng.beforeMark = () => (); eng.afterPublish = _ => ()
    val fin = readout()
    s.range(1).select(
      lit(pre._1).as("n_members"),
      lit(pre._2).as("pre_cents"), lit(pre._3).as("pre_rev"),
      lit(mid._2).as("mid_cents"), lit(mid._3).as("mid_rev"),
      lit(fin._2).as("final_cents"), lit(fin._3).as("final_rev"))
  }

  /** OPTIMIZE (small-file compaction) through the facade: orders
    * save as 8 deliberate small parts, `optimize(…, 2)` compacts to
    * 2 through the crash-safe staged swap, and the readout proves
    * layout-only semantics — the census (count + exact cents) is
    * bit-for-bit unchanged while the file count drops. Oracle
    * replays the census from the raw source with the file counts as
    * pinned expectations. */
  def engineOptimize(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_opt").toString
    val eng = new graft.Engine(s, wh)
    val docs = Tables.orders(s, d)
      .select(col("o_orderkey").as("rowNum"), col("o_totalprice"))
      .repartition(8)
    eng.save(docs, "ord_opt")
    val (before, after) = eng.optimize("ord_opt", 2)
    val t = eng.table("ord_opt")
    t.agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
          .as("cents"))
      .select(col("n_rows"), col("cents"),
        lit(before.toLong).as("files_before"),
        lit(after.toLong).as("files_after"))
  }

  /** Save-time CHECK constraint through the facade (the reference's
    * SQLite CHECK clause): orders save under
    * `o_totalprice < 400000 AND o_orderstatus IN ('O','F','P')`;
    * violating rows land in the quarantine table `ord_chk__rejects`
    * through the SAME one-marker atomic commit (old-everything /
    * new-everything holds across the pair). The readout censuses both
    * tables — counts and exact cents — and proves conservation
    * (accepted + rejected = source); the oracle replays the split
    * from the raw source. */
  def engineCheckConstraint(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_chk").toString
    val eng = new graft.Engine(s, wh)
    val docs = Tables.orders(s, d)
      .select(col("o_orderkey").as("rowNum"), col("o_orderstatus"),
        col("o_totalprice"))
    eng.saveChecked(docs, "ord_chk",
      "o_totalprice < 400000 AND o_orderstatus IN ('O', 'F', 'P')")
    val r = eng.sql("""SELECT
        (SELECT count(*) FROM ord_chk) AS n_ok,
        (SELECT coalesce(sum(CAST(round(o_totalprice * 100, 0)
           AS BIGINT)), 0) FROM ord_chk) AS ok_cents,
        (SELECT count(*) FROM ord_chk__rejects) AS n_rejected,
        (SELECT coalesce(sum(CAST(round(o_totalprice * 100, 0)
           AS BIGINT)), 0) FROM ord_chk__rejects) AS rej_cents""")
      .collect()(0)
    s.range(1).select(
      lit(r.getLong(0)).as("n_ok"), lit(r.getLong(1)).as("ok_cents"),
      lit(r.getLong(2)).as("n_rejected"),
      lit(r.getLong(3)).as("rej_cents"))
  }

  /** ALTER-COLUMN verbs through the facade (r15 verdict order #4;
    * reference: SQLite's ALTER TABLE RENAME/DROP COLUMN — parquet
    * columns are physical, so each verb is a staged projection
    * rewrite riding the same crash-safe two-rename swap as upsert).
    * Saves orders, builds a plain index on o_orderstatus AND a
    * covering index on it that INCLUDEs o_totalprice, then RENAMEs
    * o_totalprice→price and DROPs o_orderpriority. The readout pins:
    * the post-alter schema, the census over the renamed column
    * (exact cents — the data survived the projection bit-for-bit),
    * a point count served THROUGH the surviving status index, and
    * the invalidation flags — the covering index carried the renamed
    * column so it must be GONE; the plain status index never touched
    * the column so it must survive. Oracle replays the census from
    * the raw source. */
  def engineAlterColumn(s: SparkSession, d: String): DataFrame = {
    val wh = graft.util.Scratch.dir("graft_engine_alt").toString
    val eng = new graft.Engine(s, wh)
    val docs = Tables.orders(s, d)
      .select(col("o_orderkey").as("rowNum"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
    eng.save(docs, "ord_alt")
    eng.buildIndex("ord_alt", "o_orderstatus")
    eng.buildCoveringIndex("ord_alt", "o_orderstatus",
      Seq("o_totalprice"))
    eng.renameColumn("ord_alt", "o_totalprice", "price")
    eng.dropColumn("ord_alt", "o_orderpriority")
    val idxAlive =
      new java.io.File(s"$wh/ord_alt__idx_o_orderstatus").exists
    val cidxAlive =
      new java.io.File(s"$wh/ord_alt__cidx_o_orderstatus").exists
    val fRows = eng.lookupByIndex("ord_alt", "o_orderstatus", "F")
      .count()
    val t = eng.table("ord_alt")
    val schemaCols = t.columns.sorted.mkString(",")
    t.agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(price * 100, 0) AS BIGINT)"))
          .as("price_cents"))
      .select(lit(schemaCols).as("schema_cols"), col("n_rows"),
        col("price_cents"),
        lit(if (idxAlive) 1L else 0L).as("idx_alive"),
        lit(if (cidxAlive) 1L else 0L).as("cidx_alive"),
        lit(fRows).as("f_rows"))
  }
}
