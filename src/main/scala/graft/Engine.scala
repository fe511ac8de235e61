package graft

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.json.{Assemble, Shred}
import graft.json.Shred.{ChildArray, ChildArray2, ChildObject, Rel}

/** The user-facing facade mirroring the reference's API surface:
  *
  *  - `save(docs, table)` ≙ `saveIntoDatabase(conn, table, json)`
  *    (DatabaseManager.java:118) — but bulk: a whole DataFrame of
  *    parsed JSON documents is normalized into relational tables and
  *    written to the warehouse in one pass.
  *  - `getJson(table, key)` ≙ `getFromDatabaseJson(conn, table,
  *    rowNum, callback)` (java:253) — point lookup re-assembled
  *    recursively into a nested JSON string (child objects and child
  *    arrays at any depth, like the reference's recursive
  *    getObjectFromResultSet). Key filters push down to the scan.
  *  - `upsert(table, updates)` ≙ UPDATE-by-rowNum / INSERT
  *    (java:211-229) as a staged compaction.
  *  - `sql(...)` — the analytic surface over every saved table.
  *  - `versions` / `tableAt` — bounded time travel: each staged swap
  *    archives the superseded contents as `<table>@v<N>` (a rename,
  *    not a copy), retaining the last `retainVersions` snapshots.
  *
  * The reference serializes every operation through one SQLite
  * connection (java:76-106); here the "connection" is the cluster and
  * writes are partitioned parquet. Every saved table plus the
  * parent→child relations land in a manifest so re-assembly needs no
  * catalog server.
  *
  * All warehouse I/O goes through the Hadoop `FileSystem` API resolved
  * from the warehouse URI, so the same code runs against `file:`,
  * `hdfs:` or `s3a:` paths — java.nio would silently bind the manifest
  * and the upsert swap to the driver's local disk.
  */
class Engine(spark: SparkSession, warehouse: String,
    retainVersions: Int = 2) {

  private def dir(table: String) = s"$warehouse/$table"
  private val manifestPath = new Path(s"$warehouse/_graft_manifest.txt")
  private def fs: FileSystem =
    manifestPath.getFileSystem(spark.sessionState.newHadoopConf())

  /** Manifest = one line per fact: `tbl|name` for every saved table,
    * `obj|parent|child` / `arr|parent|child` for relations. */
  private def readManifest(): (Seq[String], Seq[Rel]) = {
    val f = fs
    if (!f.exists(manifestPath)) return (Seq.empty, Seq.empty)
    val in = f.open(manifestPath)
    val text =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val tables = lines.collect { case s if s.startsWith("tbl|") =>
      s.stripPrefix("tbl|") }
    val rels = lines.filterNot(_.startsWith("tbl|")).map { line =>
      line.split("\\|") match {
        case Array("obj", p, c) => ChildObject(p, c)
        case Array("arr", p, c) => ChildArray(p, c)
        case Array("ar2", p, c) => ChildArray2(p, c)
        case other => throw new IllegalStateException(
          s"bad manifest line: ${other.mkString("|")}")
      }
    }
    (tables, rels)
  }

  private def writeManifest(tables: Seq[String], rels: Seq[Rel]): Unit = {
    val lines = tables.distinct.sorted.map(t => s"tbl|$t") ++
      rels.distinct.map {
        case ChildObject(p, c) => s"obj|$p|$c"
        case ChildArray(p, c) => s"arr|$p|$c"
        case ChildArray2(p, c) => s"ar2|$p|$c"
      }
    val out = fs.create(manifestPath, true)
    try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Normalize parsed JSON documents into relational tables and write
    * them to the warehouse. Returns the tables written. */
  def save(docs: DataFrame, table: String, key: String = "rowNum"): Seq[String] = {
    val (tables, rels) = Shred.normalizeWithRelations(docs, table, key)
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(dir(name))
    }
    val (prevTables, prevRels) = readManifest()
    // every written table is recorded — a flat document with no child
    // relations must still be visible to sql()
    writeManifest(prevTables ++ tables.keys, (prevRels ++ rels).distinct)
    tables.keys.toSeq.sorted
  }

  /** [[save]] with the ROOT table hive-partitioned on `partCols` —
    * the warehouse-native layout for predicate-heavy access: a filter
    * on a partition column prunes whole directories at the scan
    * (PartitionFilters, no file even opened), the reference's
    * table-per-type instinct done the Spark way. Child tables shred
    * exactly as [[save]]. */
  def savePartitioned(docs: DataFrame, table: String,
      partCols: Seq[String], key: String = "rowNum"): Seq[String] = {
    val (tables, rels) = Shred.normalizeWithRelations(docs, table, key)
    tables.foreach { case (name, df) =>
      if (name == table)
        df.write.mode(SaveMode.Overwrite).partitionBy(partCols: _*)
          .parquet(dir(name))
      else df.write.mode(SaveMode.Overwrite).parquet(dir(name))
    }
    val (prevTables, prevRels) = readManifest()
    writeManifest(prevTables ++ tables.keys, (prevRels ++ rels).distinct)
    tables.keys.toSeq.sorted
  }

  /** Load a stored table. A reader that lands inside a staged-swap
    * window (live renamed to `__old`, staged not yet published) falls
    * back to `__old` — concurrent readers see the previous or the new
    * version of the table, never a vanished one. The fallback re-checks
    * live last so a swap completing mid-call still resolves. */
  def table(name: String): DataFrame = {
    val f = fs
    if (!f.exists(new Path(dir(name))) &&
        f.exists(new Path(dir(name) + "__old")) &&
        !f.exists(new Path(dir(name))))
      spark.read.parquet(dir(name) + "__old")
    else spark.read.parquet(dir(name))
  }

  /** Register every manifest table as a temp view and run SQL. */
  def sql(query: String): DataFrame = {
    val (tables, rels) = readManifest()
    val names =
      (tables ++ rels.map(_.parent) ++ rels.map(_.child)).distinct
    names.foreach(t => table(t).createOrReplaceTempView(t))
    spark.sql(query)
  }

  /** Recursively re-nest `base` rows of `tableName`: child arrays come
    * back as array<struct>, child objects as struct — to any depth
    * (visited-set guarded against cyclic manifests). */
  private def assemble(tableName: String, base: DataFrame, key: String,
      rels: Seq[Rel], visited: Set[String]): DataFrame =
    rels.filter(r => r.parent == tableName && !visited.contains(r.child))
      .foldLeft(base) { (df, rel) =>
        val childFull = assemble(rel.child, table(rel.child), key, rels,
          visited + tableName)
        rel match {
          case ChildArray(_, c) =>
            Assemble.nestArray(df, key, childFull, tableName, c,
              orderCols = Seq(key))
          case ChildObject(_, c) =>
            val childStruct = childFull.select(col(key).as("_ck"),
              struct(childFull.columns.map(col): _*).as("_cs"))
            df.join(childStruct, col(c) === col("_ck"), "left")
              .drop("_ck").drop(c).withColumnRenamed("_cs", c)
          case ChildArray2(p, c) =>
            // positional 2-d re-nest: inner arrays rebuilt by ipos,
            // outer by pos — (pos, ipos) is unique per parent, so the
            // struct sort is total and the roundtrip is exact
            val nested2 = childFull
              .groupBy(col(p), col("pos"))
              .agg(expr("transform(array_sort(collect_list(" +
                "struct(ipos, value))), x -> x.value)").as("_ia"))
              .groupBy(col(p))
              .agg(expr("transform(array_sort(collect_list(" +
                "struct(pos, _ia))), x -> x._ia)").as("_oa"))
            df.join(nested2.select(col(p).as("_ck"), col("_oa")),
                col(key) === col("_ck"), "left")
              .drop("_ck").withColumnRenamed("_oa", c)
        }
      }

  /** Bulk re-assembly of a stored table to its nested document form —
    * [[getJson]]'s recursive re-nest without the per-document collect,
    * so the whole corpus re-nests as one distributed plan. */
  def nested(tableName: String, key: String = "rowNum"): DataFrame =
    assemble(tableName, table(tableName), key, readManifest()._2,
      Set.empty)

  /** Point lookup re-assembled to one nested JSON document. */
  def getJson(tableName: String, keyValue: Long,
      key: String = "rowNum"): Option[String] = {
    val base = table(tableName).filter(col(key) === keyValue)
    val nested = assemble(tableName, base, key, readManifest()._2, Set.empty)
    nested
      .select(to_json(struct(nested.columns.map(col): _*)).as("doc"))
      .collect().headOption.map(_.getString(0))
  }

  /** Retained version numbers of a table, oldest first. Every
    * successful staged swap archives the previous table contents as
    * `<table>@v<N>` instead of deleting them — bounded time travel
    * over the last `retainVersions` mutations. A version costs one
    * RENAME of parquet the swap already wrote, never a copy, so
    * retention is free at any scale; pruning is O(retained dirs). */
  def versions(tableName: String): Seq[Int] = {
    val f = fs
    val parent = new Path(warehouse)
    if (!f.exists(parent)) return Seq.empty
    val prefix = tableName + "@v"
    f.listStatus(parent).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toInt).toOption)
      .sorted
  }

  /** Read a retained snapshot (`versions` lists what is available). */
  def tableAt(tableName: String, version: Int): DataFrame =
    spark.read.parquet(dir(tableName) + "@v" + version)

  /** Archive a superseded table dir as the next retained version and
    * prune beyond the retention window. History is best-effort: if the
    * rename fails the dir is dropped — correctness (the live table)
    * never depends on the archive succeeding. */
  private def archiveOld(f: FileSystem, tableName: String,
      old: Path): Unit = {
    val next = versions(tableName).lastOption.getOrElse(-1) + 1
    if (!f.rename(old, new Path(dir(tableName) + "@v" + next)))
      f.delete(old, true)
    versions(tableName).dropRight(retainVersions).foreach(v =>
      f.delete(new Path(dir(tableName) + "@v" + v), true))
  }

  /** Reclaim storage: drop every retained snapshot plus stale
    * `__staged` leftovers, and a stale `__old` ONLY when the live dir
    * exists (an `__old` without live is the sole surviving copy after
    * a mid-swap crash — vacuum must never destroy it; the next
    * mutation restores it). Returns the number of directories
    * removed. */
  def vacuum(tableName: String): Int = {
    val f = fs
    val candidates =
      versions(tableName).map(v => new Path(dir(tableName) + "@v" + v)) ++
        Seq(new Path(dir(tableName) + "__staged")) ++
        (if (f.exists(new Path(dir(tableName))))
          Seq(new Path(dir(tableName) + "__old"))
        else Seq.empty)
    candidates.count(p => f.exists(p) && f.delete(p, true))
  }

  /** Keyed merge into a stored table (reference: UPDATE-by-rowNum /
    * INSERT, java:211-229): update rows replace, new keys append.
    * Read-merge-write into a staging dir, then swap — you cannot
    * overwrite the parquet you are lazily reading, and a driver-side
    * collect would not scale. This is the classic compaction pattern
    * (a table format with native MERGE replaces it at 100 TB).
    *
    * Crash-safe against its own leftovers: an interruption leaves
    * either the old or the new table in place, never neither — if a
    * crash hit between the two renames (live moved to `__old`, staged
    * not yet published), the next upsert first restores `__old` to
    * live; only then are stale `__staged`/`__old` dirs redundant and
    * cleared. */
  def upsert(tableName: String, updates: DataFrame,
      key: String = "rowNum"): Unit =
    rewriteStaged(tableName, "upsert") { base =>
      ops.Upsert(base, updates, Seq(key))
    }

  /** Keyed delete: drop the given keys from a stored table. Same staged
    * rewrite-and-swap as `upsert` (deletion from immutable parquet is a
    * compaction), with the small key set broadcast into an anti-join so
    * the base table never shuffles. */
  def delete(tableName: String, keys: DataFrame,
      key: String = "rowNum"): Unit =
    rewriteStaged(tableName, "delete") { base =>
      base.join(broadcast(keys.select(col(key))), Seq(key), "left_anti")
    }

  /** Contract/test seam: invoked after the staged contents are fully
    * written, immediately before the moveaside rename — the window in
    * which a CONCURRENT writer's publish must be detected by the etag
    * re-check below. Engine-instance-scoped, defaults to a no-op. */
  private[graft] var beforeSwap: String => Unit = _ => ()

  /** Version fingerprint of a table dir: the sorted (name, length)
    * census of its files. Spark writes parquet parts under fresh UUID
    * names, so two different publishes of the same table can never
    * collide — the listing is an etag. */
  private def dirTag(f: FileSystem, p: Path): String =
    f.listStatus(p).map(st => s"${st.getPath.getName}:${st.getLen}")
      .sorted.mkString(",")

  /** Shared staged-swap skeleton: compute the replacement contents from
    * the live table, publish by rename, recover crash leftovers first.
    * A crash between rename(live→old) and rename(staged→live) leaves
    * `__old` as the ONLY copy of the table — deleting it then would
    * destroy the table. Restore it before clearing leftovers; only then
    * are both leftover dirs redundant copies, safe to drop.
    *
    * OPTIMISTIC CONCURRENCY (the reference's writer story is a single
    * serialized connection queue, java:76-106; a distributed engine
    * cannot serialize, so the swap detects lost updates instead): the
    * live dir's file-listing etag is captured at read time and
    * re-checked AFTER the moveaside rename. The rename is the atomic
    * arbiter — once live is moved aside no other writer can publish —
    * so etag-check-then-publish is race-free: if the displaced table is
    * not the one this rewrite read, a concurrent writer published in
    * between, and publishing our staged contents would silently discard
    * their update. The loser rolls the table back and throws
    * ConcurrentModificationException; a retry re-reads and wins. */
  private def rewriteStaged(tableName: String, op: String)(
      rewrite: DataFrame => DataFrame): Unit = {
    val f = fs
    val live = new Path(dir(tableName))
    val staged = new Path(dir(tableName) + "__staged")
    val old = new Path(dir(tableName) + "__old")
    if (!f.exists(live) && !f.exists(old))
      throw new IllegalArgumentException(
        s"$op: table '$tableName' does not exist in warehouse $warehouse")
    if (!f.exists(live) && f.exists(old) && !f.rename(old, live))
      throw new IllegalStateException(
        s"$op: cannot restore $old to $live after interrupted swap")
    f.delete(staged, true)
    // a stale __old beside a live table is a crash leftover holding the
    // pre-crash previous contents — archive it (best-effort history)
    // rather than discard it
    if (f.exists(live) && f.exists(old)) archiveOld(f, tableName, old)
    val readTag = dirTag(f, live)
    rewrite(table(tableName))
      .write.mode(SaveMode.Overwrite).parquet(staged.toString)
    beforeSwap(tableName)
    if (!f.rename(live, old))
      throw new IllegalStateException(s"$op: cannot move $live aside")
    if (dirTag(f, old) != readTag) {
      // lost-update prevention: the table we displaced is not the one
      // this rewrite read — restore it and fail loudly
      f.delete(staged, true)
      if (!f.rename(old, live))
        throw new IllegalStateException(
          s"$op: cannot restore $live after conflict")
      throw new java.util.ConcurrentModificationException(
        s"$op on '$tableName': table changed since read " +
          "(lost update prevented) — retry on a fresh read")
    }
    if (!f.rename(staged, live)) {
      f.rename(old, live) // roll back — keep the table queryable
      throw new IllegalStateException(s"$op: cannot publish $staged")
    }
    archiveOld(f, tableName, old)
  }

  /** Secondary index on a stored table: a sorted two-column
    * (value, rowNum) projection written range-partitioned on the
    * value, so a point lookup prunes to one range partition and,
    * within it, to the row groups whose min/max straddle the value —
    * the parquet-native analogue of the reference's SQLite column
    * index. Rebuild after upsert/delete (the reference recreates its
    * schema-dependent structures the same way). Returns the index
    * table name. */
  def buildIndex(tableName: String, column: String): String = {
    val name = s"${tableName}__idx_$column"
    table(tableName).select(col(column).as("v"), col("rowNum"))
      .repartitionByRange(4, col("v"))
      .sortWithinPartitions(col("v"))
      .write.mode(SaveMode.Overwrite).parquet(dir(name))
    name
  }

  /** Covering secondary index: a `(v, rowNum, <include…>)` projection
    * range-partitioned and sorted on the value — the SQLite
    * covering-index trick re-expressed as a narrow sorted parquet
    * projection: a point or aggregate query over the indexed value
    * plus the included columns is served INDEX-ONLY, the base table
    * untouched (one narrow scan with the predicate pushed into the
    * sorted row groups, vs [[buildIndex]]'s resolve-then-probe). */
  def buildCoveringIndex(tableName: String, column: String,
      include: Seq[String]): String = {
    val name = s"${tableName}__cidx_$column"
    table(tableName)
      .select((col(column).as("v") +: col("rowNum") +:
        include.map(col)): _*)
      .repartitionByRange(4, col("v"))
      .sortWithinPartitions(col("v"))
      .write.mode(SaveMode.Overwrite).parquet(dir(name))
    name
  }

  /** The covering index as a frame — every query that only needs the
    * indexed value + included columns runs here, index-only. */
  def coveringIndex(tableName: String, column: String): DataFrame =
    spark.read.parquet(dir(s"${tableName}__cidx_$column"))

  /** Point lookup through a [[buildIndex]] index: the index scan
    * resolves the matching rowNums (narrow two-column read, value
    * predicate pushed to the sorted parquet), then a broadcast semi
    * join fetches exactly those base rows — the base table is probed
    * by its key, never scanned for the value. */
  def lookupByIndex(tableName: String, column: String,
      value: Any): DataFrame = {
    val keys = spark.read.parquet(dir(s"${tableName}__idx_$column"))
      .filter(col("v") === lit(value)).select(col("rowNum"))
    table(tableName).join(broadcast(keys), Seq("rowNum"), "left_semi")
  }
}
