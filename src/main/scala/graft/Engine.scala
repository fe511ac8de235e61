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
  * DURABILITY CONTRACT (save-side completion of the reference's
  * serialized-writer semantics): EVERY write verb — save,
  * savePartitioned, upsert, delete — publishes through staged dirs and
  * renames, never an in-place overwrite of a live table. A crash at
  * any instant leaves each table fully old or fully new, never torn or
  * vanished. A multi-table save additionally commits through ONE
  * atomic commit-marker rename: the marker carries both the swap list
  * and the new manifest, so `sql()` readers resolve old-EVERYTHING
  * before the marker lands and new-EVERYTHING after (listed tables
  * read from their staged dir until their publish rename completes) —
  * a reader never joins a new parent against old children mid-save.
  * The manifest itself is versioned write-once (`_graft_manifest.v<N>`,
  * published by rename) so no reader can observe a half-truncated
  * manifest. Recovery is roll-FORWARD: a surviving marker means the
  * commit happened; the next engine operation completes the pending
  * renames idempotently. (A reader that resolved the marker in the
  * instant before it landed can still race individual publish renames
  * — the per-table `__old` fallback covers that window; an external
  * table format with a manifest service closes it completely at
  * 100 TB, and this layout maps 1:1 onto one.)
  *
  * All warehouse I/O goes through the Hadoop `FileSystem` API resolved
  * from the warehouse URI, so the same code runs against `file:`,
  * `hdfs:` or `s3a:` paths — java.nio would silently bind the manifest
  * and the upsert swap to the driver's local disk.
  */
class Engine(spark: SparkSession, warehouse: String,
    retainVersions: Int = 2) {

  private def dir(table: String) = s"$warehouse/$table"
  private val legacyManifestPath =
    new Path(s"$warehouse/_graft_manifest.txt")
  private val markerPath = new Path(s"$warehouse/_graft_commit.txt")
  private def fs: FileSystem =
    markerPath.getFileSystem(spark.sessionState.newHadoopConf())

  private def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Manifest = one line per fact: `tbl|name` for every saved table,
    * `obj|parent|child` / `arr|parent|child` / `ar2|parent|child` for
    * relations. Stored as write-once versioned files
    * `_graft_manifest.v<N>.txt` published by rename (newest N wins), so
    * a reader can never observe a truncated in-place rewrite; a live
    * commit marker supersedes both (it IS the newest manifest from the
    * instant its rename landed). */
  private def manifestVersionNums(f: FileSystem): Seq[Int] = {
    val parent = new Path(warehouse)
    if (!f.exists(parent)) return Seq.empty
    f.listStatus(parent).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("_graft_manifest.v") && n.endsWith(".txt"))
      .flatMap(n => scala.util.Try(n.stripPrefix("_graft_manifest.v")
        .stripSuffix(".txt").toInt).toOption)
      .sorted
  }

  private def manifestVersionPath(v: Int): Path =
    new Path(s"$warehouse/_graft_manifest.v$v.txt")

  private def currentManifestLines(f: FileSystem): Seq[String] = {
    val text =
      if (f.exists(markerPath)) readSmall(f, markerPath)
      else manifestVersionNums(f).lastOption match {
        case Some(v) => readSmall(f, manifestVersionPath(v))
        case None if f.exists(legacyManifestPath) =>
          readSmall(f, legacyManifestPath) // pre-versioned warehouse
        case None => ""
      }
    text.split("\n").toSeq.filter(_.nonEmpty)
      .filterNot(l => l.startsWith("swap|") || l.startsWith("ren|"))
  }

  /** `fkn|name|shredName` lines are the FK INDIRECTION a table RENAME
    * of a relation-woven table rides on: the shredded DATA's FK column
    * names are fixed at shred time (a child carries a column literally
    * named after its parent, a parent's object pointer after its
    * child), and a rename is a metadata verb that must not rewrite
    * data — so the manifest records, per renamed table, its shred-time
    * name, and every consumer of a relation resolves the in-data FK
    * column through [[fkOf]] instead of assuming it equals the table's
    * current name (the same semantics as SQLite, where renaming a
    * table does not rename FK columns elsewhere). */
  private def parseManifest(
      lines: Seq[String]): (Seq[String], Seq[Rel], Map[String, String]) = {
    val tables = lines.collect { case s if s.startsWith("tbl|") =>
      s.stripPrefix("tbl|") }
    val fkNames = lines.filter(_.startsWith("fkn|")).map(_.split("\\|"))
      .collect { case Array(_, name, shredName) => name -> shredName }
      .toMap
    val rels = lines
      .filterNot(l => l.startsWith("tbl|") || l.startsWith("fkn|"))
      .map { line =>
        line.split("\\|") match {
          case Array("obj", p, c) => ChildObject(p, c)
          case Array("arr", p, c) => ChildArray(p, c)
          case Array("ar2", p, c) => ChildArray2(p, c)
          case other => throw new IllegalStateException(
            s"bad manifest line: ${other.mkString("|")}")
        }
      }
    (tables, rels, fkNames)
  }

  private def readManifest(): (Seq[String], Seq[Rel], Map[String, String]) =
    parseManifest(currentManifestLines(fs))

  /** In-data FK column name for a table: its shred-time name (current
    * name unless the table was renamed). */
  private def fkOf(fkNames: Map[String, String], name: String): String =
    fkNames.getOrElse(name, name)

  private def renderManifest(tables: Seq[String], rels: Seq[Rel],
      fkNames: Map[String, String]): Seq[String] =
    tables.distinct.sorted.map(t => s"tbl|$t") ++
      rels.distinct.map {
        case ChildObject(p, c) => s"obj|$p|$c"
        case ChildArray(p, c) => s"arr|$p|$c"
        case ChildArray2(p, c) => s"ar2|$p|$c"
      } ++
      fkNames.toSeq.sorted.map { case (n, s) => s"fkn|$n|$s" }

  /** Publish manifest `lines` as the next write-once version: write a
    * temp file, rename onto `_graft_manifest.v<N+1>.txt` (rename to a
    * fresh name is the atomic publish; a failed rename means a
    * concurrent writer took that version — take the next). Prunes
    * versions beyond the retention window and the superseded legacy
    * file. */
  private def writeVersionedManifest(f: FileSystem,
      lines: Seq[String]): Unit = {
    val tmp = new Path(
      s"$warehouse/_graft_manifest.tmp${System.nanoTime()}")
    val out = f.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    var v = manifestVersionNums(f).lastOption.getOrElse(-1) + 1
    var attempts = 0
    while (!f.rename(tmp, manifestVersionPath(v))) {
      attempts += 1
      if (attempts > 100 || !f.exists(manifestVersionPath(v)))
        throw new IllegalStateException(
          s"cannot publish manifest version $v")
      v += 1 // a concurrent writer took v — publish as the next one
    }
    val vs = manifestVersionNums(f)
    vs.dropRight(retainVersions + 1)
      .foreach(o => f.delete(manifestVersionPath(o), false))
    if (f.exists(legacyManifestPath)) f.delete(legacyManifestPath, false)
  }

  /** Tables a live commit marker has pledged to swap, mapped to the
    * pledging commit id (empty when no commit is in flight). The cid
    * FENCES every marker-driven rename: a recovering writer can only
    * ever touch `__staged_<cid>` dirs the marker itself pledged — a
    * concurrent save's freshly-staged dirs (different cid) are
    * untouchable, so a resumed writer can never publish another
    * writer's half-written staging. */
  private def markerSwaps(f: FileSystem): Map[String, String] =
    if (!f.exists(markerPath)) Map.empty
    else readSmall(f, markerPath).split("\n").toSeq
      .filter(_.startsWith("swap|"))
      .map(_.split("\\|"))
      .collect { case Array(_, name, cid) => name -> cid }
      .toMap

  /** Roll FORWARD a commit whose marker survives: the marker rename
    * was the commit point, so the pledged state IS the truth — finish
    * its pending per-table publishes (idempotent — a table whose
    * staged dir is gone is already live), version the manifest it
    * carries, and clear it. Runs at the head of every mutator, so a
    * crashed commit's leftovers can never be misread as stale and a
    * SECOND save entering mid-commit first completes the in-flight one
    * (concurrent saves serialize by helping — the distributed
    * re-expression of the reference's serialized writer queue,
    * java:76-106; rename races between the owner and a helper surface
    * as a loud retryable CME in one of them, never as torn data). */
  private def recoverCommit(f: FileSystem): Unit = {
    if (!f.exists(markerPath)) return
    val lines = readSmall(f, markerPath).split("\n").toSeq
      .filter(_.nonEmpty)
    val swaps = lines.filter(_.startsWith("swap|")).map(_.split("\\|"))
      .collect { case Array(_, name, cid) => (name, cid) }
    try swaps.foreach { case (name, cid) => publishStaged(f, name, cid) }
    catch { case e: IllegalStateException =>
      // a rename lost to the commit's still-live owner — the owner
      // finishes its own commit; this writer retries
      throw new java.util.ConcurrentModificationException(
        s"commit in flight (owner racing recovery): ${e.getMessage}")
    }
    // complete a pledged table rename whose data-dir move is pending
    lines.filter(_.startsWith("ren|")).map(_.split("\\|"))
      .collect { case Array(_, o, n) => (o, n) }
      .foreach { case (o, n) =>
        if (f.exists(new Path(dir(o))) && !f.exists(new Path(dir(n))))
          f.rename(new Path(dir(o)), new Path(dir(n)))
      }
    writeVersionedManifest(f,
      lines.filterNot(l => l.startsWith("swap|") || l.startsWith("ren|")))
    swaps.headOption.map(_._2) match {
      case Some(cid) => deleteMarkerIfCid(f, cid)
      case None => // rename-only marker: delete iff still THIS commit
        if (f.exists(markerPath) &&
            readSmall(f, markerPath).split("\n").toSeq
              .filter(_.nonEmpty) == lines)
          f.delete(markerPath, false)
    }
  }

  /** Delete the marker only if it is still the one carrying `cid` — a
    * helper that finished a crashed commit must not delete a NEWER
    * save's marker that landed in between. */
  private def deleteMarkerIfCid(f: FileSystem, cid: String): Unit =
    if (f.exists(markerPath) &&
        markerSwaps(f).values.headOption.contains(cid))
      f.delete(markerPath, false)

  /** Swap one table's fully-written `__staged_<cid>` contents live:
    * moveaside rename + publish rename, superseded contents archived
    * as a retained version. Idempotent for commit replay — a missing
    * staged dir means this table already published (possibly by a
    * helping recoverer). A first save of a new table is ONE atomic
    * rename (the table appears whole or not at all). */
  private def publishStaged(f: FileSystem, name: String,
      cid: String): Unit = {
    val live = new Path(dir(name))
    val staged = new Path(dir(name) + "__staged_" + cid)
    val old = new Path(dir(name) + "__old")
    if (!f.exists(staged)) return
    if (f.exists(live)) {
      // a stale __old beside live is a crash leftover holding the
      // pre-crash previous contents — archive, don't discard
      if (f.exists(old)) archiveOld(f, name, old)
      if (!f.rename(live, old))
        throw new IllegalStateException(s"save: cannot move $live aside")
    }
    if (!f.rename(staged, live)) {
      if (!f.exists(live)) f.rename(old, live) // roll back — stay queryable
      if (f.exists(staged))
        throw new IllegalStateException(s"save: cannot publish $staged")
      // else: a helping recoverer published it first — done
    }
    if (f.exists(old)) archiveOld(f, name, old)
  }

  /** Test/contract seams for the atomic multi-table save: `beforeMark`
    * fires after every staged dir is written, immediately before the
    * commit-marker rename (the instant the save becomes visible);
    * `afterPublish` fires after each individual table's publish rename
    * — the mid-commit window where some tables are live-new and the
    * rest still serve from staged. Engine-instance-scoped no-ops by
    * default. */
  private[graft] var beforeMark: () => Unit = () => ()
  private[graft] var afterPublish: String => Unit = _ => ()

  /** Shared save body: stage every shredded table, commit via ONE
    * marker rename (swap list + new manifest), publish each table by
    * rename, version the manifest, clear the marker. See the class
    * Scaladoc's durability contract. */
  private def saveAll(tables: Map[String, DataFrame], rels: Seq[Rel],
      rootTable: String, partCols: Seq[String]): Seq[String] = {
    val f = fs
    recoverCommit(f)
    val cid = java.util.UUID.randomUUID().toString.take(8)
    tables.foreach { case (name, df) =>
      // Pre-marker crash leftovers of earlier saves (stale
      // `__staged_<otherCid>` dirs) are NOT cleared here: a concurrent
      // save's in-flight pre-marker staging is indistinguishable from
      // a crashed one, and deleting it between that writer's staging
      // write and its marker rename would make its publishStaged
      // no-op silently (manifest claims the commit, table keeps old
      // data). They are garbage space, not correctness — [[vacuum]]
      // reclaims them age-gated. Fresh cids never collide, so staging
      // needs no cleanup to proceed.
      val w = df.write.mode(SaveMode.Overwrite)
      (if (name == rootTable && partCols.nonEmpty)
        w.partitionBy(partCols: _*)
      else w).parquet(dir(name) + "__staged_" + cid)
    }
    val (prevTables, prevRels, prevFk) = readManifest()
    val manifest = renderManifest(prevTables ++ tables.keys,
      (prevRels ++ rels).distinct,
      // a re-save re-shreds under the CURRENT names: any recorded
      // rename indirection for the re-saved tables is superseded
      prevFk -- tables.keys)
    val names = tables.keys.toSeq.sorted
    beforeMark()
    // THE commit point: one rename publishes the swap pledge and the
    // new manifest together (create-no-overwrite semantics — a save
    // whose marker rename loses to a concurrent commit fails loudly
    // and retries after that commit is recovered)
    val tmp = new Path(s"$warehouse/_graft_commit.tmp$cid")
    val out = f.create(tmp, true)
    try out.write(
      (names.map(n => s"swap|$n|$cid") ++ manifest).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, markerPath)) {
      f.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        "save: another save is committing — retry")
    }
    names.foreach { n => publishStaged(f, n, cid); afterPublish(n) }
    writeVersionedManifest(f, manifest)
    deleteMarkerIfCid(f, cid)
    names
  }

  /** Normalize parsed JSON documents into relational tables and write
    * them to the warehouse atomically (staged dirs + one commit-marker
    * rename — crash leaves old-or-new, never torn; see the durability
    * contract above). Returns the tables written. */
  def save(docs: DataFrame, table: String, key: String = "rowNum"): Seq[String] = {
    val (tables, rels) = Shred.normalizeWithRelations(docs, table, key)
    saveAll(tables, rels, table, Seq.empty)
  }

  /** [[save]] with a declared CHECK constraint (the reference's
    * SQLite `CHECK` clause as a save-time data-quality gate): rows
    * whose predicate evaluates to FALSE are diverted to the
    * quarantine table `<table>__rejects` instead of poisoning the
    * save — SQLite's NULL-passes semantics exactly (a NULL check is
    * NOT a violation). Both tables publish through the SAME
    * one-marker atomic commit, so a reader never sees accepted rows
    * without their quarantined complement. Flat documents only: a
    * nested shred would collide child-table names between the two
    * roots. Returns the tables written. */
  def saveChecked(docs: DataFrame, table: String,
      check: String): Seq[String] = {
    require(!docs.schema.fields.exists(f => f.dataType match {
      case _: org.apache.spark.sql.types.StructType |
           _: org.apache.spark.sql.types.ArrayType => true
      case _ => false
    }), "saveChecked: flat documents only (nested shred would " +
      "collide child-table names between accepted and rejected roots)")
    val pred = expr(check)
    val ok = docs.filter(!(pred <=> lit(false)))
    val bad = docs.filter(pred <=> lit(false))
    saveAll(Map(table -> ok, s"${table}__rejects" -> bad),
      Seq.empty, table, Seq.empty)
  }

  /** [[save]] with the ROOT table hive-partitioned on `partCols` —
    * the warehouse-native layout for predicate-heavy access: a filter
    * on a partition column prunes whole directories at the scan
    * (PartitionFilters, no file even opened), the reference's
    * table-per-type instinct done the Spark way. Child tables shred
    * exactly as [[save]]; the publish is the same atomic
    * staged-dir + marker commit (a directory rename preserves the
    * partition layout). */
  def savePartitioned(docs: DataFrame, table: String,
      partCols: Seq[String], key: String = "rowNum"): Seq[String] = {
    val (tables, rels) = Shred.normalizeWithRelations(docs, table, key)
    saveAll(tables, rels, table, partCols)
  }

  /** ONE observation of the commit marker: (pledged swaps name→cid,
    * pledged renames new→old). Both maps come from a single read so a
    * caller resolving several tables sees one consistent commit state
    * — a rename/save landing or clearing mid-call cannot split the
    * observation (and each table costs zero extra FS reads). */
  private def markerObservation(
      f: FileSystem): (Map[String, String], Map[String, String]) =
    if (!f.exists(markerPath)) (Map.empty, Map.empty)
    else {
      val lines = readSmall(f, markerPath).split("\n").toSeq
      val swaps = lines.filter(_.startsWith("swap|"))
        .map(_.split("\\|"))
        .collect { case Array(_, name, cid) => name -> cid }.toMap
      val rens = lines.filter(_.startsWith("ren|"))
        .map(_.split("\\|"))
        .collect { case Array(_, oldN, newN) => newN -> oldN }.toMap
      (swaps, rens)
    }

  /** ALTER-TABLE-RENAME analogue (the reference's SQLite metadata
    * verb): commits through the same marker — `ren|old|new` plus the
    * renamed manifest land in ONE rename, so a reader of the NEW name
    * resolves the old dir until the data-dir rename completes, and a
    * crash rolls forward. Tables woven into parent/child relations
    * rename through MANIFEST-LEVEL FK INDIRECTION (r15 verdict order
    * #6): the shredded data keeps its shred-time FK column names
    * (rename never rewrites data), the rel lines move to the new
    * table name, and an `fkn|new|shredTime` line records the in-data
    * name every relation consumer resolves through [[fkOf]] — exactly
    * SQLite's semantics, where ALTER TABLE RENAME leaves other
    * tables' FK column names untouched. */
  def renameTable(oldName: String, newName: String): Unit = {
    val f = fs
    recoverCommit(f)
    require(f.exists(new Path(dir(oldName))),
      s"rename: table '$oldName' does not exist")
    require(!f.exists(new Path(dir(newName))),
      s"rename: '$newName' already exists")
    val (tables, rels, fkNames) = readManifest()
    require(!tables.contains(newName),
      s"rename: '$newName' already in manifest")
    val newRels = rels.map {
      case ChildObject(p, c) => ChildObject(
        if (p == oldName) newName else p, if (c == oldName) newName else c)
      case ChildArray(p, c) => ChildArray(
        if (p == oldName) newName else p, if (c == oldName) newName else c)
      case ChildArray2(p, c) => ChildArray2(
        if (p == oldName) newName else p, if (c == oldName) newName else c)
    }
    val woven = rels.exists(r => r.parent == oldName || r.child == oldName)
    val newFk =
      if (!woven) fkNames - oldName
      else (fkNames - oldName) +
        (newName -> fkOf(fkNames, oldName)) // chain renames: keep shred-time name
    val manifest = renderManifest(
      tables.map(t => if (t == oldName) newName else t), newRels, newFk)
    val markerLines = s"ren|$oldName|$newName" +: manifest
    beforeMark()
    val tmp = new Path(
      s"$warehouse/_graft_commit.tmp${System.nanoTime()}")
    val out = f.create(tmp, true)
    try out.write(markerLines.mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, markerPath)) {
      f.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        "rename: another commit is in flight — retry")
    }
    afterPublish(newName) // the committed instant: new name readable
    if (!f.rename(new Path(dir(oldName)), new Path(dir(newName))))
      throw new IllegalStateException(
        s"rename: cannot move ${dir(oldName)} (recovery will finish)")
    writeVersionedManifest(f, manifest)
    // fence the final delete exactly like recoverCommit's rename-only
    // path: a concurrent recoverer may have finished THIS rename and
    // cleared the marker, and a NEWER commit's marker may have landed
    // since — deleting unconditionally would strip that commit of its
    // roll-forward pledge mid-publish
    if (f.exists(markerPath) &&
        readSmall(f, markerPath).split("\n").toSeq
          .filter(_.nonEmpty) == markerLines)
      f.delete(markerPath, false)
  }

  /** Resolve one table against an already-observed marker-swap set —
    * [[sql]] reads the marker ONCE so every registered view resolves
    * against the same commit observation. */
  private def resolveTable(f: FileSystem, name: String,
      swaps: Map[String, String],
      renames: Map[String, String]): DataFrame = {
    val staged = swaps.get(name)
      .map(cid => new Path(dir(name) + "__staged_" + cid))
    val renFrom = renames.get(name)
      .filterNot(_ => f.exists(new Path(dir(name))))
    if (staged.exists(f.exists))
      spark.read.parquet(staged.get.toString)
    else if (renFrom.exists(o => f.exists(new Path(dir(o)))))
      // a committed rename whose data-dir move is still pending:
      // the NEW name serves from the old dir
      spark.read.parquet(dir(renFrom.get))
    else if (!f.exists(new Path(dir(name))) &&
        f.exists(new Path(dir(name) + "__old")) &&
        !f.exists(new Path(dir(name))))
      spark.read.parquet(dir(name) + "__old")
    else spark.read.parquet(dir(name))
  }

  /** Load a stored table. A reader inside a commit window (marker
    * present, this table's publish rename pending) serves the staged
    * contents — the committed truth; a reader inside a staged-SWAP
    * window (live renamed to `__old`, staged not yet published) falls
    * back to `__old` — concurrent readers see the previous or the new
    * version of the table, never a vanished one. The fallback re-checks
    * live last so a swap completing mid-call still resolves. */
  def table(name: String): DataFrame = {
    val f = fs
    val (swaps, renames) = markerObservation(f)
    resolveTable(f, name, swaps, renames)
  }

  /** Register every manifest table as a temp view and run SQL. The
    * commit marker is observed ONCE, so all views resolve against the
    * same committed state — a mid-save reader sees old-everything or
    * new-everything, never a new parent joined to old children. */
  def sql(query: String): DataFrame = {
    val f = fs
    val (swaps, renames) = markerObservation(f)
    val (tables, rels, _) = readManifest()
    val names =
      (tables ++ rels.map(_.parent) ++ rels.map(_.child)).distinct
    names.foreach(t =>
      resolveTable(f, t, swaps, renames).createOrReplaceTempView(t))
    spark.sql(query)
  }

  /** Recursively re-nest `base` rows of `tableName`: child arrays come
    * back as array<struct>, child objects as struct — to any depth
    * (visited-set guarded against cyclic manifests). */
  private def assemble(tableName: String, base: DataFrame, key: String,
      rels: Seq[Rel], fkNames: Map[String, String],
      visited: Set[String]): DataFrame =
    rels.filter(r => r.parent == tableName && !visited.contains(r.child))
      .foldLeft(base) { (df, rel) =>
        val childFull = assemble(rel.child, table(rel.child), key, rels,
          fkNames, visited + tableName)
        // in-data FK column names are SHRED-TIME names — a renamed
        // table resolves through the manifest's fkn indirection
        rel match {
          case ChildArray(p, c) =>
            Assemble.nestArray(df, key, childFull, fkOf(fkNames, p),
              fkOf(fkNames, c), orderCols = Seq(key))
          case ChildObject(_, c) =>
            val fkc = fkOf(fkNames, c)
            val childStruct = childFull.select(col(key).as("_ck"),
              struct(childFull.columns.map(col): _*).as("_cs"))
            df.join(childStruct, col(fkc) === col("_ck"), "left")
              .drop("_ck").drop(fkc).withColumnRenamed("_cs", fkc)
          case ChildArray2(p, c) =>
            // positional 2-d re-nest: inner arrays rebuilt by ipos,
            // outer by pos — (pos, ipos) is unique per parent, so the
            // struct sort is total and the roundtrip is exact
            val fkp = fkOf(fkNames, p)
            val nested2 = childFull
              .groupBy(col(fkp), col("pos"))
              .agg(expr("transform(array_sort(collect_list(" +
                "struct(ipos, value))), x -> x.value)").as("_ia"))
              .groupBy(col(fkp))
              .agg(expr("transform(array_sort(collect_list(" +
                "struct(pos, _ia))), x -> x._ia)").as("_oa"))
            df.join(nested2.select(col(fkp).as("_ck"), col("_oa")),
                col(key) === col("_ck"), "left")
              .drop("_ck").withColumnRenamed("_oa", fkOf(fkNames, c))
        }
      }

  /** Bulk re-assembly of a stored table to its nested document form —
    * [[getJson]]'s recursive re-nest without the per-document collect,
    * so the whole corpus re-nests as one distributed plan. */
  def nested(tableName: String, key: String = "rowNum"): DataFrame = {
    val (_, rels, fkNames) = readManifest()
    assemble(tableName, table(tableName), key, rels, fkNames, Set.empty)
  }

  /** Point lookup re-assembled to one nested JSON document. */
  def getJson(tableName: String, keyValue: Long,
      key: String = "rowNum"): Option[String] = {
    val base = table(tableName).filter(col(key) === keyValue)
    val (_, rels, fkNames) = readManifest()
    val nested = assemble(tableName, base, key, rels, fkNames, Set.empty)
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
    * mutation restores it). A pending commit is rolled forward first,
    * so a marker-pledged staged dir can never be misread as stale.
    * This is the ONLY reclaimer of pre-marker `__staged_<cid>` crash
    * leftovers (saveAll deliberately never deletes them — a
    * concurrent save's in-flight staging is indistinguishable from a
    * crashed one); like table-format VACUUM with zero retention, do
    * not run it concurrently with an in-flight save of the same
    * table. Returns the number of directories removed. */
  def vacuum(tableName: String): Int = {
    val f = fs
    recoverCommit(f)
    val parent = new Path(warehouse)
    val staleStaged =
      if (!f.exists(parent)) Seq.empty
      else f.listStatus(parent).toSeq.map(_.getPath)
        .filter(_.getName.startsWith(tableName + "__staged"))
    val candidates =
      versions(tableName).map(v => new Path(dir(tableName) + "@v" + v)) ++
        staleStaged ++
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

  /** Capture the live dir's etag at read time. A live dir MISSING here
    * means another writer's two-rename swap window opened between our
    * existence checks and this listing — a concurrency loss, reported
    * as the same retryable ConcurrentModificationException the etag
    * re-check throws (never a raw FileNotFoundException; readers get a
    * fallback, writers get a retry signal). */
  private[graft] def readTagOrConflict(f: FileSystem, live: Path,
      op: String, tableName: String): String =
    try dirTag(f, live)
    catch { case _: java.io.FileNotFoundException =>
      throw new java.util.ConcurrentModificationException(
        s"$op on '$tableName': concurrent swap in progress " +
          "(live table mid-rename) — retry on a fresh read")
    }

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
    * ConcurrentModificationException; a retry re-reads and wins. A
    * writer that finds live MISSING at tag-capture time has landed
    * inside another writer's two-rename window — that too is a
    * concurrency loss, reported as the same retryable CME (never a raw
    * FileNotFoundException). */
  private def rewriteStaged(tableName: String, op: String)(
      rewrite: DataFrame => DataFrame): Unit = {
    val f = fs
    recoverCommit(f)
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
    val readTag = readTagOrConflict(f, live, op, tableName)
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

  /** Shared ALTER-COLUMN skeleton (reference: SQLite gives the user
    * ALTER TABLE ... RENAME/DROP COLUMN; parquet columns are physical,
    * so here the verb is a staged projection rewrite — the same
    * crash-safe two-rename swap as [[upsert]]/[[delete]], optimistic
    * concurrency included). Refuses shred-relation FK columns (their
    * NAMES carry table names in the shredded data — altering those is
    * a re-shred, same refusal contract as [[renameTable]]). A
    * secondary/covering index whose schema involves the altered column
    * is invalid the instant the swap lands, so it is dropped FIRST: a
    * crash between invalidation and swap leaves only a missing,
    * rebuildable index — never a stale one serving pre-alter values. */
  private def alterColumn0(tableName: String, op: String,
      colName: String, check: Seq[String] => Unit)(
      project: DataFrame => DataFrame): Unit = {
    val f = fs
    recoverCommit(f)
    val cols = table(tableName).columns.toSeq
    require(cols.contains(colName),
      s"$op: no column '$colName' in '$tableName'")
    check(cols)
    val (_, rels, fkNames) = readManifest()
    val woven = rels
      .filter(r => r.parent == tableName || r.child == tableName)
      .flatMap(r => Seq(fkOf(fkNames, r.parent), fkOf(fkNames, r.child)))
      .toSet
    require(!woven.contains(colName),
      s"$op: column '$colName' of '$tableName' is a shred-relation " +
        "FK — its name carries a table name; rewrite instead")
    val parent = new Path(warehouse)
    if (f.exists(parent))
      f.listStatus(parent).toSeq.map(_.getPath)
        .filter { p =>
          val n = p.getName
          n == s"${tableName}__idx_$colName" ||
            (n.startsWith(tableName + "__cidx_") &&
              (n == s"${tableName}__cidx_$colName" ||
                spark.read.parquet(p.toString).columns
                  .contains(colName)))
        }
        .foreach(f.delete(_, true))
    rewriteStaged(tableName, op)(project)
  }

  /** ALTER TABLE ... RENAME COLUMN through the facade: staged
    * projection rewrite + atomic swap; indexes over the old name are
    * invalidated (rebuild under the new name). */
  def renameColumn(tableName: String, oldCol: String,
      newCol: String): Unit =
    alterColumn0(tableName, "renameColumn", oldCol, cols =>
      require(!cols.contains(newCol),
        s"renameColumn: '$newCol' already exists in '$tableName'")) {
      base => base.withColumnRenamed(oldCol, newCol)
    }

  /** ALTER TABLE ... DROP COLUMN through the facade: staged projection
    * rewrite + atomic swap; indexes/covering indexes whose schema
    * carries the column are invalidated. */
  def dropColumn(tableName: String, colName: String): Unit =
    alterColumn0(tableName, "dropColumn", colName, cols =>
      require(cols.length > 1,
        s"dropColumn: cannot drop the last column of '$tableName'")) {
      base => base.drop(colName)
    }

  /** OPTIMIZE verb: compact a stored table to `targetFiles` part
    * files (the warehouse small-files maintenance every table format
    * ships — many tiny parts from incremental upserts make every
    * scan pay per-file open/footer costs). Rides the same crash-safe
    * optimistic [[rewriteStaged]] swap as upsert/delete; contents are
    * bit-for-bit identical, only the file layout changes. Returns
    * (files before, files after). */
  def optimize(tableName: String, targetFiles: Int): (Int, Int) = {
    val f = fs
    def partCount(): Int =
      f.listStatus(new Path(dir(tableName)))
        .count(_.getPath.getName.startsWith("part-"))
    val before = partCount()
    rewriteStaged(tableName, "optimize")(_.coalesce(targetFiles))
    (before, partCount())
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
