package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.json.{Assemble, Shred}
import graft.json.Shred.{ChildArray, ChildObject, Rel}

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
  *
  * The reference serializes every operation through one SQLite
  * connection (java:76-106); here the "connection" is the cluster and
  * writes are partitioned parquet. Parent→child relations land in a
  * manifest so re-assembly needs no catalog server.
  */
class Engine(spark: SparkSession, warehouse: String) {

  private def dir(table: String) = s"$warehouse/$table"
  private def manifestPath = Paths.get(s"$warehouse/_graft_manifest.txt")

  private def readRels(): Seq[Rel] =
    if (!Files.exists(manifestPath)) Seq.empty
    else Files.readAllLines(manifestPath).toArray.map(_.toString)
      .filter(_.nonEmpty).toSeq.map { line =>
        line.split("\\|") match {
          case Array("obj", p, c) => ChildObject(p, c)
          case Array("arr", p, c) => ChildArray(p, c)
          case other => throw new IllegalStateException(
            s"bad manifest line: ${other.mkString("|")}")
        }
      }

  private def writeRels(rels: Seq[Rel]): Unit = {
    Files.createDirectories(manifestPath.getParent)
    val lines = rels.distinct.map {
      case ChildObject(p, c) => s"obj|$p|$c"
      case ChildArray(p, c) => s"arr|$p|$c"
    }
    Files.writeString(manifestPath, lines.mkString("\n"))
  }

  /** Normalize parsed JSON documents into relational tables and write
    * them to the warehouse. Returns the tables written. */
  def save(docs: DataFrame, table: String, key: String = "rowNum"): Seq[String] = {
    val (tables, rels) = Shred.normalizeWithRelations(docs, table, key)
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(dir(name))
    }
    writeRels((readRels() ++ rels).distinct)
    tables.keys.toSeq.sorted
  }

  /** Load a stored table. */
  def table(name: String): DataFrame = spark.read.parquet(dir(name))

  /** Register every manifest table as a temp view and run SQL. */
  def sql(query: String): DataFrame = {
    val rels = readRels()
    val names = (rels.map(_.parent) ++ rels.map(_.child)).distinct
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
        }
      }

  /** Point lookup re-assembled to one nested JSON document. */
  def getJson(tableName: String, keyValue: Long,
      key: String = "rowNum"): Option[String] = {
    val base = table(tableName).filter(col(key) === keyValue)
    val nested = assemble(tableName, base, key, readRels(), Set.empty)
    nested
      .select(to_json(struct(nested.columns.map(col): _*)).as("doc"))
      .collect().headOption.map(_.getString(0))
  }

  /** Keyed merge into a stored table (reference: UPDATE-by-rowNum /
    * INSERT, java:211-229): update rows replace, new keys append.
    * Read-merge-write into a staging dir, then swap — you cannot
    * overwrite the parquet you are lazily reading, and a driver-side
    * collect would not scale. This is the classic compaction pattern
    * (a table format with native MERGE replaces it at 100 TB). */
  def upsert(tableName: String, updates: DataFrame,
      key: String = "rowNum"): Unit = {
    val live = Paths.get(dir(tableName))
    val staged = Paths.get(dir(tableName) + "__staged")
    ops.Upsert(table(tableName), updates, Seq(key))
      .write.mode(SaveMode.Overwrite).parquet(staged.toString)
    val old = Paths.get(dir(tableName) + "__old")
    Files.move(live, old)
    Files.move(staged, live)
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(rm(_))
      Files.deleteIfExists(p)
    }
    rm(old)
  }
}
