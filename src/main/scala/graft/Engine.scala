package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.json.{Assemble, Shred}

/** The user-facing facade mirroring the reference's API surface:
  *
  *  - `save(docs, table)` ≙ `saveIntoDatabase(conn, table, json)`
  *    (DatabaseManager.java:118) — but bulk: a whole DataFrame of
  *    parsed JSON documents is normalized into relational tables and
  *    written to the warehouse in one pass.
  *  - `getJson(table, key)` ≙ `getFromDatabaseJson(conn, table,
  *    rowNum, callback)` (java:253) — point lookup re-assembled into a
  *    nested JSON string. Key filters push down to the parquet scan.
  *  - `sql(...)` — the analytic surface over every saved table.
  *
  * The reference serializes every operation through one SQLite
  * connection (java:76-106); here the "connection" is the cluster and
  * writes are partitioned parquet. Parent→children relations are
  * recorded in a manifest so re-assembly needs no catalog server.
  */
class Engine(spark: SparkSession, warehouse: String) {

  private def dir(table: String) = s"$warehouse/$table"
  private def manifestPath = Paths.get(s"$warehouse/_graft_manifest.json")

  private def readManifest(): Map[String, Seq[String]] =
    if (!Files.exists(manifestPath)) Map.empty
    else Files.readAllLines(manifestPath).toArray.mkString("\n")
      .split("\n").filter(_.nonEmpty)
      .map { line =>
        val Array(p, cs) = line.split("=", 2)
        p -> cs.split(",").filter(_.nonEmpty).toSeq
      }.toMap

  private def writeManifest(m: Map[String, Seq[String]]): Unit = {
    Files.createDirectories(manifestPath.getParent)
    Files.writeString(manifestPath,
      m.map { case (p, cs) => s"$p=${cs.mkString(",")}" }.mkString("\n"))
  }

  /** Normalize parsed JSON documents into relational tables and write
    * them to the warehouse. Returns the tables written. */
  def save(docs: DataFrame, table: String, key: String = "rowNum"): Seq[String] = {
    val tables = Shred.normalize(docs, table, key)
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(dir(name))
    }
    val children = tables.keys.filterNot(_ == table).toSeq.sorted
    writeManifest(readManifest() + (table -> children))
    tables.keys.toSeq.sorted
  }

  /** Load a stored table. */
  def table(name: String): DataFrame = spark.read.parquet(dir(name))

  /** Keyed merge into a stored table (reference: UPDATE-by-rowNum /
    * INSERT, java:211-229): update rows replace, new keys append.
    * Read-merge-write into a staging dir, then atomic-ish swap — you
    * cannot overwrite the parquet you are lazily reading, and a
    * driver-side collect would not scale. This is the classic
    * compaction pattern (a table format with native MERGE replaces it
    * at 100 TB). */
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

  /** Register every manifest table as a temp view and run SQL. */
  def sql(query: String): DataFrame = {
    val m = readManifest()
    (m.keys ++ m.values.flatten).foreach { t =>
      table(t).createOrReplaceTempView(t)
    }
    spark.sql(query)
  }

  /** Point lookup re-assembled to one nested JSON document (child
    * tables re-nested as arrays keyed by the parent-named FK). */
  def getJson(tableName: String, keyValue: Long,
      key: String = "rowNum"): Option[String] = {
    val root = table(tableName).filter(col(key) === keyValue)
    val children = readManifest().getOrElse(tableName, Seq.empty)
    val nested = children.foldLeft(root) { (df, child) =>
      val childDf = table(child)
      Assemble.nestArray(df, key, childDf, tableName, child,
        orderCols = Seq(key))
    }
    val row = nested
      .select(to_json(struct(nested.columns.map(col): _*)).as("doc"))
      .collect()
    row.headOption.map(_.getString(0))
  }
}
