package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink format coverage (SURVEY §2.4): the engine round-trips
  * its tables through line-delimited JSON (the reference's native
  * interchange form) and CSV, and ingests opaque files via the
  * binaryFile source (multimodal ingestion path).
  *
  * Writers produce a deterministic projection (dates as strings) so the
  * reread is byte-stable; readers use explicit schemas on CSV and
  * schema inference on JSON (both paths exercised).
  */
object Formats {

  private def tmpDir(kind: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_fmt", s"${kind}_$tag")
    Files.createDirectories(p.getParent)
    p.toString
  }

  /** Orders in interchange projection: stable string date. */
  private def ordersInterchange(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))

  /** Write orders as line-delimited JSON, read back with schema
    * inference, return the reread frame. */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("orders_json", d)
    ordersInterchange(s, d).write.mode(SaveMode.Overwrite).json(path)
    s.read.json(path)
  }

  /** Write orders as CSV with header, read back with explicit schema. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("orders_csv", d)
    val df = ordersInterchange(s, d)
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    s.read.schema(df.schema).option("header", "true").csv(path)
  }

  /** Quoted/multiline CSV roundtrip — the parser edge case flat
    * roundtrips never touch: a text field carrying embedded quotes,
    * field separators AND newlines. Written with quoteAll + escaped
    * quotes, read back with `multiLine` (so a record may span physical
    * lines). A parser that splits on raw newlines changes the row
    * count; one that mishandles escapes corrupts the note text — the
    * summary the contract checks would drift either way. multiLine
    * costs splittability (each file parses as a unit), which is why
    * production keeps multiline fields in parquet/JSON and this path
    * exists for INGEST of third-party CSV. */
  def csvQuoted(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("orders_csv_q", d)
    val df = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_totalprice"),
      concat(col("o_orderpriority"), lit("\"q,\n"), col("o_orderstatus"))
        .as("note"))
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"")
      .csv(path)
    s.read.schema(df.schema)
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)
  }

  /** ORC sink + source roundtrip (columnar alternative to parquet;
    * spark-avro isn't on this classpath, ORC ships with Spark). */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("orders_orc", d)
    ordersInterchange(s, d).write.mode(SaveMode.Overwrite).orc(path)
    s.read.orc(path)
  }

  /** Parquet-with-ZSTD sink + source roundtrip — the storage codec a
    * 100 TB lake actually ships (zstd beats snappy ~30% on size at
    * similar scan speed, and its decode parallelizes per row group
    * like any parquet codec). The write asserts the codec really took
    * effect (Spark stamps `.zstd.parquet` into the part-file names) so
    * a silently-ignored option can't pass as a roundtrip. */
  def parquetZstdRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("orders_zstd", d)
    ordersInterchange(s, d).write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").parquet(path)
    val parts = new java.io.File(path)
      .listFiles().map(_.getName).filter(_.endsWith(".parquet"))
    require(parts.nonEmpty && parts.forall(_.contains(".zstd.")),
      s"zstd codec not applied: ${parts.take(3).mkString(",")}")
    s.read.parquet(path)
  }

  /** XML sink + source roundtrip via Spark 4's built-in XML data
    * source (`format("xml")`, one `<order>` element per row) — the
    * B2B/legacy-feed interchange path. The reader infers types from
    * element text, so the reread is requested with the writer's
    * explicit schema (same contract as the CSV roundtrip); `rowTag`
    * makes the files splittable per element batch. Column order is
    * re-asserted because XML readers return fields alphabetically. */
  def xmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("orders_xml", d)
    val df = ordersInterchange(s, d)
    df.write.mode(SaveMode.Overwrite).format("xml")
      .option("rootTag", "orders").option("rowTag", "order")
      .save(path)
    s.read.schema(df.schema).format("xml")
      .option("rowTag", "order").load(path)
      .select(df.columns.map(col): _*)
  }

  /** Plain-text sink + source: one pipe-delimited line per order,
    * reread with `spark.read.text` and re-parsed (the log-file
    * ingestion path). The double survives because Spark's
    * double→string is shortest-round-trip. */
  def textRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("orders_text", d)
    Tables.orders(s, d)
      .select(concat_ws("|", col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    val f = split(col("value"), "\\|")
    s.read.text(path).select(
      f.getItem(0).cast("long").as("o_orderkey"),
      f.getItem(1).as("o_orderstatus"),
      f.getItem(2).cast("double").as("o_totalprice"))
  }

  /** Gzip-compressed line-delimited JSON roundtrip — the compressed
    * interchange form crawl dumps actually arrive in. The writer emits
    * `.json.gz` part files; the reader auto-detects the codec by
    * extension. Scale note: gzip is NOT splittable — one file = one
    * task — so at 100 TB the writer must keep part files bounded
    * (repartition before write); splittable codecs (bzip2) or
    * block-compressed parquet are preferred when the reader fans out. */
  def jsonGzipRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("orders_json_gz", d)
    ordersInterchange(s, d).write.mode(SaveMode.Overwrite)
      .option("compression", "gzip").json(path)
    s.read.json(path)
  }

  /** lz4-compressed JSONL roundtrip — the fast-codec ingest path
    * (decode-speed-bound log/crawl feeds; pure-JVM lz4-java, so it
    * works without native Hadoop libs, unlike the text-source zstd
    * codec). Caveat the layout must respect at 100 TB: a bare .lz4
    * stream (like .gz) is NOT splittable, so parallelism comes from
    * many files, not from splitting one — the writer keeps the input
    * partitioning for that reason. */
  def jsonLz4Roundtrip(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("orders_json_lz4", d)
    ordersInterchange(s, d).write.mode(SaveMode.Overwrite)
      .option("compression", "lz4").json(path)
    s.read.json(path)
  }

  /** Fixed-width (COBOL/mainframe-layout) text roundtrip — the legacy
    * interchange format every warehouse eventually ingests: columns
    * live at byte offsets, no delimiters. Writer packs customer rows
    * into a 38-char record (10-digit key, 4-digit nation, 12-char
    * right-padded segment, 12-digit cent balance carried with a +10⁸
    * offset so the sign never breaks the numeric field); reader is
    * pure `substring` + cast — codegen'd per-row slicing, one scan,
    * trivially parallel at any scale. Cents → /100.0 reproduces the
    * source double exactly (2-dp values round-trip through the
    * nearest-double lattice). */
  def fixedWidthRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("customer_fixed", d)
    Tables.customer(s, d)
      .select(concat(
        lpad(col("c_custkey").cast("string"), 10, "0"),
        lpad(col("c_nationkey").cast("string"), 4, "0"),
        rpad(col("c_mktsegment"), 12, " "),
        lpad((round(col("c_acctbal") * 100).cast("long") + 100000000L)
          .cast("string"), 12, "0")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    s.read.text(path).select(
      substring(col("value"), 1, 10).cast("long").as("c_custkey"),
      substring(col("value"), 11, 4).cast("int").as("c_nationkey"),
      rtrim(substring(col("value"), 15, 12)).as("c_mktsegment"),
      ((substring(col("value"), 27, 12).cast("long") - 100000000L)
        .cast("double") / 100.0).as("c_acctbal"))
  }

  /** CSV with EMBEDDED NEWLINES (multiline records) — the production
    * CSV trap: a quoted field spanning physical lines breaks every
    * line-oriented reader. The writer quotes a snippet column built
    * with a literal '\n'; reading back REQUIRES `multiLine=true`,
    * which also makes each file non-splittable (a record can straddle
    * any byte offset), so at 100 TB parallelism must come from many
    * part files — the same caveat as the gzip path, documented here
    * because the default splittable CSV reader silently tears these
    * rows instead of failing. Census proves the newlines survived the
    * roundtrip. */
  def csvMultiline(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("docs_csv_ml", d)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        concat(substring(col("text"), 1, 40), lit("\n"),
          substring(col("text"), 41, 40)).as("snippet"))
      // the CSV WRITER trims leading/trailing whitespace by default
      // (ignore*WhiteSpace=true on write, false on read) — a silent
      // lossy roundtrip for text payloads unless disabled
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false").csv(path)
    s.read.option("header", "true").option("multiLine", "true")
      .option("inferSchema", "false").csv(path)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("snippet").contains("\n"), 1L).otherwise(0L))
          .as("n_with_newline"),
        sum(length(col("snippet"))).as("total_chars"),
        countDistinct(col("lang")).as("n_langs"))
  }

  /** Malformed-row tolerance on the CSV ingest path — the same
    * contract the reference applies to bad JSON (skip, don't abort;
    * DatabaseManager.java wraps per-row parse in try/catch). Every
    * 10th order is written as a deliberately unparseable line; the
    * PERMISSIVE reader with a `columnNameOfCorruptRecord` column keeps
    * the good rows typed and quarantines the bad lines for audit
    * instead of failing the 100 TB job. Returns the one-row triage
    * summary (row/good/corrupt counts + revenue over clean rows). */
  def csvMalformed(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("orders_csv_bad", d)
    // the corrupt token sits in o_totalprice — a field the summary
    // aggregates, so the pruned CSV parse always attempts it (a
    // short/truncated line would be null-padded, not flagged)
    Tables.orders(s, d)
      .select(concat_ws(",", col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 10 === 0, lit("corrupt"))
            .otherwise(round(col("o_totalprice"), 2).cast("string")),
          col("o_orderpriority"))
        .as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, " +
        "o_orderpriority STRING, _bad STRING")
    val parsed = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(path)
    parsed.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("_bad").isNull, 1)).as("n_good"),
      count(col("_bad")).as("n_corrupt"),
      round(sum(when(col("_bad").isNull, col("o_totalprice"))), 2)
        .as("clean_revenue"))
  }

  /** Malformed-JSON tolerance as a first-class contract (the
    * reference's own failure mode — DatabaseManager.java wraps per-row
    * JSON parse in try/catch and skips bad documents). Every 10th
    * order's JSON line is truncated mid-object; the PERMISSIVE reader
    * with a corrupt-record column types the good lines and quarantines
    * the torn ones — ingest survives, the audit sees exactly what was
    * dropped. Same triage-summary shape as [[csvMalformed]]. */
  def jsonMalformed(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("orders_json_bad", d)
    val line = concat(lit("{\"o_orderkey\":"), col("o_orderkey"),
      lit(",\"o_totalprice\":"), round(col("o_totalprice"), 2),
      lit(",\"o_orderpriority\":\""), col("o_orderpriority"), lit("\"}"))
    Tables.orders(s, d)
      .select(when(col("o_orderkey") % 10 === 0,
          substring(line, 1, 20)).otherwise(line).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING, " +
        "_bad STRING")
    val parsed = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(path)
    parsed.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("_bad").isNull, 1)).as("n_good"),
      count(col("_bad")).as("n_corrupt"),
      round(sum(when(col("_bad").isNull, col("o_totalprice"))), 2)
        .as("clean_revenue"))
  }

  /** Avro OBJECT CONTAINER FILE roundtrip hand-rolled over the Avro
    * core library (the spark-avro connector is deliberately not a
    * dependency — this is the "ingest a format Spark has no reader
    * for" seam): each partition serializes its rows into one real
    * .avro container (schema JSON in the header, deflate-compressed
    * blocks, sync markers), written via the Hadoop FileSystem API;
    * the read side ingests the files as opaque binaries
    * ([[binaryFiles]]) and decodes each with `DataFileStream` in a
    * flatMap — both directions are map-only per-partition seams, so
    * parallelism is the file count, exactly how a 100 TB Avro lake is
    * ingested. Census (count + exact cents) proves the roundtrip. */
  def avroRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = tmpDir("orders_avro", d)
    val schemaJson =
      """{"type":"record","name":"Order","fields":[
        |{"name":"o_orderkey","type":"long"},
        |{"name":"o_orderstatus","type":"string"},
        |{"name":"o_cents","type":"long"}]}""".stripMargin
    val rows = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("o_cents"))
      .as[(Long, String, Long)]
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    rows.repartition(4).mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        val w = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](schema))
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        val part = org.apache.spark.TaskContext.getPartitionId()
        val out = new org.apache.hadoop.fs.Path(
          s"$path/part-$part.avro")
        val fs = out.getFileSystem(hconf.value)
        val os = fs.create(out, true)
        w.create(schema, os)
        var n = 0L
        it.foreach { case (k, st, c) =>
          val r = new org.apache.avro.generic.GenericData.Record(schema)
          r.put("o_orderkey", k); r.put("o_orderstatus", st)
          r.put("o_cents", c)
          w.append(r); n += 1
        }
        w.close()
        Iterator.single(n)
      }
    }.collect() // barrier: files fully written before the read side
    binaryFiles(s, path, "*.avro")
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        val rd = new org.apache.avro.file.DataFileStream(
          new java.io.ByteArrayInputStream(bytes),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(Long, String, Long)]
        while (rd.hasNext) {
          val r = rd.next()
          buf += ((r.get("o_orderkey").asInstanceOf[Long],
            r.get("o_orderstatus").toString,
            r.get("o_cents").asInstanceOf[Long]))
        }
        rd.close()
        buf
      }
      .toDF("o_orderkey", "o_orderstatus", "o_cents")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_cents")).as("cents"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))
  }

  /** Opaque-file ingestion via the binaryFile source: (path, length,
    * content) rows — the entry point for real media files. */
  def binaryFiles(s: SparkSession, dir: String, glob: String): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Storage-level schema evolution: two writer generations land files
    * with different schemas in one dataset directory (v1 lacks `lang`);
    * `mergeSchema` unions the footers at read time and back-fills nulls
    * — how a long-lived 100 TB dataset actually evolves, no rewrite of
    * old files. Reader-side cost is footer merging only. */
  def schemaMergeRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = tmpDir("docs_merge", d)
    val docs = Tables.documents(s, d)
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("n_chars"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    docs.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .write.mode(SaveMode.Append).parquet(path)
    s.read.option("mergeSchema", "true").parquet(path)
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("lang"), lit("<v1>")).as("lang"))
      .orderBy(col("doc_id"))
  }
}
