package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Pins the events `ts` type contract. The driver-generated
  * events.parquet has shipped with BOTH physical types across testdata
  * regenerations — TIMESTAMP(NANOS) (arriving as Long nanoseconds
  * under `spark.sql.legacy.parquet.nanosAsLong=true`) and plain
  * timestamp[us] (TIMESTAMP_NTZ) — and the r6 round was lost to a
  * consumer assuming one of them. Every events consumer must go
  * through a type-adaptive canonicalizer: `Tables.events` (batch) or
  * `streaming.Events.withEventTs` (streams). These fixtures write the
  * same instants both ways and assert the canonical output is
  * bit-identical, so that class of breakage cannot silently return.
  */
class EventsTsContractSpec extends SparkSuite {

  // (event_id, epoch µs, user_id, event_type, value) — includes
  // sub-second µs parts and an end-of-window boundary instant so the
  // floor-to-seconds convention is exercised, not just round numbers
  private val rows = Seq(
    (1L, 1704067200123456L, 10L, "view", 1.0),
    (2L, 1704067200999999L, 10L, "click", 2.0),
    (3L, 1704070800000000L, 11L, "purchase", 3.0),
    (4L, 1704074399999999L, 11L, "view", 4.0))

  /** Writes the same events two ways; returns (longNsDir, timestampUsDir). */
  private lazy val fixtures: (String, String) = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_tsfix")
    val df = rows.toDF("event_id", "us", "user_id", "event_type", "value")
    val longDir = s"$base/long_ns"
    // TIMESTAMP(NANOS) arrives as raw Long ns; the +789 ns remainder
    // checks that canonicalization FLOORS to µs instead of rounding
    df.select(col("event_id"), (col("us") * 1000L + 789L).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$longDir/events.parquet")
    val ntzDir = s"$base/ts_us"
    df.select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    (longDir.toString, ntzDir.toString)
  }

  private def batchCanon(dir: String): Array[(Long, Long)] =
    graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  private def streamCanon(dir: String): Array[(Long, Long, Long)] =
    graft.streaming.Events.withEventTs(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_id"), col("ts_us"), col("ts_s"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("Tables.events canonicalizes both ts types to identical timestamps") {
    val (longDir, ntzDir) = fixtures
    for (dir <- Seq(longDir, ntzDir))
      assert(graft.sources.Tables.events(spark, dir)
        .schema("ts").dataType == TimestampType,
        s"$dir: ts must canonicalize to TimestampType")
    val a = batchCanon(longDir).toSeq
    val b = batchCanon(ntzDir).toSeq
    assert(a == b, "batch canonical instants diverged by source type")
    assert(a.map(_._2) == rows.map(_._2),
      "canonical µs must equal the written instants (ns floored, not rounded)")
  }

  test("streaming withEventTs canonicalizes both ts types identically") {
    val (longDir, ntzDir) = fixtures
    val a = streamCanon(longDir).toSeq
    val b = streamCanon(ntzDir).toSeq
    assert(a == b, "streaming canonical columns diverged by source type")
    assert(a.map(_._2) == rows.map(_._2))
    // floor-epoch-seconds convention (matches unix_timestamp ⟷
    // DuckDB CAST(floor(epoch(ts)) AS BIGINT))
    assert(a.map(_._3) ==
      Seq(1704067200L, 1704067200L, 1704070800L, 1704074399L))
  }

  test("an event-time streaming query yields equal output on both types") {
    val (longDir, ntzDir) = fixtures
    val wa = graft.streaming.Events.streamWindow(spark, longDir).collect().toSeq
    val wb = graft.streaming.Events.streamWindow(spark, ntzDir).collect().toSeq
    assert(wa.nonEmpty, "fixture stream produced no windows")
    assert(wa == wb, "stream_window output diverged by source ts type")
  }
}
