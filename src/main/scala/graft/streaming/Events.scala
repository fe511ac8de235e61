package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming over the events table (SURVEY §2.2
  * `stream_window`).
  *
  * The same declarative plan (tumbling 1-hour window per event_type)
  * runs as a continuous query: `readStream` → window agg → sink. Here
  * the parquet file drives it as a bounded stream (AvailableNow) into a
  * memory sink so the result is a normal DataFrame; in production the
  * source is a directory/Kafka feed, the trigger is continuous, and a
  * watermark + append mode bound the state store.
  */
object Events {

  private val n = new AtomicInteger(0)

  /** Run the streaming window aggregation to completion and return the
    * result. Output: win_start_s (epoch seconds), event_type, n,
    * sum_value. */
  def streamWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    // schema must be explicit for a streaming source; take it from a
    // bounded read (ts arrives as Long nanoseconds, see Tables.events)
    val schema = spark.read.parquet(path).schema
    // FileStreamSource wants a directory (or glob) path; events.parquet
    // is a single file, so address it through a glob pattern
    val raw = spark.readStream.schema(schema).parquet(s"$sfDir/events.*")
    val ev = raw.withColumn("ts",
      timestamp_micros((col("ts") / 1000L).cast("long")))
    val agg = ev
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    val name = s"graft_stream_window_${n.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start_s"), col("event_type"))
  }
}
