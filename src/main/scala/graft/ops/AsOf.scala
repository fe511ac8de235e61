package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with rightTime <= leftTime on the same key (SURVEY §2.2).
  *
  * Spark has no native as-of join; per the preference order this is
  * COMPOSED from existing operators rather than a custom physical plan:
  * tag both sides, union, and forward-fill the right payload with
  * `last(ignoreNulls).over(rows unbounded preceding)` in (time,
  * side-tag) order — right rows sort before left rows at equal times,
  * giving inclusive semantics.
  *
  * Scale shape: ONE shuffle on the key (the union is narrow, the window
  * sorts within key partitions); equivalent to the sort-merge as-of
  * both sides would need anyway. The right side must be unique per
  * (key, time) — pre-aggregate if needed.
  */
object AsOf {

  /** leftTime/rightTime must be the same orderable type; `payload` is
    * the right column carried onto left rows (null when no right row
    * precedes). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: String): DataFrame = {
    val payloadType = right.schema(payload).dataType
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn(s"_p", lit(null).cast(payloadType))
    val extraLeftCols = left.columns.filterNot(c =>
      keys.contains(c) || c == leftTime)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_p", col(payload))
    val rAligned = extraLeftCols.foldLeft(
      r.select((keys.map(col) :+ col("_t") :+ col("_side") :+ col("_p")): _*)) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val lAligned = l.select(
      (keys.map(col) ++ extraLeftCols.map(col) :+ col("_t") :+ col("_side")
        :+ col("_p")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn(payload, last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_p", "_side")
      .withColumnRenamed("_t", leftTime)
  }

  /** BOTH directional fills in one pass — the nearest-join primitive:
    * each left row gets the latest right payload at-or-before its time
    * (`_b`) and the earliest strictly-after (`_f`); the caller picks by
    * distance. Same union+tag kernel as [[join]] with a second,
    * forward window over the SAME (key, time, side) sort — right rows
    * order before left rows at equal times, so an equal-time right row
    * lands in the backward fill only (inclusive backward, strict
    * forward) and the two frames share one shuffle and one sort. */
  def nearestFills(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: String): DataFrame = {
    val payloadType = right.schema(payload).dataType
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(payloadType))
    val extraLeftCols = left.columns.filterNot(c =>
      keys.contains(c) || c == leftTime)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_p", col(payload))
    val rAligned = extraLeftCols.foldLeft(
      r.select((keys.map(col) :+ col("_t") :+ col("_side") :+ col("_p")): _*)) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val lAligned = l.select(
      (keys.map(col) ++ extraLeftCols.map(col) :+ col("_t") :+ col("_side")
        :+ col("_p")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
    lAligned.unionByName(rAligned)
      .withColumn("_b", last(col("_p"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_f", first(col("_p"), ignoreNulls = true)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("_side") === 1)
      .drop("_p", "_side")
      .withColumnRenamed("_t", leftTime)
  }
}
