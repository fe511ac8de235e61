package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking: exact `row_number`/`ntile` over a total
  * order WITHOUT the single-partition Window sort (`WindowExec: No
  * Partition Defined` — one task sorts everything, the bottleneck the
  * global-window family hits when the ranked entity count itself grows
  * to billions).
  *
  * Pattern: range-repartition on the sort key (non-overlapping ordered
  * ranges, partition id increasing with key order), rank locally within
  * each range, then add broadcast cumulative range offsets. The order
  * must be TOTAL (include a unique tiebreaker column) — then the global
  * rank is exact regardless of where the sampled range bounds land, and
  * every stage is parallel: the only serial work is the |partitions|-row
  * offset cumsum.
  *
  * This is the exemplar SURVEY §5 prescribes for the aggregate-frame
  * global windows (q_rfm quartiles here; same recipe applies to the
  * abc/pareto/gini cumsums via a ranged running sum if their entity
  * frames ever outgrow one task). */
object Ranks {

  /** Exact global 1-based row number over the total order `order`,
    * written to column `out` (long). One range shuffle + one
    * hash-by-range-id window, both parallel. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    val ranged = df.repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
    val local = ranged.withColumn("_lrn",
      row_number().over(Window.partitionBy(col("_pid")).orderBy(order: _*))
        .cast("long"))
    // |partitions| rows: cumulative row counts of the ranges before each
    val offsets = local.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(sum(col("_n")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    local.join(broadcast(offsets), "_pid")
      .withColumn(out, col("_off") + col("_lrn"))
      .drop("_pid", "_lrn", "_off")
  }

  /** Exact `ntile(k)` over the total order `order` → column `out`
    * (long), bit-identical to the Window `ntile`: the first `N mod k`
    * buckets take `ceil(N/k)` rows, the rest `floor(N/k)`. Built on
    * [[globalRowNumber]] plus a broadcast one-row total — integer
    * arithmetic only. */
  def globalNtile(df: DataFrame, order: Seq[Column], k: Int, out: String): DataFrame = {
    val ranked = globalRowNumber(df, order, "_grn")
    val tot = ranked.agg(count(lit(1)).as("_tot"))
    ranked.crossJoin(broadcast(tot))
      .withColumn(out, expr(
        s"""CASE WHEN _grn <= (_tot % $k) * (_tot div $k + 1)
           |  THEN (_grn - 1) div (_tot div $k + 1) + 1
           |  ELSE _tot % $k +
           |    (_grn - (_tot % $k) * (_tot div $k + 1) - 1) div (_tot div $k)
           |    + 1 END""".stripMargin).cast("long"))
      .drop("_grn", "_tot")
  }
}
