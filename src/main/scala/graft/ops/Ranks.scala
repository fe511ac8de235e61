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
  * ranges, partition id increasing with key order), sort within each
  * range, then read each row's (partition, local offset) straight out
  * of `monotonically_increasing_id` — partition id in the high bits,
  * record index in the low 33 — and add broadcast cumulative range
  * offsets. The order must be TOTAL (include a unique tiebreaker
  * column); then the global rank is exact regardless of where the
  * sampled range bounds land. No per-row window at all: the only
  * window is the |partitions|-row offset cumsum, and the id frame is
  * localCheckpoint'ed so the offset side branch reads the same
  * materialized rows (determinism by construction, and the upstream is
  * never re-run).
  *
  * This is the exemplar SURVEY §5 prescribes for the aggregate-frame
  * global windows (q_rfm quartiles here; same recipe applies to the
  * abc/pareto/gini cumsums via a ranged running sum if their entity
  * frames ever outgrow one task). */
object Ranks {

  private val IdxBits = 33 // monotonically_increasing_id record-index field

  /** df + (rank column `out`, internal `_tot` count column — the
    * group's total when `part` is non-empty, the frame's otherwise).
    *
    * Per-group case: ranges are taken over (part ++ order), so each
    * group's rows are CONTIGUOUS within every range partition — a
    * row's local per-group offset is `_mid − min(_mid)` of its
    * (partition, group) cell, and the tiny broadcast frame carries one
    * row per cell (cumulative earlier-partition counts + group total). */
  private def ranked(df: DataFrame, part: Seq[Column],
      order: Seq[Column], out: String): DataFrame = {
    val keys = part ++ order
    val local = df.repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val partNames = part.indices.map(i => s"_g$i")
    val withPid = local.withColumn("_pid", shiftright(col("_mid"), IdxBits))
    val w = Window.partitionBy(partNames.map(col): _*).orderBy(col("_pid"))
    val cells = withPid
      .groupBy((col("_pid") +: part.zip(partNames)
        .map { case (c, n) => c.as(n) }): _*)
      .agg(count(lit(1)).as("_n"), min(col("_mid")).as("_mn"))
      .withColumn("_off", coalesce(sum(col("_n")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_tot", sum(col("_n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select((col("_pid") +: partNames.map(col)) ++
        Seq(col("_mn"), col("_off"), col("_tot")): _*)
    val joinCond = (col("_pid") === col("_cpid")) +: part.zip(partNames)
      .map { case (c, n) => c <=> col(n) }
    withPid.join(
        broadcast(cells.withColumnRenamed("_pid", "_cpid")),
        joinCond.reduce(_ && _))
      .withColumn(out, col("_off") + (col("_mid") - col("_mn")) + 1L)
      .drop(Seq("_pid", "_cpid", "_mid", "_mn", "_off") ++ partNames: _*)
  }

  /** Exact global 1-based row number over the total order `order`,
    * written to column `out` (long). One range shuffle, no per-row
    * window, |partitions|-row broadcast side frame. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    ranked(df, Seq.empty, order, out).drop("_tot")

  private def ntileExpr(k: Int): String =
    s"""CASE WHEN _grn <= (_tot % $k) * (_tot div $k + 1)
       |  THEN (_grn - 1) div (_tot div $k + 1) + 1
       |  ELSE _tot % $k +
       |    (_grn - (_tot % $k) * (_tot div $k + 1) - 1) div (_tot div $k)
       |    + 1 END""".stripMargin

  /** Exact `ntile(k)` over the total order `order` → column `out`
    * (long), bit-identical to the Window `ntile`: the first `N mod k`
    * buckets take `ceil(N/k)` rows, the rest `floor(N/k)`. Built on
    * the exact global rank plus integer arithmetic only. */
  def globalNtile(df: DataFrame, order: Seq[Column], k: Int, out: String): DataFrame =
    ranked(df, Seq.empty, order, "_grn")
      .withColumn(out, expr(ntileExpr(k)).cast("long"))
      .drop("_grn", "_tot")

  /** Per-group exact `ntile(k)` — `ntile(k) OVER (PARTITION BY part
    * ORDER BY order)` without sorting any single group on one task:
    * the group key rides the range partitioning, so a low-cardinality
    * group (the classic ntile-over-3-statuses hazard) still spreads
    * over many range partitions. */
  def groupNtile(df: DataFrame, part: Seq[Column], order: Seq[Column],
      k: Int, out: String): DataFrame =
    ranked(df, part, order, "_grn")
      .withColumn(out, expr(ntileExpr(k)).cast("long"))
      .drop("_grn", "_tot")

  /** Exact global RUNNING SUM of `value` over the total order `order`
    * → column `out`, without a single-partition window: ranges run
    * their local running sums in parallel and a broadcast
    * |partitions|-row frame adds each range's preceding-ranges total.
    * EXACT for integral values (the cent/micro-unit cumsums the
    * boundary-hardened queries use — long addition is associative, so
    * splitting the scan cannot move a threshold crossing); for
    * doubles the split changes accumulation order, so keep those on
    * the sequential window.
    *
    * The scale exemplar for the abc/pareto/gini cumsum family: their
    * entity frames are |parts|/|customers|-bounded today, and this is
    * the drop-in once such a frame outgrows one task. */
  def globalRunningSum(df: DataFrame, order: Seq[Column], value: Column,
      out: String): DataFrame = {
    val local = df.withColumn("_v", value)
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val withPid = local.withColumn("_pid", shiftright(col("_mid"), IdxBits))
    val offsets = withPid.groupBy(col("_pid")).agg(sum(col("_v")).as("_t"))
      .withColumn("_off", coalesce(sum(col("_t")).over(
        Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    val wLoc = Window.partitionBy(col("_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid.withColumn("_run", sum(col("_v")).over(wLoc))
      .join(broadcast(offsets), "_pid")
      .withColumn(out, col("_run") + col("_off"))
      .drop("_pid", "_mid", "_run", "_off", "_v")
  }
}
