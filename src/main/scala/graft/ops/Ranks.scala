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

  /** Per-group exact 1-based row number over `order` within `part` →
    * column `out`, with the group's total row count in `totOut` — the
    * order-statistic-selection primitive (k-th smallest per group =
    * filter `out` == k(`totOut`)) without sorting any single group on
    * one task: the group key rides the range partitioning, so a
    * low-cardinality group (5 order priorities over 10⁹ rows) still
    * spreads over many range partitions. */
  def groupRowNumber(df: DataFrame, part: Seq[Column], order: Seq[Column],
      out: String, totOut: String): DataFrame =
    ranked(df, part, order, out).withColumnRenamed("_tot", totOut)

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
      out: String): DataFrame =
    globalScan(df, order, sums = Seq(value -> out))

  /** Exact global running MAX of `value` over STRICTLY PRECEDING rows
    * in the total order `order` → column `out` (null on the global
    * first row) — the skyline/frontier primitive: a point ordered by
    * one criterion survives iff its other criterion beats the running
    * max of every earlier point. Max is associative AND idempotent, so
    * the ranged split is exact for any orderable type (dates
    * included) and there is no single-task sort anywhere: each range
    * runs its local exclusive running max and a broadcast
    * |partitions|-row frame supplies the max of all earlier ranges. */
  def globalRunningMaxPrev(df: DataFrame, order: Seq[Column], value: Column,
      out: String): DataFrame =
    globalScan(df, order, maxPrev = Seq(value -> out))

  /** The shared one-range-shuffle scan: over the TOTAL order `order`,
    * emits any combination of an exact global row number (`rank`,
    * long), exact INCLUSIVE running sums (`sums`, exact for integral
    * values — long addition is associative), and exact EXCLUSIVE
    * running maxes (`maxPrev`, exact for any type — max is associative
    * and idempotent). One `repartitionByRange` + local sort; per-row
    * work is per-partition windows only; the cross-range state is a
    * broadcast |partitions|-row offset frame (cumulative
    * count/sum/max of the EARLIER ranges). Requesting several outputs
    * shares the single shuffle — the reason q_power_users_pareto's
    * rank+cumsum costs one exchange, not two. */
  def globalScan(df: DataFrame, order: Seq[Column],
      rank: Option[String] = None,
      sums: Seq[(Column, String)] = Nil,
      maxPrev: Seq[(Column, String)] = Nil): DataFrame = {
    val sumIn = sums.indices.map(i => s"_v$i")
    val maxIn = maxPrev.indices.map(j => s"_m$j")
    val valued = sums.zip(sumIn).foldLeft(
        maxPrev.zip(maxIn).foldLeft(df) { case (acc, ((c, _), n)) =>
          acc.withColumn(n, c) }) { case (acc, ((c, _), n)) =>
      acc.withColumn(n, c) }
    val local = valued
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val withPid = local.withColumn("_pid", shiftright(col("_mid"), IdxBits))
    // rank bookkeeping (per-range counts + min id) only when asked:
    // the sums/max-only paths skip those aggregates and broadcast
    // columns entirely
    require(rank.isDefined || sums.nonEmpty || maxPrev.nonEmpty,
      "globalScan needs at least one output")
    val aggs =
      (if (rank.isDefined)
        Seq(count(lit(1)).as("_n"), min(col("_mid")).as("_mn"))
      else Seq.empty) ++
        sumIn.map(n => sum(col(n)).as(s"_t$n")) ++
        maxIn.map(n => max(col(n)).as(s"_x$n"))
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rankOffCols =
      if (rank.isDefined)
        Seq(coalesce(sum(col("_n")).over(wOff), lit(0L)).as("_offN"),
          col("_mn"))
      else Seq.empty
    val offsets = withPid.groupBy(col("_pid")).agg(aggs.head, aggs.tail: _*)
      .select((col("_pid") +: rankOffCols) ++
        sumIn.map(n => sum(col(s"_t$n")).over(wOff).as(s"_off$n")) ++
        maxIn.map(n => max(col(s"_x$n")).over(wOff).as(s"_off$n")): _*)
    val wInc = Window.partitionBy(col("_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExc = Window.partitionBy(col("_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val localised = sumIn.foldLeft(
        maxIn.foldLeft(withPid) { (acc, n) =>
          acc.withColumn(s"_run$n", max(col(n)).over(wExc)) }) { (acc, n) =>
      acc.withColumn(s"_run$n", sum(col(n)).over(wInc))
    }
    val joined = localised.join(broadcast(offsets), "_pid")
    val withSums = sums.map(_._2).zip(sumIn).foldLeft(joined) {
      case (acc, (out, n)) =>
        // type-generic null-safe add: the first range has no offset
        acc.withColumn(out, when(col(s"_off$n").isNull, col(s"_run$n"))
          .otherwise(col(s"_run$n") + col(s"_off$n")))
    }
    val withMaxes = maxPrev.map(_._2).zip(maxIn).foldLeft(withSums) {
      case (acc, (out, n)) =>
        acc.withColumn(out,
          when(col(s"_run$n").isNull, col(s"_off$n"))
            .when(col(s"_off$n").isNull, col(s"_run$n"))
            .otherwise(greatest(col(s"_run$n"), col(s"_off$n"))))
    }
    val withRank = rank.fold(withMaxes)(out => withMaxes
      .withColumn(out, col("_offN") + (col("_mid") - col("_mn")) + 1L))
    withRank.drop(Seq("_pid", "_mid", "_mn", "_offN") ++
      sumIn.flatMap(n => Seq(n, s"_run$n", s"_off$n")) ++
      maxIn.flatMap(n => Seq(n, s"_run$n", s"_off$n")): _*)
  }
}
