package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Time-series risk / hazard / shape operators over the daily revenue
  * series and the event stream (SURVEY §2.2 growth, r13
  * continuation): historical VaR/CVaR, Nelson–Aalen cumulative
  * hazard, truncated-EMA MACD, and SAX symbolization.
  *
  * Cross-engine determinism contract (same as [[Stats]]): the
  * corpus-scaled work is integer-lattice rollups to calendar- or
  * event-time-bounded frames; order statistics ride exact ranged
  * [[Ranks]] scans or bounded-frame windows; doubles appear only in
  * final pinned-order expressions (the MACD weights are compile-time
  * Scala doubles embedded as full-precision literals in BOTH plans,
  * so no `pow` executes in either engine).
  */
object Series {

  private def rnd(c: Column, dp: Int) = {
    val s = math.pow(10, dp)
    floor(c * s + 0.5) / s
  }

  /** Daily revenue per returnflag on the exact e4 lattice (2dp price ×
    * 2dp discount — the [[Behavior.qStlDecompose]] convention). */
  private def dailyByFlag(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))

  /** Historical Value-at-Risk and CVaR (expected shortfall) of the
    * day-over-day revenue change per returnflag, at the 95 % and 99 %
    * levels. Corpus work is ONE rollup to the calendar-bounded daily
    * frame; deltas are exact e4 longs; the order statistic comes off
    * the exact ranged [[Ranks.groupRowNumber]] over the total
    * (delta, day) order, tail counts k = ceil(αn) by integer
    * arithmetic, and CVaR is a tail sum of exact longs — doubles only
    * in the four final divisions. */
  def qVarCvar(s: SparkSession, d: String): DataFrame = {
    val daily = dailyByFlag(s, d)
    val w = Window.partitionBy(col("flag")).orderBy(col("day"))
    val deltas = daily
      .withColumn("prev", lag(col("e4"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("flag"), col("day"), (col("e4") - col("prev")).as("delta"))
    val ranked = Ranks.groupRowNumber(deltas, Seq(col("flag")),
      Seq(col("delta"), col("day")), "rn", "n")
    ranked
      .withColumn("k95", expr("(n * 5 + 99) div 100"))
      .withColumn("k99", expr("(n + 99) div 100"))
      .groupBy(col("flag"))
      .agg(max(col("n")).as("n_deltas"),
        max(col("k95")).as("k95"), max(col("k99")).as("k99"),
        max(when(col("rn") === col("k95"), col("delta"))).as("d95"),
        sum(when(col("rn") <= col("k95"), col("delta"))).as("s95"),
        max(when(col("rn") === col("k99"), col("delta"))).as("d99"),
        sum(when(col("rn") <= col("k99"), col("delta"))).as("s99"))
      .select(col("flag"), col("n_deltas"), col("k95"), col("k99"),
        rnd(expr("-CAST(d95 AS DOUBLE) / 10000"), 2).as("var_95"),
        rnd(expr("-(CAST(s95 AS DOUBLE) / k95) / 10000"), 2)
          .as("cvar_95"),
        rnd(expr("-CAST(d99 AS DOUBLE) / 10000"), 2).as("var_99"),
        rnd(expr("-(CAST(s99 AS DOUBLE) / k99) / 10000"), 2)
          .as("cvar_99"))
      .orderBy(col("flag"))
  }

  /** Nelson–Aalen cumulative-hazard estimator over inter-purchase
    * lifetimes (the same right-censored lives frame as
    * [[Mining.qSurvivalKm]] — cites reference DatabaseManager.java's
    * absence of any analytics as the mandate). Each event time's
    * increment d/n is fixed to the 1e-9 lattice (identical double
    * division both engines, then round) so the cumulative sum is an
    * exact order-free long — no exp/log anywhere, unlike the KM
    * product-limit curve. */
  def qNelsonAalen(s: SparkSession, d: String): DataFrame = {
    val pe = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"))
    val horizon = pe.agg(max(col("ts_s")).as("hz"))
    val wU = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val lives = pe
      .withColumn("nxt", lead(col("ts_s"), 1).over(wU))
      .crossJoin(broadcast(horizon))
      .select(
        floor((coalesce(col("nxt"), col("hz")) - col("ts_s")) / 3600L)
          .cast("long").as("t"),
        col("nxt").isNotNull.as("observed"))
    val byT = lives.groupBy(col("t"))
      .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d_events"),
        sum(when(!col("observed"), 1L).otherwise(0L)).as("c_censored"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = lives.agg(count(lit(1)).as("n_total"))
    byT.crossJoin(broadcast(tot))
      .withColumn("at_risk",
        col("n_total") -
          coalesce(sum(col("d_events") + col("c_censored")).over(wPrev),
            lit(0L)))
      .filter(col("d_events") > 0)
      .withColumn("inc9",
        expr("CAST(round(1e9 * d_events / at_risk) AS BIGINT)"))
      .withColumn("cum9", sum(col("inc9")).over(wCum))
      .select(col("t"), col("at_risk"), col("d_events"),
        (col("inc9").cast("double") / 1e9).as("na_increment"),
        (col("cum9").cast("double") / 1e9).as("na_cum_hazard"))
      .orderBy(col("t"))
  }

  /** Single-changepoint detection (binary-segmentation first split)
    * per returnflag: the day t maximizing the between-segment
    * sum-of-squares gain, gain(t) ∝ (S_t·n − S·t)²/(t·(n−t)). The
    * numerator is an EXACT DECIMAL(38,0)⇄HUGEINT integer (prefix sums
    * on the e4 lattice), so both engines divide the IDENTICAL integer
    * pair — the argmax over identical doubles cannot flip. One rollup
    * to the calendar-bounded daily frame; prefix sums are long
    * windows over that bounded frame; ties break on the earlier day. */
  def qChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = dailyByFlag(s, d)
    val idx = Ranks.groupRowNumber(daily, Seq(col("flag")),
      Seq(col("day")), "rn", "n")
    val wCum = Window.partitionBy(col("flag")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.groupBy(col("flag")).agg(sum(col("e4")).as("s_all"))
    val g = idx
      .withColumn("s_t", sum(col("e4")).over(wCum))
      .join(broadcast(tot), "flag")
      .filter(col("rn") < col("n"))
      .withColumn("num", expr("CAST(s_t AS DECIMAL(38,0)) * n" +
        " - CAST(s_all AS DECIMAL(38,0)) * rn"))
      .withColumn("gain", expr("CAST(num * num AS DOUBLE)" +
        " / (CAST(rn AS DOUBLE) * (n - rn))"))
    val wTop = Window.partitionBy(col("flag"))
      .orderBy(col("gain").desc, col("rn"))
    g.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") === 1)
      .select(col("flag"), col("day").as("cp_day"), col("rn").as("t"),
        col("n").as("n_days"),
        rnd(expr("CAST(s_t AS DOUBLE) / rn / 10000"), 2)
          .as("mean_before"),
        rnd(expr("CAST(s_all - s_t AS DOUBLE) / (n - rn) / 10000"), 2)
          .as("mean_after"))
      .orderBy(col("flag"))
  }

  /** Dickey–Fuller unit-root test on the global daily revenue series:
    * Δy_t = α + β·y_{t−1} + ε, t_DF = β̂/se(β̂) — stationarity
    * screening before any ARIMA-style modelling. All regression
    * moments are exact (y on the e4 lattice, cross-products on
    * DECIMAL(38,0)⇄HUGEINT), SSE via the moment identity (no per-row
    * residual sum) — the [[Stats.qOlsDiagnostics]] convention on the
    * lagged-difference regression. */
  def qDickeyFuller(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
    val w = Window.orderBy(col("day"))
    val pairs = daily
      .withColumn("ylag", lag(col("e4"), 1).over(w))
      .filter(col("ylag").isNotNull)
      .select((col("e4") - col("ylag")).as("dy"), col("ylag").as("x"))
    pairs.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(col("dy")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * dy")).as("sxy"),
        sum(expr("CAST(dy AS DECIMAL(38,0)) * dy")).as("syy"))
      .withColumn("beta", expr(
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
          " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"))
      .withColumn("alpha", expr(
        "(CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE)) / n"))
      .withColumn("sse", expr(
        "CAST(syy AS DOUBLE) - alpha * CAST(sy AS DOUBLE)" +
          " - beta * CAST(sxy AS DOUBLE)"))
      .withColumn("s2", expr("sse / (n - 2)"))
      .withColumn("sxxc", expr(
        "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)" +
          " * (CAST(sx AS DOUBLE) / n)"))
      .select(col("n"),
        rnd(expr("alpha / 10000"), 2).as("alpha_dollars"),
        rnd(expr("beta * 1e8"), 4).as("beta_e8"),
        rnd(expr("beta / sqrt(s2 / sxxc)"), 4).as("t_df"))
  }

  /** Turning-points randomness test of the daily revenue series: the
    * count of local extrema vs the i.i.d. expectation 2(n−2)/3 with
    * variance (16n−29)/90 — the cheap complement to
    * [[Stats.qRunsTest]]. Extrema are PURE INTEGER comparisons on the
    * e4 lattice (strict by construction: ties produce no turning
    * point, documented), μ and σ² exact rationals, z one pinned
    * double. */
  def qTurningPoints(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
    val w = Window.orderBy(col("day"))
    daily
      .withColumn("prev", lag(col("e4"), 1).over(w))
      .withColumn("nxt", lead(col("e4"), 1).over(w))
      .filter(col("prev").isNotNull && col("nxt").isNotNull)
      .agg(count(lit(1)).as("n_interior"),
        sum(when((col("e4") > col("prev") && col("e4") > col("nxt")) ||
          (col("e4") < col("prev") && col("e4") < col("nxt")), 1L)
          .otherwise(0L)).as("n_turns"))
      .withColumn("n", col("n_interior") + 2)
      .select(col("n"), col("n_turns"),
        rnd(expr("2.0 * (n - 2) / 3"), 4).as("expected_turns"),
        rnd(expr("(n_turns - 2.0 * (n - 2) / 3)" +
          " / sqrt((16.0 * n - 29) / 90)"), 4).as("z_stat"))
  }

  /** Shewhart X̄-R control chart over weekly subgroups of daily
    * revenue: center lines and control limits from the classic
    * A2/D3/D4 constants (n=7 subgroups), plus the out-of-control
    * census — the SPC readout. Subgroup means/ranges are exact
    * integer rationals (mean kept as sum + count); limits are pinned
    * doubles shared by every subgroup row, and every violation flag
    * compares IDENTICAL doubles. Complete weeks only. */
  def qControlChart(s: SparkSession, d: String): DataFrame = {
    val (a2, d3, d4) = (0.419, 0.076, 1.924) // n=7 SPC constants
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
    val weeks = daily
      .withColumn("week", date_trunc("week", col("day")).cast("date"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_days"), sum(col("e4")).as("s"),
        (max(col("e4")) - min(col("e4"))).as("r"))
      .filter(col("n_days") === 7)
      .localCheckpoint(true)
    val lims = broadcast(weeks.agg(count(lit(1)).as("n_weeks"),
        sum(col("s")).as("ss"), sum(col("r")).as("sr"))
      .select(col("n_weeks"),
        expr("CAST(ss AS DOUBLE) / n_weeks / 7").as("xbb"),
        expr("CAST(sr AS DOUBLE) / n_weeks").as("rb")))
    weeks.crossJoin(lims)
      .select(col("week"),
        rnd(expr("CAST(s AS DOUBLE) / 7 / 10000"), 2).as("xbar"),
        rnd(expr("CAST(r AS DOUBLE) / 10000"), 2).as("range_w"),
        rnd(expr("xbb / 10000"), 2).as("center"),
        rnd(expr(s"(xbb + $a2 * rb) / 10000"), 2).as("ucl_x"),
        rnd(expr(s"(xbb - $a2 * rb) / 10000"), 2).as("lcl_x"),
        (expr(s"CAST(s AS DOUBLE) / 7 > xbb + $a2 * rb") ||
          expr(s"CAST(s AS DOUBLE) / 7 < xbb - $a2 * rb")).as("ooc_mean"),
        (expr(s"CAST(r AS DOUBLE) > $d4 * rb") ||
          expr(s"CAST(r AS DOUBLE) < $d3 * rb")).as("ooc_range"))
      .orderBy(col("week"))
  }

  /** Two-group log-rank test over the same right-censored
    * inter-purchase lives frame as [[qNelsonAalen]] (groups = the
    * portable md5 halves of the user id) — "do the two cohorts churn
    * at the same rate", completing the survival family
    * (KM / Nelson–Aalen / log-rank). Per event time, the expected
    * group-1 deaths d·n₁/n and the hypergeometric variance are fixed
    * to 1e-6 integers (identical double ratios of exact longs), so
    * the O−E and V folds are order-free long sums; χ² is one pinned
    * double. */
  def qLogRank(s: SparkSession, d: String): DataFrame = {
    val pe = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"),
        pmod(graft.functions.exprs.md5Lower64(
            col("user_id").cast("string"))
          .bitwiseAND(lit(Long.MaxValue)), lit(2L)).as("grp"))
    val horizon = pe.agg(max(col("ts_s")).as("hz"))
    val wU = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val lives = pe
      .withColumn("nxt", lead(col("ts_s"), 1).over(wU))
      .crossJoin(broadcast(horizon))
      .select(col("grp"),
        floor((coalesce(col("nxt"), col("hz")) - col("ts_s")) / 3600L)
          .cast("long").as("t"),
        col("nxt").isNotNull.as("observed"))
    val byT = lives.groupBy(col("t"))
      .agg(sum(when(col("observed") && col("grp") === 0, 1L)
          .otherwise(0L)).as("d0"),
        sum(when(col("observed") && col("grp") === 1, 1L)
          .otherwise(0L)).as("d1"),
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("r0"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("r1"))
    val tot = broadcast(lives.groupBy()
      .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n0_tot"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n1_tot")))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rows = byT.crossJoin(tot)
      .withColumn("n0",
        col("n0_tot") - coalesce(sum(col("r0")).over(wPrev), lit(0L)))
      .withColumn("n1",
        col("n1_tot") - coalesce(sum(col("r1")).over(wPrev), lit(0L)))
      .withColumn("dd", col("d0") + col("d1"))
      .withColumn("nn", col("n0") + col("n1"))
      .filter(col("dd") > 0 && col("nn") > 1)
      .withColumn("e1_6", expr("CAST(round(1e6 * dd * n1" +
        " / CAST(nn AS DOUBLE)) AS BIGINT)"))
      .withColumn("v6", expr("CAST(round(1e6 * dd" +
        " * (CAST(n1 AS DOUBLE) / nn) * (CAST(n0 AS DOUBLE) / nn)" +
        " * (nn - dd) / (nn - 1)) AS BIGINT)"))
    rows.agg(sum(col("d0")).as("o0"), sum(col("d1")).as("o1"),
        sum(col("e1_6")).as("e1_6"), sum(col("v6")).as("v6"))
      .select(col("o0"), col("o1"),
        rnd(expr("CAST(e1_6 AS DOUBLE) / 1e6"), 4).as("e1"),
        rnd(expr("(o1 - CAST(e1_6 AS DOUBLE) / 1e6)" +
          " * (o1 - CAST(e1_6 AS DOUBLE) / 1e6)" +
          " / (CAST(v6 AS DOUBLE) / 1e6)"), 4).as("chi2"))
  }

  /** Sample ACF (lags 1–3) + PACF via the closed-form Durbin–Levinson
    * recursion over the global daily revenue series — the ARIMA
    * order-selection readout beside [[qDickeyFuller]]. Every ρ_k is
    * an EXACT integer ratio: multiplying the centered-moment formula
    * through by n² gives numerator n²Σx_t x_{t+k} − nS(Σ_head+Σ_tail)
    * + (n−k)S² and denominator n(nΣx²−S²), both DECIMAL(38,0)⇄HUGEINT
    * — so both engines derive the PACF from IDENTICAL ρ doubles
    * through one pinned expression. Lag products ride equi-joins on
    * (day + k), calendar-bounded. */
  def qPacf(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .localCheckpoint(true)
    val base = broadcast(daily.agg(count(lit(1)).as("n"),
      sum(col("e4")).as("s1"),
      sum(expr("CAST(e4 AS DECIMAL(38,0)) * e4")).as("sxx")))
    def lagMoments(k: Int): DataFrame =
      daily.as("x").join(daily.as("y"),
          expr(s"date_add(x.day, $k) = y.day"))
        .agg(sum(expr("CAST(x.e4 AS DECIMAL(38,0)) * y.e4")).as(s"sp$k"),
          sum(col("x.e4")).as(s"sh$k"), sum(col("y.e4")).as(s"st$k"),
          count(lit(1)).as(s"m$k"))
    val m = lagMoments(1).crossJoin(lagMoments(2)).crossJoin(lagMoments(3))
      .crossJoin(base)
    // pair counts m_k are ACTUAL calendar-lag pair counts (the daily
    // frame can have gaps), so the centered identity uses m_k, not n−k
    def rho(k: Int) =
      s"CAST(CAST(n AS DECIMAL(38,0)) * n * sp$k" +
        s" - CAST(n AS DECIMAL(38,0)) * s1 * (sh$k + st$k)" +
        s" + CAST(m$k AS DECIMAL(38,0)) * s1 * s1 AS DOUBLE)" +
        s" / CAST(CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0))" +
        s" * sxx - CAST(s1 AS DECIMAL(38,0)) * s1) AS DOUBLE)"
    m.withColumn("r1", expr(rho(1)))
      .withColumn("r2", expr(rho(2)))
      .withColumn("r3", expr(rho(3)))
      .withColumn("p22", expr("(r2 - r1 * r1) / (1 - r1 * r1)"))
      .withColumn("p21", expr("r1 - p22 * r1"))
      .withColumn("p33", expr("(r3 - p21 * r2 - p22 * r1)" +
        " / (1 - p21 * r1 - p22 * r2)"))
      .select(col("n"),
        rnd(col("r1"), 6).as("rho1"), rnd(col("r2"), 6).as("rho2"),
        rnd(col("r3"), 6).as("rho3"),
        rnd(col("r1"), 6).as("pacf1"), rnd(col("p22"), 6).as("pacf2"),
        rnd(col("p33"), 6).as("pacf3"))
  }

  /** MACD weight vectors, shared by the Spark plan and the generated
    * oracle SQL so no `pow` executes in either engine: truncated EMA
    * with span-α weights α(1−α)^k, k < K (the [[Behavior.qEwma]]
    * truncation convention — the STATISTIC is the truncated form,
    * replayed identically both sides). */
  private[graft] val macdFast: Seq[Double] =
    (0 until 24).map(k => (2.0 / 13) * math.pow(11.0 / 13, k))
  private[graft] val macdSlow: Seq[Double] =
    (0 until 40).map(k => (2.0 / 27) * math.pow(25.0 / 27, k))
  private[graft] val macdSig: Seq[Double] =
    (0 until 18).map(k => (2.0 / 10) * math.pow(8.0 / 10, k))

  /** MACD (12/26/9 EMA convergence-divergence) over the global daily
    * revenue series: macd = EMA12 − EMA26, signal = EMA9 of macd,
    * histogram = macd − signal. The EMAs are the truncated-window
    * form (normalized by the present-weight sum, so the series warms
    * up exactly like [[Behavior.qEwma]]); the weights are Scala
    * compile-time doubles embedded as full-precision literals in both
    * plans. Every EMA STAGE is re-pinned onto an integer lattice
    * (e7 = e4·1000) before anything consumes it — the round-then-fold
    * convention — so macd, signal and histogram are integer
    * differences and the final 4-dp rounding divides identical
    * rationals. (DuckDB parses bare decimal literals as
    * DECIMAL(18,17) and would accumulate the EMA numerator in exact
    * decimal while Spark folds binary doubles; the oracle therefore
    * CASTs every weight literal to DOUBLE so both engines fold the
    * same left-associated double chain, and the per-stage lattice
    * rounds bound any residual divergence away from the output
    * grid.) */
  def qMacd(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
    val w = Window.orderBy(col("day"))
    def ema(src: Column, weights: Seq[Double]): Column = {
      val terms = weights.zipWithIndex.map { case (wt, k) =>
        val x = lag(src, k).over(w)
        (when(x.isNotNull, x * lit(wt)), when(x.isNotNull, lit(wt)))
      }
      val num = terms.map(_._1)
        .reduce((a, b) => coalesce(a, lit(0.0)) + coalesce(b, lit(0.0)))
      val den = terms.map(_._2)
        .reduce((a, b) => coalesce(a, lit(0.0)) + coalesce(b, lit(0.0)))
      num / den
    }
    val withMacd = daily
      .withColumn("fast_e7",
        floor(ema(col("e4"), macdFast) * 1000 + lit(0.5)).cast("long"))
      .withColumn("slow_e7",
        floor(ema(col("e4"), macdSlow) * 1000 + lit(0.5)).cast("long"))
      .withColumn("macd_e7", col("fast_e7") - col("slow_e7"))
    withMacd
      .withColumn("sig_e7",
        floor(ema(col("macd_e7"), macdSig) + lit(0.5)).cast("long"))
      .select(col("day"),
        rnd(col("e4").cast("double") / 10000, 2).as("revenue"),
        rnd(col("macd_e7").cast("double") / 1e7, 4).as("macd"),
        rnd(col("sig_e7").cast("double") / 1e7, 4).as("signal"),
        rnd((col("macd_e7") - col("sig_e7")).cast("double") / 1e7, 4)
          .as("histogram"))
      .orderBy(col("day"))
  }

  /** SAX symbolization (PAA + quantile alphabet) of each returnflag's
    * daily revenue series: 16 equal-count PAA segments (integer
    * index arithmetic), each segment's floor-mean on the exact e4
    * lattice, segments ranked per flag and mapped to a 4-letter
    * alphabet by rank quartile (a=lowest), plus the per-flag 16-char
    * SAX word. Quantile breakpoints never exist as doubles — the
    * alphabet is assigned by INTEGER rank arithmetic, so no boundary
    * value can flip cross-engine. Day indexes and segment ranks ride
    * exact ranged [[Ranks.groupRowNumber]] scans. */
  def qSaxPaa(s: SparkSession, d: String): DataFrame = {
    val nSegs = 16
    val daily = dailyByFlag(s, d)
    val idx = Ranks.groupRowNumber(daily, Seq(col("flag")),
      Seq(col("day")), "rn", "n_days")
    val segs = idx
      .withColumn("seg", expr(s"((rn - 1) * $nSegs) div n_days"))
      .groupBy(col("flag"), col("seg"))
      .agg(count(lit(1)).as("n_seg_days"), sum(col("e4")).as("seg_e4"),
        max(col("n_days")).as("n_days"))
      .withColumn("mean_e4", expr("seg_e4 div n_seg_days"))
    val ranked = Ranks.groupRowNumber(segs, Seq(col("flag")),
      Seq(col("mean_e4"), col("seg")), "srank", "_segtot")
      .withColumn("sym",
        expr(s"chr(97 + ((srank - 1) * 4) div $nSegs)"))
    val words = ranked.groupBy(col("flag"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("seg"), col("sym")))),
        x => x.getField("sym")), "").as("sax_word"))
    ranked.join(broadcast(words), "flag")
      .select(col("flag"), col("seg"), col("n_seg_days"),
        rnd(col("mean_e4").cast("double") / 10000, 2).as("seg_mean"),
        col("sym"), col("sax_word"))
      .orderBy(col("flag"), col("seg"))
  }

  /** Market beta + alpha of each returnflag's daily revenue against
    * the whole-corpus daily revenue (the hedge-ratio OLS a risk desk
    * runs per instrument vs the index): β = (nΣxy − ΣxΣy)/(nΣy² −
    * (Σy)²), α = (Σx − βΣy)/n over the flag's ACTUAL traded days (the
    * q_pacf calendar-gap rule — pair count from the day join, never
    * n−k). All moments exact on DECIMAL(38,0)⇄HUGEINT over the e4
    * lattice — sized so nΣxy stays ≈1e34 even at sf100 — with doubles
    * only at the two final divisions of identical rationals. One
    * rollup to the calendar-bounded frame; the day join is
    * broadcast-sized. */
  def qBetaHedge(s: SparkSession, d: String): DataFrame = {
    val daily = dailyByFlag(s, d)
    val tot = daily.groupBy(col("day"))
      .agg(sum(col("e4")).as("y4"))
    val m = daily.join(tot, "day")
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
        sum(col("e4")).as("sx"), sum(col("y4")).as("sy"),
        sum(expr("CAST(e4 AS DECIMAL(38,0)) * y4")).as("sxy"),
        sum(expr("CAST(y4 AS DECIMAL(38,0)) * y4")).as("syy"))
    m.select(col("flag"), col("n").as("n_days"),
        rnd(expr("CAST(sxy * n - CAST(sx AS DECIMAL(38,0)) * sy" +
          " AS DOUBLE)") /
          expr("CAST(syy * n - CAST(sy AS DECIMAL(38,0)) * sy" +
            " AS DOUBLE)"), 6).as("beta"),
        rnd((col("sx").cast("double") -
          expr("CAST(sxy * n - CAST(sx AS DECIMAL(38,0)) * sy" +
            " AS DOUBLE)") /
          expr("CAST(syy * n - CAST(sy AS DECIMAL(38,0)) * sy" +
            " AS DOUBLE)") * col("sy").cast("double")) /
          col("n") / 10000, 2).as("alpha"))
      .orderBy(col("flag"))
  }

  /** Information ratio and tracking error of returnflag A's daily
    * revenue returns against the whole-corpus "market" returns — the
    * active-management readout beside [[qBetaHedge]]'s exposure and
    * [[qSharpeSortino]]'s absolute risk. Both return series fix to
    * the exact e-9 lattice by integer division on ACTUAL traded days
    * (the q_pacf calendar-gap rule via the day join), the active
    * difference d = r_a − r_m is an exact long, and IR/TE are
    * pinned-order doubles over the integer moments (Σd long,
    * Σd² DECIMAL⇄HUGEINT). */
  def qInformationRatio(s: SparkSession, d: String): DataFrame = {
    val byFlag = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(when(col("l_returnflag") === "A",
        round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long"))
        .otherwise(0L)).as("a4"),
        sum(round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long"))
          .as("m4"))
      .filter(col("a4") > 0)
    val w1 = Window.orderBy(col("day"))
    byFlag
      .withColumn("pa", lag(col("a4"), 1).over(w1))
      .withColumn("pm", lag(col("m4"), 1).over(w1))
      .filter(col("pa").isNotNull)
      .withColumn("d", expr(
        "(CAST(a4 AS DECIMAL(38,0)) * 1000000000) div pa" +
          " - (CAST(m4 AS DECIMAL(38,0)) * 1000000000) div pm"))
      .agg(count(lit(1)).as("n_days"), sum(col("d")).as("sd"),
        sum(expr("CAST(d AS DECIMAL(38,0)) * d")).as("sdd"))
      .select(col("n_days"),
        rnd(col("sd").cast("double") / col("n_days") / 1e9, 6)
          .as("mean_active_ret"),
        rnd(sqrt(expr(
          "CAST(sdd * n_days - CAST(sd AS DECIMAL(38,0)) * sd" +
            " AS DOUBLE)") /
          (col("n_days").cast("double") * (col("n_days") - 1))) / 1e9,
          6).as("tracking_error"),
        rnd((col("sd").cast("double") / col("n_days")) /
          sqrt(expr(
            "CAST(sdd * n_days - CAST(sd AS DECIMAL(38,0)) * sd" +
              " AS DOUBLE)") /
            (col("n_days").cast("double") * (col("n_days") - 1))), 4)
          .as("information_ratio"))
  }

  /** Page–Hinkley mean-shift detector over the daily revenue series
    * (global-mean, δ=0 form): U_t = Σ_{i≤t}(x_i − x̄),
    * PH = max_t (U_t − min_{s≤t} U_s) — the classic sequential
    * change alarm beside [[qChangepoint]]'s offline split. Runs on
    * the n-SCALED integer lattice (ũ_t sums n·x_i − S — no float
    * mean, the q_kpss convention), so the cumulative path, its
    * running minimum and the max gap are ALL exact integers; the
    * alarm day is the FIRST argmax on the total (gap, day) order and
    * PH converts to dollars in one final division. */
  def qPageHinkley(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("e4")).as("s"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(tot))
      .withColumn("u", sum(expr(
        "CAST(n AS DECIMAL(38,0)) * e4 - s")).over(w))
      .withColumn("runmin", min(col("u")).over(w))
      .withColumn("gap", col("u") - col("runmin"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("gap").desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col("n").as("n_days"), col("day").as("alarm_day"),
        (floor(expr("CAST(gap AS DOUBLE) / n / 10000") * 100 + 0.5)
          / 100).as("ph_dollars"))
  }

  /** Daily VWAP (volume-weighted average price) of lineitem trades:
    * Σprice/Σqty per ship day — the execution-quality benchmark every
    * trading/market pipeline reports. ONE corpus-scaled rollup
    * (map-side partial sums) to the calendar-bounded daily frame;
    * both sums exact longs (cents ≤ ~3e17 corpus-wide at sf100,
    * ledger-registered), VWAP one final division of identical
    * integers. */
  def qVwap(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_trades"),
        sum(round(col("l_quantity")).cast("long")).as("qty_sum"),
        sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("rev_cents"))
      .select(col("day"), col("n_trades"), col("qty_sum"),
        col("rev_cents"),
        rnd(col("rev_cents").cast("double") / col("qty_sum") / 100, 4)
          .as("vwap"))
      .orderBy(col("day"))

  /** Daily closes of the events value series in exact cents, with the
    * deterministic last-of-day tie rule (ts, event_id) — the shared
    * base frame for [[qAtr]] and [[qStochasticOsc]]. */
  private def dailyCloseCents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("c"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .groupBy(col("day"))
      .agg(max(col("c")).as("h"), min(col("c")).as("l"),
        max_by(col("c"), struct(col("us"), col("event_id"))).as("cl"))

  /** Average True Range (14-day SMA variant) over the daily events
    * value series: TR = max(H−L, |H−C₋₁|, |L−C₋₁|) in exact cents,
    * ATR the 14-row window mean — the volatility sizing input beside
    * [[Behavior.qBollinger]]'s bands. The corpus collapses to the
    * calendar-bounded daily frame in one rollup; TR and its window
    * sum are exact longs (order-free — the §5 float-window hazard
    * never engages), ATR one final division. Full windows only. */
  def qAtr(s: SparkSession, d: String): DataFrame = {
    val w1 = Window.orderBy(col("day"))
    val w14 = Window.orderBy(col("day")).rowsBetween(-13, 0)
    dailyCloseCents(s, d)
      .withColumn("cp", lag(col("cl"), 1).over(w1))
      .filter(col("cp").isNotNull)
      .withColumn("tr", greatest(col("h") - col("l"),
        abs(col("h") - col("cp")), abs(col("l") - col("cp"))))
      .withColumn("rn", row_number().over(w1))
      .withColumn("s14", sum(col("tr")).over(w14))
      .filter(col("rn") >= 14)
      .select(col("day"), col("tr").as("tr_cents"),
        rnd(col("s14").cast("double") / 14 / 100, 4).as("atr14"))
      .orderBy(col("day"))
  }

  /** Stochastic oscillator (%K 14, %D 3) over the daily events close:
    * %K = 100·(C−L14)/(H14−L14), %D its 3-day mean — the
    * overbought/oversold momentum readout beside [[qAtr]]. %K is
    * FIXED to the exact micro lattice by integer division
    * ((C−L14)·10⁸ div range — both engines floor the same integers),
    * so the 3-row %D mean is an order-free long sum; doubles only at
    * the two final down-scalings. Window extrema are exact cents. */
  def qStochasticOsc(s: SparkSession, d: String): DataFrame = {
    val w1 = Window.orderBy(col("day"))
    val w14 = Window.orderBy(col("day")).rowsBetween(-13, 0)
    val w3 = Window.orderBy(col("day")).rowsBetween(-2, 0)
    dailyCloseCents(s, d)
      .withColumn("rn", row_number().over(w1))
      .withColumn("l14", min(col("l")).over(w14))
      .withColumn("h14", max(col("h")).over(w14))
      .filter(col("rn") >= 14)
      .withColumn("k_micro",
        expr("((cl - l14) * 100000000) div nullif(h14 - l14, 0)"))
      .withColumn("rn2", row_number().over(w1))
      .withColumn("d_sum", sum(col("k_micro")).over(w3))
      .withColumn("d_n", count(col("k_micro")).over(w3))
      .filter(col("rn2") >= 3)
      .select(col("day"),
        rnd(col("k_micro").cast("double") / 1e6, 4).as("pct_k"),
        rnd(col("d_sum").cast("double") / col("d_n") / 1e6, 4)
          .as("pct_d"))
      .orderBy(col("day"))
  }

  /** Amihud illiquidity over the daily revenue series: mean of
    * |return| / volume, the price-impact-per-unit-flow proxy (here:
    * |day-over-day revenue move| per unit quantity). Each day's term
    * is ONE integer division on the e-12 lattice
    * (|Δe4|·10¹² div (e4₋₁·qty) — DECIMAL numerator/denominator, LONG
    * result, ledger-registered), so the cross-day mean is an
    * order-free long sum — no float accumulation anywhere. */
  def qAmihudIlliq(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"),
        sum(round(col("l_quantity")).cast("long")).as("vol"))
    val w1 = Window.orderBy(col("day"))
    daily
      .withColumn("pe4", lag(col("e4"), 1).over(w1))
      .filter(col("pe4").isNotNull)
      .withColumn("t12", expr("(CAST(abs(e4 - pe4) AS DECIMAL(38,0))" +
        " * 1000000000000) div (CAST(pe4 AS DECIMAL(38,0)) * vol)"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("t12")).as("_s"), max(col("t12")).as("max_illiq_e12"))
      .select(col("n_days"),
        rnd(col("_s").cast("double") / col("n_days"), 4)
          .as("mean_illiq_e12"),
        col("max_illiq_e12"))
  }

  /** Annualization-free Sharpe and Sortino ratios of the daily revenue
    * return series: returns FIXED to the exact e-9 lattice by integer
    * division (e4ₜ·10⁹ div e4ₜ₋₁ − 10⁹ — identical floors both
    * engines), so ALL moments (Σr long, Σr² and downside Σr² on
    * DECIMAL(38,0)⇄HUGEINT) are order-free exact sums; the two ratios
    * are pinned-order doubles over those identical integers. Sortino
    * uses the 0-target downside deviation over all n days. */
  def qSharpeSortino(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
    val w1 = Window.orderBy(col("day"))
    daily
      .withColumn("pe4", lag(col("e4"), 1).over(w1))
      .filter(col("pe4").isNotNull)
      .withColumn("r", expr(
        "(CAST(e4 AS DECIMAL(38,0)) * 1000000000) div pe4 - 1000000000"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("r")).as("sr"),
        sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("srr"),
        sum(when(col("r") < 0, expr("CAST(r AS DECIMAL(38,0)) * r"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sdn"),
        sum(when(col("r") < 0, 1L).otherwise(0L)).as("n_down"))
      .select(col("n_days"), col("n_down"),
        rnd(col("sr").cast("double") / col("n_days") / 1e9, 6)
          .as("mean_ret"),
        // the e-9 units cancel between mean and deviation, so the
        // ratios need no rescale
        rnd((col("sr").cast("double") / col("n_days")) /
          sqrt(expr("CAST(srr * n_days - CAST(sr AS DECIMAL(38,0)) * sr" +
            " AS DOUBLE)") /
            (col("n_days").cast("double") * (col("n_days") - 1))), 4)
          .as("sharpe"),
        rnd((col("sr").cast("double") / col("n_days")) /
          sqrt(col("sdn").cast("double") / col("n_days")), 4)
          .as("sortino"))
  }
}
