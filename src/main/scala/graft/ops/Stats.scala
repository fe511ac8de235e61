package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Classical statistical tests / econometric indexes over the TPC-H-ish
  * star schema (SURVEY §2.2 growth, r13 continuation): Jarque–Bera
  * normality, Kruskal–Wallis rank ANOVA, Wald–Wolfowitz runs test,
  * Herfindahl–Hirschman concentration, Laspeyres/Paasche/Fisher price
  * indexes.
  *
  * Cross-engine determinism contract (same as [[Mining]] /
  * [[Behavior]]): every data-scaled aggregation runs on an exact
  * integer lattice (quantities are integers; money on the cent /
  * 1e-4 "e4" lattice; ranks on the doubled-rank lattice so
  * tie-averages stay integral; wide products on DECIMAL(38,0) ⇄
  * DuckDB HUGEINT), and doubles appear only in a final pinned-order
  * IEEE expression over those identical integers — add/mul/div/sqrt
  * are correctly rounded, so both engines emit the same bits. No
  * libm calls (pow/exp/erf) anywhere.
  */
object Stats {

  /** Round-half-up to `dp` decimals via the explicit floor lattice
    * (identical semantics both engines — SQL `round()` half-even vs
    * half-up differences never enter). */
  private def rnd(c: org.apache.spark.sql.Column, dp: Int) = {
    val s = math.pow(10, dp)
    floor(c * s + 0.5) / s
  }

  /** Jarque–Bera normality test of l_quantity per (returnflag,
    * linestatus). The four raw moments Σq..Σq⁴ are one map-side
    * combinable LONG aggregation (q ≤ 50 ⇒ Σq⁴ fits a long up to
    * ~10¹² rows); central moments, skewness, kurtosis and the JB stat
    * are then a constant-size pinned-order double expression per
    * group — the [[Mining.qWelchTtest]] shape one moment order
    * higher. Skew uses m3/sqrt(m2³) (sqrt is exactly rounded; pow is
    * not, so pow never appears). */
  def qJarqueBera(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity")).cast("long").as("q"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
        sum(col("q") * col("q")).as("s2"),
        sum(col("q") * col("q") * col("q")).as("s3"),
        sum(col("q") * col("q") * col("q") * col("q")).as("s4"))
      .withColumn("mu", expr("CAST(s1 AS DOUBLE) / n"))
      .withColumn("m2", expr("CAST(s2 AS DOUBLE) / n - mu * mu"))
      .withColumn("m3", expr(
        "CAST(s3 AS DOUBLE) / n - 3 * mu * (CAST(s2 AS DOUBLE) / n)" +
          " + 2 * mu * mu * mu"))
      .withColumn("m4", expr(
        "CAST(s4 AS DOUBLE) / n - 4 * mu * (CAST(s3 AS DOUBLE) / n)" +
          " + 6 * mu * mu * (CAST(s2 AS DOUBLE) / n)" +
          " - 3 * mu * mu * mu * mu"))
      .withColumn("skew", expr("m3 / sqrt(m2 * m2 * m2)"))
      .withColumn("kurt", expr("m4 / (m2 * m2)"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        rnd(col("mu"), 4).as("mean_q"),
        rnd(col("skew"), 4).as("skewness"),
        rnd(col("kurt"), 4).as("kurtosis"),
        rnd(expr("n * (skew * skew + (kurt - 3) * (kurt - 3) / 4) / 6"), 4)
          .as("jb_stat"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Kruskal–Wallis rank ANOVA of customer account balance across
    * nations, with tie correction. Tie-averaged ranks ride the
    * DOUBLED-rank lattice (2·avg-rank of cent value v = 2·cum(<v) +
    * count(v) + 1 — always an integer), built from a VALUE-level
    * cumulative count: the distinct-cent frame is bounded by the
    * acctbal domain (~1.1M values) at ANY corpus size, and its
    * running sum is the exact [[Ranks.globalRunningSum]] ranged scan,
    * so no per-customer global sort ever happens. Per-nation rank
    * sums then come off a (nation, value)-cell rollup. The H
    * numerator Σ 3·R2ⱼ²/nⱼ is exact DECIMAL(38,0)⇄HUGEINT integral
    * division (truncation error ≤ |groups|, i.e. < 10⁻⁷ of H —
    * invisible at 4 dp); the tie term Σ(t³−t) likewise. H and the
    * tie-corrected H′ are single pinned-order double expressions over
    * those identical integers. */
  def qKruskalWallis(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("g"),
        round(col("c_acctbal") * 100).cast("long").as("v"))
    val vals = cust.groupBy(col("v")).agg(count(lit(1)).as("t"))
    val ranked = Ranks.globalRunningSum(vals, Seq(col("v")), col("t"), "cum")
      .withColumn("r2", lit(2L) * col("cum") - col("t") + lit(1L))
    val cells = cust.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val groups = cells.join(ranked, "v")
      .groupBy(col("g"))
      .agg(sum(col("c")).as("n_j"), sum(col("c") * col("r2")).as("r2_sum"))
    val tot = vals.agg(
        sum(col("t")).as("n_total"),
        sum(expr("CAST(t AS DECIMAL(38,0)) * t * t - t")).as("tie_term"))
      .localCheckpoint(true)
    // ⌊3R²/n⌋ = 3qR + ⌊3rR/n⌋ with q = R div n, r = R % n — identical
    // value (3qR is integral), but every LONG-typed intermediate stays
    // ≤ 3R (~5e13 at sf100); the naive single div's RESULT is
    // ~12·n_j·N² ≈ 1.6e21 at sf100 — past the <9.2e18 long bound (it
    // held only to sf≈18). Registered in graft.tools.LatticeLedger.
    val hnum = groups.agg(
      sum(expr("CAST(r2_sum div n_j AS DECIMAL(38,0)) * r2_sum * 3" +
        " + (CAST(r2_sum % n_j AS DECIMAL(38,0)) * r2_sum * 3) div n_j"))
        .as("s3q"),
      count(lit(1)).as("n_groups"))
    val h = hnum.crossJoin(tot)
      .withColumn("h_stat", expr(
        "CAST(s3q AS DOUBLE) / (CAST(n_total AS DOUBLE) * (n_total + 1))" +
          " - 3 * (n_total + 1)"))
      .withColumn("nn", expr(
        "CAST(n_total AS DECIMAL(38,0)) * n_total * n_total - n_total"))
      .withColumn("h_adj", expr(
        "h_stat * CAST(nn AS DOUBLE) / CAST(nn - tie_term AS DOUBLE)"))
      .select(col("n_groups"), col("n_total"),
        rnd(col("h_stat"), 4).as("h_stat"),
        rnd(col("h_adj"), 4).as("h_adj"))
    groups.crossJoin(broadcast(h))
      .select(col("g").as("nationkey"), col("n_j"), col("r2_sum"),
        rnd(expr("CAST(r2_sum AS DOUBLE) / (2 * n_j)"), 4).as("mean_rank"),
        col("n_groups"), col("n_total"), col("h_stat"), col("h_adj"))
      .orderBy(col("nationkey"))
  }

  /** Wald–Wolfowitz runs test for randomness of the daily-revenue
    * series around its median. Data-scaled work is ONE
    * partial-aggregable rollup to the calendar-bounded daily frame
    * (exact e4 revenue lattice); the lower median, the above/below
    * signs, the lag-based run count and the closed-form z all run on
    * that ≤|days| frame. μ_R = 2n₁n₂/n + 1 and σ²_R = (μ−1)(μ−2)/(n−1)
    * (the standard identity — keeps the double expression short and
    * pinned). Days exactly AT the median are excluded, per the
    * classical test. */
  def qRunsTest(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .localCheckpoint(true)
    val med = daily
      .withColumn("rn", row_number().over(Window.orderBy(col("e4"), col("day"))))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("nd"))))
      .filter(expr("rn = (nd + 1) div 2"))
      .select(col("e4").as("med"))
    val signed = daily.crossJoin(broadcast(med))
      .filter(col("e4") =!= col("med"))
      .select(col("day"), (col("e4") > col("med")).cast("int").as("s"))
    signed
      .withColumn("prev", lag(col("s"), 1).over(Window.orderBy(col("day"))))
      .agg(
        sum(col("s")).cast("long").as("n_above"),
        sum(lit(1) - col("s")).cast("long").as("n_below"),
        (lit(1L) + sum(when(col("prev").isNotNull &&
          col("prev") =!= col("s"), 1L).otherwise(0L))).as("n_runs"))
      .withColumn("mu", expr(
        "2.0 * n_above * n_below / (n_above + n_below) + 1"))
      .select(col("n_above"), col("n_below"), col("n_runs"),
        rnd(col("mu"), 4).as("mu_runs"),
        rnd(expr("(n_runs - mu) / sqrt((mu - 1) * (mu - 2)" +
          " / (n_above + n_below - 1))"), 4).as("z_stat"))
  }

  /** Herfindahl–Hirschman supplier-revenue concentration per nation:
    * HHI = Σⱼ shareⱼ² over each nation's suppliers, plus the
    * normalized HHI and the top-supplier share. Revenue rides the e4
    * lattice; the share-square sum is exact DECIMAL(38,0)⇄HUGEINT
    * (Σrevⱼ² / tot² as one double division of two exact integers), so
    * no per-supplier share is ever a rounded intermediate. Two
    * shuffles total: lineitem→supplier rollup (supplier is the
    * broadcast dim) and the |suppliers|-bounded nation rollup. */
  def qHerfindahl(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").cast("long").as("nationkey"),
        col("s_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("rev"))
    rev.groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rev")).as("tot"),
        sum(expr("CAST(rev AS DECIMAL(38,0)) * rev")).as("ssq"),
        max(col("rev")).as("mx"))
      .withColumn("hhi", rnd(expr(
        "CAST(ssq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))"),
        6))
      .select(col("nationkey"), col("n_suppliers"), col("hhi"),
        when(col("n_suppliers") >= 2L,
          rnd(expr("(hhi - 1.0 / n_suppliers) / (1 - 1.0 / n_suppliers)"), 6))
          .as("hhi_norm"),
        rnd(expr("CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE)"), 6)
          .as("top_share"))
      .orderBy(col("nationkey"))
  }

  /** Theil T inequality index of positive account balances with the
    * exact between/within-nation decomposition — the decomposable
    * complement to q_gini. Every log-ratio is fixed to integer
    * micro-nats (the dsir/bigram-ppl portability trick), so all three
    * numerators T·tot·10⁶ = Σ xᵢ·kᵢ are exact long sums — including
    * T_within, whose double-sum-over-groups form would leak
    * accumulation order but whose numerator Σ_g Σ_{i∈g} xᵢ·k′ᵢ is one
    * flat order-free long rollup. Three shuffles, all partial-
    * aggregable: per-nation totals (broadcast back), the global
    * 2-scalar frame, and the final nation rollup. */
  def qTheilIndex(s: SparkSession, d: String): DataFrame = {
    val x = Tables.customer(s, d)
      .filter(col("c_acctbal") > 0)
      .select(col("c_nationkey").cast("long").as("g"),
        round(col("c_acctbal") * 100).cast("long").as("x"))
    val gTot = x.groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("x")).as("tot_g"))
      .localCheckpoint(true)
    val tot = broadcast(x.agg(count(lit(1)).as("n"), sum(col("x")).as("tot")))
    val contrib = x.join(broadcast(gTot), "g").crossJoin(tot)
      .select(col("g"),
        (col("x") * expr("CAST(round(ln(CAST(x AS DOUBLE) * n / " +
          "(CAST(tot AS DOUBLE))) * 1e6) AS BIGINT)")).as("t_num"),
        (col("x") * expr("CAST(round(ln(CAST(x AS DOUBLE) * n_g / " +
          "(CAST(tot_g AS DOUBLE))) * 1e6) AS BIGINT)")).as("w_num"))
      .groupBy(col("g"))
      .agg(sum(col("t_num")).as("t_num"), sum(col("w_num")).as("w_num"))
    val between = gTot.crossJoin(tot)
      .select(col("g"), col("n_g"), col("tot_g"),
        (col("tot_g") * expr("CAST(round(ln(CAST(tot_g AS DOUBLE) * n / " +
          "(CAST(tot AS DOUBLE) * n_g)) * 1e6) AS BIGINT)")).as("b_num"))
    val sums = contrib.join(between, "g").crossJoin(tot)
      .agg(sum(col("t_num")).as("tn"), sum(col("w_num")).as("wn"),
        sum(col("b_num")).as("bn"),
        max(col("n")).as("n"), max(col("tot")).as("tot"))
      .select(col("n"), col("tot"),
        (floor(col("tn").cast("double") / col("tot") + 0.5) / 1e6)
          .as("theil_total"),
        (floor(col("bn").cast("double") / col("tot") + 0.5) / 1e6)
          .as("theil_between"),
        (floor(col("wn").cast("double") / col("tot") + 0.5) / 1e6)
          .as("theil_within"))
    contrib.join(between, "g").crossJoin(broadcast(sums))
      .select(col("g").as("nationkey"), col("n_g"), col("tot_g"),
        (floor(col("w_num").cast("double") / col("tot_g") + 0.5) / 1e6)
          .as("theil_g"),
        col("n"), col("tot"), col("theil_total"), col("theil_between"),
        col("theil_within"))
      .orderBy(col("nationkey"))
  }

  /** Brown–Forsythe variance-homogeneity test (Levene with the
    * MEDIAN center — the robust form) of account balance across
    * nations: z = |x − med_g| on the exact cent lattice, then the
    * one-way ANOVA F over z from integer moments. Group medians come
    * off the exact ranged [[Ranks.groupRowNumber]] — no per-nation
    * window sort — and every z is an integer, so SSB/SSW are
    * pinned-order double expressions over exact long/DECIMAL moments.
    * Emits the per-nation census plus the global F and its dfs. */
  def qBrownForsythe(s: SparkSession, d: String): DataFrame = {
    val x = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("g"),
        col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("v"))
    val med = Ranks.groupRowNumber(x, Seq(col("g")),
        Seq(col("v"), col("c_custkey")), "rn", "tot")
      .filter(expr("rn = (tot + 1) div 2"))
      .groupBy(col("g")).agg(min(col("v")).as("med"))
    val z = x.join(broadcast(med), "g")
      .select(col("g"), abs(col("v") - col("med")).as("z"), col("med"))
    val grp = z.groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("z")).as("s_g"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * z")).as("s2_g"),
        max(col("med")).as("median_cents"))
      .localCheckpoint(true)
    val f = grp.agg(
        count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"),
        sum(col("s2_g")).as("s2"),
        // ⌊S²/n⌋ decomposed as qS + ⌊rS/n⌋ (q = S div n, r = S % n):
        // same floor value, long intermediates ≤ S (~3e13 at sf100) —
        // the naive div result N·span² ≈ 6e19 overflowed past sf≈15.
        // Registered in graft.tools.LatticeLedger.
        sum(expr("CAST(s_g div n_g AS DECIMAL(38,0)) * s_g" +
          " + (CAST(s_g % n_g AS DECIMAL(38,0)) * s_g) div n_g"))
          .as("sb"))
      // SSB = Σ S_g²/n_g − S²/N, SSW = Σz² − Σ S_g²/n_g — the integral
      // divisions truncate ≤ 1 cent² per group (≪ 4-dp F resolution)
      .withColumn("ssb", expr(
        "CAST(sb AS DOUBLE)" +
          " - CAST(CAST(s div n AS DECIMAL(38,0)) * s" +
          " + (CAST(s % n AS DECIMAL(38,0)) * s) div n AS DOUBLE)"))
      .withColumn("ssw", expr("CAST(s2 AS DOUBLE) - CAST(sb AS DOUBLE)"))
      .select(col("k"), col("n"),
        (col("k") - 1).as("df1"), (col("n") - col("k")).as("df2"),
        (floor(expr("(ssb / (k - 1)) / (ssw / (n - k))") * 1e4 + 0.5)
          / 1e4).as("f_stat"))
    grp.crossJoin(broadcast(f))
      .select(col("g").as("nationkey"), col("n_g"), col("median_cents"),
        (floor(expr("CAST(s_g AS DOUBLE) / n_g") * 1e4 + 0.5) / 1e4)
          .as("mean_absdev"),
        col("k"), col("df1"), col("df2"), col("f_stat"))
      .orderBy(col("nationkey"))
  }

  /** OLS regression diagnostics of the daily-revenue trend: slope /
    * intercept from exact moments, then per-day residual, leverage
    * hᵢ = 1/n + (xᵢ−x̄)²/Sxx, and Cook's distance — the
    * influential-observation report (which days distort the trend
    * fit). The corpus collapses to the calendar-bounded daily frame;
    * ALL moments (Σx..Σxy, Σy² on DECIMAL(38,0)⇄HUGEINT) are exact, so
    * slope, SSE (via the moment identity Σe² = Σyy − αΣy − βΣxy) and
    * every per-day statistic are pinned-order doubles over identical
    * integers — bit-identical cross-engine, which is what makes the
    * top-10-by-Cook's-D ordering itself deterministic. */
  def qOlsDiagnostics(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .localCheckpoint(true)
    val m = broadcast(daily
      .select(datediff(col("day"), lit("1995-01-01")).cast("long").as("x"),
        col("e4"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("e4")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * e4")).as("sxy"),
        sum(expr("CAST(e4 AS DECIMAL(38,0)) * e4")).as("syy")))
    daily.crossJoin(m)
      .withColumn("x", datediff(col("day"), lit("1995-01-01")).cast("long"))
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
      .withColumn("xbar", expr("CAST(sx AS DOUBLE) / n"))
      .withColumn("sxxc", expr(
        "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * xbar"))
      .withColumn("resid", expr("CAST(e4 AS DOUBLE) - alpha - beta * x"))
      .withColumn("lev", expr("1.0 / n + (x - xbar) * (x - xbar) / sxxc"))
      .withColumn("cook_d", expr(
        "resid * resid * lev / (2 * s2 * (1 - lev) * (1 - lev))"))
      .select(col("day"),
        (floor(expr("CAST(e4 AS DOUBLE) / 10000") * 100 + 0.5) / 100)
          .as("rev"),
        (floor(expr("beta / 10000") * 1e4 + 0.5) / 1e4).as("slope"),
        (floor(expr("resid / 10000") * 100 + 0.5) / 100).as("residual"),
        (floor(col("lev") * 1e6 + 0.5) / 1e6).as("leverage"),
        (floor(col("cook_d") * 1e6 + 0.5) / 1e6).as("cook_d"))
      .orderBy(col("cook_d").desc, col("day"))
      .limit(10)
  }

  /** Two-way factorial ANOVA of quantity on returnflag × linestatus:
    * the SS decomposition (A, B, interaction, within) and the three F
    * ratios — the designed-experiment workhorse one level above
    * [[Mining.qAnovaF]]'s one-way. Every sum of squares comes from
    * EXACT integer cell moments via the Σ S²/n − S²/N identity
    * (integral divisions truncate ≤ 1 per cell — invisible at 4 dp);
    * one partial-aggregable cell rollup is the only data-scaled
    * shuffle, margins fold from the ≤6-row cell frame. */
  def qTwoWayAnova(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("fa"), col("l_linestatus").as("fb"),
        round(col("l_quantity")).cast("long").as("q"))
      .groupBy(col("fa"), col("fb"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
        sum(col("q") * col("q")).as("s2"))
      .localCheckpoint(true)
    val aM = cells.groupBy(col("fa"))
      .agg(sum(col("n")).as("n_a"), sum(col("s")).as("s_a"))
    val bM = cells.groupBy(col("fb"))
      .agg(sum(col("n")).as("n_b"), sum(col("s")).as("s_b"))
    // all S²/n terms ride a 1e-4-unit lattice (×10000 before the
    // integral division) so truncation is ≤1e-4 per group — far below
    // the 4-dp F resolution even when the F itself is tiny
    val g = cells.agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"),
      sum(col("s2")).as("sq"),
      countDistinct(col("fa")).as("ka"), countDistinct(col("fb")).as("kb"),
      count(lit(1)).as("kc"),
      sum(expr("(CAST(s AS DECIMAL(38,0)) * s * 10000) div n"))
        .as("cellsq"))
    val margins = g
      .crossJoin(broadcast(aM.agg(
        sum(expr("(CAST(s_a AS DECIMAL(38,0)) * s_a * 10000) div n_a"))
          .as("asq"))))
      .crossJoin(broadcast(bM.agg(
        sum(expr("(CAST(s_b AS DECIMAL(38,0)) * s_b * 10000) div n_b"))
          .as("bsq"))))
      .withColumn("corr", expr(
        "CAST((CAST(ss AS DECIMAL(38,0)) * ss * 10000) div nn AS DOUBLE)"))
      .withColumn("ss_a", expr("CAST(asq AS DOUBLE) - corr"))
      .withColumn("ss_b", expr("CAST(bsq AS DOUBLE) - corr"))
      .withColumn("ss_cells", expr("CAST(cellsq AS DOUBLE) - corr"))
      .withColumn("ss_ab", expr("ss_cells - ss_a - ss_b"))
      .withColumn("ss_w", expr("CAST(sq AS DOUBLE) * 10000" +
        " - CAST(cellsq AS DOUBLE)"))
      .withColumn("df_a", expr("ka - 1"))
      .withColumn("df_b", expr("kb - 1"))
      .withColumn("df_ab", expr("(ka - 1) * (kb - 1)"))
      .withColumn("df_w", expr("nn - kc"))
      .select(col("nn").as("n_total"),
        col("df_a"), col("df_b"), col("df_ab"), col("df_w"),
        rnd(expr("(ss_a / df_a) / (ss_w / df_w)"), 4).as("f_a"),
        rnd(expr("(ss_b / df_b) / (ss_w / df_w)"), 4).as("f_b"),
        rnd(expr("(ss_ab / df_ab) / (ss_w / df_w)"), 4).as("f_ab"))
    cells.crossJoin(broadcast(margins))
      .select(col("fa"), col("fb"), col("n"),
        rnd(expr("CAST(s AS DOUBLE) / n"), 4).as("cell_mean"),
        col("n_total"), col("df_a"), col("df_b"), col("df_ab"),
        col("df_w"), col("f_a"), col("f_b"), col("f_ab"))
      .orderBy(col("fa"), col("fb"))
  }

  /** Gumbel extreme-value fit on monthly block maxima of daily
    * revenue (method of moments: β = s·√6/π, μ = mean − γ·β) and the
    * 10-/100-period return levels — the capacity-planning question
    * "how big can a day get". Maxima are exact longs off the
    * calendar-bounded frames; moments ride DECIMAL⇄HUGEINT; the fit
    * and return levels are one pinned double expression (π via the
    * engine `pi()` and γ as an explicit literal — identical bits both
    * sides; sqrt/ln exactly-rounded or micro-stable). */
  def qGumbelMaxima(s: SparkSession, d: String): DataFrame = {
    val mx = Tables.lineitem(s, d)
      .groupBy(date_format(to_date(col("l_shipdate")), "yyyy-MM")
        .as("month"), to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .groupBy(col("month")).agg(max(col("e4")).as("m"))
    mx.agg(count(lit(1)).as("n"), sum(col("m")).as("sm"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("sm2"))
      .withColumn("mean", expr("CAST(sm AS DOUBLE) / n"))
      .withColumn("sd", expr(
        "sqrt((CAST(sm2 AS DOUBLE) - CAST(sm AS DOUBLE) * mean) / (n - 1))"))
      .withColumn("beta", expr("sd * sqrt(6.0) / pi()"))
      .withColumn("mu", expr("mean - 0.5772156649015329 * beta"))
      .select(col("n").as("n_blocks"),
        rnd(expr("mean / 10000"), 2).as("mean_max"),
        rnd(expr("beta / 10000"), 2).as("beta"),
        rnd(expr("mu / 10000"), 2).as("mu"),
        rnd(expr("(mu - beta * ln(-ln(1 - 1.0 / 10))) / 10000"), 2)
          .as("rl_10"),
        rnd(expr("(mu - beta * ln(-ln(1 - 1.0 / 100))) / 10000"), 2)
          .as("rl_100"))
  }

  /** Hurst exponent by rescaled-range (R/S) analysis of the daily
    * revenue series over block sizes 8/16/32/64 — the long-memory
    * probe (H≈0.5 random walk, H>0.5 trending, H<0.5 mean-reverting).
    * Within each full block, cumulative deviations ride the n-SCALED
    * integer lattice (Zⱼ·n = n·cumxⱼ − j·s — exact longs), so the
    * block's R/S = R_scaled/sqrt(n·Σdev²) is one pinned double from
    * exact integers, fixed to micro units BEFORE the per-size average
    * (an order-free long sum). H is the closed-form OLS slope over the
    * four ln-equally-spaced sizes — an explicit 4-term expression, no
    * aggregation order anywhere. */
  def qHurstExponent(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .withColumn("idx",
        row_number().over(Window.orderBy(col("day"))).cast("long") - 1)
      .localCheckpoint(true)
    val perSize = Seq(8, 16, 32, 64).map { bs =>
      val w = Window.partitionBy(col("b")).orderBy(col("idx"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val blocks = daily
        .select(col("idx"), col("e4"), expr(s"idx div $bs").as("b"))
        .withColumn("cnt", count(lit(1))
          .over(Window.partitionBy(col("b"))))
        .filter(col("cnt") === bs)
        .withColumn("s", sum(col("e4"))
          .over(Window.partitionBy(col("b"))))
        .withColumn("j", row_number()
          .over(Window.partitionBy(col("b")).orderBy(col("idx")))
          .cast("long"))
        .withColumn("zn", lit(bs.toLong) * sum(col("e4")).over(w)
          - col("j") * col("s"))
        .groupBy(col("b"))
        .agg((max(col("zn")) - min(col("zn"))).as("r_scaled"),
          sum(expr(s"CAST($bs * e4 - s AS DECIMAL(38,0))" +
            s" * ($bs * e4 - s)")).as("ssq"))
        .filter(col("ssq") > 0)
        // devs carry an n× scale (n·x − s = n·(x−μ)), so R_scaled =
        // n·R and S = sqrt(ssq)/n^1.5 ⇒ R/S = R_scaled/sqrt(ssq/n)
        .select(expr(
          s"CAST(round(CAST(r_scaled AS DOUBLE)" +
            s" / sqrt(CAST(ssq AS DOUBLE) / $bs) * 1e6) AS BIGINT)")
          .as("rs_micro"))
      blocks.agg(count(lit(1)).as("n_blocks"),
          sum(col("rs_micro")).as("rs_sum"))
        .withColumn("block_size", lit(bs.toLong))
    }.reduce(_ unionByName _)
      .withColumn("avg_rs", expr(
        "CAST(rs_sum AS DOUBLE) / n_blocks / 1e6"))
      .localCheckpoint(true)
    val h = perSize
      .agg(
        max(when(col("block_size") === 8, expr("ln(avg_rs)"))).as("y8"),
        max(when(col("block_size") === 16, expr("ln(avg_rs)"))).as("y16"),
        max(when(col("block_size") === 32, expr("ln(avg_rs)"))).as("y32"),
        max(when(col("block_size") === 64, expr("ln(avg_rs)"))).as("y64"))
      .select((floor(expr(
        "(-1.5 * y8 - 0.5 * y16 + 0.5 * y32 + 1.5 * y64) / (5 * ln(2))")
        * 1e4 + 0.5) / 1e4).as("hurst"))
    perSize.crossJoin(broadcast(h))
      .select(col("block_size"), col("n_blocks"),
        (floor(col("avg_rs") * 1e6 + 0.5) / 1e6).as("avg_rs"),
        col("hurst"))
      .orderBy(col("block_size"))
  }

  /** Permutation entropy (order 3) of the daily revenue series — the
    * ordinal-pattern complexity measure (Bandt & Pompe): every
    * consecutive triple maps to one of 6 rank patterns by PURE INTEGER
    * comparisons (ties broken by time index, so the pattern is total),
    * and the pattern distribution's Shannon entropy — in exact
    * micro-nats — says how predictable the series' shape is (ln 6 =
    * maximally random). One lag pass + a 6-row census. */
  def qPermEntropy(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("day"))
    val daily = Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("x1"))
      .withColumn("x2", lead(col("x1"), 1).over(w))
      .withColumn("x3", lead(col("x1"), 2).over(w))
      .filter(col("x3").isNotNull)
    // rank of each element among the triple, ties to the EARLIER index
    val coded = daily.select(expr(
      """(CASE WHEN x2 < x1 THEN 1 ELSE 0 END
        |   + CASE WHEN x3 < x1 THEN 1 ELSE 0 END) * 9 +
        |(CASE WHEN x1 <= x2 THEN 1 ELSE 0 END
        |   + CASE WHEN x3 < x2 THEN 1 ELSE 0 END) * 3 +
        |(CASE WHEN x1 <= x3 THEN 1 ELSE 0 END
        |   + CASE WHEN x2 <= x3 THEN 1 ELSE 0 END)""".stripMargin)
      .cast("long").as("pattern"))
    val counts = coded.groupBy(col("pattern")).agg(count(lit(1)).as("cnt"))
    val tot = broadcast(counts.agg(sum(col("cnt")).as("t")))
    val terms = counts.crossJoin(tot)
      .withColumn("k_micro", expr(
        "CAST(round(-ln(CAST(cnt AS DOUBLE) / t) * 1e6) AS BIGINT)"))
    val hSum = broadcast(terms
      .agg(sum(col("cnt") * col("k_micro")).as("h_num"), max(col("t")).as("t"))
      .select(
        (floor(col("h_num").cast("double") / col("t") + 0.5) / 1e6)
          .as("entropy_nats"))
      .withColumn("entropy_norm", (floor(expr(
        "entropy_nats / ln(6)") * 1e4 + 0.5) / 1e4)))
    terms.crossJoin(hSum)
      .select(col("pattern"), col("cnt"),
        (floor(expr("CAST(cnt AS DOUBLE) / t") * 1e6 + 0.5) / 1e6)
          .as("p"),
        col("entropy_nats"), col("entropy_norm"))
      .orderBy(col("pattern"))
  }

  /** Two-sample Cramér–von Mises test (balance distributions of
    * even- vs odd-keyed customers): the EDF-distance alternative to
    * [[Mining.qKsTest]]'s sup-norm, T = U/(nm(n+m)) − (4nm−1)/(6(n+m))
    * with U = n·Σ(rᵢ−i)² + m·Σ(sⱼ−j)². Every rank is exact off the
    * ranged scan over the TOTAL (value, custkey) order (ties broken by
    * key, so the rank relation is identical cross-engine), both Σ(·)²
    * are exact long sums, and U rides DECIMAL⇄HUGEINT — T is one
    * pinned double expression at the end. */
  def qCramerVonMises(s: SparkSession, d: String): DataFrame = {
    val x = Tables.customer(s, d)
      .select(((col("c_custkey") % 2) === 0).as("in_a"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("v"))
    val combined = Ranks.globalRowNumber(x,
      Seq(col("v"), col("c_custkey")), "r")
    val within = Ranks.groupRowNumber(combined, Seq(col("in_a")),
      Seq(col("v"), col("c_custkey")), "i", "n_grp")
    val sums = within
      .groupBy(col("in_a"))
      .agg(count(lit(1)).as("n"),
        sum(expr("(r - i) * (r - i)")).as("t2"))
    val a = sums.filter(col("in_a")).select(col("n").as("n_a"),
      col("t2").as("t2_a"))
    val b = sums.filter(!col("in_a")).select(col("n").as("n_b"),
      col("t2").as("t2_b"))
    a.crossJoin(b)
      .withColumn("u", expr(
        "CAST(n_a AS DECIMAL(38,0)) * t2_a + CAST(n_b AS DECIMAL(38,0)) * t2_b"))
      .select(col("n_a"), col("n_b"), col("t2_a"), col("t2_b"),
        (floor(expr(
          "CAST(u AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b * (n_a + n_b))" +
            " - (4.0 * n_a * n_b - 1) / (6.0 * (n_a + n_b))")
          * 1e6 + 0.5) / 1e6).as("t_stat"))
  }

  /** Ljung–Box portmanteau test on the daily revenue series (lags
    * 1..7): is the series white noise, or is there autocorrelation
    * worth modeling — the gatekeeper test before ARIMA fitting.
    * Autocovariances run on SCALED deviations yₜ = n·xₜ − Σx (exact
    * integers; products on DECIMAL(38,0)⇄HUGEINT), so every rₖ is one
    * double division of two identical wide integers. The cumulative
    * Q-statistic folds rₖ²/(n−k) terms FIXED TO THE PICO LATTICE
    * first — a 7-row double running sum would hit the segment-tree
    * accumulation-order hazard (§5); pico-longs make the cumsum
    * order-free. */
  def qLjungBox(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .localCheckpoint(true)
    val m = broadcast(daily.agg(count(lit(1)).as("n"), sum(col("e4")).as("sx")))
    val y = daily.crossJoin(m)
      .select(col("day"), col("n"),
        (col("n") * col("e4") - col("sx")).as("y"))
    val w = Window.orderBy(col("day"))
    val lagged = (1 to 7).foldLeft(y) { (acc, k) =>
      acc.withColumn(s"y$k", lag(col("y"), k).over(w)) }
    val aggs = Seq(max(col("n")).as("n"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("den")) ++
      (1 to 7).map(k =>
        sum(expr(s"CAST(y AS DECIMAL(38,0)) * y$k")).as(s"num$k"))
    val sums = lagged.agg(aggs.head, aggs.tail: _*)
    val perLag = (1 to 7).map { k =>
      sums.select(lit(k.toLong).as("lag_k"), col("n"),
        expr(s"CAST(num$k AS DOUBLE) / CAST(den AS DOUBLE)").as("r"))
        .withColumn("t_pico", expr("CAST(round(r * r / (n - lag_k) * 1e12)" +
          " AS BIGINT)"))
    }.reduce(_ unionByName _)
    perLag
      .withColumn("cum_pico", sum(col("t_pico"))
        .over(Window.orderBy(col("lag_k"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("lag_k"),
        (floor(col("r") * 1e6 + 0.5) / 1e6).as("acf"),
        (floor(expr("n * (n + 2) * (CAST(cum_pico AS DOUBLE) / 1e12)")
          * 1e4 + 0.5) / 1e4).as("q_stat"))
      .orderBy(col("lag_k"))
  }

  /** Tukey-fence outlier census per nation: exact Q1/Q3 off the
    * ranged rank scan, and the 1.5·IQR fences applied as INTEGER
    * comparisons (2·v < 2·Q1 − 3·IQR — no fractional fence value ever
    * materializes, so the boundary can't flip cross-engine). The
    * box-plot summary every data-quality dashboard starts from. */
  def qIqrOutliers(s: SparkSession, d: String): DataFrame = {
    val x = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("g"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("v"))
    val ranked = Ranks.groupRowNumber(x, Seq(col("g")),
      Seq(col("v"), col("c_custkey")), "rn", "tot").localCheckpoint(true)
    val qs = ranked
      .filter(expr("rn = (tot + 3) div 4 OR rn = (3 * tot + 3) div 4"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("q1"), max(col("v")).as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
    x.join(broadcast(qs), "g")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        max(col("q1")).as("q1"), max(col("q3")).as("q3"),
        max(col("iqr")).as("iqr"),
        sum(when(expr("2 * v < 2 * q1 - 3 * iqr"), 1L).otherwise(0L))
          .as("n_low"),
        sum(when(expr("2 * v > 2 * q3 + 3 * iqr"), 1L).otherwise(0L))
          .as("n_high"))
      .select(col("g").as("nationkey"), col("n"), col("q1"), col("q3"),
        col("iqr"), col("n_low"), col("n_high"),
        (floor(expr("CAST(n_low + n_high AS DOUBLE) / n") * 1e4 + 0.5)
          / 1e4).as("outlier_rate"))
      .orderBy(col("nationkey"))
  }

  /** Price-volume-mix bridge (the FP&A revenue waterfall): for each
    * consecutive month pair, the matched-part revenue delta decomposes
    * EXACTLY into price effect Σ(uv_t−uv_p)·q_p, volume effect
    * Σ uv_p·(q_t−q_p) and cross effect Σ(uv_t−uv_p)(q_t−q_p) — an
    * algebraic identity on the integer unit-value lattice, so
    * `bridge_delta` = `matched_delta` is a gate-hashed reconciliation
    * certificate, not an approximation. Entering/exiting parts are
    * carried as separate revenue columns. Scale = [[qPriceIndex]]'s:
    * the part-month frame is |parts|×|months| bounded, one
    * self-join on (part, consecutive month index). */
  def qPvmBridge(s: SparkSession, d: String): DataFrame = {
    val pm = Tables.lineitem(s, d)
      .groupBy(expr("CAST((year(l_shipdate) - 1995) * 12" +
          " + month(l_shipdate) - 1 AS BIGINT)").as("mi"),
        col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long")).as("rev"),
        sum(round(col("l_quantity")).cast("long")).as("qty"))
      .withColumn("uv2", expr("(rev * 100) div qty"))
      .localCheckpoint(true)
    val prev = pm.select(col("l_partkey"), (col("mi") + 1).as("mi"),
      col("uv2").as("uv_p"), col("qty").as("q_p"), col("rev").as("rev_p"))
    val joined = pm.join(prev, Seq("l_partkey", "mi"), "full")
    joined.groupBy(col("mi"))
      .agg(
        count(when(col("uv2").isNotNull && col("uv_p").isNotNull, 1))
          .as("n_matched"),
        sum(when(col("uv2").isNotNull && col("uv_p").isNotNull,
          (col("uv2") - col("uv_p")) * col("q_p"))).as("price_eff"),
        sum(when(col("uv2").isNotNull && col("uv_p").isNotNull,
          col("uv_p") * (col("qty") - col("q_p")))).as("volume_eff"),
        sum(when(col("uv2").isNotNull && col("uv_p").isNotNull,
          (col("uv2") - col("uv_p")) * (col("qty") - col("q_p"))))
          .as("cross_eff"),
        sum(when(col("uv2").isNotNull && col("uv_p").isNotNull,
          col("uv2") * col("qty") - col("uv_p") * col("q_p")))
          .as("matched_delta"),
        sum(when(col("uv_p").isNull, col("rev"))).as("entry_rev"),
        sum(when(col("uv2").isNull, col("rev_p"))).as("exit_rev"))
      .filter(col("n_matched") > 0)
      .na.fill(0L, Seq("entry_rev", "exit_rev"))
      .withColumn("bridge_delta",
        col("price_eff") + col("volume_eff") + col("cross_eff"))
      .select(col("mi").as("month_idx"), col("n_matched"), col("price_eff"),
        col("volume_eff"), col("cross_eff"), col("bridge_delta"),
        col("matched_delta"), col("entry_rev"), col("exit_rev"))
      .orderBy(col("month_idx"))
  }

  /** Laspeyres / Paasche / Fisher monthly price indexes vs the first
    * month, over per-part UNIT VALUES (the practitioner's price proxy:
    * revenue/quantity per part-month). Unit values are truncated onto
    * the e4·100 integer lattice (`uv2 = 100·rev_e4 div qty`, relative
    * truncation < 10⁻⁹), so the four index numerators/denominators
    * are exact long sums over the parts matched to the base month and
    * each index is ONE double division (Fisher one sqrt more). Scale:
    * the part-month frame is |parts|×|months| bounded; one
    * partkey-keyed self-join against the base month; no windows. */
  def qPriceIndex(s: SparkSession, d: String): DataFrame = {
    val pm = Tables.lineitem(s, d)
      .groupBy(date_format(to_date(col("l_shipdate")), "yyyy-MM").as("month"),
        col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long")).as("rev"),
        sum(round(col("l_quantity")).cast("long")).as("qty"))
      .withColumn("uv2", expr("(rev * 100) div qty"))
      .localCheckpoint(true)
    val base = pm.crossJoin(broadcast(pm.agg(min(col("month")).as("m0"))))
      .filter(col("month") === col("m0"))
      .select(col("l_partkey"), col("uv2").as("uv0"), col("qty").as("q0"))
    pm.join(base, "l_partkey")
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("uv2") * col("q0")).as("lnum"),
        sum(col("uv0") * col("q0")).as("lden"),
        sum(col("uv2") * col("qty")).as("pnum"),
        sum(col("uv0") * col("qty")).as("pden"))
      .withColumn("laspeyres",
        rnd(expr("CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE)"), 6))
      .withColumn("paasche",
        rnd(expr("CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE)"), 6))
      .select(col("month"), col("n_parts"), col("laspeyres"), col("paasche"),
        rnd(expr("sqrt(laspeyres * paasche)"), 6).as("fisher"))
      .orderBy(col("month"))
  }

  /** Cronbach's alpha internal-consistency coefficient treating the
    * seven line numbers of complete 7-line orders as test items
    * scored by quantity. Every variance shares the SAME denominator
    * n², so Σ item-variances and the total variance reduce to exact
    * DECIMAL(38,0)⇄HUGEINT numerators (nΣx²−S²) summed EXACTLY —
    * alpha is one pinned double ratio of identical integers; no
    * per-item double sum exists to leak accumulation order. Corpus
    * work: one complete-case filter + two grouped integer-moment
    * rollups. */
  def qCronbachAlpha(s: SparkSession, d: String): DataFrame = {
    val k = 7
    // per-cell score: duplicate (order, linenumber) rows exist in the
    // corpus, so the item score is the SUM over the cell — this makes
    // completeness (= all 7 items present) imply a dense n×k matrix
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_linenumber").as("item"),
        round(col("l_quantity")).cast("long").as("_q"))
      .groupBy(col("o"), col("item")).agg(sum(col("_q")).as("q"))
    val complete = li.groupBy(col("o"))
      .agg(count(lit(1)).as("_c"), sum(col("q")).as("total"))
      .filter(col("_c") === k)
      .localCheckpoint(true)
    val scores = li.join(complete.select(col("o")), Seq("o"), "left_semi")
    val itemNum = scores.groupBy(col("item"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
        sum(col("q") * col("q")).as("s2"))
      .select(expr("CAST(n AS DECIMAL(38,0)) * s2 - " +
        "CAST(s1 AS DECIMAL(38,0)) * s1").as("vnum"))
      .agg(sum(col("vnum")).as("item_vnum"), count(lit(1)).as("k_items"))
    val totNum = complete.agg(count(lit(1)).as("n"),
        sum(col("total")).as("s1"),
        sum(col("total") * col("total")).as("s2"))
      .select(col("n"), expr("CAST(n AS DECIMAL(38,0)) * s2 - " +
        "CAST(s1 AS DECIMAL(38,0)) * s1").as("tot_vnum"))
    itemNum.crossJoin(broadcast(totNum))
      .select(col("k_items"), col("n").as("n_orders"),
        rnd(expr("CAST(item_vnum AS DOUBLE) / (CAST(n AS DOUBLE) * n)"),
          4).as("sum_item_var"),
        rnd(expr("CAST(tot_vnum AS DOUBLE) / (CAST(n AS DOUBLE) * n)"),
          4).as("total_var"),
        rnd(expr(s"($k / CAST($k - 1 AS DOUBLE)) * (1 - " +
          "CAST(item_vnum AS DOUBLE) / CAST(tot_vnum AS DOUBLE))"), 6)
          .as("cronbach_alpha"))
  }

  /** Tukey HSD post-hoc pairwise comparison after the one-way ANOVA
    * of balances across nations: studentized-range q for every nation
    * pair + the significance flag at the fixed k=25 critical value.
    * MSW rides [[qTwoWayAnova]]'s division lattice (S²·10⁴ div n per
    * group — truncation ≤1e-4 dollar², far below 4-dp q); the 300-row
    * pair frame is a self-join of the 25-row group census, so the
    * only corpus-scaled work is ONE grouped integer-moment rollup.
    * The significance comparison is between IDENTICAL doubles on both
    * engines, so the flag cannot flip. Balances are latticed at WHOLE
    * DOLLARS (round(c_acctbal), the q_eta_squared convention), not
    * cents: the cent lattice put S²·10⁴ div n at ~1.2e18 per nation
    * at sf0.1 — only ~7× under Spark's LONG-returning DECIMAL-div
    * ceiling — whereas the dollar lattice keeps ~4 orders of headroom
    * through sf100. */
  def qTukeyHsd(s: SparkSession, d: String): DataFrame = {
    val qCrit = 5.03 // studentized range, k=25, df→∞, α=0.05
    val grp = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("g"),
        round(col("c_acctbal")).cast("long").as("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("v")).as("s"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("s2"))
      .localCheckpoint(true)
    val msw = broadcast(grp
      .select(col("n_g"),
        expr("CAST(s2 AS DECIMAL(38,0)) * 10000" +
          " - (CAST(s AS DECIMAL(38,0)) * s * 10000) div n_g")
          .as("ssw4"))
      .agg(sum(col("ssw4")).as("ssw4"), sum(col("n_g")).as("n_tot"),
        count(lit(1)).as("k_groups"))
      .select(expr("CAST(ssw4 AS DOUBLE) / 10000" +
        " / (n_tot - k_groups)").as("msw")))
    grp.as("a")
      .join(grp.as("b"), col("a.g") < col("b.g"))
      .crossJoin(msw)
      .select(col("a.g").as("g_i"), col("b.g").as("g_j"),
        col("a.n_g").as("n_i"), col("b.n_g").as("n_j"),
        col("a.s").as("si"), col("b.s").as("sj"), col("msw"))
      .withColumn("q_raw", expr(
        "abs(CAST(si AS DOUBLE) / n_i - CAST(sj AS DOUBLE) / n_j)" +
          " / sqrt(msw / 2 * (1.0 / n_i + 1.0 / n_j))"))
      .select(col("g_i"), col("g_j"), col("n_i"), col("n_j"),
        rnd(expr("CAST(si AS DOUBLE) / n_i"), 4).as("mean_i"),
        rnd(expr("CAST(sj AS DOUBLE) / n_j"), 4).as("mean_j"),
        rnd(col("q_raw"), 4).as("q_stat"),
        (col("q_raw") > qCrit).as("significant"))
      .orderBy(col("g_i"), col("g_j"))
  }

  /** Friedman test of k=3 related treatments (line numbers 1–3
    * quantity, per-cell max) over order blocks with all three lines
    * present — the rank-based repeated-measures ANOVA beside
    * [[qCochranQ]]'s binary form. Within-block midranks are computed
    * by PURE COMPARISON COUNTING on the doubled-rank lattice
    * (r2 = 2·#less + #equal + 2 — no per-block sort exists), so rank
    * sums are exact longs and χ²_F = 3·ΣR2_j²/(n·k(k+1)) − 3n(k+1)
    * is one pinned double over DECIMAL⇄HUGEINT integers. */
  def qFriedman(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(s, d)
      .filter(col("l_linenumber") <= 3)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_linenumber") === 1,
          round(col("l_quantity")).cast("long"))).as("q1"),
        max(when(col("l_linenumber") === 2,
          round(col("l_quantity")).cast("long"))).as("q2"),
        max(when(col("l_linenumber") === 3,
          round(col("l_quantity")).cast("long"))).as("q3"))
      .filter(col("q1").isNotNull && col("q2").isNotNull &&
        col("q3").isNotNull)
    def r2(self: String, o1: String, o2: String) = expr(
      s"2 * (CASE WHEN $o1 < $self THEN 1 ELSE 0 END" +
        s" + CASE WHEN $o2 < $self THEN 1 ELSE 0 END)" +
        s" + CASE WHEN $o1 = $self THEN 1 ELSE 0 END" +
        s" + CASE WHEN $o2 = $self THEN 1 ELSE 0 END + 2")
    cells
      .select(r2("q1", "q2", "q3").as("r2_1"),
        r2("q2", "q1", "q3").as("r2_2"),
        r2("q3", "q1", "q2").as("r2_3"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("r2_1")).as("s1"), sum(col("r2_2")).as("s2"),
        sum(col("r2_3")).as("s3"))
      .select(col("n_blocks"),
        rnd(expr("CAST(s1 AS DOUBLE) / 2 / n_blocks"), 4)
          .as("mean_rank_1"),
        rnd(expr("CAST(s2 AS DOUBLE) / 2 / n_blocks"), 4)
          .as("mean_rank_2"),
        rnd(expr("CAST(s3 AS DOUBLE) / 2 / n_blocks"), 4)
          .as("mean_rank_3"),
        rnd(expr("CAST(CAST(s1 AS DECIMAL(38,0)) * s1" +
          " + CAST(s2 AS DECIMAL(38,0)) * s2" +
          " + CAST(s3 AS DECIMAL(38,0)) * s3 AS DOUBLE)" +
          " / (CAST(n_blocks AS DOUBLE) * 4)" +
          " - 12 * CAST(n_blocks AS DOUBLE)"), 4).as("chi2_f"))
  }

  /** ANOVA effect sizes η² and ω² for the one-way balance-by-nation
    * design — the magnitude readout beside q_anova_f's significance
    * (the [[qCramersV]] counterpart for a continuous response). SSB
    * and SST come from exact integer moments on the shared
    * n-denominator lattice (Σ S_g²·n div n_g − S² ⇄ nΣx² − S², both
    * DECIMAL⇄HUGEINT with ≤1-unit division truncation far below the
    * 6-dp outputs); η²/ω² are pinned doubles. */
  def qEtaSquared(s: SparkSession, d: String): DataFrame = {
    // DOLLAR lattice (not cents): keeps every ×10⁴ division RESULT
    // inside a long — Spark's DECIMAL `div` returns long, and the
    // n-scaled cent formulation overflowed it at sf0.1 (9e18 terms)
    val cust = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("g"),
        round(col("c_acctbal")).cast("long").as("v"))
    val grp = cust.groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("v")).as("s_g"))
    val gl = broadcast(cust.agg(count(lit(1)).as("n"),
      sum(col("v")).as("s1"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("s2")))
    grp.crossJoin(gl)
      .agg(count(lit(1)).as("k"),
        sum(expr("(CAST(s_g AS DECIMAL(38,0)) * s_g * 10000) div n_g"))
          .as("ssb_grp4"),
        max(col("n")).as("n"), max(col("s1")).as("s1"),
        max(col("s2")).as("s2"))
      .withColumn("mean4",
        expr("(CAST(s1 AS DECIMAL(38,0)) * s1 * 10000) div n"))
      .withColumn("ssb4", expr("CAST(ssb_grp4 - mean4 AS DOUBLE)"))
      .withColumn("sst4",
        expr("CAST(CAST(s2 AS DECIMAL(38,0)) * 10000 - mean4 AS DOUBLE)"))
      .withColumn("msw4", expr("(sst4 - ssb4) / (n - k)"))
      .select(col("k"), col("n"),
        rnd(expr("ssb4 / sst4"), 6).as("eta_squared"),
        rnd(expr("(ssb4 - (k - 1) * msw4) / (sst4 + msw4)"), 6)
          .as("omega_squared"))
  }

  /** Cramér's V effect size for the nation × market-segment customer
    * contingency — the strength readout beside q_chi_square's
    * significance. Each cell's χ² term (o·n − r·c)²/(n·r·c) is an
    * identical double of exact integers fixed to 1e-6 units, so the
    * 125-cell fold is an order-free long sum; V one pinned sqrt. */
  def qCramersV(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("r"),
        col("c_mktsegment").as("c"))
    val cells = cust.groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val rows = cells.groupBy(col("r")).agg(sum(col("o")).as("n_r"))
    val cols = cells.groupBy(col("c")).agg(sum(col("o")).as("n_c"))
    val tot = broadcast(cells.agg(sum(col("o")).as("n"),
      countDistinct(col("r")).as("df_r"),
      countDistinct(col("c")).as("df_c")))
    cells.join(broadcast(rows), "r").join(broadcast(cols), "c")
      .crossJoin(tot)
      .select(col("n"), col("df_r"), col("df_c"),
        expr("CAST(round((CAST(o AS DOUBLE) * n" +
          " - CAST(n_r AS DOUBLE) * n_c)" +
          " * (CAST(o AS DOUBLE) * n - CAST(n_r AS DOUBLE) * n_c)" +
          " / (CAST(n AS DOUBLE) * n_r * n_c) * 1e6) AS BIGINT)")
          .as("t6"))
      .groupBy(col("n"), col("df_r"), col("df_c"))
      .agg(sum(col("t6")).as("chi6"))
      .select(col("n"), col("df_r"), col("df_c"),
        rnd(expr("CAST(chi6 AS DOUBLE) / 1e6"), 4).as("chi2"),
        rnd(expr("sqrt(CAST(chi6 AS DOUBLE) / 1e6" +
          " / (CAST(n AS DOUBLE)" +
          " * least(df_r - 1, df_c - 1)))"), 6).as("cramers_v"))
  }

  /** Hill tail-index estimator of the order-value distribution: over
    * the top k = 100 order statistics, H = mean ln(x_(i)/x_(k+1)),
    * tail α = 1/H — the heavy-tail diagnosis read before trusting any
    * mean-based spend metric. The order statistics ride the exact
    * ranged [[Ranks.globalRowNumber]] (no global sort on one task);
    * each log-ratio of exact cent integers is fixed to micro-nats, so
    * the k-term fold is an order-free long sum. */
  def qHillTail(s: SparkSession, d: String): DataFrame = {
    val k = 100
    val spend = Tables.orders(s, d)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
    val ranked = Ranks.globalRowNumber(spend,
      Seq(col("cents").desc, col("o_orderkey")), "rn")
      .filter(col("rn") <= k + 1)
      .localCheckpoint(true)
    val thresh = broadcast(ranked.filter(col("rn") === k + 1)
      .select(col("cents").as("x_k1")))
    ranked.filter(col("rn") <= k).crossJoin(thresh)
      .select(expr("CAST(round(ln(CAST(cents AS DOUBLE) / x_k1) * 1e6)" +
        " AS BIGINT)").as("l6"), col("x_k1"))
      .agg(count(lit(1)).as("k"), sum(col("l6")).as("h6"),
        max(col("x_k1")).as("xk1"))
      .select(col("k"),
        rnd(expr("CAST(xk1 AS DOUBLE) / 100"), 2).as("threshold"),
        rnd(expr("CAST(h6 AS DOUBLE) / k / 1e6"), 6).as("hill_h"),
        rnd(expr("CAST(k AS DOUBLE) * 1e6 / h6"), 6).as("tail_alpha"))
  }

  /** Two-sample Poisson rate test: purchase-event intensity in the
    * first vs second half of the event span (split at the midpoint
    * second), z = (λ̂₁ − λ̂₂)/√(n₁/t₁² + n₂/t₂²) — the count-data
    * complement to the mean-based A/B tests. Durations are exact
    * integer seconds, counts exact longs; the rates and z are one
    * pinned double expression. ONE pass over events (plus the min/max
    * scalar), map-side combinable. */
  def qPoissonRate(s: SparkSession, d: String): DataFrame = {
    val pe = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(unix_timestamp(col("ts")).as("ts_s"))
      .localCheckpoint(true)
    val span = broadcast(pe.agg(min(col("ts_s")).as("t0"),
      max(col("ts_s")).as("t1"))
      .withColumn("mid", expr("(t0 + t1) div 2")))
    pe.crossJoin(span)
      .agg(sum(when(col("ts_s") < col("mid"), 1L).otherwise(0L))
          .as("n1"),
        sum(when(col("ts_s") >= col("mid"), 1L).otherwise(0L)).as("n2"),
        max(expr("mid - t0")).as("t1_s"),
        max(expr("t1 - mid + 1")).as("t2_s"))
      .select(col("n1"), col("n2"), col("t1_s"), col("t2_s"),
        rnd(expr("CAST(n1 AS DOUBLE) / t1_s * 3600"), 6)
          .as("rate1_per_h"),
        rnd(expr("CAST(n2 AS DOUBLE) / t2_s * 3600"), 6)
          .as("rate2_per_h"),
        rnd(expr("(CAST(n1 AS DOUBLE) / t1_s - CAST(n2 AS DOUBLE)" +
          " / t2_s) / sqrt(CAST(n1 AS DOUBLE) / (CAST(t1_s AS DOUBLE)" +
          " * t1_s) + CAST(n2 AS DOUBLE) / (CAST(t2_s AS DOUBLE)" +
          " * t2_s))"), 4).as("z_stat"))
  }

  /** Cochran's Q test of three related binary treatments over order
    * blocks (any-line discount ≥ 5 %, any-line tax ≥ 4 %, any-line
    * quantity ≥ 25): Q = (k−1)(kΣG² − (ΣG)²)/(kΣL − ΣL²) — the
    * multi-treatment generalization of McNemar. The identity keeps
    * EVERYTHING integer (ΣG²/ΣL/ΣL² exact longs from one per-order
    * rollup + one global fold); Q is one double division of identical
    * integers. */
  def qCochranQ(s: SparkSession, d: String): DataFrame = {
    val k = 3
    val blocks = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_discount") >= 0.05, 1L).otherwise(0L))
          .as("x1"),
        max(when(col("l_tax") >= 0.04, 1L).otherwise(0L)).as("x2"),
        max(when(col("l_quantity") >= 25, 1L).otherwise(0L)).as("x3"))
      .withColumn("l", col("x1") + col("x2") + col("x3"))
    blocks.agg(count(lit(1)).as("n_blocks"),
        sum(col("x1")).as("g1"), sum(col("x2")).as("g2"),
        sum(col("x3")).as("g3"),
        sum(col("l")).as("sl"), sum(col("l") * col("l")).as("sl2"))
      .select(col("n_blocks"), col("g1"), col("g2"), col("g3"),
        rnd(expr(s"CAST(($k - 1) * ($k * (CAST(g1 AS DECIMAL(38,0))" +
          s" * g1 + CAST(g2 AS DECIMAL(38,0)) * g2" +
          s" + CAST(g3 AS DECIMAL(38,0)) * g3)" +
          s" - CAST(g1 + g2 + g3 AS DECIMAL(38,0)) * (g1 + g2 + g3))" +
          s" AS DOUBLE) / ($k * sl - sl2)"), 4).as("q_stat"))
  }

  /** Wilcoxon signed-rank test of the paired quantity difference
    * between each multi-line order's first and second line. Zero
    * differences drop (classical treatment); |d| ≤ 49 so tie-averaged
    * ranks live on the DOUBLED-rank lattice of a ≤49-value histogram
    * (the [[qKruskalWallis]] trick — no per-pair rank at any scale);
    * W⁺, the tie term Σ(t³−t) and σ²'s 48-denominator numerator are
    * exact longs/DECIMAL⇄HUGEINT; z is one pinned double. */
  def qWilcoxonSignedRank(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_linenumber") <= 2)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_linenumber") === 1,
          round(col("l_quantity")).cast("long"))).as("q1"),
        max(when(col("l_linenumber") === 2,
          round(col("l_quantity")).cast("long"))).as("q2"))
      .filter(col("q1").isNotNull && col("q2").isNotNull)
      .select((col("q1") - col("q2")).as("diff"))
      .filter(col("diff") =!= 0)
    val vals = li.groupBy(abs(col("diff")).as("ad"),
        (col("diff") > 0).as("pos"))
      .agg(count(lit(1)).as("c"))
    val hist = vals.groupBy(col("ad")).agg(sum(col("c")).as("t"))
    val ranked = Ranks.globalRunningSum(hist, Seq(col("ad")), col("t"),
        "cum")
      .withColumn("r2", lit(2L) * col("cum") - col("t") + lit(1L))
    val agg = vals.join(ranked, "ad")
      .agg(sum(when(col("pos"), col("c"))
          .otherwise(lit(0L)) * col("r2")).as("w2_plus"),
        sum(col("c") * col("r2")).as("w2_all"))
    val ties = hist.agg(sum(col("t")).as("n_pairs"),
      sum(expr("CAST(t AS DECIMAL(38,0)) * t * t - t")).as("tie_term"))
    agg.crossJoin(broadcast(ties))
      .withColumn("sig48", expr("2 * CAST(n_pairs AS DECIMAL(38,0)) * " +
        "(n_pairs + 1) * (2 * n_pairs + 1) - tie_term"))
      .select(col("n_pairs"),
        (col("w2_plus").cast("double") / 2).as("w_plus"),
        ((col("w2_all") - col("w2_plus")).cast("double") / 2)
          .as("w_minus"),
        rnd(expr("(CAST(w2_plus AS DOUBLE) / 2 - " +
          "CAST(n_pairs AS DOUBLE) * (n_pairs + 1) / 4) / " +
          "sqrt(CAST(sig48 AS DOUBLE) / 48)"), 6).as("z_stat"))
  }

  /** Quantile normalization of the three returnflag daily-revenue
    * distributions (the bioinformatics/batch-effect classic): each
    * flag's series is ranked, the rank-wise CROSS-FLAG mean becomes
    * the shared reference distribution, and every (flag, rank) maps to
    * it — after normalization the three marginals are identical by
    * construction. Runs on days where ALL flags traded (equal-length
    * series, the method's requirement); ranks via the exact ranged
    * [[Ranks.groupRowNumber]] (no per-flag single-task sort at any
    * scale); the reference value is an exact integer `div` of the e4
    * lattice sum (order-free), ties in e4 broken by day so both
    * engines rank identically. */
  def qQuantileNormalize(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
    val nFlags = 3
    val full = daily.groupBy(col("day"))
      .agg(count(lit(1)).as("_nf")).filter(col("_nf") === nFlags)
      .select(col("day"))
    val common = daily.join(full, "day")
    val ranked = Ranks.groupRowNumber(common, Seq(col("flag")),
      Seq(col("e4"), col("day")), "rn", "_n")
    val ref = ranked.groupBy(col("rn"))
      .agg(sum(col("e4")).as("_se4"))
      .withColumn("norm_e4", expr(s"_se4 div $nFlags"))
    ranked.join(ref, "rn")
      .select(col("flag"), col("rn"), col("day"),
        rnd(col("e4").cast("double") / 10000, 2).as("revenue"),
        rnd(col("norm_e4").cast("double") / 10000, 2)
          .as("norm_revenue"))
      .orderBy(col("flag"), col("rn"))
  }

  /** Durbin–Watson serial-correlation test of the daily-revenue OLS
    * residuals (y = revenue e4 vs x = epoch-day index) — the residual
    * autocorrelation check that completes [[qOlsDiagnostics]]' suite
    * (DW ≈ 2(1 − ρ̂₁); DW → 0 means the trend line leaves correlated
    * errors). β/α come off exact DECIMAL⇄HUGEINT moments (identical
    * doubles both engines, the dickey-fuller convention); every
    * residual is then FIXED to the milli-e4 integer lattice so Σe²
    * and Σ(Δe)² are order-free exact sums (sized ≈2.5e35 at sf100);
    * the lag rides the calendar-bounded daily frame. */
  def qDurbinWatson(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .withColumn("x", datediff(col("day"), lit("1970-01-01")).cast("long"))
    val m = daily.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("e4")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * e4")).as("sxy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
    val fitted = daily.crossJoin(broadcast(m))
      .withColumn("b",
        expr("CAST(sxy * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)") /
          expr("CAST(sxx * n - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"))
      .withColumn("a", (col("sy").cast("double") -
        col("b") * col("sx").cast("double")) / col("n"))
      .withColumn("ef", floor((col("e4").cast("double") -
        (col("a") + col("b") * col("x").cast("double"))) * 1000 +
        lit(0.5)).cast("long"))
      .withColumn("ep", lag(col("ef"), 1).over(Window.orderBy(col("day"))))
    fitted.agg(count(lit(1)).as("n_days"),
        max(col("b")).as("_b"),
        sum(expr("CAST(ef AS DECIMAL(38,0)) * ef")).as("see"),
        sum(expr("CAST(CASE WHEN ep IS NULL THEN 0 ELSE ef - ep END" +
          " AS DECIMAL(38,0)) * (CASE WHEN ep IS NULL THEN 0" +
          " ELSE ef - ep END)")).as("sdd"))
      .select(col("n_days"),
        rnd(col("_b") / 10000, 6).as("beta_per_day"),
        rnd(expr("CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)"), 6)
          .as("dw"),
        rnd(lit(1.0) - expr("CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)")
          / 2, 4).as("rho1_approx"))
  }

  /** 1-D Wasserstein distance (earth mover's) between returnflag A's
    * and R's daily-revenue distributions — the optimal-transport
    * distance beside q_ks_test's sup-gap: on sorted equal-length
    * samples W₁ = (1/n)·Σ|x₍ᵢ₎ − y₍ᵢ₎| exactly. Runs on days where
    * BOTH flags traded (equal length by construction); rank pairing
    * via the exact ranged [[Ranks.groupRowNumber]] (e4 ties broken by
    * day, the quantile-normalize convention); the |Δ| fold is an
    * order-free exact long sum, doubles only in the final division. */
  def qWasserstein1d(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(col("l_returnflag").as("flag"),
        col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
    val both = daily.groupBy(col("day"))
      .agg(count(lit(1)).as("_nf")).filter(col("_nf") === 2)
      .select(col("day"))
    val ranked = Ranks.groupRowNumber(daily.join(both, "day"),
      Seq(col("flag")), Seq(col("e4"), col("day")), "rn", "_n")
    val a = ranked.filter(col("flag") === "A")
      .select(col("rn"), col("e4").as("xa"))
    val r = ranked.filter(col("flag") === "R")
      .select(col("rn"), col("e4").as("xr"))
    a.join(r, "rn")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("xa") - col("xr"))).as("sad"),
        max(abs(col("xa") - col("xr"))).as("mad"))
      .select(col("n_days"),
        rnd(expr("CAST(sad AS DOUBLE) / n_days / 10000"), 2)
          .as("w1_dollars"),
        rnd(col("mad").cast("double") / 10000, 2).as("max_gap_dollars"))
  }

  /** Plug-in entropy rate of the user event-type Markov chain — the
    * information-theoretic "how predictable is the next event" readout
    * above [[graft.ops.Mining.qMarkovChain]]'s raw matrix:
    * H = Σ_ij (n_ij/N)·ln(n_i·/n_ij) nats, perplexity e^H. Transition
    * census shares q_markov_chain's exact (ts_s, event_id) ordering;
    * each cell's ln of an integer ratio is an identical double both
    * engines, FIXED to the nano-nat lattice so the fold is an exact
    * DECIMAL⇄HUGEINT sum (order-free at any cell count); the two
    * finals (÷N·1e9, exp) run on identical rationals. */
  def qMarkovEntropyRate(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val t = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("nij"))
    val rowTot = t.groupBy(col("src")).agg(sum(col("nij")).as("ni"))
    t.join(rowTot, "src")
      .withColumn("ln9", expr("CAST(round(ln(CAST(ni AS DOUBLE) / nij)" +
        " * 1e9) AS BIGINT)"))
      .agg(sum(col("nij")).as("n_transitions"),
        count(lit(1)).as("n_cells"),
        sum(expr("CAST(nij AS DECIMAL(38,0)) * ln9")).as("h9"))
      .select(col("n_transitions"), col("n_cells"),
        rnd(expr("CAST(h9 AS DOUBLE) / 1e9 / n_transitions"), 6)
          .as("entropy_rate_nats"),
        rnd(exp(expr("CAST(h9 AS DOUBLE) / 1e9 / n_transitions")), 4)
          .as("perplexity"))
  }

  /** TOST equivalence testing (two one-sided tests) per nation: are
    * odd- and even-custkey balance means EQUIVALENT within ±100
    * dollars? — the "absence of a difference is itself the claim"
    * counterpart to q_welch_ttest's difference test (a non-significant
    * t does NOT establish equivalence; TOST does). Both one-sided z's
    * against the ±δ margins must clear z_α = Φ⁻¹(0.95), folded once
    * from Scala ([[graft.ops.Mining.invNorm]]) into BOTH plans as a
    * shared literal. Split and moments on the whole-dollar integer
    * lattice so every z compares identical doubles; one corpus-scaled
    * rollup, then 25-row arithmetic. */
  def qTostEquivalence(s: SparkSession, d: String): DataFrame = {
    val zAlpha = graft.ops.Mining.invNorm(0.95)
    val margin = 100.0
    val g = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("nation"),
        (col("c_custkey") % 2).as("arm"),
        round(col("c_acctbal")).cast("long").as("v"))
      .groupBy(col("nation"), col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sx"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("sx2"))
    def side(a: Int, c: String) = g.filter(col("arm") === a)
      .select(col("nation"), col("n").as(s"n$c"), col("sx").as(s"sx$c"),
        col("sx2").as(s"sx2$c"))
    val z = side(1, "o").join(side(0, "e"), "nation")
      // a singleton arm has no variance: its 0/0 moment is NaN in one
      // engine and NULL-after-floor in the other — gate the degenerate
      // cells out identically on both sides
      .filter(col("no") >= 2 && col("ne") >= 2)
      .withColumn("mean_o", col("sxo").cast("double") / col("no"))
      .withColumn("mean_e", col("sxe").cast("double") / col("ne"))
      .withColumn("var_o",
        expr("CAST(sx2o * no - CAST(sxo AS DECIMAL(38,0)) * sxo" +
          " AS DOUBLE)") /
          (col("no").cast("double") * col("no") * (col("no") - 1)) *
          col("no"))
      .withColumn("var_e",
        expr("CAST(sx2e * ne - CAST(sxe AS DECIMAL(38,0)) * sxe" +
          " AS DOUBLE)") /
          (col("ne").cast("double") * col("ne") * (col("ne") - 1)) *
          col("ne"))
      .withColumn("delta", col("mean_o") - col("mean_e"))
      .withColumn("se",
        sqrt(col("var_o") / col("no") + col("var_e") / col("ne")))
      .withColumn("z_low", (col("delta") + lit(margin)) / col("se"))
      .withColumn("z_high", (col("delta") - lit(margin)) / col("se"))
    z.select(col("nation"), (col("no") + col("ne")).as("n_cust"),
        rnd(col("delta"), 4).as("delta"),
        rnd(col("se"), 4).as("se"),
        rnd(col("z_low"), 4).as("z_low"),
        rnd(col("z_high"), 4).as("z_high"),
        (col("z_low") >= lit(zAlpha) && col("z_high") <= lit(-zAlpha))
          .as("equivalent"))
      .orderBy(col("nation"))
  }

  /** Hamilton largest-remainder apportionment: 1000 seats allocated to
    * nations by customer headcount — the FP&A/electoral allocation
    * primitive beside q_pvm_bridge. Pure integer arithmetic end to
    * end: base = (n_i·S) div N, remainders ranked exactly
    * (scaled-remainder longs, nation tiebreak), the leftover seats go
    * to the top remainders. One corpus-scaled rollup; everything
    * after runs on the 25-row census; Σseats = S by construction —
    * emitted per row so the oracle pins the invariant too. */
  def qApportionment(s: SparkSession, d: String): DataFrame = {
    val seats = 1000L
    val g = Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n_cust"))
    val tot = g.agg(sum(col("n_cust")).as("nt"))
    val based = g.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(n_cust * $seats) div nt"))
      .withColumn("rem", expr(s"n_cust * $seats - base * nt"))
    val leftover = based.agg((lit(seats) - sum(col("base"))).as("k"))
    based.crossJoin(broadcast(leftover))
      .withColumn("rrank", row_number().over(
        Window.orderBy(col("rem").desc, col("nation"))))
      .select(col("nation"), col("n_cust"), col("base"),
        when(col("rrank") <= col("k"), 1L).otherwise(0L).as("bonus"),
        (col("base") + when(col("rrank") <= col("k"), 1L)
          .otherwise(0L)).as("seats"))
      .orderBy(col("nation"))
  }

  /** Lincoln–Petersen / Chapman capture–recapture estimate of the
    * active-user population from the two window halves: users "marked"
    * in the first half, "recaptured" in the second —
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1 with a variance-based CI — the
    * classic "how many users exist that we never saw" estimator for
    * coverage auditing. One per-user census (exact midpoint split,
    * the q_ab_cuped convention); the estimate and CI are pinned
    * doubles over four exact counts. */
  def qCaptureRecapture(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"))
    val mid = ev.agg(expr("(min(ts_s) + max(ts_s)) div 2").as("mid"))
    ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(max(when(col("ts_s") < col("mid"), 1L).otherwise(0L))
        .as("h1"),
        max(when(col("ts_s") >= col("mid"), 1L).otherwise(0L)).as("h2"))
      .agg(count(lit(1)).as("n_seen"),
        sum(col("h1")).as("n1"), sum(col("h2")).as("n2"),
        sum(col("h1") * col("h2")).as("m"))
      .select(col("n_seen"), col("n1"), col("n2"), col("m"),
        rnd(expr("(CAST(n1 AS DOUBLE) + 1) * (n2 + 1) / (m + 1) - 1"),
          2).as("n_hat_chapman"),
        rnd(sqrt(expr("(CAST(n1 AS DOUBLE) + 1) * (n2 + 1)" +
          " * (n1 - m) * (n2 - m)" +
          " / ((CAST(m AS DOUBLE) + 1) * (m + 1) * (m + 2))")), 2)
          .as("se_n_hat"))
  }

  /** Bartlett's test of variance homogeneity across the 25 nation
    * groups (acctbal, whole-dollar lattice) — the parametric
    * companion to [[qBrownForsythe]] (Bartlett is sharper under
    * normality, BF robust without it). Per-group moments exact
    * (Σx long, Σx² DECIMAL⇄HUGEINT); each ln vᵢ is FIXED to the
    * nano-nat lattice and 1/(nᵢ−1) to the e-12 lattice by integer
    * division, so BOTH cross-group folds are order-free long sums
    * (a 25-row float fold would still be order-sensitive); the
    * statistic and correction are pinned doubles. */
  def qBartlettTest(s: SparkSession, d: String): DataFrame = {
    val g = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("g"),
        round(col("c_acctbal")).cast("long").as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("s2"))
      .withColumn("v", expr(
        "CAST(s2 * n - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)" +
          " / (CAST(n AS DOUBLE) * n * (n - 1))"))
      .withColumn("lnv9",
        expr("CAST(floor(ln(v) * 1e9 + 0.5) AS BIGINT)"))
      .withColumn("inv12", expr("1000000000000 div (n - 1)"))
    g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
        sum((col("n") - 1) * col("lnv9")).as("swl"),
        sum(col("inv12")).as("sinv"),
        // Σ(nᵢ−1)vᵢ = Σ⌊(nq−s²)/n⌋ — integer per group (≤1 dollar²
        // truncation), so the pooled-variance fold is order-free
        sum(expr("(s2 * n - CAST(s1 AS DECIMAL(38,0)) * s1) div n"))
          .as("_sv"))
      .withColumn("sp2", expr("CAST(_sv AS DOUBLE) / (nn - k)"))
      .select(col("k"), col("nn").as("n_total"),
        rnd(col("sp2"), 4).as("pooled_var"),
        rnd((expr("(nn - k) * ln(sp2)") -
          expr("CAST(swl AS DOUBLE) / 1e9")) /
          (lit(1.0) + (expr("CAST(sinv AS DOUBLE) / 1e12") -
            expr("1.0 / (nn - k)")) / (lit(3.0) * (col("k") - 1))), 4)
          .as("bartlett_chi2"))
  }

  /** Empirical upper-tail dependence of (acctbal, total spend) per
    * customer: λ_U(q) = P(spend above its q-quantile | balance above
    * its q-quantile) at q ∈ {0.90, 0.95, 0.99} — the copula-style
    * "do extremes co-occur" readout a correlation coefficient hides.
    * Both margins rank by the exact ranged scan (total orders with
    * key tie-breaks), the tail memberships are integer rank
    * comparisons, and each λ is one division of exact counts. */
  def qTailDependence(s: SparkSession, d: String): DataFrame = {
    val per = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey").as("cust"))
      .agg(max(round(col("c_acctbal") * 100).cast("long")).as("bal"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("spend"))
    val rx = Ranks.groupRowNumber(per, Seq.empty,
      Seq(col("bal"), col("cust")), "rx", "tot")
    val rxy = Ranks.groupRowNumber(rx, Seq.empty,
      Seq(col("spend"), col("cust")), "ry", "tot2")
    val qs = Seq(0.90, 0.95, 0.99)
    qs.map { q =>
      rxy.agg(max(col("tot")).as("n"),
          sum(when(col("rx") > (col("tot").cast("double") * q), 1L)
            .otherwise(0L)).as("nx"),
          sum(when(col("rx") > (col("tot").cast("double") * q) &&
            col("ry") > (col("tot").cast("double") * q), 1L)
            .otherwise(0L)).as("nboth"))
        .select(lit(q).as("q"), col("n"), col("nx"), col("nboth"),
          rnd(col("nboth").cast("double") / col("nx"), 6)
            .as("lambda_u"))
    }.reduce(_ unionByName _).orderBy(col("q"))
  }

  /** Cohen's d + Hedges' g effect size between the two big order
    * cohorts (status F vs O, whole-dollar lattice): the
    * "how big is the difference" readout beside q_welch_ttest's
    * "is there one". Two exact moment triples (n, Σx long,
    * Σx² DECIMAL⇄HUGEINT), pooled SD and both effect sizes a
    * constant pinned-order double tail — one corpus-scaled rollup. */
  def qCohensD(s: SparkSession, d: String): DataFrame = {
    val g = Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("F", "O"))
      .select(col("o_orderstatus").as("g"),
        round(col("o_totalprice")).cast("long").as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("s2"))
    g.agg(
        max(when(col("g") === "F", col("n"))).as("n1"),
        max(when(col("g") === "F", col("s1"))).as("sa"),
        max(when(col("g") === "F", col("s2"))).as("qa"),
        max(when(col("g") === "O", col("n"))).as("n2"),
        max(when(col("g") === "O", col("s1"))).as("sb"),
        max(when(col("g") === "O", col("s2"))).as("qb"))
      .withColumn("va", expr("CAST(qa * n1 - CAST(sa AS DECIMAL(38,0))" +
        " * sa AS DOUBLE) / (CAST(n1 AS DOUBLE) * (n1 - 1))"))
      .withColumn("vb", expr("CAST(qb * n2 - CAST(sb AS DECIMAL(38,0))" +
        " * sb AS DOUBLE) / (CAST(n2 AS DOUBLE) * (n2 - 1))"))
      .withColumn("sp", sqrt(expr(
        "((n1 - 1) * va + (n2 - 1) * vb) / (n1 + n2 - 2)")))
      .withColumn("dd", expr(
        "(CAST(sa AS DOUBLE) / n1 - CAST(sb AS DOUBLE) / n2) / sp"))
      .select(col("n1"), col("n2"),
        rnd(expr("CAST(sa AS DOUBLE) / n1 - CAST(sb AS DOUBLE) / n2"), 2)
          .as("mean_diff"),
        rnd(col("sp"), 2).as("pooled_sd"),
        rnd(col("dd"), 6).as("cohens_d"),
        rnd(expr("dd * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))"), 6)
          .as("hedges_g"))
  }

  /** Odds ratio of the user-level 2×2 (hash-arm exposure ×
    * above-global-mean-spender outcome) with the Wald SE of ln(OR)
    * and the 2×2 chi-square — the case-control readout beside
    * q_ab_srm's allocation alarm. The outcome dichotomy is an exact
    * integer CROSS-MULTIPLY (userCents·N > globalCents·n_u — no
    * division, so no float boundary can flip a user cross-engine);
    * the corpus folds to one per-user census then four cells; OR, SE
    * and χ² are rationals/sqrt of identical integers (no libm). */
  def qOddsRatio(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("sc"),
        count(lit(1)).as("nu"))
    val tot = per.agg(sum(col("sc")).as("gc"), sum(col("nu")).as("gn"))
    per.crossJoin(broadcast(tot))
      .select(pmod(graft.functions.exprs.md5Lower64(
        col("user_id").cast("string"))
        .bitwiseAND(lit(Long.MaxValue)), lit(2L)).as("arm"),
        // sc·gn vs gc·nu: sc·gn ≈ 5e13 at sf100, gc·nu ≈ 6e14 — longs
        when(expr("CAST(sc AS DECIMAL(38,0)) * gn" +
          " > CAST(gc AS DECIMAL(38,0)) * nu"), 1L).otherwise(0L)
          .as("y"))
      .agg(
        sum(when(col("arm") === 0 && col("y") === 1, 1L).otherwise(0L))
          .as("a"),
        sum(when(col("arm") === 0 && col("y") === 0, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("arm") === 1 && col("y") === 1, 1L).otherwise(0L))
          .as("c"),
        sum(when(col("arm") === 1 && col("y") === 0, 1L).otherwise(0L))
          .as("d"))
      .select(col("a"), col("b"), col("c"), col("d"),
        rnd(expr("CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c)"), 6)
          .as("odds_ratio"),
        rnd(sqrt(expr("1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d")), 6)
          .as("se_log_or"),
        rnd(expr("CAST(a + b + c + d AS DOUBLE)" +
          " * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)" +
          " * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)" +
          " / ((a + b) * (CAST(c AS DOUBLE) + d) * (a + c) * (b + d))"),
          4).as("chi2"))
  }

  /** McNemar/sign paired test: did per-user CLICK INTENSITY shift
    * between the first and second half of the window? Each user is
    * one pair (first-half clicks, second-half clicks); b = users who
    * clicked MORE in the first half, c = more in the second (ties
    * drop, the exact-binomial/sign-test convention). One per-user
    * census, then the continuity-corrected (|b−c|−1)²/(b+c) — pure
    * integer rational; NULL only if every user tied. */
  def qMcnemar(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
    val mid = ev.agg(expr("(min(ts_s) + max(ts_s)) div 2").as("mid"))
    ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click" &&
          col("ts_s") < col("mid"), 1L).otherwise(0L)).as("x1"),
        sum(when(col("event_type") === "click" &&
          col("ts_s") >= col("mid"), 1L).otherwise(0L)).as("x2"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("x1") > col("x2"), 1L).otherwise(0L)).as("b"),
        sum(when(col("x2") > col("x1"), 1L).otherwise(0L)).as("c"))
      .select(col("n_users"), col("b"), col("c"),
        rnd(expr("CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)" +
          " / nullif(b + c, 0)"), 4).as("mcnemar_chi2"),
        (expr("CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)" +
          " / nullif(b + c, 0)") > 3.841).as("significant_5pct"))
  }

  /** Mantel–Haenszel pooled odds ratio across DAY strata (hash-arm
    * exposure × purchase outcome per event) vs the crude OR — the
    * stratified-confounding readout beside q_simpson_audit. Each
    * stratum's ad/n and bc/n terms are FIXED to the micro lattice by
    * integer division (a·d·10⁶ div n — both engines floor the same
    * integers), so both cross-stratum folds are order-free long sums
    * and OR_MH is one final division. */
  def qMantelHaenszel(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"),
        pmod(graft.functions.exprs.md5Lower64(
          col("user_id").cast("string"))
          .bitwiseAND(lit(Long.MaxValue)), lit(2L)).as("arm"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("day"))
      .agg(
        sum(when(col("arm") === 0 && col("y") === 1, 1L).otherwise(0L))
          .as("a"),
        sum(when(col("arm") === 0 && col("y") === 0, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("arm") === 1 && col("y") === 1, 1L).otherwise(0L))
          .as("c"),
        sum(when(col("arm") === 1 && col("y") === 0, 1L).otherwise(0L))
          .as("d"))
      .withColumn("n", expr("a + b + c + d"))
    cells.agg(count(lit(1)).as("n_strata"),
        // DECIMAL products: a·d·10⁶ is ~1.1e19 at sf100 day-cells —
        // past the ANSI long (div RESULT ≤ 10⁶·cellRate stays small)
        sum(expr("(CAST(a AS DECIMAL(38,0)) * d * 1000000) div n"))
          .as("_ad"),
        sum(expr("(CAST(b AS DECIMAL(38,0)) * c * 1000000) div n"))
          .as("_bc"),
        sum(col("a")).as("ta"), sum(col("b")).as("tb"),
        sum(col("c")).as("tc"), sum(col("d")).as("td"))
      .select(col("n_strata"),
        rnd(expr("CAST(_ad AS DOUBLE) / _bc"), 6).as("or_mh"),
        rnd(expr("CAST(ta AS DOUBLE) * td" +
          " / (CAST(tb AS DOUBLE) * tc)"), 6).as("or_crude"))
  }

  /** Cochran–Armitage trend test: does the F-status rate trend across
    * the ORDERED order-priority doses 1..5? — the dose-response
    * companion to q_chi_square's unordered independence test. All
    * moments (N, R, Σwn, Σw²n, Σwr) are exact longs from one rollup;
    * the Z² statistic is a constant pinned-order double expression
    * with DECIMAL⇄HUGEINT cross-products. */
  def qCochranArmitage(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(substring(col("o_orderpriority"), 1, 1).cast("long")
        .as("w"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("r"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("rr"),
        sum(col("w")).as("swn"),
        sum(col("w") * col("w")).as("sw2n"),
        sum(col("w") * col("r")).as("swr"))
      .select(col("n"), col("rr").as("n_success"),
        rnd(expr(
          "CAST(CAST(n AS DECIMAL(38,0)) * swr" +
            " - CAST(rr AS DECIMAL(38,0)) * swn AS DOUBLE)" +
            " * CAST(CAST(n AS DECIMAL(38,0)) * swr" +
            " - CAST(rr AS DECIMAL(38,0)) * swn AS DOUBLE)" +
            " * (n - 1)" +
            " / (CAST(rr AS DOUBLE) * (n - rr))" +
            " / CAST(CAST(n AS DECIMAL(38,0)) * sw2n" +
            " - CAST(swn AS DECIMAL(38,0)) * swn AS DOUBLE)"), 4)
          .as("z2"),
        (expr(
          "CAST(CAST(n AS DECIMAL(38,0)) * swr" +
            " - CAST(rr AS DECIMAL(38,0)) * swn AS DOUBLE)" +
            " * CAST(CAST(n AS DECIMAL(38,0)) * swr" +
            " - CAST(rr AS DECIMAL(38,0)) * swn AS DOUBLE)" +
            " * (n - 1)" +
            " / (CAST(rr AS DOUBLE) * (n - rr))" +
            " / CAST(CAST(n AS DECIMAL(38,0)) * sw2n" +
            " - CAST(swn AS DECIMAL(38,0)) * swn AS DOUBLE)") > 3.841)
          .as("significant_5pct"))

  /** Fisher z-test: are the qty↔price correlations of returnflags R
    * and A DIFFERENT? — the compare-two-correlations readout above
    * q_corr_matrix's single-population matrix. Per-flag moments exact
    * DECIMAL⇄HUGEINT; each r is one pinned division; atanh(r) =
    * ln((1+r)/(1−r))/2 runs on identical doubles both engines (the
    * q_markov_entropy_rate ln convention) and z is the final pinned
    * expression. */
  def qFisherZ(s: SparkSession, d: String): DataFrame = {
    val m = Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_returnflag").as("g"),
        round(col("l_quantity")).cast("long").as("x"),
        round(col("l_extendedprice")).cast("long").as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .withColumn("r", expr(
        "CAST(sxy * n - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)" +
          " / sqrt(CAST(sxx * n - CAST(sx AS DECIMAL(38,0)) * sx" +
          " AS DOUBLE))" +
          " / sqrt(CAST(syy * n - CAST(sy AS DECIMAL(38,0)) * sy" +
          " AS DOUBLE))"))
    m.agg(
        max(when(col("g") === "R", col("r"))).as("r1"),
        max(when(col("g") === "R", col("n"))).as("n1"),
        max(when(col("g") === "A", col("r"))).as("r2"),
        max(when(col("g") === "A", col("n"))).as("n2"))
      .select(col("n1"), col("n2"),
        rnd(col("r1"), 6).as("corr_r"), rnd(col("r2"), 6).as("corr_a"),
        rnd(expr("(ln((1 + r1) / (1 - r1)) / 2" +
          " - ln((1 + r2) / (1 - r2)) / 2)" +
          " / sqrt(1.0 / (n1 - 3) + 1.0 / (n2 - 3))"), 4).as("z"),
        (abs(expr("(ln((1 + r1) / (1 - r1)) / 2" +
          " - ln((1 + r2) / (1 - r2)) / 2)" +
          " / sqrt(1.0 / (n1 - 3) + 1.0 / (n2 - 3))")) > 1.96)
          .as("significant_5pct"))
  }

  /** KPSS level-stationarity statistic of the daily revenue series
    * (lag-0 long-run variance): η = Σ S̃_t² / (n · Σ ẽ_t²) on the
    * n-SCALED integer lattice — ẽ_t = n·x_t − S is exact (no float
    * mean), partial sums S̃_t and both squared folds ride
    * DECIMAL(38,0)⇄HUGEINT (x in tens of dollars keeps Σ S̃² ≈ 6e35
    * at sf100, inside DECIMAL's 1e38), and η is ONE final division of
    * identical integers. Companion to q_dickey_fuller: KPSS's null is
    * stationarity, ADF's is the unit root. */
  def qKpss(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")))
        .as("e4"))
      .select(col("day"), expr("e4 div 100000").as("x")) // tens of $
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(tot))
      .withColumn("e", expr("CAST(n AS DECIMAL(38,0)) * x - s"))
      .withColumn("st", sum(col("e")).over(w))
      .agg(max(col("n")).as("n_days"),
        sum(expr("st * st")).as("ss2"),
        sum(expr("e * e")).as("se2"))
      .select(col("n_days"),
        rnd(expr("CAST(ss2 AS DOUBLE) / (CAST(se2 AS DOUBLE) * n_days)"),
          6).as("kpss_eta"),
        (expr("CAST(ss2 AS DOUBLE) / (CAST(se2 AS DOUBLE) * n_days)")
          > 0.463).as("reject_stationarity_5pct"))
  }

  /** Stratified average treatment effect — the observational-causal
    * companion to q_ab_cuped/q_mantel_haenszel: users hash into two
    * arms (the deterministic assignment stand-in), stratify into
    * activity QUINTILES (exact ranged [[Ranks.globalNtile]] on event
    * count, user-id tie-break — no single-task sort), and the ATE is
    * the n_s-weighted mean of per-stratum arm differences in purchase
    * cents. Per-stratum means are FIXED to micro-cents by integer
    * division (non-negative sums — div ≡ floor both engines), so the
    * cross-strata fold is exact longs; only the final /N divides as
    * doubles. */
  def qStratifiedAte(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("cents"))
      .withColumn("arm", pmod(graft.functions.exprs.md5Lower64(
        col("user_id").cast("string"))
        .bitwiseAND(lit(Long.MaxValue)), lit(2L)))
    val strat = Ranks.globalNtile(users,
      Seq(col("n_ev"), col("user_id")), 5, "stratum")
    val cells = strat.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_s"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, col("cents")).otherwise(0L)).as("s1"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 0, col("cents")).otherwise(0L)).as("s0"))
      // a stratum missing one arm has no contrast: NULL diff, and it
      // drops out of BOTH the weighted sum and the weight total
      // (identical null semantics both engines)
      .withColumn("d6", expr("(s1 * 1000000) div nullif(n1, 0)" +
        " - (s0 * 1000000) div nullif(n0, 0)"))
      .localCheckpoint(true)
    val tot = cells.agg(
        sum(when(col("d6").isNotNull, col("n_s"))).as("nn"),
        sum(col("n_s") * col("d6")).as("w6"))
      .select(rnd(expr("CAST(w6 AS DOUBLE) / nn / 1e6 / 100"), 4)
        .as("ate_dollars"))
    cells.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_s"), col("n1"), col("n0"),
        rnd(expr("CAST(d6 AS DOUBLE) / 1e6 / 100"), 4)
          .as("diff_dollars"),
        col("ate_dollars"))
      .orderBy(col("stratum"))
  }

  /** Cliff's delta + Vargha–Delaney Â — the nonparametric effect
    * sizes (dominance probabilities) between returned and kept
    * lines' quantities: δ = (#(x>y) − #(x<y))/(n₁n₂), Â = (δ+1)/2.
    * The significance companion q_mann_whitney already exists; these
    * are the MAGNITUDE readouts reviewers now require beside p.
    * Quantity is integral ≤ 50, so the corpus collapses to a 2×50
    * contingency and all dominance counts are exact DECIMAL products
    * over the tiny cell join — never a pair join. */
  def qCliffsDelta(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(s, d)
      .groupBy((col("l_returnflag") === "R").as("ret"),
        round(col("l_quantity")).cast("long").as("q"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val a = cells.filter(col("ret")).select(col("q").as("qa"),
      col("c").as("ca"))
    val b = cells.filter(!col("ret")).select(col("q").as("qb"),
      col("c").as("cb"))
    a.crossJoin(b)
      .agg(
        sum(expr("CASE WHEN qa > qb THEN" +
          " CAST(ca AS DECIMAL(38,0)) * cb ELSE 0 END")).as("gt"),
        sum(expr("CASE WHEN qa < qb THEN" +
          " CAST(ca AS DECIMAL(38,0)) * cb ELSE 0 END")).as("lt"),
        sum(expr("CAST(ca AS DECIMAL(38,0)) * cb")).as("nn"))
      .select(
        rnd(expr("CAST(gt AS DOUBLE) / CAST(nn AS DOUBLE)" +
          " - CAST(lt AS DOUBLE) / CAST(nn AS DOUBLE)"), 6)
          .as("cliffs_delta"),
        rnd(expr("(CAST(gt AS DOUBLE) / CAST(nn AS DOUBLE)" +
          " - CAST(lt AS DOUBLE) / CAST(nn AS DOUBLE) + 1) / 2"), 6)
          .as("vargha_delaney_a"),
        (abs(expr("CAST(gt AS DOUBLE) / CAST(nn AS DOUBLE)" +
          " - CAST(lt AS DOUBLE) / CAST(nn AS DOUBLE)")) < 0.147)
          .as("negligible_effect"))
  }

  /** Jonckheere–Terpstra ordered-alternative test: does line
    * quantity trend MONOTONICALLY across the five ordered order
    * priorities? Strictly sharper than Kruskal–Wallis when the
    * alternative is ordered. The corpus collapses to the 5×50
    * (priority, quantity) contingency (quantity is integral ≤ 50),
    * and J rides the DOUBLED lattice (J2 = Σ_{g<h} 2·c_g(q)·c_h(q')
    * [q<q'] + c_g(q)·c_h(q) — tie-halves stay integral) as exact
    * DECIMAL products over the tiny cell self-join; mean and the
    * classical no-tie variance are a pinned double tail (z is the
    * standard large-sample approximation; ties inflate it equally in
    * both engines). */
  def qJonckheere(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("g"),
        round(col("l_quantity")).cast("long").as("q"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val j2 = cells.as("a").join(cells.as("b"),
        col("a.g") < col("b.g"))
      .agg(sum(expr("CAST(a.c AS DECIMAL(38,0)) * b.c" +
        " * (CASE WHEN a.q < b.q THEN 2" +
        " WHEN a.q = b.q THEN 1 ELSE 0 END)")).as("j2"))
    val m = cells.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
      .agg(sum(col("n_g")).as("n"),
        sum(expr("CAST(n_g AS DECIMAL(38,0)) * n_g")).as("sn2"),
        sum(expr("CAST(n_g AS DECIMAL(38,0)) * n_g * (2 * n_g + 3)"))
          .as("sn3"),
        count(lit(1)).as("k"))
    j2.crossJoin(broadcast(m))
      .select(col("n"), col("k"),
        (expr("CAST(j2 AS DOUBLE) / 2")).as("_j"),
        expr("(CAST(n AS DOUBLE) * n - CAST(sn2 AS DOUBLE)) / 4")
          .as("_e"),
        expr("(CAST(n AS DOUBLE) * n * (2 * n + 3)" +
          " - CAST(sn3 AS DOUBLE)) / 72").as("_v"))
      .select(col("n"), col("k"),
        rnd(col("_j"), 1).as("j_stat"),
        rnd(col("_e"), 1).as("j_mean"),
        rnd((col("_j") - col("_e")) / sqrt(col("_v")), 4)
          .as("z_notie"),
        ((col("_j") - col("_e")) / sqrt(col("_v")) > 1.645)
          .as("increasing_5pct"))
  }

  /** Page's L trend test over the [[qFriedman]] repeated-measures
    * design: with the three line positions as ordered treatments, is
    * quantity trending across position? L = Σ_j j·R_j over the SAME
    * doubled within-block ranks Friedman folds (L2 = Σ j·S2_j stays
    * exact integers); the normal approximation
    * z = (12L − 3nk(k+1)²)/√(n·k²(k²−1)(k+1)) is the double tail.
    * Strictly sharper than Friedman's omnibus χ² when the
    * alternative is ordered — the within-block companion to
    * [[qJonckheere]]. */
  def qPageTrend(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(s, d)
      .filter(col("l_linenumber") <= 3)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_linenumber") === 1,
          round(col("l_quantity")).cast("long"))).as("q1"),
        max(when(col("l_linenumber") === 2,
          round(col("l_quantity")).cast("long"))).as("q2"),
        max(when(col("l_linenumber") === 3,
          round(col("l_quantity")).cast("long"))).as("q3"))
      .filter(col("q1").isNotNull && col("q2").isNotNull &&
        col("q3").isNotNull)
    def r2(self: String, o1: String, o2: String) = expr(
      s"2 * (CASE WHEN $o1 < $self THEN 1 ELSE 0 END" +
        s" + CASE WHEN $o2 < $self THEN 1 ELSE 0 END)" +
        s" + CASE WHEN $o1 = $self THEN 1 ELSE 0 END" +
        s" + CASE WHEN $o2 = $self THEN 1 ELSE 0 END + 2")
    cells
      .select(r2("q1", "q2", "q3").as("r2_1"),
        r2("q2", "q1", "q3").as("r2_2"),
        r2("q3", "q1", "q2").as("r2_3"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("r2_1")).as("s1"), sum(col("r2_2")).as("s2"),
        sum(col("r2_3")).as("s3"))
      .withColumn("l2",
        col("s1") + lit(2L) * col("s2") + lit(3L) * col("s3"))
      .select(col("n_blocks"),
        rnd(expr("CAST(l2 AS DOUBLE) / 2"), 1).as("page_l"),
        rnd(expr("(12 * (CAST(l2 AS DOUBLE) / 2)" +
          " - 3 * CAST(n_blocks AS DOUBLE) * 3 * 16)" +
          " / sqrt(CAST(n_blocks AS DOUBLE) * 9 * 8 * 4)"), 4)
          .as("z_stat"),
        (expr("(12 * (CAST(l2 AS DOUBLE) / 2)" +
          " - 3 * CAST(n_blocks AS DOUBLE) * 3 * 16)" +
          " / sqrt(CAST(n_blocks AS DOUBLE) * 9 * 8 * 4)") > 1.645)
          .as("increasing_5pct"))
  }

  /** Mood's median test: do the nation groups share a common median
    * account balance? The GLOBAL low median (exact cent lattice,
    * tie-broken by custkey — [[qBrownForsythe]]'s selection
    * convention, ranged [[Ranks.groupRowNumber]] with no single-task
    * sort) splits every nation into above / at-or-below counts, and
    * the k×2 contingency table gets the [[Mining.qChiSquare]]
    * treatment: expected counts 6-dp pre-rounded, contributions and
    * χ² at 4 — doubles only over identical integers. */
  def qMoodsMedian(s: SparkSession, d: String): DataFrame = {
    val x = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("g"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("v"))
    val med = Ranks.groupRowNumber(x, Seq.empty,
        Seq(col("v"), col("c_custkey")), "rn", "tot")
      .filter(expr("rn = (tot + 1) div 2"))
      .agg(min(col("v")).as("med"))
    val cell = x.crossJoin(broadcast(med))
      .groupBy(col("g"))
      .agg(sum(when(col("v") > col("med"), 1L).otherwise(0L)).as("above"),
        sum(when(col("v") <= col("med"), 1L).otherwise(0L)).as("at_below"),
        max(col("med")).as("median_cents"))
    val w = Window.partitionBy()
    cell
      .withColumn("n_g", col("above") + col("at_below"))
      .withColumn("n", sum(col("n_g")).over(w))
      .withColumn("ta", sum(col("above")).over(w))
      .withColumn("tb", sum(col("at_below")).over(w))
      .withColumn("ea", rnd(col("n_g").cast("double") * col("ta")
        / col("n"), 6))
      .withColumn("eb", rnd(col("n_g").cast("double") * col("tb")
        / col("n"), 6))
      .withColumn("contrib", rnd(
        pow(col("above") - col("ea"), 2) / col("ea") +
          pow(col("at_below") - col("eb"), 2) / col("eb"), 4))
      .withColumn("chi2", rnd(sum(col("contrib")).over(w), 4))
      .select(col("g").as("nationkey"), col("median_cents"),
        col("above"), col("at_below"), col("contrib"), col("chi2"))
      .orderBy(col("nationkey"))
  }

  /** First-order partial correlation r(qty, price | discount) per
    * return flag — does quantity correlate with line price once the
    * discount channel is held fixed? All nine cross moments are one
    * map-side-combinable aggregation on exact lattices (qty units,
    * price cents, discount pct; products on DECIMAL(38,0)⇄HUGEINT),
    * the three pairwise r's and the partial are a constant pinned
    * double expression per group. */
  def qPartialCorr(s: SparkSession, d: String): DataFrame = {
    val x = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("g"),
        round(col("l_quantity")).cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"),
        round(col("l_discount") * 100).cast("long").as("z"))
    def dd(c: String) = s"CAST($c AS DECIMAL(38,0))"
    val m = x.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("z")).as("sz"),
        sum(expr(s"${dd("x")} * x")).as("sxx"),
        sum(expr(s"${dd("y")} * y")).as("syy"),
        sum(expr(s"${dd("z")} * z")).as("szz"),
        sum(expr(s"${dd("x")} * y")).as("sxy"),
        sum(expr(s"${dd("x")} * z")).as("sxz"),
        sum(expr(s"${dd("y")} * z")).as("syz"))
    def r(ab: String, a: String, b: String, aa: String, bb: String) =
      s"""(CAST(n AS DOUBLE) * CAST($ab AS DOUBLE)
         |  - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE))
         | / sqrt((CAST(n AS DOUBLE) * CAST($aa AS DOUBLE)
         |    - CAST(s$a AS DOUBLE) * CAST(s$a AS DOUBLE))
         |  * (CAST(n AS DOUBLE) * CAST($bb AS DOUBLE)
         |    - CAST(s$b AS DOUBLE) * CAST(s$b AS DOUBLE)))"""
        .stripMargin.replace("\n", " ")
    m.withColumn("rxy", expr(r("sxy", "x", "y", "sxx", "syy")))
      .withColumn("rxz", expr(r("sxz", "x", "z", "sxx", "szz")))
      .withColumn("ryz", expr(r("syz", "y", "z", "syy", "szz")))
      .select(col("g").as("returnflag"), col("n"),
        rnd(col("rxy"), 4).as("r_xy"),
        rnd(col("rxz"), 4).as("r_xz"),
        rnd(col("ryz"), 4).as("r_yz"),
        rnd((col("rxy") - col("rxz") * col("ryz")) /
          sqrt((lit(1.0) - col("rxz") * col("rxz")) *
            (lit(1.0) - col("ryz") * col("ryz"))), 4)
          .as("r_xy_given_z"))
      .orderBy(col("returnflag"))
  }

  /** Intraclass correlation ICC(1) of account balance across nation
    * groups — how much of the variance is BETWEEN nations
    * (one-way random-effects reliability, the agreement companion to
    * [[Mining.qAnovaF]]). MSB/MSW from the same whole-dollar exact
    * moments (Σx long, Σx² and Σ⌊S²/n⌋ on DECIMAL(38,0)); the
    * unequal-group-size correction n₀ = (N − Σn_g²/N)/(k−1) and the
    * ICC are a pinned double tail. */
  def qIcc(s: SparkSession, d: String): DataFrame = {
    // +1000 shift keeps every dollar value (floor ≥ −1000) and hence
    // every div numerator non-negative (variance/ICC are
    // shift-invariant; DuckDB // floors while Spark div truncates —
    // they agree only on non-negative numerators)
    val g = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("g"),
        (round(col("c_acctbal")).cast("long") + 1000L).as("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("c")).as("sx"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sxx"))
    val t = g.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("sx")).as("s"), sum(col("sxx")).as("s2"),
        sum(expr("CAST(sx div n_g AS DECIMAL(38,0)) * sx" +
          " + (CAST(sx % n_g AS DECIMAL(38,0)) * sx) div n_g"))
          .as("sb"),
        sum(expr("CAST(n_g AS DECIMAL(38,0)) * n_g")).as("sn2"))
      .withColumn("ssb", expr(
        "CAST(sb AS DOUBLE) - CAST(CAST(s div n AS DECIMAL(38,0)) * s" +
          " + (CAST(s % n AS DECIMAL(38,0)) * s) div n AS DOUBLE)"))
      .withColumn("ssw", expr("CAST(s2 AS DOUBLE) - CAST(sb AS DOUBLE)"))
      .withColumn("msb", col("ssb") / (col("k") - 1))
      .withColumn("msw", col("ssw") / (col("n") - col("k")))
      .withColumn("n0", (col("n") -
        expr("CAST(sn2 AS DOUBLE)") / col("n")) / (col("k") - 1))
    t.select(col("k"), col("n"), rnd(col("msb"), 2).as("msb"),
      rnd(col("msw"), 2).as("msw"), rnd(col("n0"), 4).as("n0"),
      rnd((col("msb") - col("msw")) /
        (col("msb") + (col("n0") - 1) * col("msw")), 6).as("icc1"))
  }

  /** Bhattacharyya coefficient + Hellinger distance between the
    * click and purchase VALUE distributions over a fixed 20-bin grid
    * (30-unit bins on the e4 value lattice — integer-exact bin
    * assignment, the [[Profiling.qPsiDrift]] histogram discipline).
    * Each bin's √(c·p) is FIXED to the micro lattice
    * (floor(√(c·p)·10⁶) — sqrt of an identical long product is one
    * correctly-rounded IEEE op), so the cross-bin fold is an
    * order-free long sum; BC normalizes by √(n_c·n_p) and
    * H = √(1−BC) in the double tail. */
  def qHellingerBc(s: SparkSession, d: String): DataFrame = {
    val b = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase") &&
        col("value").isNotNull)
      .select(col("event_type"),
        least(lit(19L), expr(
          "CAST(round(value * 10000) AS BIGINT) div 300000")).as("bin"))
      .groupBy(col("bin"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("p"))
    b.agg(count(lit(1)).as("n_bins"),
        sum(col("c")).as("nc"), sum(col("p")).as("np"),
        sum(floor(sqrt((col("c") * col("p")).cast("double")) * 1e6)
          .cast("long")).as("t6"))
      .select(col("n_bins"), col("nc"), col("np"),
        rnd(expr("CAST(t6 AS DOUBLE) / 1e6" +
          " / sqrt(CAST(nc AS DOUBLE) * np)"), 6).as("bhattacharyya"),
        rnd(sqrt(lit(1.0) - expr("CAST(t6 AS DOUBLE) / 1e6" +
          " / sqrt(CAST(nc AS DOUBLE) * np)")), 6).as("hellinger"))
  }

  /** Anderson–Darling goodness-of-fit of purchase inter-arrival gaps
    * against the fitted exponential — the tail-sensitive EDF test
    * beside the KS and Cramér–von Mises keys. Gaps are exact second
    * longs (distinct purchase seconds ⇒ strictly positive); order
    * statistics ride the ranged [[Ranks.groupRowNumber]]; λ = n/Σx is
    * one rational; each order-statistic term
    * (2i−1)·lnF(xᵢ) + (2n−2i+1)·lnS(xᵢ) is computed on identical
    * doubles and FIXED to the micro lattice pre-divided by n
    * (floor(term·10⁶/n) — the shared-quantization contract: both
    * engines floor the same doubles, and the ≤n·10⁻⁶ shared bias sits
    * far below the statistic's scale), so the fold is an order-free
    * long sum; A² is the double tail. */
  def qAndersonDarling(s: SparkSession, d: String): DataFrame = {
    val secs = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(unix_timestamp(col("ts")).as("t")).distinct()
    val ord = Window.orderBy(col("t"))
    val gaps = secs
      .withColumn("gap", col("t") - lag(col("t"), 1).over(ord))
      .filter(col("gap").isNotNull)
      .select(col("gap"))
    val ranked = Ranks.groupRowNumber(gaps, Seq.empty,
      Seq(col("gap")), "i", "n")
    val lam = gaps.agg(count(lit(1)).as("_n"), sum(col("gap")).as("_sx"))
    ranked.crossJoin(broadcast(lam))
      .withColumn("lx", expr("CAST(_n AS DOUBLE) / _sx * gap"))
      .withColumn("term",
        (lit(2) * col("i") - 1) * log(lit(1.0) - exp(-col("lx"))) +
          (lit(2) * col("n") - lit(2) * col("i") + 1) * (-col("lx")))
      .withColumn("t6", floor(col("term") * 1e6 / col("n")).cast("long"))
      .agg(max(col("n")).as("n_gaps"), max(col("_sx")).as("sum_gap_s"),
        sum(col("t6")).as("_s6"))
      .select(col("n_gaps"), col("sum_gap_s"),
        rnd(expr("CAST(n_gaps AS DOUBLE) / sum_gap_s"), 6).as("lambda"),
        rnd(-col("n_gaps") - expr("CAST(_s6 AS DOUBLE) / 1e6"), 4)
          .as("a2_stat"),
        (-col("n_gaps") - expr("CAST(_s6 AS DOUBLE) / 1e6") > 1.321)
          .as("reject_exponential_5pct"))
  }
}
