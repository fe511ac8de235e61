package graft.tools

/** Static overflow-headroom ledger (r14 verdict order #5).
  *
  * The integer-lattice convention that makes float pipelines
  * cross-engine exact has one hard ceiling: Spark's `div` on a
  * DECIMAL operand returns LONG, long sums/products run under ANSI
  * (overflow ERRORS rather than widening, while DuckDB widens to
  * HUGEINT), so every long-typed intermediate must stay under
  * 2⁶³ ≈ 9.22e18 at the design scale. That class has bitten twice
  * reactively (q_eta_squared r13, q_tukey_hsd r14) — this ledger is
  * the proactive sweep: every corpus-scaled long-typed lattice
  * intermediate found by the r15 audit, with its worst-case magnitude
  * at the sf100 design point, asserted under the bound by
  * LatticeLedgerSpec.
  *
  * COVERAGE RULE — what must register here:
  *  - every `… div n` whose operand is DECIMAL (result is LONG);
  *  - every corpus-scaled LONG sum (`sum(x*x)` over a lattice column);
  *  - every LONG×LONG product of corpus-scaled aggregates
  *    (`n * sxx` — the q_ab_cuped class).
  * Pure DECIMAL(38,0) moment identities are exempt (1e38 ceiling —
  * ~1e34 observed worst, q_ols/q_pacf/q_corr_matrix class), as are
  * row-local divisions of domain-bounded values and count-scale
  * index arithmetic (`(tot+1) div 2`).
  *
  * The spec also pins a per-file census of `DECIMAL(38,0)`
  * occurrences: adding a lattice site anywhere fails the build until
  * this ledger is updated — registration is enforced, not hoped for.
  *
  * Violations FOUND AND FIXED by this audit (values are the pre-fix
  * worst at sf100):
  *  - q_kruskal_wallis  ⌊3R²/n⌋ ≈ 1.6e21  → ⌊mR²/n⌋ = mqR + ⌊mrR/n⌋
  *    decomposition (identical floor value, long terms ≤ 3R);
  *  - q_brown_forsythe  ⌊S²/N⌋ ≈ 6.0e19   → same decomposition;
  *  - q_anova_f         Σ(dollar²) long sum, measured 1.25e16 at
  *    sf0.1 → 1.25e19 at sf100 → DECIMAL(38,0) sum;
  *  - q_ab_cuped        n·Σx² ≈ 6.6e19 LONG product → DECIMAL(38,0)
  *    products in θ and the ρ² numerators.
  */
object LatticeLedger {

  /** 2⁶³ − 1, the ANSI long ceiling. */
  val LongMax: Double = 9.223372036854775e18

  // ---- sf100 design-point corpus bounds -------------------------------
  // Row counts extrapolate the measured sf0.1 testdata (TESTDATA.md)
  // linearly; USERS was measured to scale ×10 per sf decade with
  // per-user activity constant (sf0.01: 150 users, sf0.1: 1500).
  val LI = 6.0e8 // lineitem rows
  val ORD = 1.5e8 // orders rows
  val CUST = 1.5e7 // customer rows
  val EV = 1.0e8 // events rows
  val USERS = 1.5e6 // distinct event users
  val PART = 2.0e7 // part rows
  val DAYS = 30.0 // events calendar span (fixed by the generator)

  // ---- value-domain bounds (measured, with margin) --------------------
  val QTY = 50.0 // l_quantity
  val TOT_DOLLARS = 5.0e5 // o_totalprice dollars
  val TOT_CENTS = 5.0e7 // o_totalprice cents
  val ACCT_SPAN_CENTS = 2.0e6 // c_acctbal cent span (±~1e6)
  val ACCT_DOLLARS = 1.0e4 // c_acctbal dollars
  val USER_UNITS = 6.0e3 // per-user event-value whole units (meas. 5.4e3)
  val VAL_E4 = 6.2e6 // events.value ×1e4 (meas. max 560.21)
  val PRICE_E4 = 1.06e9 // l_extendedprice ×1e4
  val SKEW = 2.0 // margin on per-group sizes over the uniform share

  /** One corpus-scaled long-typed intermediate: the worst |magnitude|
    * it can reach at sf100, from the bounds above. */
  final case class Site(key: String, file: String, what: String,
      worst: Double) {
    def headroom: Double = LongMax / worst
  }

  val sites: Seq[Site] = Seq(
    Site("q_kruskal_wallis", "ops/Stats.scala",
      "rank-sum R2_j = Σc·(2cum−t+1), LONG sum ≤ n_j(2N+1), worst one group",
      2.1 * CUST * CUST),
    Site("q_kruskal_wallis", "ops/Stats.scala",
      "decomposed remainder div ⌊3rR/n⌋ ≤ 3R (post-fix form)",
      3 * 2.1 * CUST * CUST),
    Site("q_brown_forsythe", "ops/Stats.scala",
      "S_g = Σ|v−med| LONG sum ≤ N·span",
      CUST * ACCT_SPAN_CENTS),
    Site("q_brown_forsythe", "ops/Stats.scala",
      "decomposed remainder div ⌊rS/n⌋ ≤ S (post-fix form)",
      CUST * ACCT_SPAN_CENTS),
    Site("q_two_way_anova", "ops/Stats.scala",
      "⌊S²·1e4/n⌋ ≤ qty²·1e4·n, worst cell = whole lineitem",
      QTY * QTY * 1e4 * LI),
    Site("q_tukey_hsd", "ops/Stats.scala",
      "⌊S_g²·1e4/n_g⌋ ≤ n_g·dollars²·1e4 on the r14 dollar lattice",
      SKEW * CUST / 25 * ACCT_DOLLARS * ACCT_DOLLARS * 1e4),
    Site("q_eta_squared", "ops/Stats.scala",
      "⌊S_g²·1e4/n_g⌋ — same dollar lattice as tukey (r13 fix)",
      SKEW * CUST / 25 * ACCT_DOLLARS * ACCT_DOLLARS * 1e4),
    Site("q_anova_f", "ops/Mining.scala",
      "per-group S LONG sum ≤ n_g·dollars (Σx² now DECIMAL)",
      SKEW * ORD / 5 * TOT_DOLLARS),
    Site("q_ab_cuped", "ops/Mining.scala",
      "Σx² LONG sum ≤ users·maxUnits² (n·Σx² products now DECIMAL)",
      USERS * USER_UNITS * USER_UNITS),
    Site("q_pvm_bridge", "ops/Stats.scala",
      "row-local ⌊100·rev_e4/qty⌋ ≤ 100·price_e4",
      100 * PRICE_E4),
    Site("q_pr_auc", "ops/MlEval.scala",
      "⌊pos·cumPos·1e6/rank⌋ ≤ 1e6·N",
      1e6 * EV),
    Site("q_cohort_ltv", "ops/Mining.scala",
      "⌊(2·cumCents+n)/(2n)⌋ numerator ≤ 2·Σcents",
      2 * ORD * TOT_CENTS),
    Site("q_simpson_audit", "ops/Mining.scala",
      "Σcents LONG sum before div 100",
      ORD * TOT_CENTS),
    Site("q_kendall_tau/q_rich_club", "ops/Mining.scala",
      "pair counts c(c−1) div 2 ≤ N²/2",
      EV * EV / 2),
    Site("q_personalized_pagerank", "ops/Mining.scala",
      "micro-rank mass Σ ≤ 1e6·|nodes|",
      1e6 * PART),
    Site("q_bollinger", "ops/Behavior.scala",
      "20-day sliding Σx LONG (Σx² is DECIMAL) ≤ 20·dayE4",
      20 * (EV / DAYS) * VAL_E4),
    Site("q_sax_paa", "ops/Series.scala",
      "segment Σe4 div days ≤ span·dayE4",
      DAYS * (EV / DAYS) * VAL_E4),
    Site("q_var_cvar", "ops/Series.scala",
      "quantile index (n·5+99) div 100 ≤ n",
      EV),
    Site("data_budget_select", "ops/PipelineQueries.scala",
      "score_bp = n_dist·1e4 div n_tok ≤ 1e4·tokens",
      1e4 * 1e6),
    Site("data_temperature_mix", "ops/PipelineQueries.scala",
      "quota = 200·weight_micro div tw ≤ 2e8",
      2e8),
    Site("q_interval_align", "ops/Analytics.scala",
      "cents·overlap_days div total ≤ cents·days",
      TOT_CENTS * 1e3),
    Site("q_scd2_lookup", "ops/Warehouse.scala",
      "cents + cents div 10 ≤ 1.1·cents",
      1.1 * TOT_CENTS),
    Site("q_vwap", "ops/Series.scala",
      "per-day Σcents LONG (worst: whole corpus one day)",
      LI * 1.05e7),
    Site("q_atr", "ops/Series.scala",
      "14-day TR window LONG sum ≤ 14·valueSpanCents",
      14 * 2 * 6.2e4),
    Site("q_stochastic_osc", "ops/Series.scala",
      "k_micro = (C−L14)·1e8 div range ≤ 1e8·spanCents",
      1e8 * 6.2e4),
    Site("q_amihud_illiq", "ops/Series.scala",
      "⌊|Δe4|·1e12 / (e4·vol)⌋ ≤ 1e12·maxDayRatio (vol ≥ 1)",
      1e12 * 100),
    Site("q_sharpe_sortino", "ops/Series.scala",
      "r_e9 = ⌊e4·1e9/e4prev⌋−1e9 ≤ 1e9·maxDayRatio; Σr ≤ days·that",
      2500 * 1e9 * 100),
    Site("q_cohens_d", "ops/Stats.scala",
      "Σdollars LONG ≤ n·totDollars (squares are DECIMAL)",
      ORD * TOT_DOLLARS),
    Site("q_odds_ratio", "ops/Stats.scala",
      "outcome cross-multiply userCents·N and corpusCents·n_u — longs",
      EV * USER_UNITS * 100 * 99),
    Site("q_mantel_haenszel", "ops/Stats.scala",
      "⌊a·d·1e6/n⌋ ≤ 1e6·dayRows (DECIMAL numerator post-fix)",
      1e6 * (EV / DAYS)),
    Site("q_cochran_armitage", "ops/Stats.scala",
      "Σw·r LONG ≤ 5·N (cross-products are DECIMAL)",
      5 * ORD),
    Site("q_kpss", "ops/Stats.scala",
      "daily x = e4 div 1e5 LONG ≤ dayE4/1e5 (S̃ folds are DECIMAL)",
      (LI / 2500) * PRICE_E4 / 1e5),
    Site("q_kendall_w", "ops/Mining.scala",
      "doubled-rank deviation T LONG ≤ 2·m·n(months) (T² is DECIMAL)",
      2 * 3 * 2500.0 * 2500),
    Site("q_youden_j", "ops/MlEval.scala",
      "tp/fp LONG counts ≤ N (J numerator is DECIMAL)",
      LI),
    Site("q_page_hinkley", "ops/Series.scala",
      "daily e4 LONG ≤ dayRows·priceE4 (path folds are DECIMAL)",
      (LI / 2500) * PRICE_E4),
    Site("embed_isotropy", "ops/PipelineQueries.scala",
      "per-dim Σc6 LONG ≤ n_vecs·1e6 (norms/squares are DECIMAL)",
      2e6 * 1e6),
    Site("q_adamic_adar", "ops/Mining.scala",
      "pair aa_micro LONG sum ≤ 1e6/ln2 · maxCommonNeighbors",
      1.5e6 * PART),
    Site("q_atkinson_index", "ops/Mining.scala",
      "Σln(cents) nano-nats LONG ≤ n·ln(5e7)·1e9; Σ(1e12 div cents)",
      CUST * 18 * 1e9),
    Site("text_simpson_diversity", "ops/PipelineQueries.scala",
      "per-doc rep·1e6 LONG ≤ tokens²·1e6 (pooled rep is DECIMAL)",
      2000.0 * 2000 * 1e6),
    Site("q_mcnemar/q_palma_ratio", "ops/Stats.scala",
      "per-user click counts / ranked cent tails — LONG ≤ Σcents",
      ORD * TOT_CENTS),
    Site("q_bartlett_test", "ops/Stats.scala",
      "⌊(nq−s²)/n⌋ pooled-var term LONG ≤ n_g·var; (n−1)·lnv9 ≤ n·18e9",
      SKEW * CUST / 25 * ACCT_DOLLARS * ACCT_DOLLARS),
    Site("q_tail_dependence", "ops/Stats.scala",
      "per-customer spend LONG ≤ orders/cust·totCents",
      20 * TOT_CENTS),
    Site("q_information_ratio", "ops/Series.scala",
      "active-return diff d LONG ≤ 2·1e9·maxDayRatio; Σd ≤ days·that",
      2 * 2500 * 1e9 * 100),
    Site("stream_atkinson", "streaming/Events.scala",
      "same nano-nat/e-12 folds as q_atkinson_index",
      CUST * 18 * 1e9),
    Site("q_obv", "ops/Behavior.scala",
      "OBV running Σ±vol LONG ≤ total quantity",
      LI * QTY),
    Site("q_ulcer_index", "ops/Behavior.scala",
      "Σr8 LONG over calendar days, r8 = dd²·1e8 div peak² ≤ 1e8",
      2555 * 1e8),
    Site("q_parkinson_vol", "ops/Behavior.scala",
      "monthly Σ⌊ln²(H/L)·1e12⌋ ≤ 31·(ln 1e9)²·1e12",
      31 * 441 * 1e12),
    Site("q_icc", "ops/Stats.scala",
      "Σsx LONG over shifted dollars ≤ N·1.1e4 (rest pure DECIMAL)",
      CUST * 1.1e4),
    Site("q_hellinger_bc", "ops/Stats.scala",
      "per-bin c·p LONG product ≤ (EV/2)²; Σ⌊√(cp)·1e6⌋ ≤ 20·EV·1e6/2",
      EV / 2 * EV / 2),
    Site("q_anderson_darling", "ops/Stats.scala",
      "Σ⌊term·1e6/n⌋: n calendar-capped (distinct seconds ≤ 2.6e6); " +
        "Σ(2n−2j+1)λx_j/n ≤ 2n and Σ(2j−1)|lnF_j|/n ≤ 2n·ln n " +
        "⇒ Σ|t6| ≤ 2n·(1+ln n)·1e6",
      2 * 2.6e6 * 16 * 1e6),
    Site("text_burrows_delta", "ops/PipelineQueries.scala",
      "per-word Σf6² over 20 sources ≤ 20·1e12 (f6 ≤ 1e6 by def)",
      20 * 1e12),
    Site("embed_participation_ratio", "ops/PipelineQueries.scala",
      "Σx6 LONG per dim pair ≤ n·3e6 (x6 ≤ 3e6; Σx6x6 is DECIMAL); " +
        "c12 = cov·1e12 ≤ 9e12 value-bounded",
      2e7 * 3e6),
    Site("stream_parkinson", "streaming/Events.scala",
      "same monthly pico ln² fold as q_parkinson_vol",
      31 * 441 * 1e12),
    Site("stream_hellinger", "streaming/Events.scala",
      "same per-bin c·p product / micro √ fold as q_hellinger_bc",
      EV / 2 * EV / 2),
    Site("q_calibration_bins", "ops/MlEval.scala",
      "ECE fold Σ|acc6−conf6|·n ≤ 1e6·N (sv·1e6 on DECIMAL)",
      1e6 * LI),
    Site("stream_calibration", "streaming/Events.scala",
      "same bin lattice + ECE fold as q_calibration_bins",
      1e6 * LI),
    Site("q_seasonal_mann_kendall", "ops/Behavior.scala",
      "var×18 fold Σ n(n−1)(2n+5) over 12 seasons, n = years ≤ 10",
      12 * 10 * 9 * 25),
    Site("q_stratified_ate", "ops/Stats.scala",
      "s1·1e6 div n1 ≤ stratum cents·1e6; Σ n_s·d6 ≤ N·maxMean6",
      1.5e6 * 6e5 * 1e6 / 5 * 5 / 1e0),
    Site("q_jonckheere", "ops/Stats.scala",
      "J2 pure-DECIMAL cell products; per-group long Σc = n_g ≤ N",
      6.0e8),
    Site("q_page_trend", "ops/Stats.scala",
      "L2 = Σ weighted doubled ranks ≤ 6·8·blocks LONG",
      6 * 8 * 1.5e8),
    Site("q_cliffs_delta", "ops/Stats.scala",
      "per-arm cell counts LONG ≤ N; dominance products pure DECIMAL",
      6.0e8))

  /** Per-file census of `DECIMAL(38,0)` occurrences — the lattice
    * marker. LatticeLedgerSpec recounts the sources at test time and
    * fails on ANY drift, so a new lattice site cannot land without
    * updating this ledger (and, per the coverage rule, auditing its
    * long-typed intermediates into `sites`). */
  val decimalCensus: Map[String, Int] = Map(
    "ops/Behavior.scala" -> 6,
    "ops/Mining.scala" -> 24,
    "ops/MlEval.scala" -> 10,
    "ops/PipelineQueries.scala" -> 20,
    "ops/Profiling.scala" -> 6,
    "ops/Series.scala" -> 37,
    "ops/Stats.scala" -> 103,
    "streaming/Events.scala" -> 7,
    "dedup/Components.scala" -> 1)
}
