package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Model-evaluation / agreement statistics over deterministic
  * rule "classifiers" on the TPC-H-ish tables (SURVEY §2.2 growth,
  * r13 continuation): ROC-AUC + KS from the score-value histogram,
  * Murphy's Brier decomposition, Cohen's kappa + McNemar, and a
  * Laplace-smoothed Naive Bayes train/score loop.
  *
  * Cross-engine determinism contract (same as [[Stats]]): all
  * data-scaled aggregation happens on exact integer lattices (scores,
  * counts, micro-nat log-likelihoods `CAST(round(ln(x)*1e6) AS
  * BIGINT)` of identical double ratios); doubles appear only in final
  * pinned-order expressions over those identical integers. Wide
  * products ride DECIMAL(38,0) ⇄ DuckDB HUGEINT.
  */
object MlEval {

  private def rnd(c: Column, dp: Int) = {
    val s = math.pow(10, dp)
    floor(c * s + 0.5) / s
  }

  /** ROC-AUC, Gini coefficient and KS statistic of an integer-lattice
    * score (v = 101·round(quantity) + round(100·discount), ≤ ~5200
    * distinct values) against the label `l_returnflag = 'R'`. The ONLY
    * corpus-scaled work is one groupBy(v) histogram with map-side
    * combine; AUC and KS then come off the |values|-bounded frame via
    * ONE ranged [[Ranks.globalScan]] carrying both cumulative sums —
    * no per-row rank ever touches the corpus (the histogram-CDF
    * trapezoid identity: AUC·2·P·N = Σ_v pos_v·(2·negBelow_v + neg_v),
    * ties contributing the half-step). KS is the max lattice gap
    * |cumPos·N − cumNeg·P| / (P·N). All numerators are DECIMAL(38,0)
    * (HUGEINT in the oracle) so the identity survives 10¹² rows. */
  def qRocAuc(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.lineitem(s, d)
      .select((round(col("l_quantity")).cast("long") * 101 +
          round(col("l_discount") * 100).cast("long")).as("v"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val hist = scored.groupBy(col("v"))
      .agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
    val cum = Ranks.globalScan(hist, Seq(col("v")),
      sums = Seq(col("pos") -> "cum_pos", col("neg") -> "cum_neg"))
    val tot = cum.agg(max(col("cum_pos")).as("n_pos"),
      max(col("cum_neg")).as("n_neg")).localCheckpoint(true)
    cum.crossJoin(broadcast(tot))
      .agg(
        sum(expr("CAST(pos AS DECIMAL(38,0)) * " +
          "(2 * (cum_neg - neg) + neg)")).as("auc_num2"),
        max(expr("abs(CAST(cum_pos AS DECIMAL(38,0)) * n_neg " +
          "- CAST(cum_neg AS DECIMAL(38,0)) * n_pos)")).as("ks_num"),
        max(col("n_pos")).as("n_pos"), max(col("n_neg")).as("n_neg"))
      .withColumn("auc", expr("CAST(auc_num2 AS DOUBLE) / " +
        "(2 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))"))
      .select(col("n_pos"), col("n_neg"),
        rnd(col("auc"), 6).as("auc"),
        rnd(col("auc") * 2 - 1, 6).as("gini_coef"),
        rnd(expr("CAST(ks_num AS DOUBLE) / " +
          "(CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))"), 6)
          .as("ks_stat"))
  }

  /** Youden's J optimal operating point on the same integer-lattice
    * score/label as [[qRocAuc]]: the threshold maximizing TPR − FPR —
    * the "where do I actually cut" readout the AUC alone never gives.
    * Same one-histogram corpus pass + ranged scan; at each candidate
    * cut (classify positive when v ≥ t) the J numerator
    * TP·N − FP·P is an exact DECIMAL⇄HUGEINT integer, so the argmax
    * is a total (J, v) order over the |values|-bounded frame and
    * TPR/FPR/J are final divisions of identical integers. */
  def qYoudenJ(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.lineitem(s, d)
      .select((round(col("l_quantity")).cast("long") * 101 +
          round(col("l_discount") * 100).cast("long")).as("v"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val hist = scored.groupBy(col("v"))
      .agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
    val cum = Ranks.globalScan(hist, Seq(col("v")),
      sums = Seq(col("pos") -> "cum_pos", col("neg") -> "cum_neg"))
    val tot = cum.agg(max(col("cum_pos")).as("n_pos"),
      max(col("cum_neg")).as("n_neg")).localCheckpoint(true)
    cum.crossJoin(broadcast(tot))
      .withColumn("tp", col("n_pos") - col("cum_pos") + col("pos"))
      .withColumn("fp", col("n_neg") - col("cum_neg") + col("neg"))
      .withColumn("jnum", expr("CAST(tp AS DECIMAL(38,0)) * n_neg" +
        " - CAST(fp AS DECIMAL(38,0)) * n_pos"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("jnum").desc, col("v"))))
      .filter(col("rk") === 1)
      .select(col("v").as("threshold"), col("tp"), col("fp"),
        rnd(col("tp").cast("double") / col("n_pos"), 6).as("tpr"),
        rnd(col("fp").cast("double") / col("n_neg"), 6).as("fpr"),
        rnd(expr("CAST(jnum AS DOUBLE)") /
          (col("n_pos").cast("double") * col("n_neg")), 6)
          .as("youden_j"))
  }

  /** Average precision (PR-AUC) of the same integer-lattice score and
    * label as [[qRocAuc]] — the class-imbalance-robust companion (ROC
    * flatters a classifier when negatives dominate; the PR curve does
    * not). AP = Σ_v pos_v · precision_v / P over score buckets in
    * DESCENDING order, ties absorbed by tie-group-inclusive precision;
    * the descending cumulatives derive from the SAME ascending ranged
    * scan (cum_desc = total − cum_asc + bucket), so the corpus work is
    * still ONE histogram. Each bucket's pos·precision is an exact
    * integer micro-unit `div` (≤1 µ-unit truncation per bucket, both
    * engines truncating identically), so the fold is an order-free
    * long sum — no double ever crosses buckets. */
  def qPrAuc(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.lineitem(s, d)
      .select((round(col("l_quantity")).cast("long") * 101 +
          round(col("l_discount") * 100).cast("long")).as("v"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val hist = scored.groupBy(col("v"))
      .agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
    val cum = Ranks.globalScan(hist, Seq(col("v")),
      sums = Seq(col("pos") -> "cum_pos", col("neg") -> "cum_neg"))
    val tot = cum.agg(max(col("cum_pos")).as("n_pos"),
      max(col("cum_neg")).as("n_neg")).localCheckpoint(true)
    cum.crossJoin(broadcast(tot))
      .withColumn("cp_desc", col("n_pos") - col("cum_pos") + col("pos"))
      .withColumn("cn_desc", col("n_neg") - col("cum_neg") + col("neg"))
      .agg(sum(expr("(CAST(pos AS DECIMAL(38,0)) * cp_desc * 1000000)" +
          " div (cp_desc + cn_desc)")).as("ap_micro"),
        max(col("n_pos")).as("n_pos"), max(col("n_neg")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        rnd(expr("CAST(ap_micro AS DOUBLE) / 1e6 / n_pos"), 6)
          .as("avg_precision"),
        rnd(expr("CAST(n_pos AS DOUBLE) / (n_pos + n_neg)"), 6)
          .as("prevalence"),
        rnd(expr("CAST(ap_micro AS DOUBLE) / 1e6 / n_pos" +
          " / (CAST(n_pos AS DOUBLE) / (n_pos + n_neg))"), 4).as("lift"))
  }

  /** Murphy decomposition of the Brier score (reliability −
    * resolution + uncertainty) for a probability forecast calibrated
    * on a held-out split. Bins are the 11 discount points; the
    * forecast for bin k is the TRAIN split's positive rate
    * (label `l_returnflag = 'R'`; split = md5-lower-64 of the
    * lineitem key, engine-portable). Corpus work is two grouped
    * integer-count passes (train, test); the 11-row bin frame then
    * carries per-bin double terms rounded to the 1e-9 lattice so the
    * cross-bin sums are order-free longs (the [[Stats]] micro-unit
    * convention). Emits the per-bin calibration table plus the global
    * decomposition and the directly-computed Brier score. */
  def qBrierDecomp(s: SparkSession, d: String): DataFrame = {
    val rows = Tables.lineitem(s, d)
      .select(round(col("l_discount") * 100).cast("long").as("bin"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"),
        pmod(graft.functions.exprs.md5Lower64(
            (col("l_orderkey") * 8 + col("l_linenumber")).cast("string"))
          .bitwiseAND(lit(Long.MaxValue)), lit(2L)).as("split"))
    val train = rows.filter(col("split") === 0).groupBy(col("bin"))
      .agg(count(lit(1)).as("tn"), sum(col("y")).as("tp"))
    val test = rows.filter(col("split") === 1).groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("o"))
    val tt = test.agg(sum(col("n")).as("n_tot"), sum(col("o")).as("o_tot"))
      .localCheckpoint(true)
    val bins = test.join(train, "bin").crossJoin(broadcast(tt))
      .withColumn("p", expr("CAST(tp AS DOUBLE) / tn"))
      .withColumn("obar", expr("CAST(o_tot AS DOUBLE) / n_tot"))
      .withColumn("rel9", expr("CAST(round(n * (p - CAST(o AS DOUBLE) / n)" +
        " * (p - CAST(o AS DOUBLE) / n) * 1e9) AS BIGINT)"))
      .withColumn("res9", expr("CAST(round(n * (CAST(o AS DOUBLE) / n" +
        " - obar) * (CAST(o AS DOUBLE) / n - obar) * 1e9) AS BIGINT)"))
      .withColumn("bri9", expr("CAST(round((n * p * p - 2 * p * o + o)" +
        " * 1e9) AS BIGINT)"))
      .localCheckpoint(true)
    val glob = bins.agg(
        sum(col("rel9")).as("rel9"), sum(col("res9")).as("res9"),
        sum(col("bri9")).as("bri9"),
        max(col("n_tot")).as("n_tot"), max(col("obar")).as("obar"))
      .select(
        rnd(expr("CAST(rel9 AS DOUBLE) / 1e9 / n_tot"), 6)
          .as("reliability"),
        rnd(expr("CAST(res9 AS DOUBLE) / 1e9 / n_tot"), 6)
          .as("resolution"),
        rnd(expr("obar * (1 - obar)"), 6).as("uncertainty"),
        rnd(expr("CAST(bri9 AS DOUBLE) / 1e9 / n_tot"), 6).as("brier"))
    bins.select(col("bin"), col("n").as("n_test"),
        rnd(col("p"), 6).as("forecast_p"),
        rnd(expr("CAST(o AS DOUBLE) / n"), 6).as("obs_rate"))
      .crossJoin(broadcast(glob))
      .orderBy(col("bin"))
  }

  /** Cohen's kappa inter-rater agreement plus McNemar's paired test
    * between two deterministic binary "raters" over lineitem
    * (A: discount ≥ 5 %, B: tax ≥ 4 %). ONE map-side-combinable
    * aggregation yields the 2×2 agreement table; kappa, the marginal
    * chance agreement and McNemar's χ² = (b−c)²/(b+c) are a
    * constant-size pinned-order double expression over those four
    * longs. */
  def qCohensKappa(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .select(when(col("l_discount") >= 0.05, 1L).otherwise(0L).as("a"),
        when(col("l_tax") >= 0.04, 1L).otherwise(0L).as("b"))
      .agg(count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"))
      .withColumn("n00", expr("n - n11 - n10 - n01"))
      .withColumn("po", expr("CAST(n11 + n00 AS DOUBLE) / n"))
      .withColumn("pe", expr(
        "(CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)" +
          " + (CAST(n01 + n00 AS DOUBLE) / n)" +
          " * (CAST(n10 + n00 AS DOUBLE) / n)"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        rnd(col("po"), 6).as("p_observed"),
        rnd(col("pe"), 6).as("p_expected"),
        rnd(expr("(po - pe) / (1 - pe)"), 6).as("kappa"),
        rnd(expr("CAST((n10 - n01) * (n10 - n01) AS DOUBLE)" +
          " / (n10 + n01)"), 6).as("mcnemar_chi2"))
  }

  /** Laplace-smoothed categorical Naive Bayes: train on the even
    * md5-hash half of orders to predict `o_orderpriority` from
    * (customer mktsegment, customer nation, order month), score the
    * held-out half, emit the confusion matrix + accuracy. Training
    * reduces to three tiny grouped counts (≤ |classes|·25 rows each);
    * scoring is the test corpus broadcast-joined against the dense
    * class×value grids (unseen-in-train (class,value) cells get the
    * smoothed floor ln(1/(n_c+V)) — the grid is completed by
    * crossing train classes × train values so the join stays dense),
    * all log-likelihoods on the exact micro-nat lattice so the
    * per-row argmax compares identical longs. Argmax ties break on
    * the class string. One corpus-scaled shuffle: the final
    * groupBy(actual, predicted). */
  def qNaiveBayes(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("cls"),
        col("c_mktsegment").as("f1"),
        col("c_nationkey").cast("long").cast("string").as("f2"),
        month(col("o_orderdate")).cast("long").cast("string").as("f3"),
        pmod(graft.functions.exprs.md5Lower64(
            col("o_orderkey").cast("string"))
          .bitwiseAND(lit(Long.MaxValue)), lit(2L)).as("split"))
    val train = base.filter(col("split") === 0).localCheckpoint(true)
    val classes = train.groupBy(col("cls")).agg(count(lit(1)).as("n_c"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("n_train"))))
      .withColumn("prior6", expr("CAST(round(ln(CAST(n_c + 1 AS DOUBLE)" +
        " / (n_train + 5)) * 1e6) AS BIGINT)"))
      .localCheckpoint(true)
    // dense class×value log-likelihood grid for one feature column
    def llGrid(f: String): DataFrame = {
      val counts = train.groupBy(col("cls"), col(f))
        .agg(count(lit(1)).as("cnt"))
      val values = train.select(col(f)).distinct()
      val vCard = values.agg(count(lit(1)).as("v_card"))
      classes.select(col("cls"), col("n_c")).crossJoin(values)
        .join(counts, Seq("cls", f), "left")
        .crossJoin(broadcast(vCard))
        .select(col("cls"), col(f),
          expr("CAST(round(ln(CAST(coalesce(cnt, 0) + 1 AS DOUBLE)" +
            s" / (n_c + v_card)) * 1e6) AS BIGINT)").as(s"ll_$f"))
    }
    val test = base.filter(col("split") === 1)
    val scoredRaw = test
      .crossJoin(broadcast(classes.select(col("cls").as("cand"),
        col("prior6"))))
      .join(broadcast(llGrid("f1"))
        .withColumnRenamed("cls", "cand"), Seq("cand", "f1"), "left")
      .join(broadcast(llGrid("f2"))
        .withColumnRenamed("cls", "cand"), Seq("cand", "f2"), "left")
      .join(broadcast(llGrid("f3"))
        .withColumnRenamed("cls", "cand"), Seq("cand", "f3"), "left")
      .withColumn("score", col("prior6") +
        coalesce(col("ll_f1"), lit(Long.MinValue / 8)) +
        coalesce(col("ll_f2"), lit(Long.MinValue / 8)) +
        coalesce(col("ll_f3"), lit(Long.MinValue / 8)))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("score").desc, col("cand"))
    val predicted = scoredRaw
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cls").as("actual"), col("cand").as("predicted"))
      .localCheckpoint(true)
    val acc = predicted.agg(
        sum(when(col("actual") === col("predicted"), 1L).otherwise(0L))
          .as("hits"), count(lit(1)).as("n_test"))
      .select(col("n_test"),
        rnd(expr("CAST(hits AS DOUBLE) / n_test"), 6).as("accuracy"))
    predicted.groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(acc))
      .orderBy(col("actual"), col("predicted"))
  }

  /** Calibration / reliability diagram over the quantity-discount
    * score ([[qRocAuc]]'s scored frame, score normalized to [0,1] by
    * the corpus max): 10 equal-width probability bins, each with its
    * exact count, mean predicted probability (micro lattice,
    * Σv·10⁶ div (n·vmax) on DECIMAL) and empirical positive rate
    * (pos·10⁶ div n), plus the expected calibration error — the
    * Σ |acc−conf|·n/N readout under every model-quality dashboard.
    * One histogram shuffle; everything else on the 10-row frame. */
  def qCalibrationBins(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.lineitem(s, d)
      .select((round(col("l_quantity")).cast("long") * 101 +
          round(col("l_discount") * 100).cast("long")).as("v"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val vmax = scored.agg(max(col("v")).as("vmax")).localCheckpoint(true)
    val bins = scored.crossJoin(broadcast(vmax))
      .withColumn("bin", least(lit(9L),
        expr("(v * 10) div (vmax + 1)")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        sum(col("v")).as("sv"), max(col("vmax")).as("vmax"))
      .withColumn("conf6", expr(
        "(CAST(sv AS DECIMAL(38,0)) * 1000000) div" +
          " (CAST(n AS DECIMAL(38,0)) * vmax)"))
      .withColumn("acc6", expr("(pos * 1000000) div n"))
      .localCheckpoint(true)
    val ece = bins
      .agg(sum(col("n")).as("nn"),
        sum(abs(col("acc6") - col("conf6")) * col("n")).as("e6"))
      .select((floor(expr("CAST(e6 AS DOUBLE) / nn / 1e6") * 1e6 + 0.5)
        / 1e6).as("ece"))
    bins.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("pos"),
        (floor(expr("CAST(conf6 AS DOUBLE) / 1e6") * 1e6 + 0.5) / 1e6)
          .as("mean_pred"),
        (floor(expr("CAST(acc6 AS DOUBLE) / 1e6") * 1e6 + 0.5) / 1e6)
          .as("frac_pos"),
        col("ece"))
      .orderBy(col("bin"))
  }
}
