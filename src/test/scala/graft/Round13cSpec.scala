package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Round-13 continuation regressions: the model-evaluation family
  * (graft.ops.MlEval) certified against naive in-JVM replays on sf
  * data — independent of the DuckDB oracle, so a gate regression and
  * an algorithm regression can't mask each other.
  */
class Round13cSpec extends SparkSuite {

  private def h2(s: String): Long =
    (graft.functions.Kernels.md5Lower64(UTF8String.fromString(s))
      & Long.MaxValue) % 2

  test("roc auc matches the naive pairwise replay") {
    val r = graft.ops.MlEval.qRocAuc(spark, sf).head()
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .select((round(col("l_quantity")).cast("long") * 101 +
          round(col("l_discount") * 100).cast("long")),
        when(col("l_returnflag") === "R", 1L).otherwise(0L))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    assert(r.getLong(r.fieldIndex("n_pos")) == pos.length.toLong)
    assert(r.getLong(r.fieldIndex("n_neg")) == neg.length.toLong)
    // naive pairwise AUC with tie half-credit (histogram form: the
    // sf0.001 score domain is small, so count by value not by pair)
    val pc = pos.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nc = neg.groupBy(identity).view.mapValues(_.length.toLong).toMap
    var num2 = 0L
    for ((pv, pn) <- pc; (nv, nn) <- nc) {
      if (pv > nv) num2 += 2L * pn * nn
      else if (pv == nv) num2 += pn * nn
    }
    val auc = num2.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(r.getDouble(r.fieldIndex("auc")) - auc) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("gini_coef")) -
      (2 * auc - 1)) < 2e-6)
    // naive KS: max CDF gap over the value domain
    val vals = (pc.keySet ++ nc.keySet).toSeq.sorted
    var (cp, cn) = (0L, 0L)
    var ks = 0.0
    for (v <- vals) {
      cp += pc.getOrElse(v, 0L); cn += nc.getOrElse(v, 0L)
      ks = math.max(ks, math.abs(cp.toDouble / pos.length -
        cn.toDouble / neg.length))
    }
    assert(math.abs(r.getDouble(r.fieldIndex("ks_stat")) - ks) < 1e-6)
  }

  test("brier decomposition matches the naive replay and the identity") {
    val out = graft.ops.MlEval.qBrierDecomp(spark, sf).collect()
    val r0 = out.head
    val rel = r0.getDouble(r0.fieldIndex("reliability"))
    val res = r0.getDouble(r0.fieldIndex("resolution"))
    val unc = r0.getDouble(r0.fieldIndex("uncertainty"))
    val bri = r0.getDouble(r0.fieldIndex("brier"))
    // Murphy identity holds exactly for bin-constant forecasts
    assert(math.abs(bri - (rel - res + unc)) < 1e-5,
      s"identity: $bri vs ${rel - res + unc}")
    // naive per-row Brier replay
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .select(round(col("l_discount") * 100).cast("long"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L),
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("string"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    val train = rows.filter(t => h2(t._3) == 0L)
    val test0 = rows.filter(t => h2(t._3) == 1L)
    val p = train.groupBy(_._1).view
      .mapValues(v => v.map(_._2).sum.toDouble / v.length).toMap
    val naive = test0.map(t => math.pow(p(t._1) - t._2, 2)).sum /
      test0.length
    assert(math.abs(bri - naive) < 1e-5, s"brier: $bri vs $naive")
    // per-bin table replay
    for (r <- out) {
      val bin = r.getLong(r.fieldIndex("bin"))
      val te = test0.filter(_._1 == bin)
      assert(r.getLong(r.fieldIndex("n_test")) == te.length.toLong)
      assert(math.abs(r.getDouble(r.fieldIndex("forecast_p")) - p(bin))
        < 1e-6)
      assert(math.abs(r.getDouble(r.fieldIndex("obs_rate")) -
        te.map(_._2).sum.toDouble / te.length) < 1e-6)
    }
  }

  test("cohens kappa matches the naive replay") {
    val r = graft.ops.MlEval.qCohensKappa(spark, sf).head()
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_discount"), col("l_tax"))
      .collect().map(x => (x.getDouble(0) >= 0.05, x.getDouble(1) >= 0.04))
    val n = rows.length.toDouble
    val n11 = rows.count(t => t._1 && t._2)
    val n10 = rows.count(t => t._1 && !t._2)
    val n01 = rows.count(t => !t._1 && t._2)
    val n00 = rows.count(t => !t._1 && !t._2)
    assert(r.getLong(r.fieldIndex("n11")) == n11.toLong)
    assert(r.getLong(r.fieldIndex("n00")) == n00.toLong)
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) / n) * ((n11 + n01) / n) +
      ((n01 + n00) / n) * ((n10 + n00) / n)
    assert(math.abs(r.getDouble(r.fieldIndex("kappa")) -
      (po - pe) / (1 - pe)) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("mcnemar_chi2")) -
      math.pow(n10 - n01, 2).toDouble / (n10 + n01)) < 1e-6)
  }

  test("naive bayes confusion matrix matches the naive replay") {
    val got = graft.ops.MlEval.qNaiveBayes(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rows = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").cast("string"),
        col("o_orderpriority"), col("c_mktsegment"),
        col("c_nationkey").cast("long").cast("string"),
        month(col("o_orderdate")).cast("long").cast("string"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        Seq(r.getString(2), r.getString(3), r.getString(4))))
    val train = rows.filter(t => h2(t._1) == 0L)
    val test0 = rows.filter(t => h2(t._1) == 1L)
    val classes = train.map(_._2).distinct.sorted
    val nTrain = train.length
    def mnat(x: Double): Long = math.round(math.log(x) * 1e6)
    val prior = classes.map { c =>
      c -> mnat((train.count(_._2 == c) + 1.0) / (nTrain + 5))
    }.toMap
    val nC = classes.map(c => c -> train.count(_._2 == c)).toMap
    // per feature: value domain + smoothed grid
    val grids = (0 until 3).map { f =>
      val vs = train.map(_._3(f)).distinct
      val cnt = train.groupBy(t => (t._2, t._3(f))).view
        .mapValues(_.length).toMap
      val g = (for (c <- classes; v <- vs) yield (c, v) ->
        mnat((cnt.getOrElse((c, v), 0) + 1.0) / (nC(c) + vs.length))).toMap
      g
    }
    val floor = Long.MinValue / 8
    val conf = scala.collection.mutable.Map.empty[(String, String), Long]
    for (t <- test0) {
      val best = classes.map { c =>
        val s = prior(c) + (0 until 3).map(f =>
          grids(f).getOrElse((c, t._3(f)), floor)).sum
        (-s, c)
      }.min._2
      conf((t._2, best)) = conf.getOrElse((t._2, best), 0L) + 1L
    }
    assert(got == conf.toMap, s"confusion mismatch")
  }

  private def dailyE4(flagged: Boolean): Map[String, Seq[(java.sql.Date, Long)]] = {
    val df = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(
        (if (flagged) col("l_returnflag") else lit("*")).as("flag"),
        col("l_shipdate").cast("date").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
    df.collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1.getTime).toSeq)
      .toMap
  }

  test("var/cvar matches the naive sorted-tail replay") {
    val got = graft.ops.Series.qVarCvar(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val series = dailyE4(flagged = true)
    assert(got.keySet == series.keySet)
    for ((flag, days) <- series) {
      val deltas = days.map(_._2).sliding(2).collect {
        case Seq(a, b) => b - a
      }.toSeq.sorted
      val n = deltas.length
      val k95 = (n * 5 + 99) / 100
      val k99 = (n + 99) / 100
      val r = got(flag)
      assert(r.getLong(r.fieldIndex("n_deltas")) == n.toLong)
      assert(math.abs(r.getDouble(r.fieldIndex("var_95")) -
        -deltas(k95 - 1) / 10000.0) < 0.02, s"$flag var95")
      assert(math.abs(r.getDouble(r.fieldIndex("cvar_95")) -
        -deltas.take(k95).sum.toDouble / k95 / 10000.0) < 0.02,
        s"$flag cvar95")
      assert(math.abs(r.getDouble(r.fieldIndex("var_99")) -
        -deltas(k99 - 1) / 10000.0) < 0.02, s"$flag var99")
      assert(math.abs(r.getDouble(r.fieldIndex("cvar_99")) -
        -deltas.take(k99).sum.toDouble / k99 / 10000.0) < 0.02,
        s"$flag cvar99")
    }
  }

  test("nelson-aalen cumulative hazard matches the naive replay") {
    val out = graft.ops.Series.qNelsonAalen(spark, sf).collect()
    // naive lives replay off the events table
    val pe = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hz = pe.map(_._3).max
    val lives = pe.groupBy(_._1).values.flatMap { evs =>
      val s = evs.sortBy(e => (e._3, e._2))
      s.zipWithIndex.map { case (e, i) =>
        val nxt = if (i + 1 < s.length) Some(s(i + 1)._3) else None
        (math.floorDiv(nxt.getOrElse(hz) - e._3, 3600L),
          nxt.isDefined)
      }
    }.toSeq
    val byT = lives.groupBy(_._1).view.mapValues(v =>
      (v.count(_._2).toLong, v.count(!_._2).toLong)).toMap
    val nTotal = lives.length.toLong
    var removed = 0L
    var cum = 0.0
    val expected = byT.toSeq.sortBy(_._1).flatMap { case (t, (d, c)) =>
      val atRisk = nTotal - removed
      removed += d + c
      if (d > 0) {
        cum += d.toDouble / atRisk
        Some(t -> (atRisk, d, cum))
      } else None
    }.toMap
    assert(out.length == expected.size)
    for (r <- out) {
      val t = r.getLong(r.fieldIndex("t"))
      val (ar, d, h) = expected(t)
      assert(r.getLong(r.fieldIndex("at_risk")) == ar, s"t=$t at_risk")
      assert(r.getLong(r.fieldIndex("d_events")) == d, s"t=$t d")
      assert(math.abs(r.getDouble(r.fieldIndex("na_cum_hazard")) - h)
        < 1e-5, s"t=$t hazard")
    }
  }

  test("macd matches the naive truncated-EMA replay") {
    val out = graft.ops.Series.qMacd(spark, sf).collect()
    val days = dailyE4(flagged = false)("*")
    val xs = days.map(_._2.toDouble)
    def ema(v: IndexedSeq[Double], ws: Seq[Double], i: Int): Double = {
      val terms = ws.zipWithIndex.filter(_._2 <= i)
      terms.map { case (w, k) => w * v(i - k) }.sum /
        terms.map(_._1).sum
    }
    val vx = xs.toIndexedSeq
    val macd = vx.indices.map(i =>
      ema(vx, graft.ops.Series.macdFast, i) -
        ema(vx, graft.ops.Series.macdSlow, i))
    val signal = macd.indices.map(i =>
      ema(macd, graft.ops.Series.macdSig, i))
    assert(out.length == vx.length)
    for ((r, i) <- out.zipWithIndex) {
      assert(math.abs(r.getDouble(r.fieldIndex("macd")) -
        macd(i) / 10000) < 1e-3, s"day $i macd")
      assert(math.abs(r.getDouble(r.fieldIndex("signal")) -
        signal(i) / 10000) < 1e-3, s"day $i signal")
    }
  }

  test("ktruss census matches the naive set peel") {
    val got = graft.ops.Mining.qKtruss(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // naive edges: sparse-part co-purchase, minW=1
    val sparse = graft.sources.Tables.part(spark, sf)
      .filter(col("p_size") <= 3).select(col("p_partkey"))
      .collect().map(_.getLong(0)).toSet
    val ls = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => sparse(t._2)).distinct
    var edges = ls.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    for (i <- 1L to 3L) {
      val adj = (edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      edges = edges.filter { case (a, b) =>
        (adj(a) & adj(b)).size >= 2
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2))
      assert(got(i) == (nodes.size.toLong, edges.size.toLong),
        s"iter $i: ${got(i)} vs ${(nodes.size, edges.size)}")
    }
  }

  test("readability matches the naive regex replay") {
    val out = graft.ops.PipelineQueries.textReadability(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    for ((id, text) <- docs.take(50)) {
      val t = text.toLowerCase
      val words = "[a-z0-9]+".r.findAllIn(t).length
      val sents = math.max("[.!?]+".r.findAllIn(t).length, 1)
      val syll = "[aeiouy]+".r.findAllIn(t).length
      if (words > 0) {
        val r = out(id)
        assert(r.getLong(r.fieldIndex("n_words")) == words.toLong)
        assert(r.getLong(r.fieldIndex("n_sents")) == sents.toLong)
        assert(r.getLong(r.fieldIndex("n_syll")) == syll.toLong)
        val fre = 206.835 - 1.015 * (words.toDouble / sents) -
          84.6 * (syll.toDouble / words)
        assert(math.abs(r.getDouble(r.fieldIndex("flesch_ease")) - fre)
          < 1e-3, s"doc $id fre")
      }
    }
  }

  test("cooc pmi matches the naive window-pair replay") {
    val out = graft.ops.PipelineQueries.textCoocPmi(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getString(1).trim.split("\\s+").filter(_.nonEmpty))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
    var tTok = 0L
    var tPair = 0L
    for (ws <- docs) {
      for (w <- ws) { uni(w) = uni.getOrElse(w, 0L) + 1; tTok += 1 }
      for (k <- 1 to 2; i <- 0 until (ws.length - k)) {
        val (a, b) = (ws(i), ws(i + k))
        val key = if (a <= b) (a, b) else (b, a)
        pairs(key) = pairs.getOrElse(key, 0L) + 1
        tPair += 1
      }
    }
    val expTop = pairs.toSeq.filter(_._2 >= 20)
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(30)
    assert(out.length == expTop.length)
    for ((r, ((a, b), n)) <- out.zip(expTop)) {
      assert((r.getString(0), r.getString(1), r.getLong(2)) == (a, b, n))
      val pmi = math.log(n.toDouble * tTok * tTok /
        (tPair.toDouble * uni(a) * uni(b)))
      assert(math.abs(r.getDouble(r.fieldIndex("pmi")) - pmi) < 1e-5)
    }
  }

  test("coverage curve matches the naive first-seen replay") {
    val out = graft.ops.PipelineQueries.dataCoverageCurve(spark, sf)
      .collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ranked = docs.map(_._1).sortBy(id =>
      (graft.functions.Kernels.md5Lower64(
        UTF8String.fromString(id.toString)), id))
    val rankOf = ranked.zipWithIndex.map { case (id, i) =>
      id -> (i + 1)
    }.toMap
    val n = docs.length
    val firstSeen = scala.collection.mutable.Map.empty[String, Int]
    for ((id, text) <- docs; w <- text.trim.split("\\s+")
         if w.nonEmpty) {
      val rk = rankOf(id)
      firstSeen(w) = math.min(firstSeen.getOrElse(w, rk), rk)
    }
    val newPer = firstSeen.values.groupBy(rk =>
      ((rk - 1).toLong * 10) / n).view.mapValues(_.size.toLong).toMap
    var cum = 0L
    for (r <- out) {
      val b = r.getLong(0)
      val nt = newPer.getOrElse(b, 0L)
      cum += nt
      assert(r.getLong(r.fieldIndex("new_tokens")) == nt, s"bucket $b")
      assert(r.getLong(r.fieldIndex("cum_tokens")) == cum, s"bucket $b cum")
    }
  }

  test("schema validation matches the naive infer-and-vote replay") {
    val out = graft.ops.JsonQueries.engineSchemaValidate(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val rows = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
    def infer(name: String, v: Option[String]): String = v match {
      case Some(x) if x.matches("-?[0-9]+(\\.[0-9]+)?") => "NUMBER"
      case Some(x) if name.toLowerCase.contains("time") &&
        x.contains(":") && x.contains("T") => "DATE"
      case Some(x) if x.length < 128 => "MEDIUM_STRING"
      case _ => "TEXT"
    }
    val fields: Seq[(String, ((Long, Option[String], String)) =>
        Option[String])] = Seq(
      "k" -> (t => t._2),
      "mixed_id" -> (t => if (t._1 % 7 == 0) t._2.map("id-" + _)
        else t._2),
      "note" -> (t => Some(if (t._1 % 13 == 0) "x" * 130 else "ok")),
      "event_time" -> (t => Some(t._3)))
    for ((name, fn) <- fields) {
      val classes = rows.map(t => infer(name, fn(t)))
      val census = classes.groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      val (majCls, majN) = census.toSeq.sortBy(t => (-t._2, t._1)).head
      val r = out(name)
      assert(r.getString(r.fieldIndex("majority_class")) == majCls,
        s"$name class")
      assert(r.getLong(r.fieldIndex("n_rows")) == rows.length.toLong)
      assert(r.getLong(r.fieldIndex("n_violations")) ==
        rows.length - majN, s"$name violations")
    }
  }

  test("cronbach alpha matches the naive item-variance replay") {
    val r = graft.ops.Stats.qCronbachAlpha(spark, sf).head()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity")).cast("long"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))
    // cell scores: sum over duplicate (order, linenumber) rows
    val cells = li.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val complete = cells.keys.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).filter(_._2.size == 7).keys.toSeq
    def popVar(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    val itemVarSum = (1 to 7).map { i =>
      popVar(complete.map(o => cells((o, i)).toDouble))
    }.sum
    val totVar = popVar(complete.map(o =>
      (1 to 7).map(i => cells((o, i))).sum.toDouble))
    val alpha = (7.0 / 6) * (1 - itemVarSum / totVar)
    assert(r.getLong(r.fieldIndex("n_orders")) == complete.size.toLong)
    assert(math.abs(r.getDouble(r.fieldIndex("cronbach_alpha")) - alpha)
      < 1e-4, s"alpha ${r.getDouble(r.fieldIndex("cronbach_alpha"))}" +
        s" vs $alpha")
  }

  test("wilcoxon signed-rank matches the naive tie-averaged replay") {
    val r = graft.ops.Stats.qWilcoxonSignedRank(spark, sf).head()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_linenumber") <= 2)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity")).cast("long"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))
    val diffs = li.groupBy(_._1).values.flatMap { g =>
      // the operator takes MAX per linenumber (duplicate rows exist)
      val q1s = g.filter(_._2 == 1).map(_._3)
      val q2s = g.filter(_._2 == 2).map(_._3)
      for {
        a <- q1s.maxOption
        b <- q2s.maxOption
        if a != b
      } yield a - b
    }.toSeq
    val n = diffs.length
    val sorted = diffs.map(math.abs).sorted
    val rank = scala.collection.mutable.Map.empty[Long, Double]
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && sorted(j) == sorted(i)) j += 1
      rank(sorted(i)) = (i + 1 + j) / 2.0
      i = j
    }
    val wPlus = diffs.filter(_ > 0).map(d => rank(math.abs(d))).sum
    val ties = sorted.groupBy(identity).values
      .map(g => g.length.toDouble).map(t => t * t * t - t).sum
    val mu = n.toDouble * (n + 1) / 4
    val sig2 = (2.0 * n * (n + 1) * (2 * n + 1) - ties) / 48
    assert(r.getLong(r.fieldIndex("n_pairs")) == n.toLong)
    assert(math.abs(r.getDouble(r.fieldIndex("w_plus")) - wPlus) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("z_stat")) -
      (wPlus - mu) / math.sqrt(sig2)) < 1e-5)
  }

  test("personalized pagerank matches the naive integer iteration") {
    val got = graft.ops.Mining.qPersonalizedPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.sources.Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey") * 2, col("l_suppkey") * 2 + 1)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs ++ pairs.map(p => (p._2, p._1))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.length.toLong).toMap
    val seeds = Set(3L, 5L, 7L)
    var rank = deg.keys.map(nd =>
      nd -> (if (seeds(nd)) 333333333333L else 0L)).toMap
    for (_ <- 1 to 4) {
      val infl = scala.collection.mutable.Map.empty[Long, Long]
      for ((u, r0) <- rank if r0 > 0; v <- adj(u))
        infl(v) = infl.getOrElse(v, 0L) + r0 / deg(u)
      rank = deg.keys.map(nd => nd ->
        ((85L * infl.getOrElse(nd, 0L)) / 100 +
          (if (seeds(nd)) 50000000000L else 0L))).toMap
    }
    val exp = rank.toSeq.filter(t => t._1 % 2 == 1 && t._2 > 0)
      .map(t => ((t._1 - 1) / 2, t._2))
      .sortBy(t => (-t._2, t._1)).take(20)
    assert(got.toSeq == exp, s"${got.toSeq.take(3)} vs ${exp.take(3)}")
  }

  test("changepoint matches the naive gain-scan replay") {
    val got = graft.ops.Series.qChangepoint(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val series = dailyE4(flagged = true)
    for ((flag, days) <- series) {
      val xs = days.map(_._2)
      val n = xs.length
      val sAll = xs.sum
      var best = (-1.0, 0)
      var sT = 0L
      for (t <- 1 until n) {
        sT += xs(t - 1)
        val num = BigInt(sT) * n - BigInt(sAll) * t
        val gain = (num * num).toDouble / (t.toDouble * (n - t))
        if (gain > best._1) best = (gain, t)
      }
      val r = got(flag)
      assert(r.getLong(r.fieldIndex("t")) == best._2.toLong, s"$flag t")
      val sBest = xs.take(best._2).sum
      assert(math.abs(r.getDouble(r.fieldIndex("mean_before")) -
        sBest.toDouble / best._2 / 10000) < 0.02, s"$flag before")
    }
  }

  test("dickey-fuller matches the naive regression replay") {
    val r = graft.ops.Series.qDickeyFuller(spark, sf).head()
    val xs = dailyE4(flagged = false)("*").map(_._2.toDouble)
    val pairs = xs.sliding(2).map { case Seq(a, b) => (b - a, a) }.toSeq
    val n = pairs.length
    val (sy, sx) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxx = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val alpha = (sy - beta * sx) / n
    val sse = pairs.map(p =>
      math.pow(p._1 - alpha - beta * p._2, 2)).sum
    val sxxc = sxx - sx * (sx / n)
    val t = beta / math.sqrt(sse / (n - 2) / sxxc)
    assert(r.getLong(r.fieldIndex("n")) == n.toLong)
    assert(math.abs(r.getDouble(r.fieldIndex("beta_e8")) - beta * 1e8)
      < 0.01, s"beta ${r.getDouble(r.fieldIndex("beta_e8"))} vs " +
        s"${beta * 1e8}")
    assert(math.abs(r.getDouble(r.fieldIndex("t_df")) - t) < 0.01,
      s"t ${r.getDouble(r.fieldIndex("t_df"))} vs $t")
  }

  test("tukey hsd matches the naive pairwise replay") {
    val out = graft.ops.Stats.qTukeyHsd(spark, sf).collect()
    // whole-dollar lattice since the r14 ADVICE re-lattice (headroom
    // for the LONG-returning DECIMAL div at sf1+)
    val pts = graft.sources.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"),
        round(col("c_acctbal")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byG = pts.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nTot = pts.length
    val k = byG.size
    val ssw = byG.values.map { vs =>
      val mu = vs.sum.toDouble / vs.length
      vs.map(v => (v - mu) * (v - mu)).sum
    }.sum
    val msw = ssw / (nTot - k)
    for (r <- out.take(30)) {
      val (gi, gj) = (r.getLong(0), r.getLong(1))
      val (vi, vj) = (byG(gi), byG(gj))
      val q = math.abs(vi.sum.toDouble / vi.length -
        vj.sum.toDouble / vj.length) /
        math.sqrt(msw / 2 * (1.0 / vi.length + 1.0 / vj.length))
      // the operator's MSW rides the x1e4 division lattice; tolerance
      // covers that truncation plus replay accumulation order
      assert(math.abs(r.getDouble(r.fieldIndex("q_stat")) - q) < 1e-3,
        s"($gi,$gj) q")
    }
  }

  test("tiff roundtrip decodes pixel-exact") {
    for (id <- Seq(0L, 1L, 7L, 123L)) {
      val bytes = graft.mm.Codecs.encodeTiff(id)
      val (w, h, sum) = graft.mm.Codecs.decodePngStats(bytes)
      assert(w == graft.mm.Codecs.tiffWidth(id))
      assert(h == graft.mm.Codecs.tiffHeight(id))
      val exp = (for (x <- 0 until w; y <- 0 until h)
        yield graft.mm.Codecs.grayAt(x, y, id).toLong).sum
      assert(sum == exp, s"doc $id px_sum")
    }
  }

  test("silhouette clusters partition the corpus and s stays in [-1,1]") {
    val out = graft.ops.Mining.qSilhouette(spark, sf).collect()
    val nVecs = graft.sources.Tables.embeddings(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == nVecs)
    for (r <- out) {
      val s = r.getDouble(r.fieldIndex("avg_silhouette"))
      assert(s >= -1.0 && s <= 1.0, s"cluster ${r.getLong(0)}: $s")
    }
    // independent replay off the kmeans assignment: own-centroid cos
    // must be >= 2nd-best by construction => every mean s >= 0... not
    // guaranteed per cluster, but the GLOBAL mean must be >= 0
    val glob = out.map(r => r.getDouble(2) * r.getLong(1)).sum / nVecs
    assert(glob >= 0.0, s"global silhouette $glob")
  }

  test("js divergence matches the naive distribution replay") {
    val out = graft.ops.PipelineQueries.textJsDivergence(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val all = docs.flatMap(t =>
      t._2.trim.split("\\s+").filter(_.nonEmpty).map(w => (t._1, w)))
    val corp = all.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nc = all.length.toLong
    for (src <- docs.map(_._1).distinct.take(5)) {
      val sw = all.filter(_._1 == src).map(_._2)
      val ns = sw.length.toLong
      val cnt = sw.groupBy(identity).view.mapValues(_.length.toLong)
        .toMap
      var js = 0.0
      for ((w, cc) <- corp) {
        val cs = cnt.getOrElse(w, 0L)
        val p = cs.toDouble / ns
        val q = cc.toDouble / nc
        val m = (p + q) / 2
        if (cs > 0) js += p * math.log(p / m) / 2
        js += q * math.log(q / m) / 2
      }
      val got = out(src).getDouble(out(src).fieldIndex("js_divergence"))
      assert(math.abs(got - js) < 1e-4, s"$src: $got vs $js")
    }
  }

  test("poisson rate test matches the naive split replay") {
    val r = graft.ops.Stats.qPoissonRate(spark, sf).head()
    val ts = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(unix_timestamp(col("ts"))).collect().map(_.getLong(0))
    val (t0, t1) = (ts.min, ts.max)
    val mid = Math.floorDiv(t0 + t1, 2L)
    val n1 = ts.count(_ < mid).toLong
    val n2 = ts.count(_ >= mid).toLong
    val (d1, d2) = ((mid - t0).toDouble, (t1 - mid + 1).toDouble)
    val z = (n1 / d1 - n2 / d2) /
      math.sqrt(n1 / (d1 * d1) + n2 / (d2 * d2))
    assert(r.getLong(r.fieldIndex("n1")) == n1)
    assert(r.getLong(r.fieldIndex("n2")) == n2)
    assert(math.abs(r.getDouble(r.fieldIndex("z_stat")) - z) < 1e-3)
  }

  test("cochran q matches the naive block replay") {
    val r = graft.ops.Stats.qCochranQ(spark, sf).head()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_discount"), col("l_tax"),
        col("l_quantity"))
      .collect()
      .map(x => (x.getLong(0), x.getDouble(1) >= 0.05,
        x.getDouble(2) >= 0.04, x.getDouble(3) >= 25))
    val blocks = li.groupBy(_._1).values.map { g =>
      (if (g.exists(_._2)) 1L else 0L, if (g.exists(_._3)) 1L else 0L,
        if (g.exists(_._4)) 1L else 0L)
    }.toSeq
    val (g1, g2, g3) = (blocks.map(_._1).sum, blocks.map(_._2).sum,
      blocks.map(_._3).sum)
    val ls = blocks.map(b => b._1 + b._2 + b._3)
    val q = 2.0 * (3 * (g1 * g1 + g2 * g2 + g3 * g3) -
      math.pow(g1 + g2 + g3, 2)) / (3 * ls.sum - ls.map(l => l * l).sum)
    assert(r.getLong(r.fieldIndex("g1")) == g1)
    assert(math.abs(r.getDouble(r.fieldIndex("q_stat")) - q) < 1e-3,
      s"${r.getDouble(r.fieldIndex("q_stat"))} vs $q")
  }

  test("dau/mau matches the naive distinct-count replay") {
    val out = graft.ops.Behavior.qDauMau(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM"),
        to_date(col("ts")).cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    for (r <- out) {
      val m = r.getString(0)
      val evm = ev.filter(_._2 == m)
      val days = evm.groupBy(_._3).view
        .mapValues(_.map(_._1).distinct.size).toMap
      val mau = evm.map(_._1).distinct.length
      assert(r.getLong(r.fieldIndex("n_days")) == days.size.toLong)
      assert(r.getLong(r.fieldIndex("mau")) == mau.toLong)
      val avgDau = days.values.sum.toDouble / days.size
      assert(math.abs(r.getDouble(r.fieldIndex("avg_dau")) - avgDau)
        < 1e-3)
      assert(math.abs(r.getDouble(r.fieldIndex("stickiness")) -
        avgDau / mau) < 1e-5)
    }
  }

  test("rfm migration matrix partitions customers and is quintile-balanced") {
    val out = graft.ops.Behavior.qRfmMigration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val nCust = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    // every ordering customer lands in exactly one matrix cell
    assert(out.values.sum == nCust ||
      out.values.sum >= nCust, s"${out.values.sum} vs $nCust")
    // cells with seg 0 on one side = half-absent customers; both-side
    // segments stay in 1..5
    for (((b, a), _) <- out) {
      assert(b >= 0 && b <= 5 && a >= 0 && a <= 5)
      assert(b != 0 || a != 0)
    }
    // the before-half quintiles are balanced: row sums over b=1..5
    // differ by at most 1 (exact ntile contract)
    val rowSums = (1L to 5L).map(b =>
      out.collect { case ((`b`, _), n) => n }.sum)
    assert(rowSums.max - rowSums.min <= 1, rowSums.toString)
  }

  test("parquet footer stats equal the data census") {
    val got = graft.sources.Layouts.parquetFooterAudit(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exp = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)), min(col("o_orderkey")), max(col("o_orderkey")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == exp)
  }

  test("overdispersion matches the naive moment replay") {
    val out = graft.ops.PipelineQueries.textOverdispersion(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+").length))
    for ((src, g) <- docs.groupBy(_._1)) {
      val xs = g.map(_._2.toDouble)
      val mu = xs.sum / xs.length
      val v = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      val r = out(src)
      assert(r.getLong(r.fieldIndex("n_docs")) == xs.length.toLong)
      assert(math.abs(r.getDouble(r.fieldIndex("mean_tokens")) - mu)
        < 1e-3, s"$src mean")
      assert(math.abs(r.getDouble(r.fieldIndex("var_tokens")) - v)
        < 1e-2, s"$src var")
      if (v > mu) {
        assert(math.abs(r.getDouble(r.fieldIndex("nb_r")) -
          mu * mu / (v - mu)) < 1e-2, s"$src r")
      }
    }
  }

  test("stream dau/mau equals the batch census") {
    val stream = graft.streaming.Events.streamDauMau(spark, sf).collect()
    val batch = graft.ops.Behavior.qDauMau(spark, sf).collect()
    assert(stream.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("itemset3 matches the naive Apriori replay") {
    val got = graft.ops.Mining.qItemset3(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val it = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey") % 25)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = it.groupBy(_._1).values.map(_.map(_._2).sorted).toSeq
    val minPair = math.max(baskets.size / 500, 2)
    val pairs = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for (b <- baskets; i <- b.indices; j <- (i + 1) until b.length)
      pairs((b(i), b(j))) = pairs.getOrElse((b(i), b(j)), 0) + 1
    val fp = pairs.filter(_._2 >= minPair).keySet
    val tris = scala.collection.mutable.Map.empty[(Long, Long, Long), Int]
    for (b <- baskets; i <- b.indices; j <- (i + 1) until b.length;
         k <- (j + 1) until b.length
         if fp((b(i), b(j))) && fp((b(i), b(k))) && fp((b(j), b(k))))
      tris((b(i), b(j), b(k))) =
        tris.getOrElse((b(i), b(j), b(k)), 0) + 1
    val exp = tris.toSeq.filter(_._2 >= 2)
      .map { case ((a, b2, c), n) => (a, b2, c, n.toLong) }
      .sortBy(t => (-t._4, t._1, t._2, t._3)).take(50)
    assert(got.toSeq == exp, s"${got.take(3).toSeq} vs ${exp.take(3)}")
  }

  test("lorenz deciles match the naive sorted replay") {
    val out = graft.ops.Mining.qLorenzDeciles(spark, sf).collect()
    val spend = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = spend.sortBy(t => (t._2, t._1))
    val n = sorted.length
    val total = sorted.map(_._2).sum.toDouble
    // exact ntile: first n%10 deciles take ceil(n/10)
    val sizes = (0 until 10).map(i =>
      if (i < n % 10) n / 10 + 1 else n / 10)
    var idx = 0
    var cum = 0L
    for ((r, i) <- out.zipWithIndex) {
      val seg = sorted.slice(idx, idx + sizes(i))
      idx += sizes(i)
      cum += seg.map(_._2).sum
      assert(r.getLong(r.fieldIndex("n_customers")) == seg.length.toLong)
      assert(math.abs(r.getDouble(r.fieldIndex("cum_share")) -
        cum / total) < 1e-5, s"decile ${i + 1}")
    }
    assert(math.abs(out.last.getDouble(out.last.fieldIndex("cum_share"))
      - 1.0) < 1e-5)
  }

  test("cluster nmi matches the naive kmeans+entropy replay") {
    val r = graft.ops.Mining.qClusterNmi(spark, sf).head()
    val embs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label").cast("long"))
      .collect()
      .map(x => (x.getLong(0), x.getSeq[Double](1).toArray, x.getLong(2)))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i) }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5) / 1e6
    }
    def assign(cents: Seq[Array[Double]]): Map[Long, Int] =
      embs.map { case (id, v, _) =>
        id -> cents.zipWithIndex
          .map { case (c, i) => (-cos(v, c), i) }.min._2
      }.toMap
    val init = embs.take(8).map(_._2).toSeq
    val a1 = assign(init)
    val c1 = (0 until 8).map { c =>
      val vs = embs.filter(e => a1(e._1) == c).map(_._2)
      val out = new Array[Double](init.head.length)
      for (v <- vs; i <- v.indices) out(i) += v(i)
      out.map(_ / math.max(vs.length, 1))
    }
    val a2 = assign(c1)
    val cont = embs.map(e => (a2(e._1), e._3)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val nTot = embs.length.toLong
    def mnat(x: Double) = math.round(math.log(x) * 1e6)
    val nC = cont.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nL = cont.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val mi = cont.map { case ((c, l), n) =>
      n * mnat(n.toDouble * nTot / (nC(c).toDouble * nL(l)))
    }.sum.toDouble / nTot / 1e6
    val hC = -nC.values.map(n =>
      n * mnat(n.toDouble / nTot)).sum.toDouble / nTot / 1e6
    val hL = -nL.values.map(n =>
      n * mnat(n.toDouble / nTot)).sum.toDouble / nTot / 1e6
    assert(r.getLong(r.fieldIndex("n_vecs")) == nTot)
    assert(math.abs(r.getDouble(r.fieldIndex("mutual_info")) - mi)
      < 1e-4, s"mi ${r.getDouble(r.fieldIndex("mutual_info"))} vs $mi")
    assert(math.abs(r.getDouble(r.fieldIndex("nmi")) -
      mi / math.sqrt(hC * hL)) < 1e-4)
  }

  test("retrieval metrics match the naive NDCG/MRR replay") {
    val r = graft.ops.PipelineQueries.embedRetrievalMetrics(spark, sf)
      .head()
    val embs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label").cast("long"))
      .collect()
      .map(x => (x.getLong(0), x.getSeq[Double](1).toArray, x.getLong(2)))
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      var (dd, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { dd += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i) }
      BigDecimal(dd / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val lblCnt = embs.groupBy(_._3).view.mapValues(_.length).toMap
    val queries = embs.filter(_._1 < 20)
    var (sn, sr, sp) = (0L, 0L, 0L)
    for ((qid, qv, ql) <- queries) {
      val top = embs.filter(_._1 != qid)
        .map(e => (cos4(qv, e._2), e._1, e._3))
        .sortBy(t => (-t._1, t._2)).take(10)
      val nRel = lblCnt(ql) - 1
      def disc(i: Int) = math.round(1e6 / math.log(i + 1))
      val dcg = top.zipWithIndex.collect {
        case ((_, _, l), i) if l == ql => disc(i + 1)
      }.sum
      val idcg = (1 to 10).filter(_ <= nRel).map(disc).sum
      sn += math.round(dcg.toDouble / idcg * 1e6)
      val firstRel = top.zipWithIndex.find(_._1._3 == ql).map(_._2 + 1)
      sr += firstRel.map(i => math.round(1e6 / i.toDouble)).getOrElse(0L)
      sp += top.count(_._3 == ql)
    }
    val nq = queries.length
    assert(r.getLong(r.fieldIndex("n_queries")) == nq.toLong)
    assert(math.abs(r.getDouble(r.fieldIndex("mean_ndcg10")) -
      sn.toDouble / nq / 1e6) < 1e-5)
    assert(math.abs(r.getDouble(r.fieldIndex("mrr")) -
      sr.toDouble / nq / 1e6) < 1e-5)
    assert(math.abs(r.getDouble(r.fieldIndex("p_at_10")) -
      sp.toDouble / nq / 10) < 1e-5)
  }

  test("log-rank statistic matches the naive at-risk replay") {
    val r = graft.ops.Series.qLogRank(spark, sf).head()
    val pe = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val hz = pe.map(_._3).max
    val lives = pe.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val grp = h2(uid.toString)
      val s = evs.sortBy(e => (e._3, e._2))
      s.zipWithIndex.map { case (e, i) =>
        val nxt = if (i + 1 < s.length) Some(s(i + 1)._3) else None
        (grp, math.floorDiv(nxt.getOrElse(hz) - e._3, 3600L),
          nxt.isDefined)
      }
    }
    val times = lives.map(_._2).distinct.sorted
    val (n0T, n1T) = (lives.count(_._1 == 0L), lives.count(_._1 == 1L))
    var (rem0, rem1) = (n0T.toLong, n1T.toLong)
    var (o1, e1, v) = (0L, 0.0, 0.0)
    var o0 = 0L
    for (t <- times) {
      val at = lives.filter(_._2 == t)
      val d0 = at.count(x => x._1 == 0L && x._3).toLong
      val d1 = at.count(x => x._1 == 1L && x._3).toLong
      val dd = d0 + d1
      val nn = rem0 + rem1
      if (dd > 0 && nn > 1) {
        o0 += d0; o1 += d1
        e1 += dd.toDouble * rem1 / nn
        v += dd.toDouble * (rem1.toDouble / nn) * (rem0.toDouble / nn) *
          (nn - dd) / (nn - 1)
      }
      rem0 -= at.count(_._1 == 0L)
      rem1 -= at.count(_._1 == 1L)
    }
    assert(r.getLong(r.fieldIndex("o0")) == o0)
    assert(r.getLong(r.fieldIndex("o1")) == o1)
    assert(math.abs(r.getDouble(r.fieldIndex("e1")) - e1) < 1e-2)
    val chi2 = (o1 - e1) * (o1 - e1) / v
    assert(math.abs(r.getDouble(r.fieldIndex("chi2")) - chi2) < 1e-2,
      s"${r.getDouble(r.fieldIndex("chi2"))} vs $chi2")
  }

  test("pacf matches the naive Durbin-Levinson replay") {
    val r = graft.ops.Series.qPacf(spark, sf).head()
    val days = dailyE4(flagged = false)("*")
    val byDay = days.map(t => t._1.toLocalDate.toEpochDay ->
      t._2.toDouble).toMap
    val xs = days.map(_._2.toDouble)
    val n = xs.length
    val mu = xs.sum / n
    val den = xs.map(x => (x - mu) * (x - mu)).sum
    // CALENDAR lags: only pairs k days apart in real dates count
    def rho(k: Int) = byDay.toSeq.collect {
      case (d, a) if byDay.contains(d + k) =>
        (a - mu) * (byDay(d + k) - mu)
    }.sum / den
    val (r1, r2, r3) = (rho(1), rho(2), rho(3))
    val p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    val p21 = r1 - p22 * r1
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    assert(math.abs(r.getDouble(r.fieldIndex("rho1")) - r1) < 1e-5)
    assert(math.abs(r.getDouble(r.fieldIndex("rho3")) - r3) < 1e-5)
    assert(math.abs(r.getDouble(r.fieldIndex("pacf2")) - p22) < 1e-4)
    assert(math.abs(r.getDouble(r.fieldIndex("pacf3")) - p33) < 1e-4)
  }

  test("hill tail estimator matches the naive order-statistic replay") {
    val r = graft.ops.Stats.qHillTail(spark, sf).head()
    val cents = graft.sources.Tables.orders(spark, sf)
      .select(round(col("o_totalprice") * 100).cast("long"),
        col("o_orderkey"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(t => (-t._1, t._2)).map(_._1)
    val xk1 = cents(100).toDouble
    val h = cents.take(100).map(c => math.log(c / xk1)).sum / 100
    assert(r.getLong(r.fieldIndex("k")) == 100L)
    assert(math.abs(r.getDouble(r.fieldIndex("hill_h")) - h) < 1e-4)
    assert(math.abs(r.getDouble(r.fieldIndex("tail_alpha")) - 1 / h)
      < 1e-2)
  }

  test("friedman matches the naive midrank replay") {
    val r = graft.ops.Stats.qFriedman(spark, sf).head()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_linenumber") <= 3)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity")).cast("long"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))
    val blocks = li.groupBy(_._1).values.flatMap { g =>
      val qs = (1 to 3).map(i =>
        g.filter(_._2 == i).map(_._3).sorted.lastOption)
      if (qs.forall(_.isDefined)) Some(qs.map(_.get)) else None
    }.toSeq
    def midranks(v: Seq[Long]): Seq[Double] =
      v.map(x => v.count(_ < x) + (v.count(_ == x) + 1) / 2.0)
    val n = blocks.length
    val rs = blocks.map(midranks)
    val sums = (0 to 2).map(j => rs.map(_(j)).sum)
    val chi = 12.0 / (n * 3 * 4) * sums.map(x => x * x).sum - 3 * n * 4
    assert(r.getLong(r.fieldIndex("n_blocks")) == n.toLong)
    assert(math.abs(r.getDouble(r.fieldIndex("mean_rank_1")) -
      sums(0) / n) < 1e-3)
    assert(math.abs(r.getDouble(r.fieldIndex("chi2_f")) - chi) < 1e-3,
      s"${r.getDouble(r.fieldIndex("chi2_f"))} vs $chi")
  }

  test("cramers v matches the naive contingency replay") {
    val r = graft.ops.Stats.qCramersV(spark, sf).head()
    val pts = graft.sources.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val n = pts.length.toDouble
    val cells = pts.groupBy(identity).view.mapValues(_.length).toMap
    val rows = pts.groupBy(_._1).view.mapValues(_.length).toMap
    val cols = pts.groupBy(_._2).view.mapValues(_.length).toMap
    val chi = cells.map { case ((rk, ck), o) =>
      val e = rows(rk) * cols(ck) / n
      (o - e) * (o - e) / e
    }.sum
    val v = math.sqrt(chi / (n * math.min(rows.size - 1, cols.size - 1)))
    assert(math.abs(r.getDouble(r.fieldIndex("chi2")) - chi) < 1e-2)
    assert(math.abs(r.getDouble(r.fieldIndex("cramers_v")) - v) < 1e-4)
  }

  test("xyz classes match the naive CV replay") {
    val out = graft.ops.Mining.qXyzClass(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val monthly = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"),
        date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM"))
      .agg(sum(round(col("l_quantity")).cast("long")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val census = scala.collection.mutable.Map.empty[String, Long]
    for ((_, g) <- monthly.groupBy(_._1)) {
      val qs = g.map(_._3.toDouble)
      val m = qs.length
      val mu = qs.sum / m
      val cv2 = qs.map(q => (q - mu) * (q - mu)).sum / m / (mu * mu)
      val cls = if (cv2 <= 0.25) "X" else if (cv2 <= 1.0) "Y" else "Z"
      census(cls) = census.getOrElse(cls, 0L) + 1
    }
    for ((cls, n) <- census)
      assert(out(cls)._1 == n, s"$cls: ${out.get(cls)} vs $n")
  }

  test("shingle df histogram partitions the shingle vocabulary") {
    val out = graft.ops.PipelineQueries.textShingleDfHist(spark, sf)
      .collect()
    val tot = out.head.getLong(out.head.fieldIndex("n_shingles"))
    assert(out.map(_.getLong(2)).sum == tot)
    assert(math.abs(out.map(r =>
      r.getDouble(r.fieldIndex("share"))).sum - 1.0) < 1e-4)
    // independent df census off a naive shingle set
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val dfm = scala.collection.mutable.Map.empty[String, Long]
    for (t <- docs) {
      val ws = t.trim.split("\\s+")
      val sh = (0 until math.max(ws.length - 2, 0))
        .map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").distinct
      for (g <- sh) dfm(g) = dfm.getOrElse(g, 0L) + 1
    }
    assert(dfm.size.toLong == tot)
    assert(out.head.getLong(out.head.fieldIndex("max_df")) ==
      dfm.values.max)
  }

  test("turning points match the naive extrema replay") {
    val r = graft.ops.Series.qTurningPoints(spark, sf).head()
    val xs = dailyE4(flagged = false)("*").map(_._2)
    val turns = (1 until xs.length - 1).count(i =>
      (xs(i) > xs(i - 1) && xs(i) > xs(i + 1)) ||
        (xs(i) < xs(i - 1) && xs(i) < xs(i + 1)))
    val n = xs.length
    assert(r.getLong(r.fieldIndex("n")) == n.toLong)
    assert(r.getLong(r.fieldIndex("n_turns")) == turns.toLong)
    val z = (turns - 2.0 * (n - 2) / 3) / math.sqrt((16.0 * n - 29) / 90)
    assert(math.abs(r.getDouble(r.fieldIndex("z_stat")) - z) < 1e-3)
  }

  test("control chart matches the naive weekly replay") {
    val out = graft.ops.Series.qControlChart(spark, sf).collect()
    val days = dailyE4(flagged = false)("*")
    val weeks = days.groupBy { case (d, _) =>
      val ld = d.toLocalDate
      ld.minusDays(ld.getDayOfWeek.getValue - 1L)
    }.filter(_._2.length == 7)
    assert(out.length == weeks.size)
    val xbb = weeks.values.map(_.map(_._2).sum).sum.toDouble /
      weeks.size / 7
    val rb = weeks.values.map(v => v.map(_._2).max - v.map(_._2).min)
      .sum.toDouble / weeks.size
    val oocExp = weeks.values.count { v =>
      val xb = v.map(_._2).sum.toDouble / 7
      xb > xbb + 0.419 * rb || xb < xbb - 0.419 * rb
    }
    assert(out.count(_.getBoolean(out.head.fieldIndex("ooc_mean"))) ==
      oocExp)
    val r0 = out.head
    assert(math.abs(r0.getDouble(r0.fieldIndex("center")) -
      xbb / 10000) < 0.02)
  }

  test("eta/omega squared match the naive ANOVA replay") {
    val r = graft.ops.Stats.qEtaSquared(spark, sf).head()
    val pts = graft.sources.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"),
        round(col("c_acctbal")).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1).toDouble))
    val n = pts.length
    val k = pts.map(_._1).distinct.length
    val mu = pts.map(_._2).sum / n
    val sst = pts.map(p => (p._2 - mu) * (p._2 - mu)).sum
    val ssb = pts.groupBy(_._1).values.map { g =>
      val gm = g.map(_._2).sum / g.length
      g.length * (gm - mu) * (gm - mu)
    }.sum
    val eta = ssb / sst
    val msw = (sst - ssb) / (n - k)
    val omega = (ssb - (k - 1) * msw) / (sst + msw)
    assert(math.abs(r.getDouble(r.fieldIndex("eta_squared")) - eta)
      < 1e-4)
    assert(math.abs(r.getDouble(r.fieldIndex("omega_squared")) - omega)
      < 1e-4)
  }

  test("heaps law matches the naive growth-curve replay") {
    val r = graft.ops.PipelineQueries.textHeapsLaw(spark, sf).head()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val ranked = docs.sortBy { case (id, _) =>
      (graft.functions.Kernels.md5Lower64(
        UTF8String.fromString(id.toString)), id)
    }
    val nd = ranked.length
    val seen = scala.collection.mutable.Set.empty[String]
    var (tokC, typC) = (0L, 0L)
    val pts = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var bucket = 0L
    for (((_, text), i) <- ranked.zipWithIndex) {
      val b = (i.toLong * 10) / nd
      if (b != bucket) { pts += ((tokC, typC)); bucket = b }
      for (w <- text.trim.split("\\s+") if w.nonEmpty) {
        tokC += 1
        if (seen.add(w)) typC += 1
      }
    }
    pts += ((tokC, typC))
    val xy = pts.map { case (a, b) =>
      (math.round(math.log(a.toDouble) * 1e6).toDouble,
        math.round(math.log(b.toDouble) * 1e6).toDouble)
    }
    val m = xy.length
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert(r.getLong(r.fieldIndex("n_points")) == 10L)
    assert(math.abs(r.getDouble(r.fieldIndex("heaps_beta")) - beta)
      < 1e-4,
      s"${r.getDouble(r.fieldIndex("heaps_beta"))} vs $beta")
  }

  test("absorbing markov matches the naive chain replay") {
    val r = graft.ops.Behavior.qAbsorbingMarkov(spark, sf).head()
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        x.getLong(3)))
    val absorbing = Set("purchase", "error")
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, g) <- ev.groupBy(_._1)) {
      val seq0 = g.sortBy(e => (e._4, e._2)).map(_._3)
      val cut = seq0.indexWhere(absorbing)
      val seqK = (if (cut >= 0) seq0.take(cut + 1) else seq0).toSeq
      if (seqK.length > 1)
        for (w2 <- seqK.sliding(2)) {
          val (a, b) = (w2.head, w2(1))
          trans((a, b)) = trans.getOrElse((a, b), 0L) + 1
        }
    }
    val ts = Seq("view", "click", "signup")
    val all = ts ++ Seq("purchase", "error")
    def rowSum(i: String) = all.map(j =>
      trans.getOrElse((i, j), 0L)).sum.toDouble
    // N = (I - Q)^-1 via Gaussian elimination on the 3x3
    val a = Array.tabulate(3, 3)((i, j) =>
      (if (i == j) 1.0 else 0.0) -
        trans.getOrElse((ts(i), ts(j)), 0L) / rowSum(ts(i)))
    val inv = {
      val m = Array.tabulate(3, 6)((i, j) =>
        if (j < 3) a(i)(j) else if (j - 3 == i) 1.0 else 0.0)
      for (c <- 0 until 3) {
        val p = (c until 3).maxBy(r0 => math.abs(m(r0)(c)))
        val t = m(c); m(c) = m(p); m(p) = t
        val d0 = m(c)(c)
        for (j <- 0 until 6) m(c)(j) /= d0
        for (r0 <- 0 until 3 if r0 != c) {
          val f = m(r0)(c)
          for (j <- 0 until 6) m(r0)(j) -= f * m(c)(j)
        }
      }
      Array.tabulate(3, 3)((i, j) => m(i)(j + 3))
    }
    for (i <- 0 until 3) {
      val steps = inv(i).sum
      val pBuy = (0 until 3).map(j => inv(i)(j) *
        trans.getOrElse((ts(j), "purchase"), 0L) / rowSum(ts(j))).sum
      val pErr = (0 until 3).map(j => inv(i)(j) *
        trans.getOrElse((ts(j), "error"), 0L) / rowSum(ts(j))).sum
      assert(math.abs(r.getDouble(r.fieldIndex(s"steps_${ts(i)}")) -
        steps) < 1e-3, s"${ts(i)} steps")
      assert(math.abs(r.getDouble(
        r.fieldIndex(s"p_purchase_${ts(i)}")) - pBuy) < 1e-4)
      assert(math.abs(r.getDouble(r.fieldIndex(s"p_error_${ts(i)}")) -
        pErr) < 1e-4)
      // absorbing-chain identity
      assert(math.abs(pBuy + pErr - 1.0) < 1e-9)
    }
  }

  test("sax word matches the naive PAA-quartile replay") {
    val out = graft.ops.Series.qSaxPaa(spark, sf).collect()
    val series = dailyE4(flagged = true)
    for ((flag, days) <- series) {
      val n = days.length
      val segIds = days.indices.map(i => (i.toLong * 16) / n)
      val means = segIds.zip(days.map(_._2)).groupBy(_._1).view
        .mapValues(v => v.map(_._2).sum / v.length).toMap
      val ranked = means.toSeq.sortBy(t => (t._2, t._1)).zipWithIndex
        .map { case ((seg, _), i) => seg -> ('a' + (i * 4) / 16).toChar }
        .toMap
      val word = means.keys.toSeq.sorted.map(ranked).mkString
      val gotWord = out.filter(_.getString(0) == flag).head
      assert(gotWord.getString(gotWord.fieldIndex("sax_word")) == word,
        s"$flag word")
    }
  }
}
