package graft

import org.apache.spark.sql.functions._

/** Round-13 continuation regressions: the classical-statistics family
  * (graft.ops.Stats) certified against naive in-JVM replays on sf
  * data — independent of the DuckDB oracle, so a gate regression and
  * an algorithm regression can't mask each other.
  */
class Round13bSpec extends SparkSuite {

  private def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("jarque-bera matches the naive moment replay") {
    val got = graft.ops.Stats.qJarqueBera(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    val qs = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity")).cast("long"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.keySet == qs.keySet)
    for ((k, vs) <- qs) {
      val n = vs.length.toDouble
      val mu = vs.sum / n
      val m2 = vs.map(q => (q - mu) * (q - mu)).sum / n
      val m3 = vs.map(q => math.pow(q - mu, 3)).sum / n
      val m4 = vs.map(q => math.pow(q - mu, 4)).sum / n
      val sk = m3 / math.sqrt(m2 * m2 * m2)
      val ku = m4 / (m2 * m2)
      val jb = n * (sk * sk + (ku - 3) * (ku - 3) / 4) / 6
      val (gn, gmu, gsk, gku, gjb) = got(k)
      assert(gn == vs.length.toLong, s"$k n")
      // naive replay accumulates differently — compare at 3 dp
      assert(math.abs(gmu - mu) < 5e-4, s"$k mean")
      assert(math.abs(gsk - sk) < 5e-4, s"$k skew ($gsk vs $sk)")
      assert(math.abs(gku - ku) < 5e-4, s"$k kurt ($gku vs $ku)")
      assert(math.abs(gjb - jb) < jb * 1e-3 + 1e-3, s"$k jb ($gjb vs $jb)")
    }
  }

  test("kruskal-wallis matches the naive tie-averaged rank replay") {
    val rows = graft.ops.Stats.qKruskalWallis(spark, sf).collect()
    val pts = graft.sources.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"),
        round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // naive tie-averaged ranks over the full sorted sample
    val sorted = pts.map(_._2).sorted
    val n = sorted.length
    val rank = scala.collection.mutable.Map.empty[Long, Double]
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && sorted(j) == sorted(i)) j += 1
      rank(sorted(i)) = (i + 1 + j) / 2.0 // avg of ranks i+1..j
      i = j
    }
    val byG = pts.groupBy(_._1).view
      .mapValues(_.map(p => rank(p._2))).toMap
    val h = 12.0 / (n.toDouble * (n + 1)) *
      byG.values.map(rs => { val s = rs.sum; s * s / rs.length }).sum -
      3 * (n + 1)
    val ties = pts.map(_._2).groupBy(identity).values
      .map(_.length.toDouble).map(t => t * t * t - t).sum
    val hAdj = h / (1 - ties / (n.toDouble * n * n - n))
    for (r <- rows) {
      val g = r.getLong(0)
      val nj = r.getLong(1)
      assert(nj == byG(g).length.toLong, s"nation $g n_j")
      assert(math.abs(r.getDouble(3) -
        byG(g).sum / byG(g).length) < 5e-4, s"nation $g mean rank")
      assert(math.abs(r.getDouble(6) - h) < 1e-3, s"h ${r.getDouble(6)} vs $h")
      assert(math.abs(r.getDouble(7) - hAdj) < 1e-3, "h_adj")
    }
  }

  test("runs test matches the naive sequential replay") {
    val r = graft.ops.Stats.qRunsTest(spark, sf).collect().head
    val daily = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .orderBy(col("day"))
      .collect().map(_.getLong(1)).toSeq
    val med = daily.sorted.apply((daily.length + 1) / 2 - 1)
    val s = daily.filter(_ != med).map(v => if (v > med) 1 else 0)
    val runs = 1 + s.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    val (n1, n2) = (s.count(_ == 1).toLong, s.count(_ == 0).toLong)
    val nn = (n1 + n2).toDouble
    val mu = 2.0 * n1 * n2 / nn + 1
    val z = (runs - mu) / math.sqrt((mu - 1) * (mu - 2) / (nn - 1))
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (n1, n2, runs.toLong))
    assert(r.getDouble(3) == r4(mu))
    assert(math.abs(r.getDouble(4) - z) < 1e-3)
  }

  test("herfindahl matches the naive share replay") {
    val got = graft.ops.Stats.qHerfindahl(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    val revs = graft.sources.Tables.lineitem(spark, sf).as("l")
      .join(graft.sources.Tables.supplier(spark, sf).as("s"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long"), col("s_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .groupBy(_._1._1).view
      .mapValues(_.map(_._2.toDouble)).toMap
    assert(got.keySet == revs.keySet)
    for ((nk, rs) <- revs) {
      val tot = rs.sum
      val hhi = rs.map(r => (r / tot) * (r / tot)).sum
      val (gn, ghhi, gtop) = got(nk)
      assert(gn == rs.length.toLong, s"nation $nk count")
      assert(math.abs(ghhi - hhi) < 5e-6, s"nation $nk hhi")
      assert(math.abs(gtop - rs.max / tot) < 5e-6, s"nation $nk top share")
    }
  }

  test("price index: base month is exactly 1.0 and Fisher between L and P") {
    val rows = graft.ops.Stats.qPriceIndex(spark, sf).collect()
    val first = rows.minBy(_.getString(0))
    assert(first.getDouble(2) == 1.0 && first.getDouble(3) == 1.0 &&
      first.getDouble(4) == 1.0, "base month must index to 1.0")
    for (r <- rows) {
      val (l, p, f) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(f >= math.min(l, p) - 1e-6 && f <= math.max(l, p) + 1e-6,
        s"${r.getString(0)}: fisher $f outside [$l, $p]")
      // sf0.001 months match only a handful of base-month parts, so
      // the index is noisy — just require positive and finite
      assert(l > 0 && l < 100 && p > 0 && p < 100, s"index sane: $l / $p")
    }
  }

  private def dailyE4(): Seq[(java.sql.Date, Long)] =
    graft.sources.Tables.lineitem(spark, sf)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .orderBy(col("day"))
      .collect().map(r => (r.getDate(0), r.getLong(1))).toSeq

  test("bollinger bands match the naive sliding replay") {
    val got = graft.ops.Behavior.qBollinger(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        (r.getDouble(2), r.getDouble(3), r.getInt(6))).toMap
    val daily = dailyE4()
    val want = daily.indices.drop(19).map { i =>
      val w = daily.slice(i - 19, i + 1).map(_._2.toDouble / 10000)
      val ma = w.sum / 20
      val sd = math.sqrt(w.map(x => (x - ma) * (x - ma)).sum / 20)
      val x = daily(i)._2.toDouble / 10000
      val br = if (x > ma + 2 * sd) 1 else if (x < ma - 2 * sd) -1 else 0
      daily(i)._1.toString -> (ma, sd, br)
    }.toMap
    assert(got.keySet == want.keySet)
    for ((d, (ma, sd, br)) <- want) {
      val (gma, gsd, gbr) = got(d)
      assert(math.abs(gma - ma) < 5e-4, s"$d ma")
      assert(math.abs(gsd - sd) < 5e-4, s"$d sd")
      // breakout can flip only within float noise of the band itself
      if (gbr != br) {
        // band-edge tie: a flip is only legitimate within float noise
        assert(math.abs(math.abs(daily.find(_._1.toString == d).get._2
          .toDouble / 10000 - ma) - 2 * sd) < 1e-6, s"$d breakout $gbr vs $br")
      }
    }
  }

  test("rsi matches the naive sliding replay") {
    val got = graft.ops.Behavior.qRsi(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    val daily = dailyE4()
    val diffs = daily.sliding(2).collect { case Seq(a, b) =>
      (b._1, b._2 - a._2) }.toSeq
    val want = diffs.indices.drop(13).map { i =>
      val w = diffs.slice(i - 13, i + 1).map(_._2)
      val g = w.filter(_ > 0).sum
      val l = -w.filter(_ < 0).sum
      diffs(i)._1.toString ->
        (g, l, if (g + l > 0) r4(100.0 * g / (g + l)) else Double.NaN)
    }.toMap
    assert(got.keySet == want.keySet)
    for ((d, (g, l, rsi)) <- want) {
      val (gg, gl, grsi) = got(d)
      assert((gg, gl) == (g, l), s"$d sums")
      assert(grsi == rsi || (grsi.isNaN && rsi.isNaN), s"$d rsi")
    }
  }

  test("drawdown matches the naive running-peak replay") {
    val got = graft.ops.Behavior.qDrawdown(spark, sf).collect()
      .map(r => r.getDate(0).toString -> (r.getDouble(3), r.getInt(5))).toMap
    val daily = dailyE4()
    var peak = Long.MinValue
    for ((d, e4) <- daily) {
      peak = math.max(peak, e4)
      val (gdd, gpk) = got(d.toString)
      assert(gdd == math.floor((peak - e4).toDouble / 10000 * 100 + 0.5) / 100,
        s"$d drawdown")
      assert(gpk == (if (e4 == peak) 1 else 0), s"$d is_peak")
    }
  }

  test("croston classification boundaries are integer-exact") {
    val rows = graft.ops.Behavior.qCroston(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, q, q2span) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val adi = r.getDouble(4)
      val cls = r.getString(7)
      val intermittent = q2span * 100 > 132 * (n - 1) // span*100 vs ADI cut
      assert(cls.nonEmpty)
      if (intermittent) assert(cls == "intermittent" || cls == "lumpy",
        s"part ${r.getLong(0)}: adi=$adi span=$q2span n=$n got $cls")
      else assert(cls == "smooth" || cls == "erratic",
        s"part ${r.getLong(0)}: adi=$adi span=$q2span n=$n got $cls")
    }
  }

  test("croston moments match a naive replay on a sample of parts") {
    val got = graft.ops.Behavior.qCroston(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(6))).toMap
    val dd = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"), to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("q"))
      .collect().map(r => (r.getLong(0), r.getDate(1), r.getLong(2)))
      .groupBy(_._1)
    for ((pk, rows) <- dd if rows.size >= 2) {
      val days = rows.map(_._2.toLocalDate.toEpochDay)
      val n = rows.size.toLong
      val qt = rows.map(_._3).sum
      val span = days.max - days.min
      val (gn, gq, gs, gf) = got(pk)
      assert((gn, gq, gs) == (n, qt, span), s"part $pk moments")
      assert(gf == r4(qt.toDouble * (n - 1) / (n.toDouble * span)),
        s"part $pk forecast")
    }
    assert(got.keySet == dd.filter(_._2.size >= 2).keySet)
  }

  test("katz centrality matches a naive walk-count replay") {
    val got = graft.ops.Mining.qKatzCentrality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val pairs = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey") * 2, col("l_suppkey") * 2 + 1).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val w1 = adj.view.mapValues(_.length.toLong).toMap
    val w2 = adj.view.mapValues(_.map(w1).sum).toMap
    val w3 = adj.view.mapValues(_.map(w2).sum).toMap
    val want = adj.keys.filter(_ % 2 == 1).toSeq
      .map(n => ((n - 1) / 2, w1(n), w2(n), w3(n),
        16 * w1(n) + 4 * w2(n) + w3(n)))
      .sortBy(t => (-t._5, t._1)).take(20)
    assert(got.toSeq == want)
  }

  test("eigenvector centrality matches a naive walk-count replay") {
    val got = graft.ops.Mining.qEigenvectorCentrality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val lp = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val pairs = lp.values.toSeq.flatMap { ps =>
      val v = ps.toSeq
      for (a <- v; b <- v if a < b) yield (a, b)
    }.toSet
    val adj = (pairs.toSeq ++ pairs.toSeq.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val w1 = adj.view.mapValues(_.length.toLong).toMap
    val w2 = adj.view.mapValues(_.map(w1).sum).toMap
    val w3 = adj.view.mapValues(_.map(w2).sum).toMap
    val mx = w3.values.max
    val want = adj.keys.toSeq
      .map(n => (n, w1(n), w3(n),
        math.floor(w3(n).toDouble / mx * 1e6 + 0.5) / 1e6))
      .sortBy(t => (-t._3, t._1)).take(20)
    assert(got.toSeq == want)
  }

  test("hamming top-k matches a naive sign-binarization replay") {
    val got = graft.ops.PipelineQueries.embedHammingTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def code(v: Seq[Float]): (Long, Long) = {
      var c1, c2 = 0L
      for (i <- v.indices if v(i) > 0)
        if (i < 32) c1 |= 1L << i else c2 |= 1L << (i - 32)
      (c1, c2)
    }
    val codes = vecs.view.mapValues(code).toMap
    for (qid <- vecs.keys.filter(_ < 10)) {
      val (q1, q2) = codes(qid)
      val ranked = codes.toSeq.filter(_._1 != qid)
        .map { case (c, (c1, c2)) =>
          (c, (java.lang.Long.bitCount(c1 ^ q1) +
            java.lang.Long.bitCount(c2 ^ q2)).toLong) }
        .sortBy { case (c, h) => (h, c) }.take(10)
      for ((rnk0, (cid, h)) <- ranked.zipWithIndex.map(_.swap))
        assert(got((qid, rnk0 + 1L)) == (cid, h), s"q $qid rank ${rnk0 + 1}")
    }
  }

  test("unigram KL is non-negative and matches a naive replay") {
    val got = graft.ops.PipelineQueries.textUnigramKl(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4))).toMap
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.split("\\s+")
        .filter(_.nonEmpty).map(w => (r.getString(0), w)))
    val nC = toks.length.toLong
    val cW = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    for ((src, ts) <- toks.groupBy(_._1)) {
      val nS = ts.length.toLong
      val kl = ts.groupBy(_._2).map { case (w, ws) =>
        val cSw = ws.length.toLong
        cSw * math.round(math.log(cSw.toDouble * nC / (nS.toDouble * cW(w)))
          * 1e6)
      }.sum
      val (gn, gkl) = got(src)
      assert(gn == nS, s"$src token count")
      assert(gkl == math.floor(kl.toDouble / nS + 0.5) / 1e6, s"$src kl")
      // KL ≥ 0 up to micro-nat truncation noise
      assert(gkl > -1e-4, s"$src kl negative: $gkl")
    }
  }

  test("burstiness matches a naive per-doc census replay") {
    val got = graft.ops.PipelineQueries.textBurstiness(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4)))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+")
        .filter(_.nonEmpty))
    val nDocs = docs.length
    val counts = docs.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (w, id, g.length.toLong) } }
    val byW = counts.groupBy(_._1)
    for ((tok, (tot, df, vmr)) <- got) {
      val xs = byW(tok).map(_._3)
      assert(xs.sum == tot, s"$tok total")
      assert(xs.length.toLong == df, s"$tok df")
      val mean = tot.toDouble / nDocs
      val v = xs.map(x => x.toDouble * x).sum / nDocs - mean * mean
      assert(math.abs(vmr - v / mean) < 5e-4, s"$tok vmr")
    }
    // top-20 really is the top-20 by total count
    val totals = byW.view.mapValues(_.map(_._3).sum).toSeq
      .sortBy { case (w, t) => (-t, w) }.take(20).map(_._1)
    assert(got.map(_._1).toSeq == totals)
  }

  test("temperature mixture quotas are sqrt-proportional and under budget") {
    val rows = graft.ops.PipelineQueries.dataTemperatureMix(spark, sf)
      .collect()
    var quotaSum = 0L
    val weights = rows.map { r =>
      val (n, w, quota, sel) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(w == math.floor(math.sqrt(n.toDouble) * 1e6).toLong,
        s"${r.getString(0)} weight")
      assert(sel == quota, s"${r.getString(0)} fill")
      quotaSum += quota
      w
    }
    val tw = weights.sum
    assert(quotaSum <= 200, s"budget exceeded: $quotaSum")
    // floor-division quotas undershoot by at most one doc per source
    assert(quotaSum > 200 - rows.length, s"quota undershoot: $quotaSum")
    for (r <- rows)
      assert(r.getLong(3) == 200L * r.getLong(2) / tw,
        s"${r.getString(0)} quota formula")
  }

  test("bmp roundtrip preserves every pixel of the generator image") {
    for (id <- Seq(0L, 1L, 7L, 123L, 499L)) {
      val (w, h, sum) = graft.mm.Codecs.decodePngStats(
        graft.mm.Codecs.encodeBmp(id))
      assert(w == graft.mm.Codecs.bmpWidth(id) &&
        h == graft.mm.Codecs.bmpHeight(id), s"doc $id dims")
      val want = (for (x <- 0 until w; y <- 0 until h)
        yield graft.mm.Codecs.grayAt(x, y, id).toLong).sum
      assert(sum == want, s"doc $id pixel sum")
    }
  }

  test("image histogram equals the generator bucket census") {
    for (id <- Seq(0L, 5L, 250L)) {
      val hist = graft.mm.Codecs.decodeImageHist(
        graft.mm.Codecs.encodePng(id))
      val w = graft.mm.Codecs.pngWidth(id)
      val h = graft.mm.Codecs.pngHeight(id)
      val want = new Array[Long](8)
      for (x <- 0 until w; y <- 0 until h)
        want(graft.mm.Codecs.grayAt(x, y, id) >> 5) += 1
      assert(hist.toSeq == want.toSeq, s"doc $id hist")
      assert(hist.sum == w.toLong * h, s"doc $id total")
    }
  }

  test("wav pitch probe equals a naive generator autocorrelation") {
    for (id <- Seq(0L, 3L, 77L)) {
      val (n, lag, r) = graft.mm.Codecs.decodeWavPitch(
        graft.mm.Codecs.encodeWav(id), 20, 40)
      val nn = graft.mm.Codecs.wavSamples(id)
      assert(n == nn.toLong, s"doc $id n")
      val rs = (20 to 40).map { t =>
        t -> (0 until nn - t).map(i =>
          graft.mm.Codecs.sampleAt(i, id).toLong *
            graft.mm.Codecs.sampleAt(i + t, id)).sum
      }
      val best = rs.maxBy { case (t, v) => (v, -t) }
      assert((lag, r) == (best._1.toLong, best._2), s"doc $id pitch")
    }
  }

  test("theil index decomposition matches a naive replay") {
    val rows = graft.ops.Stats.qTheilIndex(spark, sf).collect()
    val xs = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 0)
      .select(col("c_nationkey").cast("long"),
        round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = xs.length.toLong
    val tot = xs.map(_._2).sum
    def mn(v: Double): Long = math.round(math.log(v) * 1e6)
    val tNum = xs.map { case (_, x) =>
      x * mn(x.toDouble * n / tot.toDouble) }.sum
    val byG = xs.groupBy(_._1)
    val wNum = byG.values.flatMap { g =>
      val tg = g.map(_._2).sum
      g.map { case (_, x) => x * mn(x.toDouble * g.length / tg.toDouble) }
    }.sum
    val bNum = byG.map { case (_, g) =>
      val tg = g.map(_._2).sum
      tg * mn(tg.toDouble * n / (tot.toDouble * g.length))
    }.sum
    val r0 = rows.head
    assert(r0.getLong(4) == n && r0.getLong(5) == tot)
    assert(r0.getDouble(6) == math.floor(tNum.toDouble / tot + 0.5) / 1e6,
      "theil_total")
    assert(r0.getDouble(7) == math.floor(bNum.toDouble / tot + 0.5) / 1e6,
      "theil_between")
    assert(r0.getDouble(8) == math.floor(wNum.toDouble / tot + 0.5) / 1e6,
      "theil_within")
    // decomposition identity holds to micro-nat rounding noise
    assert(math.abs(r0.getDouble(6) - r0.getDouble(7) - r0.getDouble(8))
      < 1e-4, "T = T_between + T_within")
    assert(r0.getDouble(6) >= 0 && r0.getDouble(7) >= -1e-6, "T >= 0")
  }

  test("brown-forsythe matches a naive median-ANOVA replay") {
    val rows = graft.ops.Stats.qBrownForsythe(spark, sf).collect()
    val xs = graft.sources.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byG = xs.groupBy(_._1)
    val meds = byG.view.mapValues { g =>
      g.sortBy(t => (t._3, t._2)).apply((g.size + 1) / 2 - 1)._3 }.toMap
    val zs = xs.map { case (g, _, v) => (g, math.abs(v - meds(g))) }
    val k = byG.size.toLong
    val nn = xs.length.toLong
    val sb = zs.groupBy(_._1).values.map { g =>
      val s = g.map(_._2).sum; s * s / g.length }.sum
    val s = zs.map(_._2).sum
    val ssb = sb.toDouble - (s * s / nn).toDouble
    val ssw = zs.map(z => z._2.toDouble * z._2).sum - sb.toDouble
    val fWant = (ssb / (k - 1)) / (ssw / (nn - k))
    for (r <- rows) {
      assert(r.getLong(2) == meds(r.getLong(0)), s"nation ${r.getLong(0)} med")
      assert(math.abs(r.getDouble(7) - fWant) < 1e-3,
        s"f ${r.getDouble(7)} vs $fWant")
    }
  }

  test("ols diagnostics match a naive regression replay") {
    val got = graft.ops.Stats.qOlsDiagnostics(spark, sf).collect()
    val daily = dailyE4().map { case (d, e4) =>
      (d.toLocalDate.toEpochDay - java.time.LocalDate
        .parse("1995-01-01").toEpochDay, e4) }
    val n = daily.length.toDouble
    val sx = daily.map(_._1).sum.toDouble
    val sy = daily.map(_._2).sum.toDouble
    val sxx = daily.map(t => t._1.toDouble * t._1).sum
    val sxy = daily.map(t => t._1.toDouble * t._2).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val alpha = (sy - beta * sx) / n
    val s2 = daily.map { case (x, y) =>
      val e = y - (alpha + beta * x); e * e }.sum / (n - 2)
    val xbar = sx / n
    val sxxc = sxx - sx * xbar
    val ds = daily.map { case (x, y) =>
      val e = y - alpha - beta * x
      val h = 1.0 / n + (x - xbar) * (x - xbar) / sxxc
      (x, e * e * h / (2 * s2 * (1 - h) * (1 - h)))
    }.sortBy { case (x, cd) => (-cd, x) }.take(10)
    assert(got.length == 10)
    for ((r, (x, cd)) <- got.zip(ds))
      assert(math.abs(r.getDouble(5) - cd) < cd * 1e-6 + 1e-5,
        s"day ${r.getDate(0)}: ${r.getDouble(5)} vs $cd")
  }

  test("zonemap skip flags are sound and cover the table") {
    val rows = graft.sources.Layouts.zonemapPrune(spark, sf).collect()
    val total = graft.sources.Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "all rows in some zone")
    for (r <- rows) {
      val (skip, nMatch) = (r.getInt(4), r.getLong(5))
      if (skip == 1) assert(nMatch == 0,
        s"zone ${r.getLong(0)} skippable but has $nMatch matches")
      assert(!r.getDate(2).after(r.getDate(3)), "span ordered")
    }
    // the 3-month predicate must make MOST zones skippable — the point
    // of clustering on time
    assert(rows.count(_.getInt(4) == 1) >= rows.length - 2,
      "clustered layout should skip all but the predicate's zones")
  }

  test("pvm bridge reconciles exactly and matches a naive replay") {
    val rows = graft.ops.Stats.qPvmBridge(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      // the algebraic certificate: price + volume + cross == matched Δ
      assert(r.getLong(5) == r.getLong(6),
        s"month ${r.getLong(0)}: bridge ${r.getLong(5)} != Δ ${r.getLong(6)}")
    }
    // naive replay for one interior month
    val pm = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(expr("CAST((year(l_shipdate) - 1995) * 12" +
          " + month(l_shipdate) - 1 AS BIGINT)").as("mi"), col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long")).as("rev"),
        sum(round(col("l_quantity")).cast("long")).as("qty"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2) * 100) / r.getLong(3), r.getLong(3))).toMap
    val mi = rows(rows.length / 2).getLong(0)
    val cur = pm.collect { case ((m, p), v) if m == mi => p -> v }.toMap
    val prv = pm.collect { case ((m, p), v) if m == mi - 1 => p -> v }.toMap
    val matched = cur.keySet & prv.keySet
    val price = matched.toSeq
      .map(p => (cur(p)._1 - prv(p)._1) * prv(p)._2).sum
    val vol = matched.toSeq
      .map(p => prv(p)._1 * (cur(p)._2 - prv(p)._2)).sum
    val row = rows.find(_.getLong(0) == mi).get
    assert(row.getLong(1) == matched.size.toLong, "n_matched")
    assert(row.getLong(2) == price, "price effect")
    assert(row.getLong(3) == vol, "volume effect")
  }

  test("string agg emits top-5 names in exact rank order") {
    val got = graft.ops.Analytics.qStringAgg(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val want = graft.sources.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_custkey"),
        col("c_name"), round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
      .groupBy(_._1).view.mapValues { g =>
        val top = g.sortBy(t => (-t._4, t._2)).take(5)
        (top.length.toLong, top.map(_._3).mkString(","))
      }.toMap
    assert(got == want)
  }

  test("label divergence is non-negative and matches a naive replay") {
    val got = graft.ops.PipelineQueries.embedLabelDivergence(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("label").cast("long"), col("embedding"))
      .collect().map { r =>
        val e = r.getSeq[Float](1)
        val cell = (0 until 4).map(i => if (e(i) > 0) 1L << i else 0L).sum
        (r.getLong(0), cell)
      }
    val n = vecs.length.toLong
    val cC = vecs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    for ((lbl, g) <- vecs.groupBy(_._1)) {
      val nL = g.length.toLong
      val cLc = g.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val w = (0 until 16).map { c =>
        val clc = cLc.getOrElse(c.toLong, 0L)
        val cc = cC.getOrElse(c.toLong, 0L)
        (clc + 1) * math.round(math.log((clc + 1).toDouble * (n + 16) /
          ((nL + 16).toDouble * (cc + 1))) * 1e6)
      }.sum
      val (gn, gw, gkl) = got(lbl)
      assert(gn == nL, s"label $lbl n")
      assert(gw == w, s"label $lbl weighted micro")
      assert(gkl == math.floor(w.toDouble / (nL + 16) + 0.5) / 1e6,
        s"label $lbl kl")
      assert(gkl > -1e-4, s"label $lbl kl negative")
    }
  }

  test("ljung-box matches a naive autocorrelation replay") {
    val got = graft.ops.Stats.qLjungBox(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val xs = dailyE4().map(_._2)
    val n = xs.length
    val s = xs.sum
    val y = xs.map(x => BigInt(n) * x - s)
    val den = y.map(v => v * v).sum
    var cum = 0L
    for (k <- 1 to 7) {
      val num = (0 until n - k).map(i => y(i + k) * y(i)).sum
      val r = (BigDecimal(num).toDouble) / BigDecimal(den).toDouble
      cum += math.round(r * r / (n - k) * 1e12)
      val (acf, q) = got(k.toLong)
      assert(acf == math.floor(r * 1e6 + 0.5) / 1e6, s"lag $k acf")
      assert(q == math.floor(n.toDouble * (n + 2) * (cum.toDouble / 1e12)
        * 1e4 + 0.5) / 1e4, s"lag $k q")
    }
  }

  test("iqr outliers match a naive fence replay") {
    val got = graft.ops.Stats.qIqrOutliers(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6))).toMap
    val xs = graft.sources.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((g, rows) <- xs.groupBy(_._1)) {
      val sorted = rows.sortBy(t => (t._3, t._2)).map(_._3)
      val nn = sorted.length
      val q1 = sorted((nn + 3) / 4 - 1)
      val q3 = sorted((3 * nn + 3) / 4 - 1)
      val iqr = q3 - q1
      val lo = sorted.count(v => 2 * v < 2 * q1 - 3 * iqr).toLong
      val hi = sorted.count(v => 2 * v > 2 * q3 + 3 * iqr).toLong
      assert(got(g) == (q1, q3, lo, hi), s"nation $g")
    }
  }

  test("streaming quota mix equals the batch temperature mix exactly") {
    val batch = graft.ops.PipelineQueries.dataTemperatureMix(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val stream = graft.streaming.Events.streamQuotaMix(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(stream == batch,
      "streaming bottom-k state must equal the batch ranked fill")
  }

  test("hurst R/S matches a naive block replay") {
    val got = graft.ops.Stats.qHurstExponent(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val xs = dailyE4().map(_._2)
    for (bs <- Seq(8, 16, 32, 64)) {
      val blocks = xs.grouped(bs).filter(_.length == bs).toSeq
      val rsM = blocks.flatMap { blk =>
        val s = blk.sum
        val devs = blk.map(x => bs * x - s)
        val cums = devs.scanLeft(0L)(_ + _).tail
        val ssq = devs.map(d => BigInt(d) * d).sum
        if (ssq > 0)
          Some(math.round((cums.max - cums.min).toDouble /
            math.sqrt(BigDecimal(ssq).toDouble / bs) * 1e6))
        else None
      }
      val (gn, gavg) = got(bs.toLong)
      assert(gn == rsM.length.toLong, s"bs $bs n_blocks")
      assert(gavg == math.floor(rsM.sum.toDouble / rsM.length / 1e6
        * 1e6 + 0.5) / 1e6, s"bs $bs avg_rs")
    }
    // 0 < H < 1 sanity
    val h = graft.ops.Stats.qHurstExponent(spark, sf)
      .collect().head.getDouble(3)
    assert(h > 0 && h < 1, s"hurst $h out of range")
  }

  test("permutation entropy matches a naive pattern census") {
    val got = graft.ops.Stats.qPermEntropy(spark, sf).collect()
    val xs = dailyE4().map(_._2)
    val pats = xs.sliding(3).filter(_.length == 3).map { t =>
      val (x1, x2, x3) = (t(0), t(1), t(2))
      val r1 = (if (x2 < x1) 1 else 0) + (if (x3 < x1) 1 else 0)
      val r2 = (if (x1 <= x2) 1 else 0) + (if (x3 < x2) 1 else 0)
      val r3 = (if (x1 <= x3) 1 else 0) + (if (x2 <= x3) 1 else 0)
      (r1 * 9 + r2 * 3 + r3).toLong
    }.toSeq
    val want = pats.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
    val t = pats.length.toLong
    val hNum = want.values
      .map(c => c * math.round(-math.log(c.toDouble / t) * 1e6)).sum
    val hWant = math.floor(hNum.toDouble / t + 0.5) / 1e6
    assert(got.head.getDouble(3) == hWant, "entropy")
    assert(got.head.getDouble(4) <= 1.0001, "normalized entropy <= 1")
  }

  test("cramer-von-mises matches a naive rank replay") {
    val r = graft.ops.Stats.qCramerVonMises(spark, sf).collect().head
    val xs = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .sortBy { case (k, v) => (v, k) }
    val ranked = xs.zipWithIndex.map { case ((k, v), idx) =>
      (k % 2 == 0, idx + 1L) }
    def t2(side: Boolean) = ranked.filter(_._1 == side).map(_._2)
      .zipWithIndex.map { case (rk, i) =>
        val d = rk - (i + 1); d * d }.sum
    val (nA, nB) = (ranked.count(_._1).toLong, ranked.count(!_._1).toLong)
    val (t2a, t2b) = (t2(true), t2(false))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (nA, nB, t2a, t2b))
    val u = nA.toDouble * t2a + nB.toDouble * t2b
    val tWant = u / (nA.toDouble * nB * (nA + nB)) -
      (4.0 * nA * nB - 1) / (6.0 * (nA + nB))
    assert(math.abs(r.getDouble(4) - tWant) < 1e-5, "t stat")
  }

  test("json pointer translation handles escapes, arrays and misses") {
    import graft.json.JsonPointer.toJsonPath
    assert(toJsonPath("/meta/price_cents") == "$['meta']['price_cents']")
    assert(toJsonPath("/a~1b") == "$['a/b']")
    assert(toJsonPath("/a~0b") == "$['a~b']")
    assert(toJsonPath("/tags/1") == "$['tags'][1]")
    assert(toJsonPath("") == "$")
    import spark.implicits._
    val df = Seq(
      """{"a/b":"X","meta":{"price_cents":123},"tags":["O","HIGH"]}""")
      .toDF("doc")
    val r = df.select(
      graft.json.JsonPointer.get(col("doc"), "/meta/price_cents"),
      graft.json.JsonPointer.get(col("doc"), "/a~1b"),
      graft.json.JsonPointer.get(col("doc"), "/tags/1"),
      graft.json.JsonPointer.get(col("doc"), "/meta/none")).head
    assert((r.getString(0), r.getString(1), r.getString(2)) ==
      ("123", "X", "HIGH"))
    assert(r.isNullAt(3))
  }

  test("two-way anova matches a naive SS decomposition replay") {
    val rows = graft.ops.Stats.qTwoWayAnova(spark, sf).collect()
    val qs = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity")).cast("long"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val n = qs.length.toDouble
    val gMean = qs.map(_._2).sum / n
    val byCell = qs.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val byA = qs.groupBy(_._1._1).view.mapValues(_.map(_._2).toSeq).toMap
    val byB = qs.groupBy(_._1._2).view.mapValues(_.map(_._2).toSeq).toMap
    def ssOf(groups: Iterable[Seq[Long]]) =
      groups.map(g => g.length * math.pow(g.sum / g.length.toDouble
        - gMean, 2)).sum
    val ssA = ssOf(byA.values)
    val ssB = ssOf(byB.values)
    val ssCells = ssOf(byCell.values)
    val ssW = qs.map { case (k, q) =>
      val m = byCell(k).sum / byCell(k).length.toDouble
      (q - m) * (q - m) }.sum
    val (ka, kb, kc) = (byA.size, byB.size, byCell.size)
    val r0 = rows.head
    val fA = (ssA / (ka - 1)) / (ssW / (n - kc))
    val fB = (ssB / (kb - 1)) / (ssW / (n - kc))
    val fAB = ((ssCells - ssA - ssB) / ((ka - 1) * (kb - 1))) /
      (ssW / (n - kc))
    assert(math.abs(r0.getDouble(9) - fA) < fA * 1e-4 + 2e-4, "F_A")
    assert(math.abs(r0.getDouble(10) - fB) < fB * 1e-4 + 2e-4, "F_B")
    assert(math.abs(r0.getDouble(11) - fAB) < fAB * 1e-4 + 2e-4, "F_AB")
  }

  test("gumbel fit matches a naive moment replay") {
    val r = graft.ops.Stats.qGumbelMaxima(spark, sf).collect().head
    val mx = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(date_format(to_date(col("l_shipdate")), "yyyy-MM"),
        to_date(col("l_shipdate")))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .groupBy(col("date_format(to_date(l_shipdate), yyyy-MM)"))
      .agg(max(col("e4"))).collect().map(_.getLong(1))
    val n = mx.length.toDouble
    val mean = mx.sum / n
    val sd = math.sqrt(mx.map(m => (m - mean) * (m - mean)).sum / (n - 1))
    val beta = sd * math.sqrt(6.0) / math.Pi
    val mu = mean - 0.5772156649015329 * beta
    val rl10 = mu - beta * math.log(-math.log(1 - 1.0 / 10))
    assert(r.getLong(0) == mx.length.toLong)
    assert(math.abs(r.getDouble(3) - mu / 10000) < 1, "mu")
    assert(math.abs(r.getDouble(4) - rl10 / 10000) < 1, "rl10")
    // return levels are ordered: rl100 > rl10 > mean
    assert(r.getDouble(5) > r.getDouble(4) && r.getDouble(4)
      > r.getDouble(1))
  }

  test("harmonic centrality dominates closeness ordering sanity") {
    val h = graft.ops.Mining.qHarmonicCentrality(spark, sf).collect()
    assert(h.length > 0 && h.length <= 20)
    // harm_micro consistent with its own columns and monotone output
    for (r <- h) {
      assert(r.getLong(3) <= r.getLong(1) * 1000000L,
        "harmonic <= n_src (each term <= 1)")
      assert(r.getLong(2) >= 1L, "min dist positive")
    }
    val ms = h.map(_.getLong(3))
    assert(ms.zip(ms.tail).forall { case (a, b) => a >= b }, "sorted desc")
  }

  test("price index matches a naive unit-value replay") {
    val got = graft.ops.Stats.qPriceIndex(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val pm = graft.sources.Tables.lineitem(spark, sf)
      .select(date_format(to_date(col("l_shipdate")), "yyyy-MM").as("m"),
        col("l_partkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"),
        round(col("l_quantity")).cast("long").as("q"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view
      .mapValues(vs => (vs.map(_._2._1).sum, vs.map(_._2._2).sum)).toMap
    val uv = pm.view.mapValues { case (rev, q) => (rev * 100) / q }.toMap
    val m0 = pm.keys.map(_._1).min
    val base = pm.keys.filter(_._1 == m0).map(_._2).toSet
    for (m <- pm.keys.map(_._1)) {
      val parts = pm.keys.filter(_._1 == m).map(_._2).toSet & base
      val lnum = parts.toSeq.map(p => uv((m, p)) * pm((m0, p))._2).sum
      val lden = parts.toSeq.map(p => uv((m0, p)) * pm((m0, p))._2).sum
      val pnum = parts.toSeq.map(p => uv((m, p)) * pm((m, p))._2).sum
      val pden = parts.toSeq.map(p => uv((m0, p)) * pm((m, p))._2).sum
      val (gn, gl, gp) = got(m)
      assert(gn == parts.size.toLong, s"$m matched parts")
      assert(gl == r6(lnum.toDouble / lden), s"$m laspeyres")
      assert(gp == r6(pnum.toDouble / pden), s"$m paasche")
    }
  }
}
