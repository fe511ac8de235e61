package graft

import org.apache.spark.sql.functions._

/** Round-14 regressions: the bounded-state streaming-distinct rewrite
  * (stream_dau_mau / stream_srm on `dropDuplicatesWithinWatermark`)
  * certified two ways — stream ≡ batch value equality, and the
  * state-store row counts from query progress proving the watermark
  * actually EVICTS dedup state mid-run (the r13 verdict's order #1:
  * the old `dropDuplicates` shape held every key for the query's
  * lifetime).
  */
class Round14Spec extends SparkSuite {

  test("stream_dau_mau equals batch and its DAU dedup state is " +
      "watermark-bounded with mid-run eviction") {
    val got = graft.streaming.Events.streamDauMau(spark, sf).collect()
    val exp = graft.ops.Behavior.qDauMau(spark, sf).collect()
    assert(got.map(_.toString).toSeq == exp.map(_.toString).toSeq,
      s"stream=${got.mkString(";")} batch=${exp.mkString(";")}")

    val userDays = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    val dOps = graft.streaming.StreamMeter.stateEvictions
      .get("graft_stream_daumau_d")
    assert(dOps != null && dOps.size == 1, "one dedup state operator")
    val (_, dFinal, dRemoved) = dOps.head
    // every first-seen (user, day) key entered state exactly once and
    // left it at most once, so resident + evicted partitions the keys
    assert(dFinal + dRemoved == userDays,
      s"state rows $dFinal + removed $dRemoved != user-days $userDays")
    // the 2-day watermark must evict mid-run on the ~30-day corpus:
    // holding every key to the end is the unbounded shape we replaced
    assert(dRemoved > 0, "DAU dedup evicted no state mid-run")
    assert(dFinal < userDays, "DAU dedup held every user-day key")

    // r17 diet: MAU folds from the SAME (user, day) first-seen log
    // (month is a function of day), so there is no second monthly
    // dedup stream — and therefore no graft_stream_daumau_m state
    // operator — any more. The MAU values themselves are pinned by
    // the batch-equality assert above.
    assert(graft.streaming.StreamMeter.stateEvictions
      .get("graft_stream_daumau_m") == null,
      "monthly dedup stream resurrected — the r17 diet folded MAU " +
        "from the daily first-seen log")
  }

  test("stream_srm equals the batch census under the " +
      "enrollment-horizon dedup") {
    val got = graft.streaming.Events.streamSrm(spark, sf).collect()
    val exp = graft.ops.Mining.qAbSrm(spark, sf).collect()
    assert(got.map(_.toString).toSeq == exp.map(_.toString).toSeq,
      s"stream=${got.mkString(";")} batch=${exp.mkString(";")}")
    val users = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val ops = graft.streaming.StreamMeter.stateEvictions
      .get("graft_stream_srm")
    assert(ops != null && ops.size == 1)
    val (_, fin, removed) = ops.head
    // the 45-day horizon exceeds the corpus span, so nothing may be
    // evicted early (exactness) and state is exactly the user census
    assert(fin + removed == users && removed == 0,
      s"rows $fin removed $removed users $users")
  }

  test("scc labels match an in-JVM Tarjan replay") {
    val got = graft.ops.Mining.qScc(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // rebuild the directed successor graph naively
    val sp = graft.sources.Tables.part(spark, sf)
      .filter(col("p_size") === 1).select(col("p_partkey").cast("long"))
      .collect().map(_.getLong(0)).toSet
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
      .filter(t => sp.contains(t._3))
      .distinct
    val edges = li.groupBy(_._1).values.flatMap { lines =>
      // total (linenumber, partkey) order over the distinct triples —
      // the operator's tie-proof succession contract
      val seq = lines.sortBy(t => (t._2, t._3)).map(_._3)
      seq.zip(seq.tail).filter(p => p._1 != p._2)
    }.toSet
    val nodes = edges.flatMap(p => Seq(p._1, p._2))
    // iterative Tarjan
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val idx = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStk = scala.collection.mutable.Set[Long]()
    val stk = scala.collection.mutable.Stack[Long]()
    var ctr = 0
    val comps = scala.collection.mutable.ListBuffer[Set[Long]]()
    def strong(root: Long): Unit = {
      // explicit work stack: (node, child cursor)
      val work = scala.collection.mutable.Stack[(Long, Iterator[Long])]()
      idx(root) = ctr; low(root) = ctr; ctr += 1
      stk.push(root); onStk += root
      work.push((root, adj.getOrElse(root, Nil).iterator))
      while (work.nonEmpty) {
        val (v, it) = work.top
        if (it.hasNext) {
          val w = it.next()
          if (!idx.contains(w)) {
            idx(w) = ctr; low(w) = ctr; ctr += 1
            stk.push(w); onStk += w
            work.push((w, adj.getOrElse(w, Nil).iterator))
          } else if (onStk(w)) low(v) = math.min(low(v), idx(w))
        } else {
          work.pop()
          if (work.nonEmpty) {
            val p = work.top._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == idx(v)) {
            val comp = scala.collection.mutable.Set[Long]()
            var w = 0L
            while ({ w = stk.pop(); onStk -= w; comp += w; w != v }) ()
            comps += comp.toSet
          }
        }
      }
    }
    for (n <- nodes if !idx.contains(n)) strong(n)
    val expected = comps.flatMap(c =>
      c.map(v => v -> (c.min, c.size.toLong))).toMap
    assert(got.keySet == expected.keySet)
    for ((id, (scc, sz)) <- expected)
      assert(got(id) == (scc, sz), s"node $id: got ${got(id)} want ($scc,$sz)")
  }

  test("racing upserts: the loser detects the conflict, rolls back, " +
      "and a retry lands on top of the winner") {
    import spark.implicits._
    val wh = graft.util.Scratch.dir("graft_cc_spec").toString
    val engA = new graft.Engine(spark, wh)
    val engB = new graft.Engine(spark, wh)
    engB.save(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("rowNum", "v"), "t")
    var fired = 0
    engB.beforeSwap = _ => if (fired == 0) { fired += 1
      engA.upsert("t", Seq((2L, 200.0)).toDF("rowNum", "v")) }
    val ex = intercept[java.util.ConcurrentModificationException] {
      engB.upsert("t", Seq((3L, 300.0)).toDF("rowNum", "v"))
    }
    assert(ex.getMessage.contains("lost update prevented"))
    // the winner's publish survived the loser's rollback
    val mid = engB.table("t").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mid == Map(1L -> 10.0, 2L -> 200.0, 3L -> 30.0))
    engB.beforeSwap = _ => ()
    engB.upsert("t", Seq((3L, 300.0)).toDF("rowNum", "v"))
    val fin = engB.table("t").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fin == Map(1L -> 10.0, 2L -> 200.0, 3L -> 300.0))
    // and the single-writer path still swaps silently
    engB.upsert("t", Seq((1L, 11.0)).toDF("rowNum", "v"))
    assert(engB.table("t").filter(col("rowNum") === 1)
      .head().getDouble(1) == 11.0)
  }

  test("2-d array shred round-trips matrices cell- and order-exactly") {
    import spark.implicits._
    val wh = graft.util.Scratch.dir("graft_mx_spec").toString
    val eng = new graft.Engine(spark, wh)
    val in = Seq(
      (1L, Seq(Seq(3L, 1L), Seq(4L, 1L, 5L))),
      (2L, Seq(Seq(9L))),
      (3L, Seq(Seq(2L, 7L), Seq(1L), Seq(8L, 2L, 8L, 1L))))
      .toDF("rowNum", "m")
    val written = eng.save(in, "doc")
    assert(written.contains("m"), s"cell table not written: $written")
    // the shredded cell table carries (parentFK, pos, ipos, value)
    val cells = eng.table("m").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(cells.length == 13)
    assert(cells.contains((3L, 2, 3, 1L)))
    // and re-assembly restores the exact nested value
    val back = eng.nested("doc").collect()
      .map(r => r.getLong(r.fieldIndex("rowNum")) ->
        r.getSeq[Seq[Long]](r.fieldIndex("m"))).toMap
    assert(back(1L) == Seq(Seq(3L, 1L), Seq(4L, 1L, 5L)))
    assert(back(2L) == Seq(Seq(9L)))
    assert(back(3L) == Seq(Seq(2L, 7L), Seq(1L), Seq(8L, 2L, 8L, 1L)))
  }

  test("dag longest-path layers match a naive topological replay") {
    val got = graft.ops.Mining.qDagLongestPath(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val sp = graft.sources.Tables.part(spark, sf)
      .filter(col("p_size") === 1).select(col("p_partkey").cast("long"))
      .collect().map(_.getLong(0)).toSet
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
      .filter(t => sp.contains(t._3)).distinct
    val edges = li.groupBy(_._1).values.flatMap { lines =>
      val seq = lines.sortBy(t => (t._2, t._3)).map(_._3)
      seq.zip(seq.tail).filter(p => p._1 != p._2 && p._1 < p._2)
    }.toSet
    val nodes = edges.flatMap(p => Seq(p._1, p._2))
    // naive DP in increasing-id order (valid topological order here)
    val dist = scala.collection.mutable.Map[Long, Long]()
    for (v <- nodes.toSeq.sorted) {
      val in = edges.filter(_._2 == v).map(e => dist(e._1) + 1)
      dist(v) = if (in.isEmpty) 0L else math.max(0L, in.max)
    }
    val exp = dist.toSeq.groupBy(_._2).map { case (dd, vs) =>
      dd -> (vs.size.toLong, vs.map(_._1).min, vs.map(_._1).max) }
    assert(got == exp, s"got $got want $exp")
  }

  test("dyad census matches a naive replay") {
    val r = graft.ops.Mining.qDyadCensus(spark, sf).head()
    val sp = graft.sources.Tables.part(spark, sf)
      .filter(col("p_size") === 1).select(col("p_partkey").cast("long"))
      .collect().map(_.getLong(0)).toSet
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey").cast("long"))
      .collect().map(x => (x.getLong(0), x.getInt(1).toLong, x.getLong(2)))
      .filter(t => sp.contains(t._3)).distinct
    val edges = li.groupBy(_._1).values.flatMap { lines =>
      val seq = lines.sortBy(t => (t._2, t._3)).map(_._3)
      seq.zip(seq.tail).filter(p => p._1 != p._2)
    }.toSet
    val recip = edges.count(e => edges.contains((e._2, e._1)))
    assert(r.getLong(r.fieldIndex("n_edges")) == edges.size.toLong)
    assert(r.getLong(r.fieldIndex("n_mutual_dyads")) == recip / 2)
    assert(r.getLong(r.fieldIndex("n_asym_dyads")) ==
      edges.size.toLong - recip)
  }

  test("bh fdr step-up matches a naive replay") {
    val out = graft.ops.Mining.qBhFdr(spark, sf).collect()
    val pts = graft.sources.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"),
        round(col("c_acctbal")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byG = pts.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def z(g: Long): Double = {
      val vs = byG(g).map(_.toDouble)
      val rest = pts.filter(_._1 != g).map(_._2.toDouble)
      def mv(a: Seq[Double]) = {
        val m = a.sum / a.length
        (m, a.map(x => (x - m) * (x - m)).sum / (a.length - 1))
      }
      val (mg, vg) = mv(vs.toSeq); val (mr, vr) = mv(rest.toSeq)
      (mg - mr) / math.sqrt(vg / vs.length + vr / rest.length)
    }
    val m = byG.size
    val zs = byG.keys.toSeq.map(g => g -> z(g))
      .sortBy { case (g, zz) => (-math.abs(zz), g) }
    val crit = (1 to m).map(k =>
      graft.ops.Mining.invNorm(1.0 - k * 0.05 / (2.0 * m)))
    val kStar = (1 to m).filter(k =>
      math.abs(zs(k - 1)._2) >= crit(k - 1)).lastOption.getOrElse(0)
    for ((r, i) <- out.zipWithIndex) {
      assert(r.getLong(r.fieldIndex("rnk")) == i + 1)
      assert(r.getLong(r.fieldIndex("nation")) == zs(i)._1, s"rank ${i + 1}")
      assert(math.abs(r.getDouble(r.fieldIndex("z")) - zs(i)._2) < 1e-3)
      assert(r.getBoolean(r.fieldIndex("rejected")) == (i + 1 <= kStar))
    }
  }

  test("quantile normalization: marginals equalize and ranks replay") {
    val out = graft.ops.Stats.qQuantileNormalize(spark, sf).collect()
    val byFlag = out.groupBy(_.getString(0))
    assert(byFlag.size == 3)
    // after normalization the three series are IDENTICAL rank-wise
    val series = byFlag.values.map(_.map(r =>
      r.getLong(r.fieldIndex("rn")) ->
        r.getDouble(r.fieldIndex("norm_revenue"))).toMap)
    assert(series.toSeq.distinct.size == 1)
    // and each flag's normalized column is monotone in rank
    for (rows <- byFlag.values) {
      val sorted = rows.sortBy(_.getLong(1))
      val nr = sorted.map(_.getDouble(sorted.head.fieldIndex("norm_revenue")))
      assert(nr.zip(nr.tail).forall { case (a, b) => a <= b })
    }
  }

  test("apportionment: seats sum to 1000 and follow largest remainders") {
    val out = graft.ops.Stats.qApportionment(spark, sf).collect()
    assert(out.map(_.getLong(out.head.fieldIndex("seats"))).sum == 1000L)
    val n = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nt = n.values.sum
    val base = n.view.mapValues(v => v * 1000 / nt).toMap
    val rem = n.map { case (g, v) => g -> (v * 1000 - base(g) * nt) }
    val k = (1000 - base.values.sum).toInt
    val bonus = rem.toSeq.sortBy { case (g, r) => (-r, g) }
      .take(k).map(_._1).toSet
    for (r <- out) {
      val g = r.getLong(0)
      assert(r.getLong(r.fieldIndex("seats")) ==
        base(g) + (if (bonus(g)) 1 else 0), s"nation $g")
    }
  }

  test("wbmp roundtrip decodes bit-exact") {
    for (id <- Seq(0L, 1L, 7L, 123L)) {
      val bytes = graft.mm.Codecs.encodeWbmp(id)
      val (w, h, sum) = graft.mm.Codecs.decodePngStats(bytes)
      assert(w == graft.mm.Codecs.wbmpWidth(id))
      assert(h == graft.mm.Codecs.wbmpHeight(id))
      val exp = (for (x <- 0 until w; y <- 0 until h) yield
        if (graft.mm.Codecs.grayAt(x, y, id) >= 128) 255L else 0L).sum
      assert(sum == exp, s"doc $id px_sum")
    }
  }

  test("covering index serves the aggregate index-only") {
    val df = graft.ops.JsonQueries.engineIndexCovering(spark, sf)
    // every file scan in the plan reads the covering index — the base
    // table dir is never touched (rootPaths, not the toString, which
    // truncates long paths)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.nonEmpty)
    assert(scans.forall(_.contains("__cidx_")),
      s"non-index scan in plan: $scans")
    assert(df.count() > 0)
  }

  test("beta hedge matches a naive OLS replay") {
    val out = graft.ops.Series.qBetaHedge(spark, sf).collect()
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_shipdate").cast("date"),
        (round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long")))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val daily = rows.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val tot = daily.groupBy(_._1._2).view
      .mapValues(_.values.sum).toMap
    for (r <- out) {
      val f = r.getString(0)
      val pts = daily.collect { case ((`f`, day), x) => (x, tot(day)) }.toSeq
      val n = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
      val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val syy = pts.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val beta = (BigDecimal(sxy) * n - sx * sy).toDouble /
        (BigDecimal(syy) * n - sy * sy).toDouble
      val alpha = (sx - beta * sy) / n / 10000
      assert(r.getLong(r.fieldIndex("n_days")) == pts.size.toLong, f)
      assert(math.abs(r.getDouble(r.fieldIndex("beta")) - beta) < 1e-4, f)
      assert(math.abs(r.getDouble(r.fieldIndex("alpha")) - alpha) < 0.5, f)
    }
  }

  test("tost equivalence matches a naive replay") {
    val out = graft.ops.Stats.qTostEquivalence(spark, sf).collect()
    val pts = graft.sources.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), (col("c_custkey") % 2),
        round(col("c_acctbal")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val zA = graft.ops.Mining.invNorm(0.95)
    for (r <- out) {
      val g = r.getLong(0)
      def mv(arm: Long) = {
        val vs = pts.filter(t => t._1 == g && t._2 == arm).map(_._3.toDouble)
        val m = vs.sum / vs.length
        (m, vs.map(x => (x - m) * (x - m)).sum / (vs.length - 1), vs.length)
      }
      val (mo, vo, no) = mv(1); val (me, ve, ne) = mv(0)
      val delta = mo - me
      val se = math.sqrt(vo / no + ve / ne)
      assert(math.abs(r.getDouble(r.fieldIndex("delta")) - delta) < 1e-3)
      assert(math.abs(r.getDouble(r.fieldIndex("se")) - se) < 1e-3)
      val eq = (delta + 100) / se >= zA && (delta - 100) / se <= -zA
      assert(r.getBoolean(r.fieldIndex("equivalent")) == eq, s"nation $g")
    }
  }

  test("stream_timezone equals the batch census") {
    val got = graft.streaming.Events.streamTimezone(spark, sf).collect()
    val exp = graft.ops.Analytics.qTimezoneFuncs(spark, sf).collect()
    assert(got.map(_.toString).toSeq == exp.map(_.toString).toSeq)
  }

  test("late-data audit drops exactly the late quarter and nothing else") {
    val got = graft.streaming.Events.streamLateDataAudit(spark, sf)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    // naive replay of the quartile-boundary drop rule
    val evs = graft.sources.Tables.events(spark, sf)
      .select(unix_micros(col("ts")), to_date(col("ts")),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    val lo = evs.map(_._1).min
    val hi = evs.map(_._1).max
    val q1 = lo + (hi - lo + 1) / 4
    val kept = evs.filter(_._1 >= q1)
    val exp = kept.groupBy(_._2).view.mapValues(xs =>
      (xs.length.toLong, xs.map(_._3).sum)).toMap
    assert(got == exp)
    // the census equality above is the full-drop proof; the state
    // operator's own metric only sees the late rows that survive the
    // earlier plan-level watermark filter, so pin it as a bounded
    // nonzero witness rather than the exact count
    val nLate = evs.length - kept.length
    assert(nLate > 0, "fixture must contain a late quarter")
    val dropped = graft.streaming.StreamMeter.lateDrops
      .get("graft_stream_late")
    assert(dropped > 0 && dropped <= nLate.toLong,
      s"droppedByWatermark $dropped outside (0, $nLate]")
  }

  test("correlation matrix matches a naive replay") {
    val out = graft.ops.Profiling.qCorrMatrix(spark, sf).collect()
    assert(out.length == 6)
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .select(round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_tax") * 100).cast("long"))
      .collect().map(r => Map("qty" -> r.getLong(0), "price" -> r.getLong(1),
        "disc" -> r.getLong(2), "tax" -> r.getLong(3)))
    def corr(a: String, b: String): Double = {
      val xs = rows.map(_(a).toDouble); val ys = rows.map(_(b).toDouble)
      val n = xs.length
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      num / math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
    }
    for (r <- out) {
      val c = corr(r.getString(0), r.getString(1))
      assert(math.abs(r.getDouble(r.fieldIndex("corr")) - c) < 1e-4,
        s"${r.getString(0)}~${r.getString(1)}")
    }
  }

  test("growth accounting matches a naive replay and its identities") {
    val out = graft.ops.Behavior.qGrowthAccounting(spark, sf).collect()
    val ud = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate)).distinct
    val byDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val firstDay = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    for (r <- out) {
      val day = r.getDate(0).toLocalDate
      val act = byDay(day)
      val prev = byDay.getOrElse(day.minusDays(1), Set.empty[Long])
      val nw = act.count(u => firstDay(u) == day)
      val ret = act.count(prev)
      val res = act.count(u => !prev(u) && firstDay(u).isBefore(day))
      val chu = prev.count(u => !act(u))
      assert(r.getLong(r.fieldIndex("active")) == act.size.toLong, s"$day")
      assert(r.getLong(r.fieldIndex("new_u")) == nw.toLong, s"$day new")
      assert(r.getLong(r.fieldIndex("retained")) == ret.toLong, s"$day ret")
      assert(r.getLong(r.fieldIndex("resurrected")) == res.toLong)
      assert(r.getLong(r.fieldIndex("churned")) == chu.toLong, s"$day churn")
      // the classification partitions the active set
      assert(nw + ret + res == act.size)
    }
  }

  test("durbin-watson matches a naive replay") {
    val r = graft.ops.Stats.qDurbinWatson(spark, sf).head()
    val daily = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("date"),
        (round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long")))
      .collect().map(x => (x.getDate(0).toLocalDate, x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.toEpochDay)
    val xs = daily.map(_._1.toEpochDay.toDouble)
    val ys = daily.map(_._2.toDouble)
    val n = xs.length
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val b = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    val a = my - b * mx
    val e = xs.zip(ys).map { case (x, y) => y - (a + b * x) }
    val dw = e.zip(e.tail).map { case (p, c) =>
      (c - p) * (c - p) }.sum / e.map(x => x * x).sum
    assert(r.getLong(r.fieldIndex("n_days")) == n.toLong)
    assert(math.abs(r.getDouble(r.fieldIndex("dw")) - dw) < 1e-4)
    assert(math.abs(r.getDouble(r.fieldIndex("beta_per_day")) -
      b / 10000) < 1e-3)
  }

  test("pr-auc matches a naive tie-aware average-precision replay") {
    val r = graft.ops.MlEval.qPrAuc(spark, sf).head()
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .select((round(col("l_quantity")).cast("long") * 101 +
          round(col("l_discount") * 100).cast("long")),
        when(col("l_returnflag") === "R", 1L).otherwise(0L))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val byV = rows.groupBy(_._1).view.mapValues { xs =>
      (xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong) }.toSeq
      .sortBy(-_._1) // descending score
    val p = rows.count(_._2 == 1L).toLong
    var (cp, cn) = (0L, 0L)
    var ap = 0.0
    for ((_, (pos, neg)) <- byV) {
      cp += pos; cn += neg
      ap += pos.toDouble * cp / (cp + cn)
    }
    ap /= p
    assert(r.getLong(r.fieldIndex("n_pos")) == p)
    assert(math.abs(r.getDouble(r.fieldIndex("avg_precision")) - ap) < 1e-4)
  }

  test("wasserstein-1d matches a naive sorted-pair replay") {
    val r = graft.ops.Stats.qWasserstein1d(spark, sf).head()
    val daily = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag"), col("l_shipdate").cast("date"),
        (round(col("l_extendedprice") * 100).cast("long") *
          round((lit(1) - col("l_discount")) * 100).cast("long")))
      .collect().map(x => ((x.getString(0), x.getDate(1).toString), x.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val days = daily.keySet.map(_._2)
      .filter(d => daily.contains(("A", d)) && daily.contains(("R", d)))
    val xa = days.toSeq.map(d => daily(("A", d))).sorted
    val xr = days.toSeq.map(d => daily(("R", d))).sorted
    val w1 = xa.zip(xr).map { case (a, b) => math.abs(a - b) }.sum
      .toDouble / xa.length / 10000
    assert(r.getLong(r.fieldIndex("n_days")) == days.size.toLong)
    assert(math.abs(r.getDouble(r.fieldIndex("w1_dollars")) - w1) < 0.02)
  }

  test("markov entropy rate matches a naive plug-in replay") {
    val r = graft.ops.Stats.qMarkovEntropyRate(spark, sf).head()
    val evs = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        x.getLong(3)))
    val trans = evs.groupBy(_._1).values.flatMap { es =>
      val seq = es.sortBy(e => (e._4, e._2)).map(_._3)
      seq.zip(seq.tail)
    }.toSeq
    val nij = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ni = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = trans.size.toLong
    val h = nij.map { case ((s2, _), c) =>
      c.toDouble * math.log(ni(s2).toDouble / c) }.sum / n
    assert(r.getLong(r.fieldIndex("n_transitions")) == n)
    assert(math.abs(r.getDouble(r.fieldIndex("entropy_rate_nats")) - h)
      < 1e-5)
    assert(math.abs(r.getDouble(r.fieldIndex("perplexity")) -
      math.exp(h)) < 1e-3)
  }

  test("partitioned save prunes partitions at the scan") {
    val df = graft.ops.JsonQueries.enginePartitionedSave(spark, sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // the status filter must ride the PARTITION columns, not the data
    assert(scans.forall(_.partitionFilters.exists(
        _.references.exists(_.name == "o_orderstatus"))),
      "status predicate not in partitionFilters")
    assert(df.count() == 1)
  }

  test("stream_corr_matrix equals the batch matrix") {
    val got = graft.streaming.Events.streamCorrMatrix(spark, sf).collect()
    val exp = graft.ops.Profiling.qCorrMatrix(spark, sf).collect()
    assert(got.map(_.toString).toSeq == exp.map(_.toString).toSeq)
  }

  test("nfkc canonicalization collapses fullwidth, case and " +
      "combining-accent variants") {
    import spark.implicits._
    val k = graft.functions.Kernels
    def canon(s: String): String =
      k.nfkcCanon(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toString
    assert(canon("ｈｅｌｌｏ Ｗｏｒｌｄ") == "hello world")
    assert(canon("CAFÉ Café café") == "cafe cafe cafe")
    assert(canon("spark table") == "spark table") // ASCII fixed point
    // the dedup_unicode census at sf: all docs collapse 3 → 1
    val out = graft.ops.PipelineQueries.dedupUnicode(spark, sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getLong(r.fieldIndex("n_variants")) == 3L)
      assert(r.getLong(r.fieldIndex("n_canon")) == 1L)
    }
  }
}
