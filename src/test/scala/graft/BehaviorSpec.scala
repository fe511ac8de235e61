package graft

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Warehouse}
import graft.sources.Tables

/** Semantic invariants for the behavioral-analytics family — each
  * checked against an independent formulation so a defect can't hide
  * behind the DuckDB oracle sharing the clever shape. */
class BehaviorSpec extends SparkSuite {

  test("cohort retention is 1.0 at offset 0 and never exceeds it") {
    val rows = Behavior.qCohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (_, rs) =>
      val zero = rs.find(_.getLong(1) == 0L)
      assert(zero.isDefined, "cohort missing its offset-0 cell")
      assert(zero.get.getDouble(3) == 1.0,
        "offset-0 retention must be 1.0 (every member active then)")
      rs.foreach(r => assert(r.getDouble(3) <= 1.0))
    }
  }

  test("attribution conserves purchases and buckets stay in range") {
    val rows = Behavior.qAttribution(spark, sf).collect()
    val attributed = rows.map(_.getLong(1)).sum
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(attributed == purchases,
      s"attribution lost purchases: $attributed vs $purchases")
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(b >= -1L && b <= 5L, s"gap bucket out of range: $b")
    }
  }

  test("z-score outliers are a small minority in every group") {
    Behavior.qAnomalyZscore(spark, sf).collect().foreach { r =>
      val n = r.getLong(r.fieldIndex("n_rows"))
      val out = r.getLong(r.fieldIndex("n_high")) +
        r.getLong(r.fieldIndex("n_low"))
      assert(out < n / 4, s"outliers not a minority: $out of $n")
    }
  }

  test("ewma equals revenue on each group's first month") {
    val first = Behavior.qEwma(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag")).orderBy(col("month"))))
      .filter(col("rn") === 1)
      .collect()
    assert(first.nonEmpty)
    first.foreach { r =>
      val rev = r.getDouble(r.fieldIndex("revenue"))
      val ewma = r.getDouble(r.fieldIndex("ewma"))
      assert(math.abs(ewma - rev) < 0.01,
        s"first-month ewma $ewma != revenue $rev")
    }
  }

  test("degree distribution accounts for every edge exactly once") {
    val hist = Behavior.qDegreeDist(spark, sf).collect()
    val edgeSum = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    val edges = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().count()
    assert(edgeSum == edges, s"degree mass $edgeSum != edge count $edges")
  }

  test("bloom-prefiltered semi-join equals the plain semi-join") {
    val keys = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plain = Tables.lineitem(spark, sf)
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
    assert(Warehouse.qBloomSemiFilter(spark, sf).collect().toSeq ==
      plain.collect().toSeq)
  }

  test("bloom prefilter never drops a true match") {
    val keys = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val sketch = keys
      .agg(graft.functions.Bloom.sketchAgg(xxhash64(col("o_orderkey")),
        nItems = 40000L, nBits = 400000L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val trueMatches = Tables.lineitem(spark, sf)
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val missed = trueMatches
      .filter(!graft.functions.Bloom.mightContain(sketch,
        xxhash64(col("l_orderkey"))))
      .count()
    assert(missed == 0L, s"bloom false negatives: $missed")
  }

  test("gzip json roundtrip preserves rows and writes .gz part files") {
    val back = graft.sources.Formats.jsonGzipRoundtrip(spark, sf)
    assert(back.count() == Tables.orders(spark, sf).count())
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft_fmt/orders_json_gz__root_testdata_sf0.001")
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".json.gz")),
      s"expected .json.gz parts in $dir")
  }

  test("cusum change points carry the largest cumulative drift") {
    val rows = Behavior.qCusumChange(spark, sf).collect()
    assert(rows.length == 10)
    // the reported days must be sorted by |cusum| descending
    val mags = rows.map(r => math.abs(r.getDouble(r.fieldIndex("cusum"))))
    assert(mags.toSeq == mags.sortBy(-_).toSeq)
    // z-scores standardize a real series: not all identical
    assert(rows.map(_.getDouble(2)).distinct.length > 1)
  }

  test("rolling median sits inside each window's min-max envelope") {
    val rows = Behavior.qRollingMedian(spark, sf).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      assert(r.getDouble(4) == math.floor(
        (r.getDouble(3) - r.getDouble(2)) * 100 + 0.5) / 100,
        "skew_gap must equal mean28 - med28 (2dp)")
    }
    val gaps = rows.map(r => math.abs(r.getDouble(4))).toSeq
    assert(gaps == gaps.sortBy(-(_: Double)), "ranked by |gap| desc")
  }

  test("autocorrelation values bounded and pair counts shrink with lag") {
    val rows = Behavior.qAutocorr(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 7, 28))
    rows.foreach { r =>
      val ac = r.getDouble(2)
      assert(ac >= -1.0 && ac <= 1.0)
    }
    val pairs = rows.map(_.getLong(1)).toSeq
    assert(pairs == pairs.sorted.reverse,
      "longer lags leave fewer complete pairs")
  }

  test("rolling correlation stays in [-1,1] over full windows only") {
    val rows = Behavior.qRollingCorr(spark, sf).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val c = r.getDouble(r.fieldIndex("corr28"))
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $c")
    }
    val mags = rows.map(r => math.abs(r.getDouble(r.fieldIndex("corr28"))))
    assert(mags.toSeq == mags.sortBy(-_).toSeq, "ranked by |corr| desc")
  }

  test("seasonality indices average to ~1 weighted by day counts") {
    val rows = Behavior.qSeasonality(spark, sf).collect()
    assert(rows.length == 7)
    assert(rows.map(_.getInt(0)).toSeq == (0 to 6))
    val totDays = rows.map(_.getLong(1)).sum
    // weighted mean of dow averages recovers the overall mean → indices
    // weighted-average to 1
    val wIdx = rows.map(r => r.getLong(1) *
      r.getDouble(r.fieldIndex("seasonal_index"))).sum / totDays
    assert(math.abs(wIdx - 1.0) < 1e-3, s"weighted index $wIdx != 1")
  }

  test("decay score is positive and bounded by undecayed revenue") {
    val rows = Behavior.qDecayScore(spark, sf).collect()
    assert(rows.length == 15)
    val totals = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val dv = r.getDouble(1)
      assert(dv > 0)
      assert(dv <= totals(r.getLong(0)) + 0.01,
        "decay can only shrink revenue")
    }
    val dvs = rows.map(_.getDouble(1)).toSeq
    assert(dvs == dvs.sorted.reverse)
  }

  test("inter-arrival gaps: p90 dominates p50, max dominates p90") {
    val rows = Behavior.qInterArrival(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (p50, p90, mx) =
        (r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(p50 >= 0 && p90 >= p50 && mx >= p90)
    }
    // gaps per type = events per type - 1
    val perType = Tables.events(spark, sf)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(r.getLong(1) == perType(r.getString(0)) - 1))
  }

  test("rolling wau dominates dau and stickiness stays in (0,1]") {
    val rows = Behavior.qRollingWau(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau) = (r.getLong(1), r.getLong(2))
      assert(wau >= dau, "7-day actives must include today's actives")
      val st = r.getDouble(3)
      assert(st > 0.0 && st <= 1.0)
    }
    // a 7-day window can never hold more than the whole user base
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).max <= users)
  }

  test("conversion lag percentiles are ordered and non-negative") {
    val r = Behavior.qConversionLag(spark, sf).head()
    val (p50, p90) = (r.getDouble(1), r.getDouble(2))
    assert(r.getLong(0) > 0, "some users convert")
    assert(p50 >= 0 && p90 >= p50, "p90 must dominate p50")
    assert(r.getDouble(3) >= 0)
  }

  test("quoted multiline csv roundtrip preserves rows and note bytes") {
    val back = graft.sources.Formats.csvQuoted(spark, sf)
    val n = Tables.orders(spark, sf).count()
    assert(back.count() == n, "multiLine parse must not split records")
    val bad = back.filter(!col("note").contains("\"q,\n")).count()
    assert(bad == 0, "escaped quote/comma/newline must survive verbatim")
  }

  test("locf imputation: grid complete, filled+observed+leading = days") {
    val rows = Behavior.qLocfImpute(spark, sf).collect()
    assert(rows.length == 5, "five order priorities")
    val nDays = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    rows.foreach { r =>
      assert(r.getLong(1) == nDays, "spine covers every day per priority")
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        "observed + filled + leading must partition the spine")
      assert(r.getLong(2) > 0, "each priority has observations")
    }
  }

  test("new-vs-returning: day one is all new, totals reconcile") {
    val rows = Behavior.qNewVsReturning(spark, sf).collect()
    assert(rows.nonEmpty)
    val first = rows.head
    assert(first.getLong(1) == first.getLong(2),
      "every active user on the first day is new")
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        "active = new + returning")
    }
    // each user is new exactly once → new-counts sum to the user base
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == users)
  }

  test("funnel paths cover the user base with <=3 stages each") {
    val rows = Behavior.qFunnelPaths(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stages = r.getString(0).split(">")
      assert(stages.length >= 1 && stages.length <= 3)
      val types = Set("view", "click", "purchase", "signup", "error")
      stages.foreach(st => assert(types.contains(st), s"bad stage $st"))
    }
    // top-15 truncation: counted users never exceed the base
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum <= users)
  }

  test("masked export: pseudonyms collision-free, buckets generalize") {
    val rows = Warehouse.qMaskedExport(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1),
        "pseudonym hash must stay collision-free per nation")
      assert(r.getLong(3) % 1000 == 0 && r.getLong(4) % 1000 == 0,
        "buckets must be generalized to 1000s")
    }
    val total = Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("dq rules report consistent counts and a firing ship-order rule") {
    val rows = Warehouse.qDqRules(spark, sf).collect()
    assert(rows.length == 5)
    val byId = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    byId.foreach { case (id, (checked, viol, rate)) =>
      assert(viol >= 0 && viol <= checked, s"$id counts inconsistent")
      assert(math.abs(rate - viol.toDouble / checked) < 1e-5)
    }
    val nLi = Tables.lineitem(spark, sf).count()
    assert(byId("lineitem_qty_leq_45")._1 == nLi)
    assert(byId("lineitem_orphan")._2 == 0L,
      "synthetic data has no orphan lineitems")
    assert(byId("lineitem_ship_after_order")._2 > 0L,
      "synthetic data ships before order date — rule must fire")
  }

  test("fuzzy join pairs stay within blocks and within distance") {
    val rows = Warehouse.qFuzzyJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "pairs must be ordered a<b")
      assert(a.split(" ")(1) == b.split(" ")(1),
        s"pair ($a,$b) crosses blocking key")
      val dist = r.getInt(2)
      assert(dist >= 1 && dist <= 4)
    }
  }

  test("int8 quantization error is bounded by half a step per dim") {
    val rows = graft.ops.PipelineQueries.embedInt8Quant(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val lo = r.getDouble(r.fieldIndex("lo"))
      val hi = r.getDouble(r.fieldIndex("hi"))
      assert(lo < hi)
      val halfStep = (hi - lo) / 255 / 2
      val maxErr = r.getDouble(r.fieldIndex("max_abs_err"))
      // rounding to the nearest code can never miss by more than step/2
      // (+5e-7: max_abs_err is display-rounded to 6 dp and can tick up)
      assert(maxErr <= halfStep + 5e-7,
        s"dim ${r.getLong(0)}: err $maxErr exceeds half-step $halfStep")
    }
  }

  test("event pattern matches a brute-force timeline scan") {
    val got = Behavior.qEventPattern(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // independent formulation: a literal per-user sequential scan with
    // the same latest-anchor semantics (latest qualifying click wins;
    // ties on click ts resolved toward the larger view gap, mirroring
    // the gap-encoded max)
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).flatMap { case (uid, es) =>
      val tl = es.sortBy(e => (e._4, e._2))
      var lastView = Option.empty[Long]
      var best = Option.empty[(Long, Long)] // (clickTs, gap)
      val hits = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      tl.foreach { case (_, _, typ, ts) =>
        typ match {
          case "view" => lastView = Some(ts)
          case "click" => lastView.foreach { v =>
            if (ts <= v + 86400) {
              val cand = (ts, ts - v)
              if (best.forall(b => Ordering[(Long, Long)].lt(b, cand)))
                best = Some(cand)
            }
          }
          case "purchase" => best.foreach { case (cts, gap) =>
            if (ts >= cts && ts <= cts + 86400) hits += ((ts, ts - (cts - gap)))
          }
          case _ => ()
        }
      }
      if (hits.isEmpty) None
      else Some((uid, hits.size.toLong, hits.map(_._1).min,
        hits.map(_._2).min, hits.map(_._2).max))
    }.toSeq.sortBy(_._1)
    assert(got.nonEmpty, "pattern should match at least one user")
    assert(got == expected, "window-pass result diverges from the scan")
  }

  test("absence pattern matches a brute-force timeline scan") {
    val got = Behavior.qEventPatternAbsence(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).flatMap { case (uid, es) =>
      val tl = es.sortBy(e => (e._4, e._2))
      var lastView = Option.empty[Long]
      var lastClick = Option.empty[Long]
      var nP = 0L
      val organics = scala.collection.mutable.ArrayBuffer[Long]()
      tl.foreach { case (_, _, typ, ts) =>
        typ match {
          case "view" => lastView = Some(ts)
          case "click" => lastClick = Some(ts)
          case "purchase" =>
            nP += 1
            val organic = lastView.exists(v => ts - v <= 86400L) &&
              lastClick.forall(c => ts - c > 86400L)
            if (organic) organics += ts
          case _ => ()
        }
      }
      if (nP == 0) None
      else Some((uid, nP, organics.size.toLong,
        if (organics.isEmpty) -1L else organics.min))
    }.toSeq.sortBy(_._1)
    assert(got == expected, "absence scan diverged")
    assert(got.exists(_._3 > 0) && got.exists(t => t._2 > t._3),
      "want both organic and campaign-influenced purchases present")
  }
}
