package graft

import org.apache.spark.sql.functions._

import graft.ops.Mining
import graft.sources.Tables

/** Semantic invariants for the mining/segmentation family — each
  * checked against an independent formulation so a defect can't hide
  * behind the DuckDB oracle sharing the clever shape. */
class MiningSpec extends SparkSuite {

  test("rfm cells partition the customer base, scores stay in 1..4") {
    val cells = Mining.qRfm(spark, sf).collect()
    val total = cells.map(_.getLong(3)).sum
    val nCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(total == nCust, s"RFM cells cover $total of $nCust customers")
    cells.foreach { r =>
      Seq(0, 1, 2).foreach { i =>
        val sc = r.getLong(i)
        assert(sc >= 1 && sc <= 4, s"score out of range: $sc")
      }
    }
  }

  test("ols trend line passes through the mean point per group") {
    val monthly = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"),
        ((year(col("l_shipdate")) - 1992) * 12 + month(col("l_shipdate")) - 1)
          .cast("double").as("x"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .groupBy(col("l_returnflag"))
      .agg(avg(col("x")).as("mean_x"), avg(col("revenue")).as("mean_y"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    Mining.qLinregTrend(spark, sf).collect().foreach { r =>
      val (mx, my) = monthly(r.getString(0))
      val fit = r.getDouble(3) + r.getDouble(2) * mx
      assert(math.abs(fit - my) < math.abs(my) * 1e-3 + 1.0,
        s"OLS line misses the mean point: $fit vs $my")
    }
  }

  test("markov transition probabilities are row-stochastic") {
    val rows = Mining.qMarkovChain(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 0.01,
        s"P(·|$src) sums to $total")
    }
    val nTransitions = rows.map(_.getLong(2)).sum
    val ev = Tables.events(spark, sf)
    val expected = ev.count() -
      ev.select(col("user_id")).distinct().count()
    assert(nTransitions == expected,
      s"transition mass $nTransitions != events - users $expected")
  }

  test("mad audit: outliers are a minority and the fence is positive") {
    val rows = Mining.qAnomalyMad(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_rows"))
      val out = r.getLong(r.fieldIndex("n_outliers"))
      assert(r.getDouble(r.fieldIndex("mad")) > 0)
      assert(out < n / 4, s"MAD outliers not a minority: $out of $n")
    }
  }

  test("mad audit approx path tracks the exact path (scale flag-flip)") {
    val exact = Mining.qAnomalyMad(spark, sf, approx = false).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Mining.qAnomalyMad(spark, sf, approx = true).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val e = exact(r.getString(0))
      assert(r.getLong(r.fieldIndex("n_rows")) ==
        e.getLong(e.fieldIndex("n_rows")))
      val (em, am) = (e.getDouble(e.fieldIndex("med")),
        r.getDouble(r.fieldIndex("med")))
      assert(math.abs(am - em) <= math.abs(em) * 0.01 + 1.0,
        s"approx median $am far from exact $em")
      assert(r.getDouble(r.fieldIndex("mad")) > 0)
    }
  }

  test("quantile hist approx reference path tracks exact percentiles") {
    val exact = Mining.qQuantileHist(spark, sf, approx = false).collect()
      .map(r => r.getString(0) -> r).toMap
    Mining.qQuantileHist(spark, sf, approx = true).collect().foreach { r =>
      val e = exact(r.getString(0))
      val (ep50, ap50) = (e.getDouble(e.fieldIndex("exact_p50")),
        r.getDouble(r.fieldIndex("exact_p50")))
      assert(math.abs(ap50 - ep50) <= math.abs(ep50) * 0.01 + 1.0,
        s"approx p50 $ap50 far from exact $ep50")
      val (ep99, ap99) = (e.getDouble(e.fieldIndex("exact_p99")),
        r.getDouble(r.fieldIndex("exact_p99")))
      assert(math.abs(ap99 - ep99) <= math.abs(ep99) * 0.02 + 1.0,
        s"approx p99 $ap99 far from exact $ep99")
    }
  }

  test("gini stays in [0,1) and covers every nation with customers") {
    val rows = Mining.qGini(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getDouble(r.fieldIndex("gini"))
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $g")
    }
  }

  test("item cosine scores are in (0,1] and pairs are ordered") {
    val rows = Mining.qItemCosine(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not ordered a<b")
      val c = r.getDouble(3)
      assert(c > 0.0 && c <= 1.0, s"cosine out of range: $c")
    }
  }

  test("connected components are disjoint and account for every node") {
    val comps = Mining.qConnectedComponents(spark, sf).collect()
    assert(comps.nonEmpty)
    comps.foreach(r => assert(r.getLong(1) >= 2,
      "an edge-connected component needs >= 2 members"))
    // independent node count: every endpoint of a weight>=2 edge
    val sparse = Tables.part(spark, sf).filter(col("p_size") <= 3)
      .select(col("p_partkey"))
    val ls = Tables.lineitem(spark, sf)
      .join(sparse, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = ls.as("x").join(ls.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
    val nodes = e.select(col("a").as("v")).union(e.select(col("b")))
      .distinct().count()
    if (comps.length < 20)
      assert(comps.map(_.getLong(1)).sum == nodes,
        "component sizes must partition the node set")
  }

  test("kmeans assigns every vector to one of k clusters") {
    val rows = Mining.qKmeans(spark, sf).collect()
    assert(rows.length <= 8)
    val members = rows.map(_.getLong(1)).sum
    assert(members == Tables.embeddings(spark, sf).count(),
      "every vector must be assigned exactly once")
    rows.foreach { r =>
      val c = r.getDouble(r.fieldIndex("avg_cos"))
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("pca power iteration yields a unit vector and positive variance") {
    val rows = Mining.qPcaPower(spark, sf).collect()
    assert(rows.length == 64)
    val norm = math.sqrt(rows.map(r => {
      val l = r.getDouble(1); l * l
    }).sum)
    assert(math.abs(norm - 1.0) < 0.01, s"loading norm $norm != 1")
    assert(rows.head.getDouble(2) > 0.0, "top eigenvalue must be positive")
  }

  test("histogram quantile estimate brackets the exact value") {
    Mining.qQuantileHist(spark, sf).collect().foreach { r =>
      val (mn, mx) = (r.getDouble(2), r.getDouble(4))
      val span = (mx - mn).abs + 1.0
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < span * 0.05,
        s"p50 estimate ${r.getDouble(2)} far from exact ${r.getDouble(3)}")
      assert(r.getDouble(4) >= r.getDouble(2),
        "p99 estimate below p50 estimate")
    }
  }

  test("phash near-dup pairs have verified hamming distance <= 3") {
    val rows = graft.ops.PipelineQueries.multimodalPhashDedup(spark, sf)
      .collect()
    rows.foreach { r =>
      val h = r.getLong(2)
      assert(h >= 0 && h <= 3, s"unverified hamming $h")
      assert(r.getLong(0) < r.getLong(1))
    }
  }

  test("bootstrap CI brackets the exact mean with positive spread") {
    val rows = Mining.qBootstrapCi(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_resamples")) == 32)
      val (exact, lo, hi) = (r.getDouble(r.fieldIndex("mean_exact")),
        r.getDouble(r.fieldIndex("ci_lo")), r.getDouble(r.fieldIndex("ci_hi")))
      assert(r.getDouble(r.fieldIndex("boot_se")) > 0.0)
      assert(lo < exact && exact < hi,
        s"exact mean $exact outside bootstrap CI [$lo, $hi]")
    }
  }

  test("windowed funnel attrites monotonically") {
    val r = Mining.qFunnelWindow(spark, sf).head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v >= $c >= $p")
    assert(v > 0)
  }

  test("streaming histogram converges to the batch histogram") {
    val streamed = graft.streaming.Events.streamHistogram(spark, sf)
      .collect().toSeq
    val batch = Tables.events(spark, sf)
      .withColumn("bin",
        least(floor(col("value") / 30.0), lit(19.0)).cast("long"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"), col("bin"))
      .collect().toSeq
    assert(streamed == batch)
  }

  test("streaming top-k converges to the batch leaderboard") {
    val streamed = graft.streaming.Events.streamTopK(spark, sf)
      .collect().toSeq
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val batch = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("event_type"), col("rnk"), col("event_id"),
        round(col("value"), 2).as("value"))
      .orderBy(col("event_type"), col("rnk"))
      .collect().toSeq
    assert(streamed == batch,
      "state-maintained top-k must equal the batch top-k")
  }

  test("streaming anomaly equals the batch running-stats replay") {
    import org.apache.spark.sql.expressions.Window
    val streamed = graft.streaming.Events.streamAnomaly(spark, sf)
      .collect().toSeq
    val win = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val e = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"), col("value"))
    val batch = e
      .withColumn("n_prior", count(lit(1)).over(win))
      .withColumn("mean", sum(col("value")).over(win) / col("n_prior"))
      .withColumn("sd", sqrt(greatest(
        sum(col("value") * col("value")).over(win) / col("n_prior") -
          col("mean") * col("mean"), lit(0.0))))
      .filter(col("n_prior") >= 30 && col("sd") > 0 &&
        abs(col("value") - col("mean")) > lit(3) * col("sd"))
      .select(col("event_type"), col("event_id"), col("value"),
        round((col("value") - col("mean")) / col("sd"), 4).as("zscore"))
      .orderBy(col("event_type"), col("event_id"))
      .collect().toSeq
    assert(streamed.length == batch.length,
      s"streamed ${streamed.length} flags vs batch ${batch.length}")
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getString(0) == b.getString(0) &&
        s.getLong(1) == b.getLong(1), s"flag mismatch: $s vs $b")
      assert(math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-3)
    }
  }

  test("mutual information is non-negative and chi2 has sane dof scale") {
    val r = Mining.qMutualInfo(spark, sf).head()
    val mi = r.getDouble(r.fieldIndex("mi_bits"))
    assert(mi >= 0.0, s"MI must be non-negative: $mi")
    assert(r.getDouble(r.fieldIndex("chi2")) >= 0.0)
    assert(r.getLong(r.fieldIndex("n_cells")) <= 24 * 10)
  }

  test("scd2 lookup conserves purchases with a dimension version") {
    val rows = graft.ops.Warehouse.qScd2Lookup(spark, sf).collect()
    assert(rows.nonEmpty)
    val attributed = rows.map(_.getLong(1)).sum
    // every purchase strictly after its user's first non-purchase event
    // falls inside exactly one version interval
    val ev = Tables.events(spark, sf).filter(col("user_id") < 10)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
    val firstDim = ev.filter(col("event_type") =!= "purchase")
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t0"))
    val expected = ev.filter(col("event_type") === "purchase")
      .join(firstDim, "user_id")
      .filter(col("ts_s") >= col("t0")).count()
    assert(attributed == expected,
      s"scd2 lookup attributed $attributed of $expected purchases")
  }

  test("zipf probe: slope non-positive, r2 in range, flags this corpus") {
    val r = graft.ops.PipelineQueries.textZipfSlope(spark, sf).head()
    val slope = r.getDouble(r.fieldIndex("zipf_slope"))
    val r2 = r.getDouble(r.fieldIndex("fit_r2"))
    // ranks ordered by descending frequency ⇒ slope can never be > 0
    assert(slope <= 0.0, s"zipf slope must be non-positive: $slope")
    assert(r2 >= 0.0 && r2 <= 1.0)
    // the synthetic corpus has a near-uniform vocabulary — a healthy
    // natural corpus sits near slope −1 with high r2; the probe's JOB
    // is to read this one as non-Zipfian (flat slope, weak fit)
    assert(slope > -0.5 && r2 < 0.5,
      s"synthetic corpus should read non-Zipfian, got slope=$slope r2=$r2")
    assert(r.getLong(r.fieldIndex("vocab_size")) > 10)
  }

  test("label propagation covers every node and respects community size") {
    val comms = Mining.qLabelProp(spark, sf).collect()
    assert(comms.nonEmpty)
    // labels only ever move along edges, so every final label must be
    // a node id of the w>=1 graph — check against an independent build
    val sparse = Tables.part(spark, sf).filter(col("p_size") <= 3)
      .select(col("p_partkey"))
    val ls = Tables.lineitem(spark, sf)
      .join(sparse, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nodeSet = ls.select(col("l_partkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    comms.foreach { r =>
      assert(nodeSet.contains(r.getLong(0)),
        s"community label ${r.getLong(0)} is not a graph node")
      assert(r.getLong(1) >= 1)
    }
    // sizes are sorted descending (total order contract)
    val sizes = comms.map(_.getLong(1)).toSeq
    assert(sizes == sizes.sortBy(-_), "sizes must be non-increasing")
  }

  test("bfs hop profile is a valid frontier expansion") {
    val rows = Mining.qBfsHops(spark, sf).collect()
    assert(rows.nonEmpty)
    val hops = rows.map(_.getInt(0)).toSeq
    assert(hops == hops.sorted && hops.head == 0, "hops start at 0, sorted")
    assert(rows.head.getLong(1) == 1, "exactly one source at hop 0")
    // hop h frontier can never exceed sum of previous frontiers × max
    // degree, but a cheap sanity: all frontiers non-empty and min<=max
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getLong(2) <= r.getLong(3))
    }
  }

  test("graph jaccard is a valid similarity on real edges") {
    val rows = Mining.qGraphJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (common, degA, degB) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      val j = r.getDouble(r.fieldIndex("jaccard"))
      assert(r.getLong(0) < r.getLong(1), "edge not ordered a<b")
      assert(common <= math.min(degA, degB),
        "common neighbors bounded by the smaller degree")
      assert(j >= 0.0 && j <= 1.0)
      // both endpoints of an edge see each other, so degrees >= 1
      assert(degA >= 1 && degB >= 1)
    }
  }

  test("ab z-test: counts partition users, z matches a direct recompute") {
    val r = Mining.qAbZtest(spark, sf).head()
    val nA = r.getLong(r.fieldIndex("n_a"))
    val nB = r.getLong(r.fieldIndex("n_b"))
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(nA + nB == users, "variants must partition the user base")
    val pA = r.getDouble(r.fieldIndex("p_a"))
    val pB = r.getDouble(r.fieldIndex("p_b"))
    val pp = r.getDouble(r.fieldIndex("p_pool"))
    val z = (pA - pB) / math.sqrt(pp * (1 - pp) * (1.0 / nA + 1.0 / nB))
    assert(math.abs(r.getDouble(r.fieldIndex("z_score")) - z) < 1e-3,
      "z-score must match the scalar recompute")
  }

  test("json malformed triage quarantines exactly the torn lines") {
    val r = graft.sources.Formats.jsonMalformed(spark, sf).head()
    val expectedBad = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 10 === 0).count()
    assert(r.getLong(r.fieldIndex("n_corrupt")) == expectedBad)
    assert(r.getLong(r.fieldIndex("n_good")) +
      r.getLong(r.fieldIndex("n_corrupt")) ==
      r.getLong(r.fieldIndex("n_rows")))
  }

  test("filtered ann returns only same-label neighbors, k per query") {
    val rows = graft.ops.PipelineQueries.annFilteredTopK(spark, sf)
      .collect()
    val labels = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10)
      .collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    assert(rows.length == labels.size * 5, "exactly k rows per query")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("label")) ==
        labels(r.getLong(r.fieldIndex("q_id"))),
        "neighbor escaped the label filter")
    }
  }

  test("embedding norms are positive with ordered percentiles") {
    val rows = graft.ops.PipelineQueries.embedNormStats(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(4), "p50 <= p95")
      assert(r.getLong(5) == 0, "synthetic corpus has no zero vectors")
      assert(r.getDouble(2) > 0)
    }
  }

  test("passage dedup: totals cover the corpus, dups bounded by totals") {
    val rows = graft.ops.PipelineQueries.dedupPassage(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) < r.getLong(1),
        "every source keeps at least one first-occurrence passage")
    }
    // passage count = sum over docs of ceil(tokens/10)
    val expected = Tables.documents(spark, sf)
      .select(ceil(size(split(col("text"), " ")) / 10.0).cast("long")
        .as("np"))
      .agg(sum(col("np"))).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == expected)
  }

  test("abc classes partition parts and shares sum to one, A top-heavy") {
    val rows = Mining.qAbcClass(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    val nParts = Tables.lineitem(spark, sf)
      .select(col("l_partkey")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nParts)
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
    val byCls = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(3))).toMap
    // A carries ~70% of revenue with far fewer parts than its share
    assert(byCls("A")._2 >= 0.65 && byCls("A")._2 <= 0.75)
    assert(byCls("A")._1.toDouble / nParts < byCls("A")._2,
      "A must be revenue-denser than its SKU count")
  }

  test("spearman rho is bounded and matches a driver-side recompute") {
    val r = Mining.qSpearman(spark, sf).head()
    val rho = r.getDouble(1)
    assert(rho >= -1.0 && rho <= 1.0)
    // independent recompute from collected ranks (n is small at test SF)
    val per = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_acctbal")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey"), col("c_acctbal"), col("rev"))
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
    val rBal = per.sortBy(p => (p._2, p._1)).zipWithIndex
      .map { case (p, i) => p._1 -> (i + 1.0) }.toMap
    val rRev = per.sortBy(p => (p._3, p._1)).zipWithIndex
      .map { case (p, i) => p._1 -> (i + 1.0) }.toMap
    val n = per.length
    val d2 = per.map(p => math.pow(rBal(p._1) - rRev(p._1), 2)).sum
    val rhoRef = 1.0 - 6.0 * d2 / (n * (n * n - 1.0))
    assert(math.abs(rho - rhoRef) < 1e-3,
      s"spearman $rho vs closed-form $rhoRef")
  }

  test("rank movers deltas match the rank columns and sort by magnitude") {
    val rows = Mining.qRankMovers(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getInt(5) == r.getInt(1) - r.getInt(3),
        "delta must equal rank_1996 - rank_1997")
    }
    val mags = rows.map(r => math.abs(r.getInt(5)))
    assert(mags.toSeq == mags.sortBy(-(_: Int)).toSeq)
  }

  test("k-core peeling shrinks monotonically and 2-core nodes have deg>=2") {
    val rows = Mining.qKcore(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val nodes = rows.map(_.getLong(1)).toSeq
    val edges = rows.map(_.getLong(2)).toSeq
    assert(nodes == nodes.sorted.reverse, "node count never grows")
    assert(edges == edges.sorted.reverse, "edge count never grows")
    // every surviving node has >= 2 surviving-edge endpoints, so a
    // 2-core with n nodes needs at least n edges (cycle lower bound)
    assert(edges.last >= nodes.last, "2-core must satisfy |E| >= |V|")
  }

  test("ks statistic bounded in [0,1] and crit value matches formula") {
    val r = Mining.qKsTest(spark, sf).head()
    val d = r.getDouble(r.fieldIndex("ks_d"))
    assert(d >= 0.0 && d <= 1.0)
    val (np, nc) = (r.getLong(0), r.getLong(1))
    val crit = 1.358 * math.sqrt((np + nc).toDouble / (np.toDouble * nc))
    assert(math.abs(r.getDouble(r.fieldIndex("d_crit")) - crit) < 1e-3)
    assert(r.getBoolean(r.fieldIndex("significant")) == (d >
      r.getDouble(r.fieldIndex("d_crit"))))
  }

  test("skyline points are mutually non-dominated and dominate the rest") {
    val sky = Mining.qSkyline(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getDate(1).toLocalDate))
    assert(sky.nonEmpty)
    // pairwise non-domination within the frontier
    for (a <- sky; b <- sky if a != b)
      assert(!(b._1 >= a._1 && !b._2.isBefore(a._2) &&
        (b._1 > a._1 || b._2.isAfter(a._2))),
        s"$b dominates $a inside the skyline")
    // every non-skyline customer point is dominated by some skyline point
    val all = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"),
        max(to_date(col("o_orderdate"))).as("d"))
      .collect().map(r => (r.getDouble(1), r.getDate(2).toLocalDate))
    val skySet = sky.toSet
    all.filterNot(skySet.contains).take(200).foreach { p =>
      assert(sky.exists(s => s._1 >= p._1 && !s._2.isBefore(p._2) &&
        (s._1 > p._1 || s._2.isAfter(p._2))),
        s"$p is undominated but missing from the skyline")
    }
  }

  test("pareto summary is internally consistent and top-heavy") {
    val r = Mining.qPowerUsersPareto(spark, sf).head()
    val n = r.getLong(r.fieldIndex("n_customers"))
    val n80 = r.getInt(r.fieldIndex("n_for_80pct"))
    assert(n80 >= 1 && n80 <= n)
    val pct80 = r.getDouble(r.fieldIndex("pct_for_80pct"))
    assert(math.abs(pct80 - n80.toDouble / n) < 1e-3)
    val topShare = r.getDouble(r.fieldIndex("top_decile_share"))
    // customers are ranked by revenue desc, so the top decile must hold
    // at least its proportional share
    assert(topShare >= 0.1 - 1e-9 && topShare <= 1.0)
  }

  test("2d histogram partitions the fact table into the 10x10 grid") {
    val rows = graft.ops.Analytics.qHistogram2d(spark, sf).collect()
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 9 &&
      r.getInt(1) >= 0 && r.getInt(1) <= 9))
    assert(rows.map(_.getLong(2)).sum ==
      Tables.lineitem(spark, sf).count(),
      "every line item lands in exactly one cell")
  }

  test("benford audit covers all nine digits and sums to one") {
    val rows = Mining.qBenfordAudit(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    val n = rows.map(_.getLong(1)).sum
    assert(n == Tables.lineitem(spark, sf).count(),
      "every line item lands in exactly one digit bucket")
    val obs = rows.map(r => r.getDouble(r.fieldIndex("obs_pct"))).sum
    assert(math.abs(obs - 1.0) < 1e-4)
    val ben = rows.map(r => r.getDouble(r.fieldIndex("benford_pct"))).sum
    assert(math.abs(ben - 1.0) < 1e-4)
    val chi2 = rows.head.getDouble(rows.head.fieldIndex("chi2"))
    assert(chi2 > 0 && rows.forall(
      r => r.getDouble(r.fieldIndex("chi2")) == chi2),
      "chi2 is one corpus-level statistic repeated per row")
  }

  test("malformed csv triage quarantines exactly the bad lines") {
    val r = graft.sources.Formats.csvMalformed(spark, sf).head()
    val expectedBad = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 10 === 0).count()
    assert(r.getLong(r.fieldIndex("n_corrupt")) == expectedBad)
    assert(r.getLong(r.fieldIndex("n_good")) +
      r.getLong(r.fieldIndex("n_corrupt")) ==
      r.getLong(r.fieldIndex("n_rows")))
    assert(!r.isNullAt(r.fieldIndex("clean_revenue")))
  }

  test("range-partitioned rank and ntile are bit-identical to windows") {
    import org.apache.spark.sql.expressions.Window
    val per = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("f"),
        round(sum(col("o_totalprice")), 2).as("m"))
    val order = Seq(col("m").asc, col("o_custkey").asc)
    val w = Window.orderBy(col("m"), col("o_custkey"))
    val rnA = graft.ops.Ranks.globalRowNumber(per, order, "rn")
      .select(col("o_custkey"), col("rn"))
    val rnB = per.withColumn("rn", row_number().over(w).cast("long"))
      .select(col("o_custkey"), col("rn"))
    assert(rnA.exceptAll(rnB).isEmpty && rnB.exceptAll(rnA).isEmpty,
      "globalRowNumber diverged from row_number")
    // k=4 and a k that does NOT divide N (remainder buckets get +1)
    val n = per.count()
    Seq(4, 7).foreach { k =>
      val viaRanks = graft.ops.Ranks.globalNtile(per, order, k, "s")
        .select(col("o_custkey"), col("s"))
      val viaWindow = per.withColumn("s", ntile(k).over(w).cast("long"))
        .select(col("o_custkey"), col("s"))
      assert(viaRanks.exceptAll(viaWindow).isEmpty &&
        viaWindow.exceptAll(viaRanks).isEmpty,
        s"globalNtile($k) diverged from ntile over $n rows")
    }
    assert(n % 4 != 0 || n % 7 != 0,
      "want at least one remainder case to exercise uneven buckets")
    // per-group variant against the partitioned window ntile
    val o = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
    val gw = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val gA = graft.ops.Ranks.groupNtile(o, Seq(col("o_orderstatus")),
        Seq(col("o_totalprice"), col("o_orderkey")), 4, "s")
      .select(col("o_orderkey"), col("s"))
    val gB = o.withColumn("s", ntile(4).over(gw).cast("long"))
      .select(col("o_orderkey"), col("s"))
    assert(gA.exceptAll(gB).isEmpty && gB.exceptAll(gA).isEmpty,
      "groupNtile diverged from the partitioned window ntile")
  }

  test("ranged running sum equals the sequential window cumsum") {
    import org.apache.spark.sql.expressions.Window
    val per = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      .withColumn("cents", round(col("rev") * 100, 0).cast("long"))
    val order = Seq(col("cents").desc, col("o_custkey").asc)
    val viaRanks = graft.ops.Ranks.globalRunningSum(per, order,
        col("cents"), "cum")
      .select(col("o_custkey"), col("cum"))
    val w = Window.orderBy(col("cents").desc, col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = per.withColumn("cum", sum(col("cents")).over(w))
      .select(col("o_custkey"), col("cum"))
    assert(viaRanks.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaRanks).isEmpty,
      "parallel long cumsum diverged from the sequential window")
  }

  test("weighted sssp equals an in-memory 3-round bellman-ford") {
    val got = Mining.qSsspWeighted(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the same weighted co-purchase graph independently
    val sparse = Tables.part(spark, sf).filter(col("p_size") <= 3)
      .select(col("p_partkey"))
    val ls = Tables.lineitem(spark, sf)
      .join(sparse, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = ls.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case ((a, b), g) => (a, b, g.size.toLong) }
    val adj = edges.flatMap { case (a, b, w) => Seq((a, (b, w)), (b, (a, w))) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val hub = adj.toSeq.map { case (id, ns) => (id, ns.size) }
      .sortBy { case (id, deg) => (-deg, id) }.head._1
    var dist = Map(hub -> 0L)
    for (_ <- 1 to 3) {
      val relaxed = dist.toSeq.flatMap { case (u, c) =>
        adj.getOrElse(u, Nil).map { case (v, w) => (v, c + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
    }
    assert(got == dist,
      s"sssp diverged: got ${got.size} rows, expected ${dist.size}")
  }

  test("inventory balance closed form equals the max(0,prev+net) recurrence") {
    val got = Mining.qInventoryBalance(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val mv = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"), to_date(col("l_shipdate")).as("day"))
      .agg(sum(when(col("l_returnflag").isin("A", "R"), col("l_quantity"))
        .otherwise(-col("l_quantity"))).cast("long").as("net"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getLong(2)))
      .groupBy(_._1)
    assert(got.keySet == mv.keySet)
    mv.foreach { case (pk, rows) =>
      var bal = 0L; var peak = 0L; var zero = 0L
      rows.sortBy(_._2.toEpochDay).foreach { case (_, _, net) =>
        bal = math.max(0L, bal + net)
        peak = math.max(peak, bal)
        if (bal == 0L) zero += 1
      }
      val (nDays, gotPeak, gotEnd, gotZero) = got(pk)
      assert(nDays == rows.size && gotPeak == peak && gotEnd == bal &&
        gotZero == zero,
        s"part $pk: got ${got(pk)}, expected (${rows.size},$peak,$bal,$zero)")
    }
  }

  test("mann-whitney U agrees with a brute-force rank computation") {
    val r = Mining.qMannWhitney(spark, sf).head()
    val vals = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "click") &&
        col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val sorted = vals.sortBy(_._2)
    // average ranks with ties, brute force
    val rankOf = sorted.zipWithIndex.groupBy(_._1._2)
      .map { case (v, grp) =>
        v -> grp.map(_._2 + 1).sum.toDouble / grp.length }
    val r1 = sorted.filter(_._1 == "purchase").map(x => rankOf(x._2)).sum
    val n1 = vals.count(_._1 == "purchase")
    val n2 = vals.count(_._1 == "click")
    val u1 = r1 - n1.toDouble * (n1 + 1) / 2
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(math.abs(r.getDouble(r.fieldIndex("u_stat")) - u1) < 1e-6,
      s"U ${r.getDouble(r.fieldIndex("u_stat"))} vs brute $u1")
    val z = r.getDouble(r.fieldIndex("z_score"))
    assert(r.getBoolean(r.fieldIndex("significant")) ==
      (math.abs(z) >= 1.96))
  }

  test("cohort ltv is monotone per cohort and totals match revenue") {
    val rows = Mining.qCohortLtv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { cohort =>
      val ltv = cohort.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a - 1e-9 },
        "cumulative LTV must be non-decreasing within a cohort")
    }
    // sum over cells of per-cell revenue equals total order revenue
    val cellRev = rows.map(_.getDouble(2)).sum
    val total = Tables.orders(spark, sf)
      .agg(round(sum(col("o_totalprice")), 2)).head().getDouble(0)
    assert(math.abs(cellRev - total) < 1.0,
      s"cell revenue $cellRev vs orders total $total")
  }

  test("chi-square cells cover all events; expected margins match observed") {
    val rows = Mining.qChiSquare(spark, sf).collect()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n"))).sum ==
      Tables.events(spark, sf).count(),
      "every event lands in exactly one contingency cell")
    // expected counts reproduce the observed margins (within rounding)
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { cells =>
      val obs = cells.map(_.getLong(cells.head.fieldIndex("n"))).sum
      val exp = cells.map(_.getDouble(cells.head.fieldIndex("expected"))).sum
      assert(math.abs(obs - exp) < 0.01, s"row margin drift: $obs vs $exp")
    }
    val chi2 = rows.head.getDouble(rows.head.fieldIndex("chi2"))
    assert(chi2 >= 0 &&
      rows.forall(r => r.getDouble(r.fieldIndex("chi2")) == chi2))
    val df = rows.head.getLong(rows.head.fieldIndex("df"))
    assert(df == (byType.size - 1) *
      (rows.map(_.getBoolean(1)).distinct.length - 1))
  }

  test("welch t-test agrees with an independent stats computation") {
    val r = Mining.qWelchTtest(spark, sf).head()
    val vals = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), col("value")).collect()
      .map(x => (x.getLong(0) % 2 == 0, x.getDouble(1)))
    val (a, b) = vals.partition(_._1)
    assert(r.getLong(r.fieldIndex("n_a")) == a.length &&
      r.getLong(r.fieldIndex("n_b")) == b.length)
    def mv(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => x * x).sum / xs.length - m * m)
    }
    val (ma, va) = mv(a.map(_._2)); val (mb, vb) = mv(b.map(_._2))
    assert(math.abs(r.getDouble(r.fieldIndex("mean_a")) - ma) < 1e-3)
    assert(math.abs(r.getDouble(r.fieldIndex("mean_b")) - mb) < 1e-3)
    val se2 = va / a.length + vb / b.length
    val t = (ma - mb) / math.sqrt(se2)
    assert(math.abs(r.getDouble(r.fieldIndex("t_stat")) - t) < 1e-2)
    val dfW = se2 * se2 / (math.pow(va / a.length, 2) / (a.length - 1) +
      math.pow(vb / b.length, 2) / (b.length - 1))
    assert(math.abs(r.getDouble(r.fieldIndex("df_welch")) - dfW) < 1.0)
    assert(r.getBoolean(r.fieldIndex("significant")) ==
      (math.abs(r.getDouble(r.fieldIndex("t_stat"))) >= 1.96))
  }

  test("kaplan-meier curve is monotone and matches a direct estimator") {
    val rows = Mining.qSurvivalKm(spark, sf).collect()
    assert(rows.nonEmpty)
    val km = rows.map(_.getDouble(rows.head.fieldIndex("km_survival")))
    assert(km.zip(km.tail).forall { case (p, n) => n <= p + 1e-9 },
      "survival must be non-increasing")
    assert(km.forall(s => s >= 0.0 && s <= 1.0))
    // at-risk counts strictly decrease along the ordered risk table
    val atRisk = rows.map(_.getLong(rows.head.fieldIndex("at_risk")))
    assert(atRisk.zip(atRisk.tail).forall { case (p, n) => n < p })
    // direct product-limit estimate at the last event time
    val direct = rows.foldLeft(1.0) { (acc, r) =>
      acc * (1.0 - r.getLong(r.fieldIndex("d_events")).toDouble /
        r.getLong(r.fieldIndex("at_risk")))
    }
    assert(math.abs(km.last - direct) < 1e-3,
      s"km tail ${km.last} vs direct $direct")
  }

  test("elasticity slope matches a hand-rolled per-brand OLS") {
    val rows = Mining.qElasticity(spark, sf).collect()
    assert(rows.nonEmpty)
    val pts = Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        round(log(lit(1.0) - col("l_discount")), 6).as("x"),
        round(log(col("l_quantity")), 6).as("y"))
      .join(Tables.part(spark, sf)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("x"), col("y")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    rows.take(5).foreach { r =>
      val g = pts(r.getString(0))
      val n = g.length.toDouble
      val (sx, sy) = (g.map(_._2).sum, g.map(_._3).sum)
      val sxy = g.map(p => p._2 * p._3).sum
      val sxx = g.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getDouble(r.fieldIndex("elasticity")) - slope)
        < 1e-2, s"${r.getString(0)}: ${r.getDouble(2)} vs $slope")
      assert(r.getLong(r.fieldIndex("n_items")) == g.length)
    }
  }
}
