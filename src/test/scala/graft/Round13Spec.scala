package graft

import org.apache.spark.sql.functions._

/** Round-13 regressions: the order-statistic rewrites — q_kendall_tau
  * retired its group-quadratic pair join for the two-level value-bucket
  * dominance decomposition, and q_gini swapped its per-nation rank
  * window for Ranks.groupRowNumber. Both specs certify equality against
  * an in-JVM naive replay, independent of the DuckDB oracle.
  */
class Round13Spec extends SparkSuite {

  private def gl(r: org.apache.spark.sql.Row, i: Int): Long =
    r.get(i) match { case n: java.lang.Number => n.longValue }

  private def gd(r: org.apache.spark.sql.Row, i: Int): Double =
    if (r.isNullAt(i)) Double.NaN else r.getDouble(i)

  /** Naive O(n²) tau-b census: (n_pairs, nc, nd, tau_b) per group. */
  private def naiveTau(pts: Seq[(Long, Long, Long)])
      : Map[Long, (Long, Long, Long, Double)] =
    pts.groupBy(_._1).collect { case (g, rows) if rows.size >= 2 =>
      var nc, nd, tx, ty = 0L
      val arr = rows.toArray
      for (i <- arr.indices; j <- (i + 1) until arr.length) {
        val sx = java.lang.Long.signum(arr(i)._2 - arr(j)._2)
        val sy = java.lang.Long.signum(arr(i)._3 - arr(j)._3)
        if (sx * sy == 1) nc += 1
        else if (sx * sy == -1) nd += 1
        if (sx == 0) tx += 1
        if (sy == 0) ty += 1
      }
      val n0 = arr.length.toLong * (arr.length - 1) / 2
      val tau = math.floor((nc - nd).toDouble /
        math.sqrt(((n0 - tx) * (n0 - ty)).toDouble) * 1e6 + 0.5) / 1e6
      g -> (n0, nc, nd, tau)
    }

  test("kendall tau decomposition equals the naive pair census on sf") {
    val got = graft.ops.Mining.qKendallTau(spark, sf).collect()
      .map(r => gl(r, 0) -> (gl(r, 1), gl(r, 2), gl(r, 3), r.getDouble(4)))
      .toMap
    val spend = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val pts = graft.sources.Tables.customer(spark, sf)
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long"), col("y"))
      .collect().map(r => (gl(r, 0), gl(r, 1), gl(r, 2))).toSeq
    assert(got == naiveTau(pts), "dominance decomposition != pair census")
  }

  test("kendall decomposition survives heavy ties and tiny groups") {
    import spark.implicits._
    // adversarial lattice: many x/y ties, values straddling bucket
    // boundaries, groups of size 1 (must vanish), 2, and ~200
    val rnd = new scala.util.Random(13)
    val rows =
      (1 to 200).map(i => (0L, rnd.nextInt(7).toLong, rnd.nextInt(5).toLong)) ++
        (1 to 150).map(i => (1L, rnd.nextInt(300).toLong, rnd.nextInt(3).toLong)) ++
        Seq((2L, 5L, 5L)) ++ // singleton group: no output row
        Seq((3L, 1L, 2L), (3L, 1L, 2L)) // fully tied pair
    val df = rows.zipWithIndex
      .map { case ((g, x, y), i) => (g, i.toLong, x, y) }
      .toDF("nation", "k", "x_cents", "y_cents")
    for (b <- Seq(2, 3, 64)) {
      val got = graft.ops.Mining.kendallFromCounts(
          graft.ops.Mining.kendallDiscordant(df, b), df)
        .collect()
        .map(r => gl(r, 0) -> (gl(r, 1), gl(r, 2), gl(r, 3), gd(r, 4)))
        .toMap
      val want = naiveTau(rows.map { case (g, x, y) => (g, x, y) })
      // NaN != NaN under ==: group 3 is fully tied → denominator 0
      assert(got.keySet == want.keySet, s"B=$b row set")
      for ((g, (n0, nc, nd, tau)) <- want) {
        val (gn0, gnc, gnd, gtau) = got(g)
        assert((gn0, gnc, gnd) == (n0, nc, nd), s"B=$b group $g counts")
        assert(gtau == tau || (gtau.isNaN && tau.isNaN), s"B=$b group $g tau")
      }
    }
  }

  test("betweenness stress equals brute-force shortest-walk census") {
    // replicate the minW=1 sparse part graph in-JVM
    val sp = graft.sources.Tables.part(spark, sf)
      .filter(col("p_size") <= 3).select(col("p_partkey"))
    val ls = graft.sources.Tables.lineitem(spark, sf)
      .join(sp, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (gl(r, 0), gl(r, 1)))
    val edges: Set[(Long, Long)] = ls.groupBy(_._1).values.toSeq
      .flatMap { g =>
        val pks = g.map(_._2).toSeq
        for (a <- pks; b <- pks; if a < b) yield (a, b)
      }.toSet
    val adj: Map[Long, Seq[Long]] =
      (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val nodes = adj.keys.toSeq
    val srcs = nodes.sortBy(n => (graft.functions.Kernels.md5Lower64(
      org.apache.spark.unsafe.types.UTF8String.fromString(n.toString))
      & Long.MaxValue, n)).take(6)
    // BFS dist per source, then enumerate no-revisit walks <= 4 hops
    // that land at their endpoint's shortest distance; count interiors
    val stress = scala.collection.mutable.Map[Long, Long]()
    for (s0 <- srcs) {
      val dist = scala.collection.mutable.Map(s0 -> 0)
      var front = Seq(s0)
      for (h <- 1 to 4) {
        front = front.flatMap(adj.getOrElse(_, Nil)).distinct
          .filterNot(dist.contains)
        front.foreach(dist(_) = h)
      }
      def walk(path: List[Long]): Unit = {
        val last = path.head
        if (path.length - 1 == dist.getOrElse(last, -1) && path.length >= 3)
          path.tail.init.foreach(v => stress(v) = stress.getOrElse(v, 0L) + 1)
        if (path.length <= 4)
          adj.getOrElse(last, Nil).filterNot(path.contains)
            .foreach(n => walk(n :: path))
      }
      walk(List(s0))
    }
    val want = stress.toSeq.filter(_._2 > 0)
      .sortBy { case (n, st) => (-st, n) }.take(20)
    val got = graft.ops.Mining.qBetweennessApprox(spark, sf).collect()
      .map(r => (gl(r, 0), gl(r, 1))).toSeq
    assert(got == want, "two-pass sigma*P fold != walk enumeration")
  }

  test("bpe trainer merges equal the in-JVM greedy replay") {
    val words = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .collect().map(_.getString(0))
    val d = "\u0001"
    var vocab = words.groupBy(identity).map { case (w, g) =>
      (d + w.flatMap(c => s"$c$d"), g.length.toLong) }.toMap
    val want = (1 to 6).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, c) <- vocab) {
        val syms = w.split(d).filter(_.nonEmpty)
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      val ((a, b), n) = counts.toSeq
        .minBy { case ((a, b), n) => (-n, a, b) }
      vocab = vocab.map { case (w, c) =>
        (w.replace(d + a + d + b + d, d + a + b + d), c) }
      (r.toLong, a, b, n)
    }
    val got = graft.ops.PipelineQueries.textBpeTrain(spark, sf).collect()
      .map(r => (gl(r, 0), r.getString(1), r.getString(2), gl(r, 3))).toSeq
    assert(got == want, "distributed trainer != in-JVM greedy replay")
  }

  test("native interval-join as-of stream equals the batch formulation") {
    def key(r: org.apache.spark.sql.Row): (Long, Option[Double]) =
      (gl(r, 0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    val batch = graft.ops.Analytics.qAsofTolerance(spark, sf)
      .collect().map(key).toSeq
    val stream = graft.streaming.Events.streamAsofInterval(spark, sf)
      .collect().map(key).toSeq
    assert(stream == batch,
      "watermarked interval join diverged from the batch as-of")
  }

  test("incrementally maintained ANN index serves like the full rebuild") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (gl(r, 0), gl(r, 1), gl(r, 2), r.getDouble(3))).toSeq
    val rebuild = rows(graft.ops.PipelineQueries.annIvfPqTopK(spark, sf))
    val upsert = rows(graft.ops.PipelineQueries.annIndexUpsert(spark, sf))
    assert(upsert == rebuild,
      "base + delta + partial-rebuild index diverged from full rebuild")
  }

  test("closeness/eccentricity equals brute-force BFS distance sums") {
    val sp = graft.sources.Tables.part(spark, sf)
      .filter(col("p_size") <= 3).select(col("p_partkey"))
    val ls = graft.sources.Tables.lineitem(spark, sf)
      .join(sp, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (gl(r, 0), gl(r, 1)))
    val edges: Set[(Long, Long)] = ls.groupBy(_._1).values.toSeq
      .flatMap { g =>
        val pks = g.map(_._2).toSeq
        for (a <- pks; b <- pks; if a < b) yield (a, b)
      }.toSet
    val adj: Map[Long, Seq[Long]] =
      (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val srcs = adj.keys.toSeq.sortBy(n => (graft.functions.Kernels
      .md5Lower64(org.apache.spark.unsafe.types.UTF8String
        .fromString(n.toString)) & Long.MaxValue, n)).take(6)
    val acc = scala.collection.mutable.Map[Long, List[Long]]()
    for (s0 <- srcs) {
      val dist = scala.collection.mutable.Map(s0 -> 0L)
      var front = Seq(s0)
      for (h <- 1 to 4) {
        front = front.flatMap(adj.getOrElse(_, Nil)).distinct
          .filterNot(dist.contains)
        front.foreach(dist(_) = h.toLong)
      }
      for ((v, h) <- dist) acc(v) = h :: acc.getOrElse(v, Nil)
    }
    val want = acc.toSeq
      .map { case (v, hs) =>
        (v, hs.length.toLong, hs.sum, hs.max,
          math.floor(hs.length.toDouble / hs.sum * 1e6 + 0.5) / 1e6) }
      .filter(_._3 > 0)
      .sortBy { case (v, _, _, _, c) => (-c, v) }.take(20)
    val got = graft.ops.Mining.qClosenessApprox(spark, sf).collect()
      .map(r => (gl(r, 0), gl(r, 1), gl(r, 2), gl(r, 3), r.getDouble(4)))
      .toSeq
    assert(got == want, "BFS fold != brute-force distance census")
  }

  test("gains/lift table equals the in-JVM decile replay") {
    val resp = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct()
      .collect().map(r => gl(r, 0)).toSet
    val cust = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (gl(r, 0), gl(r, 1)))
      .sortBy { case (k, sc) => (-sc, k) }
    val n = cust.length
    // SQL ntile: first n%10 buckets take ceil(n/10)
    val deciles = cust.zipWithIndex.map { case ((k, _), i) =>
      val big = n % 10; val size = n / 10
      val dec =
        if (i < big * (size + 1)) i / (size + 1) + 1
        else big + (i - big * (size + 1)) / size + 1
      (dec.toLong, if (resp(k)) 1L else 0L)
    }
    val byDec = deciles.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (dc, xs) => (dc, xs.length.toLong, xs.map(_._2).sum) }
    val totN = n.toLong; val totR = byDec.map(_._3).sum
    var cumN = 0L; var cumR = 0L
    val want = byDec.map { case (dc, nc, nr) =>
      cumN += nc; cumR += nr
      (dc, nc, nr,
        math.floor(nr.toDouble / nc * 1e4 + 0.5) / 1e4, cumR,
        math.floor(cumR.toDouble / cumN / (totR.toDouble / totN)
          * 1e6 + 0.5) / 1e6)
    }
    val got = graft.ops.Mining.qGainsLift(spark, sf).collect()
      .map(r => (gl(r, 0), gl(r, 1), gl(r, 2), r.getDouble(3), gl(r, 4),
        r.getDouble(5))).toSeq
    assert(got == want, "ranged ntile gains table != in-JVM replay")
  }

  /** In-JVM greedy BPE fold shared by the apply/fertility replays:
    * returns the final (delimited word -> count) vocab after 6
    * merges. */
  private def jvmBpeVocab(): Map[String, Long] = {
    val words = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .collect().map(_.getString(0))
    val d = "\u0001"
    var vocab = words.groupBy(identity).map { case (w, g) =>
      (d + w.flatMap(c => s"$c$d"), g.length.toLong) }.toMap
    for (_ <- 1 to 6) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, c) <- vocab) {
        val syms = w.split(d).filter(_.nonEmpty)
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      val ((a, b), _) = counts.toSeq
        .minBy { case ((a, b), n) => (-n, a, b) }
      vocab = vocab.map { case (w, c) =>
        (w.replace(d + a + d + b + d, d + a + b + d), c) }
    }
    vocab
  }

  test("bpe apply census and fertility equal the in-JVM replay") {
    val d = "\u0001"
    val vocab = jvmBpeVocab()
    val toks = vocab.toSeq.flatMap { case (w, c) =>
      w.split(d).filter(_.nonEmpty).map(t => (t, c)) }
    val wantApply = toks.groupBy(_._1).toSeq
      .map { case (t, xs) => (t, xs.map(_._2).sum, xs.length.toLong) }
      .sortBy { case (t, n, _) => (-n, t) }.take(20)
    val gotApply = graft.ops.PipelineQueries.textBpeApply(spark, sf)
      .collect().map(r => (r.getString(0), gl(r, 1), gl(r, 2))).toSeq
    assert(gotApply == wantApply, "apply census != in-JVM replay")

    val perWord = vocab.toSeq.map { case (w, c) =>
      (w.split(d).count(_.nonEmpty).toLong, c) }
    val nWords = perWord.length.toLong
    val nInst = perWord.map(_._2).sum
    val nToks = perWord.map { case (t, c) => t * c }.sum
    val single = perWord.filter(_._1 == 1L).map(_._2).sum
    val hist = perWord.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    var cum = 0L
    val p90 = hist.collectFirst {
      case (t, nn) if { cum += nn; cum * 10 >= nInst * 9 } => t }.get
    val wantFert = (nWords, nInst, nToks,
      math.floor(nToks.toDouble / nInst * 1e6 + 0.5) / 1e6,
      math.floor(single.toDouble / nInst * 1e6 + 0.5) / 1e6,
      p90, hist.map(_._1).max)
    val r = graft.ops.PipelineQueries.textTokenizerFertility(spark, sf)
      .collect().head
    val gotFert = (gl(r, 0), gl(r, 1), gl(r, 2), r.getDouble(3),
      r.getDouble(4), gl(r, 5), gl(r, 6))
    assert(gotFert == wantFert, "fertility report != in-JVM replay")
  }

  test("mann-kendall S equals the naive quadratic sign census") {
    val daily = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(date_format(to_date(col("l_shipdate")), "yyyy-MM")
          .as("m"), to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("e4"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, gl(r, 2)))
    val want = daily.groupBy(_._1).toSeq
      .collect { case (m, rows) if rows.length >= 2 =>
        val sorted = rows.sortBy(_._2)
        var s = 0L
        for (i <- sorted.indices; j <- (i + 1) until sorted.length)
          s += java.lang.Long.signum(sorted(j)._3 - sorted(i)._3)
        val n0 = sorted.length.toLong * (sorted.length - 1) / 2
        (m, sorted.length.toLong, s,
          math.floor(s.toDouble / n0 * 1e6 + 0.5) / 1e6)
      }.sortBy(_._1)
    val got = graft.ops.Behavior.qMannKendall(spark, sf).collect()
      .map(r => (r.getString(0), gl(r, 1), gl(r, 2), r.getDouble(3))).toSeq
    assert(got == want, "dominance-count S != quadratic sign census")
  }

  test("merge patch census equals an in-JVM RFC 7386 implementation") {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.ObjectNode
    val om = new com.fasterxml.jackson.databind.ObjectMapper
    // a third independent RFC 7386 implementation (beside the Spark
    // projection and DuckDB's native json_merge_patch)
    def rfc7386(target: JsonNode, patch: JsonNode): JsonNode =
      if (!patch.isObject) patch.deepCopy[JsonNode]()
      else {
        val base: ObjectNode =
          if (target != null && target.isObject)
            target.deepCopy[ObjectNode]()
          else om.createObjectNode()
        patch.properties().forEach { e =>
          if (e.getValue.isNull) base.remove(e.getKey)
          else base.set[JsonNode](e.getKey,
            rfc7386(base.get(e.getKey), e.getValue)): Unit
        }
        base
      }
    val patches = Array(
      """{"status":"XX"}""", """{"meta":{"price_cents":null}}""",
      """{"meta":null}""",
      """{"extra":{"src":"patch"},"meta":{"audited":true}}""")
    val rows = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long"),
        col("o_orderpriority"))
      .collect()
    val agg = scala.collection.mutable.Map[Long, Array[Long]]()
    for (r <- rows) {
      val key = gl(r, 0); val op = key % 4
      val doc = om.createObjectNode()
      doc.put("id", key); doc.put("status", r.getString(1))
      val meta = doc.putObject("meta")
      meta.put("price_cents", gl(r, 2)); meta.put("prio", r.getString(3))
      val m = rfc7386(doc, om.readTree(patches(op.toInt)))
      val a = agg.getOrElseUpdate(op, Array.fill(7)(0L))
      a(0) += 1
      if (m.path("status").asText() == "XX") a(1) += 1
      if (m.path("meta").has("price_cents")) {
        a(2) += 1; a(3) += m.path("meta").path("price_cents").asLong()
      }
      if (m.has("meta")) a(4) += 1
      if (m.path("extra").has("src")) a(5) += 1
      if (m.path("meta").path("audited").asBoolean(false)) a(6) += 1
    }
    val want = agg.toSeq.sortBy(_._1)
      .map { case (op, a) => op +: a.toSeq }
    val got = graft.ops.JsonQueries.engineMergePatch(spark, sf).collect()
      .map(r => (0 to 7).map(i => gl(r, i))).toSeq
    assert(got == want, "schema-driven projection != Jackson RFC 7386")
  }

  test("gini via Ranks.groupRowNumber equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val rev = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      .withColumn("cents", round(col("rev") * 100, 0).cast("long"))
    val j = rev.join(graft.sources.Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_nationkey")),
      col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("cents"), col("o_custkey"))
    val want = j.withColumn("r", row_number().over(w).cast("long"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        round(lit(2.0) * sum(col("r") * col("cents")) /
            (count(lit(1)).cast("double") * sum(col("cents"))) -
          (count(lit(1)) + lit(1.0)) / count(lit(1)), 4).as("gini"))
      .collect().map(r => (gl(r, 0), gl(r, 1), r.getDouble(2)))
      .toSet
    val nations = graft.sources.Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"))
      .collect().map(r => r.getString(1) -> gl(r, 0)).toMap
    val got = graft.ops.Mining.qGini(spark, sf).collect()
      .map(r => (nations(r.getString(0)), gl(r, 1), r.getDouble(3)))
      .toSet
    assert(got == want, "ranged rank changed the gini output")
  }
}
