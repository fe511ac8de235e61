package graft

import org.apache.spark.sql.functions._

/** Round-16 regressions: ALTER-COLUMN verbs (r15 verdict order #4) —
  * crash interleavings on the staged projection swap, the
  * index-invalidation contract (dropped FIRST, so a crash can only
  * leave a missing rebuildable index, never a stale one), the
  * FK-woven refusals — plus the saveAll cleanup fix (a concurrent
  * save's pre-marker staging must survive another writer's save;
  * vacuum, not save, reclaims crash leftovers).
  */
class Round16Spec extends SparkSuite {
  import spark.implicits._

  private def kv(rows: (Long, String, Double)*) =
    rows.toDF("rowNum", "name", "score")

  test("renameColumn + dropColumn rewrite the data bit-for-bit and " +
      "the post-alter schema is exactly the projection") {
    val wh = graft.util.Scratch.dir("graft_r16_alt").toString
    val eng = new Engine(spark, wh)
    eng.save(kv((1L, "a", 1.5), (2L, "b", 2.25), (3L, "c", -4.0)), "kv")
    eng.renameColumn("kv", "score", "points")
    eng.dropColumn("kv", "name")
    val t = eng.table("kv")
    assert(t.columns.sorted.toSeq == Seq("points", "rowNum"))
    assert(t.orderBy("rowNum").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.5), (2L, 2.25), (3L, -4.0)))
  }

  test("a crash between staging and swap leaves the table unchanged; " +
      "the retry lands the alter") {
    val wh = graft.util.Scratch.dir("graft_r16_altcrash").toString
    val eng = new Engine(spark, wh)
    eng.save(kv((1L, "a", 1.0), (2L, "b", 2.0)), "kv")
    eng.beforeSwap = _ => throw new RuntimeException("crash pre-swap")
    intercept[RuntimeException] { eng.renameColumn("kv", "score", "s2") }
    assert(eng.table("kv").columns.sorted.toSeq ==
      Seq("name", "rowNum", "score"), "crash pre-swap: schema unchanged")
    eng.beforeSwap = _ => ()
    eng.renameColumn("kv", "score", "s2")
    assert(eng.table("kv").columns.sorted.toSeq ==
      Seq("name", "rowNum", "s2"))
  }

  test("a concurrent writer landing inside the alter window loses " +
      "with a retryable CME, never silent data loss") {
    val wh = graft.util.Scratch.dir("graft_r16_altcme").toString
    val eng = new Engine(spark, wh)
    val other = new Engine(spark, wh)
    eng.save(kv((1L, "a", 1.0)), "kv")
    eng.beforeSwap = _ => other.upsert("kv",
      Seq((2L, "b", 2.0)).toDF("rowNum", "name", "score"))
    intercept[java.util.ConcurrentModificationException] {
      eng.dropColumn("kv", "name")
    }
    eng.beforeSwap = _ => ()
    // the concurrent upsert survived; the retry applies to fresh state
    assert(eng.table("kv").count() == 2L)
    eng.dropColumn("kv", "name")
    assert(eng.table("kv").columns.sorted.toSeq == Seq("rowNum", "score"))
  }

  test("index invalidation: an index or covering index whose schema " +
      "carries the altered column is dropped; others survive") {
    val wh = graft.util.Scratch.dir("graft_r16_altidx").toString
    val eng = new Engine(spark, wh)
    eng.save(kv((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)), "kv")
    eng.buildIndex("kv", "name")
    eng.buildIndex("kv", "score")
    eng.buildCoveringIndex("kv", "name", Seq("score")) // INCLUDEs score
    eng.dropColumn("kv", "score")
    assert(new java.io.File(s"$wh/kv__idx_name").exists,
      "index on an untouched column survives")
    assert(!new java.io.File(s"$wh/kv__idx_score").exists,
      "index ON the dropped column is invalidated")
    assert(!new java.io.File(s"$wh/kv__cidx_name").exists,
      "covering index INCLUDE-ing the dropped column is invalidated")
    assert(eng.lookupByIndex("kv", "name", "a").count() == 2L,
      "surviving index still serves lookups post-alter")
  }

  test("refusals: FK-woven column, rename onto an existing name, " +
      "drop of the last column") {
    val wh = graft.util.Scratch.dir("graft_r16_altref").toString
    val eng = new Engine(spark, wh)
    // shredded parent/child: child table carries FK column named
    // after the parent table
    val docs = Seq((1L, Seq((10L, "x"), (11L, "y"))))
      .toDF("rowNum", "kids")
      .withColumn("kids", expr(
        "transform(kids, k -> named_struct('rowNum', k._1, 'v', k._2))"))
    eng.save(docs, "t")
    intercept[IllegalArgumentException] {
      eng.renameColumn("kids", "t", "parent_fk")
    }
    eng.save(kv((1L, "a", 1.0)), "kv")
    intercept[IllegalArgumentException] {
      eng.renameColumn("kv", "score", "name")
    }
    eng.dropColumn("kv", "name")
    eng.dropColumn("kv", "score")
    intercept[IllegalArgumentException] { eng.dropColumn("kv", "rowNum") }
  }

  test("saveAll no longer deletes another writer's pre-marker " +
      "staging; vacuum reclaims it") {
    val wh = graft.util.Scratch.dir("graft_r16_stg").toString
    val eng = new Engine(spark, wh)
    eng.save(kv((1L, "a", 1.0)), "kv")
    // a concurrent save's in-flight (or crashed) pre-marker staging
    val stray = new java.io.File(s"$wh/kv__staged_deadbeef")
    assert(stray.mkdirs())
    java.nio.file.Files.write(stray.toPath.resolve("part-0.parquet"),
      Array[Byte](1, 2, 3))
    eng.save(kv((2L, "b", 2.0)), "kv") // must NOT touch the stray dir
    assert(stray.exists,
      "another writer's staging survives a concurrent save")
    assert(eng.table("kv").count() == 1L)
    assert(eng.vacuum("kv") >= 1, "vacuum reclaims the stale staging")
    assert(!stray.exists)
  }

  test("relation-woven rename: FK indirection keeps sql()/nested()/" +
      "getJson() serving the tree under new names, data untouched") {
    val wh = graft.util.Scratch.dir("graft_r16_wren").toString
    val eng = new Engine(spark, wh)
    val docs = Seq((1L, Seq((10L, 100L), (11L, 200L))),
        (2L, Seq((20L, 300L))))
      .toDF("rowNum", "kids")
      .withColumn("kids", expr(
        "transform(kids, k -> named_struct('rowNum', k._1, 'v', k._2))"))
    eng.save(docs, "t")
    eng.renameTable("t", "tree")
    eng.renameTable("kids", "branches")
    // in-data FK column keeps its shred-time name "t"
    val r = eng.sql("""SELECT count(*) AS n, sum(k.v) AS sv
        FROM branches k JOIN tree p ON k.t = p.rowNum""").collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (3L, 600L))
    // re-assembly resolves the renamed tables through the indirection
    val n = eng.nested("tree").orderBy("rowNum")
    assert(n.columns.contains("kids"),
      "re-nested array column keeps its shred-time (document) name")
    assert(n.select(explode(col("kids.v"))).as[Long].collect().sum == 600L)
    val j = eng.getJson("tree", 2L).get
    assert(j.contains("300"), s"getJson after woven rename: $j")
    // chain rename keeps resolving to the ORIGINAL shred-time name
    eng.renameTable("tree", "forest")
    val r2 = eng.sql("""SELECT sum(k.v) AS sv
        FROM branches k JOIN forest p ON k.t = p.rowNum""").collect()(0)
    assert(r2.getLong(0) == 600L)
    assert(eng.nested("forest").count() == 2L)
  }

  test("woven rename survives a crash before the data-dir move and " +
      "a re-save under the new name supersedes the indirection") {
    val wh = graft.util.Scratch.dir("graft_r16_wrencrash").toString
    val eng = new Engine(spark, wh)
    val reader = new Engine(spark, wh)
    val docs = Seq((1L, Seq((10L, 5L)))).toDF("rowNum", "kids")
      .withColumn("kids", expr(
        "transform(kids, k -> named_struct('rowNum', k._1, 'v', k._2))"))
    eng.save(docs, "t")
    eng.afterPublish = _ => throw new RuntimeException("crash pre-move")
    intercept[RuntimeException] { eng.renameTable("t", "tree") }
    eng.afterPublish = _ => ()
    // marker committed: the NEW name already serves (from the old dir)
    assert(reader.sql(
      """SELECT sum(k.v) FROM kids k JOIN tree p ON k.t = p.rowNum""")
      .collect()(0).getLong(0) == 5L)
    // a re-save of the whole tree under the new root name re-shreds
    // under CURRENT names: fresh FK column, indirection superseded
    val docs2 = Seq((1L, Seq((10L, 7L)))).toDF("rowNum", "kids")
      .withColumn("kids", expr(
        "transform(kids, k -> named_struct('rowNum', k._1, 'v', k._2))"))
    eng.save(docs2, "tree")
    assert(reader.sql(
      """SELECT sum(k.v) FROM kids k JOIN tree p ON k.tree = p.rowNum""")
      .collect()(0).getLong(0) == 7L)
  }

  test("finance pack (OBV / ulcer index / Parkinson vol) matches " +
      "naive in-JVM replays over the collected daily frame") {
    val d = "/root/testdata/sf0.001"
    val daily = graft.sources.Tables.lineitem(spark, d)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT) * " +
        "CAST(round((1 - l_discount) * 100) AS BIGINT)")).as("e4"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("vol"),
        max(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("h"),
        min(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("l"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    // OBV replay
    var obv = 0L; var prev = Option.empty[Long]
    val wantObv = daily.map { case (day, e4, vol, _, _) =>
      val sgn = prev.map(p => java.lang.Long.signum(e4 - p).toLong)
        .getOrElse(0L)
      prev = Some(e4); obv += sgn * vol
      (day, vol, sgn, obv)
    }.toSeq
    val gotObv = graft.ops.Behavior.qObv(spark, d).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(gotObv == wantObv, "OBV != replay")

    // ulcer replay
    var peak = Long.MinValue
    val r8s = daily.map { case (_, e4, _, _, _) =>
      peak = math.max(peak, e4)
      (BigInt(peak - e4) * BigInt(peak - e4) * BigInt(100000000) /
        (BigInt(peak) * BigInt(peak))).toLong
    }
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val wantUi = (daily.length.toLong,
      r4(math.sqrt(r8s.max.toDouble / 1e8) * 100),
      r4(math.sqrt(r8s.sum.toDouble / daily.length / 1e8) * 100))
    val u = graft.ops.Behavior.qUlcerIndex(spark, d).collect()(0)
    assert((u.getLong(0), u.getDouble(1), u.getDouble(2)) == wantUi,
      "ulcer != replay")

    // Parkinson replay (monthly)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val wantP = daily.groupBy(_._1.substring(0, 7)).toSeq.sortBy(_._1)
      .map { case (m, ds) =>
        val s12 = ds.map { case (_, _, _, h, l) =>
          math.floor(math.pow(math.log(h.toDouble / l.toDouble), 2)
            * 1e12).toLong }.sum
        (m, ds.length.toLong,
          r6(math.sqrt(s12.toDouble / 1e12 /
            (4 * math.log(2) * ds.length))))
      }
    val gotP = graft.ops.Behavior.qParkinsonVol(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(gotP == wantP, "parkinson != replay")
  }

  test("stats pack (Mood's median / partial corr / ICC / " +
      "Hellinger-BC / Anderson-Darling) matches naive replays") {
    val d = "/root/testdata/sf0.001"

    // Mood's median: global low median + k×2 chi2 replay
    val cust = graft.sources.Tables.customer(spark, d)
      .select(col("c_nationkey").cast("long"), col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sorted = cust.sortBy(c => (c._3, c._2))
    val med = sorted((sorted.length + 1) / 2 - 1)._3
    val byNation = cust.groupBy(_._1).toSeq.sortBy(_._1)
    val wantAb = byNation.map { case (g, xs) =>
      (g, xs.count(_._3 > med).toLong, xs.count(_._3 <= med).toLong) }
    val gotM = graft.ops.Stats.qMoodsMedian(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(gotM == wantAb, "moods median census != replay")

    // ICC: brute one-way ANOVA replay on the shifted dollar lattice
    val dollars = graft.sources.Tables.customer(spark, d)
      .select(col("c_nationkey").cast("long"),
        expr("CAST(round(c_acctbal) AS BIGINT) + 1000"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val gs = dollars.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val k = gs.length; val n = dollars.length
    val mean = dollars.map(_._2).sum.toDouble / n
    val ssb = gs.map(g => g.length *
      math.pow(g.sum.toDouble / g.length - mean, 2)).sum
    val ssw = gs.map(g => { val m = g.sum.toDouble / g.length
      g.map(x => math.pow(x - m, 2)).sum }).sum
    val msb = ssb / (k - 1); val msw = ssw / (n - k)
    val n0 = (n - gs.map(g => math.pow(g.length, 2)).sum / n) / (k - 1)
    val wantIcc = (msb - msw) / (msb + (n0 - 1) * msw)
    val gotIcc = graft.ops.Stats.qIcc(spark, d).collect()(0)
      .getAs[Double]("icc1")
    assert(math.abs(gotIcc - wantIcc) < 1e-4,
      s"icc $gotIcc != replay $wantIcc (integer-division slack < 1e-4)")

    // Hellinger: distance in [0,1], BC in [0,1], BC+H consistency
    val h = graft.ops.Stats.qHellingerBc(spark, d).collect()(0)
    val (bc, hd) = (h.getAs[Double]("bhattacharyya"),
      h.getAs[Double]("hellinger"))
    assert(bc > 0 && bc <= 1 && hd >= 0 && hd < 1)
    assert(math.abs(hd - math.sqrt(1 - bc)) < 1e-4)

    // partial corr: |r| bounds + formula consistency from its own rs
    graft.ops.Stats.qPartialCorr(spark, d).collect().foreach { r =>
      val (rxy, rxz, ryz, rp) = (r.getAs[Double]("r_xy"),
        r.getAs[Double]("r_xz"), r.getAs[Double]("r_yz"),
        r.getAs[Double]("r_xy_given_z"))
      assert(math.abs(rp) <= 1.0001 && math.abs(rxy) <= 1.0001)
      val want = (rxy - rxz * ryz) /
        math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
      assert(math.abs(rp - want) < 2e-3,
        s"partial corr $rp != recomposed $want")
    }

    // Anderson-Darling: replay the fold in-JVM
    val secs = graft.sources.Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .select(unix_timestamp(col("ts"))).distinct()
      .collect().map(_.getLong(0)).sorted
    val gaps = secs.sliding(2).map(p => p(1) - p(0)).toArray.sorted
    val nn = gaps.length; val lam = nn.toDouble / gaps.map(BigInt(_)).sum.toDouble
    val s6 = gaps.zipWithIndex.map { case (x, j0) =>
      val j = j0 + 1
      val term = (2 * j - 1) * math.log(1 - math.exp(-lam * x)) +
        (2L * nn - 2 * j + 1) * (-lam * x)
      math.floor(term * 1e6 / nn).toLong
    }.sum
    val wantA2 = math.floor((-nn - s6 / 1e6) * 1e4 + 0.5) / 1e4
    val gotA2 = graft.ops.Stats.qAndersonDarling(spark, d).collect()(0)
      .getAs[Double]("a2_stat")
    assert(gotA2 == wantA2, s"AD $gotA2 != replay $wantA2")
  }

  test("text richness pack (Yule/Guiraud/Honore, MSTTR, Burrows " +
      "delta) matches naive in-JVM replays") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
      .select(col("source"), col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSeq

    // Yule's K replay for one source
    val bySrc = docs.groupBy(_._1)
    val s0 = bySrc.keys.min
    val cs = bySrc(s0).flatMap(d3 => toks(d3._3))
      .groupBy(identity).map(_._2.size.toLong).toSeq
    val (nTok, v, v1) = (cs.sum, cs.size.toLong, cs.count(_ == 1L).toLong)
    val s2 = cs.map(c => c * c).sum
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val wantK = r4(1e4 * (s2.toDouble - nTok) / (nTok.toDouble * nTok))
    val row = graft.ops.PipelineQueries.textYuleRichness(spark, d)
      .filter(col("source") === s0).collect()(0)
    assert(row.getAs[Long]("n") == nTok && row.getAs[Long]("v") == v &&
      row.getAs[Long]("v1") == v1)
    assert(row.getAs[Double]("yule_k") == wantK)

    // MSTTR replay for the same source
    val segTtrs = bySrc(s0).flatMap { case (_, _, t) =>
      toks(t).grouped(50).filter(_.size == 50)
        .map(seg => seg.distinct.size.toLong * 200L) }
    val wantMean = math.floor(
      segTtrs.sum.toDouble / segTtrs.size * 100 + 0.5) / 100
    val m = graft.ops.PipelineQueries.textMsttr(spark, d)
      .filter(col("source") === s0).collect()(0)
    assert(m.getAs[Long]("n_segments") == segTtrs.size.toLong)
    assert(m.getAs[Double]("mean_ttr_bp") == wantMean)

    // Burrows delta: symmetry-free ordered pairs, self-consistency
    val bd = graft.ops.PipelineQueries.textBurrowsDelta(spark, d)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("n_words"), r.getAs[Double]("delta")))
    assert(bd.length == 190, s"20 choose 2 ordered pairs, got ${bd.length}")
    assert(bd.forall(_._2 == 20L))
    assert(bd.forall(p => p._3 >= 0 && p._3 < 10))
    assert(bd.map(_._1).distinct.length == 190)
  }

  test("streaming twins stream_parkinson / stream_hellinger equal " +
      "their batch formulations in-JVM") {
    val d = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(graft.streaming.Events.streamParkinson(spark, d)) ==
      rows(graft.ops.Behavior.qParkinsonVol(spark, d)),
      "stream parkinson != batch")
    assert(rows(graft.streaming.Events.streamHellinger(spark, d)) ==
      rows(graft.ops.Stats.qHellingerBc(spark, d)),
      "stream hellinger != batch")
  }

  test("QOI codec: pixel-exact roundtrip for 100 docs, real " +
      "compression, and the op alphabet actually engages") {
    for (id <- 0L until 100L) {
      val w = graft.mm.Codecs.qoiWidth(id)
      val h = graft.mm.Codecs.qoiHeight(id)
      val bytes = graft.mm.Codecs.encodeQoi(id)
      val (dw, dh, sum) = graft.mm.Codecs.decodeQoiStats(bytes)
      var want = 0L
      for (y <- 0 until h; x <- 0 until w)
        want += graft.mm.Codecs.grayAt(x, y, id)
      assert((dw, dh, sum) == (w, h, want), s"doc $id roundtrip")
      assert(bytes.length < 14 + 3 * w * h + 8,
        s"doc $id: no compression over the RGB literal stream")
    }
    // op census across the 100 streams: LUMA (the +31 ramp step),
    // INDEX (color-cache hits) and the RGB literal fallback must all
    // appear — proves the encoder isn't degenerating to literals
    var (nLuma, nIndex, nRgb, nRun, nDiff) = (0, 0, 0, 0, 0)
    for (id <- 0L until 100L) {
      val bytes = graft.mm.Codecs.encodeQoi(id)
      var pos = 14
      while (pos < bytes.length - 8) {
        val op = bytes(pos) & 0xff; pos += 1
        if (op == 0xfe) { nRgb += 1; pos += 3 }
        else if (op == 0xff) pos += 4
        else (op >>> 6) match {
          case 0 => nIndex += 1
          case 1 => nDiff += 1
          case 2 => nLuma += 1; pos += 1
          case _ => nRun += 1
        }
      }
    }
    assert(nLuma > 0, "LUMA ops must appear on the +31 gray ramp")
    assert(nIndex > 0, "INDEX ops must appear (color-cache hits)")
    assert(nRgb > 0, "RGB literal fallback must appear (big wraps)")
  }

  test("seasonal Mann-Kendall matches a brute pairwise replay and " +
      "calibration bins match a naive fold") {
    val d = "/root/testdata/sf0.001"
    // seasonal MK replay
    val sy = graft.sources.Tables.lineitem(spark, d)
      .groupBy(date_format(to_date(col("l_shipdate")), "MM").as("m"),
        year(to_date(col("l_shipdate"))).cast("long").as("yr"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT) * " +
        "CAST(round((1 - l_discount) * 100) AS BIGINT)")).as("e4"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySeason = sy.groupBy(_._1).filter(_._2.length >= 2)
    val wantS = bySeason.map { case (m, xs) =>
      val ys = xs.sortBy(_._2).map(_._3)
      val sm = (for (i <- ys.indices; j <- i + 1 until ys.length)
        yield java.lang.Long.signum(ys(j) - ys(i)).toLong).sum
      m -> sm
    }
    val got = graft.ops.Behavior.qSeasonalMannKendall(spark, d).collect()
    val gotPer = got.filter(_.getString(0) != "total")
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(gotPer == wantS, s"per-season S: $gotPer vs $wantS")
    val tot = got.find(_.getString(0) == "total").get
    assert(tot.getLong(3) == wantS.values.sum, "S total")
    val v18 = bySeason.map { case (_, xs) =>
      val n = xs.length.toLong; n * (n - 1) * (2 * n + 5) }.sum
    val st = wantS.values.sum
    val wantZ = math.floor((st.toDouble - java.lang.Long.signum(st)) /
      math.sqrt(v18.toDouble / 18) * 1e4 + 0.5) / 1e4
    assert(tot.getDouble(4) == wantZ, "Z stat")

    // calibration replay
    val sc = graft.sources.Tables.lineitem(spark, d)
      .select(expr("CAST(round(l_quantity) AS BIGINT) * 101 + " +
        "CAST(round(l_discount * 100) AS BIGINT)").as("v"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val vmax = sc.map(_._1).max
    val byBin = sc.groupBy(t => math.min(9L, t._1 * 10 / (vmax + 1)))
    val cal = graft.ops.MlEval.qCalibrationBins(spark, d).collect()
    assert(cal.length == byBin.size)
    cal.foreach { r =>
      val xs = byBin(r.getLong(0))
      assert(r.getLong(1) == xs.length.toLong)
      assert(r.getLong(2) == xs.map(_._2).sum)
      val conf6 = (xs.map(t => BigInt(t._1)).sum * 1000000 /
        (BigInt(xs.length) * vmax)).toLong
      assert(r.getDouble(3) ==
        math.floor(conf6.toDouble / 1e6 * 1e6 + 0.5) / 1e6)
    }
    // streaming twin equals the batch formulation
    assert(graft.streaming.Events.streamCalibration(spark, d)
      .collect().map(_.toSeq).toSeq == cal.map(_.toSeq).toSeq,
      "stream calibration != batch")
  }

  test("optimize compacts files without changing a byte of contents " +
      "and survives a crash mid-swap") {
    val wh = graft.util.Scratch.dir("graft_r16_opt").toString
    val eng = new Engine(spark, wh)
    eng.save(spark.range(1000).select(col("id").as("rowNum"),
      (col("id") * 3).as("v")).repartition(6), "t")
    val pre = eng.table("t").orderBy("rowNum").collect().toSeq
    eng.beforeSwap = _ => throw new RuntimeException("crash pre-swap")
    intercept[RuntimeException] { eng.optimize("t", 2) }
    eng.beforeSwap = _ => ()
    assert(eng.table("t").orderBy("rowNum").collect().toSeq == pre,
      "crash pre-swap leaves the table untouched")
    val (before, after) = eng.optimize("t", 2)
    assert(before == 6 && after == 2, s"($before, $after)")
    assert(eng.table("t").orderBy("rowNum").collect().toSeq == pre,
      "optimize is layout-only")
  }

  test("stratified ATE matches a naive per-stratum replay") {
    val d = "/root/testdata/sf0.001"
    val us = graft.sources.Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("cents"))
      .withColumn("arm", pmod(graft.functions.exprs.md5Lower64(
        col("user_id").cast("string"))
        .bitwiseAND(lit(Long.MaxValue)), lit(2L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val sorted = us.sortBy(u => (u._2, u._1))
    val n = sorted.length; val k = 5
    val big = n % k; val cap = n / k + 1
    def stratumOf(rank0: Int): Int =
      if (rank0 < big * cap) rank0 / cap + 1
      else big + (rank0 - big * cap) / (n / k) + 1
    val byS = sorted.zipWithIndex
      .groupBy { case (_, i) => stratumOf(i) }
    val want = byS.toSeq.sortBy(_._1).map { case (st, xs) =>
      val a1 = xs.map(_._1).filter(_._4 == 1L)
      val a0 = xs.map(_._1).filter(_._4 == 0L)
      val d6 = if (a1.isEmpty || a0.isEmpty) None
        else Some(a1.map(_._3).sum * 1000000L / a1.length -
          a0.map(_._3).sum * 1000000L / a0.length)
      (st.toLong, xs.length.toLong, a1.length.toLong, a0.length.toLong,
        d6.map(v =>
          math.floor(v.toDouble / 1e6 / 100 * 1e4 + 0.5) / 1e4))
    }
    val got = graft.ops.Stats.qStratifiedAte(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got == want, s"stratified ATE cells: $got vs $want")
  }

  test("Jonckheere-Terpstra and Page's L match brute in-JVM replays") {
    val d = "/root/testdata/sf0.001"
    // J-T replay from the raw (priority, qty) pairs
    val rows = graft.sources.Tables.lineitem(spark, d)
      .join(graft.sources.Tables.orders(spark, d)
        .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        expr("CAST(round(l_quantity) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2))
    var j2 = BigInt(0)
    for (i <- groups.indices; k <- i + 1 until groups.length;
         a <- groups(i); b <- groups(k))
      j2 += (if (a < b) 2 else if (a == b) 1 else 0)
    val wantJ = math.floor(j2.toDouble / 2 * 10 + 0.5) / 10
    val gotJ = graft.ops.Stats.qJonckheere(spark, d).collect()(0)
    assert(gotJ.getAs[Double]("j_stat") == wantJ,
      s"J ${gotJ.getAs[Double]("j_stat")} != $wantJ")

    // Page's L replay from the q1/q2/q3 blocks
    val blocks = graft.sources.Tables.lineitem(spark, d)
      .filter(col("l_linenumber") <= 3)
      .groupBy(col("l_orderkey"))
      .agg(max(when(col("l_linenumber") === 1,
          round(col("l_quantity")).cast("long"))).as("q1"),
        max(when(col("l_linenumber") === 2,
          round(col("l_quantity")).cast("long"))).as("q2"),
        max(when(col("l_linenumber") === 3,
          round(col("l_quantity")).cast("long"))).as("q3"))
      .collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    def rank2(self: Long, o1: Long, o2: Long): Long =
      2L * ((if (o1 < self) 1 else 0) + (if (o2 < self) 1 else 0)) +
        (if (o1 == self) 1 else 0) + (if (o2 == self) 1 else 0) + 2
    val l2 = blocks.map { case (a, b, c) =>
      rank2(a, b, c) + 2 * rank2(b, a, c) + 3 * rank2(c, a, b) }.sum
    val wantL = math.floor(l2.toDouble / 2 * 10 + 0.5) / 10
    val gotL = graft.ops.Stats.qPageTrend(spark, d).collect()(0)
    assert(gotL.getAs[Double]("page_l") == wantL,
      s"L ${gotL.getAs[Double]("page_l")} != $wantL")
  }

  test("stream_asof_interval runs in at most 3 micro-batches — the " +
      "r16 floor diet (5 batches -> 2+flush) must not regress") {
    val d = "/root/testdata/sf0.001"
    graft.streaming.Events.streamAsofInterval(spark, d).collect()
    val batches = graft.streaming.StreamMeter.stats.entrySet().iterator()
    var found = false
    batches.forEachRemaining { e =>
      if (e.getKey.startsWith("graft_stream_asof_int")) {
        found = true
        assert(e.getValue._3 <= 3,
          s"asof interval ran ${e.getValue._3} micro-batches — the " +
            "2-batch source layout (data+sentinel per trigger, " +
            "no-data flush) has regressed")
      }
    }
    assert(found, "no StreamMeter record for the asof interval run")
  }

  test("Cliff's delta matches a brute dominance replay") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.sources.Tables.lineitem(spark, d)
      .select((col("l_returnflag") === "R"),
        expr("CAST(round(l_quantity) AS BIGINT)"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val xs = rows.filter(_._1).map(_._2)
    val ys = rows.filter(!_._1).map(_._2)
    var gt = BigInt(0); var lt = BigInt(0)
    for (x <- xs; y <- ys) {
      if (x > y) gt += 1 else if (x < y) lt += 1
    }
    val nn = BigInt(xs.length) * ys.length
    val delta = gt.toDouble / nn.toDouble - lt.toDouble / nn.toDouble
    val want = math.floor(delta * 1e6 + 0.5) / 1e6
    val got = graft.ops.Stats.qCliffsDelta(spark, d).collect()(0)
    assert(got.getAs[Double]("cliffs_delta") == want,
      s"delta ${got.getAs[Double]("cliffs_delta")} != $want")
    assert(got.getAs[Double]("vargha_delaney_a") ==
      math.floor((delta + 1) / 2 * 1e6 + 0.5) / 1e6)
  }

  test("dedup_short_spans catches EVERY planted 30-char boilerplate " +
      "doc — the detection guarantee the coarse 50/10 grid lacks") {
    val d = "/root/testdata/sf0.001"
    val out = ops.PipelineQueries.dedupShortSpans(spark, d)
    val caughtPlanted = out.filter(col("planted")).count()
    val nPlanted = graft.sources.Tables.documents(spark, d)
      .filter(col("doc_id") % 7 === 0).count()
    assert(nPlanted == 72L)
    assert(caughtPlanted == nPlanted,
      s"every planted doc must be caught: $caughtPlanted/$nPlanted")
    // and the coarse grid indeed CANNOT see a 30-char span: planted
    // docs it flags are flagged for ambient near-dup text, not the
    // boilerplate — verified by the grid guarantee W+St-1=59 > 30
    // (the fine grid's guarantee is 23 <= 30, hence the catch above)
  }

  test("saveChecked quarantines CHECK violations atomically, passes " +
      "NULL checks (SQLite semantics), refuses nested docs") {
    val wh = graft.util.Scratch.dir("graft_r16_chk").toString
    val eng = new Engine(spark, wh)
    val reader = new Engine(spark, wh)
    val docs = Seq((1L, 10.0), (2L, -5.0), (3L, 99.0))
      .toDF("rowNum", "amount")
      .union(Seq((4L, Option.empty[Double]).asInstanceOf[(Long, Option[Double])])
        .toDF("rowNum", "amount"))
    eng.beforeMark = () => {
      // pre-commit: NEITHER table visible yet (atomic pair commit)
      intercept[Exception] { reader.table("chk").count() }
    }
    eng.saveChecked(docs, "chk", "amount >= 0")
    eng.beforeMark = () => ()
    val ok = eng.table("chk").select("rowNum").as[Long]
      .collect().toSet
    val bad = eng.table("chk__rejects").select("rowNum").as[Long]
      .collect().toSet
    assert(ok == Set(1L, 3L, 4L), "NULL check passes (SQLite CHECK)")
    assert(bad == Set(2L))
    intercept[IllegalArgumentException] {
      eng.saveChecked(Seq((1L, Seq(1L))).toDF("rowNum", "kids"),
        "nested", "rowNum > 0")
    }
  }

  test("embed_participation_ratio matches a brute in-JVM covariance " +
      "spectrum replay") {
    val d = "/root/testdata/sf0.001"
    val vecs = graft.sources.Tables.embeddings(spark, d)
      .select(expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .collect().map(_.getSeq[Double](0).toArray
        .map(x => math.floor(x * 1e6 + 0.5).toLong))
    val n = vecs.length; val dim = vecs(0).length
    val c12 = Array.ofDim[Long](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val si = vecs.map(v => BigInt(v(i))).sum
      val sj = vecs.map(v => BigInt(v(j))).sum
      val sij = vecs.map(v => BigInt(v(i)) * v(j)).sum
      c12(i)(j) = math.floor(
        (BigInt(n) * sij - si * sj).toDouble / (n.toDouble * n)).toLong
    }
    val tr = (0 until dim).map(i => c12(i)(i)).sum
    val tr2 = (for (i <- 0 until dim; j <- i until dim) yield
      BigInt(if (i == j) 1 else 2) * BigInt(c12(i)(j)) * c12(i)(j)).sum
    val wantPr = math.floor(
      tr.toDouble * tr / tr2.toDouble * 1e4 + 0.5) / 1e4
    val got = graft.ops.PipelineQueries
      .embedParticipationRatio(spark, d).collect()(0)
    assert(got.getAs[Long]("dims") == dim.toLong)
    assert(got.getAs[Double]("participation_ratio") == wantPr,
      s"PR ${got.getAs[Double]("participation_ratio")} != $wantPr")
  }

  test("dedup_cross_source equals the cluster-source matrix derived " +
      "from dedup_clusters itself") {
    val d = "/root/testdata/sf0.001"
    val labels = graft.ops.PipelineQueries.dedupClusters(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySet = labels.groupBy(_._2).values
      .map(_.map(m => srcOf(m._1)).toSet).toSeq
    val want = bySet.flatMap(ss =>
        ss.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq.sorted
    val got = graft.ops.PipelineQueries.dedupCrossSource(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    assert(got == want, "cross-source matrix != derivation from clusters")
  }

  test("engine_alter_column key matches an in-JVM replay of its " +
      "oracle semantics") {
    val d = "/root/testdata/sf0.001"
    val r = ops.JsonQueries.engineAlterColumn(spark, d).collect()(0)
    val src = graft.sources.Tables.orders(spark, d)
    val exp = src.agg(
      count(lit(1)).as("n"),
      sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("c"),
      sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("f"))
      .collect()(0)
    assert(r.getAs[String]("schema_cols") == "o_orderstatus,price,rowNum")
    assert(r.getAs[Long]("n_rows") == exp.getAs[Long]("n"))
    assert(r.getAs[Long]("price_cents") == exp.getAs[Long]("c"))
    assert(r.getAs[Long]("idx_alive") == 1L)
    assert(r.getAs[Long]("cidx_alive") == 0L)
    assert(r.getAs[Long]("f_rows") == exp.getAs[Long]("f"))
  }
}
