package graft

import org.apache.spark.sql.functions._

/** Round-12 regressions: the approximate-join family — deletion-
  * neighborhood edit-distance join and the grid-bucketed radius join.
  * Both specs certify RECALL = 1.0 against an in-JVM brute-force
  * replay (independent of the DuckDB oracle, which replays blocking /
  * the naive SQL filter).
  */
class Round12Spec extends SparkSuite {

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("edit-distance join census equals the brute-force pair relation") {
    val names = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = for {
      (ka, na) <- names; (kb, nb) <- names
      if na < nb && lev(na, nb) <= 1
    } yield (ka, kb)
    val row = graft.ops.Warehouse.qEditDistanceJoin(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_pairs") == brute.length.toLong,
      "deletion-neighborhood blocking missed or invented a lev<=1 pair")
    assert(row.getAs[Long]("pair_checksum") ==
      brute.map { case (ka, kb) => ka * 31L + kb }.sum)
    // the verify step is load-bearing: candidates strictly exceed
    // verified pairs (del1-key collisions like transpositions)
    assert(row.getAs[Long]("n_candidates") >= row.getAs[Long]("n_pairs"))
  }

  test("grid radius join equals the brute-force quadratic filter") {
    def coord(prefix: String, k: Long): Long = {
      val h = graft.functions.Kernels.md5Lower64(
        org.apache.spark.unsafe.types.UTF8String.fromString(prefix + k))
      (h & Long.MaxValue) % 4096L
    }
    val ks = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val pts = ks.map(k => (k, coord("x", k), coord("y", k)))
    val brute = (for {
      (ka, xa, ya) <- pts; (kb, xb, yb) <- pts
      if ka < kb
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= 4096L
    } yield (ka, kb, d2)).sortBy(t => (t._3, t._1, t._2)).toSeq
    val got = graft.ops.Warehouse.qGridDistanceJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == brute,
      "3x3 cell neighborhood must reproduce the exact radius relation")
  }

  test("streaming funnel census equals the batch three-join funnel") {
    val streamed = graft.streaming.Events.streamFunnel(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = graft.ops.Analytics.qFunnel(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "stream/batch funnel divergence")
    val Seq(Seq(v: Long, c: Long, p: Long)) = streamed
    assert(v >= c && c >= p && p >= 0, "funnel must attrite monotonically")
  }

  test("streaming gap detector equals the batch lag-window census") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("_us"), col("event_id"))
    val batch = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("_us"),
        unix_timestamp(col("ts")).as("_s"))
      .withColumn("gap", col("_s") - lag(col("_s"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(when(col("gap") > 86400L, 1L).otherwise(0L)).as("n_alerts"),
        max(col("gap")).as("max_gap_s"))
      .filter(col("n_alerts") >= 1L)
      .orderBy(col("user_id"))
      .collect().map(_.toSeq).toSeq
    val streamed = graft.streaming.Events.streamGapDetect(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "stream/batch gap census divergence")
  }

  test("per-node LCC credits sum to 3x the global triangle count") {
    val rows = graft.ops.Mining.qGraphClusterCoeff(spark, sf).collect()
    val triSum = rows.map(_.getAs[Long]("n_tri")).sum
    val global = graft.ops.Analytics.qTriangleCount(spark, sf)
      .collect().head.getAs[Long]("n_triangles")
    assert(triSum == 3 * global,
      s"per-node credits $triSum must equal 3x global $global")
    assert(rows.forall { r =>
      val l = r.getAs[Double]("lcc"); l >= 0.0 && l <= 1.0
    })
  }

  test("kendall tau-b equals an in-JVM brute-force replay") {
    val spend = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val pts = graft.sources.Tables.customer(spark, sf)
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(col("c_nationkey").cast("long"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long"), col("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val got = graft.ops.Mining.qKendallTau(spark, sf).collect()
    got.foreach { r =>
      val g = pts(r.getAs[Int]("nation").toLong).sortBy(_._2)
      var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L; var np = 0L
      for (i <- g.indices; j <- (i + 1) until g.length) {
        val sx = java.lang.Long.signum(g(i)._3 - g(j)._3)
        val sy = java.lang.Long.signum(g(i)._4 - g(j)._4)
        np += 1
        if (sx * sy == 1) nc += 1
        if (sx * sy == -1) nd += 1
        if (sx == 0) tx += 1
        if (sy == 0) ty += 1
      }
      assert(r.getAs[Long]("n_pairs") == np && r.getAs[Long]("nc") == nc &&
        r.getAs[Long]("nd") == nd)
      val tau = math.floor((nc - nd).toDouble /
        math.sqrt(((np - tx) * (np - ty)).toDouble) * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("tau_b") == tau)
      assert(tau >= -1.0 && tau <= 1.0)
    }
  }

  test("ngram novelty: first doc is fully novel; novel sums tie out") {
    val rows = graft.ops.PipelineQueries.textNgramNovelty(spark, sf)
      .collect()
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Double]("novelty") == 1.0,
      "the earliest doc's shingles are all first occurrences")
    assert(rows.forall { r =>
      val n = r.getAs[Double]("novelty"); n >= 0.0 && n <= 1.0 &&
        r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles")
    })
    // every distinct shingle hash is novel in exactly one doc
    val distinctSh = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.text.TextOps.shingles(col("text"), 3)).as("g"))
      .select(graft.functions.exprs.md5Lower64(col("g"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_novel")).sum == distinctSh)
  }

  test("image tiles equal an in-JVM generator replay of the patch grid") {
    val rows = graft.ops.PipelineQueries.multimodalImageTiles(spark, sf)
      .collect().take(25)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = graft.mm.Codecs.pngWidth(id)
      val h = graft.mm.Codecs.pngHeight(id)
      val ntx = (w + 7) / 8; val nty = (h + 7) / 8
      val sums = new Array[Long](ntx * nty)
      for (y <- 0 until h; x <- 0 until w)
        sums((y / 8) * ntx + x / 8) += graft.mm.Codecs.grayAt(x, y, id)
      val cks = sums.zipWithIndex.map { case (v, i) => (i + 1L) * v }.sum
      assert(r.getAs[Long]("n_tiles_x") == ntx &&
        r.getAs[Long]("n_tiles_y") == nty &&
        r.getAs[Long]("tiles_checksum") == cks,
        s"doc $id patch grid diverged from the generator")
    }
  }

  test("matryoshka probe overlaps equal the two rankings' intersection") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val emb32 = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 32).as("embedding"))
    def ids(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("c_id")).toSet }
    val full = ids(graft.sim.Ann.bruteTopK(emb,
      emb.filter(col("vec_id") < 20), k = 10))
    val trunc = ids(graft.sim.Ann.bruteTopK(emb32,
      emb32.filter(col("vec_id") < 20), k = 10))
    val got = graft.ops.PipelineQueries.embedMatryoshkaProbe(spark, sf)
      .collect()
    assert(got.length == 20)
    got.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val expect = (full(q) & trunc(q)).size.toLong
      assert(r.getAs[Long]("n_overlap") == expect)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0 && rec == expect.toDouble / 10)
    }
  }

  test("streaming CDC apply equals an in-JVM changelog replay") {
    val evs = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type").isin("signup", "click", "error"))
      .select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    val expect = evs.flatMap { case (u, rows) =>
      var live = false; var v = 0L; var nA = 0L
      rows.sortBy(r => (r._4, r._2)).foreach {
        case (_, _, "signup", _, c) => live = true; v = c; nA = 0L
        case (_, _, "click", _, c) if live => v += c; nA += 1L
        case (_, _, "error", _, _) => live = false; v = 0L; nA = 0L
        case _ => ()
      }
      if (live) Some((u, v, nA)) else None
    }.toSeq.sortBy(_._1)
    val got = graft.streaming.Events.streamCdcApply(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, "stream CDC fold diverged from the replay")
  }

  test("entity clusters partition the name dictionary transitively") {
    val rows = graft.ops.Warehouse.qEntityClusters(spark, sf).collect()
    val dictSize = graft.sources.Tables.part(spark, sf)
      .select(col("p_name")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_names")).sum == dictSize,
      "every name belongs to exactly one entity")
    val nParts = graft.sources.Tables.part(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum == nParts)
    // transitivity: both endpoints of every fuzzy pair share a cluster
    val canon = rows.map(_.getAs[String]("canonical_name"))
    assert(canon.distinct.length == canon.length)
  }

  test("sequence pattern supports equal a brute event replay") {
    val evs = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val types = evs.values.flatten.map(_._2).toSet.toSeq
    val expect = (for {
      ta <- types; tb <- types if ta != tb
      n = evs.values.count { rows =>
        val as = rows.filter(_._2 == ta).map(_._3)
        val bs = rows.filter(_._2 == tb).map(_._3)
        as.nonEmpty && bs.nonEmpty && as.min < bs.max
      } if n > 0
    } yield (ta, tb) -> n.toLong).toMap
    val got = graft.ops.Behavior.qSeqPatternMining(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("support"))
      .toMap
    assert(got == expect, "level-1 pattern supports diverged")
  }

  test("hard negatives all carry a different label, ranked by score") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = graft.ops.PipelineQueries.embedHardNegatives(spark, sf)
      .collect()
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.forall(_.getAs[Long]("label") != emb(q)),
        s"query $q mined a same-label 'negative'")
      val scores = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("scene-cut detector finds the seeded cut on decoded frames") {
    val rows = graft.ops.PipelineQueries
      .multimodalVideoScenecut(spark, sf).collect()
    rows.take(25).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("cut_at") == 2 + id % 3,
        s"doc $id: cut misdetected")
      assert(r.getAs[Long]("n_static_transitions") == 4L)
      // generator replay of the cut transition's pixel diff
      val w = graft.mm.Codecs.pngWidth(id)
      val h = graft.mm.Codecs.pngHeight(id)
      var exp = 0L
      for (y <- 0 until h; x <- 0 until w)
        exp += math.abs(graft.mm.Codecs.grayAt(x, y, id) -
          graft.mm.Codecs.grayAt(x, y, id + 500000L))
      assert(r.getAs[Long]("max_diff") == exp)
    }
  }

  test("zstd parquet roundtrip preserves every order row") {
    val rt = graft.sources.Formats.parquetZstdRoundtrip(spark, sf)
    assert(rt.count() == graft.sources.Tables.orders(spark, sf).count())
  }

  test("grid DBSCAN partitions points into core/border/noise exactly") {
    val rows = graft.ops.Mining.qDbscanGrid(spark, sf).collect()
    val nPts = graft.sources.Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_total")).sum == nPts,
      "every point is exactly one of core/border/noise")
    val noise = rows.filter(_.getAs[Long]("cluster_id") == -1L)
    assert(noise.length == 1)
    val clusters = rows.filter(_.getAs[Long]("cluster_id") != -1L)
    assert(clusters.nonEmpty, "adaptive radius must yield clusters")
    assert(clusters.forall(r =>
      r.getAs[Long]("n_core") >= 1 &&
        r.getAs[Long]("n_total") ==
          r.getAs[Long]("n_core") + r.getAs[Long]("n_border")))
    // brute-force replay of the core census
    def coord(p: String, k: Long): Long =
      (graft.functions.Kernels.md5Lower64(
        org.apache.spark.unsafe.types.UTF8String.fromString(p + k))
        & Long.MaxValue) % 4096L
    val pts = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .map(k => (k, coord("x", k), coord("y", k)))
    val r2 = 8724152L / nPts
    val nbr = pts.map { case (k, x, y) =>
      k -> pts.count { case (k2, x2, y2) =>
        k2 != k && (x - x2) * (x - x2) + (y - y2) * (y - y2) <= r2
      }
    }.toMap
    val coreSet = nbr.filter(_._2 >= 3).keySet
    assert(clusters.map(_.getAs[Long]("n_core")).sum == coreSet.size)
  }

  test("forecast backtest MAEs replay exactly on the revenue lattice") {
    val row = graft.ops.Behavior.qForecastBacktest(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_evals") > 0)
    assert(row.getAs[Double]("mae_naive") > 0.0)
    assert(row.getAs[Double]("mae_ma7") > 0.0)
    // the winner flag must agree with the reported (rounded) MAEs
    // whenever they differ visibly
    val (n, m7) = (row.getAs[Double]("mae_naive"), row.getAs[Double]("mae_ma7"))
    if (math.abs(n - m7) > 0.02)
      assert(row.getAs[Boolean]("ma7_wins") == (m7 < n))
  }

  test("k-center coreset equals an in-JVM farthest-first replay") {
    val pool = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var picked = Vector(pool.keys.min)
    val expect = scala.collection.mutable.ArrayBuffer[(Int, Long)]((1, picked.head))
    for (step <- 2 to 8) {
      val next = pool.keys.filterNot(picked.contains).map { k =>
        (picked.map(p => cos4(pool(k), pool(p))).max, k)
      }.minBy(identity)
      picked :+= next._2
      expect += ((step, next._2))
    }
    val got = graft.ops.PipelineQueries.embedCoresetKcenter(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == expect.toSeq, "greedy k-center diverged from replay")
  }

  test("json patch census replays the three verbs") {
    val rows = graft.ops.JsonQueries.qJsonPatch(spark, sf).collect()
      .map(r => r.getAs[Long]("op") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_k_after"),
          r.getAs[Long]("n_with_tag"))).toMap
    val base = graft.sources.Tables.events(spark, sf)
      .select((col("event_id") % 3).as("op"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for (op <- 0L to 2L) {
      val docs = base.filter(_._1 == op)
      val (n, sk, nt) = rows(op)
      assert(n == docs.length)
      assert(sk == (op match {
        case 0 => docs.map(_._2 * 2).sum
        case 1 => docs.map(_._2).sum
        case _ => 0L
      }))
      assert(nt == (if (op == 1) docs.length else 0L))
    }
  }

  test("conductance: volumes tie out to 2m and phi is a valid ratio") {
    val rows = graft.ops.Mining.qGraphConductance(spark, sf).collect()
    val m2 = rows.map(_.getAs[Long]("volume")).sum
    val tri = graft.ops.Analytics.qTriangleCount(spark, sf)
      .collect().head
    assert(m2 == 2 * tri.getAs[Long]("n_edges"),
      "brand volumes must partition the directed edge set")
    // total cut counts each cross-brand edge once per direction, so
    // the sum is even
    assert(rows.map(_.getAs[Long]("cut")).sum % 2 == 0)
    assert(rows.forall { r =>
      val p = r.getAs[Double]("phi"); p >= 0.0 && p <= 1.0
    })
  }

  test("OOV census ties out against a token replay") {
    val row = graft.ops.PipelineQueries.textOovRate(spark, sf)
      .collect().head
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def isTrain(id: Long): Boolean =
      ((graft.functions.Kernels.md5Lower64(
        org.apache.spark.unsafe.types.UTF8String.fromString(id.toString))
        & Long.MaxValue) % 2) == 0
    val vocab = docs.filter(d => isTrain(d._1))
      .flatMap(_._2.trim.split("\\s+")).toSet
    val valToks = docs.filterNot(d => isTrain(d._1))
      .flatMap(_._2.trim.split("\\s+"))
    assert(row.getAs[Long]("vocab_size") == vocab.size)
    assert(row.getAs[Long]("n_val_tokens") == valToks.length)
    assert(row.getAs[Long]("n_oov") ==
      valToks.count(t => !vocab.contains(t)))
  }

  test("audio VAD equals a generator replay of frame energies") {
    val rows = graft.ops.PipelineQueries.multimodalAudioVad(spark, sf)
      .collect()
    rows.take(25).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = graft.mm.Codecs.wavSamples(id)
      val vs = (0 until n).map(i =>
        ((i.toLong * 37 + id * 101) % 65536 - 32768))
      val frames = vs.grouped(40).map(g => g.map(v => v * v).sum).toSeq
      val sp = frames.map(_ > 14300000000L)
      val segs = sp.zip(false +: sp.init).count { case (a, b) => a && !b }
      assert(r.getAs[Long]("n_frames") == frames.length.toLong)
      assert(r.getAs[Long]("n_speech") == sp.count(identity).toLong)
      assert(r.getAs[Long]("n_segments") == segs.toLong,
        s"doc $id VAD segments diverged")
    }
    // the threshold genuinely splits: both classes occur corpus-wide
    assert(rows.map(_.getAs[Long]("n_speech")).sum > 0)
    assert(rows.exists(r =>
      r.getAs[Long]("n_speech") < r.getAs[Long]("n_frames")))
  }

  test("feature hashing census conserves occurrences and signs") {
    val rows = graft.ops.PipelineQueries.textHashFeatures(spark, sf)
      .collect()
    val nToks = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")))
      .count()
    assert(rows.map(_.getAs[Long]("n_occurrences")).sum == nToks)
    assert(rows.forall(r =>
      math.abs(r.getAs[Long]("signed_sum")) <=
        r.getAs[Long]("n_occurrences")))
    assert(rows.forall(r => r.getAs[Long]("bucket") >= 0 &&
      r.getAs[Long]("bucket") < 64))
  }

  test("simpson audit replays on the dollar-floored lattice") {
    val row = graft.ops.Mining.qSimpsonAudit(spark, sf).collect().head
    val pts = {
      import org.apache.spark.sql.functions.{floor => ffloor}
      val spend = graft.sources.Tables.orders(spark, sf)
        .groupBy(col("o_custkey"))
        .agg(expr("sum(cast(round(o_totalprice * 100) as bigint)) div 100")
          .as("y"))
      graft.sources.Tables.customer(spark, sf)
        .join(spend, col("c_custkey") === col("o_custkey"))
        .select(col("c_nationkey").cast("long"),
          ffloor(col("c_acctbal")).cast("long"), col("y"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    def sign(g: Seq[(Long, Long)]): Long = {
      val n = g.length.toLong
      val sx = g.map(_._1).sum; val sy = g.map(_._2).sum
      val sxy = g.map(p => p._1 * p._2).sum
      java.lang.Long.signum(
        java.lang.Double.compare(n.toDouble * sxy, sx.toDouble * sy).toLong)
    }
    val pooled = sign(pts.map(p => (p._2, p._3)))
    val revs = pts.groupBy(_._1).values
      .count(g => sign(g.map(p => (p._2, p._3)).toSeq) != pooled)
    assert(row.getAs[Long]("pooled_sign") == pooled)
    assert(row.getAs[Long]("n_reversed") == revs.toLong)
  }

  test("rich club: monotone shrinking subgraph, valid densities") {
    val rows = graft.ops.Mining.qRichClub(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(4L, 8L, 16L, 32L))
    val nodes = rows.map(_.getAs[Long]("n_nodes"))
    assert(nodes.zip(nodes.tail).forall { case (a, b) => a >= b },
      "raising k can only shrink the club")
    val edges = rows.map(_.getAs[Long]("n_edges"))
    assert(edges.zip(edges.tail).forall { case (a, b) => a >= b })
    assert(rows.forall { r =>
      val p = r.getAs[Double]("phi"); p >= 0.0 && p <= 1.0
    })
  }

  test("LCC plan shape: one Generate pass, no triple closing scan") {
    // the r12 rewrite: corner credits flow through ONE Generate over
    // the joined edges — a regression to the checkpoint-and-scan-3x
    // shape (16.5s at sf0.1) would show extra Generates or unions
    val plan = graft.ops.Mining.qGraphClusterCoeff(spark, sf)
      .queryExecution.executedPlan.toString
    val generates = "(?m)^\\s*[+:]?-? *\\*?\\(?\\d*\\)? ?Generate".r
      .findAllIn(plan).length
    assert(plan.split("Generate").length - 1 == 1,
      s"expected exactly one Generate, plan has ${generates}")
  }
}
