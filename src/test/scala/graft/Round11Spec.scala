package graft

import org.apache.spark.sql.functions._

import graft.ops.PipelineQueries

/** Round-11 regressions: bench self-correction (isolated re-measure +
  * band provenance), the streamAsofJoin epoch sentinel, span excision,
  * incremental cluster maintenance, hybrid RRF, the JPEG codec, and
  * the streaming ANN probe's state shape.
  */
class Round11Spec extends SparkSuite {

  test("band rule flags at 2x (the r10 18-keys-unflagged gap)") {
    val band = Map("a" -> 1.0, "b" -> 1.0, "c" -> 0.1)
    val best = Map(
      "a" -> 2.3,  // >2x and >0.5s absolute: flagged
      "b" -> 1.9,  // <2x: no flag
      "c" -> 0.3)  // >2x but <0.5s absolute: no flag
    assert(Bench.bandStallFlags(best, band) == Seq("a"))
  }

  test("parseBand ignores provenance keys; bandProvenance reads them") {
    val txt = """{"_sf_dir":"/root/testdata/sf0.1","_cpus":32,"q1":0.5}"""
    assert(Bench.parseBand(txt) == Map("q1" -> 0.5))
    assert(Bench.bandProvenance(txt).contains(("/root/testdata/sf0.1", 32)))
    assert(Bench.bandProvenance("""{"q1":0.5}""").isEmpty)
  }

  test("committed band file carries provenance for the bench config") {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_BAND.json")), "UTF-8")
    assert(Bench.bandProvenance(txt).nonEmpty,
      "BENCH_BAND.json lacks _sf_dir/_cpus provenance — reseed with " +
        "tools/mkband.py")
  }

  test("span excision merges overlapping windows into maximal spans") {
    val out = PipelineQueries.dedupSpanExcise(spark, sf).collect()
    assert(out.nonEmpty, "no duplicated spans at this scale")
    val census = PipelineQueries.dedupSubstringSpans(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_dup_windows")).toMap
    assert(out.map(_.getAs[Long]("doc_id")).toSet == census.keySet,
      "excision and census must cover the same docs")
    out.foreach { r =>
      val (id, n, rem, kept) = (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_spans"), r.getAs[Long]("chars_removed"),
        r.getAs[Long]("chars_kept"))
      assert(n >= 1 && rem >= 50 && kept >= 0, s"degenerate row $r")
      // each maximal span covers >= one 50-char window; merged spans
      // can never exceed the dup-window count x window width
      assert(n <= census(id), s"more spans than dup windows for doc $id")
      assert(rem <= census(id) * 50, s"span chars exceed window cover $id")
    }
  }

  test("span extents are disjoint, ordered, and sum to the census") {
    val spans = PipelineQueries.dedupSpanExtents(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end")))
    assert(spans.nonEmpty)
    spans.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._3 < b._2, s"overlapping/adjacent unmerged spans $a $b")
      }
    }
    val census = PipelineQueries.dedupSpanExcise(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("chars_removed"))).toMap
    val mine = spans.groupBy(_._1).map { case (d0, ss) =>
      d0 -> (ss.length.toLong, ss.map(s => s._3 - s._2).sum)
    }
    assert(mine == census, "extents disagree with the excision census")
  }

  test("prefix-filter setsim join equals the LSH verified pairs") {
    // the recall-1.0 certificate: the exact algorithm (provably
    // complete candidates) and the banded LSH pipeline must produce
    // the identical pair relation at this threshold
    val exact = PipelineQueries.dedupSetsimJoin(spark, sf).collect()
      .map(_.toSeq).toSeq
    val lsh = PipelineQueries.dedupMinhashLsh(spark, sf).collect()
      .map(_.toSeq).toSeq
    assert(exact == lsh, "prefix-filter join diverged from LSH pairs")
    assert(exact.nonEmpty)
  }

  test("incremental cluster fold equals the full re-cluster") {
    // the contract the shared dedup_clusters oracle checks at the
    // gate, asserted Spark-side too: folding the batch into the
    // old-corpus labels reproduces the union clustering exactly
    val inc = PipelineQueries.dedupIncrementalClusters(spark, sf)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("keeper")))
    val full = PipelineQueries.dedupClusters(spark, sf)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("keeper")))
    assert(inc.toSeq.sorted == full.toSeq.sorted)
  }

  test("incrementalKeepers merges old clusters through batch edges") {
    import spark.implicits._
    // old clusters {1,2} (keeper 1) and {5,6} (keeper 5); batch doc 3
    // bridges them; batch docs 10,11 form a fresh cluster; old doc 8
    // was never clustered and is pulled in by batch doc 7
    val oldLabels = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "keeper")
    val edges = Seq((3L, 2L), (3L, 6L), (10L, 11L), (7L, 8L))
      .toDF("id_a", "id_b")
    val got = graft.dedup.Components.incrementalKeepers(oldLabels, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (7L, 7L), (8L, 7L)))
    // no batch edges: labels pass through untouched
    val same = graft.dedup.Components.incrementalKeepers(oldLabels,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(same == Set((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)))
  }

  test("Shapley attribution satisfies efficiency and non-negativity") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Behavior.qShapleyAttribution(spark, sf).collect()
    assert(rows.map(_.getAs[String]("channel")).toSeq ==
      Seq("click", "signup", "view"))
    // v is monotone (containment counts), so every marginal is >= 0
    rows.foreach(r => assert(r.getAs[Long]("phi_num") >= 0))
    // efficiency: sum of credits = v(full) - v(empty), scaled by 3! = 6
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"))
    val firstP = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("tu")).as("pt"))
    val nConv = firstP.count()
    val nEmpty = firstP.as("p").join(
        ev.filter(col("event_type").isin("view", "click", "signup")).as("t"),
        expr("p.user_id = t.user_id AND t.tu < p.pt"), "left_anti").count()
    assert(rows.map(_.getAs[Long]("phi_num")).sum == (nConv - nEmpty) * 6,
      "efficiency axiom violated")
  }

  test("hybrid RRF fuses the two verified rankings") {
    val rows = PipelineQueries.textHybridRrf(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("rnk")).toSeq == (1L to 10L))
    rows.foreach { r =>
      val (lex, sem, score) = (r.getAs[Long]("lex_rnk"),
        r.getAs[Long]("sem_rnk"), r.getAs[Double]("rrf_score"))
      assert(lex != -1L || sem != -1L, "fused doc in neither list")
      val expect = (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
        (if (sem > 0) 1.0 / (60 + sem) else 0.0)
      assert(math.abs(score - expect) < 1e-6, s"rrf mismatch in $r")
    }
    // scores non-increasing in rank
    val scores = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("rrf_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("JPEG roundtrip: exact dims, bounded lossy error") {
    val rows = PipelineQueries.multimodalJpegCodec(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("width") == 8 + id % 24)
      assert(r.getAs[Long]("height") == 8 + (id * 7) % 24)
      assert(r.getAs[Boolean]("max_delta_ok"), s"max delta blown for $id")
      assert(r.getAs[Boolean]("mean_delta_ok"), s"mean delta blown for $id")
    }
    // the codec really is lossy — a zero-delta "JPEG" would mean the
    // stub replaced the real codec
    val anyLoss = rows.take(20).exists { r =>
      val id = r.getAs[Long]("doc_id")
      val (_, _, maxD, _) = graft.mm.Codecs.decodeJpegDelta(
        graft.mm.Codecs.encodeJpeg(id), id)
      maxD > 0
    }
    assert(anyLoss, "JPEG decode was pixel-perfect — codec not lossy?")
  }

  test("stream ANN probe equals the batch IVF-PQ answer, zero join state") {
    val streamed = graft.streaming.Events.streamAnnProbe(spark, sf)
      .collect().map(_.toSeq)
    val batch = PipelineQueries.annIvfPqTopK(spark, sf)
      .collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq,
      "streaming probe diverged from batch IVF-PQ")
    val ops = graft.streaming.StreamMeter.stateOps.get("graft_stream_annprobe")
    assert(ops != null && ops.nonEmpty, "no state-operator progress recorded")
    val joinOps = ops.filter(_._1.toLowerCase.contains("join"))
    assert(joinOps.isEmpty, s"unexpected join state operators: $joinOps")
    // shortlist state is bounded by the query batch, not the corpus
    val aggRows = ops.map(_._2).sum
    assert(aggRows <= 10, s"state rows $aggRows exceed query count")
  }

  test("SQ8 reconstruction stays within half a quantization step") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("cast(embedding as array<double>) as e")
      .as[Seq[Double]].collect()
    val dim = emb.head.length
    val mins = (0 until dim).map(i => emb.map(_(i)).min).toArray
    val maxs = (0 until dim).map(i => emb.map(_(i)).max).toArray
    // JVM-side replay of the kernel's contract: |recon - x| <= span/510
    // (half an 8-bit step) for every corpus value, and corpus-fitted
    // bounds mean codes never clamp
    emb.take(50).foreach { v =>
      v.indices.foreach { i =>
        val span = maxs(i) - mins(i)
        val recon =
          if (span == 0) mins(i)
          else mins(i) +
            math.floor((v(i) - mins(i)) * 255.0 / span + 0.5) * span / 255.0
        assert(math.abs(recon - v(i)) <= span / 510.0 + 1e-12,
          s"recon error beyond half-step at dim $i")
      }
    }
    val rows = PipelineQueries.annSq8TopK(spark, sf).collect()
    assert(rows.length == 50)
    // SQ8 at 64 dims is near-lossless: top-1 should agree with brute
    val brute = PipelineQueries.annBruteTopK(spark, sf).collect()
      .filter(_.getAs[Int]("rnk") == 1)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id")).toMap
    val sq8Top1 = rows.filter(_.getAs[Int]("rnk") == 1)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id")).toMap
    assert(sq8Top1 == brute, "SQ8 top-1 diverged from brute force")
  }

  test("embed clusters are mutual-kNN components of the knn graph") {
    val knn = PipelineQueries.embedKnnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id"))).toSet
    val mutual = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    val labels = PipelineQueries.dedupEmbedClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("keeper")).toMap
    assert(labels.nonEmpty)
    // every mutual edge's endpoints share a component, every labeled id
    // appears in some mutual edge, keeper is a member <= all members
    mutual.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"edge ($a,$b) split across clusters")
    }
    val touched = mutual.flatMap(e => Seq(e._1, e._2))
    assert(labels.keySet == touched, "labels != mutual-edge vertex set")
    labels.foreach { case (id, k) =>
      assert(k <= id && labels(k) == k, s"keeper $k not a root member")
    }
  }

  test("streamAsofJoin emits no epoch sentinels and matches the batch asof") {
    val out = graft.streaming.Events.streamAsofJoin(spark, sf)
    assert(out.filter(col("event_id") < 0).count() == 0,
      "epoch sentinel leaked into the presented result")
    assert(out.count() > 0)
  }

  test("streaming DSIR scorer equals the batch resample, multi-batch") {
    val streamed = graft.streaming.Events
      .streamImportanceScore(spark, sf).collect().map(_.toSeq)
    val batch = PipelineQueries.dataImportanceResample(spark, sf)
      .collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq,
      "streaming scorer diverged from the batch resample")
    val stats = graft.streaming.StreamMeter.stats.get("graft_stream_dsir")
    assert(stats != null && stats._3 >= 2,
      s"expected forced multi-batch, got $stats")
    val ops = graft.streaming.StreamMeter.stateOps.get("graft_stream_dsir")
    assert(ops != null,
      "no state-operator progress recorded for the DSIR stream")
    val joinOps = ops.filter(_._1.toLowerCase.contains("join"))
    assert(joinOps.isEmpty, s"unexpected join state operators: $joinOps")
  }

  test("bitmap-block overlap equals the direct id-level intersection") {
    val out = graft.ops.Warehouse.qBitmapOverlap(spark, sf).collect()
    assert(out.nonEmpty)
    val member = graft.sources.Tables.orders(spark, sf)
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_custkey"))
      .distinct().collect()
      .groupBy(_.getLong(0)).map { case (y, rs) =>
        y -> rs.map(_.getLong(1)).toSet }
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("yr_a"), r.getAs[Long]("yr_b"))
      val direct = (member(a) & member(b)).size.toLong
      assert(r.getAs[Long]("n_overlap") == direct,
        s"bitmap overlap for ($a,$b) != direct intersection $direct")
      assert(r.getAs[Long]("n_a") == member(a).size.toLong)
    }
  }

  test("importance resample scores only raw-pool docs, ordered desc") {
    val out = PipelineQueries.dataImportanceResample(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 100)
    assert(out.forall(_.getAs[String]("source") != "src0"),
      "target-slice doc leaked into the resampled pool")
    val scores = out.map(_.getAs[Double]("dsir_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not descending")
  }

  test("modularity terms reassemble from integers; q_total is constant") {
    val rows = graft.ops.Mining.qModularity(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("q_total")).distinct.length == 1,
      "q_total must be one global constant")
    rows.foreach { r =>
      // a community's internal edges can never exceed the pairs its
      // degree mass admits, and q_c is bounded by [-1, 1]
      val qc = r.getAs[Double]("q_c")
      assert(qc >= -1.0 && qc <= 1.0, s"q_c out of range: $r")
      assert(r.getAs[Long]("internal_edges") * 2 <=
        r.getAs[Long]("degree_sum"), s"internal edges exceed degree: $r")
    }
  }

  test("MMR picks 10 distinct shortlist members; step 1 is the top hit") {
    val picks = PipelineQueries.annMmrRerank(spark, sf).collect()
    assert(picks.length == 10)
    val ids = picks.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 10, "duplicate pick")
    // step-1 equals the relevance argmax (MMR with empty selected set)
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
    val top = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .withColumn("rel", round(graft.sim.Ann.cosine(col("qe"), col("e")), 4))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(1).collect().head.getAs[Long]("vec_id")
    assert(ids.head == top, "step 1 must be the pure-relevance argmax")
    // mmr scores never increase as the selected set grows
    val mmr = picks.map(_.getAs[Double]("mmr"))
    assert(mmr.zip(mmr.tail).forall { case (a, b) => a >= b },
      "mmr sequence must be non-increasing")
  }

  test("k-anonymity risk is monotone in k and totals are consistent") {
    val rows = graft.ops.Profiling.qKAnonymity(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(2L, 5L, 10L, 25L))
    val nCust = graft.sources.Tables.customer(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("total_rows") == nCust)
      assert(r.getAs[Long]("rows_at_risk") <= nCust)
      assert(r.getAs[Long]("groups_at_risk") <= r.getAs[Long]("total_groups"))
    }
    val risk = rows.map(r =>
      (r.getAs[Long]("groups_at_risk"), r.getAs[Long]("rows_at_risk")))
    assert(risk.zip(risk.tail).forall { case ((g1, r1), (g2, r2)) =>
      g1 <= g2 && r1 <= r2 }, "risk must be monotone in k")
  }

  test("FD census: the key dependency is clean, measures are coherent") {
    val rows = graft.ops.Profiling.qFdViolations(spark, sf).collect()
    assert(rows.length == 6)
    val key = rows.find(_.getAs[String]("fd") ==
      "orders:o_orderkey->o_orderstatus").get
    assert(key.getAs[Long]("n_violating") == 0L &&
      key.getAs[Long]("g3_remove") == 0L,
      "a key column can never violate an FD on its own table")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_violating") <= r.getAs[Long]("n_lhs"))
      assert(r.getAs[Long]("g3_remove") >= 0L &&
        r.getAs[Long]("g3_remove") < r.getAs[Long]("n_rows"))
      val rate = r.getAs[Double]("violation_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      // g3 = 0 exactly when nothing violates
      assert((r.getAs[Long]("g3_remove") == 0L) ==
        (r.getAs[Long]("n_violating") == 0L), s"g3/violating disagree: $r")
    }
  }

  test("IND discovery: genuine FKs report full containment") {
    val rows = graft.ops.Profiling.qInclusionDeps(spark, sf).collect()
      .map(r => r.getAs[String]("ind") -> r).toMap
    for (fk <- Seq("orders.o_custkey<customer.c_custkey",
        "lineitem.l_partkey<part.p_partkey",
        "supplier.s_nationkey<nation.n_nationkey")) {
      assert(rows(fk).getAs[Long]("holds") == 1L, s"$fk must hold")
      assert(rows(fk).getAs[Double]("containment") == 1.0)
    }
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_contained") <= r.getAs[Long]("n_distinct"))
    }
  }

  test("PSI terms are non-negative and the total row is their exact sum") {
    val rows = graft.ops.Profiling.qPsiDrift(spark, sf).collect()
    val (tot, buckets) = rows.partition(_.getAs[Long]("bucket") == -1L)
    assert(tot.length == 1 && buckets.nonEmpty)
    buckets.foreach(r => assert(r.getAs[Long]("psi_nano") >= 0L,
      s"PSI term must be non-negative: $r"))
    assert(tot.head.getAs[Long]("psi_nano") ==
      buckets.map(_.getAs[Long]("psi_nano")).sum,
      "total row must be the exact Long sum of bucket terms")
    assert(tot.head.getAs[Long]("n_ref") ==
      buckets.map(_.getAs[Long]("n_ref")).sum)
  }

  test("streaming PSI monitor equals the batch drift report exactly") {
    val batch = graft.ops.Profiling.qPsiDrift(spark, sf).collect()
      .map(_.toSeq).toSeq
    val streamed = graft.streaming.Events.streamDriftPsi(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "stream/batch PSI divergence")
  }

  test("conformal coverage lands near the 90% target per class") {
    val rows = graft.ops.Profiling.qConformalCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    val nOrders = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("n_cal") + r.getAs[Long]("n_test"))
      .sum == nOrders, "calibration + test halves must partition orders")
    rows.foreach { r =>
      val cov = r.getAs[Double]("coverage")
      // distribution-free guarantee is >= 0.9 in expectation; at this
      // class size the binomial noise is a few points
      assert(cov >= 0.75 && cov <= 1.0, s"coverage implausible: $r")
      assert(r.getAs[Double]("q_hat") >= 0.0)
    }
  }

  test("sweep-line interval overlap census equals the brute-force join") {
    import org.apache.spark.sql.functions.{broadcast => _, _}
    val li = graft.sources.Tables.lineitem(spark, sf).select(
      col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
      to_date(col("l_shipdate")).as("s"),
      date_add(to_date(col("l_shipdate")),
        col("l_quantity").cast("int")).as("e"))
    val brute = li.as("a").join(li.as("b"),
        col("a.l_partkey") === col("b.l_partkey") &&
          struct(col("a.l_orderkey"), col("a.l_linenumber")) <
            struct(col("b.l_orderkey"), col("b.l_linenumber")) &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .groupBy(col("a.l_partkey").as("pk"))
      .agg(count(lit(1)).as("n_pairs"))
      .join(graft.sources.Tables.part(spark, sf)
        .select(col("p_partkey"), col("p_brand")),
        col("pk") === col("p_partkey"))
      .groupBy(col("p_brand")).agg(sum(col("n_pairs")).as("n_pairs"))
      .collect().map(r => r.getAs[String]("p_brand") ->
        r.getAs[Long]("n_pairs")).toMap
    val swept = graft.ops.Profiling.qIntervalOverlapJoin(spark, sf)
      .collect()
    assert(swept.nonEmpty)
    swept.foreach { r =>
      val b = r.getAs[String]("p_brand")
      assert(r.getAs[Long]("n_overlap_pairs") == brute.getOrElse(b, 0L),
        s"sweep-line vs brute-force mismatch for $b")
      assert(r.getAs[Long]("max_concurrent") >= 1L)
    }
  }

  test("streaming OHLC bars equal the batch candlesticks exactly") {
    val batch = graft.ops.Behavior.qOhlcBars(spark, sf).collect()
    val streamed = graft.streaming.Events.streamOhlcBars(spark, sf)
      .collect()
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq,
      "stream/batch OHLC divergence")
    batch.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= h && o >= l && o <= h && c >= l && c <= h,
        s"candlestick invariant broken: $r")
    }
  }

  test("skew audit: totals reconcile and the key join is 1:1") {
    val rows = graft.ops.Profiling.qSkewAudit(spark, sf).collect()
      .map(r => r.getAs[String]("audit") -> r).toMap
    val nLi = graft.sources.Tables.lineitem(spark, sf).count()
    val ord = rows("lineitem.l_orderkey*orders")
    assert(ord.getAs[Long]("n_rows") == nLi)
    // every orderkey appears exactly once in orders, so the join
    // estimate must equal the fact row count exactly
    assert(ord.getAs[Long]("est_join_rows") == nLi)
    rows.values.foreach { r =>
      assert(r.getAs[Double]("skew_ratio") >= 1.0)
      assert(r.getAs[Long]("max_cnt") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Double]("hot_rows_share") >= 0.0 &&
        r.getAs[Double]("hot_rows_share") <= 1.0)
    }
  }

  test("ANF: reach grows with t, sketches land within the 5% contract") {
    val rows = graft.ops.Mining.qGraphAnf(spark, sf).collect()
      .map(r => r.getAs[Long]("t") -> r).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L).getAs[Long]("n_nodes") == rows(2L).getAs[Long]("n_nodes"))
    assert(rows(2L).getAs[Long]("exact_reach") >=
      rows(1L).getAs[Long]("exact_reach"), "reach must be monotone in t")
    // reach can never exceed n_nodes^2 (every node reaching every node)
    val n = rows(1L).getAs[Long]("n_nodes")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("exact_reach") <= n * n)
      assert(r.getAs[Boolean]("within_5pct"), s"sketch outside 5%: $r")
    }
  }

  test("abandoned carts: timeout flush equals the batch anti-join") {
    import org.apache.spark.sql.functions.{broadcast => _, _}
    val streamed = graft.streaming.Events.streamAbandonedCarts(spark, sf)
      .collect().map(_.toSeq).toSeq
    val e = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val clicks = e.filter(col("event_type") === "click")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("pus"))
    val batch = clicks.join(purchases,
        clicks("user_id") === purchases("user_id") &&
          col("pus") > col("us") &&
          col("pus") <= col("us") + 1800000000L, "left_anti")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_abandoned"),
        expr("min(us div 1000000)").as("first_abandoned_s"),
        expr("max(us div 1000000)").as("last_abandoned_s"))
      .orderBy(col("user_id"))
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "timeout flush diverges from batch anti-join")
    assert(streamed.nonEmpty)
  }

  test("FIFO allocation conserves quantity per brand") {
    val rows = graft.ops.Warehouse.qFifoAllocation(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val alloc = r.getAs[Long]("qty_allocated")
      assert(r.getAs[Long]("qty_unfilled") >= 0L &&
        r.getAs[Long]("qty_leftover") >= 0L, s"negative residual: $r")
      // every match consumes a lot or an issue: ≤ lots+issues−1 per
      // part, so the brand total is strictly below the event total
      assert(r.getAs[Long]("n_matches") <=
        r.getAs[Long]("n_lots") + r.getAs[Long]("n_issues"), s"$r")
      assert(alloc >= 0L)
    }
    // global conservation: allocated = Σ_part min(supply, demand)
    import org.apache.spark.sql.functions._
    val exp = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"))
      .agg(sum(when(col("l_linestatus") === "F",
          col("l_quantity").cast("long")).otherwise(0L)).as("s"),
        sum(when(col("l_linestatus") === "O",
          col("l_quantity").cast("long")).otherwise(0L)).as("d"))
      .agg(sum(least(col("s"), col("d")))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("qty_allocated")).sum == exp,
      "brand totals must sum to per-part min(supply, demand)")
  }

  test("nearest as-of is never farther than the backward as-of") {
    import org.apache.spark.sql.functions._
    val near = graft.ops.Analytics.qAsofNearest(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.get(r.fieldIndex("lag_s"))).map(_.asInstanceOf[Long]))
      .toMap
    // backward distances recomputed from the asof-join contract query
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_s"))
    val p = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_timestamp(col("ts")).as("pts"))
    val back = ev.join(p, Seq("user_id"), "left")
      .filter(col("pts") <= col("ts_s"))
      .groupBy(col("event_id"))
      .agg(min(col("ts_s") - col("pts")).as("bdist"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("bdist")).toMap
    back.foreach { case (id, bdist) =>
      val lag = near(id)
      assert(lag.isDefined, s"event $id lost its match")
      assert(math.abs(lag.get) <= bdist,
        s"nearest ($lag) farther than backward ($bdist) for event $id")
    }
  }

  test("group k-fold partitions users with zero cross-fold leakage") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.PipelineQueries.dataGroupKfold(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("n_cross_fold_users") == 0L))
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers,
      "folds must partition the user set")
    val share = rows.map(_.getAs[Double]("rows_share")).sum
    assert(math.abs(share - 1.0) < 1e-4)
  }

  test("split leakage buckets are coherent") {
    val rows = graft.ops.PipelineQueries.dataSplitLeakage(spark, sf)
      .collect()
    assert(rows.nonEmpty, "no verified near-dup pairs at this scale")
    rows.foreach { r =>
      val b = r.getAs[Long]("j_bucket")
      assert(b >= 4 && b <= 10, s"bucket outside tau>=0.5 range: $r")
      assert(r.getAs[Long]("n_cross") <= r.getAs[Long]("n_pairs"))
    }
  }

  test("bigram perplexity scores only candidate sources, positively") {
    val rows = graft.ops.PipelineQueries.textBigramPpl(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("source").length > 4,
        s"reference slice leaked into scoring: $r")
      assert(r.getAs[Double]("avg_nll") > 0.0)
      assert(r.getAs[Long]("nll_micro_total") > 0L)
    }
  }

  test("STL decomposition: per-weekday remainder means vanish") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Behavior.qStlDecompose(spark, sf)
    val dowMeans = out
      .groupBy(weekday(col("day").cast("date")).as("dow"))
      .agg(avg(col("remainder")).as("m")).collect()
    dowMeans.foreach(r => assert(math.abs(r.getAs[Double]("m")) < 1e-6,
      s"seasonal extraction must center the remainder: $r"))
    out.collect().foreach { r =>
      val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("remainder")
      assert(math.abs(recon - r.getAs[Double]("revenue")) < 1e-4,
        s"trend+seasonal+remainder must reconstruct revenue: $r")
    }
  }

  test("Theil-Sen equals the brute-force pairwise-slope median") {
    import org.apache.spark.sql.functions._
    val row = graft.ops.Behavior.qTheilSen(spark, sf).collect().head
    val daily = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(datediff(to_date(col("l_shipdate")),
        lit("1995-01-01").cast("date")).cast("long").as("x"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield {
      val (xa, ya) = daily(i); val (xb, yb) = daily(j)
      (math.floor((yb - ya) * 100.0 / (xb - xa) + 0.5).toLong, xa, xb)
    }).sorted
    assert(row.getAs[Long]("n_pairs") == slopes.length)
    val med = slopes(((slopes.length + 1) / 2 - 1).toInt)._1
    assert(row.getAs[Long]("slope_micro") == med,
      "rank-selected median must equal the brute-force median")
  }

  test("fixed-width roundtrip reproduces customer exactly") {
    val back = graft.sources.Formats.fixedWidthRoundtrip(spark, sf)
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    val orig = graft.sources.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(back == orig, "fixed-width roundtrip drift")
  }

  test("engine index lookup equals the full-scan filter") {
    import org.apache.spark.sql.functions._
    val wh = graft.util.Scratch.dir("graft_idx_spec").toString
    val eng = new graft.Engine(spark, wh)
    eng.save(graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("rowNum"), col("o_orderstatus"),
        col("o_totalprice")), "ord")
    eng.buildIndex("ord", "o_orderstatus")
    val viaIndex = eng.lookupByIndex("ord", "o_orderstatus", "P")
      .collect().map(_.getAs[Long]("rowNum")).sorted.toSeq
    val viaScan = eng.table("ord").filter(col("o_orderstatus") === "P")
      .collect().map(_.getAs[Long]("rowNum")).sorted.toSeq
    assert(viaIndex == viaScan && viaIndex.nonEmpty,
      "index probe must return exactly the scan's rows")
  }

  test("bitemporal: the revision wave appears only once recorded") {
    val rows = graft.ops.Warehouse.qBitemporalAsof(spark, sf).collect()
    val by = rows.groupBy(_.getAs[String]("known_at"))
    assert(by.keySet == Set("1996-07-01", "1996-12-01"))
    def tot(k: String) = by(k).map(_.getAs[Double]("total")).sum
    def n(k: String) = by(k).map(_.getAs[Long]("n")).sum
    // the later observer knows strictly more: orders recorded between
    // the two knowledge dates appear, and the +10% revision wave on
    // already-known orders becomes visible
    assert(n("1996-12-01") >= n("1996-07-01"))
    assert(tot("1996-12-01") > tot("1996-07-01"),
      "later knowledge must include the recorded revisions")
  }

  test("column profile: key column saturates distinctness and entropy") {
    val rows = graft.ops.Profiling.qColumnProfile(spark, sf).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val n = rows("c_custkey").getAs[Long]("n_rows")
    assert(rows.values.forall(_.getAs[Long]("n_rows") == n))
    assert(rows("c_custkey").getAs[Long]("n_distinct") == n)
    assert(rows("c_custkey").getAs[Long]("top_count") == 1L)
    // a uniform key column's entropy is ln(n) nats
    val h = rows("c_custkey").getAs[Long]("entropy_micro").toDouble / 1e6
    assert(math.abs(h - math.log(n.toDouble)) < 0.01, s"entropy $h")
    // a 5-value segment column caps at ln(5)
    val hs = rows("c_mktsegment").getAs[Long]("entropy_micro").toDouble / 1e6
    assert(hs <= math.log(5.0) + 1e-6 && hs > 1.0)
    rows.values.foreach(r => assert(r.getAs[Long]("n_null") == 0L))
  }

  test("rolling slope matches a brute-force OLS on one window") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Behavior.qRollingSlope(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(datediff(to_date(col("l_shipdate")),
        lit("1995-01-01").cast("date")).cast("long").as("x"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val probe = rows.last.getAs[Long]("day_idx")
    val win = daily.filter(_._1 <= probe).takeRight(30)
    assert(win.length == 30 && win.last._1 == probe)
    val n = 30L
    val (sx, sy) = (win.map(_._1).sum, win.map(_._2).sum)
    val sxy = win.map(p => p._1 * p._2).sum
    val sxx = win.map(p => p._1 * p._1).sum
    val expect = math.floor(
      (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx) * 100 + 0.5).toLong
    assert(rows.last.getAs[Long]("slope_micro") == expect)
  }

  test("Mahalanobis outliers exceed the expected chi-square mass") {
    val rows = graft.ops.PipelineQueries.embedOutlierMaha(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Long]("maha_micro"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dims") == 64L)
      // E[maha^2] = n_dims for the corpus; the top outliers must sit
      // above the mean mass
      assert(r.getAs[Double]("maha_sq") > 64.0, s"not an outlier: $r")
    }
  }

  test("ANOVA F equals a driver-side recomputation") {
    import org.apache.spark.sql.functions._
    val row = graft.ops.Mining.qAnovaF(spark, sf).collect().head
    val groups = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        round(col("o_totalprice")).cast("long").as("c"))
      .collect().groupBy(_.getString(0)).values
      .map(_.map(_.getLong(1)).toSeq).toSeq
    val k = groups.size.toLong
    val n = groups.map(_.size.toLong).sum
    val ssq = groups.map(g =>
      math.floor(g.sum.toDouble * g.sum / g.size + 0.5).toLong).sum
    val (sx, sxx) = (groups.flatten.sum,
      groups.flatten.map(x => x * x).sum)
    val ssb = ssq.toDouble - sx.toDouble * sx / n
    val ssw = sxx.toDouble - ssq.toDouble
    val f = math.floor(ssb / (k - 1) / (ssw / (n - k)) * 1e4 + 0.5) / 1e4
    assert(row.getAs[Long]("k") == k && row.getAs[Long]("n") == n)
    assert(row.getAs[Double]("f_stat") == f)
  }

  test("winsorized stats: bounds sit inside the data, clipping is real") {
    val rows = graft.ops.Mining.qWinsorizedStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      assert(p05 < p95)
      val m = r.getAs[Double]("winsorized_mean")
      assert(m >= p05 && m <= p95,
        s"winsorized mean must land inside the clip bounds: $r")
      // ~10% of rows get clipped at p05/p95 by construction
      val share = r.getAs[Double]("clip_share")
      assert(share > 0.05 && share < 0.15, s"implausible clip share: $r")
    }
  }

  test("multiline CSV roundtrip preserves every character") {
    import org.apache.spark.sql.functions._
    val row = graft.sources.Formats.csvMultiline(spark, sf).collect().head
    val expect = graft.sources.Tables.documents(spark, sf)
      .select(length(concat(substring(col("text"), 1, 40), lit("\n"),
        substring(col("text"), 41, 40))).as("l"))
      .agg(sum(col("l")), count(lit(1))).collect().head
    assert(row.getAs[Long]("total_chars") == expect.getLong(0))
    assert(row.getAs[Long]("n_rows") == expect.getLong(1))
    assert(row.getAs[Long]("n_with_newline") == expect.getLong(1),
      "every snippet must keep its embedded newline")
  }

  test("rebuilt index serves the post-upsert truth") {
    val row = graft.ops.JsonQueries.engineIndexRebuild(spark, sf)
      .collect().head
    import org.apache.spark.sql.functions._
    val base = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").as("tp"))
    val nFlipped = base.filter(col("k") % 5 === 0).count()
    val nInserted = base.filter(col("k") % 11 === 0).count()
    val nOrigP = base.filter(col("st") === "P" && col("k") % 5 =!= 0)
      .count()
    assert(row.getAs[Long]("n_orders") == nFlipped + nInserted + nOrigP,
      "index must see every flipped, inserted, and surviving P row")
    assert(row.getAs[Long]("max_key") > 10000000L,
      "an inserted far key must be reachable through the index")
  }

  test("SRM guard: a clean hash split passes, counts reconcile") {
    val row = graft.ops.Mining.qAbSrm(spark, sf).collect().head
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") == nUsers)
    assert(row.getAs[Double]("chi2") >= 0.0)
    // md5 is a fair coin: a genuine mismatch would mean the harness
    // itself broke
    assert(!row.getAs[Boolean]("srm_detected"),
      s"hash split flagged as broken: $row")
  }

  test("streaming SRM monitor equals the batch census exactly") {
    val streamed = graft.streaming.Events.streamSrm(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = graft.ops.Mining.qAbSrm(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "stream/batch SRM divergence")
  }

  test("budget select: the greedy prefix respects and saturates budget") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.PipelineQueries.dataBudgetSelect(spark, sf)
      .collect()
    val totalTok = rows.map(_.getAs[Long]("tokens_total")).sum
    val selTok = rows.map(_.getAs[Long]("tokens_selected")).sum
    val budget = totalTok / 5
    assert(selTok <= budget, "selection must fit the budget")
    // the greedy prefix stops only when the NEXT doc would overflow:
    // min doc is small, so the budget is nearly saturated
    assert(selTok > budget - 600, s"budget underused: $selTok vs $budget")
    assert(rows.map(_.getAs[Long]("n_selected")).sum > 0)
  }

  test("assortativity is a valid correlation") {
    val row = graft.ops.Mining.qAssortativity(spark, sf).collect().head
    val r = row.getAs[Double]("assortativity")
    assert(r >= -1.0 && r <= 1.0, s"not a correlation: $r")
    assert(row.getAs[Long]("n_edges") > 0L)
  }

  test("GIF roundtrip is lossless and equals the PNG decode") {
    val gif = graft.ops.PipelineQueries.multimodalGifCodec(spark, sf)
      .collect().map(_.toSeq).toSeq
    val png = graft.ops.PipelineQueries.multimodalPngCodec(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(gif == png,
      "indexed GIF must decode to the identical pixel checksums")
  }

  test("HITS authorities are a normalized, ordered top-20") {
    val rows = graft.ops.Mining.qHitsRanking(spark, sf).collect()
    val nSupp = graft.sources.Tables.supplier(spark, sf).count()
    assert(rows.length == math.min(20L, nSupp))
    val scores = rows.map(_.getAs[Double]("authority"))
    assert(scores.forall(a => a > 0.0 && a < 1.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "authorities must be emitted in rank order")
    assert(scores.sum <= 1.0 + 1e-9, "top-20 of an L1-normalized vector")
  }
}
