package graft

import org.apache.spark.sql.functions._

import graft.ops.{Mining, PipelineQueries}

/** Round-10 regressions: the bench stall-band rule (the r9 official
  * run's blind spot), the A-ES weighted reservoir, the approx-path
  * contract rows, and the post-filter streamScd2Build guard. */
class Round10Spec extends SparkSuite {

  test("band rule flags the both-runs-slow stall min-of-2 trusts") {
    // BENCH_r09 replay: source_orc_roundtrip ran raw [45.4, 24.0] —
    // the run-disagreement rule saw ratio <3x and stayed silent while
    // the isolated reference is 0.51s. The band rule must flag it.
    val band = Map("source_orc_roundtrip" -> 0.51, "q_weighted_median" -> 1.13,
      "type_infer" -> 0.05, "q_topk_global" -> 0.15)
    val best = Map(
      "source_orc_roundtrip" -> 24.0, // stall spanning both runs
      "q_weighted_median" -> 1.30,    // within band: no flag
      "type_infer" -> 0.20,           // >3x but <0.5s absolute: no flag
      "q_topk_global" -> -1.0,        // failure sentinel: never flagged
      "brand_new_key" -> 9.9)         // no band yet: no flag
    assert(Bench.bandStallFlags(best, band) == Seq("source_orc_roundtrip"))
    assert(Bench.bandStallFlags(best, Map.empty).isEmpty)
  }

  test("committed BENCH_BAND.json parses and covers every query key") {
    val band = Bench.parseBand(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("BENCH_BAND.json")), "UTF-8"))
    val missing = SparkEntry.queries.keySet -- band.keySet
    assert(missing.isEmpty,
      s"keys without a stall band (reseed tools/mkband.py): $missing")
    assert(band.values.forall(v => v > 0 && v < 60),
      "implausible band entry")
  }

  test("parseBand reads the flat committed band file") {
    val m = Bench.parseBand(
      """{"q1_pricing":0.123,"q_ewma":1.5e-1,"stream_topk":2.0}""")
    assert(m == Map("q1_pricing" -> 0.123, "q_ewma" -> 0.15,
      "stream_topk" -> 2.0))
  }

  test("weighted reservoir equals the A-ES reference draw") {
    // independent JVM replay of the exponential race: same portable
    // uniform, same key, smallest-50 by (key, doc_id)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0)
    val expected = docs.map { case (id, w) =>
      val h = graft.functions.Kernels.md5Lower64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$id:wr")) &
        ((1L << 50) - 1)
      val u = (h + 1).toDouble / 1125899906842624.0
      (-math.log(u) / w, id, w)
    }.sortBy(t => (t._1, t._2)).take(50)
    val got = PipelineQueries.sampleWeightedReservoir(spark, sf).collect()
    assert(got.length == 50)
    got.zip(expected).zipWithIndex.foreach { case ((row, (k, id, w)), i) =>
      assert(row.getLong(0) == i + 1L)
      assert(row.getLong(1) == id, s"rank ${i + 1} picked wrong doc")
      assert(row.getLong(2) == w)
      assert(row.getLong(3) == math.floor(k * 1e12 + 0.5).toLong)
    }
    // weighting sanity: the draw must skew long — selected docs are
    // on average longer than the corpus
    val meanSel = expected.map(_._3).sum.toDouble / expected.length
    val meanAll = docs.map(_._2).sum.toDouble / docs.length
    assert(meanSel > meanAll, "weighted draw did not favor long docs")
  }

  test("approx contract rows hold their error bounds") {
    Mining.qAnomalyMadApprox(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(r.fieldIndex("med_within_1pct")))
      assert(r.getBoolean(r.fieldIndex("mad_within_1pct")))
      assert(r.getBoolean(r.fieldIndex("outliers_within_tol")))
    }
    Mining.qQuantileHistApprox(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(r.fieldIndex("p50_within_1pct")))
      assert(r.getBoolean(r.fieldIndex("p99_within_1pct")))
    }
  }

  test("Holt-Winters fold equals an independent JVM replay") {
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("y"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val expected = daily.groupBy(_._1).map { case (et, rows) =>
      val ser = rows.sortBy(_._2.toEpochDay)
      val d0 = ser.head._2.toEpochDay
      var l = ser.head._3; var b = 0.0; var sse = 0.0
      val sArr = Array.fill(7)(0.0)
      ser.tail.foreach { case (_, day, y) =>
        val t = (day.toEpochDay - d0).toInt
        val sc = sArr(t % 7)
        val f = l + b + sc
        val lN = 0.5 * (y - sc) + 0.5 * (l + b)
        val bN = 0.25 * (lN - l) + 0.75 * b
        sArr(t % 7) = 0.25 * (y - lN) + 0.75 * sc
        sse += (y - f) * (y - f)
        l = lN; b = bN
      }
      val tNext = ((ser.last._2.toEpochDay - d0).toInt + 1) % 7
      def sc(x: Double) = math.floor(x * 1e4 + 0.5).toLong
      et -> (ser.length.toLong, sc(l), sc(b), sc(l + b + sArr(tNext)),
        if (ser.length > 1) sc(sse / (ser.length - 1)) else 0L)
    }
    val got = graft.ops.Behavior.qHoltWinters(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, lv, tr, fc, mse) = expected(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == lv, s"${r.getString(0)} level")
      assert(r.getLong(3) == tr, s"${r.getString(0)} trend")
      assert(r.getLong(4) == fc, s"${r.getString(0)} forecast")
      assert(r.getLong(5) == mse, s"${r.getString(0)} mse")
    }
  }

  test("KLL merged-sketch estimates hold their rank bound") {
    val r = PipelineQueries.kllQuantileMerge(spark, sf).head
    Seq("r25_within_2pct", "r50_within_2pct", "r90_within_2pct",
      "r99_within_2pct").foreach(f =>
      assert(r.getBoolean(r.fieldIndex(f)), f))
  }

  test("stream as-of join equals the batch window formulation") {
    import org.apache.spark.sql.expressions.Window
    val e = graft.sources.Tables.events(spark, sf)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        unix_timestamp(col("ts")).as("ts_s"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val batch = e
      .withColumn("click_ts", last(
        when(col("event_type") === "click", col("ts_s")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_s"),
        coalesce(col("click_ts"), lit(-1L)).as("click_ts_s"),
        coalesce(col("ts_s") - col("click_ts"), lit(-1L)).as("lag_s"))
      .orderBy(col("user_id"), col("event_id"))
      .collect().toSeq
    val stream = graft.streaming.Events.streamAsofJoin(spark, sf)
      .collect().toSeq
    assert(stream == batch, "stream/batch as-of parity broke")
  }

  test("stream SCD2 converges to the batch build under the new guard") {
    val batch = graft.ops.Analytics.qScd2Build(spark, sf).collect().toSeq
    val stream = graft.streaming.Events.streamScd2Build(spark, sf)
      .collect().toSeq
    assert(stream == batch, "stream/batch SCD2 parity broke")
  }

  test("streaming CMS converges bit-identically to the batch sketch") {
    // linearity: chopping the input into micro-batches must not move
    // a single counter, so the streaming top-10 equals batch exactly
    val batch = PipelineQueries.countMinTopK(spark, sf).collect().toSeq
    val stream = graft.streaming.Events.streamCountMinTopk(spark, sf)
      .collect().toSeq
    assert(stream == batch, "stream/batch CMS divergence")
    val (_, _, nBatches) =
      graft.streaming.StreamMeter.stats.get("graft_stream_cms")
    assert(nBatches > 1, s"mergeability unproven: ran $nBatches batch(es)")
  }

  test("streaming KLL holds the rank bound across micro-batches") {
    val r = graft.streaming.Events.streamKllQuantiles(spark, sf).collect()
    assert(r.length == 1)
    Seq("r25_within_2pct", "r50_within_2pct", "r90_within_2pct",
      "r99_within_2pct").foreach(c =>
      assert(r(0).getAs[Boolean](c), s"$c false"))
    val (_, _, nBatches) =
      graft.streaming.StreamMeter.stats.get("graft_stream_kll")
    assert(nBatches > 1, s"mergeability unproven: ran $nBatches batch(es)")
  }

  test("streaming theta distinct equals exact counts across batches") {
    val r = graft.streaming.Events.streamThetaDistinct(spark, sf).collect()
    assert(r.length == 5, s"expected 5 event types, got ${r.length}")
    r.foreach { row =>
      assert(row.getAs[Long]("est_users") == row.getAs[Long]("n_exact"),
        s"theta not exact below nominal: $row")
      assert(row.getAs[Boolean]("within_1pct"))
    }
    val (_, _, nBatches) =
      graft.streaming.StreamMeter.stats.get("graft_stream_theta")
    assert(nBatches > 1, s"mergeability unproven: ran $nBatches batch(es)")
  }

  test("substring spans equal an independent JVM replay") {
    val out = PipelineQueries.dedupSubstringSpans(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Long]("dup_frac_bp")))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def windows(t: String): Seq[Long] =
      if (t.length < 50) Seq.empty
      else (0 to (t.length - 50) / 10).map { i =>
        graft.functions.Kernels.md5Lower64(
          org.apache.spark.unsafe.types.UTF8String.fromString(
            t.substring(i * 10, i * 10 + 50)))
      }
    val perDoc = docs.map { case (id, t) => id -> windows(t) }
    val dupSet = perDoc.flatMap { case (id, hs) => hs.distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.length > 1).keySet
    val expect = perDoc.collect {
      case (id, hs) if hs.count(dupSet) > 0 =>
        val nd = hs.count(dupSet).toLong
        id -> (hs.length.toLong, nd,
          math.floor(nd * 10000.0 / hs.length + 0.5).toLong)
    }.toMap
    assert(expect.nonEmpty, "replay found no duplicated spans at all")
    assert(out == expect, s"span mismatch: query=${out.size} rows, " +
      s"replay=${expect.size} rows")
  }

  test("theta set-algebra estimates are exact below the sketch nominal") {
    val rows = PipelineQueries.thetaSetOps(spark, sf).collect()
    assert(rows.length == 10, s"expected C(5,2)=10 pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("and_ok") && r.getAs[Boolean]("or_ok")
        && r.getAs[Boolean]("diff_ok"), s"bound flag false in $r")
      assert(r.getAs[Long]("n_or_exact") >= r.getAs[Long]("n_and_exact"))
    }
  }

  test("stream_dedup_minhash holds zero join state (stream-static shape)") {
    // The design claim: both probes are stream-STATIC joins, so the
    // only stateful operator is the complete-mode per-doc aggregate
    // (bounded by the batch), never a symmetric-hash stream-stream
    // join whose state would grow with the corpus.
    val out = graft.streaming.Events.streamDedupMinhash(spark, sf)
    val nDocs = out.count()
    val ops = graft.streaming.StreamMeter.stateOps.get("graft_stream_minhash")
    assert(ops != null && ops.nonEmpty, "no state-operator progress recorded")
    val joinOps = ops.filter(_._1.toLowerCase.contains("join"))
    assert(joinOps.isEmpty, s"unexpected join state operators: $joinOps")
    val aggRows = ops.map(_._2).sum
    assert(aggRows <= nDocs, s"state rows $aggRows exceed batch docs $nDocs")
  }

  test("BandKeys kernel is bit-identical to the declarative band form") {
    // The old per-band xxhash64(concat_ws(",", slice(sigs,...)))
    // projection duplicated the whole sigs subtree once per band in a
    // Generate (32x recompute). The kernel replacement must keep every
    // (band, bh) value — the LSH buckets, and therefore every dedup_*
    // oracle — unchanged.
    import graft.dedup.MinHashLSH
    val cfg = MinHashLSH.Config()
    val r = cfg.rowsPerBand
    val sigs = MinHashLSH.signatures(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", cfg)
    val declarative = array((0 until cfg.bands).map { j =>
      struct(lit(j).as("band"),
        xxhash64(concat_ws(",", slice(col("sigs"), j * r + 1, r))).as("bh"))
    }: _*)
    val diff = sigs
      .select(col("id"), MinHashLSH.bandKeys(col("sigs"), cfg).as("k"),
        declarative.as("d"))
      .filter(col("k") =!= col("d"))
      .count()
    assert(diff == 0L, "BandKeys kernel diverged from declarative form")

    // fused minhashDoc must be value-identical to the two-step
    // formulation on the corpus AND on whitespace/unicode edge cases
    val edge = spark.createDataFrame(Seq(
      (-1L, ""), (-2L, "   "), (-3L, "one"), (-4L, "one two"),
      (-5L, "one two three"), (-6L, "  a\t\tb \n c  d "),
      (-7L, "é ü 日本 語 x"), (-8L, "a a a a a"))).toDF("doc_id", "text")
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).unionByName(edge)
    val twoStep = corpus
      .select(col("doc_id"),
        graft.functions.exprs.shingles(col("text"), 3).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .select(col("doc_id"),
        graft.functions.exprs.minhashSigs(col("_sh"), 64).as("sigs"))
    val fused = MinHashLSH.signatures(corpus, "doc_id", "text", cfg)
      .withColumnRenamed("id", "doc_id")
    assert(fused.count() == twoStep.count(), "fused dropped-row mismatch")
    val ndiff = fused.join(twoStep.withColumnRenamed("sigs", "sigs2"),
      Seq("doc_id")).filter(col("sigs") =!= col("sigs2")).count()
    assert(ndiff == 0L, s"fused minhashDoc diverged on $ndiff docs")

    // and the plan shape: the banding Generate must evaluate the
    // signature subtree exactly once per row, not once per band
    val plan = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(MinHashLSH.bandKeys(
        graft.functions.exprs.minhashSigs(
          graft.functions.exprs.shingles(col("text"), 3), 64))).as("b"))
      .queryExecution.executedPlan.toString
    val n = "minhashsigs\\(".r.findAllIn(plan).length
    assert(n == 1, s"minhash signature computed $n times in the plan")
  }
}
