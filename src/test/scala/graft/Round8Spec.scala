package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{Analytics, Mining, PipelineQueries, Ranks}
import graft.sources.Tables

/** Semantic invariants for the round-8 additions: each checked against
  * an independent formulation (usually the single-partition window the
  * scale-safe shape replaced), so a defect in the ranged-scan plumbing
  * cannot hide behind the DuckDB oracle sharing the same shape. */
class Round8Spec extends SparkSuite {

  test("globalScan rank+sum+maxPrev equal the window formulation") {
    val per = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      .withColumn("cents", round(col("rev") * 100, 0).cast("long"))
    val order = Seq(col("cents").desc, col("o_custkey").asc)
    val got = Ranks.globalScan(per, order,
        rank = Some("rnk"), sums = Seq(col("cents") -> "cum"),
        maxPrev = Seq(col("o_custkey") -> "mx"))
      .select(col("o_custkey"), col("rnk"), col("cum"), col("mx"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val w = Window.orderBy(order: _*)
    val want = per
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("mx", max(col("o_custkey")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("o_custkey"), col("rnk"), col("cum"), col("mx"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got == want)
  }

  test("systematic sample hits 20 strictly increasing in-range positions") {
    val rows = PipelineQueries.sampleSystematic(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 20L))
    val ps = rows.map(_.getLong(1))
    assert(ps.zip(ps.tail).forall { case (a, b) => a < b },
      "positions must be strictly increasing")
    val tot = Tables.documents(spark, sf).filter(col("n_chars") > 0)
      .agg(sum(col("n_chars"))).head.getLong(0)
    assert(ps.forall(p => p >= 0 && p < tot))
  }

  test("mixture interleave paces heavy sources ~40:15 over the prefix") {
    val rows = PipelineQueries.dataInterleaveMixture(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 50L))
    // independent single-partition-window recomputation of the
    // schedule (fine at test scale) must match the ranged result
    val heavy = Set("src0", "src1", "src2", "src3", "src4")
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"))
      .withColumn("seq", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .withColumn("vtime", col("seq").cast("double") /
        when(col("source").isin(heavy.toSeq: _*), 40L)
          .otherwise(15L))
      .withColumn("slot", row_number().over(
        Window.orderBy(col("vtime"), col("source"), col("doc_id")))
        .cast("long"))
      .filter(col("slot") <= 50)
      .select(col("slot"), col("source"), col("seq").cast("long"),
        col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val got = rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq
    assert(got == want)
    // per-source seq numbers must be contiguous from 1 in slot order
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val seqs = rs.sortBy(_.getLong(0)).map(_.getLong(2)).toSeq
      assert(seqs == (1L to seqs.length), s"seq gap: $seqs")
    }
  }

  test("bm25 scores are positive, non-increasing, and term-backed") {
    val rows = PipelineQueries.textBm25Rank(spark, sf).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(3))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every scored doc really contains at least one query term
    val hits = Tables.documents(spark, sf)
      .filter(col("text").contains("spark") ||
        col("text").contains("vector") || col("text").contains("stream"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => hits(r.getLong(1))))
  }

  test("asof tolerance equals the unbounded asof where fresh, null where stale") {
    val unbounded = Analytics.qAsofJoin(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val rows = Analytics.qAsofTolerance(spark, sf).collect()
    assert(rows.length == unbounded.size)
    var nNull = 0
    rows.foreach { r =>
      val v = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      if (v.isEmpty) nNull += 1
      // a tolerance match must agree with the unbounded match; a null
      // is either no match at all or a stale one
      v.foreach(d => assert(unbounded(r.getLong(0)).contains(d)))
    }
    assert(nNull > 0, "tolerance never triggered — test data too dense")
    // staleness can only remove matches, never add them
    assert(nNull >= unbounded.valuesIterator.count(_.isEmpty))
  }

  test("filtered ivfpq returns only label-1 neighbors, k per query") {
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = PipelineQueries.annIvfPqFiltered(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(labels(r.getLong(2)) == 1,
      s"non-label-1 neighbor ${r.getLong(2)} leaked through the filter"))
  }

  test("streaming minhash dedup equals the batch incremental dedup") {
    val batch = PipelineQueries.dedupIncremental(spark, sf).collect().toSeq
    val stream = graft.streaming.Events.streamDedupMinhash(spark, sf)
      .collect().toSeq
    assert(stream == batch)
  }

  test("interval allocation conserves revenue up to floor loss") {
    val li = Tables.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100, 0).cast("long").as("cents"))
      .agg(sum(col("cents")).as("tot"), count(lit(1)).as("n"))
      .head()
    val (tot, n) = (li.getLong(0), li.getLong(1))
    val rows = Analytics.qIntervalAlign(spark, sf).collect()
    val alloc = rows.map(r =>
      math.round(r.getDouble(2) * 100)).sum
    // integer floor allocation: never over-allocates, loses < 1 cent
    // per (item, month) leg and an item spans at most 3 months
    assert(alloc <= tot, s"over-allocated: $alloc > $tot")
    assert(tot - alloc < 3 * n, s"floor loss too large: ${tot - alloc}")
    val months = rows.map(_.getString(0))
    assert(months.sorted.toSeq == months.toSeq && months.distinct.length
      == months.length)
  }

  test("interpolated values stay inside their bracketing knowns") {
    val rows = Analytics.qInterpImpute(spark, sf).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val sortedRs = rs.sortBy(_.getLong(1))
      val knowns = sortedRs.filter(!_.getBoolean(3)).map(_.getLong(2))
      val (lo, hi) = (knowns.min, knowns.max)
      // linear interpolation can never leave the known-value envelope
      sortedRs.filter(_.getBoolean(3)).foreach { r =>
        val v = r.getLong(2)
        assert(v >= lo - 1 && v <= hi + 1,
          s"interpolated $v outside known envelope [$lo, $hi]")
      }
      // grid is gapless
      val hrs = sortedRs.map(_.getLong(1))
      assert(hrs.toSeq == (hrs.head to hrs.last))
    }
  }

  test("curriculum phases partition the corpus into balanced quintiles") {
    val rows = PipelineQueries.dataCurriculumOrder(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 5L))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"unbalanced quintiles: ${sizes.toSeq}")
    assert(sizes.sum == Tables.documents(spark, sf).count())
    // phase score ranges are ordered and non-overlapping
    val ranges = rows.map(r => (r.getLong(3), r.getLong(4)))
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi <= lo2, "phase quality ranges overlap out of order")
    }
  }

  test("png resize checksum equals the generator-replay formula") {
    PipelineQueries.multimodalPngResize(spark, sf).collect()
      .take(25).foreach { r =>
        val (id, w, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
        var want = 0L
        for (j <- 0 until 8; i <- 0 until 8)
          want += (i * w / 8 * 31 + j * h / 8 * 17 + id) % 256
        assert(r.getLong(3) == want,
          s"doc $id resized checksum ${r.getLong(3)} != $want")
      }
  }

  test("streaming scd2 equals the batch scd2 build") {
    val batch = Analytics.qScd2Build(spark, sf).collect().toSeq
    val stream = graft.streaming.Events.streamScd2Build(spark, sf)
      .collect().toSeq
    // both totally ordered by (user, valid_from) with possible
    // same-second ties — compare as multisets of rows
    assert(stream.groupBy(identity).view.mapValues(_.size).toMap ==
      batch.groupBy(identity).view.mapValues(_.size).toMap)
  }

  test("bpe pairs are real character bigrams with true counts") {
    val rows = PipelineQueries.textBpePairs(spark, sf).collect()
    assert(rows.length == 20)
    // independent recount of one pair straight from the corpus
    val (pair, n) = (rows.head.getString(0), rows.head.getLong(1))
    assert(pair.length == 2)
    val recount = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("p"))
      .filter(col("p") === pair).count()
    assert(recount == n, s"pair '$pair': reported $n, recounted $recount")
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("balanced sample keeps exactly min-class-size per label") {
    val byLabel = Tables.embeddings(spark, sf)
      .groupBy(col("label")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val m = byLabel.values.min
    val rows = PipelineQueries.sampleBalanced(spark, sf).collect()
    assert(rows.length == byLabel.size)
    rows.foreach(r => assert(r.getLong(1) == m,
      s"label ${r.getInt(0)} kept ${r.getLong(1)} != $m"))
  }

  test("cleaning funnel attrites monotonically from the full corpus") {
    val rows = PipelineQueries.pipelineCleanFunnel(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 5L))
    val counts = rows.map(_.getLong(2))
    assert(counts.head == Tables.documents(spark, sf).count())
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: ${counts.toSeq}")
    assert(counts.last > 0, "cleaning removed the whole corpus")
  }

  test("length buckets cover every doc and waste is bucket-consistent") {
    val rows = PipelineQueries.dataLengthBuckets(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (bucket, n, toks, waste) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      // exact identity when nothing overflows the top bucket:
      // waste = n·bucket − tokens (clamped at the 1024 rail)
      if (bucket < 1024L)
        assert(waste == n * bucket - toks,
          s"bucket $bucket waste $waste != ${n * bucket - toks}")
      else assert(waste <= n * bucket)
    }
  }

  test("wav decimate energy equals the even-sample generator formula") {
    PipelineQueries.multimodalWavDecimate(spark, sf).collect()
      .take(25).foreach { r =>
        val id = r.getLong(0)
        val nIn = (200 + id % 256).toInt
        val nOut = (nIn + 1) / 2
        var want = 0L
        for (j <- 0 until nOut) {
          val s = ((2L * j * 37 + id * 101) % 65536 - 32768).toInt
          want += s.toLong * s
        }
        assert(r.getLong(1) == nOut && r.getLong(3) == want,
          s"doc $id decimated stats mismatch")
        assert(r.getLong(2) == 8000L)
      }
  }

  test("sprt decision is consistent with the crossed boundary") {
    val r = PipelineQueries.qSprtTest(spark, sf).head()
    val (decision, k, n1) = (r.getString(0), r.getLong(1), r.getLong(2))
    assert(k > 0 && n1 <= k)
    // true purchase share ≈ 0.5 >> H1's 0.4: must accept H1, and the
    // stopped LLR must actually clear the upper boundary
    assert(decision == "accept_h1", s"unexpected decision $decision")
    assert(r.getDouble(3) >= math.log(0.95 / 0.05) - 1e-4)
  }

  test("cuped adjustment reduces variance and keeps lift finite") {
    val r = Mining.qAbCuped(spark, sf).head()
    val vr = r.getDouble(r.fieldIndex("var_reduction"))
    // var_reduction is ρ²(x, y): a valid correlation square
    assert(vr >= 0.0 && vr <= 1.0, s"rho^2 out of range: $vr")
    assert(!r.getDouble(r.fieldIndex("raw_lift")).isNaN)
    assert(!r.getDouble(r.fieldIndex("adj_lift")).isNaN)
    assert(r.getLong(r.fieldIndex("n_users")) > 0)
  }

  test("diff-in-diff equals the four cell means' closed form") {
    val r = Mining.qDiffInDiff(spark, sf).head()
    val did = (r.getDouble(0) - r.getDouble(1)) -
      (r.getDouble(2) - r.getDouble(3))
    assert(math.abs(r.getDouble(4) - did) < 5e-4,
      s"did ${r.getDouble(4)} != recomputed $did")
  }

  test("skyline members are mutually non-dominated and complete") {
    val per = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"),
        max(to_date(col("o_orderdate"))).as("last_day"))
      .select(col("rev"), col("last_day")).collect()
      .map(r => (r.getDouble(0), r.getDate(1).toLocalDate))
    val sky = Mining.qSkyline(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getDate(1).toLocalDate))
    // no skyline point dominates another
    for (a <- sky; b <- sky if a != b)
      assert(!(a._1 >= b._1 && !a._2.isBefore(b._2)),
        s"$a dominates $b inside the skyline")
    // every non-member is dominated by some member (completeness)
    val skySet = sky.toSet
    per.filterNot(p => skySet((p._1, p._2))).foreach { p =>
      assert(sky.exists(s => s._1 >= p._1 && !s._2.isBefore(p._2) &&
        (s._1 > p._1 || s._2.isAfter(p._2))),
        s"$p not dominated by any skyline member")
    }
  }
}
