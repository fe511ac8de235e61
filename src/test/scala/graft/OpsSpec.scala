package graft

import org.apache.spark.sql.functions._

import graft.ops.Analytics
import graft.sources.Tables

/** Semantic invariants for the round-4 analytics operators — each
  * checked against an independent Spark formulation over the same
  * data, so a defect in the clever shape (salting, spine, windows)
  * can't hide behind the DuckDB oracle sharing it. */
class OpsSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals the plain unsalted join") {
    val salted = Analytics.qSkewJoinSalted(spark, sf)
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n"))
      .orderBy(col("s_nationkey"))
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("funnel stages attrite monotonically") {
    val r = Analytics.qFunnel(spark, sf).head()
    val (v, c, p) = (r.getLong(r.fieldIndex("n_view")),
      r.getLong(r.fieldIndex("n_click")),
      r.getLong(r.fieldIndex("n_purchase")))
    assert(v >= c && c >= p, s"funnel not monotone: $v $c $p")
    assert(v > 0)
  }

  test("date spine is gapless and covers the full order-date range") {
    val rows = Analytics.qDateSpine(spark, sf)
      .select(col("day").cast("date")).as[java.sql.Date].collect()
    val n = Tables.orders(spark, sf)
      .select(datediff(max(to_date(col("o_orderdate"))),
        min(to_date(col("o_orderdate")))))
      .head().getInt(0)
    assert(rows.length == n + 1, "spine length != day span")
    assert(rows.sliding(2).forall {
      case Array(a, b) => b.toLocalDate == a.toLocalDate.plusDays(1)
      case _ => true
    }, "spine has a gap")
  }

  test("mode matches an independent argmax and breaks ties downward") {
    val got = Analytics.qMode(spark, sf)
      .as[(String, Double, Long)].collect()
      .map { case (k, q, n) => k -> ((q, n)) }.toMap
    val counts = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
      .groupBy(_._1)
    for ((flag, rows) <- counts) {
      val best = rows.map { case (_, q, n) => (q, n) }
        .minBy { case (q, n) => (-n, q) }
      assert(got(flag) == best, s"mode mismatch for $flag")
    }
  }

  test("scd2 intervals chain per key with exactly one current row") {
    val rows = Analytics.qScd2Build(spark, sf)
      .select(col("user_id"), col("valid_from_s"), col("valid_to_s"),
        col("is_current"))
      .as[(Long, Long, Long, Boolean)].collect()
      .groupBy(_._1)
    for ((_, hist) <- rows) {
      val sorted = hist.sortBy(_._2)
      assert(sorted.count(_._4) == 1, "not exactly one current row")
      assert(sorted.last._4, "current row is not the latest")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 == b._2, "valid_to != next valid_from")
        case _ => ()
      }
    }
  }

  test("latest-per-key picks each user's max-ts event") {
    val got = Analytics.qLatestPerKey(spark, sf)
      .select(col("user_id"), col("event_id")).as[(Long, Long)]
      .collect().toMap
    val expected = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(max_by(col("event_id"),
        struct(col("ts"), col("event_id"))).as("event_id"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("histogram buckets partition all orders") {
    val total = Analytics.qHistogram(spark, sf)
      .agg(sum(col("n"))).head().getLong(0)
    assert(total == Tables.orders(spark, sf).count())
  }

  test("recursive BOM matches a driver-side chain walk") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"))
      .as[(Long, Double)].collect()
    // chain for key k: k itself plus every floor-div-10 ancestor down to 0
    val chains = parts.flatMap { case (k, v) =>
      (Iterator.single(k) ++ Iterator.iterate(k)(_ / 10)
        .takeWhile(_ > 0).map(_ / 10)).map(a => (a, v)).toSeq
    }
    val exp = chains.groupBy(_._1).map { case (a, vs) =>
      a -> (vs.length.toLong, vs.map(_._2).sum)
    }
    val got = Analytics.qRecursiveBom(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map { case (a, n, v) => a -> (n, v) }.toMap
    assert(got.keySet == exp.keySet)
    for ((a, (n, v)) <- exp) {
      assert(got(a)._1 == n, s"anc $a count")
      assert(math.abs(got(a)._2 - v) < 0.02, s"anc $a value")
    }
  }

  test("table checksum is invariant under repartitioning") {
    val a = Analytics.qTableChecksum(spark, sf).collect().toSeq
    val shuffled = Tables.lineitem(spark, sf).repartition(17)
    shuffled.createOrReplaceTempView("_ck_shuffled")
    // re-run the same fingerprint over a physically reshuffled table
    import graft.functions.exprs
    val rowStr = concat_ws("|",
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate").cast("date").cast("string"))
    val b = shuffled
      .select(col("l_returnflag"),
        exprs.md5Lower64(rowStr).bitwiseAND(lit(Long.MaxValue)).as("_h"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(_h)").as("checksum"))
      .orderBy(col("l_returnflag")).collect().toSeq
    assert(a == b, "checksum changed under repartition")
  }

  test("z-order buckets bound both dimensions to 16-wide boxes") {
    val rows = Analytics.qZorderCluster(spark, sf)
      .select(col("min_x"), col("max_x"), col("min_y"), col("max_y"))
      .as[(Int, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    for ((minX, maxX, minY, maxY) <- rows) {
      assert(maxX - minX <= 15, s"x box too wide: $minX..$maxX")
      assert(maxY - minY <= 15, s"y box too wide: $minY..$maxY")
    }
  }

  test("cdc apply preserves the merge row-count identity") {
    import graft.ops.Warehouse
    val applied = Warehouse.qCdcApply(spark, sf)
    val total = applied.agg(sum(col("n"))).as[Long].head()
    // independent accounting: |base| - |D targets in base| + |I|
    val latest = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("k"))
      .agg(max_by(col("o_orderkey"),
        struct(col("o_orderdate"), col("o_orderkey"))).as("ok"))
    val base = Tables.customer(spark, sf).select(col("c_custkey").as("k"))
    val dInBase = latest.filter(col("ok") % 3 === 0)
      .join(base, Seq("k"), "left_semi").count()
    val nIns = latest.filter(col("ok") % 3 === 2).count()
    assert(total == base.count() - dInBase + nIns)
    // inserted rows land in their own segment
    assert(applied.filter(col("seg") === "NEW").count() == 1)
  }

  test("incremental agg merge equals the full recompute on every month") {
    import graft.ops.Warehouse
    val rows = Warehouse.qIncrementalAgg(spark, sf)
    assert(rows.filter(!col("matches_full")).count() == 0)
    assert(rows.count() ==
      Tables.orders(spark, sf)
        .select(date_format(col("o_orderdate"), "yyyy-MM")).distinct().count())
  }

  test("dim-filtered join plans dynamic partition pruning on the fact") {
    import graft.ops.Warehouse
    Warehouse.qDynamicPrune(spark, sf).collect() // lays out fact + dim
    val (factPath, dimPath) = Warehouse.dppPath(sf)
    val plan = Warehouse.dynamicPrunePlan(spark, factPath, dimPath)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning subquery in plan:\n$plan")
  }

  test("lm cross-entropy dominates each doc's own entropy (Gibbs)") {
    import graft.ops.PipelineQueries
    val lm = PipelineQueries.textLmScore(spark, sf)
    val joined = lm.select(col("doc_id"), col("lm_bits"))
      .join(PipelineQueries.textEntropy(spark, sf)
        .select(col("doc_id"), col("entropy")), Seq("doc_id"))
    assert(joined.filter(col("lm_bits") < col("entropy") - 1e-6).count() == 0)
    assert(lm.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("url canonicalization strips noise and partitions the corpus") {
    import graft.ops.PipelineQueries
    val clusters = PipelineQueries.dedupUrl(spark, sf)
    val nDocs = Tables.documents(spark, sf).count()
    assert(clusters.agg(sum(col("n_docs"))).as[Long].head() == nDocs)
    val bad = clusters.filter(
      col("canon").rlike("[A-Z]|#|:443|utm_") ||
        !col("canon").rlike("\\?a=1&b=2&id=\\d+$"))
    assert(bad.count() == 0, "un-canonical URL survived")
  }

  test("weighted sample is layout-invariant and favors longer docs") {
    import graft.ops.PipelineQueries
    val picked = PipelineQueries.sampleWeighted(spark, sf)
    // n_chars rides along (outside part ∪ {score,id}), so the custom
    // TopKByScore rewrite correctly declines; Spark's native
    // WindowGroupLimit must supply the ≤k-rows-per-group-per-partition
    // bound instead
    assert(picked.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"),
      "weighted sample should plan a per-partition group limit")
    val meanPicked = picked.agg(avg(col("n_chars"))).as[Double].head()
    val meanAll = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).as[Double].head()
    assert(meanPicked > meanAll,
      s"length-weighted draw should skew long: $meanPicked vs $meanAll")
  }

  test("count-min sketch never underestimates, and bounds collisions") {
    import graft.ops.PipelineQueries
    val out = PipelineQueries.countMinTopK(spark, sf)
    assert(out.count() == 10)
    assert(out.filter(!col("never_under")).count() == 0)
    val total = Tables.lineitem(spark, sf).count()
    assert(out.filter(col("est") > total).count() == 0,
      "estimate exceeded the total stream count")
  }

  test("embed buckets partition pairs: sum of C(n,2) equals n_pairs") {
    import graft.ops.PipelineQueries
    val b = PipelineQueries.dedupEmbedBuckets(spark, sf)
    val ok = b.filter(
      col("n_pairs") =!= col("n_vecs") * (col("n_vecs") - 1) / 2 ||
        col("max_cos") > 1.0001)
    assert(b.count() > 0)
    assert(ok.count() == 0, "bucket pair count or cosine out of bounds")
  }

  test("delta detect partitions both snapshots exactly") {
    import graft.ops.Warehouse
    import org.apache.spark.sql.Row
    val d = Warehouse.qDeltaDetect(spark, sf).collect()
      .map { case Row(s: String, n: Long) => s -> n }.toMap
    val base = Tables.customer(spark, sf)
    val nV1 = base.count()
    val nDel = base.filter(col("c_custkey") % 11 === 0).count()
    val nAdd = base.filter(col("c_custkey") % 13 === 0).count()
    val nChg = base.filter(col("c_custkey") % 11 =!= 0 &&
      col("c_custkey") % 7 === 0).count()
    assert(d.getOrElse("deleted", 0L) == nDel)
    assert(d.getOrElse("added", 0L) == nAdd)
    assert(d.getOrElse("changed", 0L) == nChg)
    assert(d.values.sum == nV1 + nAdd) // every key classified once
  }

  test("weighted median sits at the half-revenue point") {
    val m = Analytics.qWeightedMedian(spark, sf)
    val joined = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("w"))
      .join(m, Seq("l_returnflag"))
    val below = joined.filter(col("l_extendedprice") < col("weighted_median"))
      .groupBy(col("l_returnflag")).agg(sum(col("w")).as("wb"))
    val total = joined.groupBy(col("l_returnflag")).agg(sum(col("w")).as("wt"))
    val bad = below.join(total, Seq("l_returnflag"))
      .filter(col("wb") > col("wt") / 2 + lit(0.01))
    assert(bad.count() == 0,
      "strictly-below-median revenue exceeded half the total")
  }

  test("sliding windows cover every event exactly twice") {
    val win = Analytics.qSlidingWindow(spark, sf)
    val winTotal = win.agg(sum(col("n"))).as[Long].head()
    val nEvents = Tables.events(spark, sf).count()
    assert(winTotal == 2 * nEvents,
      s"1h/30m hopping windows must hold each event twice: " +
        s"$winTotal vs 2×$nEvents")
  }

  test("hll estimates stay within bound and union is sublinear") {
    import graft.ops.PipelineQueries
    val r = PipelineQueries.hllMerge(spark, sf)
    assert(r.filter(!col("within_5pct")).count() == 0)
    val union = r.filter(col("source") === "__union__")
      .select(col("n_exact")).as[Long].head()
    val srcSum = r.filter(col("source") =!= "__union__")
      .agg(sum(col("n_exact"))).as[Long].head()
    assert(union <= srcSum, "union distinct cannot exceed the shard sum")
  }

  test("files audit accounts for every row") {
    val audit = graft.sources.Layouts.filesAudit(spark, sf)
    assert(audit.agg(sum(col("n_rows"))).as[Long].head() ==
      Tables.orders(spark, sf).count())
    assert(audit.filter(col("min_key") > col("max_key")).count() == 0)
  }

  test("triangle count is invariant under repartitioning and bounded") {
    val r = Analytics.qTriangleCount(spark, sf).head()
    val (nodes, edges, tris) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nodes > 0 && edges > 0)
    assert(edges <= nodes * (nodes - 1) / 2)
    // each triangle consumes 3 distinct edges; a loose but real bound
    assert(tris <= edges * (edges - 1) / 6 + edges)
  }

  test("sequence packing conserves docs and tokens across packs") {
    import graft.ops.PipelineQueries
    val packs = PipelineQueries.dataPackSequences(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    val nDocs = docs.count()
    val nToks = docs
      .agg(org.apache.spark.sql.functions.sum(
        graft.text.TextOps.bpeishCount(
          org.apache.spark.sql.functions.col("text"))))
      .head().getLong(0)
    assert(packs.map(_.getLong(1)).sum == nDocs,
      "every doc starts in exactly one pack")
    assert(packs.map(_.getLong(2)).sum == nToks,
      "token mass is conserved")
    val ids = packs.map(_.getLong(0))
    assert(ids.head == 0L && ids.toSeq == ids.toSeq.sorted,
      "pack ids start at 0 and are ordered")
    // every pack except possibly the last must be full enough that the
    // NEXT doc starts in a later pack: docs starting here + spill
    // cover the 512 span, so n_tokens + carry >= what fits — weaker
    // invariant: no pack id is skipped unless a doc spans it entirely
    assert(packs.forall(_.getLong(1) >= 1), "no empty pack rows")
  }

  test("chunk windows tile every doc with the declared stride and overlap") {
    import graft.ops.PipelineQueries
    val chunks = PipelineQueries.textChunkWindows(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.trim(
              org.apache.spark.sql.functions.col("text")), "\\s+"))
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.groupBy(_.getLong(0)).foreach { case (docId, ws) =>
      val n = docs(docId)
      val sortedW = ws.sortBy(_.getLong(1))
      // starts advance by exactly the stride from 0
      assert(sortedW.zipWithIndex.forall { case (w, i) =>
        w.getLong(2) == i.toLong * 48 })
      // the last window reaches the end of the doc; none is empty
      val last = sortedW.last
      assert(last.getLong(2) + last.getLong(3) == n,
        s"doc $docId: last window ends at " +
          s"${last.getLong(2) + last.getLong(3)} of $n tokens")
      assert(sortedW.forall(_.getLong(3) > 0))
      // full windows are exactly 64 tokens
      assert(sortedW.dropRight(1).forall(_.getLong(3) == 64))
    }
    assert(chunks.map(_.getLong(0)).distinct.length == docs.size,
      "every doc is chunked")
  }

  test("rolling HLL WAU: estimates stay in the 5% envelope, days covered") {
    import graft.ops.PipelineQueries
    val rows = PipelineQueries.rollingHllWau(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)),
      "an HLL window estimate escaped the 5% envelope")
    // window distinct can only grow vs the single day's distinct and is
    // bounded by the full-corpus distinct
    val total = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= total))
    val nDays = graft.sources.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.expr(
        "unix_timestamp(ts) div 86400")).distinct().count()
    assert(rows.length == nDays, "one row per observed day")
  }

  test("epoch shuffle: every doc sharded each epoch, permutations differ") {
    import graft.ops.PipelineQueries
    val rows = PipelineQueries.dataEpochShuffle(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    val byEpoch = rows.groupBy(_.getLong(0))
    assert(byEpoch.keySet == Set(0L, 1L, 2L), "three epochs planned")
    // conservation: every doc lands in exactly one shard per epoch
    byEpoch.foreach { case (e, rs) =>
      assert(rs.map(_.getLong(2)).sum == nDocs, s"epoch $e loses docs")
      assert(rs.map(_.getLong(1)).toSet.size == rs.length,
        s"epoch $e: duplicate shard rows")
    }
    // independence: different epochs draw different orders — the
    // per-shard first docs cannot all coincide across epochs
    def firsts(e: Long) =
      byEpoch(e).map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(firsts(0L) != firsts(1L) && firsts(1L) != firsts(2L),
      "epoch permutations must differ")
  }

  test("mixture plan weights renormalize and upweight small sources") {
    import graft.ops.PipelineQueries
    val rows = PipelineQueries.dataMixturePlan(spark, sf).collect()
    val share = rows.map(_.getDouble(3)).sum
    val weight = rows.map(_.getDouble(4)).sum
    assert(math.abs(share - 1.0) < 1e-3, s"shares sum to $share")
    assert(math.abs(weight - 1.0) < 1e-3, s"weights sum to $weight")
    // temperature < 1 compresses: the smallest source must gain
    // sampling mass, the largest must lose it
    val smallest = rows.minBy(_.getDouble(3))
    val largest = rows.maxBy(_.getDouble(3))
    assert(smallest.getDouble(5) >= 1.0 - 1e-9,
      "smallest source must be upsampled")
    assert(largest.getDouble(5) <= 1.0 + 1e-9,
      "largest source must be downsampled")
  }
}
