package graft

import org.apache.spark.sql.functions._

/** Round-15 regressions: the ATOMIC multi-table save (r14 verdict
  * orders #1/#6) certified by crash interleavings at every stage of
  * the commit protocol — a reader must see old-everything or
  * new-everything, never a torn mix or a vanished table — plus the
  * concurrent-save loser contract and the versioned manifest.
  */
class Round15Spec extends SparkSuite {
  import spark.implicits._

  /** Two-table fixture: parent `t` (rev tag) + child array table
    * `kids` (values shift with rev) — a torn save would split the
    * joined readout's rev/value sums. */
  private def docs(rev: Int) =
    Seq((1L, Seq((10L, 100L), (11L, 200L))), (2L, Seq((20L, 300L))))
      .toDF("rowNum", "kids")
      .withColumn("rev", lit(rev.toLong))
      .withColumn("kids", expr(
        s"transform(kids, k -> named_struct('rowNum', k._1, " +
          s"'v', k._2 + $rev))"))
      .select(col("rowNum"), col("rev"), col("kids"))

  /** (n kids, Σ child v, Σ parent rev over the join). */
  private def readout(eng: Engine): (Long, Long, Long) = {
    val r = eng.sql("""SELECT count(*) AS n, sum(k.v) AS sv,
        sum(t.rev) AS sr FROM kids k JOIN t ON k.t = t.rowNum""")
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }
  private val v1 = (3L, 600L, 0L)
  private val v2 = (3L, 603L, 3L)

  test("a crash BEFORE the commit marker leaves the old save fully " +
      "visible; the retry lands the new one") {
    val wh = graft.util.Scratch.dir("graft_r15_premark").toString
    val eng = new Engine(spark, wh)
    val reader = new Engine(spark, wh)
    eng.save(docs(0), "t")
    assert(readout(reader) == v1)
    eng.beforeMark = () => throw new RuntimeException("crash pre-mark")
    intercept[RuntimeException] { eng.save(docs(1), "t") }
    // staged leftovers exist, but nothing committed: still v1
    assert(readout(reader) == v1)
    eng.beforeMark = () => ()
    eng.save(docs(1), "t")
    assert(readout(reader) == v2)
  }

  test("a crash MID-COMMIT (marker live, one table swapped) already " +
      "reads new-everything; recovery rolls forward idempotently") {
    val wh = graft.util.Scratch.dir("graft_r15_midcommit").toString
    val eng = new Engine(spark, wh)
    val reader = new Engine(spark, wh)
    eng.save(docs(0), "t")
    eng.afterPublish = _ => throw new RuntimeException("crash mid-commit")
    intercept[RuntimeException] { eng.save(docs(1), "t") }
    // the marker rename was the commit point: kids is live-new, t still
    // serves from its staged dir — the reader must already see v2 whole
    assert(readout(reader) == v2)
    // any next engine operation rolls the pending publishes forward
    val eng2 = new Engine(spark, wh)
    eng2.save(Seq((1L, 1L)).toDF("rowNum", "x"), "aux")
    assert(readout(reader) == v2)
    // and the previous save's contents were archived, not destroyed
    assert(eng2.versions("t") == Seq(0) && eng2.versions("kids") == Seq(0))
    assert(eng2.tableAt("t", 0).agg(sum(col("rev"))).collect()(0)
      .getLong(0) == 0L)
  }

  test("mid-commit readout through the seam equals the new truth " +
      "while the uncrashed save completes normally") {
    val wh = graft.util.Scratch.dir("graft_r15_seam").toString
    val eng = new Engine(spark, wh)
    val reader = new Engine(spark, wh)
    eng.save(docs(0), "t")
    var pre: (Long, Long, Long) = null
    var mid: (Long, Long, Long) = null
    eng.beforeMark = () => if (pre == null) pre = readout(reader)
    eng.afterPublish = _ => if (mid == null) mid = readout(reader)
    eng.save(docs(1), "t")
    assert(pre == v1, s"pre-mark readout $pre != v1 $v1")
    assert(mid == v2, s"mid-commit readout $mid != v2 $v2")
    assert(readout(reader) == v2)
  }

  test("a save entering mid-commit serializes by HELPING: it first " +
      "completes the in-flight commit, then lands on top — both " +
      "saves visible in order, never torn") {
    val wh = graft.util.Scratch.dir("graft_r15_ccsave").toString
    val engA = new Engine(spark, wh)
    val engB = new Engine(spark, wh)
    engA.save(docs(0), "t")
    var fired = false
    var seenAfterB: (Long, Long, Long) = null
    engA.afterPublish = _ => if (!fired) { fired = true
      engB.save(docs(2), "t") // enters inside A's commit window
      seenAfterB = readout(engB)
    }
    engA.save(docs(1), "t") // resumed A must not disturb B's commit
    engA.afterPublish = _ => ()
    assert(fired)
    // B helped A's commit forward, then committed its own state
    assert(seenAfterB == (3L, 606L, 6L),
      s"after B's save: $seenAfterB")
    assert(readout(new Engine(spark, wh)) == (3L, 606L, 6L))
  }

  test("the manifest is versioned write-once and pruned; the legacy " +
      "in-place file is superseded") {
    val wh = graft.util.Scratch.dir("graft_r15_manifest").toString
    val eng = new Engine(spark, wh)
    for (rev <- 0 to 4) eng.save(docs(rev), "t")
    val f = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val names = f.listStatus(new org.apache.hadoop.fs.Path(wh))
      .map(_.getPath.getName).toSeq
    val versioned = names.filter(_.startsWith("_graft_manifest.v"))
    assert(versioned.nonEmpty, s"no versioned manifest in $names")
    assert(versioned.size <= 3, s"manifest versions unpruned: $versioned")
    assert(!names.contains("_graft_manifest.txt"),
      "legacy manifest not superseded")
    assert(!names.contains("_graft_commit.txt"), "marker leaked")
    // five successive saves: history bounded by retention, live = v4
    assert(readout(eng) == (3L, 612L, 12L))
  }

  test("qScc's distributed label fixpoint (forced past the " +
      "local-Tarjan finisher) equals the default hybrid labeling") {
    def run() = graft.ops.Mining.qScc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hybrid = run()
    spark.conf.set("graft.scc.localThreshold", "0")
    val bsp = try run()
      finally spark.conf.unset("graft.scc.localThreshold")
    assert(bsp == hybrid,
      s"bsp-only=${(bsp -- hybrid).take(5)} hybrid-only=${(hybrid -- bsp).take(5)}")
  }

  test("stream_dedup equals the batch distinct census and its " +
      "day-scoped dedup state is watermark-bounded with mid-run " +
      "eviction") {
    val got = graft.streaming.Events.streamDedup(spark, sf).collect()
    val exp = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type")).collect()
    assert(got.map(_.toString).toSeq == exp.map(_.toString).toSeq,
      s"stream=${got.mkString(";")} batch=${exp.mkString(";")}")
    val keys = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), to_date(col("ts")))
      .distinct().count()
    val ops = graft.streaming.StreamMeter.stateEvictions
      .get("graft_stream_dedup")
    assert(ops != null && ops.size == 1, "one dedup state operator")
    val (_, fin, removed) = ops.head
    // every first-seen (user, type, day) key entered state exactly once
    // and left it at most once: resident + evicted partitions the keys
    assert(fin + removed == keys,
      s"state rows $fin + removed $removed != keys $keys")
    assert(removed > 0, "dedup evicted no state mid-run")
    assert(fin < keys, "dedup held every key — unbounded shape")
  }

  test("a writer whose tag-capture lands inside another writer's swap " +
      "window gets the retryable CME, not a raw FileNotFoundException") {
    val wh = graft.util.Scratch.dir("graft_r15_fnf").toString
    val eng = new Engine(spark, wh)
    val f = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // the window: live vanished (renamed aside by the other writer)
    // between the existence checks and the listing
    intercept[java.util.ConcurrentModificationException] {
      eng.readTagOrConflict(f,
        new org.apache.hadoop.fs.Path(s"$wh/ghost"), "upsert", "ghost")
    }
  }
}
