package graft

import org.apache.spark.sql.functions._

/** Round-14 regressions: the bounded-state streaming-distinct rewrite
  * (stream_dau_mau / stream_srm on `dropDuplicatesWithinWatermark`)
  * certified two ways — stream ≡ batch value equality, and the
  * state-store row counts from query progress proving the watermark
  * actually EVICTS dedup state mid-run (the r13 verdict's order #1:
  * the old `dropDuplicates` shape held every key for the query's
  * lifetime).
  */
class Round14Spec extends SparkSuite {

  test("stream_dau_mau equals batch and its DAU dedup state is " +
      "watermark-bounded with mid-run eviction") {
    val got = graft.streaming.Events.streamDauMau(spark, sf).collect()
    val exp = graft.ops.Behavior.qDauMau(spark, sf).collect()
    assert(got.map(_.toString).toSeq == exp.map(_.toString).toSeq,
      s"stream=${got.mkString(";")} batch=${exp.mkString(";")}")

    val userDays = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    val dOps = graft.streaming.StreamMeter.stateEvictions
      .get("graft_stream_daumau_d")
    assert(dOps != null && dOps.size == 1, "one dedup state operator")
    val (_, dFinal, dRemoved) = dOps.head
    // every first-seen (user, day) key entered state exactly once and
    // left it at most once, so resident + evicted partitions the keys
    assert(dFinal + dRemoved == userDays,
      s"state rows $dFinal + removed $dRemoved != user-days $userDays")
    // the 2-day watermark must evict mid-run on the ~30-day corpus:
    // holding every key to the end is the unbounded shape we replaced
    assert(dRemoved > 0, "DAU dedup evicted no state mid-run")
    assert(dFinal < userDays, "DAU dedup held every user-day key")

    val userMonths = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM"))
      .distinct().count()
    val mOps = graft.streaming.StreamMeter.stateEvictions
      .get("graft_stream_daumau_m")
    assert(mOps != null && mOps.size == 1)
    val (_, mFinal, mRemoved) = mOps.head
    assert(mFinal + mRemoved == userMonths,
      s"MAU rows $mFinal + removed $mRemoved != user-months $userMonths")
  }

  test("stream_srm equals the batch census under the " +
      "enrollment-horizon dedup") {
    val got = graft.streaming.Events.streamSrm(spark, sf).collect()
    val exp = graft.ops.Mining.qAbSrm(spark, sf).collect()
    assert(got.map(_.toString).toSeq == exp.map(_.toString).toSeq,
      s"stream=${got.mkString(";")} batch=${exp.mkString(";")}")
    val users = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val ops = graft.streaming.StreamMeter.stateEvictions
      .get("graft_stream_srm")
    assert(ops != null && ops.size == 1)
    val (_, fin, removed) = ops.head
    // the 45-day horizon exceeds the corpus span, so nothing may be
    // evicted early (exactness) and state is exactly the user census
    assert(fin + removed == users && removed == 0,
      s"rows $fin removed $removed users $users")
  }
}
