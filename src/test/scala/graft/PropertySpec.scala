package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the custom Catalyst expressions must agree with
  * straightforward Scala reference implementations on generated input.
  * (Raw ScalaCheck generators with fixed seeds — the scalatest bridge
  * artifact isn't on the offline classpath.) */
class PropertySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(2)

  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] = {
    var s = Seed(seed)
    (1 to n).map { _ =>
      val v = g.pureApply(Gen.Parameters.default, s)
      s = s.next
      v
    }
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  private def refShingles(t: String, k: Int): Seq[String] = {
    val trimmed = t.trim
    if (trimmed.isEmpty) return if (k == 1) Seq("") else Seq.empty
    val toks = trimmed.split("\\s+")
    if (toks.length < k) Seq.empty
    else toks.sliding(k).map(_.mkString(" ")).toSeq.distinct
  }

  test("Shingles expression matches reference sliding-window impl") {
    import spark.implicits._
    val cases = samples(Gen.zip(text, Gen.choose(1, 4)), 60)
    val df = cases.zipWithIndex
      .map { case ((t, k), i) => (i, t, k) }.toDF("i", "t", "k")
    cases.zipWithIndex.foreach { case ((t, k), i) =>
      val got = df.filter(col("i") === i)
        .select(graft.text.TextOps.shingles(col("t"), k))
        .head().getSeq[String](0)
      assert(got == refShingles(t, k), s"text='$t' k=$k")
    }
  }

  test("CosineSim matches reference arithmetic") {
    import spark.implicits._
    val vec = Gen.listOfN(8, Gen.choose(-10.0, 10.0))
      .suchThat(_.exists(_ != 0.0))
    samples(Gen.zip(vec, vec), 40).foreach { case (a, b) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.exprs.cosineSim(col("a"), col("b")))
        .head().getDouble(0)
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val ref = dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(y => y * y).sum))
      assert(math.abs(got - ref) < 1e-9)
    }
  }

  test("Upsert: result keys = base ∪ updates; update rows win") {
    import spark.implicits._
    val kvs = Gen.listOf(Gen.zip(Gen.choose(0L, 20L), Gen.choose(0, 1000)))
    samples(Gen.zip(kvs, kvs), 15).foreach { case (baseL, updL) =>
      val base = baseL.distinctBy(_._1)
      val upd = updL.distinctBy(_._1)
      if (base.nonEmpty || upd.nonEmpty) {
        val got = graft.ops.Upsert(
          base.toDF("k", "v"), upd.toDF("k", "v"), Seq("k"))
          .as[(Long, Int)].collect().toMap
        assert(got == base.toMap ++ upd.toMap)
      }
    }
  }

  test("MinHash signatures are identical for identical texts") {
    import spark.implicits._
    val longText = text.suchThat(_.trim.split("\\s+").length >= 3)
    samples(longText, 10).foreach { t =>
      val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
      val rows = graft.dedup.MinHashLSH.signatures(docs, "doc_id", "text")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getSeq[Long](1) == rows(1).getSeq[Long](1))
    }
  }

  /** Reference sessionizer: sort everything, single pass. */
  private def refSessions(ts: Seq[Long], gap: Long): List[(Long, Long, Long)] = {
    if (ts.isEmpty) return Nil
    val sorted = ts.sorted
    var out = List.empty[(Long, Long, Long)]
    var (s0, e0, n0) = (sorted.head, sorted.head, 1L)
    sorted.tail.foreach { t =>
      if (t - e0 <= gap) { e0 = t; n0 += 1 }
      else { out = (s0, e0, n0) :: out; s0 = t; e0 = t; n0 = 1 }
    }
    ((s0, e0, n0) :: out).reverse
  }

  test("mergeIntervals equals sorted-scan sessionization on random " +
      "arrival orders") {
    val events = Gen.listOf(Gen.choose(0L, 20000L))
    samples(Gen.zip(events, Gen.choose(1L, 3000L)), 80, seed = 7L)
      .foreach { case (ts, gap) =>
        val shuffled = new scala.util.Random(ts.hashCode).shuffle(ts.toVector)
        val got = graft.streaming.Events
          .mergeIntervals(shuffled.iterator, None, gap).toList
        assert(got == refSessions(ts, gap),
          s"gap=$gap ts=${ts.take(20)}…")
      }
  }
}
