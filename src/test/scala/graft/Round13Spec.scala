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
