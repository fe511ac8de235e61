package graft.ops

/** Shared closed-form algebra for the 3-transient / 2-absorbing
  * Markov funnel ([[Behavior.qAbsorbingMarkov]]): the SAME expression
  * TEXT is compiled by Spark (`expr`) and DuckDB (the oracle), so
  * both engines evaluate the identical arithmetic tree over identical
  * double inputs — the strongest pinned-order guarantee available for
  * a formula this wide (a 3×3 matrix inverse via the adjugate).
  *
  * Inputs are the one-row transition-census columns n_{s}{d}
  * (s ∈ v,c,s; d ∈ v,c,s,p,e) — exact longs. Every q/r entry is an
  * exact integer ratio; det/N/steps/absorption are polynomials in
  * those identical doubles.
  */
object MarkovAlg {

  private val T = Seq("v", "c", "s")

  private def rs(i: String) =
    s"(n_${i}v + n_${i}c + n_${i}s + n_${i}p + n_${i}e)"

  private def q(i: String, j: String) =
    s"(CAST(n_$i$j AS DOUBLE) / ${rs(i)})"

  private def r(i: String, e: String) =
    s"(CAST(n_$i$e AS DOUBLE) / ${rs(i)})"

  // a = I − Q
  private def a(i: Int, j: Int) = {
    val base = q(T(i), T(j))
    if (i == j) s"(1 - $base)" else s"(0 - $base)"
  }

  val det: String =
    s"(${a(0, 0)} * (${a(1, 1)} * ${a(2, 2)} - ${a(1, 2)} * ${a(2, 1)})" +
      s" - ${a(0, 1)} * (${a(1, 0)} * ${a(2, 2)} - ${a(1, 2)} * ${a(2, 0)})" +
      s" + ${a(0, 2)} * (${a(1, 0)} * ${a(2, 1)} - ${a(1, 1)} * ${a(2, 0)}))"

  /** Adjugate entry (cofactor transpose) of the 3×3 a-matrix. */
  private def adj(i: Int, j: Int): String = {
    // N = adj(a)/det with adj_ij = cofactor_ji
    val (r1, r2) = ((0 to 2).filter(_ != j): @unchecked) match {
      case Seq(x, y) => (x, y)
    }
    val (c1, c2) = ((0 to 2).filter(_ != i): @unchecked) match {
      case Seq(x, y) => (x, y)
    }
    val sign = if ((i + j) % 2 == 0) "" else "0 - "
    s"($sign(${a(r1, c1)} * ${a(r2, c2)} - ${a(r1, c2)} * ${a(r2, c1)}))"
  }

  private def nEntry(i: Int, j: Int) = s"(${adj(i, j)} / $det)"

  /** Expected transient steps to absorption starting from T(i). */
  def steps(i: Int): String =
    s"(${nEntry(i, 0)} + ${nEntry(i, 1)} + ${nEntry(i, 2)})"

  /** Absorption probability into `e` ("p" or "e") starting from
    * T(i). */
  def absorb(i: Int, e: String): String =
    s"(${nEntry(i, 0)} * ${r("v", e)} + ${nEntry(i, 1)} * ${r("c", e)}" +
      s" + ${nEntry(i, 2)} * ${r("s", e)})"
}
