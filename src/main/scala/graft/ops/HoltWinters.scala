package graft.ops

/** Shared SQL-expression generator for the Holt-Winters recurrence
  * (additive, weekly period, α=0.5 β=0.25 γ=0.25 — every coefficient
  * a power of two, so each step is exactly-rounded IEEE arithmetic).
  *
  * [[Behavior.qHoltWinters]] builds its fold lambda and the DuckDB
  * oracle (SparkEntry) builds its recursive-CTE step from THE SAME
  * strings, parameterized only by the accumulator/element prefixes
  * (`acc`/`e` in the Spark lambda, `r`/`i` in the CTE) — identical
  * expression trees over identical inputs make the engines agree
  * bit-for-bit, which the floor-scaled integer outputs then hash.
  * Coefficient literals stay plain (`0.5`): Spark parses them as
  * exact small decimals, DuckDB likewise; both promote to DOUBLE
  * losslessly before the multiply.
  */
object HoltWinters {
  /** Current seasonal term s[t mod 7] (pre-update). */
  def sCur(a: String, e: String): String =
    s"(CASE $e.t % 7 " +
      (0 to 6).map(i => s"WHEN $i THEN $a.s$i").mkString(" ") + " END)"

  /** l' = α(y − s) + (1−α)(l + b) */
  def lNew(a: String, e: String): String =
    s"(0.5 * ($e.y - ${sCur(a, e)}) + 0.5 * ($a.l + $a.b))"

  /** b' = β(l' − l) + (1−β)b (l' inlined — identical tree ⇒ identical
    * value; SQL lambdas have no let-binding) */
  def bNew(a: String, e: String): String =
    s"(0.25 * (${lNew(a, e)} - $a.l) + 0.75 * $a.b)"

  /** s_i' = γ(y − l') + (1−γ)s_i when i = t mod 7, else s_i. */
  def sNew(a: String, e: String, i: Int): String =
    s"(CASE WHEN $e.t % 7 = $i THEN 0.25 * ($e.y - ${lNew(a, e)}) " +
      s"+ 0.75 * $a.s$i ELSE $a.s$i END)"

  /** sse' = sse + (y − f)², f = l + b + s (one-step-ahead, pre-update). */
  def sseNew(a: String, e: String): String = {
    val fc = s"($a.l + $a.b + ${sCur(a, e)})"
    s"($a.sse + ($e.y - $fc) * ($e.y - $fc))"
  }

  /** Seasonal term for an arbitrary integer day expression. */
  def sAt(p: String, tExpr: String): String =
    s"CASE ($tExpr) % 7 " +
      (0 to 6).map(i => s"WHEN $i THEN $p.s$i").mkString(" ") + " END"

  /** The DuckDB oracle: recursive CTE replaying the fold step-for-step
    * from the same generated expressions. */
  val oracle: String = {
    val sCols = (0 to 6).map(i => s"CAST(0 AS DOUBLE) AS s$i").mkString(", ")
    val sStep = (0 to 6).map(i => s"${sNew("r", "i", i)} AS s$i").mkString(",\n    ")
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS DOUBLE) AS y
       |  FROM events GROUP BY 1, 2),
       |i0 AS (
       |  SELECT event_type, y,
       |    date_diff('day', min(day) OVER (PARTITION BY event_type), day)
       |      AS t
       |  FROM daily),
       |idx AS (
       |  SELECT event_type, y, t,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY t)
       |      AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
       |    CAST(max(t) OVER (PARTITION BY event_type) AS BIGINT) AS tmax
       |  FROM i0),
       |rec AS (
       |  SELECT event_type, rn, n, tmax, y AS l, CAST(0 AS DOUBLE) AS b,
       |    $sCols, CAST(0 AS DOUBLE) AS sse
       |  FROM idx WHERE rn = 1
       |  UNION ALL
       |  SELECT r.event_type, i.rn, r.n, r.tmax,
       |    ${lNew("r", "i")} AS l,
       |    ${bNew("r", "i")} AS b,
       |    $sStep,
       |    ${sseNew("r", "i")} AS sse
       |  FROM rec r JOIN idx i
       |    ON i.event_type = r.event_type AND i.rn = r.rn + 1)
       |SELECT event_type, n AS n_days,
       |  CAST(floor(l * 1e4 + 0.5) AS BIGINT) AS level_1e4,
       |  CAST(floor(b * 1e4 + 0.5) AS BIGINT) AS trend_1e4,
       |  CAST(floor((l + b + (${sAt("rec", "tmax + 1")})) * 1e4 + 0.5)
       |    AS BIGINT) AS fc_next_1e4,
       |  CASE WHEN n > 1
       |    THEN CAST(floor(sse / (n - 1) * 1e4 + 0.5) AS BIGINT)
       |    ELSE 0 END AS mse_1e4
       |FROM rec WHERE rn = n ORDER BY event_type""".stripMargin
  }
}
