package graft

/** Probe: Spark 4.1.2 executes WITH RECURSIVE end-to-end (UnionLoop). */
class RecursiveCteSpec extends SparkSuite {
  test("recursive CTE executes") {
    val r = spark.sql(
      """WITH RECURSIVE t(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5
        |) SELECT CAST(sum(n) AS BIGINT) AS s FROM t""".stripMargin)
      .collect()(0).getLong(0)
    assert(r == 15L)
  }

  test("UNION distinct inside recursion is rejected (UNION ALL only)") {
    // documents the Spark 4.1 limitation that shapes q_recursive_bom:
    // cyclic fixpoints (graph reachability) need UNION-dedup per step,
    // so recursion is only safe on trees/DAGs with unique paths
    import spark.implicits._
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("rc_edges")
    val e = intercept[Exception] {
      spark.sql(
        """WITH RECURSIVE reach(id) AS (
          |  SELECT a FROM rc_edges
          |  UNION SELECT b FROM rc_edges JOIN reach ON a = id
          |) SELECT * FROM reach""".stripMargin).collect()
    }
    assert(e.getMessage.contains("UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"))
  }
}
