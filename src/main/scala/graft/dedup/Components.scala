package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: candidate pairs → connected
  * components → keeper per document (SURVEY §2.3).
  *
  * Small-star-ish min-label propagation: every doc starts labeled with
  * itself; each round adopts the minimum label in its pair
  * neighborhood; converged when no label changes. Near-dup clusters are
  * small (bounded by the LSH bucket cap), so the loop converges in a
  * few rounds; each round is one shuffle keyed on doc id. The loop is
  * driver-controlled but the data never leaves the cluster — only the
  * converged? flag (one count) comes back per round.
  */
object Components {

  /** pairs: (id_a, id_b) edges. Returns (id, keeper) for every id that
    * appears in any pair, keeper = min id of its component. */
  def keepers(pairs: DataFrame, maxRounds: Int = 10): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("keeper", col("id"))
      .cache()
    // labels only ever decrease, so the keeper-sum is strictly monotone:
    // an unchanged sum == a fixpoint. That makes the convergence check a
    // single aggregate on the already-cached frame instead of a join.
    // sum() over an empty frame is NULL — coalesce handles the
    // no-candidate-pairs case (clean corpus).
    def keeperSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("keeper")), lit(0L))).head().getLong(0)
    var prevSum = keeperSum(labels)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      // each node adopts min(own label, neighbors' labels)
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("keeper")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("keeper"), coalesce(col("nmin"), col("keeper")))
            .as("keeper"))
        .cache()
      val nextSum = keeperSum(next)
      labels.unpersist()
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      round += 1
    }
    labels
  }
}
