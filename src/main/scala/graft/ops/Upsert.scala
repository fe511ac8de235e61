package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** Keyed batch merge — the Spark re-expression of the reference's
  * insert-or-update by `rowNum` (DatabaseManager.java:211-229,391-447).
  *
  * The reference decides INSERT vs UPDATE per row against SQLite. In a
  * bulk engine the same contract is one merge: rows in `updates`
  * replace same-key rows in `base`; unseen keys append. Realized as
  * updates ∪ (base ⟕̸ updates) — when the update set is small relative
  * to base (the common CDC shape at 100 TB), the anti-join broadcasts
  * and base never shuffles.
  */
object Upsert {
  /** The merge is schema-evolving (reference `assertColumn` semantics
    * carried through the mutation path): an update batch may bring NEW
    * columns — surviving base rows get NULLs — and may omit base
    * columns — update rows get NULLs there. Same-schema merges are
    * unchanged. */
  def apply(base: DataFrame, updates: DataFrame, keys: Seq[String],
      broadcastUpdates: Boolean = true): DataFrame = {
    val keyDf = updates.select(keys.map(col): _*)
    val right = if (broadcastUpdates) broadcast(keyDf) else keyDf
    updates.unionByName(base.join(right, keys, "left_anti"),
      allowMissingColumns = true)
  }

  /** Schema-evolution union (reference `assertColumn`,
    * DatabaseManager.java:129-131,151-153): later batches may carry new
    * columns; earlier rows get NULLs. */
  def evolve(old: DataFrame, newer: DataFrame): DataFrame =
    old.unionByName(newer, allowMissingColumns = true)
}
