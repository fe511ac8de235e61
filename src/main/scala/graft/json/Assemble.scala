package graft.json

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational → nested JSON assembly, the Spark re-expression of the
  * reference's `getObjectFromResultSet` (DatabaseManager.java:253-381).
  *
  * The reference re-nests one row at a time with recursive point
  * queries per `{child:}` / `{check:}` marker — O(children) round
  * trips. Here nesting is bulk and declarative: child objects come
  * back via one (broadcast-able) join, child arrays via one
  * `collect_list` aggregation on the FK — the plan shuffles once per
  * nesting level instead of querying once per row.
  */
object Assemble {

  /** Re-nest a child-object table into the parent as a struct column
    * (inverse of the `{child:id}` reference, java:312-326). `fk` is the
    * parent column holding the child key. Dimension-sized children
    * should be broadcast by the caller via `broadcast(child)`. */
  def nestObject(parent: DataFrame, child: DataFrame, fk: String,
      childKey: String, as: String): DataFrame = {
    val childStruct = child
      .select(col(childKey).as("_ck"),
        struct(child.columns.map(col): _*).as(as))
    parent.join(childStruct, col(fk) === col("_ck"), "left").drop("_ck")
  }

  /** Re-nest a child-array table into the parent as an array<struct>
    * column (inverse of the `{check:[types]}` reference, java:327-348).
    * `orderCols` fixes the intra-array order deterministically.
    * One shuffle on the FK; at scale, pre-bucketing the child table by
    * `childFk` makes this shuffle-free. */
  def nestArray(parent: DataFrame, parentKey: String, child: DataFrame,
      childFk: String, as: String, orderCols: Seq[String]): DataFrame = {
    val payload = child.columns.filterNot(_ == childFk)
    val arr = child
      .groupBy(col(childFk))
      .agg(sort_array(collect_list(
        struct((orderCols.map(col) ++
          payload.filterNot(orderCols.contains).map(col)): _*))).as(as))
    parent.join(arr, col(parentKey) === col(childFk), "left").drop(childFk)
  }

  /** Serialize the given columns of each row as one JSON document. */
  def toJsonDoc(cols: Column*): Column = to_json(struct(cols: _*))
}
