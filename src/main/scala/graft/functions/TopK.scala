package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k per group as a TypedImperativeAggregate.
  *
  * The window formulation (`row_number().over(partitionBy…)` + filter)
  * shuffles and sorts EVERY row of every group. This aggregate keeps a
  * k-bounded heap per group with map-side partial aggregation, so the
  * shuffle carries at most k rows per group per input partition — the
  * difference between shuffling 100 TB and shuffling k·|groups| rows.
  *
  * Ordering: score descending, id ascending on ties — identical to
  * `row_number() OVER (ORDER BY score DESC, id)`.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0)

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  // analysis-time contract (r10 ADVICE, Theta pattern): numeric inputs
  // coerce, anything else fails resolution — not mid-job in update()
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Worst element first: lowest score, then largest id. */
  private def cmp = new java.util.Comparator[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(x._1, y._1)
      if (c != 0) c else java.lang.Long.compare(y._2, x._2)
    }
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, cmp)

  private def offer(buf: java.util.PriorityQueue[(Double, Long)],
      s: Double, i: Long): Unit = {
    if (buf.size < k) buf.add((s, i))
    else {
      val worst = buf.peek()
      if (s > worst._1 || (s == worst._1 && i < worst._2)) {
        buf.poll(); buf.add((s, i))
      }
    }
  }

  override def update(buf: java.util.PriorityQueue[(Double, Long)],
      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.PriorityQueue[(Double, Long)],
      other: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (s, i) = it.next(); offer(buf, s, i) }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = buf.toArray(new Array[(Double, Long)](buf.size))
      .sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(arr.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.add((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKByScore =
    copy(score = cs(0), id = cs(1))
}

object TopKByScore {
  /** Column API: array<struct<score,id>> of the group's top k. */
  def topK(score: Column, id: Column, k: Int): Column =
    column(TopKByScore(expression(score), expression(id), k)
      .toAggregateExpression())
}
