package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch as a TypedImperativeAggregate: a fixed
  * `depth × width` counter grid; each key increments one counter per
  * row (row-salted hash), and a key's estimate is the MIN of its
  * counters — never an underestimate, over by at most the collision
  * mass in its emptiest bucket.
  *
  * Scale shape: the buffer is `depth·width` longs (8 kB at 4×256)
  * regardless of input size, updates are O(depth) with no allocation,
  * and merge is elementwise add — so partial sketches combine map-side
  * and the shuffle carries one 8 kB blob per partition instead of a
  * per-key table. This is the streaming/heavy-hitter counterpart to
  * the k-bounded [[TopKByScore]] heap.
  *
  * The row hash is md5-lower-64 of `"r|key"` — DuckDB's
  * `md5_number_lower` computes the identical value, so the oracle can
  * reconstruct every counter a key touches and replay the estimates
  * exactly (no error-bound hand-waving: the estimate VALUES are
  * verified).
  */
case class CountMinSketch(
    key: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes {

  require(depth > 0 && width > 0)

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // analysis-time contract (r10 ADVICE, Theta pattern): ints coerce to
  // long, anything else fails resolution — not mid-job in update()
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  /** Bucket of `key` in sketch row `r` (engine-portable md5 hash). */
  private def bucket(r: Int, k: Long): Int =
    ((Kernels.md5Lower64(UTF8String.fromString(s"$r|$k"))
      & Long.MaxValue) % width).toInt

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    if (k != null) {
      val kl = k.asInstanceOf[Long]
      var r = 0
      while (r < depth) { buf(r * width + bucket(r, kl)) += 1; r += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CountMinSketch =
    copy(key = cs(0))
}

object CountMinSketch {
  /** Column API: the sketch of a Long key column as array<long> of
    * length depth·width (row-major). */
  def sketch(key: Column, depth: Int, width: Int): Column =
    column(CountMinSketch(expression(key), depth, width)
      .toAggregateExpression())
}
