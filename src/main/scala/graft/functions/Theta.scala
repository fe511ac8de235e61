package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Theta sketches (KMV: the k minimum hash values of a set) as the
  * distinct-count SET-ALGEBRA primitive: unlike HLL, theta sketches
  * support intersection and difference, so "users who did A and B"
  * becomes a column operation over two 100-byte-to-128-KiB blobs
  * instead of a |users|-row distinct join.
  *
  * Determinism: a theta sketch is a pure set function of its input —
  * the retained entries are the k smallest of a fixed hash, so update
  * order and micro-batch/partition boundaries cannot change the
  * result. Below k distinct values the sketch is EXACT (the estimate
  * is the retained-entry count), which is what lets the gate verify
  * set-op estimates value-for-value; above k the estimate carries the
  * published ~1/√k relative error the contract flags assert.
  *
  * Scale shape: buffer is O(k) regardless of input, merge is a KMV
  * union (map-side combinable), the shuffle carries one compact blob
  * per partition — the same mergeable-summary substrate as
  * [[CountMinSketch]] and the q_hll_merge DataSketches path.
  */
case class ThetaSketchAgg(
    key: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  // analysis-time contract (r10 ADVICE): a non-BIGINT key (e.g. an int
  // user_id after a testdata type drift) coerces or fails resolution
  // instead of a mid-job ClassCastException in update()
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val k = key.eval(input)
    if (k != null) buf.update(k.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ThetaSketchAgg = copy(key = c.head)
}

/** Distinct estimate of one compact theta sketch blob. */
case class ThetaEstimate(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    CompactSketch.wrap(Memory.wrap(input.asInstanceOf[Array[Byte]]))
      .getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Set-op estimates over two compact theta sketch blobs. Cold-path
  * (runs on the few-row per-group sketch table, never per input row),
  * so CodegenFallback is the right trade. */
sealed abstract class ThetaBinaryEstimate extends BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  protected def estimate(a: CompactSketch, b: CompactSketch): Double
  override def nullSafeEval(l: Any, r: Any): Any = estimate(
    CompactSketch.wrap(Memory.wrap(l.asInstanceOf[Array[Byte]])),
    CompactSketch.wrap(Memory.wrap(r.asInstanceOf[Array[Byte]])))
}

/** |A ∩ B| estimate. */
case class ThetaIntersectEst(left: Expression, right: Expression)
    extends ThetaBinaryEstimate {
  override protected def estimate(a: CompactSketch, b: CompactSketch): Double = {
    val i: Intersection = SetOperation.builder().buildIntersection()
    i.intersect(a); i.intersect(b)
    i.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ThetaIntersectEst = copy(left = l, right = r)
}

/** |A ∪ B| estimate. */
case class ThetaUnionEst(left: Expression, right: Expression)
    extends ThetaBinaryEstimate {
  override protected def estimate(a: CompactSketch, b: CompactSketch): Double = {
    val u = SetOperation.builder().buildUnion()
    u.union(a); u.union(b)
    u.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ThetaUnionEst = copy(left = l, right = r)
}

/** |A \ B| estimate. */
case class ThetaAnotBEst(left: Expression, right: Expression)
    extends ThetaBinaryEstimate {
  override protected def estimate(a: CompactSketch, b: CompactSketch): Double =
    Sketches.setOperationBuilder().buildANotB().aNotB(a, b).getEstimate
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ThetaAnotBEst = copy(left = l, right = r)
}

object Theta {
  /** Mergeable theta sketch of a BIGINT key column (lgK log2 nominal
    * entries; exact below 2^lgK distinct keys). */
  def sketch(key: Column, lgK: Int = 14): Column =
    column(ThetaSketchAgg(expression(key), lgK).toAggregateExpression())

  def estimate(sk: Column): Column =
    column(ThetaEstimate(expression(sk)))

  def intersectEst(a: Column, b: Column): Column =
    column(ThetaIntersectEst(expression(a), expression(b)))
  def unionEst(a: Column, b: Column): Column =
    column(ThetaUnionEst(expression(a), expression(b)))
  def aNotBEst(a: Column, b: Column): Column =
    column(ThetaAnotBEst(expression(a), expression(b)))
}
