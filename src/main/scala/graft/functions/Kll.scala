package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** KLL doubles quantile sketch (Apache DataSketches) as a
  * TypedImperativeAggregate — the MERGEABLE quantile substrate the
  * exact `percentile` cannot be at 100 TB: per-shard sketches are a
  * few kB regardless of input size, combine map-side, and union
  * associatively across shards/days/reruns, so any quantile of any
  * re-partitioning of the corpus is a sketch merge, never a re-scan
  * (the quantile analogue of `hll_sketch_agg`/`hll_union_agg`, which
  * Spark ships for distinct counting but not for quantiles).
  *
  * The KLL compaction path is randomized, so estimates are not
  * replayable cross-engine; the driver contract is therefore the
  * error-bound pattern: the sketch's ε(k) normalized-rank-error
  * guarantee, asserted against exactly-computed ranks (see
  * `q_kll_quantile_merge`).
  */
case class KllSketchAgg(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  // analysis-time contract (r10 ADVICE): a non-numeric value column
  // fails resolution (and ints coerce to double) instead of a mid-job
  // ClassCastException after a testdata type drift
  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = value.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): KllSketchAgg = copy(value = cs(0))
}

/** Union of serialized KLL sketches (the shard-merge half). */
case class KllMergeAgg(
    sketch: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(sketch)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = sketch.eval(input)
    if (v != null) buf.merge(KllDoublesSketch.heapify(
      Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): KllMergeAgg = copy(sketch = cs(0))
}

/** Quantile estimate from a serialized KLL sketch (INCLUSIVE search:
  * est = smallest value whose inclusive rank ≥ q — the convention the
  * exact-rank verification mirrors with `count(v <= est) / n`).
  * Eval-only: runs on few-row merged-sketch frames, never per-row. */
case class KllQuantile(child: Expression, q: Double)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
      .getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
  override protected def withNewChildInternal(c: Expression): KllQuantile =
    copy(child = c)
}

object Kll {
  /** Sketch of a double column (k sizes accuracy: ε ≈ 2.446/k^0.9). */
  def sketch(value: Column, k: Int): Column =
    column(KllSketchAgg(expression(value), k).toAggregateExpression())

  /** Union of serialized sketches. */
  def merge(sketch: Column, k: Int): Column =
    column(KllMergeAgg(expression(sketch), k).toAggregateExpression())

  /** Quantile estimate from a serialized sketch. */
  def quantile(sketch: Column, q: Double): Column =
    column(KllQuantile(expression(sketch), q))
}
