package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit

/** Bloom-filter build/probe over Spark's own sketch machinery — the
  * same `BloomFilterAggregate` / `BloomFilterMightContain` pair that
  * Catalyst's InjectRuntimeFilter plants automatically, exposed as a
  * Column API so a pipeline can build the filter from an ARBITRARY
  * key-set query and fold it into later jobs as a plan constant.
  *
  * The sketch is fixed-size (numBits/8 bytes regardless of input),
  * partial-aggregable (bitwise-OR merge), and probe is O(k) hashes per
  * row with zero false negatives — so prefiltering a 100 TB fact costs
  * one scan and removes most non-matching rows BEFORE any shuffle.
  * `mightContain` takes the serialized sketch as a literal because the
  * underlying expression requires a constant/scalar-subquery filter
  * side (same constant-folding pattern as the IVF centroids).
  */
object Bloom {

  /** Aggregate a 64-bit key-hash column (use `xxhash64(key)`) into a
    * serialized Bloom filter of `nBits` bits sized for `nItems` keys. */
  def sketchAgg(keyHash: Column, nItems: Long, nBits: Long): Column =
    column(new BloomFilterAggregate(expression(keyHash),
      expression(lit(nItems)), expression(lit(nBits)))
      .toAggregateExpression())

  /** Probe: true iff `keyHash` may be in the sketch (never a false
    * negative). Codegen'd; the sketch folds into the plan once. */
  def mightContain(sketch: Array[Byte], keyHash: Column): Column =
    column(BloomFilterMightContain(expression(lit(sketch)),
      expression(keyHash)))
}
