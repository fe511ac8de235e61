package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hashing-heavy dedup kernels.
  *
  * The same logic is expressible with built-in higher-order functions
  * (transform/aggregate/zip_with), but HOFs are interpreted — measured
  * ~28 ms/doc for 64-permutation MinHash at sf0.1. These expressions
  * run the loops over primitive arrays instead (µs/doc) while staying
  * inside the Catalyst plan (usable in any DataFrame projection).
  * CodegenFallback is fine here: each is one eval per row doing the
  * whole kernel, so there is no per-element virtual-call overhead for
  * codegen to remove.
  */

/** Distinct whitespace k-gram shingles of a string, in first-seen
  * order. Output equals
  * `array_distinct(transform(sequence(...), concat_ws(' ', ...)))`. */
case class Shingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim
      .split("\\s+")
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    while (i <= toks.length - k) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): Shingles = copy(child = c)
}

/** MinHash signature of an array<string>: xxhash64(seed 42) each
  * element, then per-permutation minima of a·h+b (64-bit wrap). */
case class MinHashSigs(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression with CodegenFallback {
  require(a.length == b.length)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = a.length
    val sigs = Array.fill(n)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes(), 42L)
      var p = 0
      while (p < n) {
        val v = h * a(p) + b(p)
        if (v < sigs(p)) sigs(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSigs = copy(child = c)
}

/** 64-bit SimHash of an array<string>: each element's xxhash64 votes
  * its bits ±1; the sign of each bit's total forms the signature. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes(), 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Cosine similarity of two array<double> columns — primitive loop,
  * identical arithmetic to the sequential-fold formulation
  * (dot/(√na·√nb)) so the DuckDB oracle parity holds. */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSim = copy(left = l, right = r)
}

/** Column-API entry points for the custom expressions. */
object exprs {
  /** Distinct whitespace k-gram shingles. */
  def shingles(text: Column, k: Int = 3): Column =
    column(Shingles(expression(text), k))

  /** Deterministic affine-permutation constants (seed 42). */
  def minhashPerms(numPerms: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val ab = Array.fill(numPerms)((rnd.nextLong() | 1L, rnd.nextLong()))
    (ab.map(_._1), ab.map(_._2))
  }

  /** MinHash signature array of an array<string> column. */
  def minhashSigs(shingleCol: Column, numPerms: Int): Column = {
    val (a, b) = minhashPerms(numPerms)
    column(MinHashSigs(expression(shingleCol), a, b))
  }

  /** 64-bit SimHash of an array<string> column. */
  def simhash64(items: Column): Column =
    column(SimHash64(expression(items)))

  /** Cosine similarity of two array<double> columns. */
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
}
