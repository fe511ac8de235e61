package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hashing-heavy kernels.
  *
  * The same logic is expressible with built-in higher-order functions
  * (transform/aggregate/zip_with), but HOFs are interpreted — measured
  * ~28 ms/doc for 64-permutation MinHash at sf0.1. These expressions
  * run the loops in `Kernels` as plain JIT-compiled code (µs/doc) and
  * implement `doGenCode` as a single static call, so they stay inside
  * whole-stage-codegen spans instead of forcing a fallback boundary.
  */

/** Distinct whitespace k-gram shingles of a string, in first-seen
  * order. Output equals
  * `array_distinct(transform(sequence(...), concat_ws(' ', ...)))`. */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.shingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingles($c, $k)")
  override protected def withNewChildInternal(c: Expression): Shingles =
    copy(child = c)
}

/** MinHash signature of an array<string>: xxhash64(seed 42) each
  * element, then per-permutation minima of a·h+b (64-bit wrap). */
case class MinHashSigs(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  require(a.length == b.length)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.minhashSigs(input.asInstanceOf[ArrayData], a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.minhashSigs($c, $aRef, $bRef)")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSigs =
    copy(child = c)
}

/** 64-bit SimHash of an array<string>: each element's xxhash64 votes
  * its bits ±1; the sign of each bit's total forms the signature. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Kernels.simhash64(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Lower 8 bytes of md5, little-endian — DuckDB's `md5_number_lower`
  * (as a signed 64-bit reinterpretation). The portable deterministic
  * hash for sampling decisions that must be reproducible by the SQL
  * oracle AND stable across engines/releases (xxhash64 seeds are
  * engine-internal; md5 is everywhere). */
case class Md5Lower64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Kernels.md5Lower64(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.md5Lower64($c)")
  override protected def withNewChildInternal(c: Expression): Md5Lower64 =
    copy(child = c)
}

/** Unicode canonicalization for dedup fingerprints — NFKC + ROOT
  * casefold + NFD combining-mark strip ([[Kernels.nfkcCanon]]): the
  * pass that makes fullwidth/homoglyph-width, case and composed-accent
  * variants collapse to one fingerprint where an ASCII lower() cannot.
  * Codegen'd static call (the interpreted-HOF hazard does not apply,
  * but the per-row kernel convention does). */
case class NfkcCanon(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Kernels.nfkcCanon(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.nfkcCanon($c)")
  override protected def withNewChildInternal(c: Expression): NfkcCanon =
    copy(child = c)
}

/** Cosine similarity of two array<double> columns — identical
  * arithmetic to the sequential fold dot/(√na·√nb), so the DuckDB
  * oracle parity holds. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(Kernels.cosine(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.Kernels.cosine($l, $r)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSim = copy(left = l, right = r)
}

/** nProbe nearest centroid ids (squared-L2, ties to lower id) — the
  * IVF cell-assignment kernel. Runs over the WHOLE corpus, so the
  * interpreted HOF formulation (k×dim lambda evals per row) is the
  * wrong tool; this is one static call inside codegen. */
case class NearestCells(child: Expression, cents: Array[Double], dim: Int,
    nProbe: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.nearestCells(input.asInstanceOf[ArrayData], cents, dim, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCents", cents, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.nearestCells($c, $ref, $dim, $nProbe)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

/** Random-hyperplane sign-bucket code — the ANN-LSH corpus bucketing
  * kernel (same sequential dot arithmetic as the HOF form, so the
  * literal-folded SQL oracle still reproduces the buckets). */
case class LshCodeExpr(child: Expression, planes: Array[Double], dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      Kernels.lshCode(input.asInstanceOf[ArrayData], planes, dim))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.lshCode($c, $ref, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): LshCodeExpr =
    copy(child = c)
}

/** SQ8 quantize→dequantize reconstruction of an array<double> column
  * against corpus-fitted per-dim [min, max] — the scalar-quantized
  * index's ADC view. Runs over the WHOLE corpus (the encode pass), so
  * it is a codegen'd kernel, not an interpreted transform(). */
case class Sq8Recon(child: Expression, mins: Array[Double],
    maxs: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.sq8Recon(input.asInstanceOf[ArrayData], mins, maxs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("sq8Mins", mins, "double[]")
    val mx = ctx.addReferenceObj("sq8Maxs", maxs, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.sq8Recon($c, $mn, $mx)")
  }
  override protected def withNewChildInternal(c: Expression): Sq8Recon =
    copy(child = c)
}

/** Per-band LSH bucket keys (array<struct<band:int,bh:bigint>>) of a
  * minhash signature array. Value-identical to the declarative
  * per-band `xxhash64(concat_ws(",", slice(sigs, j*r+1, r)))` array,
  * but evaluates the (expensive) signature child exactly ONCE — the
  * declarative form re-inlines the whole upstream subtree into every
  * band slot when the optimizer collapses projections into a
  * Generate (see Kernels.bandKeys). */
case class BandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bh", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.bandKeys(input.asInstanceOf[ArrayData], bands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.bandKeys($c, $bands, $rowsPerBand)")
  override protected def withNewChildInternal(c: Expression): BandKeys =
    copy(child = c)
}

/** Fused text → MinHash signature (null when the doc has < k tokens).
  * Value-identical to `MinHashSigs(Shingles(text, k))` — see
  * Kernels.minhashDoc for the equivalence argument — but one kernel
  * call with no shingle-array materialization: the batch signature
  * path for corpus-scale LSH. */
case class MinHashDoc(child: Expression, k: Int, a: Array[Long],
    b: Array[Long]) extends UnaryExpression {
  require(a.length == b.length)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.minhashDoc(input.asInstanceOf[UTF8String], k, a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Kernels.minhashDoc($c, $k, $aRef, $bRef);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(c: Expression): MinHashDoc =
    copy(child = c)
}

/** Positions where two bigint-array signatures agree (the minhash
  * Jaccard-estimate numerator) — per-candidate-pair hot path. */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(l: Any, r: Any): Any =
    Kernels.sigAgreement(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Kernels.sigAgreement($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SigAgreement = copy(left = l, right = r)
}

/** All index-ordered pairs (i<j) of a bigint array —
  * array<struct<a,b>> in one kernel call (see Kernels.orderedPairs). */
case class OrderedPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.orderedPairs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.orderedPairs($c)")
  override protected def withNewChildInternal(c: Expression): OrderedPairs =
    copy(child = c)
}

/** All index-ordered triples (i<j<k) of a bigint array —
  * array<struct<a,b,c>> in one kernel call. */
case class OrderedTriples(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.orderedTriples(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.orderedTriples($c)")
  override protected def withNewChildInternal(c: Expression): OrderedTriples =
    copy(child = c)
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

  /** Fused text → MinHash signature column (null below k tokens). */
  def minhashDoc(text: Column, k: Int, numPerms: Int): Column = {
    val (a, b) = minhashPerms(numPerms)
    column(MinHashDoc(expression(text), k, a, b))
  }

  /** Agreeing positions of two signature columns. */
  def sigAgreement(a: Column, b: Column): Column =
    column(SigAgreement(expression(a), expression(b)))

  /** Per-band LSH bucket keys of a minhash-signature column. */
  def bandKeys(sigs: Column, bands: Int, rowsPerBand: Int): Column =
    column(BandKeys(expression(sigs), bands, rowsPerBand))

  /** 64-bit SimHash of an array<string> column. */
  def simhash64(items: Column): Column =
    column(SimHash64(expression(items)))

  /** md5-lower-64 of a string column (≡ DuckDB md5_number_lower). */
  def md5Lower64(text: Column): Column =
    column(Md5Lower64(expression(text)))

  /** NFKC + casefold + combining-mark-strip canonical form. */
  def nfkcCanon(text: Column): Column =
    column(NfkcCanon(expression(text)))

  /** nProbe nearest centroid ids for an array<double> column. */
  def nearestCells(emb: Column, cents: Array[Array[Double]],
      nProbe: Int): Column = {
    val dim = cents.head.length
    column(NearestCells(expression(emb), cents.flatten, dim, nProbe))
  }

  /** LSH sign-bucket code for an array<double> column. */
  def lshCode(emb: Column, planes: Seq[Seq[Double]]): Column = {
    val dim = planes.head.length
    column(LshCodeExpr(expression(emb), planes.flatten.toArray, dim))
  }

  /** Cosine similarity of two array<double> columns. */
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))

  /** SQ8 quantize→dequantize reconstruction against per-dim bounds. */
  def sq8Recon(emb: Column, mins: Array[Double],
      maxs: Array[Double]): Column =
    column(Sq8Recon(expression(emb), mins, maxs))

  /** All index-ordered pairs (i<j) of a bigint-array column. */
  def orderedPairs(xs: Column): Column =
    column(OrderedPairs(expression(xs)))

  /** All index-ordered triples (i<j<k) of a bigint-array column. */
  def orderedTriples(xs: Column): Column =
    column(OrderedTriples(expression(xs)))
}
