package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the custom expressions. Kept as plain static
  * methods so generated code (doGenCode) can invoke them with a single
  * call — the expressions stay inside whole-stage codegen spans while
  * the loops run as ordinary JIT-compiled JVM code.
  */
object Kernels {

  // compiled once — String.split("\\s+") recompiles the pattern per call
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def shingles(input: UTF8String, k: Int): ArrayData = {
    val toks = WS.split(input.toString.trim)
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

  def minhashSigs(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
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

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lower 8 bytes of md5 (bytes 8..16, little-endian) — exactly
    * DuckDB's `md5_number_lower`, which is what makes the SimHash
    * signature independently computable by the SQL oracle. */
  def md5Lower64(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (dig(i) & 0xffL); i -= 1 }
    h
  }

  /** Unicode-canonical form for dedup fingerprints: NFKC
    * compatibility-normalize (fullwidth/ligature forms collapse),
    * ROOT-locale casefold, then NFD-decompose and strip combining
    * marks (composed accents dissolve — NFKC alone would re-compose
    * e + U+0301 into é, which is Ll, not Mn, so the strip MUST run on
    * the decomposed form). java.text.Normalizer is pure-JVM public
    * knowledge; ASCII text is a fixed point of the whole pipeline
    * except for the casefold. */
  def nfkcCanon(s: UTF8String): UTF8String = {
    import java.text.Normalizer
    val nk = Normalizer.normalize(s.toString, Normalizer.Form.NFKC)
    val nd = Normalizer.normalize(
      nk.toLowerCase(java.util.Locale.ROOT), Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nd.length)
    var i = 0
    while (i < nd.length) {
      val c = nd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = md5Lower64(arr.getUTF8String(i))
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
    sig
  }

  /** nProbe nearest centroid ids for an embedding, squared-L2,
    * sequential per-dim folds (identical arithmetic to the zip_with/
    * aggregate formulation); ties broken by lower cell id. `cents` is
    * the k×dim centroid matrix flattened row-major. */
  def nearestCells(emb: ArrayData, cents: Array[Double], dim: Int,
      nProbe: Int): ArrayData = {
    val k = cents.length / dim
    // tolerate short embeddings (missing dims contribute 0, like a
    // zero-padded vector) — reading past numElements would touch
    // arbitrary UnsafeArrayData memory
    val m = math.min(dim, emb.numElements())
    val d = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      val off = c * dim
      while (i < m) {
        val diff = emb.getDouble(i) - cents(off + i)
        acc += diff * diff
        i += 1
      }
      while (i < dim) { acc += cents(off + i) * cents(off + i); i += 1 }
      d(c) = acc
      c += 1
    }
    val n = math.min(nProbe, k)
    val out = new Array[Any](n)
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < n) {
      var best = -1
      var bestD = Double.MaxValue
      var cc = 0
      while (cc < k) {
        if (!taken(cc) && d(cc) < bestD) { best = cc; bestD = d(cc) }
        cc += 1
      }
      if (best < 0) {
        // all remaining distances are NaN (NaN embedding dim) — fall
        // back to the lowest untaken cell instead of crashing the job
        var cc2 = 0
        while (best < 0 && cc2 < k) { if (!taken(cc2)) best = cc2; cc2 += 1 }
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane sign-bit bucket code: sequential per-dim dot
    * folds (same arithmetic as the HOF formulation, so the literal-
    * folded SQL oracle still reproduces the buckets). `planes` is the
    * nPlanes×dim matrix flattened row-major. */
  def lshCode(emb: ArrayData, planes: Array[Double], dim: Int): Long = {
    val nPlanes = planes.length / dim
    var code = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      val off = p * dim
      while (i < dim) { dot += emb.getDouble(i) * planes(off + i); i += 1 }
      if (dot > 0) code |= (1L << p)
      p += 1
    }
    code
  }

  /** Fused text → MinHash signature: tokenizes like [[shingles]]
    * (trim + \s+ split), then hashes each k-token window's UTF-8 bytes
    * from a reusable scratch buffer — no shingle-string
    * materialization, no distinct-set bookkeeping. BIT-IDENTICAL to
    * `minhashSigs(shingles(text, k))` because (a) concatenating the
    * tokens' UTF-8 encodings with 0x20 equals the UTF-8 encoding of
    * the space-joined shingle string (UTF-8 is context-free per code
    * point), so each window hashes to the same xxhash64, and (b) the
    * per-permutation MIN over the window multiset equals the min over
    * the distinct shingle set. Returns null when the doc has < k
    * tokens (the rows [[graft.dedup.MinHashLSH.signatures]] drops).
    * Pinned by a corpus-wide parity test in Round10Spec. */
  def minhashDoc(input: UTF8String, k: Int,
      a: Array[Long], b: Array[Long]): ArrayData = {
    val toks = WS.split(input.toString.trim)
    if (toks.length < k) return null
    val nt = toks.length
    val tb = new Array[Array[Byte]](nt)
    var i = 0
    while (i < nt) {
      tb(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    var maxLen = 0
    var w = 0
    while (w <= nt - k) {
      var len = k - 1
      var j = 0
      while (j < k) { len += tb(w + j).length; j += 1 }
      if (len > maxLen) maxLen = len
      w += 1
    }
    val scratch = new Array[Byte](maxLen)
    val n = a.length
    val sigs = Array.fill(n)(Long.MaxValue)
    w = 0
    while (w <= nt - k) {
      var len = 0
      var j = 0
      while (j < k) {
        if (j > 0) { scratch(len) = ' '; len += 1 }
        val t = tb(w + j)
        System.arraycopy(t, 0, scratch, len, t.length)
        len += t.length
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(scratch,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      var p = 0
      while (p < n) {
        val v = h * a(p) + b(p)
        if (v < sigs(p)) sigs(p) = v
        p += 1
      }
      w += 1
    }
    new GenericArrayData(sigs)
  }

  /** Per-band LSH bucket keys of a minhash signature: for band j the
    * bucket hash is xxhash64(seed 42) of the band's `r` signature longs
    * rendered as a comma-joined decimal string — BIT-IDENTICAL to the
    * declarative `xxhash64(concat_ws(",", cast(slice(sigs, j*r+1, r) as
    * array<string>)))` it replaces. The declarative form duplicated the
    * whole upstream `minhashSigs(shingles(text))` subtree once PER BAND
    * when projected into a Generate (32× recompute, ~690 µs/doc
    * measured); this kernel reads the signature array once. */
  def bandKeys(sigs: ArrayData, bands: Int, r: Int): ArrayData = {
    val sb = new java.lang.StringBuilder(r * 21)
    val out = new Array[Any](bands)
    var j = 0
    while (j < bands) {
      sb.setLength(0)
      var p = 0
      while (p < r) {
        if (p > 0) sb.append(',')
        sb.append(sigs.getLong(j * r + p))
        p += 1
      }
      val u = UTF8String.fromString(sb.toString)
      val bh = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), 42L)
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](j, bh))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Number of positions where two minhash signatures agree — the
    * per-candidate-pair Jaccard estimate numerator. Runs once per
    * candidate pair (millions at crawl scale), which is why it is a
    * kernel and not the interpreted aggregate(zip_with(...)) HOF. */
  def sigAgreement(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** SQ8 quantize→dequantize roundtrip: per-dim 8-bit scalar
    * quantization against [mins(i), maxs(i)] and immediate codeword
    * reconstruction — the stored int8 index's view of the vector. The
    * exact IEEE op sequence (sub, mul, div, +0.5, floor, then
    * mn + code·span/255 left-to-right) is mirrored verbatim by the SQL
    * oracle, so codes and reconstructions are bit-identical across
    * engines; corpus-fitted mins/maxs bound every input, so no clamp
    * is needed on either side. */
  def sq8Recon(emb: ArrayData, mins: Array[Double],
      maxs: Array[Double]): ArrayData = {
    val n = math.min(emb.numElements(), mins.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val mn = mins(i)
      val span = maxs(i) - mn
      out(i) =
        if (span == 0) mn
        else mn + math.floor((emb.getDouble(i) - mn) * 255.0 / span + 0.5) *
          span / 255.0
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** All index-ordered pairs (i < j) of a long array as
    * array<struct<a,b>> — the basket pair-enumeration kernel (one
    * kernel call, so the Generate collapse cannot re-inline the array
    * builder per output slot — the BandKeys lesson). */
  def orderedPairs(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = xs.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](a, xs.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All index-ordered triples (i < j < k) of a long array as
    * array<struct<a,b,c>> — the level-3 basket enumeration kernel. */
  def orderedTriples(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n * (n - 1) * (n - 2) / 6)
    var m = 0
    var i = 0
    while (i < n) {
      val a = xs.getLong(i)
      var j = i + 1
      while (j < n) {
        val b = xs.getLong(j)
        var k = j + 1
        while (k < n) {
          out(m) = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](a, b, xs.getLong(k)))
          m += 1
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
