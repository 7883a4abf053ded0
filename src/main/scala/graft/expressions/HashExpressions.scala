package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the document-dedup hot loops.
 *
 * Why: Spark's higher-order functions (transform/aggregate) are interpreted,
 * not codegen'd — a k=64 minhash over ~1000 shingles costs ~64k boxed lambda
 * evaluations per row (measured 250+ s for 500 docs at sf0.01). These
 * expressions run the same math as a tight unboxed loop over UTF8String
 * bytes (~3 orders of magnitude less overhead), which is what makes
 * minhash-LSH dedup viable over 100 TB of documents.
 *
 * Distinctness note: minhash needs min over the shingle SET, but min over
 * the sliding-window MULTISET is identical — so no O(n²) array_distinct.
 */
case class MinHashShingles(child: Expression, shingleSize: Int, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingles"

  // Universal-hashing family: ONE xxhash64 per shingle, then k linear
  // mixes h_i = a_i*h + b_i (odd multipliers from splitmix64). This is the
  // standard minhash construction — 64 multiply-adds instead of 64 full
  // hash passes per shingle (~10× on the hot loop).
  private lazy val (mulA, addB) = {
    def splitmix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val a = Array.tabulate(numHashes)(i => splitmix(i.toLong * 2 + 1) | 1L)
    val b = Array.tabulate(numHashes)(i => splitmix(i.toLong * 2 + 2))
    (a, b)
  }

  override def nullSafeEval(input: Any): Any =
    HashImpls.minhash(input.asInstanceOf[UTF8String], shingleSize, numHashes, mulA, addB)

  // emit a direct static call: the shingling loop runs unboxed inside the
  // surrounding WholeStageCodegen span (a CodegenFallback would box every
  // document through interpreted eval)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val aRef = ctx.addReferenceObj("minhashMulA", mulA, "long[]")
    val bRef = ctx.addReferenceObj("minhashAddB", addB, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HashImpls.minhash($c, $shingleSize, $numHashes, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashShingles =
    copy(child = newChild)
}

/**
 * Distinct word-n-gram xxhash64 values of a text, as one unboxed pass.
 *
 * Byte-for-byte equivalent (modulo 64-bit hash collisions) to the
 * composed Spark pipeline the dedup/contamination paths used before:
 * {{{
 *   array_distinct(transform(
 *     // wordShingles: split normalized text, join windows with " "
 *     <window strings of n tokens>, s => xxhash64(s)))        // seed 42
 * }}}
 * The key observation: after whitespace collapse, a window's
 * `concat_ws(" ", tokens slice)` string IS a contiguous byte range of
 * the normalized text — so each n-gram hashes zero-copy from the
 * normalization buffer, and neither the shingle strings nor the regex
 * normalization (`regexp_replace` per row) are ever materialized.
 * Normalization replicates `regexp_replace(lower(trim(c)), "\\s+", " ")`
 * exactly: trim spaces, UTF8String.toLowerCase (what Spark's `lower`
 * calls), then collapse Java-regex `\s` runs ([ \t\n\x0B\f\r]) to one
 * space.
 */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    HashImpls.ngramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HashImpls.ngramHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** Static hash-loop implementations shared by interpreted eval and the
  * generated code (the `StaticInvoke`-style pattern). */
object HashImpls {

  private def isJavaRegexSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def ngramHashes(text: UTF8String, n: Int): ArrayData = {
    // normalize: trim spaces -> lower (Spark's own UTF8String op) ->
    // collapse \s+ runs to a single 0x20. All \s chars are single-byte
    // ASCII, so the byte scan is UTF-8 safe.
    val lowered = text.trim().toLowerCase()
    val src = lowered.getBytes
    val buf = new Array[Byte](src.length)
    var w = 0
    var i = 0
    while (i < src.length) {
      if (isJavaRegexSpace(src(i))) {
        buf(w) = ' '; w += 1
        while (i < src.length && isJavaRegexSpace(src(i))) i += 1
      } else {
        buf(w) = src(i); w += 1; i += 1
      }
    }
    // token boundaries: T spaces => T+1 tokens (split keeps empty tokens)
    var spaces = 0
    i = 0
    while (i < w) { if (buf(i) == ' ') spaces += 1; i += 1 }
    val nTokens = spaces + 1
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < w) {
      if (buf(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = w
    val nWindows = math.max(nTokens - n + 1, 1)
    // distinct via open addressing; first-occurrence order preserved
    var cap = 4
    while (cap < nWindows * 2) cap <<= 1
    val slots = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](nWindows)
    var nOut = 0
    var p = 0
    while (p < nWindows) {
      val from = starts(p)
      val to = ends(math.min(p + n - 1, nTokens - 1))
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET + from,
        to - from, 42L)
      var s = (h ^ (h >>> 32)).toInt & (cap - 1)
      var fresh = true
      while (used(s) && { if (slots(s) == h) { fresh = false; false } else true })
        s = (s + 1) & (cap - 1)
      if (fresh) { used(s) = true; slots(s) = h; out(nOut) = h; nOut += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  def minhash(text: UTF8String, shingleSize: Int, numHashes: Int,
              mulA: Array[Long], addB: Array[Long]): ArrayData = {
    val nChars = text.numChars()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nWindows = math.max(nChars - shingleSize + 1, 1)
    // ASCII fast path: byte windows == char windows, hash in place with no
    // per-shingle allocation; multi-byte text falls back to substringSQL.
    val ascii = text.numBytes() == nChars
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var p = 0
    while (p < nWindows) {
      val h =
        if (ascii)
          XXH64.hashUnsafeBytes(base, off + p, math.min(shingleSize, nChars - p), 42L)
        else
          XXH64.hashUTF8String(text.substringSQL(p + 1, shingleSize), 42L)
      var k = 0
      while (k < numHashes) {
        val hk = mulA(k) * h + addB(k)
        if (hk < mins(k)) mins(k) = hk
        k += 1
      }
      p += 1
    }
    new GenericArrayData(mins)
  }

  def hyperplaneSignature(vec: ArrayData, planes: Array[Array[Double]],
                          isFloat: Boolean): Long = {
    val d = vec.numElements()
    val v = new Array[Double](d)
    var i = 0
    while (i < d) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val lim = math.min(d, p.length)
      var dot = 0.0
      var j = 0
      while (j < lim) { dot += v(j) * p(j); j += 1 }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /**
   * Top-`n` centroid ids by cosine for one vector against a small static
   * centroid matrix (score desc, id asc tie-break). One unboxed pass:
   * vector norm once, then per-centroid dot + insertion into an n-slot
   * leaderboard. `centNorms` are precomputed per expression instance.
   * Elements are assumed non-null (embedding arrays).
   */
  def nearestCentroids(vec: ArrayData, ids: Array[Long],
                       cents: Array[Array[Double]], centNorms: Array[Double],
                       n: Int, isFloat: Boolean): ArrayData = {
    val d = vec.numElements()
    val v = new Array[Double](d)
    var nv = 0.0
    var i = 0
    while (i < d) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      v(i) = x; nv += x * x; i += 1
    }
    val nvSqrt = math.sqrt(nv)
    val k = cents.length
    val keep = math.min(n, k)
    val bs = Array.fill(keep)(Double.NegativeInfinity)
    val bi = Array.fill(keep)(Long.MaxValue)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      var dot = 0.0
      var j = 0
      val m = math.min(d, cv.length)
      while (j < m) { dot += v(j) * cv(j); j += 1 }
      // zero vector (or zero centroid) → equidistant score 0.0 rather
      // than NaN: NaN fills no leaderboard slot and would leak the
      // Long.MaxValue sentinel as a phantom cell id
      val denom = nvSqrt * centNorms(c)
      val score = if (denom == 0.0) 0.0 else dot / denom
      var pos = keep
      while (pos > 0 && (score > bs(pos - 1) ||
        (score == bs(pos - 1) && ids(c) < bi(pos - 1)))) pos -= 1
      if (pos < keep) {
        var q = keep - 1
        while (q > pos) { bs(q) = bs(q - 1); bi(q) = bi(q - 1); q -= 1 }
        bs(pos) = score; bi(pos) = ids(c)
      }
      c += 1
    }
    new GenericArrayData(bi)
  }

  /** Bucket index = count of boundaries strictly below `v` (binary
    * search; ties go left) — the range-bucket primitive for distributed
    * prefix sums. */
  def rangeBucket(v: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** See [[QgramOccHashes]]. One pass, one HashMap of gram counts. */
  def qgramOccHashes(text: UTF8String, q: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    val n = len + q - 1
    val out = new Array[Long](n)
    val counts = new java.util.HashMap[java.lang.Long, java.lang.Integer](n * 2)
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < q) {
        val p = i + j // position in the padded string
        val c: Char =
          if (p < q - 1) '\u0001'
          else if (p >= q - 1 + len) '\u0002'
          else s.charAt(p - (q - 1))
        h = h * 31 + c
        j += 1
      }
      val gram = mix64(h)
      val occ = counts.merge(gram, 1, (a, _) => a + 1) - 1
      out(i) = mix64(gram ^ (occ.toLong * 0xC2B2AE3D27D4EB4FL))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Range-bucket assignment against driver-resident boundaries: bucket =
 * number of boundaries strictly below the value, via binary search in
 * generated code. O(log P) per row where the equivalent `aggregate`
 * higher-order function is O(P) INTERPRETED per row — the difference
 * between negligible and dominant at thousands of partitions
 * (Packing.packSequences' deterministic bucketing).
 */
case class RangeBucket(child: Expression, bounds: Array[Double])
  extends UnaryExpression {
  import org.apache.spark.sql.types.IntegerType

  override def dataType: DataType = IntegerType
  override def prettyName: String = "range_bucket"

  override def nullSafeEval(input: Any): Any =
    HashImpls.rangeBucket(input.asInstanceOf[Number].doubleValue(), bounds)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val bRef = ctx.addReferenceObj("rangeBounds", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HashImpls.rangeBucket((double) $c, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): RangeBucket =
    copy(child = newChild)
}

/**
 * IVF cell assignment: top-`n` nearest centroid ids (cosine) for a vector
 * column against a DRIVER-RESIDENT centroid matrix (numCentroids × dim,
 * bounded — it rides into generated code as reference objects). This keeps
 * the index-build pass of IVF a pure projection: no corpus × centroids
 * crossJoin row blowup, no (id, cell) shuffle, no interpreted
 * higher-order-function lambda — measured 5.1 s → sub-second for the
 * assignment stage at sf0.1 vs the transform/array_sort formulation.
 */
/**
 * Hyperplane-LSH signature: bit i of the result = sign of vec · plane_i.
 * One fused pass — the vector loads ONCE into a local array and all
 * `bits` dot products run against the driver-resident plane matrix,
 * vs the composed `(0 until bits).map(dotProduct(vec, planeLit))`
 * formulation whose every bit re-traverses the ArrayData (measured ~6×
 * on the sf0.1 near-dup banding). Zero vectors hash to all-ones
 * (d >= 0), matching the composed form.
 */
case class HyperplaneSignature(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {
  import org.apache.spark.sql.types.{DoubleType, FloatType}

  // 64 planes fill the long exactly; plane 63 lands on the sign bit, so
  // signatures may be negative — banding compares bit-slices, never order,
  // so that is safe.
  require(planes.nonEmpty && planes.length <= 64, "1..64 planes fit a long")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_signature"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"hyperplane_signature needs a float/double array, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    HashImpls.hyperplaneSignature(input.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val planesRef = ctx.addReferenceObj("hyperplanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HashImpls.hyperplaneSignature($c, $planesRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

case class NearestCentroids(child: Expression, ids: Array[Long],
                            cents: Array[Array[Double]], n: Int)
  extends UnaryExpression {
  import org.apache.spark.sql.types.{DoubleType, FloatType}

  require(ids.length == cents.length && n >= 1,
    s"need parallel ids/centroids and n >= 1, got ${ids.length}/${cents.length}/$n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"nearest_centroids needs a float/double array, got $other")
  }
  @transient private lazy val centNorms: Array[Double] =
    cents.map(cv => math.sqrt(cv.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any =
    HashImpls.nearestCentroids(input.asInstanceOf[ArrayData], ids, cents,
      centNorms, n, isFloat)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val idsRef = ctx.addReferenceObj("nearestIds", ids, "long[]")
    val centsRef = ctx.addReferenceObj("nearestCents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("nearestNorms", centNorms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HashImpls.nearestCentroids($c, $idsRef, $centsRef, $normsRef, $n, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/**
 * 64-bit SimHash over a token array: one xxhash64 per token, then per-bit
 * majority vote. O(tokens × 64) unboxed bit ops.
 */
/**
 * Iceberg bucket transform (spec §Bucket Transform details):
 * `murmur3_x86_32(seed 0)` over the single-value binary form —
 * int/long/date/timestamp promoted to an 8-byte little-endian long,
 * strings as UTF-8 — masked non-negative, modulo `n`. The executor-side
 * counterpart of `IcebergSource.bucketOf`, so hidden-partitioned WRITES
 * route every row inside codegen instead of through a driver helper.
 */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.types._

  require(n > 0, "bucket count must be positive")

  override def dataType: DataType = IntegerType
  override def prettyName: String = s"iceberg_bucket_$n"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg bucket transform unsupported for ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType =>
      graft.sources.IcebergSource.bucketOfUtf8(input.asInstanceOf[UTF8String], n)
    case _ =>
      graft.sources.IcebergSource.bucketOfLong(
        input.asInstanceOf[Number].longValue(), n)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType =>
        s"${ev.value} = graft.sources.IcebergSource.bucketOfUtf8($c, $n);"
      case _ =>
        s"${ev.value} = graft.sources.IcebergSource.bucketOfLong((long) $c, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    HashImpls.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HashImpls.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * Cosine similarity over two numeric array columns in one unboxed pass
 * (dot and both norms together). Same reason as the hash expressions:
 * the HOF formulation (`aggregate(zip_with(...))`) is interpreted per
 * element — for IVF/LSH/brute-force ANN the cosine IS the hot loop
 * (corpus × centroids/candidates evaluations).
 *
 * FP semantics match the HOF version bit-for-bit: each element cast to
 * double, products accumulated left to right from 0.0, result =
 * dot / (sqrt(na) * sqrt(nb)); null elements or length mismatch → null
 * (zip_with pads with null and `acc + null` nulls the aggregate).
 *
 * Generates code (`doGenCode`) so the loop stays inside the surrounding
 * WholeStageCodegen span — a CodegenFallback here would box every row of
 * the corpus × centroids/candidates sweeps.
 */
case class CosineSim(left: Expression, right: Expression, normalize: Boolean = true)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType}

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = if (normalize) "cosine_sim" else "dot_product"

  private def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(LongType, _) => (a, i) => a.getLong(i).toDouble
    // int8/int16 arrays: the scalar-quantized pre-verify path carries
    // 1-byte components through the candidate shuffle
    case ArrayType(org.apache.spark.sql.types.ByteType, _) =>
      (a, i) => a.getByte(i).toDouble
    case ArrayType(org.apache.spark.sql.types.ShortType, _) =>
      (a, i) => a.getShort(i).toDouble
    case other => throw new IllegalArgumentException(
      s"cosine_sim needs numeric arrays, got $other")
  }
  @transient private lazy val getL = getter(left.dataType)
  @transient private lazy val getR = getter(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = getL(a, i); val y = getR(b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (normalize) dot / (math.sqrt(na) * math.sqrt(nb)) else dot
  }

  private def javaGetter(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case ArrayType(IntegerType, _) => s"(double) $arr.getInt($i)"
    case ArrayType(LongType, _) => s"(double) $arr.getLong($i)"
    case ArrayType(org.apache.spark.sql.types.ByteType, _) =>
      s"(double) $arr.getByte($i)"
    case ArrayType(org.apache.spark.sql.types.ShortType, _) =>
      s"(double) $arr.getShort($i)"
    case other => throw new IllegalArgumentException(
      s"cosine_sim needs numeric arrays, got $other")
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val result =
        if (normalize) s"$dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))"
        else dot
      s"""
        |final int $n = $a.numElements();
        |if ($b.numElements() != $n) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    final double $x = ${javaGetter(left.dataType, a, i)};
        |    final double $y = ${javaGetter(right.dataType, b, i)};
        |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $result; }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/**
 * Jaccard similarity of two SORTED long arrays (distinct-element sets) by
 * a single counting merge — no intersection/union arrays materialize.
 * The `size(array_intersect)/size(array_union)` formulation this replaces
 * builds a hash set and two result arrays PER PAIR; on the near-dup
 * verify path (tens of thousands of candidate pairs × ~10³-element
 * shingle sets) that allocation dominated the stage. Duplicate runs are
 * skipped, so accidentally non-distinct inputs still get set semantics.
 * Empty-union pairs return 0.0 (matching the guarded SQL formulation).
 */
case class SortedJaccard(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.DoubleType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_jaccard"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard needs two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    var inter = 0L; var union = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i); val y = b.getLong(j)
      union += 1
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
      // skip duplicate runs so inputs behave as sets
      while (i > 0 && i < na && !a.isNullAt(i) && a.getLong(i) == a.getLong(i - 1)) i += 1
      while (j > 0 && j < nb && !b.isNullAt(j) && b.getLong(j) == b.getLong(j - 1)) j += 1
    }
    while (i < na) {
      if (a.isNullAt(i)) return null
      if (i == 0 || a.getLong(i) != a.getLong(i - 1)) union += 1
      i += 1
    }
    while (j < nb) {
      if (b.isNullAt(j)) return null
      if (j == 0 || b.getLong(j) != b.getLong(j - 1)) union += 1
      j += 1
    }
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("uni")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
        |final int $na = $a.numElements(); final int $nb = $b.numElements();
        |int $i = 0; int $j = 0; long $inter = 0L; long $union = 0L;
        |while ($i < $na && $j < $nb && !${ev.isNull}) {
        |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
        |  final long $x = $a.getLong($i); final long $y = $b.getLong($j);
        |  $union++;
        |  if ($x == $y) { $inter++; $i++; $j++; }
        |  else if ($x < $y) { $i++; } else { $j++; }
        |  while ($i > 0 && $i < $na && !$a.isNullAt($i) && $a.getLong($i) == $a.getLong($i - 1)) $i++;
        |  while ($j > 0 && $j < $nb && !$b.isNullAt($j) && $b.getLong($j) == $b.getLong($j - 1)) $j++;
        |}
        |while (!${ev.isNull} && $i < $na) {
        |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
        |  if ($i == 0 || $a.getLong($i) != $a.getLong($i - 1)) $union++;
        |  $i++;
        |}
        |while (!${ev.isNull} && $j < $nb) {
        |  if ($b.isNullAt($j)) { ${ev.isNull} = true; break; }
        |  if ($j == 0 || $b.getLong($j) != $b.getLong($j - 1)) $union++;
        |  $j++;
        |}
        |if (!${ev.isNull}) { ${ev.value} = ($union == 0L) ? 0.0 : (double) $inter / (double) $union; }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrappers. */
/**
 * Occurrence-tagged q-gram hashes of a padded string, one unboxed pass:
 * 64-bit hash of each length-`q` character window of
 * `pad(q-1) + text + pad(q-1)`, mixed with the window's occurrence index
 * (0 for the first time a gram value appears in this string, 1 for the
 * second, ...). Output length is exactly `len(text) + q - 1`.
 *
 * This is the signature scheme for approximation-free edit-distance
 * joins (Gravano et al., VLDB 2001): tagging the j-th occurrence makes an
 * equi-join on the hash count `sum_g min(count_a(g), count_b(g))` — the
 * multiset q-gram intersection — and one edit operation can change at
 * most `q` elements of the multiset, so strings within edit distance `k`
 * share all but `k*q` of their tagged grams. Hash collisions can only ADD
 * candidate pairs (callers verify with exact `levenshtein`), never lose
 * one: equal (gram, occurrence) pairs always hash equal.
 *
 * Padding uses control chars U+0001/U+0002; content collisions with those
 * chars are harmless for the same reason. Windows run over UTF-16 units.
 */
case class QgramOccHashes(child: Expression, q: Int) extends UnaryExpression {
  require(q >= 1, s"q must be >= 1, got $q")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "qgram_occ_hashes"

  override def nullSafeEval(input: Any): Any =
    HashImpls.qgramOccHashes(input.asInstanceOf[UTF8String], q)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HashImpls.qgramOccHashes($c, $q);")

  override protected def withNewChildInternal(newChild: Expression): QgramOccHashes =
    copy(child = newChild)
}

object HashFunctions {
  def minhashShingles(text: Column, shingleSize: Int, numHashes: Int): Column =
    ColumnShim.column(
      MinHashShingles(ColumnShim.expression(text), shingleSize, numHashes))

  /** Distinct word-n-gram xxhash64 values of RAW text (normalization is
    * part of the expression — see [[NgramHashes]]). */
  def ngramHashes(text: Column, n: Int): Column =
    ColumnShim.column(NgramHashes(ColumnShim.expression(text), n))

  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens)))

  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.column(CosineSim(ColumnShim.expression(a), ColumnShim.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    ColumnShim.column(
      CosineSim(ColumnShim.expression(a), ColumnShim.expression(b), normalize = false))

  def nearestCentroids(vec: Column, ids: Array[Long],
                       cents: Array[Array[Double]], n: Int): Column =
    ColumnShim.column(NearestCentroids(ColumnShim.expression(vec), ids, cents, n))

  /** Fused sign-bit signature against a static plane matrix. */
  def hyperplaneSignature(vec: Column, planes: Array[Array[Double]]): Column =
    ColumnShim.column(HyperplaneSignature(ColumnShim.expression(vec), planes))

  def rangeBucket(v: Column, bounds: Array[Double]): Column =
    ColumnShim.column(RangeBucket(ColumnShim.expression(v), bounds))

  /** Occurrence-tagged q-gram hashes for edit-distance joins. */
  def qgramOccHashes(text: Column, q: Int): Column =
    ColumnShim.column(QgramOccHashes(ColumnShim.expression(text), q))

  /** Jaccard of two sorted array<bigint> set columns (counting merge). */
  def sortedJaccard(a: Column, b: Column): Column =
    ColumnShim.column(SortedJaccard(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}

/**
 * SparkSessionExtensions hook: makes the expressions available from SQL as
 * `minhash_shingles(text, n, k)` and `simhash64(tokens)`. Enable with
 * .config("spark.sql.extensions", "graft.expressions.GraftExtensions").
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("minhash_shingles"),
      new ExpressionInfo(classOf[MinHashShingles].getName, "minhash_shingles"),
      (children: Seq[Expression]) => MinHashShingles(children(0),
        intLit(children(1), "shingleSize"), intLit(children(2), "numHashes"))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
  }
}
