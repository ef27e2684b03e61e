package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch/similarity hot paths.
  *
  * The declarative higher-order-function formulations (`transform` /
  * `aggregate` / `zip_with`) evaluate one lambda call per array element
  * per row — measured ~75 s for 20-permutation MinHash over sf0.1
  * `documents` on local[32]. These expressions compute the same values
  * with tight imperative loops and participate in whole-stage codegen
  * via a static call (`doGenCode` emits one function call, so the
  * surrounding operators stay fused). Hashing uses the same XXH64 core
  * as Spark's built-in `xxhash64` (seed-compatible).
  */
object HashImpls {

  /** k-permutation MinHash over an array of string shingles: element j
    * = min over shingles of xxhash64(shingle, seed = j). */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var j = 0
      while (j < k) {
        val h = XXH64.hashUTF8String(s, j.toLong)
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles of a token array, space-joined; a
    * stream shorter than n tokens yields its whole joined stream as the
    * single shingle (so empty docs still carry one "" shingle and
    * Jaccard stays well-defined). First-occurrence order, like
    * `array_distinct`. */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    def join(from: Int, len: Int): org.apache.spark.unsafe.types.UTF8String = {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](len)
      var i = 0
      while (i < len) { parts(i) = tokens.getUTF8String(from + i); i += 1 }
      org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
    }
    if (cnt < n) return new GenericArrayData(Array[Any](join(0, cnt)))
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i <= cnt - n) { seen.add(join(i, n)); i += 1 }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** 64-bit SimHash over an array of string tokens; per-token hash is
    * xxhash64(token) with Spark's default seed 42. */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Sign-bit random-hyperplane LSH bucket of a double vector. */
  def lshBucket(vec: ArrayData, planes: Array[Array[Double]]): Long = {
    val dim = vec.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val d = math.min(dim, plane.length)
      var dot = 0.0
      var i = 0
      while (i < d) { dot += vec.getDouble(i) * plane(i); i += 1 }
      if (dot > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  /** y = W · (x − mean): the centered linear map whitening/PCA apply
    * per row. `w` is row-major k×d (k = output dim ≤ d); inputs whose
    * length differs from `mean.length` yield null (ragged guard, the
    * VectorAvg convention). */
  def whitenVector(vec: ArrayData, mean: Array[Double],
                   w: Array[Array[Double]]): ArrayData = {
    val d = mean.length
    if (vec.numElements() != d) return null
    val centered = new Array[Double](d)
    var i = 0
    while (i < d) { centered(i) = vec.getDouble(i) - mean(i); i += 1 }
    val out = new Array[Double](w.length)
    var r = 0
    while (r < w.length) {
      val row = w(r)
      var s = 0.0
      i = 0
      while (i < d) { s += row(i) * centered(i); i += 1 }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Ids of the `nProbe` centroids nearest (by cosine) to a vector,
    * most-similar first. */
  def nearestCentroids(vec: ArrayData, centroids: Array[Array[Double]],
                       nProbe: Int): ArrayData = {
    val dim = vec.numElements()
    var vNorm = 0.0
    var i = 0
    while (i < dim) { val x = vec.getDouble(i); vNorm += x * x; i += 1 }
    val scores = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val d = math.min(dim, cent.length)
      var dot = 0.0; var cNorm = 0.0
      i = 0
      while (i < d) { dot += vec.getDouble(i) * cent(i); i += 1 }
      i = 0
      while (i < cent.length) { cNorm += cent(i) * cent(i); i += 1 }
      scores(c) = dot / (math.sqrt(vNorm) * math.sqrt(cNorm))
      c += 1
    }
    val order = scores.indices.sortBy(j => (-scores(j), j)).take(nProbe)
    new GenericArrayData(order.toArray)
  }

  /** Tokens = maximal runs of [a-z0-9] bytes (callers lowercase first).
    * Byte-level scan is exact for UTF-8: multibyte sequences are all
    * ≥ 0x80 and can never match [a-z0-9], so they delimit — identical
    * output to `filter(split(lowered, "[^a-z0-9]+"), _ != "")`. */
  def tokenSplit(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = text.getBytes
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i)
      val isTok = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (isTok) {
        var j = i + 1
        while (j < n && {
          val c = bytes(j); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) j += 1
        out.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(
          bytes, i, j - i))
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Group index with the highest total of non-overlapping substring
    * occurrences (the same count `length(s) - length(replace(s, p, ''))`
    * yields, without one regex pass per pattern). Earlier group wins
    * ties — the same semantics as a left fold with strict `>`. */
  def argMaxSubstringGroup(text: org.apache.spark.unsafe.types.UTF8String,
                           groups: Array[Array[String]]): Int = {
    val s = text.toString
    var best = 0
    var bestScore = Long.MinValue
    var g = 0
    while (g < groups.length) {
      val pats = groups(g)
      var score = 0L
      var p = 0
      while (p < pats.length) {
        val pat = pats(p)
        var idx = s.indexOf(pat)
        while (idx >= 0) { score += 1; idx = s.indexOf(pat, idx + pat.length) }
        p += 1
      }
      if (score > bestScore) { best = g; bestScore = score }
      g += 1
    }
    best
  }

  /** Set index with the most token-membership hits; earlier set wins
    * ties. */
  def argMaxTokenSetGroup(tokens: ArrayData,
                          sets: Array[java.util.HashSet[String]]): Int = {
    val counts = new Array[Long](sets.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i).toString
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(t)) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < sets.length) {
      if (counts(j) > counts(best)) best = j
      j += 1
    }
    best
  }

  /** Cosine similarity of two double vectors; accumulation order matches
    * a sequential left fold (bit-identical with the DuckDB oracle's
    * `list_reduce`). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; i += 1
    }
    i = 0
    while (i < a.numElements()) { val x = a.getDouble(i); na += x * x; i += 1 }
    i = 0
    while (i < b.numElements()) { val y = b.getDouble(i); nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deflate (zlib, BEST_COMPRESSION, raw/nowrap) output size of the
    * UTF-8 bytes. Level and nowrap are FIXED — they are part of the
    * signal's definition; a level change would shift every ratio. */
  def deflateLength(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_COMPRESSION, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Product-quantization encode: per subspace, the index of the
    * nearest (L2) codebook centroid of that slice of the vector.
    * codebooks(s)(j) is centroid j of subspace s; subspace widths come
    * from the codebooks themselves. */
  def pqEncode(v: ArrayData,
               codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val out = new Array[Int](m)
    var off = 0
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val subDim = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = v.getDouble(off + i) - cb(j)(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      off += subDim
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC (asymmetric distance computation) cosine against a PQ code:
    * cos(q, x̂) for the reconstruction x̂ = concat of coded centroids,
    * from per-query lookup tables — dotLut(s)(j) = q_s · c_s,j and
    * normLut(s)(j) = |c_s,j|², so the per-row work is m table reads,
    * never a dim-width multiply. EXACT for the reconstruction (the
    * approximation lives entirely in the quantization). */
  def pqAdcCos(codes: ArrayData, dotLut: Array[Array[Double]],
               normLut: Array[Array[Double]], qNorm: Double): Double = {
    var dot = 0.0
    var n2 = 0.0
    var s = 0
    while (s < dotLut.length) {
      val c = codes.getInt(s)
      dot += dotLut(s)(c)
      n2 += normLut(s)(c)
      s += 1
    }
    val denom = qNorm * math.sqrt(n2)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** NFC normalization of a UTF8String; already-normalized input (all
    * ASCII, most NFC text) short-circuits without re-encoding. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** SQ8 round-trip: per-vector affine int8 encode + decode in one
    * imperative pass — the reconstruction the quantized-ANN path
    * feeds to its distance computations. Arithmetic mirrors
    * [[graft.operators.Similarity.quantizeVector]]/`dequantizeVector`
    * exactly (min/max range, floor(x+0.5), zero + scale·q; constant
    * vectors take scale 1.0), spec-pinned equal for FINITE, hole-free
    * vectors; NaN/null elements fail loud (the HOF twin errors on its
    * ANSI long cast for those — invalid input either way). The HOF
    * pair stays the oracle-mirrored form, this is its hot-path twin. */
  def sq8Roundtrip(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    if (n > 0) {
      var lo = Double.PositiveInfinity
      var hi = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        // NaN / null elements fail LOUD: the HOF twin would error on
        // the ANSI long cast anyway, and silently 0-filling or
        // NaN-ordering here would let the two paths diverge — a
        // vector with holes is invalid input, not a quantization case
        if (v.isNullAt(i))
          throw new IllegalArgumentException(
            s"sq8Roundtrip: null element at index $i")
        val x = v.getDouble(i)
        if (x != x)
          throw new IllegalArgumentException(
            s"sq8Roundtrip: NaN element at index $i")
        if (x < lo) lo = x
        if (x > hi) hi = x
        i += 1
      }
      val scale = if (hi == lo) 1.0 else (hi - lo) / 255.0
      i = 0
      while (i < n) {
        out(i) = lo + scale * math.floor((v.getDouble(i) - lo) / scale + 0.5)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Unicode NFC normalization — the canonical-composition pass a text
  * pipeline runs before hashing/dedup (the same logical string can
  * arrive composed or decomposed; exact dedup and md5 fingerprints
  * would treat them as different documents). Native expression with
  * codegen (java.text.Normalizer is allocation-light for
  * already-normalized ASCII/NFC input — the common case short-circuits
  * via isNormalized). Mirrors DuckDB's `nfc_normalize`. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashImpls.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashImpls.nfc($a)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

/** Deflate-compressed size of a string's UTF-8 bytes (zlib
  * BEST_COMPRESSION, no header) — the numerator of the classic
  * compression-ratio quality signal: highly repetitive/boilerplate
  * text compresses far below prose, random noise barely at all.
  * Deterministic for a fixed zlib build (the JDK bundles one); pinned
  * rows-only at the gate (DuckDB has no deflate), exact parity with
  * java.util.zip spec-pinned. One codegen'd call per row; the Deflater
  * is created/ended per call — cheap next to the deflate itself, and
  * expression instances are shared per-partition anyway. */
case class DeflateLength(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashImpls.deflateLength(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashImpls.deflateLength($a)")
  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
  override def prettyName: String = "deflate_length"
}

/** Native SQ8 round-trip over a double vector — one codegen'd call
  * per row vs hundreds of interpreted HOF node evals ([[HashImpls
  * .sq8Roundtrip]]; the CosineSim precedent). */
case class Sq8Roundtrip(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashImpls.sq8Roundtrip(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashImpls.sq8Roundtrip($a)")
  override protected def withNewChildInternal(newChild: Expression): Sq8Roundtrip =
    copy(child = newChild)
  override def prettyName: String = "sq8_roundtrip"
}

case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, "k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashImpls.minhash(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.minhash($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "n must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashImpls.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
  override def prettyName: String = "shingle_set"
}

case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashImpls.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

case class LshBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashImpls.lshBucket(input.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.lshBucket($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
  override def prettyName: String = "lsh_bucket"
}

/** Centered linear map y = W(x − mean) — the per-row apply of
  * whitening / PCA projection ([[graft.operators.Whitening]]). Mean
  * and matrix ride as codegen reference objects (the NearestCentroids
  * pattern); a length-mismatched input vector yields NULL. */
case class WhitenVector(child: Expression, mean: Array[Double],
                        w: Array[Array[Double]])
    extends UnaryExpression {
  require(mean.nonEmpty && w.nonEmpty && w.forall(_.length == mean.length),
    "whiten_vector: matrix columns must match mean length")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashImpls.whitenVector(input.asInstanceOf[ArrayData], mean, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mean", mean, "double[]")
    val ref = ctx.addReferenceObj("w", w, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.HashImpls.whitenVector($c, $m, $ref);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): WhitenVector =
    copy(child = newChild)
  override def prettyName: String = "whiten_vector"
}

case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
                            nProbe: Int)
    extends UnaryExpression {
  require(nProbe > 0 && nProbe <= centroids.length)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashImpls.nearestCentroids(input.asInstanceOf[ArrayData], centroids, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpls.nearestCentroids($c, $ref, $nProbe)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroids"
}

/** PQ encode of a double vector — codebooks ride as a codegen
  * reference object (the NearestCentroids pattern). */
case class PqEncode(child: Expression,
                    codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashImpls.pqEncode(input.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.pqEncode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** ADC cosine of a PQ code column against ONE query's lookup tables
  * (built driver-side per query — tiny: m·k doubles ×2). */
case class PqAdcCos(child: Expression, dotLut: Array[Array[Double]],
                    normLut: Array[Array[Double]], qNorm: Double)
    extends UnaryExpression {
  require(dotLut.length == normLut.length && dotLut.nonEmpty)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    HashImpls.pqAdcCos(input.asInstanceOf[ArrayData], dotLut, normLut, qNorm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.addReferenceObj("dotLut", dotLut, "double[][]")
    val n = ctx.addReferenceObj("normLut", normLut, "double[][]")
    // qNorm via raw bits, NOT string interpolation of the double: the
    // tokens "NaN"/"Infinity" are not valid Java literals, so a
    // degenerate query vector would break whole-stage-codegen
    // compilation (noisy interpreted fallback) instead of evaluating
    val qn = s"Double.longBitsToDouble(" +
      s"${java.lang.Double.doubleToRawLongBits(qNorm)}L)"
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpls.pqAdcCos($c, $d, $n, $qn)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqAdcCos =
    copy(child = newChild)
  override def prettyName: String = "pq_adc_cos"
}

case class TokenSplit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashImpls.tokenSplit(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.tokenSplit($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenSplit =
    copy(child = newChild)
  override def prettyName: String = "token_split"
}

/** Index of the group with the highest substring-occurrence sum in the
  * input string (earliest group wins ties) — one pass per pattern with
  * indexOf instead of a regexp_replace per (group, pattern). */
case class ArgMaxSubstringGroup(child: Expression, groups: Array[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    HashImpls.argMaxSubstringGroup(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], groups)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("groups", groups, "java.lang.String[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpls.argMaxSubstringGroup($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): ArgMaxSubstringGroup =
    copy(child = newChild)
  override def prettyName: String = "argmax_substring_group"
}

/** Index of the token set with the most member hits in the token array
  * (earliest set wins ties). */
case class ArgMaxTokenSetGroup(child: Expression, sets: Array[Array[String]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  @transient private lazy val hashSets: Array[java.util.HashSet[String]] =
    sets.map { s =>
      val hs = new java.util.HashSet[String]()
      s.foreach(hs.add); hs
    }
  override def nullSafeEval(input: Any): Any =
    HashImpls.argMaxTokenSetGroup(input.asInstanceOf[ArrayData], hashSets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sets", hashSets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpls.argMaxTokenSetGroup($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): ArgMaxTokenSetGroup =
    copy(child = newChild)
  override def prettyName: String = "argmax_token_set_group"
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashImpls.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpls.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Column-API entry points for the native expressions. */
object HashFunctions {
  private def expr(c: Column) = GraftBridge.expression(c)

  def minhashSig(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(expr(shingles), k))

  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(expr(tokens)))

  def shingleSet(tokens: Column, n: Int): Column =
    GraftBridge.column(ShingleSet(expr(tokens), n))

  def lshBucket(vecDouble: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(LshBucket(expr(vecDouble), planes))

  def cosineSim(aDouble: Column, bDouble: Column): Column =
    GraftBridge.column(CosineSim(expr(aDouble), expr(bDouble)))

  def sq8Roundtrip(vecDouble: Column): Column =
    GraftBridge.column(Sq8Roundtrip(expr(vecDouble)))

  def nfcNormalize(text: Column): Column =
    GraftBridge.column(NfcNormalize(expr(text)))

  def deflateLength(text: Column): Column =
    GraftBridge.column(DeflateLength(expr(text)))

  def pqEncode(vecDouble: Column,
               codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqEncode(expr(vecDouble), codebooks))

  def pqAdcCos(codes: Column, dotLut: Array[Array[Double]],
               normLut: Array[Array[Double]], qNorm: Double): Column =
    GraftBridge.column(PqAdcCos(expr(codes), dotLut, normLut, qNorm))

  def nearestCentroids(vecDouble: Column, centroids: Array[Array[Double]],
                       nProbe: Int): Column =
    GraftBridge.column(NearestCentroids(expr(vecDouble), centroids, nProbe))

  def whitenVector(vecDouble: Column, mean: Array[Double],
                   w: Array[Array[Double]]): Column =
    GraftBridge.column(WhitenVector(expr(vecDouble), mean, w))

  def tokenSplit(loweredText: Column): Column =
    GraftBridge.column(TokenSplit(expr(loweredText)))

  def argMaxSubstringGroup(text: Column, groups: Array[Array[String]]): Column =
    GraftBridge.column(ArgMaxSubstringGroup(expr(text), groups))

  def argMaxTokenSetGroup(tokens: Column, sets: Array[Array[String]]): Column =
    GraftBridge.column(ArgMaxTokenSetGroup(expr(tokens), sets))
}
