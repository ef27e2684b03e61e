package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.{length, lit, raise_error, when, xxhash64}
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch — Beyer et al., SIGMOD'07
  * ("On synopses for distinct-value estimation under multiset
  * operations"). Keeps the k smallest distinct xxhash64 values of a
  * column; unlike a linear-counting bitmap the retained hash SAMPLE
  * supports set algebra: union (merge + recap) and intersection /
  * Jaccard estimation across independently-built sketches — the
  * corpus-overlap question ("how much of corpus B is already in A?")
  * answered from two k·8-byte synopses instead of a 100 TB join.
  *
  * Estimator: with fewer than k distinct hashes the sketch IS the
  * distinct set — estimates are exact integers (the property the
  * hash-green gate query relies on at verify SF). At k or more, the
  * classic (k−1)/u_k with u_k = kth-smallest unsigned hash mapped to
  * (0,1]; relative error ≈ 1/√(k−2).
  *
  * Map-side partials: only the ≤ k·8-byte sorted-long state crosses
  * the shuffle, never values — same 100 TB posture as the
  * linear-counting family. Merge is set-union + recap:
  * commutative/associative and therefore partitioning- and
  * replay-order-independent.
  */
case class KmvSketchState(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16 && k <= (1 << 20), "k out of range [16, 2^20]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    Kmv.emptyBuffer()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) Kmv.insert(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) Kmv.insert(buf, it.next(), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    Kmv.toBytes(buf)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    Kmv.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    Kmv.fromBytesSet(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchState =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_sketch_state"
}

/** Scalar distinct-count estimate from one serialized KMV state.
  * Eval-only (CodegenFallback) — consumed on corpus-level rows (one
  * per sketch), never in a per-row hot path. */
case class KmvEstimate(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(bytes: Any): Any =
    Kmv.estimate(Kmv.fromBytes(bytes.asInstanceOf[Array[Byte]]), k)
  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
  override def prettyName: String = "kmv_estimate"
}

/** Set-operation estimates from two serialized KMV states built with
  * the SAME k: struct(est_a, est_b, est_union, est_intersection,
  * jaccard). Eval-only — one corpus-pair row. */
case class KmvSetEstimates(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("est_a", DoubleType, nullable = false),
    StructField("est_b", DoubleType, nullable = false),
    StructField("est_union", DoubleType, nullable = false),
    StructField("est_intersection", DoubleType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false)))
  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = Kmv.fromBytes(a.asInstanceOf[Array[Byte]])
    val sb = Kmv.fromBytes(b.asInstanceOf[Array[Byte]])
    val (eu, ei, j) = Kmv.setEstimates(sa, sb, k)
    org.apache.spark.sql.catalyst.InternalRow(
      Kmv.estimate(sa, k), Kmv.estimate(sb, k), eu, ei, j)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSetEstimates =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kmv_set_estimates"
}

/** Shared KMV mechanics — ONE definition so the aggregate, the scalar
  * estimators, and any JVM-side consumer cannot drift. Hashes are
  * compared UNSIGNED (xxhash64 is uniform over the full 64-bit range;
  * signed order would put half the mass "before" zero). */
private[functions] object Kmv {
  private val cmp: java.util.Comparator[java.lang.Long] =
    (x: java.lang.Long, y: java.lang.Long) =>
      java.lang.Long.compareUnsigned(x, y)

  def emptyBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](cmp)

  def insert(buf: java.util.TreeSet[java.lang.Long], v: Long, k: Int): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (java.lang.Long.compareUnsigned(v, buf.last()) < 0) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }
  }

  /** Sorted ascending (unsigned) long array — the canonical state. */
  def toBytes(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    val lb = bb.asLongBuffer()
    buf.forEach(v => lb.put(v.longValue()))
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  def fromBytesSet(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val s = emptyBuffer()
    fromBytes(bytes).foreach(s.add(_))
    s
  }

  /** Distinct estimate from a sorted state: exact when under-full,
    * else (k−1)/u_k. NOTE the sorted array is unsigned-ascending, but
    * toUnit expects the raw hash — index k−1 IS the kth minimum. */
  def estimate(sorted: Array[Long], k: Int): Double =
    if (sorted.length < k) sorted.length.toDouble
    else (k - 1).toDouble / toUnitUnsigned(sorted(k - 1))

  private def toUnitUnsigned(h: Long): Double = {
    // unsigned value of h divided by 2^64, in (0, 1]
    val u = (h >>> 1).toDouble * 2.0 + (h & 1L).toDouble
    val r = u / 1.8446744073709552e19 // 2^64
    if (r == 0.0) java.lang.Double.MIN_VALUE else r
  }

  /** Union / intersection / Jaccard estimates (Beyer et al. §4):
    * X = the k smallest of S_a ∪ S_b, ρ = members of X present in
    * BOTH sketches; est_union from X, est_inter = (ρ/|X|)·est_union,
    * jaccard = ρ/|X|. Exact (integer-valued) whenever the union of
    * the two sketches is under-full. */
  def setEstimates(sa: Array[Long], sb: Array[Long], k: Int): (Double, Double, Double) = {
    val all = emptyBuffer()
    sa.foreach(v => insert(all, v, k))
    sb.foreach(v => insert(all, v, k))
    val x = new Array[Long](all.size)
    val it = all.iterator()
    var i = 0
    while (it.hasNext) { x(i) = it.next(); i += 1 }
    val inA = sa.toSet
    val inB = sb.toSet
    val rho = x.count(v => inA(v) && inB(v))
    val estU = estimate(x, k)
    if (x.isEmpty) (0.0, 0.0, 0.0)
    else {
      val j = rho.toDouble / x.length
      // under-full X IS the exact union: ρ is the exact intersection
      // COUNT — return it directly rather than (ρ/|X|)·|X|, whose FP
      // round-trip can land at ρ−ε and truncate to ρ−1 downstream
      // (the hash-green gate queries cast these to long)
      val estI = if (x.length < k) rho.toDouble else j * estU
      (estU, estI, j)
    }
  }
}

object KmvFunctions {
  /** Mergeable KMV distinct-sketch state of `c` (any type — hashed
    * with xxhash64; NULLs excluded, matching `count_distinct`). */
  def kmvState(c: Column, k: Int = 1024): Column =
    GraftBridge.column(
      KmvSketchState(
        GraftBridge.expression(when(c.isNotNull, xxhash64(c))), k)
        .toAggregateExpression())

  /** Scalar distinct estimate from a serialized KMV state. */
  def kmvEstimate(c: Column, k: Int = 1024): Column =
    GraftBridge.column(KmvEstimate(GraftBridge.expression(c), k))

  /** struct(est_a, est_b, est_union, est_intersection, jaccard) from
    * two same-k KMV states. */
  def kmvSetEstimates(a: Column, b: Column, k: Int = 1024): Column =
    GraftBridge.column(KmvSetEstimates(
      GraftBridge.expression(a), GraftBridge.expression(b), k))

  /** Pass-through guard asserting a KMV state is still UNDER-full —
    * the regime where the sketch IS the distinct hash set and every
    * estimate is exact. A sketch at capacity (k·8 bytes; exactly-k
    * and overflowed states are indistinguishable by size) fails LOUD
    * instead of letting an exactness-dependent consumer — a hash gate
    * compared against exact set SQL, a dedup decision — silently
    * degrade to a ~1/√k-error estimate. Estimator-mode consumers
    * simply don't wrap their states. */
  /** Sketch size that keeps every sketch UNDER-full (= exact) given a
    * probed upper bound on per-group distinct counts: next power of
    * two ≥ 2·bound+1 (2× headroom absorbs the probe's HLL error —
    * ~2% at default precision, so 2× is orders of magnitude of
    * slack). Pair with a cheap `approx_count_distinct` probe so
    * exactness-gated queries derive k from the DATA instead of
    * hard-coding a scale ceiling; past `maxK` the refusal is loud and
    * names the remedy (estimator mode — drop the under-full guard
    * and accept ~1/√k error) rather than surfacing later as a
    * capacity assert. */
  def kmvKFor(maxDistinct: Long, minK: Int = 1024,
              maxK: Int = 1 << 20): Int = {
    require(maxDistinct >= 0 && minK >= 2 && maxK >= minK)
    val need = 2L * maxDistinct + 1L
    var k = minK
    while (k < need && k < maxK) k <<= 1
    require(k >= need,
      s"exact KMV needs k >= $need for ~$maxDistinct distinct values " +
        s"per group, above the cap $maxK — switch this consumer to " +
        "estimator mode (unguarded sketches, ~1/sqrt(k) error)")
    k
  }

  def kmvAssertUnderFull(sk: Column, k: Int, context: String): Column =
    when(length(sk) >= k * 8, raise_error(lit(
      s"$context: KMV sketch reached capacity k=$k — estimates are " +
        "no longer exact; raise k, or drop this guard and treat the " +
        "result as a ~1/sqrt(k)-error estimate")))
      .otherwise(sk)
}
