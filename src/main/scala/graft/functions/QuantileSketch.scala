package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Relative-error quantile sketch (the DDSketch construction — Masson,
  * Rim & Lee, "DDSketch: a fast and fully-mergeable quantile sketch
  * with relative-error guarantees", VLDB 2019): values bucket by
  * ⌈log_γ|v|⌉ with γ = (1+α)/(1−α), so every bucket's midpoint
  * estimate is within relative error α of any value it holds, and any
  * quantile estimate is within α·|true value|. The sketch is a sparse
  * (bucket → count) map: merge is count ADDITION — associative,
  * commutative, deterministic — which is what lets it ride the
  * incremental-rollup monoid ([[graft.operators.IncrementalAgg]])
  * exactly like the linear-count bitmap: only bounded state crosses
  * the shuffle, never values, and fold order can never change a byte
  * of the persisted state.
  *
  * Unlike the paper's collapsing variant, buckets are NEVER collapsed:
  * collapse during accumulation would make the serialized state depend
  * on fold order, breaking the byte-identity the rollup's replay
  * machinery relies on. State is therefore O(log(range)/α) entries —
  * at α = 0.01 a value span of 10^12 costs ~1,400 buckets (~22 KiB
  * worst case, typically far less); a caller needing a hard cap
  * pre-clamps the value domain instead.
  *
  * Zero and negatives are first-class: zero has its own counter;
  * negatives mirror into sign-flagged buckets of |v|, so the sketch
  * covers signed metrics (deltas, PnL) with the same guarantee.
  * ±Infinity counts under dedicated sentinel buckets at the extreme
  * ends of the value walk (an upstream divide-by-zero must not alias
  * into a finite bucket — `(idx<<1)` overflow would otherwise map
  * +Inf near 1.0); NaN contributes nothing, like NULL (it has no
  * order position, so no rank walk can place it).
  */
private[functions] object DDQuantile {
  /** Buckets: sorted (key → count). Key encodes (log-bucket, sign):
    * `idx << 1 | signBit`; zero values count under [[ZeroKey]] and
    * ±Infinity under [[PosInfKey]]/[[NegInfKey]] — all three are keys
    * no finite bucket can produce (finite |idx| is bounded by
    * log_γ(Double.MaxValue) ≈ 1e5 at practical α, far inside 2^62). */
  type Buckets = java.util.TreeMap[Long, Long]

  val ZeroKey: Long = Long.MinValue
  val NegInfKey: Long = Long.MinValue + 1
  val PosInfKey: Long = Long.MaxValue

  def gamma(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** Bucket key for a NON-NaN value (callers skip NaN like NULL). */
  def keyOf(v: Double, lgGamma: Double): Long =
    if (v == 0.0) ZeroKey
    else if (v == Double.PositiveInfinity) PosInfKey
    else if (v == Double.NegativeInfinity) NegInfKey
    else {
      val idx = math.ceil(math.log(math.abs(v)) / lgGamma).toLong
      (idx << 1) | (if (v < 0) 1L else 0L)
    }

  /** Midpoint estimate of the bucket: 2γ^idx/(γ+1), sign restored. */
  def valueOf(key: Long, g: Double): Double =
    if (key == ZeroKey) 0.0
    else if (key == PosInfKey) Double.PositiveInfinity
    else if (key == NegInfKey) Double.NegativeInfinity
    else {
      val idx = key >> 1
      val mag = 2.0 * math.pow(g, idx.toDouble) / (g + 1.0)
      if ((key & 1L) == 1L) -mag else mag
    }

  def add(buf: Buckets, key: Long, n: Long): Unit = {
    // getOrDefault, not get: an absent key's null would NPE when the
    // compiler unboxes it to a primitive Long.
    val base: Long = buf.getOrDefault(key, 0L)
    buf.put(key, base + n)
  }

  /** Current state-format version. v1 = the ±Inf-sentinel encoding;
    * version-less pre-v1 states (whose Inf values aliased into FINITE
    * buckets via `idx<<1` overflow) must refuse to merge — folding new
    * batches into silently-corrupt buckets would perpetuate the exact
    * corruption the sentinels fixed. A pre-v1 payload starts with
    * alpha's raw double bits, whose high int can never equal a small
    * version number, so the check is unambiguous. */
  val FormatVersion: Int = 1

  /** Serialized form — CANONICAL (sorted by key) so equal bucket
    * contents always serialize to identical bytes regardless of
    * insertion/merge order: [version][alphaBits][n][(key,count)×n].
    * The alpha header makes cross-alpha merges fail loud: two sketches
    * built at different γ have incompatible bucket meanings. */
  def toBytes(alpha: Double, buf: Buckets): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(20 + buf.size() * 16)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(FormatVersion)
    out.writeLong(java.lang.Double.doubleToLongBits(alpha))
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte], alpha: Double): Buckets = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val version = in.readInt()
    require(version == FormatVersion,
      s"unsupported quantile-sketch state version $version (expected " +
        s"$FormatVersion) — a version-less pre-v1 state may hold Inf " +
        "counts aliased into finite buckets and cannot be merged; " +
        "rebuild the rollup state from source")
    val storedAlpha = java.lang.Double.longBitsToDouble(in.readLong())
    require(storedAlpha == alpha,
      s"quantile sketch built at alpha=$storedAlpha cannot merge at " +
        s"alpha=$alpha — bucket boundaries differ; states only compose " +
        "at the accuracy they were built with")
    val n = in.readInt()
    val buf = new Buckets
    var i = 0
    while (i < n) { buf.put(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  def mergeInto(buf: Buckets, other: Buckets): Buckets = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey, e.getValue)
    }
    buf
  }

  /** Quantile q ∈ [0,1] — walk buckets in VALUE order (−Inf, then
    * negative buckets descending by idx, then zero, then positive
    * ascending, then +Inf; the key encoding does not sort in value
    * order, so the walk re-orders) to the bucket holding the
    * rank-⌈q·(n−1)⌉ element (0-based, the paper's convention).
    * Returns NaN on an empty sketch (the Column wrapper turns that
    * into NULL upstream). */
  def quantile(buf: Buckets, q: Double, g: Double): Double = {
    var total = 0L
    val it0 = buf.values().iterator()
    while (it0.hasNext) total += it0.next()
    if (total == 0L) return Double.NaN
    val rank = math.max(0L, math.min(total - 1,
      math.ceil(q * (total - 1)).toLong))
    // negatives: sign bit set; larger idx = larger |v| = smaller value
    val neg = scala.collection.mutable.ArrayBuffer.empty[Long]
    val pos = scala.collection.mutable.ArrayBuffer.empty[Long]
    var zero = 0L
    var negInf = 0L
    var posInf = 0L
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey == ZeroKey) zero = e.getValue
      else if (e.getKey == NegInfKey) negInf = e.getValue
      else if (e.getKey == PosInfKey) posInf = e.getValue
      else if ((e.getKey & 1L) == 1L) neg += e.getKey
      else pos += e.getKey
    }
    val negS = neg.sorted
    val posS = pos.sorted
    var seen = negInf
    if (seen > rank) return Double.NegativeInfinity
    // negative keys ascending-by-key = ascending idx = DESCENDING
    // value, so walk them reversed
    var i = negS.length - 1
    while (i >= 0) {
      seen += buf.get(negS(i))
      if (seen > rank) return valueOf(negS(i), g)
      i -= 1
    }
    seen += zero
    if (seen > rank) return 0.0
    var j = 0
    while (j < posS.length) {
      seen += buf.get(posS(j))
      if (seen > rank) return valueOf(posS(j), g)
      j += 1
    }
    // rank < total, so anything left lands in the +Inf bucket
    Double.PositiveInfinity
  }
}

/** Mergeable quantile-sketch STATE of a double column (binary) — the
  * per-key partial the incremental rollup persists; the quantile-family
  * twin of [[LinearCountSketchState]]. NULLs and NaNs contribute
  * nothing; ±Infinity counts at the walk's extremes (sentinel
  * buckets), so one upstream 1/0 surfaces as an infinite tail
  * quantile instead of silently corrupting a finite bucket. */
case class QuantileSketchState(
    child: Expression,
    alpha: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DDQuantile.Buckets] {

  require(alpha > 0 && alpha < 0.5, s"alpha out of (0, 0.5): $alpha")
  private val lgGamma = math.log(DDQuantile.gamma(alpha))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): DDQuantile.Buckets =
    new DDQuantile.Buckets

  override def update(buf: DDQuantile.Buckets,
                      input: InternalRow): DDQuantile.Buckets = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) DDQuantile.add(buf, DDQuantile.keyOf(d, lgGamma), 1L)
    }
    buf
  }

  override def merge(buf: DDQuantile.Buckets,
                     other: DDQuantile.Buckets): DDQuantile.Buckets =
    DDQuantile.mergeInto(buf, other)

  override def eval(buf: DDQuantile.Buckets): Any =
    DDQuantile.toBytes(alpha, buf)

  override def serialize(buf: DDQuantile.Buckets): Array[Byte] =
    DDQuantile.toBytes(alpha, buf)
  override def deserialize(bytes: Array[Byte]): DDQuantile.Buckets =
    DDQuantile.fromBytes(bytes, alpha)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchState =
    copy(child = newChildren.head)
  override def prettyName: String = "quantile_sketch_state"
}

/** Count-addition merge of SERIALIZED quantile states (binary in,
  * binary out) — how [[graft.operators.IncrementalAgg.mergeStates]]
  * folds the persisted per-key state with a batch's partial without
  * seeing values. Cross-alpha states fail loud (header check); NULL
  * inputs contribute nothing. */
case class QuantileSketchCombine(
    child: Expression,
    alpha: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DDQuantile.Buckets] {

  require(alpha > 0 && alpha < 0.5, s"alpha out of (0, 0.5): $alpha")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): DDQuantile.Buckets =
    new DDQuantile.Buckets

  override def update(buf: DDQuantile.Buckets,
                      input: InternalRow): DDQuantile.Buckets = {
    val v = child.eval(input)
    if (v != null)
      DDQuantile.mergeInto(buf,
        DDQuantile.fromBytes(v.asInstanceOf[Array[Byte]], alpha))
    buf
  }

  override def merge(buf: DDQuantile.Buckets,
                     other: DDQuantile.Buckets): DDQuantile.Buckets =
    DDQuantile.mergeInto(buf, other)

  override def eval(buf: DDQuantile.Buckets): Any =
    DDQuantile.toBytes(alpha, buf)

  override def serialize(buf: DDQuantile.Buckets): Array[Byte] =
    DDQuantile.toBytes(alpha, buf)
  override def deserialize(bytes: Array[Byte]): DDQuantile.Buckets =
    DDQuantile.fromBytes(bytes, alpha)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchCombine =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchCombine =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchCombine =
    copy(child = newChildren.head)
  override def prettyName: String = "quantile_sketch_combine"
}

/** Scalar quantile estimator over a serialized state. CodegenFallback
  * for the same reason as [[LinearCountEstimate]]: evaluates at READ
  * time over key-cardinality state rows, never event-scale data.
  * NULL on an empty sketch (a key whose every value was NULL). */
case class QuantileSketchEstimate(child: Expression, q: Double,
                                  alpha: Double = 0.01)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(q >= 0 && q <= 1, s"quantile out of [0,1]: $q")
  require(alpha > 0 && alpha < 0.5, s"alpha out of (0, 0.5): $alpha")
  private val g = DDQuantile.gamma(alpha)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val est = DDQuantile.quantile(
      DDQuantile.fromBytes(input.asInstanceOf[Array[Byte]], alpha), q, g)
    if (est.isNaN) null else est
  }

  override protected def withNewChildInternal(
      newChild: Expression): QuantileSketchEstimate = copy(child = newChild)
  override def prettyName: String = "quantile_sketch_estimate"
}

object QuantileFunctions {
  /** Mergeable quantile-sketch STATE of `c` (cast to double). */
  def quantileSketchState(c: Column, alpha: Double = 0.01): Column =
    GraftBridge.column(
      QuantileSketchState(
        GraftBridge.expression(c.cast("double")), alpha)
        .toAggregateExpression())

  /** Count-addition merge aggregate over serialized quantile states. */
  def mergeQuantileStates(c: Column, alpha: Double = 0.01): Column =
    GraftBridge.column(
      QuantileSketchCombine(GraftBridge.expression(c), alpha)
        .toAggregateExpression())

  /** Scalar quantile-q estimate from a serialized state. */
  def quantileEstimate(c: Column, q: Double, alpha: Double = 0.01): Column =
    GraftBridge.column(
      QuantileSketchEstimate(GraftBridge.expression(c), q, alpha))
}
