package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Linear-counting distinct sketch as a `TypedImperativeAggregate`.
  *
  * Buffer = 2^bits bitmap (long words). update sets one bit per input
  * hash; merge is bitwise OR (order-independent ⇒ deterministic across
  * partitionings/re-runs — safe for the driver's hash compare if ever
  * promoted beyond rows-only); eval applies the linear-counting
  * estimator n̂ = −m·ln(V) with V = fraction of zero bits.
  *
  * Like Spark's own HyperLogLog++ aggregate this does partial
  * (map-side) aggregation: only the fixed-size bitmap crosses the
  * shuffle, never values — the property that matters at 100 TB. Input
  * is pre-hashed to a long (the Column wrapper applies `xxhash64`), so
  * one sketch implementation covers every input type.
  */
case class LinearCountSketch(
    child: Expression,
    bits: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(bits >= 4 && bits <= 26, "bits out of range")
  private val m = 1 << bits
  private val words = m / 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = java.lang.Long.remainderUnsigned(h, m.toLong).toInt
      buf(idx >>> 6) |= 1L << (idx & 63)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    LinearCount.orInto(buf, other)

  override def eval(buf: Array[Long]): Any = LinearCount.estimate(buf, m)

  override def serialize(buf: Array[Long]): Array[Byte] =
    LinearCount.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    LinearCount.fromBytes(bytes, words)

  override def withNewMutableAggBufferOffset(newOffset: Int): LinearCountSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LinearCountSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LinearCountSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "linear_count_sketch"
}

/** Shared bitmap mechanics of the linear-counting family — ONE
  * definition so the value-consuming aggregate, the state-merging
  * aggregate, and the scalar estimator cannot drift. */
private[functions] object LinearCount {
  def estimate(words: Array[Long], m: Int): Long = {
    var zeros = 0L
    var i = 0
    while (i < words.length) {
      zeros += 64 - java.lang.Long.bitCount(words(i)); i += 1
    }
    if (zeros == 0) m.toLong // saturated: lower bound
    else math.round(-m.toDouble * math.log(zeros.toDouble / m))
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte], words: Int): Array[Long] = {
    val out = new Array[Long](words)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  def orInto(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }
}

/** [[LinearCountSketch]]'s STATE-valued twin: identical bitmap, but
  * eval returns the serialized bitmap (binary) instead of the
  * estimate — the mergeable partial state the incremental-rollup fold
  * persists per key ([[graft.operators.IncrementalAgg]]). Merging two
  * states is bitwise OR, so folds stay commutative/associative and
  * replay-order-independent like the algebraic state columns. */
case class LinearCountSketchState(
    child: Expression,
    bits: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(bits >= 4 && bits <= 26, "bits out of range")
  private val m = 1 << bits
  private val words = m / 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = java.lang.Long.remainderUnsigned(h, m.toLong).toInt
      buf(idx >>> 6) |= 1L << (idx & 63)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    LinearCount.orInto(buf, other)

  override def eval(buf: Array[Long]): Any = LinearCount.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    LinearCount.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    LinearCount.fromBytes(bytes, words)

  override def withNewMutableAggBufferOffset(newOffset: Int): LinearCountSketchState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LinearCountSketchState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LinearCountSketchState =
    copy(child = newChildren.head)
  override def prettyName: String = "linear_count_sketch_state"
}

/** OR-merge of SERIALIZED linear-count states (binary in, binary
  * out) — how [[graft.operators.IncrementalAgg.mergeStates]] folds a
  * persisted per-key state with a batch's partial state without ever
  * seeing the underlying values. NULL inputs (e.g. a key absent from
  * one side of an outer fold) contribute nothing. */
case class LinearCountSketchCombine(
    child: Expression,
    bits: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(bits >= 4 && bits <= 26, "bits out of range")
  private val m = 1 << bits
  private val words = m / 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      require(bytes.length == words * 8,
        s"sketch state of ${bytes.length} bytes does not match bits=$bits " +
          s"(expected ${words * 8}) — states must merge at the bits they " +
          "were built with")
      LinearCount.orInto(buf, LinearCount.fromBytes(bytes, words))
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    LinearCount.orInto(buf, other)

  override def eval(buf: Array[Long]): Any = LinearCount.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    LinearCount.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    LinearCount.fromBytes(bytes, words)

  override def withNewMutableAggBufferOffset(newOffset: Int): LinearCountSketchCombine =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LinearCountSketchCombine =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LinearCountSketchCombine =
    copy(child = newChildren.head)
  override def prettyName: String = "linear_count_sketch_combine"
}

/** Scalar linear-counting estimator over a serialized state.
  * CodegenFallback is deliberate: this evaluates at READ time over
  * key-cardinality state rows (never over event-scale data), so
  * interpreter dispatch is noise and a doGenCode would buy nothing. */
case class LinearCountEstimate(child: Expression, bits: Int = 14)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(bits >= 4 && bits <= 26, "bits out of range")
  private val m = 1 << bits
  private val words = m / 64

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    require(bytes.length == words * 8,
      s"sketch state of ${bytes.length} bytes does not match bits=$bits")
    LinearCount.estimate(LinearCount.fromBytes(bytes, words), m)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LinearCountEstimate = copy(child = newChild)
  override def prettyName: String = "linear_count_estimate"
}

/** Misra–Gries heavy-hitters sketch as a `TypedImperativeAggregate`.
  *
  * Buffer = at most `k` (item → counter) entries. update: increment a
  * present item, insert while capacity remains, else decrement every
  * counter (dropping zeros) — the classic frequent-items algorithm.
  * merge: sum counterparts, then shrink back to `k` entries by
  * subtracting the (k+1)-largest counter from all (the standard
  * mergeable-summaries reduction). eval: (item, count) structs sorted
  * by estimated count descending, then item.
  *
  * Guarantees: every item with true frequency > N/(k+1) survives, and
  * each reported counter undercounts its true frequency by at most
  * N/(k+1). Only ≤k entries cross the shuffle — the fixed-size-state
  * property that makes corpus-wide vocabulary stats viable at 100 TB
  * where an exact groupBy-count would shuffle every token.
  */
case class FrequentItemsSketch(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(k >= 1 && k <= 100000, "k out of range")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("est_count", LongType,
          nullable = false))), containsNull = false)

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty

  override def update(buf: scala.collection.mutable.HashMap[String, Long],
                      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None => // decrement-all step: shrink every counter by one
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          buf.foreach { case (key, c) =>
            if (c <= 1) dead += key else buf.update(key, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.HashMap[String, Long],
                     other: scala.collection.mutable.HashMap[String, Long]): scala.collection.mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-largest counter from everything, drop <=0
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      buf.foreach { case (key, c) =>
        if (c - cut <= 0) dead += key else buf.update(key, c - cut)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: scala.collection.mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sorted.map { case (item, c) =>
        InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(item), c)
      })
  }

  override def serialize(buf: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val bytes = item.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItemsSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "frequent_items_sketch"
}

object SketchFunctions {
  /** Approximate distinct count of `c` (any type — hashed with
    * xxhash64 first) using a 2^bits linear-counting bitmap. NULLs are
    * excluded, matching `count_distinct` (xxhash64 alone would fold a
    * NULL into the seed hash and count it as one distinct value). */
  def approxDistinct(c: Column, bits: Int = 14): Column = {
    import org.apache.spark.sql.functions.when
    GraftBridge.column(
      LinearCountSketch(
        GraftBridge.expression(when(c.isNotNull, xxhash64(c))), bits)
        .toAggregateExpression())
  }

  /** Mergeable distinct-sketch STATE of `c` (binary bitmap) — the
    * per-key partial the incremental rollup persists. Same NULL
    * handling as [[approxDistinct]]. */
  def distinctSketchState(c: Column, bits: Int = 14): Column = {
    import org.apache.spark.sql.functions.when
    GraftBridge.column(
      LinearCountSketchState(
        GraftBridge.expression(when(c.isNotNull, xxhash64(c))), bits)
        .toAggregateExpression())
  }

  /** OR-merge aggregate over serialized sketch states. */
  def mergeSketchStates(c: Column, bits: Int = 14): Column =
    GraftBridge.column(
      LinearCountSketchCombine(GraftBridge.expression(c), bits)
        .toAggregateExpression())

  /** Scalar estimate from a serialized sketch state. */
  def sketchEstimate(c: Column, bits: Int = 14): Column =
    GraftBridge.column(
      LinearCountEstimate(GraftBridge.expression(c), bits))

  /** Misra–Gries heavy hitters of `c`: array of (item, est_count)
    * structs, at most k entries, sorted by estimated count. Items with
    * true frequency > N/(k+1) are guaranteed present. */
  def frequentItems(c: Column, k: Int = 64): Column =
    GraftBridge.column(
      FrequentItemsSketch(GraftBridge.expression(c), k)
        .toAggregateExpression())
}
