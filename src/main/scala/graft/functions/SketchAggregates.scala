package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types.{DataType, LongType}

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

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var zeros = 0L
    var i = 0
    while (i < words) { zeros += 64 - java.lang.Long.bitCount(buf(i)); i += 1 }
    if (zeros == 0) m.toLong // saturated: lower bound
    else math.round(-m.toDouble * math.log(zeros.toDouble / m))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](words)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LinearCountSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LinearCountSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LinearCountSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "linear_count_sketch"
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
}
