package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise mean of fixed-dimension vectors as a
  * `TypedImperativeAggregate` — the centroid-computation primitive for
  * k-means/IVF training over an embedding column.
  *
  * Buffer = (running element sums, count): `dim` doubles + a long, so
  * only a fixed-size record crosses the shuffle per group regardless
  * of how many vectors fold into it — map-side partial aggregation
  * does the heavy summing next to the scan, exactly like a builtin
  * `avg`. Inputs whose length differs from `dim` are skipped (defensive
  * against ragged data; a real pipeline validates upstream).
  */
case class VectorAvg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[(Array[Double], Long)] {

  require(dim >= 1 && dim <= 65536, "dim out of range")

  // Reject non-array<double> inputs at ANALYSIS time: float-encoded
  // ArrayData read through getDouble is a ClassCastException or —
  // worse, on unsafe rows — silent 8-byte-stride garbage. SQL callers
  // over the repo's array<float> embedding columns must cast first.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_avg requires array<double>, got ${other.simpleString}; " +
            "cast the column to array<double> first")
    }

  override def children: Seq[Expression] = Seq(child)
  // NULL when the group contributed no valid vectors — an all-zeros
  // "mean" would masquerade as a genuine origin-centered cluster
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): (Array[Double], Long) =
    (new Array[Double](dim), 0L)

  override def update(buf: (Array[Double], Long),
                      input: InternalRow): (Array[Double], Long) = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim) buf
      else {
        val sums = buf._1
        var i = 0
        while (i < dim) { sums(i) += arr.getDouble(i); i += 1 }
        (sums, buf._2 + 1)
      }
    }
  }

  override def merge(buf: (Array[Double], Long),
                     other: (Array[Double], Long)): (Array[Double], Long) = {
    val sums = buf._1
    var i = 0
    while (i < dim) { sums(i) += other._1(i); i += 1 }
    (sums, buf._2 + other._2)
  }

  override def eval(buf: (Array[Double], Long)): Any =
    if (buf._2 == 0L) null
    else new GenericArrayData(buf._1.map(_ / buf._2.toDouble))

  override def serialize(buf: (Array[Double], Long)): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * dim + 8)
    buf._1.foreach(bb.putDouble)
    bb.putLong(buf._2)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): (Array[Double], Long) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val sums = Array.fill(dim)(bb.getDouble)
    (sums, bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorAvg =
    copy(child = newChildren.head)
  override def prettyName: String = "vector_avg"
}

/** First and second moments of a vector column in ONE aggregation —
  * what covariance estimation (whitening/PCA, [[graft.operators
  * .Whitening]]) needs: per-group state is (count, Σx[d],
  * upper-triangular Σx·xᵀ[d(d+1)/2]), a FIXED-size record regardless
  * of row count, map-side combined like [[VectorAvg]]. dim is capped
  * at 1024 (the buffer is ~4 MB doubles there — embedding dims live
  * far below; past that, covariance itself stops being the right
  * estimator). Eval packs the raw sums as one array<double>
  * [n, sums…, tri…] — the single driver consumer unpacks; NULL when
  * no valid vectors contributed. Ragged inputs are skipped (the
  * VectorAvg convention). */
case class VectorMoments(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[(Array[Double], Long)] {

  require(dim >= 1 && dim <= 1024, "dim out of range (1..1024)")
  private val triLen = dim * (dim + 1) / 2

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_moments requires array<double>, got ${other.simpleString}; " +
            "cast the column to array<double> first")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // buffer layout: [sums(dim), upper-tri(triLen)] + count
  override def createAggregationBuffer(): (Array[Double], Long) =
    (new Array[Double](dim + triLen), 0L)

  override def update(buf: (Array[Double], Long),
                      input: InternalRow): (Array[Double], Long) = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim) buf
      else {
        val s = buf._1
        var i = 0
        while (i < dim) { s(i) += arr.getDouble(i); i += 1 }
        var k = dim
        i = 0
        while (i < dim) {
          val xi = arr.getDouble(i)
          var j = i
          while (j < dim) { s(k) += xi * arr.getDouble(j); j += 1; k += 1 }
          i += 1
        }
        (s, buf._2 + 1)
      }
    }
  }

  override def merge(buf: (Array[Double], Long),
                     other: (Array[Double], Long)): (Array[Double], Long) = {
    val s = buf._1
    var i = 0
    while (i < s.length) { s(i) += other._1(i); i += 1 }
    (s, buf._2 + other._2)
  }

  override def eval(buf: (Array[Double], Long)): Any =
    if (buf._2 == 0L) null
    else {
      val out = new Array[Double](1 + dim + triLen)
      out(0) = buf._2.toDouble
      System.arraycopy(buf._1, 0, out, 1, dim + triLen)
      new GenericArrayData(out)
    }

  override def serialize(buf: (Array[Double], Long)): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * (dim + triLen) + 8)
    buf._1.foreach(bb.putDouble)
    bb.putLong(buf._2)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): (Array[Double], Long) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = Array.fill(dim + triLen)(bb.getDouble)
    (s, bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMoments =
    copy(child = newChildren.head)
  override def prettyName: String = "vector_moments"
}

object VectorFunctions {
  /** Element-wise mean of an `array<double>` column of length `dim`. */
  def vectorAvg(c: Column, dim: Int): Column =
    GraftBridge.column(
      VectorAvg(GraftBridge.expression(c), dim).toAggregateExpression())

  /** Packed (count, element sums, upper-tri cross sums) of an
    * `array<double>` column — see [[VectorMoments]]. */
  def vectorMoments(c: Column, dim: Int): Column =
    GraftBridge.column(
      VectorMoments(GraftBridge.expression(c), dim).toAggregateExpression())
}
