package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.{col, lit, percentile_approx}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaving for multi-dimensional data clustering.
  *
  * The layout lever behind `OPTIMIZE ... ZORDER BY` in lakehouse
  * engines: rows sorted by an interleaved-bit key of k columns land so
  * that a file's min/max range is narrow in EVERY clustered column at
  * once — a selective scan on ANY of them skips most files/row-groups
  * via ordinary parquet footer stats, where a lexicographic sort only
  * serves its leading column. At 100 TB that is the difference between
  * scanning the table and scanning a slice, with zero reader changes —
  * predicate pushdown against footer stats is already how Spark reads
  * parquet.
  *
  * Values map to rank buckets first (quantile boundaries from ONE
  * `percentile_approx` pass — equal-POPULATION buckets, so skewed
  * columns still spread over the full 2^bits range; equal-width
  * `width_bucket` would collapse a heavy-tailed column into one
  * bucket), then the bucket bits interleave MSB-aligned into a single
  * long.
  */
case class ZOrderKey(children: Seq[Expression],
                     boundaries: Seq[Array[Double]], bits: Int)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  // capacity: bits × cols must fit the 63 usable bits of a long, so 8
  // columns need bits <= 7 (Maintenance.zorderCompact clamps for you)
  require(children.nonEmpty && children.size <= 8,
    s"z-order takes 1..8 columns, got ${children.size}")
  require(boundaries.size == children.size,
    "one boundary array per column required")
  // the same [1, 20] range boundaries() enforces: past 30 bits the
  // Int-shift boundary-length check wraps ((1 << 32) - 1 == 0 would
  // accept an EMPTY boundary array and emit a constant key — silent
  // no-op clustering), and past 20 the per-column boundary array is
  // absurd anyway
  require(bits >= 1 && bits <= 20, s"bucket bits out of [1, 20]: $bits")
  require(bits * children.size <= 63,
    s"bits=$bits x ${children.size} cols must fit a long")
  require(boundaries.forall(_.length == (1 << bits) - 1),
    s"each boundary array must hold 2^bits-1 = ${(1 << bits) - 1} entries")

  // CodegenFallback is deliberate: the key evaluates once per row in a
  // LAYOUT REWRITE job whose cost is shuffle + parquet encode — the
  // interpreted dispatch is noise there, and the expression never
  // appears on a query path (queries read the clustered files through
  // the ordinary pushdown machinery, no z-key in sight).

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val k = children.size
    var z = 0L
    var j = 0
    while (j < k) {
      val v = children(j).eval(input)
      // NULLs cluster at the low edge (bucket 0), like NULLS FIRST
      val bucket = if (v == null) 0 else upperBound(boundaries(j),
        v.asInstanceOf[Double])
      var i = 0
      while (i < bits) {
        z |= ((bucket >> i) & 1L) << (i * k + j)
        i += 1
      }
      j += 1
    }
    z
  }

  /** First index whose boundary exceeds v = count of boundaries <= v =
    * the rank bucket, in [0, 2^bits-1]. Hand-rolled (not
    * Arrays.binarySearch) because duplicate boundaries — a column with
    * fewer than 2^bits distinct values — must map equal inputs to ONE
    * deterministic bucket, and binarySearch picks an arbitrary match. */
  private def upperBound(bs: Array[Double], v: Double): Long = {
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bs(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKey =
    copy(children = newChildren)
  override def prettyName: String = "zorder_key"
}

object ZOrderFunctions {
  /** Equal-population bucket boundaries for each column, all from ONE
    * aggregation pass (no per-column jobs, no global sorts — the
    * sample-sketch pass is how engines compute range partition ids at
    * scale). Columns must cast to double (numerics; cast dates/
    * timestamps yourself). An all-NULL column yields degenerate
    * boundaries (every value buckets to 0) rather than failing. */
  def boundaries(df: DataFrame, cols: Seq[String],
                 bits: Int): Seq[Array[Double]] = {
    // Int-shift arithmetic below: past 30 bits `1 << bits` wraps, and
    // a 2^bits-element driver-side quantile array is absurd long
    // before that — fail loud, don't OOM the driver
    require(bits >= 1 && bits <= 20,
      s"bucket bits out of [1, 20]: $bits")
    val n = (1 << bits) - 1
    val qs = (1 to n).map(_.toDouble / (1 << bits)).toArray
    // accuracy >> bucket count so adjacent boundaries stay ordered
    val accuracy = math.max(10000, 8 * (1 << bits))
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), lit(qs), lit(accuracy))
        .as(s"__b_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      if (row.isNullAt(i)) Array.fill(n)(0.0)
      else row.getSeq[Double](i).toArray
    }
  }

  /** The interleaved-bit sort key over `cols` given [[boundaries]]. */
  def zkey(cols: Seq[Column], boundaries: Seq[Array[Double]],
           bits: Int): Column =
    GraftBridge.column(ZOrderKey(
      cols.map(c => GraftBridge.expression(c.cast("double"))),
      boundaries, bits))
}
