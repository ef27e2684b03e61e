package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning: kill non-joining fact rows AT THE SCAN,
  * before they pay the shuffle.
  *
  * A selective dim⋈fact join at 100 TB moves the whole fact side
  * through an exchange only to drop most of it at the join. Building a
  * Bloom filter over the dim keys (one small aggregation) and filtering
  * the fact scan with `might_contain` first cuts shuffle volume by
  * ~the join selectivity, at zero correctness cost: a Bloom filter has
  * false POSITIVES only, and the join that follows removes them — the
  * composed result is bit-identical to the plain join.
  *
  * This is the same mechanism as Spark's runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.*`), exposed as an
  * EXPLICIT operator: the optimizer's version only fires when a
  * shuffle-join cost heuristic over column statistics approves, which
  * silently declines exactly when stats are missing or stale (the
  * normal state of a fresh 100 TB landing zone). Here the pipeline
  * author states the intent and the prune always happens.
  *
  * Scale shape: ONE aggregation over the (small) dim side produces a
  * ~`numBits/8`-byte filter — a driver-safe scalar collected once (the
  * same bytes the optimizer's version would broadcast); the fact side
  * is filtered with a codegen'd `might_contain(xxhash64(key))` predicate
  * pushed below its exchange, then joined exactly. The fact side never
  * explodes, never collects, and shuffles only surviving rows.
  *
  * Both sides hash with `xxhash64` (the engine-portable key transform
  * the optimizer's own filter uses), so any join-key type works.
  */
object BloomPrune {

  /** Spark caps the aggregate at 4M items / 67108864 bits (the
    * optimizer's own maxima) — stay inside them so checkInputDataTypes
    * accepts the plan. A dim side beyond 4M distinct keys is past the
    * point where a Bloom prune pays anyway (fpp degrades; broadcast of
    * the filter itself starts to cost). */
  val MaxItems = 4000000L
  val MaxBits = 67108864L

  /** Optimal bit count for `n` items at false-positive rate `fpp`:
    * m = -n ln(p) / (ln 2)², the standard Bloom sizing formula. */
  def numBitsFor(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2)
    val m = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    (m max 64L) min MaxBits
  }

  private def xx(c: Column): Column =
    GraftBridge.column(new XxHash64(Seq(GraftBridge.expression(c))))

  /** Aggregate a serialized Bloom filter over `key` (hashed with
    * xxhash64). Merge is a bitwise OR — insertion-order-insensitive,
    * so the bytes are deterministic under any partitioning. */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0 && expectedItems <= MaxItems,
      s"expectedItems must be in (0, $MaxItems], got $expectedItems")
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(xx(key)),
      Literal(expectedItems),
      Literal(numBitsFor(expectedItems, fpp)))
    GraftBridge.column(agg.toAggregateExpression())
  }

  /** Build the filter for `dim`'s key column — ONE job, one collected
    * row of `numBits/8` bytes (1% fpp at 1M keys ≈ 1.2 MB; the scalar
    * the optimizer's runtime filter would broadcast). None for an
    * empty/all-NULL dim side. */
  def buildBloom(dim: DataFrame, dimKey: String,
                 expectedItems: Long, fpp: Double = 0.01): Option[Array[Byte]] = {
    // NULL keys never join — dropping them BEFORE the aggregate keeps
    // them out of the filter (xxhash64 maps NULL to its seed, which
    // would otherwise plant a sentinel value every NULL-keyed probe
    // passes) and makes an all-NULL dim side read as empty (None)
    val row = dim.filter(col(dimKey).isNotNull)
      .agg(bloomAgg(col(dimKey), expectedItems, fpp).as("bf")).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** `might_contain(bloom, xxhash64(key))` as a codegen'd predicate.
    * NULL keys hash to the seed, so they may pass the filter — the
    * exact join after it is what drops them, same as without the
    * prune. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftBridge.expression(xx(key))))

  /** Inner equi-join `fact ⋈ dim` with the fact scan pre-filtered by a
    * Bloom of the dim keys. Result is bit-identical to the plain join
    * (false positives are removed by the join itself); the fact-side
    * exchange carries only rows that might match.
    *
    * `expectedItems` sizes the filter — overestimate freely (bits are
    * cheap); an UNDERestimate only raises fpp, never loses rows. */
  def pruneInnerJoin(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // dataset-qualified key refs: with an unqualified col(...), a key
    // NAME shared by both sides (the natural `id = id` join) would
    // resolve ambiguous and throw
    def joined(f: DataFrame) = f.join(dim, f(factKey) === dim(dimKey))
    buildBloom(dim, dimKey, expectedItems, fpp) match {
      // dim side has no non-NULL keys: the inner join is empty; emit
      // the joined SCHEMA without scanning the fact side at all
      case None => joined(fact.filter(lit(false)))
      case Some(bytes) => joined(fact.filter(mightContain(bytes, col(factKey))))
    }
  }

  /** Left-semi variant: `fact` rows with at least one dim match,
    * Bloom-pruned the same way (the IN-subquery shape). */
  def pruneSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame =
    buildBloom(dim, dimKey, expectedItems, fpp) match {
      case None => fact.filter(lit(false))
      case Some(bytes) =>
        val f = fact.filter(mightContain(bytes, col(factKey)))
        f.join(dim.select(col(dimKey)), f(factKey) === dim(dimKey),
          "left_semi")
    }
}
