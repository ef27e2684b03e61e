package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashed-feature linear text classifier — the fastText/VW shape of
  * quality filtering: score(text) = Σ_token w[h(token) mod D], applied
  * corpus-wide as pure codegen'd expressions (tokenize → transform →
  * aggregate; no UDF, no explode — one projection per document, so the
  * scan parallelism is the plan's parallelism at any corpus size).
  *
  * Determinism discipline: weights live in integer micro-units
  * (1/1000003) and the per-token contributions are summed as longs —
  * order-independent exact arithmetic, so the DuckDB oracle lands on
  * the identical score. The feature hash is the portable md5 bucket
  * ([[graft.operators.Sampling.hashBucket]]'s formula) — engine- and
  * version-stable, unlike xxhash/murmur whose seeds are private.
  *
  * Two weight sources:
  *  - [[hashedWeightQ]]: weights DERIVED from the bucket id by a
  *    Knuth multiplicative hash — a deterministic stand-in for a
  *    trained model that exercises the full scoring path (the gate
  *    query's form).
  *  - an explicit `Array[Long]` of trained micro-unit weights shipped
  *    as a plan literal ([[linearScoreQ]]) — the production form; a
  *    D-sized array rides the broadcast plan, never a join.
  */
object LinearModel {

  /** Micro-unit denominator (prime, so bucket·knuth mod it mixes). */
  val WeightDenom = 1000003L

  /** Portable feature bucket in [0, dim): first 8 md5 hex chars as a
    * 32-bit unsigned value, mod dim. Identical in DuckDB as
    * `CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT) % dim`. */
  def featureBucket(token: Column, dim: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % dim

  /** Deterministic per-bucket weight in integer micro-units, range
    * (−WeightDenom/2, WeightDenom/2]: bucket × 2654435761 (Knuth's
    * 2^32·φ) mod 1000003, recentered. All-long arithmetic — no
    * float anywhere, so cross-engine equality is exact. */
  def hashedWeightQ(bucket: Column): Column =
    (bucket * lit(2654435761L)) % lit(WeightDenom) - lit((WeightDenom - 1) / 2)

  /** Σ_token hashedWeightQ(bucket(token)) as a long — zero for empty
    * token lists (the aggregate's init value). */
  def hashedLinearScoreQ(text: Column, dim: Int): Column =
    aggregate(
      transform(TextFunctions.tokens(text),
        t => hashedWeightQ(featureBucket(t, dim))),
      lit(0L), (acc, x) => acc + x)

  /** Σ_token weightsQ[bucket(token)] with trained micro-unit weights
    * shipped as ONE array literal in the plan (broadcast with the
    * closure; element_at is codegen'd). `weightsQ.length` is the
    * feature dimension. */
  def linearScoreQ(text: Column, weightsQ: Array[Long]): Column = {
    require(weightsQ.nonEmpty, "empty weight vector")
    val w = lit(weightsQ)
    aggregate(
      transform(TextFunctions.tokens(text),
        t => element_at(w, (featureBucket(t, weightsQ.length) + lit(1)).cast("int"))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Mean per-token logit as a double: score_q / (denom · max(n,1)).
    * One final division of exact longs — bit-identical cross-engine.
    * The natural filter threshold (0.0 = "balanced"). */
  def meanLogit(scoreQ: Column, nTokens: Column): Column =
    scoreQ.cast("double") /
      (lit(WeightDenom.toDouble) * greatest(nTokens.cast("double"), lit(1.0)))
}
