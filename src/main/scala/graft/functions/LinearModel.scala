package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** One-pass deterministic trainer: Naive-Bayes-style per-bucket
    * posterior weights from a labeled corpus. For each feature bucket,
    * w_q[b] = ⌊(pos_b + 1) · WeightDenom / (n_b + 2)⌋ − (WeightDenom−1)/2
    * — the add-one-smoothed Bernoulli posterior P(pos | bucket),
    * fixed-point quantized and recentered so an uninformative bucket
    * (or one never seen in training: (0+1)/(0+2) = 1/2) weighs EXACTLY
    * zero. The sum-of-posteriors vote replaces NB's sum-of-log-odds
    * deliberately: every weight is pure integer arithmetic, so any
    * engine reproduces it bit-for-bit (log()'s last ULP varies by
    * libm, which would poison a hash gate and make model artifacts
    * platform-dependent).
    *
    * ONE exploded aggregation over ≤ dim buckets, then a collect of
    * ≤ dim rows — the model is driver-sized by construction (dim is
    * the caller's feature-hash width, thousands not billions), the
    * corpus is never collected. Training is the rare pass; scoring
    * ([[linearScoreQ]]) stays the explode-free hot path.
    *
    * Overflow bound: (pos_b + 1) · WeightDenom needs pos_b < 9.2e12 —
    * ~9 trillion positive-class token occurrences in ONE bucket —
    * before Long overflow; far past any real corpus per-bucket mass. */
  def trainPosteriorWeightsQ(labeled: DataFrame, textCol: String,
                             labelCol: String, dim: Int): Array[Long] = {
    require(dim >= 1, "dim must be >= 1")
    val counts = labeled
      .select(explode(TextFunctions.tokens(col(textCol))).as("__tok"),
        col(labelCol).cast("boolean").as("__pos"))
      .groupBy(featureBucket(col("__tok"), dim).as("__b"))
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("__posc"),
        count(lit(1)).as("__n"))
      .collect()
    val w = new Array[Long](dim) // unseen buckets stay 0 (= the prior)
    counts.foreach { r =>
      val b = r.getLong(0).toInt
      w(b) = (r.getLong(1) + 1) * WeightDenom / (r.getLong(2) + 2) -
        (WeightDenom - 1) / 2
    }
    w
  }

  /** Persist trained micro-unit weights as a (bucket, weight_q)
    * parquet — the model artifact a curation pipeline ships between
    * the training job and every scoring job (same discipline as
    * BpeInduction.saveMerges). Zero-weight buckets are stored too:
    * the file IS the dimension (loadWeightsQ refuses a dim
    * mismatch rather than silently re-bucketing). */
  def saveWeightsQ(spark: SparkSession, weightsQ: Array[Long],
                   path: String): Unit = {
    require(weightsQ.nonEmpty, "empty weight vector")
    import spark.implicits._
    weightsQ.zipWithIndex
      .map { case (w, b) => (b, w) }.toSeq
      .toDF("bucket", "weight_q")
      .coalesce(1) // dim-sized model: one file, not one per shuffle slot
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveWeightsQ]] artifact back into scoring form.
    * `expectDim` (when >= 0) guards against pairing a model with a
    * query compiled for a different feature-hash width — the failure
    * would otherwise be silently wrong scores, never an error. */
  def loadWeightsQ(spark: SparkSession, path: String,
                   expectDim: Int = -1): Array[Long] = {
    val rows = spark.read.parquet(path)
      .select(col("bucket").cast("int"), col("weight_q").cast("long"))
      .collect()
    require(rows.nonEmpty, s"no weights at $path")
    val dim = rows.map(_.getInt(0)).max + 1
    require(expectDim < 0 || dim == expectDim,
      s"weights at $path have dim $dim, step expects $expectDim")
    val w = new Array[Long](dim)
    rows.foreach(r => w(r.getInt(0)) = r.getLong(1))
    w
  }

  /** Isotonic calibration of a binned reliability table by
    * pool-adjacent-violators (PAVA — Ayer et al. 1955): the
    * least-squares NON-DECREASING fit of the per-bin positive rate,
    * the standard monotone recalibration on top of a ranker's score
    * (the [[trainPosteriorWeightsQ]] eval loop's second half).
    *
    * `bins` must be the AGGREGATED table — one row per score bin with
    * exact integer counts (`nCol` rows, `posCol` positives), the
    * calibration_bins shape. PAVA itself is inherently sequential, so
    * it runs on the DRIVER over the collected bins: the collect is
    * cap-guarded (`maxBins`, refuses loud — bins are a score GRID, a
    * thousand-fold smaller than data; quantize upstream if not), pool
    * comparisons are EXACT cross-multiplied BigInt rationals (no
    * double drift can merge or split a pool), and each bin's fitted
    * rate is its pool's single Σpos/Σn division — so the output is a
    * pure function of the bin table. Equal adjacent rates stay
    * unmerged (identical fitted values either way).
    *
    * @return (bin, n, n_pos, pos_rate, iso_rate) ordered by bin */
  def isotonicCalibrate(bins: DataFrame, binCol: String, nCol: String,
                        posCol: String, maxBins: Int = 4096): DataFrame = {
    require(maxBins >= 1, s"maxBins must be >= 1, got $maxBins")
    val rows = bins
      .select(col(binCol).cast("long").as("bin"),
        col(nCol).cast("long").as("n"), col(posCol).cast("long").as("p"))
      .limit(maxBins + 1).collect()
    require(rows.length <= maxBins,
      s"isotonicCalibrate: more than $maxBins bins — aggregate to a " +
        "coarser score grid first")
    require(rows.forall(r => !r.isNullAt(0) && r.getLong(1) > 0 &&
        r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)),
      "bins need non-NULL bin, n > 0, 0 <= pos <= n")
    val sorted = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(sorted.map(_._1).distinct.length == sorted.length,
      "duplicate bin values")
    // PAVA stack: (pos, n, span); merge while the previous pool's
    // rate EXCEEDS the next's (strict violation of non-decreasing)
    val stack = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    sorted.foreach { case (_, n, p) =>
      var (cp, cn, cs) = (p, n, 1)
      while (stack.nonEmpty && {
        val (pp, pn, _) = stack.last
        BigInt(pp) * cn > BigInt(cp) * pn
      }) {
        val (pp, pn, ps) = stack.remove(stack.length - 1)
        cp += pp; cn += pn; cs += ps
      }
      stack += ((cp, cn, cs))
    }
    val fitted = stack.toSeq.flatMap { case (p, n, span) =>
      Seq.fill(span)(p.toDouble / n.toDouble)
    }
    val out = sorted.zip(fitted).map { case ((b, n, p), iso) =>
      (b, n, p, p.toDouble / n.toDouble, iso)
    }
    bins.sparkSession.createDataFrame(out)
      .toDF("bin", "n", "n_pos", "pos_rate", "iso_rate")
      .orderBy("bin")
  }
}
