package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-bounded (fuzzy) joins without a cartesian product —
  * the entity-resolution primitive (near-identical names, typo'd IDs,
  * OCR'd labels) Spark has no operator for; the naive formulation is
  * an O(|L|·|R|) cross join with `levenshtein` in the filter, which a
  * planner can only nested-loop.
  *
  * Candidate generation is the SymSpell / symmetric-deletion scheme
  * (Garbe's SymSpell, the FAREC/"deletion neighborhood" family): two
  * strings within edit distance d share a member of their ≤d-deletion
  * neighborhoods (delete up to d characters in every combination of
  * positions). Deletions-only neighborhoods stay SMALL — O(len^d)
  * variants per string, vs the O(len·Σ^d) of insert/substitute
  * expansions — and the sharing property is a strict SUPERSET of the
  * true pair set (e.g. "ab"/"ba" share a variant at distance 2), so an
  * exact `levenshtein ≤ d` verify finishes the job. No false
  * negatives: d deletions bound edit distance, so every true pair
  * shares a variant.
  *
  * Scale shape: ONE shuffle keyed by the (hashed) variant; only
  * `(variant-hash, id, len)` triples cross it — never the strings,
  * which join back by id for the verify. The carried length funds a
  * free candidate prefilter: edit distance ≥ |len(a) − len(b)|, so any
  * candidate pair with length gap > d is dropped BEFORE the string
  * join + levenshtein. Inside a true variant bucket the prune is
  * vacuous by construction (every member's length lies within
  * [len(v), len(v)+d], so pairwise gaps never exceed d) — its value is
  * exactly the buckets the hashing can corrupt: a 64-bit collision
  * that merges two unrelated variants' buckets produces cross-variant
  * pairs with arbitrary length gaps, and the prefilter cuts those
  * without consulting the strings (spec-pinned under a
  * deliberately-degraded hash; recall is untouched because the prune
  * is a necessary condition of d-proximity).
  *
  * Variant-bucket sizes are data-dependent; `maxBucket` guards the
  * degenerate key (a self-join bucket of m contributes m(m−1)/2
  * candidates) by passing oversized buckets through UNCOMPARED —
  * conservative, mirroring the minhash/LSH guards. The two-sided join
  * caps the candidate-pair PRODUCT |l-bucket|·|r-bucket| ≤ maxBucket
  * per bucket — capping each side independently would read as engaged
  * while admitting maxBucket² pairs from one near-threshold hot key.
  * Honest caveat on the cap: bucket sizes are measured on the HASHED
  * key, so a 64-bit collision (≈ n²/2⁶⁵ at n distinct variants —
  * negligible until variant cardinality reaches the billions) can
  * merge two variants' buckets and push the merged bucket over the
  * cap; a caller needing a hard no-recall-loss guarantee raises
  * `maxBucket` (the verify keeps precision exact at any cap).
  *
  * CONTRACT: `idCol` uniquely identifies a row. Under duplicate ids
  * the pair (id_a, id_b) is still emitted once, with the MINIMUM
  * distance over the colliding strings (deterministic best-match
  * semantics).
  *
  * The verify (`levenshtein`) is classic Wagner–Fischer on both this
  * engine and DuckDB, so results are gate-hashable.
  */
object FuzzyJoin {

  /** All variants of `s` with up to `d` characters deleted (including
    * `s` itself), distinct. Higher-order-function expression — no UDF:
    * one `transform` over the position sequence per deletion level. */
  private[operators] def deletionVariants(s: Column, d: Int): Column = {
    require(d >= 1 && d <= 2, s"maxDist must be 1 or 2, got $d")
    def delOne(arr: Column): Column = array_distinct(flatten(
      transform(arr, v => transform(
        sequence(lit(1), greatest(length(v), lit(1))),
        i => concat(v.substr(lit(1), i - 1),
          v.substr(i + 1, length(v)))))))
    val level1 = delOne(array(s))
    val all =
      if (d == 1) concat(array(s), level1)
      else concat(array(s), level1, delOne(level1))
    array_distinct(all)
  }

  /** ONE definition of the candidate keying (id, hashed ≤d-deletion
    * variant, string length) for both join shapes — the scheme
    * (hashing, salting, the length prefilter) must never diverge
    * between them. `keyHash` is a TEST SEAM: the spec degrades it to
    * force bucket merges and pin the prefilter's cut. */
  private[graft] def neighborhoodKeys(df: DataFrame, idCol: String,
                               strCol: String, maxDist: Int,
                               idAs: String,
                               keyHash: Column => Column = xxhash64(_))
      : DataFrame =
    df.select(col(idCol).as(idAs), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
      .select(col(idAs), length(col("__s")).as(s"__len_$idAs"),
        explode(deletionVariants(col("__s"), maxDist)).as("__var"))
      // hash the variant before the shuffle: candidate keys are
      // 8-byte longs, not strings; collisions only ever MERGE buckets
      // (see the cap caveat above) and add candidates the length
      // prefilter + exact verify remove
      .select(col(idAs), col(s"__len_$idAs"), keyHash(col("__var")).as("__k"))
      .distinct()

  /** Candidate pairs for the self-join, pre-verify: same-bucket id
    * pairs (id_a < id_b) surviving the skew cap and the length
    * prefilter. Factored out so the spec can measure the candidate set
    * under a degraded `keyHash` without duplicating the pipeline. */
  private[graft] def selfCandidates(df: DataFrame, idCol: String,
      strCol: String, maxDist: Int, maxBucket: Int,
      keyHash: Column => Column = xxhash64(_),
      lengthPrefilter: Boolean = true,
      /** dedup=false skips the pre-verify DISTINCT (r19, guide §2.3):
        * a pair sharing v variants is emitted v times and each copy
        * pays one (cheap, banded) levenshtein, but the full candidate
        * set — orders of magnitude larger than the verified result —
        * never crosses a dedup shuffle; the verify's final
        * groupBy(id_a, id_b) dedupes AFTER the selective filter. The
        * spec seam keeps dedup=true so measured candidate SETS stay
        * well-defined. */
      dedup: Boolean = true): DataFrame = {
    // MATERIALIZED once (r19, measured): the keyed frame feeds the
    // bucket-size aggregate and BOTH sides of the candidate self-join,
    // and those consumers ride broadcast builds with no shuffle
    // boundary to reuse — unpinned, the explode-the-deletion-
    // neighborhood subtree re-executed per consumer (two ~equal
    // broadcast-build stages dominated the query's task time). The
    // frame is exactly the slim (id, len, 8-byte variant hash) proxy
    // the scaladoc promises crosses the shuffle, so pinning it is
    // cheap at any scale; localCheckpoint (not persist) so the blocks
    // free on dereference.
    val keyed = neighborhoodKeys(df, idCol, strCol, maxDist, "__id", keyHash)
      .localCheckpoint(true)
    val sizes = keyed.groupBy("__k").agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, maxBucket))
    val inB = keyed.join(sizes, Seq("__k"))
    val paired = inB
      .select(col("__k"), col("__id").as("id_a"), col("__len___id").as("__la"))
      .join(inB.select(col("__k"), col("__id").as("id_b"),
        col("__len___id").as("__lb")), Seq("__k"))
      .filter(col("id_a") < col("id_b"))
    val pre =
      if (lengthPrefilter)
        paired.filter(abs(col("__la") - col("__lb")) <= maxDist)
      else paired
    val projected = pre.select("id_a", "id_b")
    if (dedup) projected.distinct() else projected
  }

  /** Self-join: pairs of rows whose `strCol` values are within edit
    * distance `maxDist` (1 or 2). Returns (id_a, id_b, dist) with
    * id_a < id_b. NULL strings never match (SQL comparison semantics).
    *
    * @param maxBucket skew guard — variant buckets larger than this
    *                  pass through uncompared (documented recall trade
    *                  at degenerate keys; raise it for exactness). */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int = 1, maxBucket: Int = 10000): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .filter(col("__s").isNotNull)
    // dedup=false: the groupBy(min) below dedupes AFTER the verify
    // filter, so the (large) raw candidate stream never pays a
    // distinct shuffle — only verified pairs do
    val candidates = selfCandidates(df, idCol, strCol, maxDist, maxBucket,
      dedup = false)
    candidates
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      // THRESHOLD form (r19, guide §"per-task work"): the banded DP
      // computes O(maxDist·len) cells instead of the full O(len²)
      // matrix and returns -1 past the bound — the verify is the hot
      // per-pair kernel, and pairs over the bound (the common case)
      // exit after one band. `>= 0` keeps exactly the same pair set
      // and distances as the unbounded form filtered to <= maxDist.
      .withColumn("__d",
        levenshtein(col("__sa"), col("__sb"), maxDist).cast("long"))
      .filter(col("__d") >= 0 && col("__d") <= maxDist)
      // min over duplicate-id string collisions: deterministic
      // best-match distance per pair (contract above)
      .groupBy("id_a", "id_b").agg(min(col("__d")).as("dist"))
  }

  /** Two-sided fuzzy join: left rows matched to right rows within
    * `maxDist`. Returns (left id, right id, dist). Same candidate
    * scheme; both sides explode their neighborhoods and meet on the
    * variant hash.
    *
    * @param maxBucket per-bucket candidate-PAIR budget: a bucket is
    *                  admitted iff |l-bucket| · |r-bucket| ≤ maxBucket
    *                  (the quantity the verify actually pays for —
    *                  per-side caps would admit maxBucket² pairs). */
  def join(left: DataFrame, leftId: String, leftStr: String,
           right: DataFrame, rightId: String, rightStr: String,
           maxDist: Int = 1, maxBucket: Int = 10000): DataFrame = {
    def base(df: DataFrame, id: String, str: String, as: String) =
      df.select(col(id).as(as), col(str).as(s"__s_$as"))
        .filter(col(s"__s_$as").isNotNull)
    val l = base(left, leftId, leftStr, "left_id")
    val r = base(right, rightId, rightStr, "right_id")
    // pinned once per side — the selfCandidates materialization note
    val lk = neighborhoodKeys(left, leftId, leftStr, maxDist, "left_id")
      .localCheckpoint(true)
    val rk = neighborhoodKeys(right, rightId, rightStr, maxDist, "right_id")
      .localCheckpoint(true)
    // PRODUCT cap: a candidate bucket contributes |l-bucket| ×
    // |r-bucket| verify pairs, so the admission test is on exactly
    // that product — a hot variant on either side alone is enough to
    // melt the join down, and near-threshold sides must not compound.
    val admitted = lk.groupBy("__k").agg(count(lit(1)).as("__ln"))
      .join(rk.groupBy("__k").agg(count(lit(1)).as("__rn")), Seq("__k"))
      .filter(col("__ln") * col("__rn") <= lit(maxBucket.toLong))
      .select("__k")
    // no pre-verify distinct — the groupBy(min) after the filter
    // dedupes (the selfJoin dedup=false rationale)
    val candidates = lk.join(admitted, Seq("__k")).join(rk, Seq("__k"))
      .filter(abs(col("__len_left_id") - col("__len_right_id")) <= maxDist)
      .select("left_id", "right_id")
    candidates.join(l, "left_id").join(r, "right_id")
      // threshold/banded form — see selfJoin's verify note
      .withColumn("__d",
        levenshtein(col("__s_left_id"), col("__s_right_id"), maxDist)
          .cast("long"))
      .filter(col("__d") >= 0 && col("__d") <= maxDist)
      .groupBy("left_id", "right_id").agg(min(col("__d")).as("dist"))
  }
}
