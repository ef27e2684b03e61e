package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Everything keys off a *portable* content hash — the first 8 hex
  * chars of `md5(id)` parsed as a number — rather than `rand()` or
  * Spark's `sample()`: the assignment of a row is a pure function of
  * its id, so it is stable across runs, partitionings, engines (the
  * DuckDB oracle computes the identical bucket), and cluster sizes.
  * That stability is the property a 100 TB pipeline needs: re-running
  * a split after appending data never reshuffles previously assigned
  * rows between train and test (no leakage), and any engine can
  * reproduce the exact membership.
  *
  * All expressions are codegen'd (`md5`/`conv`/`when`) — narrow maps,
  * no shuffle, no driver state.
  */
object Sampling {

  /** Uniform bucket in [0, nBuckets) from the row id: first 32 bits of
    * md5(id-as-string), mod nBuckets. */
  def hashBucket(id: Column, nBuckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % nBuckets

  /** Deterministic global shuffle key for training order:
    * md5("shuffle:<salt>:" + id) — a seeded pseudo-random permutation
    * that is engine-reproducible and append-stable per id (new rows
    * interleave without moving existing ones). Sorting by it is
    * Spark's range-partitioned total sort (sample pass + one shuffle,
    * the TeraSort shape) — the right primitive for randomizing a
    * 100 TB corpus, vs. rand() which reshuffles on every retry. */
  def shuffleKey(id: Column, salt: String = "0"): Column =
    md5(concat(lit(s"shuffle:$salt:"), id.cast("string")))

  /** Deterministic per-group sample: the k rows with the smallest
    * shuffle-key hash in each group — uniform-without-replacement
    * reservoir semantics whose membership is a pure function of ids
    * (a new row displaces at most one prior member, exactly like a
    * reservoir). One shuffle on the group key; rank + filter fuse in
    * whole-stage codegen. The per-stratum quota sibling of
    * [[deterministicSample]] for "n examples per class/language"
    * selections. */
  def groupSample(df: DataFrame, groupCol: String, idCol: String,
                  k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(shuffleKey(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic train/val/test label: percent buckets
    * [0,trainPct) → train, [trainPct,trainPct+valPct) → val,
    * rest → test. */
  def splitLabel(id: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must fit in [0,100]")
    val b = hashBucket(id, 100)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic ~`fraction` sample: keeps rows whose hash bucket
    * falls under the cut. Same row set on every run/engine. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          nBuckets: Int = 10000): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    df.filter(hashBucket(col(idCol), nBuckets) <
      math.round(fraction * nBuckets))
  }

  /** Deterministic weight-proportional sample WITHOUT replacement
    * (Efraimidis–Spirakis A-ES, Inf. Proc. Letters 2006): every row
    * draws key ln(u)/w — u the portable md5-uniform of its id in
    * (0,1], w its positive weight — and the n largest keys win.
    * Selection probability is proportional to weight, membership is a
    * pure function of (id, weight) — reproducible across engines,
    * runs, and partitionings, unlike rand()-based weighted sampling
    * which reshuffles on every retry.
    *
    * The key is floor-quantized to integer 1e-9 units before ranking
    * (ties break by id), so the DuckDB oracle — same md5 parse, same
    * ln input, same division — ranks identical longs. Top-n is a
    * TakeOrderedAndProject: n-sized per-partition heaps, ONE n-row
    * final merge — no global sort at any corpus size.
    *
    * Rows with NULL or non-positive weight are excluded (a zero
    * weight cannot be sampled; a negative one is a config error
    * surfaced by the count, not a crash).
    *
    * @return input columns + `key_q` (quantized key), the n winners,
    *         highest key first, ties by id
    */
  /** The quantized A-ES key ln(u)/w in integer 1e-9 units — ONE
    * definition for both sampler shapes (the arithmetic is mirrored
    * digit for digit by two DuckDB oracles; a drifted copy would break
    * the hash gate). u = (first-8-hex-of-md5 + 1) / 2^32 ∈ (0,1]; +1
    * and the power-of-two divide are exact, so ln sees the same
    * double in every engine. */
  private def aesKeyQ(idCol: String, weightCol: String): Column = {
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") + lit(1L)).cast("double") / lit(4294967296.0)
    floor(lit(1e9) * log(u) / col(weightCol).cast("double")).cast("long")
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("key_q", aesKeyQ(idCol, weightCol))
      .orderBy(col("key_q").desc, col(idCol))
      .limit(n)
  }

  /** Per-group [[weightedSample]]: the n highest A-ES keys WITHIN each
    * group — "the k most representative docs per language, weighted by
    * quality" in one window over one shuffle on the group key (the
    * groupSample discipline, weight-aware). Same quantized-key
    * determinism; rows with NULL/non-positive weight excluded. */
  def weightedSamplePerGroup(df: DataFrame, idCol: String,
                             weightCol: String, groupCol: String,
                             n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("key_q").desc, col(idCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("key_q", aesKeyQ(idCol, weightCol))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= n)
  }

  /** Stratified quota sampling: each stratum keeps its own fraction
    * (e.g. cap English at 30%, keep all of a rare language) — same
    * hash discipline, so membership is reproducible and append-stable
    * per stratum. Strata not in the map keep `default`. One codegen'd
    * when-chain, no shuffle, no per-stratum pass. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       default: Double = 0.0,
                       nBuckets: Int = 10000): DataFrame = {
    require((default +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "fractions in [0,1]")
    val cut = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(default * nBuckets))) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum,
        lit(math.round(f * nBuckets))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), nBuckets) < cut)
  }

  /** Deterministic weighted corpus mixture: source i contributes
    * ~`weight_i` of its rows (each weight an independent keep-fraction
    * in [0,1]), tagged with its position as `source_id`. Same hash
    * discipline as [[deterministicSample]], so the mixture is
    * reproducible and append-stable per source. All frames must share
    * the mixed schema (project before mixing). */
  def weightedMix(sources: Seq[(DataFrame, Double)], idCol: String): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    sources.zipWithIndex.map { case ((df, w), i) =>
      deterministicSample(df, idCol, w).withColumn("source_id", lit(i))
    }.reduce(_.unionByName(_))
  }

  /** Authority-weighted domain quota — [[graft.operators.Graph]]'s
    * quality prior COMPOSED into curation: each source group keeps its
    * top-ranked documents, but the quota SCALES with the source's
    * authority weight (a PageRank/HITS score, or any supplied
    * per-source prior):
    *
    *   cap(s) = max(1, (maxPerSource · w(s)) div max_w)
    *
    * — the top-authority source keeps the full `maxPerSource`, others
    * proportionally fewer, floor 1 (a source absent from the prior
    * keeps exactly its single best document, never silently vanishes).
    * Pure INTEGER arithmetic (`div` = floor division) so the quota is
    * a bit-exact function of the prior — weights must be integral
    * (the graph operators' `*_q` micro-unit outputs are), and
    * `maxPerSource · max_w` must fit a long (micro-unit ranks leave
    * ~9e12 headroom at maxPerSource ≤ 1000).
    *
    * Scale shape: the prior is per-SOURCE (domains — small against the
    * corpus) → broadcast join, no corpus shuffle for the cap; then the
    * same per-source top-k window as the unweighted quota step (ONE
    * shuffle on the source key, never a global sort). One scalar
    * collect (max weight) — the established one-row pattern.
    *
    * @param orderCols ranking within a source, best first (e.g.
    *        quality DESC, id) — must be deterministic and total
    * @return input columns + `cap_q` (the source's quota) + `rnk` */
  def capPerSourceWeighted(df: DataFrame, sourceCol: String, idCol: String,
                           orderCols: Seq[Column], maxPerSource: Int,
                           prior: DataFrame, priorKeyCol: String,
                           weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPerSource >= 1, s"maxPerSource must be >= 1, got $maxPerSource")
    // one row per key, ENFORCED: a prior with repeated keys would
    // multiply corpus rows through the left join below — duplicated
    // documents with distinct rnk values and silently inflated
    // per-source output (r11 ADVICE). max() collapses dupes
    // deterministically; the generous reading of a conflicted prior.
    val p = prior.select(col(priorKeyCol).as("__psrc"),
      col(weightCol).cast("long").as("__w"))
      .groupBy("__psrc").agg(max(col("__w")).as("__w"))
    val mm = p.agg(max(col("__w")).as("mw")).collect()(0)
    require(!mm.isNullAt(0) && mm.getLong(0) > 0,
      "capPerSourceWeighted: prior has no positive weights — an " +
        "all-zero authority table would cap every source to 1 " +
        "silently; fix the prior or use the unweighted quota")
    val maxW = mm.getLong(0)
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(orderCols :+ col(idCol): _*)
    df.join(broadcast(p), col(sourceCol) === col("__psrc"), "left")
      .withColumn("cap_q", greatest(lit(1L),
        expr(s"(coalesce(__w, 0L) * ${maxPerSource}L) div ${maxW}L")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= col("cap_q"))
      .drop("__psrc", "__w")
  }

  /** Pack documents into ~`targetTokens` training-sequence bins:
    * within each hash bucket, documents accumulate in id order and a
    * bin closes when the running token total crosses the target —
    * cumulative-sum packing, the streaming-friendly variant of
    * first-fit (each doc lands in exactly one bin; bins fill to the
    * target give or take one document).
    *
    * Scale shape: the window partitions by `pack_bucket`
    * (`nBuckets`-way parallel, one shuffle), NOT a global ordering —
    * a single-partition global cumulative sum would serialize 100 TB
    * through one task. Bin identity `(pack_bucket, bin_id)` is again a
    * pure function of the corpus content, reproducible anywhere.
    */
  def packBins(df: DataFrame, idCol: String, tokenCol: String,
               targetTokens: Long, nBuckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("pack_bucket")).orderBy(col(idCol))
    df.withColumn("pack_bucket", hashBucket(col(idCol), nBuckets))
      .withColumn("bin_id",
        floor((sum(col(tokenCol)).over(w) - col(tokenCol))
          .cast("double") / targetTokens).cast("long"))
  }

  /** LEAKAGE-SAFE train/val/test split: near-duplicates can never
    * straddle splits. The naive per-id [[splitLabel]] puts a doc in
    * train and its near-copy in test — the classic contamination that
    * inflates eval scores. Here every doc inherits the split of its
    * duplicate-cluster REPRESENTATIVE (the transitive min id over the
    * candidate-pair graph, [[Dedup.duplicateClusters]]), so a whole
    * near-dup family lands in ONE split by construction; unclustered
    * docs split by their own id, identical to [[splitLabel]].
    *
    * Shape: the cluster map covers only docs that HAVE a duplicate
    * (tiny next to the corpus), one left join attaches it, and the
    * label is the usual codegen'd md5 bucket — no new shuffle beyond
    * the clustering itself. Output adds `split_key` (the id the label
    * hashes — cluster rep or self) and `split`.
    *
    * @param pairs candidate near-dup pairs (id_a, id_b) from any
    *        generator (MinHash bands, SymSpell, embedding buckets) */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
                       trainPct: Int, valPct: Int): DataFrame = {
    val clusters = Dedup.duplicateClusters(pairs)
      .withColumnRenamed("id", idCol)
    docs.join(clusters, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("cluster"), col(idCol)))
      .drop("cluster")
      .withColumn("split", splitLabel(col("split_key"), trainPct, valPct))
  }

  /** Cluster-balanced corpus cap — topic/content balancing in
    * EMBEDDING space (the SemDeDup-adjacent curation pass): assign
    * every row to a k-means cell of its embedding, keep at most
    * `perCluster` rows per cell (smallest id first — deterministic),
    * so one over-represented mode (boilerplate, a crawl-heavy domain,
    * one language) cannot dominate the training mix however large it
    * grows. Where [[graft.queries]] `cap_per_source` caps by a LABEL,
    * this caps by CONTENT — it needs no source metadata.
    *
    * Shape: centroid training ([[Similarity.kmeansCentroids]] — one
    * scan + k-group shuffle per iteration, k driver doubles), then a
    * narrow codegen'd cell assignment and ONE window shuffle on ≤
    * nCells keys. Output keeps the assignment as `cell`.
    */
  def clusterBalancedCap(df: DataFrame, idCol: String, vecCol: String,
                         perCluster: Int, nCells: Int = 16,
                         trainIters: Int = 2): DataFrame = {
    require(perCluster > 0, s"perCluster must be positive: $perCluster")
    import graft.functions.HashFunctions.nearestCentroids
    import org.apache.spark.sql.expressions.Window
    val centroids = Similarity.kmeansCentroids(df, idCol, vecCol,
      nCells, trainIters)
    val asD = df(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val w = Window.partitionBy(col("cell")).orderBy(col(idCol))
    df.withColumn("cell",
        element_at(nearestCentroids(asD, centroids, 1), 1))
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= perCluster)
      .drop("__rnk")
  }
}
