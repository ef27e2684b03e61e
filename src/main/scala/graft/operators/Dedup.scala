package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines, at 100 TB
  * posture:
  *
  *  - exact: hash-groupBy on a content fingerprint — one shuffle on the
  *    (high-cardinality, skew-free) hash key; partial aggregation does
  *    the heavy lifting map-side.
  *  - MinHash + LSH: shingle → k-minhash signature → b bands; docs
  *    sharing a band bucket are candidates; candidates verified with
  *    true Jaccard. Cost is linear in corpus size + quadratic only
  *    within buckets, with an explicit bucket-size cap so a degenerate
  *    key (boilerplate, empty docs) cannot produce an O(n²) bucket.
  *  - SimHash: 64-bit signature, banded into 16-bit chunks for
  *    candidate generation, verified by Hamming distance.
  *
  * Signature computation is native Catalyst expressions (no UDFs —
  * [[graft.functions.MinHashSig]] / [[graft.functions.SimHash64]] with
  * codegen) running inside whole-stage codegen on the scan, and only
  * (id, band-key) pairs — never document text or shingle sets — flow
  * through the candidate-generation shuffles.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical content. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup applied to the corpus: the surviving rows (smallest id
    * per identical content, all columns kept). One window shuffle on
    * the content hash — no join back. */
  def exactCorpus(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Drop near-duplicates given a candidate pair list: any doc that
    * pairs with a smaller id is removed, keeping the smallest id of
    * each duplicate cluster reachable by id-descending edges (greedy
    * representative selection — one anti-join, no transitive closure;
    * a doc chained A<B<C loses B and C because both pair with a
    * smaller id once LSH finds the pairs). */
  def dropNearDups(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame =
    docs.join(pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Duplicate clusters as connected components of the candidate-pair
    * graph: min-label propagation to fixpoint. Returns (id, cluster) —
    * cluster = the smallest id reachable through any chain of pairs,
    * so A–B + B–C yields one cluster {A,B,C} even though A and C never
    * paired directly (the case [[dropNearDups]]'s greedy pass cannot
    * see when edges skip the minimum).
    *
    * Scale: each iteration is a propagate equi-join + a
    * pointer-jumping compression self-join + a min-agg; compression
    * halves remaining path lengths per round, so iterations needed =
    * O(log diameter) — a 1000-deep chain converges in ~10 rounds, not
    * 1000. Lineage is truncated with localCheckpoint every 3 rounds so
    * adversarial graphs can't blow up the plan DAG.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 50,
                        collectLimit: Long = 1L << 20): DataFrame = {
    // Small-graph fast path (the Percentiles small-group discipline):
    // the PAIR GRAPH after candidate generation is orders of magnitude
    // smaller than the corpus — near-dup graphs of even a 100 TB
    // corpus routinely fit in a few million edges. Under
    // `collectLimit` edges, a driver union–find (min-id
    // representative, path compression + union-by-min) answers in
    // milliseconds what the iterative join loop pays many scheduled
    // rounds for; distributed semantics are identical (connected
    // components are unique) and spec-pinned against the loop.
    //
    // ONE bounded PARALLEL job both routes AND fetches:
    // `limit(cap+1).collect()` runs take-style jobs over
    // geometrically-growing partition batches (1, 4, 16, rest — never
    // one job per partition, so the possibly-expensive upstream pair
    // generation keeps its parallelism), returns at most
    // collectLimit+1 edge rows (driver-safe: ≤2^20+1 two-column rows
    // at the default cap), and an overflowing probe (cap+1 rows came
    // back) reroutes to the distributed loop with the scanned
    // partitions already in the cache. Long ids (the common case) use
    // an open-addressed primitive parent table (~34 B/entry peak:
    // ~70 MB transient at the default cap's ≤ 2^21 ids); other id
    // types pay boxed HashMap entries (~3×) — size collectLimit to
    // the driver accordingly. collectLimit = 0 forces the distributed
    // loop.
    //
    // null ids never join in the distributed loop (equi-join
    // semantics); filter them here so BOTH paths agree
    val slim = pairs.select(col("id_a"), col("id_b"))
      .filter(col("id_a").isNotNull && col("id_b").isNotNull)
      .cache()
    val idType = slim.schema("id_a").dataType
    if (collectLimit > 0 && collectLimit < Int.MaxValue) {
      val probe = slim.limit(collectLimit.toInt + 1).collect()
      if (probe.length <= collectLimit) {
        val out =
          if (idType == org.apache.spark.sql.types.LongType)
            longUnionFindRows(probe)
          else anyUnionFindRows(probe)
        val spark = pairs.sparkSession
        slim.unpersist()
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType, nullable = false),
          org.apache.spark.sql.types.StructField("cluster", idType, nullable = false)))
        return spark.createDataFrame(
          spark.sparkContext.parallelize(out, 1), schema)
      }
      // overflow: the O(log diameter) loop takes over
    }
    // undirected edge list, both orientations — cached: every
    // iteration joins against it, and without the cache each round
    // would re-run the (possibly expensive) candidate-pair lineage
    // upstream, e.g. the quadratic jaccard scorer
    val edges = slim.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(slim.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    val vertices = edges.select(col("src").as("id")).distinct()
    // label frames are (id, cluster) over only the docs that HAVE a
    // duplicate — tiny next to the corpus — so caching each round is
    // cheap and keeps the iteration cost flat instead of re-deriving
    // the whole chain per fixpoint check
    var labels = vertices.withColumn("cluster", col("id")).cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each vertex adopts the min of its own label and its neighbors'
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "src")
          .withColumnRenamed("cluster", "src_cluster"), Seq("src"))
        .select(col("dst").as("id"), col("src_cluster").as("cand"))
      val propagated = labels.join(neighborLabels, Seq("id"), "left")
        .groupBy("id")
        .agg(least(min(col("cand")), first(col("cluster"))).as("cluster"))
      // pointer-jumping path compression: each vertex ALSO adopts its
      // label's label. Every label value is itself a vertex id (the
      // invariant since initialization), so one more equi-join halves
      // remaining path lengths — convergence drops from O(diameter)
      // to O(log diameter) rounds, which is what makes deep
      // components (chained near-dups, digit-flip name cliques)
      // affordable: round count, not round cost, dominates the loop.
      val parentOf = propagated
        .select(col("id").as("cluster"), col("cluster").as("parent"))
      val next = propagated.join(parentOf, Seq("cluster"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("parent"), col("cluster")))
            .as("cluster"))
        .cache()
      // fixpoint test: any label still shrinking? A FULL count (no
      // limit) so every partition of `next` materializes into its
      // cache before the parent cache is released — a short-circuited
      // probe would leave partitions to recompute through the whole
      // unpersisted lineage chain next round.
      val changed = next.as("n").join(labels.as("l"), Seq("id"))
        .filter(col("n.cluster") =!= col("l.cluster")).count()
      labels.unpersist()
      // caching bounds recompute but not lineage: each round's plan
      // references the previous round's THREE times (propagate join,
      // compression self-join, fixpoint probe), so the logical tree
      // grows geometrically — localCheckpoint every 3 rounds truncates
      // it to the materialized partitions (cheap — `next` is already
      // cached by the fixpoint probe above), capping the tree at ~3^3
      // copies.
      labels =
        if ((i + 1) % 3 == 0) {
          val cp = next.localCheckpoint(true)
          next.unpersist()
          cp
        } else next
      converged = changed == 0
      i += 1
    }
    edges.unpersist() // labels is materialized; the edge cache is done
    slim.unpersist()
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"duplicateClusters did not converge in $maxIter iterations " +
          "(pair-graph diameter exceeds maxIter); raise maxIter")
    }
    // NOTE: the returned frame is cached (it was materialized by the
    // fixpoint probes); callers that are done with it may unpersist().
    // On a checkpoint round the frame is localCheckpoint-backed
    // instead: unpersist() is a harmless no-op there and the blocks
    // are reclaimed by the ContextCleaner once the frame is
    // dereferenced — same applies to the intermediate checkpoints the
    // loop drops on reassignment.
    labels
  }

  /** Minimal open-addressed long→long hash map (linear probing,
    * power-of-two capacity, ≤ 0.5 load): the union–find parent table
    * for long ids — two flat arrays + a bitset, ~34 bytes/entry at
    * peak, zero per-op allocation, vs ~100+ bytes and a Long box per
    * entry in java.util.HashMap. */
  private final class LongParentMap(expected: Int) {
    private var cap = { var c = 32; while (c < expected * 2) c <<= 1; c }
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var used = new java.util.BitSet(cap)
    private var n = 0
    private def idx(k: Long): Int = {
      val h = k * -7046029254386353131L // Stafford mix step
      var i = (h ^ (h >>> 32)).toInt & (cap - 1)
      while (used.get(i) && keys(i) != k) i = (i + 1) & (cap - 1)
      i
    }
    def contains(k: Long): Boolean = used.get(idx(k))
    def get(k: Long): Long = vals(idx(k))
    def put(k: Long, v: Long): Unit = {
      var i = idx(k)
      if (!used.get(i)) {
        // grow ONLY when actually inserting a new key — a value-only
        // update (path compression) must never rehash, or foreachKey's
        // iteration invariant breaks mid-walk (duplicate/missing rows)
        if ((n + 1) * 2 > cap) { grow(); i = idx(k) }
        used.set(i); keys(i) = k; n += 1
      }
      vals(i) = v
    }
    private def grow(): Unit = {
      val (ok, ov, ou, oc) = (keys, vals, used, cap)
      cap <<= 1
      keys = new Array[Long](cap)
      vals = new Array[Long](cap)
      used = new java.util.BitSet(cap)
      n = 0
      var i = 0
      while (i < oc) { if (ou.get(i)) put(ok(i), ov(i)); i += 1 }
    }
    /** Iterate entries; safe under value-only updates (path
      * compression rewrites parents of EXISTING keys — no rehash). */
    def foreachKey(f: Long => Unit): Unit = {
      var i = 0
      while (i < cap) { if (used.get(i)) f(keys(i)); i += 1 }
    }
    def size: Int = n
  }

  /** Driver union–find over collected long-id edge rows (the caller's
    * bounded `limit(cap+1)` probe guarantees the array is small). */
  private def longUnionFindRows(
      edges: Array[org.apache.spark.sql.Row]): Seq[org.apache.spark.sql.Row] = {
    val parent = new LongParentMap(1 << 12)
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
      r
    }
    var i = 0
    while (i < edges.length) {
      val row = edges(i)
      i += 1
      val a = row.getLong(0)
      val b = row.getLong(1)
      if (!parent.contains(a)) parent.put(a, a)
      if (!parent.contains(b)) parent.put(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](parent.size)
    parent.foreachKey(id => out += org.apache.spark.sql.Row(id, find(id)))
    out.toSeq
  }

  /** The boxed twin of [[longUnionFindRows]] for non-long id types. */
  private def anyUnionFindRows(
      edges: Array[org.apache.spark.sql.Row]): Seq[org.apache.spark.sql.Row] = {
    val parent = new java.util.HashMap[Any, Any]()
    // String order must match Spark's least()/min() — UTF-8 BINARY
    // order, which differs from java.lang.String's UTF-16 compareTo
    // for supplementary characters — or the two paths could pick
    // different cluster representatives for the same graph
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String) =>
        java.util.Arrays.compareUnsigned(
          x.getBytes("UTF-8"), y.getBytes("UTF-8")) < 0
      case _ => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    }
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
      r
    }
    var i = 0
    while (i < edges.length) {
      val row = edges(i)
      i += 1
      val (a, b) = (row.get(0), row.get(1))
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](parent.size)
    parent.keySet().forEach(id => out += org.apache.spark.sql.Row(id, find(id)))
    out.toSeq
  }

  /** Corpus minus transitive near-duplicates: keep each cluster's
    * smallest id (and every unclustered doc). The exhaustive sibling
    * of [[dropNearDups]], built on [[duplicateClusters]]. */
  def dropNearDupsTransitive(docs: DataFrame, pairs: DataFrame,
                             idCol: String): DataFrame = {
    val losers = duplicateClusters(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Distinct word n-gram shingles of the token stream; a doc shorter
    * than n tokens contributes its whole token stream as one shingle.
    * Native expression ([[graft.functions.ShingleSet]]) — one codegen'd
    * call per row instead of a transform/slice/concat_ws tree that
    * re-slices the token array per shingle. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.HashFunctions.shingleSet(TextFunctions.tokens(text), n)

  /** k-permutation MinHash signature: element j = min over shingles of
    * xxhash64(shingle, seed = j). Native Catalyst expression
    * ([[graft.functions.MinHashSig]]) — the equivalent higher-order-
    * function formulation costs ~75 s on sf0.1 documents; the imperative
    * loop is sub-second and stays inside whole-stage codegen. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    graft.functions.HashFunctions.minhashSig(shingleCol, k)

  /** Candidate pairs via banded LSH over the MinHash signature, then
    * exact-Jaccard verification over distinct shingle sets.
    *
    * @param maxBucket skew guard: buckets larger than this are dropped
    *                  (a bucket of size m contributes m(m-1)/2 pairs; a
    *                  degenerate key would otherwise dominate the job).
    */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          shingleSize: Int = 3, k: Int = 20, bands: Int = 5,
                          threshold: Double = 0.5,
                          maxBucket: Int = 1000): DataFrame = {
    val withSh = shingleStore(docs, idCol, textCol, shingleSize)

    // band i = hash of its signature slice → (doc_id, band_idx, band_key).
    // Only these slim triples enter the candidate-generation shuffles;
    // the shingle sets are joined back by id for verification only.
    // SHARED formula with the persistent index ([[minhashBandKeys]]) —
    // index build and probe must stay bit-identical forever.
    val banded = minhashBandKeys(docs, idCol, textCol, shingleSize, k, bands)

    // skew guard: drop degenerate buckets before the self-join
    val bucketSizes = banded.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucket))
    val inBuckets = banded.join(bucketSizes, Seq("band_idx", "band_key"))

    val a = inBuckets.select(col("band_idx"), col("band_key"),
      col("doc_id").as("id_a"))
    val b = inBuckets.select(col("band_idx"), col("band_key"),
      col("doc_id").as("id_b"))
    val candidates = a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .join(withSh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(withSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Slim banded LSH keys of a corpus — the PERSISTENT index of
    * incremental dedup: `(doc_id, band_idx, band_key)` triples,
    * computed ONCE over the (100 TB) corpus, written to a store
    * (bucket by band_key for shuffle-free probes), and probed by every
    * subsequent batch via [[incrementalNearDupPairs]]. Parameters must
    * match between index build and probe. */
  def minhashBandKeys(docs: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int = 3, k: Int = 20,
                      bands: Int = 5): DataFrame = {
    val rows = k / bands
    docs.select(col(idCol).as("doc_id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")
  }

  /** `(doc_id, sh)` distinct-shingle store — the index's verification
    * companion (candidates join their shingle rows by id; the corpus
    * text itself is never rescanned). */
  def shingleStore(docs: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), shingleSize).as("sh"))

  /** Persist the minhash LSH index as BUCKETED catalog tables —
    * `<name>_bands` (doc_id, band_idx, band_key) bucketed by
    * (band_idx, band_key) — the exact probe join key, so Spark's
    * co-partitioning check accepts the buckets verbatim (subset-key
    * reuse is off by default via requireAllClusterKeysForCoPartition)
    * — and `<name>_shingles` (doc_id, sh) bucketed by doc_id.
    * Realizes the design note above: probes against the (100 TB-side)
    * index reuse the on-disk bucketing, so the corpus side of
    * candidate generation and verification joins without reshuffling
    * (pinned by a ScaleSpec one-exchange plan assertion). Parameters
    * must match between build, append, and probe. */
  def saveMinhashIndex(docs: DataFrame, idCol: String, textCol: String,
                       name: String, shingleSize: Int = 3, k: Int = 20,
                       bands: Int = 5, buckets: Int = 8): Unit = {
    // shingles FIRST: a failure between the two writes then leaves
    // orphan shingle rows (never candidates — harmless), where the
    // reverse order would leave band keys with no shingle rows and
    // the verification join would silently drop every pair those docs
    // generate — near-copies accepted forever with no error
    graft.sources.BucketedStore.writeBucketed(
      shingleStore(docs, idCol, textCol, shingleSize),
      s"${name}_shingles", Seq("doc_id"), buckets)
    graft.sources.BucketedStore.writeBucketed(
      minhashBandKeys(docs, idCol, textCol, shingleSize, k, bands),
      s"${name}_bands", Seq("band_idx", "band_key"), buckets)
  }

  /** Append a BATCH into the persisted minhash index: band keys and
    * shingle rows computed from the batch alone (the corpus is never
    * rescanned — band-key formula shared with the build, so probe and
    * index stay bit-identical), bucket-appended so post-append probes
    * remain shuffle-free. Disjoint-id contract as everywhere in
    * incremental dedup. */
  def appendToMinhashIndex(batch: DataFrame, idCol: String, textCol: String,
                           name: String, shingleSize: Int = 3, k: Int = 20,
                           bands: Int = 5, buckets: Int = 8): Unit = {
    // shingles first — same fail-safe ordering rationale as
    // [[saveMinhashIndex]]
    graft.sources.BucketedStore.appendBucketed(
      shingleStore(batch, idCol, textCol, shingleSize),
      s"${name}_shingles", Seq("doc_id"), buckets)
    graft.sources.BucketedStore.appendBucketed(
      minhashBandKeys(batch, idCol, textCol, shingleSize, k, bands),
      s"${name}_bands", Seq("band_idx", "band_key"), buckets)
  }

  /** [[incrementalNearDupPairs]] against the PERSISTED index tables
    * written by [[saveMinhashIndex]]/[[appendToMinhashIndex]]. */
  def incrementalNearDupPairsPersisted(spark: org.apache.spark.sql.SparkSession,
                                       name: String, newDocs: DataFrame,
                                       idCol: String, textCol: String,
                                       shingleSize: Int = 3, k: Int = 20,
                                       bands: Int = 5, threshold: Double = 0.5,
                                       maxBucket: Int = 1000): DataFrame =
    incrementalNearDupPairs(spark.table(s"${name}_bands"),
      spark.table(s"${name}_shingles"), newDocs, idCol, textCol,
      shingleSize, k, bands, threshold, maxBucket)

  /** The CONTINUOUS-dedup ingest step, composed end to end — what a
    * production pipeline runs per arriving batch:
    *
    *  1. batch-internal near-dups dropped ([[minhashNearDupPairs]] on
    *     the batch alone + [[dropNearDups]] — smallest id survives);
    *  2. survivors probe the PERSISTED index
    *     ([[incrementalNearDupPairsPersisted]] — corpus never
    *     rescanned, cost scales with the batch);
    *  3. docs matching the corpus are dropped;
    *  4. the remaining novel docs are APPENDED to the index
    *     ([[appendToMinhashIndex]]), so the NEXT batch dedups against
    *     them too.
    *
    * Returns the accepted (novel) docs. Steps 1–3 are lazy dataflow;
    * step 4 materializes it once (the append job is the action).
    * Disjoint-id contract as everywhere in incremental dedup. */
  def ingestDedupBatch(spark: org.apache.spark.sql.SparkSession, name: String,
                       batch: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int = 3, k: Int = 20, bands: Int = 5,
                       threshold: Double = 0.5, maxBucket: Int = 1000,
                       buckets: Int = 8): DataFrame = {
    val internal = minhashNearDupPairs(batch, idCol, textCol,
      shingleSize, k, bands, threshold, maxBucket)
    val batchClean = dropNearDups(batch, internal, idCol)
    val corpusPairs = incrementalNearDupPairsPersisted(spark, name,
      batchClean, idCol, textCol, shingleSize, k, bands, threshold, maxBucket)
    val dupIds = corpusPairs.select(col("new_id")).distinct()
    // cached: the accept-plan (incl. the index probe) feeds the two
    // append writes AND the caller's action — once, not three times.
    // Batch-sized by construction; caller unpersists when done.
    val novel = batchClean.join(dupIds,
      batchClean(idCol) === dupIds("new_id"), "left_anti").persist()
    try appendToMinhashIndex(novel, idCol, textCol, name,
      shingleSize, k, bands, buckets)
    catch { case e: Throwable => novel.unpersist(); throw e }
    novel
  }

  /** Near-dup pairs of a NEW batch against an indexed corpus — the
    * production shape of continuous dedup: the corpus contributes only
    * its prebuilt band keys (candidate generation) and the candidates'
    * shingle rows (verification); its text is never rescanned and it
    * never self-joins. Cost scales with the BATCH, not the corpus.
    * Returns `(new_id, corpus_id, jaccard)`. Batch-internal duplicates
    * are [[minhashNearDupPairs]]'s job on the batch alone.
    *
    * CONTRACT: batch and corpus id spaces must be DISJOINT — a batch
    * row reusing a corpus id is an update/re-ingest, not a duplicate,
    * and its self-pair is filtered out.
    *
    * @param indexBands     [[minhashBandKeys]] of the corpus (same
    *                       shingleSize/k/bands as passed here)
    * @param corpusShingles [[shingleStore]] of the corpus
    */
  def incrementalNearDupPairs(indexBands: DataFrame, corpusShingles: DataFrame,
                              newDocs: DataFrame, idCol: String, textCol: String,
                              shingleSize: Int = 3, k: Int = 20, bands: Int = 5,
                              threshold: Double = 0.5,
                              maxBucket: Int = 1000): DataFrame = {
    val newBands = minhashBandKeys(newDocs, idCol, textCol, shingleSize, k, bands)
      .select(col("band_idx"), col("band_key"), col("doc_id").as("new_id"))
    // restrict the index to the buckets the batch actually probes
    // BEFORE any aggregation — "cost scales with the batch" must hold
    // for the skew guard too, not just the join (a full-index groupBy
    // per batch would rescan the 100 TB side's keys every increment)
    val probedKeys = newBands.select("band_idx", "band_key").distinct()
    val probedIndex = indexBands.join(broadcast(probedKeys),
      Seq("band_idx", "band_key"))
    val bucketSizes = probedIndex.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucket)
    val okIndex = probedIndex.join(bucketSizes, Seq("band_idx", "band_key"))
      .select(col("band_idx"), col("band_key"), col("doc_id").as("corpus_id"))
    val candidates = newBands.join(okIndex, Seq("band_idx", "band_key"))
      .filter(col("new_id") =!= col("corpus_id"))
      .select("new_id", "corpus_id")
      .dropDuplicates("new_id", "corpus_id")
    val newSh = shingleStore(newDocs, idCol, textCol, shingleSize)
      .select(col("doc_id").as("new_id"), col("sh").as("sh_new"))
    candidates
      .join(newSh, "new_id")
      .join(corpusShingles.select(col("doc_id").as("corpus_id"),
        col("sh").as("sh_corpus")), "corpus_id")
      .withColumn("jaccard",
        size(array_intersect(col("sh_new"), col("sh_corpus"))).cast("double") /
          size(array_union(col("sh_new"), col("sh_corpus"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
  }

  /** Derive banded-LSH parameters from a Jaccard threshold so the
    * per-pair candidate recall AT the threshold meets a stated floor —
    * for the decontamination screen, whose false negatives are safety
    * failures, never a tuning detail. With r rows per band and b
    * bands, a pair at similarity J collides with probability
    * 1 − (1 − J^r)^b; this picks the LARGEST r (sharpest S-curve,
    * fewest false candidates to verify) whose required
    * b = ⌈ln(1−ρ) / ln(1−t^r)⌉ keeps the signature k = r·b within
    * `kMax`. Thresholds too low to reach the floor even at r = 1
    * within kMax are REFUSED (the screen would silently under-recall —
    * exactly the failure this function exists to prevent).
    *
    * @return (k, bands) with k = r·b exactly divisible */
  def lshBandingFor(threshold: Double, targetRecall: Double = 0.95,
                    kMax: Int = 64): (Int, Int) = {
    require(threshold > 0 && threshold <= 1,
      s"threshold in (0,1], got $threshold")
    require(targetRecall > 0 && targetRecall < 1,
      s"targetRecall in (0,1), got $targetRecall")
    require(kMax >= 1, s"kMax must be >= 1, got $kMax")
    val need = math.log1p(-targetRecall) // ln(1−ρ) < 0
    var r = math.min(8, kMax)
    while (r >= 1) {
      val p = math.pow(threshold, r) // per-band collision at J = t
      // band count as a DOUBLE until the bound check — tiny p makes
      // the required b astronomically large, and a saturated toInt
      // would wrap r·b past kMax
      val b =
        if (p >= 1.0) 1.0
        else math.ceil(need / math.log1p(-p))
      if (r * b <= kMax) return (r * b.toInt, b.toInt)
      r -= 1
    }
    val minT = 1.0 - math.exp(need / kMax) // r = 1, b = kMax bound
    throw new IllegalArgumentException(
      f"no (rows, bands) with k <= $kMax reaches recall $targetRecall " +
        f"at J = $threshold — the banded screen would silently miss " +
        f"contamination; minimum supportable threshold is ~$minT%.3f " +
        "(raise the threshold, targetRecall down, or kMax up)")
  }

  /** Fuzzy decontamination: drop corpus documents whose shingle-set
    * Jaccard with ANY eval document reaches `threshold` — the near-dup
    * generalization of the exact decontaminate step (an eval question
    * that leaked with light edits survives an exact n-gram screen;
    * it does not survive this one).
    *
    * Banding is derived from `threshold` by default
    * ([[lshBandingFor]]: candidate recall ≥ 0.95 for any pair AT the
    * threshold, higher above it) — a fixed (k, bands) would silently
    * under-recall at low thresholds, a false negative in a safety
    * step. Pass explicit k AND bands to override (k % bands == 0).
    *
    * Scale shape: the eval set (small by contract — benchmarks are
    * KBs–MBs, the corpus is the 100 TB side) plays the index role. Its
    * banded keys BROADCAST against the corpus band stream, so the
    * corpus crosses one shuffle-free semi-restriction; only colliding
    * (corpus_id, eval_id) candidates verify on shingle sets, and the
    * corpus is filtered by ONE anti join. No cross pairs anywhere.
    *
    * Unlike the incremental-dedup probe there is NO disjoint-id
    * contract: ids are namespaced per side, so an eval row may share
    * an id value with an unrelated corpus row.
    *
    * @return the surviving corpus rows (all columns) */
  def fuzzyDecontaminate(corpus: DataFrame, idCol: String, textCol: String,
                         evalDocs: DataFrame, evalIdCol: String,
                         evalTextCol: String, shingleSize: Int = 3,
                         k: Int = 0, bands: Int = 0,
                         threshold: Double = 0.8,
                         maxBucket: Int = 1000): DataFrame = {
    require((k > 0) == (bands > 0),
      "override k and bands together, or neither (derived)")
    val (kk, bb) =
      if (k > 0) { require(k % bands == 0, "k must divide into bands"); (k, bands) }
      else lshBandingFor(threshold)
    val corpusBands = minhashBandKeys(corpus, idCol, textCol,
      shingleSize, kk, bb)
    val evalBands = minhashBandKeys(evalDocs, evalIdCol, evalTextCol,
        shingleSize, kk, bb)
      .select(col("band_idx"), col("band_key"), col("doc_id").as("eval_id"))
    // skew guard on the eval buckets: a degenerate eval band key (e.g.
    // hundreds of near-identical prompts) would fan every colliding
    // corpus doc out maxBucket-fold. Unlike the dedup family — where a
    // dropped bucket only costs dedup ratio — dropping here would
    // EXEMPT those eval docs from the contamination screen, so an
    // oversized bucket fails loud instead (raise maxBucket, or dedup
    // the eval set first).
    val oversized = evalBands.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
      .limit(1).collect()
    if (oversized.nonEmpty)
      throw new IllegalArgumentException(
        s"fuzzyDecontaminate: an eval band bucket holds " +
          s"${oversized(0).getLong(2)} docs (> maxBucket=$maxBucket); " +
          "silently skipping them would exempt those eval docs from " +
          "the screen — raise maxBucket or dedup the eval set")
    val candidates = corpusBands.join(broadcast(evalBands),
        Seq("band_idx", "band_key"))
      .select(col("doc_id"), col("eval_id"))
      .dropDuplicates("doc_id", "eval_id")
    val corpusSh = shingleStore(corpus, idCol, textCol, shingleSize)
    val evalSh = shingleStore(evalDocs, evalIdCol, evalTextCol, shingleSize)
      .select(col("doc_id").as("eval_id"), col("sh").as("sh_eval"))
    val contaminated = candidates
      .join(corpusSh, "doc_id")
      .join(broadcast(evalSh), "eval_id")
      .withColumn("jaccard",
        size(array_intersect(col("sh"), col("sh_eval"))).cast("double") /
          size(array_union(col("sh"), col("sh_eval"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id")).distinct()
    corpus.join(contaminated,
      corpus(idCol) === contaminated("doc_id"), "left_anti")
  }

  /** 64-bit SimHash of the token stream: per-bit majority vote over
    * xxhash64(token) (seed 42, matching the built-in). Native Catalyst
    * expression ([[graft.functions.SimHash64]]) — the HOF vote
    * formulation (aggregate over 64-element arrays) costs ~39 s on
    * sf0.1 documents; the imperative loop is sub-second. */
  def simhash(text: Column): Column =
    graft.functions.HashFunctions.simhash64(TextFunctions.tokens(text))

  /** SimHash near-dup pairs: 4×16-bit bands generate candidates (any
    * pair within Hamming distance 3 of each other shares at least one
    * exact 16-bit band by pigeonhole), verified by bit_count(xor). */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3,
                          maxBucket: Int = 1000): DataFrame =
    hammingBandPairs(docs.select(col(idCol).as("doc_id"),
      simhash(col(textCol)).as("sig")), maxHamming, maxBucket)

  /** Banded Hamming-neighbor join over ANY 64-bit signature column —
    * the candidate machinery [[simhashNearDupPairs]] uses, shared with
    * the perceptual-image-hash pairing
    * ([[Multimodal.phashNearDupPairs]]): 4×16-bit bands generate
    * candidates (pigeonhole: Hamming ≤ 3 ⇒ at least one band agrees
    * exactly), oversized buckets dropped (a degenerate all-same band
    * would otherwise go quadratic), then exact bit_count(xor)
    * verification. Input must be (doc_id, sig: LONG). */
  def hammingBandPairs(withSig: DataFrame, maxHamming: Int = 3,
                       maxBucket: Int = 1000): DataFrame = {
    val banded = withSig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")

    val bucketSizes = banded.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucket))
    val inBuckets = banded.join(bucketSizes, Seq("band_idx", "band_key"))

    val a = inBuckets.select(col("band_idx"), col("band_key"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = inBuckets.select(col("band_idx"), col("band_key"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Token-window duplication stats — the scale-friendly stand-in for
    * suffix-array substring dedup (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better"): slide windows of
    * `windowSize` tokens at `stride` over each document; a window that
    * appears verbatim in ≥2 documents marks duplicated text. Returns
    * per-doc (n_windows, n_dup_windows, dup_frac); docs shorter than
    * one window have no windows and are omitted (nothing to score).
    *
    * Scale shape: ONE corpus scan, three slim shuffles, no self-join —
    * per-(doc, window) combine (map-side, skew-free key), a COUNT
    * window over the window key (aggregation state is a single count,
    * never a collected doc list), and the doc-id rollup. Skew caveat:
    * WindowExec still sorts-and-buffers each window-key partition, so
    * a boilerplate window present in millions of docs degrades to a
    * disk spill on that key (not an OOM); if that population is known
    * to exist, strip boilerplate first (see the boilerplate_sentences
    * pipeline). At 100 TB swap the shuffled key to a 128-bit hash of
    * the window (same plan, slimmer rows) — raw strings kept here so
    * the DuckDB oracle matches byte-for-byte with no cross-engine hash
    * parity.
    */
  def windowDupStats(docs: DataFrame, idCol: String, textCol: String,
                     windowSize: Int = 8, stride: Int = 4): DataFrame = {
    require(windowSize > 0 && stride > 0, "windowSize/stride must be positive")
    val wins = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= windowSize)
      .select(col(idCol), explode(expr(
        s"""transform(sequence(0, size(__toks) - $windowSize, $stride),
           |          i -> array_join(slice(__toks, i + 1, $windowSize), ' '))"""
          .stripMargin)).as("__win"))
    // one row per (doc, window) with its in-doc multiplicity; a COUNT
    // over the window key then IS the distinct-doc count
    val perDocWin = wins.groupBy(col(idCol), col("__win"))
      .agg(count(lit(1)).as("__n_occ"))
    val nDocs = count(lit(1)).over(Window.partitionBy(col("__win")))
    perDocWin.withColumn("__n_docs", nDocs)
      .groupBy(col(idCol))
      .agg(sum(col("__n_occ")).as("n_windows"),
        sum(when(col("__n_docs") >= 2, col("__n_occ")).otherwise(lit(0L)))
          .as("n_dup_windows"))
      .withColumn("dup_frac",
        col("n_dup_windows").cast("double") / col("n_windows"))
  }

  /** Cross-document duplicated-span REMOVAL — the actionable upgrade
    * of [[windowDupStats]] (which only measures): every token covered
    * by a `windowSize`-token window that also appears in a SMALLER
    * doc_id is dropped; the smallest doc keeps its text (exact-
    * substring dedup à la Lee et al. "Deduplicating Training Data",
    * with fixed windows standing in for the suffix array). In-doc
    * repetition is untouched — only cross-document sharing removes.
    *
    * Returns `(doc_id, clean_text, n_tokens, n_removed)`; docs with
    * zero tokens are dropped (both engines agree — the oracle mirrors
    * this). A NULL id fails loud (see the guard comment in the body) —
    * assign surrogate ids upstream.
    *
    * Scale shape — ONE corpus scan, TWO shuffles, NO joins:
    *  1. one explode to token rows `(doc, i, tok, whash)` where
    *     `whash` hashes the window STARTING at i (the window string
    *     exists only inside the codegen'd stage; a 64-bit hash crosses
    *     the shuffle, never w-token strings — collisions only
    *     over-remove, at ~2^-64 per pair);
    *  2. min-doc per window via a window function over the whash
    *     partition (never a join-back). Tail positions (no full
    *     window starts there) must NOT pile into one corpus-scale
    *     null partition, and branching them around the shuffle would
    *     re-derive the explode from a second corpus scan (exchange
    *     reuse does not fire across such branches) — instead they get
    *     structurally-disjoint SINGLETON partition keys
    *     `(isNull, doc, i)`, where real windows share
    *     `(false, whash, 0)`: one lineage, one scan, a singleton's
    *     min(doc) is its own doc so the flag is naturally false;
    *  3. a per-doc ordered window (`rows [-(w-1), 0]` max) turns
    *     dup-start flags into covered-token flags, and the groupBy on
    *     the SAME doc key reassembles the kept tokens (one exchange,
    *     reused). */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            windowSize: Int = 8): DataFrame = {
    require(windowSize > 0, "windowSize must be positive")
    val w = windowSize
    // a NULL id is refused LOUDLY, in-lineage (no extra scan, no plan
    // change): it can neither own a span (min() ignores NULLs) nor be
    // marked a duplicate, and letting it through would either silently
    // EMPTY the doc's clean_text (the bare NULL comparison riding
    // max() into __cov) or — under SQL GROUP BY semantics — merge
    // every NULL doc into one group whose reassembly interleaves their
    // tokens into garbage. Routing them around instead would cost a
    // second corpus scan on every call to serve a branch that a sane
    // corpus leaves empty. The remedy belongs upstream.
    val toks = docs.select(
      when(col(idCol).isNull, raise_error(lit(
          s"removeDuplicatedSpans: NULL document id in '$idCol' — " +
            "assign surrogate ids upstream; a NULL can neither own a " +
            "span nor be deduplicated")))
        .otherwise(col(idCol)).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val rows = toks
      .select(col("doc_id"), posexplode(expr(
        s"""IF(size(__toks) = 0, array(),
           |   transform(sequence(0, size(__toks) - 1), i -> named_struct(
           |     'tok', __toks[i],
           |     'whash', IF(i <= size(__toks) - $w,
           |       xxhash64(array_join(slice(__toks, i + 1, $w), ' ')),
           |       CAST(NULL AS BIGINT)))))""".stripMargin)))
      .select(col("doc_id"), col("pos").as("__i"),
        col("col.tok").as("__tok"), col("col.whash").as("__whash"))
    val winW = Window.partitionBy(
      col("__whash").isNull,
      coalesce(col("__whash"), col("doc_id")),
      when(col("__whash").isNull, col("__i")).otherwise(lit(0L)))
    val coverW = Window.partitionBy(col("doc_id")).orderBy(col("__i"))
      .rowsBetween(-(w - 1), 0)
    rows
      // NULL-free by construction (the raise_error guard above), so
      // the min-id comparison can never ride a NULL through max() into
      // __cov — which would silently empty the document's clean_text
      .withColumn("__dupstart",
        (min(col("doc_id")).over(winW) < col("doc_id")).cast("int"))
      .withColumn("__cov", max(col("__dupstart")).over(coverW))
      .groupBy(col("doc_id"))
      .agg(
        expr("""array_join(transform(array_sort(collect_list(
                |  IF(__cov = 0, named_struct('i', __i, 't', __tok), NULL))),
                |  s -> s.t), ' ')""".stripMargin).as("clean_text"),
        count(lit(1)).as("n_tokens"),
        sum(col("__cov")).cast("long").as("n_removed"))
  }

  /** Exact pairwise n-gram Jaccard over a (sampled) corpus — the
    * brute-force oracle companion to [[minhashNearDupPairs]]. Quadratic:
    * only for bounded subsets / verification, never the 100 TB path. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3,
                        threshold: Double = 0.1): DataFrame = {
    val withSh = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), shingleSize).as("sh"))
    val a = withSh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Directed n-gram CONTAINMENT pairs — the asymmetric near-dup
    * signal Jaccard misses: a short document quoted wholesale inside a
    * long one has tiny Jaccard (the union is dominated by the long
    * doc) but containment ≈ 1 in the short→long direction. The
    * quote/partial-copy detector of corpus curation (Broder's
    * containment, the resemblance/containment split).
    *
    *   C(a→b) = |sh(a) ∩ sh(b)| / |sh(a)|   over df-capped shingles
    *
    * Scale shape — NEVER all-pairs: explode per-doc distinct shingles
    * (one scan), drop shingles appearing in more than `maxShingleDf`
    * documents (a boilerplate shingle in f docs would alone generate
    * f·(f−1) candidate pairs — the df cap bounds posting-list fanout,
    * the standard trick; it also removes exactly the shingles that
    * carry no copy signal), self-join the postings on the shingle (one
    * shingle-keyed shuffle; pairs arise ONLY from shared shingles),
    * count per ordered pair, divide by the left doc's cold-shingle
    * count. BOTH numerator and denominator use the df-capped shingle
    * set, so the ratio is a true containment over the informative
    * shingles; a doc whose every shingle is boilerplate has no cold
    * shingles and is excluded (no 0/0).
    *
    * Output is DIRECTED: (id_a, id_b, containment) with id_a ≠ id_b,
    * one row per direction that clears the threshold.
    *
    * @return (id_a, id_b, containment) — containment ≥ threshold */
  def ngramContainmentPairs(docs: DataFrame, idCol: String,
                            textCol: String, shingleSize: Int = 3,
                            threshold: Double = 0.5,
                            maxShingleDf: Int = 50): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(maxShingleDf >= 2,
      s"maxShingleDf must be >= 2 (pairs need a shared shingle to " +
        s"live in two docs), got $maxShingleDf")
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol), shingleSize)).as("sh"))
    // df-cap: inner join keeps only shingles cold enough to pair on.
    // MATERIALIZED once (r19, measured): `cold` feeds three consumers
    // (the denominator count, both sides of the pair self-join), and
    // because the df filter rides a BROADCAST join there is no
    // exchange boundary to reuse — without pinning, the whole
    // scan + tokenize + shingle-explode subtree re-executes per
    // consumer (the before-plan shows 6 Generate / 12 scans).
    // localCheckpoint (not persist) so the blocks are context-cleaned
    // when the frame is dereferenced (guide §5 caching note).
    val cold = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxShingleDf)
        .select("sh"),
      "sh")
      .localCheckpoint(true)
    val denom = cold.groupBy(col("doc_id").as("id_a"))
      .agg(count(lit(1)).as("n_sh"))
    val inter = cold.as("a")
      .join(cold.as("b"), Seq("sh"))
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter.join(denom, "id_a")
      .withColumn("containment",
        col("inter").cast("double") / col("n_sh").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }
}
