package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
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
  * Everything is `functions._` compositions (no UDFs): the signature
  * computation runs inside whole-stage codegen on the scan, and only
  * (id, signature) pairs — never document text — flow through the
  * candidate-generation shuffles.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical content. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles of the token stream; a doc shorter than n
    * tokens contributes its whole token stream as one shingle. */
  def shingles(text: Column, n: Int): Column = {
    val ts = TextFunctions.tokens(text)
    when(size(ts) < n, array(concat_ws(" ", ts)))
      .otherwise(transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
  }

  /** k-permutation MinHash signature: element j = min over shingles of
    * xxhash64(shingle, j). Seeding via an extra hashed column gives k
    * independent-enough permutations without any driver-side state. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingleCol, s => xxhash64(s, seed))))

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
    val rows = k / bands
    val withSig = docs.select(
      col(idCol).as("doc_id"),
      array_distinct(shingles(col(textCol), shingleSize)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))

    // band i = hash of its signature slice → (band_idx, band_key)
    val banded = withSig.select(
      col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")

    // skew guard: drop degenerate buckets before the self-join
    val bucketSizes = banded.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucket))
    val inBuckets = banded.join(bucketSizes, Seq("band_idx", "band_key"))

    val a = inBuckets.select(col("band_idx"), col("band_key"),
      col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = inBuckets.select(col("band_idx"), col("band_key"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash of the token stream. */
  def simhash(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text), t => xxhash64(t))
    // per-bit vote: +1 if the token hash has bit i set, else -1
    // (bit positions are compile-time constants → static shift amounts)
    val votes = aggregate(hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map(i =>
          when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1))
            .otherwise(lit(-1))): _*),
        (a, v) => a + v))
    // collapse votes to the signature: bit i set iff vote > 0. The bit
    // values are disjoint, so a sum assembles the pattern without any
    // column-amount shifts (and cannot overflow: it IS the 64-bit word).
    (0 until 64).map(i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** SimHash near-dup pairs: 4×16-bit bands generate candidates (any
    * pair within Hamming distance 3 of each other shares at least one
    * exact 16-bit band by pigeonhole), verified by bit_count(xor). */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3,
                          maxBucket: Int = 1000): DataFrame = {
    val withSig = docs.select(col(idCol).as("doc_id"),
      simhash(col(textCol)).as("sig"))
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

  /** Exact pairwise n-gram Jaccard over a (sampled) corpus — the
    * brute-force oracle companion to [[minhashNearDupPairs]]. Quadratic:
    * only for bounded subsets / verification, never the 100 TB path. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3,
                        threshold: Double = 0.1): DataFrame = {
    val withSh = docs.select(col(idCol).as("doc_id"),
      array_distinct(shingles(col(textCol), shingleSize)).as("sh"))
    val a = withSh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
