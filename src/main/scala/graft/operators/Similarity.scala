package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `Array[Float]` embedding
  * column.
  *
  *  - Brute-force cosine top-k: exact baseline. Query set is broadcast;
  *    the corpus — the 100 TB side — streams through one codegen'd
  *    stage (dot products via zip_with/aggregate), then a per-query
  *    top-k window. Cost O(|corpus|·|Q|·dim), no corpus shuffle except
  *    the final top-k on |Q| keys.
  *  - LSH (random hyperplane) bucketed variant: the scale path. Each
  *    vector gets a sign-bit bucket from h fixed hyperplanes; queries
  *    only score vectors in their bucket. Hyperplanes are generated
  *    from a fixed seed → fully deterministic, no fit/state.
  *    Recall/cost is tuned by the number of hyperplanes (bucket count
  *    ≈ 2^h); multi-probe can be added by flipping low-confidence bits.
  */
object Similarity {

  /** Cast float vector to double once; all arithmetic in double. */
  private def asDouble(v: Column): Column =
    v.cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine via the native [[graft.functions.CosineSim]] expression —
    * one codegen'd function call per row instead of three HOF
    * traversals; accumulation order matches the HOF/DuckDB left fold
    * bit-for-bit. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.HashFunctions.cosineSim(asDouble(a), asDouble(b))

  // ---- int8 vector quantization ------------------------------------
  // The 100 TB memory/IO lever: a float32 embedding column shrinks 4×
  // (plus the two per-vector doubles), which is the difference between
  // an IVF index that fits executor storage and one that doesn't.
  // Per-vector affine quantization (asymmetric min/max — the ONNX/
  // faiss SQ8 scheme): q_i = floor((v_i − zero)/scale + 0.5) in
  // [0, 255] stored as a long array (parquet encodes the small range
  // efficiently; Spark has no unsigned byte). Rounding is the explicit
  // floor(x+0.5) form — identical in every engine, unlike round()
  // whose half-even/half-up convention differs.

  /** struct(scale, zero, q array<long>) for one vector. A constant
    * vector (max == min) takes scale 1.0 so dequantization is still
    * exact. Pure codegen'd HOF arithmetic — no UDF.
    *
    * The min/max/scale are bound ONCE per row by routing them through
    * a one-element-array transform: subexpression elimination does not
    * descend into HOF lambdas, so referencing array_min(d) directly
    * inside the per-element lambda would re-scan the vector per
    * element — O(dim²) on the operator whose whole point is cheap
    * bulk compression. As lambda-bound struct fields they are O(1)
    * reads. */
  def quantizeVector(v: Column): Column = {
    val d = asDouble(v)
    val stats = array(struct(
      array_min(d).as("lo"), array_max(d).as("hi")))
    element_at(
      transform(stats, s => {
        val lo = s.getField("lo")
        val hi = s.getField("hi")
        val scale = when(hi === lo, lit(1.0))
          .otherwise((hi - lo) / lit(255.0))
        struct(
          scale.as("scale"),
          lo.as("zero"),
          transform(d, x =>
            floor((x - lo) / scale + lit(0.5)).cast("long")).as("q"))
      }),
      1)
  }

  /** Reconstruct doubles from a [[quantizeVector]] struct:
    * v̂_i = zero + scale·q_i; max abs error ≤ scale/2. */
  def dequantizeVector(qs: Column): Column = {
    val scale = qs.getField("scale")
    val zero = qs.getField("zero")
    transform(qs.getField("q"), q => zero + scale * q.cast("double"))
  }

  /** encode∘decode in ONE native codegen'd call
    * ([[graft.functions.Sq8Roundtrip]]) — the hot-path twin of
    * `dequantizeVector(quantizeVector(v))` for feeding reconstructed
    * vectors into distance computations (identical arithmetic,
    * spec-pinned; the HOF pair stays as the oracle-mirrored form). */
  def sq8Reconstruct(v: Column): Column =
    graft.functions.HashFunctions.sq8Roundtrip(asDouble(v))

  /** Train product-quantization codebooks: split the vector into `m`
    * equal-width subspaces and run the SAME deterministic k-means the
    * IVF path uses on each slice. Cost: m × (1 + iters) corpus scans —
    * at 100 TB train on a deterministic hash sample
    * ([[graft.operators.Sampling.deterministicSample]]), the codebook
    * only needs distributional coverage.
    * @return codebooks(s)(j) = centroid j of subspace s */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int, kCodes: Int,
                       iters: Int = 2): Array[Array[Array[Double]]] = {
    require(m >= 1 && kCodes >= 1)
    val dim = corpus.select(size(col(vecCol)).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % m == 0,
      s"vector dim $dim must be a positive multiple of m=$m")
    val sub = dim / m
    (0 until m).map { s =>
      kmeansCentroids(
        corpus.select(col(idCol),
          slice(col(vecCol), s * sub + 1, sub).as("__subv")),
        idCol, "__subv", kCodes, iters)
    }.toArray
  }

  /** PQ-compressed exhaustive top-k: encode the corpus once (m small
    * ints per vector — 64 floats → 8 codes at the defaults), then
    * score each query by ADC cosine — per row, m table lookups
    * instead of a dim-width dot product, the classic memory-bound
    * 100 TB scan shape (Jégou et al., TPAMI'11). Queries are collected
    * under a cap (the ivfTopKPersisted guard pattern) because each
    * query ships its own tiny LUT pair into the plan.
    *
    * Approximation lives entirely in the quantization: the ADC score
    * IS cos(query, reconstruction) exactly (spec-pinned identity).
    * Like every production PQ system, the compressed scan feeds a
    * REFINE stage: the ADC top (refine·k) candidate pool per query is
    * re-ranked by TRUE cosine against the original vectors — a
    * pool-sized semi join, so the full-width vectors are read for
    * ~refine·k rows per query, never the corpus. `refine = 0` returns
    * the raw ADC ranking (the identity spec's mode). Recall vs the
    * exact scan is spec-pinned like the LSH/IVF family. Compose with
    * IVF pruning upstream when a full compressed scan is still too
    * much. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8, kCodes: Int = 16,
             iters: Int = 2, maxQueries: Int = 64,
             refine: Int = 8,
             codebooks: Option[Array[Array[Array[Double]]]] = None)
      : DataFrame = {
    require(refine >= 0, "refine must be >= 0")
    import graft.functions.HashFunctions.{pqAdcCos, pqEncode}
    // a standing deployment trains ONCE and injects persisted books
    // (savePqCodebooks); absent, train on this call's corpus
    val books = codebooks.getOrElse(
      trainPqCodebooks(corpus, idCol, vecCol, m, kCodes, iters))
    require(books.length == m, s"codebooks have ${books.length} subspaces, m=$m")
    val sub = books(0)(0).length
    val qRows = queries.limit(maxQueries + 1).collect()
    require(qRows.length <= maxQueries,
      s"pqTopK: more than $maxQueries query rows — batch the queries " +
        "or raise maxQueries (each query ships an m×k LUT)")
    if (qRows.isEmpty) {
      // empty queries -> empty result, like the rest of the top-k family
      val spark = corpus.sparkSession
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q_id",
          queries.schema("q_id").dataType, nullable = true),
        org.apache.spark.sql.types.StructField("neighbor_id",
          corpus.schema(idCol).dataType, nullable = true),
        org.apache.spark.sql.types.StructField("cos",
          org.apache.spark.sql.types.DoubleType, nullable = true),
        org.apache.spark.sql.types.StructField("rnk",
          org.apache.spark.sql.types.LongType, nullable = true)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val encodedLazy = corpus.select(col(idCol),
      pqEncode(asDouble(col(vecCol)), books).as("__codes"))
    // each query's scored branch scans the encoded corpus — with >1
    // query, materialize the (tiny: id + m ints per row) code table
    // ONCE so "encode the corpus once" holds in the physical plan too
    val encoded =
      if (qRows.length > 1) encodedLazy.localCheckpoint(true)
      else encodedLazy
    val scored = qRows.map { r =>
      val q = r.getSeq[Float](1).toArray.map(_.toDouble)
      require(q.length == m * sub, s"query dim ${q.length} != ${m * sub}")
      // LUTs sized from the TRAINED books, not kCodes — k-means can
      // return fewer centroids than asked (tiny/pruned populations)
      val dotLut = books.zipWithIndex.map { case (cb, s) =>
        cb.map { c =>
          var acc = 0.0
          var i = 0
          while (i < sub) { acc += q(s * sub + i) * c(i); i += 1 }
          acc
        }
      }
      val normLut = books.map(_.map(_.map(x => x * x).sum))
      val qNorm = math.sqrt(q.map(x => x * x).sum)
      encoded
        .filter(col(idCol) =!= lit(r.get(0)))
        .select(lit(r.get(0)).as("q_id"), col(idCol),
          pqAdcCos(col("__codes"), dotLut, normLut, qNorm).as("cos"))
    }.reduce(_ unionByName _)
    if (refine == 0) rankTopK(scored, idCol, k)
    else {
      // exact re-rank of the ADC pool: pool rows join back to their
      // full vectors; the query side is the (small, already-capped)
      // queries frame
      val pool = rankTopK(scored, idCol, refine * k)
        .select(col("q_id"), col("neighbor_id").as(idCol))
      val rescored = pool
        .join(corpus.select(col(idCol), col(vecCol)), idCol)
        .join(broadcast(queries), "q_id")
        .withColumn("cos", cosine(col("q_vec"), col(vecCol)))
      rankTopK(rescored, idCol, k)
    }
  }

  /** Exact top-k cosine neighbors of each query vector.
    *
    * @param queries small frame (q_id, q_vec) — broadcast
    * @param corpus  large frame (idCol, vecCol)
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("cos", cosine(col("q_vec"), col(vecCol)))
    rankTopK(scored, idCol, k)
  }

  /** Shared per-query ranking tail of every top-k variant: rank scored
    * candidates by cosine (ties broken by corpus id — deterministic),
    * keep the top k. ONE definition so tie-breaking and output shape
    * can't drift between the exact/LSH/IVF/persisted paths. */
  private def rankTopK(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col(idCol).as("neighbor_id"), col("cos"), col("rnk"))
  }

  /** Deterministic pseudo-random hyperplanes: `planes(p)(d)` derived
    * from a seeded generator, materialized as a literal array — tiny
    * (h·dim doubles), shipped in the plan itself. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes
    * (native [[graft.functions.LshBucket]] expression; the planes ride
    * along as a codegen reference object, not a literal tree). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    graft.functions.HashFunctions.lshBucket(asDouble(vec), planes)

  /** LSH-bucketed approximate top-k: queries join the corpus only
    * within their bucket (equi-join on bucket id — a hash join that
    * AQE broadcasts for small query sets), then per-query top-k.
    *
    * @param multiProbe probe `multiProbe` extra buckets per query by
    *   flipping one hyperplane bit each — recovers neighbors that fall
    *   just across a hyperplane at the cost of proportionally more
    *   candidates (queries explode ×(1+multiProbe); the corpus side is
    *   untouched, so the 100 TB side still computes one bucket).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 8, dim: Int = 64,
              multiProbe: Int = 0): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val c = corpus.withColumn("bucket", lshBucket(col(vecCol), planes))
    val qBase = queries.withColumn("__b", lshBucket(col("q_vec"), planes))
    val probes = col("__b") +: (0 until math.min(multiProbe, numPlanes))
      .map(i => col("__b").bitwiseXOR(lit(1L << i)))
    val q = qBase
      .withColumn("bucket", explode(array(probes: _*)))
      .drop("__b")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("cos", cosine(col("q_vec"), col(vecCol)))
    rankTopK(scored, idCol, k)
  }

  /** IVF (inverted-file) approximate top-k — the scale path beyond
    * hyperplane LSH. Deterministic "training": centroids are a fixed
    * systematic sample of the corpus (every ⌈n/c⌉-th vector by id —
    * no iterative k-means, no RNG, no fit state). Corpus vectors are
    * assigned to their nearest centroid (one list each); queries probe
    * their `nProbe` nearest centroids and score only those lists.
    *
    * At 100 TB the centroid table stays driver-sized (c vectors); the
    * corpus assignment is a narrow codegen'd map, and the probe join is
    * an equi-join on centroid id — queries broadcast, corpus never
    * shuffles except the final per-query top-k on |Q| keys. Recall/cost
    * is tuned by (nCentroids, nProbe).
    */
  /** Deterministic systematic centroid sample: every ⌈n/c⌉-th vector by
    * id. Scale-shaped: one `count()` (no sort of the corpus), then the
    * modulo filter reduces the frame to ≈nCentroids rows BEFORE any
    * ordering — the orderBy+limit collapses to TakeOrderedAndProject
    * (per-partition top-k, driver merge), never a global sort/exchange
    * of the 100 TB side. Pinned by a ScaleSpec plan assertion. */
  def systematicCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                          nCentroids: Int): Array[Array[Double]] = {
    val n = corpus.count()
    val step = math.max(1L, n / nCentroids)
    centroidCandidates(corpus, idCol, vecCol, step, nCentroids)
      .collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
  }

  /** The pre-collect centroid plan, exposed so specs can assert its
    * shape (filter pushed below the ordering; TakeOrderedAndProject). */
  def centroidCandidates(corpus: DataFrame, idCol: String, vecCol: String,
                         step: Long, nCentroids: Int): DataFrame =
    corpus.select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .filter(col("cid") % step === 0)
      .orderBy(col("cid")).limit(nCentroids)

  /** Refine centroids with Lloyd (k-means) iterations: assign every
    * corpus vector to its nearest centroid (narrow codegen'd map,
    * broadcast centroids), recompute each centroid as the element-wise
    * mean of its list ([[graft.functions.VectorAvg]] — fixed-size
    * partial sums over the shuffle), collect the ≤k new centroids.
    * Per iteration: one scan + one k-group shuffle; empty clusters
    * keep their previous centroid. Deterministic given the
    * deterministic systematic seed (up to double-sum rounding). */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nCentroids: Int, iters: Int): Array[Array[Double]] = {
    import graft.functions.HashFunctions.nearestCentroids
    import graft.functions.VectorFunctions.vectorAvg
    var centroids = systematicCentroids(corpus, idCol, vecCol, nCentroids)
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    var it = 0
    while (it < iters && dim > 0) {
      val assigned = corpus.select(
        element_at(nearestCentroids(asDouble(col(vecCol)), centroids, 1), 1)
          .as("cid"),
        asDouble(col(vecCol)).as("v"))
      val means = assigned.groupBy("cid")
        .agg(vectorAvg(col("v"), dim).as("mean"))
        .collect()
        .filter(!_.isNullAt(1)) // group with no valid vectors → keep old
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        means.getOrElse(i, old) // nearestCentroids ids are 0-based
      }
      it += 1
    }
    centroids
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              trainIters: Int = 0): DataFrame = {
    import graft.functions.HashFunctions.nearestCentroids
    val centroids =
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters)
      else systematicCentroids(corpus, idCol, vecCol, nCentroids)
    val c = assignFrame(corpus, vecCol, centroids)
    val q = queries.withColumn("centroid",
      explode(nearestCentroids(asDouble(col("q_vec")), centroids, nProbe)))
    val scored = c.join(broadcast(q), Seq("centroid"))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("cos", cosine(col("q_vec"), col(vecCol)))
    rankTopK(scored, idCol, k)
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * anchor, the top-k corpus vectors inside the cosine band
    * (loCos, hiCos]. The band is the semantics: above hiCos a
    * candidate is a near-duplicate/positive (training on it as a
    * negative poisons the loss — the false-negative trap); below loCos
    * it is an easy negative the model learns nothing from. Exact
    * variant: one band-filtered broadcast scan of the corpus
    * ([[bruteForceTopK]]'s shape — the band filter runs INSIDE the
    * scan, so only in-band candidates reach the per-query top-k
    * shuffle). For corpus-scale anchors use [[hardNegativesIvf]].
    *
    * @return (q_id, neighbor_id, cos, rnk) like every top-k here */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    loCos: Double = 0.5,
                    hiCos: Double = 0.95): DataFrame = {
    require(loCos < hiCos, s"need loCos < hiCos, got [$loCos, $hiCos]")
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("cos", cosine(col("q_vec"), col(vecCol)))
      .filter(col("cos") > loCos && col("cos") <= hiCos)
    rankTopK(scored, idCol, k)
  }

  /** [[hardNegatives]] at corpus scale: IVF cell pruning first (hard
    * negatives are by definition NEAR the anchor, so the probed
    * nearest cells are exactly where they live), band filter inside
    * the pruned scan, then per-query top-k. Approximate like every
    * IVF path (recall bounded by cell pruning); same output shape. */
  def hardNegativesIvf(corpus: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int,
                       loCos: Double = 0.5, hiCos: Double = 0.95,
                       nCentroids: Int = 16, nProbe: Int = 4,
                       trainIters: Int = 0): DataFrame = {
    require(loCos < hiCos, s"need loCos < hiCos, got [$loCos, $hiCos]")
    import graft.functions.HashFunctions.nearestCentroids
    val centroids =
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters)
      else systematicCentroids(corpus, idCol, vecCol, nCentroids)
    val c = assignFrame(corpus, vecCol, centroids)
    val q = queries.withColumn("centroid",
      explode(nearestCentroids(asDouble(col("q_vec")), centroids, nProbe)))
    val scored = c.join(broadcast(q), Seq("centroid"))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("cos", cosine(col("q_vec"), col(vecCol)))
      .filter(col("cos") > loCos && col("cos") <= hiCos)
    rankTopK(scored, idCol, k)
  }

  /** IVF × PQ — the flagship big-corpus ANN composition: coarse
    * centroids prune the corpus to the probed inverted lists
    * (~nProbe/nCentroids of the rows), the survivors are scanned in
    * PQ-compressed form (ADC: m table reads per row), and the ADC
    * pool re-ranks by true cosine ([[pqTopK]]'s refine discipline).
    * Candidate generation is doubly approximate (cell pruning +
    * quantization) — recall-floor spec-pinned like the rest of the
    * family; the refine stage keeps the FINAL ordering exact over
    * whatever the candidates are. Codebooks are trained on the pruned
    * candidate population per call (the ad-hoc form); a standing
    * deployment persists codebooks trained once on the corpus — the
    * saveIvfIndex / LinearModel.saveWeightsQ artifact pattern. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nCentroids: Int = 16,
                nProbe: Int = 4, trainIters: Int = 0, m: Int = 8,
                kCodes: Int = 16, pqIters: Int = 2,
                maxQueries: Int = 64, refine: Int = 8,
                codebooks: Option[Array[Array[Array[Double]]]] = None)
      : DataFrame = {
    import graft.functions.HashFunctions.nearestCentroids
    val centroids =
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters)
      else systematicCentroids(corpus, idCol, vecCol, nCentroids)
    val assigned = assignFrame(corpus, vecCol, centroids)
    val qCells = queries.withColumn("centroid",
      explode(nearestCentroids(asDouble(col("q_vec")), centroids, nProbe)))
    // prune FIRST: only rows in some query's probed cells reach the
    // compressed scan (left_semi keeps each corpus row once even when
    // several queries probe its cell; pqTopK re-fans per query)
    val pruned = assigned
      .join(broadcast(qCells.select(col("centroid")).distinct()),
        Seq("centroid"), "left_semi")
      .select(col(idCol), col(vecCol))
    pqTopK(pruned, queries, idCol, vecCol, k, m, kCodes, pqIters,
      maxQueries, refine, codebooks)
  }

  /** Persist PQ codebooks as a (subspace, code, centroid) parquet —
    * the model artifact of a standing PQ/IVF-PQ index (train once on
    * the corpus, encode and probe everywhere; the
    * LinearModel.saveWeightsQ discipline). */
  def savePqCodebooks(spark: SparkSession,
                      books: Array[Array[Array[Double]]],
                      path: String): Unit = {
    require(books.nonEmpty, "refusing to persist empty codebooks")
    import spark.implicits._
    books.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, j) => (s, j, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load codebooks saved by [[savePqCodebooks]]. */
  def loadPqCodebooks(spark: SparkSession,
                      path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(path)
      .select(col("subspace").cast("int"), col("code").cast("int"),
        col("centroid"))
      .collect()
    require(rows.nonEmpty, s"no codebooks at $path")
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (_, rs) =>
      rs.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
    }.toArray
  }

  /** Persist a built IVF index under `path`: `centroids/` (id +
    * vector, driver-sized) and `assignments/` — the corpus tagged with
    * its nearest centroid, PARTITIONED BY centroid so each inverted
    * list is its own directory. Persistence is what makes IVF an
    * INDEX rather than a per-query rebuild: probes stop paying
    * training and the full-corpus assignment scan, and per-probe I/O
    * shrinks to ~nProbe/nCentroids of the corpus via partition
    * pruning. Rebuild cadence pairs with
    * [[graft.operators.Maintenance.compactParquet]] like any derived
    * table. */
  def saveIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                   path: String, nCentroids: Int = 16,
                   trainIters: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val centroids =
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters)
      else systematicCentroids(corpus, idCol, vecCol, nCentroids)
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("centroid", "cvec")
      .coalesce(1) // driver-sized by construction
      .write.mode("overwrite").parquet(s"$path/centroids")
    assignFrame(corpus, vecCol, centroids)
      .write.mode("overwrite").partitionBy("centroid")
      .parquet(s"$path/assignments")
    // fingerprint LAST: a crashed build leaves no (or a stale) marker,
    // so reuse-validation fails closed and the caller rebuilds
    writeIndexFingerprint(spark, path,
      corpusFingerprint(corpus, idCol, vecCol))
  }

  /** Corpus rows tagged with their nearest centroid — the assignment
    * map shared by the full build and the incremental append (ONE
    * formula, so appended rows land in the same list a rebuild would
    * put them in). */
  private[graft] def assignFrame(df: DataFrame, vecCol: String,
                                 centroids: Array[Array[Double]]): DataFrame = {
    import graft.functions.HashFunctions.nearestCentroids
    df.withColumn("centroid",
      element_at(nearestCentroids(asDouble(col(vecCol)), centroids, 1), 1))
  }

  /** Append a BATCH to a persisted IVF index without touching the
    * existing corpus: assigns ONLY the batch against the stored
    * centroids (the job scans nothing but the batch — the spec pins
    * it), appends the new rows into the probed `assignments/`
    * partitions, and rolls the content fingerprint forward. The 100 TB
    * posture: per-ingest cost scales with the batch; a full rebuild
    * (re-training centroids over the grown corpus) becomes a
    * compaction-cadence decision like
    * [[graft.operators.Maintenance.compactParquet]], not a per-ingest
    * wall.
    *
    * CONTRACT (same as incremental dedup): batch ids are DISJOINT from
    * the indexed corpus, and the batch schema matches the corpus
    * schema the index was built from. Returns the assignment frame it
    * wrote, for introspection.
    */
  def appendToIvfIndex(batch: DataFrame, idCol: String, vecCol: String,
                       path: String): DataFrame = {
    // READ-ONLY probe, not auto-recovery: a licensed _compact_ stage
    // means a crashed swap — the layout may be half-swapped, and a
    // file appended now would be silently dropped when recovery
    // prefers the staged copies. Recovering from HERE would be worse:
    // if the single-writer contract is being violated by a live
    // compactor, destructive recovery races its swap (the old loud
    // abort becomes silent loss). Fail loud with the remedy instead;
    // the streaming sink (the contractual single writer) heals at
    // batch top before ever reaching this.
    Maintenance.requireNoCrashedIvfCompaction(batch.sparkSession, path)
    appendAssignments(batch, idCol, vecCol, path)
  }

  /** [[appendToIvfIndex]] minus the crashed-swap probe — for callers
    * that already established it this batch ([[ingestEmbeddingBatch]]
    * checks once at entry). */
  private def appendAssignments(batch: DataFrame, idCol: String,
                                vecCol: String, path: String): DataFrame = {
    val spark = batch.sparkSession
    val centroids = loadIvfCentroids(spark, path)
    val assigned = assignFrame(batch, vecCol, centroids)
    assigned.write.mode("append").partitionBy("centroid")
      .parquet(s"$path/assignments")
    readIndexFingerprint(spark, path).foreach { old =>
      combineFingerprints(old, corpusFingerprint(batch, idCol, vecCol)) match {
        case Some(fp) => writeIndexFingerprint(spark, path, fp)
        case None =>
          // legacy/corrupt marker: folding zeros into a fresh
          // fingerprint would silently describe only this batch, and
          // the NEXT append would roll that lie forward. Delete the
          // marker instead — the reuse check then fails closed and the
          // caller rebuilds the index.
          deleteIndexFingerprint(spark, path)
      }
    }
    assigned
  }

  /** Content fingerprint of a corpus — `"<rows>:<maxId>:<hashSum>"`,
    * where hashSum is the order-independent SUM of per-row xxhash64
    * over `contentCol` (exact decimal — no overflow, no fold-order
    * drift) — used to make persisted-index reuse self-validating: a
    * regenerated corpus under the same path triggers a rebuild rather
    * than serving stale answers, INCLUDING re-embedding under
    * unchanged ids (which count+max-id alone cannot see). One narrow
    * codegen'd aggregate; composable under the disjoint-id append
    * contract, so [[appendToIvfIndex]] can roll it forward without
    * rescanning the corpus. At 100 TB on a table format you'd use the
    * snapshot/version id instead; this is the engine-portable analog
    * for plain parquet. */
  def corpusFingerprint(corpus: DataFrame, idCol: String,
                        contentCol: String): String = {
    val r = corpus.agg(count(lit(1)), max(col(idCol).cast("long")),
        sum(xxhash64(col(contentCol)).cast("decimal(38,0)")))
      .collect().head
    val m = if (r.isNullAt(1)) "-" else r.getLong(1).toString
    val h = if (r.isNullAt(2)) "0" else r.getDecimal(2).toBigInteger.toString
    s"${r.getLong(0)}:$m:$h"
  }

  /** None ⇔ either side is not a well-formed `<rows>:<maxId>:<hashSum>`
    * fingerprint — a legacy or corrupt marker must surface as an
    * explicit mismatch (caller deletes the marker, forcing the
    * fail-closed rebuild), never be silently folded in as zeros. */
  private[graft] def combineFingerprints(a: String, b: String): Option[String] = {
    def parse(s: String): Option[(Long, Option[Long], BigInt)] =
      s.split(":") match {
        case Array(n, m, h) =>
          try Some((n.toLong, if (m == "-") None else Some(m.toLong), BigInt(h)))
          catch { case _: NumberFormatException => None }
        case _ => None
      }
    for ((na, ma, ha) <- parse(a); (nb, mb, hb) <- parse(b)) yield {
      val m = (ma.toSeq ++ mb.toSeq) match {
        case Nil => "-"
        case xs  => xs.max.toString
      }
      s"${na + nb}:$m:${ha + hb}"
    }
  }

  private def fingerprintPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_FINGERPRINT")

  def readIndexFingerprint(spark: SparkSession, path: String): Option[String] = {
    val p = fingerprintPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  private def deleteIndexFingerprint(spark: SparkSession, path: String): Unit = {
    val p = fingerprintPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, false)
  }

  private def writeIndexFingerprint(spark: SparkSession, path: String,
                                    fp: String): Unit = {
    val p = fingerprintPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def loadIvfCentroids(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(s"$path/centroids").orderBy("centroid")
      .collect().map(_.getSeq[Double](1).toArray)

  /** Top-k against a PERSISTED index: assigns queries to their nProbe
    * centroids, then scans ONLY the probed lists — the probed ids are
    * |Q|×nProbe (collected driver-side), so the `isin` filter prunes
    * assignment partitions statically before any I/O. Same scoring
    * and ranking as [[ivfTopK]].
    *
    * The driver-side collect is safe only while the probe set is small
    * (the interactive-ANN contract). `maxCollectQueries` guards it:
    * past the cap the probe auto-routes to the JOIN form — no driver
    * materialization, no static pruning (a query set that large
    * touches most lists anyway), same results. Bulk/backfill callers
    * get the scale path without having to know about it. */
  def ivfTopKPersisted(spark: SparkSession, path: String,
                       queries: DataFrame, idCol: String, vecCol: String,
                       k: Int, nProbe: Int = 4,
                       maxCollectQueries: Int = 65536): DataFrame = {
    import graft.functions.HashFunctions.nearestCentroids
    val centroids = loadIvfCentroids(spark, path)
    val q = queries.withColumn("centroid",
      explode(nearestCentroids(asDouble(col("q_vec")), centroids, nProbe)))
    // ONE evaluation of the (small-by-contract) query side: collect it
    // WITH a cap (limit cap+1 detects overflow without counting first),
    // derive the probed id set driver-side, and join the localized
    // frame — collecting just the ids and then broadcasting `q` would
    // re-run the queries lineage a second time
    val capExploded = maxCollectQueries.toLong * nProbe
    val qRows = q.limit((capExploded + 1).min(Int.MaxValue).toInt).collect()
    if (qRows.length > capExploded) {
      // bulk kNN: same plan as the continuous-ingest probe — the
      // centroid equi-join against the partitioned lists, strategy
      // left to AQE (it broadcasts genuinely-small sides on its own)
      val lists = spark.read.parquet(s"$path/assignments")
      val scored = lists.join(q, Seq("centroid"))
        .filter(col(idCol) =!= col("q_id"))
        .withColumn("cos", cosine(col("q_vec"), col(vecCol)))
      rankTopK(scored, idCol, k)
    } else {
      val probed = qRows.map(_.getAs[Int]("centroid")).distinct.toSeq
      val qLocal = spark.createDataFrame(
        java.util.Arrays.asList(qRows: _*), q.schema)
      val lists = spark.read.parquet(s"$path/assignments")
        .filter(col("centroid").isin(probed: _*))
      val scored = lists.join(broadcast(qLocal), Seq("centroid"))
        .filter(col(idCol) =!= col("q_id"))
        .withColumn("cos", cosine(col("q_vec"), col(vecCol)))
      rankTopK(scored, idCol, k)
    }
  }

  /** The CONTINUOUS embedding-dedup ingest step against a persisted
    * IVF index — [[graft.operators.Dedup.ingestDedupBatch]]'s vector
    * twin:
    *
    *  1. batch-internal near-dups dropped (centroid-blocked pair
    *     generation — the SAME blocking as the cross-batch probe, so
    *     acceptance never depends on where batch boundaries fall —
    *     then smallest-id-survives);
    *  2. survivors probe the index for any neighbor with cosine ≥
    *     `threshold` — by JOIN, not the driver-collect probe path:
    *     the batch assigns to its nProbe nearest centroids and
    *     equi-joins the centroid-partitioned lists, so ingest never
    *     collects the batch driver-side (no broadcast pin either —
    *     AQE broadcasts small batches, and a replayed backfill batch
    *     can be arbitrarily large);
    *  3. batch docs matching the corpus are dropped;
    *  4. the remaining novel vectors are APPENDED
    *     ([[appendToIvfIndex]]) so the next batch dedups against them.
    *
    * Returns the accepted vectors (cached — feeds the append and the
    * caller; caller unpersists). Disjoint-id contract throughout. */
  def ingestEmbeddingBatch(spark: SparkSession, path: String,
                           batch: DataFrame, idCol: String, vecCol: String,
                           threshold: Double = 0.99,
                           nProbe: Int = 4): DataFrame = {
    val novel = screenEmbeddingBatch(spark, path, batch, idCol, vecCol,
      threshold, nProbe).persist()
    try appendAssignments(novel, idCol, vecCol, path)
    catch { case e: Throwable => novel.unpersist(); throw e }
    novel
  }

  /** Steps 1–3 of [[ingestEmbeddingBatch]] as a PURE probe: the batch
    * is screened against itself and the index, but nothing is written
    * — the index is untouched, so the same (index, batch) pair always
    * screens identically. This is the half a read-side caller (a gate
    * query, a dry-run, an admission preview) wants: the accepted set
    * is a deterministic function of its inputs, and a fingerprint-
    * reused index stays valid across calls instead of being rebuilt
    * to undo the ingest's append. */
  def screenEmbeddingBatch(spark: SparkSession, path: String,
                           batch: DataFrame, idCol: String, vecCol: String,
                           threshold: Double = 0.99,
                           nProbe: Int = 4): DataFrame = {
    import graft.functions.HashFunctions.nearestCentroids
    // loud, read-only (same rationale as appendToIvfIndex): probing a
    // half-swapped layout would silently miss the stranded lists'
    // vectors and re-admit their near-duplicates. Checked ONCE here —
    // ingest's append uses the unchecked variant.
    Maintenance.requireNoCrashedIvfCompaction(spark, path)
    val centroids = loadIvfCentroids(spark, path)
    // intra-batch candidates use the SAME centroid blocking as the
    // cross-batch probe (both sides explode to nProbe centroids, pairs
    // meet iff they share one) — a different generator (e.g. the LSH
    // hyperplane buckets) would make acceptance depend on where batch
    // boundaries fall, since a pair missed in-batch would have been
    // caught had it arrived one batch later
    def probed(df: DataFrame, id: String, vec: String) =
      df.select(col(id), col(vec)).withColumn("centroid",
        explode(nearestCentroids(asDouble(col(vec)), centroids, nProbe)))
    val a = probed(batch, idCol, vecCol)
      .select(col("centroid"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = probed(batch, idCol, vecCol)
      .select(col("centroid"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    val internal = a.join(b, Seq("centroid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b")).distinct()
    val batchClean = graft.operators.Dedup.dropNearDups(batch, internal, idCol)
    val q = batchClean.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("centroid",
        explode(nearestCentroids(asDouble(col("q_vec")), centroids, nProbe)))
    // no broadcast() pin: a backfill replay can deliver an arbitrarily
    // large micro-batch, and a forced broadcast would materialize all
    // of it (×nProbe) on the driver — the same scaling-input rule
    // ScaleSpec pins for the TPC-H dims; AQE broadcasts small batches
    // on its own
    val lists = spark.read.parquet(s"$path/assignments")
    val dupIds = lists.join(q, Seq("centroid"))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("cos", cosine(col("q_vec"), col(vecCol)))
      .filter(col("cos") >= threshold)
      .select(col("q_id")).distinct()
    batchClean.join(dupIds,
      batchClean(idCol) === dupIds("q_id"), "left_anti")
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: pairs in
    * the same bucket with cosine ≥ threshold. The embedding analog of
    * [[Dedup.minhashNearDupPairs]]. */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, numPlanes: Int = 8,
                         dim: Int = 64, maxBucket: Int = 10000): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val withB = corpus.select(col(idCol).as("vid"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val sizes = withB.groupBy("bucket").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, maxBucket))
    val inB = withB.join(sizes, Seq("bucket"))
    val a = inB.select(col("bucket"), col("vid").as("id_a"), col("v").as("v_a"))
    val b = inB.select(col("bucket"), col("vid").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the corpus, then compare pairs
    * ONLY within a cluster. The cluster plays the role the random
    * hyperplane bucket plays in [[cosineNearDupPairs]], but is LEARNED
    * from the data — near-duplicates land in the same Voronoi cell by
    * construction instead of hoping no hyperplane separates them, so
    * recall at a given comparison budget is higher on clustered data.
    *
    * Scale: pairwise work is confined to clusters, so k is the cost
    * dial — at 100 TB you run with k large enough that |cluster| ≈
    * 10²–10³ (SemDeDup itself uses k≈10⁵ on web-scale corpora) and the
    * per-cluster quadratic term stays trivial; `maxCluster` skew-caps
    * the degenerate case by passing an over-sized cluster through
    * UNCOMPARED (conservative: never drops without evidence, mirrors
    * the LSH/minhash `maxBucket` guards). Training cost is bounded by
    * [[kmeansCentroids]] (one scan + one k-group shuffle per iter). */
  def semanticNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, nCentroids: Int = 16,
                           trainIters: Int = 2,
                           maxCluster: Int = 10000): DataFrame = {
    val centroids =
      kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters)
    val withC = assignFrame(
      corpus.select(col(idCol).as("vid"), col(vecCol).as("v")), "v", centroids)
    val sizes = withC.groupBy("centroid").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, maxCluster))
    val inC = withC.join(sizes, Seq("centroid"))
    val a = inC.select(col("centroid"), col("vid").as("id_a"), col("v").as("v_a"))
    val b = inC.select(col("centroid"), col("vid").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("centroid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Corpus minus semantic near-duplicates: greedy keep-smallest-id
    * ([[Dedup.dropNearDups]] policy — one anti-join, no closure) over
    * [[semanticNearDupPairs]]. The embedding-space sibling of the
    * lexical corpus filter ([[Dedup.dropNearDups]] over
    * [[Dedup.minhashNearDupPairs]]): minhash catches copies that share
    * surface n-grams, this catches paraphrases that share an embedding
    * neighborhood. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, nCentroids: Int = 16,
                    trainIters: Int = 2, maxCluster: Int = 10000): DataFrame =
    Dedup.dropNearDups(corpus,
      semanticNearDupPairs(corpus, idCol, vecCol, threshold,
        nCentroids, trainIters, maxCluster),
      idCol)
}
