package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dedup suite: exact, MinHash+LSH recall against brute-force Jaccard,
  * SimHash Hamming banding. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2L, "the quick brown fox jumps over the lazy dog and runs away fast"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog and runs away quickly"), // near dup of 1
    (4L, "completely different text about machine learning models and training data"),
    (5L, "another unrelated document discussing weather patterns in the north"),
    (6L, "completely different text about machine learning models and training data sets") // near dup of 4
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val got = rows(Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_dups").orderBy("keep_id"))
    got should contain(Seq(1L, 2L)) // docs 1+2 collapse
    got.map(_.head) shouldBe Seq(1L, 3L, 4L, 5L, 6L)
  }

  test("shingles: n-gram windows; short docs yield one whole-stream shingle") {
    val df = Seq(("a b c d", 1), ("a b", 2)).toDF("text", "id")
    val got = df.select(Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0).toSeq)
    got(0) shouldBe Seq("a b c", "b c d")
    got(1) shouldBe Seq("a b")
  }

  test("minhash LSH finds the exact and near dups; jaccard values match brute force") {
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").orderBy("id_a", "id_b")
    val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").orderBy("id_a", "id_b")
    val lshPairs = rows(lsh)
    val brutePairs = rows(brute)
    // identical docs must always collide (every band equal)
    lshPairs.map(r => (r(0), r(1))) should contain((1L, 2L))
    // LSH output ⊆ brute force (verification step is exact jaccard)
    brutePairs should contain allElementsOf lshPairs
    // recall on this corpus: every brute-force pair found
    lshPairs shouldBe brutePairs
  }

  test("simhash: identical docs distance 0; near dups within small hamming") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sigs(1L) shouldBe sigs(2L)
    java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) should be <= 16
    java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) should be > 10
  }

  test("simhash near-dup pairs finds exact dup, respects maxHamming") {
    val got = rows(Dedup.simhashNearDupPairs(docs, "doc_id", "text",
      maxHamming = 3).select("id_a", "id_b").orderBy("id_a", "id_b"))
    got should contain(Seq(1L, 2L))
    // every reported pair actually within the bound
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { p =>
      java.lang.Long.bitCount(
        sigs(p(0).asInstanceOf[Long]) ^ sigs(p(1).asInstanceOf[Long])) should be <= 3
    }
  }

  test("removeDuplicatedSpans: cross-doc spans removed from the later doc only; in-doc repeats kept") {
    val corpus = Seq(
      // 12 shared tokens + distinct tails: the shared prefix is
      // covered by 4-token windows in BOTH, removed only from doc 11
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu original tail here"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu copied ending differs"),
      // in-doc repetition, no cross-doc sharing → fully kept
      (12L, "solo solo solo solo solo solo solo solo unique closing words"),
      // shorter than the window → untouched
      (13L, "tiny doc")
    ).toDF("doc_id", "text")
    val got = rows(Dedup.removeDuplicatedSpans(corpus, "doc_id", "text",
        windowSize = 4).orderBy("doc_id"))
    val byId = got.map(r => r.head -> r).toMap
    // doc 10 is the canonical (smallest) owner: untouched
    byId(10L)(1) shouldBe "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu original tail here"
    byId(10L)(3) shouldBe 0L
    // doc 11 loses exactly the 12 shared tokens, keeps its tail
    byId(11L)(1) shouldBe "copied ending differs"
    byId(11L)(2) shouldBe 15L
    byId(11L)(3) shouldBe 12L
    // in-doc repetition is not cross-document sharing
    byId(12L)(3) shouldBe 0L
    // sub-window doc unchanged
    byId(13L)(1) shouldBe "tiny doc"
    byId(13L)(3) shouldBe 0L
  }

  test("removeDuplicatedSpans: exact copy collapses to empty text, original intact") {
    val corpus = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val got = rows(Dedup.removeDuplicatedSpans(corpus, "doc_id", "text",
        windowSize = 4).orderBy("doc_id"))
    got shouldBe Seq(
      Seq(1L, "one two three four five six seven eight nine ten", 10L, 0L),
      Seq(2L, "", 10L, 10L))
  }

  test("removeDuplicatedSpans: a NULL doc_id fails loud, never silently empties text") {
    // a NULL id can't own a span or be a duplicate; letting it through
    // would either silently EMPTY its clean_text (a bare NULL
    // comparison riding into __cov) or merge all NULL docs into one
    // garbled interleaved group — the operator refuses loudly instead
    // (in-lineage raise_error: no second corpus scan, ScaleSpec's
    // one-scan pin holds)
    val corpus = Seq(
      (Some(1L), "one two three four five six seven eight first tail"),
      (None: Option[Long], "one two three four five six seven eight anon tail")
    ).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.removeDuplicatedSpans(corpus, "doc_id", "text", windowSize = 8)
        .collect()
    }
    e.getMessage should include("NULL document id")
    // null-free corpora are untouched by the guard
    val ok = Seq((Some(1L), "one two three")).toDF("doc_id", "text")
    rows(Dedup.removeDuplicatedSpans(ok, "doc_id", "text", windowSize = 8))
      .shouldBe(Seq(Seq(1L, "one two three", 3L, 0L)))
  }

  test("exactCorpus keeps the smallest-id row of each content cluster") {
    val kept = rows(Dedup.exactCorpus(docs, "doc_id", "text")
      .select("doc_id").orderBy("doc_id")).map(_.head)
    kept shouldBe Seq(1L, 3L, 4L, 5L, 6L) // doc 2 (exact dup of 1) dropped
  }

  test("dropNearDups removes every doc that pairs with a smaller id") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
    val kept = rows(Dedup.dropNearDups(docs, pairs, "doc_id")
      .select("doc_id").orderBy("doc_id")).map(_.head)
    kept should contain(1L)      // cluster representative survives
    kept should not contain 2L   // exact dup dropped
    (kept should contain).oneOf(4L, 6L) // near-dup cluster keeps only one... (4 is rep)
    kept should contain(5L)      // unique doc survives
  }

  test("duplicateClusters: chains collapse transitively where the greedy drop can't see") {
    import spark.implicits._
    // chain 1-2-3-4 plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)

    // edges that skip the minimum: (2,3) + (1,3). Greedy dropNearDups
    // keeps {1,2} (2 never appears as the larger side of a pair with a
    // smaller id); components see one cluster {1,2,3} → representative 1
    val skewed = Seq((2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    Dedup.duplicateClusters(skewed).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("duplicateClusters: deep chain (diameter > 20) converges without DAG blowup") {
    import spark.implicits._
    // a 26-node chain: min-label propagation needs ~25 rounds, crossing
    // the every-5-rounds localCheckpoint several times — without the
    // lineage truncation the plan tree DOUBLES per round (self-join +
    // fixpoint probe) and rendering/analysis go exponential
    val pairs = (0L until 25L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.duplicateClusters(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.keySet shouldBe (0L to 25L).toSet
    got.values.toSet shouldBe Set(0L) // one component, min-id representative
    labels.unpersist()
  }

  test("incremental dedup: batch probes the prebuilt index, matches brute force") {
    import spark.implicits._
    val corpus = (0L until 200L).map(i =>
      (i, s"corpus document number $i with words ${"w" * (i.toInt % 5 + 1)} " +
        s"alpha beta gamma delta epsilon zeta eta theta $i")).toDF("doc_id", "text")
    // new batch: 3 near-copies of corpus docs (suffix-perturbed) + 2 novel
    val batch = Seq(
      (1000L, corpus.filter($"doc_id" === 7L).head().getString(1) + " qq"),
      (1001L, corpus.filter($"doc_id" === 50L).head().getString(1) + " ww"),
      (1002L, corpus.filter($"doc_id" === 150L).head().getString(1) + " ee"),
      (1003L, "entirely novel content about completely different things one"),
      (1004L, "another unrelated fresh document mentioning nothing shared two")
    ).toDF("doc_id", "text")

    val index = Dedup.minhashBandKeys(corpus, "doc_id", "text")
    val store = Dedup.shingleStore(corpus, "doc_id", "text")
    val pairs = Dedup.incrementalNearDupPairs(index, store, batch,
      "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    pairs should contain((1000L, 7L))
    pairs should contain((1001L, 50L))
    pairs should contain((1002L, 150L))
    // novel docs pair with nothing; no corpus-corpus pairs ever emitted
    pairs.map(_._1) should not contain 1003L
    pairs.map(_._1) should not contain 1004L
    pairs.foreach { case (n, c) => n should be >= 1000L; c should be < 1000L }
  }

  test("persisted minhash index: build + append probe matches the in-memory index") {
    import spark.implicits._
    val corpus = (0L until 200L).map(i =>
      (i, s"corpus document number $i with words ${"w" * (i.toInt % 5 + 1)} " +
        s"alpha beta gamma delta epsilon zeta eta theta $i")).toDF("doc_id", "text")
    val batch = Seq(
      (1000L, corpus.filter($"doc_id" === 7L).head().getString(1) + " qq"),
      (1001L, corpus.filter($"doc_id" === 50L).head().getString(1) + " ww"),
      (1002L, "entirely novel content about completely different things one")
    ).toDF("doc_id", "text")
    val name = "graft_mh_spec"
    try {
      // half the corpus at build time, half APPENDED — band keys are
      // order-independent, so the persisted probe must equal the
      // in-memory probe over the full corpus
      Dedup.saveMinhashIndex(corpus.filter($"doc_id" % 2 === 0),
        "doc_id", "text", name)
      Dedup.appendToMinhashIndex(corpus.filter($"doc_id" % 2 =!= 0),
        "doc_id", "text", name)
      val persisted = Dedup.incrementalNearDupPairsPersisted(spark, name,
        batch, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val inMemory = Dedup.incrementalNearDupPairs(
        Dedup.minhashBandKeys(corpus, "doc_id", "text"),
        Dedup.shingleStore(corpus, "doc_id", "text"),
        batch, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      persisted shouldBe inMemory
      persisted should contain((1000L, 7L))
      persisted should contain((1001L, 50L))
      persisted.map(_._1) should not contain 1002L
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_shingles")
    }
  }

  test("ingestDedupBatch: continuous dedup across batches, index grows with survivors") {
    import spark.implicits._
    val corpus = (0L until 100L).map(i =>
      (i, s"seed document number $i with words alpha beta gamma delta " +
        s"epsilon zeta eta theta iota kappa $i")).toDF("doc_id", "text")
    def doc(i: Long) = corpus.filter($"doc_id" === i).head().getString(1)
    val name = "graft_mh_ingest"
    try {
      Dedup.saveMinhashIndex(corpus, "doc_id", "text", name)

      // batch 1: one corpus dup, one internal dup pair, one novel
      val b1 = Seq(
        (1000L, doc(7) + " qq"),                                  // dup of corpus 7
        (1001L, "fresh topic about completely new material one two"),
        (1002L, "fresh topic about completely new material one three") // dup of 1001
      ).toDF("doc_id", "text")
      val a1 = Dedup.ingestDedupBatch(spark, name, b1, "doc_id", "text")
      val ids1 = a1.collect().map(_.getLong(0)).toSet
      ids1 shouldBe Set(1001L) // 1000 hit the corpus; 1002 lost to 1001 in-batch
      a1.unpersist()

      // batch 2: a dup of batch 1's SURVIVOR must now be caught — the
      // index grew by the accepted docs, not just the original corpus
      val b2 = Seq(
        (2000L, "fresh topic about completely new material one two four"),
        (2001L, "entirely different unrelated subject matter here five")
      ).toDF("doc_id", "text")
      val a2 = Dedup.ingestDedupBatch(spark, name, b2, "doc_id", "text")
      a2.collect().map(_.getLong(0)).toSet shouldBe Set(2001L)
      a2.unpersist()

      // index now holds corpus + both accepted docs
      spark.table(s"${name}_shingles").count() shouldBe 102L
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_shingles")
    }
  }

  test("windowDupStats: full copies score 1.0, unique docs 0.0, short docs omitted") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j k l"), // 12 tokens, w=8 s=4 → 2 windows
      (2L, "a b c d e f g h i j k l"), // verbatim copy → both windows shared
      (3L, "z y x w v u t s r q p o"), // disjoint → nothing shared
      (4L, "a b c")                    // < one window → omitted
    ).toDF("doc_id", "text")
    val got = rows(Dedup.windowDupStats(corpus, "doc_id", "text",
      windowSize = 8, stride = 4).orderBy("doc_id"))
    got shouldBe Seq(
      Seq(1L, 2L, 2L, 1.0), Seq(2L, 2L, 2L, 1.0), Seq(3L, 2L, 0L, 0.0))
  }

  test("dropNearDupsTransitive keeps only cluster representatives") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("doc_id")
    // greedy-blind shape: (2,3) + (1,3) chains 1-2-3; 4 unclustered
    val pairs = Seq((2L, 3L), (1L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    Dedup.dropNearDupsTransitive(docs, pairs, "doc_id")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq shouldBe
      Seq(1L, 4L, 10L, 99L)
    // the greedy pass keeps 2 as well (never the larger side of a pair
    // with a smaller id) — the transitive variant removes it
    Dedup.dropNearDups(docs, pairs, "doc_id")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq shouldBe
      Seq(1L, 2L, 4L, 10L, 99L)
  }

  test("bucket-size skew guard drops degenerate buckets") {
    // 50 identical docs → one giant bucket; cap at 10 drops it entirely
    val many = (1L to 50L).map(i => (i, "same text for every single doc here"))
      .toDF("doc_id", "text")
    Dedup.minhashNearDupPairs(many, "doc_id", "text", maxBucket = 10)
      .count() shouldBe 0
    // with a big-enough cap all 50*49/2 pairs appear
    Dedup.minhashNearDupPairs(many, "doc_id", "text", maxBucket = 100)
      .count() shouldBe 50L * 49 / 2
  }

  test("lshBandingFor meets the recall floor at the threshold, refuses below it") {
    for (t <- Seq(0.3, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 1.0)) {
      val (k, b) = Dedup.lshBandingFor(t)
      withClue(s"t=$t -> (k=$k, bands=$b): ") {
        k % b shouldBe 0
        k should be <= 64
        val r = k / b
        // analytic per-pair recall of banded LSH at J = t
        val recall = 1.0 - math.pow(1.0 - math.pow(t, r), b)
        recall should be >= 0.95
      }
    }
    // the r=6 sharp-curve pick at the old default threshold
    Dedup.lshBandingFor(0.8) shouldBe ((60, 10))
    // a threshold so low no k <= 64 banding can recall it -> refused,
    // naming the minimum supportable threshold
    val e = intercept[IllegalArgumentException](Dedup.lshBandingFor(0.01))
    e.getMessage should include("minimum supportable threshold")
  }

  test("fuzzyDecontaminate fails loud on an oversized eval band bucket") {
    // 30 identical eval prompts share every band bucket; silently
    // dropping them would exempt them from the screen
    val corpus = Seq((1L, "some corpus document with several words here"))
      .toDF("doc_id", "text")
    val evalSet = (1 to 30).map(i =>
      (i.toLong, "identical leaked prompt text repeated verbatim"))
      .toDF("eval_id", "eval_text")
    val e = intercept[IllegalArgumentException] {
      Dedup.fuzzyDecontaminate(corpus, "doc_id", "text",
        evalSet, "eval_id", "eval_text", maxBucket = 10).count()
    }
    e.getMessage should include("maxBucket")
  }

  test("duplicateClusters: driver union-find fast path equals the distributed loop") {
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (3L, 4L), (4L, 1L))
      .toDF("id_a", "id_b")
    val fast = rows(Dedup.duplicateClusters(pairs).orderBy("id"))
    val dist = rows(
      Dedup.duplicateClusters(pairs, collectLimit = 0).orderBy("id"))
    fast shouldBe dist
    fast shouldBe Seq(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L), Seq(4L, 1L),
      Seq(10L, 10L), Seq(11L, 10L), Seq(20L, 20L), Seq(21L, 20L),
      Seq(22L, 20L))
    // string ids take the boxed path; same three-way parity
    val spairs = Seq(("b", "a"), ("b", "c"), ("y", "z"))
      .toDF("id_a", "id_b")
    rows(Dedup.duplicateClusters(spairs).orderBy("id")) shouldBe
      rows(Dedup.duplicateClusters(spairs, collectLimit = 0).orderBy("id"))
  }

  test("duplicateClusters: output-time path compression at the exact grow boundary") {
    // exactly 4096 distinct long ids (= initial parent-table cap/2, the
    // load-factor boundary) built as a DESCENDING chain, so thousands
    // of stale parents remain at output time and foreachKey's find()
    // performs value-only compression puts while iterating. A put that
    // grew the table on an update (not an insert) rehashed mid-walk and
    // emitted duplicate/missing rows — this pins the boundary.
    val pairs = (4095 to 1 by -1).map(i => (i.toLong, i.toLong + 1))
      .toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs).collect()
    got.length shouldBe 4096
    got.map(_.getLong(0)).sorted shouldBe (1L to 4096L).toArray
    got.map(_.getLong(1)).distinct.toSeq shouldBe Seq(1L)
  }

  test("duplicateClusters: probe overflow reroutes to the loop, results identical") {
    // 600 edges chained into one deep component + scattered doubletons,
    // through a parent table forced to grow several times; a cap below
    // the edge count must overflow the limit(cap+1) probe and produce
    // the distributed loop's exact answer
    val chain = (1L until 400L).map(i => (i + 1, i))
    val pairs = (chain ++ (0 until 200).map(i =>
      (10000L + i * 2, 10001L + i * 2))).toDF("id_a", "id_b")
    val capped = rows(
      Dedup.duplicateClusters(pairs, collectLimit = 100).orderBy("id"))
    val fast = rows(Dedup.duplicateClusters(pairs).orderBy("id"))
    capped shouldBe fast
    fast.take(1) shouldBe Seq(Seq(1L, 1L)) // chain collapses to min id
    fast.count(_ == Seq(400L, 1L)) shouldBe 1
  }

  test("fuzzyDecontaminate: planted leaks dropped, no false drops, ids namespaced") {
    // 60 distinct corpus docs; eval = lightly-edited copies of docs
    // 0/10/20 (the leak an EXACT screen with full-text equality would
    // miss) + one unrelated eval doc whose id COLLIDES with corpus
    // doc 5 (sides are namespaced — the collision must not drop 5)
    def text(i: Int) = s"document number $i about topic ${i % 7} " +
      (1 to 20).map(j => s"w${(i * 31 + j) % 97}").mkString(" ")
    val corpus = (0 until 60).map(i => (i.toLong, text(i)))
      .toDF("doc_id", "text")
    val leaked = Seq(0L, 10L, 20L)
    val evalSet = corpus.filter(col("doc_id").isin(leaked: _*))
      .select((col("doc_id") + 500L).as("eval_id"),
        concat(col("text"), lit(" tail")).as("eval_text"))
      .unionByName(Seq((5L,
        "completely unrelated benchmark question sharing no phrasing"))
        .toDF("eval_id", "eval_text"))
    val survivors = Dedup.fuzzyDecontaminate(corpus, "doc_id", "text",
        evalSet, "eval_id", "eval_text", threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet

    // brute-force contaminated set with the same shingle/jaccard defs
    def shingleSet(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val evalShingles = evalSet.collect()
      .map(r => shingleSet(r.getString(1)))
    val brute = (0 until 60).filter { i =>
      val sh = shingleSet(text(i))
      evalShingles.exists(e =>
        (sh & e).size.toDouble / (sh | e).size >= 0.7)
    }.map(_.toLong).toSet
    brute should contain allElementsOf leaked // the plant is real
    survivors shouldBe ((0L until 60L).toSet -- brute)
    survivors should contain(5L)
  }

  test("ngramContainmentPairs: asymmetric quote detection, df cap") {
    // quote: the short doc appears wholesale inside the long one —
    // Jaccard is tiny (union dominated by the long doc) but
    // containment short→long is 1.0
    val quote = "alpha beta gamma delta epsilon"
    val long = ("zero one two three four five six seven eight nine " +
      "ten eleven twelve thirteen fourteen fifteen " + quote +
      " sixteen seventeen eighteen nineteen twenty twentyone")
    val docs = Seq(
      (1L, quote), (2L, long),
      (3L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramContainmentPairs(docs, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    got.keySet shouldBe Set((1L, 2L)) // DIRECTED: only short→long
    got((1L, 2L)) shouldBe 1.0 // every quote shingle is in the long doc
    // Jaccard on the same pair is far below the containment signal
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.0).collect()
      .find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get.getDouble(2)
    jac should be < 0.2
    // df cap: a boilerplate shingle shared by MANY docs must not pair
    // them — every doc here is the same 3 tokens (one shingle), hot
    // once df > cap, so no cold shingles and NO pairs (and no 0/0)
    val boiler = (1L to 10L).map(i => (i, "same exact text"))
      .toDF("doc_id", "text")
    Dedup.ngramContainmentPairs(boiler, "doc_id", "text",
      threshold = 0.1, maxShingleDf = 5).count() shouldBe 0L
    // ...but with the cap above the df the identical docs all pair at 1.0
    Dedup.ngramContainmentPairs(boiler, "doc_id", "text",
      threshold = 0.99, maxShingleDf = 10).count() shouldBe 90L
  }
}
