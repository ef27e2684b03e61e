package graft

import graft.operators.BpeInduction
import org.apache.spark.sql.functions._

/** BPE induction: exact parity with a single-JVM reference
  * implementation of Sennrich et al. — the merge LIST and the
  * resulting ENCODINGS — plus unit pins on the merge fold. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation (plain Scala, no Spark) -----------

  private def refTokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def refMergeWord(sym: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  /** Classic BPE on a word-frequency map; ties (count, then pair
    * string ascending) mirror the operator's argmax. */
  private def refBpe(texts: Seq[String], nMerges: Int): (Seq[(String, String)], Map[String, Vector[String]]) = {
    val wc = texts.flatMap(refTokens).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    var words: Map[String, (Vector[String], Long)] =
      wc.map { case (w, c) => w -> (w.split("").toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.values.foreach { case (sym, c) =>
        sym.indices.dropRight(1).foreach { i =>
          val p = (sym(i), sym(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (a, b) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x + " " + y) }._1
        merges += ((a, b))
        words = words.map { case (w, (sym, c)) =>
          w -> (refMergeWord(sym, a, b), c)
        }
        round += 1
      }
    }
    (merges.result(), words.map { case (w, (sym, _)) => w -> sym })
  }

  // a corpus small enough to hand-audit but rich enough to force
  // multi-char merges and tie-breaks
  private val corpus = Seq(
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest wide",
    "low new wide lowest newest")

  test("induced merge list equals the reference BPE, merge for merge") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = BpeInduction.induceMerges(docs, "text", nMerges = 12)
    val (want, _) = refBpe(corpus, nMerges = 12)
    got shouldBe want
  }

  test("encode and encodeCorpus both match the reference word encodings") {
    val docs = (corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      // token-less and NULL-text docs: empty encoding on BOTH encoder
      // entry points, never dropped
      Seq((99L, "..."), (100L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    val merges = BpeInduction.induceMerges(docs, "text", nMerges = 12)
    val (_, refWords) = refBpe(corpus, nMerges = 12)
    val perRow = docs
      .select($"doc_id", BpeInduction.encode($"text", merges).as("bpe"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toVector).toMap
    val viaVocab = BpeInduction.encodeCorpus(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toVector).toMap
    corpus.zipWithIndex.foreach { case (text, i) =>
      val want = refTokens(text).flatMap(w => refWords(w)).toVector
      withClue(s"doc $i") {
        perRow(i.toLong) shouldBe want
        viaVocab(i.toLong) shouldBe want
      }
    }
    perRow(99L) shouldBe Vector.empty
    viaVocab(99L) shouldBe Vector.empty
    perRow(100L) shouldBe Vector.empty
    viaVocab(100L) shouldBe Vector.empty
  }

  test("batched induction at roundSize=1 equals the exact algorithm, pick for pick") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    BpeInduction.induceMergesBatched(docs, "text", nMerges = 12,
      roundSize = 1) shouldBe BpeInduction.induceMerges(docs, "text", 12)
  }

  test("batched induction: valid BPE model in ~roundSize× fewer rounds") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fast = BpeInduction.induceMergesBatched(docs, "text",
      nMerges = 12, roundSize = 6)
    fast.size shouldBe 12
    fast.distinct.size shouldBe 12 // no merge learned twice
    // every document's encoding under the fast model reconstructs the
    // original token stream — symbols are a partition of each word
    val enc = BpeInduction.encodeCorpus(docs, "doc_id", "text", fast)
      .join(docs, "doc_id")
      .select(col("doc_id"),
        concat_ws("", col("bpe")).as("joined"),
        concat_ws("", graft.functions.TextFunctions.tokens(col("text")))
          .as("want"))
      .collect()
    enc.foreach(r => r.getString(1) shouldBe r.getString(2))
    // and the fast model genuinely compresses: fewer symbols than
    // characters for the merged words
    val nSyms = BpeInduction.encodeCorpus(docs, "doc_id", "text", fast)
      .selectExpr("sum(size(bpe))").collect().head.getLong(0)
    val nChars = docs
      .select(graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .selectExpr("sum(length(concat_ws('', t)))")
      .collect().head.getLong(0)
    nSyms should be < nChars
    // exact-mode parity of the FIRST pick: the top-count pair can never
    // be deferred by conflict skipping
    fast.head shouldBe BpeInduction.induceMerges(docs, "text", 1).head
  }

  test("mergePair folds left-to-right without overlap, ANSI-safe on short words") {
    def m(sym: Seq[String], a: String, b: String): Seq[String] =
      Seq(sym).toDF("s")
        .select(BpeInduction.mergePair($"s", a, b).as("m"))
        .head.getSeq[String](0)
    m(Seq("a", "b", "c"), "a", "b") shouldBe Seq("ab", "c")
    m(Seq("a", "a", "a"), "a", "a") shouldBe Seq("aa", "a") // no overlap
    m(Seq("a", "a", "b"), "a", "b") shouldBe Seq("a", "ab")
    m(Seq("x"), "a", "b") shouldBe Seq("x") // single symbol
    m(Seq.empty[String], "a", "b") shouldBe Seq.empty
    m(Seq("a", "b", "a", "b"), "a", "b") shouldBe Seq("ab", "ab")
  }

  test("pairCounts weights pairs by word frequency; single-char words contribute none") {
    val words = Seq(
      (Seq("a", "b"), 3L), (Seq("b", "a", "b"), 2L), (Seq("x"), 5L))
      .toDF("symbols", "cnt")
    val got = BpeInduction.pairCounts(words)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("a b" -> 5L, "b a" -> 2L)
  }

  test("saveMerges/loadMerges round-trips the model; encodings identical") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeInduction.induceMerges(docs, "text", nMerges = 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bpe").toString + "/model"
    BpeInduction.saveMerges(spark, merges, path)
    val loaded = BpeInduction.loadMerges(spark, path)
    loaded shouldBe merges
    val a = BpeInduction.encodeCorpus(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val b = BpeInduction.encodeCorpus(docs, "doc_id", "text", loaded)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    b shouldBe a
    an[IllegalArgumentException] should be thrownBy
      BpeInduction.saveMerges(spark, Seq.empty, path + "2")
  }

  test("applyMerges refuses oversized merge lists (expression-tree bound)") {
    val fake = Seq.fill(257)(("a", "b"))
    an[IllegalArgumentException] should be thrownBy
      BpeInduction.applyMerges(lit(Array("a")), fake)
  }
}
