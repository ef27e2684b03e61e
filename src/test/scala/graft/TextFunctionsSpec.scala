package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c.as("v")).collect().head.get(0)

  private def oneD(c: org.apache.spark.sql.Column, text: String): Double =
    one(c, text).asInstanceOf[Double]

  test("tokens: lowercased alphanumeric, empties dropped") {
    one(tokens(col("text")), "Hello, World! 42 foo_bar")
      .asInstanceOf[scala.collection.Seq[String]].toSeq shouldBe
      Seq("hello", "world", "42", "foo", "bar")
    one(tokenCount(col("text")), "") shouldBe 0L
  }

  test("distinctTokenRatio and meanTokenLen") {
    oneD(distinctTokenRatio(col("text")), "a a b") shouldBe (2.0 / 3) +- 1e-12
    oneD(meanTokenLen(col("text")), "ab cdef") shouldBe 3.0 +- 1e-12
    oneD(meanTokenLen(col("text")), "") shouldBe 0.0
  }

  test("punctCount counts only the fixed set") {
    one(punctCount(col("text")), "a.b,c!d?e;f:g-h") shouldBe 6L
  }

  test("stopwordRatio") {
    oneD(stopwordRatio(col("text")), "the cat is on a mat") shouldBe (4.0 / 6) +- 1e-12
  }

  test("qualityScore in [0,1]; higher for clean prose than punct soup") {
    val clean = one(qualityScore(col("text")),
      "A reasonably long sentence with varied vocabulary and structure flows well.")
      .asInstanceOf[Double]
    val soup = one(qualityScore(col("text")), "!!!...;;;:::,,,???")
      .asInstanceOf[Double]
    clean should be > soup
    clean should (be >= 0.0 and be <= 1.0)
    soup should (be >= 0.0 and be <= 1.0)
  }

  test("langId picks the dominant stopword language") {
    one(langId(col("text")), "the cat is on the mat and it is happy") shouldBe "en"
    one(langId(col("text")), "der hund ist nicht mit der katze und das haus") shouldBe "de"
    one(langId(col("text")), "el perro y la casa de los vecinos que ladra") shouldBe "es"
    one(langId(col("text")), "le chat est dans les maisons et un jardin") shouldBe "fr"
  }

  test("token counts at all three granularities") {
    // "don't stop, it's 42 tokens!" → ws: 5 words; alnum: don t stop
    // it s 42 tokens = 7; bpe pieces: don|'t| stop|,| it|'s| 42|
    // | tokens|! = 9
    val s = "don't stop, it's 42 tokens!"
    one(whitespaceTokenCount(col("text")), s) shouldBe 5L
    one(tokenCount(col("text")), s) shouldBe 7L
    one(bpePieceCount(col("text")), s) shouldBe 9L
    one(whitespaceTokenCount(col("text")), "   ") shouldBe 0L
    one(bpePieceCount(col("text")), "") shouldBe 0L
  }

  test("truncateTokens keeps the first N tokens, space-joined") {
    one(truncateTokens(col("text"), 3), "The quick, brown FOX jumps") shouldBe
      "the quick brown"
    one(truncateTokens(col("text"), 10), "two words") shouldBe "two words"
    one(truncateTokens(col("text"), 3), "") shouldBe ""
  }

  test("chunkTokens: overlapping windows cover every token; short docs chunk whole") {
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val got = one(chunkTokens(col("text"), 8, 2), text)
      .asInstanceOf[scala.collection.Seq[String]]
    got.length shouldBe 3 // starts 1, 7, 13 (step 6, up to len-overlap=18)
    got.head shouldBe (1 to 8).map(i => s"w$i").mkString(" ")
    got(1) shouldBe (7 to 14).map(i => s"w$i").mkString(" ")
    got.last shouldBe (13 to 20).map(i => s"w$i").mkString(" ")
    // consecutive chunks share `overlap` tokens
    got.head.split(" ").takeRight(2) shouldBe got(1).split(" ").take(2)
    // every token appears in some chunk
    got.flatMap(_.split(" ")).toSet shouldBe (1 to 20).map(i => s"w$i").toSet
    // short doc → one whole chunk
    one(chunkTokens(col("text"), 8, 2), "only three tokens")
      .asInstanceOf[scala.collection.Seq[String]] shouldBe Seq("only three tokens")
  }

  test("redactPii scrubs emails and phone-shaped runs, leaves prose alone") {
    one(redactPii(col("text")),
      "mail me at jo.doe+x@sub.example.org or call +1 (555) 123-4567 ok") shouldBe
      "mail me at <EMAIL> or call <PHONE> ok"
    one(redactPii(col("text")), "no pii here, just 42 and 3.14") shouldBe
      "no pii here, just 42 and 3.14"
  }

  test("deflateLength: byte-exact vs java.util.zip; repetition compresses, noise doesn't") {
    import graft.functions.HashFunctions
    def ref(t: String): Long = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.BEST_COMPRESSION, true)
      try {
        d.setInput(t.getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](8192)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        n
      } finally d.end()
    }
    val texts = Seq("", "a", "hello world",
      "spam spam spam " * 50, // heavy repetition
      (1 to 400).map(i => ((i * 2654435761L % 97) + 30).toChar).mkString, // noisy
      "café 中文 multi-byte")
    val got = texts.toDF("text")
      .select(HashFunctions.deflateLength(col("text")).as("n"))
      .collect().map(_.getLong(0))
    got.toSeq shouldBe texts.map(ref)
    // the signal itself: repeated text compresses far below its size,
    // and far below equally-long diverse text
    val rep = "the same sentence again and again. " * 30
    val repLen = ref(rep)
    repLen.toDouble / rep.getBytes("UTF-8").length should be < 0.1
    // partitioning independence (pure row function)
    val df = (1 to 500).map(i => s"doc $i " + ("x" * (i % 37))).toDF("text")
    val a = df.select(HashFunctions.deflateLength(col("text"))).collect()
    val b = df.repartition(13)
      .select(HashFunctions.deflateLength(col("text"))).collect()
    a.map(_.getLong(0)).sorted shouldBe b.map(_.getLong(0)).sorted
  }

  test("stripHtml: blocks removed whole, tags dropped, entities decoded, ws collapsed") {
    import graft.functions.TextFunctions
    def strip(h: String): String =
      Seq(h).toDF("t").select(TextFunctions.stripHtml(col("t")))
        .head.getString(0)
    strip("<html><body><h1>Title</h1><p>hello <b>bold</b> world</p></body></html>") shouldBe
      "Title hello bold world"
    // script/style contents never leak into prose
    strip("<style>p{x:1}</style>keep<script>var a=1;</script>me") shouldBe "keep me"
    // case-insensitive, attributes, multiline blocks
    strip("<SCRIPT type=\"x\">\nline1\nline2\n</SCRIPT>after") shouldBe "after"
    // comments removed, entities decoded, &amp; decoded LAST
    strip("a<!-- hidden -->b &amp;lt; c &lt;tag&gt; &quot;q&quot; it&#39;s") shouldBe
      "a b &lt; c <tag> \"q\" it's"
    // unclosed block is not a block: tag strips, content surfaces as
    // text (documented contract — quality filters are the backstop)
    strip("before<script>oops") shouldBe "before oops"
    // plain text untouched
    strip("no markup at all") shouldBe "no markup at all"
  }

  test("repetition fractions: sorted run-length max matches hand counts") {
    // "go go go stop": top token 'go' 3/4; bigrams [go go, go go,
    // go stop] → top 'go go' 2/3
    oneD(topTokenFraction(col("text")), "go go go stop") shouldBe 0.75
    oneD(topBigramFraction(col("text")), "go go go stop") shouldBe 2.0 / 3.0
    // all-distinct prose: token frac 1/n, bigram frac 1/(n-1)
    oneD(topTokenFraction(col("text")), "one two three four") shouldBe 0.25
    oneD(topBigramFraction(col("text")), "one two three four") shouldBe 1.0 / 3.0
    // degenerate docs: empty and single-token
    oneD(topTokenFraction(col("text")), "") shouldBe 0.0
    oneD(topBigramFraction(col("text")), "solo") shouldBe 0.0
  }

  test("gopherKeep composes length, diversity, repetition, stopword gates") {
    val varied = (1 to 30).map(i => s"w$i").mkString(" ") + " the of and"
    one(gopherKeep(col("text")), varied) shouldBe true
    // too short
    one(gopherKeep(col("text")), "the of and") shouldBe false
    // repetitive: one bigram dominates
    one(gopherKeep(col("text")),
      ("spam ham " * 20) + (1 to 10).map(i => s"w$i").mkString(" ") +
        " the of and") shouldBe false
    // no stopwords (non-English-looking)
    one(gopherKeep(col("text")),
      (1 to 30).map(i => s"w$i").mkString(" ")) shouldBe false
  }

  test("fingerprint is md5 hex; rollingHash deterministic and order-sensitive") {
    one(fingerprint(col("text")), "abc") shouldBe "900150983cd24fb0d6963f7d28e17f72"
    val h1 = one(rollingHash(col("text")), "abc")
    val h2 = one(rollingHash(col("text")), "abc")
    val h3 = one(rollingHash(col("text")), "acb")
    h1 shouldBe h2
    h1 should not be h3
  }

  test("nfcNormalize composes decomposed sequences; NFC/ASCII text unchanged") {
    import graft.functions.HashFunctions.nfcNormalize
    one(nfcNormalize(col("text")), "cafe\u0301") shouldBe "caf\u00e9"
    one(nfcNormalize(col("text")), "caf\u00e9") shouldBe "caf\u00e9"
    one(nfcNormalize(col("text")), "plain ascii") shouldBe "plain ascii"
    one(nfcNormalize(col("text")), "") shouldBe ""
    // dedup consequence: composed and decomposed forms fingerprint
    // identically AFTER normalization, differently before
    import org.apache.spark.sql.functions.md5
    one(md5(nfcNormalize(col("text"))), "cafe\u0301") shouldBe
      one(md5(nfcNormalize(col("text"))), "caf\u00e9")
    one(md5(col("text")), "cafe\u0301") should not be
      one(md5(col("text")), "caf\u00e9")
  }

  // ---- hashed-feature linear model ---------------------------------

  /** JVM-side reference of LinearModel's md5 bucket + Knuth weight. */
  private def refScore(text: String, dim: Int): Long = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    toks.map { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val b = java.lang.Long.parseLong(hex, 16) % dim
      b * 2654435761L % 1000003L - 500001L
    }.sum
  }

  test("hashedLinearScoreQ matches the JVM reference; empty text scores 0") {
    import graft.functions.LinearModel
    for (t <- Seq("Hello, World! 42", "the quick brown fox", "", "  ", "a"))
      withClue(s"text='$t'") {
        one(LinearModel.hashedLinearScoreQ(col("text"), 4096), t) shouldBe
          refScore(t, 4096)
      }
  }

  test("linearScoreQ with explicit weights sums the bucketed entries") {
    import graft.functions.LinearModel
    // dim=4: every token's contribution is weightsQ(bucket)
    val weights = Array(10L, -20L, 300L, 4000L)
    val text = "alpha beta gamma alpha"
    val toks = Seq("alpha", "beta", "gamma", "alpha")
    val expected = toks.map { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      weights((java.lang.Long.parseLong(hex, 16) % 4).toInt)
    }.sum
    one(LinearModel.linearScoreQ(col("text"), weights), text) shouldBe expected
    one(LinearModel.linearScoreQ(col("text"), weights), "") shouldBe 0L
  }

  test("trainPosteriorWeightsQ: exact smoothed-posterior weights, unseen = 0") {
    import graft.functions.LinearModel
    // dim large enough that these tokens land in distinct buckets
    val dim = 4096
    def bucket(t: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      (java.lang.Long.parseLong(hex, 16) % dim).toInt
    }
    // "good" appears 3× in positive docs; "bad" 2× in negative docs;
    // "both" once in each class
    val labeled = Seq(
      ("good good both", true),
      ("good", true),
      ("bad both", false),
      ("bad", false)).toDF("text", "label")
    val w = LinearModel.trainPosteriorWeightsQ(labeled, "text", "label", dim)
    w.length shouldBe dim
    def expect(pos: Long, n: Long): Long = (pos + 1) * 1000003L / (n + 2) - 500001L
    w(bucket("good")) shouldBe expect(3, 3)  // strongly positive
    w(bucket("bad")) shouldBe expect(0, 2)   // strongly negative
    w(bucket("both")) shouldBe expect(1, 2)  // balanced: exactly 0
    w(bucket("both")) shouldBe 0L
    w(bucket("unseen-token-zzz")) shouldBe 0L // prior = 0 by recentering
    // end-to-end: trained weights separate the classes they were fit on
    val scored = labeled.select(col("label"),
      LinearModel.linearScoreQ(col("text"), w).as("s")).collect()
    scored.foreach(r => (r.getLong(1) > 0) shouldBe r.getBoolean(0))
  }

  test("weight model save/load round-trip; dim-mismatch refused") {
    import graft.functions.LinearModel
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    val w = Array(5L, 0L, -7L, 123L)
    LinearModel.saveWeightsQ(spark, w, s"$dir/model")
    LinearModel.loadWeightsQ(spark, s"$dir/model").toSeq shouldBe w.toSeq
    LinearModel.loadWeightsQ(spark, s"$dir/model", 4).toSeq shouldBe w.toSeq
    intercept[IllegalArgumentException] {
      LinearModel.loadWeightsQ(spark, s"$dir/model", 4096)
    }
  }

  test("linear model plan is pure codegen'd expressions — no UDF, no explode") {
    import graft.functions.LinearModel
    val plan = Seq("a b c").toDF("text")
      .select(LinearModel.hashedLinearScoreQ(col("text"), 64).as("s"))
      .queryExecution.executedPlan.toString()
    plan should not include "BatchEvalPython"
    plan.toLowerCase should not include "scalaudf"
    plan should not include "Generate"
  }

  test("isotonicCalibrate: PAVA pools violators to the weighted mean") {
    import spark.implicits._
    import graft.functions.LinearModel.isotonicCalibrate
    // rates 0.2, 0.6, 0.4, 0.8: bins 2 and 3 violate and pool to
    // (6+4)/(10+10) = 0.5; ends untouched
    val bins = Seq((1L, 10L, 2L), (2L, 10L, 6L), (3L, 10L, 4L),
      (4L, 10L, 8L)).toDF("bin", "n", "p")
    val got = isotonicCalibrate(bins, "bin", "n", "p").collect()
    got.map(_.getDouble(4)) shouldBe Array(0.2, 0.5, 0.5, 0.8)
    got.map(_.getDouble(3)) shouldBe Array(0.2, 0.6, 0.4, 0.8)
    // cascade: a strictly decreasing table pools to ONE global rate
    val desc = Seq((1L, 4L, 4L), (2L, 4L, 2L), (3L, 4L, 0L))
      .toDF("bin", "n", "p")
    isotonicCalibrate(desc, "bin", "n", "p").collect()
      .map(_.getDouble(4)) shouldBe Array.fill(3)(0.5)
    // weighted: the heavy bin dominates its pool
    val wtd = Seq((1L, 90L, 90L), (2L, 10L, 0L)).toDF("bin", "n", "p")
    isotonicCalibrate(wtd, "bin", "n", "p").collect()
      .map(_.getDouble(4)) shouldBe Array.fill(2)(0.9)
    // already-monotone input is untouched (equal rates stay split)
    val mono = Seq((1L, 5L, 1L), (2L, 5L, 1L), (3L, 5L, 4L))
      .toDF("bin", "n", "p")
    isotonicCalibrate(mono, "bin", "n", "p").collect()
      .map(_.getDouble(4)) shouldBe Array(0.2, 0.2, 0.8)
  }

  test("isotonicCalibrate refuses bad bins and caps the collect") {
    import spark.implicits._
    import graft.functions.LinearModel.isotonicCalibrate
    val ok = Seq((1L, 5L, 1L)).toDF("bin", "n", "p")
    an[IllegalArgumentException] should be thrownBy
      isotonicCalibrate(Seq((1L, 0L, 0L)).toDF("bin", "n", "p"),
        "bin", "n", "p")
    an[IllegalArgumentException] should be thrownBy
      isotonicCalibrate(Seq((1L, 5L, 6L)).toDF("bin", "n", "p"),
        "bin", "n", "p")
    an[IllegalArgumentException] should be thrownBy
      isotonicCalibrate(ok.unionAll(ok), "bin", "n", "p") // dup bins
    an[IllegalArgumentException] should be thrownBy
      isotonicCalibrate(
        (1 to 50).map(i => (i.toLong, 5L, 1L)).toDF("bin", "n", "p"),
        "bin", "n", "p", maxBins = 49) // grid over the cap: loud
    // unsorted arrival is sorted by bin before fitting
    val shuffled = Seq((3L, 5L, 0L), (1L, 5L, 5L), (2L, 5L, 2L))
      .toDF("bin", "n", "p").repartition(3)
    isotonicCalibrate(shuffled, "bin", "n", "p").collect()
      .map(r => (r.getLong(0), r.getDouble(4))) shouldBe
      Array((1L, 7.0 / 15.0), (2L, 7.0 / 15.0), (3L, 7.0 / 15.0))
  }
}
