package graft

/** SQL surface of the native expressions, registered via
  * SparkSessionExtensions (graft.GraftExtensions, wired into
  * [[Sessions.builder]]). */
class ExtensionsSpec extends SparkSpec {

  test("native expressions are callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  simhash64(array('hello', 'world')) AS sh,
        |  minhash_sig(array('a b c'), 4) AS mh,
        |  shingle_set(array('a','b','c','d'), 3) AS sg,
        |  cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs
        |""".stripMargin).collect().head
    r.getLong(0) should not be 0L
    r.getSeq[Long](1).length shouldBe 4
    r.getSeq[String](2).toSeq shouldBe Seq("a b c", "b c d")
    r.getDouble(3) shouldBe 1.0 +- 1e-12
    spark.sql("SELECT token_split(lower('Hello, World!')) AS t")
      .collect().head.getSeq[String](0).toSeq shouldBe Seq("hello", "world")
    // round-8 registrations: NFC normalization + deflate size
    val r8 = spark.sql(
      """SELECT nfc_normalize('café') AS nfc,
        |       deflate_length(repeat('abc', 100)) AS dl,
        |       deflate_length('') AS dl0""".stripMargin).collect().head
    r8.getString(0) shouldBe "café"
    r8.getLong(1) should be < 300L // 300 bytes of repetition compress
    r8.getLong(2) should be > 0L // empty input still emits a block
  }

  test("SQL results agree with the Column API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaSql = spark.sql(
      "SELECT simhash64(array('the','quick','fox'))").collect().head.getLong(0)
    val viaApi = Seq("the quick fox").toDF("text")
      .select(graft.operators.Dedup.simhash(col("text")))
      .collect().head.getLong(0)
    viaSql shouldBe viaApi
  }

  test("composed operators are callable from SQL (redact_pii, bpe_piece_count, hash_bucket)") {
    spark.sql("SELECT redact_pii('mail a@b.co now')")
      .collect().head.getString(0) shouldBe "mail <EMAIL> now"
    spark.sql("SELECT bpe_piece_count(\"don't stop\")")
      .collect().head.getLong(0) shouldBe 3L
    val viaSql = spark.sql("SELECT hash_bucket(42, 100)")
      .collect().head.getLong(0)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val viaApi = Seq(42L).toDF("id")
      .select(graft.operators.Sampling.hashBucket(col("id"), 100))
      .collect().head.getLong(0)
    viaSql shouldBe viaApi
  }

  test("approx_distinct_lc works as a SQL aggregate") {
    spark.range(1000).createOrReplaceTempView("graft_ext_range")
    val est = spark.sql(
      "SELECT approx_distinct_lc(xxhash64(id)) FROM graft_ext_range")
      .collect().head.getLong(0)
    math.abs(est - 1000).toDouble / 1000 should be <= 0.05
  }

  test("frequent_items_sketch and vector_avg work as SQL aggregates") {
    spark.sql("SELECT explode(frequent_items_sketch(t, 8)) FROM " +
        "(SELECT explode(array('a','a','a','b')) AS t)")
      .collect().map(_.getStruct(0).getString(0)).toSeq should
      contain inOrder("a", "b")
    spark.sql("SELECT vector_avg(v, 2) FROM " +
        "(SELECT explode(array(array(1.0d, 3.0d), array(3.0d, 5.0d))) AS v)")
      .collect().head.getSeq[Double](0) shouldBe Seq(2.0, 4.0)
  }
}
