package graft

import graft.operators.CdcRollup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The retraction-capable CDC rollup: cross-batch updates/deletes fold
  * into exact (n, total) group state; versioned buckets make replay
  * exactly-once. */
class CdcRollupSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-cdcr").toString + "/state"

  /** (pk, group, value, seq, op) frame. */
  private def log(rows: (Long, String, Double, Long, String)*): DataFrame =
    rows.toDF("id", "grp", "v", "seq", "op")

  private def fold(root: String, id: Long, d: DataFrame): Boolean =
    CdcRollup.foldBatch(root, id, d, Seq("id"), "seq", "op",
      Seq("grp"), "v", nBaseBuckets = 4, nAggBuckets = 2)

  private def view(root: String): Map[String, (Long, Double)] =
    CdcRollup.readView(spark, root).map(_.collect().map(r =>
      r.getAs[String]("grp") ->
        ((r.getAs[Long]("n"),
          r.getAs[java.math.BigDecimal]("total").doubleValue()))).toMap)
      .getOrElse(Map.empty)

  test("cross-batch insert/update/delete fold to the one-shot GROUP BY " +
      "over the final images; group-moving update retracts exactly") {
    val root = tmpRoot()
    // batch 0: inserts across two groups
    fold(root, 0L, log(
      (1L, "a", 10.0, 1L, "I"), (2L, "a", 20.0, 1L, "I"),
      (3L, "b", 30.0, 1L, "I"))) shouldBe true
    view(root) shouldBe Map("a" -> ((2L, 30.0)), "b" -> ((1L, 30.0)))
    // batch 1: cross-batch UPDATE moving id=2 from group a to b with a
    // new value, and a same-group value update of id=3
    fold(root, 1L, log(
      (2L, "b", 25.0, 2L, "U"), (3L, "b", 31.0, 2L, "U"))) shouldBe true
    view(root) shouldBe Map("a" -> ((1L, 10.0)), "b" -> ((2L, 56.0)))
    // batch 2: cross-batch DELETE of id=1 empties group a entirely —
    // the group must drop out of the view, not linger at n=0
    fold(root, 2L, log((1L, "a", 0.0, 3L, "D"))) shouldBe true
    view(root) shouldBe Map("b" -> ((2L, 56.0)))
    // the base is the SCD1 current-image table
    val base = CdcRollup.readBase(spark, root).get
      .select("id", "grp", "v").orderBy("id")
    rows(base) shouldBe Seq(Seq(2L, "b", 25.0), Seq(3L, "b", 31.0))
  }

  test("replay of a committed batch is a byte-stable no-op; a crashed " +
      "batch's garbage is reaped and refolded") {
    val root = tmpRoot()
    fold(root, 0L, log((1L, "a", 1.0, 1L, "I"))) shouldBe true
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def stateFiles(): Map[String, Long] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(root), true)
      val m = scala.collection.mutable.Map[String, Long]()
      while (it.hasNext) { val st = it.next()
        m += st.getPath.toString -> st.getModificationTime }
      m.toMap
    }
    val before = stateFiles()
    fold(root, 0L, log((9L, "z", 99.0, 1L, "I"))) shouldBe false
    stateFiles() shouldBe before
    // fake a crashed batch 1: an unmarked version dir with garbage —
    // readers never see it, and the real batch 1 reaps + refolds
    val aggB0 = fs.listStatus(new org.apache.hadoop.fs.Path(root, "agg"))
      .head.getPath
    Seq(("zz", 77L)).toDF("grp", "n")
      .write.parquet(new org.apache.hadoop.fs.Path(aggB0, "v1").toString)
    view(root) shouldBe Map("a" -> ((1L, 1.0)))
    fold(root, 1L, log((2L, "a", 2.0, 1L, "I"))) shouldBe true
    view(root) shouldBe Map("a" -> ((2L, 3.0)))
  }

  test("delete/update of a key with no current image contributes " +
      "nothing (out-of-order feeds degrade to upsert, documented); " +
      "an empty batch commits its marker") {
    val root = tmpRoot()
    fold(root, 0L, log((7L, "a", 5.0, 1L, "D"))) shouldBe true
    view(root) shouldBe Map.empty
    // a U with no image is an insert (upsert semantics)
    fold(root, 1L, log((8L, "a", 4.0, 1L, "U"))) shouldBe true
    view(root) shouldBe Map("a" -> ((1L, 4.0)))
    // empty delta: exactly-once marker, no state change
    fold(root, 2L, log().filter(lit(false))) shouldBe true
    fold(root, 2L, log((1L, "x", 1.0, 1L, "I"))) shouldBe false
    view(root) shouldBe Map("a" -> ((1L, 4.0)))
  }

  test("within-batch netting: highest seq wins, net delete retracts; " +
      "retraction arithmetic is decimal-exact under adversarial " +
      "doubles") {
    val root = tmpRoot()
    fold(root, 0L, log(
      (1L, "a", 0.1, 1L, "I"), (1L, "a", 0.2, 2L, "U"), // net: 0.2
      (2L, "a", 0.3, 1L, "I"), (2L, "a", 0.3, 2L, "D"), // net: gone
      (3L, "a", 1e15, 1L, "I"))) shouldBe true
    view(root) shouldBe Map("a" -> ((2L, 1e15 + 0.2)))
    // retract the large value: a double accumulator would leave dust
    // ((0.2 + 1e15) - 1e15 != 0.2 in fp64); decimal state is exact
    fold(root, 1L, log((3L, "a", 0.0, 3L, "D"))) shouldBe true
    view(root) shouldBe Map("a" -> ((1L, 0.2)))
  }

  test("layout pin refuses type drift and bucket-count change; " +
      "compactStateTo collapses versions/markers and re-shards") {
    val root = tmpRoot()
    fold(root, 0L, log((1L, "a", 1.0, 1L, "I"),
      (2L, "b", 2.0, 1L, "I"))) shouldBe true
    fold(root, 1L, log((3L, "b", 3.0, 1L, "I"))) shouldBe true
    // drifted value type (double -> string): refuse loud
    intercept[Exception] {
      CdcRollup.foldBatch(root, 2L,
        Seq((4L, "a", "x", 1L, "I")).toDF("id", "grp", "v", "seq", "op"),
        Seq("id"), "seq", "op", Seq("grp"), "v", 4, 2)
    }.getMessage.toLowerCase should include("layout")
    // changed bucket count: refuse loud (re-shard via compact)
    intercept[Exception] {
      fold2(root, 2L, log((4L, "a", 4.0, 1L, "I")))
    }.getMessage.toLowerCase should include("layout")
    val fresh = root + "_v2"
    CdcRollup.compactStateTo(spark, root, fresh,
      nBaseBuckets = 2, nAggBuckets = 1) shouldBe 2L
    view(fresh) shouldBe view(root)
    // folds continue against the fresh root with its new layout
    CdcRollup.foldBatch(fresh, 1L, log((1L, "a", 0.0, 9L, "D")),
      Seq("id"), "seq", "op", Seq("grp"), "v",
      nBaseBuckets = 2, nAggBuckets = 1) shouldBe true
    view(fresh) shouldBe Map("b" -> ((2L, 5.0)))
    // compacting into an occupied root refuses
    intercept[IllegalArgumentException] {
      CdcRollup.compactStateTo(spark, root, fresh, 2, 1)
    }.getMessage should include("already holds a state")
  }

  private def fold2(root: String, id: Long, d: DataFrame): Boolean =
    CdcRollup.foldBatch(root, id, d, Seq("id"), "seq", "op",
      Seq("grp"), "v", nBaseBuckets = 8, nAggBuckets = 2)

  test("NULL group values merge as ONE group across folds (null-safe " +
      "state merge); NULL pk components refuse loud; reserved payload " +
      "names refuse") {
    val root = tmpRoot()
    def nlog(rows: (Long, Option[String], Double, Long, String)*) =
      rows.toDF("id", "grp", "v", "seq", "op")
    def nfold(id: Long, d: DataFrame) =
      CdcRollup.foldBatch(root, id, d, Seq("id"), "seq", "op",
        Seq("grp"), "v", 4, 2)
    // batch 0 inserts a NULL-group row; batch 1 adds another and
    // updates the first — a join-based merge that treats null != null
    // would split the NULL group into never-merging state rows
    nfold(0L, nlog((1L, None, 10.0, 1L, "I"))) shouldBe true
    nfold(1L, nlog((2L, None, 5.0, 1L, "I"),
      (1L, None, 11.0, 2L, "U"))) shouldBe true
    val got = CdcRollup.readView(spark, root).get.collect()
    got.length shouldBe 1 // ONE NULL-group row, not two
    got.head.isNullAt(0) shouldBe true
    got.head.getAs[Long]("n") shouldBe 2L
    got.head.getAs[java.math.BigDecimal]("total")
      .doubleValue() shouldBe 16.0
    // a NULL pk can never be matched for update/delete: refuse loud
    val e = intercept[IllegalArgumentException] {
      CdcRollup.foldBatch(root, 2L,
        Seq((Option.empty[java.lang.Long], "a", 1.0, 1L, "I"))
          .toDF("id", "grp", "v", "seq", "op"),
        Seq("id"), "seq", "op", Seq("grp"), "v", 4, 2)
    }
    e.getMessage should include("NULL in a pk column")
    // payload columns colliding with state/staging names refuse
    val e2 = intercept[IllegalArgumentException] {
      CdcRollup.foldBatch(tmpRoot(), 0L,
        Seq((1L, "a", 1.0, 7L, 1L, "I"))
          .toDF("id", "grp", "v", "n", "seq", "op"),
        Seq("id"), "seq", "op", Seq("grp"), "v", 4, 2)
    }
    e2.getMessage should include("collide")
  }

  test("bucket isolation: a fold touches ONLY its delta's buckets — " +
      "other buckets keep their version dirs byte-untouched; a stale " +
      "staging dir of the replayed batch is reaped") {
    val root = tmpRoot()
    // ids chosen to hash into different base buckets (verified below)
    fold(root, 0L, log((1L, "a", 1.0, 1L, "I"),
      (2L, "b", 2.0, 1L, "I"))) shouldBe true
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def versions(layer: String): Map[String, Seq[String]] =
      fs.listStatus(new org.apache.hadoop.fs.Path(root, layer)).toSeq
        .map(_.getPath).filter(_.getName.startsWith("bucket="))
        .map(b => b.getName ->
          fs.listStatus(b).toSeq.map(_.getPath.getName).sorted).toMap
    val b0 = versions("base")
    // fold a key hashing into a DIFFERENT bucket than id=1's
    val bucketOf = (id: Long) => spark.range(1).select(
      pmod(xxhash64(lit(id)), lit(4)).cast("int")).head.getInt(0)
    val fresh = (3L to 40L).find(i => bucketOf(i) != bucketOf(1L)).get
    // plant a stale hidden staging dir for batch 1 (a prior crash
    // before any rename): the replay must reap it, not trip on it
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "base/.staging1"))
    fold(root, 1L, log((fresh, "c", 3.0, 1L, "I"))) shouldBe true
    fs.exists(new org.apache.hadoop.fs.Path(root, "base/.staging1")) shouldBe
      false
    val b1 = versions("base")
    // id=1's bucket: version list identical (no new version, no reap)
    val untouched = s"bucket=${bucketOf(1L)}"
    b1(untouched) shouldBe b0(untouched)
    // the fresh key's bucket gained v1
    b1(s"bucket=${bucketOf(fresh)}") should contain("v1")
    view(root) shouldBe Map("a" -> ((1L, 1.0)), "b" -> ((1L, 2.0)),
      "c" -> ((1L, 3.0)))
  }

  test("bucket versions stay bounded: superseded versions are reaped " +
      "after each fold (steady state ~1 version per bucket)") {
    val root = tmpRoot()
    // same key every batch → same buckets rewritten every fold
    (0 until 5).foreach { i =>
      fold(root, i.toLong, log((1L, "a", i.toDouble, 1L, "U"))) shouldBe true
    }
    view(root) shouldBe Map("a" -> ((1L, 4.0)))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    for (layer <- Seq("base", "agg")) {
      val dir = new org.apache.hadoop.fs.Path(root, layer)
      fs.listStatus(dir).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("bucket=")).foreach { b =>
          withClue(s"$layer/${b.getName}: ") {
            fs.listStatus(b).length shouldBe 1 // only the latest version
          }
        }
    }
  }
}
