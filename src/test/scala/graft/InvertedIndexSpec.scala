package graft

import graft.operators.InvertedIndex
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with controlled term frequencies: "alpha" everywhere
  // (low idf), "rare" in two docs (high idf), repeats in doc 3
  private def corpus = Seq(
    (0L, "alpha beta gamma"),
    (1L, "alpha beta beta delta"),
    (2L, "alpha rare delta gamma"),
    (3L, "alpha rare rare rare beta"),
    (4L, "alpha gamma gamma delta epsilon"),
    (5L, "zeta eta theta iota")
  ).toDF("doc_id", "text")

  private def withIndex(name: String, half: Boolean = false)(body: => Unit): Unit = {
    try {
      if (half) {
        InvertedIndex.saveIndex(corpus.filter($"doc_id" % 2 === 0),
          "doc_id", "text", name)
        InvertedIndex.appendToIndex(corpus.filter($"doc_id" % 2 =!= 0),
          "doc_id", "text", name)
      } else InvertedIndex.saveIndex(corpus, "doc_id", "text", name)
      body
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_postings")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_doclen")
    }
  }

  test("termLookup equals a full-corpus posting recomputation") {
    withIndex("graft_inv_t1") {
      val expected = InvertedIndex.postings(corpus, "doc_id", "text")
        .filter($"term".isin("alpha", "rare"))
        .orderBy("term", "doc_id")
      val got = InvertedIndex.termLookup(spark, "graft_inv_t1",
        Seq("alpha", "rare")).orderBy("term", "doc_id")
      rows(got) shouldBe rows(expected)
    }
  }

  test("build+append equals a one-shot build (lookup and bm25)") {
    withIndex("graft_inv_full") {
      val fullLookup = rows(InvertedIndex.termLookup(spark, "graft_inv_full",
        Seq("alpha", "rare", "beta")).orderBy("term", "doc_id"))
      val fullBm25 = rows(InvertedIndex.bm25(spark, "graft_inv_full",
        Seq("rare", "beta"), topK = 10))
      withIndex("graft_inv_half", half = true) {
        rows(InvertedIndex.termLookup(spark, "graft_inv_half",
          Seq("alpha", "rare", "beta")).orderBy("term", "doc_id")) shouldBe fullLookup
        rows(InvertedIndex.bm25(spark, "graft_inv_half",
          Seq("rare", "beta"), topK = 10)) shouldBe fullBm25
      }
    }
  }

  test("a term probe bucket-prunes the posting scan (O(one bucket))") {
    withIndex("graft_inv_prune") {
      val probe = InvertedIndex.termLookup(spark, "graft_inv_prune", Seq("rare"))
      probe.count() shouldBe 2L
      val scan = probe.queryExecution.executedPlan.collectLeaves().head.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(scan)
      assert(m.isDefined, s"no bucket pruning in scan: $scan")
      m.get.group(1).toInt should be < m.get.group(2).toInt
      m.get.group(1).toInt shouldBe 1
    }
  }

  test("compactBucketed collapses an append-accreted index; pruned probe + bm25 unchanged") {
    val name = "graft_inv_compact"
    try {
      // build + 5 appends: each append lands its own files per bucket
      InvertedIndex.saveIndex(corpus.filter($"doc_id" === 0), "doc_id", "text", name)
      (1 to 5).foreach(i => InvertedIndex.appendToIndex(
        corpus.filter($"doc_id" === i), "doc_id", "text", name))
      val before = rows(InvertedIndex.bm25(spark, name, Seq("rare", "beta"),
        topK = 10))
      def files(t: String): Int = {
        val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog
          .getTableMetadata(spark.sessionState.sqlParser
            .parseTableIdentifier(t)).location)
        loc.getFileSystem(spark.sessionState.newHadoopConf())
          .listStatus(loc).count(st => st.isFile &&
            !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
      }
      val accreted = files(s"${name}_postings")
      graft.operators.Maintenance.compactBucketed(spark, s"${name}_postings")
      graft.operators.Maintenance.compactBucketed(spark, s"${name}_doclen")
      files(s"${name}_postings") should be < accreted
      // same answers after the rewrite…
      rows(InvertedIndex.bm25(spark, name, Seq("rare", "beta"),
        topK = 10)) shouldBe before
      // …and the probe still reads O(one bucket) — the compacted table
      // must keep the bucket spec, not just the rows
      val scan = InvertedIndex.termLookup(spark, name, Seq("rare"))
        .queryExecution.executedPlan.collectLeaves().head.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(scan)
      assert(m.isDefined, s"no bucket pruning after compaction: $scan")
      m.get.group(1).toInt shouldBe 1
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_postings")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_doclen")
    }
  }

  test("bm25 ranks tf and idf sensibly and emits a dense 1..k rank") {
    withIndex("graft_inv_rank") {
      val got = InvertedIndex.bm25(spark, "graft_inv_rank", Seq("rare"), topK = 5)
        .collect()
      // only docs containing 'rare' score; doc 3 (tf=3, shorter-ish)
      // beats doc 2 (tf=1)
      got.map(_.getLong(0)).toSeq shouldBe Seq(3L, 2L)
      got.map(_.getLong(2)).toSeq shouldBe Seq(1L, 2L)
      got.map(_.getLong(1)).toSeq shouldBe
        got.map(_.getLong(1)).sorted.reverse.toSeq
      // the common term ranks every doc containing it, none above the
      // rare-term scores for the rare docs' own query
      val common = InvertedIndex.bm25(spark, "graft_inv_rank", Seq("alpha"),
        topK = 10).collect()
      common.map(_.getLong(0)).length shouldBe 5
    }
  }

  test("multi-term bm25 sums quantized per-term scores order-independently") {
    withIndex("graft_inv_multi") {
      val both = InvertedIndex.bm25(spark, "graft_inv_multi",
        Seq("rare", "beta"), topK = 10).collect()
      val flipped = InvertedIndex.bm25(spark, "graft_inv_multi",
        Seq("beta", "rare"), topK = 10).collect()
      both.map(_.toSeq).toSeq shouldBe flipped.map(_.toSeq).toSeq
      // doc 3 holds rare(tf=3) AND beta → top
      both.head.getLong(0) shouldBe 3L
    }
  }
}
