package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteSelf(df: org.apache.spark.sql.DataFrame, d: Int) = {
    val a = df.toDF("id_a", "sa")
    val b = df.toDF("id_b", "sb")
    a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("dist", levenshtein($"sa", $"sb").cast("long"))
      .filter($"dist" <= d)
      .select("id_a", "id_b", "dist")
  }

  test("selfJoin(maxDist=1) equals the brute-force cross join") {
    val names = Seq(
      (1L, "martha"), (2L, "marhta"),  // transposition = distance 2: OUT at d=1
      (3L, "marta"),                   // deletion of 'h': 1 from martha
      (4L, "mart"), (5L, "smart"),     // mart<->smart insert: 1
      (6L, "xylophone"), (7L, "bob"), (8L, "bib"), (9L, "bob")
    ).toDF("id", "name")
    val got = rows(FuzzyJoin.selfJoin(names, "id", "name", maxDist = 1)
      .orderBy("id_a", "id_b"))
    val want = rows(bruteSelf(names.toDF("id", "s"), 1).orderBy("id_a", "id_b"))
    got shouldBe want
    // sanity on content: the duplicate pair is distance 0, marta~mart 1
    want.map(r => (r(0), r(1), r(2))) should contain allOf
      ((7L, 9L, 0L), (3L, 4L, 1L), (4L, 5L, 1L))
  }

  test("selfJoin(maxDist=2) catches transpositions via the exact verify") {
    val names = Seq(
      (1L, "martha"), (2L, "marhta"), (3L, "zzzzzz"), (4L, "library"),
      (5L, "librari"), (6L, "libary")
    ).toDF("id", "name")
    val got = rows(FuzzyJoin.selfJoin(names, "id", "name", maxDist = 2)
      .orderBy("id_a", "id_b"))
    val want = rows(bruteSelf(names.toDF("id", "s"), 2).orderBy("id_a", "id_b"))
    got shouldBe want
    want.map(r => (r(0), r(1))) should contain((1L, 2L)) // the transposition
  }

  test("selfJoin equals brute force on a pseudo-random corpus (d=1 and d=2)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd" // small alphabet → dense near-matches
    val strs = (0 until 300).map(i =>
      (i.toLong, (0 until (3 + rnd.nextInt(5)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString))
    val df = strs.toDF("id", "name")
    Seq(1, 2).foreach { d =>
      val got = rows(FuzzyJoin.selfJoin(df, "id", "name", maxDist = d)
        .orderBy("id_a", "id_b"))
      val want = rows(bruteSelf(strs.toDF("id", "s"), d).orderBy("id_a", "id_b"))
      withClue(s"maxDist=$d: ") { got shouldBe want }
    }
  }

  test("two-sided join matches across frames; NULLs never match") {
    val left = Seq((1L, "acme corp"), (2L, "globex"), (3L, null))
      .toDF("lid", "name")
    val right = Seq((10L, "acme corp."), (20L, "initech"), (30L, null))
      .toDF("rid", "name")
    val got = rows(FuzzyJoin.join(left, "lid", "name",
      right, "rid", "name", maxDist = 1).orderBy("left_id", "right_id"))
    got shouldBe Seq(Seq(1L, 10L, 1L))
  }

  test("plan: no cartesian product; only hashed variants cross the shuffle") {
    val df = Seq((1L, "abc"), (2L, "abd")).toDF("id", "name")
    val plan = FuzzyJoin.selfJoin(df, "id", "name")
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // every join is an equi-join (variant hash or id) — the optimized
    // plan's join conditions never degrade to a filterless cross
    val optimized = FuzzyJoin.selfJoin(df, "id", "name")
      .queryExecution.optimizedPlan.toString
    optimized should not include "Join Cross"
  }

  test("duplicate ids emit one pair with the MINIMUM distance (deterministic)") {
    val df = Seq((1L, "abc"), (1L, "abd"), (2L, "abc")).toDF("id", "name")
    val got = rows(FuzzyJoin.selfJoin(df, "id", "name", maxDist = 1)
      .orderBy("id_a", "id_b"))
    // (1,2) appears ONCE; best match is abc~abc = 0 (abd~abc would be 1)
    got shouldBe Seq(Seq(1L, 2L, 0L))
  }

  test("two-sided join caps hot variants on BOTH sides") {
    // left has the hot placeholder, right is small: a right-only guard
    // would let |left-bucket| x |right-bucket| explode
    val left = (0 until 40).map(i => (i.toLong, "n/a")).toDF("lid", "name")
    val right = Seq((100L, "n/a"), (200L, "real name")).toDF("rid", "name")
    FuzzyJoin.join(left, "lid", "name", right, "rid", "name",
      maxDist = 1, maxBucket = 10).count() shouldBe 0L
    // generous cap: all 40 left rows match the right "n/a"
    FuzzyJoin.join(left, "lid", "name", right, "rid", "name",
      maxDist = 1, maxBucket = 100).count() shouldBe 40L
  }

  test("length prefilter cuts merged-bucket candidates at equal recall") {
    // Inside a TRUE variant bucket every pairwise length gap is <= d by
    // construction, so the prefilter's work is exactly the buckets the
    // hashing can merge. Degrade the hash seam to 2 buckets — forcing
    // unrelated variants together — and pin that (a) the prefilter
    // measurably shrinks the candidate set, (b) every true pair
    // survives it (the prune is a necessary condition of d-proximity).
    val df = Seq(
      (1L, "ab"), (2L, "ac"),                       // true pair, len 2
      (3L, "wxyzabcdef"), (4L, "wxyzabcdeg"),       // true pair, len 10
      (5L, "q"), (6L, "qrstuv"), (7L, "mnopqrstu")
    ).toDF("id", "name")
    val degraded: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      v => pmod(xxhash64(v), lit(2))
    def cand(pre: Boolean) = FuzzyJoin.selfCandidates(
      df, "id", "name", maxDist = 1, maxBucket = 10000,
      keyHash = degraded, lengthPrefilter = pre)
    val unfiltered = cand(pre = false).count()
    val filtered = cand(pre = true).count()
    assert(filtered < unfiltered,
      s"prefilter cut nothing: $filtered vs $unfiltered")
    // equal recall: the surviving candidates still cover every true pair
    val truePairs = rows(bruteSelf(df.toDF("id", "s"), 1)
      .select("id_a", "id_b"))
    val kept = rows(cand(pre = true))
    truePairs.foreach(p => kept should contain(p))
  }

  test("two-sided admission is the pair PRODUCT, not per-side size") {
    // 9 x 9 hot bucket = 81 candidate pairs: per-side caps of 10 would
    // read as engaged while admitting all 81; the product cap rejects
    // at maxBucket=80 and admits at 81.
    val left = (0 until 9).map(i => (i.toLong, "dup")).toDF("lid", "name")
    val right = (0 until 9).map(i => (100L + i, "dup")).toDF("rid", "name")
    FuzzyJoin.join(left, "lid", "name", right, "rid", "name",
      maxDist = 1, maxBucket = 80).count() shouldBe 0L
    FuzzyJoin.join(left, "lid", "name", right, "rid", "name",
      maxDist = 1, maxBucket = 81).count() shouldBe 81L
  }

  test("skew guard passes oversized variant buckets through uncompared") {
    // 50 identical strings → one hot bucket; cap below its size
    val df = (0 until 50).map(i => (i.toLong, "same")).toDF("id", "name")
    FuzzyJoin.selfJoin(df, "id", "name", maxDist = 1, maxBucket = 10)
      .count() shouldBe 0L
    // and with a generous cap, all 50*49/2 distance-0 pairs emerge
    FuzzyJoin.selfJoin(df, "id", "name", maxDist = 1, maxBucket = 100)
      .count() shouldBe 1225L
  }
}
