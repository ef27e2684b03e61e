package graft

import graft.operators.Load

/** The merge-family operators against the reference's golden upsert
  * fixture (simple.csv / simple_increment.csv / simple_merged.csv —
  * FIXTURES.md §1, reference tests/Keboola/Writer/RedshiftTest.php:181-219)
  * plus seeded randomized law checks the reference never had (SURVEY §5).
  */
class LoadSpec extends SparkSpec {
  import spark.implicits._

  // simple.csv: ids 0-8, id 7 glasses="yes"
  private def target =
    (0 to 8).map(i => (i, s"name$i", if (i == 7) "yes" else "no"))
      .toDF("id", "name", "glasses")

  // simple_increment.csv: ids 7-10; id 7 glasses="no" (update), 9-10 new
  private def stage =
    Seq((7, "name7", "no"), (8, "name8", "no"), (9, "name9", "yes"),
      (10, "name10", "no")).toDF("id", "name", "glasses")

  test("upsert matches the reference's simple_merged golden semantics") {
    val merged = Load.upsert(target, stage, Seq("id")).orderBy("id")
    val got = rows(merged)
    got.map(_.head) shouldBe (0 to 10)
    // stage wins for id 7 (the golden fixture's witness row)
    got.find(_.head == 7).get(2) shouldBe "no"
    // stage rows 9-10 appended
    got.find(_.head == 9).get(2) shouldBe "yes"
    // untouched target rows survive
    got.find(_.head == 3).get(2) shouldBe "no"
  }

  test("upsert with no PK is a plain append (Redshift.php:169 guard)") {
    Load.upsert(target, stage, Nil).count() shouldBe (9 + 4)
  }

  test("newRows = staging PKs absent from target (J2)") {
    rows(Load.newRows(stage, target, Seq("id")).orderBy("id"))
      .map(_.head) shouldBe Seq(9, 10)
  }

  test("updateJoin = staging rows whose PK matches target, stage values (J1)") {
    val got = rows(Load.updateJoin(target, stage, Seq("id")).orderBy("id"))
    got.map(_.head) shouldBe Seq(7, 8)
    got.find(_.head == 7).get(2) shouldBe "no"
  }

  test("upsert on composite PK") {
    val t = Seq((1, "a", 10), (1, "b", 20), (2, "a", 30)).toDF("k1", "k2", "v")
    val s = Seq((1, "b", 99), (3, "c", 40)).toDF("k1", "k2", "v")
    val got = rows(Load.upsert(t, s, Seq("k1", "k2")).orderBy("k1", "k2"))
    got shouldBe Seq(Seq(1, "a", 10), Seq(1, "b", 99), Seq(2, "a", 30),
      Seq(3, "c", 40))
  }

  test("dedupLastWins keeps exactly one row per PK, ordered desc") {
    val df = Seq((1, 10L, "old"), (1, 20L, "new"), (2, 5L, "only"))
      .toDF("id", "ts", "v")
    val got = rows(Load.dedupLastWins(df, Seq("id"), Seq("ts")).orderBy("id"))
    got shouldBe Seq(Seq(1, 20L, "new"), Seq(2, 5L, "only"))
  }

  test("null PKs never match (SQL join semantics, like Redshift's UPDATE join)") {
    val t = Seq((Some(1), "t1"), (None, "t-null")).toDF("id", "v")
    val s = Seq((Some(1), "s1"), (None, "s-null")).toDF("id", "v")
    val got = rows(Load.upsert(t, s, Seq("id")).orderBy("v"))
    // null-keyed rows on both sides survive: null = null is not a match
    got.map(_(1)) shouldBe Seq("s-null", "s1", "t-null")
  }

  // Seeded randomized law checks: unique PKs per side (the operator
  // contract; dup-PK staging is the reference's documented
  // nondeterminism, fixed by dedupLastWins).
  private def randomTables(seed: Long) = {
    val rnd = new scala.util.Random(seed)
    def gen() = List.fill(30)((rnd.nextInt(16), rnd.nextInt(1000)))
      .distinctBy(_._1)
    (gen(), gen())
  }

  test("law: upsert is idempotent — upsert(upsert(t,s),s) == upsert(t,s)") {
    for (seed <- 1L to 10L) {
      val (t0, s0) = randomTables(seed)
      val t = t0.toDF("id", "v"); val s = s0.toDF("id", "v")
      val once = Load.upsert(t, s, Seq("id"))
      val twice = Load.upsert(once, s, Seq("id"))
      rows(twice.orderBy("id", "v")) shouldBe rows(once.orderBy("id", "v"))
    }
  }

  test("law: upsert preserves PK uniqueness, covers both key sets, stage wins") {
    for (seed <- 11L to 20L) {
      val (t0, s0) = randomTables(seed)
      val out = Load.upsert(t0.toDF("id", "v"), s0.toDF("id", "v"), Seq("id"))
        .collect().map(r => r.getInt(0) -> r.getInt(1))
      val keys = out.map(_._1)
      keys.distinct.length shouldBe keys.length
      keys.toSet shouldBe (t0.map(_._1) ++ s0.map(_._1)).toSet
      val byKey = out.toMap
      s0.foreach { case (k, v) => byKey(k) shouldBe v }
    }
  }

  // deterministic fact rows with overlapping keys across batches
  private def facts = (1 to 300)
    .map(i => (i.toLong, (i % 7).toString, (i % 13) * 1.5))
    .toDF("rid", "k", "v")

  test("IncrementalAgg: folded batches equal the one-shot aggregate, any batch order") {
    import graft.operators.IncrementalAgg
    import org.apache.spark.sql.functions._
    val oneShot = IncrementalAgg.finalizeState(
      IncrementalAgg.partialState(facts, Seq("k"), "v"), Seq("k"))
      .orderBy("k")
    def folded(order: Seq[Int]) = {
      def slice(i: Int) = facts.filter(col("rid") % 3 === i)
      val st = order.tail.foldLeft(
        IncrementalAgg.partialState(slice(order.head), Seq("k"), "v"))(
        (s, i) => IncrementalAgg.mergeState(s, slice(i), Seq("k"), "v"))
      IncrementalAgg.finalizeState(st, Seq("k")).orderBy("k")
    }
    rows(folded(Seq(0, 1, 2))) shouldBe rows(oneShot)
    // commutativity: a different arrival order yields the same state
    rows(folded(Seq(2, 0, 1))) shouldBe rows(oneShot)
  }

  test("law: IncrementalAgg fold equals one-shot under random data and random partitioning") {
    import graft.operators.IncrementalAgg
    for (seed <- 1L to 5L) {
      val rnd = new scala.util.Random(seed)
      val data = (1 to 200).map { i =>
        (i.toLong, rnd.nextInt(9).toString,
          // mixed magnitudes incl. values at the 1e-6 quantum edge
          (rnd.nextInt(2000000) - 1000000) / 1e6 * math.pow(10, rnd.nextInt(4)))
      }
      val nBatches = 2 + rnd.nextInt(4)
      val cuts = data.map(_ => rnd.nextInt(nBatches))
      val df = data.toDF("rid", "k", "v")
      val oneShot = IncrementalAgg.finalizeState(
        IncrementalAgg.partialState(df, Seq("k"), "v"), Seq("k"))
        .orderBy("k")
      val batches = (0 until nBatches).map { b =>
        data.zip(cuts).collect { case (row, c) if c == b => row }
          .toDF("rid", "k", "v")
      }.filter(!_.isEmpty)
      val st = batches.tail.foldLeft(
        IncrementalAgg.partialState(batches.head, Seq("k"), "v"))(
        (s, b) => IncrementalAgg.mergeState(s, b, Seq("k"), "v"))
      rows(IncrementalAgg.finalizeState(st, Seq("k")).orderBy("k")) shouldBe
        rows(oneShot)
    }
  }

  test("IncrementalAgg distinct sketch: fold-order invariant, <=5% error vs exact, fold equals one-shot") {
    import graft.operators.IncrementalAgg
    import org.apache.spark.sql.functions._
    // 300 rows / 7 keys, distinct rid per key ~43 — well under sketch
    // saturation, so the estimate must sit within the linear-counting
    // error envelope
    val dc = Some("rid")
    val oneShot = IncrementalAgg.finalizeState(
      IncrementalAgg.partialState(facts, Seq("k"), "v", dc), Seq("k"))
      .orderBy("k")
    oneShot.columns should contain("n_distinct")
    def folded(order: Seq[Int]) = {
      def slice(i: Int) = facts.filter(col("rid") % 3 === i)
      val st = order.tail.foldLeft(
        IncrementalAgg.partialState(slice(order.head), Seq("k"), "v", dc))(
        (s, i) => IncrementalAgg.mergeState(s, slice(i), Seq("k"), "v", dc))
      IncrementalAgg.finalizeState(st, Seq("k")).orderBy("k")
    }
    // the bitmap ORs associatively/commutatively: ANY fold order gives
    // byte-identical state, hence identical estimates — and identical
    // to never having batched at all
    val base = rows(folded(Seq(0, 1, 2)))
    rows(folded(Seq(2, 0, 1))) shouldBe base
    rows(folded(Seq(1, 2, 0))) shouldBe base
    base shouldBe rows(oneShot)
    // accuracy: per-key estimate within 5% of the exact distinct count
    val exact = facts.groupBy("k").agg(countDistinct(col("rid")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    oneShot.collect().foreach { r =>
      val est = r.getLong(r.fieldIndex("n_distinct")).toDouble
      val ex = exact(r.getString(0)).toDouble
      math.abs(est - ex) / ex should be <= 0.05
    }
    // the algebraic columns are untouched by the extra state column
    rows(oneShot.drop("n_distinct")) shouldBe rows(
      IncrementalAgg.finalizeState(
        IncrementalAgg.partialState(facts, Seq("k"), "v"), Seq("k"))
        .orderBy("k"))
  }

  // ---- SCD2 (type-2 history) merge ----

  private def scdTarget = Seq(
    // id 1: history + current; id 2: current only; id 3: current only;
    // id 5: only a CLOSED version (key retired earlier)
    (1, "a_old", java.sql.Date.valueOf("1990-01-01"),
      Option(java.sql.Date.valueOf("1992-01-01")), false),
    (1, "a", java.sql.Date.valueOf("1992-01-01"), None: Option[java.sql.Date], true),
    (2, "b", java.sql.Date.valueOf("1992-01-01"), None: Option[java.sql.Date], true),
    (3, "c", java.sql.Date.valueOf("1992-01-01"), None: Option[java.sql.Date], true),
    (5, "e_old", java.sql.Date.valueOf("1990-01-01"),
      Option(java.sql.Date.valueOf("1993-01-01")), false)
  ).toDF("id", "attr", "valid_from", "valid_to", "is_current")

  private def scdStage = Seq(
    (1, "a2"),  // changed -> close + open
    (2, "b"),   // identical -> no-op
    (4, "d"),   // brand-new key
    (5, "e2")   // key with no OPEN version -> plain new current
  ).toDF("id", "attr")

  private val eff = org.apache.spark.sql.functions.to_date(
    org.apache.spark.sql.functions.lit("1995-06-01"))

  test("scd2Merge: close+open on change, no-op on equal, history untouched, retired keys reopen") {
    val out = Load.scd2Merge(scdTarget, scdStage, Seq("id"), eff)
      .orderBy("id", "valid_from")
    val got = rows(out)
    val d = (s: String) => java.sql.Date.valueOf(s)
    got shouldBe Seq(
      Seq(1, "a_old", d("1990-01-01"), d("1992-01-01"), false), // history untouched
      Seq(1, "a", d("1992-01-01"), d("1995-06-01"), false),     // closed at eff
      Seq(1, "a2", d("1995-06-01"), null, true),                // reopened with staged attr
      Seq(2, "b", d("1992-01-01"), null, true),                 // no-op: still open from 1992
      Seq(3, "c", d("1992-01-01"), null, true),                 // untouched (not staged)
      Seq(5, "e_old", d("1990-01-01"), d("1993-01-01"), false), // closed version untouched
      Seq(5, "e2", d("1995-06-01"), null, true),                // retired key reopens
      Seq(4, "d", d("1995-06-01"), null, true)                  // brand-new key
    ).sortBy(r => (r(0).asInstanceOf[Int], r(2).asInstanceOf[java.sql.Date].toString))
  }

  test("scd2Merge is idempotent: replaying the same stage changes nothing") {
    val once = Load.scd2Merge(scdTarget, scdStage, Seq("id"), eff)
    val twice = Load.scd2Merge(once, scdStage, Seq("id"), eff)
    rows(twice.orderBy("id", "valid_from")) shouldBe
      rows(once.orderBy("id", "valid_from"))
  }

  test("scd2Merge: null-safe attribute compare (null vs null is a no-op, null vs value a change)") {
    val tgt = Seq(
      (1, None: Option[String], java.sql.Date.valueOf("1992-01-01"),
        None: Option[java.sql.Date], true),
      (2, Option("x"), java.sql.Date.valueOf("1992-01-01"),
        None: Option[java.sql.Date], true)
    ).toDF("id", "attr", "valid_from", "valid_to", "is_current")
    val stg = Seq((1, None: Option[String]), (2, None: Option[String]))
      .toDF("id", "attr")
    val out = Load.scd2Merge(tgt, stg, Seq("id"), eff)
    out.count() shouldBe 3 // id 1 no-op; id 2 closed + reopened-null
    out.filter($"id" === 2 && $"is_current").select("attr")
      .head.isNullAt(0) shouldBe true
  }

  test("scd2Merge rejects a stage carrying SCD bookkeeping columns or a missing target column") {
    an[IllegalArgumentException] should be thrownBy
      Load.scd2Merge(scdTarget, scdStage.withColumn("is_current",
        org.apache.spark.sql.functions.lit(true)), Seq("id"), eff)
    an[IllegalArgumentException] should be thrownBy
      Load.scd2Merge(scdTarget.drop("valid_to"), scdStage, Seq("id"), eff)
  }

  test("scd2Merge fails LOUD (not unresolved-column) on stage-side gaps and marker collisions") {
    import org.apache.spark.sql.functions.lit
    // target evolved a column the feed no longer sends: the contract
    // require must fire, not an AnalysisException from newRow's s.<col>
    val e1 = intercept[IllegalArgumentException] {
      Load.scd2Merge(scdTarget.withColumn("extra", lit(1)), scdStage,
        Seq("id"), eff)
    }
    e1.getMessage should include("stage lacks columns")
    // pk typo absent from both sides
    val e2 = intercept[IllegalArgumentException] {
      Load.scd2Merge(scdTarget, scdStage, Seq("idd"), eff)
    }
    e2.getMessage should include("business-key")
    // a real column named like the reserved markers would be silently
    // overwritten by the existence flag — refuse it instead
    an[IllegalArgumentException] should be thrownBy
      Load.scd2Merge(scdTarget.withColumn("__c_ex", lit(1)),
        scdStage.withColumn("__c_ex", lit(1)), Seq("id"), eff)
    // ...and the refusal matches Spark's CASE-INSENSITIVE resolution:
    // a case-variant marker would be overwritten just the same
    an[IllegalArgumentException] should be thrownBy
      Load.scd2Merge(scdTarget.withColumn("__C_EX", lit(1)),
        scdStage.withColumn("__C_EX", lit(1)), Seq("id"), eff)
  }

  test("scd2Merge contract checks are case-insensitive, like Spark's own column resolution") {
    // a pk spelled in a different case than the frames declare must
    // still pass the contract checks (the join itself resolves it)
    val out = Load.scd2Merge(scdTarget, scdStage, Seq("ID"), eff)
    out.count() shouldBe 8
    rows(out.orderBy("id", "valid_from")) shouldBe
      rows(Load.scd2Merge(scdTarget, scdStage, Seq("id"), eff)
        .orderBy("id", "valid_from"))
  }

  test("scd2MergeSnapshot: keys absent from the full snapshot close (soft delete), rest matches scd2Merge") {
    // snapshot universe: id 1 changed, id 2 identical, id 4 new;
    // id 3 ABSENT -> its current version closes; id 5 has no current
    // version (retired earlier) -> absence is a no-op
    val snapshot = Seq((1, "a2"), (2, "b"), (4, "d")).toDF("id", "attr")
    val out = Load.scd2MergeSnapshot(scdTarget, snapshot, Seq("id"), eff)
    val d = (s: String) => java.sql.Date.valueOf(s)
    rows(out.filter($"id" === 3)) shouldBe Seq(
      Seq(3, "c", d("1992-01-01"), d("1995-06-01"), false)) // deleted: closed, no reopen
    rows(out.filter($"id" === 5)) shouldBe Seq(
      Seq(5, "e_old", d("1990-01-01"), d("1993-01-01"), false)) // already closed: untouched
    out.filter($"id" === 1).count() shouldBe 3 // history + closed + reopened
    rows(out.filter($"id" === 2)) shouldBe Seq(
      Seq(2, "b", d("1992-01-01"), null, true)) // identical: no-op
    rows(out.filter($"id" === 4)) shouldBe Seq(
      Seq(4, "d", d("1995-06-01"), null, true)) // new key
    // idempotent: replaying the same snapshot changes nothing (deleted
    // keys have no current version left to close again)
    val twice = Load.scd2MergeSnapshot(out, snapshot, Seq("id"), eff)
    rows(twice.orderBy("id", "valid_from")) shouldBe
      rows(out.orderBy("id", "valid_from"))
  }

  test("scd2AsOf: snapshot picks exactly the covering versions") {
    val merged = Load.scd2Merge(scdTarget, scdStage, Seq("id"), eff)
    // 1993-06-01: id1 -> the closed [1992,1995-06) version; id2/id3 open
    // versions; id5's closed version ended 1993-01-01 -> absent; id4 not
    // yet born
    val snap = rows(Load.scd2AsOf(merged,
      org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.lit("1993-06-01"))).orderBy("id"))
    snap.map(r => (r(0), r(1))) shouldBe
      Seq((1, "a"), (2, "b"), (3, "c"))
  }

  test("scd2Merge plan: ONE scan of the target, one join, no union re-scan") {
    val out = Load.scd2Merge(scdTarget, scdStage, Seq("id"), eff)
    val plan = out.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Union}
    plan.collect { case j: Join => j }.size shouldBe 1
    plan.collect { case u: Union => u } shouldBe empty
  }

  test("cdcNetEffect: last (seq, op-rank) wins, deletes remove, corrupt ops fail loud") {
    import graft.operators.Load
    val log = Seq(
      (1L, 1L, "I", "a"), // k1: I then U -> final "a2"
      (1L, 2L, "U", "a2"),
      (2L, 1L, "I", "b"), // k2: I then D -> gone
      (2L, 2L, "D", "b"),
      (3L, 5L, "U", "c-old"), // k3: out-of-order log, seq wins not position
      (3L, 9L, "U", "c-new"),
      (3L, 7L, "U", "c-mid"),
      (4L, 1L, "U", "d"), // k4: exact seq tie U vs D -> D wins (op rank)
      (4L, 1L, "D", "d"))
      .toDF("k", "seq", "op", "v")
    val net = rows(Load.cdcNetEffect(log, Seq("k"), "seq", "op").orderBy("k"))
    net shouldBe Seq(Seq(1L, "a2"), Seq(3L, "c-new"))
    // unknown op: evaluation error, never a silent drop
    val bad = Seq((1L, 1L, "X", "z")).toDF("k", "seq", "op", "v")
    intercept[Exception] {
      Load.cdcNetEffect(bad, Seq("k"), "seq", "op").collect()
    }.getMessage should include("unknown op")
  }

  test("cdcApply: untouched base rows pass through; net effect replaces/removes/inserts") {
    import graft.operators.Load
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("k", "v")
    val log = Seq(
      (2L, 1L, "U", "two-v2"), // update based key
      (3L, 1L, "D", "x"), // delete based key
      (9L, 1L, "I", "nine")) // insert new key
      .toDF("k", "seq", "op", "v")
    rows(Load.cdcApply(base, log, Seq("k"), "seq", "op").orderBy("k")) shouldBe
      Seq(Seq(1L, "one"), Seq(2L, "two-v2"), Seq(9L, "nine"))
    // payload schema drift is refused up front
    val drift = Seq((2L, 1L, "U", "z", 42)).toDF("k", "seq", "op", "v", "extra")
    intercept[IllegalArgumentException] {
      Load.cdcApply(base, drift, Seq("k"), "seq", "op")
    }.getMessage should include("base columns")
  }

  test("IncrementalAgg: state schema is stable across repeated folds") {
    import graft.operators.IncrementalAgg
    import org.apache.spark.sql.functions._
    def slice(i: Int) = facts.filter(col("rid") % 4 === i)
    val s1 = IncrementalAgg.partialState(slice(0), Seq("k"), "v")
    val s3 = (1 to 3).foldLeft(s1)((s, i) =>
      IncrementalAgg.mergeState(s, slice(i), Seq("k"), "v"))
    // a drifting sum precision would break unionByName on the NEXT
    // fold and any persisted-state reader (nullability legitimately
    // differs — count is non-null only pre-merge — so compare types)
    s3.schema.map(f => (f.name, f.dataType)) shouldBe
      s1.schema.map(f => (f.name, f.dataType))
  }
}
