package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Subprocess-level e2e for the exit-code protocol: forks the real CLI
  * as a child JVM and asserts exit codes, stdout JSON, and stderr
  * text — the analog of the reference's `(new Process('php run.php
  * --data=…'))->run()` suite (tests/Keboola/BaseFunctionalTest.php:96-103),
  * which in-process `Main.execute` tests can't cover (`sys.exit`
  * wiring, stdout/stderr separation).
  */
class CliSubprocessSpec extends AnyFunSuite with Matchers {

  /** JDK17 module opens Spark needs outside spark-submit — mirrors
    * build.sbt / org.apache.spark.launcher.JavaModuleOptions. */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private case class RunResult(code: Int, stdout: String, stderr: String)

  /** Fork `graft.app.Main --data=dataDir` with this JVM's classpath
    * (sbt forks tests, so java.class.path is the full test classpath). */
  private def runCli(dataDir: String): RunResult = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.app.Main", s"--data=$dataDir")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_CPUS", "2") // small local session
    val p = pb.start()
    // drain stderr concurrently — Spark logs there, and a full pipe
    // buffer would deadlock a sequential read of stdout-then-stderr
    val errRef = new java.util.concurrent.atomic.AtomicReference[String]("")
    val drainer = new Thread(() =>
      errRef.set(new String(p.getErrorStream.readAllBytes(), "UTF-8")))
    drainer.setDaemon(true)
    drainer.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    // reference gives a subprocess 300 s (BaseFunctionalTest.php:99)
    p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) shouldBe true
    drainer.join(10000)
    RunResult(p.exitValue(), out, errRef.get())
  }

  private val simpleItems =
    """"items": [
      |  {"name": "id", "dbName": "id", "type": "int"},
      |  {"name": "name", "dbName": "name", "type": "nvarchar", "size": "255"}
      |]""".stripMargin

  private def mkDataDir(config: String, csv: Option[String]): String = {
    val dir = Files.createTempDirectory("graft-cli").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in/tables"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/config.json"), config)
    csv.foreach(c => Files.writeString(
      java.nio.file.Paths.get(s"$dir/in/tables/simple.csv"), c))
    dir
  }

  test("happy path: exit 0, status JSON on stdout, nothing fatal on stderr") {
    val dir = mkDataDir(
      s"""{"parameters": {"tables": [
         |  {"tableId": "simple", "dbName": "simple", $simpleItems}]}}""".stripMargin,
      Some("\"id\",\"name\"\n\"1\",\"a\"\n\"2\",\"b\"\n"))
    val r = runCli(dir)
    withClue(s"stderr: ${r.stderr}") { r.code shouldBe 0 }
    r.stdout.trim should include(""""status":"success"""")
    r.stdout.trim should include(""""uploaded":["simple"]""")
  }

  test("column-order mismatch: exit 1, message on stderr, no stdout JSON") {
    val dir = mkDataDir(
      s"""{"parameters": {"tables": [
         |  {"tableId": "simple", "dbName": "simple", $simpleItems}]}}""".stripMargin,
      Some("\"name\",\"id\"\n\"a\",\"1\"\n"))
    val r = runCli(dir)
    r.code shouldBe 1
    r.stderr should include("don't match with input mapping")
    r.stdout should not include """"status":"success""""
  }

  test("bad column type: exit 1 with the unsupported-type message") {
    val dir = mkDataDir(
      """{"parameters": {"tables": [
        |  {"tableId": "simple", "dbName": "simple", "items": [
        |    {"name": "id", "dbName": "id", "type": "geometry"}]}]}}""".stripMargin,
      Some("\"id\"\n\"1\"\n"))
    val r = runCli(dir)
    r.code shouldBe 1
    r.stderr should include("Type 'geometry' of column 'id' is not supported")
  }

  test("bad date value: exit 1 with the stl_load_errors-style message") {
    // mirrors the reference's bad_type fixture e2e: a garbage date on
    // file line 3 → "Column 'created', line 3" on stderr
    // (tests/Keboola/FunctionalTest.php:63-79)
    val dir = mkDataDir(
      """{"parameters": {"tables": [
        |  {"tableId": "simple", "dbName": "simple", "items": [
        |    {"name": "id", "dbName": "id", "type": "int"},
        |    {"name": "created", "dbName": "created", "type": "date"}]}]}}""".stripMargin,
      Some("\"id\",\"created\"\n\"1\",\"2020-01-01\"\n\"2\",\"not a date\"\n"))
    val r = runCli(dir)
    r.code shouldBe 1
    r.stderr should include("Column 'created', line 3")
  }

  test("unknown action: exit 1 with the reference's message") {
    val dir = mkDataDir("""{"action": "bogus", "parameters": {}}""", None)
    val r = runCli(dir)
    r.code shouldBe 1
    r.stderr should include("Action 'bogus' does not exist.")
  }

  test("pipeline action: exit 0 + report JSON; unknown step exits 1") {
    // csv input keeps the fixture sparkless — the child JVM does the
    // reading; 'the/a/of/is' rows pass the en lang filter, the German
    // row does not, and the duplicate row dedups away
    val csv = "\"doc_id\",\"text\"\n" +
      "\"1\",\"the cat is on the mat and a dog is in the house\"\n" +
      "\"2\",\"the cat is on the mat and a dog is in the house\"\n" +
      "\"3\",\"der hund ist nicht ein tier und das haus ist gross\"\n"
    val dir = mkDataDir(
      """{"action": "pipeline", "parameters": {"pipeline": {
        |  "input": "in/tables/docs.csv", "output": "out/curated",
        |  "format": "csv", "collectStats": true,
        |  "steps": [{"type": "langFilter", "languages": ["en"]},
        |            {"type": "dedupExact"}]}}}""".stripMargin, None)
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/in/tables/docs.csv"), csv)
    val r = runCli(dir)
    withClue(s"stderr: ${r.stderr}") { r.code shouldBe 0 }
    r.stdout should include(""""status":"success"""")
    r.stdout should include(""""rows_in":3""")
    r.stdout should include(""""rows_out":1""")
    r.stdout should include("""{"step":"dedupExact","rows":1}""")

    val bad = mkDataDir(
      """{"action": "pipeline", "parameters": {"pipeline": {
        |  "input": "in/x", "output": "out/x",
        |  "steps": [{"type": "frobnicate"}]}}}""".stripMargin, None)
    val rb = runCli(bad)
    rb.code shouldBe 1
    rb.stderr should include("Pipeline step 'frobnicate' does not exist.")
    rb.stdout.trim shouldBe "" // user errors never emit status JSON
  }

  test("pipeline action: dedupFuzzy + madOutlierFilter through the CLI protocol") {
    // titles 1 and 2 are one edit apart → doc 1 survives; scores
    // [1,2,3,100] (doc 2 already dropped): med 2.5, devs
    // [1.5,.5,.5,97.5], MAD ≈1.0 (interpolated over [.5,.5,1.5,97.5]),
    // cutoff 3·1.4826 ≈ 4.45 → the 100 row is the only outlier
    val csv = "\"doc_id\",\"title\",\"score\"\n" +
      "\"1\",\"alpha beta\",\"1\"\n" +
      "\"2\",\"alpha betb\",\"5\"\n" +
      "\"3\",\"gamma delta\",\"2\"\n" +
      "\"4\",\"epsilon zeta\",\"3\"\n" +
      "\"5\",\"eta theta\",\"100\"\n"
    val dir = mkDataDir(
      """{"action": "pipeline", "parameters": {"pipeline": {
        |  "input": "in/tables/docs.csv", "output": "out/er",
        |  "format": "csv", "textColumn": "title", "collectStats": true,
        |  "steps": [{"type": "dedupFuzzy", "column": "title"},
        |            {"type": "madOutlierFilter", "column": "score"}]}}}"""
        .stripMargin, None)
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/in/tables/docs.csv"), csv)
    val r = runCli(dir)
    withClue(s"stderr: ${r.stderr}") { r.code shouldBe 0 }
    r.stdout should include(""""status":"success"""")
    r.stdout should include("""{"step":"dedupFuzzy","rows":4}""")
    r.stdout should include("""{"step":"madOutlierFilter","rows":3}""")
    r.stdout should include(""""rows_out":3""")
  }

  test("pipeline action: classifierFilter + weightedSample through the CLI protocol") {
    // md5 buckets at dim=4: good→2 great→3 bad/awful→0 the/spam→1;
    // weights [-D, 0, +D, +D] in micro-units → docs 1 and 3 score
    // mean logit 1.0 (kept at 0.5), docs 2 and 4 score ≤0 (dropped);
    // the weighted sampler then keeps the single highest A-ES key
    val csv = "\"doc_id\",\"text\",\"w\"\n" +
      "\"1\",\"good great\",\"2\"\n" +
      "\"2\",\"bad awful\",\"9\"\n" +
      "\"3\",\"good good\",\"5\"\n" +
      "\"4\",\"the spam\",\"7\"\n"
    val dir = mkDataDir(
      """{"action": "pipeline", "parameters": {"pipeline": {
        |  "input": "in/tables/docs.csv", "output": "out/scored",
        |  "format": "csv", "collectStats": true,
        |  "steps": [
        |    {"type": "classifierFilter", "minMeanLogit": 0.5,
        |     "weightsQ": [-1000003, 0, 1000003, 1000003]},
        |    {"type": "weightedSample", "n": 1, "weightColumn": "w"}
        |  ]}}}""".stripMargin, None)
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/in/tables/docs.csv"), csv)
    val r = runCli(dir)
    withClue(s"stderr: ${r.stderr}") { r.code shouldBe 0 }
    r.stdout should include(""""status":"success"""")
    r.stdout should include("""{"step":"classifierFilter","rows":2}""")
    r.stdout should include("""{"step":"weightedSample","rows":1}""")
    r.stdout should include(""""rows_out":1""")
  }

  test("maintainView action through the CLI protocol: fold then " +
      "exactly-once replay") {
    // join-view fold from CSV deltas (CSV keeps the fixture dependency-
    // free in the child JVM) with DECLARED items[] — csv without a
    // declared schema refuses at parse since r12; second invocation of
    // the SAME batchId must exit 0 with applied:false — the
    // scheduler-retry contract
    def items(cols: (String, String)*) = cols.map { case (n, t) =>
      s"""{"name": "$n", "dbName": "$n", "type": "$t"}"""
    }.mkString("[", ", ", "]")
    def config(batchId: Int) =
      s"""{"action": "maintainView", "parameters": {"view": {
         |  "kind": "join", "statePath": "state", "batchId": $batchId,
         |  "key": "k",
         |  "deltaA": {"input": "in/a", "format": "csv",
         |    "items": ${items("k" -> "bigint", "price" -> "float8")}},
         |  "deltaB": {"input": "in/b", "format": "csv",
         |    "items": ${items("k" -> "bigint", "qty" -> "float8")}}
         |}}}""".stripMargin
    val dir = mkDataDir(config(0), None)
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in/a"))
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in/b"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/in/a/part.csv"),
      "k,price\n1,10\n2,20\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/in/b/part.csv"),
      "k,qty\n1,5\n1,6\n3,7\n")
    val r1 = runCli(dir)
    withClue(s"stderr: ${r1.stderr}") { r1.code shouldBe 0 }
    r1.stdout should include(""""status":"success"""")
    r1.stdout should include(""""view":"join"""")
    r1.stdout should include(""""batch_id":0""")
    r1.stdout should include(""""applied":true""")
    val r2 = runCli(dir) // same batchId again
    withClue(s"stderr: ${r2.stderr}") { r2.code shouldBe 0 }
    r2.stdout should include(""""applied":false""")
    // out-of-band compaction through the same CLI protocol: the view
    // kind is auto-detected from the state's layout pin
    Files.writeString(java.nio.file.Paths.get(s"$dir/config.json"),
      """{"action": "maintainView", "parameters": {"view": {
        |  "kind": "compact", "statePath": "state",
        |  "freshPath": "state_v2", "nBuckets": 4
        |}}}""".stripMargin)
    val r3 = runCli(dir)
    withClue(s"stderr: ${r3.stderr}") { r3.code shouldBe 0 }
    r3.stdout should include(""""view":"compact"""")
    r3.stdout should include(""""rows":2""") // keys 1x(5,6) joined
    // export the compacted view through the same protocol — the full
    // CLI lifecycle (fold -> compact -> export) in one forked JVM
    Files.writeString(java.nio.file.Paths.get(s"$dir/config.json"),
      """{"action": "maintainView", "parameters": {"view": {
        |  "kind": "export", "statePath": "state_v2",
        |  "output": "out/view"
        |}}}""".stripMargin)
    val r4 = runCli(dir)
    withClue(s"stderr: ${r4.stderr}") { r4.code shouldBe 0 }
    r4.stdout should include(""""view":"export"""")
    r4.stdout should include(""""rows":2""")
    r4.stdout should include(""""output":""")
    // status: the ops face — pin, committed batches, per-layer dir
    // counts, view rows; pure listings + one count, fold-free
    Files.writeString(java.nio.file.Paths.get(s"$dir/config.json"),
      """{"action": "maintainView", "parameters": {"view": {
        |  "kind": "status", "statePath": "state_v2"
        |}}}""".stripMargin)
    val r5 = runCli(dir)
    withClue(s"stderr: ${r5.stderr}") { r5.code shouldBe 0 }
    r5.stdout should include(""""view":"status"""")
    r5.stdout should include(""""family":"join"""")
    // the compacted root carries the SOURCE frontier as a watermark
    // (not a restarted _APPLIED_0) — pre-compaction ids stay refused
    r5.stdout should include(""""batches":{"committed":0,"max":0,"watermark":0}""")
    r5.stdout should include(""""view":{"batch_dirs":1,"orphan_candidates":0}""")
    r5.stdout should include(""""view_rows":2""")
    // status of a non-view path: user error, exit 1
    Files.writeString(java.nio.file.Paths.get(s"$dir/config.json"),
      """{"action": "maintainView", "parameters": {"view": {
        |  "kind": "status", "statePath": "in"
        |}}}""".stripMargin)
    runCli(dir).code shouldBe 1
  }

  test("maintainView lookup through the CLI protocol: pin-dispatched " +
      "point lookups for ALL THREE state families — key literals cast " +
      "to the state's types, matching rows as JSON in the status " +
      "payload") {
    def items(cols: (String, String)*) = cols.map { case (n, t) =>
      s"""{"name": "$n", "dbName": "$n", "type": "$t"}"""
    }.mkString("[", ", ", "]")
    val dir = mkDataDir("{}", None)
    def cfg(view: String): Unit = Files.writeString(
      java.nio.file.Paths.get(s"$dir/config.json"),
      s"""{"action": "maintainView", "parameters": {"view": $view}}""")
    def csv(name: String, content: String): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/in/$name"))
      Files.writeString(
        java.nio.file.Paths.get(s"$dir/in/$name/part.csv"), content)
    }
    // --- build one state per family through the CLI itself
    csv("a", "k,price\n1,10\n2,20\n")
    csv("b", "k,qty\n1,5\n1,6\n3,7\n")
    cfg(s"""{"kind": "join", "statePath": "jst", "batchId": 0,
           |  "key": "k",
           |  "deltaA": {"input": "in/a", "format": "csv",
           |    "items": ${items("k" -> "bigint", "price" -> "float8")}},
           |  "deltaB": {"input": "in/b", "format": "csv",
           |    "items": ${items("k" -> "bigint", "qty" -> "float8")}}
           |}""".stripMargin)
    runCli(dir).code shouldBe 0
    csv("r", "g,v\n1,10\n1,30\n2,5\n")
    cfg(s"""{"kind": "rollup", "statePath": "rst", "batchId": 0,
           |  "keys": ["g"], "valueColumn": "v", "nBuckets": 4,
           |  "delta": {"input": "in/r", "format": "csv",
           |    "items": ${items("g" -> "bigint", "v" -> "float8")}}
           |}""".stripMargin)
    runCli(dir).code shouldBe 0
    csv("c", "id,grp,v,seq,op\n1,x,10,1,I\n2,x,20,1,I\n3,y,30,1,I\n")
    cfg(s"""{"kind": "cdcRollup", "statePath": "cst", "batchId": 0,
           |  "keyColumns": ["id"], "seqColumn": "seq", "opColumn": "op",
           |  "keys": ["grp"], "valueColumns": ["v"],
           |  "nBaseBuckets": 2, "nAggBuckets": 2,
           |  "delta": {"input": "in/c", "format": "csv",
           |    "items": ${items("id" -> "bigint", "grp" -> "nvarchar",
                "v" -> "float8", "seq" -> "bigint", "op" -> "nvarchar")}}
           |}""".stripMargin)
    runCli(dir).code shouldBe 0
    // --- join view: key 1 has TWO view rows (qty 5 and 6)
    cfg("""{"kind": "lookup", "statePath": "jst",
          |  "keys": [{"k": 1}]}""".stripMargin)
    val j = runCli(dir)
    withClue(s"stderr: ${j.stderr}") { j.code shouldBe 0 }
    j.stdout should include(""""view":"lookup"""")
    j.stdout should include(""""rows":2""")
    j.stdout should include(""""layer":"view"""")
    j.stdout should include(""""qty":5.0""")
    j.stdout should include(""""qty":6.0""")
    // --- rollup: finalized aggregate of group 1 only
    cfg("""{"kind": "lookup", "statePath": "rst",
          |  "keys": [{"g": 1}]}""".stripMargin)
    val r = runCli(dir)
    withClue(s"stderr: ${r.stderr}") { r.code shouldBe 0 }
    r.stdout should include(""""rows":1""")
    r.stdout should include(""""g":1""")
    r.stdout should include(""""total":40.0""")
    r.stdout shouldNot include(""""g":2""")
    // --- cdcRollup: base (pk) lookup is the default layer...
    cfg("""{"kind": "lookup", "statePath": "cst",
          |  "keys": [{"id": 2}, {"id": 3}]}""".stripMargin)
    val cb = runCli(dir)
    withClue(s"stderr: ${cb.stderr}") { cb.code shouldBe 0 }
    cb.stdout should include(""""layer":"base"""")
    cb.stdout should include(""""rows":2""")
    cb.stdout should include(""""id":2""")
    cb.stdout should include(""""id":3""")
    cb.stdout shouldNot include(""""id":1""")
    // ...and layer "view" serves the agg state by GROUP key
    cfg("""{"kind": "lookup", "statePath": "cst", "layer": "view",
          |  "keys": [{"grp": "x"}]}""".stripMargin)
    val cv = runCli(dir)
    withClue(s"stderr: ${cv.stderr}") { cv.code shouldBe 0 }
    cv.stdout should include(""""layer":"view"""")
    cv.stdout should include(""""rows":1""")
    cv.stdout should include(""""n":2""")
    // layer on a non-cdc family: user error, exit 1
    cfg("""{"kind": "lookup", "statePath": "jst", "layer": "base",
          |  "keys": [{"k": 1}]}""".stripMargin)
    runCli(dir).code shouldBe 1
  }

  test("maintainView retention + fsck through the CLI protocol: " +
      "retain → asOf lookup serves history → gc retainHours advances " +
      "the floor (then below-floor exits 1) → fsck audits clean and " +
      "reports planted corruption") {
    def items(cols: (String, String)*) = cols.map { case (n, t) =>
      s"""{"name": "$n", "dbName": "$n", "type": "$t"}"""
    }.mkString("[", ", ", "]")
    val dir = mkDataDir("{}", None)
    def cfg(view: String): Unit = Files.writeString(
      java.nio.file.Paths.get(s"$dir/config.json"),
      s"""{"action": "maintainView", "parameters": {"view": $view}}""")
    def csv(name: String, content: String): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/in/$name"))
      Files.writeString(
        java.nio.file.Paths.get(s"$dir/in/$name/part.csv"), content)
    }
    def fold(id: Int): Unit = {
      cfg(s"""{"kind": "cdcRollup", "statePath": "cst", "batchId": $id,
             |  "keyColumns": ["id"], "seqColumn": "seq",
             |  "opColumn": "op", "keys": ["grp"], "valueColumns": ["v"],
             |  "nBaseBuckets": 2, "nAggBuckets": 2,
             |  "delta": {"input": "in/c$id", "format": "csv",
             |    "items": ${items("id" -> "bigint", "grp" -> "nvarchar",
                  "v" -> "float8", "seq" -> "bigint",
                  "op" -> "nvarchar")}}
             |}""".stripMargin)
      runCli(dir).code shouldBe 0
    }
    csv("c0", "id,grp,v,seq,op\n1,x,10,1,I\n2,y,20,1,I\n")
    fold(0)
    cfg("""{"kind": "retain", "statePath": "cst"}""")
    val rt = runCli(dir)
    withClue(s"stderr: ${rt.stderr}") { rt.code shouldBe 0 }
    rt.stdout should include(""""asof_floor":0""")
    csv("c1", "id,grp,v,seq,op\n1,x,99,2,U\n")
    fold(1)
    // the snapshot the "training run" saw at batch 0, via the CLI
    cfg("""{"kind": "lookup", "statePath": "cst",
          |  "keys": [{"id": 1}], "asOf": 0}""".stripMargin)
    val lk = runCli(dir)
    withClue(s"stderr: ${lk.stderr}") { lk.code shouldBe 0 }
    lk.stdout should include(""""v":10.0""")
    // fsck on the healthy retained state: ok, zero errors
    cfg("""{"kind": "fsck", "statePath": "cst"}""")
    val f0 = runCli(dir)
    withClue(s"stderr: ${f0.stderr}") { f0.code shouldBe 0 }
    f0.stdout should include(""""ok":true""")
    f0.stdout should include(""""errors":[]""")
    // gc retainHours 0: history reaped, floor advances to 1
    cfg("""{"kind": "gc", "statePath": "cst", "retainHours": 0}""")
    val gc = runCli(dir)
    withClue(s"stderr: ${gc.stderr}") { gc.code shouldBe 0 }
    gc.stdout should include(""""asof_floor":1""")
    // the churned key's bucket was reaped: user error, exit 1, the
    // per-bucket gate's named message
    cfg("""{"kind": "lookup", "statePath": "cst",
          |  "keys": [{"id": 1}], "asOf": 0}""".stripMargin)
    val below = runCli(dir)
    below.code shouldBe 1
    below.stderr should include("retained chain starts at")
    // the cold key's bucket kept its chain: its asOf-0 lookup serves
    // BELOW the global floor (per-bucket retention floors)
    cfg("""{"kind": "lookup", "statePath": "cst",
          |  "keys": [{"id": 2}], "asOf": 0}""".stripMargin)
    val coldLk = runCli(dir)
    withClue(s"stderr: ${coldLk.stderr}") { coldLk.code shouldBe 0 }
    coldLk.stdout should include(""""v":20.0""")
    // planted corruption surfaces as a named fsck error (exit stays
    // 0 — fsck is the audit, not a gate)
    Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/cst/agg/bucket=77/v0"))
    cfg("""{"kind": "fsck", "statePath": "cst"}""")
    val f1 = runCli(dir)
    withClue(s"stderr: ${f1.stderr}") { f1.code shouldBe 0 }
    f1.stdout should include(""""ok":false""")
    f1.stdout should include("bucket id outside the pinned count")
  }

  test("maintainView aux views through the CLI protocol: fold with " +
      "auxViews, point-look-up and diff the aux layer in a forked JVM") {
    def items(cols: (String, String)*) = cols.map { case (n, t) =>
      s"""{"name": "$n", "dbName": "$n", "type": "$t"}"""
    }.mkString("[", ", ", "]")
    val dir = mkDataDir("{}", None)
    def cfg(view: String): Unit = Files.writeString(
      java.nio.file.Paths.get(s"$dir/config.json"),
      s"""{"action": "maintainView", "parameters": {"view": $view}}""")
    def csv(name: String, content: String): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/in/$name"))
      Files.writeString(
        java.nio.file.Paths.get(s"$dir/in/$name/part.csv"), content)
    }
    def fold(id: Int): Unit = {
      cfg(s"""{"kind": "cdcRollup", "statePath": "ast", "batchId": $id,
             |  "keyColumns": ["id"], "seqColumn": "seq",
             |  "opColumn": "op", "keys": ["grp"], "valueColumns": ["v"],
             |  "nBaseBuckets": 2, "nAggBuckets": 2,
             |  "auxViews": {"byg2": ["g2"]},
             |  "delta": {"input": "in/a$id", "format": "csv",
             |    "items": ${items("id" -> "bigint", "grp" -> "nvarchar",
                  "g2" -> "nvarchar", "v" -> "float8",
                  "seq" -> "bigint", "op" -> "nvarchar")}}
             |}""".stripMargin)
      val r = runCli(dir)
      withClue(s"stderr: ${r.stderr}") { r.code shouldBe 0 }
    }
    csv("a0", "id,grp,g2,v,seq,op\n1,p,x,10,1,I\n2,q,y,20,1,I\n")
    fold(0)
    cfg("""{"kind": "retain", "statePath": "ast"}""")
    runCli(dir).code shouldBe 0
    csv("a1", "id,grp,g2,v,seq,op\n2,q,x,20,2,U\n")
    fold(1)
    // the aux layer serves by its own group key
    cfg("""{"kind": "lookup", "statePath": "ast", "layer": "aux:byg2",
          |  "keys": [{"g2": "x"}]}""".stripMargin)
    val lk = runCli(dir)
    withClue(s"stderr: ${lk.stderr}") { lk.code shouldBe 0 }
    lk.stdout should include(""""n":2""")
    lk.stdout should include(""""total":30.0""")
    // and diffs on its own axis (main diff empty — grp untouched)
    cfg("""{"kind": "diff", "statePath": "ast", "output": "ad",
          |  "layer": "aux:byg2", "fromBatch": 0,
          |  "toBatch": 1}""".stripMargin)
    val df = runCli(dir)
    withClue(s"stderr: ${df.stderr}") { df.code shouldBe 0 }
    df.stdout should include(""""rows":2""")
    cfg("""{"kind": "diff", "statePath": "ast", "output": "adm",
          |  "fromBatch": 0, "toBatch": 1}""".stripMargin)
    runCli(dir).stdout should include(""""rows":0""")
  }

  test("maintainView repair through the CLI protocol: fsck reports a " +
      "hand-deleted derived layer, dry-run repair mutates nothing, " +
      "repair --apply rebuilds it from the base, re-fsck reads ok") {
    def items(cols: (String, String)*) = cols.map { case (n, t) =>
      s"""{"name": "$n", "dbName": "$n", "type": "$t"}"""
    }.mkString("[", ", ", "]")
    val dir = mkDataDir("{}", None)
    def cfg(view: String): Unit = Files.writeString(
      java.nio.file.Paths.get(s"$dir/config.json"),
      s"""{"action": "maintainView", "parameters": {"view": $view}}""")
    def csv(name: String, content: String): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/in/$name"))
      Files.writeString(
        java.nio.file.Paths.get(s"$dir/in/$name/part.csv"), content)
    }
    csv("r0", "id,grp,v,seq,op\n1,x,10,1,I\n2,y,20,1,I\n")
    cfg(s"""{"kind": "cdcRollup", "statePath": "rst", "batchId": 0,
           |  "keyColumns": ["id"], "seqColumn": "seq",
           |  "opColumn": "op", "keys": ["grp"], "valueColumns": ["v"],
           |  "minMaxColumns": ["v"],
           |  "nBaseBuckets": 2, "nAggBuckets": 2,
           |  "delta": {"input": "in/r0", "format": "csv",
           |    "items": ${items("id" -> "bigint", "grp" -> "nvarchar",
                "v" -> "float8", "seq" -> "bigint",
                "op" -> "nvarchar")}}
           |}""".stripMargin)
    runCli(dir).code shouldBe 0
    // break the state: hand-delete the min/max image layer
    def deleteRec(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(c => deleteRec(c)) finally children.close()
      }
      Files.deleteIfExists(p); ()
    }
    val grp = java.nio.file.Paths.get(s"$dir/rst/grp")
    deleteRec(grp)
    cfg("""{"kind": "fsck", "statePath": "rst"}""")
    val f1 = runCli(dir)
    withClue(s"stderr: ${f1.stderr}") { f1.code shouldBe 0 }
    f1.stdout should include(""""ok":false""")
    f1.stdout should include("grp image layer is missing")
    // dry-run: plans the rebuild, mutates nothing (exit 0)
    cfg("""{"kind": "repair", "statePath": "rst"}""")
    val d = runCli(dir)
    withClue(s"stderr: ${d.stderr}") { d.code shouldBe 0 }
    d.stdout should include(""""apply":false""")
    d.stdout should include("rebuild missing layer 'grp'")
    d.stdout should include(""""result":null""")
    Files.exists(grp) shouldBe false
    // apply: the layer rebuilds from the base and fsck reads ok in
    // the same report
    cfg("""{"kind": "repair", "statePath": "rst", "apply": true}""")
    val a = runCli(dir)
    withClue(s"stderr: ${a.stderr}") { a.code shouldBe 0 }
    a.stdout should include(""""apply":true""")
    a.stdout should include(""""result":"rows=2"""")
    a.stdout should include(""""ok":true""")
    // the repaired state folds and serves min/max exactly
    csv("r1", "id,grp,v,seq,op\n1,x,5,2,U\n")
    cfg(s"""{"kind": "cdcRollup", "statePath": "rst", "batchId": 1,
           |  "keyColumns": ["id"], "seqColumn": "seq",
           |  "opColumn": "op", "keys": ["grp"], "valueColumns": ["v"],
           |  "minMaxColumns": ["v"],
           |  "nBaseBuckets": 2, "nAggBuckets": 2,
           |  "delta": {"input": "in/r1", "format": "csv",
           |    "items": ${items("id" -> "bigint", "grp" -> "nvarchar",
                "v" -> "float8", "seq" -> "bigint",
                "op" -> "nvarchar")}}
           |}""".stripMargin)
    runCli(dir).code shouldBe 0
    cfg("""{"kind": "lookup", "statePath": "rst", "layer": "view",
          |  "keys": [{"grp": "x"}]}""".stripMargin)
    val lk = runCli(dir)
    withClue(s"stderr: ${lk.stderr}") { lk.code shouldBe 0 }
    lk.stdout should include(""""min_1":5.0""")
    lk.stdout should include(""""max_1":5.0""")
  }
}
