package graft.app

import graft.Sessions
import graft.model._
import org.apache.spark.sql.SparkSession

/** CLI entry point with the reference's exit-code protocol
  * (reference: run.php:18-56): user error → exit 1 (message on
  * stderr), application error → exit 2, success → JSON status on
  * stdout. Action dispatch per RedshiftApplication.php:47-55.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val dataDir = args.collectFirst { case s if s.startsWith("--data=") =>
      s.stripPrefix("--data=") }
      .getOrElse { System.err.println("usage: --data=<dir>"); sys.exit(1) }
    val spark = Sessions.get()
    val sink = new ParquetSink(spark, s"$dataDir/out/tables")
    val (code, out) = execute(spark, sink, dataDir)
    out.foreach(println)
    spark.stop()
    sys.exit(code)
  }

  /** Testable core: returns (exitCode, stdoutJson). */
  def execute(spark: SparkSession, sink: TableSink,
              dataDir: String): (Int, Option[String]) =
    try {
      val config = ConfigParser.parseFile(s"$dataDir/config.json")
      val engine = new Engine(spark, sink)
      config.action match {
        case "run" =>
          val uploaded = engine.run(config, dataDir)
          (0, Some(statusJson("success",
            s""""uploaded":[${uploaded.map(t => s""""$t"""").mkString(",")}]""")))
        case "testConnection" =>
          engine.testConnection()
          (0, Some(statusJson("success")))
        case "getTablesInfo" =>
          val tables = engine.tablesInfo().map { case (name, cols) =>
            s""""$name":{${cols.map { case (c, t) => s""""$c":"$t"""" }.mkString(",")}}"""
          }
          (0, Some(s"""{"status":"success","tables":{${tables.mkString(",")}}}"""))
        case "pipeline" =>
          // engine extension: the curation library behind the same
          // config-in/JSON-out protocol (steps validated by the
          // parser, which also guarantees the spec's presence)
          val rep = Pipeline.run(spark, config.pipeline.get, dataDir)
          val steps = rep.steps.map { s =>
            val rows = s.rows.map(n => s""","rows":$n""").getOrElse("")
            val reused = if (s.reused) ""","reused":true""" else ""
            s"""{"step":"${s.kind}"$rows$reused}"""
          }.mkString("[", ",", "]")
          val rowsIn = rep.rowsIn.map(n => s""""rows_in":$n,""").getOrElse("")
          (0, Some(statusJson("success",
            rowsIn + s""""rows_out":${rep.rowsOut},""" +
              s""""steps":$steps,"output":${jsonStr(rep.output)}""")))
        case "maintainView" =>
          // engine extension: incremental materialized-view upkeep
          // behind the same config-in/JSON-out protocol; `applied` is
          // false on an exactly-once replay of a committed batchId
          val rep = ViewMaintenance.run(spark, config.view.get, dataDir)
          val batchId = rep.batchId.map(n => s""""batch_id":$n,""").getOrElse("")
          val buckets = rep.buckets.map(n => s""","buckets":$n""").getOrElse("")
          val rows = rep.rows.map(n => s""","rows":$n""").getOrElse("")
          val outPath = rep.output
            .map(o => s""","output":${jsonStr(o)}""").getOrElse("")
          // `status` kind: the introspection payload rides as a
          // pre-rendered JSON object (pure listings + one count)
          val detail = rep.detail.map(d => s""","state":$d""").getOrElse("")
          (0, Some(statusJson("success",
            s""""view":"${rep.kind}",$batchId""" +
              s""""applied":${rep.applied}$buckets$rows$outPath$detail""")))
        case other =>
          // unknown action → UserException (RedshiftApplication.php:53-55)
          System.err.println(s"Action '$other' does not exist.")
          (1, None)
      }
    } catch {
      case e: UserException =>
        System.err.println(scrubAws(e.getMessage))
        (1, None)
      case e: Throwable =>
        System.err.println(s"Application error: ${scrubAws(e.getMessage)}")
        (2, None)
    }

  /** Mask staged-copy credentials in surfaced errors — the reference's
    * exact regex (Writer/Redshift.php:229-233). */
  private[graft] def scrubAws(msg: String): String =
    Option(msg).getOrElse("").replaceAll(
      "aws_access_key_id=.*;aws_secret_access_key=.*",
      "aws_access_key_id=***;aws_secret_access_key=***")

  private def statusJson(status: String, extra: String = ""): String =
    if (extra.isEmpty) s"""{"status":"$status"}"""
    else s"""{"status":"$status",$extra}"""

  /** JSON string literal for USER-CONTROLLED values (paths from the
    * config) — the shared escaper, so the status line and the oracle
    * dump can never drift. */
  private[app] def jsonStr(s: String): String = graft.JsonUtil.str(s)
}
