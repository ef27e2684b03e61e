package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Measurement tool (optimization guide §1/§7.2): dump
  * `explain("formatted")` for named declared queries to files, so plan
  * shapes (Exchange count, join strategy, PushedFilters/ReadSchema)
  * can be diffed before/after an optimization without a UI.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <query>[,<query>...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4
  * — the quiet-bench config, so plans match what the bench times).
  *
  * NOTE: queries that materialize persisted state as a side effect
  * (cdc_*, incremental_*, index probes) dump the plan of the FINAL
  * read — the fold jobs run eagerly while the frame is built, exactly
  * as in the bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: PlanDump <outDir> <q1,q2,...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] $name -> ${outDir.resolve(s"$name.txt")}")
    }
    spark.stop()
  }
}
