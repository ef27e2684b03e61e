package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.get()
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=a,b,c — dump only the named queries (local
    // iteration; the driver never sets it). Mirrors Bench's filter.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // shared JSON escaper (JsonUtil): a tab or CR in builder-authored
    // SQL would otherwise make the driver's json.load fail and
    // silently zero the round's correctness.
    def q(s: String): String = JsonUtil.str(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // self-describing check modes: rows-only-BY-DESIGN queries carry
    // their declared reason (and the spec holding the real bound), so
    // the correctness artifact distinguishes them from a broken oracle
    val status = SparkEntry.queries.keys.toSeq.sorted.map { k =>
      val mode =
        if (SparkEntry.oracleSql.contains(k)) s"""{"check": "oracle"}"""
        else s"""{"check": "rows_only", "reason": ${q(
          SparkEntry.rowsOnlyReasons.getOrElse(k, "UNDECLARED"))}}"""
      s"${q(k)}: $mode"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/query_status.json"), status)
    spark.stop()
  }
}
