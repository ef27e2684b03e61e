package graft.tools
import graft.{Sessions, SparkEntry}
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val dir = "/root/testdata/sf0.01"
    val names = Seq("q1_agg", "q3_join_topk", "upsert_merge", "dedup_minhash_lsh",
      "sessionize_gap", "embedding_topk_cosine", "star_join_agg", "dedup_exact")
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/tmp/plans/$n.txt"), plan)
    }
    spark.stop()
  }
}
