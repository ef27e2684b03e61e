package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off sizing probe: how many synchronous peel rounds does the
  * copurchase_kcore gate graph need to converge at each SF? Drives the
  * unrolled-CTE depth of the DuckDB oracle (which must unroll at least
  * the convergence depth; extra rounds are no-ops). */
object KCoreDepthProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("kcore-depth-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.as("x").join(li.as("y"), Seq("ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("u"), col("y.pk").as("v")).distinct()
        .cache()
      for (k <- Seq(2, 3)) {
        var live: DataFrame = edges.select(col("u").as("id"))
          .unionByName(edges.select(col("v").as("id"))).distinct()
        var n = live.count()
        var round = 0
        var done = false
        while (!done && round < 60) {
          val le = edges
            .join(live.select(col("id").as("u")), "u")
            .join(live.select(col("id").as("v")), "v")
          val next = le.select(col("u").as("id"))
            .unionByName(le.select(col("v").as("id")))
            .groupBy("id").agg(count(lit(1)).as("d"))
            .filter(col("d") >= k).select("id").localCheckpoint(true)
          val m = next.count()
          round += 1
          if (m == n || m == 0L) done = true
          else { live = next; n = m }
        }
        println(s"PROBE $sf k=$k rounds_to_converge=$round survivors=$n")
      }
      edges.unpersist()
    }
    spark.stop()
  }
}
