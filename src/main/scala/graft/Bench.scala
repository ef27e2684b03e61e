package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // BASELINE.md pins the bench config to local[4], shuffle.partitions=4
    // — fixed (not machine-derived) so round-over-round totals compare.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: materializes every output column (count() would let
    // Catalyst prune the computed columns and under-measure).
    def exec(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Warm the JVM/codegen once so per-query numbers measure the plan,
    // not first-call classloading.
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try exec(fn) catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try exec(fn) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","config":{"master":"local[$cpus]","shuffle_partitions":$cpus}}""")
    spark.stop()
  }
}
