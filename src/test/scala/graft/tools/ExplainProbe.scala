package graft.tools

/** Ad-hoc plan probe (kept out of the suite: a `main`, not a spec). */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.get()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    args.drop(1).foreach { q =>
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect() // let AQE finalize
      println(df.queryExecution.executedPlan.toString.take(5000))
    }
  }
}
