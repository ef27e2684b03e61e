package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Measurement tool (optimization guide §1/§7): run named declared
  * queries through the bench's noop sink while a SparkListener counts
  * jobs / stages / tasks and sums task time. The gap between wall
  * time and sum(task time)/cores is scheduling + driver-side work —
  * the number that tells whether a slow query is compute-bound or
  * job-count-bound (the state-building view queries run dozens of
  * tiny jobs; this quantifies that overhead before touching code).
  *
  * Usage: runMain graft.tools.QueryProfile <query>[,<query>...] [reps]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (defaults match Bench).
  */
object QueryProfile {
  private class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var gcTimeMs = 0L
    /** GRAFT_PROFILE_JOBS=1: per-job (start-offset, callsite) log so a
      * many-tiny-jobs query's inventory is attributable to code. */
    val jobLog = new scala.collection.mutable.ArrayBuffer[(Long, String)]
    private val verbose = sys.env.get("GRAFT_PROFILE_JOBS").contains("1")
    override def onJobStart(j: SparkListenerJobStart): Unit =
      synchronized {
        jobs += 1
        if (verbose) {
          val p = Option(j.properties)
          val site = p.flatMap(x =>
              Option(x.getProperty("spark.job.description")))
            .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
            .getOrElse("?")
          jobLog += ((j.time, site))
        }
      }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized { stages += 1 }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      if (t.taskInfo != null) taskTimeMs += t.taskInfo.duration
      if (t.taskMetrics != null) gcTimeMs += t.taskMetrics.jvmGCTime
    }
    def snap(): (Int, Int, Int, Long, Long) =
      synchronized { (jobs, stages, tasks, taskTimeMs, gcTimeMs) }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile <q1,q2,...> [reps]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    // one warmup query so classloading/codegen doesn't pollute run 1
    graft.SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    println(f"${"query"}%-34s run  wall_s  jobs stages tasks task_s  gc_ms")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      (1 to reps).foreach { r =>
        val before = acc.snap()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async (and private); a short settle beats
        // under-counting the run's last stages
        Thread.sleep(300)
        val after = acc.snap()
        println(f"$name%-34s $r%3d  $wall%6.2f  ${after._1 - before._1}%4d " +
          f"${after._2 - before._2}%5d ${after._3 - before._3}%5d " +
          f"${(after._4 - before._4) / 1e3}%6.2f ${after._5 - before._5}%6d")
        if (r == reps && acc.jobLog.nonEmpty) {
          val t0j = acc.jobLog.head._1
          acc.jobLog.foreach { case (t, site) =>
            println(f"  job +${(t - t0j) / 1e3}%7.2fs  $site")
          }
          acc.jobLog.clear()
        }
        if (acc.jobLog.nonEmpty) acc.jobLog.clear()
      }
    }
    spark.stop()
  }
}
