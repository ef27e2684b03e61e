package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Local records pin local[4], shuffle.partitions=4 — fixed (not
    // machine-derived) so round-over-round totals compare. The driver's
    // per-round runs override via SPARK_GRAFT_CPUS=32 (the config
    // BASELINE.md's bench-target line documents).
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
    // Each query runs three times: `queries` keeps the FIRST (cold)
    // time for round-over-round continuity; `queries_warm` is the MIN
    // of the two follow-up runs. A single warm pass proved fragile:
    // the r3 driver bench reported json_extract_props 13.4 s warm vs
    // 3.2 s cold, yet neither number reproduces in isolation or in a
    // quiet full-suite run (0.7 s warm) — the whole r3 run was ~60%
    // inflated by concurrent machine load (see BENCH_NOTES.md). min()
    // over two warm passes makes one descheduled run non-fatal while
    // still measuring steady-state plan cost.
    //
    // r5 postmortem hardening: the driver's r5 run showed THREE
    // warm>cold inversions (incremental_rollup_distinct 6.4→25.9 s)
    // that reproduce in no quiet run — but the artifact couldn't prove
    // interference because it carried only one end-of-run load_avg. Now
    // every warm>1.5×cold query (above a 1 s floor) is automatically
    // re-run up to twice, and any inversion that SURVIVES the re-runs
    // is reported in `anomalies` with its per-run GC time and the
    // 1-min load average observed at that moment — interference is
    // self-labeling (load >> cores or GC >> wall), a real plan
    // pathology shows quiet load and is reproducible.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def loadNow(): Double = osBean.getSystemLoadAverage
    def gcMsNow(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    final case class Anomaly(cold: Double, warm: Double, gcColdMs: Long,
                             gcWarmMs: Long, load: Double, reruns: Int)
    val anomalies = scala.collection.mutable.LinkedHashMap[String, Anomaly]()
    // SPARK_GRAFT_ONLY=q1,q2 narrows the run for targeted iteration;
    // unset (the driver's mode) benches the full surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def timed(): (Double, Long) = {
        val g0 = gcMsNow(); val t0 = System.nanoTime()
        try exec(fn) catch { case _: Throwable => () }
        ((System.nanoTime() - t0) / 1e9, gcMsNow() - g0)
      }
      val (cold, gcCold) = timed()
      var (warm, gcWarm) = {
        val a = timed(); val b = timed()
        if (a._1 <= b._1) a else b
      }
      var reruns = 0
      while (warm > 1.5 * cold && warm > 1.0 && reruns < 2) {
        val (t, g) = timed()
        if (t < warm) { warm = t; gcWarm = g }
        reruns += 1
      }
      if (warm > 1.5 * cold && warm > 1.0)
        anomalies += name -> Anomaly(cold, warm, gcCold, gcWarm, loadNow(), reruns)
      (name, cold, warm)
    }
    // 3 decimals keeps the line short; Locale.ROOT because the default
    // locale's decimal separator (e.g. comma) would break the JSON
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(vs: Seq[(String, Double)]): String =
      vs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalWarm = results.map(_._3).sum
    // Totals appear BOTH first (contract) and as the LAST keys: the
    // driver tail-captures stdout, which truncates the FRONT of a long
    // line — trailing totals survive truncation.
    // System load average (1-min) makes a contended run self-labeling:
    // the r3 anomaly would have shown load >> cores here.
    val loadAvg = loadNow()
    val anomaliesJson = anomalies.map { case (k, a) =>
      "\"" + k + "\":{\"cold\":" + r3(a.cold) + ",\"warm\":" + r3(a.warm) +
        ",\"gc_cold_ms\":" + a.gcColdMs + ",\"gc_warm_ms\":" + a.gcWarmMs +
        ",\"load_1m\":" + r3(a.load) + ",\"reruns\":" + a.reruns + "}"
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
        s""""queries":${jmap(results.map(t => t._1 -> t._2))},""" +
        s""""queries_warm":${jmap(results.map(t => t._1 -> t._3))},""" +
        s""""sf":"$sfDir","config":{"master":"local[$cpus]","shuffle_partitions":$cpus},""" +
        s""""anomalies":$anomaliesJson,""" +
        s""""load_avg_end":${r3(loadAvg)},"gc_total_ms":${gcMsNow()},""" +
        s""""total_s":${r3(total)},"total_warm_s":${r3(totalWarm)}}"""
    // Side file: tail-capture-proof copy for round-over-round comparison.
    try {
      val out = java.nio.file.Paths.get("BENCH_LOCAL.json")
      java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    } catch { case _: Exception => () }
    println(json)
    spark.stop()
  }
}
