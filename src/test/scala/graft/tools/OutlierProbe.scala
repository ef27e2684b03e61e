package graft.tools

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Scratch probe for the r3 warm-pass bench outliers: runs the two
  * suspect queries repeatedly and prints wall time alongside GC and
  * JIT-compiler time deltas, to separate plan cost from JVM effects.
  * Not part of the shipped library; lives under test sources.
  */
object OutlierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMillis(): Long =
      ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMillis(): Long =
      ManagementFactory.getCompilationMXBean.getTotalCompilationTime

    val targets = Seq("json_extract_props", "gopher_quality_filter")
    for (name <- targets; i <- 1 to 6) {
      val fn = graft.SparkEntry.queries(name)
      val g0 = gcMillis(); val j0 = jitMillis(); val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-24s run=$i wall=$dt%.2fs gc=${gcMillis() - g0}ms jit=${jitMillis() - j0}ms")
    }
    spark.stop()
  }
}
