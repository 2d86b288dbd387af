package graft

import org.apache.spark.sql.SparkSession
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Diagnostic twin of Bench: same two-pass loop, but records per-query
  * JVM state (heap, GC time, threads, persistent RDD blocks, loaded
  * classes) to find what accumulates across the run. NOT part of the
  * driver contract; tooling.
  *
  * Findings from a clean 2×93-query run (kept here so the next reader
  * doesn't re-chase them): heap stays flat at 2–3 GB, GC per query is
  * single-digit ms, persistent RDDs return to 0 between queries, and
  * the thread count climbs 162 → ~800 then plateaus — a jcmd census
  * shows the growth is Spark's internal cached pools filling to their
  * fixed caps (broadcast-exchange 128, block-manager ask/storage 100
  * each, shuffle-exchange, dispatcher-event-loop 32), i.e. bounded and
  * benign. A steady pass measured slower than cold indicates EXTERNAL
  * machine contention, not JVM-state accumulation.
  */
object BenchDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "lineitem").count()
    Tables(spark, sfDir, "orders").count()

    val gcBeans = ManagementFactory.getGarbageCollectorMXBeans.asScala
    val memBean = ManagementFactory.getMemoryMXBean
    val threadBean = ManagementFactory.getThreadMXBean
    val classBean = ManagementFactory.getClassLoadingMXBean
    def gcMs: Long = gcBeans.map(_.getCollectionTime).sum
    def heapMB: Long = memBean.getHeapMemoryUsage.getUsed / (1024 * 1024)

    def pass(tag: String): Unit = {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val g0 = gcMs
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable => println(s"FAIL $name: ${e.getMessage.take(100)}") }
        val elapsed = (System.nanoTime() - t0) / 1e9
        val gcD = gcMs - g0
        spark.catalog.clearCache()
        val rdds = spark.sparkContext.getPersistentRDDs.size
        println(f"DIAG $tag $name%-24s t=$elapsed%7.2f gc=${gcD}%6d ms heap=${heapMB}%6d MB thr=${threadBean.getThreadCount}%4d rdds=$rdds%4d cls=${classBean.getLoadedClassCount}%7d")
      }
    }
    pass("cold")
    pass("steady")
    spark.stop()
  }
}
