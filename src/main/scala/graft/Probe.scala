package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Optimization-round measurement tool (NOT part of the driver
  * contract; tooling like BenchDiag). Runs the named queries with the
  * bench's exact session config and action, and prints a per-JOB
  * breakdown (wall ms, stage count, task count, shuffle read/write
  * bytes) from a SparkListener — the "where does the time go" empirical
  * loop of the optimization guide (§1.1) for a UI-less environment.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.Probe q1,q2"         — 1 cold + 1 steady pass
  */
object Probe {
  private final case class JobRow(id: Int, var desc: String,
      var start: Long = 0L, var end: Long = 0L, var stages: Int = 0,
      var tasks: Int = 0, var shufRead: Long = 0L, var shufWrite: Long = 0L)

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
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "lineitem").count()
    Tables(spark, sfDir, "orders").count()
    graft.sources.Bucketing.writeInvoiceTextOnce(spark, sfDir)

    val jobs = mutable.LinkedHashMap.empty[Int, JobRow]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val r = JobRow(e.jobId,
          Option(e.properties).map(_.getProperty("spark.job.description", ""))
            .getOrElse(""))
        r.start = e.time
        r.stages = e.stageIds.size
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        jobs(e.jobId) = r
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          for (jid <- stageToJob.get(e.stageInfo.stageId);
               r <- jobs.get(jid)) {
            r.tasks += e.stageInfo.numTasks
            r.shufRead += e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
            r.shufWrite += e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          }
        }
    }

    val names = if (args.nonEmpty) args(0).split(",").map(_.trim).toSeq
      else Seq("gr_components")
    val qmap = SparkEntry.queries
    names.foreach { n =>
      // cold pass without listener detail
      val t0 = System.nanoTime(); qmap(n)(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // steady pass with listener
      jobs.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val t1 = System.nanoTime(); qmap(n)(spark, sfDir).count()
      val steady = (System.nanoTime() - t1) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"##### $n cold=$cold%.3f steady=$steady%.3f jobs=${jobs.size}")
      var sumMs = 0L
      jobs.values.foreach { r =>
        val ms = r.end - r.start; sumMs += ms
        println(f"  job ${r.id}%4d ${ms}%6d ms  stages=${r.stages}%2d tasks=${r.tasks}%4d shufR=${r.shufRead}%10d shufW=${r.shufWrite}%10d  ${r.desc.take(60)}")
      }
      println(f"  sum-of-jobs ${sumMs} ms (gaps = driver/planning time)")
    }
    spark.stop()
  }
}
