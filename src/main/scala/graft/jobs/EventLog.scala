package graft.jobs

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Operational event log (SURVEY.md §2.10 D4): the reference writes SP
  * progress to a Snowflake event table (code/curate/01_setup.sql:23-30);
  * here a SparkListener captures job lifecycle events in-process and
  * flushes them to a table on demand. Complements [[Notifier]] (D3).
  */
final case class JobEvent(job_id: Int, event: String, ts_ms: Long,
                          detail: String)

final class EventLogListener extends SparkListener {
  private val events = new ConcurrentLinkedQueue[JobEvent]()

  override def onJobStart(js: SparkListenerJobStart): Unit =
    events.add(JobEvent(js.jobId, "job_start", js.time,
      s"stages=${js.stageInfos.size}"))

  override def onJobEnd(je: SparkListenerJobEnd): Unit =
    events.add(JobEvent(je.jobId, "job_end", je.time,
      je.jobResult.toString))

  def snapshot: Seq[JobEvent] = events.iterator().asScala.toSeq

  /** Flush captured events to a managed table (overwrite). */
  def flush(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val df = snapshot.toDF()
    TableIO.overwrite(spark, df, table)
    spark.table(table)
  }
}

object EventLog {
  /** Attach a fresh listener to the session. Caller keeps the handle. */
  def attach(spark: SparkSession): EventLogListener = {
    val l = new EventLogListener
    spark.sparkContext.addSparkListener(l)
    l
  }
}
