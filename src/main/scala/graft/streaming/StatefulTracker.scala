package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom arbitrary-state streaming (SURVEY.md §2.9 extension surface:
  * `KeyValueGroupedDataset.flatMapGroupsWithState`): a per-user running
  * tracker that survives across micro-batches — cumulative event count,
  * cumulative value, and the high-water timestamp — emitting one updated
  * row per user per batch. This is the state shape a 100 TB pipeline
  * uses for per-entity counters/quotas where windowed aggregates don't
  * fit (state is keyed, unbounded in time, updated incrementally).
  */
object StatefulTracker {

  final case class EventIn(user_id: Long, value: Double, ts_us: Long)
  final case class UserState(n: Long, total: Double, maxTs: Long)
  final case class UserUpdate(user_id: Long, n_events: Long,
                              total_value: Double, max_ts_us: Long)

  def update(userId: Long, events: Iterator[EventIn],
             state: GroupState[UserState]): Iterator[UserUpdate] = {
    val prev = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
    var n = prev.n
    var total = prev.total
    var maxTs = prev.maxTs
    events.foreach { e =>
      n += 1
      total += e.value
      if (e.ts_us > maxTs) maxTs = e.ts_us
    }
    state.update(UserState(n, total, maxTs))
    Iterator(UserUpdate(userId, n, total, maxTs))
  }

  /** Wire the tracker over a parsed stream (StreamingIngest.parse
    * output). Append mode with NoTimeout — state lives for the query. */
  def track(spark: SparkSession,
            parsed: org.apache.spark.sql.DataFrame): Dataset[UserUpdate] = {
    import spark.implicits._
    parsed
      .selectExpr("user_id", "value", "unix_micros(ts) AS ts_us")
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
