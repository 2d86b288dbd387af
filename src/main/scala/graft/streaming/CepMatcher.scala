package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming complex-event processing (the Flink-CEP / MATCH_RECOGNIZE
  * ONE ROW PER MATCH workload) as arbitrary-state streaming: the
  * pattern `view (click|other)* purchase` compiles to a ONE-BIT DFA —
  * "is a view-anchored match attempt open" — plus a match counter, so
  * per-user state is O(1) however long the stream runs. That is the
  * point of running CEP as a DFA fold instead of the batch trace+regex
  * plan (operators/EventAnalytics `ev_match_recognize`): the batch
  * plan materializes each user's trace, the stream keeps two words per
  * user and survives checkpoint/restart like any
  * flatMapGroupsWithState query.
  *
  * DFA equivalence to the regex's leftmost/non-overlapping/greedy
  * scan: 'v' opens (or re-anchors) an attempt, 'c'/'o' keep it open,
  * 'p' with an open attempt emits a match and closes it, 'p' without
  * one is ignored. A second 'v' while open simply stays open — the
  * earlier anchor's failure and the regex's retry-at-next-position
  * collapse to the same single bit.
  *
  * Ordering contract — GUARDED, never a silent miscount (round 10):
  * matches are defined over the per-user event-time order (ts_us,
  * event_id). Each micro-batch's group iterator is sorted before
  * folding (group volumes are per-user-per-batch, small by
  * construction); ACROSS batches the source must deliver each key's
  * events in event-time order — the per-key ordering a keyed Kafka
  * topic provides. The state carries the last-fed (ts_us, event_id)
  * frontier and an event arriving at or behind it FAILS THE QUERY
  * LOUDLY with the contract in the message — an out-of-order feed
  * corrupting the count with no signal is the one unacceptable
  * outcome. A source with bounded disorder belongs on
  * [[CepPattern.matches]], whose reorder buffer absorbs a declared
  * lateness (and whose "drop" policy counts what it skips).
  */
object CepMatcher {

  final case class CepEvent(user_id: Long, event_id: Long, ts_us: Long,
                            code: String)
  final case class CepState(open: Boolean, matches: Long,
                            last_ts: Long = Long.MinValue,
                            last_id: Long = Long.MinValue)
  final case class CepUpdate(user_id: Long, n_matches: Long)

  private[graft] def fold(open0: Boolean, matches0: Long,
                          evs: Seq[CepEvent]): (Boolean, Long) = {
    var open = open0
    var matches = matches0
    evs.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      e.code match {
        case "v" => open = true
        case "p" => if (open) { matches += 1; open = false }
        case _   => () // c / o keep the attempt open
      }
    }
    (open, matches)
  }

  def update(userId: Long, events: Iterator[CepEvent],
             state: GroupState[CepState]): Iterator[CepUpdate] = {
    val prev = state.getOption.getOrElse(CepState(open = false, 0L))
    val evs = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    // ordering guard: the sorted batch's FIRST event must be past the
    // carried frontier (within-batch order is restored by the sort —
    // only cross-batch regression can trip this)
    evs.headOption.foreach { e =>
      if (e.ts_us < prev.last_ts ||
          (e.ts_us == prev.last_ts && e.event_id <= prev.last_id))
        throw new IllegalStateException(
          s"CEP ordering contract violated for key $userId: event " +
            s"(ts_us=${e.ts_us}, event_id=${e.event_id}) arrived after " +
            s"the key's fed frontier (ts_us=${prev.last_ts}, " +
            s"event_id=${prev.last_id}). Deliver each key's events in " +
            "event-time order (keyed topic), or use CepPattern.matches " +
            "with allowedLatenessUs / onLate=\"drop\" for a source " +
            "with bounded disorder.")
    }
    val (open, matches) = fold(prev.open, prev.matches, evs)
    val frontier = evs.lastOption
    state.update(CepState(open, matches,
      frontier.map(_.ts_us).getOrElse(prev.last_ts),
      frontier.map(_.event_id).getOrElse(prev.last_id)))
    Iterator(CepUpdate(userId, matches))
  }

  /** Wire the matcher over a parsed stream (StreamingIngest.parse
    * output) — or a batch frame with the same columns, where the fold
    * sees each user's whole history at once. Append + NoTimeout: the
    * counter lives for the query. */
  def matches(spark: SparkSession, parsed: DataFrame): Dataset[CepUpdate] = {
    import spark.implicits._
    parsed
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us",
        """CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
          |WHEN 'purchase' THEN 'p' ELSE 'o' END AS code""".stripMargin)
      .as[CepEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
