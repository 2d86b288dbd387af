package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.RowPattern
import graft.streaming.CepMatcher.{CepEvent, CepUpdate}

/** Streaming MATCH_RECOGNIZE for ARBITRARY row patterns — the general
  * form of [[CepMatcher]] (which hard-codes the funnel as a one-bit
  * DFA): the [[RowPattern.MatchCounter]] speculation chain itself is
  * the per-key state, carried through `flatMapGroupsWithState` under
  * java serialization, so the SAME machine that backs the batch fold
  * (operators/EventAnalytics.matchCountsOf, oracle-checked as
  * `ev_match_recognize` / `t10_cep_twin`) runs incrementally with
  * checkpointed state and survives restart like any stateful query —
  * CepPatternSpec twin-pins stream-with-restart against the batch fold
  * for disjoint AND non-disjoint patterns.
  *
  * Emission: each micro-batch emits the key's `flushedCount` — the
  * count if the stream ended here — so at quiescence the last emission
  * equals the batch fold's finished count for ANY pattern (a pending
  * match that later input could still extend is resolved exactly the
  * way EOF would resolve it, on a copy; the live state keeps waiting).
  *
  * State bound (the RowPattern contract): terminator-disjoint patterns
  * carry O(|pattern|) per key forever; other patterns are capped at
  * `depthCap` unresolved speculative scans and fail the query loudly
  * past it — bounded checkpoint size for the life of the stream, never
  * a per-key history buffer.
  *
  * Ordering contract: same as CepMatcher — each micro-batch's group
  * sorts by (ts_us, event_id) before folding; across batches the
  * source must deliver each key's events in event-time order (what a
  * keyed Kafka topic provides, and what the spec's replay feeds).
  */
object CepPattern {

  /** The standard funnel code mapping (view→v, click→c, purchase→p,
    * else o) — the default `codeExpr`; callers with their own alphabet
    * pass any SQL expression over the parsed columns that yields one
    * code char (or a multi-char code string, fed char by char). */
  val funnelCode: String =
    """CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
      |WHEN 'purchase' THEN 'p' ELSE 'o' END""".stripMargin

  /** Wire the matcher over a parsed stream (StreamingIngest.parse
    * output) — or a batch frame with the same columns, where the fold
    * sees each key's whole history at once. Append + NoTimeout: the
    * machine lives for the query. */
  def matches(spark: SparkSession, parsed: DataFrame, pattern: String,
              depthCap: Int = 4096,
              codeExpr: String = funnelCode): Dataset[CepUpdate] = {
    val prog = RowPattern.compile(pattern)
    implicit val stateEnc: Encoder[RowPattern.MatchCounter] =
      Encoders.javaSerialization[RowPattern.MatchCounter]
    import spark.implicits._

    def update(userId: Long, events: Iterator[CepEvent],
               state: GroupState[RowPattern.MatchCounter])
        : Iterator[CepUpdate] = {
      val m = state.getOption.getOrElse(
        new RowPattern.MatchCounter(prog, depthCap))
      events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (e.code != null) m.feedAll(e.code)
      }
      state.update(m)
      Iterator(CepUpdate(userId, m.flushedCount))
    }

    parsed
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us",
        s"($codeExpr) AS code")
      .as[CepEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
