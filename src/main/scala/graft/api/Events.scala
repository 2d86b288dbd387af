package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Public library facade for behavioral event analytics over ARBITRARY
  * caller DataFrames, delegating to the paths behind the
  * oracle-checked `ev_segment_overlap` / `ev_seq_patterns` queries.
  */
object Events {

  /** Pairwise audience overlap: (ta, tb, n_a, n_b, n_both) for every
    * unordered pair of segment values, n_both = entities present in
    * both. The incidence dedups before the entity-keyed pair join, so
    * cost is entities × segments-per-entity, never raw event volume. */
  def segmentOverlap(events: DataFrame, idCol: String = "user_id",
                     segCol: String = "event_type"): DataFrame =
    graft.operators.EventAnalytics.segmentOverlapOf(
      events.select(col(idCol), col(segCol)))

  /** Top-k consecutive label triples by distinct-entity support.
    * (orderCol, tieCol) must totally order each entity's stream. */
  def sequencePatterns(events: DataFrame, k: Int = 15,
                       idCol: String = "user_id",
                       tieCol: String = "event_id",
                       labelCol: String = "event_type",
                       orderCol: String = "ts"): DataFrame =
    graft.operators.EventAnalytics.seqPatternsOf(
      events.select(col(idCol), col(tieCol), col(labelCol),
        col(orderCol)), k)

  /** Row-pattern matching (MATCH_RECOGNIZE / CEP) over an arbitrary
    * event frame: per entity, the count of `pattern`'s leftmost /
    * non-overlapping / greedy matches against the entity's trace of
    * single-char codes in ((orderCol, tieCol)) order. `codeCol` must
    * hold one character per event (map event types to a code alphabet
    * first); `pattern` is a regex over that alphabet. Delegates to
    * the path behind the oracle-checked `t10_cep_twin` /
    * `ev_match_recognize`; the same engine runs incrementally with
    * checkpointed per-key state in streaming.CepPattern (any
    * terminator-disjoint pattern) and streaming.CepMatcher (the
    * funnel's one-bit DFA).
    *
    * MEMORY CONTRACT (bounded for EVERY pattern this accepts): one
    * entity-keyed shuffle; per-entity state is the RowPattern
    * speculation chain — never the entity's history and never a
    * buffered trace. Terminator-disjoint patterns
    * (`RowPattern.terminatorDisjoint`, e.g. the funnel `v[co]*p`) are
    * O(|pattern|) by construction; other patterns (e.g. `v.*p`) run
    * bounded by `depthCap` unresolved speculative scans and FAIL
    * LOUDLY past it — reachable only for the degenerate
    * loop-alternation class where leftmost semantics genuinely need
    * trace-proportional state (see the RowPattern object doc). */
  def matchPattern(events: DataFrame, pattern: String,
                   idCol: String = "user_id",
                   tieCol: String = "event_id",
                   codeCol: String = "code",
                   orderCol: String = "ts",
                   depthCap: Int = 4096): DataFrame =
    graft.operators.EventAnalytics.matchCountsOf(
      events.select(col(idCol), col(orderCol), col(tieCol),
        col(codeCol)), pattern, depthCap)

  /** MATCH_RECOGNIZE **ONE ROW PER MATCH**: every match of `pattern`
    * in the entity's ordered code stream as its own row —
    * (idCol, start_us, start_event_id, end_us, end_event_id), where
    * start is the match's first event and end its last. Same
    * one-shuffle ordered fold as [[matchPattern]]; delegates to the
    * path behind the oracle-checked `ev_match_spans`. Span mode
    * requires a TERMINATOR-DISJOINT pattern (loud failure otherwise:
    * speculative span buffers are only bounded under that contract)
    * and exactly one code char per event; `orderCol` must be an
    * epoch-micros LONG column here (it is emitted back in the span
    * rows). */
  def matchSpans(events: DataFrame, pattern: String,
                 idCol: String = "user_id",
                 tieCol: String = "event_id",
                 codeCol: String = "code",
                 orderCol: String = "us"): DataFrame =
    graft.operators.EventAnalytics.matchSpansOf(
      events.select(col(idCol), col(orderCol), col(tieCol),
        col(codeCol)), pattern)

  /** Streaming twin of [[matchPattern]]: the SAME machine carried as
    * checkpointed per-key state through flatMapGroupsWithState
    * (streaming/CepPattern — restart-twin-pinned against the batch
    * fold in CepPatternSpec). `parsed` is a streaming frame with
    * (user_id, event_id, ts TIMESTAMP, event_type) — the
    * StreamingIngest.parse shape; `codeExpr` is any SQL expression
    * over those columns yielding the per-event code char(s), default
    * the funnel mapping. Each micro-batch emits, per key seen, the
    * match count as if the stream ended there (equal to the batch
    * fold at quiescence, for any pattern). Memory contract as
    * [[matchPattern]]. */
  def matchPatternStream(spark: org.apache.spark.sql.SparkSession,
                         parsed: DataFrame, pattern: String,
                         depthCap: Int = 4096,
                         codeExpr: String =
                           graft.streaming.CepPattern.funnelCode)
      : org.apache.spark.sql.Dataset[
        graft.streaming.CepMatcher.CepUpdate] =
    graft.streaming.CepPattern.matches(
      spark, parsed, pattern, depthCap, codeExpr)
}
