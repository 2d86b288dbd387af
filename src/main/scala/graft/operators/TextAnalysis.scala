package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for training-data pipelines over the
  * `documents` table: marker-n-gram language ID, integer-exact quality
  * scoring, token counting (whitespace + BPE-ish regex + chars/4
  * estimate), and document fingerprinting (md5 of normalized text plus a
  * winnowing-style min-shingle-hash signature).
  *
  * Scale/determinism notes: all scores are integers or strings — no
  * float ratios, so oracles match exactly. The marker table is a tiny
  * broadcast join; everything else is per-row expressions inside
  * whole-stage codegen.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  /** (lang, marker-word) pairs — tiny, broadcast. */
  private val markers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "and", "en" -> "of", "en" -> "to", "en" -> "a",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das", "de" -> "ist",
    "fr" -> "le", "fr" -> "la", "fr" -> "et", "fr" -> "les", "fr" -> "des",
    "es" -> "el", "es" -> "la", "es" -> "y", "es" -> "los", "es" -> "que")

  private val bpeIsh = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  val queries: Map[String, Q] = Map(
    // Language ID: count marker-word hits per candidate language, take
    // the argmax (ties broken by language code), 'und' when no marker
    // hits at all. The marker dimension broadcasts; the aggregate is a
    // two-level hash agg on (doc, lang).
    "ta_lang_id" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val m = broadcast(markers.toDF("mlang", "mword"))
      val hits = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .join(m, col("word") === col("mword"))
        .groupBy("doc_id", "mlang").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id").orderBy(col("n").desc, col("mlang"))
      val best = hits.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("doc_id"), col("mlang"))
      docs.join(best, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("mlang"), lit("und")).as("pred_lang"), col("lang"))
        .orderBy("doc_id")
    }),

    // Quality scoring with integer-exact features: char/token/punct
    // counts, marker-stopword hits, and a bucketed verdict.
    "ta_quality_score" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val m = broadcast(markers.toDF("mlang", "mword"))
      val stops = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .join(m.select(col("mword")).distinct(), col("word") === col("mword"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_stop"))
      docs.join(stops, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_stop"))
        .select(
          col("doc_id"),
          length(col("text")).cast("int").as("n_chars"),
          size(split(col("text"), " ")).as("n_tokens"),
          (length(col("text"))
            - length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
            .cast("int").as("n_punct"),
          col("n_stop"),
          when(size(split(col("text"), " ")).between(20, 1000)
              && col("n_stop") >= 3, "good")
            .when(size(split(col("text"), " ")) >= 5, "fair")
            .otherwise("poor").as("quality"))
        .orderBy("doc_id")
    }),

    // Token counting: whitespace tokens, a BPE-ish regex token count
    // (letter runs / digit runs / single symbols), and the chars/4
    // LLM-token estimate.
    "ta_token_count" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        regexp_count(col("text"), lit(bpeIsh)).cast("int").as("re_tokens"),
        ceil(length(col("text")) / 4.0).cast("int").as("est_tokens"))
        .orderBy("doc_id")),

    // Fingerprinting: md5 of whitespace-normalized text (exact-dup key)
    // and a winnowing-style signature — the minimum md5 over word
    // 5-gram windows (robust to local edits, the rolling-hash selection
    // used by winnowing dedup).
    "ta_fingerprint" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("norm",
          regexp_replace(trim(lower(col("text"))), " +", " "))
        .withColumn("w", split(col("norm"), " "))
        .select(
          col("doc_id"),
          substring(md5(col("norm").cast("binary")), 1, 16).as("fp"),
          expr(
            """CASE WHEN size(w) >= 5 THEN
              |  array_min(transform(sequence(1, size(w) - 4),
              |            i -> md5(cast(concat_ws(' ', slice(w, i, 5)) as binary))))
              |ELSE md5(cast(norm as binary)) END""".stripMargin)
            .as("winnow_min"))
        .orderBy("doc_id")),

    // Deterministic stratified (per-language) systematic sampling — the
    // reproducible subsetting a corpus pipeline uses for eval slices
    // and ablations: a document is sampled iff the first hex digit of
    // md5(doc_id) falls in {0,1} (a fixed 2/16 rate), so every engine,
    // run, and partition layout selects the SAME documents. Per-stratum
    // accounting comes back with the sample.
    "samp_stratified" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("bucket", expr(
          "instr('0123456789abcdef'," +
            " substr(md5(cast(doc_id as string)), 1, 1)) - 1"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("bucket") < 2, 1)).as("n_sampled"))
        .orderBy("lang"))
  )

  private val markerValues = markers
    .map { case (l, w) => s"('$l','$w')" }.mkString(",")

  val oracles: Map[String, String] = Map(
    "samp_stratified" ->
      """SELECT lang, count(*) AS n_docs,
        |  count(CASE WHEN strpos('0123456789abcdef',
        |          substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 2
        |        THEN 1 END) AS n_sampled
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "ta_lang_id" ->
      s"""WITH markers(mlang, mword) AS (VALUES $markerValues),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents),
         |hits AS (
         |  SELECT doc_id, mlang, count(*) AS n
         |  FROM tok JOIN markers ON word = mword GROUP BY doc_id, mlang),
         |best AS (
         |  SELECT doc_id, mlang FROM (
         |    SELECT doc_id, mlang,
         |      row_number() OVER (PARTITION BY doc_id
         |                         ORDER BY n DESC, mlang) AS rn
         |    FROM hits) x WHERE rn = 1)
         |SELECT d.doc_id, coalesce(b.mlang, 'und') AS pred_lang, d.lang
         |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "ta_quality_score" ->
      s"""WITH markers(mlang, mword) AS (VALUES $markerValues),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents),
         |stops AS (
         |  SELECT doc_id, count(*) AS n_stop
         |  FROM tok JOIN (SELECT DISTINCT mword FROM markers) m
         |    ON word = mword
         |  GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(length(text) AS INTEGER) AS n_chars,
         |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |  CAST(length(text)
         |       - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
         |       AS INTEGER) AS n_punct,
         |  coalesce(s.n_stop, 0) AS n_stop,
         |  CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000
         |            AND coalesce(s.n_stop, 0) >= 3 THEN 'good'
         |       WHEN len(string_split(text, ' ')) >= 5 THEN 'fair'
         |       ELSE 'poor' END AS quality
         |FROM documents d LEFT JOIN stops s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "ta_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '$bpeIsh')) AS INTEGER)
         |    AS re_tokens,
         |  CAST(ceil(length(text) / 4.0) AS INTEGER) AS est_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "ta_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    regexp_replace(trim(lower(text)), ' +', ' ', 'g') AS norm
        |  FROM documents),
        |w AS (SELECT doc_id, norm, string_split(norm, ' ') AS w FROM n)
        |SELECT doc_id,
        |  substr(md5(norm), 1, 16) AS fp,
        |  CASE WHEN len(w) >= 5 THEN
        |    list_min(list_transform(range(1, len(w) - 3),
        |      i -> md5(array_to_string(w[i:i+4], ' '))))
        |  ELSE md5(norm) END AS winnow_min
        |FROM w ORDER BY doc_id""".stripMargin
  )
}
