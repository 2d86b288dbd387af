package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.operators.TextAnalysis

/** Public library facade for text analysis over ARBITRARY caller
  * DataFrames — the per-document signals a corpus pipeline computes
  * between ingest and training, delegating to the same code paths the
  * oracle-checked `ta_*` queries run. All three are broadcast-dimension
  * or pure per-row plans: embarrassingly parallel at any corpus size.
  */
object Text {

  private def normalized(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))

  /** Marker-word language ID: (id, pred_lang), 'und' when no marker
    * word of any candidate language appears. */
  def langId(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    TextAnalysis.langIdOf(normalized(docs, idCol, textCol))
      .withColumnRenamed("doc_id", idCol)

  /** Integer-exact quality features (chars, tokens, punctuation,
    * stopword hits) and a good/fair/poor verdict. */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    TextAnalysis.qualityScoreOf(normalized(docs, idCol, textCol))
      .withColumnRenamed("doc_id", idCol)

  /** Whitespace, BPE-ish regex, and chars/4 token counts per doc. */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    TextAnalysis.tokenCountsOf(normalized(docs, idCol, textCol))
      .withColumnRenamed("doc_id", idCol)

  /** BM25 top-k retrieval for `terms`: (rank, id). Inverted-index
    * probe shape — only documents containing a query term are scored;
    * corpus stats ride broadcast rows. */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int = 10,
           idCol: String = "doc_id",
           textCol: String = "text"): DataFrame =
    TextAnalysis.bm25Of(normalized(docs, idCol, textCol), terms, k)
      .withColumnRenamed("doc_id", idCol)

  /** Document fingerprints: exact-dup md5 key (`fp`) and a
    * winnowing-style min-hash over word 5-gram windows (`winnow_min`),
    * robust to local edits. Pure per-row projection. */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    TextAnalysis.fingerprintOf(normalized(docs, idCol, textCol))
      .withColumnRenamed("doc_id", idCol)

  /** Per-group median/MAD token-length outliers: (id, group, ntok,
    * med, mad) for docs with |ntok − median| > kMad·MAD. Robust to
    * heavy tails (breakdown point 1/2) where mean/stddev is not;
    * integer-exact positional medians. */
  def outliers(docs: DataFrame, kMad: Int = 3,
               idCol: String = "doc_id", textCol: String = "text",
               groupCol: String = "source"): DataFrame =
    TextAnalysis.outliersOf(
      docs.select(col(idCol).as("doc_id"), col(groupCol).as("source"),
        col(textCol).as("text")), kMad)
      .withColumnRenamed("doc_id", idCol)
      .withColumnRenamed("source", groupCol)

  /** Exact 3-word phrase matches: (id, phrase, n_occ) per document
    * containing the phrase, overlapping occurrences included.
    * Positional postings intersection with broadcast term pruning —
    * only the three terms' postings reach the joins. */
  def phraseSearch(docs: DataFrame, phrase: String,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(phrase.trim.split(" ").length == 3,
      "phraseSearch matches exactly 3-word phrases")
    val p = docs.sparkSession.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(phrase.trim)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("phrase",
          org.apache.spark.sql.types.StringType))))
    TextAnalysis.phraseSearchOf(normalized(docs, idCol, textCol), p)
      .withColumnRenamed("doc_id", idCol)
  }
}
