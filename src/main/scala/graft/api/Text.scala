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
}
