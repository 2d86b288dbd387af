package graft.api

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Public library facade for multimodal columns over ARBITRARY caller
  * DataFrames carrying binary payloads (e.g. a `binaryFile` scan's
  * `content` column), delegating to the same decode stages as the
  * oracle-checked `mm_*` queries. Images decode with `javax.imageio`
  * (PNG/JPEG/BMP/GIF/TIFF), audio with `javax.sound.sampled`
  * (WAV/AU/AIFF PCM) — real JDK codecs, executor-side only; the
  * driver sees metadata rows.
  */
object Media {

  private def payloads(df: DataFrame, idCol: String,
                       bytesCol: String): Dataset[Multimodal.ImgPayload] = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
      col(bytesCol).as("payload")).as[Multimodal.ImgPayload]
  }

  /** Decode each image payload: (id, magic, width, height, channels,
    * sum_r, sum_g, sum_b) — the `mm_decode_meta` stage. Payloads must
    * be a format the JDK reads (PNG/JPEG/BMP/GIF/TIFF). */
  def imageMeta(df: DataFrame, idCol: String = "id",
                bytesCol: String = "content"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    payloads(df, idCol, bytesCol)
      .mapPartitions(Multimodal.decodeMeta)
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }

  /** Perceptual near-dup groups by average-hash over the decoded
    * pixels — the `mm_phash_dedup` stage. Returns (id, phash,
    * dup_group = min id sharing the hash, group_size). */
  def imageDedup(df: DataFrame, idCol: String = "id",
                 bytesCol: String = "content"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val hashes = payloads(df, idCol, bytesCol)
      .mapPartitions(Multimodal.avgHash)
      .toDF()
    val groups = hashes.groupBy("phash")
      .agg(min(col("doc_id")).as("dup_group"),
        count(lit(1)).as("group_size"))
    hashes.join(groups, "phash")
      .select(col("doc_id").as(idCol), col("phash"),
        col("dup_group"), col("group_size"))
  }

  /** Decode each WAV payload: (id, n_frames, channels, sample_rate,
    * bits, sum_s, min_s, max_s) — the `mm_audio_meta` stage. */
  def audioMeta(df: DataFrame, idCol: String = "id",
                bytesCol: String = "content"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(bytesCol).as("payload")).as[Multimodal.AudPayload]
      .mapPartitions(Multimodal.decodeWav)
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }
}
