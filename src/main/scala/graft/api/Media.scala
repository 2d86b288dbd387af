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

  /** The 64-bit average-hash table of a caller image corpus —
    * (id, bits) — the decode+hash stage the perceptual NEAR-dup
    * operators consume. A production pipeline persists this table
    * once at ingest (the named queries do, via Materialize) and runs
    * every later near-dup/cluster pass off it. */
  def imageHashes(df: DataFrame, idCol: String = "id",
                  bytesCol: String = "content"): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    payloads(df, idCol, bytesCol)
      .mapPartitions(Multimodal.avgHashBits)
      .toDF()
      .withColumnRenamed("doc_id", idCol)
  }

  /** Perceptual NEAR-dup pairs (Hamming ≤ 2 on the 64-bit average
    * hash) over caller image payloads — the `mm_phash_near` pipeline
    * (round 13): decode → hash → 3-band multi-index split →
    * band-keyed self-join (any pair within Hamming 2 agrees on ≥ 1
    * band, by pigeonhole) → exact bit_count verify. Returns (id1 <
    * id2, hamming). The output is the TRUE pair set — quadratic on a
    * replica-saturated corpus; use [[imageClusters]] for the O(n)
    * production shape. */
  def imageNearDup(df: DataFrame, idCol: String = "id",
                   bytesCol: String = "content"): DataFrame =
    Multimodal.phashNearOf(
      imageHashes(df, idCol, bytesCol)
        .withColumnRenamed(idCol, "doc_id"))

  /** Perceptual near-dup CLUSTERS over caller image payloads — the
    * `mm_phash_cluster` pipeline (round 13): replica collapse on the
    * 64-bit hash FIRST, banded Hamming join over DISTINCT hashes,
    * connected components, map back through the hash representative.
    * One row per image — (id, cluster_id = min id of its near-dup
    * class) — O(n) output at any replica density. */
  def imageClusters(df: DataFrame, idCol: String = "id",
                    bytesCol: String = "content"): DataFrame = {
    // checkpoint-backed (components) → memoized per (session, input
    // plan), the serving contract every components facade follows
    val in = df.select(col(idCol), col(bytesCol))
    graft.sources.Materialize.resultOnce("media.imageClusters", "",
      Seq(in))(
      Multimodal.phashClusterOf(
        imageHashes(df, idCol, bytesCol)
          .withColumnRenamed(idCol, "doc_id"))
        .withColumnRenamed("doc_id", idCol))
  }

  /** INCREMENTAL perceptual clusters (round 14 — the nightly
    * add-path): merge a NEW image batch into an existing corpus's
    * clusters hashing ONLY the batch through the codec plus one
    * codec-free pass over the base hash table and star forest, which
    * are memoized per (session, base plan) — the first call on a base
    * corpus pays its codec once, every later batch is batch-scaled.
    * Equals [[imageClusters]] over base ∪ batch (the star-forest merge
    * loses nothing — the `mm_phash_incr` contract, hash-matched
    * against the full-recompute oracle). Returns (id, cluster_id) for
    * EVERY image, base and batch. */
  def imageClustersIncremental(base: DataFrame, batch: DataFrame,
                               idCol: String = "id",
                               bytesCol: String = "content"): DataFrame = {
    val baseIn = base.select(col(idCol), col(bytesCol))
    val batchIn = batch.select(col(idCol), col(bytesCol))
    graft.sources.Materialize.resultOnce(
      "media.imageClustersIncremental", "", Seq(baseIn, batchIn)) {
      val baseHashes = graft.sources.Materialize.cached(
        "media_base_hashbits",
        () => imageHashes(base, idCol, bytesCol)
          .withColumnRenamed(idCol, "doc_id"))
      val baseStars = graft.sources.Materialize.cached(
        "media_base_stars",
        () => {
          // rep-level edges — see Multimodal.phashMergeOf
          val reps = baseHashes.groupBy("bits")
            .agg(min("doc_id").as("rep"))
          Multimodal.phashClusterOf(baseHashes)
            .join(reps.select(col("rep").as("doc_id")), "doc_id")
            .filter(col("doc_id") =!= col("cluster_id"))
            .select(col("doc_id").as("id1"), col("cluster_id").as("id2"))
        })
      // the batch hash table is its own cached artifact (the merge
      // reads it three times; a new batch plan mints a new artifact)
      val batchHashes = graft.sources.Materialize.cached(
        "media_batch_hashbits",
        () => imageHashes(batch, idCol, bytesCol)
          .withColumnRenamed(idCol, "doc_id"))
      Multimodal.phashMergeOf(baseHashes, baseStars, batchHashes)
        .withColumnRenamed("doc_id", idCol)
    }
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
