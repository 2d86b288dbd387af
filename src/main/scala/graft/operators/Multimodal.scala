package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata. The real decode (pixels,
  * samples, frames) needs codec libraries that do not ship in this
  * environment, so the decode step is a DETERMINISTIC FAKE — a magic
  * header + digest extraction — while everything Spark-side is real and
  * oracle-checked: binary column construction, schema, `mapPartitions`
  * batch shape over typed Datasets, and frame-offset slicing with
  * binary `substring`.
  *
  * Swap [[Multimodal.decodeStub]] for a real codec call (PDFBox-style,
  * see graft.functions.PdfText for the PDF case we DO implement) and the
  * pipeline is production-shaped: payloads never leave executors, the
  * driver sees only metadata rows.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** "Image" payload: 4-byte magic + utf-8 body (deterministic fake of
    * an encoded image; in production this is the raw file from a
    * binaryFile scan). */
  private def payloads(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(col("doc_id"),
      concat(lit("IMG0").cast("binary"), col("text").cast("binary"))
        .as("payload"))

  final case class MmIn(doc_id: Long, payload: Array[Byte])
  final case class MmMeta(doc_id: Long, n_bytes: Int, magic: String,
                          digest: String)

  /** The stubbed decode: per-partition iteration over binary payloads
    * extracting metadata. Replace the body with a codec call for real
    * decoding — the signature (Iterator of payload rows → Iterator of
    * typed metadata) is the production batch shape. */
  def decodeStub(rows: Iterator[MmIn]): Iterator[MmMeta] = {
    val md = MessageDigest.getInstance("MD5") // one instance per partition
    rows.map { r =>
      md.reset()
      val hex = md.digest(r.payload).map("%02x".format(_)).mkString
      val magic = r.payload.take(4).map("%02x".format(_)).mkString
      MmMeta(r.doc_id, r.payload.length, magic, hex.take(16))
    }
  }

  val queries: Map[String, Q] = Map(
    // Binary decode via mapPartitions: payload → (size, magic, digest).
    "mm_decode_meta" -> ((s, dir) => {
      import s.implicits._
      payloads(s, dir).as[MmIn]
        .mapPartitions(decodeStub)
        .toDF()
        .orderBy("doc_id")
    }),

    // Frame sampling: treat the payload as fixed-size 100-byte frames,
    // keep every 3rd frame, fingerprint each — binary substring +
    // sequence explode, all codegen'd expressions, no UDF.
    "mm_frame_sample" -> ((s, dir) =>
      payloads(s, dir)
        // integer div: Spark '/' is float division and DuckDB rounds on
        // double→int casts, so both sides use explicit integer division
        .withColumn("n_frames", expr("octet_length(payload) div 100"))
        .filter(col("n_frames") >= 1)
        .select(col("doc_id"), col("payload"),
          explode(expr("sequence(0, n_frames - 1, 3)")).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          md5(expr("substring(payload, frame_idx * 100 + 1, 100)"))
            .as("frame_md5"))
        .orderBy("doc_id", "frame_idx"))
  )

  val oracles: Map[String, String] = Map(
    // Text is pure ASCII (verified), so byte offsets == char offsets and
    // the oracle can mirror the binary ops on strings.
    "mm_decode_meta" ->
      """SELECT doc_id,
        |  CAST(4 + octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |  lower(hex(CAST('IMG0' AS BLOB))) AS magic,
        |  substr(md5('IMG0' || text), 1, 16) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """WITH p AS (
        |  SELECT doc_id, 'IMG0' || text AS payload,
        |         CAST(length('IMG0' || text) // 100 AS INTEGER) AS n_frames
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, ((n_frames - 1) // 3) + 1),
        |                          i -> i * 3)) AS frame_idx,
        |    payload
        |  FROM p WHERE n_frames >= 1)
        |SELECT doc_id, frame_idx,
        |  md5(substr(payload, frame_idx * 100 + 1, 100)) AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  )
}
