package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.operators.Dedup

/** Streaming corpus curation: the LLM-training recipe's front gates
  * (quality → exact dedup → near-dup removal) running INCREMENTALLY
  * over a document stream via `foreachBatch` — the loop-closer between
  * the streaming ingest surface (T1–T4) and the batch corpus pipeline
  * (`pipe_training_recipe`). Each micro-batch is curated against the
  * accumulated corpus STATE, never against the full corpus:
  *
  *   1. quality gate — `>= minWords` words (`pipe_clean_corpus` stage 1);
  *   2. exact dedup — within-batch keep-lowest per normalized-body md5
  *      digest, then a digest anti-join against every digest already
  *      seen (`dd_exact`'s 16-byte key: the state probe shuffles
  *      digests, never bodies);
  *   3. near-dup removal — the batch's MinHash banded signatures probe
  *      the materialized signature state on (band, bv) exactly like
  *      `dd_incremental`'s batch-vs-corpus join (state×new plus
  *      new×new, never state×state), dropping a new doc on >= 6/9
  *      signature agreement with anything seen earlier (or with a
  *      lower-id doc in its own batch).
  *
  * State is four parquet tables under `outDir` — three append-only:
  * `accepted/` (the curated corpus), `digests/` (normalized-body md5 of
  * every good doc seen), and `sigs/` (banded signatures of every doc
  * seen — dropped docs stay in the index, mirroring the batch twin
  * where pairing runs over the FULL corpus before survivors are
  * chosen) — plus `clusters/` (round 13), the maintained
  * duplicate-cluster star forest, overwritten per batch by merging the
  * batch's verified pairs into the prior forest (the dd_cluster_incr
  * technique; equals the full-history dd_cluster recompute at every
  * batch boundary). At 100 TB each batch's cost scales with the batch: the
  * signature index is probed through a bucket equi-join and the digest
  * state through a 16-byte hash anti-join; nothing re-pairs the
  * existing corpus. Under in-order arrival (doc ids non-decreasing
  * across batches — the daily-ingest shape) the accepted set is
  * IDENTICAL to running the batch recipe's stages 1–3 over the full
  * corpus; CorpusStreamSpec pins that twin equivalence batch-by-batch.
  *
  * Sink semantics: parquet appends are checkpoint-gated per batch
  * (Trigger.AvailableNow + checkpointLocation), the same at-least-once
  * append contract as the T1 ingest path; a replayed batch re-appends,
  * which the digest gate then filters from the CORPUS on the next pass
  * — accepted/ itself should be read through `dropDuplicates(doc_id)`
  * by consumers that must tolerate mid-batch crashes.
  */
object CorpusStream {

  /** Streamed document-line schema ({"doc_id": n, "text": "..."}). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private val MIN_WORDS = 5 // pipe_clean_corpus stage-1 gate

  /** File-source JSON-lines stream → incremental curation. AvailableNow
    * drains pending input then stops (deterministic tests); the
    * processing-time default mirrors the reference's 10 s flush. */
  def start(spark: SparkSession, srcDir: String, outDir: String,
            checkpointDir: String,
            availableNow: Boolean = false,
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val docs = reader.text(srcDir)
      .select(from_json(col("value"), schema).as("r"))
      .select("r.*")
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateBatch(batch, outDir, MIN_WORDS)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow()
               else Trigger.ProcessingTime("10 seconds"))
      .start()
  }

  /** One micro-batch through the three gates against on-disk state.
    * Exposed for the spec's batch-by-batch twin comparison. */
  private[graft] def curateBatch(batch0: DataFrame, outDir: String,
                                 minWords: Int): Unit = {
    val s = batch0.sparkSession
    val batch = batch0.select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull).cache()
    try {
      // gate 1+2a: quality, then within-batch keep-lowest per digest
      val good = batch
        .filter(size(split(col("text"), " ")) >= minWords)
        .withColumn("gh",
          md5(regexp_replace(trim(lower(col("text"))), " +", " ")
            .cast("binary")))
      val exact = good
        .withColumn("rn", row_number().over(
          Window.partitionBy("gh").orderBy("doc_id")))
        .filter(col("rn") === 1)
        .drop("rn")
      // gate 2b: digest anti-join against state (16-byte keys only)
      val priorDigests = readState(s, s"$outDir/digests",
        StructType(Seq(StructField("gh", StringType))))
      val exOk = exact.join(priorDigests, Seq("gh"), "left_anti")
      // gate 3: banded-signature probe — state×new plus new×new
      // uncached banding (round 13): this caller caches the banded
      // frame itself and unpersists it at batch end — the cache
      // bandedSignaturesOf takes internally on the signature table had
      // no release path and pinned one table per micro-batch for the
      // life of the stream
      val sigs = Dedup.bandedSignaturesUncached(batch).cache()
      val sigSchema = StructType(
        StructField("doc_id", LongType) +:
          (1 to Dedup.K).map(i => StructField(s"h$i", StringType)) :+
          StructField("band", IntegerType) :+
          StructField("bv", StringType))
      val priorSigs = readState(s, s"$outDir/sigs", sigSchema)
      val nMatch = (1 to Dedup.K).map(i =>
        (col(s"a$i") === col(s"b$i")).cast("int")).reduce(_ + _)
      def keyed(df: DataFrame, id: String, p: String): DataFrame = df.toDF(
        id +: (1 to Dedup.K).map(i => s"$p$i") :+ "band" :+ "bv": _*)
      val fromState = keyed(priorSigs, "id1", "a")
        .join(keyed(sigs, "id2", "b"), Seq("band", "bv"))
        .filter(col("id1") =!= col("id2")) // replayed batch: not a self-dup
      val inBatch = keyed(sigs, "id1", "a")
        .join(keyed(sigs, "id2", "b"), Seq("band", "bv"))
        .filter(col("id1") < col("id2"))
      val scored = fromState.unionByName(inBatch)
        .select(col("id1"), col("id2"), nMatch.as("n_match"))
        .filter(col("n_match") >= 6)
        .cache()
      val nearDup = scored
        .select(col("id2").as("doc_id"))
        .distinct()
      val survivors = exOk.join(nearDup, Seq("doc_id"), "left_anti")
      // gate 3b (round 13): INCREMENTAL CLUSTER MAINTENANCE — the
      // duplicate-cluster graph rides along as stream state, the
      // dd_cluster_incr technique per micro-batch: the persisted
      // labeling is a STAR FOREST (doc_id → cluster root), which
      // preserves accumulated connectivity exactly, so components over
      // (prior star edges ∪ this batch's verified pairs) equal the
      // full-history recompute (CorpusStreamSpec pins stream clusters
      // == batch dd_cluster twin). Per-batch cost: label propagation
      // whose rounds are governed by the NEW pairs (stars have depth
      // 1), one star-table join per round — never a corpus re-pair.
      // OVERWRITE is safe and replay-idempotent: components
      // materializes its input eagerly (localCheckpoint) before the
      // write clears the directory, and re-merging an already-merged
      // batch's pairs into the updated forest is a fixpoint.
      val starSchema = StructType(Seq(
        StructField("cluster_id", LongType),
        StructField("doc_id", LongType)))
      val priorStars = readState(s, s"$outDir/clusters", starSchema)
      val newStars = Dedup.components(
        priorStars.filter(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id").as("id1"), col("cluster_id").as("id2"))
          .unionAll(scored.select("id1", "id2")))
      // state + output appends (survivors first: a crash between writes
      // then re-curates the batch against unchanged state instead of
      // silently dropping it against half-written state; the cluster
      // overwrite goes last — it is idempotent under replay)
      survivors.select("doc_id", "text")
        .write.mode("append").parquet(s"$outDir/accepted")
      exact.select("gh").distinct()
        .write.mode("append").parquet(s"$outDir/digests")
      sigs.write.mode("append").parquet(s"$outDir/sigs")
      newStars.select("cluster_id", "doc_id")
        .write.mode("overwrite").parquet(s"$outDir/clusters")
      scored.unpersist()
      sigs.unpersist()
    } finally {
      batch.unpersist()
      ()
    }
  }

  /** Read a state table, or an empty frame with its schema before the
    * first batch has written it. */
  private def readState(s: SparkSession, path: String,
                        schema: StructType): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.schema(schema).parquet(path)
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema)
  }
}
