package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Public library facade for similarity search over ARBITRARY caller
  * DataFrames carrying an embedding column (`array<float>`): exact
  * brute-force cosine top-k and the IVF scale path, delegating to the
  * same code paths the oracle-checked `sim_*` queries run. Cosine uses
  * the codegen'd [[graft.functions.FloatVecDot]] expression.
  *
  * Contract: query batches are small next to the corpus (they ride
  * broadcasts); centroids for the IVF path are caller-owned model
  * parameters (a small (id, vector) frame — e.g. k-means output).
  */
object Vectors {

  private def shaped(df: DataFrame, idCol: String,
                     vecCol: String): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    df.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
  }

  /** Exact cosine top-k of every query against the corpus:
    * (qid, nid, rank). Self-matches (same id) are excluded. */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
           idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame =
    Similarity.bruteTopKOf(
      shaped(queries, idCol, vecCol), shaped(corpus, idCol, vecCol), k)
      .select(col("qid"), col("nid"), col("rn").as("rank"))

  /** IVF top-k: corpus vectors assign to their nearest centroid in one
    * broadcast pass; each query probes its `probes` closest centroid
    * buckets and exact-reranks only those candidates — per-query cost
    * ~probes/|centroids| of the corpus. */
  def topKIvf(queries: DataFrame, corpus: DataFrame,
              centroids: DataFrame, k: Int, probes: Int = 4,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame =
    Similarity.ivfTopKOf(
      shaped(queries, idCol, vecCol), shaped(corpus, idCol, vecCol),
      shaped(centroids, idCol, vecCol)
        .select(col("vec_id").as("cid"), col("v").as("cv"),
          col("nrm").as("cn")),
      k, probes)
      .select(col("qid"), col("nid"), col("rn").as("rank"))

  /** SQ8 top-k: the corpus trains a per-dimension min/max codebook and
    * both sides quantize to 8-bit codes; candidates rank by the
    * dequantized dot and only the top-`rerank` per query get an exact
    * float rerank — the bandwidth-bound scale path (1 byte/dim scans)
    * between exact brute force and IVF's bucket pruning. */
  def topKSq(queries: DataFrame, corpus: DataFrame, k: Int,
             rerank: Int = 50,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    Similarity.sqTopKOf(
      shaped(queries, idCol, vecCol), shaped(corpus, idCol, vecCol),
      k, rerank)
      .select(col("qid"), col("nid"), col("rn").as("rank"))

  /** PQ/ADC top-k: the corpus trains 8 per-subspace 16-cell codebooks
    * (one Lloyd round each), vectors encode to 8 small ints, and a
    * query-to-vector distance is 8 LUT lookups; the top-`rerank` ADC
    * candidates per query get an exact rerank. The compute-bound scale
    * path: code scans touch 8 bytes/vector and never multiply.
    * Requires 64-dim vectors (the trained subspace layout). */
  def topKPq(queries: DataFrame, corpus: DataFrame, k: Int,
             rerank: Int = 40,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    graft.operators.ProductQuant.pqTopKOf(
      queries, corpus, k, rerank, idCol, vecCol)
      .select(col("qid"), col("nid"), col("dist"))

  /** OPQ-allocated PQ top-k (round 12): identical pipeline and code
    * size as [[topKPq]], but the subspace split is LEARNED — dims
    * ranked by corpus energy and snake-dealt across subspaces (Ge et
    * al. CVPR'13's balanced allocation in the coordinate basis, the
    * exactly-replayable member of the OPQ rotation family). Prefer it
    * when the embedding's variance profile is skewed; it costs one
    * extra 64-value aggregate at train time and nothing at search. */
  def topKOpq(queries: DataFrame, corpus: DataFrame, k: Int,
              rerank: Int = 40,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame =
    graft.operators.ProductQuant.opqTopKOf(
      queries, corpus, k, rerank, idCol, vecCol)
      .select(col("qid"), col("nid"), col("dist"))

  /** IVF-PQ top-k — the composite production index: coarse cells prune
    * the corpus to `probes` cells per query, PQ codebooks trained on
    * residuals drive LUT-based ADC inside them, and the top candidates
    * rerank exactly. Code scans touch M bytes/vector of ~probes/C of
    * the corpus. */
  def topKIvfPq(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                probes: Int = 4, rerank: Int = 40,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame =
    graft.operators.IvfPq.ivfPqTopKOf(
      queries.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
      k, probes, rerank)
      .select(col("qid"), col("nid"), col("dist"))

  /** [[topKIvfPq]] with OPQ-style learned dimension allocation ON THE
    * RESIDUALS (round 13 — the FAISS `OPQ,IVF,PQ` composite):
    * dimensions rank by the residual corpus's second moment after
    * coarse assignment, snake-deal across subspaces, and the learned
    * permutation applies to corpus and query residuals identically
    * before codebook training; rerank reads the unpermuted vectors.
    * Same cells, probes, code size, and rerank budget as
    * [[topKIvfPq]] — only the subspace split is learned (2× its
    * recall@5 at the x10 soak). Delegates to the path behind the
    * oracle-checked `sim_opq_ivfpq_topk`. */
  def topKOpqIvfPq(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                   probes: Int = 4, rerank: Int = 40,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    graft.operators.IvfPq.ivfPqTopKOf(
      queries.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
      k, probes, rerank, opq = true)
      .select(col("qid"), col("nid"), col("dist"))

  /** [[topKIvfPq]] with an ADAPTIVE exact-rerank budget (round 14 —
    * the operating point the x30 knob sweep demanded: the fixed
    * rerank cut, not cell pruning, binds deep-scale recall, while a
    * uniformly wide budget is 4× wasted rerank work at easy points).
    * The budget is decided PER QUERY off the ADC margins the search
    * already computed: escalate `rerankLow → rerankHigh` exactly when
    * the rerankLow-th ranked ADC distance sits within
    * `marginNum/marginDen` of the k-th, or the top ADC ranks tie at 0
    * (candidates past the cut are quantization-indistinguishable from
    * the reported top-k, so the cut is unsafe). The 5/2 default is the
    * MEASURED regime boundary: easy corpora put the cut 40–60× beyond
    * the k-th ADC distance, replica-dense ones 1.4–3.4×. Returns
    * (qid, nid, dist, budget) — the chosen budget is surfaced, never
    * silent. Delegates to the path behind the oracle-checked
    * `sim_adaptive_rerank`; same index artifacts as [[topKIvfPq]], so
    * a session serving both pays one build. */
  def topKIvfPqAdaptive(queries: DataFrame, corpus: DataFrame,
                        k: Int = 5, probes: Int = 4,
                        rerankLow: Int = 40, rerankHigh: Int = 160,
                        marginNum: Int = 5, marginDen: Int = 2,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame =
    graft.operators.IvfPq.adaptiveRerankTopKOf(
      queries.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
      k, probes, rerankLow, rerankHigh, marginNum, marginDen)
      .select(col("qid"), col("nid"), col("dist"), col("budget"))

  /** MMR-diversified top-k: plain relevance ranking builds a
    * `pool`-candidate set per query, then k greedy rounds pick
    * argmax(relevance − max-similarity-to-already-picked) so results
    * cover the neighborhood instead of repeating one cluster. Returns
    * (qid, pick, nid, rel) with pick = 1..k in selection order; all
    * comparisons are integer-exact dots of milli-quantized vectors. */
  def topKMmr(queries: DataFrame, corpus: DataFrame, k: Int = 5,
              pool: Int = 20,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame =
    Similarity.mmrTopKOf(
      queries.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
      k, pool)
      .select(col("qid"), col("pick"), col("nid"), col("rel"))

  /** Top principal direction of the corpus covariance by matrix-free
    * power iteration (fixed rounds, two scans per round, no dim²
    * shuffle): (pos, pc) with pc in fixed-point ±10⁴. Use it for
    * spectral diagnostics (anisotropy of an embedding space) or as a
    * projection axis for 1-D sketching of the corpus. */
  def powerPc(corpus: DataFrame, iters: Int = 2,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame =
    graft.operators.Spectral.powerPcOf(
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v")), iters)

  /** Train `k` centroids on the corpus (fixed Lloyd rounds, k lowest-id
    * seeds) and return them as an (idCol, vecCol) frame — plug the
    * result straight into [[topKIvf]]'s `centroids` parameter, or use
    * it for cluster-aware curation (SemDeDup-style pruning, per-cluster
    * quotas). Centroids are model parameters: a k-row frame. */
  def kmeans(corpus: DataFrame, k: Int = 16, iters: Int = 2,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    graft.operators.Clustering.kmeansFit(corpus, k, iters, idCol, vecCol)
      .select(col("cid").as(idCol), col("centroid").as(vecCol))
}
