package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** SemDeDup — semantic deduplication over an embedding column (Abbas et al.
  * 2023, arXiv:2303.09540): k-means-cluster the corpus, then drop documents
  * whose cosine similarity to another member of the SAME cluster exceeds a
  * threshold, keeping one representative per near-duplicate neighborhood.
  * This is the embedding-space complement of the text-space MinHash family
  * in [[Dedup]]: it catches paraphrases and re-encodings whose token overlap
  * is low but whose meaning (embedding) is nearly identical.
  *
  * Scale shape (the reason the paper clusters at all): all-pairs cosine over
  * N vectors is O(N²); clustering bounds the pair space to Σ|cell|², and the
  * per-cell work is an equi-join on `cell` — one hash-partitioned shuffle of
  * the corpus per side, no broadcast of anything unbounded. The quantizer is
  * [[Similarity.ivfCentroids]] (deterministic seeds + Lloyd refinement) and
  * the per-row assignment is [[Similarity.assigned]]'s shuffle-free argmax
  * (two-level [[Similarity.assignedRouted]] once nCells crosses the
  * flat-argmax breakeven — see `removed`'s routing note), so the only
  * exchanges in the plan are the two cell-hash shuffles feeding the
  * self-join and the final per-`removed` aggregation.
  *
  * A hot-cell guard (same failure mode as `Dedup.bandJoinCandidates`'s hot
  * buckets) drops cells holding more than `maxCell` vectors via a broadcast
  * anti-join: a degenerate quantizer that funnels a large corpus fraction
  * into one cell would otherwise re-create the O(N²) blowup the clustering
  * exists to avoid. Production callers scale `nCells` with the corpus
  * (the paper uses ~11k clusters at 100M+ docs) so cells stay ~|N|/nCells.
  */
object SemDedup {

  /** Documents to DROP: `(removed, kept)` where `removed` has cosine ≥ `tau`
    * to at least one same-cluster vector with a smaller id, and `kept` is
    * the smallest such id (the deterministic representative). Keep-lowest-id
    * makes the output order-independent and exactly reproducible.
    */
  def removed(corpus: DataFrame, nCells: Int = 16, tau: Double = 0.9,
              refineIters: Int = 1, maxCell: Int = 100000,
              routeGroups: Int = -1): DataFrame = {
    // Auto two-level routing above the flat-argmax breakeven: with the
    // paper's nCells ∝ N rule the flat N·k assignment is O(N²) — measured
    // 64.6×/decade at the 1000× probe (SURVEY §6) — so large k routes
    // through ≈√k centroid groups (Similarity.assignedRouted) and the
    // quantizer drops back to ~N·2√k. -1 = auto (√k when k ≥ 512), 0 =
    // force flat, >1 = explicit group count. At the oracle-gated SFs
    // nCells stays small, so the gate plans are the flat path unchanged.
    val rg =
      if (routeGroups == -1)
        if (nCells >= 512) math.ceil(math.sqrt(nCells)).toInt else 0
      else routeGroups
    val centroids = Similarity.ivfCentroids(corpus, nCells, refineIters, rg)
    // persist the guarded assignment: it feeds BOTH self-join sides (and the
    // hot-cell count), and without the cache each branch re-runs the Lloyd
    // refinement aggregation AND the corpus scan+argmax — 3-4 corpus passes
    // where one suffices (visible as four copies of the centroid subtree in
    // the unpersisted physical plan). Same materialize-then-release
    // lifecycle as Dedup.materializedPairs: the tiny verified output is
    // cached, counted, and the big input cache dropped before returning.
    val cells0 = Similarity.assignedVia(corpus, centroids, rg)
      .select(col("cell"), col("vec_id"), col("embedding"))
    val hot = cells0.groupBy("cell").count()
      .filter(col("count") > maxCell).select("cell")
    val cells = cells0.join(broadcast(hot), Seq("cell"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lo = cells.select(col("cell"), col("vec_id").as("kept_id"),
      col("embedding").as("kv"))
    val hi = cells.select(col("cell"), col("vec_id").as("removed"),
      col("embedding").as("rv"))
    val out = hi.join(lo, Seq("cell"))
      .filter(col("kept_id") < col("removed"))
      .filter(vec_cosine(col("rv"), col("kv")) >= tau)
      .groupBy("removed").agg(min("kept_id").as("kept"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    cells.unpersist(blocking = false)
    out
  }

  /** The deduplicated corpus: `corpus` minus [[removed]] ids (broadcast
    * anti-join when the removed set is small; Spark picks SMJ otherwise).
    */
  def keep(corpus: DataFrame, nCells: Int = 16, tau: Double = 0.9,
           refineIters: Int = 1, maxCell: Int = 100000,
           routeGroups: Int = -1): DataFrame =
    corpus.join(
      removed(corpus, nCells, tau, refineIters, maxCell, routeGroups)
        .select(col("removed").as("vec_id")),
      Seq("vec_id"), "left_anti")
}
