package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity

/** Incremental IVF index maintenance (SURVEY.md §7 round-2 lead).
  *
  * An IVF index at rest is `(vec_id, cell)` assignments partitioned by cell
  * (so a probe is a partition-pruned read, cf. [[Similarity.ivfTopK]]).
  * Keeping it fresh as vectors arrive must not retrain or reshuffle: new
  * vectors are assigned to the *trained* centroid set by a stateless per-row
  * argmax ([[Similarity.assignStateless]]) and appended. Centroid drift is
  * handled by periodic batch re-training, not in-stream — the standard
  * split for ANN serving (stream = cheap upsert, batch = index rebuild).
  *
  * `attach` works identically on a batch frame or a `readStream` frame;
  * StreamingSpec drives it through MemoryStream + foreachBatch append and
  * asserts stream-equals-batch on the resulting index.
  */
object IvfMaintenance {

  /** Assign newly arriving vectors `(vec_id, embedding)` to the trained
    * `(cid, cv)` centroids. Streaming-legal: no shuffle, no state.
    */
  def attach(newVectors: DataFrame, centroids: DataFrame): DataFrame =
    Similarity.assignStateless(newVectors, centroids)
}
