package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.operators.Similarity

/** Continuous ANN serving (SURVEY.md §2 group G): a stream of query
  * vectors probed per micro-batch against the write-once disk IVF index
  * ([[Similarity.writeIndex]]) with a frozen quantizer — the online
  * sibling of d03's batch query, and the serving loop a retrieval or
  * dedup-screen deployment actually runs (index built offline, queries
  * arrive forever).
  *
  * Shape: STATELESS. Each micro-batch runs [[Similarity.probeIndex]] —
  * centroid routing on the driver (≤ |batch|·nProbe cell ids, metadata),
  * a partition-pruned index read (only probed `cell=` partitions are even
  * listed), broadcast of the batch's probes, and a per-qid top-k window.
  * No state store at any stream length: results for a batch depend only
  * on that batch + the static index, so stream==batch parity is exact
  * (AnnServeSpec proves it against [[Similarity.probeIndex]] run cold).
  *
  * `foreachBatch` rather than a stream-static join because the routing
  * step (which cells to read) is inherently per-batch: a static join
  * would scan every cell partition for every batch, forfeiting the
  * pruning that makes the disk index the 100 TB read path.
  */
object AnnServe {

  /** Wire a streaming query-vector frame (qid, qv) to per-batch ANN probes;
    * each batch's top-k rows are handed to `sink` (append semantics: a
    * batch's output is final when the batch commits — exactly-once under
    * replay when the sink is idempotent on (batch_id, qid, rank)).
    */
  def serve(spark: SparkSession, queries: DataFrame, indexPath: String,
            centroids: DataFrame, k: Int, nProbe: Int = 4,
            trigger: Trigger = Trigger.AvailableNow())(
            sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queries.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sink(Similarity.probeIndex(spark, indexPath, batch, centroids,
            k, nProbe), batchId)
        }
      }
}
