package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column (SURVEY.md §2 group D).
  */
object Similarity {

  /** Shared tail: exact-cosine score candidates (qid, qv, vec_id, embedding),
    * rank per query, keep top k.
    */
  private def rankTopK(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    cand
      .withColumn("cos_sim", vec_cosine(col("embedding"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("neighbor"),
        round(col("cos_sim"), 4).as("cos_sim"), col("rank"))
  }

  /** Exact top-k cosine neighbors for a (small, broadcast) query set — the
    * correctness baseline. One scan of the corpus per batch of queries.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    rankTopK(corpus.join(broadcast(queries), col("vec_id") =!= col("qid")), k)

  /** IVF-style ANN: a deterministic coarse quantizer (the `nCells`
    * lowest-id corpus vectors as centroids — a k-means refinement would slot
    * in here without changing the plan shape) assigns every vector to its
    * nearest cell in one broadcast join + `max_by` aggregation; queries probe
    * their `nProbe` nearest cells and rank candidates by exact cosine.
    * At scale the corpus is write-once partitioned by `cell`, so a probe
    * reads `nProbe/nCells` of the data (partition pruning), and assignment
    * is embarrassingly parallel.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = broadcast(corpus.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cv")))
    val assignments = corpus.join(centroids)
      .withColumn("cos_c", vec_cosine(col("embedding"), col("cv")))
      .groupBy("vec_id")
      // deterministic argmax: ties broken by centroid id
      .agg(max_by(col("cid"), struct(col("cos_c"), col("cid"))).as("cell"))
    val probeW = Window.partitionBy("qid").orderBy(col("cos_c").desc, col("cid"))
    val probes = queries.join(centroids)
      .withColumn("cos_c", vec_cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(probeW))
      .filter(col("rnk") <= nProbe)
      .select(col("qid"), col("qv"), col("cid").as("cell"))
    val cand = corpus.join(assignments, "vec_id")
      .join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("qid"))
    rankTopK(cand, k)
  }

  /** LSH-bucketed ANN (the scale path): both sides key by random-hyperplane
    * sketches (`tables` independent tables of `bits` sign-bits), candidates
    * come from an equi-join on (table, key), then exact cosine ranks them.
    * Planes are re-derived from hashes on every executor — nothing broadcast.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              tables: Int = 4, bits: Int = 8): DataFrame = {
    val db = corpus.select(col("vec_id"), col("embedding"),
      posexplode(hyperplane_sketches(col("embedding"), tables, bits)).as(Seq("tbl", "key")))
    val q = queries.select(col("qid"), col("qv"),
      posexplode(hyperplane_sketches(col("qv"), tables, bits)).as(Seq("tbl", "key")))
    val cand = db
      .join(broadcast(q), db("tbl") === q("tbl") && db("key") === q("key") &&
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qv"), col("vec_id"), col("embedding"))
      .distinct()
    rankTopK(cand, k)
  }
}
