package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("LSH ANN always retrieves a planted exact twin at rank 1") {
    val aug = emb.unionByName(
      emb.filter(col("vec_id") % 25 === 0).withColumn("vec_id", col("vec_id") + 100000))
    val queries = aug.filter(col("vec_id") >= 100000)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = Similarity.lshTopK(aug, queries, 5)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val qids = queries.select("qid").collect().map(_.getLong(0))
    assert(qids.nonEmpty)
    qids.foreach { qid =>
      val (nbr, cos) = top(qid)
      assert(nbr == qid - 100000, s"twin not at rank 1 for $qid (got $nbr)")
      assert(cos > 0.9999, s"twin cosine $cos for $qid")
    }
  }

  test("IVF ANN always retrieves a planted exact twin at rank 1") {
    val aug = emb.unionByName(
      emb.filter(col("vec_id") % 25 === 0).withColumn("vec_id", col("vec_id") + 100000))
    val queries = aug.filter(col("vec_id") >= 100000)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = Similarity.ivfTopK(aug, queries, 5)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val qids = queries.select("qid").collect().map(_.getLong(0))
    assert(qids.nonEmpty)
    qids.foreach { qid =>
      val (nbr, cos) = top(qid)
      // the twin shares the query's vector ⇒ same cell ⇒ always probed
      assert(nbr == qid - 100000, s"twin not at rank 1 for $qid (got $nbr)")
      assert(cos > 0.9999)
    }
  }

  test("adaptive-nProbe IVF always retrieves a planted exact twin at rank 1") {
    val aug = emb.unionByName(
      emb.filter(col("vec_id") % 25 === 0).withColumn("vec_id", col("vec_id") + 100000))
    val queries = aug.filter(col("vec_id") >= 100000)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = Similarity.ivfTopKAdaptive(aug, queries, 5)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val qids = queries.select("qid").collect().map(_.getLong(0))
    assert(qids.nonEmpty)
    qids.foreach { qid =>
      val (nbr, cos) = top(qid)
      // the twin shares the query's vector ⇒ its cell ranks first ⇒ probed
      assert(nbr == qid - 100000, s"twin not at rank 1 for $qid (got $nbr)")
      assert(cos > 0.9999)
    }
  }

  test("stateless centroid assignment equals the aggregate form") {
    val centroids = emb.orderBy("vec_id").limit(8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    // private assign() drives ivfTopK; reproduce its contract via the public
    // maintenance surface and compare against a direct argmax recomputation
    val stateless = Similarity.assignStateless(emb, centroids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = emb.join(broadcast(centroids))
      .withColumn("cos_c", graft.functions.vec_cosine(col("embedding"), col("cv")))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("cos_c"), col("cid"))).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stateless.size == direct.size)
    assert(stateless == direct, "tie-break or argmax divergence")
  }

  test("IVF candidates are a subset of probed cells, results ranked") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val rows = Similarity.ivfTopK(emb, queries, 5).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("brute force top-k is ranked and bounded") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val rows = Similarity.bruteForceTopK(emb, queries, 10).collect()
    assert(rows.length == 30)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, "not ranked desc")
    }
  }

  test("multi-probe LSH recall dominates single-probe recall") {
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(hits: Set[(Long, Long)]) = (exact & hits).size.toDouble / exact.size
    val single = Similarity.lshTopK(emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.lshTopK(emb, queries, 10, multiProbe = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    info(f"recall@10 single=${recall(single)}%.2f multi=${recall(multi)}%.2f")
    // multi-probe candidates are a strict superset per query key, so its
    // recall can never be lower
    assert(recall(multi) >= recall(single))
  }

  test("PQ-ADC always retrieves a planted exact twin at rank 1") {
    val aug = emb.unionByName(
      emb.filter(col("vec_id") % 25 === 0).withColumn("vec_id", col("vec_id") + 100000))
    val queries = aug.filter(col("vec_id") >= 100000)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = Similarity.pqTopK(aug, queries, 5)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val qids = queries.select("qid").collect().map(_.getLong(0))
    assert(qids.nonEmpty)
    qids.foreach { qid =>
      val (nbr, cos) = top(qid)
      // identical normalized vector → identical PQ codes → max ADC score →
      // survives the shortlist; exact re-rank then pins it to rank 1
      assert(nbr == qid - 100000, s"twin not at rank 1 for $qid (got $nbr)")
      assert(cos > 0.9999, s"twin cosine $cos for $qid")
    }
  }

  test("PQ recall vs brute force is reported, codes compress to m bytes") {
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"PQ-ADC recall@10 on random vectors: $recall%.2f")
    assert(approx.nonEmpty)
    // the encoded form really is m small codes per vector
    val cb = Similarity.pqCodebooks(emb, m = 8, kc = 16)
    val codes = Similarity.pqEncode(emb, cb, m = 8, w = 8)
      .select("vec_id", "codes").collect()
    assert(codes.forall(_.getSeq[Int](1).size == 8))
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 16)))
  }

  test("LSH recall vs brute force is reported") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"LSH recall@10 on random vectors: $recall%.2f")
    // random near-orthogonal vectors are LSH's worst case — just require
    // the pipeline produces candidates at all; planted-twin recall above is
    // the correctness guarantee
    assert(approx.nonEmpty)
  }

  test("kmeansAssign: total coverage, consistent cell sizes, twins co-cluster") {
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val out = Similarity.kmeansAssign(emb, k = 8, iters = 2).cache()
    try {
      assert(out.count() == n) // every vector assigned exactly once
      assert(out.select(countDistinct(col("cell"))).first().getLong(0) <= 8)
      // cell_size is the true population of its cell
      val sizes = out.groupBy("cell").agg(
        count(lit(1)).as("actual"), first("cell_size").as("reported"),
        countDistinct("cell_size").as("variants")).collect()
      sizes.foreach { r =>
        assert(r.getAs[Long]("variants") == 1L)
        assert(r.getAs[Long]("actual") == r.getAs[Long]("reported"))
      }
      // an exact duplicate vector pair must land in the same cell (same
      // cosine to every centroid, same tie-break)
      val dup = emb.filter(col("vec_id") === 3)
        .withColumn("vec_id", lit(900000L))
      val withDup = Similarity.kmeansAssign(emb.unionByName(dup), k = 8, iters = 2)
        .filter(col("vec_id").isin(3L, 900000L))
        .select(col("cell")).distinct().count()
      assert(withDup == 1L)
    } finally out.unpersist()
  }

  test("assignedRouted: flat schema, total coverage, valid cells, pure per-row") {
    val corpus = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val centroids = Similarity.ivfCentroids(corpus, nCells = 32, refineIters = 1)
    val flat = Similarity.assigned(corpus, centroids)
    val routed = Similarity.assignedRouted(corpus, centroids, routeGroups = 6)
    // drop-in replacement for the flat path: same shape, nothing lost
    assert(routed.schema == flat.schema)
    assert(routed.count() == corpus.count())
    // every routed cell is a real centroid id (the fine argmax can never
    // see an empty or foreign cell list — the non-empty-groups inner join)
    assert(routed.select(col("cell"))
      .except(centroids.select(col("cid").as("cell"))).isEmpty)
    // assignment is a pure function of the embedding: identical vectors
    // co-assign, and the whole assignment survives repartitioning
    val dup = corpus.filter(col("vec_id") === 3).withColumn("vec_id", lit(900000L))
    assert(Similarity.assignedRouted(corpus.unionByName(dup), centroids, 6)
      .filter(col("vec_id").isin(3L, 900000L))
      .select("cell").distinct().count() == 1L)
    val a = routed.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Similarity.assignedRouted(corpus.repartition(5), centroids, 6)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
