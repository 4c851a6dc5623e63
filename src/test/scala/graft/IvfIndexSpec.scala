package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The IVF serving layout on disk: vectors written partitioned by cell, a
  * probe reads only its nProbe cells (partition pruning), and the results
  * equal the in-memory ivfTopK with the same quantizer.
  */
class IvfIndexSpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("written index probe equals in-memory ivfTopK and prunes partitions") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val centroids = Similarity.ivfCentroids(emb, nCells = 16, refineIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    Similarity.writeIndex(emb, centroids, dir)

    val probed = Similarity.probeIndex(spark, dir, queries, centroids, k = 10, nProbe = 4)
    val expected = Similarity.ivfTopK(emb, queries, 10, nCells = 16, nProbe = 4,
      refineIters = 1)
    assert(probed.collect().toSet == expected.collect().toSet,
      "disk-served probe must equal the in-memory plan")

    // the probe's scan carries the cell filter as a PARTITION filter — the
    // pruning happens at file listing, before any IO (BucketingSpec-style
    // plan assertion)
    val plan = probed.queryExecution.executedPlan.toString()
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"no partition filter on cell in:\n$plan")

    // behavioral check: a single-cell read lists only that cell's files
    val aCell = spark.read.parquet(dir).select("cell").head().get(0).toString
    val files = spark.read.parquet(dir).filter(col("cell") === aCell)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains(s"cell=$aCell")))
  }

  test("index layout spans all cells and loses no vectors") {
    val centroids = Similarity.ivfCentroids(emb, nCells = 16, refineIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf2").toString + "/idx"
    Similarity.writeIndex(emb, centroids, dir)
    val idx = spark.read.parquet(dir)
    assert(idx.count() == emb.count(), "every vector exactly once")
    val cells = idx.select("cell").distinct().count()
    assert(cells > 1 && cells <= 16)
  }
}
