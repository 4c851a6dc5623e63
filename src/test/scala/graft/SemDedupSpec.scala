package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SemDedup

class SemDedupSpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  private def aug = emb.unionByName(
    emb.filter(col("vec_id") % 25 === 0).withColumn("vec_id", col("vec_id") + 100000))

  test("semdedup removes exactly the planted twins, keeping the lower id") {
    val got = SemDedup.removed(aug, nCells = 16, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = emb.filter(col("vec_id") % 25 === 0)
      .collect().map(r => r.getLong(0) + 100000 -> r.getLong(0)).toMap
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("semdedup output is invariant under repartitioning") {
    val a = SemDedup.removed(aug, nCells = 16, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SemDedup.removed(aug.repartition(7), nCells = 16, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("keep() drops removed rows and nothing else") {
    val kept = SemDedup.keep(aug, nCells = 16, tau = 0.9)
    val nTwins = emb.filter(col("vec_id") % 25 === 0).count()
    assert(kept.count() == aug.count() - nTwins)
    // every surviving id below the twin offset is the full original corpus
    assert(kept.filter(col("vec_id") < 100000).count() == emb.count())
  }

  test("a tau above the max corpus similarity removes nothing") {
    assert(SemDedup.removed(emb, nCells = 16, tau = 0.999).isEmpty)
  }

  test("forced two-level routing removes exactly the planted twins too") {
    // identical vectors route identically (pure function of the embedding),
    // so the twin pair co-cells under ANY quantizer — the oracle-gated
    // contract holds on the large-k scale path, not just the flat one
    val got = SemDedup.removed(aug, nCells = 16, tau = 0.9, routeGroups = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = emb.filter(col("vec_id") % 25 === 0)
      .collect().map(r => r.getLong(0) + 100000 -> r.getLong(0)).toMap
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("routed output is invariant under repartitioning") {
    val a = SemDedup.removed(aug, nCells = 16, tau = 0.9, routeGroups = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SemDedup.removed(aug.repartition(7), nCells = 16, tau = 0.9,
        routeGroups = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("hot-cell guard drops oversized cells from pairing") {
    // maxCell = 0 makes every cell hot → no pairs survive the guard
    assert(SemDedup.removed(aug, nCells = 16, tau = 0.9, maxCell = 0).isEmpty)
  }
}
