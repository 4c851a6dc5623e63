package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the source-overlap family (c15): the exact matrix is
  * DuckDB-hash-gated; these prove the MinHash-union sketch path — the shape
  * that survives 100 TB — estimates the same quantity and merges lawfully.
  */
class OverlapSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("sketch estimate tracks exact source Jaccard within MinHash error") {
    val exact = operators.Overlap.sourceOverlap(docs, "source", "text")
      .select(col("src_a"), col("src_b"), col("jaccard"))
    val est = operators.Overlap.estimatedOverlap(
      operators.Overlap.sourceSignatures(docs, "source", "text"))
    val joined = exact.join(est, Seq("src_a", "src_b")).collect()
    assert(joined.length == 190) // C(20,2) — every pair estimated
    joined.foreach { r =>
      val (j, e) = (r.getAs[Double]("jaccard"), r.getAs[Double]("est_jaccard"))
      // n=128 hashes: σ = sqrt(j(1-j)/128) ≤ 0.045; 0.2 is a >4σ band
      assert(math.abs(j - e) <= 0.2, s"${r.get(0)}-${r.get(1)}: exact=$j est=$e")
    }
  }

  test("union law: distributed sketch equals a single-pass OPH of all grams") {
    // the property that makes the sketch distributable: raw bin minima merge
    // bin-wise through any partitioning/merge tree, so the aggregated
    // signature is bit-identical to one sequential OPH pass over the union
    // gram multiset. (Densified doc signatures would NOT merge — rotation
    // densification borrows across bins — which is why the aggregate carries
    // pre-densification state.)
    import graft.functions.TextHash
    import org.apache.spark.unsafe.types.UTF8String
    val two = docs.filter(col("source").isin("src0", "src1"))
    val merged = operators.Overlap.sourceSignatures(
      two.repartition(7).withColumn("source", lit("both")), "source", "text")
      .collect().head.getSeq[Long](1).toSeq
    val sig = new Array[Long](128)
    val filled = new Array[Boolean](128)
    two.select(col("text")).collect().foreach { r =>
      TextHash.wordShingles(UTF8String.fromString(r.getString(0)), 3)
        .toLongArray().foreach(TextHash.ophUpdate(_, sig, filled))
    }
    TextHash.densifyInPlace(sig, filled)
    assert(merged == sig.toSeq)
  }

  test("a single document's union signature is its own minhash signature") {
    import graft.functions.TextHash
    import org.apache.spark.unsafe.types.UTF8String
    val one = docs.filter(col("doc_id") === 1L)
    val viaAgg = operators.Overlap.sourceSignatures(one, "source", "text")
      .collect().head.getSeq[Long](1).toSeq
    val direct = TextHash.minhashSig(
      UTF8String.fromString(one.select("text").collect().head.getString(0)),
      3, 128).toLongArray()
    assert(viaAgg == direct.toSeq)
  }
}
