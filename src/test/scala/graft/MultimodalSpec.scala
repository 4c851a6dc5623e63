package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("binary payload pipeline extracts deterministic features") {
    val df = Tables.documents(spark, sfDir).limit(50)
      .withColumn("payload", col("text").cast("binary"))
    val feats = Multimodal.extractFeatures(spark, df, "doc_id", "payload").collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.mean_byte > 0 && f.mean_byte < 256)
      assert(f.width >= 0 && f.width < 4096)
    }
    // re-run must produce identical features (stub decode is pure)
    val again = Multimodal.extractFeatures(spark, df, "doc_id", "payload").collect()
    assert(feats.sortBy(_.doc_id).sameElements(again.sortBy(_.doc_id)))
  }

  test("stub decode is a pure function of the payload") {
    val a = Multimodal.stubDecode(Multimodal.MMRecord(1L, "hello world".getBytes("UTF-8")))
    val b = Multimodal.stubDecode(Multimodal.MMRecord(1L, "hello world".getBytes("UTF-8")))
    val c = Multimodal.stubDecode(Multimodal.MMRecord(1L, "other bytes!".getBytes("UTF-8")))
    assert(a == b)
    assert(a.p_hash != c.p_hash)
    assert(Multimodal.stubDecode(Multimodal.MMRecord(2L, Array.emptyByteArray)).n_bytes == 0)
  }
}
