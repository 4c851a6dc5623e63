package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunking

class ChunkingSpec extends AnyFunSuite with SparkTestBase {

  test("chunks reassemble to the original text (overlap dropped)") {
    val docs = Tables.documents(spark, sfDir).filter(length(col("text")) > 0)
    val chunks = Chunking.chunk(docs, "doc_id", "text", 200, 50)
      .select("doc_id", "chunk_id", "chunk_text")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).toSeq).toMap
    val orig = docs.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == orig.keySet)
    orig.foreach { case (id, text) =>
      val cs = chunks(id)
      val rebuilt = cs.head + cs.tail.map(_.drop(50)).mkString
      assert(rebuilt == text, s"doc $id reassembly mismatch")
      // every chunk except possibly the last is full-width
      cs.init.foreach(c => assert(c.length == 200))
    }
  }

  test("chunk ids are deterministic under repartitioning") {
    val docs = Tables.documents(spark, sfDir)
    def run(p: Int) = Chunking.chunk(docs.repartition(p), "doc_id", "text")
      .select("doc_id", "chunk_id", "chunk_off", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(run(1) == run(7))
  }

  test("short and exact-multiple docs chunk without empties or overshoot") {
    import spark.implicits._
    // len < chunk → 1 chunk; len == chunk → 1 chunk (next offset = 200 > len-1);
    // len == chunk + 1 → 2 chunks (second is the 51-char tail window)
    val df = Seq((1L, "a" * 10), (2L, "b" * 200), (3L, "c" * 201), (4L, ""))
      .toDF("doc_id", "text")
    val out = Chunking.chunk(df, "doc_id", "text", 200, 50)
      .select("doc_id", "chunk_id", "chunk_chars")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set((1L, 0, 10), (2L, 0, 200), (3L, 0, 200), (3L, 1, 51)))
  }

  test("packing is invariant to groupSize and partitioning, offsets contiguous") {
    val docs = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(expr(s"regexp_extract_all(text, '${Queries.BpeTokenPattern}', 0)"))
        .as("tok_count"))
    def run(g: Int, p: Int) =
      Chunking.pack(docs.repartition(p), "doc_id", "tok_count", 512, g)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getInt(5))).toSet
    val base = run(64, 4)
    assert(base == run(512, 4), "groupSize must not change the packing")
    assert(base == run(64, 13), "input partitioning must not change the packing")
    // the concat invariant: in doc order, each start offset is the previous
    // start + its token count — the windows tile the token stream exactly
    val ordered = base.toSeq.sortBy(_._1)
    ordered.sliding(2).foreach {
      case Seq((_, tok, off, _, _, _), (id2, _, off2, _, _, _)) =>
        assert(off2 == off + tok, s"gap in the token stream before doc $id2")
      case _ =>
    }
    assert(ordered.head._3 == 0L)
    // span arithmetic: a doc spans ceil over the windows its tokens cross
    ordered.foreach { case (id, tok, off, bf, bl, spans) =>
      assert(bf == off / 512 && bl == (off + tok - 1) / 512 &&
        spans == (bl - bf + 1), s"bad span for doc $id")
    }
  }
}
