package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** The WET parser must roundtrip its own writer byte-exactly (text out ==
  * text in, both container encodings), recover doc ids from record URIs,
  * and dead-letter whole containers on ANY spec violation — a partial
  * record list would silently drop training documents, the worst failure
  * mode an ingestion path can have.
  */
class WarcSpec extends AnyFunSuite with SparkTestBase {

  private val docs = Seq(
    (0L, "the quick brown fox"),
    (1L, ""), // empty body: Content-Length 0 must frame correctly
    (2L, "multi\nline\nbody with trailing space "),
    (3L, "unicode: café ☃"))

  test("plain, gzip and zstd containers roundtrip text and headers exactly") {
    for (cid <- Seq(0L, 1L, 2L)) { // plain / gzip members / zstd frames
      val recs = Warc.parse(Warc.syntheticContainer(cid, docs))
        .getOrElse(fail(s"container $cid failed to parse"))
      assert(recs.length == docs.length)
      recs.zip(docs).foreach { case ((typ, uri, body), (id, text)) =>
        assert(typ == "conversion")
        assert(uri == s"https://example.org/doc/$id")
        assert(new String(body, "UTF-8") == text, s"doc $id text mismatch")
      }
    }
  }

  test("malformed containers dead-letter whole, never a partial parse") {
    val good = Warc.syntheticContainer(0L, docs)
    assert(Warc.parse(Array.emptyByteArray).isEmpty)
    assert(Warc.parse("HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8")).isEmpty)
    assert(Warc.parse(good.dropRight(1)).isEmpty, "truncated final separator")
    assert(Warc.parse(good.dropRight(30)).isEmpty, "truncated body")
    assert(Warc.parse(good ++ "junk".getBytes("UTF-8")).isEmpty,
      "trailing junk after the last record")
    // garbage Content-Length: corrupt the digit run in the FIRST record
    val bad = new String(good, "ISO-8859-1")
      .replaceFirst("Content-Length: \\d+", "Content-Length: x")
      .getBytes("ISO-8859-1")
    assert(Warc.parse(bad).isEmpty)
    // truncated gzip member
    val gz = Warc.syntheticContainer(1L, docs)
    assert(Warc.parse(gz.dropRight(5)).isEmpty)
    // truncated zstd frame
    val zs = Warc.syntheticContainer(2L, docs)
    assert(Warc.parse(zs.dropRight(5)).isEmpty)
    // a gzip container whose LAST member is corrupt must not yield the
    // earlier members either
    val mixed = Warc.gzipMember(Warc.writeRecord(7L, "ok")) ++
      Warc.gzipMember(Warc.writeRecord(8L, "also ok")).dropRight(3)
    assert(Warc.parse(mixed).isEmpty)
  }

  test("readWetFiles ingests a directory of .warc.wet(.gz|.zst) files per-file") {
    withTempDir("warc") { dir =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/part-0.warc.wet"),
        Warc.syntheticContainer(0L, docs.take(2)))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/part-1.warc.wet.gz"),
        Warc.syntheticContainer(1L, docs.drop(2)))
      // a malformed file dead-letters without sinking the others
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/part-2.warc.wet.zst"),
        Warc.syntheticContainer(2L, Seq((9L, "zstd framed record"))))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/part-3.warc.wet"),
        Array[Byte](1, 2, 3))
      val out = Warc.readWetFiles(spark, dir).collect().sortBy(_.doc_id)
      assert(out.map(_.doc_id).toSeq == Seq(0L, 1L, 2L, 3L, 9L))
      assert(out.forall(_.warc_type == "conversion"))
    }
  }

  test("extractWet is streaming-compatible: MemoryStream containers equal batch") {
    // the ingestion seam is a stateless mapPartitions, so the SAME function
    // must run unchanged under Structured Streaming — a crawl feed is a
    // stream of containers, not a directory snapshot
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val q = Warc.extractWet(spark, ms.toDF().toDF("container_id", "payload"),
        "container_id", "payload")
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    try {
      ms.addData((0L, Warc.syntheticContainer(0L, docs.take(2))),
        (2L, Array[Byte](9, 9, 9))) // dead-letter mid-stream
      q.processAllAvailable()
      ms.addData((1L, Warc.syntheticContainer(1L, docs.drop(2))))
      q.processAllAvailable()
      val streamed = spark.table("warc_stream")
        .collect().map(r => (r.getLong(0), r.getString(4))).sortBy(_._1)
      val batch = Warc.extractWet(spark,
          Seq((0L, Warc.syntheticContainer(0L, docs.take(2))),
            (1L, Warc.syntheticContainer(1L, docs.drop(2))),
            (2L, Array[Byte](9, 9, 9))).toDF("container_id", "payload"),
          "container_id", "payload")
        .collect().map(r => (r.doc_id, r.text_md5)).sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq, "stream must equal batch extraction")
      assert(streamed.length == docs.length)
    } finally q.stop()
  }

  test("extractWet explodes containers to per-record rows and recovers ids") {
    import spark.implicits._
    val containers = Seq(
      (0L, Warc.syntheticContainer(0L, docs.take(2))),
      (1L, Warc.syntheticContainer(1L, docs.drop(2))),
      (2L, Array[Byte](9, 9, 9))) // dead-letter
      .toDF("container_id", "payload")
    val out = Warc.extractWet(spark, containers, "container_id", "payload")
      .collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(0L, 1L, 2L, 3L))
    out.zip(docs).foreach { case (r, (id, text)) =>
      val bytes = text.getBytes("UTF-8")
      assert(r.content_length == bytes.length)
      val md = java.security.MessageDigest.getInstance("MD5")
      assert(r.text_md5 == md.digest(bytes).map(b => f"$b%02x").mkString)
      assert(r.warc_type == "conversion")
    }
  }
}
