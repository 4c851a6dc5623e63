package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/WET ingestion (ISO 28500) — the wire format web-scale training
  * corpora actually arrive in: Common Crawl ships crawl text as WET files
  * (WARC `conversion` records: CRLF header block, `Content-Length` octet
  * framing, per-record gzip members concatenated into one `.warc.wet.gz`).
  * An engine claiming the training-data pipeline needs to EAT this format,
  * not just process rows that someone else extracted.
  *
  * Same discipline as the media decoders (`operators/Multimodal.scala`):
  * pure-bytes parser behind the one documented `mapPartitions` seam —
  * embarrassingly parallel, zero shuffle, a container that violates the
  * spec ANYWHERE dead-letters whole (None, never throw, never a partial
  * record list that silently drops documents) — plus its own writer so
  * roundtrips and the e28 oracle are self-contained. Both container
  * encodings are handled: plain concatenated records and per-member gzip
  * (detected by the 0x1f8b magic; JDK GZIPInputStream consumes
  * concatenated members natively).
  *
  * Scale shape (100 TB of .warc.wet.gz): one binary column in, records
  * exploded executor-side; per-partition cost is linear in container
  * bytes, state is one record buffer. Splitting WITHIN a container is
  * deliberately not attempted — gzip members are not seekable without an
  * index; Common Crawl's own tooling parallelizes across files, which is
  * exactly what a binary-file DataFrame partitioning gives.
  */
object Warc {

  /** One extracted WET record. `text_md5` stands in for shipping the full
    * text twice in the e28 result (the text itself is round-trip-checked in
    * WarcSpec; the hash is what the DuckDB oracle can recompute).
    */
  case class WetRecord(doc_id: Long, target_uri: String, warc_type: String,
                       content_length: Long, text_md5: String)

  private val Crlf = "\r\n"

  /** A WARC/1.0 `conversion` (WET) record for `text`, deterministic in
    * `id` — the fixture/oracle writer.
    */
  def writeRecord(id: Long, text: String): Array[Byte] = {
    val body = text.getBytes(StandardCharsets.UTF_8)
    val headers = Seq(
      "WARC/1.0",
      "WARC-Type: conversion",
      s"WARC-Target-URI: https://example.org/doc/$id",
      "WARC-Date: 2024-01-01T00:00:00Z",
      s"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-${f"$id%012d"}>",
      "Content-Type: text/plain",
      s"Content-Length: ${body.length}")
    val out = new ByteArrayOutputStream()
    out.write((headers.mkString(Crlf) + Crlf + Crlf).getBytes(StandardCharsets.UTF_8))
    out.write(body)
    out.write((Crlf + Crlf).getBytes(StandardCharsets.UTF_8))
    out.toByteArray
  }

  /** One gzip member (the Common Crawl per-record compression unit). */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out)
    gz.write(record); gz.close()
    out.toByteArray
  }

  /** One zstd frame per record — the `.warc.zst` convention newer archive
    * tooling emits (zstd-jni ships with Spark, so this costs no new
    * dependency).
    */
  def zstdMember(record: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(out)
    z.write(record); z.close()
    out.toByteArray
  }

  /** A synthetic container for the records of `docs`: `containerId % 3`
    * picks plain concatenation / concatenated gzip members / concatenated
    * zstd frames, so all three parser paths are live in every run of the
    * e28 query and WarcSpec. The encoding is invisible in the extracted
    * output, so the choice cannot affect any oracle.
    */
  def syntheticContainer(containerId: Long, docs: Seq[(Long, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    docs.sortBy(_._1).foreach { case (id, text) =>
      val rec = writeRecord(id, text)
      out.write(containerId % 3 match {
        case 1 => gzipMember(rec)
        case 2 => zstdMember(rec)
        case _ => rec
      })
    }
    out.toByteArray
  }

  /** Parse a WET container (plain, gzip-membered, or zstd-framed) into
    * records; None on ANY malformed content — bad magic, header without
    * CRLFCRLF terminator, missing/garbage Content-Length, truncated body,
    * missing record separator, or trailing junk.
    */
  def parse(container: Array[Byte]): Option[Seq[(String, String, Array[Byte])]] = {
    if (container.length == 0) return None
    def drain(in: java.io.InputStream): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    }
    val isGzip = container.length >= 2 && (container(0) & 0xff) == 0x1f &&
      (container(1) & 0xff) == 0x8b
    val isZstd = container.length >= 4 && (container(0) & 0xff) == 0x28 &&
      (container(1) & 0xff) == 0xb5 && (container(2) & 0xff) == 0x2f &&
      (container(3) & 0xff) == 0xfd
    val plain =
      if (isGzip) {
        // JDK GZIPInputStream consumes concatenated members natively
        try drain(new GZIPInputStream(new java.io.ByteArrayInputStream(container)))
        catch { case _: java.io.IOException => return None }
      } else if (isZstd) {
        // Walk frames EXPLICITLY: ZstdInputStream's continuous mode treats a
        // truncated final frame as "no more data yet" and silently returns
        // the earlier frames — with one frame per record that would drop
        // trailing documents without any error, the exact partial-parse
        // failure this parser exists to prevent. findFrameCompressedSize
        // errors on a malformed/short frame; the bounds check catches a
        // frame claiming bytes past the container.
        try {
          val out = new ByteArrayOutputStream()
          var pos = 0
          while (pos < container.length) {
            val sz = com.github.luben.zstd.Zstd.findFrameCompressedSize(
              container, pos, container.length - pos)
            if (sz <= 0 || pos + sz > container.length) return None
            val z = new com.github.luben.zstd.ZstdInputStream(
              new java.io.ByteArrayInputStream(container, pos, sz.toInt))
            out.write(drain(z))
            pos += sz.toInt
          }
          out.toByteArray
        } catch {
          case _: java.io.IOException => return None
          case _: com.github.luben.zstd.ZstdException => return None
        }
      } else container

    val recs = Seq.newBuilder[(String, String, Array[Byte])]
    var pos = 0
    while (pos < plain.length) {
      // header block: bytes up to CRLFCRLF, ASCII lines
      val hEnd = indexOfCrlfCrlf(plain, pos)
      if (hEnd < 0) return None
      val header = new String(plain, pos, hEnd - pos, StandardCharsets.UTF_8)
      val lines = header.split(Crlf, -1)
      if (lines.isEmpty || !lines.head.startsWith("WARC/")) return None
      val fields = lines.tail.flatMap { l =>
        val i = l.indexOf(':')
        if (i <= 0) None else Some(l.substring(0, i).trim.toLowerCase ->
          l.substring(i + 1).trim)
      }.toMap
      val len = fields.get("content-length").flatMap(_.toLongOption)
        .getOrElse(return None)
      if (len < 0 || len > Int.MaxValue) return None
      val bodyStart = hEnd + 4
      // body + the mandatory two CRLFs closing the record
      if (bodyStart + len + 4 > plain.length) return None
      val body = java.util.Arrays.copyOfRange(plain, bodyStart, bodyStart + len.toInt)
      val sep = bodyStart + len.toInt
      if (plain(sep) != '\r' || plain(sep + 1) != '\n' ||
          plain(sep + 2) != '\r' || plain(sep + 3) != '\n') return None
      recs += ((fields.getOrElse("warc-type", ""),
        fields.getOrElse("warc-target-uri", ""), body))
      pos = sep + 4
    }
    Some(recs.result())
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Production ingestion shape: a directory of `.warc.wet(.gz)` files
    * read through Spark's `binaryFile` source — one task per file, which
    * is exactly Common Crawl's parallelism unit (members aren't seekable,
    * files are). Filters/pruning stay with the file index; the parse is
    * the same dead-letter seam as [[extractWet]].
    */
  def readWetFiles(spark: SparkSession, path: String): Dataset[WetRecord] =
    extractWet(spark,
      spark.read.format("binaryFile").load(path)
        .select(col("length").as("file_id"), col("content")),
      "file_id", "content")

  /** Containers → one row per contained WET record; malformed containers
    * dead-letter whole (every record in them is suspect). `doc_id` is
    * recovered from the deterministic record id tail, so the output is
    * joinable back to the corpus regardless of container grouping.
    */
  def extractWet(spark: SparkSession, df: DataFrame,
                 idCol: String, payloadCol: String): Dataset[WetRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[graft.operators.Multimodal.MMRecord]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          parse(r.payload).toSeq.flatten.map { case (typ, uri, body) =>
            md.reset()
            val hex = md.digest(body).map(b => f"$b%02x").mkString
            val id = uri.substring(uri.lastIndexOf('/') + 1).toLongOption.getOrElse(-1L)
            WetRecord(id, uri, typ, body.length.toLong, hex)
          }
        }
      }
  }
}
