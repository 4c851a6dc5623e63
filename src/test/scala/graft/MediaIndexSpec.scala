package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The disk-served perceptual-hash band index (Multimodal.writeHashIndex /
  * probeHashIndex): the media-admission sibling of NearDupIndexSpec —
  * archive hashes written partitioned by pb, a small batch probes only its
  * own pb partitions, and the result equals the in-memory banded search.
  */
class MediaIndexSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def corpusHashes = {
    val payloads = spark.range(500).as[Long]
      .map(id => (id, Multimodal.syntheticPgm(id))).toDF("doc_id", "payload")
    Multimodal.extractDhash(spark, payloads, "doc_id", "payload")
  }

  /** Batch: single-pixel-perturbed twins of two archive images (≤ 2 bits
    * from their sources by the f11 analytic bound).
    */
  private def perturbedBatch = spark.createDataset(Seq(10L, 110L)).map { id =>
    val p = Multimodal.syntheticPgm(id)
    val plane = p.length - ((8 + id % 9) * (8 + id % 7)).toInt
    p(plane) = (((p(plane) & 0xff) + 16) % 256).toByte
    (id + 900000, p)
  }.toDF("doc_id", "payload")

  test("disk probe equals in-memory banded search and flags perturbed twins") {
    val corpus = corpusHashes
    val batch = Multimodal.extractDhash(spark, perturbedBatch, "doc_id", "payload")
    withTempDir("graft_media") { tmp =>
      val dir = tmp + "/idx"
      Multimodal.writeHashIndex(corpus, dir)
      val probed = Multimodal.probeHashIndex(spark, dir, batch)
      // in-memory reference: same banding, corpus frame instead of the index
      def bands(df: org.apache.spark.sql.DataFrame) = df
        .select(col("row_id"), col("dhash").as("h"),
          explode(expr("sequence(0, 3)")).as("k"))
        .withColumn("key", expr("shiftright(h, k * 16) & 65535"))
      val expected = bands(batch).as("q").join(bands(corpus).as("c"),
          col("q.k") === col("c.k") && col("q.key") === col("c.key") &&
            col("q.row_id") =!= col("c.row_id"))
        .select(col("q.row_id").as("row_id"), col("c.row_id").as("corpus_id"),
          col("q.h").as("qh"), col("c.h").as("ch"))
        .distinct()
        .withColumn("hamming", expr("cast(bit_count(qh ^ ch) as int)"))
        .filter(col("hamming") <= 2)
        .select("row_id", "corpus_id", "hamming")
      assert(probed.collect().toSet == expected.collect().toSet,
        "disk-served probe must equal the in-memory banded search")
      // each perturbed twin flags against its own source (≤ 2 bits)
      Seq(10L, 110L).foreach { src =>
        assert(probed.collect().exists(r =>
          r.getLong(0) == src + 900000 && r.getLong(1) == src),
          s"perturbed twin of $src not flagged")
      }
      // the pb isin lands as a PARTITION filter
      val plan = probed.queryExecution.executedPlan.toString()
      assert("PartitionFilters: \\[[^\\]]*pb".r.findFirstIn(plan).isDefined,
        s"no partition filter on pb in:\n$plan")
      // a 2-image batch touches ≤ 2·4 band buckets of the archive's spread
      val total = spark.read.parquet(dir).select("pb").distinct().count()
      val touchedPb = bands(batch)
        .withColumn("pb", (col("k") * 64 + pmod(col("key"), lit(64L))).cast("int"))
        .select("pb").distinct().count()
      assert(touchedPb <= 8 && touchedPb < total,
        s"probe touched $touchedPb of $total partitions — not a prune")
      probed.unpersist(blocking = false)
    }
  }

  test("batching invariance: micro-batch probes union to the whole-batch result (g10)") {
    // the g10 streaming contract: every stage is stateless (the probed pb
    // set is per-batch routing metadata), so splitting an arriving batch
    // into micro-batches and unioning the per-batch verdicts must equal
    // the single-batch probe — arrival batching cannot change admissions
    val corpus = corpusHashes
    val arrivals = spark.range(40).as[Long].map { i =>
      val src = i * 12 % 480 // spread over the archive
      val p = Multimodal.syntheticPgm(src)
      if (i % 2 == 1) { // half perturbed, half exact re-uploads
        val plane = p.length - ((8 + src % 9) * (8 + src % 7)).toInt
        p(plane) = (((p(plane) & 0xff) + 16) % 256).toByte
      }
      (i + 800000, p)
    }.toDF("doc_id", "payload")
    val batch = Multimodal.extractDhash(spark, arrivals, "doc_id", "payload")
      .persist()
    withTempDir("graft_media_inv") { tmp =>
      val dir = tmp + "/idx"
      Multimodal.writeHashIndex(corpus, dir)
      val whole = Multimodal.probeHashIndex(spark, dir, batch)
      val wholeSet = whole.collect().toSet
      val unioned = (0 until 4).flatMap { b =>
        val mb = Multimodal.probeHashIndex(spark, dir,
          batch.filter(col("row_id") % 4 === b))
        val rows = mb.collect().toSet
        mb.unpersist(blocking = false)
        rows
      }.toSet
      assert(unioned == wholeSet,
        s"micro-batch union diverged: ${unioned.size} vs ${wholeSet.size} rows")
      assert(wholeSet.nonEmpty, "expected flagged arrivals in the parity check")
      whole.unpersist(blocking = false)
      batch.unpersist(blocking = true)
    }
  }
}
