package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 group F): image/audio/video
  * travel as opaque `binary` columns with typed metadata. The Spark side —
  * schema, typed Dataset, per-partition batching — is real; the media decode
  * itself is STUBBED (no image/audio libraries in this container) with a
  * deterministic fake so the pipeline is testable end-to-end. A production
  * deployment swaps [[Multimodal.stubDecode]] for a real codec (or an Arrow
  * batch UDF) without touching the surrounding plan.
  */
object Multimodal {

  /** An opaque media payload plus its id. */
  case class MMRecord(doc_id: Long, payload: Array[Byte])

  /** Extracted features: byte stats stand in for real image features. */
  case class MMFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                        mean_byte: Double, p_hash: Long)

  /** STUB decoder — deterministic fake of an image decode + feature extract.
    * "width"/"height" are read from the leading bytes, the perceptual hash is
    * a real hash of the payload; a real implementation would decode pixels
    * here. Everything is a pure function of the payload (reproducible across
    * executors/retries, which is what matters for the plumbing).
    */
  def stubDecode(r: MMRecord): MMFeatures = {
    val b = r.payload
    val n = b.length
    var sum = 0L
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < n) {
      sum += (b(i) & 0xff)
      h = graft.functions.TextHash.mix(h ^ (b(i) & 0xffL))
      i += 1
    }
    val width = if (n >= 2) ((b(0) & 0xff) << 8 | (b(1) & 0xff)) % 4096 else 0
    val height = if (n >= 4) ((b(2) & 0xff) << 8 | (b(3) & 0xff)) % 4096 else 0
    val mean = if (n == 0) 0.0 else math.rint(sum.toDouble / n * 10000) / 10000
    MMFeatures(r.doc_id, n, width, height, mean, h)
  }

  /** Batched per-partition feature extraction over a binary payload column.
    * `mapPartitions` keeps any per-partition decoder init (model load, codec
    * context) amortized — the same shape a real decoder needs.
    */
  def extractFeatures(spark: SparkSession, df: DataFrame,
                      idCol: String, payloadCol: String): Dataset[MMFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[MMRecord]
      .mapPartitions { it => it.map(stubDecode) }
  }
}
