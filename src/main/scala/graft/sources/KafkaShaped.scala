package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-message-shaped ingestion (reference source:
  * `/root/reference/anonymizer/src/kafka.rs` / `source.rs`).
  *
  * The frame schema matches Spark's Kafka connector output 1:1, so on a
  * cluster with `spark-sql-kafka` the real source drops in:
  * {{{
  * spark.readStream.format("kafka")
  *   .option("kafka.bootstrap.servers", brokers)
  *   .option("subscribe", "http_log")          // reference topic
  *   .load()                                    // ⇒ exactly frameSchema
  * }}}
  * Offset tracking (the reference's manual commit-after-insert,
  * source.rs) is the streaming checkpoint's job here: offsets commit to the
  * checkpoint only after the sink's foreachBatch returns.
  */
object KafkaShaped {

  /** Schema of `format("kafka")` rows. */
  val frameSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Wrap any DataFrame of binary payloads into Kafka-shaped frames (test /
    * batch-replay harness).
    */
  def framesFromPayloads(payloads: DataFrame, payloadCol: String,
                         offsetCol: String): DataFrame =
    payloads.select(
      lit(null).cast(BinaryType).as("key"),
      col(payloadCol).as("value"),
      lit("http_log").as("topic"),
      pmod(col(offsetCol), lit(8)).cast("int").as("partition"),
      col(offsetCol).as("offset"),
      current_timestamp().as("timestamp"),
      lit(0).as("timestampType"))

  /** Split frames into (decodable, dead-letter) — the reference discards
    * unparsable messages idempotently rather than blocking the partition
    * (lib.rs:127-140). Returns (decoded logs, dead frames with offsets for
    * a failure topic/audit).
    */
  def decodeSplit(frames: DataFrame): (DataFrame, DataFrame) = {
    // opt_fence pins ONE decode per frame: without it, predicate pushdown
    // rewrites the null-check filter to contain the full decode expression,
    // so the costliest expression in the pipeline runs twice per row
    val marked = frames.withColumn(
      "r", graft.functions.opt_fence(graft.functions.capnp_decode_http_log(col("value"))))
    val good = marked.filter(col("r").isNotNull)
    val dead = marked.filter(col("r").isNull)
      .select(col("topic"), col("partition"), col("offset"), col("value"))
    (good, dead)
  }

  /** Streaming file source with the same downstream shape (parquet dir of
    * frames); useful where Kafka isn't reachable. `maxFilesPerTrigger`
    * bounds each micro-batch to that many files (oldest first) — the
    * replay harness (g13) uses 1 so each frame file IS one micro-batch.
    */
  def fileStream(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(frameSchema)
    maxFilesPerTrigger.foreach(m => reader.option("maxFilesPerTrigger", m))
    reader.parquet(dir)
  }
}
