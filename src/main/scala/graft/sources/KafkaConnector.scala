package graft.sources

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real Kafka connector wiring behind the [[KafkaShaped]] frame schema —
  * the deployment path of the reference consumer
  * (`/root/reference/anonymizer/src/source.rs:35-44` builds an rdkafka
  * `StreamConsumer`; `config.rs` defines `KAFKA__TOPIC/BROKERS/GROUP_ID`).
  *
  * Spark's `spark-sql-kafka-0-10` module is resolved BY NAME at runtime
  * (`format("kafka")`), so this wiring compiles and unit-tests without the
  * connector jar on the classpath; [[available]] reports whether the jar is
  * deployed, and [[readStream]] fails with an actionable message when not.
  * The connector's output schema is exactly [[KafkaShaped.frameSchema]], so
  * everything downstream (decode/DLQ split, the a00 pipeline transform,
  * checkpointed sinks) is IDENTICAL between a real broker and the
  * file-backed test harness — which is the point: the harness proves the
  * transform, this file proves the option surface.
  *
  * Reference semantics → Spark mapping:
  *  - manual commit-after-insert (`source.rs:63-73`, `enable.auto.commit=
  *    false`): Structured Streaming never uses Kafka's commit protocol for
  *    progress — offsets are recorded in the CHECKPOINT after each
  *    micro-batch's sink completes, which is the same at-least-once,
  *    commit-follows-write contract. `kafka.group.id` is still set so ops
  *    tooling (lag monitors) sees the consumer.
  *  - `auto.offset.reset=latest` (`source.rs:41`) → `startingOffsets=
  *    latest` (only for the FIRST run; afterwards the checkpoint wins).
  *  - `isolation.level=read_committed` (`source.rs:44`) → passthrough
  *    `kafka.isolation.level`.
  *  - `NUM_CONSUMERS` (`config.rs:76`) → `minPartitions`: Spark fans
  *    consumption out to tasks; a partition can be split across tasks.
  *
  * SEAM FINAL (r6): this wiring is the end state reachable in a sandbox
  * with zero egress and no connector jar/broker binary on disk — nothing
  * here has ever consumed from a live broker. The three risks a first
  * deployment against a real cluster must shake out, none of which a
  * brokerless test can falsify:
  *  1. `kafka.`-prefix passthrough spelling: a typo'd passthrough key
  *     (e.g. `kafka.isolation.level`) is silently ignored by the consumer
  *     rather than rejected — verify via consumer-config logs on first run.
  *  2. offset-commit pacing: checkpoint-commit (not broker auto-commit) is
  *     asserted from Spark's documented contract, not observed against a
  *     broker's `__consumer_offsets`.
  *  3. broker-side truncation/rebalance: `failOnDataLoss=false` paths
  *     (retention deleting unread offsets, partition reassignment) are
  *     untested against real broker behavior.
  */
object KafkaConnector {

  /** Mirror of the reference's `KafkaConfig` (config.rs:7-19). `retries` /
    * `retryDelayMs` govern the reference's commit retry loop; in Spark the
    * checkpoint write is the commit, so they have no connector equivalent
    * and are intentionally absent here.
    */
  case class Config(
      topic: String = "http_log",
      brokers: String = "localhost:9092",
      groupId: String = "anonymizer-group",
      startingOffsets: String = "latest",
      failOnDataLoss: Boolean = false,
      minPartitions: Option[Int] = None,
      maxOffsetsPerTrigger: Option[Long] = None)

  /** The exact option map handed to `format("kafka")`. Kept as a pure
    * function so the mapping is unit-testable without a broker: `kafka.`-
    * prefixed keys go verbatim to the underlying consumer, unprefixed keys
    * are Spark-side.
    */
  def options(cfg: Config): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> cfg.brokers,
      "subscribe" -> cfg.topic,
      "kafka.group.id" -> cfg.groupId,
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString,
      "kafka.isolation.level" -> "read_committed",
      // the reference disables librdkafka auto-commit (source.rs:42-43);
      // Spark's Kafka source does the same internally — progress lives in
      // the checkpoint, never in the broker's offset store
      "includeHeaders" -> "false")
    base ++
      cfg.minPartitions.map(n => "minPartitions" -> n.toString) ++
      cfg.maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)
  }

  /** True when the `spark-sql-kafka` provider is on the classpath. */
  def available(spark: SparkSession): Boolean =
    Try(org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
      "kafka", spark.sessionState.conf)).isSuccess

  /** Streaming frames from a real broker — schema = frameSchema. */
  def readStream(spark: SparkSession, cfg: Config): DataFrame = {
    require(available(spark),
      "Kafka connector not on classpath: deploy spark-sql-kafka-0-10 " +
        "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13) or use " +
        "KafkaShaped.fileStream for a file-backed source with the same schema")
    spark.readStream.format("kafka").options(options(cfg)).load()
  }

  /** Batch replay of a topic range (backfills, reprocessing). */
  def read(spark: SparkSession, cfg: Config): DataFrame = {
    require(available(spark),
      "Kafka connector not on classpath: deploy spark-sql-kafka-0-10 " +
        "or replay from the frames parquet dir instead")
    spark.read.format("kafka").options(options(cfg))
      .option("startingOffsets",
        if (cfg.startingOffsets == "latest") "earliest" else cfg.startingOffsets)
      .load()
  }
}
