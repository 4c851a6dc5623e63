package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HttpLogCodec
import graft.sources.{KafkaConnector, KafkaShaped}
import graft.streaming.HttpLogPipeline

/** The connector wiring is unit-tested WITHOUT a broker: the option map is
  * a pure function, availability detection must report the truth about this
  * classpath (no spark-sql-kafka jar in the container), and frames built
  * against the connector's EXACT output schema must flow through the same
  * decode/DLQ/anonymize transform the file harness proves.
  */
class KafkaConnectorSpec extends AnyFunSuite with SparkTestBase {

  test("option map mirrors the reference consumer config") {
    val cfg = KafkaConnector.Config(topic = "http_log",
      brokers = "k1:9092,k2:9092", groupId = "anonymizer-group")
    val o = KafkaConnector.options(cfg)
    // config.rs:7-19 surface
    assert(o("kafka.bootstrap.servers") == "k1:9092,k2:9092")
    assert(o("subscribe") == "http_log")
    assert(o("kafka.group.id") == "anonymizer-group")
    // source.rs:41/44 consumer settings
    assert(o("startingOffsets") == "latest")
    assert(o("kafka.isolation.level") == "read_committed")
    assert(o("failOnDataLoss") == "false")
    // optional knobs appear only when set
    assert(!o.contains("minPartitions") && !o.contains("maxOffsetsPerTrigger"))
    val tuned = KafkaConnector.options(cfg.copy(
      minPartitions = Some(64), maxOffsetsPerTrigger = Some(100000L)))
    assert(tuned("minPartitions") == "64")
    assert(tuned("maxOffsetsPerTrigger") == "100000")
  }

  test("availability detection is honest and the failure is actionable") {
    // this container has no spark-sql-kafka jar — available() must say so,
    // and readStream must fail fast with deploy guidance instead of a
    // ClassNotFoundException from deep inside a query
    assert(!KafkaConnector.available(spark),
      "spark-sql-kafka unexpectedly on the classpath; update this spec")
    val e = intercept[IllegalArgumentException] {
      KafkaConnector.readStream(spark, KafkaConnector.Config())
    }
    assert(e.getMessage.contains("spark-sql-kafka"))
    assert(e.getMessage.contains("KafkaShaped.fileStream"))
  }

  test("connector-schema frames run the a00 pipeline transform unchanged") {
    // rows with the connector's exact 7-column output schema (enforced via
    // createDataFrame against frameSchema), one poisoned payload
    def u(s: String) = UTF8String.fromString(s)
    def payload(i: Int): Array[Byte] = HttpLogCodec.encode(
      1704067200000L + i, i.toLong, 100L + i, 5L, 200,
      u("HIT"), u("GET"), u(s"10.0.0.$i"), u(s"/r/$i"))
    val rows = (0 until 10).map { i =>
      val v = if (i == 3) payload(i).take(6) else payload(i) // poison one
      Row(s"k$i".getBytes, v, "http_log", i % 3, i.toLong,
        new Timestamp(1704067200000L), 0)
    }
    val frames = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), KafkaShaped.frameSchema)
    val (good, dead) = KafkaShaped.decodeSplit(frames)
    assert(good.count() == 9 && dead.count() == 1)
    // the DLQ row keeps its provenance (topic, partition, offset)
    val d = dead.collect().head
    assert(d.getAs[String]("topic") == "http_log" && d.getAs[Long]("offset") == 3L)
    val logs = HttpLogPipeline.decodeAndAnonymize(frames)
    val out = logs.collect()
    assert(out.length == 9)
    assert(out.forall(_.getAs[String]("remote_addr").endsWith(".x")),
      "anonymization must apply to connector frames")
  }
}
