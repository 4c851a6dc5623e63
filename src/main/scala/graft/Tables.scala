package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-aware readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * Readers stay plain `spark.read.parquet` so Catalyst keeps full pushdown /
  * pruning; only `events` needs massaging (nanosecond timestamps arrive as
  * epoch-nano longs under `spark.sql.legacy.parquet.nanosAsLong`).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts_ns` (epoch nanos, long) and `ts` (µs-truncated timestamp).
    *
    * The driver's generator has shipped `ts` as both INT64 TIMESTAMP(NANOS)
    * (read as epoch-nano long under `nanosAsLong`) and plain TIMESTAMP(MICROS);
    * ScaleProbe-inflated copies write BIGINT. Adapt on the observed type so
    * every consumer sees the same (ts_ns: long, ts: timestamp) pair in the
    * same column positions regardless of which vintage is on disk.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // GraftSession disables NTZ inference, so the post-r7 µs vintage reads
    // directly as TIMESTAMP (no per-row convertTz — see GraftSession); the
    // TimestampNTZType branch below keeps foreign sessions correct.
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // fallback for sessions that force NTZ inference some other way:
        // value-identity under UTC, per the old (slower) adapter
        val order = raw.columns.map { case "ts" => "ts_ns"; case c => c } :+ "ts"
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
          .select(order.map(col): _*)
      case _ => // TIMESTAMP (µs): ts_ns is pure long arithmetic, codegen'd
        val order = raw.columns.map { case "ts" => "ts_ns"; case c => c } :+ "ts"
        raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
          .select(order.map(col): _*)
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
