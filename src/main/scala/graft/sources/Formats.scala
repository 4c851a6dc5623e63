package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch IO formats the engine supports beyond parquet. All reads take an
  * explicit schema-bearing sample or infer; all writes are plain DataFrame
  * writers so they compose with `partitionBy`/`bucketBy` as needed.
  * (Kafka-shaped streaming ingestion lives in [[KafkaShaped]].)
  */
object Formats {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schemaFrom: DataFrame): DataFrame =
    spark.read.option("header", "true").schema(schemaFrom.schema).csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonLines(spark: SparkSession, path: String, schemaFrom: DataFrame): DataFrame =
    spark.read.schema(schemaFrom.schema).json(path)

  /** JSONL corpus read with DEAD-LETTER semantics — the text-ingestion
    * sibling of the capnp decode/DLQ split: web-scale JSONL crawls always
    * carry some malformed lines, and a FAILFAST read would kill a 100 TB
    * job on the first one while silent DROPMALFORMED loses them without a
    * trace. PERMISSIVE mode + `_corrupt_record` keeps every line: returns
    * (good rows with the declared schema, dead lines with their raw text
    * for a failure bucket/audit). Cost: one scan, no extra shuffle — the
    * split is two filters over the same cached-schema read.
    */
  def readJsonLinesWithDlq(spark: SparkSession, path: String,
                           schemaFrom: DataFrame): (DataFrame, DataFrame) = {
    val schema = org.apache.spark.sql.types.StructType(
      schemaFrom.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "_corrupt_record", org.apache.spark.sql.types.StringType))
    val raw = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    // Spark requires the corrupt-record split to run over a materialized
    // frame (filtering the lazy read on _corrupt_record alone is
    // unsupported) — cache scoped to the split, caller unpersists via the
    // returned frames' lifecycle
    val cached = raw.cache()
    val good = cached.filter(cached("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val dead = cached.filter(cached("_corrupt_record").isNotNull)
      .select(cached("_corrupt_record").as("raw_line"))
    (good, dead)
  }
}
