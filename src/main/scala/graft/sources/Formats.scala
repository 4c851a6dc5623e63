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
    * trace. Implemented as a `text` scan + `from_json` with a corrupt-record
    * column (same Jackson parse path as the json reader), NOT as the json
    * reader + cache: Spark disallows filtering the lazy json read on the
    * corrupt column alone, and the cache workaround MATERIALIZES the whole
    * corpus — a cluster-wide spill at 100 TB with no unpersist seam in a
    * two-frame API. Here each returned frame is an independent streaming
    * scan; the dead side re-parses (2× parse CPU, codegen'd) in exchange
    * for zero materialized state, the right trade at corpus scale. Blank
    * lines are skipped to match the json reader's behavior.
    */
  def readJsonLinesWithDlq(spark: SparkSession, path: String,
                           schemaFrom: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_json, length, trim}
    val schema = org.apache.spark.sql.types.StructType(
      schemaFrom.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "_corrupt_record", org.apache.spark.sql.types.StringType))
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"),
        schema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
    val good = parsed.filter(col("r._corrupt_record").isNull)
      .select(col("r.*")).drop("_corrupt_record")
    val dead = parsed.filter(col("r._corrupt_record").isNotNull)
      .select(col("r._corrupt_record").as("raw_line"))
    (good, dead)
  }
}
