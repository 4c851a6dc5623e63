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
}
