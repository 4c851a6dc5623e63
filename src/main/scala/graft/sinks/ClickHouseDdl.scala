package graft.sinks

import org.apache.spark.sql.types._

/** ClickHouse DDL generation from a Spark schema — the deployment-side
  * contract of the reference sink (`/root/reference/anonymizer/src/http_log.rs:89-131`
  * `table_ddl`/`insert_ddl`). The actual insert path on a cluster is
  * `foreachBatch` + the ClickHouse JDBC driver using exactly these
  * statements; here the generation is pure and testable.
  */
object ClickHouseDdl {

  /** Spark → ClickHouse type mapping. Signed by default — unsigned types
    * silently wrap on out-of-range values, so they're opt-in per column via
    * `typeOverrides` (the reference's http_log uses UInt64/UInt16).
    */
  def chType(dt: DataType, lowCardinality: Boolean = false): String = dt match {
    case TimestampType => "DateTime"
    case LongType      => "Int64"
    case IntegerType   => "Int32"
    case DoubleType    => "Float64"
    case StringType    => if (lowCardinality) "LowCardinality(String)" else "String"
    case BinaryType    => "String"
    case other         => throw new IllegalArgumentException(s"unsupported: $other")
  }

  /** The reference http_log column types (http_log.rs:94-103). */
  val httpLogTypeOverrides: Map[String, String] = Map(
    "resource_id" -> "UInt64", "bytes_sent" -> "UInt64",
    "request_time_milli" -> "UInt64", "response_status" -> "UInt16")

  /** CREATE TABLE with the reference's engine/partition/order layout. */
  def tableDdl(table: String, schema: StructType,
               orderBy: Seq[String],
               partitionBy: String = "toYYYYMM(timestamp)",
               engine: String = "ReplacingMergeTree",
               lowCardinalityCols: Set[String] = Set("cache_status", "method"),
               typeOverrides: Map[String, String] = httpLogTypeOverrides): String = {
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"), s"unsafe table name: $table")
    val cols = schema.fields
      .map { f =>
        val t = typeOverrides.getOrElse(f.name, chType(f.dataType, lowCardinalityCols(f.name)))
        s"  ${f.name} $t NOT NULL"
      }
      .mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS $table (
       |$cols
       |)
       |ENGINE = $engine
       |PARTITION BY $partitionBy
       |ORDER BY (${orderBy.mkString(", ")})""".stripMargin
  }

  /** INSERT column list matching the schema order. */
  def insertDdl(table: String, schema: StructType): String = {
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"), s"unsafe table name: $table")
    s"INSERT INTO $table (${schema.fieldNames.mkString(", ")})"
  }

  /** The reference's http_log table schema. */
  val httpLogSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("resource_id", LongType, nullable = false),
    StructField("bytes_sent", LongType, nullable = false),
    StructField("request_time_milli", LongType, nullable = false),
    StructField("response_status", IntegerType, nullable = false),
    StructField("cache_status", StringType, nullable = false),
    StructField("method", StringType, nullable = false),
    StructField("remote_addr", StringType, nullable = false),
    StructField("url", StringType, nullable = false)))
}
