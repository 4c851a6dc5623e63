package graft

import org.apache.spark.sql.SparkSession

/** Canonical session configuration for the graft engine.
  *
  * The reference pipeline (see `/root/reference/anonymizer/src/main.rs`) scales
  * by spawning N parallel Kafka consumers; here the analog is `local[N]` with N
  * shuffle partitions. On a real cluster the master/partition settings come
  * from spark-submit and AQE handles runtime re-planning (skew splits, shuffle
  * coalescing), so everything below except the nanos flag is advisory.
  */
object GraftSession {

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // testdata events.parquet stores INT64 TIMESTAMP(NANOS), which Spark's
    // parquet reader rejects by default; read as epoch-nano longs instead and
    // convert to a microsecond timestamp in Tables.events.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ObjectHashAggregate (keep_latest, collect_list) falls back to
    // sort-based aggregation after this many hash-map keys per task; the
    // 128-key default sorts almost immediately, re-creating the
    // SortAggregate cost the operator exists to avoid. 256k keys of small
    // object buffers is tens of MB per task; past that the sort fallback is
    // the right call anyway (same group-per-task sizing HashAggregate needs).
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
    .config("spark.ui.enabled", "false")

  /** Local session sized by SPARK_GRAFT_CPUS (driver contract). */
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = configure(
      SparkSession
        .builder()
        .master(s"local[$cpus]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
