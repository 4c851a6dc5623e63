package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Scale-up probe: inflates the sf0.1 events table N× into /tmp (other
  * tables symlinked), then times the ETL-heavy queries on it. Evidence for
  * SURVEY.md §4 that the plans scale linearly in input size rather than
  * degrading (shuffle spill, skew, quadratic blowups).
  *
  * Usage: runMain graft.ScaleProbe [multiplier] [queries...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val names = if (args.length > 1) args.tail.toSet
                else Set("a00_pipeline_e2e", "a03_dedup_replacing", "a04_traffic_totals")
    val base = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_${mult}x"
    val spark = GraftSession.local()

    if (!Files.exists(Paths.get(s"$out/events.parquet"))) {
      Files.createDirectories(Paths.get(out))
      // events.ts arrives as epoch-nano long (nanosAsLong) and is written
      // back as plain BIGINT — Tables.events handles both identically
      spark.read.parquet(s"$base/events.parquet")
        .crossJoin(spark.range(mult).toDF("rep"))
        .withColumn("event_id", col("event_id") * mult + col("rep"))
        .withColumn("user_id", col("user_id") + col("rep") % 10 * 150)
        .drop("rep")
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      Tables.names.filterNot(_ == "events").foreach { t =>
        val link = Paths.get(s"$out/$t.parquet")
        if (!Files.exists(link)) Files.createSymbolicLink(link, Paths.get(s"$base/$t.parquet"))
      }
    }
    val rows = spark.read.parquet(s"$out/events.parquet").count()

    val results = Queries.all.filter(q => names(q.name)).map { q =>
      def run(): Unit = q.fn(spark, out).write.format("noop").mode("overwrite").save()
      run() // warm
      val t0 = System.nanoTime()
      run()
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe","rows":$rows,"mult":$mult,"queries":$qs}""")
    spark.stop()
  }
}
