package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs the `bench = true` queries from [[Queries]] on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  *
  * Results are forced through the `noop` sink (full materialization of every
  * output column) rather than `count()`, which would let Catalyst prune the
  * aggregates away and under-report.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Queries.all.filter(_.bench)
    def run(q: Q): Boolean =
      try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: $e"); false }
    // warm each query once (codegen compile, JIT, file index), then time
    // THREE full passes and keep the per-query min — one slow run from
    // CI-machine contention (GC, other tenants, writeback) otherwise
    // dominates the reported number (observed swings up to 3×). The passes
    // are INTERLEAVED: each pass runs the whole suite in a rotated order, so
    // a single contended wall-clock window degrades at most one of a query's
    // three samples instead of all of them back-to-back. A failing query
    // reports -1, never a flattering near-zero timing.
    // Every timed run starts from a CLEARED cache: operators that persist
    // intermediates (the dedup family) would otherwise be served a previous
    // run's blocks via canonical-plan cache matching and the "timing" would
    // measure a cache read, not the computation. In-run persists still count
    // — they're part of the operator's real cost.
    def timed(q: Q): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      if (run(q)) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    val warmed = headline.filter(run)
    // 5 passes (r8, was 3): the r7 driver session showed a single contended
    // wall-clock window can poison 2 of 3 samples (sum-of-medians 43.5 s vs
    // sum-of-mins 24.8 on identical code); two more rotated passes cost
    // ~1 min and make the per-query min far more robust to box noise.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val samples = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (rep <- 0 until reps) {
      val shift   = if (warmed.isEmpty) 0 else rep * warmed.length / reps
      val rotated = warmed.drop(shift) ++ warmed.take(shift)
      rotated.foreach { q => samples(q.name) = timed(q) :: samples(q.name) }
    }
    // headline number per query = min of the three samples (the least-
    // contended run). The JSON also carries ALL per-pass samples (in run
    // order) and the median, so a driver-box regression is adjudicable from
    // the artifact alone: min ≈ median → the query really got slower;
    // min ≪ median → one or two passes hit machine contention, the min is
    // the honest number. Without the samples, a 1.8× swing with zero code
    // change (r5's c02) is unfalsifiable.
    val results = headline.map { q =>
      val ts = samples(q.name).reverse // prepended during runs → reverse to run order
      val t  = if (ts.isEmpty || ts.exists(_ < 0)) -1.0 else ts.min
      (q.name, t, ts)
    }
    def fmt(d: Double) = if (d < 0) "-1" else f"$d%.4f"
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val sampleJson = results.map { case (k, _, ts) =>
      "\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val medianJson = results.map { case (k, _, ts) =>
      val m = if (ts.isEmpty || ts.exists(_ < 0)) -1.0 else ts.sorted.apply(ts.size / 2)
      "\"" + k + "\":" + fmt(m)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""samples":$sampleJson,"median":$medianJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
