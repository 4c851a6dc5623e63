package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs the `bench = true` queries from [[Queries]] on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  *
  * Results are forced through the `noop` sink (full materialization of every
  * output column) rather than `count()`, which would let Catalyst prune the
  * aggregates away and under-report.
  *
  * A/B guard rail (r11, after two rounds of box-speed drift made raw
  * round-over-round totals uninterpretable): when `bench_ab.ref` exists at
  * the repo root (or SPARK_GRAFT_AB_REF is set to a git ref; "off"
  * disables), the PREVIOUS round's tree is checked out into a throwaway
  * git worktree, compiled, and benched in a subprocess in the SAME
  * wall-clock window, immediately BEFORE the current tree's in-process
  * run — and the result is emitted as its OWN self-contained
  * `{"metric":"ab",...}` JSON line immediately BEFORE the primary
  * `{"metric":"total",...}` line, which stays in exactly the r10 shape
  * and is always the LAST line printed. (r11 spliced the A/B fragment
  * into the middle of the single metric line; that pushed the line head
  * past the driver's bounded tail-capture window and BENCH_r11 came back
  * `parsed: null` — the primary line must be terminal and short, per the
  * r11 verdict task #2 / ADVICE high finding.) Prev-first ordering
  * slightly favors prev on a warming box, i.e. it is conservative
  * against the current tree. Every A/B step is failure-isolated: a
  * missing ref, failed compile, or timed-out run records an `error`
  * field on the ab line and never blocks the primary benchmark.
  */
object Bench {

  /** Run `cmd` in `cwd`, stdout captured, stderr inherited; kills on
    * timeout. Returns (exitCode, stdout) with exitCode −1 on timeout.
    */
  private def runCmd(cmd: Seq[String], cwd: java.io.File,
                     env: Map[String, String], timeoutSec: Long): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val outF = java.io.File.createTempFile("graft_ab", ".out")
    pb.redirectOutput(outF)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val p = pb.start()
    val done = p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { p.destroyForcibly(); p.waitFor() }
    val out = new String(java.nio.file.Files.readAllBytes(outF.toPath), "UTF-8")
    outF.delete()
    (if (done) p.exitValue() else -1, out)
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  // Matches build.sbt's jdk17AddOpens (spark-submit would inject these;
  // the bare `java` subprocess needs them spelled out).
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Bench the previous round's tree in this wall-clock window. Returns
    * the inner fields of the standalone `{"metric":"ab",...}` line, or
    * None when A/B is disabled (no ref configured).
    */
  private def abFragment(repoRoot: java.io.File, sfDir: String,
                         cpus: String): Option[String] = {
    val ref = sys.env.get("SPARK_GRAFT_AB_REF")
      .orElse {
        val f = new java.io.File(repoRoot, "bench_ab.ref")
        if (f.exists)
          Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim)
        else None
      }
      .filter(r => r.nonEmpty && r != "off" && r != "none")
      .getOrElse { return None }
    // error detail capped at 120 chars so even the ab ERROR line stays
    // co-resident with the primary line in the driver's tail window (the
    // full detail is on stderr either way)
    def fail(stage: String, detail: String): Option[String] = Some(
      s""""ref":"${jsonEscape(ref)}",""" +
        s""""error":"${jsonEscape(s"$stage: ${detail.take(120)}")}"""")
    val (rcSha, shaOut) =
      runCmd(Seq("git", "rev-parse", ref), repoRoot, Map.empty, 60)
    if (rcSha != 0) return fail("rev-parse", shaOut)
    val sha = shaOut.trim
    val wt = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_ab_${ProcessHandle.current().pid()}")
    try {
      val (rcWt, wtOut) = runCmd(
        Seq("git", "worktree", "add", "--detach", wt.getAbsolutePath, sha),
        repoRoot, Map.empty, 120)
      if (rcWt != 0) return fail("worktree", wtOut)
      val (rcC, cOut) = runCmd(Seq("sbt", "-batch", "compile"), wt, Map.empty, 900)
      if (rcC != 0) return fail("compile", cOut.linesIterator.toSeq.takeRight(5).mkString(" | "))
      val cp = s"${wt.getAbsolutePath}/target/scala-2.13/classes:/opt/spark/jars/*"
      val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
      val cmd = Seq("java") ++ addOpens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        s"-Xmx$mem", "-cp", cp, "graft.Bench")
      val (rcB, bOut) = runCmd(cmd, wt,
        Map("SPARK_GRAFT_SF_DIR" -> sfDir, "SPARK_GRAFT_CPUS" -> cpus,
          "SPARK_GRAFT_AB_REF" -> "off"), 1800)
      val line = bOut.linesIterator.find(_.contains("\"metric\":\"total\""))
        .getOrElse { return fail("bench", s"exit $rcB, no metric line") }
      val total = "\"value\":([-0-9.eE+]+)".r.findFirstMatchIn(line)
        .map(_.group(1).toDouble)
        .getOrElse { return fail("bench", "no value field") }
      val prevQueries = "\"queries\":\\{[^}]*\\}".r.findFirstIn(line).getOrElse("\"queries\":{}")
      // the per-query prev map goes out IMMEDIATELY on its own line — it is
      // too long to share the driver's 2000-char tail window with the
      // primary line, so the tail-adjacent ab line (emitted later, just
      // before the primary) carries ref+total only
      // Locale.ROOT: the f-interpolator formats with the JVM default locale,
      // and a comma-decimal locale would make the JSON artifact unparseable
      val totalF = String.format(java.util.Locale.ROOT, "%.4f", Double.box(total))
      println(s"""{"metric":"ab_detail","ref":"${sha.take(12)}","prev_tree_same_box":$totalF,$prevQueries}""")
      Some(s""""ref":"${sha.take(12)}","prev_tree_same_box":$totalF""")
    } finally {
      runCmd(Seq("git", "worktree", "remove", "--force", wt.getAbsolutePath),
        repoRoot, Map.empty, 120)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the previous tree runs FIRST, before this JVM's SparkSession exists,
    // so the two measurements share the box but not a process
    val ab = try abFragment(new java.io.File(".").getCanonicalFile, sfDir, cpus)
      catch { case e: Throwable =>
        Some(s""""error":"${jsonEscape(e.toString.take(120))}"""")
      }
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
    tailLines(results, ab, sfDir).foreach(println)
    spark.stop()
  }

  /** The driver-facing tail lines: the compact A/B line first, the primary
    * line LAST and in exactly the r10 shape — the driver parses a bounded
    * 2000-char log tail (r11 verdict task #2 after BENCH_r11 came back
    * unparseable), and the PAIR must fit it together: the primary measured
    * 1779 chars on the 14-query set, so the ab line here stays ref+total
    * only (~90 chars; the full per-query prev map went out earlier on its
    * own ab_detail line) and error details are capped at 120 chars.
    * BenchLineSpec pins the ≤2000 budget against the CURRENT headline set
    * with worst-case numeric widths, so growing the `bench = true` set past
    * what the tail window holds fails a spec instead of silently zeroing
    * the round's benchmark artifact.
    */
  private[graft] def tailLines(results: Seq[(String, Double, List[Double])],
                               ab: Option[String], sfDir: String): Seq[String] = {
    // bounded number widths (≤7 chars up to 27 h): 0.1 ms resolution below
    // 100 s, 0.1 s above — a benchmark doesn't need 17 significant digits,
    // and the bound is what lets BenchLineSpec prove the pair always fits
    // the driver's tail window even with 4-integer-digit contended timings.
    // Locale.ROOT everywhere (r12 ADVICE): the default-locale f-interpolator
    // would emit `1,2345` on a comma-decimal locale and break the JSON.
    def fmt(d: Double) =
      if (d < 0) "-1"
      else if (d >= 100) String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
      else String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val sampleJson = results.map { case (k, _, ts) =>
      "\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val medianJson = results.map { case (k, _, ts) =>
      val m = if (ts.isEmpty || ts.exists(_ < 0)) -1.0 else ts.sorted.apply(ts.size / 2)
      "\"" + k + "\":" + fmt(m)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    ab.map(f => s"""{"metric":"ab",$f}""").toSeq :+
      (s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
        s""""samples":$sampleJson,"median":$medianJson,"sf":"$sfDir"}""")
  }
}
