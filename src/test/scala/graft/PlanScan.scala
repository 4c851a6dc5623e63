package graft

/** Scratch diagnostic (not a spec). */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    Queries.all.filter(q => args.contains(q.name)).foreach { q =>
      val df = q.fn(spark, sfDir)
      df.collect()
      println(s"===== ${q.name} FINAL")
      val p = df.queryExecution.executedPlan.toString()
      println(p.linesIterator.filter(l => l.contains("Exchange") ||
        l.contains("Reused") || l.contains("Scan parquet") ||
        l.contains("Join") || l.contains("Window")).mkString("\n"))
    }
    spark.stop()
  }
}
