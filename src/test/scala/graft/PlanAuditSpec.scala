package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanAudit

/** PlanAudit must flag each hazard class on a plan that exhibits it and
  * stay silent on the healthy equivalents — including through an executed
  * AQE plan, where the live tree hides behind query stages.
  */
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {

  test("flags a cartesian product as error") {
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // with broadcast on, tiny frames plan a (benign) broadcast loop join;
      // the audit targets the non-broadcast CartesianProduct a big-big
      // non-equi join degenerates into
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = Seq(1, 2, 3).toDF("x")
      val b = Seq(4, 5).toDF("y")
      val bad = a.crossJoin(b).filter(col("x") < col("y"))
      bad.collect()
      val fs = PlanAudit.audit(bad)
      assert(fs.exists(f => f.rule == "cartesian" && f.severity == "error"), fs.mkString("; "))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("flags a global window, passes the keyed equivalent") {
    val hl = operators.HttpLog.view(Tables.events(spark, sfDir))
      .select("resource_id", "bytes_sent")
    val global = hl.withColumn("r", row_number().over(
      Window.orderBy("bytes_sent")))
    global.collect()
    assert(PlanAudit.audit(global).exists(_.rule == "global-window"))

    val keyed = hl.withColumn("r", row_number().over(
      Window.partitionBy("resource_id").orderBy("bytes_sent")))
    keyed.collect()
    assert(!PlanAudit.audit(keyed).exists(_.rule == "global-window"))
  }

  test("keyed aggregate into a single partition warns; global scalar does not") {
    val hl = operators.HttpLog.view(Tables.events(spark, sfDir))
    // b27's original hazard shape: per-key frame repartitioned to 1
    val funneled = hl.groupBy("resource_id").agg(sum("bytes_sent").as("s"))
      .repartition(1)
    funneled.collect()
    assert(PlanAudit.audit(funneled).exists(_.rule == "single-partition-shuffle"))

    // benign: ungrouped partial aggs reduce to one row per partition
    val scalar = hl.agg(sum("bytes_sent").as("s"))
    scalar.collect()
    assert(!PlanAudit.audit(scalar).exists(_.rule == "single-partition-shuffle"),
      PlanAudit.audit(scalar).mkString("; "))
  }

  test("full-width filterless wide scan is info; pruned or filtered scans pass") {
    val wide = spark.read.parquet(s"$sfDir/lineitem.parquet") // 16 columns
    wide.collect()
    assert(PlanAudit.audit(wide).exists(_.rule == "unfiltered-wide-scan"))

    val pruned = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    pruned.collect()
    assert(!PlanAudit.audit(pruned).exists(_.rule == "unfiltered-wide-scan"))

    val filtered = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 10)
    filtered.collect()
    assert(!PlanAudit.audit(filtered).exists(_.rule == "unfiltered-wide-scan"))
  }

  test("keyed max(struct) demotes to SortAggregate and is flagged; " +
      "keep_latest and plain hash aggregates pass") {
    val hl = operators.HttpLog.view(Tables.events(spark, sfDir))
    // the b42/c14 shape: a struct-valued agg buffer silently demotes
    val demoted = hl.groupBy("resource_id")
      .agg(max(struct(col("bytes_sent"), col("log_id"))).as("best"))
    demoted.collect()
    assert(PlanAudit.audit(demoted).exists(_.rule == "sort-aggregate-demotion"),
      PlanAudit.audit(demoted).mkString("; "))

    // the repo's fix for the same semantics plans ObjectHashAggregate
    val fixed = hl.groupBy("resource_id")
      .agg(functions.keep_latest(col("bytes_sent"),
        struct(col("bytes_sent").as("b"), col("log_id").as("u"))).as("best"))
    fixed.collect()
    assert(!PlanAudit.audit(fixed).exists(_.rule == "sort-aggregate-demotion"),
      PlanAudit.audit(fixed).mkString("; "))

    val hashed = hl.groupBy("resource_id").agg(sum("bytes_sent").as("s"))
    hashed.collect()
    assert(!PlanAudit.audit(hashed).exists(_.rule == "sort-aggregate-demotion"))

    // ungrouped sort aggregate = one row per partition, never flagged
    val scalar = hl.agg(max(struct(col("bytes_sent"), col("log_id"))).as("m"))
    scalar.collect()
    assert(!PlanAudit.audit(scalar).exists(_.rule == "sort-aggregate-demotion"),
      PlanAudit.audit(scalar).mkString("; "))
  }

  test("collect_list/collect_set inside an aggregate are flagged; bounded " +
      "custom aggregates pass") {
    val hl = operators.HttpLog.view(Tables.events(spark, sfDir))
    val cl = hl.groupBy("remote_addr").agg(collect_list("resource_id").as("rs"))
    cl.collect()
    assert(PlanAudit.audit(cl).exists(_.rule == "unbounded-collect"),
      PlanAudit.audit(cl).mkString("; "))

    val cs = hl.groupBy("remote_addr").agg(collect_set("resource_id").as("rs"))
    cs.collect()
    assert(PlanAudit.audit(cs).exists(_.rule == "unbounded-collect"))

    // the original b38 OOM was exactly collect_list per user; its fix — the
    // k-bounded EarliestK buffer inside windowFunnel — must audit clean
    val bounded = operators.Funnel.windowFunnel(
      Tables.events(spark, sfDir), "user_id", "ts", "event_type",
      Seq("view", "click"), 86400000000L)
    bounded.collect()
    assert(!PlanAudit.audit(bounded).exists(_.rule == "unbounded-collect"),
      PlanAudit.audit(bounded).mkString("; "))
  }

  test("full-vocab aggregate joined to a broadcast-pruned subset is flagged; " +
      "the pruned-first rewrite passes") {
    import spark.implicits._
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // keep the dfreq↔postings join a shuffle join, as it is at corpus
      // scale, while the tiny query-term side still broadcasts explicitly
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = Tables.documents(spark, sfDir)
      val tf = docs.select(col("doc_id"),
          explode(split(col("text"), "\\s+")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val qterms = Seq("the", "data").toDF("term")
      // the r7 BM25 shape: df over the FULL vocabulary, then joined to the
      // query-term-pruned postings — a corpus-scale Exchange for a handful
      // of keys
      val dfreqFull = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val bad = tf.join(broadcast(qterms), "term").join(dfreqFull, "term")
      bad.collect()
      assert(PlanAudit.audit(bad).exists(_.rule == "aggregate-before-prune"),
        PlanAudit.audit(bad).mkString("; "))

      // the fix: semi-join the postings against the broadcast terms FIRST,
      // aggregate df from the pruned postings
      val pruned = tf.join(broadcast(qterms), "term")
      val dfreqPruned = pruned.groupBy("term").agg(count(lit(1)).as("df"))
      val good = pruned.join(dfreqPruned, "term")
      good.collect()
      assert(!PlanAudit.audit(good).exists(_.rule == "aggregate-before-prune"),
        PlanAudit.audit(good).mkString("; "))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("the flagship pipeline audits clean") {
    val df = Queries.all.find(_.name == "a00_pipeline_e2e").get.fn(spark, sfDir)
    df.collect()
    val fs = PlanAudit.audit(df).filterNot(_.severity == "info")
    assert(fs.isEmpty, fs.mkString("; "))
  }
}
