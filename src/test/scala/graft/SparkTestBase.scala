package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs (reused across suites via getOrCreate). */
trait SparkTestBase {
  lazy val spark: SparkSession = GraftSession.local("4")
  val sfDir = "/root/testdata/sf0.001"
}
