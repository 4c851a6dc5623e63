package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs (reused across suites via getOrCreate). */
trait SparkTestBase {
  lazy val spark: SparkSession = GraftSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  /** Temp dir deleted after the body — specs writing indexes/sinks must not
    * accumulate parquet trees in /tmp across runs.
    */
  def withTempDir[A](prefix: String)(body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try body(dir.toString)
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
