package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Disk-trust primitives for gates whose certified path round-trips data
  * through a self-written table (a23 partitioned totals — the one gated row
  * with disk between two Spark actions; see the r10/r11 driver-red history
  * in Queries.scala's a23 scaladoc).
  *
  * The discipline: nothing read back from disk is trusted silently, and
  * nothing read back reaches a dumped artifact. [[requireMultisetEqual]]
  * proves the readback at FULL content granularity — a divergence names its
  * rows in the error or cannot exist; [[forensicSidecar]] records
  * per-column evidence BEFORE the asserts run, so a failure in a foreign
  * environment localizes its divergent column from the artifact alone,
  * without a reproduction.
  */
object DiskTrust {

  /** Require `readback` and `expected` to be multiset-equal over ALL
    * columns (`EXCEPT ALL` both directions, both empty). On failure the
    * error names up to 5 differing rows per direction — `take(5)` is a
    * bounded diagnostic sample, never a corpus-sized materialization.
    */
  def requireMultisetEqual(readback: DataFrame, expected: DataFrame,
                           context: String): Unit = {
    val extraRows   = readback.exceptAll(expected).take(5)
    val missingRows = expected.exceptAll(readback).take(5)
    require(extraRows.isEmpty && missingRows.isEmpty,
      s"$context — rows only in readback: ${extraRows.mkString("; ")} | " +
        s"rows only in pre-write frame: ${missingRows.mkString("; ")}")
  }

  /** Per-column min/max and an order-insensitive `sum(xxhash64(col))`
    * checksum of each frame (plus one whole-row checksum and a row count
    * each, plus caller-supplied environment facts), written as one small
    * parquet next to the Verify output (`graft.verify.out`, set by
    * [[graft.Verify]]; outside a Verify run — Bench, specs — it falls back
    * to a per-process [[Scratch]] dir, wiped per acquisition and removed on
    * JVM exit, so repeated runs never accumulate sidecars). Cost: one
    * aggregate pass per frame; the dumped frame is tens of rows. `.head()`
    * is a 1-row scalar.
    *
    * The checksum is a SUM, not a XOR (r12 ADVICE): `bit_xor` self-cancels
    * on even-multiplicity divergences — a row duplicated 2 extra times, or
    * the same pair of rows swapped between frames, XORs back to the same
    * value, so the sidecar could show identical per-column checksums for
    * genuinely divergent frames. Summing the hashes is equally
    * order-insensitive but multiplicity-sensitive; the accumulator is
    * DECIMAL(38,0) so it can't overflow (and can't trip ANSI arithmetic)
    * below ~10^19 rows. Still a checksum, not a proof — the gate itself is
    * [[requireMultisetEqual]]; the sidecar only localizes.
    */
  def forensicSidecar(s: SparkSession, frames: Seq[(String, DataFrame)],
                      meta: Seq[(String, String)], outName: String): String = {
    val outRoot = sys.props.getOrElse("graft.verify.out",
      Scratch.dir(s"sidecar_$outName"))
    val statRows = frames.flatMap { case (tag, df) =>
      val cols = df.columns.toSeq
      val perCol = cols.flatMap { c =>
        Seq(min(col(c)).cast("string"), max(col(c)).cast("string"),
          expr(s"sum(cast(xxhash64(`$c`) AS DECIMAL(38,0)))").cast("string"))
      }
      val rowHash = expr(
        s"sum(cast(xxhash64(${cols.map(c => s"`$c`").mkString(", ")}) AS DECIMAL(38,0)))").cast("string")
      val aggs = perCol ++ Seq(rowHash, count(lit(1)).cast("string"))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      cols.zipWithIndex.map { case (c, i) =>
        (tag, c, row.getString(3 * i), row.getString(3 * i + 1), row.getString(3 * i + 2))
      } ++ Seq(
        (tag, "__row__", null: String, null: String, row.getString(3 * cols.length)),
        (tag, "__count__", row.getString(3 * cols.length + 1), null: String, null: String))
    }
    val metaRows = meta.map { case (k, v) =>
      ("env", k, v, null: String, null: String)
    }
    import s.implicits._
    val path = s"$outRoot/$outName"
    (statRows ++ metaRows)
      .toDF("frame", "column", "min_or_value", "max", "sum_xxhash64")
      .coalesce(1).write.mode("overwrite").parquet(path)
    path
  }
}
