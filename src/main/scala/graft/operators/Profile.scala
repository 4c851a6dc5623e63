package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-scan table profiling — the "what is in this 100 TB table" ops
  * pass every pipeline runs before pointing real work at a dataset: per
  * column, row/null counts, a bounded-state distinct estimate, and
  * canonical min/max. ONE ungrouped aggregate over ONE scan — every
  * statistic is a partial-aggregating expression (count / min / max /
  * the KMV bottom-k sketch), so the whole profile costs a single pass
  * with map-side combine and a one-row shuffle, regardless of table
  * width or height. The per-column rows are unpivoted from that one
  * aggregate row with an `explode` projection (driver-free).
  *
  * Determinism discipline (what makes a PROFILE hash-checkable, which
  * profiling tools never are): every value is first mapped to a CANONICAL
  * integer/string representation — longs as-is, doubles as e4 fixed-point
  * `floor(x·10⁴)`, timestamps as epoch micros, strings verbatim — and
  * both the min/max and the KMV hash input use that repr, so no
  * cross-engine float/date FORMATTING ever reaches a comparison or an
  * md5. The distinct estimate is the b23 KMV sketch (bottom-64 md5
  * order statistics — set-deterministic, merge-order-independent), so
  * even the "approximate" column hash-matches the SQL mirror exactly.
  *
  * Reference anchor: the reference README's operational posture (sizing,
  * `README.md:63-66`) starts from exactly these per-column measurements;
  * `Capacity.estimate` consumes the row counts this produces.
  *
  * Repr caveat at extreme scale: the e4 fixed-point repr of a double and
  * the exactness of `floor(x·10⁴)` hold while |x|·10⁴ < 2⁵³; beyond that
  * use kind "int" on a pre-truncated column.
  *
  * @param cols (name, kind) with kind ∈ int | num (double) | ts | str
  */
object Profile {

  def reprNum(c: String, kind: String): Column = kind match {
    case "int" => col(c).cast("long")
    case "num" => floor(col(c) * 10000).cast("long")
    case "ts"  => unix_micros(col(c))
    case _     => lit(null).cast("long")
  }

  private def hashOf(c: String, kind: String): Column = kind match {
    case "str" => md5(col(c).cast("binary"))
    case _     => md5(reprNum(c, kind).cast("string").cast("binary"))
  }

  def profile(df: DataFrame, cols: Seq[(String, String)], k: Int = 64): DataFrame = {
    val kmv = Kmv.kmv_distinct(k)
    val aggs: Seq[Column] = cols.flatMap { case (c, kind) =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        kmv(hashOf(c, kind)).as(s"${c}__kmv"),
        min(reprNum(c, kind)).as(s"${c}__minn"),
        max(reprNum(c, kind)).as(s"${c}__maxn"),
        min(if (kind == "str") col(c).cast("string")
            else lit(null).cast("string")).as(s"${c}__mins"),
        max(if (kind == "str") col(c).cast("string")
            else lit(null).cast("string")).as(s"${c}__maxs"))
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { case (c, kind) =>
      struct(
        lit(c).as("column"), lit(kind).as("kind"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__kmv").getField("est_distinct").as("n_distinct_est"),
        col(s"${c}__minn").as("min_num"), col(s"${c}__maxn").as("max_num"),
        col(s"${c}__mins").as("min_str"), col(s"${c}__maxs").as("max_str"))
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
