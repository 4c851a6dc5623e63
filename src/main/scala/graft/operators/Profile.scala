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

  /** Per-column KMV input hash. `hashKind`:
    *  - "md5" (default): 32-hex strings — what the ORACLE can replay in
    *    SQL, so every registered profile row (b48/b49/g11/g12) uses it.
    *  - "xx": xxhash64 LONGS straight into the sketch's long-input path —
    *    the PRODUCTION configuration (no per-row hex materialization or
    *    parse; b48's probe showed md5 as the dominant per-row cost).
    *    Same null semantics: null input rows are skipped by the sketch
    *    either way, so we hash the value only (xxhash64 of a null column
    *    would fold the seed in, not null out — hence the explicit
    *    null-preserving `when`).
    */
  private def hashOf(c: String, kind: String, hashKind: String): Column = {
    val v: Column = if (kind == "str") col(c) else reprNum(c, kind)
    hashKind match {
      case "md5" => md5(v.cast("string").cast("binary"))
      case "xx"  => when(v.isNotNull, xxhash64(v))
      case other => throw new IllegalArgumentException(s"hashKind $other")
    }
  }

  private def aggExprs(cols: Seq[(String, String)], k: Int,
                       hashKind: String): Seq[Column] = {
    val kmv = Kmv.kmv_distinct(k)
    cols.flatMap { case (c, kind) =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        kmv(hashOf(c, kind, hashKind)).as(s"${c}__kmv"),
        min(reprNum(c, kind)).as(s"${c}__minn"),
        max(reprNum(c, kind)).as(s"${c}__maxn"),
        min(if (kind == "str") col(c).cast("string")
            else lit(null).cast("string")).as(s"${c}__mins"),
        max(if (kind == "str") col(c).cast("string")
            else lit(null).cast("string")).as(s"${c}__maxs"))
    } :+ count(lit(1)).as("__n")
  }

  private def entryStructs(cols: Seq[(String, String)]): Seq[Column] =
    cols.map { case (c, kind) =>
      struct(
        lit(c).as("column"), lit(kind).as("kind"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__kmv").getField("est_distinct").as("n_distinct_est"),
        col(s"${c}__minn").as("min_num"), col(s"${c}__maxn").as("max_num"),
        col(s"${c}__mins").as("min_str"), col(s"${c}__maxs").as("max_str"))
    }

  private val fields = Seq("column", "kind", "n_rows", "n_nulls",
    "n_distinct_est", "min_num", "max_num", "min_str", "max_str")

  def profile(df: DataFrame, cols: Seq[(String, String)], k: Int = 64,
              hashKind: String = "md5"): DataFrame = {
    val aggs = aggExprs(cols, k, hashKind)
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entryStructs(cols): _*)).as("p")).select("p.*")
  }

  /** The CONTINUOUS form of [[profile]] — one profile row set per event
    * hour, the same aggregates under a time-window GROUP BY. Legal as a
    * Structured Streaming aggregation (count/min/max and the KMV udaf are
    * all partial-aggregating; append mode emits each hour's profile once
    * its window closes under the watermark), and identical on a batch
    * frame — ONE function, both postures, so stream==batch parity is a
    * spec (StreamingSpec) and the batch twin is the oracle-gated query
    * (g11). This plus [[drift]] is the ingest-monitoring loop: profile
    * each arriving hour, drift it against yesterday's profile.
    */
  def hourlyProfile(df: DataFrame, tsCol: String, cols: Seq[(String, String)],
                    k: Int = 64, watermark: String = "2 hours",
                    hashKind: String = "md5"): DataFrame = {
    val src = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    val aggs = aggExprs(cols, k, hashKind)
    src.groupBy(window(col(tsCol), "1 hour"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window").getField("start").as("hr") +:
        explode(array(entryStructs(cols): _*)).as("p") +: Nil: _*)
      .select(col("hr") +: fields.map(f => col(s"p.$f")): _*)
  }

  /** Snapshot-over-snapshot drift report — what a pipeline actually DOES
    * with profiles: today's ingest profiled against yesterday's, one row
    * per column, integer/boolean metrics only so the report is as
    * hash-exact as the profiles it joins:
    *
    *  - `null_rate_delta_e6` — change in parts-per-million null rate
    *    (floor'd per side, then differenced: exact integers).
    *  - `distinct_ratio_e6`  — cur/prev distinct estimate in ppm (a
    *    collapse to few values or an id-space explosion both move this).
    *  - `range_widened`      — cur min/max escaped prev's envelope, on
    *    the canonical repr (num) or the string order (str): new ids,
    *    future timestamps, out-of-range totals.
    *
    * Both inputs are [[profile]] outputs (6-row-ish frames): the join is
    * broadcast-trivial; at scale the cost is the two single-scan profiles.
    */
  def drift(cur: DataFrame, prev: DataFrame): DataFrame =
    driftAgainst(cur, prev, Nil, "prev")

  /** [[drift]] generalized to a KEYED current side — the continuous
    * monitoring shape: each of `cur`'s key groups (an event hour from
    * [[hourlyProfile]], a source, a shard) drifts independently against
    * ONE baseline profile. The baseline is broadcast (|columns| rows), the
    * join is on the column axis only, and everything downstream of the
    * profile aggregates is a stateless projection — so the composition
    * stays legal in Structured Streaming (g12; parity in StreamingSpec):
    * profile each closed hour, drift it against yesterday's baseline,
    * alert on `range_widened` / ppm spikes.
    */
  def driftAgainst(cur: DataFrame, baseline: DataFrame,
                   keys: Seq[String], baseName: String = "base"): DataFrame = {
    val c = cur.as("c")
    val p = baseline.as("p")
    // Loud-failure discipline (the b42/c19 pattern) on the ppm arithmetic:
    //  - a zero-row profile (empty baseline table, empty keyed group) would
    //    silently null every ppm metric — the WRONG failure mode for an
    //    alerting path, and a divergence from the DuckDB mirror, whose
    //    integer division by zero errors natively;
    //  - `n_nulls * 1000000` wraps silently as a Long above ~9.2e12 rows
    //    while the mirror's BIGINT multiply errors — the 100 TB regime this
    //    module targets. Both now raise in BOTH engines instead.
    val MaxE6Input = Long.MaxValue / 1000000L
    def e6Guarded(num: Column, denom: Column, what: String): Column =
      when(denom === 0L, raise_error(format_string(
        s"driftAgainst: zero-row profile for column %s ($what)", col("c.column")))
        .cast("long"))
        .when(num > MaxE6Input, raise_error(format_string(
          s"driftAgainst: $what %d overflows the ppm multiply (max ${MaxE6Input})",
          num)).cast("long"))
        .otherwise(floor(num * 1000000L / denom).cast("long"))
    def rate(side: String): Column =
      e6Guarded(col(s"$side.n_nulls"), col(s"$side.n_rows"), "null rate")
    // A cur column MISSING from the baseline would silently vanish through
    // an inner join — a monitoring report that drops the drifted column is
    // worse than one that fails. Left join + loud guard instead, folded
    // into EVERY baseline-derived metric (not just n_rows_<base>): a
    // caller projecting a subset of this report would otherwise let
    // Catalyst prune the one guarded column away and flow a
    // plausible-looking null/false through the alerting path (r10 ADVICE).
    def baseGuarded(value: Column, castTo: String): Column =
      when(col("p.column").isNull,
        raise_error(format_string(
          "driftAgainst: baseline has no profile row for column %s",
          col("c.column"))).cast(castTo))
        .otherwise(value)
    c.join(broadcast(p), col("c.column") === col("p.column"), "left_outer")
      .select(keys.map(k => col(s"c.$k").as(k)) ++ Seq(
        col("c.column").as("column"), col("c.kind").as("kind"),
        col("c.n_rows").as("n_rows_cur"),
        baseGuarded(col("p.n_rows"), "long").as(s"n_rows_$baseName"),
        (rate("c") - baseGuarded(rate("p"), "long")).as("null_rate_delta_e6"),
        e6Guarded(col("c.n_distinct_est"),
          baseGuarded(greatest(col("p.n_distinct_est"), lit(1L)), "long"),
          "distinct estimate")
          .as("distinct_ratio_e6"),
        baseGuarded(
          coalesce(col("c.min_num") < col("p.min_num"), lit(false)) ||
          coalesce(col("c.max_num") > col("p.max_num"), lit(false)) ||
          coalesce(col("c.min_str") < col("p.min_str"), lit(false)) ||
          coalesce(col("c.max_str") > col("p.max_str"), lit(false)), "boolean")
          .as("range_widened")): _*)
  }
}
