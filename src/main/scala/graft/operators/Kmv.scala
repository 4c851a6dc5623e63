package graft.operators

import org.apache.spark.sql.Column

/** KMV ("k minimum values" / bottom-k theta) distinct-count sketch.
  *
  * `countDistinct` keeps EVERY distinct value in the aggregation state and
  * shuffles all of them; at 100 TB that state is the job. KMV keeps only the
  * k smallest distinct hash values per group — O(k) state that flows through
  * normal partial aggregation (map-side combine trims to k before the
  * shuffle) and merges by unioning two sorted lists and re-trimming. The
  * estimator is the classic (k−1)/θ with θ = the k-th smallest hash mapped
  * to (0,1]: standard error ≈ 1/√(k−2) (Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations", SIGMOD'07).
  *
  * Everything is DETERMINISTIC — unlike HLL there is no implementation-
  * defined register layout — so the whole sketch, including the estimate,
  * is mirrored exactly by a DuckDB SQL oracle:
  *  - values are hashed with md5 (identical lowercase hex in both engines);
  *    fixed-width hex compares lexicographically = numerically
  *  - θ uses only the first 13 hex chars (52 bits): the integer fits a
  *    double EXACTLY in both engines, so frac = v / 16^13 and
  *    est = floor((k−1)/frac) are single identical IEEE operations —
  *    no round-half divergence, no summation-order divergence
  */
object Kmv {

  /** The result struct [[kmv_distinct]] returns (as a typed view for
    * callers that `.as[KmvResult]` the struct column):
    * @param n_tracked    min(k, true distinct count) — exact when < k
    * @param kth_hash     the k-th smallest md5 (null while n_tracked < k)
    * @param est_distinct floor((k−1)/θ) once full; exact count before that
    */
  case class KmvResult(n_tracked: Long, kth_hash: String, est_distinct: Long)

  private val Denom = 4503599627370496.0 // 16^13 = 2^52

  /** Estimate from the k-th smallest hash — shared by the aggregator and
    * [[graft.Queries]]' oracle construction (the SQL mirrors this exactly).
    */
  def estimate(k: Int, kthHash: String): Long = {
    val v = java.lang.Long.parseLong(kthHash.substring(0, 13), 16) max 1L
    math.floor((k - 1).toDouble / (v.toDouble / Denom)).toLong
  }

  /** Column aggregate: `kmv_distinct(k)(md5HexCol)` →
    * struct<n_tracked, kth_hash, est_distinct>.
    *
    * Since r9 this is the native `sql.graft.KmvDistinct`
    * TypedImperativeAggregate (two primitive long arrays as the buffer —
    * unsigned (hi, lo) order over the md5's 128 bits IS the hex strings'
    * lexicographic order) instead of the original `Aggregator` over
    * `Seq[String]`, whose per-row encoder round-trips dominated the b48
    * profile probe (~4 µs/row/column). Output schema, ordering, k-th hash
    * rendering, and the top-52-bit estimate are bit-identical — every KMV
    * oracle (b23/b35/b48/g11) hash-checks unchanged, and KmvSpec pins the
    * sketch laws against the new implementation. Input is either 32-char
    * hex (an md5 — enforced loudly, the c19/b42 guard discipline) or,
    * since r10, a LongType 64-bit hash — the PRODUCTION configuration
    * (`kmv_distinct(k)(xxhash64(x))`): no per-row hex materialization or
    * parse, same estimator (uniform 64-bit hash ⇒ the same top-52-bit θ).
    * md5 exists so the DuckDB oracle can replay the permutation; xxhash64
    * is what a 100 TB run should feed (b51/b52 + KmvSpec certify it; the
    * b48-shape probe measures the md5→xxhash64 per-row delta, SURVEY §6).
    *
    * Since r11 the input type is STRICT at analysis time: exactly a
    * string or a bigint — an int/double/decimal child (e.g. Spark's
    * 32-bit `hash()`) fails the analyzer, not a job hours in. The one
    * hazard no type system catches: the LongType form MUST be a uniform
    * 64-bit hash — `kmv_distinct(k)(col("user_id"))` over raw sequential
    * ids makes the k-th "hash" tiny and the estimate wildly inflated,
    * with no error. Always wrap in `xxhash64`.
    */
  def kmv_distinct(k: Int): Column => Column = {
    import org.apache.spark.sql.graft.{Bridge, KmvDistinct}
    (hash: Column) =>
      Bridge.column(KmvDistinct(Bridge.expression(hash), k).toAggregateExpression())
  }

  /** Column aggregate: `hash_sample(k)(md5HexCol, payloadCol)` →
    * array<struct<h, payload>> ascending by hash.
    *
    * Bottom-k-by-hash uniform sample: the k entries with the smallest
    * hashes ARE a uniform random sample of the distinct values (the hash is
    * the random permutation), chosen deterministically — every re-run, every
    * partitioning, every engine picks the SAME sample. The per-group state
    * is k entries flowing through partial aggregation, so sampling 100 TB
    * costs one scan + a k-row-per-group shuffle; repeated values collapse
    * (same value ⇒ same hash), and a hash colliding with DIFFERENT payloads
    * keeps the minimum — merge-order-invariant. This is the per-group
    * reservoir a training pipeline wants for eyeballing/debug splits, and
    * the complement of the rate-based domain-mix sampler (e10): exact-k per
    * group vs global rates. Since r9: the native `sql.graft.HashSample`
    * (packed-long buffer, the [[kmv_distinct]] treatment) — null hash or
    * payload rows skip; non-md5 hashes fail loudly. Since r10 a LongType
    * hash column is the production xxhash64 path, as for [[kmv_distinct]].
    */
  def hash_sample(k: Int): (Column, Column) => Column = {
    import org.apache.spark.sql.graft.{Bridge, HashSample}
    (hash: Column, payload: Column) =>
      Bridge.column(
        HashSample(Bridge.expression(hash), Bridge.expression(payload), k)
          .toAggregateExpression())
  }
}
