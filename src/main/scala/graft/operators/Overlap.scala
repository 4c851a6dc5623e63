package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.{word_shingles, TextHash}

/** Corpus-level overlap analytics (SURVEY.md §2 c15): how much do two data
  * SOURCES (crawls, feeds, dumps) share — the dataset-composition question a
  * training-data curator asks before mixing ("is this new crawl 80% of what
  * we already have?"), answered at the source level rather than c02's
  * document level.
  *
  * Two paths, same semantics:
  *  - [[sourceOverlap]] — EXACT pairwise Jaccard/containment over distinct
  *    word-k-gram sets. Gram inventory is one distinct shuffle; the pair
  *    intersection is a gram equi-join whose per-gram blowup is bounded by
  *    |sources|² (sources are feeds — tens, not millions), so the join is
  *    linear in the gram inventory.
  *  - [[sourceSignatures]] — the 100 TB path: one 128-bin MinHash-union
  *    sketch per source via a mergeable [[MinhashUnion]] aggregate (raw OPH
  *    bin minima merge bin-wise through normal partial aggregation; densify
  *    only at eval), pairwise estimated Jaccard on |sources|² rows of
  *    driver-scale data. Estimate accuracy and the union law are
  *    spec-proven in OverlapSpec.
  */
object Overlap {

  /** Exact pairwise source overlap: distinct word-k-gram sets per source,
    * all source pairs (src_a < src_b) with sizes, intersection, Jaccard and
    * containment (share of the smaller source's grams also in the larger).
    * Sources whose documents produce no grams (token-less) are absent, as
    * is a 0/0 Jaccard. Zero-intersection pairs ARE emitted (the "these
    * feeds are disjoint" answer matters as much as the overlap).
    */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    // DELIBERATELY NOT persisted: the four consumers' heavy subtrees (the
    // self-join sides, the size aliases) canonicalize to the same Exchange,
    // so ReuseExchange already runs the explode+distinct once per exchange
    // shape — caching the gram frame instead was MEASURED 3.7× slower at
    // the 100× text probe (cache write + four decompressed reads of a
    // 35M-row frame vs free plan-level reuse). Contrast TextLm.lmScore,
    // whose consumers have non-identical exchanges and need the persist.
    val grams = docs.select(col(srcCol).as("src"),
        explode(word_shingles(col(textCol), k)).as("gram"))
      .distinct()
    val sizes = grams.groupBy("src").agg(count(lit(1)).as("sz"))
    val inter = grams.select(col("src").as("src_a"), col("gram"))
      .join(grams.select(col("src").as("src_b"), col("gram")), "gram")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
    val interD = col("inter").cast("double")
    val out = sizes.select(col("src").as("src_a"), col("sz").as("grams_a"))
      .crossJoin(sizes.select(col("src").as("src_b"), col("sz").as("grams_b")))
      .filter(col("src_a") < col("src_b")) // |sources|² rows — tiny
      .join(inter, Seq("src_a", "src_b"), "left")
      .na.fill(0L, Seq("inter"))
      .select(col("src_a"), col("src_b"), col("grams_a"), col("grams_b"),
        col("inter"),
        round(interD / (col("grams_a") + col("grams_b") - col("inter")), 4)
          .as("jaccard"),
        round(interD / least(col("grams_a"), col("grams_b")), 4)
          .as("containment"))
    out
  }

  /** Raw OPH bin state: unsigned bin minima + which bins have seen a value.
    * Kept PRE-densification so it merges exactly — rotation densification
    * borrows values across bins, so densified signatures do NOT obey the
    * elementwise-min union law (a borrowed value from one shard would
    * pollute the true bin min of another). Densify once, at eval.
    */
  case class OphState(mins: Array[Long], filled: Array[Boolean])

  /** Mergeable MinHash-union sketch over shingle-hash arrays: O(n) state per
    * group through normal partial aggregation (the DataSketches-union shape
    * — map-side combine reduces each partition to one n-bin state before the
    * shuffle), bin-wise unsigned-min merge, rotation densification at
    * finish. Routing/densification shared with `TextHash.minhashSig`, so the
    * union signature of one document equals that document's own signature.
    */
  class MinhashUnion(n: Int) extends Aggregator[Seq[Long], OphState, Seq[Long]] {
    def zero: OphState = OphState(new Array[Long](n), new Array[Boolean](n))
    def reduce(b: OphState, sh: Seq[Long]): OphState = {
      val it = sh.iterator
      while (it.hasNext) TextHash.ophUpdate(it.next(), b.mins, b.filled)
      b
    }
    def merge(a: OphState, c: OphState): OphState = {
      var i = 0
      while (i < n) {
        if (c.filled(i) && (!a.filled(i) ||
            java.lang.Long.compareUnsigned(c.mins(i), a.mins(i)) < 0)) {
          a.mins(i) = c.mins(i); a.filled(i) = true
        }
        i += 1
      }
      a
    }
    def finish(b: OphState): Seq[Long] = {
      val sig = b.mins.clone()
      TextHash.densifyInPlace(sig, b.filled.clone())
      sig.toSeq
    }
    def bufferEncoder: Encoder[OphState] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** One MinHash-union signature per source, via [[MinhashUnion]]. Sources
    * whose documents produce no shingles are absent (matching
    * [[sourceOverlap]]). Output: (src, sig array<long> of n).
    */
  def sourceSignatures(docs: DataFrame, srcCol: String, textCol: String,
                       k: Int = 3, n: Int = 128): DataFrame =
    docs.select(col(srcCol).as("src"), word_shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .groupBy("src")
      .agg(udaf(new MinhashUnion(n)).apply(col("sh")).as("sig"))

  /** Pairwise estimated Jaccard from [[sourceSignatures]] output: the
    * fraction of agreeing signature components, all source pairs.
    */
  def estimatedOverlap(sigs: DataFrame): DataFrame =
    sigs.select(col("src").as("src_a"), col("sig").as("sig_a"))
      .crossJoin(sigs.select(col("src").as("src_b"), col("sig").as("sig_b")))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b),
          x => x)).cast("double") / size(col("sig_a"))).as("est_jaccard"))
}
