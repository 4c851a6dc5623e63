package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data mixing: turn per-domain token-budget shares into a sampled
  * corpus (the domain-reweighting step every LLM data pipeline runs before
  * training — Pile/Dolma-style "X% web, Y% books" recipes).
  *
  * Scale shape: one map-side-combined aggregation for per-domain token mass
  * (|domains| rows), a broadcast join of the resulting rates, and a
  * stateless per-row hash filter — no shuffle of the corpus itself, so the
  * plan is a single scan at 100 TB.
  */
object Mixing {

  /** Knuth multiplicative hash constant (⌊2³²/φ⌋) — the sampling coin is
    * `(id · K) mod 10⁶ < rate · 10⁶`, deterministic and exactly mirrorable
    * in ANSI SQL (pure BIGINT arithmetic, no engine-specific hash).
    */
  private val K = 2654435761L
  private val M = 1000000L

  /** Sample `df` so each domain contributes ≈ `share × budgetTokens` tokens.
    *
    * Per-domain keep-rate = min(1, share·budget / domainTokens); domains
    * absent from `shares` are excluded (share 0). Token count is whitespace
    * tokenization, consistent with the rest of the text family. A domain
    * whose share asks for more tokens than it has saturates at rate 1 —
    * callers wanting oversampling with replacement should replicate
    * upstream instead.
    */
  def domainMix(df: DataFrame, idCol: String, textCol: String,
                domainCol: String, shares: Map[String, Double],
                budgetTokens: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol).as("doc_id"), col(domainCol).as("domain"),
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("tok_cnt"))
    val totals = toks.groupBy("domain").agg(sum("tok_cnt").as("domain_tokens"))
    val rates = totals
      .join(shares.toSeq.toDF("domain", "share"), "domain") // inner: unlisted domains drop out
      .select(col("domain"), least(lit(1.0),
        col("share") * lit(budgetTokens.toDouble) / col("domain_tokens").cast("double"))
        .as("rate"))
    // reduce doc_id mod M BEFORE the multiply: (id·K) mod M ≡ ((id mod M)·K)
    // mod M, but the left form overflows Long (ANSI error) for 64-bit hashed
    // ids ≥ ~3.5e9 — the reduced form is overflow-free for any Long id
    toks.join(broadcast(rates), "domain")
      .filter(pmod(pmod(col("doc_id"), lit(M)) * K, lit(M)) < col("rate") * lit(M.toDouble))
      .select(col("doc_id"), col("domain"), col("tok_cnt"))
  }
}
