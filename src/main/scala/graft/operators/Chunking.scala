package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window document chunking with overlap — the split step before
  * tokenize-and-pack in an LLM training pipeline (long documents become
  * training-window-sized pieces; the overlap preserves context across the
  * cut).
  *
  * Pure narrow ops: `sequence` builds the per-doc offset array, `explode`
  * fans out (chunk ids derive from the offset, not a position — stable under
  * any partitioning), `substring` slices — no shuffle at all, the chunk stream keeps
  * the input's partitioning. Chunk ids are (doc_id, chunk_id) with
  * chunk_id = offset / stride, so re-runs and different partitionings assign
  * identical ids (checkpoint/restart-safe at 100 TB).
  *
  * Offsets are CHARACTER-based on both engines (Spark `substring` and
  * DuckDB `substr` are char-semantic), so the oracle mirrors exactly.
  * Empty documents are excluded — they have no window to emit.
  */
object Chunking {

  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkChars: Int = 200, overlapChars: Int = 50): DataFrame = {
    require(overlapChars >= 0 && overlapChars < chunkChars,
      s"need 0 <= overlap < chunkChars, got overlap=$overlapChars chunk=$chunkChars")
    val stride = chunkChars - overlapChars
    // last admissible offset: o ≤ len − overlap − 1 — an offset past that
    // yields a window whose every character the previous chunk already
    // covers (pure-overlap tail), which would duplicate training text
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol).as("t"),
        explode(sequence(lit(0),
          greatest(length(col(textCol)) - (overlapChars + 1), lit(0)),
          lit(stride))).as("off"))
      .select(col(idCol), (col("off") / stride).cast("int").as("chunk_id"),
        col("off").cast("int").as("chunk_off"),
        // SQL form: the DataFrame substring() only takes literal positions
        expr(s"substring(t, off + 1, $chunkChars)").as("chunk_text"))
      .withColumn("chunk_chars", length(col("chunk_text")))
  }

  /** Concat-and-slice sequence packing (the GPT-style pack step after
    * tokenize): documents are laid end to end in `idCol` order and the token
    * stream is sliced into `seqLen`-token training windows; each document
    * reports its global token offset and the window span it lands in.
    *
    * The global running sum is NOT a single-partition window (the classic
    * scale trap — `Window.orderBy` with no partition moves 100 TB to one
    * task). Two levels instead: documents bucket into contiguous groups of
    * `groupSize` ids; group token totals (|docs|/groupSize rows) take the
    * only unpartitioned window — at 25B docs / groupSize 4096 that is a 6M-row
    * frame of two longs, and a third level repeats the trick if even that
    * offends — then the per-document sum runs partitioned by group. The
    * group-offset join is left to AQE (tiny by construction → broadcast, but
    * un-hinted so a pathological groupSize cannot force an OOM broadcast).
    *
    * Output is independent of `groupSize` and of the input partitioning
    * (proven in ChunkingSpec) — so re-runs, repartitions, and retuned group
    * sizes assign byte-identical window ids, which is what makes the packing
    * checkpoint/restart-safe in a real pipeline.
    *
    * Token-less documents are excluded (they occupy no window).
    */
  def pack(df: DataFrame, idCol: String, tokCol: String,
           seqLen: Int = 512, groupSize: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen > 0 && groupSize > 0, "seqLen and groupSize must be positive")
    val toks = df
      .select(col(idCol).as("doc_id"), col(tokCol).cast("long").as("tok_count"))
      .filter(col("tok_count") > 0)
      // integer `div`, not double `/`: ids stay exact past 2^53
      .withColumn("grp", expr(s"doc_id div $groupSize"))
    val goff = toks.groupBy("grp").agg(sum("tok_count").as("gtok"))
      .withColumn("grp_off", coalesce(
        sum("gtok").over(Window.orderBy("grp")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("grp", "grp_off")
    val w = Window.partitionBy("grp").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(goff, "grp")
      .withColumn("start_off",
        col("grp_off") + coalesce(sum("tok_count").over(w), lit(0L)))
      .select(col("doc_id"), col("tok_count"), col("start_off"),
        expr(s"start_off div $seqLen").as("bin_first"),
        expr(s"(start_off + tok_count - 1) div $seqLen").as("bin_last"))
      .withColumn("bins_spanned",
        (col("bin_last") - col("bin_first") + 1).cast("int"))
  }
}
