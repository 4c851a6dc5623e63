package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window document chunking with overlap — the split step before
  * tokenize-and-pack in an LLM training pipeline (long documents become
  * training-window-sized pieces; the overlap preserves context across the
  * cut).
  *
  * Pure narrow ops: `sequence` builds the per-doc offset array, `posexplode`
  * fans out, `substring` slices — no shuffle at all, the chunk stream keeps
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
}
