package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE (byte-pair-encoding) vocabulary learning (SURVEY.md §2
  * e19) — the tokenizer-training workload of a training-data pipeline
  * (Sennrich et al. 2016; what SentencePiece / HF `tokenizers` run over a
  * corpus before any model sees it).
  *
  * The scale insight: after ONE corpus-sized aggregation (word → frequency),
  * learning never touches the corpus again — every merge round runs over the
  * word-frequency table, which is vocabulary-sized (Zipf: ~10⁵–10⁷ rows at
  * 100 TB, shrinking as merges fuse symbols), not corpus-sized. Each round
  * is: adjacent-pair counts (explode + map-side-combined sum over the vocab
  * table) → one argmax row to the driver (the merge DECISION — a bounded
  * scalar per round, the same discipline as a corpus `count()`) → a fold
  * expression rewriting each word's symbol array. The working table is
  * persisted per round and the previous round released, so lineage and plan
  * size stay O(1) across rounds.
  *
  * Matches the reference sequential algorithm exactly (greedy left-to-right
  * merge application, count-then-lexicographic tie-break) — proven in
  * BpeSpec against an independent in-memory implementation.
  */
object Bpe {

  /** End-of-word sentinel (Sennrich-style): lets a learned symbol distinguish
    * "low" as a word from "low" as a prefix of "lower".
    */
  val Eow = "</w>"

  /** One learned merge: rank is 1-based learning order. */
  case class Merge(rank: Int, left: String, right: String, merged: String,
                   freq: Long)

  /** Word-frequency table with initial symbolization: (word, freq,
    * symbols = chars + [[Eow]]). The ONLY corpus-sized pass in learning.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("symbols",
        // Spark split keeps a trailing "" (limit -1 semantics) — strip it;
        // real chars are never empty so array_remove is safe
        concat(array_remove(split(col("word"), "(?!^)"), ""), array(lit(Eow))))

  /** Adjacent-pair frequencies over a symbolized word-freq table: each
    * word's (symbols[i], symbols[i+1]) pairs weighted by word frequency.
    * NOTE: counts every occurrence, including overlaps ("aaa" counts (a,a)
    * twice) — same convention as the classic implementation's counting
    * phase; application is then greedy left-to-right.
    */
  def pairCounts(wf: DataFrame): DataFrame =
    wf.select(col("freq"), explode(zip_with(
        slice(col("symbols"), lit(1), size(col("symbols")) - 1),
        slice(col("symbols"), lit(2), size(col("symbols")) - 1),
        (a, b) => struct(a.as("left"), b.as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum("freq").as("freq"))

  /** Rewrite every symbol array, fusing adjacent (left, right) → merged,
    * greedily left to right (a fold — after "aa" is built from "aaa"'s first
    * two symbols, the third "a" starts fresh, exactly like the reference).
    */
  private def applyMerge(wf: DataFrame, left: String, right: String): DataFrame =
    wf.withColumn("symbols",
      aggregate(col("symbols"), array().cast("array<string>"), (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
          .otherwise(concat(acc, array(x)))))

  /** Learn up to `nMerges` merges; stops early when the best pair's
    * frequency drops below `minFreq`. Returns the merge table in learning
    * order — vocabulary = initial chars + one entry per merge.
    */
  def learn(spark: SparkSession, docs: DataFrame, textCol: String,
            nMerges: Int, minFreq: Long = 2L): Seq[Merge] = {
    var wf = wordFreq(docs, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    wf.count()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      // deterministic decision: count desc, then lexicographic — total order
      val best = pairCounts(wf)
        .orderBy(col("freq").desc, col("left"), col("right"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getAs[Long]("freq") < minFreq) done = true
      else {
        val (l, r, f) = (best.head.getAs[String]("left"),
          best.head.getAs[String]("right"), best.head.getAs[Long]("freq"))
        merges += Merge(rank, l, r, l + r, f)
        val step = applyMerge(wf, l, r)
        // TRUNCATE the SQL-plan lineage each round (rebuild from the RDD —
        // a flat LogicalRDD): chaining rounds directly nests every previous
        // round's InMemoryRelation inside the next plan, and AQE posts a
        // full explainString per plan update, so by round ~20 the driver
        // spends minutes (and OOMs 8 GB) BUILDING PLAN STRINGS for a
        // KB-sized table. RDD lineage is preserved, so a lost cached block
        // still recomputes (unlike localCheckpoint, which would strand the
        // job on executor loss).
        val next = spark.createDataFrame(step.rdd, step.schema)
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize so the old round can release
        wf.unpersist(blocking = false)
        wf = next
        rank += 1
      }
    }
    wf.unpersist(blocking = false)
    merges.result()
  }

  /** Learned merges as a DataFrame (the e19 registered-query surface). */
  def learnMerges(spark: SparkSession, docs: DataFrame, textCol: String,
                  nMerges: Int, minFreq: Long = 2L): DataFrame = {
    import spark.implicits._
    learn(spark, docs, textCol, nMerges, minFreq).toDF()
      .select(col("rank"), col("left"), col("right"), col("merged"),
        col("freq"))
  }

  /** Corpus-wide tokenization with a learned merge list: the merges are a
    * model artifact (KBs), broadcast once, and each word is encoded
    * executor-side with [[encodeWord]] via `mapPartitions` — the production
    * tokenizer shape (HF tokenizers ship the merges file to every worker;
    * iterative symbol merging is genuinely imperative, the same
    * justification as the media decoders' seam). Output: (idCol, n_words,
    * n_tokens, fertility = tokens/word rounded 4 dp).
    */
  def encodeCorpus(spark: SparkSession, docs: DataFrame, textCol: String,
                   idCol: String, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        it.map { case (id, text) =>
          val words = text.trim.split("\\s+").filter(_.nonEmpty)
          val nTokens = words.map(w => encodeWord(w, ms).length).sum
          (id, words.length.toLong, nTokens.toLong,
            // HALF_UP at 4 dp (floor(x·10⁴ + 0.5) — fertility is never
            // negative), matching Spark's `round` and the DuckDB oracle;
            // rint's half-even loses exact .5 ties (n_words a power of two)
            if (words.isEmpty) 0.0
            else math.floor(nTokens.toDouble / words.length * 10000 + 0.5) / 10000)
        }
      }
      .toDF(idCol, "n_words", "n_tokens", "fertility")
  }

  /** Encode one word with a learned merge list — the tokenizer's hot path,
    * as a plain static function (shared by specs and any per-partition
    * encoder). Applies merges in rank order, each greedily left to right.
    */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] = {
    // symbolize at CODE POINTS, matching wordFreq's split(word, "(?!^)") —
    // splitting at UTF-16 code units would shear non-BMP characters (emoji,
    // supplementary CJK) into lone surrogates that can never match merges
    // learned from code-point symbols
    var syms: Seq[String] =
      word.codePoints().toArray.toSeq.map(Character.toString) :+ Eow
    merges.foreach { m =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (out.nonEmpty && out.last == m.left && x == m.right) {
          out(out.length - 1) = m.merged
        } else out += x
      }
      syms = out.toSeq
    }
    syms
  }
}
