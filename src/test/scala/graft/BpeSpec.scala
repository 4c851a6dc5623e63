package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** The distributed BPE learner (e19) against an INDEPENDENT sequential
  * reference implementation — same algorithm, zero shared code with the
  * DataFrame path — plus hand-computable known answers.
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  /** Reference learner: plain in-memory BPE over a word-frequency map.
    * Counts every adjacent occurrence (incl. overlaps), applies merges
    * greedily left to right, ties broken (freq desc, left, right).
    */
  private def referenceLearn(words: Seq[String], nMerges: Int,
                             minFreq: Long): Seq[(String, String, Long)] = {
    var wf: Map[Seq[String], Long] =
      words.groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString) :+ Bpe.Eow, ws.size.toLong)
      }
    val out = Seq.newBuilder[(String, String, Long)]
    var continue = true
    var k = 0
    while (k < nMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      wf.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (f < minFreq) continue = false
        else {
          out += ((l, r, f))
          wf = wf.groupMapReduce { case (syms, _) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { x =>
              if (acc.nonEmpty && acc.last == l && x == r)
                acc(acc.length - 1) = l + r
              else acc += x
            }
            acc.toSeq
          }(_._2)(_ + _)
          k += 1
        }
      }
    }
    out.result()
  }

  test("distributed learner matches the sequential reference on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val words = docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).collect().map(_.getString(0)).toSeq
    val expected = referenceLearn(words, 12, 2L)
    val got = Bpe.learn(spark, docs, "text", 12)
      .map(m => (m.left, m.right, m.freq))
    assert(got == expected)
  }

  test("hand-computed known answer and early stop") {
    import spark.implicits._
    // "ab ab ab cd" → pairs: (a,b):3 (b,</w>):3 (c,d):1 (d,</w>):1 tie on 3
    // broken lexicographically: (a,b) < (b,</w>) on left. Then "ab</w>"
    // dominates. minFreq=2 stops before any count-1 pair.
    val docs = Seq("ab ab ab cd").toDF("text")
    val merges = Bpe.learn(spark, docs, "text", 10, minFreq = 2L)
    assert(merges.map(m => (m.left, m.right, m.freq)) ==
      Seq(("a", "b", 3L), ("ab", Bpe.Eow, 3L)))
  }

  test("corpus-wide encoding matches per-word reference counts") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.learn(spark, docs, "text", 8)
    val got = Bpe.encodeCorpus(spark, docs, "text", "doc_id", merges)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"))).toMap
    // independent per-doc recount through the single-word encoder
    docs.select("doc_id", "text").collect().take(50).foreach { r =>
      val words = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
      val want = (words.length.toLong,
        words.map(w => Bpe.encodeWord(w, merges).length).sum.toLong)
      assert(got(r.getLong(0)) == want, s"doc ${r.getLong(0)}")
    }
    // merges compress: fertility must drop below the no-merge chars+1 bound
    val fert = Bpe.encodeCorpus(spark, docs, "text", "doc_id", merges)
      .agg(avg("fertility")).head().getDouble(0)
    val fert0 = Bpe.encodeCorpus(spark, docs, "text", "doc_id", Nil)
      .agg(avg("fertility")).head().getDouble(0)
    assert(fert < fert0, s"learned merges must compress: $fert vs $fert0")
  }

  test("encodeWord agrees with the learned symbolization and is stable") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.learn(spark, docs, "text", 12)
    // encoding any corpus word with the merge list reproduces what the
    // distributed fold produced: re-derive via wordFreq + the same merges
    val sample = docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct().limit(30)
      .collect().map(_.getString(0))
    val vocab = (sample.flatMap(_.map(_.toString)).toSet + Bpe.Eow) ++
      merges.map(_.merged)
    sample.foreach { w =>
      val enc = Bpe.encodeWord(w, merges)
      // lossless: concatenating the tokens reproduces the word + sentinel
      assert(enc.mkString("") == w + Bpe.Eow, s"lossless: $w -> $enc")
      // closed: every emitted token is a base char or a learned merge
      assert(enc.forall(vocab.contains), s"unknown token in $enc")
    }
  }
}
