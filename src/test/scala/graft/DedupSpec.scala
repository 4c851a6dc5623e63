package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Known-answer tests for the dedup family over the planted-duplicate corpus
  * (see Queries.corpus): doc_id%20==0 → exact copy at id+100000,
  * doc_id%20==10 → near copy with 3 extra tokens.
  */
class DedupSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = Tables.documents(spark, sfDir)

  private lazy val corpus: DataFrame = {
    val planted = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text",
        when(col("doc_id") % 20 === 10, concat(col("text"), lit(" graft dup marker")))
          .otherwise(col("text")))
    docs.unionByName(planted)
  }

  private lazy val exactIds: Set[Long] = docs
    .filter(col("doc_id") % 20 === 0).select("doc_id")
    .collect().map(_.getLong(0)).toSet

  private lazy val nearIds: Set[Long] = docs
    .filter(col("doc_id") % 20 === 10).select("doc_id")
    .collect().map(_.getLong(0)).toSet

  test("minhash LSH finds every planted exact dup at jaccard 1.0") {
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    exactIds.foreach { id =>
      val j = pairs.get((id, id + 100000))
      assert(j.contains(1.0), s"exact dup pair ($id, ${id + 100000}) missing or j!=1: $j")
    }
  }

  test("minhash LSH finds planted near dups above threshold") {
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val found = nearIds.count(id => pairs.contains((id, id + 100000)))
    // banding (32 bands × 4 rows) catches j≈0.9 with prob ≈ 1 - (1-0.9^4)^32
    assert(found >= (nearIds.size * 0.9).toInt,
      s"only $found/${nearIds.size} near dups found")
  }

  test("collect_capped: sorted array under cap, NULL past it (r21 band-join core)") {
    import spark.implicits._
    val rows = Seq.tabulate(30)(i => (i % 3L, (97L * i) % 1000)).toDF("g", "v")
    val out = rows.groupBy("g")
      .agg(graft.functions.collect_capped(col("v"), 10).as("ids"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    // each group has 10 values — exactly at the cap: kept, sorted ascending
    (0L to 2L).foreach { g =>
      val expected = (0 until 30).filter(_ % 3 == g).map(i => (97L * i) % 1000).sorted
      assert(out(g) == expected, s"group $g: ${out(g)} != $expected")
    }
    val over = rows.groupBy("g")
      .agg(graft.functions.collect_capped(col("v"), 9).as("ids"))
      .collect().map(r => r.isNullAt(1))
    assert(over.forall(identity), "cap 9 < group size 10 must evaluate to NULL")
  }

  test("band-join v2 (capped-collect) emits exactly the v1 self-join pair set") {
    def pairSet(): Set[(Long, Long, Double)] =
      Dedup.minhashPairs(corpus, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val v2 = pairSet()
    sys.props("graft.bandjoin") = "v1"
    val v1 = try pairSet() finally sys.props.remove("graft.bandjoin")
    assert(v2 == v1, s"v2 minus v1: ${v2 diff v1}; v1 minus v2: ${v1 diff v2}")
  }

  test("simhash finds planted exact dups at hamming 0") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    exactIds.foreach { id =>
      assert(pairs.get((id, id + 100000)).contains(0),
        s"simhash pair ($id, ${id + 100000}) missing or hamming!=0")
    }
  }

  test("ngram jaccard within source blocks finds planted pairs") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exactIds.foreach { id =>
      assert(pairs.contains((id, id + 100000)), s"block pair ($id, ${id + 100000}) missing")
    }
  }

  test("clean corpus drops every planted duplicate and keeps originals") {
    val cleaned = Dedup.cleanCorpus(corpus, "doc_id", "text")
    val ids = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    // every planted id (exact at +100000, near at +100000) must be gone:
    // exact copies lose to min-id, near copies are the higher id of a pair
    assert(!ids.exists(_ >= 100000L), s"planted ids survived: ${ids.filter(_ >= 100000L)}")
    // all sufficiently-long originals survive
    val originals = docs.filter(length(trim(col("text"))) > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(originals))
    assert(ids.size > originals.size / 2, "cleaning dropped too much")
  }

  test("weighted minhash finds every planted exact dup at weighted jaccard 1.0") {
    val pairs = Dedup.weightedMinhashPairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    exactIds.foreach { id =>
      val j = pairs.get((id, id + 100000))
      assert(j.contains(1.0), s"exact dup pair ($id, ${id + 100000}) missing or jw!=1: $j")
    }
  }

  test("idf weighting scores boilerplate-only overlap below unweighted jaccard") {
    import spark.implicits._
    // 20 docs all carry the same long boilerplate preamble; docs 0 and 1
    // share ONLY that boilerplate (their content differs), docs 2..19 give
    // the boilerplate shingles a high document frequency (low idf weight)
    val boiler = "all rights reserved contact the site operator for takedown requests here"
    val synth = (0 until 20).map { i =>
      val content = s"unique subject $i covers topic $i with detail $i and angle $i today"
      (i.toLong, s"$boiler $content")
    }.toDF("doc_id", "text")
    def pairJ(dfp: org.apache.spark.sql.DataFrame): Double =
      dfp.filter(col("id_a") === 0 && col("id_b") === 1)
        .collect().headOption.map(_.getDouble(2)).getOrElse(0.0)
    val unweighted = pairJ(
      Dedup.minhashPairs(synth, "doc_id", "text", threshold = 0.0))
    val weighted = pairJ(
      Dedup.weightedMinhashPairs(synth, "doc_id", "text", threshold = 0.0))
    info(f"boilerplate-only pair: unweighted=$unweighted%.3f weighted=$weighted%.3f")
    assert(unweighted > 0.3, "sanity: the pair does share substantial boilerplate")
    assert(weighted < unweighted * 0.75,
      "idf weighting must discount the shared high-df boilerplate shingles")
  }

  test("connected components resolves a chain to one cluster in log rounds") {
    import spark.implicits._
    // path graph 0-1-2-...-9 plus a separate pair (100,101): naive label
    // propagation needs diameter(=9) rounds; star contraction must still
    // land every node on the component min
    val pairs = ((0L until 9L).map(i => (i, i + 1)) ++ Seq((100L, 101L)))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 9L).foreach(i => assert(cc(i) == 0L, s"node $i rep=${cc(i)}"))
    assert(cc(100L) == 100L && cc(101L) == 100L)
    assert(cc.size == 12)
  }

  test("connected components matches union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val nNodes = 2 + rnd.nextInt(24)
      val nEdges = rnd.nextInt(40)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
      // reference: union-find keeping the smaller root, so the final root of
      // every node IS its component minimum
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n.toInt).toLong).toMap
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial (${edges.length} edges): $edges")
    }
  }

  test("connected components keeps self-pair nodes as singleton components") {
    import spark.implicits._
    val pairs = Seq((5L, 5L), (1L, 2L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
  }

  test("near-dup clusters group transitive chains the greedy drop cannot") {
    import spark.implicits._
    // sliding windows over 40 unique tokens: doc 2 = all 40, doc 1 = first
    // 30, doc 3 = last 30. Trigram Jaccard: j(1,2)=j(2,3)=28/38≈0.74 (≥0.5,
    // verified pairs), j(1,3)=18/38≈0.47 (<0.5, NOT a pair) — a genuine
    // transitive chain. CC must still produce ONE cluster {1,2,3} with
    // rep=1; cleanCorpus's pairwise drop has no way to see that 1 and 3
    // belong together.
    val toks = (0 until 40).map(i => s"tok$i")
    val docs = Seq(
      (1L, toks.take(30).mkString(" ")),
      (2L, toks.mkString(" ")),
      (3L, toks.drop(10).mkString(" "))
    ).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(clusters.keySet == Set(1L, 2L, 3L), s"got ${clusters.keySet}")
    assert(clusters.values.forall(_ == (1L, 3L)), s"got $clusters")
  }

  test("CC clean keeps one rep per cluster where greedy keeps hub satellites") {
    import spark.implicits._
    // doc 3 = all 40 tokens, docs 1/2 = first/last 30: j(1,3)=j(2,3)≈0.74
    // but j(1,2)≈0.47 < 0.5. Greedy drops only id_b(=3) of each pair and
    // keeps BOTH satellites {1,2}; CC sees one component {1,2,3} and keeps
    // only rep 1 — the "one doc per duplicate cluster" policy.
    val toks = (0 until 40).map(i => s"tok$i")
    val docs = Seq(
      (1L, toks.take(30).mkString(" ")),
      (2L, toks.drop(10).mkString(" ")),
      (3L, toks.mkString(" "))
    ).toDF("doc_id", "text")
    val greedy = Dedup.cleanCorpus(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cc = Dedup.cleanCorpusCC(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(greedy == Set(1L, 2L))
    assert(cc == Set(1L))
  }

  test("contamination flags training docs sharing grams with a benchmark set") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog near the river bank"
    val train = Seq(
      (1L, s"training sample one $shared and then some extra prose"),
      (2L, "completely unrelated training text about spark physical plans"),
      (3L, shared)  // verbatim benchmark leak
    ).toDF("doc_id", "text")
    val bench = Seq((100L, shared)).toDF("doc_id", "text")
    val hits = Dedup.contamination(train, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(hits.contains((3L, 100L)), "verbatim leak must be flagged")
    assert(hits.contains((1L, 100L)), "embedded leak must be flagged")
    assert(!hits.exists(_._1._1 == 2L), "unrelated doc must not be flagged")
    // the verbatim copy shares every benchmark gram (13 tokens → 11 trigrams)
    assert(hits((3L, 100L)) == 11L)
  }

  test("contamination hot-gram cap drops boilerplate grams before the join") {
    import spark.implicits._
    val boiler = "standard legal footer text all rights reserved worldwide"
    val train = (0 until 50).map(i => (i.toLong, s"doc number $i body $boiler"))
      .toDF("doc_id", "text")
    val bench = Seq((999L, s"benchmark question $boiler")).toDF("doc_id", "text")
    // maxDf=10: the boilerplate grams appear in 50 training docs → dropped,
    // so no (train, bench) pair reaches minShared
    val capped = Dedup.contamination(train, bench, "doc_id", "text", maxDf = 10)
    assert(capped.count() == 0, "hot grams past the cap must not create pairs")
    // with the cap lifted the same pairs DO surface — proving the guard, not
    // the tokenization, removed them
    val uncapped = Dedup.contamination(train, bench, "doc_id", "text", maxDf = 1000000)
    assert(uncapped.count() == 50L)
  }

  test("line dedup drops cross-doc boilerplate, keeps within-doc repeats in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha body\ncookie banner\nalpha body\nclosing one"),
      (2L, "beta body\ncookie banner\nclosing two"),
      (3L, "cookie banner") // all-boilerplate doc vanishes
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'cookie banner' df=3 → dropped; doc 1's repeated 'alpha body' is one
    // doc (df=1) → both occurrences survive, original order kept
    assert(out == Map(
      1L -> "alpha body\nalpha body\nclosing one",
      2L -> "beta body\nclosing two"))
  }

  test("paragraph dedup keeps only the globally first occurrence of a paragraph") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha\n\nshared one\n\nbeta"),
      (2L, "shared one\n\ngamma\n\nshared two"),
      (3L, "shared two\n\nshared one\n\ndelta")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("alpha\n\nshared one\n\nbeta", 3L)),
      "doc 1 holds the first occurrence of everything it contains")
    assert(out(2L) == (("gamma\n\nshared two", 2L)),
      "'shared one' first occurred in doc 1 → dropped here, order preserved")
    assert(out(3L) == (("delta", 1L)),
      "both shared paragraphs first occurred earlier → only the unique one left")
  }

  test("paragraph dedup: within-doc repeat keeps first; all-repeated doc drops out") {
    import spark.implicits._
    val df = Seq(
      (1L, "x\n\nx\n\ny"),
      (2L, "x\n\ny") // every paragraph first seen in doc 1 → no survivors
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "x\n\ny"))
  }

  test("substring dedup excises repeated runs >= l at non-first occurrences") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d e z") // shares the 5-token run 'a b c d e'
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", l = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == (("a b c d e f", 0)), "first occurrence untouched")
    assert(out(2L) == (("x y z", 5)),
      "overlapping dup windows at pos 2,3,4 cover exactly tokens 2..6")
  }

  test("substring dedup: runs shorter than l and docs shorter than l survive") {
    import spark.implicits._
    val df = Seq(
      (1L, "p q r s"),
      (2L, "p q z w"), // shared run 'p q' has length 2 < l=3 → no window matches
      (3L, "k m")      // fewer than l tokens → no windows at all
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", l = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(2L) == (("p q z w", 0)))
    assert(out(3L) == (("k m", 0)))
  }

  test("substring dedup: exact copy collapses to empty but stays in the output") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", l = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == (("a b c d", 0)))
    assert(out(2L) == (("", 4)), "full duplicate → every token excised, row kept")
  }

  test("substring dedup: a within-doc repeated run is excised at its second occurrence") {
    import spark.implicits._
    val df = Seq((1L, "a b c z a b c")).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", l = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == (("a b c z", 3)))
  }

  test("exact dedup counts planted exact copies") {
    val byCopies = Dedup.exact(corpus, "doc_id", "text")
      .groupBy("n_copies").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCopies.get(2L).contains(exactIds.size.toLong))
  }

  test("packedOrderKey: in-bound packs exactly, each violated bound fails loudly") {
    import spark.implicits._
    // in-bound: exact pack, including both boundary-adjacent corners
    val ok = Seq((5L, 7), ((1L << 39) - 1, (1 << 24) - 1)).toDF("d", "p")
      .select(Dedup.packedOrderKey(col("d"), col("p")).as("k"))
      .collect().map(_.getLong(0))
    assert(ok(0) == (5L << 24) + 7)
    assert(ok(1) == (((1L << 39) - 1) << 24) + ((1 << 24) - 1))
    // just-over-bound, one violation at a time
    for ((d, p) <- Seq((1L << 39, 0), (5L, 1 << 24), (-1L, 0), (5L, -1))) {
      val e = intercept[Exception] {
        Seq((d, p)).toDF("d", "p")
          .select(Dedup.packedOrderKey(col("d"), col("p")).as("k")).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("order key out of bounds")),
        s"($d,$p) failed without the loud guard message: $e")
    }
  }

  test("paragraphDedup fails loudly on a doc_id past the pack bound") {
    import spark.implicits._
    val df = Seq((1L << 39, "alpha\n\nbeta")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.paragraphDedup(df, "doc_id", "text").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("order key out of bounds")))
  }
}
