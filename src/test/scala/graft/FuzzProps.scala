package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{HttpLogCodec, IpAnon, TextHash}

/** ScalaCheck fuzzing of the pure kernels: the decoder must never throw on
  * arbitrary bytes (dead-letter, not crash — a poisoned Kafka message must
  * not take down an executor), and encode∘decode must be the identity.
  */
object FuzzProps extends Properties("graft.kernels") {

  private def u(s: String) = UTF8String.fromString(s)

  // valid UTF-8-encodable strings (no lone surrogates)
  private val textGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('ü', 'é', '日', '本', '語', '中')))
      .map(_.mkString))

  private val recordGen = for {
    ts <- Gen.long; rid <- Gen.long; bs <- Gen.long; rtm <- Gen.long
    st <- Gen.chooseNum(0, 65535)
    a <- textGen; b <- textGen; c <- textGen; d <- textGen
  } yield (ts, rid, bs, rtm, st, a, b, c, d)

  property("codec round-trips arbitrary field values") =
    forAll(recordGen) { case (ts, rid, bs, rtm, st, a, b, c, d) =>
      val row = HttpLogCodec.decode(HttpLogCodec.encode(ts, rid, bs, rtm, st,
        u(a), u(b), u(c), u(d)))
      (row != null) &&
        row.getLong(0) == ts && row.getLong(1) == rid &&
        row.getLong(2) == bs && row.getLong(3) == rtm && row.getInt(4) == st &&
        row.getUTF8String(5).toString == a && row.getUTF8String(6).toString == b &&
        row.getUTF8String(7).toString == c && row.getUTF8String(8).toString == d
    }

  property("decoder never throws on arbitrary bytes") =
    forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte))) { bytes =>
      HttpLogCodec.decode(bytes) // null or a row, but never an exception
      Prop.passed
    }

  property("decoder never throws on bit-flipped valid messages") =
    forAll(Gen.chooseNum(0, 200), Gen.chooseNum(0, 7)) { (pos, bit) =>
      val good = HttpLogCodec.encode(1L, 2L, 3L, 4L, 5,
        u("HIT"), u("GET"), u("1.2.3.4"), u("/some/url/path"))
      val mutated = good.clone()
      mutated(pos % mutated.length) =
        (mutated(pos % mutated.length) ^ (1 << bit)).toByte
      HttpLogCodec.decode(mutated)
      Prop.passed
    }

  property("decoder never throws on multi-byte-corrupted valid messages") = {
    // the r17 poison-pill (Int-overflowed segment size + out-of-buffer
    // pointer) needs TWO simultaneous corruptions — a single bit flip can
    // never construct it, which is how the property above ran 100k cases
    // green over the live bug. 1-8 random byte REWRITES per case match the
    // harness that found it.
    forAll(Gen.long) { seed =>
      val rng = new scala.util.Random(seed)
      val good = HttpLogCodec.encode(1L, 2L, 3L, 4L, 5,
        u("HIT"), u("GET"), u("1.2.3.4"), u("/some/url/path"))
      val mutated = good.clone()
      var k = rng.nextInt(8)
      while (k >= 0) {
        mutated(rng.nextInt(mutated.length)) = rng.nextInt(256).toByte
        k -= 1
      }
      HttpLogCodec.decode(mutated)
      Prop.passed
    }
  }

  property("anonymize_ip never throws, never returns null") =
    forAll(textGen) { s => IpAnon.anonymize(s) != null }

  property("anonymize_ip masks every valid dotted quad") =
    forAll(Gen.chooseNum(0, 255), Gen.chooseNum(0, 255),
      Gen.chooseNum(0, 255), Gen.chooseNum(0, 255)) { (a, b, c, d) =>
      IpAnon.anonymize(s"$a.$b.$c.$d") == s"$a.$b.$c.x"
    }

  property("anonymize_ip is idempotent on its own v4 output") =
    forAll(Gen.chooseNum(0, 255), Gen.chooseNum(0, 255), Gen.chooseNum(0, 255)) {
      (a, b, c) =>
        val once = IpAnon.anonymize(s"$a.$b.$c.77")
        IpAnon.anonymize(once) == once // "a.b.c.x" is not an IP → unchanged
    }

  property("text kernels never throw on arbitrary text") =
    forAll(textGen) { s =>
      TextHash.wordShingles(u(s), 3)
      TextHash.minhashSig(u(s), 3, 64)
      TextHash.simhash64(u(s))
      TextHash.winnow(u(s), 8, 4)
      TextHash.langId(u(s))
      Prop.passed
    }

  // --- sorted-merge verification kernels vs brute-force set reference ------

  private def arr(xs: Seq[Long]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray)
  private val sortedSetGen: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)

  property("intersectCount equals set intersection size on sorted inputs") =
    forAll(sortedSetGen, sortedSetGen) { (a, b) =>
      TextHash.intersectCount(arr(a), arr(b)) == a.toSet.intersect(b.toSet).size.toLong
    }

  property("weightedIntersectSum equals brute-force Σw over shared keys") =
    forAll(sortedSetGen, Gen.chooseNum(1, 8), sortedSetGen) { (a, maxW, b) =>
      // weights derive from the key (global-weight model, like idf)
      def w(x: Long): Int = (Math.floorMod(x, maxW.toLong) + 1).toInt
      val wa = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        a.map(w).toArray)
      val expected = a.toSet.intersect(b.toSet).toSeq.map(x => w(x).toLong).sum
      TextHash.weightedIntersectSum(arr(a), wa, arr(b)) == expected
    }

  // sorted but NOT distinct: r22 relaxed weightsFor's input contract so a
  // repeated shingle still resolves to its exception weight (ADVICE item)
  private val sortedListGen: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.sorted)

  property("weightsFor equals per-element map lookup with default (r21 kernel)") =
    forAll(sortedListGen, sortedSetGen, Gen.chooseNum(1, 8)) { (sh, keys, default) =>
      // exception weights derive from the key (global-weight model, like idf)
      def w(x: Long): Int = (Math.floorMod(x, 7L) + 2).toInt
      val kw = keys.map(x => x -> w(x)).toMap
      val ws = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        keys.map(w).toArray)
      val got = TextHash.weightsFor(arr(sh), arr(keys), ws, default)
      val expected = sh.map(x => kw.getOrElse(x, default))
      got.numElements() == sh.size &&
        sh.indices.forall(i => got.getInt(i) == expected(i))
    }

  property("weighted minhash signature agreement tracks weighted Jaccard") =
    forAll(Gen.chooseNum(5, 40), Gen.chooseNum(0, 30)) { (shared, extra) =>
      // two sets: `shared` common keys + `extra` keys only in B, weight 1..4
      val a = (0 until shared).map(_.toLong * 7 + 1).sorted
      val b = (a ++ (0 until extra).map(i => -(i.toLong * 11 + 3))).sorted
      def ws(xs: Seq[Long]) = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        xs.map(x => (Math.floorMod(x, 4L) + 1).toInt).toArray)
      val n = 64
      val sa = TextHash.minhashSigWeighted(arr(a), ws(a), n)
      val sb = TextHash.minhashSigWeighted(arr(b), ws(b), n)
      val agree = (0 until n).count(i => sa.getLong(i) == sb.getLong(i))
      val jw = {
        val wOf = (x: Long) => Math.floorMod(x, 4L) + 1
        val inter = a.toSet.intersect(b.toSet).toSeq.map(wOf).sum.toDouble
        val union = (a.toSet ++ b.toSet).toSeq.map(wOf).sum.toDouble
        inter / union
      }
      // identical sets must agree everywhere; otherwise the agreement rate
      // estimates J_w — allow a generous ±0.35 band for n=64
      if (a == b) agree == n
      else Math.abs(agree.toDouble / n - jw) <= 0.35
    }

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))

  property("media decoders never throw: arbitrary AND truncated-valid bytes") =
    forAll(bytesGen, Gen.chooseNum(0L, 10000L), Gen.chooseNum(0, 500)) {
      (bs, id, cut) =>
        // arbitrary garbage
        operators.Multimodal.decodePgm(id, bs)
        operators.Multimodal.decodeWav(id, bs)
        operators.Multimodal.decodeVideo(id, bs)
        operators.Multimodal.decodeBmp(id, bs)
        // a crafted header behind a valid magic must hit the bounds checks,
        // not the magic check
        operators.Multimodal.decodeBmp(id, "BM".getBytes ++ bs)
        // every prefix-truncation of a VALID payload (the realistic
        // corruption: a partial object fetch) must dead-letter, not throw
        val wav = operators.Multimodal.syntheticWav(id)
        val vid = operators.Multimodal.syntheticVideo(id)
        val bmp = operators.Multimodal.syntheticBmp(id)
        val wcut = wav.take(cut min (wav.length - 1))
        val vcut = vid.take(cut min (vid.length - 1))
        val bcut = bmp.take(cut min (bmp.length - 1))
        operators.Multimodal.decodeWav(id, wcut).isEmpty &&
          operators.Multimodal.decodeVideo(id, vcut).isEmpty &&
          operators.Multimodal.decodeBmp(id, bcut).isEmpty &&
          operators.Multimodal.decodeWav(id, wav).nonEmpty &&
          operators.Multimodal.decodeVideo(id, vid).nonEmpty &&
          operators.Multimodal.decodeBmp(id, bmp).nonEmpty
    }

  property("BPE encode is lossless under ANY merge list") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.listOf(Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty),
        Gen.alphaNumStr.suchThat(_.nonEmpty)))) { (word, pairs) =>
      // every merge replaces two adjacent symbols by their concatenation,
      // so token concatenation is invariant whatever the merges are
      val merges = pairs.zipWithIndex.map { case ((l, r), i) =>
        operators.Bpe.Merge(i + 1, l, r, l + r, 1L)
      }
      operators.Bpe.encodeWord(word, merges).mkString("") ==
        word + operators.Bpe.Eow
    }

  property("WARC roundtrips arbitrary texts, embedded CRLF/CRLFCRLF included") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(0L, 1L << 40),
      Gen.oneOf(textGen, textGen.map(t => t + "\r\n\r\n" + t),
        textGen.map("\r\n" + _))))) { docs0 =>
      // distinct ids, ≤6 per container to keep the property fast
      val docs = docs0.distinctBy(_._1).take(6)
      docs.isEmpty || Seq(0L, 1L, 2L).forall { cid => // plain / gzip / zstd
        val parsed = sources.Warc.parse(sources.Warc.syntheticContainer(cid, docs))
        // Content-Length framing means CRLF runs INSIDE a body cannot be
        // mistaken for the record separator
        parsed.exists(recs => recs.map(r => new String(r._3, "UTF-8")).toSet ==
          docs.map(_._2).toSet && recs.length == docs.length)
      }
    }

  property("WARC parse never throws on arbitrary bytes") =
    forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { bytes =>
      sources.Warc.parse(bytes.toArray) match {
        case Some(recs) => recs != null
        case None => true
      }
    }

  property("WARC parse never throws on bit-flipped valid containers") =
    forAll(Gen.chooseNum(0, 2), Gen.chooseNum(0, Int.MaxValue),
      Gen.chooseNum(0, 7)) { (enc, pos, bit) =>
      val good = sources.Warc.syntheticContainer(enc.toLong,
        Seq((1L, "the quick brown fox"), (2L, "jumps over")))
      val b = good.clone()
      val i = pos % b.length
      b(i) = (b(i) ^ (1 << bit)).toByte
      sources.Warc.parse(b) match {
        case Some(recs) => recs != null // flips in body bytes still frame
        case None => true
      }
    }

  property("WARC parse never throws on multi-byte-corrupted containers") =
    // same lesson as the capnp multi-byte property: compound corruptions
    // reach states single flips cannot (a length field AND a boundary byte)
    forAll(Gen.chooseNum(0, 2), Gen.long) { (enc, seed) =>
      val rng = new scala.util.Random(seed)
      val good = sources.Warc.syntheticContainer(enc.toLong,
        Seq((1L, "the quick brown fox"), (2L, "jumps over")))
      val b = good.clone()
      var k = rng.nextInt(8)
      while (k >= 0) { b(rng.nextInt(b.length)) = rng.nextInt(256).toByte; k -= 1 }
      sources.Warc.parse(b) match {
        case Some(recs) => recs != null
        case None => true
      }
    }

  property("MinHash-union sketch: any split+merge equals one sequential pass") =
    forAll(Gen.listOf(Gen.long), Gen.chooseNum(0, 64)) { (hashes, splitAt) =>
      val agg = new operators.Overlap.MinhashUnion(64)
      val (l, r) = hashes.splitAt(splitAt min hashes.length)
      val merged = agg.merge(agg.reduce(agg.zero, l), agg.reduce(agg.zero, r))
      val whole = agg.reduce(agg.zero, hashes)
      agg.finish(merged) == agg.finish(whole)
    }

  property("perceptual hashes never throw on arbitrary bytes") =
    forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte))) { bytes =>
      // dead-letter (None), never crash — the decode-seam contract
      operators.Multimodal.dhashPgm(1L, bytes)
      operators.Multimodal.fingerprintWav(1L, bytes)
      true
    }

  property("perceptual hashes never throw on bit-flipped valid payloads") =
    forAll(Gen.chooseNum(0L, 499L), Gen.chooseNum(0, 4096), Gen.chooseNum(0, 7)) {
      (id, pos, bit) =>
        val img = operators.Multimodal.syntheticPgm(id)
        img(pos % img.length) = (img(pos % img.length) ^ (1 << bit)).toByte
        operators.Multimodal.dhashPgm(id, img)
        val wav = operators.Multimodal.syntheticWav(id)
        wav(pos % wav.length) = (wav(pos % wav.length) ^ (1 << bit)).toByte
        operators.Multimodal.fingerprintWav(id, wav)
        true
    }

  property("perceptual hashes never throw on multi-byte-corrupted payloads") =
    forAll(Gen.chooseNum(0L, 499L), Gen.long) { (id, seed) =>
      val rng = new scala.util.Random(seed)
      def corrupt(b: Array[Byte]): Array[Byte] = {
        var k = rng.nextInt(8)
        while (k >= 0) { b(rng.nextInt(b.length)) = rng.nextInt(256).toByte; k -= 1 }
        b
      }
      operators.Multimodal.dhashPgm(id, corrupt(operators.Multimodal.syntheticPgm(id)))
      operators.Multimodal.fingerprintWav(id, corrupt(operators.Multimodal.syntheticWav(id)))
      true
    }

  property("heavy hitters contract holds under random streams and merge splits") = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    forAll(
      Gen.chooseNum(2, 32),
      Gen.listOfN(400, Gen.chooseNum(0L, 25L)),
      Gen.chooseNum(1, 7)) { (k, xs, nChunks) =>
      val agg = org.apache.spark.sql.graft.HeavyHitters(
        BoundReference(0, LongType, nullable = true), k)
      val bufs = xs.grouped(math.max(1, xs.size / nChunks)).map { chunk =>
        val b = agg.createAggregationBuffer()
        chunk.foreach(v => agg.update(b, InternalRow(v)))
        b
      }.toList
      val merged = bufs
        // serialize/deserialize one side of every merge — the shuffle path
        .reduce((a, b) => agg.merge(a, agg.deserialize(agg.serialize(b))))
      val n = xs.size.toLong
      val truth = xs.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
      import scala.jdk.CollectionConverters._
      val ents = merged.m.entrySet().asScala
        .map(e => (e.getKey, e.getValue()(0), e.getValue()(1))).toSeq
      val bounded = ents.forall { case (v, est, err) =>
        val t = truth.getOrElse(v, 0L)
        est >= t && est <= t + err && err * k <= n
      }
      val present = truth.forall { case (v, c) =>
        c * k <= 2 * n || ents.exists(_._1 == v)
      }
      val sized = merged.m.size <= k && merged.n == n
      bounded && present && sized
    }
  }

  // the c19/c20 packed (doc, pos) order key (Dedup.packedOrderKey): inside
  // the guarded bounds the pack orders EXACTLY like the lexicographic pair
  // — this property is the keep-first correctness argument — and one step
  // past the pos bound that equivalence provably breaks, which is why the
  // runtime guard raises instead of packing
  property("packed order key == lexicographic (doc, pos) order inside bounds") =
    forAll(
      Gen.chooseNum(0L, (1L << 39) - 1), Gen.chooseNum(0, (1 << 24) - 1),
      Gen.chooseNum(0L, (1L << 39) - 1), Gen.chooseNum(0, (1 << 24) - 1)) {
      (d1, p1, d2, p2) =>
        val k1 = (d1 << 24) + p1
        val k2 = (d2 << 24) + p2
        val lex = if (d1 != d2) d1 < d2 else p1 < p2
        (k1 < k2) == lex && ((k1 == k2) == (d1 == d2 && p1 == p2))
    }

  property("one past the pos bound, pack order breaks (why the guard exists)") =
    forAll(Gen.chooseNum(0L, (1L << 38))) { d =>
      // (d, 2^24) packs identically to (d+1, 0): a silent misorder
      ((d << 24) + (1 << 24)) == ((d + 1) << 24)
    }

  // the r10 LONG-input (xxhash64 production) path of the KMV sketch: the
  // same laws the md5 path certifies, fuzzed — split/merge/serialize
  // invariance over arbitrary long multisets (the property that makes the
  // sketch safe under ANY partitioning), and exactness below k
  property("kmv long path: split+merge+serde invariant; exact below k") = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val k = 16
    val agg = org.apache.spark.sql.graft.KmvDistinct(
      BoundReference(0, LongType, nullable = true), k)
    def bufOf(s: Seq[Long]) = {
      val b = agg.createAggregationBuffer()
      s.foreach(x => agg.update(b, InternalRow(x)))
      b
    }
    forAll(Gen.listOf(Gen.long), Gen.chooseNum(1, 5)) { (xs, pieces) =>
      val whole = agg.eval(bufOf(xs))
      val chunk = math.max(1, (xs.size + pieces - 1) / pieces)
      val merged = xs.grouped(chunk).map(bufOf)
        .reduceOption((a, b) => agg.merge(a, agg.deserialize(agg.serialize(b))))
        .getOrElse(agg.createAggregationBuffer())
      val mergedEval = agg.eval(merged).asInstanceOf[InternalRow]
      val nd = xs.distinct.size
      val exactBelowK = nd >= k ||
        (mergedEval.getLong(0) == nd && mergedEval.getLong(2) == nd)
      whole == agg.eval(merged) && exactBelowK
    }
  }

  property("hash_sample long path == brute-force bottom-k by unsigned hash, min payload") = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val k = 8
    val agg = org.apache.spark.sql.graft.HashSample(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, LongType, nullable = true), k)
    // hashes from a small domain so collisions (the min-payload rule) and
    // the sign boundary (unsigned order) are both exercised
    val pairGen = Gen.zip(
      Gen.oneOf(Gen.chooseNum(-5L, 5L), Gen.long), Gen.long)
    forAll(Gen.listOf(pairGen), Gen.chooseNum(1, 4)) { (pairs, pieces) =>
      def bufOf(s: Seq[(Long, Long)]) = {
        val b = agg.createAggregationBuffer()
        s.foreach { case (h, p) => agg.update(b, InternalRow(h, p)) }
        b
      }
      val chunk = math.max(1, (pairs.size + pieces - 1) / pieces)
      val merged = pairs.grouped(chunk).map(bufOf)
        .reduceOption((a, b) => agg.merge(a, agg.deserialize(agg.serialize(b))))
        .getOrElse(agg.createAggregationBuffer())
      val got = {
        val a = agg.eval(merged)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        (0 until a.numElements()).map { i =>
          val r = a.getStruct(i, 2); (r.getUTF8String(0).toString, r.getLong(1))
        }
      }
      val model = pairs.groupBy(_._1)
        .map { case (h, g) => (h, g.map(_._2).min) }.toSeq
        .sortWith((a, b) => java.lang.Long.compareUnsigned(a._1, b._1) < 0)
        .take(k).map { case (h, p) => (f"$h%016x", p) }
      got == model
    }
  }
}
