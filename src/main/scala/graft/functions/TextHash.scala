package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text hashing / sketching primitives for the dedup family
  * and text analysis (SURVEY.md §2 groups C and E). Pure static Scala so the
  * Catalyst expressions' generated code can call straight in.
  *
  * All hashes derive from splitmix64 — stable across JVMs and partitions,
  * which large-scale dedup requires (a re-run or a different executor must
  * produce identical signatures).
  */
object TextHash {

  /** splitmix64 finalizer. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a over UTF-16 chars, finalized with splitmix64. */
  def hashString(s: CharSequence, from: Int, until: Int, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = from
    while (i < until) {
      h = (h ^ s.charAt(i)) * 0x100000001b3L
      i += 1
    }
    mix(h)
  }

  /** Lowercase + collapse runs of whitespace to single spaces. */
  def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length() > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    sb.toString
  }

  private def tokens(s: String): Array[String] = {
    val n = normalize(s)
    if (n.isEmpty) Array.empty else n.split(' ')
  }

  /** Distinct hashes of word k-grams (shingles) of the normalized text. */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = tokens(text.toString)
    val set = new java.util.TreeSet[java.lang.Long]()
    if (toks.length >= k) {
      var i = 0
      while (i + k <= toks.length) {
        var h = 0x9e3779b97f4a7c15L
        var j = 0
        while (j < k) { h = mix(h ^ hashString(toks(i + j), 0, toks(i + j).length, 17L)); j += 1 }
        set.add(h)
        i += 1
      }
    } else if (toks.nonEmpty) {
      // short doc: fall back to unigram shingles so it still has a signature
      toks.foreach(t => set.add(hashString(t, 0, t.length, 17L)))
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature via densified one-permutation hashing (Shrivastava &
    * Li): one hash per shingle routes it to bucket h mod n, keep the unsigned
    * min per bucket, then empty buckets borrow from the nearest filled bucket
    * to the right (rotation densification). O(shingles + n) per doc instead
    * of the classic O(shingles · n) — the difference between 1× and 128× scan
    * cost at 100 TB. Unbiased Jaccard estimator like classic MinHash.
    */
  def minhashSig(text: UTF8String, k: Int, n: Int): ArrayData =
    minhashSigFromShingles(wordShingles(text, k), n)

  /** OPH signature over an ALREADY-SHINGLED hash array. Bit-identical to
    * [[minhashSig]] on the same text (ophUpdate is a per-bucket min, so the
    * iteration order over the distinct shingle set is irrelevant) — exists so
    * a pipeline that materializes the shingle array anyway (minhashPairs
    * keeps it for exact-Jaccard verification) derives the signature from it
    * instead of re-tokenizing and re-hashing the full text a second time.
    */
  def minhashSigFromShingles(sh: ArrayData, n: Int): ArrayData = {
    val sig = new Array[Long](n)
    val filled = new Array[Boolean](n)
    var s = 0
    while (s < sh.numElements()) {
      ophUpdate(sh.getLong(s), sig, filled)
      s += 1
    }
    densifyInPlace(sig, filled)
    new GenericArrayData(sig)
  }

  /** One OPH step: route shingle hash `x` to its bucket and keep the
    * unsigned min. Shared by [[minhashSig]] and the mergeable union sketch
    * (`operators.Overlap.MinhashUnion`) — ONE routing definition, so a
    * distributed union signature is bit-identical to a single-pass one.
    */
  def ophUpdate(x: Long, sig: Array[Long], filled: Array[Boolean]): Unit = {
    val h = mix(x ^ 0x5bd1e995L)
    val b = java.lang.Long.remainderUnsigned(h, sig.length.toLong).toInt
    val v = mix(h)
    if (!filled(b) || java.lang.Long.compareUnsigned(v, sig(b)) < 0) {
      sig(b) = v; filled(b) = true
    }
  }

  /** Rotation-densify a raw OPH bin array in place (see [[minhashSig]]). */
  def densifyInPlace(sig: Array[Long], filled: Array[Boolean]): Unit = {
    var any = false
    var i = 0
    while (i < filled.length && !any) { any = filled(i); i += 1 }
    densify(sig, filled, any, sig.length)
  }

  /** Rotation densification (shared by the OPH variants): empty buckets
    * borrow from the nearest filled bucket to the right; an all-empty
    * signature becomes a deterministic constant.
    */
  private def densify(sig: Array[Long], filled: Array[Boolean], any: Boolean, n: Int): Unit = {
    if (!any) {
      var i = 0
      while (i < n) { sig(i) = mix(i.toLong); i += 1 }
    } else {
      var i = 0
      while (i < n) {
        if (!filled(i)) {
          var j = 1
          while (!filled((i + j) % n)) j += 1
          sig(i) = sig((i + j) % n)
        }
        i += 1
      }
    }
  }

  /** Weighted MinHash signature over pre-hashed shingles with integer
    * weights, in CONSTANT work per shingle: an exponential race (Gollapudi &
    * Panigrahy-style consistent sampling). Each shingle draws a deterministic
    * uniform u from its hash and competes with value v = −ln(u)/w — an
    * Exp(rate = w) sample, so heavier shingles win the per-bucket minimum
    * proportionally to weight:  P(bucket agrees) = Σ_{∩} w / Σ_{∪} w, the
    * weighted Jaccard when weights are global (idf weights are). Routing and
    * densification are the same one-permutation scheme as [[minhashSig]].
    *
    * Replaces integer-weight expansion (w salted hash rounds per shingle),
    * which made the weighted pass ~6× the unweighted one at maxWeight = 8.
    * v ≥ 0 always, so `doubleToRawLongBits` preserves ordering and the
    * signature stays an Array[Long]; StrictMath.log keeps it bit-identical
    * across JVMs/executors.
    */
  def minhashSigWeighted(sh: ArrayData, ws: ArrayData, n: Int): ArrayData = {
    val sig = new Array[Long](n)
    val filled = new Array[Boolean](n)
    var any = false
    var s = 0
    while (s < sh.numElements()) {
      val x = sh.getLong(s)
      val w = ws.getInt(s)
      val h = mix(x ^ 0x5bd1e995L)
      val b = java.lang.Long.remainderUnsigned(h, n.toLong).toInt
      // u ∈ (0, 1]: top 53 bits of a second mix, +1 to exclude zero
      val u = ((mix(h) >>> 11) + 1).toDouble * 1.1102230246251565e-16
      val v = java.lang.Double.doubleToRawLongBits(-StrictMath.log(u) / w)
      if (!filled(b) || v < sig(b)) {
        sig(b) = v; filled(b) = true; any = true
      }
      s += 1
    }
    densify(sig, filled, any, n)
    new GenericArrayData(sig)
  }

  /** Per-shingle idf weights via binary search of each ascending shingle in
    * the ascending exception-key array (`keys` sorted asc, `ws` positionally
    * aligned); shingles absent from the exceptions take `default`. Both
    * inputs ascending ⇒ the search window's lower bound only moves right, so
    * the per-doc cost is O(|sh| · log |keys|) with a shrinking window — NOT
    * the O(|sh| · |keys|) a Spark map probe costs (GetMapValue on
    * ArrayBasedMapData is a linear scan; measured 66 s of CPU at sf0.1
    * before this kernel replaced it).
    *
    * `sh` need only be ASCENDING, not strictly so (r22, ADVICE): on a hit
    * the next search's lower bound stays AT the matched index rather than
    * past it, so a repeated shingle value resolves to its exception weight
    * instead of silently falling back to `default`. wordShingles emits
    * distinct TreeSet output so the engine never hits this, but weights_for
    * is a public Column function and duplicate input must not mis-weight.
    */
  def weightsFor(sh: ArrayData, keys: ArrayData, ws: ArrayData,
                 default: Int): ArrayData = {
    val n = sh.numElements(); val m = keys.numElements()
    val out = new Array[Int](n)
    var base = 0
    var i = 0
    while (i < n) {
      val x = sh.getLong(i)
      var lo = base; var hi = m
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (keys.getLong(mid) < x) lo = mid + 1 else hi = mid
      }
      if (lo < m && keys.getLong(lo) == x) { out(i) = ws.getInt(lo); base = lo }
      else { out(i) = default; base = lo }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ weight over the intersection of two ascending shingle arrays (the
    * sorted-merge pair-verification kernel for weighted MinHash). Weights are
    * positionally aligned with their shingles and globally identical for
    * shared shingles (idf), so A's weight is the pair's weight. O(|A|+|B|)
    * per pair — replaces an O(|A|·|B|) per-key map probe.
    */
  def weightedIntersectSum(sa: ArrayData, wa: ArrayData,
                           sb: ArrayData): Long = {
    var i = 0; var j = 0; var acc = 0L
    val na = sa.numElements(); val nb = sb.numElements()
    while (i < na && j < nb) {
      val x = sa.getLong(i); val y = sb.getLong(j)
      if (x == y) { acc += wa.getInt(i); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }

  /** |A ∩ B| of two ascending long arrays by sorted merge — the unweighted
    * verification kernel (Jaccard = i / (|A| + |B| − i)). Replaces
    * `array_intersect`/`array_union`, which build a hash set per pair per
    * side; at the 100× probe the merge made the weighted pass 4× cheaper
    * than the set-based unweighted one.
    */
  def intersectCount(sa: ArrayData, sb: ArrayData): Long = {
    var i = 0; var j = 0; var acc = 0L
    val na = sa.numElements(); val nb = sb.numElements()
    while (i < na && j < nb) {
      val x = sa.getLong(i); val y = sb.getLong(j)
      if (x == y) { acc += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }

  /** LSH band keys: hash each (bandIdx, sig-slice) to one long. Signature
    * length must be a multiple of `bands`.
    */
  def lshBandKeys(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    val rows = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix(b.toLong + 0x51L)
      var r = 0
      while (r < rows) { h = mix(h ^ sig.getLong(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Unicode NFC canonical composition. ASCII (and already-composed) input
    * returns the SAME UTF8String — `Normalizer.isNormalized` is a cheap
    * scan, so the common case allocates nothing.
    */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** 64-bit SimHash over unigram token hashes. Votes iterate tokens with
    * repetition, so bits are implicitly term-frequency weighted (Charikar's
    * weighted form with w = tf).
    */
  def simhash64(text: UTF8String): Long = {
    val toks = tokens(text.toString)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = hashString(toks(i), 0, toks(i).length, 29L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): rolling hashes of
    * char k-grams over the normalized text, min per window of w (rightmost on
    * ties), distinct, sorted.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val n = normalize(text.toString)
    if (n.length < k) return new GenericArrayData(Array.empty[Long])
    val m = n.length - k + 1
    val grams = new Array[Long](m)
    var i = 0
    while (i < m) { grams(i) = hashString(n, i, i + k, 43L); i += 1 }
    val set = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var min = grams(0); i = 1
      while (i < m) { if (java.lang.Long.compareUnsigned(grams(i), min) <= 0) min = grams(i); i += 1 }
      set.add(min)
    } else {
      var start = 0
      while (start + w <= m) {
        var minIdx = start
        var j = start + 1
        while (j < start + w) {
          if (java.lang.Long.compareUnsigned(grams(j), grams(minIdx)) <= 0) minIdx = j
          j += 1
        }
        set.add(grams(minIdx))
        start += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  // --- language identification (n-gram/stopword profile heuristic) ---------

  private val profiles: Array[(String, Set[String])] = Array(
    "en" -> Set("the", "and", "of", "to", "in", "is", "it", "you", "that", "for", "a"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Set("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Set("el", "los", "y", "es", "no", "por", "las", "una", "lo", "como"))

  private def isCjk(c: Char): Boolean = {
    val b = Character.UnicodeBlock.of(c)
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
    b == Character.UnicodeBlock.HIRAGANA || b == Character.UnicodeBlock.KATAKANA ||
    b == Character.UnicodeBlock.HANGUL_SYLLABLES
  }

  /** Heuristic language id: CJK char ratio, else stopword-profile argmax
    * (deterministic tie-break by profile order); "und" when nothing matches.
    */
  def langId(text: UTF8String): UTF8String = {
    val s = text.toString
    if (s.isEmpty) return UTF8String.fromString("und")
    var cjk = 0; var letters = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) { letters += 1; if (isCjk(c)) cjk += 1 }
      i += 1
    }
    if (letters > 0 && cjk.toDouble / letters > 0.2) return UTF8String.fromString("zh")
    val toks = tokens(s)
    var best = "und"; var bestScore = 0
    var p = 0
    while (p < profiles.length) {
      val (lang, set) = profiles(p)
      var score = 0
      var t = 0
      while (t < toks.length) { if (set.contains(toks(t))) score += 1; t += 1 }
      if (score > bestScore) { bestScore = score; best = lang }
      p += 1
    }
    UTF8String.fromString(best)
  }
}
