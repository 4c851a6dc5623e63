package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kmv

class KmvSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select(md5(col("v").cast("string").cast("binary")).as("h"))
      .agg(Kmv.kmv_distinct(k)(col("h")).as("r"))
      .select("r.n_tracked", "r.kth_hash", "r.est_distinct")
      .collect().head

  test("below k the sketch is exact and carries no kth hash") {
    val r = sketch((1 to 40).toDF("v"), k = 64)
    assert(r.getLong(0) == 40)
    assert(r.isNullAt(1))
    assert(r.getLong(2) == 40)
  }

  test("duplicates don't inflate the tracked set") {
    val r = sketch(Seq.fill(500)(7).toDF("v"), k = 64)
    assert(r.getLong(0) == 1 && r.getLong(2) == 1)
  }

  test("estimate lands within the theoretical error band") {
    // n = 10000 distinct, k = 256: SE ≈ 1/√254 ≈ 6.3%; 4σ band ≈ 25%
    val n = 10000
    val r = sketch((1 to n).toDF("v"), k = 256)
    assert(r.getLong(0) == 256)
    val est = r.getLong(2).toDouble
    assert(math.abs(est - n) / n < 0.25, s"estimate $est too far from $n")
  }

  test("result is partitioning-invariant (merge = reduce order free)") {
    val df = (1 to 5000).toDF("v")
    val a = sketch(df.repartition(1), k = 128)
    val b = sketch(df.repartition(13), k = 128)
    assert(a == b)
  }

  test("sketch of a union merges like the union of sketches") {
    // the theta-sketch property that makes KMV usable for distributed
    // rollups: bottom-k(A ∪ B) = trim(bottom-k(A) ∪ bottom-k(B)) — driven
    // through the native aggregate's update/merge/eval (incl. one
    // serialize/deserialize round, the shuffle path)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val k = 64
    val agg = org.apache.spark.sql.graft.KmvDistinct(
      BoundReference(0, StringType, nullable = true), k)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bufOf(xs: Seq[String]) = {
      val b = agg.createAggregationBuffer()
      xs.foreach(x => agg.update(b, InternalRow(UTF8String.fromString(h(x)))))
      b
    }
    val left = (1 to 300).map(i => s"a$i")
    val right = (200 to 500).map(i => s"b$i") ++ (1 to 300).map(i => s"a$i")
    val merged = agg.merge(bufOf(left),
      agg.deserialize(agg.serialize(bufOf(right))))
    val together = bufOf(left ++ right)
    assert(agg.eval(merged) == agg.eval(together))
    // and the law is visible at the value level: a full sketch with a kth hash
    val r = agg.eval(together).asInstanceOf[InternalRow]
    assert(r.getLong(0) == k && r.getUTF8String(1).toString.length == 32)
  }

  test("non-md5 input fails loudly instead of silently corrupting order statistics") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val agg = org.apache.spark.sql.graft.KmvDistinct(
      BoundReference(0, StringType, nullable = true), 8)
    val b = agg.createAggregationBuffer()
    for (bad <- Seq("xyz", "g" * 32, "0" * 31)) {
      val e = intercept[IllegalArgumentException] {
        agg.update(b, InternalRow(UTF8String.fromString(bad)))
      }
      assert(e.getMessage.contains("32-char hex"))
    }
  }

  test("bottom-k sample is partitioning-invariant and uniform-ish") {
    val df = (1 to 2000).toDF("v")
      .select(md5(col("v").cast("string").cast("binary")).as("h"), col("v").cast("long").as("p"))
    def run(parts: Int) =
      df.repartition(parts)
        .agg(Kmv.hash_sample(16)(col("h"), col("p")).as("s"))
        .select(explode(col("s.payload")))
        .collect().map(_.getLong(0)).toSeq
    val a = run(1)
    val b = run(11)
    assert(a == b, "sample depends on partitioning")
    assert(a.length == 16 && a.distinct.length == 16)
    // hash-uniformity smoke: the sample shouldn't be a prefix/suffix of v
    assert(a.max > 500 && a.min < 1500)
  }

  test("sampler keeps min payload per hash — invariant under merge order") {
    // same hash carrying different payloads (h not derived from payload):
    // every partitioning and merge order must agree on the kept entry —
    // driven through the native aggregate incl. a ser/de round (shuffle path)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val agg = org.apache.spark.sql.graft.HashSample(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, LongType, nullable = true), 2)
    val ha = "a" * 32; val hb = "b" * 31 + "0"; val hc = "c" * 31 + "0"
    val all = Seq((ha, 9L), (ha, 3L), (hb, 5L), (hc, 1L))
    def bufOf(xs: Seq[(String, Long)]) = {
      val b = agg.createAggregationBuffer()
      xs.foreach { case (h, p) =>
        agg.update(b, InternalRow(UTF8String.fromString(h), p))
      }
      b
    }
    def rows(b: org.apache.spark.sql.graft.BottomKBuf) = {
      val a = agg.eval(b).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2); (r.getUTF8String(0).toString, r.getLong(1))
      }
    }
    val single = rows(bufOf(all))
    val (l, r) = all.splitAt(2)
    val merged = rows(agg.merge(bufOf(l), agg.deserialize(agg.serialize(bufOf(r)))))
    assert(single == merged)
    assert(single == Seq((ha, 3L), (hb, 5L)))
  }

  test("sampler tolerates null hash and null payload rows") {
    val df = spark.range(100).toDF("v")
      .select(
        when(col("v") % 7 === 0, lit(null)).otherwise(
          md5(col("v").cast("string").cast("binary"))).as("h"),
        when(col("v") % 11 === 0, lit(null)).otherwise(col("v")).as("p"))
    val out = df.agg(Kmv.hash_sample(8)(col("h"), col("p")).as("s"))
      .select(explode(col("s.payload"))).collect()
    assert(out.length == 8 && out.forall(!_.isNullAt(0)))
  }

  test("scala estimate matches the oracle's arithmetic shape") {
    // estimate() must stay in lockstep with Queries' kmvDigitSum SQL mirror:
    // 13 hex chars = exact 52-bit integer, single IEEE division, floor
    assert(Kmv.estimate(64, "0000000000001" + "0" * 19) == 63L * (1L << 52))
    assert(Kmv.estimate(64, "8" + "0" * 31) == 126) // θ = 1/2 → floor(63/0.5)
  }

  // ------------------------------------------------------- xxhash64 path
  // The PRODUCTION hash configuration (b51/b52): a LongType child feeds
  // the same aggregates directly — no hex materialization. These pin the
  // laws the md5 rows certify, under the hash users actually run at scale.

  private def xxSketch(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(Kmv.kmv_distinct(k)(xxhash64(col("v"))).as("r"))
      .select("r.n_tracked", "r.kth_hash", "r.est_distinct")
      .collect().head

  test("xxhash64 path: exact below k, partitioning-invariant, in-band above k") {
    val small = xxSketch((1 to 40).toDF("v"), k = 64)
    assert(small.getLong(0) == 40 && small.isNullAt(1) && small.getLong(2) == 40)
    val n = 10000
    val df = (1 to n).toDF("v")
    val a = xxSketch(df.repartition(1), k = 256)
    val b = xxSketch(df.repartition(13), k = 256)
    assert(a == b, "merge law must hold under the long-input path")
    assert(math.abs(a.getLong(2).toDouble - n) / n < 0.25,
      s"estimate ${a.getLong(2)} too far from $n")
  }

  test("xxhash64 path: known answer — kth hash IS the kth-smallest unsigned xxhash64") {
    // brute force the permutation with Spark's own xxhash64, compare the
    // sketch's order statistic and estimate bit-for-bit
    val k = 16
    val df = (1 to 500).toDF("v")
    val hashes = df.select(xxhash64(col("v")).as("h")).distinct()
      .collect().map(_.getLong(0)).sorted(Ordering.fromLessThan[Long](
        (a, b) => java.lang.Long.compareUnsigned(a, b) < 0))
    val kth = hashes(k - 1)
    val r = xxSketch(df, k)
    assert(r.getString(1) == f"$kth%016x")
    val v = math.max(kth >>> 12, 1L)
    val expectEst = math.floor((k - 1).toDouble / (v.toDouble / 4503599627370496.0)).toLong
    assert(r.getLong(2) == expectEst)
  }

  test("xxhash64 path: hash_sample keeps the bottom-k by unsigned hash with min payload") {
    val df = (1 to 500).toDF("v")
      .select(col("v"), xxhash64(col("v") % 100).as("h")) // 5 payloads per hash
    val got = df.agg(Kmv.hash_sample(8)(col("h"), col("v")).as("s"))
      .select(explode(col("s")).as("e")).select("e.h", "e.payload")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val vh = df.select(col("v"), col("h")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val byHash = (1 to 500).groupBy(_ % 100).map { case (_, vs) =>
      (vh(vs.head), vs.min.toLong)
    }.toSeq
    val expect = byHash.sortWith((a, b) =>
      java.lang.Long.compareUnsigned(a._1, b._1) < 0).take(8)
      .map { case (h, p) => (f"$h%016x", p) }
    assert(got.toSeq == expect)
    // and partition-invariance of the whole array
    val again = df.repartition(13)
      .agg(Kmv.hash_sample(8)(col("h"), col("v")).as("s"))
      .select(explode(col("s")).as("e")).select("e.h", "e.payload")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(again.toSeq == expect)
  }

  test("integral payloads implicitly widen to long (pre-r9 surface preserved)") {
    val df = (1 to 50).toDF("v")
      .select(md5(col("v").cast("string").cast("binary")).as("h"),
        (col("v") % 7).cast("int").as("p"))
    val out = df.agg(Kmv.hash_sample(4)(col("h"), col("p")).as("s"))
      .select(explode(col("s.payload"))).collect()
    assert(out.length == 4)
  }

  test("non-hash children fail at ANALYSIS time, not mid-job (r10 ADVICE)") {
    // int (e.g. Spark's 32-bit hash()) and fractional children must be
    // rejected by the analyzer — the old implicit cast to string died on a
    // hex parse hours into a job instead
    val df = (1 to 10).toDF("v")
      .select(hash(col("v")).as("h32"), col("v").cast("double").as("d"),
        md5(col("v").cast("string").cast("binary")).as("h"),
        col("v").cast("long").as("p"))
    intercept[org.apache.spark.sql.AnalysisException](
      df.agg(Kmv.kmv_distinct(8)(col("h32"))).collect())
    intercept[org.apache.spark.sql.AnalysisException](
      df.agg(Kmv.kmv_distinct(8)(col("d"))).collect())
    intercept[org.apache.spark.sql.AnalysisException](
      df.agg(Kmv.hash_sample(4)(col("h32"), col("p"))).collect())
    // fractional payloads no longer silently truncate
    intercept[org.apache.spark.sql.AnalysisException](
      df.agg(Kmv.hash_sample(4)(col("h"), col("d"))).collect())
  }

  test("SQL surface: wrong arity reports the analysis error, not an index crash") {
    GraftFunctions.register(spark)
    for (sql <- Seq("SELECT heavy_hitters()", "SELECT kmv_distinct()",
                    "SELECT heavy_hitters(1)", "SELECT kmv_distinct('a', 'b')",
                    "SELECT hash_sample()", "SELECT hash_sample(1, 2)",
                    "SELECT hash_sample(1, 2, 'x')")) {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains("k must be an integer literal"),
        s"$sql → ${e.getMessage}")
    }
  }

  test("hash_sample on the SQL surface: md5 and xxhash64 paths both serve") {
    GraftFunctions.register(spark)
    spark.range(1, 101).toDF("v").createOrReplaceTempView("ks_vals")
    val md5Out = spark.sql(
      """SELECT hash_sample(md5(CAST(CAST(v AS STRING) AS BINARY)), v, 4) AS s
        |FROM ks_vals""".stripMargin).select(size(col("s"))).head().getInt(0)
    val xxOut = spark.sql(
      "SELECT hash_sample(xxhash64(v), v, 4) AS s FROM ks_vals")
      .select(size(col("s"))).head().getInt(0)
    assert(md5Out == 4 && xxOut == 4)
  }
}
