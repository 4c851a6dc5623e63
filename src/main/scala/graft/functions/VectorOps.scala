package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Dense-vector primitives over `array<float>` embedding columns, computed in
  * double precision. Static so generated code calls in without boxing — the
  * brute-force ANN path runs O(n·k·dim) of these per task.
  */
object VectorOps {

  /** Cosine similarity; 0.0 when either norm is 0. Dimensions are expected to
    * match (computed over the common prefix otherwise).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    while (i < a.numElements()) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Random-hyperplane LSH sketches: `tables` keys of `bits` sign-bits each.
    * Plane components are Rademacher ±1 derived from splitmix64(table, bit,
    * dim) — nothing is stored or broadcast, any executor regenerates the same
    * planes (crucial for 100 TB fan-out).
    */
  def hyperplaneSketches(v: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bits) {
        var acc = 0.0
        var d = 0
        while (d < dim) {
          val r = TextHash.mix((t.toLong << 42) ^ (b.toLong << 21) ^ d.toLong)
          val sign = if ((r & 1L) == 0L) 1.0 else -1.0
          acc += sign * v.getFloat(d)
          d += 1
        }
        if (acc >= 0) key |= (1L << b)
        b += 1
      }
      out(t) = key
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
