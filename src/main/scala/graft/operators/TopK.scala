package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact per-group top-k as a custom typed aggregate.
  *
  * The standard window formulation (`row_number() OVER (PARTITION BY g ORDER
  * BY v DESC) <= k`) must shuffle and SORT every row of every group. This
  * `Aggregator` keeps a k-bounded buffer instead, so top-k flows through
  * normal partial aggregation: map-side combine trims to k before the
  * shuffle, and only ~k rows per group ever cross the wire — the difference
  * between sorting 100 TB and shuffling a few KB per key.
  */
object TopK {

  case class Entry(key: String, value: Long)

  /** Deterministic order: value desc, then key asc. */
  class TopKByValue(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    private def trim(a: Seq[Entry]): Seq[Entry] =
      a.sortBy(e => (-e.value, e.key)).take(k)
    override def zero: Seq[Entry] = Seq.empty
    override def reduce(b: Seq[Entry], e: Entry): Seq[Entry] =
      if (b.length < k) trim(b :+ e)
      else if (e.value < b.last.value ||
        (e.value == b.last.value && e.key >= b.last.key)) b
      else trim(b :+ e)
    override def merge(x: Seq[Entry], y: Seq[Entry]): Seq[Entry] = trim(x ++ y)
    override def finish(b: Seq[Entry]): Seq[Entry] = b
    override def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
  }

  /** Column aggregate: `top_k(key, value)` → array<struct<key,value>> sorted
    * by (value desc, key).
    */
  def top_k(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKByValue(k), ExpressionEncoder[Entry]())
    (key: Column, value: Column) => f(key, value)
  }
}
