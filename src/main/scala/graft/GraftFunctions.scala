package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graft.{AnonymizeIp, CapnpDecodeHttpLog, CapnpEncodeHttpLog, HashSample, HeavyHitters, KeepLatest, KmvDistinct, NfcNormalize}

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT anonymize_ip(addr) ...")` works. Idempotent; usable on
  * any session (the driver's included). [[GraftExtensions]] wires the same
  * set through `spark.sql.extensions` for cluster deployments.
  */
object GraftFunctions {

  private type Builder = Seq[Expression] => Expression

  val all: Seq[(String, Builder)] = Seq(
    "anonymize_ip"           -> ((es: Seq[Expression]) => AnonymizeIp(es.head)),
    "capnp_encode_http_log"  -> ((es: Seq[Expression]) => CapnpEncodeHttpLog(es)),
    "capnp_decode_http_log"  -> ((es: Seq[Expression]) => CapnpDecodeHttpLog(es.head)),
    "nfc_normalize"          -> ((es: Seq[Expression]) => NfcNormalize(es.head)),
    // the analyzer wraps a bare AggregateFunction in AggregateExpression
    "keep_latest"            -> ((es: Seq[Expression]) => KeepLatest(es(0), es(1))),
    // k must be a literal (folded before the sketch is constructed) — a
    // column reference or non-numeric k would otherwise surface as an NPE
    // or ClassCastException from inside the builder
    // literalK runs FIRST: it validates arity before anything indexes
    // es(0), so a zero-arg call reports the analysis error instead of an
    // IndexOutOfBoundsException out of the builder lambda
    "heavy_hitters"          -> ((es: Seq[Expression]) => {
      val k = literalK(es, "heavy_hitters(value, k)")
      HeavyHitters(es(0), k)
    }),
    // hash slot contract (strict at analysis): a STRING hash is an md5
    // hex (`md5(CAST(x AS BINARY))`); a BIGINT hash MUST be a uniform
    // 64-bit hash such as `xxhash64(x)` — NEVER a raw id column. The
    // sketch cannot tell a sequential id from a hash: feeding ids makes
    // the k-th "hash" tiny and the distinct estimate wildly inflated,
    // silently. Other types (int/double/decimal — e.g. Spark's 32-bit
    // `hash()`) are rejected by the analyzer.
    "kmv_distinct"           -> ((es: Seq[Expression]) => {
      val k = literalK(es, "kmv_distinct(hash, k)")
      KmvDistinct(es(0), k)
    }),
    "hash_sample"            -> ((es: Seq[Expression]) => {
      val k = literalK(es, "hash_sample(hash, payload, k)", arity = 3)
      HashSample(es(0), es(1), k)
    }))

  /** Shared literal-k gate for the sketch aggregates' SQL surface: k is
    * the LAST argument and must be an integer literal (folded before the
    * sketch is constructed). Validates arity FIRST so wrong-arity calls
    * get this analysis error, never an index crash.
    */
  private def literalK(es: Seq[Expression], sig: String, arity: Int = 2): Int = {
    val kExpr = if (es.length == arity) es(arity - 1) else null
    val kOk = kExpr != null && kExpr.foldable &&
      (kExpr.eval() match {
        case _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short |
             _: java.lang.Byte => true
        case _ => false
      })
    if (!kOk) throw new org.apache.spark.sql.AnalysisException(
      "_LEGACY_ERROR_TEMP_3071",
      Map("msg" -> s"$sig: k must be an integer literal"))
    kExpr.eval().asInstanceOf[Number].intValue()
  }

  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder)
    }
    // optimizer surface (idempotent-call collapsing); idempotent to re-add
    if (!spark.experimental.extraOptimizations.contains(graft.plans.CollapseIdempotent))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.CollapseIdempotent
  }
}
