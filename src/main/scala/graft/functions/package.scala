package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{AnonymizeIp, Bridge, CapnpDecodeHttpLog, CapnpEncodeHttpLog}

/** Column-API for the engine's native expressions (no session-level
  * registration needed; SQL names come from [[GraftFunctions]]).
  */
package object functions {

  import Bridge.{column, expression}

  /** GDPR IP anonymization (reference `anonymize_ip` semantics). */
  def anonymize_ip(c: Column): Column = column(AnonymizeIp(expression(c)))

  /** Serialize HttpLogRecord fields into a framed capnp message. */
  def capnp_encode_http_log(tsMilli: Column, resourceId: Column, bytesSent: Column,
                            requestTimeMilli: Column, responseStatus: Column,
                            cacheStatus: Column, method: Column, remoteAddr: Column,
                            url: Column): Column =
    column(CapnpEncodeHttpLog(Seq(
      tsMilli, resourceId, bytesSent, requestTimeMilli, responseStatus,
      cacheStatus, method, remoteAddr, url).map(expression)))

  /** Parse a framed capnp HttpLogRecord; null struct on malformed input. */
  def capnp_decode_http_log(c: Column): Column = column(CapnpDecodeHttpLog(expression(c)))
}
