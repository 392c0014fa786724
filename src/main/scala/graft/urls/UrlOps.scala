package graft.urls

import org.apache.spark.unsafe.types.UTF8String

/**
 * Static, null-safe UTF8String adapters over the pure [[CUrl]] core —
 * the call targets for the codegen'd Catalyst expressions in
 * [[graft.functions.UrlExpressions]]. A Scala `object` with no companion
 * class compiles to Java static forwarders, so generated Java code can call
 * `graft.urls.UrlOps.canon(x)` directly inside a WholeStageCodegen span.
 */
object UrlOps {

  /** canonical URL (Master.generateId identity) or null when malformed */
  def canon(s: UTF8String): UTF8String =
    if (s == null) null
    else CUrl.canonicalize(s.toString).map(UTF8String.fromString).orNull

  /** authority (robots + politeness key) or null when malformed */
  def host(s: UTF8String): UTF8String =
    if (s == null) null
    else CUrl.parseAbsolute(s.toString)
      .map(u => UTF8String.fromString(u.authority)).orNull
}
