// Hosted in an org.apache.spark.sql subpackage because the expression
// framework types it needs (AbstractDataType for ExpectsInputTypes)
// are private[sql] — the standard packaging for third-party Catalyst
// extensions (see CosineSim.scala).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass URL parsing kernels backing [[CanonicalizeUrl]] and
  * [[UrlHost]]. Semantics are definition-identical to the HOF chain in
  * graft.functions.urls (canonicalizeHof / hostHof) and the q110
  * DuckDB mirror — FunctionsSpec asserts kernel ≡ HOF on an edge-case
  * battery; keep all three in lockstep.
  *
  * Why a kernel at all: the HOF formulation references its
  * sub-expressions (head, tail, path, rawQ) multiple times, and after
  * CollapseProject inlines the synthesized url column the tree grows
  * multiplicatively — measured ~17 CPU-seconds of plan/codegen
  * compilation per session for q110's projection before this kernel,
  * independent of row count. One imperative pass has none of that and
  * stays inside whole-stage codegen. */
object UrlKernels {

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  @inline private def isSchemeChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  /** End index (exclusive) of the `scheme://authority` prefix — the
    * HOF head regex `^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*` — or -1 when
    * the string has no such prefix. The authority may be EMPTY (the
    * `*` in the regex); [[authorityStart]] distinguishes. */
  private def headEnd(s: String): Int = {
    val n = s.length
    if (n == 0 || !isAlpha(s.charAt(0))) return -1
    var i = 1
    while (i < n && isSchemeChar(s.charAt(i))) i += 1
    if (i + 2 >= n ||
        s.charAt(i) != ':' || s.charAt(i + 1) != '/' || s.charAt(i + 2) != '/')
      return -1
    i += 3
    while (i < n && s.charAt(i) != '/' && s.charAt(i) != '?' &&
        s.charAt(i) != '#') i += 1
    i
  }

  /** Canonical URL (see graft.functions.urls.canonicalizeHof): drop
    * the fragment, lower-case scheme+authority, drop utm_* params
    * (others keep order), drop '?' when no params survive. */
  def canonicalize(u: UTF8String): UTF8String = {
    val s = u.toString
    val hashIdx = s.indexOf('#')
    val noFrag = if (hashIdx >= 0) s.substring(0, hashIdx) else s
    val he = headEnd(noFrag)
    val head = if (he < 0) "" else noFrag.substring(0, he)
    val tail = noFrag.substring(head.length)
    val qIdx = tail.indexOf('?')
    val path = if (qIdx >= 0) tail.substring(0, qIdx) else tail
    val sb = new java.lang.StringBuilder(s.length)
    // UTF8String.toLowerCase, not String.toLowerCase: must equal the
    // HOF's lower(head) byte-for-byte on non-ASCII authorities
    sb.append(UTF8String.fromString(head).toLowerCase.toString)
    sb.append(path)
    if (qIdx >= 0) {
      var first = true
      var start = qIdx + 1
      while (start <= tail.length) {
        var end = tail.indexOf('&', start)
        if (end < 0) end = tail.length
        if (end > start && !tail.startsWith("utm_", start)) {
          sb.append(if (first) '?' else '&')
          sb.append(tail, start, end)
          first = false
        }
        start = end + 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Lower-cased authority — the HOF host regex
    * `^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)` group 1 — or "" when the
    * input has no scheme://authority prefix or the authority is
    * empty. */
  def host(u: UTF8String): UTF8String = {
    val s = u.toString
    val he = headEnd(s)
    if (he < 0) return UTF8String.EMPTY_UTF8
    val slashes = s.indexOf("://")
    val authStart = slashes + 3
    if (he <= authStart) return UTF8String.EMPTY_UTF8 // empty authority
    UTF8String.fromString(s.substring(authStart, he)).toLowerCase
  }
}

/** Codegen'd URL canonicalization (see [[UrlKernels.canonicalize]]) —
  * element-identical to graft.functions.urls.canonicalizeHof
  * (spec-asserted), one static call per row instead of a
  * multiplicatively-duplicated expression tree. */
case class CanonicalizeUrl(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "canonicalize_url"

  override def nullSafeEval(v: Any): Any =
    UrlKernels.canonicalize(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.UrlKernels.canonicalize($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd lower-cased URL authority (see [[UrlKernels.host]]) —
  * element-identical to graft.functions.urls.hostHof (spec-asserted). */
case class UrlHost(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "url_host"

  override def nullSafeEval(v: Any): Any =
    UrlKernels.host(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.UrlKernels.host($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
