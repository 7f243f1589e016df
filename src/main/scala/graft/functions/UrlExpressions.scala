package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic URL canonicalization — the normalize-before-dedup
  * stage of web-corpus curation (the same page arrives as
  * `HTTPS://Site.COM:443/a/` and `https://site.com/a`; URL-level dedup
  * without canonicalization silently keeps both). One single-pass
  * kernel, shared by the interpreted and generated paths of
  * [[CanonicalUrlExpr]].
  *
  * Rules (exact, so the declared query oracles in closed form):
  *  - only `http(s)` URLs canonicalize — anything else returns
  *    unchanged (no scheme guessing);
  *  - scheme and host lowercase; userinfo/path/query case is preserved
  *    (paths are case-sensitive on real servers);
  *  - the fragment (`#…`) drops — it never reaches the server;
  *  - the DEFAULT port drops (`:80` for http, `:443` for https);
  *    non-default ports are kept;
  *  - tracking parameters drop: any query param whose name starts with
  *    `utm_` or equals `fbclid`/`gclid` (case-insensitive); remaining
  *    params keep their original order and bytes; an emptied query
  *    drops its `?`;
  *  - ONE trailing `/` on the path strips (`/a/` → `/a`, bare `/` →
  *    empty) — applied to the path only, never inside the query;
  *  - no percent-decoding: `%2F` and `/` are different paths on real
  *    servers, so decoding would merge distinct pages.
  */
object UrlKernels {

  def canonical(s: UTF8String): UTF8String =
    UTF8String.fromString(canonicalStr(s.toString))

  private def isTracking(name: String): Boolean = {
    val n = name.toLowerCase(java.util.Locale.ROOT)
    n.startsWith("utm_") || n == "fbclid" || n == "gclid"
  }

  def canonicalStr(url: String): String = {
    val schemeEnd =
      if (url.regionMatches(true, 0, "https://", 0, 8)) 8
      else if (url.regionMatches(true, 0, "http://", 0, 7)) 7
      else return url
    val scheme = url.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    val https = scheme.startsWith("https")
    // strip the fragment first — everything after '#' never ships
    val hashAt = url.indexOf('#', schemeEnd)
    val noFrag = if (hashAt < 0) url else url.substring(0, hashAt)
    // authority = up to the first '/' or '?' after the scheme
    var a = schemeEnd
    while (a < noFrag.length && noFrag.charAt(a) != '/' && noFrag.charAt(a) != '?') a += 1
    // lowercase ONLY the host[:port] segment — userinfo (anything
    // before the last '@') is case-significant on real servers, so
    // folding it would merge fetch-distinct URLs
    var auth = {
      val raw = noFrag.substring(schemeEnd, a)
      val at = raw.lastIndexOf('@')
      if (at < 0) raw.toLowerCase(java.util.Locale.ROOT)
      else raw.substring(0, at + 1) +
        raw.substring(at + 1).toLowerCase(java.util.Locale.ROOT)
    }
    val defPort = if (https) ":443" else ":80"
    if (auth.endsWith(defPort)) auth = auth.substring(0, auth.length - defPort.length)
    // path = up to '?', query = the rest
    var q = a
    while (q < noFrag.length && noFrag.charAt(q) != '?') q += 1
    var path = noFrag.substring(a, q)
    if (path.endsWith("/")) path = path.substring(0, path.length - 1)
    val query =
      if (q >= noFrag.length) ""
      else {
        val kept = noFrag.substring(q + 1).split("&", -1)
          .filter { p =>
            val eq = p.indexOf('=')
            !isTracking(if (eq < 0) p else p.substring(0, eq))
          }
        if (kept.isEmpty) "" else "?" + kept.mkString("&")
      }
    scheme + auth + path + query
  }
}

/** `canonical_url(url) → string`: the normalized form of
  * [[UrlKernels]] — lowercase scheme/host, default port and fragment
  * and tracking params stripped, one trailing slash removed. Non-http
  * inputs pass through unchanged. One static kernel call inside
  * whole-stage codegen.
  */
case class CanonicalUrlExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "canonical_url"

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    UrlKernels.canonical(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.UrlKernels.canonical($s)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrlExpr =
    copy(child = newChild)
}
