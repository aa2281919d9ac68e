package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — stage 0 of every web-corpus pipeline (CCNet
  * §3.1 / RefinedWeb URL filtering): collapse the cosmetic variants a
  * crawl delivers for one logical URL so host-level grouping, per-host
  * caps, and URL-level dedup see ONE key per resource.
  *
  * Canonical form (deterministic, string-exact — the q159/q160 DuckDB
  * oracles replay it with regex chains):
  *   1. the fragment (`#...`) is dropped;
  *   2. the scheme is lowercased;
  *   3. userinfo (`user:pw@`) is dropped;
  *   4. the host is lowercased and leading `www.` repetitions are
  *      stripped;
  *   5. the port is dropped when it is the scheme default (`:80` for
  *      http, `:443` for https) and kept otherwise;
  *   6. trailing `/`s are stripped from the path; an empty path becomes
  *      `/`; path case and %-escapes are preserved BYTE-FOR-BYTE (no
  *      percent-decoding — decoding can change which resource is named);
  *   7. `utm_*=...` query parameters are dropped (separators tidied, an
  *      emptied query loses its `?`); other parameters keep their order.
  * Out of scope of the DEFAULT form (documented, not silently wrong):
  * IDN/punycode host folding and %-escape normalization. The OPT-IN
  * `url_canon_pct` form adds RFC 3986 §6.2.2 percent-encoding
  * normalization over path and query: hex digits of every escape are
  * uppercased and escapes of UNRESERVED characters (ALPHA / DIGIT /
  * `-` / `.` / `_` / `~`) decode to the literal character — `%7euser`
  * and `~user` name the same resource, and a case-shuffled `%2f` stays
  * an escape (`%2F`: decoding a reserved character would CHANGE which
  * resource is named). Malformed escapes (`%` not followed by two hex
  * digits) pass through byte-for-byte — never a throw on crawl garbage.
  *
  * A string without a parseable `scheme://host` prefix is returned
  * UNCHANGED by `canon` (garbage in, same garbage out — never a throw on
  * a 100 TB crawl) and maps to the empty host.
  *
  * The parse is ONE left-to-right pass over the string (no regex, no
  * java.net.URI — URI throws on exactly the malformed inputs a crawl is
  * full of), shared verbatim between interpreted eval and whole-stage
  * codegen.
  */
object UrlCanonUtil {

  private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isWordChar(c: Char): Boolean =
    isLetter(c) || (c >= '0' && c <= '9') || c == '_'

  /** `utm_<wordchars>=<anything>` — the whole-parameter test mirroring
    * the oracle's `(^|&)utm_[A-Za-z0-9_]*=[^&]*` replacement. */
  private def isUtmParam(p: String): Boolean = {
    if (!p.startsWith("utm_")) return false
    val eq = p.indexOf('=')
    if (eq < 4) return false
    var i = 4
    while (i < eq) {
      if (!isWordChar(p.charAt(i))) return false
      i += 1
    }
    true
  }

  /** (scheme, host, port, path, query), or null when not a URL. */
  private def parts(u: String): (String, String, String, String, String) = {
    val si = u.indexOf("://")
    if (si <= 0) return null
    var i = 0
    while (i < si) {
      if (!isLetter(u.charAt(i))) return null
      i += 1
    }
    val scheme = u.substring(0, si).toLowerCase(java.util.Locale.ROOT)
    var rest = u.substring(si + 3)
    val hashAt = rest.indexOf('#')
    if (hashAt >= 0) rest = rest.substring(0, hashAt)
    // authority = up to the first '/' or '?'
    var ae = rest.length
    val sl = rest.indexOf('/')
    if (sl >= 0) ae = sl
    val qm0 = rest.indexOf('?')
    if (qm0 >= 0 && qm0 < ae) ae = qm0
    var auth = rest.substring(0, ae)
    val pathq = rest.substring(ae)
    // userinfo ends at the LAST '@' (RFC 3986 — '@' may appear inside
    // userinfo itself); a first-'@' strip leaves '@'s in the "host" and
    // breaks canon idempotence (found by the PropertySpec fuzzer)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    val colon = auth.indexOf(':')
    var host =
      (if (colon >= 0) auth.substring(0, colon) else auth)
        .toLowerCase(java.util.Locale.ROOT)
    if (host.isEmpty) return null
    // strip ALL leading 'www.' repetitions, not one — canonicalization
    // must be idempotent (canon(canon(u)) == canon(u)), and a single
    // strip turns 'www.www.h' into the not-yet-canonical 'www.h'
    while (host.startsWith("www.")) host = host.substring(4)
    // port = leading digit run after ':' (junk beyond it is dropped — the
    // canonical form is rebuilt from parsed parts)
    var port = ""
    if (colon >= 0) {
      var j = colon + 1
      while (j < auth.length && auth.charAt(j) >= '0' && auth.charAt(j) <= '9')
        j += 1
      port = auth.substring(colon + 1, j)
    }
    val qm = pathq.indexOf('?')
    var path = if (qm >= 0) pathq.substring(0, qm) else pathq
    val query = if (qm >= 0) pathq.substring(qm + 1) else ""
    var pe = path.length
    while (pe > 0 && path.charAt(pe - 1) == '/') pe -= 1
    path = path.substring(0, pe)
    if (path.isEmpty) path = "/"
    (scheme, host, port, path, query)
  }

  private def hexVal(ch: Char): Int =
    if (ch >= '0' && ch <= '9') ch - '0'
    else if (ch >= 'a' && ch <= 'f') ch - 'a' + 10
    else if (ch >= 'A' && ch <= 'F') ch - 'A' + 10
    else -1

  /** RFC 3986 §2.3 unreserved set — the ONLY characters whose escapes
    * may decode without changing which resource the URL names. */
  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' ||
      v == '~'

  /** RFC 3986 §6.2.2 percent-encoding normalization: uppercase the hex
    * digits of every escape; decode escapes of unreserved characters;
    * pass malformed escapes (and everything else) through byte-for-byte.
    * One left-to-right pass, idempotent (decoded output contains no
    * decodable escapes; surviving escapes are already uppercase). */
  def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else {
        sb.append(ch)
        i += 1
      }
    }
    sb.toString
  }

  def canonString(u: String): String = canonString(u, pctNorm = false)

  def canonString(u: String, pctNorm: Boolean): String = {
    val p = parts(u)
    if (p == null) return u
    val (scheme, host, port, path0, query) = p
    val keepPort = port.nonEmpty &&
      !(scheme == "http" && port == "80") &&
      !(scheme == "https" && port == "443")
    val q0 = query.split("&", -1)
      .filter(s => s.nonEmpty && !isUtmParam(s)).mkString("&")
    // opt-in §6.2.2 normalization over path + (utm-filtered) query; the
    // authority never carries escapes a crawl-scale host key cares about
    val path = if (pctNorm) pctNormalize(path0) else path0
    val q = if (pctNorm) pctNormalize(q0) else q0
    val sb = new java.lang.StringBuilder(u.length)
    sb.append(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (q.nonEmpty) sb.append('?').append(q)
    sb.toString
  }

  def hostString(u: String): String = {
    val p = parts(u)
    if (p == null) "" else p._2
  }

  // UTF8String entry points — what interpreted eval AND generated code call
  def canon(u: UTF8String): UTF8String =
    UTF8String.fromString(canonString(u.toString))
  def canonPct(u: UTF8String): UTF8String =
    UTF8String.fromString(canonString(u.toString, pctNorm = true))
  def host(u: UTF8String): UTF8String =
    UTF8String.fromString(hostString(u.toString))
}

/** Native canonicalizer expression: `url_canon(s)` (full canonical URL) or
  * `url_host(s)` (canonical host, '' when unparseable). One string pass per
  * row inside whole-stage codegen — the regex-chain formulation the oracle
  * uses for replay costs ~10 regex evaluations per row, which is the wrong
  * constant factor for a 100 TB stage-0 pass. */
case class UrlCanon(child: Expression, hostOnly: Boolean,
    pctNorm: Boolean = false) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String =
    if (hostOnly) "url_host"
    else if (pctNorm) "url_canon_pct"
    else "url_canon"

  private def fnName: String =
    if (hostOnly) "host" else if (pctNorm) "canonPct" else "canon"

  override def nullSafeEval(input: Any): Any = fnName match {
    case "host" => UrlCanonUtil.host(input.asInstanceOf[UTF8String])
    case "canonPct" => UrlCanonUtil.canonPct(input.asInstanceOf[UTF8String])
    case _ => UrlCanonUtil.canon(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanonUtil.$fnName($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object UrlCanon {
  def canon(c: Column): Column =
    Bridge.column(UrlCanon(Bridge.expression(c), hostOnly = false))
  /** Canonicalization + RFC 3986 §6.2.2 percent-encoding normalization
    * (opt-in: decoding is a semantic choice some pipelines reject). */
  def canonPct(c: Column): Column =
    Bridge.column(UrlCanon(Bridge.expression(c), hostOnly = false,
      pctNorm = true))
  def host(c: Column): Column =
    Bridge.column(UrlCanon(Bridge.expression(c), hostOnly = true))
}
