package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Lower,
  RegExpExtract, RegExpReplace, StringTrim}

/** URL canonicalization — the dedup-key normalizer of a web-corpus
  * pipeline (the RefinedWeb/CCNet-style URL dedup pass keys on a
  * canonical form, not the raw crawl string). One deterministic,
  * codegen'd regexp chain:
  *
  *   1. trim + lowercase (a dedup KEY choice: case-insensitive paths
  *      collapse mirrors at the cost of conflating case-sensitive
  *      paths — documented, deliberate)
  *   2. drop the fragment (`#…` — never sent to the server)
  *   3. drop tracking parameters (`utm_*`, `gclid`, `fbclid`) and
  *      heal the separators they leave behind
  *   4. drop a leading `www.` host label
  *   5. drop trailing slashes
  *
  * Every regex is RE2-safe (no lookaround, no backreference) and every
  * replacement is a LITERAL — the same chain runs bit-identically on
  * Spark (java.util.regex) and DuckDB (RE2), which is what makes the
  * q99 oracle a true cross-engine gate.
  *
  * The chain is defined ONCE at the Catalyst `Expression` level so the
  * SQL surface (`url_canonicalize` via [[graft.plans.GraftExtensions]])
  * and the Column API share one implementation. */
object UrlNorm {

  /** The tracking-parameter name pattern — shared with the oracle. */
  val TrackingParams = "(utm_[a-z0-9]+|gclid|fbclid)"

  def canonicalizeUrlExpr(u: Expression): Expression = {
    def rr(e: Expression, p: String, r: String): Expression =
      RegExpReplace(e, Literal(p), Literal(r))
    val lowered = Lower(StringTrim(u))
    val noFrag = rr(lowered, "#.*", "")
    // separator-anchored removal (a bare name=value pattern would also
    // fire MID-VALUE, e.g. ?a=xgclid=5): non-first params drop with
    // their '&'; a first param keeps '?' when others follow, and drops
    // it when alone
    val noTrack = rr(rr(rr(noFrag,
      "&" + TrackingParams + "=[^&]*", ""),
      "\\?" + TrackingParams + "=[^&]*&", "?"),
      "\\?" + TrackingParams + "=[^&]*$", "")
    val healed = rr(noTrack, "[?&]+$", "")
    // the www strip is START-ANCHORED: it drops only the LEADING host
    // label — unanchored, a URL embedded in a query-parameter VALUE
    // (?to=https://www.b.com) would also be rewritten, conflating the
    // dedup keys of genuinely different resources
    rr(rr(healed, "^([a-z0-9+.-]+)://www\\.", "$1://"), "/+$", "")
  }

  def canonicalizeUrl(u: Column): Column =
    column(canonicalizeUrlExpr(expression(u)))

  /** Host of a (canonicalized) URL, empty string when absent. */
  def urlHostExpr(u: Expression): Expression =
    RegExpExtract(u, Literal("^[a-z0-9+.-]+://([^/?#]+)"), Literal(1))

  def urlHost(u: Column): Column = column(urlHostExpr(expression(u)))
}
