package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Concat, EqualTo, Expression,
  If, Literal, Lower, RegExpExtract, RegExpReplace, StringTrim}

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
  * Every regex is RE2-safe (no lookaround, no backreference in the
  * PATTERNS) — the same chain runs bit-identically on Spark
  * (java.util.regex) and DuckDB (RE2), which is what makes the q99
  * oracle a true cross-engine gate. One replacement (the www rule) is
  * a GROUP REFERENCE, not a literal, and its spelling is
  * engine-specific: `$1://` here, `\\1://` in the DuckDB twin — sync
  * the two by meaning, never by copying the string.
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
    // QUERY-SCOPED tracking removal: '&' is legal inside PATH segments
    // (RFC 3986), so a chain-wide '&utm_…' rule would fire on a path
    // like /a&gclid=1/b and swallow the real query — split at the
    // first '?', clean only the query string, reassemble. Within the
    // query the rules stay separator-anchored (a bare name=value
    // pattern would also fire MID-VALUE, e.g. ?a=xgclid=5): non-first
    // params drop with their '&', then any leading tracking params
    // drop with their trailing '&'.
    val base = RegExpExtract(noFrag, Literal("^[^?]*"), Literal(0))
    val query = RegExpExtract(noFrag, Literal("^[^?]*\\?(.*)$"), Literal(1))
    val qClean = rr(rr(query,
      "&" + TrackingParams + "=[^&]*", ""),
      "^" + TrackingParams + "=[^&]*&?", "")
    val joined = If(EqualTo(qClean, Literal("")), base,
      Concat(Seq(base, Literal("?"), qClean)))
    val healed = rr(joined, "[?&]+$", "")
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
