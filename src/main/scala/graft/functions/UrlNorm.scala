package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
  * q99 oracle a true cross-engine gate. */
object UrlNorm {

  /** The tracking-parameter name pattern — shared with the oracle. */
  val TrackingParams = "(utm_[a-z0-9]+|gclid|fbclid)"

  def canonicalizeUrl(u: Column): Column = {
    val lowered = lower(trim(u))
    val noFrag = regexp_replace(lowered, "#.*", "")
    // separator-anchored removal (a bare name=value pattern would also
    // fire MID-VALUE, e.g. ?a=xgclid=5): non-first params drop with
    // their '&'; a first param keeps '?' when others follow, and drops
    // it when alone
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(noFrag, "&" + TrackingParams + "=[^&]*", ""),
        "\\?" + TrackingParams + "=[^&]*&", "?"),
      "\\?" + TrackingParams + "=[^&]*$", "")
    val healed = regexp_replace(noTrack, "[?&]+$", "")
    val noWww = regexp_replace(healed, "://www\\.", "://")
    regexp_replace(noWww, "/+$", "")
  }

  /** Host of a (canonicalized) URL, empty string when absent. */
  def urlHost(u: Column): Column =
    regexp_extract(u, "^[a-z0-9+.-]+://([^/?#]+)", 1)
}
