package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F1 — `normalizeOffering`: the reference's item-text normalization
  * (reference `app/etl.py:767-883`): collapse whitespace, rewrite known
  * variants (vit c → Vitamin C, …), strip punctuation except `-./()`,
  * then title-case with stop-words lowered and hyphen/dot parts
  * capitalized.
  *
  * Expressed as a codegen-friendly chain of `regexp_replace` plus one
  * higher-order-function title-caser — no UDF. The variant table is
  * data (swap per deployment); at scale it belongs in a broadcast dim
  * joined on the lowercased form, which `variantRewrite` mirrors for the
  * in-expression case.
  */
object OfferingText {

  /** lowercase-form -> canonical replacement (reference's variant map,
    * representative subset; data not code). */
  val Variants: Seq[(String, String)] = Seq(
    "\\bvit\\.?\\s*c\\b" -> "Vitamin C",
    "\\bvit\\.?\\s*d\\b" -> "Vitamin D",
    "\\bvit\\.?\\s*b\\s*12\\b" -> "Vitamin B12",
    "\\bb\\.\\s*adolescentis\\b" -> "Bifidobacterium adolescentis",
    "\\bl\\.\\s*acidophilus\\b" -> "Lactobacillus acidophilus",
    "\\bomega\\s*3\\b" -> "Omega-3",
    "\\bco\\s*q\\s*10\\b" -> "CoQ10",
    "\\bgluten\\s*-?\\s*free\\b" -> "Gluten-Free",
    "\\bnon\\s*-?\\s*gmo\\b" -> "Non-GMO")

  val StopWords: Set[String] =
    Set("a", "an", "and", "as", "at", "by", "for", "in", "of", "on",
      "or", "the", "to", "with")

  /** Collapse runs of whitespace, trim. */
  def collapseWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Apply the variant rewrites (case-insensitive). */
  def variantRewrite(c: Column): Column =
    Variants.foldLeft(c) { case (acc, (pat, repl)) =>
      regexp_replace(acc, "(?i)" + pat, repl)
    }

  /** Strip punctuation except word-internal `- . ( )`. */
  def stripPunct(c: Column): Column =
    collapseWs(regexp_replace(c, "[^\\p{L}\\p{N}\\s\\-.()]", ""))

  /** Title-case with stop-word lowering; first word always capitalized;
    * hyphen/dot-separated sub-parts each capitalized. */
  def smartTitleCase(c: Column): Column = {
    // capitalize each -/. separated sub-part (initcap only breaks on
    // whitespace, so hyphen/dot parts need their own pass).
    def capPart(p: Column): Column =
      concat(upper(substring(p, 1, 1)), lower(substring(p, 2, Int.MaxValue)))
    def capWord(w: Column): Column =
      concat_ws("-", transform(split(w, "-"), h =>
        concat_ws(".", transform(split(h, "\\."), capPart(_)))))
    val words = split(c, " ")
    val cased = transform(words, (w, i) =>
      when(i === 0, capWord(w))
        .when(lower(w).isin(StopWords.toSeq: _*), lower(w))
        .otherwise(capWord(w)))
    concat_ws(" ", cased)
  }

  /** The full F1 pipeline. Null-safe, deterministic, idempotent on its
    * own output (property-tested). */
  def normalizeOffering(c: Column): Column =
    when(c.isNull, lit(null))
      .otherwise(smartTitleCase(stripPunct(variantRewrite(collapseWs(c)))))
}
