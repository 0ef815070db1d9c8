package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F1 — `normalizeOffering`: the reference's item-text normalization
  * (reference `app/etl.py:767-883`): collapse whitespace, rewrite the
  * full variant table (vit c → Vitamin C, B. lactis → Bifidobacterium
  * lactis, …), strip the reference's punctuation set (quotes, commas,
  * brackets — keeping `-.()&`), then title-case with stop-words lowered
  * and hyphen/dot parts capitalized.
  *
  * Expressed as a codegen-friendly chain of `regexp_replace` plus one
  * higher-order-function title-caser — no UDF. The variant table is
  * data (swap per deployment); at scale it belongs in a broadcast dim
  * joined on the lowercased form, which `variantRewrite` mirrors for the
  * in-expression case.
  */
object OfferingText {

  /** pattern -> canonical replacement — the reference's full variant
    * table (`app/etl.py:790-832`), applied in order, case-insensitive.
    * Data not code: swap per deployment. */
  val Variants: Seq[(String, String)] = Seq(
    // vitamin variants
    "\\bvit\\s+c\\b" -> "Vitamin C",
    "\\bvit\\s+d\\b" -> "Vitamin D",
    "\\bvit\\s+b\\b" -> "Vitamin B",
    "\\bvit\\s+e\\b" -> "Vitamin E",
    "\\bvit\\s+a\\b" -> "Vitamin A",
    "\\bvit\\s+k\\b" -> "Vitamin K",
    // common abbreviations
    "\\bprobiotics?\\b" -> "Probiotics",
    "\\bprebiotics?\\b" -> "Prebiotics",
    "\\bomega\\s*3\\b" -> "Omega-3",
    "\\bomega\\s*6\\b" -> "Omega-6",
    "\\bomega\\s*9\\b" -> "Omega-9",
    "\\bcoq10\\b" -> "CoQ10",
    "\\bco\\s*q\\s*10\\b" -> "CoQ10",
    // scientific name expansions
    "\\bB\\.\\s*adolescentis\\b" -> "Bifidobacterium adolescentis",
    "\\bB\\.\\s*lactis\\b" -> "Bifidobacterium lactis",
    "\\bB\\.\\s*bifidum\\b" -> "Bifidobacterium bifidum",
    "\\bL\\.\\s*acidophilus\\b" -> "Lactobacillus acidophilus",
    "\\bL\\.\\s*rhamnosus\\b" -> "Lactobacillus rhamnosus",
    "\\bL\\.\\s*casei\\b" -> "Lactobacillus casei",
    "\\bS\\.\\s*boulardii\\b" -> "Saccharomyces boulardii",
    "\\bS\\.\\s*cerevisiae\\b" -> "Saccharomyces cerevisiae",
    // common ingredient variants
    "\\bstevia\\b" -> "Stevia",
    "\\bmonk\\s*fruit\\b" -> "Monk Fruit",
    "\\bmonkfruit\\b" -> "Monk Fruit",
    "\\bchicory\\s*root\\b" -> "Chicory Root",
    "\\binulin\\b" -> "Inulin",
    "\\bpectin\\b" -> "Pectin",
    "\\bguar\\s*gum\\b" -> "Guar Gum",
    "\\bxanthan\\s*gum\\b" -> "Xanthan Gum",
    "\\bcarrageenan\\b" -> "Carrageenan",
    "\\bagar\\b" -> "Agar",
    "\\bgelatin\\b" -> "Gelatin",
    "\\bgelatine\\b" -> "Gelatin")

  /** The reference's lowercase-unless-first word list (`app/etl.py:853`). */
  val StopWords: Set[String] =
    Set("and", "or", "of", "the", "in", "on", "at", "to", "for", "with", "by")

  /** Collapse runs of whitespace, trim. */
  def collapseWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Apply the variant rewrites (case-insensitive). */
  def variantRewrite(c: Column): Column =
    Variants.foldLeft(c) { case (acc, (pat, repl)) =>
      regexp_replace(acc, "(?i)" + pat, repl)
    }

  /** The reference's punctuation character class (`app/etl.py:838`) —
    * shared with q64's oracle SQL (edit HERE, never in the SQL). */
  val PunctClass: String = "[,;!?'\"“”\\[\\]{}]"

  /** Strip the reference's punctuation set: commas, semicolons, bangs,
    * question marks, quotes, brackets, braces — PRESERVING hyphens,
    * periods, parentheses, ampersands and other notation
    * scientific/brand names rely on. */
  def stripPunct(c: Column): Column =
    collapseWs(regexp_replace(c, PunctClass, ""))

  /** Title-case with stop-word lowering; first word always capitalized;
    * hyphen/dot-separated sub-parts each capitalized.
    *
    * NOTE (reference quirk, faithfully reproduced): this pass runs
    * AFTER the variant rewrites and — like the reference's
    * `word.capitalize()` (`app/etl.py:819`, Python capitalize lowers
    * the tail) — it clobbers the Variants table's mixed-case canonical
    * forms: "coq10" → variant "CoQ10" → title-case "Coq10", exactly
    * the reference's output. The table's casing is documentation of
    * the canonical NAME; the pipeline's final casing is the
    * reference's, and q64's oracle pins it. */
  def smartTitleCase(c: Column): Column = {
    // capitalize each -/. separated sub-part (initcap only breaks on
    // whitespace, so hyphen/dot parts need their own pass). The
    // reference's branches are EXCLUSIVE (`app/etl.py` if '-'/elif '.'):
    // a word containing '-' splits on '-' ONLY — its dot-parts are not
    // individually capitalized ("b.complex-mix" → "B.complex-Mix") —
    // and the dot split applies just to hyphen-free words.
    def capPart(p: Column): Column =
      concat(upper(substring(p, 1, 1)), lower(substring(p, 2, Int.MaxValue)))
    def capWord(w: Column): Column =
      when(w.contains("-"),
        concat_ws("-", transform(split(w, "-"), capPart(_))))
        .otherwise(concat_ws(".", transform(split(w, "\\."), capPart(_))))
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
