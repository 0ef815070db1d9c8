package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic-validation guard for batch approval (F7/P10).
  *
  * The reference guards batch auto-approval of high-confidence matches
  * with keyword-category mismatch checks, problematic-pattern pairs and
  * a length-ratio floor (reference `app/routes.py:117-194`, used by
  * `batch_approve_high_confidence` `app/routes.py:808-853`). Expressed
  * here as pure column predicates over broadcast-sized keyword tables.
  */
object SemanticGuard {

  /** Keyword categories: a match is suspect if exactly one side hits a
    * category. */
  val Categories: Map[String, Seq[String]] = Map(
    "dairy" -> Seq("milk", "cheese", "yogurt", "butter", "cream", "dairy"),
    "meat" -> Seq("beef", "pork", "chicken", "meat", "sausage"),
    "produce" -> Seq("fruit", "vegetable", "fresh", "produce"),
    "bakery" -> Seq("bread", "cake", "pastry", "baked", "flour"),
    "beverage" -> Seq("juice", "drink", "beverage", "water", "soda"),
    "supplement" -> Seq("vitamin", "supplement", "mineral", "protein"),
    "packaging" -> Seq("box", "container", "packaging", "wrap"),
    "equipment" -> Seq("machine", "equipment", "mixer", "oven"),
    "service" -> Seq("service", "consulting", "logistics", "delivery"))

  /** Problematic direct pairs (either direction). */
  val ProblematicPairs: Seq[(String, String)] = Seq(
    "milk" -> "almond milk", "sugar" -> "sugar free", "gluten" -> "gluten free",
    "dairy" -> "dairy free", "meat" -> "meat substitute", "butter" -> "peanut butter",
    "cream" -> "ice cream", "water" -> "watermelon", "corn" -> "corn syrup",
    "rice" -> "rice paper", "bean" -> "vanilla bean", "salt" -> "sea salt",
    "oil" -> "essential oil")

  /** Guard thresholds (shared with q60's oracle SQL — edit HERE). */
  val MinLenRatio: Double = 0.5
  val DefaultHigh: Double = 90.0
  val DefaultAutoResolve: Double = 97.0

  private def hitsCategory(c: Column, words: Seq[String]): Column =
    words.map(w => lower(c).contains(w)).reduce(_ || _)

  /** True when the (item, candidate) pair is semantically plausible. */
  def isSemanticallyValid(a: Column, b: Column): Column = {
    val categoryMismatch = Categories.values
      .map(ws => hitsCategory(a, ws) =!= hitsCategory(b, ws))
      .reduce(_ || _)
    val pairHit = ProblematicPairs.map { case (x, y) =>
      (lower(a) === x && lower(b).contains(y)) ||
        (lower(b) === x && lower(a).contains(y))
    }.reduce(_ || _)
    val lenRatio =
      least(length(a), length(b)).cast("double") / greatest(length(a), length(b), lit(1))
    !categoryMismatch && !pairHit && lenRatio >= MinLenRatio
  }

  /** P10 + F7: the batch-approve set — pending reviews in
    * [high, autoResolve) with a suggested id that pass the guard. */
  def batchApprovable(
      reviews: DataFrame,
      itemCol: String = "item_name",
      suggestedCol: String = "suggested_title",
      scoreCol: String = "score",
      high: Double = DefaultHigh,
      autoResolve: Double = DefaultAutoResolve): DataFrame =
    reviews
      // a never-populated ignored flag means "not ignored" — the same
      // coalesce Reports.processedRows applies; !NULL would be NULL and
      // silently drop an approvable row from the batch-approve set
      .where(col("approved").isNull && !coalesce(col("ignored"), lit(false)))
      .where(col(scoreCol) >= high && col(scoreCol) < autoResolve)
      .where(col(suggestedCol).isNotNull)
      .withColumn("semantic_ok", isSemanticallyValid(col(itemCol), col(suggestedCol)))
}
