package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-valued cell melt + split + explode + within-row dedup.
  *
  * The reference iterates 4 multi-valued columns (products, ingredients,
  * certifications, allergens), splits each cell on `[;,]`, and skips
  * case-insensitive duplicates within one member row (reference
  * `app/etl.py:1204-1238`, `1381-1384`). Spark-first form: one
  * `stack` (melt) + `explode(split(...))` pipeline — both are built-in
  * generators planned by Catalyst, no UDTF. The within-row dedup is a
  * `dropDuplicates` on (row key, kind, lowercase name), which AQE plans
  * as a partial+final hash aggregate.
  */
object ItemExplode {

  /** Melt `kindCols` (kind -> column) into (kind, raw_value) rows,
    * keeping `keyCols`, then split+explode+trim+dedup.
    *
    * Output: keyCols ++ (kind, item_name), one row per distinct
    * (key, kind, lower(item)) with the first-seen original casing
    * replaced by the trimmed fragment. */
  def explodeItems(
      df: DataFrame,
      keyCols: Seq[String],
      kindCols: Seq[(String, String)],
      splitPattern: String = "[;,]"): DataFrame = {
    // a submission with none of the kind columns present is VALID (the
    // reference's required fields don't include them): the result is
    // simply an empty items frame — stack(0, ) would be a ParseException
    if (kindCols.isEmpty)
      return df.select(keyCols.map(col) :+
          lit("").as("kind") :+ lit("").as("item_name") :+
          lit("").as("item_key"): _*)
        .where(lit(false))
    val stackExpr = kindCols
      .flatMap { case (kind, col) => Seq(s"'$kind'", s"`$col`") }
      .mkString(s"stack(${kindCols.size}, ", ", ", ") as (kind, raw_value)")
    df.select(keyCols.map(col) :+ expr(stackExpr): _*)
      .where(col("raw_value").isNotNull)
      .select(
        keyCols.map(col) :+ col("kind") :+
          posexplode(split(col("raw_value"), splitPattern))
            .as(Seq("__pos", "__frag")): _*)
      .withColumn("item_name", trim(col("__frag")))
      .where(length(col("item_name")) > 0)
      .withColumn("item_key", lower(col("item_name")))
      // "first-seen original casing" for real: argmin by fragment
      // position within the cell — dropDuplicates would keep an
      // ARBITRARY row, so the surviving casing (and every downstream
      // content hash) would vary run to run
      .groupBy((keyCols ++ Seq("kind", "item_key")).map(col): _*)
      .agg(min(struct(col("__pos"), col("item_name"))).as("__first"))
      .select(
        (keyCols ++ Seq("kind")).map(col) :+
          col("__first.item_name").as("item_name") :+ col("item_key"): _*)
  }

  /** Pure-column variant for a single multi-valued column. */
  def splitDistinct(c: Column, splitPattern: String = "[;,]"): Column =
    array_distinct(
      filter(transform(split(c, splitPattern), f => trim(f)), f => length(f) > 0))
}
