package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-label offerings derivation (E3).
  *
  * The reference emits offering structs `{title, uid, source_field,
  * source_value}` when any of ~18 service fields is non-empty, plus
  * Manufacturing when products exist (reference `app/etl.py:224-399`,
  * `1149-1182`). The 100 TB-friendly Spark form melts the service
  * columns (E2 pattern) and joins a broadcast offering-mapping dim —
  * the mapping table is data, not code, so new offering kinds are a
  * row insert, not a deploy.
  */
object Offerings {

  /** service column -> (offering title, offering uid) — the reference's
    * full 18-field table plus the products→Manufacturing rule
    * (`app/etl.py:224-321`, `1149-1182`); uids are its fallback ids.
    * Several source fields share one offering (both packaging fields →
    * Packaging; the four facility fields → Spaces) — the uid-level
    * dedupe below collapses them per member. */
  val DefaultMapping: Map[String, (String, String)] = Map(
    "designServices" -> ("Design", "0x19f191"),
    "suppliedEquipment" -> ("Equipment", "0x494de"),
    "facilityEquipment" -> ("Equipment", "0x494de"),
    "ingredients" -> ("Ingredients", "0x2626b4"),
    "laboratoryServices" -> ("Laboratory", "0x928dd"),
    "legalServices" -> ("Legal", "0x2192be"),
    "logisticalServices" -> ("Logistics", "0x200c34"),
    "marketingServices" -> ("Marketing", "0x30e3a"),
    "deliveredIn" -> ("Packaging", "0x928dc"),
    "suppliedPackaging" -> ("Packaging", "0x928dc"),
    "regulatoryServices" -> ("Regulatory", "0x7a21e"),
    "facilityDetails" -> ("Spaces", "0x19f18f"),
    "typeOfSpace" -> ("Spaces", "0x19f18f"),
    "typeOfAgreement" -> ("Spaces", "0x19f18f"),
    "facilityAmenities" -> ("Spaces", "0x19f18f"),
    "manufacturingServices" -> ("Manufacturing", "0x2c411f"),
    "startupFriendlyServices" -> ("R&D", "0x19f192"),
    "consultingServices" -> ("Consulting", "0x2aba6c"),
    "products" -> ("Manufacturing", "0x2c411f"))

  /** The null-ish token list (shared with q63's oracle SQL — edit HERE,
    * never in the SQL). */
  val NullTokens: Seq[String] = Seq("null", "none", "n/a", "na", "nan")

  private def nonEmpty(c: Column): Column =
    c.isNotNull && length(trim(c)) > 0 &&
      !lower(trim(c)).isin(NullTokens: _*)

  /** Derive an `offerings` array column
    * array<struct<title,uid,source_field,source_value>> from whichever
    * mapped columns exist in `df`. Distinct by uid, keeping the first
    * source in mapping order (deterministic). */
  def withOfferings(
      df: DataFrame,
      mapping: Map[String, (String, String)] = DefaultMapping): DataFrame = {
    val present = mapping.toSeq.sortBy(_._1).filter { case (c, _) => df.columns.contains(c) }
    if (present.isEmpty) return df.withColumn("offerings",
      lit(null).cast("array<struct<title:string,uid:string,source_field:string,source_value:string>>"))
    val structs = present.map { case (c, (title, uid)) =>
      when(nonEmpty(col(c)), struct(
        lit(title).as("title"), lit(uid).as("uid"),
        lit(c).as("source_field"), trim(col(c)).as("source_value")))
    }
    val arr = filter(array(structs: _*), x => x.isNotNull)
    // dedupe by uid keeping first occurrence: aggregate with a seen-list
    val deduped = aggregate(
      arr,
      expr("CAST(array() AS array<struct<title:string,uid:string,source_field:string,source_value:string>>)"),
      (acc, x) =>
        when(exists(acc, y => y.getField("uid") === x.getField("uid")), acc)
          .otherwise(concat(acc, array(x))))
    df.withColumn("offerings", deduped)
  }

  /** Exploded link-table form (member_key, title, uid, source_field) —
    * the shape the MERGE sink and reports consume. */
  def offeringLinks(df: DataFrame, keyCols: Seq[String],
      mapping: Map[String, (String, String)] = DefaultMapping): DataFrame =
    withOfferings(df, mapping)
      .select(keyCols.map(col) :+ explode(col("offerings")).as("o"): _*)
      .select(keyCols.map(col) :+ col("o.title") :+ col("o.uid") :+
        col("o.source_field") :+ col("o.source_value"): _*)
}
