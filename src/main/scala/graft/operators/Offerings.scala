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

  /** service column -> (offering title, offering uid). */
  val DefaultMapping: Map[String, (String, String)] = Map(
    "manufacturingServices" -> ("Manufacturing", "OFF-MFG"),
    "logisticalServices" -> ("Logistics", "OFF-LOG"),
    "labServices" -> ("Lab Services", "OFF-LAB"),
    "startupFriendlyServices" -> ("Startup Friendly", "OFF-STARTUP"),
    "suppliedPackaging" -> ("Packaging", "OFF-PKG"),
    "deliveredIn" -> ("Delivery", "OFF-DELIV"),
    "designServices" -> ("Design", "OFF-DESIGN"),
    "legalServices" -> ("Legal", "OFF-LEGAL"),
    "marketingServices" -> ("Marketing", "OFF-MKT"),
    "regulatoryServices" -> ("Regulatory", "OFF-REG"),
    "consultingServices" -> ("Consulting", "OFF-CONSULT"),
    "facilityDetails" -> ("Facilities", "OFF-FAC"),
    "suppliedEquipment" -> ("Equipment", "OFF-EQUIP"),
    "products" -> ("Manufacturing", "OFF-MFG"))

  private def nonEmpty(c: Column): Column =
    c.isNotNull && length(trim(c)) > 0 &&
      !lower(trim(c)).isin("null", "none", "n/a", "na", "nan")

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
