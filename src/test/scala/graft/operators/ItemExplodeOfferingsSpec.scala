package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ItemExplodeOfferingsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("melt + split + explode + within-row dedup (E1/E2/E4)") {
    val df = Seq(
      (1L, "Granola; granola, GRANOLA ; vit C", "salt,  pepper"),
      (2L, null: String, "salt")).toDF("member_id", "products", "ingredients")
    val out = ItemExplode.explodeItems(
      df, Seq("member_id"),
      Seq("product" -> "products", "ingredient" -> "ingredients"))
    val rows = out.select("member_id", "kind", "item_name")
      .orderBy("member_id", "kind", "item_name")
      .as[(Long, String, String)].collect().toSeq
    assert(rows == Seq(
      (1L, "ingredient", "pepper"), (1L, "ingredient", "salt"),
      (1L, "product", "Granola"), (1L, "product", "vit C"),
      (2L, "ingredient", "salt")))
  }

  test("explodeItems with no kind columns returns an empty typed frame (E1)") {
    // a minimal valid submission carries none of the kind columns
    // (they aren't required fields) — the result is an empty items
    // frame with the contract schema, not a stack(0, ) ParseException
    val df = Seq((1L, "Acme")).toDF("member_id", "businessName")
    val out = ItemExplode.explodeItems(df, Seq("member_id"), Seq.empty)
    assert(out.columns.toSeq ==
      Seq("member_id", "kind", "item_name", "item_key"))
    assert(out.count() == 0)
  }

  test("offerings derivation emits mapped structs, deduped by uid (E3)") {
    val df = Seq(
      (1L, "yes we make things", "fleet of trucks", "widgets"),
      (2L, null: String, null: String, null: String),
      (3L, "n/a", "", "gadget")).toDF(
      "member_id", "manufacturingServices", "logisticalServices", "products")
    val out = Offerings.offeringLinks(df, Seq("member_id"))
      .select("member_id", "uid").orderBy("member_id", "uid")
      .as[(Long, String)].collect().toSeq
    // member 1: Manufacturing (deduped vs products) + Logistics
    // member 2: nothing; member 3: Manufacturing via products only
    assert(out == Seq((1L, "0x200c34"), (1L, "0x2c411f"), (3L, "0x2c411f")))
  }

  test("splitDistinct trims, drops empties, dedupes exactly (E1)") {
    val out = Seq("a; b,, B ;  a ").toDF("v")
      .select(ItemExplode.splitDistinct($"v").as("arr"))
      .as[Seq[String]].head()
    assert(out == Seq("a", "b", "B"))
  }


  test("within-row dedup keeps the FIRST-SEEN casing deterministically") {
    val df = Seq((1L, "APPLE; Apple ;apple; Pear")).toDF("member_id", "products")
    val out = ItemExplode.explodeItems(df, Seq("member_id"),
      Seq("product" -> "products"))
      .select("item_key", "item_name").as[(String, String)].collect().toMap
    // dropDuplicates would keep an arbitrary casing; the position argmin
    // pins the first fragment of the cell
    assert(out == Map("apple" -> "APPLE", "pear" -> "Pear"))
  }
}
