package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class HeaderMapperSpec extends AnyFunSuite {

  test("exact and alias headers map directly (J8)") {
    assert(HeaderMapper.mapHeader("businessName").contains("businessName"))
    assert(HeaderMapper.mapHeader("Company Name").contains("businessName"))
    assert(HeaderMapper.mapHeader("E-Mail").contains("contactEmail"))
  }

  test("fuzzy headers above the 60 floor map; garbage does not") {
    assert(HeaderMapper.mapHeader("company bio ").contains("companyBio"))
    assert(HeaderMapper.mapHeader("biz name").isDefined)
    assert(HeaderMapper.mapHeader("xyzzy-42-quux").isEmpty)
  }

  test("required/important tier validation reports gaps (P6)") {
    val r = HeaderMapper.mapHeaders(Seq(
      "Company Name", "Country", "email", "Street Address", "City",
      "Products Offered", "Ingredient List", "About"))
    assert(r.missingRequired.isEmpty, r.missingRequired.toString)
    assert(r.missingImportant.nonEmpty) // no state/zip/website/phone
  }

  test("duplicate header claims: first wins, second stays unmapped") {
    val r = HeaderMapper.mapHeaders(Seq("Company Name", "company"))
    assert(r.mapping.size == 1 && r.unmapped == Seq("company"))
  }

  test("the dictionary carries the full canonical schema (63 fields), " +
    "and every alias of every required/important field maps exactly") {
    assert(HeaderMapper.CanonicalFields.size == 63)
    // the reference's two validation tiers are fully alias-covered: any
    // spreadsheet using ANY documented alias resolves without fuzzing
    (HeaderMapper.RequiredFields ++ HeaderMapper.ImportantFields).foreach { f =>
      val aliases = HeaderMapper.CanonicalFields(f)
      assert(aliases.nonEmpty, s"$f has no aliases")
      (f +: aliases.toList).foreach { a =>
        // a shared alias ('name', 'status', …) must land on the FIRST
        // field in reference order that carries it — mirroring the
        // reference's insertion-order resolution
        val expected = HeaderMapper.CanonicalFieldOrder.collectFirst {
          case (f2, as) if f2.equalsIgnoreCase(a) ||
            as.exists(_.equalsIgnoreCase(a)) => f2
        }.getOrElse(f)
        val m = HeaderMapper.mapHeader(a)
        assert(m.contains(expected), s"alias '$a' of $f mapped to $m, expected $expected")
      }
    }
    // the two reference-order pins that caught a real regression: 'name'
    // belongs to businessName (before contactFullName), 'status' to
    // networkStatus (before membershipStatus)
    assert(HeaderMapper.mapHeader("name").contains("businessName"))
    assert(HeaderMapper.mapHeader("status").contains("networkStatus"))
    // unambiguous aliases land on their own field
    assert(HeaderMapper.mapHeader("postal_code").contains("zipCode1"))
    assert(HeaderMapper.mapHeader("surname").contains("lastName"))
    assert(HeaderMapper.mapHeader("fb_url").contains("facebookURL"))
    assert(HeaderMapper.mapHeader("minimum_order_quantity").contains("moq"))
    assert(HeaderMapper.mapHeader("upcycled").contains("upCycledIngredients"))
  }

  test("user override wins over fuzzy inference and can evict a claim") {
    // 'name' is an alias of several fields; the user pins it
    val r = HeaderMapper.mapHeaders(Seq("name", "Description"),
      overrides = Map("name" -> "contactFullName"))
    assert(r.mapping("name") == "contactFullName")
    assert(r.mapping("Description") == "companyBio")
    // an override evicts an earlier inferred claim of the same field
    val r2 = HeaderMapper.mapHeaders(Seq("Company Name", "the real name col"),
      overrides = Map("the real name col" -> "businessName"))
    assert(r2.mapping.get("the real name col").contains("businessName"))
    assert(!r2.mapping.get("Company Name").contains("businessName"))
    // mapping a header to "" forces it unmapped
    val r3 = HeaderMapper.mapHeaders(Seq("status"),
      overrides = Map("status" -> ""))
    assert(r3.mapping.isEmpty && r3.unmapped == Seq("status"))
    // unknown override target is rejected loudly
    intercept[IllegalArgumentException] {
      HeaderMapper.mapHeaders(Seq("x"), overrides = Map("x" -> "notAField"))
    }
  }

  test("projection dedupes colliding unmapped names and escapes backticks") {
    import org.apache.spark.sql.functions.lit
    val spark = graft.SparkTestSession.spark
    // "Zzqx*" and "Zzqx:" both normalize to `zzqx` (chosen to defeat
    // the fuzzy inference — "Notes" would map to a canonical field);
    // an all-symbols header normalizes to ""; a header with an
    // embedded backtick must be escaped, not break the quoted
    // identifier
    val df = spark.range(1)
      .withColumn("Business Name", lit("Acme"))
      .withColumn("Country 1", lit("US"))
      .withColumn("Contact Email", lit("a@b.co"))
      .withColumn("Zzqx*", lit("n1"))
      .withColumn("Zzqx:", lit("n2"))
      .withColumn("##", lit("n3"))
      .withColumn("size`qty", lit("n4"))
      .drop("id")
    val m = HeaderMapper.mapHeaders(df.columns.toIndexedSeq)
    val out = HeaderMapper.projection(df, m)
    // duplicate-free output schema — downstream withColumn must not
    // hit an ambiguous reference
    assert(out.columns.distinct.length == out.columns.length,
      out.columns.mkString(","))
    assert(out.columns.count(_.startsWith("unmapped_zzqx")) == 2)
    val row = out.collect()(0)
    val byName = out.columns.zip(row.toSeq.map(_.asInstanceOf[String])).toMap
    assert(byName("unmapped_zzqx") == "n1")
    assert(byName("unmapped_zzqx_2") == "n2")
    assert(Seq("n3", "n4").forall(byName.values.toSet.contains))
  }

  test("projection dedup registers GENERATED suffixed names too") {
    import org.apache.spark.sql.functions.lit
    val spark = graft.SparkTestSession.spark
    // "Zzqx*" -> unmapped_zzqx, "Zzqx:" -> unmapped_zzqx_2 (generated);
    // a header normalizing directly to "zzqx_2" must then step PAST the
    // generated name instead of emitting a duplicate column
    val df = spark.range(1)
      .withColumn("Business Name", lit("Acme"))
      .withColumn("Country 1", lit("US"))
      .withColumn("Contact Email", lit("a@b.co"))
      .withColumn("Zzqx*", lit("n1"))
      .withColumn("Zzqx:", lit("n2"))
      .withColumn("zzqx_2", lit("n3"))
      .drop("id")
    val m = HeaderMapper.mapHeaders(df.columns.toIndexedSeq)
    val out = HeaderMapper.projection(df, m)
    assert(out.columns.distinct.length == out.columns.length,
      out.columns.mkString(","))
    val row = out.collect()(0)
    val byName = out.columns.zip(row.toSeq.map(_.asInstanceOf[String])).toMap
    assert(byName("unmapped_zzqx") == "n1")
    assert(byName("unmapped_zzqx_2") == "n2")
    assert(byName.values.toSet.contains("n3"))
  }

  test("mapping preserves header order past 4 entries (projection column order)") {
    val headers = Seq("Business Name", "Contact Email", "Street Address 1",
      "City 1", "Country 1", "Company Bio", "Contact Phone")
    val m = HeaderMapper.mapHeaders(headers)
    assert(m.mapping.size > 4)
    // VectorMap: iteration order == insertion (header) order, so the
    // projected canonical column order is stable run to run
    assert(m.mapping.keys.toSeq ==
      headers.filter(m.mapping.keySet.contains))
  }
}
