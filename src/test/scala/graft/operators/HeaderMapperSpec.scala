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
}
