package graft.operators

import graft.functions.Similarity

/** Driver-side fuzzy header→canonical-schema mapping (J8/P6).
  *
  * The reference maps arbitrary incoming headers onto a fixed canonical
  * member schema by exact-then-fuzzy match with a 60-score floor and
  * required/important validation tiers (reference `app/etl.py:448-587`,
  * alias dictionary `app/etl.py:54-135`). This happens before a
  * DataFrame schema exists, on O(60) strings — correctly a driver-side
  * step, not a distributed operator; the result feeds a
  * `select(alias...)` projection (P7).
  */
object HeaderMapper {

  /** Canonical member fields with accepted aliases (representative subset
    * of the reference's 60-field dictionary; extend per deployment). */
  val CanonicalFields: Map[String, Seq[String]] = Map(
    "businessName" -> Seq("business name", "company", "company name", "name"),
    "contactEmail" -> Seq("email", "e-mail", "contact email", "email address"),
    "country1" -> Seq("country", "country 1", "primary country"),
    "stateOrProvince1" -> Seq("state", "province", "state or province"),
    "city1" -> Seq("city", "town"),
    "zipCode1" -> Seq("zip", "zip code", "postal code"),
    "streetAddress1" -> Seq("address", "street address", "address 1"),
    "website" -> Seq("url", "web site", "homepage"),
    "phone" -> Seq("phone number", "telephone", "tel"),
    "companyBio" -> Seq("bio", "about", "description", "company bio"),
    "products" -> Seq("product", "products offered", "product list"),
    "ingredients" -> Seq("ingredient", "ingredient list"),
    "certifications" -> Seq("certification", "certs"),
    "allergens" -> Seq("allergen", "allergen info"),
    "manufacturingServices" -> Seq("manufacturing", "manufacturing services"),
    "logisticalServices" -> Seq("logistics", "logistical services"))

  val RequiredFields: Seq[String] = Seq(
    "businessName", "country1", "contactEmail", "streetAddress1", "city1",
    "products", "ingredients", "companyBio")

  val ImportantFields: Seq[String] = Seq(
    "stateOrProvince1", "zipCode1", "website", "phone")

  private def norm(h: String): String =
    h.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  /** Map one incoming header: exact (field name or alias) else best
    * fuzzy ≥ `floor` else None. */
  def mapHeader(header: String, floor: Double = 60.0): Option[String] = {
    val n = norm(header)
    val exact = CanonicalFields.collectFirst {
      case (f, aliases) if norm(f) == n || aliases.exists(norm(_) == n) => f
    }
    exact.orElse {
      val scored = CanonicalFields.toSeq.map { case (f, aliases) =>
        val best = (f +: aliases)
          .map(a => Similarity.tokenSetRatio(n, norm(a))).max
        (f, best)
      }
      // deterministic: best score, ties by field name
      val (f, s) = scored.maxBy { case (f2, s2) => (s2, f2) }
      if (s >= floor) Some(f) else None
    }
  }

  case class MappingResult(
      mapping: Map[String, String],          // incoming -> canonical
      unmapped: Seq[String],                 // kept as unmapped_<h>
      missingRequired: Seq[String],          // hard errors
      missingImportant: Seq[String])         // warnings

  /** Map a full header row and run the required/important tiers. */
  def mapHeaders(headers: Seq[String], floor: Double = 60.0): MappingResult = {
    val pairs = headers.map(h => h -> mapHeader(h, floor))
    // first header wins a canonical field; later collisions stay unmapped
    val taken = scala.collection.mutable.Set[String]()
    val mapping = scala.collection.mutable.LinkedHashMap[String, String]()
    val unmapped = scala.collection.mutable.ArrayBuffer[String]()
    pairs.foreach {
      case (h, Some(f)) if !taken.contains(f) => taken += f; mapping(h) = f
      case (h, _) => unmapped += h
    }
    MappingResult(
      mapping.toMap,
      unmapped.toSeq,
      RequiredFields.filterNot(taken.contains),
      ImportantFields.filterNot(taken.contains))
  }

  /** P7: the projection a mapping implies — canonical aliases first,
    * unmapped columns preserved as `unmapped_<h>`. */
  def projection(df: org.apache.spark.sql.DataFrame, m: MappingResult)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val cols =
      m.mapping.toSeq.map { case (in, out) => col(s"`$in`").as(out) } ++
        m.unmapped.map(h => col(s"`$h`").as(s"unmapped_${norm(h).replace(' ', '_')}"))
    df.select(cols: _*)
  }
}
