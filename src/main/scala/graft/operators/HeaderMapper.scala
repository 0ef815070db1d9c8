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

  /** Canonical member fields with accepted aliases — the reference's
    * full dictionary (`app/etl.py:54-135`), all 63 fields IN REFERENCE
    * ORDER: several aliases are shared ('name' belongs to businessName
    * AND contactFullName, 'status' to networkStatus AND
    * membershipStatus), and the reference resolves them by dict
    * insertion order — first field wins. Alias strings are data, not
    * code: swap per deployment. */
  val CanonicalFieldOrder: Vector[(String, Seq[String])] = Vector(
    // core member identification
    "memberID" -> Seq("memberid", "member_id", "uid", "id", "member uid"),
    "businessName" -> Seq("businessname", "business_name", "company_name",
      "company", "name", "business", "organization"),
    "contactFullName" -> Seq("contactfullname", "contact_full_name",
      "full_name", "contact_name", "name"),
    "firstName" -> Seq("firstname", "first_name", "fname", "given_name"),
    "lastName" -> Seq("lastname", "last_name", "lname", "family_name", "surname"),
    "contactRole" -> Seq("contactrole", "contact_role", "role", "position",
      "title", "job_title"),
    "contactEmail" -> Seq("contactemail", "contact_email", "email", "e-mail",
      "mail", "contact", "primary_email"),
    "phone" -> Seq("phone", "telephone", "phone_number", "contact_phone",
      "mobile", "cell"),
    "profileImage" -> Seq("profileimage", "profile_image", "image", "photo",
      "avatar", "logo"),
    // address fields
    "streetAddress1" -> Seq("streetaddress1", "street_address1", "address",
      "street", "address1", "street1", "street_address"),
    "city1" -> Seq("city1", "city", "city_1", "town", "municipality"),
    "stateOrProvince1" -> Seq("stateorprovince1", "state_or_province1",
      "state", "province", "region", "state1"),
    "zipCode1" -> Seq("zipcode1", "zip_code1", "zip", "postal_code",
      "zipcode", "postal"),
    "country1" -> Seq("country1", "country", "country_1", "nation", "location"),
    "multipleLocations" -> Seq("multiplelocations", "multiple_locations",
      "has_multiple_locations", "multi_location"),
    // system fields
    "createdAt" -> Seq("createdat", "created_at", "date_created",
      "created_date", "timestamp"),
    "networkStatus" -> Seq("networkstatus", "network_status", "status", "network"),
    "dataSource" -> Seq("datasource", "data_source", "source", "import_source"),
    "sourceFile" -> Seq("sourcefile", "source_file", "file_name", "filename",
      "import_file"),
    "membershipStatus" -> Seq("membershipstatus", "membership_status",
      "member_status", "status"),
    "subscriptionStatus" -> Seq("subscriptionstatus", "subscription_status",
      "subscription"),
    "isTrial" -> Seq("istrial", "is_trial", "trial", "trial_member",
      "trial_status"),
    // offerings and services
    "memberOfferings" -> Seq("memberofferings", "member_offerings",
      "offerings", "services_offered"),
    "designServices" -> Seq("designservices", "design_services", "design"),
    "suppliedEquipment" -> Seq("suppliedequipment", "supplied_equipment",
      "equipment_supplied"),
    "facilityEquipment" -> Seq("facilityequipment", "facility_equipment",
      "equipment_facility"),
    "ingredients" -> Seq("ingredients", "ingredient", "ingredient_list",
      "components", "materials"),
    "laboratoryServices" -> Seq("laboratoryservices", "laboratory_services",
      "lab_services", "labservices"),
    "legalServices" -> Seq("legalservices", "legal_services", "legal"),
    "logisticalServices" -> Seq("logisticalservices", "logistical_services",
      "logistics", "logistics_services"),
    "marketingServices" -> Seq("marketingservices", "marketing_services",
      "marketing"),
    "deliveredIn" -> Seq("deliveredin", "delivered_in", "delivery_packaging",
      "packaging_delivered"),
    "suppliedPackaging" -> Seq("suppliedpackaging", "supplied_packaging",
      "packaging_supplied"),
    "regulatoryServices" -> Seq("regulatoryservices", "regulatory_services",
      "regulatory"),
    "manufacturingServices" -> Seq("manufacturingservices",
      "manufacturing_services", "manufacturing"),
    "startupFriendlyServices" -> Seq("startupfriendlyservices",
      "startup_friendly_services", "startup_services", "startupservices"),
    "facilityDetails" -> Seq("facilitydetails", "facility_details", "facility"),
    "facilityAmenities" -> Seq("facilityamenities", "facility_amenities",
      "amenities"),
    "typeOfSpace" -> Seq("typeofspace", "type_of_space", "space_type", "spaces"),
    "typeOfAgreement" -> Seq("typeofagreement", "type_of_agreement",
      "agreement_type", "agreements"),
    "consultingServices" -> Seq("consultingservices", "consulting_services",
      "consulting"),
    // social media and web presence
    "website" -> Seq("website", "web", "site", "url", "web_site"),
    "facebookURL" -> Seq("facebookurl", "facebook_url", "facebook", "fb_url"),
    "instagramURL" -> Seq("instagramurl", "instagram_url", "instagram", "ig_url"),
    "linkedinURL" -> Seq("linkedinurl", "linkedin_url", "linkedin", "li_url"),
    "twitterURL" -> Seq("twitterurl", "twitter_url", "twitter", "tw_url"),
    "youtubeURL" -> Seq("youtubeurl", "youtube_url", "youtube", "yt_url"),
    // business information
    "companyBio" -> Seq("companybio", "company_bio", "bio", "business_bio",
      "description", "about", "company description", "business description",
      "company bio"),
    "businessDetails" -> Seq("businessdetails", "business_details",
      "business_info", "company_details"),
    "idealClient" -> Seq("idealclient", "ideal_client", "target_client",
      "client_profile"),
    "moq" -> Seq("moq", "minimum_order_quantity", "min_order", "minimum_order"),
    "readyToStartNow" -> Seq("readytostartnow", "ready_to_start_now",
      "available_now", "ready_now"),
    "bookingProjectsForMonth" -> Seq("bookingprojectsformonth",
      "booking_projects_for_month", "projects_month"),
    "bookingProjectsForYear" -> Seq("bookingprojectsforyear",
      "booking_projects_for_year", "projects_year"),
    "leadTimes" -> Seq("leadtimes", "lead_times", "lead_time", "delivery_time"),
    // products and materials
    "products" -> Seq("products", "product", "product_list", "items", "goods"),
    "certifications" -> Seq("certifications", "certification", "certs",
      "cert_list"),
    "allergens" -> Seq("allergens", "allergen", "allergen_list", "allergies"),
    "byProducts" -> Seq("byproducts", "by_products", "byproduct", "by_product"),
    "upCycledIngredients" -> Seq("upcycledingredients", "up_cycled_ingredients",
      "upcycled", "recycled_ingredients"),
    // sustainability and special fields
    "sustainability" -> Seq("sustainability", "sustainable",
      "sustainability_info", "eco_friendly"),
    // additional fields
    "firebaseUID" -> Seq("firebaseuid", "firebase_uid", "firebase_id", "user_id"),
    "updatedAt" -> Seq("updatedat", "updated_at", "last_updated",
      "modified_date"))

  /** Lookup view of the ordered dictionary. */
  val CanonicalFields: Map[String, Seq[String]] = CanonicalFieldOrder.toMap

  /** The reference's hard-required tier (`app/etl.py:538-546`). */
  val RequiredFields: Seq[String] = Seq(
    "businessName", "contactEmail", "streetAddress1", "city1", "country1",
    "companyBio")

  /** The reference's flag-if-missing tier (`app/etl.py:548-556`). */
  val ImportantFields: Seq[String] = Seq(
    "products", "ingredients", "website", "phone", "stateOrProvince1",
    "zipCode1")

  private def norm(h: String): String =
    h.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  /** Map one incoming header: exact (field name or alias) else best
    * fuzzy ≥ `floor` else None. */
  def mapHeader(header: String, floor: Double = 60.0): Option[String] = {
    val n = norm(header)
    val exact = CanonicalFieldOrder.collectFirst {
      case (f, aliases) if norm(f) == n || aliases.exists(norm(_) == n) => f
    }
    exact.orElse {
      val scored = CanonicalFieldOrder.map { case (f, aliases) =>
        val best = (f +: aliases)
          .map(a => Similarity.tokenSetRatio(n, norm(a))).max
        (f, best)
      }
      // deterministic: best score; ties keep the EARLIEST field in
      // reference order (the reference's strict `>` comparison)
      val (f, s) = scored.maxBy(_._2)
      if (s >= floor) Some(f) else None
    }
  }

  case class MappingResult(
      mapping: Map[String, String],          // incoming -> canonical
      unmapped: Seq[String],                 // kept as unmapped_<h>
      missingRequired: Seq[String],          // hard errors
      missingImportant: Seq[String])         // warnings

  /** Map a full header row and run the required/important tiers.
    *
    * `overrides` is the user-correction hook (reference
    * `app/routes.py:326-431`: the reviewer can fix the inferred mapping
    * before processing): an incoming-header -> canonical-field entry
    * wins over both exact and fuzzy inference; an entry mapping a
    * header to "" drops that header to unmapped. Override targets must
    * be canonical fields. */
  def mapHeaders(
      headers: Seq[String], floor: Double = 60.0,
      overrides: Map[String, String] = Map.empty): MappingResult = {
    require(overrides.values.forall(v => v.isEmpty || CanonicalFields.contains(v)),
      s"override targets must be canonical fields: " +
        overrides.values.filterNot(v => v.isEmpty || CanonicalFields.contains(v)).mkString(", "))
    val pairs = headers.map { h =>
      overrides.get(h) match {
        case Some("") => h -> None                  // explicit "leave unmapped"
        case Some(f)  => h -> Some(f)               // user correction wins
        case None     => h -> mapHeader(h, floor)   // inferred
      }
    }
    // first header wins a canonical field; later collisions stay
    // unmapped — except an override, which evicts an inferred claim.
    val overridden = pairs.collect {
      case (h, Some(f)) if overrides.get(h).contains(f) => f
    }.toSet
    val taken = scala.collection.mutable.Set[String]()
    val mapping = scala.collection.mutable.LinkedHashMap[String, String]()
    val unmapped = scala.collection.mutable.ArrayBuffer[String]()
    pairs.foreach {
      case (h, Some(f)) if !taken.contains(f) &&
          (overrides.get(h).contains(f) || !overridden.contains(f)) =>
        taken += f; mapping(h) = f
      case (h, _) => unmapped += h
    }
    MappingResult(
      // VectorMap keeps the header-order insertion sequence the
      // LinkedHashMap built — a plain toMap would go hash-ordered past
      // 4 entries and shuffle projection's canonical column order
      scala.collection.immutable.VectorMap.from(mapping),
      unmapped.toSeq,
      RequiredFields.filterNot(taken.contains),
      ImportantFields.filterNot(taken.contains))
  }

  /** P7: the projection a mapping implies — canonical aliases first,
    * unmapped columns preserved as `unmapped_<h>`. Unmapped names are
    * DEDUPED after normalization ("Notes*" and "Notes:" both normalize
    * to `notes` — emitting two `unmapped_notes` columns would succeed
    * here and then crash the first downstream `withColumn` with an
    * ambiguous reference), an all-symbols header gets a positional
    * name, and embedded backticks in incoming headers are escaped by
    * doubling (Spark's quoted-identifier rule). */
  def projection(df: org.apache.spark.sql.DataFrame, m: MappingResult)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    def quoted(in: String) = col(s"`${in.replace("`", "``")}`")
    // register the FINAL emitted names, not just bases: "Notes:" takes
    // unmapped_notes_2, so a later header normalizing to "notes_2" must
    // step past it — a base-only counter would emit the same name twice
    // and recreate the ambiguous-reference crash this dedup prevents
    val used = scala.collection.mutable.Set[String]()
    val unmappedCols = m.unmapped.zipWithIndex.map { case (h, i) =>
      val base0 = norm(h).replace(' ', '_')
      val base = if (base0.nonEmpty) s"unmapped_$base0" else s"unmapped_col$i"
      var name = base
      var n = 1
      while (used.contains(name)) { n += 1; name = s"${base}_$n" }
      used += name
      quoted(h).as(name)
    }
    val cols =
      m.mapping.toSeq.map { case (in, out) => quoted(in).as(out) } ++
        unmappedCols
    df.select(cols: _*)
  }
}
