package graft.schema

import org.apache.spark.sql.types._

/** Canonical typed model (SURVEY.md §1): the staging entities the
  * reference keeps in Postgres (`app/models.py`), as case classes for
  * `Dataset[T]` stages where compile-time field checks help, plus the
  * canonical member StructType used after header mapping (P7).
  *
  * Tri-state review semantics (`approved` ∈ yes/no/pending ×
  * `resolved` × `ignored`, reference `app/routes.py:527-529,693-730`)
  * are encoded with Option[Boolean] — None IS pending, not unknown.
  */
object Model {

  case class Submission(
      submission_id: Long,
      submission_name: String,
      processed_at: java.sql.Timestamp)

  case class Member(
      member_id: String,  // content-hash id: "<xxhash64>-<dup_rank>" (Engine)
      submission_id: Long,
      businessName: String,
      contactEmail: Option[String],
      country1: String,
      stateOrProvince1: Option[String],
      city1: Option[String],
      offerings: Seq[Offering])

  case class Offering(
      title: String, uid: String,
      source_field: String, source_value: String)

  case class NewItem(
      new_item_id: Long,
      member_id: String,
      kind: String,            // product | ingredient | certification | allergen
      item_name: String,
      resolved: Boolean,
      ext_id: Option[String],
      score: Double)

  case class MatchReview(
      review_id: Long,
      new_item_id: Long,
      suggested_title: Option[String],
      suggested_ext_id: Option[String],
      score: Double,
      approved: Option[Boolean],  // None = pending (tri-state)
      ignored: Boolean,
      alternatives: Seq[Alternative])

  case class Alternative(name: String, score: Double, ext_id: String)

  /** Explicit decision enum over the tri-state (SURVEY §7.4 risk 3). */
  def decisionOf(r: MatchReview): String = (r.ignored, r.approved, r.suggested_ext_id) match {
    case (true, Some(false), Some(_)) => "auto-rejected"   // app/etl.py:1359-1374
    case (true, _, _)                 => "ignored"
    case (false, None, _)             => "pending"
    case (false, Some(true), Some(_)) => "approved-match"
    case (false, Some(true), None)    => "approved-as-new" // app/routes.py:709-715
    case (false, Some(false), _)      => "rejected"
  }

  /** Canonical member schema after header mapping (representative core
    * of the reference's 60-field dictionary, `app/etl.py:54-135`). */
  val CanonicalMemberSchema: StructType = StructType(Seq(
    StructField("businessName", StringType, nullable = false),
    StructField("contactEmail", StringType),
    StructField("country1", StringType, nullable = false),
    StructField("stateOrProvince1", StringType),
    StructField("city1", StringType),
    StructField("zipCode1", StringType),
    StructField("streetAddress1", StringType),
    StructField("website", StringType),
    StructField("phone", StringType),
    StructField("companyBio", StringType),
    StructField("products", StringType),
    StructField("ingredients", StringType),
    StructField("certifications", StringType),
    StructField("allergens", StringType),
    StructField("manufacturingServices", StringType),
    StructField("logisticalServices", StringType)))
}
