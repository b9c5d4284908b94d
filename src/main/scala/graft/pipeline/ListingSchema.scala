package graft.pipeline

import org.apache.spark.sql.types._

/** The canonical 74-column listings schema the reference harmonizes every
  * monthly scrape to (workfile_preprocess.ipynb cell 16 column order;
  * casts per workfile_design_data_warehouse.sql:189–262). Columns not
  * listed in [[typed]] stay strings — exactly the staging DDL's choice
  * (flags like host_is_superhost remain 't'/'f' TEXT, amenities /
  * host_verifications remain raw JSON-ish text blobs).
  */
object ListingSchema {

  val columns: Seq[String] = Seq(
    "id", "listing_url", "scrape_id", "last_scraped", "name",
    "description", "neighborhood_overview", "picture_url", "host_id",
    "host_url", "host_name", "host_since", "host_location", "host_about",
    "host_response_time", "host_response_rate", "host_acceptance_rate",
    "host_is_superhost", "host_thumbnail_url", "host_picture_url",
    "host_neighbourhood", "host_listings_count",
    "host_total_listings_count", "host_verifications",
    "host_has_profile_pic", "host_identity_verified", "neighbourhood",
    "neighbourhood_cleansed", "neighbourhood_group_cleansed", "latitude",
    "longitude", "property_type", "room_type", "accommodates", "bathrooms",
    "bathrooms_text", "bedrooms", "beds", "amenities", "price",
    "minimum_nights", "maximum_nights", "minimum_minimum_nights",
    "maximum_minimum_nights", "minimum_maximum_nights",
    "maximum_maximum_nights", "minimum_nights_avg_ntm",
    "maximum_nights_avg_ntm", "calendar_updated", "has_availability",
    "availability_30", "availability_60", "availability_90",
    "availability_365", "calendar_last_scraped", "number_of_reviews",
    "number_of_reviews_ltm", "number_of_reviews_l30d", "first_review",
    "last_review", "review_scores_rating", "review_scores_accuracy",
    "review_scores_cleanliness", "review_scores_checkin",
    "review_scores_communication", "review_scores_location",
    "review_scores_value", "license", "instant_bookable",
    "calculated_host_listings_count",
    "calculated_host_listings_count_entire_homes",
    "calculated_host_listings_count_private_rooms",
    "calculated_host_listings_count_shared_rooms", "reviews_per_month")

  require(columns.length == 74)

  /** Non-string target types (design.sql:321–415 DDL). `price` is parsed
    * separately (Cleanse.parsePrice — '$1,234.00' text → DECIMAL). */
  val typed: Map[String, DataType] = Map(
    "id" -> LongType,
    "scrape_id" -> LongType,
    "last_scraped" -> DateType,
    "host_id" -> LongType,
    "host_since" -> DateType,
    "host_listings_count" -> IntegerType,
    "host_total_listings_count" -> IntegerType,
    "latitude" -> DoubleType,
    "longitude" -> DoubleType,
    "accommodates" -> IntegerType,
    "bathrooms" -> DoubleType,
    "bedrooms" -> DoubleType,
    "beds" -> DoubleType,
    "minimum_nights" -> IntegerType,
    "maximum_nights" -> IntegerType,
    "minimum_minimum_nights" -> IntegerType,
    "maximum_minimum_nights" -> IntegerType,
    "minimum_maximum_nights" -> IntegerType,
    "maximum_maximum_nights" -> IntegerType,
    "minimum_nights_avg_ntm" -> DoubleType,
    "maximum_nights_avg_ntm" -> DoubleType,
    "availability_30" -> IntegerType,
    "availability_60" -> IntegerType,
    "availability_90" -> IntegerType,
    "availability_365" -> IntegerType,
    "calendar_last_scraped" -> DateType,
    "number_of_reviews" -> IntegerType,
    "number_of_reviews_ltm" -> IntegerType,
    "number_of_reviews_l30d" -> IntegerType,
    "first_review" -> DateType,
    "last_review" -> DateType,
    "review_scores_rating" -> DoubleType,
    "review_scores_accuracy" -> DoubleType,
    "review_scores_cleanliness" -> DoubleType,
    "review_scores_checkin" -> DoubleType,
    "review_scores_communication" -> DoubleType,
    "review_scores_location" -> DoubleType,
    "review_scores_value" -> DoubleType,
    "reviews_per_month" -> DoubleType)

  def typeOf(c: String): DataType = typed.getOrElse(c, StringType)
}
