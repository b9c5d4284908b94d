package graft.pipeline

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets

/** Synthetic Airbnb-shaped raw CSVs per FIXTURES.md §B: three monthly
  * listings files with heterogeneous schemas (74/106/102 columns) and
  * dirty values (duplicate ids, NULL spellings, multiline quoted
  * descriptions, unicode suburbs, $-prices, out-of-month scrape dates),
  * plus census G01/G02 and LGA/SSC geography files.
  */
object Fixtures {

  private def quote(v: String): String = "\"" + v.replace("\"", "\"\"") + "\""

  private def writeCsv(dir: Path, name: String, header: Seq[String],
                       rows: Seq[Map[String, String]]): Unit = {
    val lines = header.map(quote).mkString(",") +:
      rows.map(r => header.map(h => quote(r.getOrElse(h.toLowerCase, ""))).mkString(","))
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  private val C = ListingSchema.columns

  private def listing(vals: (String, String)*): Map[String, String] =
    vals.toMap

  /** Replica i shifts id/host_id by i·1000 (base ids are < 1000), all
    * other values verbatim — so every per-(area, month) KPI must scale
    * EXACTLY ×factor (counts, revenue) or stay invariant (rates,
    * percent changes), which the 10× e2e refresh test asserts. */
  private def shiftRow(r: Map[String, String], i: Int): Map[String, String] =
    if (i == 0) r
    else r.map {
      case (k, v) if (k == "id" || k == "host_id") && v.nonEmpty =>
        k -> (v.toLong + i * 1000L).toString
      case kv => kv
    }

  private def replicate(rows: Seq[Map[String, String]], factor: Int): Seq[Map[String, String]] =
    (0 until factor).flatMap(i => rows.map(shiftRow(_, i)))

  def writeAll(dir: Path, factor: Int = 1): Unit = {
    Files.createDirectories(dir)

    // ---- 01_2021.csv: canonical 74 columns -----------------------------
    val rows2021 = Seq(
      listing("id" -> "1", "name" -> "Alpha", "last_scraped" -> "2021-01-05",
        "host_id" -> "100", "host_location" -> "Potts Point, New South Wales, Australia",
        "host_is_superhost" -> "t", "neighbourhood" -> "Bondi Beach",
        "neighbourhood_cleansed" -> "Bondi", "property_type" -> "Apartment",
        "room_type" -> "Entire home/apt", "accommodates" -> "2",
        "price" -> "$1,234.00", "has_availability" -> "t", "availability_30" -> "10"),
      // duplicate id within the same file (dedup test, design.sql:265)
      listing("id" -> "1", "name" -> "AlphaDup", "last_scraped" -> "2021-01-04",
        "host_id" -> "100", "host_is_superhost" -> "t",
        "neighbourhood" -> "Bondi Beach", "price" -> "$1,234.00",
        "has_availability" -> "t", "availability_30" -> "10"),
      // NULL price -> excluded from fact (design.sql:459)
      listing("id" -> "2", "name" -> "NoPrice", "last_scraped" -> "2021-01-06",
        "host_id" -> "100", "price" -> "", "has_availability" -> "t"),
      // NULL host_id -> excluded from fact
      listing("id" -> "3", "name" -> "NoHost", "last_scraped" -> "2021-01-06",
        "host_id" -> "", "price" -> "$10.00"),
      // multiline description + unicode suburbs (design.sql:507-508)
      listing("id" -> "4", "name" -> "Unicode", "last_scraped" -> "2021-01-20",
        "description" -> "first line\nsecond line",
        "host_id" -> "101", "host_location" -> "РЕДФЕРН, NSW",
        "host_is_superhost" -> "f", "neighbourhood" -> "悉尼",
        "property_type" -> "House", "room_type" -> "Private room",
        "accommodates" -> "4", "price" -> "$85.00",
        "has_availability" -> "t", "availability_30" -> "30"),
      // scraped OUTSIDE the file month -> dropped by validity filter (design.sql:543)
      listing("id" -> "5", "name" -> "LateScrape", "last_scraped" -> "2021-02-03",
        "host_id" -> "100", "price" -> "$99.00", "has_availability" -> "t"),
      // NULL neighbourhood -> 'OTHER'; NULL host_location -> 'MISSING'
      listing("id" -> "6", "name" -> "Defaults", "last_scraped" -> "2021-01-10",
        "host_id" -> "102", "neighbourhood" -> "", "host_location" -> "",
        "host_is_superhost" -> "f", "price" -> "$100.00",
        "has_availability" -> "f", "availability_30" -> "0"),
      // LIKE-prefix suburb fixup (design.sql:488)
      listing("id" -> "7", "name" -> "CurlCurl", "last_scraped" -> "2021-01-15",
        "host_id" -> "103", "neighbourhood" -> "North Curl Curl NSW",
        "host_is_superhost" -> "t", "price" -> "$200.00",
        "has_availability" -> "t", "availability_30" -> "25"),
      // COUNCIL-strip normalization + NULL spellings in unrelated cols
      listing("id" -> "8", "name" -> "Council", "last_scraped" -> "2021-01-12",
        "host_id" -> "100", "neighbourhood" -> "Sydney Council",
        "host_location" -> "Saint Peters, NSW", "host_is_superhost" -> "t",
        "price" -> "$150.00", "has_availability" -> "t", "availability_30" -> "20",
        "license" -> "NUL", "host_about" -> "\\N", "calendar_updated" -> "NULL"))
    writeCsv(dir, "listings_01_2021.csv", C, replicate(rows2021, factor))

    // ---- 05_2020.csv: 106-column variant (mixed-case headers, missing
    // two canonical columns, 34 extras) --------------------------------
    val extras05 = Seq("summary", "space", "experiences_offered", "notes",
      "transit", "access", "interaction", "house_rules", "thumbnail_url",
      "medium_url", "xl_picture_url", "street", "city", "state", "zipcode",
      "market", "smart_location", "country_code", "country", "is_location_exact",
      "square_feet", "weekly_price", "monthly_price", "security_deposit",
      "cleaning_fee", "guests_included", "extra_people", "has_license",
      "jurisdiction_names", "cancellation_policy", "require_guest_profile_picture",
      "require_guest_phone_verification", "region_id", "region_name")
    val cols05 = (C.filterNot(Set("bathrooms_text", "number_of_reviews_l30d")) ++ extras05)
    require(cols05.length == 106, s"got ${cols05.length}")
    val header05 = cols05.map(_.capitalize) // exercises lowercase-headers (S6)
    val rows05 = Seq(
      listing("id" -> "9", "name" -> "PyrmontA", "last_scraped" -> "2020-05-10",
        "host_id" -> "104", "neighbourhood" -> "Pyrmont", "host_is_superhost" -> "f",
        "price" -> "$90.00", "has_availability" -> "t", "availability_30" -> "15",
        "city" -> "Sydney", "weekly_price" -> "$500.00"),
      listing("id" -> "10", "name" -> "PyrmontB", "last_scraped" -> "2020-05-12",
        "host_id" -> "104", "neighbourhood" -> "Pyrmont", "host_is_superhost" -> "f",
        "price" -> "$60.00", "has_availability" -> "f", "availability_30" -> "0"))
    writeCsv(dir, "listings_05_2020.csv", header05, replicate(rows05, factor))

    // ---- 07_2020.csv: 102-column variant ------------------------------
    val cols07 = (C.filterNot(Set("number_of_reviews_l30d", "bathrooms")) ++ extras05.take(30))
    require(cols07.length == 102, s"got ${cols07.length}")
    val rows07 = Seq(
      listing("id" -> "11", "name" -> "BondiB", "last_scraped" -> "2020-07-07",
        "host_id" -> "105", "neighbourhood" -> "Bondi Beach", "host_is_superhost" -> "t",
        "price" -> "$120.00", "has_availability" -> "t", "availability_30" -> "5"),
      listing("id" -> "12", "name" -> "Harbour", "last_scraped" -> "2020-07-30",
        "host_id" -> "106", "neighbourhood" -> "Darling Harbour", "host_is_superhost" -> "f",
        "price" -> "$45.00", "has_availability" -> "t", "availability_30" -> "30"))
    writeCsv(dir, "listings_07_2020.csv", cols07, replicate(rows07, factor))

    // ---- census G01 (c1..c70; used: c4, c55, c70) ---------------------
    val g01Cols = (1 to 70).map(i => s"x$i")
    def g01(key: String, pop: String, indig: String, citz: String) =
      Map("x1" -> key, "x4" -> pop, "x55" -> indig, "x70" -> citz)
    writeCsv(dir, "2021Census_G01_NSW_LGA.csv", g01Cols, Seq(
      g01("LGA10050", "200000", "4000", "150000"),
      g01("LGA10470", "90000", "1200", "70000"),
      g01("LGA10900", "45000", "300", "30000")))

    // ---- census G02 (c1..c9; used: c2, c3, c9); one LGA only here -----
    val g02Cols = (1 to 9).map(i => s"y$i")
    def g02(key: String, age: String, mort: String, hh: String) =
      Map("y1" -> key, "y2" -> age, "y3" -> mort, "y9" -> hh)
    writeCsv(dir, "2021Census_G02_NSW_LGA.csv", g02Cols, Seq(
      g02("LGA10050", "35", "2400", "2.1"),
      g02("LGA10470", "41", "2600", "2.8"),
      g02("LGA10900", "38", "2200", "3.0"),
      g02("LGA19999", "50", "1800", "1.9"))) // full-outer test

    // ---- LGA geography (c1 key, c2 code, c3 'NAME (A)') ---------------
    val lgaCols = Seq("k", "code", "label")
    writeCsv(dir, "LGA_2020_NSW.csv", lgaCols, Seq(
      Map("k" -> "LGA10050", "code" -> "10050", "label" -> "SYDNEY (A)"),
      Map("k" -> "LGA10470", "code" -> "10470", "label" -> "NORTHERN BEACHES (A)"),
      Map("k" -> "LGA10900", "code" -> "10900", "label" -> "STRATHFIELD (A)")))

    writeSsc(dir)
  }

  /** SSC suburbs (c1 lga key, c3 'Suburb (NSW)', c6 area); PYRMONT
    * appears under two LGAs with different total areas. Public and
    * parameterized so the refresh spec can EDIT the dim in place:
    * shrinking Pyrmont's LGA10050 area below LGA10470's flips the
    * largest-area winner, changing fact rows for Pyrmont listings. */
  def writeSsc(dir: Path, pyrmontSydneyArea: String = "50"): Unit = {
    val sscCols = Seq("k", "u1", "suburb", "u2", "u3", "area")
    def ssc(key: String, suburb: String, area: String) =
      Map("k" -> key, "suburb" -> suburb, "area" -> area)
    writeCsv(dir, "SSC_2016_AUST.csv", sscCols, Seq(
      ssc("LGA10050", "Sydney (NSW)", "30"),
      ssc("LGA10050", "Pyrmont (NSW)", pyrmontSydneyArea),
      ssc("LGA10050", "Bondi Beach (NSW)", "20"),
      ssc("LGA10470", "North Curl Curl (NSW)", "40"),
      ssc("LGA10470", "Northern Beaches (NSW)", "35"),
      ssc("LGA10470", "Pyrmont (NSW)", "5"),
      ssc("LGA10900", "Strathfield (NSW)", "25")))
  }

  /** A month whose every row is dropped by the fact filters (NULL
    * price, design.sql:459) — exercises the refresh path where a tick
    * commits zero rows and the fact must stay readable. */
  def writeAllFiltered(dir: Path, name: String): Unit =
    writeCsv(dir, name, C, Seq(
      listing("id" -> "999", "name" -> "Ghost", "last_scraped" -> "2020-09-05",
        "host_id" -> "100", "price" -> "", "has_availability" -> "t")))
}
