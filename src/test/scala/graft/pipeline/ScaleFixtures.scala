package graft.pipeline

import java.io.BufferedWriter
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Reference-SCALE raw fixtures (BASELINE.md rows 12–14): twelve
  * monthly listings CSVs 05_2020 … 04_2021, 31–38k rows each, ~414k
  * rows total, with the reference's real schema-variant split — 106
  * columns for 05/06_2020 (mixed-case headers), 102 for 07_2020, the
  * canonical 74 for the other nine — plus the census/geography side
  * files. Unlike [[Fixtures]] (13 hand-crafted dirty rows), every row
  * here follows a CLOSED-FORM recipe so the four KPI views have exact
  * hand-computable goldens at full scale:
  *
  * Per month m (1..12) and suburb s (0..3), N = 7700 + 140·m rows
  * with j = 0..N−1:
  *   - id = m·1e6 + s·250_000 + j  (unique), host_id = id
  *   - suburb cycle: Sydney / Pyrmont / Bondi Beach (all LGA SYDNEY)
  *     and North Curl Curl (LGA NORTHERN BEACHES)
  *   - host_is_superhost = 't' iff j % 4 == 0  → N/4 per suburb
  *   - has_availability  = 't' iff j % 2 == 0  → N/2 per suburb
  *   - price = $(100 + j % 10).00; availability_30 = 10 when active
  *     → est_revenue_active per suburb = Σ_{j even} 20·(100 + j%10)
  *       = 20·(50N + 2N) = 1040·N   (N % 20 == 0 keeps this exact)
  *   - property_type = Apartment iff j even (House otherwise),
  *     room_type = Entire home/apt, accommodates = 2
  *   - last_scraped = the 15th of the file month (all rows valid)
  *   - the first 100 ids of suburb 0 get a DUPLICATE row scraped on
  *     the 14th → staging's (id, filename) dedup must drop exactly
  *     100 rows per file, keeping the 15th-scraped originals
  *
  * Raw rows per file = 4N + 100 ∈ [31,560 .. 37,720]; total 414,480.
  */
object ScaleFixtures {

  val months: Seq[(Int, Int)] = // (month, year), 05_2020 .. 04_2021
    (5 to 12).map((_, 2020)) ++ (1 to 4).map((_, 2021))

  /** Per-suburb row count for month index m (1-based). */
  def rowsPerSuburb(m: Int): Int = 7700 + 140 * m

  val suburbs: Seq[String] =
    Seq("Sydney", "Pyrmont", "Bondi Beach", "North Curl Curl")

  private val extras = Seq("summary", "space", "experiences_offered",
    "notes", "transit", "access", "interaction", "house_rules",
    "thumbnail_url", "medium_url", "xl_picture_url", "street", "city",
    "state", "zipcode", "market", "smart_location", "country_code",
    "country", "is_location_exact", "square_feet", "weekly_price",
    "monthly_price", "security_deposit", "cleaning_fee",
    "guests_included", "extra_people", "has_license",
    "jurisdiction_names", "cancellation_policy",
    "require_guest_profile_picture",
    "require_guest_phone_verification", "region_id", "region_name")

  private def quote(v: String): String =
    "\"" + v.replace("\"", "\"\"") + "\""

  def writeAll(dir: Path): Long = {
    Files.createDirectories(dir)
    val C = ListingSchema.columns
    var total = 0L
    months.zipWithIndex.foreach { case ((month, year), i) =>
      val m = i + 1
      // the reference's schema-variant split (BASELINE.md row 14)
      val (cols, headerCase) =
        if (m <= 2) // 05/06_2020: 106 cols, mixed-case headers
          ((C.filterNot(Set("bathrooms_text", "number_of_reviews_l30d"))
            ++ extras), true)
        else if (m == 3) // 07_2020: 102 cols
          ((C.filterNot(Set("number_of_reviews_l30d", "bathrooms"))
            ++ extras.take(30)), false)
        else (C, false)
      val header = if (headerCase) cols.map(_.capitalize) else cols
      val name = f"listings_$month%02d_$year%d.csv"
      val w = new BufferedWriter(Files.newBufferedWriter(
        dir.resolve(name), StandardCharsets.UTF_8), 1 << 20)
      w.write(header.map(quote).mkString(","))
      val idx = cols.zipWithIndex.toMap
      val n = rowsPerSuburb(m)
      val scraped15 = f"$year%d-$month%02d-15"
      val scraped14 = f"$year%d-$month%02d-14"
      def emit(s: Int, j: Int, dup: Boolean): Unit = {
        val id = m * 1000000L + s * 250000L + j
        val fields = new Array[String](cols.length)
        java.util.Arrays.fill(fields.asInstanceOf[Array[AnyRef]], "")
        def put(c: String, v: String): Unit =
          idx.get(c).foreach(fields(_) = v)
        put("id", id.toString)
        put("name", if (dup) s"Dup $id" else s"Listing $id")
        put("last_scraped", if (dup) scraped14 else scraped15)
        put("host_id", id.toString)
        put("host_location", s"${suburbs(s)}, New South Wales, Australia")
        put("host_is_superhost", if (j % 4 == 0) "t" else "f")
        put("neighbourhood", suburbs(s))
        put("neighbourhood_cleansed", suburbs(s))
        put("property_type", if (j % 2 == 0) "Apartment" else "House")
        put("room_type", "Entire home/apt")
        put("accommodates", "2")
        put("price", s"$$${100 + j % 10}.00")
        put("has_availability", if (j % 2 == 0) "t" else "f")
        put("availability_30", if (j % 2 == 0) "10" else "0")
        w.write("\n")
        w.write(fields.map(quote).mkString(","))
        total += 1
      }
      for (s <- 0 until 4; j <- 0 until n) emit(s, j, dup = false)
      for (j <- 0 until 100) emit(0, j, dup = true) // per-file dup block
      w.close()
    }
    // census + geography side files — the Fixtures content verbatim
    // (the pipeline needs them; the scale goldens don't touch census)
    def writeSmall(name: String, header: Seq[String],
                   rows: Seq[Map[String, String]]): Unit = {
      val lines = header.map(quote).mkString(",") +:
        rows.map(r => header.map(h =>
          quote(r.getOrElse(h.toLowerCase, ""))).mkString(","))
      Files.write(dir.resolve(name),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    val g01Cols = (1 to 70).map(i => s"x$i")
    writeSmall("2021Census_G01_NSW_LGA.csv", g01Cols, Seq(
      Map("x1" -> "LGA10050", "x4" -> "200000", "x55" -> "4000", "x70" -> "150000"),
      Map("x1" -> "LGA10470", "x4" -> "90000", "x55" -> "1200", "x70" -> "70000")))
    val g02Cols = (1 to 9).map(i => s"y$i")
    writeSmall("2021Census_G02_NSW_LGA.csv", g02Cols, Seq(
      Map("y1" -> "LGA10050", "y2" -> "35", "y3" -> "2400", "y9" -> "2.1"),
      Map("y1" -> "LGA10470", "y2" -> "41", "y3" -> "2600", "y9" -> "2.8")))
    writeSmall("LGA_2020_NSW.csv", Seq("k", "code", "label"), Seq(
      Map("k" -> "LGA10050", "code" -> "10050", "label" -> "SYDNEY (A)"),
      Map("k" -> "LGA10470", "code" -> "10470", "label" -> "NORTHERN BEACHES (A)")))
    val sscCols = Seq("k", "u1", "suburb", "u2", "u3", "area")
    def ssc(key: String, suburb: String, area: String) =
      Map("k" -> key, "suburb" -> suburb, "area" -> area)
    writeSmall("SSC_2016_AUST.csv", sscCols, Seq(
      ssc("LGA10050", "Sydney (NSW)", "30"),
      ssc("LGA10050", "Pyrmont (NSW)", "50"),
      ssc("LGA10050", "Bondi Beach (NSW)", "20"),
      ssc("LGA10470", "North Curl Curl (NSW)", "40"),
      ssc("LGA10470", "Northern Beaches (NSW)", "35")))
    total
  }
}
