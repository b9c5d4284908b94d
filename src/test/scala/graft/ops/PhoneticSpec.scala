package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PhoneticSpec extends SparkSpec {
  import spark.implicits._

  private def sx(names: String*): Map[String, String] =
    names.toSeq.toDF("w")
      .select($"w", Phonetic.soundex($"w").as("sx"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("soundex matches the canonical reference vectors") {
    // the NARA / Knuth test set, including the h/w transparency cases
    val m = sx("Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
      "Pfister", "Honeyman", "Washington", "Jackson", "Gutierrez")
    assert(m("Robert") == "R163" && m("Rupert") == "R163")
    assert(m("Ashcraft") == "A261", "h-transparency: s,c must merge")
    assert(m("Ashcroft") == "A261")
    assert(m("Tymczak") == "T522", "vowel-separated duplicates code twice")
    assert(m("Pfister") == "P236", "first-letter run absorbs same-class f")
    assert(m("Honeyman") == "H555")
    assert(m("Washington") == "W252")
    assert(m("Jackson") == "J250")
    assert(m("Gutierrez") == "G362")
  }

  test("soundex edge cases: case, punctuation, transparent first letter, no letters") {
    val m = sx("o'hara", "OHARA", "Hb", "A", "Aeiou", "123", "", "h")
    assert(m("o'hara") == "O600" && m("OHARA") == "O600")
    // first letter H contributes no class: the b must survive
    assert(m("Hb") == "H100")
    assert(m("A") == "A000" && m("Aeiou") == "A000")
    assert(m("123") == null && m("") == null)
    assert(m("h") == "H000")
  }

  test("soundex is total on the real document vocabulary (no errors, valid shape)") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"text".isNotNull)
      .select(explode(split(lower($"text"), " ")).as("w")).distinct()
    val out = toks.select(Phonetic.soundex($"w").as("sx"))
      .filter($"sx".isNotNull)
    val bad = out.filter(!$"sx".rlike("^[A-Z][0-9]{3}$"))
    assert(bad.count() == 0, "every non-null code is letter + 3 digits")
    assert(out.count() > 0)
  }
}
