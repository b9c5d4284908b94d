package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Phonetic encodings for entity-resolution blocking — the classic
  * complement to edit-distance/Jaro-Winkler matching
  * ([[graft.queries.ExtensionQueries]] `x_er_jarowinkler`): names that
  * SOUND alike block together even when they spell apart, so the
  * pairwise matcher runs inside phonetic buckets instead of all-pairs.
  *
  * American Soundex (the original Russell/Odell coding, the variant
  * every SQL warehouse ships): retain the first letter; map consonants
  * to digit classes (BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6); vowels
  * (AEIOUY) separate runs; H and W are TRANSPARENT — same-class
  * consonants separated only by h/w collapse into one digit (the rule
  * that distinguishes real Soundex from naive run-length coding:
  * Ashcraft → A261, not A226); pad/truncate to letter + 3 digits.
  *
  * Implemented entirely with codegen'd native functions — translate
  * for the 26-letter class map, higher-order filter (with index) for
  * the h/w strip and adjacent-duplicate collapse — no UDF, no regex
  * backreferences (RE2-based engines can't replay those), so a SQL
  * engine reruns the identical array pipeline (see [[soundexSqlCtes]]).
  * Per-row O(len) work; embarrassingly parallel at any scale.
  */
object Phonetic {

  private val Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  // A0 B1 C2 D3 E0 F1 G2 H9 I0 J2 K2 L4 M5 N5 O0 P1 Q2 R6 S2 T3 U0 V1
  // W9 X2 Y0 Z2 — '9' marks the transparent letters (H, W)
  private val Classes = "01230129022455012623019202"

  /** Soundex code of `name` (letter + 3 digits, e.g. Robert → R163),
    * or NULL when the value contains no ASCII letter. Non-letters are
    * ignored; case-insensitive. */
  def soundex(name: Column): Column = {
    val letters = regexp_replace(upper(name), "[^A-Z]", "")
    // per-letter digit classes, aligned with `letters`
    val cs = split(translate(letters, Alphabet, Classes), "")
    // strip the transparent marks (and split's trailing empty token)
    // BEFORE collapsing, so h/w-separated duplicates become adjacent
    val cl = filter(cs, c => c =!= "9" && c =!= "")
    // collapse adjacent duplicates; i is 0-based, element_at 1-based,
    // so element_at(cl, i) is the previous element. greatest(i, 1)
    // keeps ANSI element_at off index 0 on the first element (the
    // i === 0 arm already accepts it).
    val collapsed = filter(cl, (c, i) =>
      (i === lit(0)) || c =!= element_at(cl, greatest(i, lit(1))))
    val firstL = substring(letters, 1, 1)
    // the first letter's own class leads the collapsed run and is not
    // emitted as a digit — unless the first letter is transparent
    // (H/W), which contributed no class at all
    val tail = when(firstL.isin("H", "W"), collapsed)
      .otherwise(slice(collapsed, lit(2), greatest(size(collapsed) - 1, lit(1))))
    val digits = filter(tail, c => c =!= "0")
    when(length(letters) === 0, lit(null).cast("string"))
      .otherwise(concat(firstL, rpad(concat_ws("", slice(digits, 1, 3)), 3, "0")))
  }

  /** DuckDB CTE chain computing [[soundex]] over `srcCte`'s column
    * `valCol`, carrying `keyCols` through; final CTE `__sx_out` has
    * (keyCols..., valCol, sx). Array comprehensions replay the same
    * strip/collapse pipeline index-for-index. */
  def soundexSqlCtes(srcCte: String, valCol: String,
                     keyCols: Seq[String] = Nil): String = {
    val ks = keyCols.map(k => s"$k, ").mkString
    s"""__sx_s1 AS (
      SELECT $ks$valCol,
        regexp_replace(upper($valCol), '[^A-Z]', '', 'g') AS letters
      FROM $srcCte),
    __sx_s2 AS (
      SELECT $ks$valCol, letters,
        translate(letters, '$Alphabet', '$Classes') AS cs
      FROM __sx_s1),
    __sx_s3 AS (
      SELECT $ks$valCol, letters,
        [cs[i] for i in range(1, len(cs) + 1) if cs[i] != '9'] AS cl
      FROM __sx_s2),
    __sx_s4 AS (
      SELECT $ks$valCol, letters,
        [cl[i] for i in range(1, len(cl) + 1)
         if i = 1 or cl[i] != cl[i-1]] AS coll
      FROM __sx_s3),
    __sx_s5 AS (
      SELECT $ks$valCol, letters,
        CASE WHEN letters[1] IN ('H', 'W') THEN coll ELSE coll[2:] END AS d0
      FROM __sx_s4),
    __sx_out AS (
      SELECT $ks$valCol,
        CASE WHEN len(letters) = 0 THEN NULL
             ELSE letters[1] || rpad(coalesce(
               array_to_string([c for c in d0 if c != '0'][1:3], ''), ''),
               3, '0') END AS sx
      FROM __sx_s5)"""
  }
}
