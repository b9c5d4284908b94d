package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val asOf1 = lit("2020-01-01").cast("date")
  private val asOf2 = lit("2020-02-01").cast("date")

  // month-1 snapshot: entities 1..4 (4 has a NULL attribute)
  private def snap1 = Seq(
    (1L, Some("A"), 10.0), (2L, Some("B"), 20.0),
    (3L, Some("C"), 30.0), (4L, None, 40.0)
  ).toDF("id", "attr", "score")

  // month-2: 1 unchanged, 2 changed, 3 deleted, 4 NULL→NULL unchanged,
  // 5 brand new
  private def snap2 = Seq(
    (1L, Some("A"), 10.0), (2L, Some("B2"), 21.0),
    (4L, None, 40.0), (5L, Some("E"), 50.0)
  ).toDF("id", "attr", "score")

  private def merged = Snapshot.scd2Merge(
    Snapshot.scd2Init(snap1, asOf1), snap2,
    keyCols = Seq("id"), attrCols = Seq("attr", "score"), asOf = asOf2)

  test("all four merge outcomes: unchanged, changed, new, soft-deleted") {
    val rows = merged
      .select($"id", $"attr", $"valid_from".cast("string"),
        $"valid_to".cast("string"), $"is_current")
      .as[(Long, Option[String], String, Option[String], Boolean)]
      .collect().toSet
    assert(rows == Set(
      (1L, Some("A"), "2020-01-01", None, true),               // unchanged
      (4L, None, "2020-01-01", None, true),                    // NULL<=>NULL unchanged
      (2L, Some("B"), "2020-01-01", Some("2020-02-01"), false), // closed old version
      (2L, Some("B2"), "2020-02-01", None, true),              // opened new version
      (3L, Some("C"), "2020-01-01", Some("2020-02-01"), false), // soft delete
      (5L, Some("E"), "2020-02-01", None, true)))              // brand new
  }

  test("exactly one current row per live entity; history rows closed") {
    val current = merged.filter($"is_current")
    assert(current.groupBy($"id").count().filter($"count" > 1).isEmpty)
    assert(merged.filter(!$"is_current" && $"valid_to".isNull).isEmpty)
  }

  test("a second merge with an identical snapshot is a no-op on current rows") {
    val again = Snapshot.scd2Merge(merged, snap2,
      Seq("id"), Seq("attr", "score"), lit("2020-03-01").cast("date"))
    // nothing newly closed at 2020-03-01, nothing opened
    assert(again.filter($"valid_to" === lit("2020-03-01").cast("date")).isEmpty)
    assert(again.filter($"valid_from" === lit("2020-03-01").cast("date")).isEmpty)
    assert(again.count() == merged.count())
  }

  test("closed history rows pass through merges untouched") {
    val third = Snapshot.scd2Merge(merged,
      Seq((1L, Some("A"), 10.0)).toDF("id", "attr", "score"),
      Seq("id"), Seq("attr", "score"), lit("2020-03-01").cast("date"))
    val history = third.filter(!$"is_current" && $"valid_to" === asOf2)
      .select($"id").as[Long].collect().toSet
    assert(history == Set(2L, 3L)) // the month-2 closures survive verbatim
  }

  test("contentDiff: added/removed/changed classified; unchanged absent") {
    val oldSnap = Seq((1L, "same"), (2L, "before"), (3L, "gone"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "same"), (2L, "after"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val out = Snapshot.contentDiff(oldSnap, newSnap, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // digest sides: absent side NULL, present side non-null
    val rows = Snapshot.contentDiff(oldSnap, newSnap, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> ((r.isNullAt(2), r.isNullAt(3)))).toMap
    assert(rows(3L) == ((false, true)) && rows(4L) == ((true, false))
      && rows(2L) == ((false, false)))
  }

  test("cdcApply: latest change wins per key — update, delete, insert, conflict, passthrough") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val changes = Seq(
      (2L, "b2", 1L, "U"),  // update
      (3L, "c", 5L, "D"),   // delete
      (4L, "d1", 1L, "U"),  // conflict: later delete must win...
      (4L, "dX", 2L, "D"),
      (5L, "e", 1L, "I"),   // insert new key
      (6L, "f1", 1L, "I"),  // insert then update: update wins
      (6L, "f2", 2L, "U")
    ).toDF("k", "v", "seq", "op")
    val out = Snapshot.cdcApply(base, changes, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 5L -> "e", 6L -> "f2"),
      s"got $out")
  }

  test("cdcApply: empty change log is the identity; output schema equals snapshot") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val none = Seq.empty[(Long, String, Long, String)].toDF("k", "v", "seq", "op")
    val out = Snapshot.cdcApply(base, none, Seq("k"), "seq", "op")
    assert(out.columns.toSeq == base.columns.toSeq)
    assert(out.as[(Long, String)].collect().toMap == Map(1L -> "a", 2L -> "b"))
  }
}
