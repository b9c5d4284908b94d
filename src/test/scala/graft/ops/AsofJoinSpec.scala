package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    ("A", t("2024-01-01 10:00:00"), 1L, 10.0),
    ("A", t("2024-01-01 10:05:00"), 2L, 11.0),
    ("A", t("2024-01-01 10:10:00"), 3L, 12.0),
    ("B", t("2024-01-01 10:07:00"), 4L, 99.0)
  ).toDF("sym", "ts", "quote_id", "px")

  private val trades = Seq(
    ("A", t("2024-01-01 10:03:00"), 100L), // after quote 1
    ("A", t("2024-01-01 10:05:00"), 101L), // exactly at quote 2
    ("A", t("2024-01-01 09:00:00"), 102L), // before any quote -> NULL
    ("B", t("2024-01-01 12:00:00"), 103L), // after quote 4
    ("C", t("2024-01-01 10:00:00"), 104L)  // no quotes for key -> NULL
  ).toDF("sym", "ts", "trade_id")

  test("backward inclusive: most recent quote at-or-before each trade") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "ts")
      .select($"trade_id", $"quote_id", $"px").as[(Long, Option[Long], Option[Double])]
      .collect().map { case (k, q, p) => k -> (q, p) }.toMap
    assert(out(100L) == (Some(1L), Some(10.0)))
    assert(out(101L) == (Some(2L), Some(11.0))) // equal ts matches
    assert(out(102L) == (None, None))
    assert(out(103L) == (Some(4L), Some(99.0)))
    assert(out(104L) == (None, None))
  }

  test("strict: equal-timestamp right row does not match") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "ts", strict = true)
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])].collect().toMap
    assert(out(101L).contains(1L)) // falls back to the earlier quote
    assert(out(100L).contains(1L))
  }

  test("forward direction: nearest quote at-or-after each trade") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "ts", direction = "forward")
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])].collect().toMap
    assert(out(100L).contains(2L)) // t=10:03 -> next quote 10:05
    assert(out(101L).contains(2L)) // equal ts matches forward too
    assert(out(102L).contains(1L)) // 09:00 -> first quote of the day
    assert(out(103L).isEmpty)      // 12:00: nothing after
    assert(out(104L).isEmpty)      // no quotes for key
    // strict forward skips the equal-ts quote
    val s = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "ts",
      strict = true, direction = "forward")
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])].collect().toMap
    assert(s(101L).contains(3L))
  }

  test("NULL key / NULL ts rows: left passes through unmatched, right never matches") {
    val l = Seq((Option("A"), Option(t("2024-01-01 10:06:00")), 1L),
      (None: Option[String], Option(t("2024-01-01 10:06:00")), 2L),
      (Option("A"), None: Option[Timestamp], 3L)).toDF("sym", "ts", "trade_id")
    val r = Seq((Option("A"), Option(t("2024-01-01 10:00:00")), 7.0),
      (None: Option[String], Option(t("2024-01-01 09:00:00")), 8.0), // NULL key: dropped
      (Option("A"), None: Option[Timestamp], 9.0)). // NULL ts: dropped
      toDF("sym", "ts", "px")
    val out = AsofJoin.asofJoin(l, r, Seq("sym"), "ts")
      .select($"trade_id", $"px").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(7.0), 2L -> None, 3L -> None))
    // forward depends on desc_NULLS_FIRST (plain .desc would put a
    // NULL-ts left row last, where it would see every right payload) —
    // pin the same unmatched guarantees on the mirror scan
    val fwd = AsofJoin.asofJoin(l, r, Seq("sym"), "ts", direction = "forward")
      .select($"trade_id", $"px").as[(Long, Option[Double])].collect().toMap
    assert(fwd == Map(1L -> None, 2L -> None, 3L -> None)) // 7.0 is before t=10:06
  }

  test("row counts: exactly one output row per left row; payload collision rejected") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "ts")
    assert(out.count() == trades.count())
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades, quotes.withColumnRenamed("px", "trade_id"),
        Seq("sym"), "ts")
    }
  }

  test("plan shape: one shuffle on the key, no join node, no cartesian blowup") {
    val plan = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }
}
