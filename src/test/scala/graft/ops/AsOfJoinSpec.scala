package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("leftAsOf: latest right at-or-before, per key; null when none") {
    val quotes = Seq(
      (1L, t(0), 100.0), (1L, t(10), 110.0), (2L, t(5), 50.0)
    ).toDF("key", "ts", "px")
    val ticks = Seq(
      (1L, t(5), "a"),   // → 100.0 (10:00 quote)
      (1L, t(10), "b"),  // → 110.0 (<= semantics: same-ts quote wins)
      (1L, t(20), "c"),  // → 110.0
      (2L, t(1), "d"),   // → null (no quote yet)
      (3L, t(9), "e")    // → null (key never quoted)
    ).toDF("key", "ts", "tag")
    val out = AsOfJoin.leftAsOf(ticks, quotes, "key", "ts", Seq("px"))
      .select("key", "tag", "px")
    assert(rowsOf(out) === Seq(
      Seq("1", "a", "100.0"), Seq("1", "b", "110.0"), Seq("1", "c", "110.0"),
      Seq("2", "d", "null"), Seq("3", "e", "null")))
  }

  test("leftAsOf: a NULL payload on the latest right row wins (no resurrection)") {
    val quotes = Seq(
      (1L, t(0), Option(100.0)), (1L, t(10), None) // latest quote is NULL
    ).toDF("key", "ts", "px")
    val ticks = Seq((1L, t(15), "a")).toDF("key", "ts", "tag")
    val out = AsOfJoin.leftAsOf(ticks, quotes, "key", "ts", Seq("px")).collect()
    assert(out.length === 1 && out(0).isNullAt(out(0).fieldIndex("px")))
  }

  test("leftAsOf: multiple payload columns come from the SAME right row") {
    val quotes = Seq(
      (1L, t(0), Option(100.0), Option("A")),
      (1L, t(10), None, Option("B")) // latest row: px null, src B
    ).toDF("key", "ts", "px", "src")
    val ticks = Seq((1L, t(15), "a")).toDF("key", "ts", "tag")
    val r = AsOfJoin.leftAsOf(ticks, quotes, "key", "ts", Seq("px", "src")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("px")) && r.getString(r.fieldIndex("src")) === "B")
  }

  test("leftAsOf emits exactly one row per left row (no range-join blowup)") {
    val right = (1 to 50).map(i => (1L, t(i % 50), i * 1.0)).toDF("key", "ts", "px")
    val left = Seq((1L, t(49), "x")).toDF("key", "ts", "tag")
    assert(AsOfJoin.leftAsOf(left, right, "key", "ts", Seq("px")).count() === 1)
  }
}
