package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 kernel semantics per models/silver/accounts.sql:35-57:
  * end_timestamp = next change − 1 ms, open row gets the 9999 sentinel,
  * is_current marks exactly the latest version.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("three versions chain with -1ms ends and one sentinel") {
    val log = Seq(
      (1L, ts("2020-01-01 00:00:00"), "v1"),
      (1L, ts("2020-06-01 12:00:00"), "v2"),
      (1L, ts("2021-01-01 00:00:00.500"), "v3"),
      (2L, ts("2020-03-01 00:00:00"), "only"))
      .toDF("id", "change_ts", "payload")

    val out = Scd2.scd2(log, Seq("id"), "change_ts")
      .orderBy("id", "effective_timestamp")
      .select("id", "effective_timestamp", "end_timestamp", "is_current")
      .collect()

    out.map(_.getTimestamp(1)) shouldBe Array(
      ts("2020-01-01 00:00:00"), ts("2020-06-01 12:00:00"),
      ts("2021-01-01 00:00:00.500"), ts("2020-03-01 00:00:00"))
    out.map(_.getTimestamp(2)) shouldBe Array(
      ts("2020-06-01 11:59:59.999"),          // next eff - 1ms
      ts("2021-01-01 00:00:00.499"),          // sub-second eff - 1ms
      ts(Scd2.SentinelEnd),                   // open row
      ts(Scd2.SentinelEnd))                   // single-version entity
    out.map(_.getBoolean(3)) shouldBe Array(false, false, true, true)
  }

  test("tie-break column makes same-timestamp versions deterministic") {
    val log = Seq(
      (1L, ts("2020-01-01 00:00:00"), 1L),
      (1L, ts("2020-01-01 00:00:00"), 2L)).toDF("id", "change_ts", "seq")
    val out = Scd2.scd2(log, Seq("id"), "change_ts", tieBreak = Seq("seq"))
      .orderBy("seq").collect()
    // seq=2 sorts first DESC => is_current; seq=1 closed at eff-1ms
    out.map(_.getAs[Boolean]("is_current")) shouldBe Array(false, true)
    out(0).getAs[java.sql.Timestamp]("end_timestamp") shouldBe
      ts("2019-12-31 23:59:59.999")
  }

  test("versions of one entity never overlap and cover to sentinel") {
    val log = (1 to 50).map(i => (i % 5L, ts(f"2020-01-${i % 28 + 1}%02d 00:00:00"), i))
      .toDF("id", "change_ts", "v")
    val out = Scd2.scd2(log.dropDuplicates("id", "change_ts"), Seq("id"), "change_ts")
    // every non-current row's end = successor's eff - 1ms; exactly one current per id
    out.groupBy("id").agg(sum(when($"is_current", 1).otherwise(0)).as("n_cur"))
      .collect().foreach(_.getLong(1) shouldBe 1L)
    val overlaps = out.as("a").join(out.as("b"),
      $"a.id" === $"b.id" && $"a.effective_timestamp" < $"b.effective_timestamp" &&
        $"a.end_timestamp" >= $"b.effective_timestamp")
    overlaps.count() shouldBe 0L
  }
}
