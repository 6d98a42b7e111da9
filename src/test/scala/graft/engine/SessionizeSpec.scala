package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // user A: two sessions split by a 31-minute gap; user B: one session
  private lazy val events = Seq(
    ("a", 1L, ts("2024-01-01 10:00:00"), 1.0),
    ("a", 2L, ts("2024-01-01 10:10:00"), 2.0),
    ("a", 3L, ts("2024-01-01 10:41:00"), 4.0), // 31 min after #2 -> new session
    ("a", 4L, ts("2024-01-01 10:50:00"), 8.0),
    ("b", 5L, ts("2024-01-01 09:00:00"), 1.5))
    .toDF("user_id", "event_id", "ts", "value")

  test("gap strictly greater than gapSeconds starts a new session") {
    val out = Sessionize.sessionize(events, "user_id", "ts", 1800L,
        tieBreak = Seq("event_id"))
      .select("user_id", "event_id", "session_id", "is_session_start")
      .orderBy("event_id").collect()
    out.map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))) shouldBe
      Array(("a", 1L, true), ("a", 1L, false),
        ("a", 2L, true), ("a", 2L, false), ("b", 1L, true))
  }

  test("a gap of exactly gapSeconds stays in the same session") {
    val e = Seq(("a", 1L, ts("2024-01-01 10:00:00"), 0.0),
      ("a", 2L, ts("2024-01-01 10:30:00"), 0.0)).toDF("user_id", "event_id", "ts", "value")
    Sessionize.sessionize(e, "user_id", "ts", 1800L, Seq("event_id"))
      .agg(max("session_id")).first().getLong(0) shouldBe 1L
  }

  test("sessionStats rolls up count, bounds, and integral cents") {
    val out = Sessionize.sessionStats(events, "user_id", "ts", 1800L, "value",
        tieBreak = Seq("event_id"))
      .orderBy("user_id", "session_id").collect()
    out.map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5))) shouldBe
      Array(("a", 1L, 2L, 300L), ("a", 2L, 2L, 1200L), ("b", 1L, 1L, 150L))
    out.head.getTimestamp(2) shouldBe ts("2024-01-01 10:00:00")
    out.head.getTimestamp(3) shouldBe ts("2024-01-01 10:10:00")
  }

  test("the two windows share one Exchange and one Sort") {
    val plan = Sessionize.sessionize(events, "user_id", "ts", 1800L, Seq("event_id"))
      .queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).size shouldBe 1
    // one sort for both lag and running-sum windows (same ordering)
    "(?i)\\bsort\\b".r.findAllIn(plan).size should be <= 2
  }
}
