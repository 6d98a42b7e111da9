package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val quotes = Seq(
    ("ACME", ts("2020-01-01 10:00:00"), 10.0),
    ("ACME", ts("2020-01-01 11:00:00"), 11.0),
    ("ACME", ts("2020-01-01 12:00:00"), 12.0),
    ("ZETA", ts("2020-01-01 10:30:00"), 5.0))
    .toDF("symbol", "qts", "price")

  test("each fact picks the nearest past dim value, inclusive at ties") {
    val trades = Seq(
      (1L, "ACME", ts("2020-01-01 10:30:00")),  // after 10:00 quote
      (2L, "ACME", ts("2020-01-01 11:00:00")),  // tie: 11:00 quote matches
      (3L, "ACME", ts("2020-01-01 23:00:00")),  // latest quote
      (4L, "ACME", ts("2020-01-01 09:00:00")),  // before any quote -> null
      (5L, "ZETA", ts("2020-01-01 10:45:00")),
      (6L, "NOPE", ts("2020-01-01 10:45:00")))  // unknown key -> null
      .toDF("tid", "symbol", "tts")
    val out = AsOfJoin.asOfJoin(trades, quotes, "symbol", "tts", "qts",
        payload = Seq("price"))
      .orderBy("tid").collect()
    out.map(r => if (r.isNullAt(r.fieldIndex("price"))) null
                 else r.getAs[Double]("price")) shouldBe
      Array(10.0, 11.0, 12.0, null, 5.0, null)
    out.length shouldBe 6 // left semantics: all facts kept
  }

  test("fact columns pass through unchanged") {
    val trades = Seq((1L, "ACME", ts("2020-01-01 10:30:00"), "extra"))
      .toDF("tid", "symbol", "tts", "note")
    val out = AsOfJoin.asOfJoin(trades, quotes, "symbol", "tts", "qts",
      payload = Seq("price"))
    out.columns.toSeq shouldBe Seq("tid", "symbol", "tts", "note", "price")
    out.collect()(0).getAs[String]("note") shouldBe "extra"
  }
}
