package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temporal-join semantics per models/silver/cash_transactions.sql:13-20:
  * equi key + inclusive BETWEEN on [effective, end].
  */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dim = Seq(
    (1L, "v1", ts("2020-01-01 00:00:00"), ts("2020-06-30 23:59:59.999")),
    (1L, "v2", ts("2020-07-01 00:00:00"), ts("9999-12-31 23:59:59.999")),
    (2L, "w1", ts("2020-01-01 00:00:00"), ts("9999-12-31 23:59:59.999")))
    .toDF("k", "version", "effective_timestamp", "end_timestamp")

  test("boundary instants are inclusive on both ends") {
    val fact = Seq(
      (100L, 1L, ts("2020-01-01 00:00:00")),  // == eff of v1
      (101L, 1L, ts("2020-06-30 23:59:59.999")), // == end of v1
      (102L, 1L, ts("2020-07-01 00:00:00")),  // == eff of v2
      (103L, 1L, ts("2020-03-15 12:00:00")),  // interior of v1
      (104L, 3L, ts("2020-03-15 12:00:00")))  // no dim entity -> dropped (inner)
      .toDF("fid", "k", "ftimes")
    val out = TemporalJoin.temporalJoin(fact, dim, fact("k"), dim("k"), fact("ftimes"))
      .select("fid", "version").orderBy("fid").as[(Long, String)].collect()
    out shouldBe Array((100L, "v1"), (101L, "v1"), (102L, "v2"), (103L, "v1"))
  }

  test("left join keeps unmatched facts with null dim attrs") {
    val fact = Seq((104L, 3L, ts("2020-03-15 12:00:00"))).toDF("fid", "k", "ftimes")
    val out = TemporalJoin.temporalJoin(fact, dim, fact("k"), dim("k"),
      fact("ftimes"), joinType = "left").select("fid", "version").collect()
    out.length shouldBe 1
    out(0).isNullAt(1) shouldBe true
  }

  test("each fact row matches exactly one SCD2 version") {
    // versions from the SCD2 kernel partition time; a timestamp hits 1 row
    val log = Seq((1L, ts("2020-01-01 00:00:00")), (1L, ts("2020-07-01 00:00:00")),
      (1L, ts("2021-01-01 00:00:00"))).toDF("k", "change_ts")
    val scd = Scd2.scd2(log, Seq("k"), "change_ts")
    val facts = (0 until 400).map(i =>
      (i.toLong, 1L, ts(f"${2020 + i % 2}%d-${i % 12 + 1}%02d-${i % 28 + 1}%02d 10:00:00")))
      .toDF("fid", "k", "ftimes")
    val joined = TemporalJoin.temporalJoin(facts, scd, facts("k"), scd("k"), facts("ftimes"))
    joined.groupBy("fid").count().filter($"count" =!= 1).count() shouldBe 0L
    joined.count() shouldBe 400L
  }

  test("dual-key fallback coalesces first match over second") {
    val sentinel = ts("9999-12-31 23:59:59.999")
    val companies = Seq(
      (10L, "Acme Corp", "A-attrs", ts("2020-01-01 00:00:00"), sentinel),
      (20L, "Beta Inc", "B-attrs", ts("2020-01-01 00:00:00"), sentinel))
      .toDF("company_id", "name", "attrs", "effective_timestamp", "end_timestamp")
    val fin = Seq(
      (1L, Some(10L), None: Option[String], ts("2020-02-01 00:00:00")), // by cik
      (2L, None: Option[Long], Some("Beta Inc"), ts("2020-02-01 00:00:00")), // by name
      (3L, Some(99L), Some("Nobody"), ts("2020-02-01 00:00:00")))       // no match
      .toDF("fid", "cik", "co_name", "pts")
    val out = TemporalJoin.dualKeyTemporalJoin(fin, companies,
      (fin("cik"), d => d("__k1_company_id")),
      (fin("co_name"), d => d("__k2_name")),
      fin("pts"), attrs = Seq("attrs", "company_id"))
    val rows = out.select("fid", "attrs").orderBy("fid").collect()
    rows.map(r => Option(r.getString(1)).orNull) shouldBe Array("A-attrs", "B-attrs", null)
  }
}
