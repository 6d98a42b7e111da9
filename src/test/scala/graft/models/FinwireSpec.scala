package graft.models

import graft.SparkSpec

/** FINWIRE fixed-width multi-record parse (FIXTURES.md §A; layouts from
  * tpcdi.py:452-535). Fixture lines are synthesized at the exact column
  * offsets — one per record type, mirroring the reference's 3-record
  * sample (devrel/multi-record.txt).
  */
class FinwireSpec extends SparkSpec {
  import spark.implicits._

  /** Build a fixed-width line from (start,len,value) specs (1-based). */
  private def line(totalLen: Int, fields: (Int, Int, String)*): String = {
    val sb = new StringBuilder(" " * totalLen)
    fields.foreach { case (start, len, v) =>
      val padded = v.padTo(len, ' ').take(len)
      sb.replace(start - 1, start - 1 + len, padded)
    }
    sb.toString
  }

  private val cmpLine = line(543,
    (1, 15, "20200315-143000"), (16, 3, "CMP"),
    (19, 60, "Acme Corporation"), (79, 10, "0000012345"), (89, 4, "ACTV"),
    (93, 2, "AB"), (95, 4, "AAA"), (99, 8, "19870105"),
    (107, 80, "1 Main St"), (187, 80, ""), (267, 12, "94105"),
    (279, 25, "San Francisco"), (304, 20, "CA"), (324, 24, "USA"),
    (348, 46, "Jane Doe"), (394, 150, "Makes everything"))

  private val secLine = line(220,
    (1, 15, "20200316-090000"), (16, 3, "SEC"),
    (19, 15, "ACME"), (34, 6, "COMMON"), (40, 4, "ACTV"),
    (44, 70, "Acme Common Stock"), (114, 6, "NYSE"),
    (120, 13, "1000000"), (133, 8, "19870106"), (141, 8, "19870107"),
    (149, 12, "0.42"), (161, 60, "0000012345"))

  private val finLine = line(246,
    (1, 15, "20200317-170000"), (16, 3, "FIN"),
    (19, 4, "2020"), (23, 1, "1"), (24, 8, "20200101"), (32, 8, "20200315"),
    (40, 17, "1000000.50"), (57, 17, "250000.25"), (74, 12, "1.25"),
    (86, 12, "1.20"), (98, 12, "0.25"), (110, 17, "50000"),
    (127, 17, "2000000"), (144, 17, "750000"), (161, 13, "1000000"),
    (174, 13, "1050000"), (187, 60, "Acme Corporation"))

  private lazy val parsed = {
    val raw = Seq(cmpLine, secLine, finLine).toDF("value")
    Finwire.parsePrefix(raw).cache()
  }

  test("prefix: pts timestamp + rec_type split the multi-record file") {
    val rows = parsed.select("pts", "rec_type").orderBy("pts").collect()
    rows.map(_.getString(1)) shouldBe Array("CMP", "SEC", "FIN")
    rows(0).getTimestamp(0) shouldBe ts("2020-03-15 14:30:00")
  }

  test("CMP extract: exact field slicing, founding_date trimmed+cast") {
    val c = Finwire.cmp(parsed).collect()(0)
    c.getAs[String]("company_name").trim shouldBe "Acme Corporation"
    c.getAs[String]("cik") shouldBe "0000012345"
    c.getAs[String]("status") shouldBe "ACTV"
    c.getAs[String]("industry_id") shouldBe "AB"
    c.getAs[String]("sp_rating").trim shouldBe "AAA"
    c.getAs[java.sql.Date]("founding_date") shouldBe d("1987-01-05")
    c.getAs[String]("city").trim shouldBe "San Francisco"
    // non-trimmed fields keep right padding (SURVEY §7.4.9)
    c.getAs[String]("company_name").length shouldBe 60
  }

  test("SEC typed: numbers/dates cast, cik-vs-name split picks cik") {
    val s = Finwire.secTyped(Finwire.sec(parsed)).collect()(0)
    s.getAs[String]("symbol") shouldBe "ACME"
    s.getAs[Long]("sh_out") shouldBe 1000000L
    s.getAs[java.sql.Date]("first_trade_date") shouldBe d("1987-01-06")
    s.getAs[Double]("dividend") shouldBe 0.42
    s.getAs[Long]("cik") shouldBe 12345L
    s.isNullAt(s.fieldIndex("company_name")) shouldBe true
  }

  test("FIN typed: cik-vs-name split picks company_name for non-numeric") {
    val f = Finwire.finTyped(Finwire.fin(parsed)).collect()(0)
    f.getAs[Int]("year") shouldBe 2020
    f.getAs[Int]("quarter") shouldBe 1
    f.getAs[java.sql.Date]("quarter_start_date") shouldBe d("2020-01-01")
    f.getAs[Double]("revenue") shouldBe 1000000.50
    f.getAs[Double]("eps") shouldBe 1.25
    f.getAs[Long]("sh_out") shouldBe 1000000L
    f.isNullAt(f.fieldIndex("cik")) shouldBe true
    f.getAs[String]("company_name") shouldBe "Acme Corporation"
  }
}
