package graft.models

import graft.SparkSpec
import java.nio.file.Files

/** CustomerMgmt.xml flatten (tpcdi.py:265-331) through Spark's native
  * XML source with the explicit action schema, including the
  * empty-vs-null phone separator trap (SURVEY §7.4.8).
  */
class CustomerXmlSpec extends SparkSpec {
  import spark.implicits._

  private val xmlDoc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<TPCDI:Actions xmlns:TPCDI="http://tpc.org">
      | <TPCDI:Action ActionType="NEW" ActionTS="2015-01-11T13:21:12">
      |  <Customer C_ID="42" C_TAX_ID="300-42-9954" C_GNDR="F" C_TIER="2" C_DOB="1986-04-11">
      |   <Name><C_L_NAME>Doe</C_L_NAME><C_F_NAME>Jane</C_F_NAME><C_M_NAME>Q</C_M_NAME></Name>
      |   <Address><C_ADLINE1>1 Elm St</C_ADLINE1><C_ZIPCODE>94105</C_ZIPCODE><C_CITY>SF</C_CITY><C_STATE_PROV>CA</C_STATE_PROV><C_CTRY>USA</C_CTRY></Address>
      |   <ContactInfo><C_PRIM_EMAIL>jane@x.com</C_PRIM_EMAIL>
      |    <C_PHONE_1><C_CTRY_CODE>1</C_CTRY_CODE><C_AREA_CODE>415</C_AREA_CODE><C_LOCAL>5550100</C_LOCAL><C_EXT>22</C_EXT></C_PHONE_1>
      |    <C_PHONE_2><C_CTRY_CODE></C_CTRY_CODE><C_AREA_CODE>415</C_AREA_CODE><C_LOCAL>5550101</C_LOCAL><C_EXT></C_EXT></C_PHONE_2>
      |    <C_PHONE_3><C_LOCAL>5550102</C_LOCAL></C_PHONE_3>
      |   </ContactInfo>
      |   <TaxInfo><C_LCL_TX_ID>CA1</C_LCL_TX_ID><C_NAT_TX_ID>US1</C_NAT_TX_ID></TaxInfo>
      |   <Account CA_ID="7" CA_TAX_ST="1"><CA_B_ID>99</CA_B_ID><CA_NAME>Main</CA_NAME></Account>
      |  </Customer>
      | </TPCDI:Action>
      | <TPCDI:Action ActionType="UPDACCT" ActionTS="2015-02-01T09:00:00">
      |  <Customer C_ID="42"><Account CA_ID="7" CA_TAX_ST="2"><CA_B_ID>99</CA_B_ID></Account></Customer>
      | </TPCDI:Action>
      |</TPCDI:Actions>
      |""".stripMargin

  private lazy val flat = {
    val dir = Files.createTempDirectory("custxml")
    val f = dir.resolve("CustomerMgmt.xml")
    Files.writeString(f, xmlDoc)
    CustomerXml.customerMgmt(spark, f.toString).cache()
  }

  test("rowTag yields one row per Action with parsed attributes") {
    flat.count() shouldBe 2L
    val r = flat.orderBy("action_ts").collect()(0)
    r.getAs[java.sql.Timestamp]("action_ts") shouldBe ts("2015-01-11 13:21:12")
    r.getAs[String]("action_type") shouldBe "NEW"
    r.getAs[Long]("c_id") shouldBe 42L
    r.getAs[Long]("c_tier") shouldBe 2L
    r.getAs[java.sql.Date]("c_dob") shouldBe d("1986-04-11")
    r.getAs[String]("c_l_name") shouldBe "Doe"
    r.getAs[String]("ca_id") shouldBe "7"
    r.getAs[Long]("ca_tax_st") shouldBe 1L
    r.getAs[Long]("ca_b_id") shouldBe 99L
  }

  test("phone concat: full, missing-ctry/ext, local-only cases") {
    val r = flat.orderBy("action_ts").collect()(0)
    r.getAs[String]("c_phone_1") shouldBe "1-415-5550100 ext: 22"
    r.getAs[String]("c_phone_2") shouldBe "415-5550101"
    r.getAs[String]("c_phone_3") shouldBe "5550102"
  }

  test("sparse UPDACCT action leaves customer attrs null, account typed") {
    val r = flat.orderBy("action_ts").collect()(1)
    r.getAs[String]("action_type") shouldBe "UPDACCT"
    r.isNullAt(r.fieldIndex("c_l_name")) shouldBe true
    r.getAs[Long]("ca_tax_st") shouldBe 2L
    // phones on a row with no ContactInfo: all parts empty -> empty string
    r.getAs[String]("c_phone_1") shouldBe ""
  }
}
