package graft.models

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Dialect

/** CustomerMgmt.xml flatten (reference loader tpcdi.py:265-331).
  *
  * Spark 4's native XML source replaces the reference's
  * STRIP_OUTER_ELEMENT + xmlget walk: `rowTag=TPCDI:Action` makes each
  * action element one row, attributes surface with the `_` prefix and
  * nested elements as struct fields — so the whole flatten is plain
  * nested-column projection, no per-field xmlget calls.
  */
object CustomerXml {

  /** Null-safe empty normalization: Snowflake's xmlget yields '' for
    * missing subelements, Spark's XML reader yields null (SURVEY §7.4.8);
    * the phone separator logic keys on ''.
    */
  private def nz(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** Phone assembly from nested C_CTRY_CODE/C_AREA_CODE/C_LOCAL/C_EXT
    * (reference get_phone_number, tpcdi.py:173-186): separator after
    * ctry/area only when the part is non-empty; " ext: " prefix only when
    * an extension exists.
    */
  def phoneNumber(ctry: Column, area: Column, local: Column, ext: Column,
                  separator: String = "-"): Column =
    concat(
      nz(ctry), when(nz(ctry) === "", "").otherwise(separator),
      nz(area), when(nz(area) === "", "").otherwise(separator),
      nz(local),
      when(nz(ext) === "", "").otherwise(" ext: "), nz(ext))

  private val phoneStruct = StructType(Seq(
    StructField("C_CTRY_CODE", StringType), StructField("C_AREA_CODE", StringType),
    StructField("C_LOCAL", StringType), StructField("C_EXT", StringType)))

  /** Explicit read schema — everything as string, typed in `flatten`.
    * The reference never infers schemas (SURVEY §1.2), and XML inference
    * would make attribute types depend on the data sample.
    */
  val actionSchema: StructType = StructType(Seq(
    StructField("_ActionTS", StringType),
    StructField("_ActionType", StringType),
    StructField("Customer", StructType(Seq(
      StructField("_C_ID", StringType), StructField("_C_TAX_ID", StringType),
      StructField("_C_GNDR", StringType), StructField("_C_TIER", StringType),
      StructField("_C_DOB", StringType),
      StructField("Name", StructType(Seq(
        StructField("C_L_NAME", StringType), StructField("C_F_NAME", StringType),
        StructField("C_M_NAME", StringType)))),
      StructField("Address", StructType(Seq(
        StructField("C_ADLINE1", StringType), StructField("C_ADLINE2", StringType),
        StructField("C_ZIPCODE", StringType), StructField("C_CITY", StringType),
        StructField("C_STATE_PROV", StringType), StructField("C_CTRY", StringType)))),
      StructField("ContactInfo", StructType(Seq(
        StructField("C_PRIM_EMAIL", StringType), StructField("C_ALT_EMAIL", StringType),
        StructField("C_PHONE_1", phoneStruct), StructField("C_PHONE_2", phoneStruct),
        StructField("C_PHONE_3", phoneStruct)))),
      StructField("TaxInfo", StructType(Seq(
        StructField("C_LCL_TX_ID", StringType), StructField("C_NAT_TX_ID", StringType)))),
      StructField("Account", StructType(Seq(
        StructField("_CA_ID", StringType), StructField("_CA_TAX_ST", StringType),
        StructField("CA_B_ID", StringType), StructField("CA_NAME", StringType)))))))))

  /** Read + flatten CustomerMgmt.xml to the 27-column customer_mgmt
    * table (tpcdi.py:276-328). One narrow scan; everything else is
    * struct-field projection.
    */
  def customerMgmt(spark: SparkSession, path: String): DataFrame =
    flatten(spark.read.schema(actionSchema)
      .option("rowTag", "TPCDI:Action").xml(path))

  /** Flatten a rowTag=TPCDI:Action DataFrame. Split from the read so
    * tests can feed literal XML strings through the same projection.
    */
  def flatten(actions: DataFrame): DataFrame = {
    def ph(i: Int): Column = {
      val p = s"Customer.ContactInfo.C_PHONE_$i"
      phoneNumber(col(s"$p.C_CTRY_CODE"), col(s"$p.C_AREA_CODE"),
        col(s"$p.C_LOCAL"), col(s"$p.C_EXT")).as(s"c_phone_$i")
    }
    actions.select(
      Dialect.toTimestampSf(col("_ActionTS"), "yyyy-mm-ddThh:mi:ss").as("action_ts"),
      col("_ActionType").as("action_type"),
      col("Customer._C_ID").cast("long").as("c_id"),
      col("Customer._C_TAX_ID").cast("string").as("c_tax_id"),
      col("Customer._C_GNDR").cast("string").as("c_gndr"),
      Dialect.tryCast(col("Customer._C_TIER").cast("string"), "long").as("c_tier"),
      col("Customer._C_DOB").cast("date").as("c_dob"),
      col("Customer.Name.C_L_NAME").cast("string").as("c_l_name"),
      col("Customer.Name.C_F_NAME").cast("string").as("c_f_name"),
      col("Customer.Name.C_M_NAME").cast("string").as("c_m_name"),
      col("Customer.Address.C_ADLINE1").cast("string").as("c_adline1"),
      col("Customer.Address.C_ADLINE2").cast("string").as("c_adline2"),
      col("Customer.Address.C_ZIPCODE").cast("string").as("c_zipcode"),
      col("Customer.Address.C_CITY").cast("string").as("c_city"),
      col("Customer.Address.C_STATE_PROV").cast("string").as("c_state_prov"),
      col("Customer.Address.C_CTRY").cast("string").as("c_ctry"),
      col("Customer.ContactInfo.C_PRIM_EMAIL").cast("string").as("c_prim_email"),
      col("Customer.ContactInfo.C_ALT_EMAIL").cast("string").as("c_alt_email"),
      ph(1), ph(2), ph(3),
      col("Customer.TaxInfo.C_LCL_TX_ID").cast("string").as("c_lcl_tx_id"),
      col("Customer.TaxInfo.C_NAT_TX_ID").cast("string").as("c_nat_tx_id"),
      col("Customer.Account._CA_ID").cast("string").as("ca_id"),
      col("Customer.Account._CA_TAX_ST").cast("long").as("ca_tax_st"),
      col("Customer.Account.CA_B_ID").cast("long").as("ca_b_id"),
      col("Customer.Account.CA_NAME").cast("string").as("ca_name"))
  }
}
