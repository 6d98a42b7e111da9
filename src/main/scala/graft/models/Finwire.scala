package graft.models

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Dialect, Sources}

/** FINWIRE fixed-width multi-record source → cmp / sec / fin tables.
  *
  * Re-expresses the reference loader's shared-parse + 3-way filtered
  * extract (tpcdi.py:437-535) Spark-first: one `spark.read.text` scan over
  * the `FINWIRE??????` glob, a cached common prefix projection, then three
  * filtered substring projections. The scan is a single narrow stage —
  * no shuffle; all substring/cast work is WholeStageCodegen'd. At 100 TB
  * the three extracts each re-read the cached parse (reference used a
  * temp table, tpcdi.py:446-454).
  *
  * Field positions (1-based start/len) from tpcdi.py:458-535, tabulated
  * in FIXTURES.md.
  */
object Finwire {

  /** Common prefix (tpcdi.py:452-453): recording timestamp + record type.
    * NB reference uses substring(line, 0, 15) — Snowflake/Spark both
    * treat 0 as 1; we normalize to 1-based.
    */
  def parsePrefix(raw: DataFrame): DataFrame =
    raw.select(
      Dialect.toTimestampSf(substring(col("value"), 1, 15), "yyyymmdd-hh24miss")
        .as("pts"),
      substring(col("value"), 16, 3).as("rec_type"),
      col("value").as("line"))

  /** Read the FINWIRE glob and parse the prefix; caller should cache when
    * deriving all three record types (shared-scan pattern, tpcdi.py:446-454).
    *
    * The glob expands driver-side before reaching the reader: Spark's
    * FileStreamSink metadata probe stats the RAW pattern string and
    * logs a WARN with a full FileNotFoundException stack trace for
    * glob paths (harmless but alarming in logs); concrete paths skip
    * it, and an empty match becomes a crisp error instead of a lazy
    * analysis failure.
    */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val matches = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    require(matches.nonEmpty, s"no FINWIRE files match $pathGlob")
    parsePrefix(spark.read.text(matches.map(_.getPath.toString): _*))
  }

  private def f(c: DataFrame, start: Int, len: Int): Column =
    substring(col("line"), start, len)

  /** CMP record extract (tpcdi.py:458-487): company master. */
  def cmp(parsed: DataFrame): DataFrame =
    parsed.filter(col("rec_type") === "CMP").select(
      col("pts"), col("rec_type"),
      f(parsed, 19, 60).as("company_name"),
      f(parsed, 79, 10).as("cik"),
      f(parsed, 89, 4).as("status"),
      f(parsed, 93, 2).as("industry_id"),
      f(parsed, 95, 4).as("sp_rating"),
      // only founding_date is trimmed in the reference (tpcdi.py:470);
      // other fields keep right-padding (SURVEY §7.4.9)
      Dialect.tryToDateSf(trim(f(parsed, 99, 8)), "yyyymmdd").as("founding_date"),
      f(parsed, 107, 80).as("address_line1"),
      f(parsed, 187, 80).as("address_line2"),
      f(parsed, 267, 12).as("postal_code"),
      f(parsed, 279, 25).as("city"),
      f(parsed, 304, 20).as("state_province"),
      f(parsed, 324, 24).as("country"),
      f(parsed, 348, 46).as("ceo_name"),
      f(parsed, 394, 150).as("description"))

  /** SEC record extract (tpcdi.py:492-509): security master. */
  def sec(parsed: DataFrame): DataFrame =
    parsed.filter(col("rec_type") === "SEC").select(
      col("pts"), col("rec_type"),
      f(parsed, 19, 15).as("symbol"),
      f(parsed, 34, 6).as("issue_type"),
      f(parsed, 40, 4).as("status"),
      f(parsed, 44, 70).as("name"),
      f(parsed, 114, 6).as("ex_id"),
      f(parsed, 120, 13).as("sh_out"),
      f(parsed, 133, 8).as("first_trade_date"),
      f(parsed, 141, 8).as("first_exchange_date"),
      f(parsed, 149, 12).as("dividend"),
      f(parsed, 161, 60).as("co_name_or_cik"))

  /** FIN record extract (tpcdi.py:512-535): quarterly financials. */
  def fin(parsed: DataFrame): DataFrame =
    parsed.filter(col("rec_type") === "FIN").select(
      col("pts"), col("rec_type"),
      f(parsed, 19, 4).as("year"),
      f(parsed, 23, 1).as("quarter"),
      f(parsed, 24, 8).as("quarter_start_date"),
      f(parsed, 32, 8).as("posting_date"),
      f(parsed, 40, 17).as("revenue"),
      f(parsed, 57, 17).as("earnings"),
      f(parsed, 74, 12).as("eps"),
      f(parsed, 86, 12).as("diluted_eps"),
      f(parsed, 98, 12).as("margin"),
      f(parsed, 110, 17).as("inventory"),
      f(parsed, 127, 17).as("assets"),
      f(parsed, 144, 17).as("liabilities"),
      f(parsed, 161, 13).as("sh_out"),
      f(parsed, 174, 13).as("diluted_sh_out"),
      f(parsed, 187, 60).as("co_name_or_cik"))

  /** Bronze typing of fin (models/bronze/finwire/finwire_financial.sql:1-26):
    * numbers via to_number/cast-float, dates via to_date(yyyymmdd), and the
    * cik-vs-company-name split on try_to_number(co_name_or_cik).
    */
  def finTyped(finRaw: DataFrame): DataFrame = {
    val cikNum = Dialect.tryCast(trim(col("co_name_or_cik")), "long")
    finRaw.select(
      col("pts"),
      col("year").cast("int").as("year"),
      col("quarter").cast("int").as("quarter"),
      Dialect.toDateSf(col("quarter_start_date"), "yyyymmdd").as("quarter_start_date"),
      Dialect.toDateSf(col("posting_date"), "yyyymmdd").as("posting_date"),
      col("revenue").cast("double").as("revenue"),
      col("earnings").cast("double").as("earnings"),
      col("eps").cast("double").as("eps"),
      col("diluted_eps").cast("double").as("diluted_eps"),
      col("margin").cast("double").as("margin"),
      col("inventory").cast("double").as("inventory"),
      col("assets").cast("double").as("assets"),
      col("liabilities").cast("double").as("liabilities"),
      col("sh_out").cast("long").as("sh_out"),
      col("diluted_sh_out").cast("long").as("diluted_sh_out"),
      cikNum.as("cik"),
      when(cikNum.isNull, trim(col("co_name_or_cik"))).as("company_name"))
  }

  /** Bronze typing of sec (models/bronze/finwire/finwire_security.sql:1-19). */
  def secTyped(secRaw: DataFrame): DataFrame = {
    val cikNum = Dialect.tryCast(trim(col("co_name_or_cik")), "long")
    secRaw.select(
      col("pts"),
      trim(col("symbol")).as("symbol"),
      trim(col("issue_type")).as("issue_type"),
      trim(col("status")).as("status"),
      rtrim(col("name")).as("name"),
      trim(col("ex_id")).as("ex_id"),
      col("sh_out").cast("long").as("sh_out"),
      Dialect.toDateSf(col("first_trade_date"), "yyyymmdd").as("first_trade_date"),
      Dialect.toDateSf(col("first_exchange_date"), "yyyymmdd").as("first_exchange_date"),
      col("dividend").cast("double").as("dividend"),
      cikNum.as("cik"),
      when(cikNum.isNull, trim(col("co_name_or_cik"))).as("company_name"))
  }
}
