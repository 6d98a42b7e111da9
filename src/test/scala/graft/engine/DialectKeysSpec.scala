package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DialectKeysSpec extends SparkSpec {
  import spark.implicits._

  test("decode matches keys incl. null-safe, falls through to default") {
    val df = Seq(Some("NEW"), Some("UPDACCT"), Some("???"), None).toDF("a")
    val out = df.select(Dialect.decode($"a",
      Seq(lit("NEW") -> lit(1), lit("UPDACCT") -> lit(2), lit(null) -> lit(99)),
      default = lit(-1)).as("v")).as[Int].collect()
    out shouldBe Array(1, 2, -1, 99)
  }

  test("qualifyRowNumber keeps first row per partition by order") {
    val df = Seq(("S", 1, "old"), ("S", 2, "new"), ("T", 5, "only"))
      .toDF("sym", "seq", "v")
    val out = Dialect.qualifyRowNumber(df, Seq($"sym"), Seq($"seq".desc))
      .select("sym", "v").orderBy("sym").as[(String, String)].collect()
    out shouldBe Array(("S", "new"), ("T", "only"))
    // helper column must not leak
    Dialect.qualifyRowNumber(df, Seq($"sym"), Seq($"seq")).columns should
      contain theSameElementsAs Seq("sym", "seq", "v")
  }

  test("groupByAll groups by every non-aggregate column") {
    val df = Seq((1, "a", 10.0), (1, "a", 5.0), (2, "b", 1.0))
      .toDF("k1", "k2", "amount")
    val out = Dialect.groupByAll(df, Seq(sum($"amount").as("amount")), Set("amount"))
      .orderBy("k1").as[(Int, String, Double)].collect()
    out shouldBe Array((1, "a", 15.0), (2, "b", 1.0))
  }

  test("snowflakeFormat translates the reference's formats exactly") {
    // the two loader formats (tpcdi.py:293, 453) + the mi/mm trap
    Dialect.snowflakeFormat("yyyy-mm-ddThh:mi:ss") shouldBe "yyyy-MM-dd'T'HH:mm:ss"
    Dialect.snowflakeFormat("yyyymmdd-hhmiss") shouldBe "yyyyMMdd-HHmmss"
    Dialect.snowflakeFormat("yyyymmdd") shouldBe "yyyyMMdd"
  }

  test("toTimestampSf parses reference-format strings") {
    val out = Seq("2015-01-11T13:21:12").toDF("s")
      .select(Dialect.toTimestampSf($"s", "yyyy-mm-ddThh:mi:ss").as("t"))
      .collect()
    out(0).getTimestamp(0) shouldBe ts("2015-01-11 13:21:12")
  }

  test("tryCast nulls on failure instead of erroring") {
    val out = Seq("123", "12x", "").toDF("s")
      .select(Dialect.tryCast($"s", "long").as("n")).collect()
    out.map(r => if (r.isNullAt(0)) null else r.getLong(0)) shouldBe
      Array(123L, null, null)
  }

  test("minusMillis subtracts exactly 1ms across second boundaries") {
    val out = Seq(ts("2020-07-01 00:00:00")).toDF("t")
      .select(Dialect.minusMillis($"t", 1).as("t")).as[java.sql.Timestamp].collect()
    out(0) shouldBe ts("2020-06-30 23:59:59.999")
  }

  test("surrogateKey replicates dbt_utils.generate_surrogate_key semantics") {
    val df = Seq((Some(42L), Some("x")), (None, Some("x")))
      .toDF("a", "b")
    val out = df.select(Keys.surrogateKey($"a", $"b").as("sk")).as[String].collect()
    // md5('42-x') and md5('<sentinel>-x')
    out(0) shouldBe java.security.MessageDigest.getInstance("MD5")
      .digest("42-x".getBytes("UTF-8")).map("%02x".format(_)).mkString
    out(1) shouldBe java.security.MessageDigest.getInstance("MD5")
      .digest(s"${Keys.NullSentinel}-x".getBytes("UTF-8")).map("%02x".format(_)).mkString
    // distinct inputs -> distinct keys
    out(0) should not be out(1)
  }
}
