package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result equals plain join (inner, with temporal extra)") {
    val fact = (1 to 1000).map(i =>
      // heavy skew: 90% of rows on key 1
      (i.toLong, if (i % 10 == 0) (i % 7).toLong + 2 else 1L,
        ts(f"2020-01-${i % 28 + 1}%02d 00:00:00"))).toDF("fid", "k", "fts")
    val dim = Seq(
      (1L, "hot", ts("2020-01-01 00:00:00"), ts("9999-12-31 23:59:59.999")),
      (3L, "cold", ts("2020-01-01 00:00:00"), ts("2020-01-10 00:00:00")))
      .toDF("k", "v", "eff", "end")

    val extraPlain = fact("fts").between(dim("eff"), dim("end"))
    val plain = fact.join(dim,
        fact("k") === dim("k") && extraPlain)
      .select("fid", "v").orderBy("fid").collect()

    val d2 = dim
    val salted = SkewJoin.saltedJoin(fact, d2,
        fact("k"), d2("k"), salts = 8,
        extra = fact("fts").between(d2("eff"), d2("end")))
      .select("fid", "v").orderBy("fid").collect()

    salted shouldBe plain
    plain.length should be > 800 // skewed key actually dominates
  }

  test("left join keeps unmatched fact rows exactly once") {
    val fact = Seq((1L, 10L), (2L, 99L)).toDF("fid", "k")
    val dim = Seq((10L, "x")).toDF("k", "v")
    val out = SkewJoin.saltedJoin(fact, dim, fact("k"), dim("k"),
        salts = 4, joinType = "left")
      .select("fid", "v").orderBy("fid").collect()
    out.length shouldBe 2
    out(0).getString(1) shouldBe "x"
    out(1).isNullAt(1) shouldBe true
  }
}
