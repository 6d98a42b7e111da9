package graft.models

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The audit checks must actually CATCH planted violations — q34 only
  * proves they pass on clean data.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  private val parent = Seq(1L, 2L, 3L).toDF("pk")
  private val child = Seq(
    (10L, Some(1L), 5.0), (11L, Some(9L), 5.0), // 9 dangles
    (12L, None, -2.0),                          // null FK, out of range
    (10L, Some(2L), 5.0)                        // duplicate id 10
  ).toDF("id", "fk", "v")

  test("relationships finds dangling FKs, exempts nulls") {
    val bad = Audit.relationships(child, "fk", parent, "pk")
      .select("id").as[Long].collect()
    bad.toSeq shouldBe Seq(11L)
  }

  test("unique finds duplicated keys with their multiplicity") {
    val dup = Audit.unique(child, Seq("id")).collect()
    dup.length shouldBe 1
    dup(0).getLong(0) shouldBe 10L
    dup(0).getLong(1) shouldBe 2L
  }

  test("notNull and acceptedRange flag the planted rows") {
    Audit.notNull(child, Seq("fk")).select("id").as[Long]
      .collect().toSeq shouldBe Seq(12L)
    Audit.acceptedRange(child, "v", 0, 10).select("id").as[Long]
      .collect().toSeq shouldBe Seq(12L)
  }

  test("rowCounts reports one row per table") {
    val rep = Audit.rowCounts(Map("child" -> child, "parent" -> parent))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rep shouldBe Map("child" -> 4L, "parent" -> 3L)
  }

  test("scd2Continuity: clean dim passes, each planted defect is counted") {
    val sentinel = ts(graft.engine.Scd2.SentinelEnd)
    def dim(rows: (Long, String, String, Boolean)*) =
      rows.toSeq.map { case (id, eff, end, cur) =>
        (id, ts(eff), if (end == "max") sentinel else ts(end), cur)
      }.toDF("id", "effective_timestamp", "end_timestamp", "is_current")

    val clean = dim(
      (1L, "2020-01-01 00:00:00", "2020-05-31 23:59:59.999", false),
      (1L, "2020-06-01 00:00:00", "max", true),
      (2L, "2020-02-01 00:00:00", "max", true))
    Audit.scd2Continuity(clean, Seq("id"))
      .collect().foreach(_.getAs[Long]("n_violations") shouldBe 0L)

    val dirty = dim(
      // entity 1: two current versions AND overlapping ranges
      (1L, "2020-01-01 00:00:00", "2020-07-31 23:59:59.999", true),
      (1L, "2020-06-01 00:00:00", "max", true),
      // entity 2: current version not open-ended (also counts as its
      // entity's only current, so one_current stays clean for it)
      (2L, "2020-02-01 00:00:00", "2020-03-01 00:00:00", true))
    val got = Audit.scd2Continuity(dirty, Seq("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got("one_current_per_entity") shouldBe 1L
    got("no_version_overlap") shouldBe 1L
    // entity 1's first version (current, closed end) + entity 2's row
    got("current_is_open") shouldBe 2L
  }
}
