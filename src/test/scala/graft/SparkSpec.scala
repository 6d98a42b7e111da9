package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all specs (one JVM-wide session —
  * SparkSession.builder.getOrCreate reuses it across suites).
  */
trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // match the driver mains: AQE may re-optimize cached plans (see
    // Bench.scala) — specs must pin plans under the regime the engine
    // actually runs
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      "true")
    // unique per JVM: a fixed path leaves orphan table dirs behind that a
    // fresh in-memory catalog then refuses to overwrite (LOCATION_ALREADY_EXISTS)
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-test-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
  def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)
}
