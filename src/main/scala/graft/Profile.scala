package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops._

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    time("docs count")(docs.count())
    val sig = time("signatures")(
      { val s = Dedup.minhashSignatures(docs, "text", "doc_id").cache()
        s.count(); s })
    time("full minhashLsh")(Dedup.minhashLsh(docs, "text", "doc_id").count())
    time("full minhashLsh again")(Dedup.minhashLsh(docs, "text", "doc_id").count())
    spark.stop()
  }
}
