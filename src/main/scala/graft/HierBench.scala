package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-bench: flat vs two-level centroid assignment cost at a
  * real list count (not part of the driver contract).
  */
object HierBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val n = 200000
    val r = new scala.util.Random(3)
    val dir = java.nio.file.Files.createTempDirectory("hierbench").toString
    (0L until n.toLong).map(i => (i, Array.fill(dim)(r.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding").repartition(32).write.mode("overwrite").parquet(dir)
    val vecs = spark.read.parquet(dir)
    def mkVec() = Array.fill(dim)(r.nextGaussian())
    val nlist = 4096
    val flat = Array.fill(nlist)(mkVec())
    val coarse = Array.fill(64)(mkVec())
    val fine = Array.fill(64)(Array.fill(64)(mkVec()))
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val c = f
      println(f"[hier] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    time(s"flat assign nlist=$nlist")(
      vecs.select(graft.functions.Centroids
        .centroidAssign($"embedding", flat).as("cell"))
        .groupBy("cell").count().count())
    time("hier assign 64x64 (same 4096 cells)")(
      vecs.select(graft.functions.Centroids
        .hierarchicalAssign($"embedding", coarse, fine).as("cell"))
        .groupBy("cell").count().count())
    spark.stop()
  }
}
