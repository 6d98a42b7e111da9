package graft
import org.apache.spark.sql.SparkSession

/** Scratch micro-bench: driver-side vs distributed-assignment k-means
  * training wall time at real list counts (not part of the driver
  * contract). The driver trainer's per-sweep cost is
  * sample·nlist·dim flops on ONE thread; the distributed trainer runs
  * the same sweep as a CentroidAssign codegen projection over 32 cores.
  *
  * Usage: runMain graft.KMeansBench [nlist] [alsoDriver(0/1)] [sampleCap]
  */
object KMeansBench {
  def main(args: Array[String]): Unit = {
    val nlist = args.headOption.map(_.toInt).getOrElse(4096)
    val alsoDriver = args.lift(1).map(_.toInt).getOrElse(0) == 1
    val cap = args.lift(2).map(_.toInt).getOrElse(65536)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val n = 100000
    val r = new scala.util.Random(3)
    val dir = java.nio.file.Files.createTempDirectory("kmeansbench").toString
    (0L until n.toLong).map(i => (i, Array.fill(dim)(r.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding").repartition(32)
      .write.mode("overwrite").parquet(dir)
    val vecs = spark.read.parquet(dir)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[kmeans] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time(s"distributed train nlist=$nlist cap=$cap iters=3")(
      graft.ops.KMeans.trainCentroidsDistributed(vecs, "vec_id", "embedding",
        nlist, sampleCap = cap, iters = 3))
    if (alsoDriver)
      time(s"driver train nlist=$nlist cap=$cap iters=3")(
        graft.ops.KMeans.trainCentroids(vecs, "vec_id", "embedding",
          nlist, sampleCap = cap, iters = 3))
    spark.stop()
  }
}
