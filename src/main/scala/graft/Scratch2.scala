package graft
import org.apache.spark.sql.functions._
import graft.ops._
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val m1 = Embeddings.signProjectionMatrix(4, 3, seed = 9L)
    println("M: " + m1.map(_.mkString(",")).mkString(" | "))
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    val dots = df.select(array(m1.map { row =>
      aggregate(zip_with(col("embedding"), typedLit(row.toSeq),
          (x, s) => x.cast("double") * s.cast("double")),
        lit(0.0d), (acc, v) => acc + v)
    }: _*).as("d")).head().getSeq[Double](0)
    println("DOTS: " + dots.map(_.toString).mkString(", "))
    val p = df.select(Embeddings.signProject(col("embedding"), m1).as("p"))
      .head().getSeq[Double](0)
    println("PROJ: " + p.map(d => java.lang.Double.toString(d)).mkString(", "))
    println("EXPECT5: " + (5.0 / math.sqrt(3.0)))
    spark.stop()
  }
}
