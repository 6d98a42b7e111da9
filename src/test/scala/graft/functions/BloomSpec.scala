package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted hash probes true") {
    val members = (1L to 5000L).map(i => i * 2654435761L)
    val sketch = members.toDF("h")
      .agg(Bloom.bloomBuild(col("h"), 5000L, 0.01)).first().getAs[Array[Byte]](0)
    members.foreach { h =>
      assert(Bloom.mightContain(sketch, h, Bloom.numHashesOf(sketch)))
    }
  }

  test("false-positive rate stays near the configured fpp") {
    val members = (1L to 5000L).map(i => i * 2654435761L).toSet
    val sketch = members.toSeq.toDF("h")
      .agg(Bloom.bloomBuild(col("h"), 5000L, 0.01)).first().getAs[Array[Byte]](0)
    val probes = (1L to 20000L).map(i => i * 0x9E3779B97F4A7C15L)
      .filterNot(members)
    val fps = probes.count(h =>
      Bloom.mightContain(sketch, h, Bloom.numHashesOf(sketch)))
    // configured 1%; allow 3x headroom against hash-quality noise
    fps.toDouble / probes.size should be < 0.03
  }

  test("distributed build equals single-partition build (merge is OR)") {
    val df = (1L to 2000L).toDF("v").select(xxhash64(col("v")).as("h"))
    val many = df.repartition(13)
      .agg(Bloom.bloomBuild(col("h"), 2000L, 0.01)).first().getAs[Array[Byte]](0)
    val one = df.coalesce(1)
      .agg(Bloom.bloomBuild(col("h"), 2000L, 0.01)).first().getAs[Array[Byte]](0)
    many shouldBe one
  }

  test("probe expression works in a filter (codegen path) and matches eval") {
    val members = (1L to 100L).toDF("v").select(xxhash64(col("v")).as("h"))
    val sketch = members.agg(Bloom.bloomBuild(col("h"), 100L, 0.01).as("sk"))
    val probed = (1L to 200L).toDF("v")
      .crossJoin(broadcast(sketch))
      .filter(Bloom.bloomMightContain(col("sk"), xxhash64(col("v"))))
      .select("v").as[Long].collect().toSet
    // all true members present (no false negatives) under codegen
    (1L to 100L).toSet.subsetOf(probed) shouldBe true
  }

  test("sizing formulae match the standard Bloom bounds") {
    Bloom.optimalNumBits(1000, 0.01) should be >= 9585 // -n ln p / ln2^2
    Bloom.optimalNumBits(1000, 0.01) % 64 shouldBe 0
    Bloom.optimalNumHashes(1000, 9600) shouldBe 7
  }
}
