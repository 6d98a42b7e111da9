package graft.functions

import graft.SparkSpec
import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Value-identity guard: the single-loop signature expressions must
  * produce exactly the values of the round-1 explode→aggregate
  * pipelines (same xxhash64 seed, same affine coefficients) — the d02
  * pair sets and est_jaccard scores depend on it.
  */
class SignaturesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different content with other words entirely"),
    (4L, "tiny"),
    (5L, "")).toDF("doc_id", "text")

  test("MinHashSignature equals the explode->aggregate formulation") {
    val P = Signatures.P
    val (a, b) = Signatures.coeffs(64, 42L)
    val grams = docs.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 3)).as("gram"))
      .select(col("doc_id"), pmod(xxhash64(col("gram")), lit(P)).as("h"))
    val mins = (0 until 64).map(i =>
      min(pmod(col("h") * a(i) + b(i), lit(P))).as(s"__m$i"))
    val legacy = grams.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until 64).map(i => col(s"__m$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val now = Dedup.minhashSignatures(docs, "text", "doc_id")
      .as[(Long, Seq[Long])].collect().toMap
    now.keySet shouldBe legacy.keySet
    now.foreach { case (id, sig) => sig shouldBe legacy(id) }
  }

  test("SimHashSignature equals the explode->aggregate formulation") {
    val toks = docs.select(col("doc_id"),
      explode(split(TextOps.normalize(col("text")), " ")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val votes = (0 until 64).map(j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)).as(s"__v$j"))
    val legacy = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"__v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("sim"))
      .as[(Long, Long)].collect().toMap
    val now = Dedup.simhashSignatures(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    now shouldBe legacy
  }
}
