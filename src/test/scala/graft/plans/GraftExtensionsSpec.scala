package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** SQL-surface parity: the injected functions must match the DataFrame
  * helpers (Dialect.decode / Keys.surrogateKey) exactly.
  *
  * The shared test SparkContext already exists, so builder-time
  * `withExtensions` would be skipped by getOrCreate; register the same
  * builders directly on a child session's function registry — identical
  * resolution path to injectFunction.
  */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val sqlSpark: SparkSession = {
    val s = spark.newSession()
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sf_decode", GraftExtensions.decodeExpr, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "surrogate_key", GraftExtensions.surrogateKeyExpr, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints", GraftExtensions.winnowExpr, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", GraftExtensions.wordNGramsExpr, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", GraftExtensions.minhashSignatureExpr, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_signature", GraftExtensions.simhashSignatureExpr, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "band_hashes", GraftExtensions.bandHashesExpr, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_build", GraftExtensions.bloomBuildExpr, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", GraftExtensions.bloomMightContainExpr, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_value", GraftExtensions.zValueExpr, "built-in")
    s
  }

  test("sf_decode matches Snowflake semantics incl. null-safe keys") {
    val out = sqlSpark.sql(
      """SELECT sf_decode(x, 'NEW', 'Active', 'CLOSEACCT', 'Inactive', 'other') v
        |FROM VALUES ('NEW'), ('CLOSEACCT'), ('???'), (NULL) AS t(x)""".stripMargin)
      .collect().map(_.getString(0))
    out shouldBe Array("Active", "Inactive", "other", "other")
    val nullKey = sqlSpark.sql(
      "SELECT sf_decode(x, NULL, 'was-null', 'miss') v FROM VALUES (CAST(NULL AS STRING)) t(x)")
      .collect()(0).getString(0)
    nullKey shouldBe "was-null"
  }

  test("sf_decode without default yields NULL on no match") {
    val r = sqlSpark.sql("SELECT sf_decode('z', 'a', 1, 'b', 2) v").collect()(0)
    r.isNullAt(0) shouldBe true
  }

  test("winnow_fingerprints and word_ngrams SQL = DataFrame results") {
    import org.apache.spark.sql.functions.col
    val viaSql = sqlSpark.sql(
      """SELECT word_ngrams(lower(t), 3) g, winnow_fingerprints(t) f,
        |       winnow_fingerprints(t, 4, 2) f2
        |FROM VALUES ('the quick brown fox jumps') AS v(t)""".stripMargin).collect()(0)
    viaSql.getSeq[String](0) shouldBe
      Seq("the quick brown", "quick brown fox", "brown fox jumps")
    val viaDf = sqlSpark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row("the quick brown fox jumps")),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.StringType))))
      .select(graft.ops.TextOps.winnowFingerprints(col("t")).as("f"))
      .collect()(0).getSeq[Long](0)
    viaSql.getSeq[Long](1) shouldBe viaDf
    viaSql.getSeq[Long](2).nonEmpty shouldBe true
  }

  test("signature SQL functions = DataFrame expression results") {
    import org.apache.spark.sql.functions.{col, split}
    val viaSql = sqlSpark.sql(
      """SELECT minhash_signature(word_ngrams(t, 3)) mh,
        |       simhash_signature(split(t, ' ')) sh,
        |       band_hashes(minhash_signature(word_ngrams(t, 3)), 16) bh
        |FROM VALUES ('the quick brown fox jumps over the dog') v(t)""".stripMargin)
      .collect()(0)
    val df = sqlSpark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row("the quick brown fox jumps over the dog")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType))))
    val grams = graft.functions.WordNGrams.wordNGrams(col("t"), 3)
    val viaDf = df.select(
      graft.functions.MinHashSignature.minhashSignature(grams, 64, 42L).as("mh"),
      graft.functions.SimHashSignature.simhashSignature(split(col("t"), " ")).as("sh"),
      graft.functions.BandHashes.bandHashes(
        graft.functions.MinHashSignature.minhashSignature(grams, 64, 42L), 16).as("bh"))
      .collect()(0)
    viaSql.getSeq[Long](0) shouldBe viaDf.getSeq[Long](0)
    viaSql.getLong(1) shouldBe viaDf.getLong(1)
    viaSql.getSeq[Long](2) shouldBe viaDf.getSeq[Long](2)
  }

  test("surrogate_key SQL = Keys.surrogateKey DataFrame result") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((42L, Some("x")), (7L, None)).toDF("a", "b")
    val viaDf = df.select(graft.engine.Keys.surrogateKey(col("a"), col("b")).as("sk"))
      .as[String].collect()
    val viaSql = sqlSpark.sql(
      "SELECT surrogate_key(a, b) sk FROM VALUES (42L,'x'),(7L,CAST(NULL AS STRING)) t(a,b)")
      .collect().map(_.getString(0))
    viaSql shouldBe viaDf
  }

  test("bloom_build / bloom_might_contain / z_value SQL = expression results") {
    // end-to-end in SQL: build a sketch over 1..100, probe members + one miss
    val hits = sqlSpark.sql(
      """WITH sk AS (
        |  SELECT bloom_build(xxhash64(id), 100L, 0.01d) AS s
        |  FROM range(1, 101)),
        |p AS (SELECT id FROM range(1, 201))
        |SELECT count(*) FROM p, sk
        |WHERE bloom_might_contain(sk.s, xxhash64(p.id))""".stripMargin)
      .collect()(0).getLong(0)
    hits should be >= 100L   // every member found: no false negatives
    hits should be <= 110L   // and at most a handful of false positives
    val z = sqlSpark.sql("SELECT z_value(3L, 0L, 8), z_value(0L, 3L, 8), z_value(255L, 255L, 8)")
      .collect()(0)
    (z.getLong(0), z.getLong(1), z.getLong(2)) shouldBe ((10L, 5L, 65535L))
  }
}
