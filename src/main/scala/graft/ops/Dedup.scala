package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every variant is candidate-generation (shuffle on a
  * small key: hash / band / bucket) followed by verification on the
  * candidates only — never an all-pairs cross join. Bucket-size caps
  * bound the worst-case pair blowup under skew, the standard guard for
  * web-scale near-dup jobs.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on the canonical text. One shuffle on the
    * md5 (uniformly distributed — no skew), map-side partial agg.
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles (distinct) of the lowercased text. */
  def shingles(text: Column, n: Int): Column = {
    val words = split(TextOps.normalize(text), " ")
    // sliding n-grams via transform over word indices
    // n-gram start indices 0 .. size-n (inclusive): size-n+1 grams
    val grams = transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*))
    array_distinct(when(size(words) >= n, grams).otherwise(array(concat_ws(" ", words))))
  }

  private val P = 2147483647L // 2^31 - 1, Mersenne prime for affine minhash

  /** Deterministic affine hash coefficients (seeded). */
  private def coeffs(k: Int, seed: Long): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(k)((1L + r.nextInt((P - 1).toInt).toLong, r.nextInt(P.toInt).toLong))
  }

  /** MinHash signature column: array<long> of k minima over the doc's
    * shingle set. Computed per-row with array expressions (no explode,
    * no shuffle): sig_i = min over shingles of (a_i * h(s) + b_i) mod P.
    */
  def minhashSignature(text: Column, k: Int = 64, shingleN: Int = 3,
                       seed: Long = 42L): Column = {
    val hs = transform(shingles(text, shingleN),
      s => pmod(xxhash64(s), lit(P)))
    val mins = coeffs(k, seed).map { case (a, b) =>
      array_min(transform(hs, h => pmod(h * a + b, lit(P))))
    }
    array(mins: _*)
  }

  /** MinHash + LSH banding: docs sharing any (band_idx, band_hash)
    * bucket become candidate pairs; pairs are scored by signature
    * agreement (estimated Jaccard) and filtered at `threshold`.
    *
    * Shuffles: one on the band key (candidate gen), one to dedup pairs.
    * `maxBucket` caps quadratic blowup from degenerate buckets.
    */
  def minhashLsh(docs: DataFrame, textCol: String, idCol: String,
                 k: Int = 64, bands: Int = 16, shingleN: Int = 3,
                 threshold: Double = 0.7, seed: Long = 42L,
                 maxBucket: Int = 1000): DataFrame = {
    val rows = k / bands
    val sig = docs.select(col(idCol).as("doc_id"),
      minhashSignature(col(textCol), k, shingleN, seed).as("sig"))
    val banded = sig.select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*), b)))
          .as(Seq("band_idx", "band_hash")))
      .select("doc_id", "sig", "band_idx", "band_hash")
    // cap degenerate buckets (skew guard)
    val sized = banded.withColumn("__bsz",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("band_idx", "band_hash")))
      .filter(col("__bsz") <= maxBucket).drop("__bsz")
    val a = sized.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = sized.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val pairs = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b")
      .dropDuplicates("doc_a", "doc_b")
    pairs.withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** SimHash: 64-bit signature where bit j is the sign of the weighted
    * sum of token-hash bits. Near-dups = pairs within `maxHamming`,
    * found by the 4x16-bit chunk pigeonhole (any pair at distance <=3
    * shares at least one exact chunk).
    */
  def simhashSignature(text: Column): Column = {
    val words = split(TextOps.normalize(text), " ")
    val hs = transform(words, w => xxhash64(w))
    val bits = (0 until 64).map { j =>
      // sum of +1/-1 votes for bit j over all tokens
      val vote = aggregate(hs, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sig = docs.select(col(idCol).as("doc_id"),
      simhashSignature(col(textCol)).as("sim"))
    val chunked = sig.select(col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_idx", "chunk")))
    val sized = chunked.withColumn("__bsz",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("chunk_idx", "chunk")))
      .filter(col("__bsz") <= maxBucket).drop("__bsz")
    val a = sized.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_a"), col("sim").as("sim_a"))
    val b = sized.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard over an inverted index restricted to rare
    * n-grams (document frequency <= maxDf): candidate pairs must share a
    * rare n-gram; intersection counts come from the index join, union
    * from per-doc distinct-gram counts.
    */
  def ngramJaccard(docs: DataFrame, textCol: String, idCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxDf: Int = 50): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), n)).as("gram"))
    val docSize = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val rare = grams.withColumn("__df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("gram")))
      .filter(col("__df") <= maxDf).drop("__df")
    val a = rare.select(col("gram"), col("doc_id").as("doc_a"))
    val b = rare.select(col("gram"), col("doc_id").as("doc_b"))
    val inter = a.join(b, Seq("gram")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared_rare"))
    inter
      .join(docSize.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_grams", "grams_a"), Seq("doc_a"))
      .join(docSize.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_grams", "grams_b"), Seq("doc_b"))
      .withColumn("jaccard_lb", col("n_shared_rare").cast("double") /
        (col("grams_a") + col("grams_b") - col("n_shared_rare")))
      .filter(col("jaccard_lb") >= threshold)
      .select("doc_a", "doc_b", "n_shared_rare", "jaccard_lb")
  }
}
