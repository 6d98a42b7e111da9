package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops._

/** Training-data pipeline operators over `documents` / `embeddings`
  * (dedup, similarity search, text analysis, multimodal plumbing).
  * SQL-expressible ops carry a DuckDB oracle generated from the SAME
  * marker lists / formulas as the Spark code; candidate-generation ops
  * (LSH banding, simhash chunking) are rows-only by design.
  */
object OpsQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")
  private def embs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings")

  // ---- SQL mirrors of TextOps formulas ---------------------------------
  private def occSql(x: String, marker: String): String =
    s"cast((length($x) - length(replace($x, '$marker', ''))) / ${marker.length} AS INT)"

  private def scoreSql(markers: Seq[String]): String =
    markers.map(m => occSql("(' ' || lower(text) || ' ')", s" $m ")).mkString(" + ")

  private val enS = scoreSql(Seq("the", "a", "and", "of", "is"))
  private val frS = scoreSql(Seq("le", "la", "et", "les", "est"))
  private val deS = scoreSql(Seq("der", "die", "und", "das", "ist"))
  private val esS = scoreSql(Seq("el", "los", "las", "es", "y"))

  private val langIdSql =
    s"""CASE WHEN ($enS) >= ($frS) AND ($enS) >= ($deS) AND ($enS) >= ($esS) THEN 'en'
       |     WHEN ($frS) >= ($deS) AND ($frS) >= ($esS) THEN 'fr'
       |     WHEN ($deS) >= ($esS) THEN 'de'
       |     ELSE 'es' END""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: hash-groupBy.
    QueryDef("d01_dedup_exact",
      (s, dir) => Dedup.exact(docs(s, dir), "text", "doc_id"),
      Some("""SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
             |  count(*) AS n_dups
             |FROM documents GROUP BY 1""".stripMargin)),

    // MinHash + LSH banding near-dup candidates (not SQL-expressible ->
    // rows-only check by design).
    QueryDef("d02_dedup_minhash_lsh",
      (s, dir) => Dedup.minhashLsh(docs(s, dir), "text", "doc_id"),
      None),

    // SimHash near-dups via chunk pigeonhole.
    QueryDef("d03_dedup_simhash",
      (s, dir) => Dedup.simhashPairs(docs(s, dir), "text", "doc_id"),
      None),

    // Exact n-gram Jaccard over a rare-gram inverted index.
    QueryDef("d04_dedup_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccard(docs(s, dir), "text", "doc_id"),
      None),

    // Embedding-cosine near-dups via sign-LSH buckets. Threshold 0.4:
    // the synthetic embeddings are near-orthogonal (max pairwise cosine
    // ~0.51 at sf0.01), so a production 0.95 cut returns zero rows;
    // 0.4 exercises the operator end-to-end on this data.
    QueryDef("d05_dedup_embedding_cosine",
      (s, dir) => Similarity.cosineNearDups(embs(s, dir), threshold = 0.4),
      None),

    // Exact ANN baseline: brute-force cosine top-5 for the first 20
    // query vectors. IDs + rank only (the sim double stays out of the
    // compared columns; cross-engine float rounding could differ).
    QueryDef("n01_ann_bruteforce",
      (s, dir) => Similarity.bruteForceTopK(
          embs(s, dir).filter(col("vec_id") < 20), embs(s, dir), k = 5)
        .select("q_id", "n_id", "rank"),
      Some("""SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             |  row_number() OVER (PARTITION BY q.vec_id
             |    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
             |             c.vec_id) AS rank
             |FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
             |WHERE q.vec_id < 20
             |QUALIFY rank <= 5""".stripMargin)),

    // Approximate ANN: sign-LSH bucketed top-k (the scale path).
    QueryDef("n02_ann_lsh",
      (s, dir) => Similarity.lshTopK(
          embs(s, dir).filter(col("vec_id") < 20), embs(s, dir), k = 5)
        .select("q_id", "n_id", "rank"),
      None),

    // Approximate ANN: IVF cells with nprobe probing (data-adaptive
    // partition; recall tunable via nprobe).
    QueryDef("n03_ann_ivf",
      (s, dir) => Similarity.ivfTopK(
          embs(s, dir).filter(col("vec_id") < 20), embs(s, dir), k = 5)
        .select("q_id", "n_id", "rank"),
      None),

    // Language ID (n-gram/stopword heuristic).
    QueryDef("t01_lang_id",
      (s, dir) => docs(s, dir).select(col("doc_id"),
        TextOps.langId(col("text")).as("lang_pred")),
      Some(s"SELECT doc_id, $langIdSql AS lang_pred FROM documents")),

    // Quality scoring (length / punctuation / stopword ratios).
    QueryDef("t02_quality_score",
      (s, dir) => {
        val base = docs(s, dir)
        TextOps.qualityMetrics(col("text")).foldLeft(base) {
          case (d, (n, c)) => d.withColumn(n, c)
        }.select("doc_id", "n_chars", "n_words", "n_punct",
          "avg_word_len", "stopword_ratio", "keep")
      },
      Some {
        val pad = "(' ' || lower(text) || ' ')"
        val nWords = "len(string_split_regex(trim(text), '\\s+'))"
        val nStop = Seq("the", "a", "and", "of", "is", "to", "in")
          .map(m => occSql(pad, s" $m ")).mkString(" + ")
        val nPunct = Seq(".", ",", "!", "?").map(occSql("text", _)).mkString(" + ")
        s"""SELECT doc_id,
           |  length(text) AS n_chars,
           |  CASE WHEN length(trim(text)) = 0 THEN 0 ELSE $nWords END AS n_words,
           |  $nPunct AS n_punct,
           |  cast(length(text) - ${occSql("text", " ")} AS DOUBLE)
           |    / (CASE WHEN ($nWords) = 0 THEN 1 ELSE $nWords END) AS avg_word_len,
           |  cast($nStop AS DOUBLE)
           |    / (CASE WHEN ($nWords) = 0 THEN 1 ELSE $nWords END) AS stopword_ratio,
           |  (length(text) >= 20 AND ($nWords) >= 5
           |   AND (cast(length(text) - ${occSql("text", " ")} AS DOUBLE)
           |        / (CASE WHEN ($nWords) = 0 THEN 1 ELSE $nWords END))
           |       BETWEEN 1.5 AND 12.0) AS keep
           |FROM documents""".stripMargin
      }),

    // Token counting: whitespace + BPE-ish regex.
    QueryDef("t03_token_count",
      (s, dir) => docs(s, dir).select(col("doc_id"),
        TextOps.tokenCountWs(col("text")).as("ws_tokens"),
        TextOps.tokenCountBpe(col("text")).as("bpe_tokens")),
      Some("""SELECT doc_id,
             |  CASE WHEN length(trim(text)) = 0 THEN 0
             |       ELSE len(string_split_regex(trim(text), '\s+')) END AS ws_tokens,
             |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
             |    AS bpe_tokens
             |FROM documents""".stripMargin)),

    // Document fingerprint (normalize + md5).
    QueryDef("t04_fingerprint",
      (s, dir) => docs(s, dir).select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp")),
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
             |FROM documents""".stripMargin)),

    // Winnowing fingerprint sets (rolling k-gram hash + window minima);
    // engine-specific hash values -> rows-only.
    QueryDef("t05_winnow_fingerprints",
      (s, dir) => docs(s, dir).select(col("doc_id"),
        TextOps.winnowFingerprints(col("text")).as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_fps"),
          element_at(col("fps"), 1).as("min_fp")),
      None),

    // Multimodal: opaque binary payload + typed metadata.
    QueryDef("m01_media_metadata",
      (s, dir) => Multimodal.attachMedia(docs(s, dir))
        .select("doc_id", "media_type", "n_bytes"),
      Some("""SELECT doc_id,
             |  list_extract(['image','audio','video'], cast(doc_id % 3 AS INT) + 1)
             |    AS media_type,
             |  octet_length(encode(text)) AS n_bytes
             |FROM documents""".stripMargin)),

    // Multimodal: partition-wise stub decode -> feature vectors. The
    // array<float> column is exploded to (dim, feat) scalars: the
    // driver's pandas hasher cannot sort array cells, and the scalar
    // form lets DuckDB replicate stubDecode exactly (per-bucket byte
    // means; double division then float32 cast = same IEEE ops on both
    // engines, so values are bit-identical).
    QueryDef("m02_media_features",
      (s, dir) => Multimodal.extractFeatures(s,
          Multimodal.attachMedia(docs(s, dir))).toDF()
        .select(col("doc_id"), col("media_type"), col("n_frames"),
          posexplode(col("features")))
        .withColumnRenamed("pos", "dim")
        .withColumnRenamed("col", "feat"),
      Some("""WITH enc AS (
             |  SELECT doc_id,
             |    list_extract(['image','audio','video'], cast(doc_id % 3 AS INT) + 1)
             |      AS media_type,
             |    lower(hex(encode(text))) AS h,
             |    octet_length(encode(text)) AS n
             |  FROM documents),
             |dims AS (SELECT cast(unnest(range(8)) AS INT) AS dim),
             |idx AS (SELECT doc_id, h, unnest(range(n)) AS i FROM enc),
             |bytes AS (
             |  SELECT doc_id, cast(i % 8 AS INT) AS dim,
             |    (strpos('0123456789abcdef', substr(h, cast(2*i+1 AS INT), 1)) - 1) * 16
             |    + (strpos('0123456789abcdef', substr(h, cast(2*i+2 AS INT), 1)) - 1) AS b
             |  FROM idx),
             |agg AS (
             |  SELECT doc_id, dim, cast(sum(b) AS DOUBLE) / count(*) AS mean_b
             |  FROM bytes GROUP BY 1, 2)
             |SELECT e.doc_id, e.media_type,
             |  cast(greatest(1, e.n // 64) AS INT) AS n_frames,
             |  d.dim,
             |  cast(coalesce(a.mean_b, 0) AS REAL) AS feat
             |FROM enc e
             |CROSS JOIN dims d
             |LEFT JOIN agg a ON a.doc_id = e.doc_id AND a.dim = d.dim""".stripMargin)),

    // Multimodal: frame sampling (binary slicing), frame sizes only.
    QueryDef("m03_frame_sample",
      (s, dir) => Multimodal.frameSample(Multimodal.attachMedia(docs(s, dir)), 4)
        .select(col("doc_id"), col("media_type"), col("frame_idx"),
          octet_length(col("frame")).as("frame_bytes")),
      None)
  )
}
