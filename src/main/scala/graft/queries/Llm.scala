package graft.queries

import graft.{QDef, Tables}
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operator surface (builder mandate + SURVEY.md §2.D):
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
  * cosine), ANN similarity search (brute-force + SRP-LSH), text analysis
  * (token stats, quality, lang-ID, fingerprints), multimodal columns.
  *
  * Oracles exist where the computation is bit-portable to DuckDB (counts,
  * ratios with fixed-order IEEE arithmetic, exact dedup). Hash-based ops
  * (MinHash/SimHash/xxhash fingerprints) and ANN results depend on
  * JVM-side hash functions — those get rows-only driver checks plus
  * ScalaTest specs (candidate-recall vs brute force, determinism).
  */
object Llm {

  val defs: Seq[QDef] = Seq(

    QDef("llm01_token_stats",
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
        |  (CAST(n_chars AS DOUBLE) - CAST(len(string_split(text, ' ')) - 1 AS DOUBLE))
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
        |FROM documents""".stripMargin) { (s, dir) =>
      TextAnalysis.tokenStats(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"), col("n_uniq_tokens"), col("avg_token_len"))
    },

    QDef("llm02_quality",
      s"""SELECT doc_id,
         |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_ratio,
         |  CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
         |       [${TextAnalysis.StopWords.map("'" + _ + "'").mkString(",")}])) AS DOUBLE)
         |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
         |  LEAST(1.0, CAST(n_chars AS DOUBLE) / 500.0) AS len_score,
         |  0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |    / CAST(len(string_split(text, ' ')) AS DOUBLE))
         |  + 0.2 * (CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
         |       [${TextAnalysis.StopWords.map("'" + _ + "'").mkString(",")}])) AS DOUBLE)
         |    / CAST(len(string_split(text, ' ')) AS DOUBLE))
         |  + 0.3 * LEAST(1.0, CAST(n_chars AS DOUBLE) / 500.0) AS quality
         |FROM documents""".stripMargin) { (s, dir) =>
      TextAnalysis.qualityScore(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), col("uniq_ratio"), col("stop_ratio"),
          col("len_score"), col("quality"))
    },

    QDef.noOracle("llm03_langid") { (s, dir) =>
      TextAnalysis.langId(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("pred_lang"), col("lang_score"))
    },

    QDef.noOracle("llm04_fingerprints") { (s, dir) =>
      TextAnalysis.fingerprints(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), col("content_hash"), col("rolling_fp"), col("simhash_fp"))
    },

    QDef("llm05_dedup_exact",
      """SELECT doc_id, text FROM (
        |  SELECT doc_id, text,
        |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin) { (s, dir) =>
      Dedup.exact(Tables.load(s, dir, "documents"), Seq("text"), "doc_id")
        .select(col("doc_id"), col("text"))
    },

    QDef.noOracle("llm06_dedup_minhash") { (s, dir) =>
      Dedup.minhashCandidates(Tables.load(s, dir, "documents"), "text", "doc_id")
    },

    QDef.noOracle("llm07_dedup_simhash") { (s, dir) =>
      Dedup.simhashNearDup(Tables.load(s, dir, "documents"), "text", "doc_id")
    },

    QDef.noOracle("llm08_ngram_jaccard") { (s, dir) =>
      Dedup.nearDupJaccard(Tables.load(s, dir, "documents"), "text", "doc_id",
        threshold = 0.8)
    },

    QDef.noOracle("llm09_knn_brute") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.bruteForceTopK(emb, queries, k = 10)
    },

    QDef.noOracle("llm10_knn_lsh") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.lshTopK(emb, queries, k = 10, nPlanes = 4)
    },

    QDef.noOracle("llm11_embed_neardup") { (s, dir) =>
      Dedup.embeddingNearDup(Tables.load(s, dir, "embeddings"), "embedding",
        "vec_id", threshold = 0.40, nPlanes = 4)
    },

    // hash-based exact dedup: survivors identical to llm05 (no 64-bit
    // collisions in this corpus), but only the hash ever shuffles
    QDef("llm14_dedup_byhash",
      """SELECT doc_id FROM (
        |  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin) { (s, dir) =>
      Dedup.exactByHash(Tables.load(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"))
    },

    QDef.noOracle("llm15_bpeish_tokens") { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      d.select(col("doc_id"),
        size(TextAnalysis.bpeishTokens(col("text"))).as("n_subwords"))
    },

    QDef.noOracle("llm18_knn_lsh_multitable") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.lshTopKMulti(emb, queries, k = 10, nTables = 8, planesPerTable = 4)
    },

    QDef.noOracle("llm16_knn_ivf") { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 50 === 0)
      Similarity.ivfTopK(emb, queries, k = 10, kClusters = 16, nProbe = 6)
    },

    // composed training-data pipeline: quality gate -> exact dedup ->
    // per-language corpus statistics, end to end in one plan
    QDef("llm17_pipeline",
      s"""WITH scored AS (
         |  SELECT doc_id, text, lang,
         |    0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |      / CAST(len(string_split(text, ' ')) AS DOUBLE))
         |    + 0.2 * (CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
         |         [${TextAnalysis.StopWords.map("'" + _ + "'").mkString(",")}])) AS DOUBLE)
         |      / CAST(len(string_split(text, ' ')) AS DOUBLE))
         |    + 0.3 * LEAST(1.0, CAST(n_chars AS DOUBLE) / 500.0) AS quality,
         |    len(string_split(text, ' ')) AS n_tokens
         |  FROM documents
         |), deduped AS (
         |  SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |    FROM scored WHERE quality >= 0.55) WHERE rn = 1
         |)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM deduped GROUP BY lang""".stripMargin) { (s, dir) =>
      val scored = TextAnalysis.qualityScore(Tables.load(s, dir, "documents"))
        .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
        .filter(col("quality") >= 0.55)
      Dedup.exact(scored, Seq("text"), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("total_tokens"))
    },

    QDef.noOracle("llm12_multimodal_features") { (s, dir) =>
      val media = Multimodal.mediaTable(Tables.load(s, dir, "documents"))
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("meta.width").as("width"),
          col("meta.format").as("format"), col("n_bytes"), col("features"))
    },

    QDef.noOracle("llm13_multimodal_frames") { (s, dir) =>
      val media = Multimodal.mediaTable(Tables.load(s, dir, "documents"))
      Multimodal.sampleFrames(media, nFrames = 4)
        .select(col("media_id"), col("frame_idx"), length(col("frame_bytes")).as("frame_len"))
    }
  )
}
