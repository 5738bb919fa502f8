package graft.queries

import graft.{QDef, Tables}
import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Third tranche of LLM-pipeline operators: Simpson token diversity,
  * deterministic weighted sampling, and train/eval contamination audit.
  * All oracle-checked — exact integer ratios or content-hash gates both
  * engines replay bit-for-bit.
  */
object LlmExt2 {

  /** mod-poly-hash fold, the DuckDB-portable text hash (same as llm21/llm28). */
  private val hashSql =
    """list_reduce([CAST(0 AS BIGINT)] ||
      |    list_transform(range(1, strlen(text) + 1), i -> CAST(ord(text[i]) AS BIGINT)),
      |    (h, c) -> (h * 131 + c) % 2147483647)""".stripMargin

  val defs: Seq[QDef] = Seq(

    // Simpson (Herfindahl) token-diversity index — the rational cousin of
    // Shannon entropy (no libm log, so bit-portable): 1 - Σc²/T². Low
    // diversity flags repetitive/boilerplate docs, complementing llm35's
    // top-token ratio
    QDef("llm37_token_diversity",
      """WITH c AS (
        |  SELECT doc_id, term, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(SUM(c * c) AS BIGINT) AS sum_c2,
        |  1.0 - CAST(SUM(c * c) AS DOUBLE)
        |    / CAST(CAST(SUM(c) AS BIGINT) * CAST(SUM(c) AS BIGINT) AS DOUBLE) AS diversity
        |FROM c GROUP BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.simpsonDiversity(Tables.load(s, dir, "documents"), "text", "doc_id")
    },

    // deterministic weighted sampling (priority = content_hash / weight,
    // k smallest): longer docs are proportionally more likely to be kept,
    // the sample is reproducible and duplicate-consistent, and the global
    // top-k plans as TakeOrderedAndProject (bounded heaps, no global sort)
    QDef("llm38_weighted_sample",
      s"""SELECT doc_id, n_chars,
         |  CAST($hashSql AS DOUBLE) / CAST(n_chars AS DOUBLE) AS priority
         |FROM documents
         |ORDER BY priority, doc_id LIMIT 50""".stripMargin) { (s, dir) =>
      TextAnalysis.weightedPrioritySample(Tables.load(s, dir, "documents"),
          "text", "n_chars", "doc_id", k = 50)
        .select(col("doc_id"), col("n_chars"), col("priority"))
    },

    // per-language tokenizer fertility: subword/word ratio and
    // chars/token by lang — the datasheet cut that decides whether a
    // tokenizer underserves a language. Single scan, one tiny shuffle;
    // ratios are single divisions of exact bigint sums (bit-portable)
    QDef("llm40_lang_fertility",
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
        |  CAST(SUM(len(string_split_regex(
        |    regexp_replace(regexp_replace(text,
        |      '([a-z])([0-9])', '\1' || chr(1) || '\2', 'g'),
        |      '([0-9])([a-z])', '\1' || chr(1) || '\2', 'g'),
        |    '[^a-z0-9]+'))) AS BIGINT) AS total_subwords,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(CAST(SUM(len(string_split_regex(
        |    regexp_replace(regexp_replace(text,
        |      '([a-z])([0-9])', '\1' || chr(1) || '\2', 'g'),
        |      '([0-9])([a-z])', '\1' || chr(1) || '\2', 'g'),
        |    '[^a-z0-9]+'))) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS DOUBLE) AS fertility,
        |  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS DOUBLE) AS chars_per_word
        |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
      val words = sum(size(TextAnalysis.tokens(col("text")))).cast("bigint")
      val subwords = sum(size(TextAnalysis.bpeishTokens(col("text")))).cast("bigint")
      val chars = sum(col("n_chars")).cast("bigint")
      Tables.load(s, dir, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          words.as("total_words"), subwords.as("total_subwords"), chars.as("total_chars"),
          (subwords.cast("double") / words.cast("double")).as("fertility"),
          (chars.cast("double") / words.cast("double")).as("chars_per_word"))
    },

    // multimodal pair packing: caption tokens + image ViT-style patch
    // count (ceil(w/32)·ceil(h/32) from the media metadata) form the
    // per-pair cost, packed into 1024-slot batches by the distributed
    // two-level cumsum (ops.Packing) — the batch-assembly step of a
    // vision-language pipeline. Oracle = the naive global-window form
    QDef("llm43_multimodal_pairs",
      """SELECT doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 1024 AS BIGINT) AS seq_id,
        |  CAST((cum - n_tokens) % 1024 AS BIGINT) AS seq_offset
        |FROM (SELECT doc_id, cost AS n_tokens,
        |    SUM(cost) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM (SELECT doc_id,
        |      CAST(len(string_split(text, ' '))
        |        + ((doc_id % 640 + 32 + 31) // 32)
        |          * ((doc_id % 480 + 32 + 31) // 32) AS BIGINT) AS cost
        |    FROM documents))""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val media = graft.ops.Multimodal.mediaTable(docs)
      val paired = docs.select(col("doc_id"), col("text"))
        .join(media.select(col("media_id"), col("meta")),
          col("doc_id") === col("media_id"))
      val patches = expr("((meta.width + 31) div 32) * ((meta.height + 31) div 32)")
      val cost = size(TextAnalysis.tokens(col("text"))) + patches
      graft.ops.Packing.packSequences(paired, "doc_id", cost,
        capacity = 1024L, bucketSize = 64L)
    },

    // train/val contamination audit: fraction of each val doc's distinct
    // 5-gram shingles that occur anywhere in train (same content-hash
    // split as llm28, so the audit reproduces the split it checks); the
    // one shuffle is the equi-join on the shingle string
    QDef("llm39_contamination",
      s"""WITH sp AS (
         |  SELECT doc_id, string_split(text, ' ') AS tk,
         |    CASE WHEN $hashSql % 100 < 80 THEN 'train'
         |         WHEN $hashSql % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, split, unnest(
         |    CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
         |         ELSE list_transform(range(0, len(tk) - 4),
         |                i -> array_to_string(tk[i + 1 : i + 5], ' ')) END) AS sh
         |  FROM sp),
         |train_sh AS (SELECT DISTINCT sh FROM sh WHERE split = 'train'),
         |val_sh AS (SELECT DISTINCT doc_id, sh FROM sh WHERE split = 'val')
         |SELECT v.doc_id, COUNT(*) AS n_shingles,
         |  COUNT(t.sh) AS n_contaminated,
         |  CAST(COUNT(t.sh) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS contamination_rate
         |FROM val_sh v LEFT JOIN train_sh t ON v.sh = t.sh
         |GROUP BY v.doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.crossSplitContamination(Tables.load(s, dir, "documents"),
        "text", "doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10),
        trainSplit = "train", evalSplit = "val", shingleN = 5)
    },

    // incremental near-dup: every tenth doc arrives as a NEW batch and
    // is matched against the remaining corpus via its persisted LSH band
    // index (corpus×corpus pairs never re-form — the growing-corpus
    // production shape). Oracle = the zero-false-negative prefix-filter
    // join restricted to pairs touching the batch; greenness asserts the
    // 8x2 banding's empirical recall 1, exactly like llm08.
    QDef("llm44_incremental_neardup",
      s"""WITH ${OracleSql.prefixFilterCtes(0.8)}
         |${OracleSql.verifiedPairsSelect(0.8,
             extraWhere = " AND (id_a % 10 = 0 OR id_b % 10 = 0)")}""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      Dedup.incrementalNearDup(
        corpus = docs.filter(col("doc_id") % 10 =!= 0),
        batch = docs.filter(col("doc_id") % 10 === 0),
        "text", "doc_id", threshold = 0.8)
    },

    // the same incremental dedup against a PREBUILT persisted index
    // (build once on files, dedup every later batch with zero corpus
    // recompute — the cross-session lifecycle llm45 demonstrates for
    // ANN): identical results to llm44, so the same oracle holds
    QDef("llm46_neardup_from_index",
      s"""WITH ${OracleSql.prefixFilterCtes(0.8)}
         |${OracleSql.verifiedPairsSelect(0.8,
             extraWhere = " AND (id_a % 10 = 0 OR id_b % 10 = 0)")}""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val idx = graft.TmpDirs.scoped(
        "graft-ndidx-" + java.lang.Integer.toHexString(dir.hashCode))
      Dedup.buildNearDupIndex(docs.filter(col("doc_id") % 10 =!= 0), idx)
      Dedup.incrementalNearDupFromIndex(s, idx,
        docs.filter(col("doc_id") % 10 === 0), threshold = 0.8)
    },

    // consecutive-repeat collapse (repetition normalization): DuckDB's
    // 1-based list_filter lambda replays Spark's 0-based filter exactly
    // (both guard the first element, both compare against the previous)
    QDef("llm47_collapse_repeats",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_filter(tk, (x, i) -> i = 1 OR x <> tk[i - 1]), ' ') AS clean_text,
        |  CAST(len(tk) - len(list_filter(tk, (x, i) -> i = 1 OR x <> tk[i - 1])) AS BIGINT) AS n_removed
        |FROM t""".stripMargin) { (s, dir) =>
      TextAnalysis.collapseRepeats(Tables.load(s, dir, "documents"))
    }
  )
}
