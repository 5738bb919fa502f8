package graft.queries

import graft.{QDef, Tables}
import graft.ops.{GlobalOrder, TextAnalysis}
import org.apache.spark.sql.functions._

/** Second tranche of LLM-pipeline operators: curriculum ordering
  * (distributed global row number), deterministic train/val/test split,
  * length bucketing, and corpus-level n-gram statistics. All
  * oracle-checked — each is exact arithmetic or an exact hash both
  * engines can replay.
  */
object LlmExt {

  /** mod-poly-hash fold, the DuckDB-portable text hash (same as llm21). */
  private val hashSql =
    """list_reduce([CAST(0 AS BIGINT)] ||
      |    list_transform(range(1, strlen(text) + 1), i -> CAST(ord(text[i]) AS BIGINT)),
      |    (h, c) -> (h * 131 + c) % 2147483647)""".stripMargin

  val defs: Seq[QDef] = Seq(

    // curriculum ordering: global position under (n_chars DESC, doc_id)
    // — the oracle IS the naive single-partition window, proving the
    // distributed range-partition + offset-cumsum form (ops.GlobalOrder)
    // computes the identical total order
    QDef("llm27_curriculum_order",
      """SELECT doc_id, n_chars,
        |  ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS pos
        |FROM documents""".stripMargin) { (s, dir) =>
      GlobalOrder.globalRowNumber(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        Seq(col("n_chars").desc, col("doc_id")))
        .select(col("doc_id"), col("n_chars"), col("pos"))
    },

    // deterministic content-hash train/val/test split (80/10/10):
    // reproducible across runs/partitionings, duplicate-consistent (a
    // doc and its exact copy always land in the same split)
    QDef("llm28_train_split",
      s"""SELECT doc_id,
         |  CASE WHEN $hashSql % 100 < 80 THEN 'train'
         |       WHEN $hashSql % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin) { (s, dir) =>
      TextAnalysis.deterministicSplit(Tables.load(s, dir, "documents"),
          "text", Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select(col("doc_id"), col("split"))
    },

    // length-bucketed batching stats: arithmetic bucketing (floor(n/16),
    // capped) — unlike ntile it needs NO global sort, so it scales and
    // bucket identity is stable as the corpus grows
    QDef("llm29_length_buckets",
      """SELECT LEAST(len(string_split(text, ' ')) // 16, 7) AS bucket,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(MIN(len(string_split(text, ' '))) AS INTEGER) AS min_tokens,
        |  CAST(MAX(len(string_split(text, ' '))) AS INTEGER) AS max_tokens
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      val nTok = size(TextAnalysis.tokens(col("text")))
      Tables.load(s, dir, "documents")
        .withColumn("bucket", least(floor(nTok / 16).cast("int"), lit(7)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(nTok).cast("bigint").as("total_tokens"),
          min(nTok).as("min_tokens"), max(nTok).as("max_tokens"))
    },

    // corpus-level bigram top-k with deterministic ties — one explode +
    // one partial-aggregated count shuffle + a 20-row TakeOrdered; the
    // shape that survives any corpus size
    QDef("llm30_ngram_topk",
      """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |b AS (SELECT unnest(list_transform(range(1, len(tk)),
        |        i -> tk[i] || ' ' || tk[i + 1])) AS bigram FROM t)
        |SELECT bigram, COUNT(*) AS n FROM b GROUP BY 1
        |ORDER BY n DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
      // tokens materialize into a column FIRST: referencing the split()
      // expression inside the lambda would re-run it on every element_at
      // access (O(tokens²) chars per doc — measured ~6× slower)
      val tk = col("tk")
      val bigrams = when(size(tk) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(tk) - 1),
          i => concat(element_at(tk, i), lit(" "), element_at(tk, i + 1))))
      Tables.load(s, dir, "documents")
        .select(TextAnalysis.tokens(col("text")).as("tk"))
        .select(explode(bigrams).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    },

    // per-label embedding centroids (class prototypes): posexplode to
    // (label, dim) and aggregate — one partial-aggregated shuffle keyed
    // on (label, dim), never a per-label collect. Exactness route: float
    // -> shortest-repr string -> DECIMAL(38,18) is EXACT in both engines
    // for |x| >= 1e-9 (<= 18 decimal places), unlike a double->decimal
    // cast whose 12th-dp rounding can diverge; the sum then rounds to
    // scale 12 BEFORE the double cast (scale-18 sums exceed 2^53 scaled
    // units — the determinism rule from Relational.scala)
    QDef("llm31_label_centroids",
      """WITH ex AS (
        |  SELECT label,
        |    unnest(list_transform(range(1, len(embedding) + 1),
        |      i -> {'pos': i - 1, 'x': CAST(CAST(embedding[i] AS VARCHAR) AS DECIMAL(38,18))}),
        |      recursive := true)
        |  FROM embeddings)
        |SELECT label, CAST(pos AS INTEGER) AS pos, COUNT(*) AS n,
        |  CAST(ROUND(SUM(x), 12) AS DOUBLE) / COUNT(*) AS mean_val
        |FROM ex GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("string").cast("decimal(38,18)")).as("s"))
        .select(col("label"), col("pos"), col("n"),
          (round(col("s"), 12).cast("double") / col("n")).as("mean_val"))
    },

    // sliding-window document chunking (stride 24, width 32 — an
    // overlapping-context pretraining idiom): chunk starts come from one
    // sequence() over a MATERIALIZED token column, so the whole op is a
    // narrow per-row transform + generator, no shuffle
    QDef("llm33_chunking",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |c AS (SELECT doc_id, tk,
        |        unnest(range(0, CAST(ceil(CAST(len(tk) AS DOUBLE) / 24.0) AS BIGINT))) AS ci
        |      FROM t)
        |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
        |  CAST(len(list_slice(tk, ci * 24 + 1, LEAST(ci * 24 + 32, len(tk)))) AS INTEGER)
        |    AS n_chunk_tokens,
        |  tk[ci * 24 + 1] AS first_token
        |FROM c""".stripMargin) { (s, dir) =>
      TextAnalysis.chunkDocs(Tables.load(s, dir, "documents"),
        "text", "doc_id", width = 32, stride = 24)
    },

    // content scrubbing with audit counts (the PII-redaction shape): a
    // regex blocklist is replaced inline and the match count kept for
    // the audit trail — narrow map-side op; the pattern is a literal
    // alternation, identical under Java regex and RE2
    QDef("llm34_scrub_audit",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, 'key|hash')) AS INTEGER) AS n_redacted,
        |  CAST(length(regexp_replace(text, 'key|hash', '[REDACTED]', 'g')) AS INTEGER)
        |    AS n_chars_after
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("key|hash"), lit(0))).as("n_redacted"),
          length(regexp_replace(col("text"), "key|hash", "[REDACTED]")).as("n_chars_after"))
    },

    // repetition filter (the Gopher-style quality rule): top token
    // frequency and its ratio of the doc — two partial-aggregated
    // shuffles, no per-doc collect; ratio is exact int/int division
    QDef("llm35_repetition",
      """WITH tf AS (
        |  SELECT doc_id, term, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1, 2)
        |SELECT doc_id, MAX(c) AS top_tf,
        |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_ratio
        |FROM tf GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_tf"),
          (max(col("c")).cast("double") / sum(col("c")).cast("double")).as("top_ratio"))
    },

    // corpus datasheet: the one-pass summary a training-data release
    // ships (docs, tokens, chars, language count, exact-dup rate, mean
    // quality) — one scan, partial-aggregated; the two COUNT(DISTINCT)s
    // are the only shuffles. Mean quality decimal-lifts before dividing
    // so the result is order-independent and oracle-exact
    QDef("llm36_corpus_datasheet",
      s"""SELECT COUNT(*) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |  COUNT(DISTINCT lang) AS n_langs,
         |  COUNT(DISTINCT text) AS n_distinct_texts,
         |  CAST(SUM(CAST(
         |    0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |      / CAST(len(string_split(text, ' ')) AS DOUBLE))
         |    + 0.2 * (CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
         |         [${graft.ops.TextAnalysis.StopWords.map("'" + _ + "'").mkString(",")}])) AS DOUBLE)
         |      / CAST(len(string_split(text, ' ')) AS DOUBLE))
         |    + 0.3 * LEAST(1.0, CAST(n_chars AS DOUBLE) / 500.0) AS DECIMAL(28,12)))
         |    AS DOUBLE) / COUNT(*) AS mean_quality
         |FROM documents""".stripMargin) { (s, dir) =>
      val scored = TextAnalysis.qualityScore(Tables.load(s, dir, "documents"))
      scored.agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text")))).cast("bigint").as("total_tokens"),
        sum(col("n_chars")).cast("bigint").as("total_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        (sum(col("quality").cast("decimal(28,12)")).cast("double")
          / count(lit(1))).as("mean_quality"))
    },

    // REAL image resize: decode the PNG, nearest-neighbor resample to
    // 8x8 (out(x,y) = src(x*w//8, y*h//8)), re-encode, then RE-decode
    // via extractFeatures — the oracle recomputes the resampled pixels'
    // channel sum from the source-pixel formula at the mapped
    // coordinates, so the full decode→resample→encode→decode chain is
    // hash-checked
    QDef("llm32_multimodal_resize",
      """WITH g AS (SELECT doc_id AS media_id,
        |    doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
        |  FROM documents)
        |SELECT media_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        |  CAST(64 AS INTEGER) AS n_pixels,
        |  CAST(list_aggregate(flatten(list_transform(range(0, 8), y ->
        |    flatten(list_transform(range(0, 8), x ->
        |      [(7*media_id + 3*((x*w)//8) + 5*((y*h)//8)) % 256,
        |       (11*media_id + 17*((x*w)//8) + 23*((y*h)//8)) % 256,
        |       (29*media_id + 13*((x*w)//8) + 19*((y*h)//8)) % 256])))),
        |    'sum') AS BIGINT) AS channel_sum
        |FROM g""".stripMargin) { (s, dir) =>
      val media = graft.ops.Multimodal.imageTable(Tables.load(s, dir, "documents"))
      val resized = graft.ops.Multimodal.resize(media, dw = 8, dh = 8)
      graft.ops.Multimodal.extractFeatures(resized)
        .select(col("media_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("n_pixels"), col("channel_sum"))
    }
  )
}
