package graft.ops

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (builder mandate +
  * SURVEY.md §2.D). All narrow, shuffle-free, codegen-friendly column
  * transforms — at 100 TB these run map-side at scan speed.
  *
  * Determinism: the token/quality formulas use only arithmetic that is
  * bit-identical between Spark and DuckDB (integer counts, IEEE double
  * division/multiply/add in fixed order), so they are oracle-checkable.
  */
object TextAnalysis {

  /** Stopword list shared with the oracle SQL — keep in sync. */
  val StopWords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  def tokens(text: Column): Column = split(text, " ")

  /** A helper-column name guaranteed absent from df (a fixed "__tk"
    * would silently clobber a caller's same-named column — see
    * OpUtils.freshCol for the case-insensitivity requirement). */
  private def freshCol(df: DataFrame, base: String): String =
    OpUtils.freshCol(df.columns, base)

  /** Whitespace tokens + a BPE-ish subword split on non-alnum boundaries. */
  def bpeishTokens(text: Column): Column =
    split(text, "(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])|[^a-z0-9]+")

  /** Collapse runs of consecutive repeated tokens ("batch batch batch"
    * -> "batch") — the standard repetition-normalization step before
    * dedup/quality scoring (pathological generator/crawler output
    * inflates token counts and defeats shingle similarity). Narrow,
    * shuffle-free; emits the cleaned text plus how many tokens the
    * collapse removed. */
  def collapseRepeats(df: DataFrame, textCol: String = "text",
      id: String = "doc_id"): DataFrame = {
    val tk = freshCol(df, "__tk")
    df.withColumn(tk, tokens(col(textCol)))
      // 0-based lambda index i: element_at(tk, i) is the 1-based
      // PREVIOUS element; the i = 0 branch short-circuits the lookup
      .withColumn("__kept",
        expr(s"filter($tk, (x, i) -> i = 0 OR x != element_at($tk, i))"))
      .select(col(id), concat_ws(" ", col("__kept")).as("clean_text"),
        (size(col(tk)) - size(col("__kept"))).cast("bigint").as("n_removed"))
  }

  /** Per-document token statistics. */
  def tokenStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    // token array materialized once: each consuming column would
    // otherwise re-run split() per row (see shinglesFromTokens)
    val tk = freshCol(df, "__tk")
    val t = col(tk)
    df.withColumn(tk, tokens(col(textCol)))
      .withColumn("n_tokens", size(t))
      .withColumn("n_uniq_tokens", size(array_distinct(t)))
      .withColumn("avg_token_len",
        (col("n_chars").cast("double") - (col("n_tokens") - 1).cast("double"))
          / col("n_tokens").cast("double"))
      .drop(tk)
  }

  /** Quality score: unique-token ratio, stopword ratio, length saturation —
    * combined in a fixed-order linear form (SQL-portable, no libm). */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tk = freshCol(df, "__tk")
    val t = col(tk)
    val nTok = size(t).cast("double")
    val uniqRatio = size(array_distinct(t)).cast("double") / nTok
    val stopRatio = size(array_intersect(t, lit(StopWords.toArray))).cast("double") / nTok
    val lenScore = least(lit(1.0), col("n_chars").cast("double") / lit(500.0))
    df.withColumn(tk, tokens(col(textCol)))
      .withColumn("uniq_ratio", uniqRatio)
      .withColumn("stop_ratio", stopRatio)
      .withColumn("len_score", lenScore)
      .withColumn("quality",
        lit(0.5) * col("uniq_ratio") + lit(0.2) * col("stop_ratio") + lit(0.3) * col("len_score"))
      .drop(tk)
  }

  /** Language-ID by n-gram/marker-profile heuristic: score each language's
    * marker list against the token set; highest (score, lang) wins.
    * A real deployment swaps the profiles for trained n-gram tables — the
    * plumbing (pure column ops, no shuffle) is the deliverable. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "a", "it", "to", "in"),
    "de" -> Seq("der", "und", "die", "ist", "das", "ein", "zu", "nicht"),
    "fr" -> Seq("le", "et", "la", "est", "un", "que", "pas", "des"),
    "es" -> Seq("el", "y", "la", "es", "un", "que", "no", "los"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"))

  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tk = freshCol(df, "__tk")
    val best = freshCol(df, "__best")
    val t = col(tk)
    val scored = array(LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(
        (size(array_intersect(t, lit(markers.toArray))).cast("double")
          / size(t).cast("double")).as("score"),
        lit(lang).as("lang"))
    }: _*)
    df.withColumn(tk, tokens(col(textCol)))
      .withColumn(best, array_max(scored))
      .withColumn("pred_lang", col(s"$best.lang"))
      .withColumn("lang_score", col(s"$best.score"))
      .drop(best, tk)
  }

  /** Document fingerprints: 64-bit content hash, order-sensitive rolling
    * hash, and order-insensitive SimHash (near-dup capable). */
  def fingerprints(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tk = freshCol(df, "__tk")
    val t = col(tk)
    df.withColumn(tk, tokens(col(textCol)))
      .withColumn("content_hash", xxhash64(col(textCol)))
      .withColumn("rolling_fp", rolling_hash(t))
      .withColumn("simhash_fp", simhash64(t))
      .drop(tk)
  }

  /** Oracle-portable fingerprints: the same three document prints as
    * [[fingerprints]] but built from modular-polynomial hashes whose
    * every intermediate fits in BIGINT, so DuckDB replays each fold
    * bit-for-bit (the xxhash64 prints above are JVM-specific and can
    * only be rows-checked). content_fp hashes the raw text (llm21's
    * fold); rolling_fp folds per-token hashes order-sensitively mod
    * 2^57 (so h*31 + token never leaves 63 bits); simhash_fp is the
    * polynomial-vote SimHash (bits 0..61). */
  def fingerprintsPortable(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tk = freshCol(df, "__tk")
    val t = col(tk)
    val rollingMod = 1L << 57
    df.withColumn(tk, tokens(col(textCol)))
      .withColumn("content_fp", mod_poly_hash(col(textCol)))
      .withColumn("rolling_fp",
        aggregate(transform(t, tok => mod_poly_hash(tok)), lit(0L),
          (h, x) => (h * lit(31L) + x) % lit(rollingMod)))
      .withColumn("simhash_fp", simhash64_poly(t))
      .drop(tk)
  }

  /** n-token shingles from a token-array column: ["a","b","c","d"] with
    * n=3 -> ["a b c", "b c d"] — the MinHash/Jaccard input.
    *
    * PERF CONTRACT: pass a MATERIALIZED column (an attribute), not an
    * inline `split(...)` expression — expressions referenced inside the
    * transform lambda re-evaluate on every element access (higher-order
    * functions run interpreted, no subexpression elimination), turning
    * shingling O(tokens²) in characters. */
  def shinglesFromTokens(t: Column, n: Int = 3): Column =
    when(size(t) < n, array(concat_ws(" ", t)))
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))

  /** Shingles directly from text — convenience for cold paths; hot paths
    * project `tokens(...)` into a column and use [[shinglesFromTokens]]
    * (see PERF CONTRACT there). */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** Top-k terms per document by tf-idf, rational variant:
    * score = tf * N / df (no logarithm — libm `log` is not guaranteed
    * correctly rounded across engines, while this fixed-order
    * multiply/divide is bit-portable; the ranking it induces is the same
    * as tf * (N/df) monotone weighting). Two shuffles total — term counts
    * and document frequencies — both partial-aggregated map-side;
    * the corpus size N rides along as a broadcast scalar. Ties break by
    * term asc, so results are deterministic. */
  def tfidfTopTerms(df: DataFrame, textCol: String, id: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(id), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    // tf already has exactly one row per (doc, term) — document
    // frequencies fall out of it with a tiny aggregation, instead of
    // re-running the scan+tokenize+explode lineage a second time plus a
    // distinct shuffle (checkpoint: tf is also the join's left side)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(id))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n").cast("double") / col("df").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(id), col("term"), col("score"), col("rank"))
  }

  /** Deterministic corpus mixing: keep a document iff
    * mod_poly_hash(text) % outOf < rate(group). Content-hash gating makes
    * the sample reproducible across runs, clusters, and partitionings —
    * and keeps exact duplicates together (both copies of a text land on
    * the same side of the gate), unlike rand()-based sampling. This is
    * the down-weight-overrepresented-domains step of a training-data
    * pipeline; rates are per-group keep numerators out of `outOf`. */
  def deterministicMix(df: DataFrame, textCol: String, groupCol: String,
      rates: Map[String, Int], outOf: Int = 1000): DataFrame = {
    require(rates.nonEmpty && rates.values.forall(r => r >= 0 && r <= outOf),
      s"rates must be in [0, $outOf]")
    val rate = rates.foldLeft(lit(outOf)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.filter(mod_poly_hash(col(textCol)) % outOf < rate)
  }

  /** Sliding-window document chunking (overlapping pretraining contexts):
    * chunk i covers tokens [i*stride, i*stride + width) with the last
    * chunk clipped; every token lands in >= 1 chunk and chunk starts
    * always fall inside the doc. Narrow per-row transform + generator —
    * no shuffle; the token array materializes once per row (see
    * shinglesFromTokens' PERF CONTRACT). */
  def chunkDocs(df: DataFrame, textCol: String, id: String,
      width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      "need 0 < stride <= width (gap-free coverage)")
    df.select(col(id), tokens(col(textCol)).as("tk"))
      .withColumn("n", size(col("tk")))
      .withColumn("chunks", expr(
        s"transform(sequence(0, cast(ceil(n / $stride.0) as int) - 1), " +
          s"i -> slice(tk, i * $stride + 1, $width))"))
      .select(col(id), posexplode(col("chunks")).as(Seq("chunk_idx", "ct")))
      .select(col(id), col("chunk_idx"),
        size(col("ct")).as("n_chunk_tokens"),
        element_at(col("ct"), 1).as("first_token"))
  }

  /** Per-document Simpson (Herfindahl) token-diversity index:
    * D = 1 - Σ c_t² / T² over term counts c_t, T = token total. The
    * no-transcendentals cousin of Shannon entropy (libm `log` is not
    * correctly rounded across engines; this is one exact int ratio and
    * one double divide, bit-portable) — high D = diverse vocabulary,
    * low D = repetitive doc. Two partial-aggregated shuffles keyed on
    * (doc, term) then doc; no per-doc collect, so it scales with corpus
    * size, not document count per partition. */
  def simpsonDiversity(df: DataFrame, textCol: String, id: String): DataFrame =
    df.select(col(id), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("c"))
      .groupBy(col(id))
      .agg(sum(col("c")).cast("bigint").as("n_tokens"),
        sum(col("c") * col("c")).cast("bigint").as("sum_c2"))
      .withColumn("diversity",
        lit(1.0) - col("sum_c2").cast("double")
          / (col("n_tokens") * col("n_tokens")).cast("double"))

  /** Deterministic weighted sampling: priority = hash(content) / weight,
    * keep the k smallest. A longer/heavier row gets a proportionally
    * smaller priority, so inclusion probability grows with weight, while
    * the content hash (not rand()) makes the sample reproducible across
    * runs, clusters, and partitionings, and duplicate-consistent. The
    * global top-k plans as TakeOrderedAndProject — per-partition bounded
    * heaps + a k-row driver merge, no global sort, so k bounds memory at
    * any corpus size. Ties break by id asc (priority is one exact double
    * division, identical in any engine).
    *
    * Weights must be strictly positive: weight 0 would yield an
    * Infinity/NaN priority and a negative weight a negative priority
    * that always wins the top-k — both nonsense, and NaN/Inf ordering
    * is a cross-engine determinism hazard. Enforced per-row, fail-loud. */
  def weightedPrioritySample(df: DataFrame, textCol: String, weightCol: String,
      id: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("__w",
        when(col(weightCol).cast("double") > 0.0, col(weightCol).cast("double"))
          .otherwise(raise_error(concat(
            lit(s"weightedPrioritySample: non-positive weight in '$weightCol': "),
            col(weightCol).cast("string")))))
      .withColumn("priority",
        mod_poly_hash(col(textCol)).cast("double") / col("__w"))
      .drop("__w")
      .orderBy(col("priority"), col(id))
      .limit(k)
  }

  /** Output + helper names of the token-budget operators. Their first
    * projection drops every input column except the id (and group), so
    * these can only collide with THOSE names — rejected here with a
    * clear message (case-insensitive, like Spark's default resolver). */
  private val tokenBudgetReserved = Seq("n_tokens", "priority", "cum_tokens",
    "__bucket", "__boffset", "__btotal", "__grp", "__budget", "__b")
  private def requireIdNotReserved(op: String, name: String): Unit =
    require(!tokenBudgetReserved.exists(_.equalsIgnoreCase(name)),
      s"$op: column '$name' collides with a reserved output/helper name " +
        s"(${tokenBudgetReserved.mkString(", ")}); rename it first")

  /** Deterministic sampling to a TOKEN budget — the knob a data-mixture
    * recipe actually turns ("20 B tokens of web, 5 B of code"), where
    * per-document sampling rates only hit a token target in
    * expectation. Documents are taken in content-hash priority order
    * (portable mod-poly hash, doc-id tiebreak) while the running token
    * total stays ≤ `budget` — a deterministic prefix: content-gated
    * (duplicate corpora pick identical prefixes), and monotone in the
    * budget (a bigger budget keeps a superset).
    *
    * The running sum is the same two-level cumsum as sequence packing
    * (the single-partition global window's scale path): per-row windows
    * partition by a contiguous PRIORITY-range bucket, bucket offsets
    * are a #buckets-row window, and — the budget-specific win — buckets
    * whose offset already exceeds the budget are pruned BEFORE the
    * per-row pass, so the heavy window touches ~budget worth of
    * documents no matter the corpus size. */
  def tokenBudgetSample(df: DataFrame, textCol: String, id: String,
      budget: Long, bucketSize: Long = 1L << 21): DataFrame = {
    require(budget >= 0, s"token budget must be >= 0, got $budget")
    require(bucketSize > 0, s"bucketSize must be positive, got $bucketSize")
    // the first projection keeps ONLY the id column from the input, so
    // the declared outputs and internal helpers can collide with nothing
    // but the id itself — fail loud instead of a duplicate-column plan
    requireIdNotReserved("tokenBudgetSample", id)
    // checkpointed: both the bucket-offset aggregation and the final
    // join consume this frame, and re-executing it re-folds the
    // whole-text priority hash per row (the multi-consumption rule in
    // DESIGN.md — narrow but per-row expensive, output compact)
    val withP = df.select(col(id),
        size(tokens(col(textCol))).cast("long").as("n_tokens"),
        mod_poly_hash(col(textCol)).as("priority"))
      .withColumn("__bucket", expr(s"priority DIV $bucketSize"))
      .localCheckpoint(true)
    val wB = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withP.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("__btotal"))
      .withColumn("__boffset", sum(col("__btotal")).over(wB) - col("__btotal"))
      // a bucket whose offset is already past the budget cannot
      // contribute a kept row (cum > offset for every row in it)
      .filter(col("__boffset") < budget)
      .select(col("__bucket"), col("__boffset"))
    val wIn = Window.partitionBy(col("__bucket"))
      .orderBy(col("priority"), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withP.join(broadcast(offsets), "__bucket")
      .withColumn("cum_tokens", col("__boffset") + sum(col("n_tokens")).over(wIn))
      .filter(col("cum_tokens") <= budget)
      .select(col(id), col("n_tokens"), col("priority"), col("cum_tokens"))
  }

  /** The full data-mixture form of [[tokenBudgetSample]]: one token
    * budget PER GROUP (source/domain/language — "20 B web, 5 B code"),
    * each group taking its own content-hash-priority prefix. Groups
    * absent from `budgets` are dropped — a mixture recipe enumerates
    * its sources. Same two-level cumsum, with every window additionally
    * partitioned by the group (bucket offsets are #groups × #buckets
    * rows — still tiny) and the bucket prune applied against each
    * group's own budget. */
  def tokenBudgetMixture(df: DataFrame, textCol: String, id: String,
      groupCol: String, budgets: Map[String, Long],
      bucketSize: Long = 1L << 21): DataFrame = {
    require(budgets.nonEmpty, "budgets must name at least one group")
    require(budgets.values.forall(_ >= 0L), s"budgets must be >= 0: $budgets")
    require(bucketSize > 0, s"bucketSize must be positive, got $bucketSize")
    // only id and groupCol survive the first projection (see
    // tokenBudgetSample) — guard both against the reserved names
    requireIdNotReserved("tokenBudgetMixture", id)
    requireIdNotReserved("tokenBudgetMixture", groupCol)
    val spark = df.sparkSession
    import spark.implicits._
    val bdf = broadcast(budgets.toSeq.toDF("__grp", "__budget"))
    // checkpointed for the same two-consumer reason as
    // tokenBudgetSample's withP (the broadcast budget join is narrow,
    // so nothing else materializes this frame)
    val withP = df.select(col(groupCol).as("__grp"), col(id),
        size(tokens(col(textCol))).cast("long").as("n_tokens"),
        mod_poly_hash(col(textCol)).as("priority"))
      .join(bdf, Seq("__grp")) // drops un-budgeted groups
      .withColumn("__bucket", expr(s"priority DIV $bucketSize"))
      .localCheckpoint(true)
    val wB = Window.partitionBy(col("__grp")).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withP.groupBy(col("__grp"), col("__bucket"))
      .agg(sum(col("n_tokens")).as("__btotal"), first(col("__budget")).as("__b"))
      .withColumn("__boffset", sum(col("__btotal")).over(wB) - col("__btotal"))
      .filter(col("__boffset") < col("__b"))
      .select(col("__grp"), col("__bucket"), col("__boffset"))
    val wIn = Window.partitionBy(col("__grp"), col("__bucket"))
      .orderBy(col("priority"), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withP.join(broadcast(offsets), Seq("__grp", "__bucket"))
      .withColumn("cum_tokens", col("__boffset") + sum(col("n_tokens")).over(wIn))
      .filter(col("cum_tokens") <= col("__budget"))
      .select(col("__grp").as(groupCol), col(id), col("n_tokens"),
        col("priority"), col("cum_tokens"))
  }

  /** Train/eval contamination check: for every document of `evalSplit`,
    * the fraction of its distinct n-token shingles that also occur in any
    * `trainSplit` document. The standard decontamination pass a training
    * corpus runs before an eval release. One equi-join on the shingle
    * string — shuffle keyed by shingle, both sides deduped first so the
    * join input is the distinct-shingle set, not the token stream; the
    * left-outer + count formulation keeps zero-overlap docs in the
    * output. Uses the same deterministicSplit gate as [[deterministicSplit]],
    * so the check reproduces the split it audits. */
  def crossSplitContamination(df: DataFrame, textCol: String, id: String,
      splits: Seq[(String, Int)], trainSplit: String, evalSplit: String,
      shingleN: Int = 5): DataFrame = {
    // checkpointed: both sides of the join consume this frame — without
    // it the scan + hash-split + tokenize + shingle lineage runs twice
    // (the tfidfTopTerms lesson)
    val assigned = deterministicSplit(df, textCol, splits)
      .select(col(id), col("split"), tokens(col(textCol)).as("tk"))
      .withColumn("sh", explode(shinglesFromTokens(col("tk"), shingleN)))
      .select(col(id), col("split"), col("sh"))
      .localCheckpoint(true)
    val trainShingles = assigned.filter(col("split") === trainSplit)
      .select(col("sh")).distinct()
      .withColumn("in_train", lit(1))
    val evalShingles = assigned.filter(col("split") === evalSplit)
      .select(col(id), col("sh")).distinct()
    evalShingles.join(trainShingles, Seq("sh"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("in_train")).as("n_contaminated"))
      .withColumn("contamination_rate",
        col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
  }

  /** Gopher-style per-document repetition fractions (Rae et al. 2021's
    * repetition filters, token-based): `top2_frac` = the most frequent
    * bigram's share of all bigram occurrences, `dup5_frac` = the share
    * of 5-gram occurrences whose 5-gram appears more than once in the
    * document. Templated/looping generator output scores high on both;
    * natural text sits low. ENTIRELY narrow — per-gram counts are
    * recovered as run lengths over the SORTED per-doc gram array
    * (sorting groups equal grams adjacently), so the whole operator is
    * a per-row transform with no shuffle: at 100 TB it runs map-side at
    * scan speed, unlike a (doc, gram) groupBy whose shuffle would carry
    * every gram occurrence. Fractions are integer-over-integer IEEE
    * divisions — oracle-exact. Docs too short for a gram size emit 0. */
  def repetitionSignals(df: DataFrame, textCol: String = "text",
      id: String = "doc_id"): DataFrame = {
    val tkName = freshCol(df, "__tk")
    val t = col(tkName)
    def grams(n: Int): Column =
      when(size(t) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n)))))
    // (max run, occurrences inside runs of length >= 2) over the sorted
    // array — the shuffle-free equivalent of per-gram counts
    def runStats(arr: Column): Column =
      aggregate(
        array_sort(arr),
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
          lit(0L).as("best"), lit(0L).as("dup")),
        (acc, x) => {
          val same = coalesce(acc.getField("prev") === x, lit(false))
          val run = when(same, acc.getField("run") + 1).otherwise(lit(1L))
          val dup = acc.getField("dup") +
            when(!same && acc.getField("run") >= 2, acc.getField("run"))
              .otherwise(lit(0L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"), dup.as("dup"))
        },
        acc => struct(acc.getField("best").as("max_run"),
          (acc.getField("dup") +
            when(acc.getField("run") >= 2, acc.getField("run"))
              .otherwise(lit(0L))).as("dup_occ")))
    val b2 = freshCol(df, "__b2"); val g5 = freshCol(df, "__g5")
    val bs = freshCol(df, "__bs"); val fs = freshCol(df, "__fs")
    df.withColumn(tkName, tokens(col(textCol)))
      .withColumn(b2, grams(2))
      .withColumn(g5, grams(5))
      .withColumn(bs, runStats(col(b2)))
      .withColumn(fs, runStats(col(g5)))
      .select(col(id), size(t).cast("bigint").as("n_tokens"),
        when(size(col(b2)) === 0, lit(0.0))
          .otherwise(col(bs).getField("max_run").cast("double") /
            size(col(b2)).cast("double")).as("top2_frac"),
        when(size(col(g5)) === 0, lit(0.0))
          .otherwise(col(fs).getField("dup_occ").cast("double") /
            size(col(g5)).cast("double")).as("dup5_frac"))
  }

  /** Two-corpus decontamination (the production direction): flag every
    * TRAINING document sharing at least one n-token gram with an
    * external eval/benchmark set, with the count of distinct shared
    * grams. This is the pass a pretraining corpus runs against each
    * benchmark before training — the inverse direction of
    * [[crossSplitContamination]], which audits an internal hash split.
    *
    * Plan shape: both sides explode to per-doc DISTINCT grams; one
    * equi-join keyed by the gram; one per-doc count. The eval side is a
    * benchmark suite — orders of magnitude smaller than the corpus — so
    * its distinct-gram set is broadcast and the corpus side never
    * shuffles: at 100 TB this is a map-side semi-join at scan speed.
    * Docs shorter than n tokens have no grams and cannot be flagged. */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame,
      textCol: String = "text", id: String = "doc_id",
      n: Int = 8): DataFrame = {
    require(n >= 2, s"gram size must be >= 2 tokens, got $n")
    def grams(df: DataFrame, cols: Seq[Column]): DataFrame = {
      val tk = freshCol(df, "__tk")
      df.withColumn(tk, tokens(col(textCol)))
        .filter(size(col(tk)) >= n)
        .select(cols :+ explode(array_distinct(
          shinglesFromTokens(col(tk), n))).as("__gram"): _*)
    }
    val evalGrams = grams(evalDocs, Seq.empty).distinct()
    grams(docs, Seq(col(id)))
      .join(broadcast(evalGrams), Seq("__gram"), "left_semi")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Gopher-style quality RULE GATE with per-rule attribution — the
    * rule-based document filter every production pretraining pipeline
    * runs before model-based scoring (word-count bounds, mean-word-
    * length bounds, a stopword floor, a distinct-token repetition
    * floor), with the FIRST failing rule recorded as `drop_reason` so
    * the filter's impact is auditable per rule (which rule dropped how
    * much of which source — the attribution report data cards need).
    * ENTIRELY narrow and shuffle-free: four arithmetic signals over the
    * token array, evaluated at scan speed; at 100 TB this is a map-only
    * pass. All signals are integer-count arithmetic + one IEEE division
    * each, so DuckDB replays them bit-exactly. Word length is counted
    * in CHARACTERS (Spark `length`, DuckDB `length`), not UTF-8 bytes —
    * byte semantics would shift `mean_wlen` for every non-ASCII doc.
    *
    * Rule order (first fail wins): word_count, mean_word_length,
    * stopwords, repetition. `keep` = no rule fired. */
  def gopherRules(df: DataFrame, textCol: String = "text",
      id: String = "doc_id",
      minWords: Long = 20, maxWords: Long = 90,
      minMeanLen: Double = 4.0, maxMeanLen: Double = 5.1,
      minStopHits: Int = 1, minUniqRatio: Double = 0.35,
      extraCols: Seq[String] = Nil): DataFrame = {
    val tk = freshCol(df, "__tk")
    val t = col(tk)
    val nW = size(t).cast("long")
    // words are single-space separated: non-space chars = len - (n-1).
    // size(t) >= 1 for any non-null text (split("") = [""]) in BOTH
    // Spark and DuckDB, so the zero branch is unreachable today — the
    // guard pins a finite 0.0 (never Infinity/NaN in the report) if the
    // tokenizer ever starts dropping empty tokens.
    val meanLen = when(size(t) === 0, lit(0.0)).otherwise(
      (length(col(textCol)) - size(t) + 1).cast("double") /
        size(t).cast("double"))
    val stopHits = size(array_intersect(array_distinct(t),
      typedLit(StopWords)))
    val uniq = size(array_distinct(t)).cast("double") / size(t).cast("double")
    val reason =
      when(nW < minWords || nW > maxWords, lit("word_count"))
        .when(meanLen < minMeanLen || meanLen > maxMeanLen,
          lit("mean_word_length"))
        .when(stopHits < minStopHits, lit("stopwords"))
        .when(uniq < minUniqRatio, lit("repetition"))
        .otherwise(lit(null).cast("string"))
    df.withColumn(tk, tokens(col(textCol)))
      .select((col(id) +: extraCols.map(col)) ++ Seq(
        nW.as("n_words"), meanLen.as("mean_wlen"),
        stopHits.as("stop_hits"), uniq.as("uniq_ratio"),
        reason.isNull.as("keep"), reason.as("drop_reason")): _*)
  }

  /** Corpus data card: the per-(lang, source) report a pretraining
    * mixture is planned from — document and token counts, exact token-
    * count percentiles, and the share of documents surviving the
    * [[gopherRules]] gate. One shuffle on the (lang, source) grid
    * (hundreds of cells at production scale, map-side partials carry
    * the counts; the exact percentile is the one full-width term, the
    * standard data-card trade — swap in approx_percentile when the
    * grid's value lists outgrow executor memory). */
  def corpusDatacard(df: DataFrame, textCol: String = "text",
      id: String = "doc_id", langCol: String = "lang",
      sourceCol: String = "source"): DataFrame =
    gopherRules(df, textCol, id, extraCols = Seq(langCol, sourceCol))
      .groupBy(col(langCol), col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_tokens"),
        expr("percentile(n_words, 0.5)").as("p50_words"),
        expr("percentile(n_words, 0.95)").as("p95_words"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .withColumn("keep_share",
        col("n_keep").cast("double") / col("n_docs").cast("double"))

  /** Count-based bigram language-model scoring (the CCNet-style
    * statistical quality filter, log-free): score = mean conditional
    * probability P(w2|w1) of a doc's bigrams under the corpus's own
    * bigram counts. Repetitive/templated text scores high, token salad
    * scores low; unlike a neural perplexity filter this needs no model
    * artifact and is exactly reproducible (every probability is one
    * integer-ratio division; the per-doc mean folds in POSITION order,
    * so cross-engine summation order can't drift the double).
    *
    * Plan shape: one bigram explode (checkpointed — three consumers),
    * two count aggregations, one equi-join keyed by bigram, one per-doc
    * re-aggregation. At 100 TB the bigram table is the big object; the
    * production variant keeps only bigrams with count >= floor (rare
    * bigrams' probabilities are noise anyway) and broadcasts that
    * truncated table. Docs with fewer than 2 tokens have no bigrams and
    * are absent from the output. */
  def bigramLmScore(df: DataFrame, textCol: String, id: String): DataFrame = {
    val bg = df.select(col(id).as("__id"), tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col("__id"), posexplode(transform(
        sequence(lit(0), size(col("__tk")) - 2),
        i => struct(element_at(col("__tk"), i + 1).as("w1"),
          element_at(col("__tk"), i + 2).as("w2")))))
      .select(col("__id"), col("pos"), col("col.w1").as("w1"), col("col.w2").as("w2"))
      .localCheckpoint(true)
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2"))
    val uc = bg.groupBy(col("w1")).agg(count(lit(1)).as("__c1"))
    bg.join(bc, Seq("w1", "w2")).join(uc, Seq("w1"))
      .select(col("__id"), col("pos"),
        (col("__c2").cast("double") / col("__c1").cast("double")).as("__pr"))
      .groupBy(col("__id"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, __pr))), x -> x.__pr)")
        .as("__ps"))
      .select(col("__id").as(id),
        size(col("__ps")).cast("bigint").as("n_bigrams"),
        (expr("aggregate(__ps, cast(0.0 as double), (a, b) -> a + b)")
          / size(col("__ps")).cast("double")).as("lm_score"))
  }

  /** Vocabulary coverage: induce the top-`vocabSize` corpus vocabulary
    * (count desc, token asc — a total order, so the boundary is
    * deterministic) and score every document's out-of-vocabulary rate —
    * the coverage audit run before fixing a tokenizer/vocab for
    * training. One token explode — deliberately NOT checkpointed for
    * its two consumers (count aggregation + membership join): like the
    * span explode in Dedup.spanDupCoverage, it is cheap narrow codegen
    * whose materialization costs more than recomputation (measured
    * there, 39 s vs 46 s at 1M docs) — one global top-V
    * (TakeOrderedAndProject, V rows cross the wire), one broadcast
    * membership join (the vocabulary is structurally small), one
    * per-doc count aggregation. */
  def vocabOovRate(df: DataFrame, textCol: String, id: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val tok = df.select(col(id).as("__id"), explode(tokens(col(textCol))).as("t"))
    val vocab = tok.groupBy(col("t")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("t")).limit(vocabSize)
      .select(col("t"), lit(1).as("__v"))
    tok.join(broadcast(vocab), Seq("t"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__v").isNull, 1)).as("n_oov"))
      .select(col("__id").as(id), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double")).as("oov_rate"))
  }

  /** Stratified deterministic sampling: the k smallest content-hash
    * priorities PER GROUP (vs [[weightedPrioritySample]]'s global k) —
    * the "n docs from every language/domain" pipeline step. Content-hash
    * priorities make the sample reproducible and duplicate-consistent;
    * the rank filter plans as WindowGroupLimit (per-partition bounded
    * group heaps before the shuffle), so k bounds memory per group at
    * any corpus size. */
  def stratifiedSample(df: DataFrame, textCol: String, groupCol: String,
      id: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("priority"), col(id))
    df.select(col(groupCol), col(id),
        mod_poly_hash(col(textCol)).as("priority"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Deterministic train/val/test split: each document is assigned to the
    * split whose cumulative weight bucket contains
    * mod_poly_hash(text) % outOf. Content-hash assignment (not rand())
    * makes the split reproducible across runs, clusters, and
    * partitionings, and pins exact duplicates to the same split — the
    * property that prevents train/test contamination from duplicated
    * documents. Weights are numerators out of `outOf` and must sum to it
    * (e.g. Seq("train" -> 80, "val" -> 10, "test" -> 10), outOf = 100). */
  def deterministicSplit(df: DataFrame, textCol: String,
      splits: Seq[(String, Int)], outOf: Int = 100): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0),
      "splits must be non-empty with non-negative weights")
    require(splits.map(_._2).sum == outOf,
      s"split weights must sum to outOf=$outOf")
    val h = mod_poly_hash(col(textCol)) % outOf
    val upperBounds = splits.scanLeft(0) { case (a, (_, w)) => a + w }.tail
    val named = splits.map(_._1).zip(upperBounds)
    val assign = named.init.foldRight(lit(named.last._1): Column) {
      case ((name, ub), els) => when(h < ub, lit(name)).otherwise(els)
    }
    df.withColumn("split", assign)
  }
}
