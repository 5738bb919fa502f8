package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Span-level exact dedup (duplicatedSpans / spanDupCoverage) and
  * semantic dedup (semDedup) — planted-case semantics plus the
  * partition-invariance checks the oracle gate can't see. */
class SpanSemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def toks(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("duplicatedSpans: finds exactly the planted cross-doc span") {
    // docs 1 and 2 share one 8-token run; doc 3 is disjoint; doc 4 is
    // too short to produce any span
    val shared = toks(8, "s")
    val docs = Seq(
      (1L, s"${toks(4, "a")} $shared ${toks(4, "b")}"),
      (2L, s"${toks(6, "c")} $shared"),
      (3L, toks(20, "d")),
      (4L, toks(5, "e"))).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "text", "doc_id", w = 8).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("span") == shared)
    assert(r.getAs[Long]("n_docs") == 2L && r.getAs[Long]("n_occ") == 2L)
    assert(r.getAs[Long]("first_doc") == 1L)
  }

  test("duplicatedSpans: within-doc repetition alone does not qualify") {
    val run = toks(8, "r")
    val docs = Seq(
      (1L, s"$run x0 x1 x2 x3 x4 x5 x6 x7 $run"), // twice in ONE doc
      (2L, toks(20, "z"))).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "text", "doc_id", w = 8)
    assert(out.count() == 0)
  }

  test("spanDupCoverage: overlapping spans merge; disjoint runs sum") {
    // doc 1 = 10 identical-to-doc-2 tokens then 10 unique: spans at
    // starts 0,1,2 are duplicated -> merged island [0,10) = 10 tokens
    val shared = toks(10, "s")
    val docs = Seq(
      (1L, s"$shared ${toks(10, "u")}"),
      (2L, s"${toks(10, "v")} $shared")).toDF("doc_id", "text")
    val out = Dedup.spanDupCoverage(docs, "text", "doc_id", w = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_tokens"),
          r.getAs[Double]("dup_ratio"))).toMap
    assert(out(1L) == ((20L, 10L, 0.5)))
    assert(out(2L) == ((20L, 10L, 0.5)))
  }

  test("spanDupCoverage: doc shorter than w gets zero coverage, not dropped") {
    val docs = Seq((1L, toks(5, "a")), (2L, toks(12, "b")),
      (3L, toks(12, "b"))).toDF("doc_id", "text")
    val out = Dedup.spanDupCoverage(docs, "text", "doc_id", w = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(out(1L) == 0L && out(2L) == 12L && out(3L) == 12L)
  }

  test("spanDupCoverage: invariant under input partitioning") {
    val docs = spark.range(0, 200)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          // every third doc shares a boilerplate 12-token prefix
          when(col("id") % 3 === 0, lit(toks(12, "bp")))
            .otherwise(concat_ws(" ", (0 until 12).map(i =>
              concat(lit(s"t${i}_"), col("id"))): _*)),
          concat(lit("tail_"), col("id"))).as("text"))
      .localCheckpoint(true)
    val one = Dedup.spanDupCoverage(docs.repartition(1), "text", "doc_id", w = 8)
      .orderBy("doc_id").collect().toSeq
    val many = Dedup.spanDupCoverage(docs.repartition(7), "text", "doc_id", w = 8)
      .orderBy("doc_id").collect().toSeq
    assert(one == many)
  }

  test("hashSpans: spanDupCoverage hash form equals the string form row-for-row") {
    // the planted fixture (overlap merge + short doc + disjoint doc)
    // plus a 200-doc corpus with boilerplate every third doc — same
    // generators the string-form tests use
    val shared = toks(10, "s")
    val planted = Seq(
      (1L, s"$shared ${toks(10, "u")}"),
      (2L, s"${toks(10, "v")} $shared"),
      (3L, toks(5, "short")),
      (4L, toks(20, "d"))).toDF("doc_id", "text")
    val gen = spark.range(10, 210)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          when(col("id") % 3 === 0, lit(toks(12, "bp")))
            .otherwise(concat_ws(" ", (0 until 12).map(i =>
              concat(lit(s"t${i}_"), col("id"))): _*)),
          concat(lit("tail_"), col("id"))).as("text"))
    for (docs <- Seq(planted, gen.localCheckpoint(true))) {
      val str = Dedup.spanDupCoverage(docs, "text", "doc_id", w = 8)
        .orderBy("doc_id").collect().toSeq
      val hsh = Dedup.spanDupCoverage(docs, "text", "doc_id", w = 8,
        hashSpans = true).orderBy("doc_id").collect().toSeq
      assert(str == hsh, "hash-keyed coverage must equal string-keyed coverage")
    }
  }

  test("hashSpans: duplicatedSpans hash form carries the string form's counts under xxhash64 keys") {
    val shared = toks(8, "s")
    val docs = Seq(
      (1L, s"${toks(4, "a")} $shared ${toks(4, "b")}"),
      (2L, s"${toks(6, "c")} $shared"),
      (3L, s"${toks(12, "bp")} x"), (4L, s"${toks(12, "bp")} y"),
      (5L, toks(20, "d"))).toDF("doc_id", "text")
    val str = Dedup.duplicatedSpans(docs, "text", "doc_id", w = 8)
      // re-key the string form by the same two xxhash64s the hashed
      // path computes — the frames must then match exactly
      .select(xxhash64(col("span")).as("span_h1"),
        xxhash64(lit(1L), col("span")).as("span_h2"),
        col("n_docs"), col("n_occ"), col("first_doc"))
      .orderBy("span_h1", "span_h2").collect().toSeq
    val hsh = Dedup.duplicatedSpans(docs, "text", "doc_id", w = 8,
        hashSpans = true)
      .orderBy("span_h1", "span_h2").collect().toSeq
    assert(str == hsh)
    assert(hsh.nonEmpty, "fixture must actually produce duplicated spans")
  }

  test("semDedup: planted near-identical pair dedups within its cluster; keeps min id") {
    def vec(base: Array[Float]): Array[Float] = base
    val e1 = Array.tabulate(8)(i => if (i == 0) 1f else 0f)
    val e1b = Array.tabulate(8)(i => if (i == 0) 0.99f else if (i == 1) 0.01f else 0f)
    val e2 = Array.tabulate(8)(i => if (i == 4) 1f else 0f)
    val df = Seq(
      (0L, vec(e1)), (1L, vec(e1b)), // near-identical pair, cluster of seed 0
      (25L, vec(e2)), (26L, vec(e2.map(-_)))) // same cluster, opposite: no dup
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "embedding", "vec_id",
        seeds = df.filter(col("vec_id") % 25 === 0),
        seedId = "vec_id", seedEmb = "embedding", threshold = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_dup"))).toMap
    assert(out(0L) == ((0L, false)) && out(1L) == ((0L, true)))
    assert(!out(25L)._2 && !out(26L)._2)
  }

  test("semDedup: cross-cluster near-dups are NOT caught (the SemDeDup contract)") {
    // two near-identical vectors straddling the Voronoi boundary (their
    // nearest seeds differ, and neither is near its own seed at the
    // threshold): the cluster scope intentionally misses the pair
    val a = Array(1f, 0.011f, 0f, 0f)
    val b = Array(1f, -0.011f, 0f, 0f)
    val seedA = Array(1f, 0.2f, 0f, 0f)
    val seedB = Array(1f, -0.2f, 0f, 0f)
    val df = Seq((0L, seedA), (25L, seedB), (3L, a), (4L, b))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "embedding", "vec_id",
        seeds = df.filter(col("vec_id") % 25 === 0),
        seedId = "vec_id", seedEmb = "embedding", threshold = 0.999)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_dup"))).toMap
    assert(out(3L)._1 == 0L && out(4L)._1 == 25L)
    assert(!out(3L)._2 && !out(4L)._2)
  }

  test("semDedup probeAssign: narrow argmax assignment equals the crossJoin form row-for-row") {
    // random vectors + planted exact copies + a zero vector (the 0.0
    // cosine guard) across two quantizers — every (vec, cluster, flag)
    // must match the join form bit-for-bit
    val rnd = new scala.util.Random(7)
    val base = (0 until 300).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val planted = base.filter(_._1 % 30 == 0)
      .map { case (i, v) => (i + 1000L, v.clone()) }
    val zeroed = Seq((2000L, Array.fill(8)(0f)))
    val df = (base ++ planted ++ zeroed).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    for (mod <- Seq(25L, 100L)) {
      val seeds = df.filter(col("vec_id") % mod === 0 && col("vec_id") < 1000L)
      def run(probe: Boolean) = Dedup.semDedup(df, "embedding", "vec_id",
          seeds = seeds, seedId = "vec_id", seedEmb = "embedding",
          threshold = 0.95, probeAssign = probe)
        .orderBy("vec_id").collect().toSeq
      assert(run(false) == run(true),
        s"probeAssign must reproduce the join-form assignment exactly (mod=$mod)")
    }
  }

  test("semDedup probeAssign: non-integral seed ids and non-float embeddings fail loud") {
    import spark.implicits._
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val strSeeds = Seq(("a", Seq(1f, 0f))).toDF("sid", "emb")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Dedup.semDedup(df, "embedding", "vec_id", strSeeds, "sid", "emb",
        threshold = 0.9, probeAssign = true)
    }
    assert(e1.getMessage.contains("integral"), e1.getMessage)
    val dblSeeds = Seq((1L, Seq(1.0, 0.0))).toDF("sid", "emb")
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Dedup.semDedup(df, "embedding", "vec_id", dblSeeds, "sid", "emb",
        threshold = 0.9, probeAssign = true)
    }
    assert(e2.getMessage.contains("array<float>"), e2.getMessage)
    // INT seed ids work and surface as INT cluster_id (type alignment
    // with the join form, which keeps the seed column's native type)
    val intSeeds = Seq((1, Seq(1f, 0f)), (2, Seq(0f, 1f))).toDF("sid", "emb")
    def clusterType(probe: Boolean) =
      graft.ops.Dedup.semDedup(df, "embedding", "vec_id", intSeeds, "sid", "emb",
        threshold = 0.9, probeAssign = probe).schema("cluster_id").dataType
    assert(clusterType(true) == org.apache.spark.sql.types.IntegerType)
    assert(clusterType(true) == clusterType(false),
      "cluster_id type must agree across assignment modes")
  }

  test("semDedupTrained: planted exact copies always flag under the k-means quantizer") {
    // identical vectors share a cell under ANY quantizer (identical
    // argmax), so every planted copy must flag no matter where the
    // trained centroids land
    val rnd = new scala.util.Random(3)
    val base = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val copies = base.filter(_._1 % 20 == 0)
      .map { case (i, v) => (i + 1000L, v.clone()) }
    val df = (base ++ copies).toDF("vec_id", "embedding")
    val out = graft.ops.Dedup.semDedupTrained(df, "embedding", "vec_id",
        kClusters = 8, threshold = 0.999, dim = 8)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_dup")).toMap
    assert(out.size == base.size + copies.size, "every vector must be emitted")
    copies.foreach { case (id, _) =>
      assert(out(id), s"planted copy $id must be flagged")
    }
  }

  test("semDedup plan: seed assignment is a broadcast nested-loop, pairs shuffle on cluster only") {
    val df = (0L until 100L).map(i => (i, Array.fill(4)(i.toFloat % 7)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "embedding", "vec_id",
      seeds = df.filter(col("vec_id") % 25 === 0),
      seedId = "vec_id", seedEmb = "embedding", threshold = 0.99)
    val plan = out.queryExecution.executedPlan.toString
    // the corpus x seeds assignment must NOT be a shuffle join — seeds
    // broadcast, corpus scanned once (narrow)
    assert(!plan.contains("CartesianProduct"),
      s"assignment must broadcast the seeds, not cartesian:\n$plan")
    // the checkpointed assignment feeds everything downstream — the
    // crossJoin pass must not appear again after the checkpoint
    assert(plan.contains("Scan ExistingRDD"),
      s"assignment must be checkpointed (consumed 4x downstream):\n$plan")
  }

  test("empty and degenerate inputs: empty frames in, empty frames out, no crash") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(noDocs, "text", "doc_id", w = 8).count() == 0)
    assert(Dedup.spanDupCoverage(noDocs, "text", "doc_id", w = 8).count() == 0)
    assert(graft.ops.TextAnalysis.bigramLmScore(noDocs, "text", "doc_id").count() == 0)
    assert(graft.ops.TextAnalysis.vocabOovRate(noDocs, "text", "doc_id", 10).count() == 0)
    assert(graft.ops.TextAnalysis.stratifiedSample(
      noDocs.withColumn("lang", lit("en")), "text", "lang", "doc_id", 5).count() == 0)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semDedup(noVecs, "embedding", "vec_id", seeds = noVecs,
      seedId = "vec_id", seedEmb = "embedding", threshold = 0.5).count() == 0)
    // an empty quantizer assigns NOTHING in both assignment forms (the
    // probe branch short-circuits driver-side instead of argmax-ing
    // over zero seeds)
    val someVecs = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    assert(Dedup.semDedup(someVecs, "embedding", "vec_id", seeds = noVecs,
      seedId = "vec_id", seedEmb = "embedding", threshold = 0.5,
      probeAssign = true).count() == 0)
  }

  test("semDedup: maxCluster guard fails loud on a degenerate quantizer") {
    val df = (0L until 40L).map(i => (i, Array(1f, 0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Dedup.semDedup(df, "embedding", "vec_id",
        seeds = df.filter(col("vec_id") === 0),
        seedId = "vec_id", seedEmb = "embedding",
        threshold = 0.9, maxCluster = 10).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("maxCluster"))
  }

  test("semDedup: PAIR-budget guard refuses when total same-cell pair work exceeds maxPairs, even with every cell under maxCluster") {
    // 4 cells x 10 members: largest cell (10) is well under
    // maxCluster=1000, but total pairs = 4 * 45 = 180 — a per-cell
    // bound alone under-guards exactly this shape (many cells just
    // under the cap). The budget knob must drive the refusal.
    val df = (0L until 40L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(4)(j => if (j == c) 1f else 0f))
    }.toDF("vec_id", "embedding")
    val seeds = (0L until 4L).map { c =>
      (c, Array.tabulate(4)(j => if (j == c.toInt) 1f else 0f))
    }.toDF("vec_id", "embedding")
    val prev = spark.conf.getOption("spark.graft.semdedup.maxPairs")
    spark.conf.set("spark.graft.semdedup.maxPairs", "100")
    try {
      val ex = intercept[IllegalStateException] {
        Dedup.semDedup(df, "embedding", "vec_id", seeds = seeds,
          seedId = "vec_id", seedEmb = "embedding",
          threshold = 0.9, maxCluster = 1000).collect()
      }
      assert(ex.getMessage.contains("maxPairs"), ex.getMessage)
      // at budget >= 180 the same frame passes and computes verdicts
      spark.conf.set("spark.graft.semdedup.maxPairs", "180")
      assert(Dedup.semDedup(df, "embedding", "vec_id", seeds = seeds,
        seedId = "vec_id", seedEmb = "embedding",
        threshold = 0.9, maxCluster = 1000).count() == 40)
      // the probe tail enforces the same budget (pool pairs)
      spark.conf.set("spark.graft.semdedup.maxPairs", "100")
      val exP = intercept[IllegalStateException] {
        Dedup.semDedupIncremental(
          corpus = df.filter(col("vec_id") < 36),
          batch = df.filter(col("vec_id") >= 36),
          "embedding", "vec_id", seeds = seeds,
          seedId = "vec_id", seedEmb = "embedding",
          threshold = 0.9, maxCluster = 1000).collect()
      }
      assert(exP.getMessage.contains("maxPairs"), exP.getMessage)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.semdedup.maxPairs", v)
      case None => spark.conf.unset("spark.graft.semdedup.maxPairs")
    }
  }
}
