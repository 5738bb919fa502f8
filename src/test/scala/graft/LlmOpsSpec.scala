package graft

import graft.functions.VectorFunctions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Specs for the non-oracle LLM ops: candidate recall of the LSH/banding
  * paths against exact computation, custom-expression correctness,
  * determinism of the stubbed multimodal pipeline.
  */
class LlmOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = {
    // corpus with planted near-dups: pairs (id, id+1000) share most tokens
    val base = (0 until 50).map { i =>
      val words = (0 until 40).map(j => s"w${(i * 7 + j * 13) % 97}")
      (i.toLong, words.mkString(" "))
    }
    val nearDups = base.take(10).map { case (id, text) =>
      (id + 1000L, text.replaceFirst("w\\d+", "zz"))
    }
    val exactDups = base.slice(10, 13).map { case (id, text) => (id + 2000L, text) }
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
      .withColumn("n_chars", length($"text"))
  }

  test("cosine_sim matches manual computation and handles zero vectors") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),   // orthogonal -> 0
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),   // identical -> 1
      (Array(1f, 1f, 0f), Array(1f, 0f, 0f)),   // 45 deg -> ~0.7071
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f))    // zero vector -> 0
    ).toDF("a", "b")
    val sims = df.select(cosine_sim($"a", $"b")).collect().map(_.getDouble(0))
    assert(sims(0) == 0.0)
    assert(math.abs(sims(1) - 1.0) < 1e-12)
    assert(math.abs(sims(2) - math.sqrt(0.5)) < 1e-12)
    assert(sims(3) == 0.0)
  }

  test("exact dedup keeps smallest id per duplicate group") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
    assert(out.count() == 60) // 63 docs - 3 exact dups
    assert(out.filter($"doc_id" >= 2000).count() == 0)
  }

  test("minhash candidates recover planted exact and near duplicates") {
    val cands = Dedup.minhashCandidates(docs, "text", "doc_id", k = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all exact-dup pairs must collide in every band
    (10 until 13).foreach { i =>
      assert(cands.contains((i.toLong, i + 2000L)), s"missing exact pair $i")
    }
    // near-dups (1 token of 40 changed, jaccard ~0.92) should mostly surface
    val found = (0 until 10).count(i => cands.contains((i.toLong, i + 1000L)))
    assert(found >= 8, s"minhash recall too low: $found/10")
  }

  test("ngram jaccard verification filters unrelated candidate pairs") {
    val pairs = Dedup.nearDupJaccard(docs, "text", "doc_id", threshold = 0.5,
      k = 16, bands = 8)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall(_._3 >= 0.5))
    val exact = got.filter { case (a, b, _) => b - a == 2000 }
    assert(exact.forall(_._3 == 1.0))
    assert(got.exists { case (a, b, j) => b - a == 1000 && j > 0.5 && j < 1.0 })
  }

  test("simhash: identical docs have distance 0; near-dups within 3 bits mostly found") {
    val pairs = Dedup.simhashNearDup(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.filter { case (a, b, _) => b - a == 2000 }
    assert(exact.length == 3 && exact.forall(_._3 == 0))
  }

  test("incremental near-dup equals the batch-involving subset of the full self-join") {
    // batch = planted near/exact dups (ids >= 1000), corpus = originals
    val batch = docs.filter($"doc_id" >= 1000)
    val corpus = docs.filter($"doc_id" < 1000)
    val inc = Dedup.incrementalNearDup(corpus, batch, "text", "doc_id",
        threshold = 0.5, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.nearDupJaccard(docs, "text", "doc_id", threshold = 0.5,
        k = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = full.filter { case (a, b, _) => a >= 1000 || b >= 1000 }
    assert(inc == expected,
      s"diff: ${inc.diff(expected)} / ${expected.diff(inc)}")
    // and it finds the planted cross pairs: exact dups land at jaccard 1
    assert((10 until 13).forall(i => inc.exists {
      case (a, b, j) => a == i.toLong && b == i + 2000L && j == 1.0 }))
    // corpus-internal pairs never appear
    assert(inc.forall { case (a, b, _) => a >= 1000 || b >= 1000 })
  }

  test("collapseRepeats: removes exactly consecutive duplicates, idempotent") {
    val df = Seq((1L, "a a a b a c c"), (2L, "x y z"), (3L, "q q"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collapseRepeats(df)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("a b a c", 3L)) // non-adjacent repeat of 'a' survives
    assert(out(2L) == ("x y z", 0L))
    assert(out(3L) == ("q", 1L))
    // idempotent: a second pass removes nothing
    val again = TextAnalysis.collapseRepeats(
      TextAnalysis.collapseRepeats(df).withColumnRenamed("clean_text", "text"))
      .agg(sum($"n_removed")).head().getLong(0)
    assert(again == 0L)
  }

  test("cluster-index append: row-identical to a full rebuild, bridging merges included") {
    // corpus A, B sit in separate clusters (J(A,B) < threshold); batch
    // doc C is near-dup of BOTH — appending C must MERGE the two
    // existing clusters (relabeling B's old rows), plus the planted
    // llm-fixture batch exercises joins into existing clusters. The
    // invariant: verdicts after append == verdicts of a from-scratch
    // build over corpus ∪ batch, row for row.
    val aTok = (0 until 40).map(j => s"t$j")
    // B: 4 spread changes -> J(A,B) ~ 0.58 (< 0.7); C carries two of
    // B's changes -> J(C,A) ~ 0.81 and J(C,B) ~ 0.73 (both >= 0.7)
    val bTok = aTok.updated(0, "zz0").updated(6, "zz6")
      .updated(12, "zz12").updated(18, "zz18")
    val cTok = aTok.updated(0, "zz0").updated(6, "zz6")
    val extra = Seq(
      (9000L, aTok.mkString(" ")),
      (9001L, bTok.mkString(" ")))
    val corpus = docs.filter($"doc_id" < 1000)
      .select($"doc_id", $"text")
      .union(extra.toDF("doc_id", "text"))
    val batch = docs.filter($"doc_id" >= 1000).select($"doc_id", $"text")
      .union(Seq((9100L, cTok.mkString(" "))).toDF("doc_id", "text"))
    val thr = 0.7
    val idx = java.nio.file.Files.createTempDirectory("clidx-app").toString
    Dedup.buildClusterIndex(corpus, idx, threshold = thr)
    val before = spark.read.parquet(s"$idx/verdicts")
      .select("doc_id", "canon_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before(9000L) != before(9001L),
      "fixture defect: A and B must start in separate clusters")
    Dedup.appendToClusterIndex(spark, idx, batch)
    val got = spark.read.parquet(s"$idx/verdicts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    val rebuilt = java.nio.file.Files.createTempDirectory("clidx-full").toString
    Dedup.buildClusterIndex(corpus.union(batch), rebuilt, threshold = thr)
    val want = spark.read.parquet(s"$rebuilt/verdicts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    assert(got == want,
      s"append diverged from full rebuild:\n extra=${got.diff(want)}\n missing=${want.diff(got)}")
    val after = got.map(t => t._1 -> t._2).toMap
    assert(after(9000L) == after(9001L) && after(9100L) == after(9000L),
      "the bridging batch doc must merge A's and B's clusters")
    // appending an already-indexed id fails loud (identity violation)
    val ex = intercept[IllegalArgumentException] {
      Dedup.appendToClusterIndex(spark, idx,
        Seq((9000L, "anything at all")).toDF("doc_id", "text"))
    }
    assert(ex.getMessage.contains("already-indexed"), ex.getMessage)
    // a second append over a fresh batch still equals the 3-way rebuild
    val batch2 = Seq((9200L, aTok.updated(3, "q3").mkString(" "))).toDF("doc_id", "text")
    Dedup.appendToClusterIndex(spark, idx, batch2)
    val rebuilt2 = java.nio.file.Files.createTempDirectory("clidx-full2").toString
    Dedup.buildClusterIndex(corpus.union(batch).union(batch2), rebuilt2,
      threshold = thr)
    val got2 = spark.read.parquet(s"$idx/verdicts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    val want2 = spark.read.parquet(s"$rebuilt2/verdicts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    assert(got2 == want2, "second append diverged from the 3-way rebuild")
    Seq(idx, rebuilt, rebuilt2).foreach(d =>
      graft.TmpDirs.deleteRecursively(new java.io.File(d)))
  }

  test("prebuilt near-dup index: identical results to the in-memory incremental path") {
    val batch = docs.filter($"doc_id" >= 1000)
    val corpus = docs.filter($"doc_id" < 1000)
    val idx = graft.TmpDirs.scoped("graft-ndidx-spec")
    Dedup.buildNearDupIndex(corpus, idx, bands = 8)
    val fromIdx = Dedup.incrementalNearDupFromIndex(spark, idx, batch, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inMem = Dedup.incrementalNearDup(corpus, batch, "text", "doc_id",
        threshold = 0.5, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromIdx == inMem,
      s"diff: ${fromIdx.diff(inMem)} / ${inMem.diff(fromIdx)}")
    assert(fromIdx.nonEmpty)
  }

  test("portable simhash: pair set equals brute-force hamming join; bits 62-63 clear") {
    val sigs = docs.select($"doc_id",
      simhash64_poly(split($"text", " ")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the two vote positions above 61 are never set (shared constant)
    assert(sigs.forall { case (_, s) => (s >>> 62) == 0L })
    // identical token arrays -> identical signatures (exact dups planted
    // at id+2000)
    val byId = sigs.toMap
    (10 until 13).foreach(i => assert(byId(i.toLong) == byId(i + 2000L)))
    // chunk-pigeonhole join must return EXACTLY the hamming<=3 pairs
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val op = Dedup.simhashNearDup(docs, "text", "doc_id", maxHamming = 3, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(op == brute, s"pigeonhole pair set diverged: ${op.diff(brute)} / ${brute.diff(op)}")
  }

  test("portable fingerprints: dup-invariant, order-sensitive rolling, content matches mod_poly_hash") {
    val fp = TextAnalysis.fingerprintsPortable(docs)
      .select("doc_id", "content_fp", "rolling_fp", "simhash_fp")
    val byId = fp.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    (10 until 13).foreach(i => assert(byId(i.toLong) == byId(i + 2000L)))
    assert(byId(0L)._1 != byId(1L)._1)
    // content_fp is exactly the scalar mod-poly fold over the raw text
    val direct = docs.select($"doc_id", mod_poly_hash($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.forall { case (id, (c, _, _)) => c == direct(id) })
    // rolling_fp is order-sensitive: reversing the token sequence of a
    // multi-token doc changes the print (same token multiset)
    val rev = docs.withColumn("text",
      concat_ws(" ", reverse(split($"text", " "))))
    val revById = TextAnalysis.fingerprintsPortable(rev)
      .select("doc_id", "rolling_fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(revById(0L) != byId(0L)._2)
  }

  test("lsh top-k achieves reasonable recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, queries, k = 10, nPlanes = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.25, s"LSH recall $recall too low")
    // every LSH result must be a genuine corpus vector, not fabricated
    assert(lsh.forall { case (q, n) => q != n })
  }

  test("prebuilt ivf index: identical results to inline build; scan prunes to probed cells") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 100 === 0)
    val idx = graft.TmpDirs.scoped("graft-ivfidx-spec")
    Similarity.buildIvfIndex(emb, idx, kClusters = 16)
    val pre = Similarity.ivfTopKFromIndex(spark, idx, queries, k = 5, nProbe = 3)
    val inline = Similarity.ivfTopK(emb, queries, k = 5, kClusters = 16, nProbe = 3)
    val a = pre.collect().map(_.toString).sorted.toSeq
    val b = inline.collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // the index scan must carry a partition filter on cell — the prebuilt
    // path's reason to exist (reads nProbe directories, not the corpus)
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"no cell partition filter on the index scan:\n$plan")
  }

  test("streaming ivf knn equals the batch prebuilt-index lookup") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = graft.TmpDirs.scoped("graft-ivfs-spec")
    Similarity.buildIvfIndex(emb, idx, kClusters = 16)
    val streamed = graft.streaming.StreamOps.ivfKnnStream(spark, idx,
      graft.streaming.StreamOps.embeddingsStream(spark, sfDir)
        .filter($"vec_id" % 100 === 0), k = 5, nProbe = 3)
    val q = streamed.writeStream.format("memory").queryName("ivfs_spec")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ivfs_spec").collect().map(_.toString).sorted.toSeq
    val batch = Similarity.ivfTopKFromIndex(spark, idx,
      emb.filter($"vec_id" % 100 === 0), k = 5, nProbe = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == batch,
      "stream-served knn must equal the batch index lookup row-for-row")
  }

  test("ivf top-k: cell-pruned recall clears 0.6 vs brute force") {
    // the plain-IVF regression bound (lsh/pq/ivfpq have theirs below/
    // above); round-tracked at sf0.1 by tools/AnnRecallProbe — see
    // DESIGN.md §"ANN recall tracking"
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 10, kClusters = 16, nProbe = 6)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
    assert(ivf.forall { case (q, n) => q != n })
  }

  test("pq top-k: compressed-domain recall clears 0.5, deterministic, corpus stays encoded") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, queries, k = 10, m = 8, ksub = 16)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect pq).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ recall $recall too low")
    assert(pq.forall { case (q, n) => q != n })
    // deterministic under repartitioning (codebooks from the hash-ordered
    // sample, struct-min ties by code index)
    val pq2 = Similarity.pqTopK(emb.repartition(7), queries, k = 10, m = 8, ksub = 16)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq == pq2, "PQ results must not depend on partitioning")
  }

  test("ivf-pq: composed pruning+compression recall clears 0.4 at coarse knobs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfPqTopK(emb, queries, k = 10, kClusters = 16,
        nProbe = 6, m = 8, ksub = 16)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivfpq).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVF-PQ recall $recall too low")
    assert(ivfpq.forall { case (q, n) => q != n })
    // NOTE: with residual encoding the composed index's codebooks are
    // NOT plain PQ's (they train on residuals to the coarse centroids),
    // so the old "pruning can only remove candidates" upper bound vs
    // pqTopK no longer holds — residual codes quantize finer and can
    // legitimately beat raw-vector PQ at the same m/ksub.
  }

  test("shipped-knob rerank: pq and ivf-pq recall clears 0.8") {
    // llm41/llm42 ship m=16 codebooks with an exact rerank of the top
    // k*16 ADC candidates — the knobs the round-tracked recall table
    // records (1.000/1.000 at sf0.001, 0.913/0.825 at sf0.1 when
    // pinned); this floor regression-bounds the SHIPPED quality, the
    // coarser-knob tests above pin the un-reranked baselines
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, queries, k = 10, m = 16, ksub = 16,
        rerank = 16)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rPq = (brute intersect pq).size.toDouble / brute.size
    assert(rPq >= 0.8, s"shipped PQ recall $rPq below 0.8")
    val ivfpq = Similarity.ivfPqTopK(emb, queries, k = 10, kClusters = 32,
        nProbe = 20, m = 16, ksub = 64, rerank = 16)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rIvfpq = (brute intersect ivfpq).size.toDouble / brute.size
    assert(rIvfpq >= 0.8, s"shipped IVF-PQ recall $rIvfpq below 0.8")
  }

  test("multi-table LSH recall beats single-table and clears 0.5") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = Similarity.lshTopK(emb, queries, k = 10, nPlanes = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.lshTopKMulti(emb, queries, k = 10, nTables = 16, planesPerTable = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rSingle = (brute intersect single).size.toDouble / brute.size
    val rMulti = (brute intersect multi).size.toDouble / brute.size
    assert(rMulti >= rSingle, s"multi-table recall $rMulti < single $rSingle")
    assert(rMulti >= 0.8, s"multi-table recall $rMulti below the shipped floor")
  }

  test("brute-force top-k is exact: matches a collected reference computation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = emb.filter(_._1 == 0).head
    val expect = emb.filter(_._1 != 0)
      .map { case (id, v) => (id, cos(q._2, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    val embDf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Similarity.bruteForceTopK(embDf, embDf.filter($"vec_id" === 0), k = 5)
      .orderBy($"rank").collect().map(_.getLong(1)).toSeq
    assert(got == expect)
  }

  test("aggregator-heap top-k equals window top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 100 === 0)
    val win = Similarity.bruteForceTopK(emb, queries, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val agg = Similarity.bruteForceTopKAgg(emb, queries, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(agg == win)
  }

  test("text analysis: token stats, quality bounds, langid determinism") {
    val stats = TextAnalysis.tokenStats(docs)
    assert(stats.filter($"n_tokens" =!= 40).count() == 0)
    val q = TextAnalysis.qualityScore(docs)
    val quals = q.select("quality").collect().map(_.getDouble(0))
    assert(quals.forall(v => v >= 0.0 && v <= 1.0))
    val l1 = TextAnalysis.langId(docs).select("pred_lang").collect().map(_.getString(0)).toSeq
    val l2 = TextAnalysis.langId(docs).select("pred_lang").collect().map(_.getString(0)).toSeq
    assert(l1 == l2)
  }

  test("fingerprints: equal text -> equal fingerprints, different text -> different content hash") {
    val fp = TextAnalysis.fingerprints(docs).select("doc_id", "content_hash", "rolling_fp", "simhash_fp")
    val byId = fp.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    (10 until 13).foreach(i => assert(byId(i.toLong) == byId(i + 2000L)))
    assert(byId(0L)._1 != byId(1L)._1)
  }

  test("multimodal: real PNG decode — every decoded pixel equals the source formula") {
    // raw codec round trip, no Spark: encode then decode one image
    val id = 42L
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodePng(id)))
    val (w, h) = Multimodal.imageDims(id)
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xffffff) == Multimodal.pixelRgb(id, x, y))

    // distributed path: features over real decoded pixels
    val media = Multimodal.imageTable(docs)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == docs.count())
    val r0 = feats.filter($"media_id" === id)
      .select("features", "n_pixels", "channel_sum").head()
    val f0 = r0.getSeq[Float](0)
    assert(f0.length == 16)
    assert(math.abs(f0.sum - 1.0f) < 1e-3) // normalized histogram
    assert(r0.getInt(1) == w * h)
    val expectedSum = (for (y <- 0 until h; x <- 0 until w) yield {
      val rgb = Multimodal.pixelRgb(id, x, y)
      ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
    }).map(_.toLong).sum
    assert(r0.getLong(2) == expectedSum)

    // frame slicing still covers the byte-stream payloads exactly
    val stream = Multimodal.mediaTable(docs)
    val frames = Multimodal.sampleFrames(stream, nFrames = 4)
    val tot = frames.groupBy("media_id").agg(sum(length($"frame_bytes")).as("n"))
      .join(stream.select($"media_id", length($"payload").as("p")), "media_id")
      .filter($"n" =!= $"p").count()
    assert(tot == 0)
  }

  test("multimodal: real WAV decode — every decoded sample equals the source formula") {
    // raw codec round trip, no Spark
    val id = 17L
    val samples = Multimodal.decodeWavSamples(Multimodal.encodeWav(id), "spec")
    assert(samples.length == Multimodal.audioLen(id))
    samples.indices.foreach(k => assert(samples(k) == Multimodal.audioSample(id, k)))

    // distributed path: integer stats over real decoded samples
    val audio = Multimodal.audioTable(docs)
    val feats = Multimodal.audioFeatures(audio)
    assert(feats.count() == docs.count())
    val r0 = feats.filter($"media_id" === id)
      .select("n_samples", "sum_abs", "zero_crossings", "peak").head()
    val ref = (0 until Multimodal.audioLen(id)).map(Multimodal.audioSample(id, _))
    assert(r0.getInt(0) == ref.length)
    assert(r0.getLong(1) == ref.map(s => math.abs(s).toLong).sum)
    assert(r0.getInt(2) == ref.sliding(2).count(p => p(0) * p(1) < 0))
    assert(r0.getInt(3) == ref.map(math.abs).max)
  }

  test("multimodal: real MJPEG clip — RIFF walk + JPEG decode recover every frame") {
    // raw container round trip, no Spark
    val id = 23L
    val frames = Multimodal.decodeMjpegFrames(Multimodal.encodeMjpegAvi(id), "spec")
    assert(frames.length == Multimodal.videoFrameCount(id))
    val (w, h) = Multimodal.videoDims(id)
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.getWidth == w && img.getHeight == h)
      val (r, g, b) = Multimodal.videoFrameRgb(id, f)
      // JPEG is lossy: solid-color frames round-trip within a small
      // quantization bound, which is the decodable-pixels invariant
      val p = img.getRGB(w / 2, h / 2)
      assert(math.abs(((p >> 16) & 0xff) - r) <= 4)
      assert(math.abs(((p >> 8) & 0xff) - g) <= 4)
      assert(math.abs((p & 0xff) - b) <= 4)
    }
    // malformed container fails loud
    val e = intercept[IllegalStateException] {
      Multimodal.decodeMjpegFrames("not a riff".getBytes, "spec")
    }
    assert(e.getMessage.contains("RIFF"))

    // distributed path: every doc's clip yields its declared frame count
    val vf = Multimodal.videoFrames(Multimodal.videoTable(docs))
    val counts = vf.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size == docs.count())
    counts.foreach { case (mid, n) =>
      assert(n == Multimodal.videoFrameCount(mid))
    }
  }

  test("multimodal: content dedup matches byte-DIFFERENT re-encodes of the same pixels") {
    import org.apache.spark.sql.types._
    // same pixels, two genuinely different PNG encodings: the default
    // sequential layout vs Adam7 INTERLACED — byte-different files, one
    // picture (exactly the re-encoded-copy case byte-hash dedup misses)
    val id = 11L
    val a = Multimodal.encodePng(id)
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(src, null, null), param)
    writer.dispose(); ios.close()
    val b = bos.toByteArray
    assert(!java.util.Arrays.equals(a, b), "the two encodes must byte-differ")

    val schema = StructType(Seq(StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(100L, a), org.apache.spark.sql.Row(200L, b),
        org.apache.spark.sql.Row(300L, Multimodal.encodePng(12L))),
      schema)
    val ded = Multimodal.imageContentDedup(media)
    val out = ded
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("canon_id"), r.getAs[Boolean]("is_dup"))).toMap
    assert(out(100L) == (100L, false))
    assert(out(200L) == (100L, true), "byte-different same-pixels copy must dedupe")
    assert(out(300L) == (300L, false))
    // SINGLE-DECODE plan pin: the decode is the dominant cost at lake
    // scale, and the old groupBy+join form planned the MapPartitions
    // decode subtree TWICE (no exchange reuse — the aggregate side
    // partial-aggregates before its exchange). The window-min form must
    // decode exactly once. collect() above finalized AQE.
    // AQE's toString prints Final AND Initial plans — count the final
    // section only, or a single decode double-counts
    val plan = ded.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val decodes = "MapPartitions".r.findAllIn(plan).length
    assert(decodes == 1,
      s"imageContentDedup must plan exactly ONE decode pass, found $decodes:\n$plan")
  }

  test("multimodal: admission gate drops exactly the undecodable payloads, fail-soft") {
    val media = Multimodal.corruptedImageTable(docs, corruptEvery = 37L)
    val admitted = Multimodal.imageAdmissionGate(media)
      .collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == all.filter(_ % 37 != 0),
      "exactly the truncated payloads must drop; no collateral damage")
    // dims on survivors are the REAL decoded dims
    val r = Multimodal.imageAdmissionGate(media)
      .filter($"media_id" === 11L).head()
    val (w, h) = Multimodal.imageDims(11L)
    assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == w * h)
  }

  test("multimodal resize: nearest-neighbor resample survives the re-encode round trip") {
    val media = graft.ops.Multimodal.imageTable(docs)
    val resized = graft.ops.Multimodal.resize(media, dw = 8, dh = 8)
    val rows = resized.select($"media_id", $"payload", $"meta.width", $"meta.height").collect()
    assert(rows.length == docs.count())
    assert(rows.forall(r => r.getInt(2) == 8 && r.getInt(3) == 8))
    // decode a resized payload: pixel (x,y) must equal the SOURCE pixel
    // at the nearest-neighbor coordinates — through encode, resample,
    // re-encode, and a second decode
    val some = rows.find(_.getLong(0) == 7L).get
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(some.getAs[Array[Byte]](1)))
    val (sw, sh) = graft.ops.Multimodal.imageDims(7L)
    for (y <- 0 until 8; x <- 0 until 8)
      assert((img.getRGB(x, y) & 0xffffff) ==
        graft.ops.Multimodal.pixelRgb(7L, x * sw / 8, y * sh / 8))
  }

  test("mod_poly_hash: matches hand fold, stable under codegen, in [0, 2^31)") {
    import graft.functions.VectorFunctions.mod_poly_hash
    // "ab" -> (0*131 + 97) % p = 97; (97*131 + 98) % p = 12805
    val one = spark.range(1).select(mod_poly_hash(lit("ab")).as("h")).head().getLong(0)
    assert(one == 12805L)
    assert(spark.range(1).select(mod_poly_hash(lit("")).as("h")).head().getLong(0) == 0L)
    val hs = docs.select(mod_poly_hash($"text").as("h")).collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0L && h < 2147483647L))
  }

  test("int8 quantization: codes in [-127,127], reconstruction within one step") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Similarity.quantizeInt8(emb).select($"embedding", $"scale", $"codes").collect()
    q.foreach { r =>
      val v = r.getSeq[Float](0); val scale = r.getDouble(1); val codes = r.getSeq[Long](2)
      assert(codes.forall(c => c >= -127L && c <= 127L))
      if (scale > 0) {
        val step = scale / 127.0
        v.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c * step) <= step + 1e-9) }
      }
    }
  }

  test("sequence packing invariant under bucket size and input partitioning") {
    import graft.ops.Packing
    def run(d: org.apache.spark.sql.DataFrame, bs: Long) =
      Packing.packSequences(d, "doc_id", size(split($"text", " ")), 512L, bs)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val base = run(docs, 64L)
    assert(base == run(docs.repartition(13), 64L))
    assert(base == run(docs, 7L))   // bucket size must not change the result
    // offsets stay inside capacity; seq_ids start at 0 and are contiguous
    assert(base.forall { case (_, _, off) => off >= 0 && off < 512 })
    val ids = base.map(_._2)
    assert(ids.min == 0 && ids.max == ids.size - 1 || ids.max < ids.size)
  }

  test("sequence packing seq_id is exact past 2^53 total tokens (integer DIV)") {
    import graft.ops.Packing
    // 2^53+1 is not double-representable: the old `/`-then-cast path
    // rounds it to 2^53 and misassigns the second doc's sequence
    val big = (1L << 53) + 1L
    val d = Seq((1L, big), (2L, 5L)).toDF("doc_id", "n")
    val got = Packing.packSequences(d, "doc_id", $"n", capacity = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 0L)
    assert(got(2L) == big) // doc 2 starts exactly at __start = 2^53+1
  }

  test("prefix-filtered exact jaccard join equals brute-force all-pairs (no false negatives)") {
    val t = 0.8
    val got = Dedup.jaccardSelfJoinExact(docs, "text", "doc_id", t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force over every pair
    val sh = docs.select($"doc_id",
        array_sort(array_distinct(TextAnalysis.shingles($"text", 3))).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val want = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      j = (sa intersect sb).size.toDouble / (sa union sb).size.toDouble
      if j >= t
    } yield (ia, ib, j)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    assert(want.nonEmpty) // planted dups guarantee real edges
  }

  test("connected components: min-label propagation handles chains and isolates") {
    // chain 1-2-3-4 (diameter 3 forces several propagation rounds),
    // separate pair 10-11, isolated node 99 appears via canonicalize only
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val labels = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(labels(10L) == 10L && labels(11L) == 10L)
    // empty edge set converges immediately
    assert(Dedup.connectedComponents(Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
  }

  test("canonicalize maps every doc to its cluster minimum; transitive chains merge") {
    // A~B and B~C by construction, A~C below threshold -> still one cluster
    val words = (0 until 30).map(i => s"t$i")
    val a = words.mkString(" ")
    val b = (words.take(25) ++ (0 until 5).map(i => s"x$i")).mkString(" ")
    val c = (words.take(20) ++ (0 until 10).map(i => s"x${i % 5}") ++ (0 until 5).map(i => s"y$i")).mkString(" ")
    val chain = Seq((1L, a), (2L, b), (3L, c), (50L, "completely different content here"))
      .toDF("doc_id", "text")
    val canon = Dedup.canonicalize(chain, "text", "doc_id", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // verify the construction actually yields a chain, not a clique
    val edges = Dedup.jaccardSelfJoinExact(chain, "text", "doc_id", 0.5)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.contains((1L, 2L)) && edges.contains((2L, 3L)) && !edges.contains((1L, 3L)),
      s"fixture should form a chain, got $edges")
    assert(canon(1L) == 1L && canon(2L) == 1L && canon(3L) == 1L)
    assert(canon(50L) == 50L)
  }

  test("tfidf top terms: doc-exclusive terms outrank corpus-wide terms; ranks deterministic") {
    val d = Seq(
      (1L, "shared shared rare1 rare1 rare1"),
      (2L, "shared unique2 filler fillerx"),
      (3L, "shared filler filler otherterm")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(d, "text", "doc_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getString(1)).toMap
    // doc 1: rare1 (tf=3, df=1) far outranks shared (tf=2, df=3)
    assert(out((1L, 1)) == "rare1")
    // doc 2: unique2/filler/fillerx all tf=1; filler has df=2, the
    // df=1 terms win with tie broken alphabetically
    assert(out((2L, 1)) == "fillerx" && out((2L, 2)) == "unique2")
  }

  test("deterministic mix: content-gated, rate-monotone, duplicate-consistent") {
    val d = docs.withColumn("lang", when($"doc_id" % 2 === 0, "en").otherwise("de"))
    def kept(rates: Map[String, Int]) =
      TextAnalysis.deterministicMix(d, "text", "lang", rates)
        .select($"doc_id").as[Long].collect().toSet
    val half = kept(Map("en" -> 500))
    assert(kept(Map("en" -> 0)).forall(_ % 2 == 1))   // en fully dropped
    assert(kept(Map("en" -> 1000)).size == docs.count()) // keep-all
    assert(half.subsetOf(kept(Map("en" -> 1000))))
    // rate monotonicity: raising the rate only adds docs
    assert(half.subsetOf(kept(Map("en" -> 800))))
    // exact duplicates land on the same side of the gate (same content hash)
    val dupIds = Seq(10L, 11L, 12L)
    dupIds.foreach { i =>
      assert(half.contains(i) == half.contains(i + 2000L), s"dup pair $i split")
    }
    // invariant under partitioning
    assert(kept(Map("en" -> 500)) ==
      TextAnalysis.deterministicMix(d.repartition(17), "text", "lang", Map("en" -> 500))
        .select($"doc_id").as[Long].collect().toSet)
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    import graft.functions.VectorFunctions.sorted_intersect_count
    val d = docs.select(
      array_sort(array_distinct(split($"text", " "))).as("a"),
      array_sort(array_distinct(reverse(split($"text", " ")))).as("b"))
    val mismatches = d.withColumn("m", sorted_intersect_count($"a", $"b"))
      .withColumn("h", size(array_intersect($"a", $"b")))
      .filter($"m" =!= $"h").count()
    assert(mismatches == 0)
    val cross = docs.limit(40).select($"doc_id".as("i"),
        array_sort(array_distinct(split($"text", " "))).as("a"))
      .crossJoin(docs.limit(40).select($"doc_id".as("j"),
        array_sort(array_distinct(split($"text", " "))).as("b")))
    val crossMismatch = cross
      .withColumn("m", sorted_intersect_count($"a", $"b"))
      .withColumn("h", size(array_intersect($"a", $"b")))
      .filter($"m" =!= $"h").count()
    assert(crossMismatch == 0)
  }

  test("srp bucket is deterministic and within range") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val b1 = Similarity.srpBucket(emb, "embedding", 4).select("vec_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b2 = Similarity.srpBucket(emb, "embedding", 4).select("vec_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < 16))
  }

  test("IVF append refuses tombstoned and already-live ids loud; compact-then-re-append works") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivf-guard").toString
    Similarity.buildIvfIndex(emb.filter($"vec_id" % 10 =!= 9), idx, kClusters = 8)
    // already-live: re-appending a built slice would serve duplicates
    val ex1 = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(spark, idx, emb.filter($"vec_id" % 10 === 1))
    }
    assert(ex1.getMessage.contains("already indexed"), ex1.getMessage)
    // tombstoned: the old row is still physically present — a re-append
    // would be invisible now and permanently dropped at compaction
    val dels = emb.filter($"vec_id" % 20 === 1).select($"vec_id")
    Similarity.deleteFromIvfIndex(spark, idx, dels)
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(spark, idx, emb.filter($"vec_id" % 20 === 1))
    }
    assert(ex2.getMessage.contains("tombstoned"), ex2.getMessage)
    // the documented recovery: compact (physical removal), then the
    // re-append lands and SERVES
    Similarity.compactIvfIndex(spark, idx)
    Similarity.appendToIvfIndex(spark, idx, emb.filter($"vec_id" % 20 === 1))
    val ids = spark.read.parquet(s"$idx/corpus").select($"vec_id")
      .collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "duplicate ids after re-append")
    assert(ids.toSet == emb.filter($"vec_id" % 10 =!= 9)
      .select($"vec_id").collect().map(_.getLong(0)).toSet)
    val served = Similarity.ivfTopKFromIndex(spark, idx,
      emb.filter($"vec_id" % 20 === 1).limit(3), k = 5, nProbe = 8)
    assert(served.count() > 0)
    graft.TmpDirs.deleteRecursively(new java.io.File(idx))
  }

  test("IVF idempotent append: committed replays no-op, partial liveness refuses, fresh batches land") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivf-idem").toString
    Similarity.buildIvfIndex(emb.filter($"vec_id" % 10 =!= 9), idx, kClusters = 8)
    val batch = emb.filter($"vec_id" % 10 === 9)
    Similarity.appendToIvfIndexIdempotent(spark, idx, batch)
    val files = spark.read.parquet(s"$idx/corpus").inputFiles.toSet
    // the at-least-once replay: same batch again must be a no-op, not
    // the loud already-indexed refusal the raw append raises
    Similarity.appendToIvfIndexIdempotent(spark, idx, batch)
    assert(spark.read.parquet(s"$idx/corpus").inputFiles.toSet == files,
      "committed replay changed corpus files")
    // a batch with SOME live ids is a crashed-append retry, not a
    // replay — still refuses loud inside the append
    val mixedBatch = emb.filter($"vec_id" % 20 === 9) // live subset
      .union(emb.filter($"vec_id" % 10 === 9).limit(1)
        .withColumn("vec_id", $"vec_id" + 1000000L))
    val ex = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndexIdempotent(spark, idx, mixedBatch)
    }
    assert(ex.getMessage.contains("already indexed"), ex.getMessage)
    // the FAILED append must not leave its digest marker behind (r16
    // ADVICE: marker commits AFTER the append) — a stale intent marker
    // would make a later batch reusing this exact id set silently
    // no-op instead of refusing; only the one committed append's
    // marker may exist here
    assert(Option(new java.io.File(s"$idx/appends.idem").list())
      .map(_.count(!_.startsWith("."))).getOrElse(0) == 1,
      "failed append left a stale digest marker")
    // a genuinely fresh batch lands and serves
    val freshBatch = emb.filter($"vec_id" % 10 === 9).limit(2)
      .withColumn("vec_id", $"vec_id" + 2000000L)
    Similarity.appendToIvfIndexIdempotent(spark, idx, freshBatch)
    assert(spark.read.parquet(s"$idx/corpus")
      .filter($"vec_id" >= 2000000L).count() == 2)
    // stored-but-TOMBSTONED ids are NOT "live": a re-delivery after a
    // delete must surface the raw append's loud compact-then-reappend
    // refusal, never a silent no-op that swallows the new vectors
    Similarity.deleteFromIvfIndex(spark, idx,
      freshBatch.select($"vec_id"))
    val tomb = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndexIdempotent(spark, idx, freshBatch)
    }
    assert(tomb.getMessage.contains("tombstoned"), tomb.getMessage)
    // an all-live batch with NO digest marker is NOT a replay of this
    // op (the ids landed through the raw append — or reuse live ids
    // with different embeddings): must refuse loud, never silently
    // swallow the batch's vectors
    val rawBatch = emb.filter($"vec_id" % 10 === 9).limit(2)
      .withColumn("vec_id", $"vec_id" + 3000000L)
    Similarity.appendToIvfIndex(spark, idx, rawBatch)
    val noMarker = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndexIdempotent(spark, idx, rawBatch)
    }
    assert(noMarker.getMessage.contains("no commit marker"),
      noMarker.getMessage)
    graft.TmpDirs.deleteRecursively(new java.io.File(idx))
  }

  test("IVF append: appended vectors are first-class index citizens") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivf-append").toString
    Similarity.buildIvfIndex(emb.filter($"vec_id" % 10 =!= 9), idx, kClusters = 8)
    Similarity.appendToIvfIndex(spark, idx, emb.filter($"vec_id" % 10 === 9))
    // the index now holds the FULL corpus
    val n = spark.read.parquet(s"$idx/corpus").count()
    assert(n == emb.count(), s"index holds $n of ${emb.count()}")
    // appended vectors must be SERVED, not just stored: they appear as
    // neighbors (self-matches are excluded by design, so check the
    // neighbor population), and every returned sim is the exact cosine
    // of the pair (appended rows indistinguishable from built rows)
    val queries = emb.filter($"vec_id" % 50 === 0)
    val got = Similarity.ivfTopKFromIndex(spark, idx, queries, k = 10, nProbe = 4)
    val nAppended = got.filter($"neighbor_id" % 10 === 9).count()
    assert(nAppended > 0, "no appended vector ever surfaced as a neighbor")
    val mismatch = got
      .join(emb.select($"vec_id".as("neighbor_id"), $"embedding".as("n_emb")),
        "neighbor_id")
      .join(emb.select($"vec_id".as("query_id"), $"embedding".as("q_emb")),
        "query_id")
      .filter($"sim" =!= cosine_sim($"q_emb", $"n_emb"))
      .count()
    assert(mismatch == 0, s"$mismatch served sims diverge from exact cosine")
    graft.TmpDirs.deleteRecursively(new java.io.File(idx))
  }

  test("IVF delete: tombstoned vectors never surface, k fills from live rows") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivf-del").toString
    Similarity.buildIvfIndex(emb, idx, kClusters = 8)
    Similarity.deleteFromIvfIndex(spark, idx,
      emb.filter($"vec_id" % 5 === 2).select($"vec_id"))
    val queries = emb.filter($"vec_id" % 50 === 0 && $"vec_id" % 5 =!= 2)
    val got = Similarity.ivfTopKFromIndex(spark, idx, queries, k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got.forall(_._2 % 5 != 2), "a tombstoned vector surfaced as a neighbor")
    // k fills from live rows: the anti-join happens BEFORE scoring, so
    // deletions never leave holes in the top-k
    val counts = got.groupBy(_._1).view.mapValues(_.length)
    assert(counts.values.forall(_ == 5), counts.toMap.toString)
    // idempotent: deleting the same ids again changes nothing
    Similarity.deleteFromIvfIndex(spark, idx,
      emb.filter($"vec_id" % 5 === 2).select($"vec_id"))
    val again = Similarity.ivfTopKFromIndex(spark, idx, queries, k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.sorted.toSeq == got.sorted.toSeq)
    graft.TmpDirs.deleteRecursively(new java.io.File(idx))
  }

  test("IVF compact: serving unchanged, tombstones materialized and dropped") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivf-cmp").toString
    Similarity.buildIvfIndex(emb, idx, kClusters = 8)
    Similarity.deleteFromIvfIndex(spark, idx,
      emb.filter($"vec_id" % 5 === 2).select($"vec_id"))
    val queries = emb.filter($"vec_id" % 50 === 0 && $"vec_id" % 5 =!= 2)
    val before = Similarity.ivfTopKFromIndex(spark, idx, queries, k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    Similarity.compactIvfIndex(spark, idx)
    // the list is gone and the corpus physically holds only live rows
    assert(!new java.io.File(s"$idx/tombstones").exists(), "tombstones survive compaction")
    assert(!new java.io.File(s"$idx/corpus.compacting").exists(), "tmp dir left behind")
    assert(!new java.io.File(s"$idx/corpus.old").exists(), "old corpus left behind")
    val stored = spark.read.parquet(s"$idx/corpus")
    assert(stored.filter($"vec_id" % 5 === 2).count() == 0,
      "a tombstoned row survived the rewrite")
    assert(stored.count() == emb.filter($"vec_id" % 5 =!= 2).count())
    // serving is IDENTICAL: compaction only materializes the anti-join
    val after = Similarity.ivfTopKFromIndex(spark, idx, queries, k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(after == before, "compaction changed serving results")
    // compact with no tombstones is a no-op (and so a second compact)
    Similarity.compactIvfIndex(spark, idx)
    val again = Similarity.ivfTopKFromIndex(spark, idx, queries, k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(again == before)
    // tombstoning EVERY remaining row and compacting would write an
    // empty, part-file-less corpus that every later read rejects —
    // refuse loud and keep the servable tombstoned state
    Similarity.deleteFromIvfIndex(spark, idx, stored.select($"vec_id"))
    val ex = intercept[IllegalStateException] { Similarity.compactIvfIndex(spark, idx) }
    assert(ex.getMessage.contains("every corpus row is tombstoned"), ex.getMessage)
    assert(new java.io.File(s"$idx/tombstones").exists(), "refusal must keep the tombstones")
    assert(Similarity.ivfTopKFromIndex(spark, idx, queries, k = 5, nProbe = 8)
      .count() == 0, "the tombstoned index must still serve (empty) reads")
    graft.TmpDirs.deleteRecursively(new java.io.File(idx))
  }

  test("IVF drift monitor: cell stats reconcile; drifted append trips the advisory") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivf-drift").toString
    Similarity.buildIvfIndex(emb.filter($"vec_id" % 10 =!= 9), idx, kClusters = 16)
    // pre-drift: one row per centroid cell (EMPTY cells included), the
    // live counts reconcile with the stored corpus, nothing tombstoned,
    // and a freshly built index does not cry wolf
    val s0 = Similarity.ivfCellStats(spark, idx).collect()
    assert(s0.length == 16, s"expected one row per cell, got ${s0.length}")
    assert(s0.map(_.getAs[Long]("n_live")).sum ==
      emb.filter($"vec_id" % 10 =!= 9).count())
    assert(s0.forall(_.getAs[Long]("n_tombstoned") == 0L))
    val r0 = Similarity.ivfDriftReport(spark, idx).collect().head
    assert(!r0.getAs[Boolean]("advise_rebuild"),
      s"fresh index advised away (organic skew ${r0.getAs[Double]("skew_ratio")})")
    assert(!r0.getAs[Boolean]("advise_compact"))
    // drift: the held-out 10% appended collapsed onto one direction —
    // every appended vector lands in ONE frozen cell
    Similarity.appendToIvfIndex(spark, idx,
      emb.filter($"vec_id" % 10 === 9)
        .withColumn("embedding", array_repeat(lit(1.0f), 64)))
    val s1 = Similarity.ivfCellStats(spark, idx).collect()
    assert(s1.map(_.getAs[Long]("n_live")).sum == emb.count())
    val r1 = Similarity.ivfDriftReport(spark, idx, maxOverMedian = 2.0)
      .collect().head
    assert(r1.getAs[Long]("max_cell") >= emb.filter($"vec_id" % 10 === 9).count(),
      "the fullest cell must hold at least the whole collapsed batch")
    assert(r1.getAs[Boolean]("advise_rebuild"),
      s"drifted skew ${r1.getAs[Double]("skew_ratio")} under threshold")
    assert(!r1.getAs[Boolean]("advise_compact"))
    // absolute floor: the same skewed layout with the floor raised past
    // the fullest cell must NOT advise rebuild — at tiny scale the
    // occupied median sits near 1 and the ratio degrades to an absolute
    // count, so the advisory is gated on a minimum cell mass too
    assert(!Similarity.ivfDriftReport(spark, idx, maxOverMedian = 2.0,
        minRebuildCell = 100000L).collect().head.getAs[Boolean]("advise_rebuild"),
      "sub-floor max_cell must not advise rebuild regardless of skew ratio")
    // tombstone a third of the corpus: the compact advisory fires and
    // the live/dead split reconciles exactly
    Similarity.deleteFromIvfIndex(spark, idx,
      emb.filter($"vec_id" % 3 === 0).select($"vec_id"))
    val r2 = Similarity.ivfDriftReport(spark, idx).collect().head
    assert(r2.getAs[Long]("total_tombstoned") ==
      emb.filter($"vec_id" % 3 === 0).count())
    assert(r2.getAs[Long]("total_live") + r2.getAs[Long]("total_tombstoned") ==
      emb.count())
    assert(r2.getAs[Boolean]("advise_compact"))
    graft.TmpDirs.deleteRecursively(new java.io.File(idx))
    // sparse index: 30 identical vectors collapse into ONE of 16 cells
    // (15 empty). Empty cells must NOT trip the rebuild advisory — the
    // median is over occupied cells (here = max, skew 1.0); a median
    // over all cells would be 0 and turn the ratio into an absolute
    // count (30 > 4), crying rebuild on a perfectly healthy layout
    val sparse = java.nio.file.Files.createTempDirectory("ivf-sparse").toString
    Similarity.buildIvfIndex(
      emb.limit(30).withColumn("embedding", array_repeat(lit(1.0f), 64)),
      sparse, kClusters = 16)
    val rs = Similarity.ivfDriftReport(spark, sparse).collect().head
    assert(rs.getAs[Long]("n_empty_cells") == 15L)
    assert(rs.getAs[Double]("skew_ratio") == 1.0,
      s"one occupied cell must read as balanced, got ${rs}")
    assert(!rs.getAs[Boolean]("advise_rebuild"))
    graft.TmpDirs.deleteRecursively(new java.io.File(sparse))
  }

  test("IVF rebuild: drift advisory flips false, tombstones materialize, list drops") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("ivf-rebuild").toString
    // the llm71 drift recipe + a tombstoned slice
    Similarity.buildIvfIndex(emb.filter($"vec_id" % 10 =!= 9), idx, kClusters = 16)
    Similarity.appendToIvfIndex(spark, idx,
      emb.filter($"vec_id" % 10 === 9)
        .withColumn("embedding", array_repeat(lit(1.0f), 64)))
    Similarity.deleteFromIvfIndex(spark, idx,
      emb.filter($"vec_id" % 11 === 5).select($"vec_id"))
    assert(Similarity.ivfDriftReport(spark, idx, maxOverMedian = 2.0)
      .collect().head.getAs[Boolean]("advise_rebuild"), "fixture must drift")
    Similarity.rebuildIvfIndex(spark, idx)
    val r = Similarity.ivfDriftReport(spark, idx).collect().head
    assert(!r.getAs[Boolean]("advise_rebuild"),
      s"rebuilt index still advises rebuild (skew ${r.getAs[Double]("skew_ratio")})")
    assert(!r.getAs[Boolean]("advise_compact"))
    assert(r.getAs[Long]("total_tombstoned") == 0L)
    assert(r.getAs[Long]("total_live") ==
      emb.filter($"vec_id" % 11 =!= 5).count(),
      "rebuild must materialize the tombstoned deletes")
    assert(!new java.io.File(s"$idx/tombstones").exists(),
      "rebuild must drop the tombstone list")
    assert(!new java.io.File(s"$idx/corpus.old").exists() &&
      !new java.io.File(s"$idx/centroids.old").exists(), "swap leftovers remain")
    // the rebuilt index serves: deleted ids never surface, k fills
    val queries = emb.filter($"vec_id" % 50 === 0)
    val ann = Similarity.ivfTopKFromIndex(spark, idx, queries, k = 5, nProbe = 6)
    assert(ann.count() > 0)
    assert(ann.filter($"neighbor_id" % 11 === 5).count() == 0,
      "deleted vectors surfaced after rebuild")
    // all-live-tombstoned rebuild refuses instead of bricking the index
    val dead = java.nio.file.Files.createTempDirectory("ivf-rebuild-dead").toString
    Similarity.buildIvfIndex(emb.limit(20), dead, kClusters = 4)
    Similarity.deleteFromIvfIndex(spark, dead, emb.limit(20).select($"vec_id"))
    val ex = intercept[IllegalStateException] {
      Similarity.rebuildIvfIndex(spark, dead)
    }
    assert(ex.getMessage.contains("live corpus is empty"), ex.getMessage)
    assert(new java.io.File(s"$dead/corpus").exists() &&
      new java.io.File(s"$dead/tombstones").exists(),
      "refusal must keep the servable tombstoned state")
    graft.TmpDirs.deleteRecursively(new java.io.File(idx))
    graft.TmpDirs.deleteRecursively(new java.io.File(dead))
  }

  test("filtered top-k: every neighbor satisfies the predicate; never post-filtered") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val filtered = Similarity.filteredTopK(emb, queries, k = 5,
      corpusPred = $"label" % 3 === 1)
    val rows = filtered.join(emb.select($"vec_id".as("neighbor_id"), $"label"),
        "neighbor_id")
      .select("query_id", "neighbor_id", "label", "rank")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(2) % 3 == 1), "a neighbor escaped the predicate")
    // filter-before-score: k fills from the FULL filtered corpus — the
    // result equals brute force over the pre-filtered corpus (a post-
    // filtered global top-k would under-fill; this pins the semantics)
    val expect = Similarity.bruteForceTopK(
      emb.filter($"label" % 3 === 1), queries, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == expect)
    // per-query count fills to min(k, filtered corpus size)
    val counts = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(counts.values.forall(_ == 5), counts.toMap.toString)
  }
}
