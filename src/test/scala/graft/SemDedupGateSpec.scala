package graft

import graft.ops.Dedup
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Round-15 hardening of the persisted semantic-dedup index and its
  * streaming admission gate:
  *
  *   - the gate's micro-batches PRUNE the members scan to the batch's
  *     touched cells (the llm82 pruning contract, streaming twin) —
  *     never the corpus;
  *   - gate verdicts equal the brute-force definition (index-authority
  *     semantics: dup iff a same-cell member clears the threshold);
  *   - quantizer collects are capped loud by spark.graft.semdedup
  *     .maxSeeds (gate and probe-assign batch path both);
  *   - an index whose seeds were persisted as array<double> refuses
  *     loud (not an opaque ClassCastException);
  *   - build→probe crash windows: every buildSemDedupIndex crash
  *     leaves a visibly un-built index (probes and gate refuse on the
  *     missing members/_SUCCESS) and a retried build converges to the
  *     two-frame incremental's verdicts.
  */
class SemDedupGateSpec extends SparkTestBase {
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private def corpus = emb.filter($"vec_id" % 10 =!= 0)
  private def seeds = emb.filter($"vec_id" % 25 === 0)

  private def buildIdx(root: String): Unit =
    Dedup.buildSemDedupIndex(corpus, root, "embedding", "vec_id",
      seeds = seeds, seedId = "vec_id", seedEmb = "embedding")

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < math.min(a.length, b.length)) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("streaming gate: a micro-batch touching c cells reads only c member cell dirs; verdicts match brute force") {
    val idx = java.nio.file.Files.createTempDirectory("semgate-prune").toString
    buildIdx(idx)
    val arriving = StreamOps.embeddingsStream(spark, sfDir)
      .filter($"vec_id" % 100 === 0)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    @volatile var scans: Seq[(String, Int, Long)] = Nil
    val q = StreamOps.semDedupGateStream(spark, idx, arriving,
      "embedding", "vec_id", threshold = 0.40,
      sink = (out, _) => {
        scans = org.apache.spark.sql.graftbridge.Bridge.fileScanSelections(out)
        out.collect().foreach(buf.add)
      })
    try q.processAllAvailable() finally q.stop()
    val verdicts = buf.asScala.map(r =>
      (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(verdicts.nonEmpty, "gate produced no verdicts")
    // file pruning: every members scan in the micro-batch plan selected
    // exactly the touched cell partitions, strictly fewer than the index has
    val cCells = verdicts.map(_._2).size
    val totalCells = spark.read.parquet(s"$idx/members")
      .select("cell").distinct().count()
    val memberScans = scans.filter(_._1.contains("members"))
    assert(memberScans.nonEmpty, s"no members scan found in $scans")
    memberScans.foreach { case (p, parts, _) =>
      assert(parts == cCells,
        s"members scan $p selected $parts partitions, batch touches $cCells cells")
    }
    assert(cCells < totalCells,
      s"test not meaningful: batch touches all $totalCells cells")
    // brute-force reference: argmax-cosine cell (ties -> lower seed id),
    // dup iff ANY same-cell corpus member clears the threshold
    val sd = seeds.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    def cellOf(v: Seq[Float]): Long =
      sd.map { case (sid, se) => (cos(v, se), sid) }
        .maxBy { case (c, sid) => (c, -sid) }._2
    val members = corpus.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .map { case (i, v) => (cellOf(v), v, i) }
    val batch = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val expected = batch.map { case (i, v) =>
      val c = cellOf(v)
      val dup = members.exists { case (mc, mv, _) =>
        mc == c && cos(v, mv) >= 0.40 }
      (i, c, dup)
    }.toSet
    assert(verdicts == expected)
    graft.TmpDirs.deleteRecursively(new java.io.File(idx))
  }

  test("gate verdicts are micro-batch-slicing INVARIANT (4 one-file triggers == one batch)") {
    val idx = java.nio.file.Files.createTempDirectory("semgate-slice").toString
    buildIdx(idx)
    val arrDir = java.nio.file.Files.createTempDirectory("semgate-arriving").toString
    emb.filter($"vec_id" % 10 === 0).repartition(4)
      .write.mode("overwrite").parquet(arrDir)
    val arriving = spark.readStream
      .schema(emb.schema).option("maxFilesPerTrigger", "1").parquet(arrDir)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val batches = new java.util.concurrent.atomic.AtomicInteger
    val q = StreamOps.semDedupGateStream(spark, idx, arriving,
      "embedding", "vec_id", threshold = 0.40,
      sink = (out, _) => { batches.incrementAndGet(); out.collect().foreach(buf.add) })
    try q.processAllAvailable() finally q.stop()
    assert(batches.get() >= 4, s"expected >= 4 micro-batches, got ${batches.get()}")
    val streamed = buf.asScala.map(_.toString).toSeq.sorted
    val oneShot = StreamOps.semDedupGateBatch(spark, idx,
      emb.filter($"vec_id" % 10 === 0), "embedding", "vec_id", 0.40)
      .collect().map(_.toString).toSeq.sorted
    assert(streamed == oneShot,
      s"slicing changed verdicts (streamed=${streamed.length}, batch=${oneShot.length})")
    Seq(idx, arrDir).foreach(d =>
      graft.TmpDirs.deleteRecursively(new java.io.File(d)))
  }

  test("gate and probe-assign quantizer collects are capped by spark.graft.semdedup.maxSeeds") {
    val idx = java.nio.file.Files.createTempDirectory("semgate-cap").toString
    buildIdx(idx)
    withSQLConf("spark.graft.semdedup.maxSeeds" -> "3") {
      val e = intercept[IllegalArgumentException] {
        StreamOps.semDedupGateBatch(spark, idx,
          emb.filter($"vec_id" % 100 === 0), "embedding", "vec_id", 0.40)
      }
      assert(e.getMessage.contains("spark.graft.semdedup.maxSeeds"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        Dedup.semDedup(emb, "embedding", "vec_id", seeds,
          "vec_id", "embedding", threshold = 0.4, probeAssign = true)
      }
      assert(e2.getMessage.contains("spark.graft.semdedup.maxSeeds"), e2.getMessage)
    }
    // and the knob is a knob: the default admits the fixture quantizer
    val ok = StreamOps.semDedupGateBatch(spark, idx,
      emb.filter($"vec_id" % 100 === 0), "embedding", "vec_id", 0.40)
    assert(ok.count() > 0)
    graft.TmpDirs.deleteRecursively(new java.io.File(idx))
  }

  test("an index with array<double> seeds refuses loud (schema guard, not a CCE)") {
    val idx = java.nio.file.Files.createTempDirectory("semgate-dbl").toString
    Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("seed_id", "s_emb").write.parquet(s"$idx/seeds")
    Seq((2L, 0L, Seq(1.0f, 0.0f))).toDF("vec_id", "cell", "__emb")
      .write.partitionBy("cell").parquet(s"$idx/members")
    val batch = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      StreamOps.semDedupGateBatch(spark, idx, batch, "embedding", "vec_id", 0.4)
    }
    assert(e.getMessage.contains("array<float>"), e.getMessage)
    graft.TmpDirs.deleteRecursively(new java.io.File(idx))
  }

  test("build crash windows: probes and gate refuse loud; retried build converges") {
    val idx = java.nio.file.Files.createTempDirectory("semgate-crash").toString
    buildIdx(idx) // a LIVE index that the crashed rebuild must not corrupt
    val batch = emb.filter($"vec_id" % 10 === 0)
    val newSeeds = emb.filter($"vec_id" % 20 === 0) // rebuild changes the quantizer
    def rebuild(): Unit = Dedup.buildSemDedupIndex(corpus, idx,
      "embedding", "vec_id", newSeeds, "vec_id", "embedding")
    Seq("semdedup-after-members-delete", "semdedup-after-seeds").foreach { pt =>
      Dedup.appendCrashPoint = Some(pt)
      try {
        val e = intercept[IllegalStateException](rebuild())
        assert(e.getMessage.contains(pt))
      } finally Dedup.appendCrashPoint = None
      // the half-rebuilt index is visibly un-built: everything refuses
      val p = intercept[IllegalArgumentException] {
        Dedup.semDedupFromIndex(spark, idx, batch, "embedding", "vec_id", 0.4)
      }
      assert(p.getMessage.contains("members/_SUCCESS"), p.getMessage)
      intercept[IllegalArgumentException] {
        StreamOps.semDedupGateBatch(spark, idx, batch, "embedding", "vec_id", 0.4)
      }
      // retry converges to the two-frame incremental's verdicts
      rebuild()
      val fromIdx = Dedup.semDedupFromIndex(spark, idx, batch,
        "embedding", "vec_id", 0.4).collect().map(_.toString).sorted.toSeq
      val twoFrame = Dedup.semDedupIncremental(corpus, batch,
        "embedding", "vec_id", newSeeds, "vec_id", "embedding", 0.4)
        .collect().map(_.toString).sorted.toSeq
      assert(fromIdx == twoFrame)
    }
    // a partial members write (simulated: _SUCCESS removed) refuses too
    assert(new java.io.File(s"$idx/members/_SUCCESS").delete())
    intercept[IllegalArgumentException] {
      Dedup.semDedupFromIndex(spark, idx, batch, "embedding", "vec_id", 0.4)
    }
    graft.TmpDirs.deleteRecursively(new java.io.File(idx))
  }
}
