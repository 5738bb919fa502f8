package graft

import org.apache.spark.sql.functions._

/** Multi-table shared-scan materialization (CdcFanout): N tables from
  * ONE decode pass over the log.
  *
  *   - frame parity: each materialized per-table frame is row- and
  *     schema-identical to the per-table `binlogcdc` scan (so a catalog
  *     user can swap scans for frames verbatim);
  *   - the one-decode contract: materializing THREE tables walks each
  *     log file exactly once (the per-file decode counter — the whole
  *     point of the op; N per-table scans would count 3× the files);
  *   - unknown tables refuse loud at planning.
  */
class CdcFanoutSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("fan-out frames equal the per-table scans; three tables decode the log ONCE") {
    val index = graft.cdc.CdcFixture.ensure(spark, sfDir)
    val nFiles = graft.cdc.CdcCodec.readIndex(index).length
    assert(nFiles > 1, "fixture should rotate files for a meaningful pin")
    val root = java.nio.file.Files.createTempDirectory("cdcfanout-spec").toString
    val before = graft.sources.CdcFanout.filesDecoded.get()
    val out = graft.sources.CdcFanout.materializeTables(spark, index,
      Seq(("graft", "orders"), ("graft", "audit"), ("graft", "notes")), root)
    val decoded = graft.sources.CdcFanout.filesDecoded.get() - before
    assert(decoded == nFiles,
      s"expected ONE decode pass over $nFiles files for 3 tables, counted $decoded")
    Seq("orders", "audit", "notes").foreach { tbl =>
      val scan = spark.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", "graft").option("table", tbl).load()
      val mat = spark.read.parquet(out(("graft", tbl)))
      assert(mat.columns.toSeq == scan.columns.toSeq,
        s"$tbl: column order diverges: ${mat.columns.toSeq} vs ${scan.columns.toSeq}")
      assert(mat.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        scan.schema.fields.map(f => (f.name, f.dataType)).toSeq, s"$tbl: types diverge")
      val a = scan.collect().map(_.toString).sorted.toSeq
      val b = mat.collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty, s"$tbl: empty scan — fixture broken")
      assert(a == b, s"$tbl rows diverge (scan=${a.length}, fanout=${b.length})")
    }
    graft.TmpDirs.deleteRecursively(new java.io.File(root))
  }

  test("per-table extraction is partition-pruned to the table's own directory") {
    val index = graft.cdc.CdcFixture.ensure(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("cdcfanout-prune").toString
    graft.sources.CdcFanout.materializeTables(spark, index,
      Seq(("graft", "orders"), ("graft", "audit")), root)
    // the extraction pattern: a __tbl filter over the staged frame must
    // select only that table's partition directory
    val pruned = spark.read.parquet(s"$root/shared.decoded")
      .filter(col("__tbl") === "graft.audit")
    val scans = org.apache.spark.sql.graftbridge.Bridge.fileScanSelections(pruned)
    val stagedScan = scans.find(_._1.contains("shared.decoded"))
    assert(stagedScan.isDefined, s"no staged-frame scan found in $scans")
    assert(stagedScan.get._2 == 1,
      s"expected 1 selected __tbl partition, got ${stagedScan.get._2}")
    graft.TmpDirs.deleteRecursively(new java.io.File(root))
  }

  test("per-table extraction column-prunes the OTHER tables' structs") {
    val index = graft.cdc.CdcFixture.ensure(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("cdcfanout-colprune").toString
    graft.sources.CdcFanout.materializeTables(spark, index,
      Seq(("graft", "orders"), ("graft", "audit")), root)
    // audit is slot 1: its extraction must never read orders' __t0 column
    val auditExtract = spark.read.parquet(s"$root/shared.decoded")
      .filter(col("__tbl") === "graft.audit")
      .select(col("__t1").getField("audit_id").as("audit_id"))
    val plan = auditExtract.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema in:\n$plan"))
    assert(readSchema.contains("__t1") && !readSchema.contains("__t0"),
      s"extraction reads the other table's struct: $readSchema")
    graft.TmpDirs.deleteRecursively(new java.io.File(root))
  }

  test("mysql wire format: fan-out frames equal the per-table scans") {
    val index = graft.cdc.CdcFixture.ensureMysql(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("cdcfanout-mysql").toString
    val out = graft.sources.CdcFanout.materializeTables(spark, index,
      Seq(("graft", "orders"), ("graft", "audit")), root, format = "mysql")
    Seq("orders", "audit").foreach { tbl =>
      val scan = spark.read.format("binlogcdc")
        .option("indexFile", index).option("binlogFormat", "mysql")
        .option("database", "graft").option("table", tbl).load()
      val a = scan.collect().map(_.toString).sorted.toSeq
      val b = spark.read.parquet(out(("graft", tbl)))
        .collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty && a == b, s"$tbl diverges on the mysql format")
    }
    graft.TmpDirs.deleteRecursively(new java.io.File(root))
  }

  test("incremental appendTables: new files only, no-op when nothing grew, equals the per-table scans") {
    val index = graft.cdc.CdcFixture.ensure(spark, sfDir)
    val files = graft.cdc.CdcCodec.readIndex(index)
    assert(files.length >= 3, s"fixture too small: ${files.length} files")
    val root = java.nio.file.Files.createTempDirectory("cdcfanout-incr").toString
    val tables = Seq(("graft", "orders"), ("graft", "audit"))
    // increment 1: an index listing only the first two files
    val idx1 = s"$root/binlog1.index"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(idx1),
      files.take(2).mkString("", "\n", "\n"))
    val out = graft.sources.CdcFanout.appendTables(spark, idx1, tables, root)
    // increment 2: the full index — only the NEW files are walked
    val before = graft.sources.CdcFanout.filesDecoded.get()
    graft.sources.CdcFanout.appendTables(spark, index, tables, root)
    val walked = graft.sources.CdcFanout.filesDecoded.get() - before
    assert(walked == files.length - 2,
      s"expected ${files.length - 2} new files walked, counted $walked")
    // increment 3: nothing grew — zero walks, frames untouched
    val b2 = graft.sources.CdcFanout.filesDecoded.get()
    graft.sources.CdcFanout.appendTables(spark, index, tables, root)
    assert(graft.sources.CdcFanout.filesDecoded.get() == b2,
      "a no-growth increment must not walk any file")
    Seq("orders", "audit").foreach { tbl =>
      val scan = spark.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", "graft").option("table", tbl).load()
      val a = scan.collect().map(_.toString).sorted.toSeq
      val b = spark.read.parquet(out(("graft", tbl)))
        .collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty && a == b,
        s"$tbl incremental frames diverge (scan=${a.length}, incr=${b.length})")
    }
    // a different table set refuses loud
    val e = intercept[IllegalArgumentException] {
      graft.sources.CdcFanout.appendTables(spark, index,
        Seq(("graft", "orders"), ("graft", "notes")), root)
    }
    assert(e.getMessage.contains("table set changed"), e.getMessage)
    graft.TmpDirs.deleteRecursively(new java.io.File(root))
  }

  test("incremental appendTables: a GROWING tail file resumes from its consumed prefix") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("cdcfanout-grow").toString
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    val schB = StructType(Seq(StructField("bk", LongType)))
    val full = s"$dir/log.0"
    val w = new graft.cdc.CdcCodec.LogWriter(full)
    w.tableMap(1000L, 1L, "db", "t", sch)
    w.tableMap(1000L, 2L, "db", "b", schB)
    (0 until 8).foreach { g =>
      w.gtid(1000L + g, g.toLong)
      w.writeRows(1000L + g, 1L, sch, Seq(Array[Any](g.toLong, s"v$g")))
      if (g % 2 == 0)
        w.writeRows(1000L + g, 2L, schB, Seq(Array[Any](100L + g)))
    }
    w.close()
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(full))
    // cut at the event boundary halfway through the event stream
    val r = new graft.cdc.CdcCodec.EventReader(full)
    val ends = try r.map(_.endPos).toList finally r.close()
    val cut = ends(ends.length / 2).toInt
    val live = s"$dir/live.0"
    val index = s"$dir/binlog.index"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(index), s"$live\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(live),
      java.util.Arrays.copyOfRange(bytes, 0, cut))
    val root = java.nio.file.Files.createTempDirectory("cdcfanout-grow-out").toString
    val tables = Seq(("db", "t"), ("db", "b"))
    val out = graft.sources.CdcFanout.appendTables(spark, index, tables, root)
    val n1 = spark.read.parquet(out(("db", "t"))).count()
    assert(n1 > 0 && n1 < 8, s"prefix increment should hold a strict subset, got $n1")
    // the file GROWS to its full content; the increment resumes mid-file
    java.nio.file.Files.write(java.nio.file.Paths.get(live), bytes)
    graft.sources.CdcFanout.appendTables(spark, index, tables, root)
    val t = spark.read.parquet(out(("db", "t")))
      .select("k", "v", "__op", "__gtid").collect()
      .map(_.toString).sorted.toSeq
    assert(t == (0 until 8).map(g => s"[$g,v$g,1,$g]").sorted,
      s"grown-tail resume diverges: $t")
    val b = spark.read.parquet(out(("db", "b"))).select("bk").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(b == Seq(100L, 102L, 104L, 106L))
    Seq(dir, root).foreach(d =>
      graft.TmpDirs.deleteRecursively(new java.io.File(d)))
  }

  test("tailTables daemon: folds mid-run growth, idles out, restart applies nothing") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("cdcfanout-tail").toString
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    val schB = StructType(Seq(StructField("bk", LongType)))
    val full = s"$dir/log.0"
    val w = new graft.cdc.CdcCodec.LogWriter(full)
    w.tableMap(1000L, 1L, "db", "t", sch)
    w.tableMap(1000L, 2L, "db", "b", schB)
    (0 until 8).foreach { g =>
      w.gtid(1000L + g, g.toLong)
      w.writeRows(1000L + g, 1L, sch, Seq(Array[Any](g.toLong, s"v$g")))
      if (g % 2 == 0)
        w.writeRows(1000L + g, 2L, schB, Seq(Array[Any](100L + g)))
    }
    w.close()
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(full))
    val r = new graft.cdc.CdcCodec.EventReader(full)
    val ends = try r.map(_.endPos).toList finally r.close()
    val cut = ends(ends.length / 2).toInt
    val live = s"$dir/live.0"
    val index = s"$dir/binlog.index"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(index), s"$live\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(live),
      java.util.Arrays.copyOfRange(bytes, 0, cut))
    val root = java.nio.file.Files.createTempDirectory("cdcfanout-tail-out").toString
    val tables = Seq(("db", "t"), ("db", "b"))
    @volatile var applied = -1
    val daemon = new Thread(() => {
      applied = graft.sources.CdcFanout.tailTables(spark, index, tables,
        root, pollIntervalMs = 100, maxIdlePolls = 25)
    })
    daemon.start()
    // grow the log only AFTER the first increment commits, so the
    // daemon deterministically applies exactly two increments
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!new java.io.File(s"$root/_offsets").exists() &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(new java.io.File(s"$root/_offsets").exists(),
      "daemon never committed the first increment")
    // grow ATOMICALLY (temp + rename): a truncating in-place write
    // races the daemon's concurrent poll into observing a file shorter
    // than its committed offset
    val grown = java.nio.file.Paths.get(s"$dir/live.0.grown")
    java.nio.file.Files.write(grown, bytes)
    java.nio.file.Files.move(grown, java.nio.file.Paths.get(live),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    daemon.join(120000)
    assert(!daemon.isAlive, "daemon did not idle out")
    assert(applied == 2, s"expected 2 applied increments, got $applied")
    val t = spark.read.parquet(s"$root/db__t")
      .select("k", "v", "__op", "__gtid").collect()
      .map(_.toString).sorted.toSeq
    assert(t == (0 until 8).map(g => s"[$g,v$g,1,$g]").sorted,
      s"daemon-tailed frame diverges: $t")
    // a restarted daemon over the unchanged log applies nothing
    assert(graft.sources.CdcFanout.tailTables(spark, index, tables, root,
      pollIntervalMs = 10, maxIdlePolls = 2) == 0)
    Seq(dir, root).foreach(d =>
      graft.TmpDirs.deleteRecursively(new java.io.File(d)))
  }

  test("incremental appendTables: crash at every failpoint, then retry converges without duplicates") {
    val index = graft.cdc.CdcFixture.ensure(spark, sfDir)
    val files = graft.cdc.CdcCodec.readIndex(index)
    val tables = Seq(("graft", "orders"), ("graft", "audit"))
    val expected = Seq("orders", "audit").map { tbl =>
      tbl -> spark.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", "graft").option("table", tbl).load()
        .collect().map(_.toString).sorted.toSeq
    }.toMap
    Seq("fanout-after-staging", "fanout-mid-moves-0",
        "fanout-after-moves").foreach { pt =>
      val root = java.nio.file.Files
        .createTempDirectory(s"cdcfanout-crash").toString
      val idx1 = s"$root/binlog1.index"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(idx1),
        files.take(2).mkString("", "\n", "\n"))
      val out = graft.sources.CdcFanout.appendTables(spark, idx1, tables, root)
      graft.sources.CdcFanout.fanoutCrashPoint = Some(pt)
      try {
        val e = intercept[IllegalStateException] {
          graft.sources.CdcFanout.appendTables(spark, index, tables, root)
        }
        assert(e.getMessage.contains(pt))
      } finally graft.sources.CdcFanout.fanoutCrashPoint = None
      // retry redoes the increment idempotently
      graft.sources.CdcFanout.appendTables(spark, index, tables, root)
      Seq("orders", "audit").foreach { tbl =>
        val got = spark.read.parquet(out(("graft", tbl)))
          .collect().map(_.toString).sorted.toSeq
        assert(got == expected(tbl),
          s"$pt: $tbl diverged after crash+retry " +
            s"(got=${got.length}, want=${expected(tbl).length})")
      }
      graft.TmpDirs.deleteRecursively(new java.io.File(root))
    }
  }

  test("unknown table refuses loud at planning") {
    val index = graft.cdc.CdcFixture.ensure(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("cdcfanout-bad").toString
    val e = intercept[IllegalArgumentException] {
      graft.sources.CdcFanout.materializeTables(spark, index,
        Seq(("graft", "no_such_table")), root)
    }
    assert(e.getMessage.contains("no TABLE_MAP"), e.getMessage)
    graft.TmpDirs.deleteRecursively(new java.io.File(root))
  }
}
