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
