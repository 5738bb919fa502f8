package graft

import java.nio.file.{Files, Paths}

import graft.cdc.CdcCodec
import graft.ops.Similarity
import graft.sources.CdcCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Hardening specs: schema-drift fail-loud (SURVEY §7.3.3), the `_cdc`
  * naming convention implemented with its intent (defect #3 fixed),
  * read-only enforcement, IVF recall.
  */
class CdcHardeningSpec extends SparkTestBase {

  private val schemaV1 = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))
  private val schemaV2 = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType),
    StructField("extra", StringType)))

  private def writeDriftLog(): String = {
    val dir = Files.createTempDirectory("cdc-drift").toString
    val w = new CdcCodec.LogWriter(s"$dir/b.0")
    w.tableMap(0L, 1L, "db", "t", schemaV1)
    w.gtid(0L, 1L)
    w.writeRows(0L, 1L, schemaV1, Seq(Array[Any](1L, 1.0)))
    // mid-stream schema change for the SAME table
    w.tableMap(0L, 1L, "db", "t", schemaV2)
    w.gtid(0L, 2L)
    w.writeRows(0L, 1L, schemaV2, Seq(Array[Any](2L, 2.0, null)))
    w.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\n")
    s"$dir/binlog.index"
  }

  test("additive schema evolution: ADD COLUMN spans one query, old rows pad null") {
    val index = writeDriftLog() // v1 rows, then v2 = v1 + nullable extra
    val df = spark.read.format("binlogcdc")
      .option("indexFile", index).option("database", "db").option("table", "t")
      .load()
    // inference returns the NEWEST schema (post-ALTER)
    assert(df.schema.fieldNames.take(3).toSeq == Seq("id", "v", "extra"))
    val rows = df.orderBy("__gtid").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(2)) // pre-ALTER: padded
    assert(rows(1).getLong(0) == 2L)
  }

  test("incompatible schema drift (type change) fails loud with offset context") {
    val dir = Files.createTempDirectory("cdc-drift-bad").toString
    val w = new CdcCodec.LogWriter(s"$dir/b.0")
    w.tableMap(0L, 1L, "db", "t", schemaV1)
    w.gtid(0L, 1L)
    w.writeRows(0L, 1L, schemaV1, Seq(Array[Any](1L, 1.0)))
    // same column names, v's type changes DOUBLE -> STRING: not additive
    val mutated = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    w.tableMap(0L, 1L, "db", "t", mutated)
    w.gtid(0L, 2L)
    w.writeRows(0L, 1L, mutated, Seq(Array[Any](2L, "oops")))
    w.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\n")
    val e = intercept[Exception] {
      spark.read.format("binlogcdc")
        .option("indexFile", s"$dir/binlog.index")
        .option("database", "db").option("table", "t")
        .load().collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("schema drift"), s"got: $msg")
    assert(msg.contains("offset"), s"got: $msg")

    // ...and the SAME log becomes fully readable with schemaDrift=epochs:
    // epoch granularity is the TABLE_MAP event (mid-file here), the
    // re-typed column reads null for the old epoch's rows, the shared
    // column flows through both
    val df = spark.read.format("binlogcdc")
      .option("indexFile", s"$dir/binlog.index")
      .option("database", "db").option("table", "t")
      .option("schemaDrift", "epochs")
      .load().orderBy("__gtid").collect()
    assert(df.length == 2)
    assert(df(0).getLong(0) == 1L && df(0).isNullAt(1)) // v: DOUBLE->STRING => null
    assert(df(1).getLong(0) == 2L && df(1).getString(1) == "oops")
  }

  test("_cdc naming convention: literal suffix required (ref defect #3 fixed)") {
    val sfDir = "/root/testdata/sf0.001"
    val index = graft.cdc.CdcFixture.ensure(spark, sfDir)
    // names that pass the reference's buggy find_last_of check but are
    // NOT valid _cdc names must be rejected here
    Seq("ordersd", "ordersc", "orders_", "orders").foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        CdcCatalog.registerCdcView(spark, bad, index, "graft")
      }
      assert(e.getMessage.contains("target_cdc"))
    }
    val df = CdcCatalog.registerCdcView(spark, "orders_cdc", index, "graft")
    assert(df.columns.contains("__op"))
    // the registered view serves SQL — the reference's end-to-end surface
    val n = spark.sql("SELECT COUNT(*) FROM orders_cdc WHERE __op = 1").head().getLong(0)
    assert(n == spark.read.parquet(s"$sfDir/orders.parquet").count())
  }

  test("CDC source is read-only: writes fail with analysis error") {
    val sfDir = "/root/testdata/sf0.001"
    val index = graft.cdc.CdcFixture.ensure(spark, sfDir)
    val e = intercept[Exception] {
      spark.range(1).selectExpr("id AS o_orderkey")
        .write.format("binlogcdc")
        .option("indexFile", index).option("database", "graft").option("table", "orders")
        .mode("append").save()
    }
    val m = e.getMessage.toLowerCase
    assert(m.contains("does not support") || m.contains("does not allow") ||
      e.isInstanceOf[org.apache.spark.sql.AnalysisException])
  }

  test("IVF top-k recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 10, kClusters = 8, nProbe = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVF recall $recall too low")
  }

  test("IVF centroids are deterministic across invocations") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c1 = Similarity.kmeansCentroids(emb, "embedding", 4, iters = 2)
    val c2 = Similarity.kmeansCentroids(emb, "embedding", 4, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("gcdc: target rows before any GTID event fail loud (spliced log)") {
    // a log opened mid-transaction (splice/truncation) must not stamp
    // the fabricated initial gtid 0
    val dir = Files.createTempDirectory("gcdc-splice").toString
    val w = new CdcCodec.LogWriter(s"$dir/b.0")
    w.tableMap(0L, 1L, "db", "t", schemaV1)
    w.writeRows(0L, 1L, schemaV1, Seq(Array[Any](1L, 1.0))) // NO gtid yet
    w.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\n")
    val ex = intercept[Exception] {
      spark.read.format("binlogcdc")
        .option("indexFile", s"$dir/binlog.index")
        .option("database", "db").option("table", "t")
        .load().collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).mkString(" | ").contains("before any GTID event"))
  }

  test("MINIMAL row images compose with compressed transactions (zstd payload)") {
    // binlog_row_image=MINIMAL and binlog_transaction_compression=ON are
    // independent server settings a production log can combine: the
    // partial-bitmap update rides INSIDE a TRANSACTION_PAYLOAD event
    import graft.cdc.{MysqlBinlog, MysqlBinlogAdapter}
    import org.apache.spark.unsafe.types.UTF8String
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val dir = Files.createTempDirectory("minimg-zstd").toString
    val f = s"$dir/mysql-bin.000001"
    val w = new MysqlBinlog.Writer(f, checksum = true, compressTxns = true)
    w.tableMap(0L, 1L, "db", "t", schema)
    w.gtid(0L, 7L, "11111111-2222-3333-4444-555555555555")
    w.updateRowsMinimal(0L, 1L, schema, Seq(
      (Array[Any](5L, UTF8String.fromString("old")),
        Array[Any](5L, UTF8String.fromString("new")))))
    w.close()
    def decode(needed: Int => Boolean) = {
      val r = MysqlBinlogAdapter.open(f)
      val dec = MysqlBinlogAdapter.decoder("db", "t", needed, None)
      try {
        val out = Seq.newBuilder[CdcCodec.CdcRow]
        while (r.hasNext) out ++= dec.decode(r.next())
        out.result()
      } finally r.close()
    }
    val rows = decode(i => i == 0)
    assert(rows.map(r => (r.op, r.gtid, r.values(0))) == Seq(
      (graft.cdc.CdcSchema.Op.UpdateBefore, 7L, 5L),
      (graft.cdc.CdcSchema.Op.UpdateAfter, 7L, 5L)))
    val ex = intercept[java.io.IOException] { decode(_ => true) }
    assert(ex.getMessage.contains("binlog_row_image"), ex.getMessage)
  }

  test("minimal row-image fixture: thinned column fails loud, PK projection decodes") {
    val index = graft.cdc.CdcFixture.ensureMysqlMinimalImage(
      spark, "/root/testdata/sf0.001")
    def scan = spark.read.format("binlogcdc")
      .option("indexFile", index)
      .option("database", graft.cdc.CdcFixture.Db)
      .option("table", graft.cdc.CdcFixture.MinImageTable)
      .option("binlogFormat", "mysql")
      .load()
    // `note` is absent from MINIMAL update/delete images: selecting it
    // must fail loud (absent != NULL), not surface fake NULLs
    val ex = intercept[Exception] { scan.select("note", "__op").collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(ex).mkString(" | ")
    assert(all.contains("binlog_row_image") && all.contains("note"), all)
    // the PK+envelope projection reads every op of the storyline
    val ops = scan.select("__op").groupBy("__op").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ops.keySet == Set(0, 1, 2, 3), ops.toString)
    assert(ops(2) == ops(3), "update before/after counts must pair")
  }
}
