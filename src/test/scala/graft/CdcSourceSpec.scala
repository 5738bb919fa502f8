package graft

import java.nio.file.{Files, Paths}

import graft.cdc.{CdcCodec, CdcFixture, CdcSchema}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** End-to-end specs for the binlogcdc DataSourceV2 source: batch scan,
  * pushdown equivalence, streaming incremental pickup + checkpoint
  * restart without duplicates (SURVEY.md §5.2.4, §7.3.1).
  */
class CdcSourceSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  /** Tiny 2-file log: inserts 1..4 (two per file), update of 2, delete of 3. */
  private def writeLog(): String = {
    val dir = Files.createTempDirectory("cdc-source-spec").toString
    def r(id: Long, v: Double): Array[Any] = Array[Any](id, v)
    val w0 = new CdcCodec.LogWriter(s"$dir/b.0")
    w0.tableMap(0L, 1L, "db", "t", schema)
    w0.gtid(1000L, 1L); w0.writeRows(1000L, 1L, schema, Seq(r(1, 1.0), r(2, 2.0)))
    w0.close()
    val w1 = new CdcCodec.LogWriter(s"$dir/b.1")
    w1.tableMap(0L, 1L, "db", "t", schema)
    w1.gtid(2000L, 2L); w1.writeRows(2000L, 1L, schema, Seq(r(3, 3.0), r(4, 4.0)))
    w1.gtid(3000L, 3L); w1.updateRows(3000L, 1L, schema, Seq((r(2, 2.0), r(2, 22.0))))
    w1.gtid(4000L, 4L); w1.deleteRows(4000L, 1L, schema, Seq(r(3, 3.0)))
    w1.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\nb.1\n")
    s"$dir/binlog.index"
  }

  private def read(index: String) =
    spark.read.format("binlogcdc")
      .option("indexFile", index).option("database", "db").option("table", "t")
      .load()

  test("batch scan: schema, envelope, op codes, multi-file order") {
    val df = read(writeLog())
    assert(df.schema.fieldNames.toSeq ==
      Seq("id", "v", "__op", "__gtid", "__tm", "__source_id"))
    // a log whose GTID events carry no source id synthesizes the
    // anonymous identity on every row
    assert(df.select("__source_id").distinct().collect()
      .map(_.getString(0)).toSeq == Seq(CdcSchema.AnonymousSourceId))
    val rows = df.orderBy("__gtid", "__op", "id").collect()
    assert(rows.length == 7) // 4 ins + 2 upd images + 1 del
    assert(rows.map(_.getInt(2)).toSeq == Seq(1, 1, 1, 1, 2, 3, 0))
    val upd = rows.filter(_.getInt(2) == CdcSchema.Op.UpdateAfter)
    assert(upd.head.getDouble(1) == 22.0)
  }

  test("COUNT(*) pushdown is served from sidecar metadata, declines honestly") {
    val index = writeLog()
    val counted = read(index).agg(count(lit(1)).as("n"))
    assert(counted.head().getLong(0) == 7)
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), s"count not pushed:\n$plan")
    // a pushed filter changes the answer -> sidecar declines, decode path counts
    val filtered = read(index).filter(col("__op") === 1).agg(count(lit(1)).as("n"))
    assert(filtered.head().getLong(0) == 4)
    assert(!filtered.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    // MIN/MAX over envelope columns (gtid high-water mark) push too,
    // and must agree with the decode path
    val hwm = read(index).agg(
      min(col("__gtid")).as("lo"), max(col("__gtid")).as("hi"),
      max(col("__tm")).as("last_tm"), count(lit(1)).as("n"))
    val row = hwm.head()
    assert(hwm.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(row.getLong(0) == 1L && row.getLong(1) == 4L && row.getLong(3) == 7L)
    assert(row.getAs[java.time.LocalDateTime](2) ==
      java.time.LocalDateTime.ofEpochSecond(4L, 0, java.time.ZoneOffset.UTC))
    // MIN/MAX of a data column cannot come from the sidecar -> decline
    val dataMin = read(index).agg(min(col("id")).as("m"))
    assert(!dataMin.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(dataMin.head().getLong(0) == 1L)
    // missing/v1 sidecars -> decline gracefully, same answer via decode
    CdcCodec.readIndex(index).foreach(f => new java.io.File(f + ".meta").delete())
    val noMeta = read(index).agg(count(lit(1)).as("n"))
    assert(noMeta.head().getLong(0) == 7)
    assert(!noMeta.queryExecution.executedPlan.toString.contains("PushedAggregates"))
  }

  test("per-table sidecar pruning: other-table files and out-of-range files skip") {
    val dir = Files.createTempDirectory("cdc-tableprune").toString
    def r(id: Long, v: Double): Array[Any] = Array[Any](id, v)
    // file 0: only table "t" rows at gtid 1
    val w0 = new CdcCodec.LogWriter(s"$dir/b.0")
    w0.tableMap(0L, 1L, "db", "t", schema)
    w0.gtid(1000L, 1L); w0.writeRows(1000L, 1L, schema, Seq(r(1, 1.0)))
    w0.close()
    // file 1: only table "other" rows — zero "t" rows, but wide gtid range
    val w1 = new CdcCodec.LogWriter(s"$dir/b.1")
    w1.tableMap(0L, 2L, "db", "other", schema)
    w1.gtid(2000L, 1000L); w1.writeRows(2000L, 2L, schema, Seq(r(9, 9.0)))
    w1.close()
    // file 2: both tables — "t" only at gtid 2, "other" up to gtid 2000
    val w2 = new CdcCodec.LogWriter(s"$dir/b.2")
    w2.tableMap(0L, 1L, "db", "t", schema)
    w2.tableMap(0L, 2L, "db", "other", schema)
    w2.gtid(3000L, 2L); w2.writeRows(3000L, 1L, schema, Seq(r(2, 2.0)))
    w2.gtid(4000L, 2000L); w2.writeRows(4000L, 2L, schema, Seq(r(8, 8.0)))
    w2.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\nb.1\nb.2\n")
    val index = s"$dir/binlog.index"
    def parts(df: org.apache.spark.sql.DataFrame): Int =
      df.rdd.getNumPartitions
    // unfiltered scan of "t": file 1 (zero t-rows) prunes outright
    assert(parts(read(index)) == 2)
    assert(read(index).count() == 2)
    // gtid > 100 on "t": file-global bounds keep file 2 (other-table
    // gtids reach 2000) — per-table bounds prune it (t stops at 2)
    val filtered = read(index).filter(col("__gtid") > 100)
    assert(parts(filtered) == 0)
    assert(filtered.count() == 0)
  }

  test("limit pushdown reaches the scan and results stay correct") {
    val index = writeLog()
    val limited = read(index).limit(3)
    limited.collect()
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 3"), s"limit not pushed:\n$plan")
    assert(limited.count() == 3)
    // limit + filter composes: pushed filter applies BEFORE the limit
    val filtered = read(index).filter(col("__op") === 1).limit(2)
    val rows = filtered.collect()
    assert(rows.length == 2 && rows.forall(_.getInt(2) == 1))
  }

  test("offset pushdown prunes prefix files, boundary file carries the residual skip") {
    val index = writeLog()
    val all = read(index).collect()
    // offset 3 = all of b.0 (2 rows) + 1 row of b.1: b.0 never opens
    val off = read(index).offset(3)
    val rows = off.collect()
    val plan = off.queryExecution.executedPlan.toString
    assert(plan.contains("PushedOffset: 3"), s"offset not pushed:\n$plan")
    assert(off.rdd.getNumPartitions == 1, "prefix file must be pruned from the scan")
    assert(rows.map(_.getLong(0)).toSeq == all.drop(3).map(_.getLong(0)).toSeq,
      "pushed offset must skip exactly the first 3 rows in log order")
    // offset past the whole log: every file prunes
    assert(read(index).offset(100).collect().isEmpty)
    // OFFSET above a completely-pushed aggregate must not vanish: the
    // one agg row offset by 1 is zero rows (regression for pushOffset
    // accepting after pushAggregation — CdcAggScan ignores offsets)
    assert(read(index).agg(max(col("__gtid"))).offset(1).collect().isEmpty)
    // with a pushed filter the offset is declined (post-filter skip is
    // not precomputable from row counts) and Spark applies it above
    val filteredOff = read(index).filter(col("__op") === 1).offset(2)
    val fPlan = filteredOff.queryExecution.executedPlan.toString
    assert(!fPlan.contains("PushedOffset"), s"offset must not push under a filter:\n$fPlan")
    val expected = all.filter(_.getInt(2) == 1).drop(2).map(_.getLong(0)).toSeq
    assert(filteredOff.collect().map(_.getLong(0)).toSeq == expected)
  }

  test("offset pushdown is exact at every offset through the log (incl. file boundary)") {
    val index = writeLog()
    val all = read(index).collect().map(_.getLong(0)).toSeq
    (0 to all.length + 1).foreach { o =>
      val got = read(index).offset(o).collect().map(_.getLong(0)).toSeq
      assert(got == all.drop(o), s"offset $o: got $got, want ${all.drop(o)}")
    }
  }

  test("pushdown: filtered scan equals full scan filtered") {
    val index = writeLog()
    val full = read(index).collect().filter(r => r.getInt(2) == 1 && r.getLong(3) >= 2)
    val pushed = read(index)
      .filter(col("__op") === 1 && col("__gtid") >= 2).collect()
    assert(pushed.map(_.getLong(0)).sorted.toSeq == full.map(_.getLong(0)).sorted.toSeq)
  }

  test("pruned scan returns correct subset of columns") {
    val df = read(writeLog()).select("v", "__gtid")
    val rows = df.orderBy("__gtid", "v").collect()
    assert(rows.length == 7)
    assert(rows.head.schema.fieldNames.toSeq == Seq("v", "__gtid"))
  }

  /** Bounded eventually: the parquet streaming sink's commit and a
    * subsequent read can race by a beat under load — retry the
    * assertion briefly; a genuinely wrong result still fails. */
  private def eventually[T](assertion: => T): T = {
    var last: Either[Throwable, T] = Left(new AssertionError("not run"))
    var i = 0
    while (i < 6) {
      // NonFatal, not just TestFailedException: the same race can
      // surface as an AnalysisException from reading a sink whose
      // metadata log lists no committed files yet
      last = try Right(assertion) catch {
        case scala.util.control.NonFatal(e) => Left(e)
      }
      last match {
        case Right(v) => return v
        case Left(_) =>
          i += 1
          if (i < 6) Thread.sleep(500)
      }
    }
    last.fold(throw _, identity)
  }

  test("streaming: incremental pickup of appended log files, no duplicates") {
    val dir = Files.createTempDirectory("cdc-stream-spec").toString
    def r(id: Long, v: Double): Array[Any] = Array[Any](id, v)
    val w0 = new CdcCodec.LogWriter(s"$dir/b.0")
    w0.tableMap(0L, 1L, "db", "t", schema)
    w0.gtid(1000L, 1L); w0.writeRows(1000L, 1L, schema, Seq(r(1, 1.0), r(2, 2.0)))
    w0.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\n")
    val index = s"$dir/binlog.index"

    val ckpt = Files.createTempDirectory("cdc-ckpt").toString
    val outDir = Files.createTempDirectory("cdc-out").toString
    // parquet sink: supports checkpoint recovery (memory sink doesn't),
    // so restart semantics are exactly what a production pipeline sees
    def startQuery() =
      spark.readStream.format("binlogcdc")
        .option("indexFile", index).option("database", "db").option("table", "t")
        .load()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

    val q1 = startQuery()
    q1.processAllAvailable()
    eventually(assert(spark.read.parquet(outDir).count() == 2))

    // grow the log: new file + index append (mysqld-style rotation)
    val w1 = new CdcCodec.LogWriter(s"$dir/b.1")
    w1.tableMap(0L, 1L, "db", "t", schema)
    w1.gtid(2000L, 2L); w1.writeRows(2000L, 1L, schema, Seq(r(3, 3.0)))
    w1.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\nb.1\n")
    q1.processAllAvailable()
    eventually(assert(spark.read.parquet(outDir).count() == 3))
    q1.stop()

    // restart from checkpoint: new data picked up, nothing replays
    val w2 = new CdcCodec.LogWriter(s"$dir/b.2")
    w2.tableMap(0L, 1L, "db", "t", schema)
    w2.gtid(3000L, 3L); w2.writeRows(3000L, 1L, schema, Seq(r(4, 4.0)))
    w2.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\nb.1\nb.2\n")
    val q2 = startQuery()
    q2.processAllAvailable()
    eventually {
      val ids = spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 4L), s"expected exactly 1..4 once each, got $ids")
    }
    q2.stop()
  }

  test("streaming: mariadb logs pick up rotation and restart from checkpoint") {
    // the fork twin of the incremental-pickup test: V1 rows events,
    // GTID type 162 opening each txn, GTID_LIST at file start — the
    // same format-agnostic offset machinery must track growth and
    // resume without duplicates
    import graft.cdc.MysqlBinlog
    val dir = Files.createTempDirectory("maria-stream-spec").toString
    def r(id: Long, v: Double): Array[Any] = Array[Any](id, v)
    def newFile(name: String, lastSeq: Long, seq: Long, rows: Seq[Array[Any]]): Unit = {
      val w = new MysqlBinlog.Writer(s"$dir/$name", checksum = true, maria = true)
      w.gtidList(if (lastSeq > 0) Seq((0L, 101L, lastSeq)) else Nil)
      w.gtidMaria(seq * 1000L, seq, domain = 0L)
      w.tableMap(seq * 1000L, 1L, "db", "t", schema)
      w.writeRows(seq * 1000L, 1L, schema, rows)
      w.xid(seq * 1000L, seq)
      w.close()
    }
    newFile("m.000000", 0L, 1L, Seq(r(1, 1.0), r(2, 2.0)))
    Files.writeString(Paths.get(dir, "binlog.index"), "m.000000\n")
    val index = s"$dir/binlog.index"
    val ckpt = Files.createTempDirectory("maria-ckpt").toString
    val outDir = Files.createTempDirectory("maria-out").toString
    def startQuery() =
      spark.readStream.format("binlogcdc")
        .option("indexFile", index).option("database", "db").option("table", "t")
        .option("binlogFormat", "mariadb")
        .load()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    val q1 = startQuery()
    q1.processAllAvailable()
    eventually(assert(spark.read.parquet(outDir).count() == 2))
    newFile("m.000001", 1L, 2L, Seq(r(3, 3.0)))
    Files.writeString(Paths.get(dir, "binlog.index"), "m.000000\nm.000001\n")
    q1.processAllAvailable()
    eventually(assert(spark.read.parquet(outDir).count() == 3))
    q1.stop()
    newFile("m.000002", 2L, 3L, Seq(r(4, 4.0)))
    Files.writeString(Paths.get(dir, "binlog.index"),
      "m.000000\nm.000001\nm.000002\n")
    val q2 = startQuery()
    q2.processAllAvailable()
    eventually {
      val ids = spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 4L), s"expected exactly 1..4 once each, got $ids")
    }
    q2.stop()
  }

  test("update pair is never split across micro-batch partitions") {
    // one file whose only row event is an update: any batch containing it
    // must contain both images
    val dir = Files.createTempDirectory("cdc-pair-spec").toString
    val w = new CdcCodec.LogWriter(s"$dir/b.0")
    w.tableMap(0L, 1L, "db", "t", schema)
    w.gtid(1000L, 1L)
    w.updateRows(1000L, 1L, schema, Seq((Array[Any](1L, 1.0), Array[Any](1L, 2.0))))
    w.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\n")
    val q = spark.readStream.format("binlogcdc")
      .option("indexFile", s"$dir/binlog.index")
      .option("database", "db").option("table", "t").load()
      .writeStream.format("memory").queryName("cdc_pair")
      .outputMode("append").start()
    q.processAllAvailable()
    val ops = spark.table("cdc_pair").collect().map(_.getInt(2)).sorted.toSeq
    assert(ops == Seq(2, 3))
    q.stop()
  }

  test("latestOffset never regresses when the log is observed shrunken") {
    // deterministic twin of the torn-tail race: a poll that sees the
    // file mid-rewrite must not hand Spark an end offset behind the
    // committed start (Spark would COMMIT it and the next batch would
    // re-emit everything after the regressed point)
    import graft.sources.{CdcMicroBatchStream, CdcOffset}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("cdc-shrink").toString
    def r(id: Long, v: Double): Array[Any] = Array[Any](id, v)
    val w = new CdcCodec.LogWriter(s"$dir/b.0")
    w.tableMap(0L, 1L, "db", "t", schema)
    w.gtid(1000L, 1L); w.writeRows(1000L, 1L, schema, Seq(r(1, 1.0)))
    w.gtid(2000L, 2L); w.writeRows(2000L, 1L, schema, Seq(r(2, 2.0)))
    w.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\n")
    val env = graft.cdc.CdcSchema.withEnvelope(schema)
    val stream = new CdcMicroBatchStream(s"$dir/binlog.index", "db", "t",
      env, env, Array.empty)
    val full = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
      .asInstanceOf[CdcOffset]
    // shrink the log to its header: an unclamped poll would report an
    // offset far behind `full`
    val bytes = Files.readAllBytes(Paths.get(s"$dir/b.0"))
    Files.write(Paths.get(s"$dir/b.0"), bytes.take(CdcCodec.HeaderLen))
    val shrunk = stream.latestOffset(full, ReadLimit.allAvailable())
      .asInstanceOf[CdcOffset]
    assert(shrunk == full, s"offset regressed: $shrunk < $full")
    // restored log resumes forward progress from the same start
    Files.write(Paths.get(s"$dir/b.0"), bytes)
    val resumed = stream.latestOffset(full, ReadLimit.allAvailable())
      .asInstanceOf[CdcOffset]
    assert(resumed == full, "frontier unchanged once the file is whole again")
  }

  test("torn tail event: never emitted early, never skipped after completion") {
    val dir = Files.createTempDirectory("cdc-torn").toString
    def r(id: Long, v: Double): Array[Any] = Array[Any](id, v)
    val w = new CdcCodec.LogWriter(s"$dir/b.0")
    w.tableMap(0L, 1L, "db", "t", schema)
    w.gtid(1000L, 1L); w.writeRows(1000L, 1L, schema, Seq(r(1, 1.0)))
    w.gtid(2000L, 2L); w.writeRows(2000L, 1L, schema, Seq(r(2, 2.0)))
    w.close()
    val fullBytes = Files.readAllBytes(Paths.get(s"$dir/b.0"))
    // torn producer write: last 7 bytes of the final event missing
    Files.write(Paths.get(s"$dir/b.0"), fullBytes.dropRight(7))
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\n")
    val ckpt = Files.createTempDirectory("cdc-torn-ckpt").toString
    val outDir = Files.createTempDirectory("cdc-torn-out").toString
    def startQuery() =
      spark.readStream.format("binlogcdc")
        .option("indexFile", s"$dir/binlog.index")
        .option("database", "db").option("table", "t").load()
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = startQuery()
    q1.processAllAvailable()
    eventually(assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq == Seq(1L)))
    // producer finishes the event
    Files.write(Paths.get(s"$dir/b.0"), fullBytes)
    q1.processAllAvailable()
    eventually {
      val ids = spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L), s"torn event lost or duplicated: $ids")
    }
    q1.stop()
  }

  test("maxBytesPerTrigger bounds each micro-batch at event boundaries") {
    val dir = Files.createTempDirectory("cdc-rate").toString
    def r(id: Long, v: Double): Array[Any] = Array[Any](id, v)
    val w = new CdcCodec.LogWriter(s"$dir/b.0")
    w.tableMap(0L, 1L, "db", "t", schema)
    (1 to 10).foreach { i =>
      w.gtid(i * 1000L, i.toLong)
      w.writeRows(i * 1000L, 1L, schema, Seq(r(i.toLong, i.toDouble)))
    }
    w.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\n")
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("binlogcdc")
      .option("indexFile", s"$dir/binlog.index")
      .option("database", "db").option("table", "t")
      .option("maxBytesPerTrigger", "200") // a few events per batch
      .load()
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches += df.count(); ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(batches.sum == 10, s"all rows delivered exactly once: $batches")
    assert(batches.count(_ > 0) >= 2, s"rate limit should split batches: $batches")
  }

  test("all 13 wire types survive the DSv2 source end-to-end") {
    val fullSchema = StructType(Seq(
      StructField("id", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("ts", TimestampType), StructField("ntz", TimestampNTZType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("f", FloatType), StructField("sh", ShortType),
      StructField("b", ByteType), StructField("bool", BooleanType),
      StructField("dec", DecimalType(10, 2))))
    def mkRow(id: Long): Array[Any] = Array[Any](
      id, id.toInt, id * 1.5, UTF8String.fromString(s"v$id"),
      id * 1000000L, id * 2000000L, Array[Byte](id.toByte, 2, 3), 19000 + id.toInt,
      id.toFloat, id.toShort, id.toByte, id % 2 == 0,
      org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(s"$id.25"), 10, 2))
    val nullRow: Array[Any] = Array.fill[Any](13)(null)
    val dir = Files.createTempDirectory("cdc-types").toString
    val w = new CdcCodec.LogWriter(s"$dir/b.0")
    w.tableMap(0L, 1L, "db", "t", fullSchema)
    w.gtid(1000L, 1L)
    w.writeRows(1000L, 1L, fullSchema, Seq(mkRow(1), nullRow, mkRow(2)))
    w.close()
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\n")
    val df = spark.read.format("binlogcdc")
      .option("indexFile", s"$dir/binlog.index")
      .option("database", "db").option("table", "t").load()
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    val r1 = rows.find(r => !r.isNullAt(0) && r.getLong(0) == 1L).get
    assert(r1.getInt(1) == 1 && r1.getDouble(2) == 1.5 && r1.getString(3) == "v1")
    assert(r1.getAs[java.sql.Timestamp]("ts") != null)
    assert(r1.getAs[java.time.LocalDateTime]("ntz") != null)
    assert(r1.getAs[Array[Byte]]("bin").toSeq == Seq(1: Byte, 2: Byte, 3: Byte))
    assert(r1.getAs[java.sql.Date]("dt") != null)
    assert(r1.getFloat(8) == 1.0f && r1.getShort(9) == 1 && r1.getByte(10) == 1)
    assert(!r1.getBoolean(11))
    assert(r1.getDecimal(12) == new java.math.BigDecimal("1.25"))
    val rn = rows.find(_.isNullAt(0)).get
    (0 until 13).foreach(i => assert(rn.isNullAt(i), s"col $i should be null"))
    // roundtrip through parquet too (what Verify does)
    val out = Files.createTempDirectory("cdc-types-out").toString
    df.write.mode("overwrite").parquet(out)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("sidecar file pruning: gtid/tm range predicates skip whole files") {
    val dir = Files.createTempDirectory("cdc-prune").toString
    def mk(name: String, gnoBase: Long): Unit = {
      val w = new CdcCodec.LogWriter(s"$dir/$name")
      w.tableMap(gnoBase * 1000, 1L, "db", "t", schema)
      (0 until 3).foreach { i =>
        w.gtid((gnoBase + i) * 1000, gnoBase + i)
        w.writeRows((gnoBase + i) * 1000, 1L, schema,
          Seq(Array[Any](gnoBase + i, i.toDouble)))
      }
      w.close()
    }
    mk("b.0", 0L); mk("b.1", 100L); mk("b.2", 200L)
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\nb.1\nb.2\n")
    val index = s"$dir/binlog.index"
    // filter hitting only file b.1's gtid range [100,102]
    val pruned = read(index).filter(col("__gtid") >= 100 && col("__gtid") <= 150)
    assert(pruned.rdd.getNumPartitions == 1,
      s"expected 1 partition after pruning, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == Seq(100L, 101L, 102L))
    // no pruning filter: all 3 files scanned
    assert(read(index).rdd.getNumPartitions == 3)
    // missing sidecar => conservative keep
    Files.delete(Paths.get(s"$dir/b.0.meta"))
    val noMeta = read(index).filter(col("__gtid") >= 100 && col("__gtid") <= 150)
    assert(noMeta.rdd.getNumPartitions == 2) // b.0 kept (no meta), b.2 pruned
    assert(noMeta.collect().map(_.getLong(0)).sorted.toSeq == Seq(100L, 101L, 102L))
  }

  test("runtime filtering (SupportsRuntimeFiltering) prunes files at execution time") {
    import graft.sources.{CdcScan, CdcScanBuilder}
    import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, In}
    val dir = Files.createTempDirectory("cdc-runtime-filter").toString
    def mk(name: String, gnoBase: Long): Unit = {
      val w = new CdcCodec.LogWriter(s"$dir/$name")
      w.tableMap(gnoBase * 1000, 1L, "db", "t", schema)
      (0 until 3).foreach { i =>
        w.gtid((gnoBase + i) * 1000, gnoBase + i)
        w.writeRows((gnoBase + i) * 1000, 1L, schema,
          Seq(Array[Any](gnoBase + i, i.toDouble)))
      }
      w.close()
    }
    mk("b.0", 0L); mk("b.1", 100L); mk("b.2", 200L)
    Files.writeString(Paths.get(dir, "binlog.index"), "b.0\nb.1\nb.2\n")
    val full = StructType(schema.fields ++ CdcSchema.envelope)
    val scan = new CdcScanBuilder(s"$dir/binlog.index", "db", "t", full)
      .build().asInstanceOf[CdcScan]
    assert(scan.filterAttributes().map(_.describe()).toSet ==
      Set(CdcSchema.GtidCol, CdcSchema.TmCol))
    assert(scan.planInputPartitions().length == 3)
    // a DPP-style In filter from a joined build side: only b.1's range
    scan.filter(Array[Filter](In(CdcSchema.GtidCol, Array(100L, 101L))))
    assert(scan.planInputPartitions().length == 1)
    // a later filter() call replaces the runtime filter set
    scan.filter(Array[Filter](GreaterThanOrEqual(CdcSchema.GtidCol, 200L)))
    assert(scan.planInputPartitions().length == 1)
  }

  test("missing option and wrong table fail loudly") {
    val index = writeLog()
    val e1 = intercept[Exception] {
      spark.read.format("binlogcdc").option("indexFile", index).load()
    }
    assert(e1.getMessage.contains("required"))
    val e2 = intercept[Exception] {
      spark.read.format("binlogcdc")
        .option("indexFile", index).option("database", "db")
        .option("table", "nope").load()
    }
    assert(e2.getMessage.contains("no TABLE_MAP"))
  }

  test("custom scan metrics: events decoded, rows emitted, files pruned") {
    val index = writeLog()
    // __gtid = 2 lives in b.1 only: b.0 prunes at planning (driver
    // metric), and the surviving file's decode counts surface as task
    // metrics — rows emitted < events decoded (control events + the
    // other gtids' rows filter inside the reader)
    val df = read(index).filter(org.apache.spark.sql.functions.col("__gtid") === 2)
    val got = df.collect()
    assert(got.length == 2)
    val leaf = df.queryExecution.executedPlan.collectLeaves()
      .find(_.getClass.getSimpleName == "BatchScanExec").get
    def metric(n: String): Long = leaf.metrics(n).value
    assert(metric("cdcFilesPruned") == 1, "b.0 pruned by sidecar gtid bounds")
    assert(metric("cdcRowsEmitted") == 2)
    assert(metric("cdcEventsDecoded") > metric("cdcRowsEmitted"),
      "control events and filtered rows decode without emitting")
  }

  test("streaming source metrics: bytes and files behind the log frontier") {
    import graft.sources.CdcMicroBatchStream
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val index = writeLog()
    val env = CdcSchema.withEnvelope(schema)
    val stream = new CdcMicroBatchStream(index, "db", "t", env, env, Array.empty)
    // nothing consumed yet: the whole log (both files) is lag
    val m0 = stream.metrics(java.util.Optional.empty())
    assert(m0.get("behindBytes").toLong > 0)
    assert(m0.get("behindFiles") == "1", "frontier is in the second file")
    // fully caught up: zero lag
    val frontier = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
    val m1 = stream.metrics(java.util.Optional.of(frontier))
    assert(m1.get("behindBytes") == "0" && m1.get("behindFiles") == "0")
  }

  test("startingGtid: a fresh stream skips the provably-irrelevant prefix") {
    import graft.sources.{CdcOffset, CdcScan}
    val index = writeLog() // b.0 holds gtid 1, b.1 holds gtids 2-4
    val full = StructType(schema.fields ++ CdcSchema.envelope)
    def streamFor(opts: Map[String, String]) = {
      import scala.jdk.CollectionConverters._
      val props = (Map("indexFile" -> index, "database" -> "db",
        "table" -> "t") ++ opts).asJava
      new graft.sources.CdcTable(full, new java.util.HashMap(props))
        .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of()))
        .build().asInstanceOf[CdcScan]
        .toMicroBatchStream("unused")
    }
    // no bound: start at the log head, as before
    val plain = streamFor(Map.empty).initialOffset().asInstanceOf[CdcOffset]
    assert(plain == CdcOffset(0, CdcCodec.HeaderLen.toLong))
    // startingGtid=1: b.0 (maxGtid 1) is provably irrelevant — the
    // fresh stream's initial offset lands on b.1, never opening b.0
    val skipped = streamFor(Map("startingGtid" -> "1"))
      .initialOffset().asInstanceOf[CdcOffset]
    assert(skipped.fileIdx == 1, s"expected to start at b.1, got $skipped")
    // startingGtid past the whole log: start at the frontier
    val tail = streamFor(Map("startingGtid" -> "99"))
      .initialOffset().asInstanceOf[CdcOffset]
    assert(tail.fileIdx == 1 && tail.pos > CdcCodec.HeaderLen.toLong)
    // end-to-end: the streamed rows are exactly the gtid > 1 events
    val ckpt = Files.createTempDirectory("sg-ckpt").toString
    val outDir = Files.createTempDirectory("sg-out").toString
    val q = spark.readStream.format("binlogcdc")
      .option("indexFile", index).option("database", "db").option("table", "t")
      .option("startingGtid", "1")
      .load()
      .select("id", CdcSchema.GtidCol)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // the exact gtid > 1 multiset: inserts (3,4 @2), update pair
    // (2 @3, both images), delete (3 @4) — a skip landing too deep
    // would drop events and fail, not just "all > 1"
    assert(got == Seq((2L, 3L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 2L)),
      s"expected exactly the gtid > 1 events, got $got")
  }

  test("startingTimestamp: inclusive __tm bound, fresh stream skips the prefix") {
    import graft.sources.{CdcOffset, CdcScan}
    val index = writeLog() // b.0: tm 1000ms; b.1: tms 2000/3000/4000ms
    val full = StructType(schema.fields ++ CdcSchema.envelope)
    def streamFor(opts: Map[String, String]) = {
      import scala.jdk.CollectionConverters._
      val props = (Map("indexFile" -> index, "database" -> "db",
        "table" -> "t") ++ opts).asJava
      new graft.sources.CdcTable(full, new java.util.HashMap(props))
        .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of()))
        .build().asInstanceOf[CdcScan]
        .toMicroBatchStream("unused")
    }
    // bound exactly at b.1's first event (2000ms, in micros): b.0
    // (maxTs 1000ms) is provably irrelevant — skipped, never opened
    val skipped = streamFor(Map("startingTimestamp" -> "2000000"))
      .initialOffset().asInstanceOf[CdcOffset]
    assert(skipped.fileIdx == 1, s"expected to start at b.1, got $skipped")
    // bound past the whole log: start at the frontier
    val tail = streamFor(Map("startingTimestamp" -> "99000000"))
      .initialOffset().asInstanceOf[CdcOffset]
    assert(tail.fileIdx == 1 && tail.pos > CdcCodec.HeaderLen.toLong)
    // end-to-end, bound ON an event time: INCLUSIVE semantics keep the
    // tm == 2000ms insert batch (an exclusive > would drop ids 3,4)
    val ckpt = Files.createTempDirectory("st-ckpt").toString
    val outDir = Files.createTempDirectory("st-out").toString
    val q = spark.readStream.format("binlogcdc")
      .option("indexFile", index).option("database", "db").option("table", "t")
      .option("startingTimestamp", "2000000")
      .load()
      .select("id", CdcSchema.GtidCol)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((2L, 3L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 2L)),
      s"expected exactly the __tm >= 2000ms events, got $got")
  }

  test("reserved envelope name in the source schema fails loud, not hijacked") {
    // projection maps columns by NAME — a source column called __op or
    // __query would silently read envelope state instead of its own
    // data, so the schema shape is validated at planning time
    val index = writeLog()
    for (bad <- Seq(CdcSchema.OpCol, CdcSchema.QueryCol)) {
      val colliding = StructType(
        StructField(bad, org.apache.spark.sql.types.LongType) +: schema.fields)
      val e = intercept[Exception] {
        spark.read.format("binlogcdc")
          .schema(CdcSchema.withEnvelope(colliding))
          .option("indexFile", index).option("database", "db")
          .option("table", "t").load().collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).mkString(" | ").contains("reserved envelope"), e.getMessage)
    }
  }

  test("typed Dataset view: case-class rows, groupByKey aggregation") {
    val sfDir = "/root/testdata/sf0.001"
    val ds = graft.queries.Cdc.typedScan(spark, sfDir)
    import spark.implicits._
    val perOp = ds.groupByKey(_.__op).count().collect().toMap
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    assert(perOp(1) == orders.count())
    assert(perOp(2) == perOp(3)) // update images pair up
    val first = ds.filter(_.o_orderkey == 10L).collect()
    assert(first.forall(_.o_orderkey == 10L))
  }

  test("fixture scan matches latest-image compaction invariants") {
    val sfDir = "/root/testdata/sf0.001"
    val cdc = graft.queries.Cdc.scan(spark, sfDir)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val nOrders = orders.count()
    val nUpd = orders.filter(col("o_orderkey") % 10 === 0).count()
    val nDel = orders.filter(col("o_orderkey") % 100 === 0).count()
    assert(cdc.filter(col("__op") === 1).count() == nOrders)
    assert(cdc.filter(col("__op") === 2).count() == nUpd)
    assert(cdc.filter(col("__op") === 3).count() == nUpd)
    assert(cdc.filter(col("__op") === 0).count() == nDel)
    val latest = graft.queries.Cdc.latestImage(cdc, Seq("o_orderkey"))
    assert(latest.count() == nOrders - nDel)
  }

  test("multi-source log: colliding gnos are disjoint under __source_id") {
    val index = CdcFixture.ensureMultiSource(spark, "/root/testdata/sf0.001")
    val ms = spark.read.format("binlogcdc").option("indexFile", index)
      .option("database", CdcFixture.Db).option("table", CdcFixture.Table).load()
    val bare = ms.select("__gtid").distinct().count()
    val pairs = ms.select("__source_id", "__gtid").distinct().count()
    // the fixture's two servers both number transactions from 0: a
    // consumer keyed on bare __gtid conflates distinct transactions...
    assert(pairs > bare, s"expected gno collision across sources ($pairs vs $bare)")
    // ...while (source, gno) keeps every transaction distinct: per-source
    // txn counts sum exactly to the pair count
    val perSource = ms.groupBy("__source_id")
      .agg(countDistinct(col("__gtid")).as("n")).collect()
    assert(perSource.map(_.getAs[Long]("n")).sum == pairs)
    assert(perSource.map(_.getString(0)).toSet ==
      Set(CdcFixture.SourceA, CdcFixture.SourceB))
    // offsets/dedup proof: a transaction-level dedup on bare gtid loses
    // rows; on (source, gtid) it is lossless
    val byBare = ms.dropDuplicates("__gtid").count()
    val byPair = ms.dropDuplicates("__source_id", "__gtid").count()
    assert(byBare == bare && byPair == pairs)

    // "one source's stream": the equality filter is accepted for row-level
    // pushdown (decoded rows from the other server never leave the
    // source), and equals the unpushed filter result
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
    assert(graft.sources.EnvelopePredicate.supports(EqualTo("__source_id", "x")))
    // uuid ranges are meaningless -> ranges decline (Spark evaluates above)
    assert(!graft.sources.EnvelopePredicate.supports(GreaterThan("__source_id", "x")))
    val onlyA = ms.filter(col("__source_id") === CdcFixture.SourceA)
    val expectA = ms.collect().count(_.getAs[String]("__source_id") == CdcFixture.SourceA)
    assert(onlyA.count() == expectA && expectA > 0)
  }
}
