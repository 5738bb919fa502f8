package graft.tools

import org.apache.spark.sql.types._

/** Single-threaded decode microprobe: separates the three layers of the
  * binlog read path — event framing + CRC32 (EventReader only), the
  * full row decode (RowDecoder), and, by comparison with the ScaleSmoke
  * end-to-end number, the Spark task glue. Run 3 reps: rep1 vs rep3 is
  * the JIT warm-up ramp, which explains why small-SF end-to-end
  * Mrows/s undershoots this probe's steady state (tasks of a few
  * hundred ms never reach C2; at 100 TB task sizes they do).
  *
  * Run: `sbt "runMain graft.tools.DecodeProf [nRows] [mysql|mariadb]"`.
  */
object DecodeProf {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val maria = args.length > 1 && args(1) == "mariadb"
    val dir = java.nio.file.Files.createTempDirectory("dec-prof").toString
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType), StructField("s", StringType)))
    val sid = "11111111-1111-1111-1111-111111111111"
    val path = s"$dir/bin.000001"
    val w = new graft.cdc.MysqlBinlog.Writer(path, checksum = true, maria = maria)
    if (maria) w.gtidList(Nil)
    w.tableMap(0L, 1L, "db", "big", schema)
    var id = 0L
    val batch = new Array[Array[Any]](100)
    while (id < n) {
      var j = 0
      while (j < 100) { batch(j) = Array[Any](id, id * 0.5, s"r$id"); id += 1; j += 1 }
      if (maria) w.gtidMaria(id, id / 100, domain = 0L)
      else w.gtid(id, id / 100, sid)
      w.writeRows(id, 1L, schema, batch.toSeq)
    }
    w.close()
    (1 to 3).foreach { rep =>
      var t0 = System.nanoTime()
      val r = new graft.cdc.MysqlBinlog.EventReader(path, maria)
      val dec = new graft.cdc.MysqlBinlog.RowDecoder("db", "big", maria = maria)
      var cnt = 0L
      while (r.hasNext) cnt += dec.decode(r.next()).size
      r.close()
      val full = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val r2 = new graft.cdc.MysqlBinlog.EventReader(path, maria)
      var ev = 0L
      while (r2.hasNext) { r2.next(); ev += 1 }
      r2.close()
      val readOnly = (System.nanoTime() - t0) / 1e9
      println(f"DECODEPROF rep$rep flavor=${if (maria) "mariadb" else "mysql"} " +
        f"rows=$cnt decode=${cnt / full / 1e6}%.2f Mrows/s " +
        f"framing+crc=${readOnly}%.2fs of ${full}%.2fs (${100 * readOnly / full}%.0f%%)")
    }
    graft.TmpDirs.deleteRecursively(new java.io.File(dir))
  }
}
