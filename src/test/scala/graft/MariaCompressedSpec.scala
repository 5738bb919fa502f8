package graft

import graft.cdc.{CdcCodec, CdcSchema, MariaDbAdapter, MysqlBinlog}
import java.io.IOException
import java.nio.file.Files
import org.apache.spark.sql.types._

/** MariaDB `log_bin_compress=ON` (event types 165-168).
  *
  * The layout is pinned TWO ways (the wire-conformance discipline):
  * hand-authored golden bytes laid out from the published MariaDB
  * compressed-record format (sql/log_event.cc's "Compressed Record"
  * comment: header byte 0x80|lenlen with algorithm bits 4-6 zero =
  * zlib, big-endian original length, zlib stream; rows events keep the
  * V1 post-header uncompressed and compress width+bitmaps+images as one
  * record — the same boundary the go-mysql replication client reads),
  * with zlib streams produced by python's zlib, NOT this repo's Writer;
  * plus a Writer round trip and the cdc52 DuckDB oracle end-to-end.
  * Every malformation (wrong header, corrupt stream, length mismatch)
  * must fail LOUD — a misaligned boundary can never decode silently.
  */
class MariaCompressedSpec extends SparkTestBase {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(java.lang.Integer.parseInt(_, 16).toByte).toArray

  // table d.t: [LONGLONG, LONGLONG], table id 0x24, no metadata
  private val Tm = "240000000000 0100 016400 017400 02 0808 00 00"
  // MariaDB GTID opener: seq 1, domain 0, flags2 0 (non-standalone)
  private val Gtid = "0100000000000000 00000000 00"
  private val Post = "240000000000 0000" // table id + flags (V1: no extra)

  // compressed records authored with python zlib over hand-laid bodies:
  //   WRITE  body: 02 03 | 00 id=1 val=100 | 00 id=2 val=200
  //   UPDATE body: 02 03 03 | 00 (1,100) | 00 (1,101)
  //   DELETE body: 02 03 | 00 (2,200)
  private val WriteRec =
    "8124789c636266606480801428cdc004a54f406900111a0135"
  private val UpdateRec =
    "8125789c636266666064808014280d174885d2000e6100d4"
  private val DeleteRec = "8113789c6362666062808013501a0006cf00d0"
  private val CommitRec = "8106789c73f6f7f5f50c0100062401ca" // "COMMIT"

  private def mariaDecoder() = {
    val dec = MariaDbAdapter.decoder("d", "t", _ => true, None, false)
    dec.decode(CdcCodec.RawEvent(MysqlBinlog.EventType.MariaGtid, 0L,
      hex(Gtid), 0L, 0L))
    dec.decode(CdcCodec.RawEvent(MysqlBinlog.EventType.TableMap, 0L,
      hex(Tm), 0L, 0L))
    dec
  }
  private def ev(tpe: Byte, payloadHex: String) =
    CdcCodec.RawEvent(tpe, 1000L, hex(payloadHex), 0L, 0L)

  test("golden bytes: compressed WRITE/UPDATE/DELETE rows decode to pinned values") {
    val dec = mariaDecoder()
    val w = dec.decode(ev(MysqlBinlog.EventType.MariaWriteRowsCompressed,
      Post + WriteRec)).toSeq
    assert(w.map(r => (r.op, r.values.toSeq)) == Seq(
      (CdcSchema.Op.Insert, Seq(1L, 100L)),
      (CdcSchema.Op.Insert, Seq(2L, 200L))))
    assert(w.forall(r => r.gtid == 1L &&
      r.sourceId.toString == "0-0")) // domain 0, header server id 0
    val u = dec.decode(ev(MysqlBinlog.EventType.MariaUpdateRowsCompressed,
      Post + UpdateRec)).toSeq
    assert(u.map(r => (r.op, r.values.toSeq)) == Seq(
      (CdcSchema.Op.UpdateBefore, Seq(1L, 100L)),
      (CdcSchema.Op.UpdateAfter, Seq(1L, 101L))))
    val d = dec.decode(ev(MysqlBinlog.EventType.MariaDeleteRowsCompressed,
      Post + DeleteRec)).toSeq
    assert(d.map(r => (r.op, r.values.toSeq)) ==
      Seq((CdcSchema.Op.Delete, Seq(2L, 200L))))
  }

  test("golden bytes: compressed QUERY decodes as a statement — COMMIT closes the scope") {
    val dec = mariaDecoder()
    // fixed part + empty status vars + db 'd' + NUL, then the record
    val qPayload = "07000000 00000000 01 0000 0000 64 00 " + CommitRec
    assert(dec.decode(ev(MysqlBinlog.EventType.MariaQueryCompressed,
      qPayload)).isEmpty)
    // scope is closed: target rows without a new GTID must fail loud
    val ex = intercept[IOException] {
      dec.decode(ev(MysqlBinlog.EventType.MariaWriteRowsCompressed,
        Post + WriteRec))
    }
    assert(ex.getMessage.contains("no live transaction identity"),
      ex.getMessage)
  }

  test("golden bytes: malformed compressed records fail loud, never decode silently") {
    // corrupt zlib byte (flipped) — zlib's own checksum/format rejects
    val bad1 = intercept[IOException] {
      mariaDecoder().decode(ev(
        MysqlBinlog.EventType.MariaWriteRowsCompressed,
        Post + "8124789c636266609b80801428cdc004a54f406900111a0135"))
    }
    assert(bad1.getMessage.contains("zlib"), bad1.getMessage)
    // header byte with algorithm bits set (0x90): not zlib — refuse
    val bad2 = intercept[IOException] {
      mariaDecoder().decode(ev(
        MysqlBinlog.EventType.MariaWriteRowsCompressed,
        Post + "91" + WriteRec.drop(2)))
    }
    assert(bad2.getMessage.contains("algorithm"), bad2.getMessage)
    // declared original length one byte short of the stream's output
    val bad3 = intercept[IOException] {
      mariaDecoder().decode(ev(
        MysqlBinlog.EventType.MariaWriteRowsCompressed,
        Post + "8123" + WriteRec.drop(4)))
    }
    assert(bad3.getMessage.contains("does not match") ||
      bad3.getMessage.contains("larger than"), bad3.getMessage)
    // non-target tables never pay inflation and never throw: the same
    // corrupt record under a different table id is skipped whole
    assert(mariaDecoder().decode(ev(
      MysqlBinlog.EventType.MariaWriteRowsCompressed,
      "990000000000 0000 " + "91deadbeef")).isEmpty)
  }

  test("writer round trip: compressed events decode identically to their plain twins") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    val rows = (0L until 200L).map(i => Array[Any](i, i * 3 % 97)).toSeq
    val pairs = rows.take(50).map(r =>
      (r, Array[Any](r(0), r(1).asInstanceOf[Long] + 1000L))).toSeq
    def write(dir: String, compressed: Boolean): String = {
      val path = s"$dir/binlog.000001"
      val w = new MysqlBinlog.Writer(path, checksum = true, maria = true)
      w.gtidMaria(1000L, 1L, 0L)
      w.tableMap(1000L, 9L, "db", "t", schema)
      if (compressed) w.writeRowsCompressed(1000L, 9L, schema, rows)
      else w.writeRows(1000L, 9L, schema, rows)
      w.xid(1000L, 1L)
      w.gtidMaria(2000L, 2L, 0L)
      w.tableMap(2000L, 9L, "db", "t", schema)
      if (compressed) {
        w.updateRowsCompressed(2000L, 9L, schema, pairs)
        w.deleteRowsCompressed(2000L, 9L, schema, rows.takeRight(10))
        w.queryCompressed(2000L, "db",
          "ALTER TABLE t COMMENT 'a statement long enough to compress'")
      } else {
        w.updateRows(2000L, 9L, schema, pairs)
        w.deleteRows(2000L, 9L, schema, rows.takeRight(10))
        w.query(2000L, "db",
          "ALTER TABLE t COMMENT 'a statement long enough to compress'")
      }
      w.close()
      path
    }
    def decodeAll(path: String): Seq[(Int, Long, Seq[Any])] = {
      val r = MariaDbAdapter.open(path)
      val dec = MariaDbAdapter.decoder("db", "t", _ => true, None, false)
      try {
        val out = Seq.newBuilder[(Int, Long, Seq[Any])]
        while (r.hasNext) out ++= dec.decode(r.next())
          .map(row => (row.op, row.gtid, row.values.toSeq))
        out.result()
      } finally r.close()
    }
    val plain = decodeAll(write(Files.createTempDirectory("mcz-p").toString,
      compressed = false))
    val comp = decodeAll(write(Files.createTempDirectory("mcz-c").toString,
      compressed = true))
    assert(plain.nonEmpty && comp == plain)
  }
}
