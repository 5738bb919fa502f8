package graft

import java.nio.file.{Files, Paths}

import graft.cdc.CdcSchema

/** Whole-file golden fixtures for the decoder's POLICY layer — the wire
  * states a production 8.x binlog can contain that the value-decode
  * goldens don't produce, each pinned to an explicit skip-vs-fail
  * decision (the policy table lives in DESIGN.md §"MySQL event-type
  * policy"). Bytes are authored from the public replication layouts
  * with an independent tool (zlib CRC32), NOT by [[MysqlBinlog.Writer]]
  * — a writer/reader-symmetric mistake cannot pass. Table `gd.t` =
  * [id BIGINT, v VARCHAR(20) nullable], same identity as
  * GoldenBinlogSpec.
  *
  * Policies pinned here:
  *   - `binlog_row_image=MINIMAL/NOBLOB` partial row images: decodable
  *     exactly as far as the projection reaches; selecting a column the
  *     image omits fails loud (absent ≠ NULL — silently surfacing NULL
  *     would corrupt latest-image compaction).
  *   - Transaction identity: XID closes the identity scope. Tagged
  *     GTIDs (MySQL 8.3+, type 42) DECODE — rows carry `uuid:tag` as
  *     __source_id (round 11; previously fail-loud) — while a type-42
  *     event with an unknown serialization field id still fails loud.
  *   - v1 rows events (pre-5.6 layout, types 23-25) for the target
  *     table fail loud instead of silently decoding zero rows.
  *   - Control events a real log interleaves (QUERY/BEGIN, ROWS_QUERY,
  *     HEARTBEAT, STOP, unknown future types) are skipped; rows decode
  *     around them untouched.
  */
class GoldenPolicySpec extends SparkTestBase {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def materialize(hexStr: String): String = {
    val dir = Files.createTempDirectory("golden-policy").toString
    Files.write(Paths.get(dir, "golden-bin.000001"), hex(hexStr))
    Files.writeString(Paths.get(dir, "binlog.index"), "golden-bin.000001\n")
    dir
  }

  private def read(dir: String) = spark.read.format("binlogcdc")
    .option("indexFile", s"$dir/binlog.index")
    .option("database", "gd").option("table", "t")
    .option("binlogFormat", "mysql")
    .load()

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  /** Txn 1 (gtid 1): full-image INSERT (1,"ab"),(2,NULL); XID. Txn 2
    * (gtid 2): UPDATE under binlog_row_image=MINIMAL — before image
    * carries the PK only (columns-present 0x01), after image the PK +
    * changed column (0x03): (1) → (1,"cd"); XID. */
  private val MinimalImageHex =
    """fe62696e64f153650f010000007a0000007e00000000000400382e302e333600000000000000
      |0000000000000000000000000000000000000000000000000000000000000000000000000064
      |f1536513000d0008001200040404041200005400041a08000000080808020000000a0a0a2a2a
      |0012340000000001369a4a9364f15365210100000041000000bf0000000000003e11fa4771ca
      |11e19e33c80aa94295620100000000000000020000000000000000010000000000000060c997
      |2664f15365130100000037000000f6000000000005000000000001000267640001740002080f
      |02140002010100040502696401769cc2379264f153651e01000000380000002e010000000005
      |0000000000010002000203000100000000000000026162020200000000000000db735b9c64f1
      |536510010000001f0000004d010000000065000000000000004c3952aa64f153652101000000
      |410000008e0100000000003e11fa4771ca11e19e33c80aa94295620200000000000000020100
      |00000000000002000000000000003e4d50d164f15365130100000037000000c5010000000005
      |000000000001000267640001740002080f021400020101000405026964017612c6895a64f153
      |651f0100000039000000fe010000000005000000000001000200020103000100000000000000
      |00010000000000000002636437bccc2464f1536510010000001f0000001d0200000000660000
      |0000000000fc991cbe""".stripMargin

  test("partial row image: selecting an absent column fails loud") {
    val dir = materialize(MinimalImageHex)
    val ex = intercept[Exception] { read(dir).collect() }
    val all = messages(ex).mkString(" | ")
    assert(all.contains("binlog_row_image") && all.contains(" v "), all)
  }

  test("partial row image: a projection the images carry decodes exactly") {
    val dir = materialize(MinimalImageHex)
    val rows = read(dir)
      .select("id", CdcSchema.OpCol, CdcSchema.GtidCol)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._3, t._2, t._1))
    assert(rows == Seq(
      (1L, CdcSchema.Op.Insert, 1L),
      (2L, CdcSchema.Op.Insert, 1L),
      (1L, CdcSchema.Op.UpdateBefore, 2L),
      (1L, CdcSchema.Op.UpdateAfter, 2L)))
  }

  /** `binlog_row_image=NOBLOB`, table gd.t = [id BIGINT, v VARCHAR(20),
    * b BLOB]. Txn 1 (gtid 1): full INSERT (1,"ab",XY) — a new row's
    * blob always "changed". Txn 2 (gtid 2): UPDATE v only — blob
    * UNCHANGED, so BOTH images carry (id,v) (columns-present 0x03):
    * (1,"ab") → (1,"cd"). Txn 3 (gtid 3): UPDATE the blob — before 0x03,
    * after 0x07 with b="ZW". Txn 4 (gtid 4): DELETE, before image 0x03.
    * The NOBLOB differentiator vs MINIMAL: non-blob columns stay
    * readable across every image, including befores and deletes. */
  private val NoblobImageHex =
    """fe62696e64f153650f010000007a0000007e00000000000400382e302e333600000000000000
      |0000000000000000000000000000000000000000000000000000000000000000000000000064
      |f1536513000d0008001200040404041200005400041a08000000080808020000000a0a0a2a2a
      |0012340000000001369a4a9364f15365210100000041000000bf0000000000003e11fa4771ca
      |11e19e33c80aa94295620100000000000000020000000000000000010000000000000060c997
      |2664f1536513010000003b000000fa000000000000050000000001000267640001740003080f
      |fc0314000206010100040702696401760162f0b85f1f64f153651e01000000330000002d0100
      |00000000050000000001000200030700010000000000000002616202005859b3627c2864f153
      |6510010000001f0000004c010000000065000000000000003ad85d3764f15365210100000041
      |0000008d0100000000003e11fa4771ca11e19e33c80aa9429562020000000000000002010000
      |000000000002000000000000005a78829764f1536513010000003b000000c801000000000005
      |0000000001000267640001740003080ffc03140002060101000407026964017601627e9c105b
      |64f153651f010000003c00000004020000000000050000000001000200030303000100000000
      |0000000261620001000000000000000263643d80a1d364f1536510010000001f000000230200
      |0000006600000000000000c88851de64f15365210100000041000000640200000000003e11fa
      |4771ca11e19e33c80aa942956203000000000000000202000000000000000300000000000000
      |b54ad00964f1536513010000003b0000009f0200000000000500000000010002676400017400
      |03080ffc03140002060101000407026964017601620275f83664f153651f0100000040000000
      |df02000000000005000000000100020003030700010000000000000002636400010000000000
      |000002636402005a5721a0f3a164f1536510010000001f000000fe0200000000670000000000
      |000072dc790164f153652101000000410000003f0300000000003e11fa4771ca11e19e33c80a
      |a9429562040000000000000002030000000000000004000000000000003eb2067b64f1536513
      |010000003b0000007a030000000000050000000001000267640001740003080ffc0314000206
      |0101000407026964017601622244a56564f1536520010000002f000000a90300000000000500
      |000000010002000303000100000000000000026364a9a0513164f1536510010000001f000000
      |c8030000000068000000000000005918db56""".stripMargin

  test("NOBLOB row image: non-blob columns decode across every image") {
    val dir = materialize(NoblobImageHex)
    val rows = read(dir)
      .select("id", "v", CdcSchema.OpCol, CdcSchema.GtidCol)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._4, t._3))
    assert(rows == Seq(
      (1L, "ab", CdcSchema.Op.Insert, 1L),
      (1L, "ab", CdcSchema.Op.UpdateBefore, 2L),
      (1L, "cd", CdcSchema.Op.UpdateAfter, 2L),
      (1L, "cd", CdcSchema.Op.UpdateBefore, 3L),
      (1L, "cd", CdcSchema.Op.UpdateAfter, 3L),
      (1L, "cd", CdcSchema.Op.Delete, 4L)), rows.mkString("; "))
  }

  test("NOBLOB row image: selecting the thinned blob column fails loud") {
    val dir = materialize(NoblobImageHex)
    val ex = intercept[Exception] { read(dir).select("id", "b").collect() }
    val all = messages(ex).mkString(" | ")
    assert(all.contains("binlog_row_image") && all.contains(" b "), all)
  }

  /** PK-less identity under NOBLOB: the blob IS "required to identify
    * rows", so the update's before image carries it (0x07) and the
    * after image carries it because it changed (0x07) — the positive
    * blob-decode path from authored bytes. (A thinned image's blob is
    * structurally unprojectable — selecting it fails loud above — so
    * this full-identity shape is where authored blob bytes are
    * readable.) Txn 1: full INSERT (1,"ab",XY). Txn 2: UPDATE
    * (1,"ab",XY) → (1,"ab",ZW). */
  private val NoblobFullIdentityHex =
    """fe62696e64f153650f010000007a0000007e00000000000400382e302e333600000000000000
      |0000000000000000000000000000000000000000000000000000000000000000000000000064
      |f1536513000d0008001200040404041200005400041a08000000080808020000000a0a0a2a2a
      |0012340000000001369a4a9364f15365210100000041000000bf0000000000003e11fa4771ca
      |11e19e33c80aa94295620100000000000000020000000000000000010000000000000060c997
      |2664f1536513010000003b000000fa000000000000050000000001000267640001740003080f
      |fc0314000206010100040702696401760162f0b85f1f64f153651e01000000330000002d0100
      |00000000050000000001000200030700010000000000000002616202005859b3627c2864f153
      |6510010000001f0000004c010000000065000000000000003ad85d3764f15365210100000041
      |0000008d0100000000003e11fa4771ca11e19e33c80aa9429562020000000000000002010000
      |000000000002000000000000005a78829764f1536513010000003b000000c801000000000005
      |0000000001000267640001740003080ffc03140002060101000407026964017601627e9c105b
      |64f153651f01000000440000000c020000000000050000000001000200030707000100000000
      |0000000261620200585900010000000000000002616202005a570a5a807664f1536510010000
      |001f0000002b02000000006600000000000000fe9608ed""".stripMargin

  test("NOBLOB full-identity update: blob bytes decode from authored images") {
    val dir = materialize(NoblobFullIdentityHex)
    val rows = read(dir)
      .select("id", "b", CdcSchema.OpCol, CdcSchema.GtidCol)
      .collect().map(r => (r.getLong(0),
        new String(r.getAs[Array[Byte]](1), "UTF-8"), r.getInt(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._4, t._3))
    assert(rows == Seq(
      (1L, "XY", CdcSchema.Op.Insert, 1L),
      (1L, "XY", CdcSchema.Op.UpdateBefore, 2L),
      (1L, "ZW", CdcSchema.Op.UpdateAfter, 2L)), rows.mkString("; "))
  }

  /** Txn 1 (gtid 1, untagged): full INSERT; XID. Txn 2 opens with a
    * GTID_TAGGED_LOG_EVENT (type 42, MySQL 8.3+): `mysql::serialization`
    * field stream — field_id prefix-varints, uuid(16) / tag("sometag")
    * / gno(2) plus the numeric trailers — followed by its TABLE_MAP and
    * INSERT. Round 11 flipped this fixture from fail-loud to DECODE:
    * the tagged rows must carry `uuid:tag` as __source_id and gno 2,
    * and the untagged txn must stay byte-identical. */
  private val TaggedGtidHex =
    """fe62696e64f153650f010000007a0000007e00000000000400382e302e333600000000000000
      |0000000000000000000000000000000000000000000000000000000000000000000000000064
      |f1536513000d0008001200040404041200005400041a08000000080808020000000a0a0a2a2a
      |0012340000000001369a4a9364f15365210100000041000000bf0000000000003e11fa4771ca
      |11e19e33c80aa94295620100000000000000020000000000000000010000000000000060c997
      |2664f15365130100000037000000f6000000000005000000000001000267640001740002080f
      |02140002010100040502696401769cc2379264f153651e01000000380000002e010000000005
      |0000000000010002000203000100000000000000026162020200000000000000db735b9c64f1
      |536510010000001f0000004d010000000065000000000000004c3952aa64f153652a01000000
      |53000000a00100000000003e11fa4771ca11e19e33c80aa9429562020e736f6d657461670404
      |060208040a7f0021141e240a060c7f0021141e240a060e001083d0091283d009adfcbdbb64f1
      |5365130100000037000000d7010000000005000000000001000267640001740002080f021400
      |0201010004050269640176fac85b2f64f153651e01000000380000000f020000000005000000
      |0000010002000203000100000000000000026162020200000000000000392657f8""".stripMargin

  test("tagged GTID (type 42) decodes: rows carry uuid:tag identity") {
    val dir = materialize(TaggedGtidHex)
    val rows = read(dir)
      .select("id", CdcSchema.GtidCol, CdcSchema.SourceIdCol)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq.sortBy(t => (t._2, t._1))
    val uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    assert(rows == Seq(
      (1L, 1L, uuid), (2L, 1L, uuid),
      (1L, 2L, s"$uuid:sometag"), (2L, 2L, s"$uuid:sometag")))
  }

  /** Same chain, but the type-42 event carries an UNKNOWN field id (11)
    * after gno: its payload kind is undecidable, so guessing would
    * desynchronize the stream right before the row events — must fail
    * loud, never decode-and-hope. */
  private val TaggedGtidUnknownFieldHex =
    """fe62696e64f153650f010000007a0000007e00000000000400382e302e333600000000000000
      |0000000000000000000000000000000000000000000000000000000000000000000000000064
      |f1536513000d0008001200040404041200005400041a08000000080808020000000a0a0a2a2a
      |0012340000000001369a4a9364f15365210100000041000000bf0000000000003e11fa4771ca
      |11e19e33c80aa94295620100000000000000020000000000000000010000000000000060c997
      |2664f15365130100000037000000f6000000000005000000000001000267640001740002080f
      |02140002010100040502696401769cc2379264f153651e01000000380000002e010000000005
      |0000000000010002000203000100000000000000026162020200000000000000db735b9c64f1
      |536510010000001f0000004d010000000065000000000000004c3952aa64f153652a01000000
      |55000000a20100000000003e11fa4771ca11e19e33c80aa9429562020e736f6d657461670404
      |060208040a7f0021141e240a060c7f0021141e240a060e001083d0091283d00916c63dd24618
      |64f15365130100000037000000d9010000000005000000000001000267640001740002080f02
      |14000201010004050269640176a232ea0364f153651e01000000380000001102000000000500
      |0000000001000200020300010000000000000002616202020000000000000013e17dae""".stripMargin

  /** Table gd.t = [id BIGINT, v JSON]. Txn 1: full INSERT of
    * {"a":1,"arr":[10,20]}. Txn 2: PARTIAL_UPDATE_ROWS (type 39,
    * binlog_row_value_options=PARTIAL_JSON) — after image carries
    * value_options=1, partial_bits=1 and a Json_diff_vector
    * (REPLACE $.a→7, INSERT $.b→"new", REMOVE $.arr[0]) instead of the
    * full document. Layout authored from json_binary.h + json_diff.cc
    * independently of the repo's Writer. */
  private val PartialJsonHex =
    """fe62696e64f153650f010000007a0000007e00000000000400382e302e333600000000000000
      |0000000000000000000000000000000000000000000000000000000000000000000000000064
      |f1536513000d0008001200040404041200005400041a08000000080808020000000a0a0a2a2a
      |0012340000000001369a4a9364f15365210100000041000000bf0000000000003e11fa4771ca
      |11e19e33c80aa94295620100000000000000020000000000000000010000000000000060c997
      |2664f15365130100000036000000f500000000000500000000000100026764000174000208f5
      |01040201010004050269640176856e7f9264f153651e01000000510000004601000000000500
      |0000000000000200020300010000000000000021000000000200200012000100130003000501
      |000216006161727202000a00050a00051400dd73935464f1536510010000001f000000650100
      |0000006500000000000000a25f6f5464f15365210100000041000000a60100000000003e11fa
      |4771ca11e19e33c80aa942956202000000000000000201000000000000000200000000000000
      |1baf573c64f15365130100000036000000dc0100000000050000000000010002676400017400
      |0208f5010402010100040502696401760bb9219f64f1536527010000007f0000005b02000000
      |0005000000000000000200020303000100000000000000210000000002002000120001001300
      |03000501000216006161727202000a00050a0005140001010001000000000000001e00000000
      |03242e61030507000103242e62050c036e65770208242e6172725b305d10b6187764f1536510
      |010000001f0000007a0200000000660000000000000015bc0c57""".stripMargin

  test("PARTIAL_JSON golden: authored type-39 diff vector applies against the before image") {
    val dir = materialize(PartialJsonHex)
    val rows = read(dir)
      .select("id", "v", CdcSchema.OpCol, CdcSchema.GtidCol)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._4, t._3))
    assert(rows == Seq(
      (1L, """{"a":1,"arr":[10,20]}""", CdcSchema.Op.Insert, 1L),
      (1L, """{"a":1,"arr":[10,20]}""", CdcSchema.Op.UpdateBefore, 2L),
      (1L, """{"a":7,"b":"new","arr":[20]}""", CdcSchema.Op.UpdateAfter, 2L)),
      rows.mkString("; "))
  }

  test("tagged GTID with an unknown serialization field id fails loud") {
    val dir = materialize(TaggedGtidUnknownFieldHex)
    val ex = intercept[Exception] { read(dir).collect() }
    val all = messages(ex).mkString(" | ")
    assert(all.contains("unknown field") && all.contains("11"), all)
  }

  /** GTID 1, TABLE_MAP, then a WRITE_ROWS_V1 (type 23, pre-5.6 layout:
    * no extra-data length field) for the target table. */
  private val V1RowsHex =
    """fe62696e64f153650f010000007a0000007e00000000000400382e302e333600000000000000
      |0000000000000000000000000000000000000000000000000000000000000000000000000064
      |f1536513000d0008001200040404041200005400041a08000000080808020000000a0a0a2a2a
      |0012340000000001369a4a9364f15365210100000041000000bf0000000000003e11fa4771ca
      |11e19e33c80aa94295620100000000000000020000000000000000010000000000000060c997
      |2664f15365130100000037000000f6000000000005000000000001000267640001740002080f
      |02140002010100040502696401769cc2379264f1536517010000002d00000023010000000005
      |000000000000000103000900000000000000027631290320b3""".stripMargin

  test("v1 rows event (pre-5.6 layout) for the target table fails loud") {
    val dir = materialize(V1RowsHex)
    val ex = intercept[Exception] { read(dir).collect() }
    val all = messages(ex).mkString(" | ")
    assert(all.contains("v1 rows event") && all.contains("type 23"), all)
  }

  /** The control-event zoo of a production 8.x log: PREVIOUS_GTIDS,
    * GTID, QUERY(BEGIN), TABLE_MAP, ROWS_QUERY (binlog_rows_query_
    * log_events=ON), WRITE, XID, HEARTBEAT, an UNKNOWN future type
    * (99), STOP — all control events skipped, the one transaction's
    * rows decode exactly. */
  private val EventZooHex =
    """fe62696e64f153650f010000007a0000007e00000000000400382e302e333600000000000000
      |0000000000000000000000000000000000000000000000000000000000000000000000000064
      |f1536513000d0008001200040404041200005400041a08000000080808020000000a0a0a2a2a
      |0012340000000001369a4a9364f1536523010000001f0000009d000000000000000000000000
      |0080d9c53e64f15365210100000041000000de0000000000003e11fa4771ca11e19e33c80aa9
      |4295620100000000000000020000000000000000010000000000000071a45dac64f153650201
      |0000002c0000000a010000000007000000000000000200000000676400424547494eefa983ac
      |64f1536513010000003700000041010000000005000000000001000267640001740002080f02
      |14000201010004050269640176f6b3f9ac64f153651d010000003a0000007b01000000002255
      |50444154452074205345542076203d2027636427205748455245206964203d203154c8c74e64
      |f153651e0100000038000000b301000000000500000000000100020002030001000000000000
      |00026162020200000000000000fbd62e5f64f1536510010000001f000000d201000000006500
      |000000000000345e071964f153651b0100000028000000fa0100000000676f6c64656e2d7a6f
      |6f2e303030303031907cf84964f153656301000000210000001b020000000001020304667574
      |75726553308db864f153650301000000170000003202000000005d895af0""".stripMargin

  /** A healthy txn, then an INCIDENT event (type 26, LOST_EVENTS) —
    * the master's own "events may be missing" marker — then another
    * txn. No reader may claim continuity past the incident. */
  private val IncidentHex =
    """fe62696e64f153650f010000007a0000007e00000000000400382e302e333600000000000000
      |0000000000000000000000000000000000000000000000000000000000000000000000000064
      |f1536513000d0008001200040404041200005400041a08000000080808020000000a0a0a2a2a
      |0012340000000001369a4a9364f15365210100000041000000bf0000000000003e11fa4771ca
      |11e19e33c80aa94295620100000000000000020000000000000000010000000000000060c997
      |2664f15365130100000037000000f6000000000005000000000001000267640001740002080f
      |02140002010100040502696401769cc2379264f153651e01000000380000002e010000000005
      |0000000000010002000203000100000000000000026162020200000000000000db735b9c64f1
      |536510010000001f0000004d010000000065000000000000004c3952aa64f153651a01000000
      |2500000072010000000001000b4c4f53545f4556454e54534878ecbe64f15365210100000041
      |000000b30100000000003e11fa4771ca11e19e33c80aa9429562020000000000000002010000
      |00000000000200000000000000f531dd9a64f15365130100000037000000ea01000000000500
      |0000000001000267640001740002080f02140002010100040502696401763321a44b64f15365
      |1e01000000380000002202000000000500000000000100020002030001000000000000000261
      |62020200000000000000d20c3d2964f1536510010000001f0000004102000000006600000000
      |0000004cc3e2b3""".stripMargin

  test("INCIDENT event (LOST_EVENTS): the scan fails loud, continuity is never claimed") {
    val dir = materialize(IncidentHex)
    val ex = intercept[Exception] { read(dir).collect() }
    val all = messages(ex).mkString(" | ")
    assert(all.contains("INCIDENT") && all.contains("LOST_EVENTS"), all)
  }

  /** A GTID scope can end WITHOUT an XID: DDL is GTID→QUERY(ALTER …).
    * Here gtid 1's DDL is followed by an UNRECOGNIZED identity event
    * (type 45 — an unknown FUTURE type in the identity-family slot
    * range, skipped as control; type 42 itself decodes since round 11)
    * and then target rows — without the QUERY-closes-scope rule those
    * rows would stamp the DDL's stale gno 1; they must fail loud. */
  private val DdlThenUnknownIdentityHex =
    """fe62696e64f153650f010000007a0000007e00000000000400382e302e333600000000000000
      |0000000000000000000000000000000000000000000000000000000000000000000000000064
      |f1536513000d0008001200040404041200005400041a08000000080808020000000a0a0a2a2a
      |0012340000000001369a4a9364f15365210100000041000000bf0000000000003e11fa4771ca
      |11e19e33c80aa94295620100000000000000020000000000000000010000000000000060c997
      |2664f1536502010000004500000004010000000007000000000000000200000000676400414c
      |544552205441424c4520742041444420434f4c554d4e207720494e54a1a9ab1164f153652d01
      |000000390000003d0100000000003e11fa4771ca11e19e33c80aa942956208736f6d65746167
      |000200000000000000f4541e4864f15365130100000037000000740100000000050000000000
      |01000267640001740002080f0214000201010004050269640176a9a0677f64f153651e010000
      |0038000000ac0100000000050000000000010002000203000100000000000000026162020200
      |000000000000781a8d47""".stripMargin

  test("DDL closes the GTID scope: rows after an unrecognized identity fail loud") {
    val dir = materialize(DdlThenUnknownIdentityHex)
    val ex = intercept[Exception] { read(dir).collect() }
    val all = messages(ex).mkString(" | ")
    assert(all.contains("no live transaction identity"), all)
  }

  /** The positive twin: after gtid 1's DDL closes its scope, a
    * RECOGNIZED GTID(2) reopens — QUERY(BEGIN), rows, and a
    * non-transactional-engine QUERY(COMMIT) close. The rows decode
    * with gno 2, and the trailing COMMIT (not an XID) leaves no stale
    * identity behind. */
  private val DdlThenNewIdentityHex =
    """fe62696e64f153650f010000007a0000007e00000000000400382e302e333600000000000000
      |0000000000000000000000000000000000000000000000000000000000000000000000000064
      |f1536513000d0008001200040404041200005400041a08000000080808020000000a0a0a2a2a
      |0012340000000001369a4a9364f15365210100000041000000bf0000000000003e11fa4771ca
      |11e19e33c80aa94295620100000000000000020000000000000000010000000000000060c997
      |2664f1536502010000004500000004010000000007000000000000000200000000676400414c
      |544552205441424c4520742041444420434f4c554d4e207720494e54a1a9ab1164f153652101
      |00000041000000450100000000003e11fa4771ca11e19e33c80aa94295620200000000000000
      |0201000000000000000200000000000000201dfa1464f1536502010000002c00000071010000
      |000007000000000000000200000000676400424547494e4c04ab9d64f1536513010000003700
      |0000a8010000000005000000000001000267640001740002080f021400020101000405026964
      |0176c11b9c3064f153651e0100000038000000e0010000000005000000000001000200020300
      |01000000000000000261620202000000000000004ed9d97164f1536502010000002d0000000d
      |020000000007000000000000000200000000676400434f4d4d495461c8436e""".stripMargin

  test("recognized GTID after a DDL reopens the scope; QUERY(COMMIT) closes it") {
    val dir = materialize(DdlThenNewIdentityHex)
    val rows = read(dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getInt(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(rows == Seq(
      (1L, "ab", CdcSchema.Op.Insert, 2L),
      (2L, null, CdcSchema.Op.Insert, 2L)))
  }

  test("ROWS_QUERY passthrough: rowsQuery=true surfaces the authored statement") {
    // the zoo's ROWS_QUERY event (authored bytes, NOT this repo's
    // writer) precedes the transaction's WRITE rows — with the option
    // on, every row of that statement carries its exact text
    val dir = materialize(EventZooHex)
    val rows = spark.read.format("binlogcdc")
      .option("indexFile", s"$dir/binlog.index")
      .option("database", "gd").option("table", "t")
      .option("binlogFormat", "mysql")
      .option("rowsQuery", "true")
      .load()
      .select("id", CdcSchema.QueryCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(rows == Seq(
      (1L, "UPDATE t SET v = 'cd' WHERE id = 1"),
      (2L, "UPDATE t SET v = 'cd' WHERE id = 1")))
  }

  test("event zoo: control events and unknown types skip, rows decode around them") {
    val dir = materialize(EventZooHex)
    val rows = read(dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getInt(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(rows == Seq(
      (1L, "ab", CdcSchema.Op.Insert, 1L),
      (2L, null, CdcSchema.Op.Insert, 1L)))
  }
}
