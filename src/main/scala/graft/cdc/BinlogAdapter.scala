package graft.cdc

import org.apache.spark.sql.types.StructType

/** The binlog-format adapter seam. The engine's scan, pushdown,
  * partition-planning, streaming-offset, and schema-synthesis layers
  * consume ONLY this interface's vocabulary, so a wire format is a
  * pluggable decoder, not an engine fork. Two implementations exist:
  * [[GcdcAdapter]] (the self-contained test format) and
  * [[MysqlBinlogAdapter]] (the REAL MySQL binlog v4 byte layout,
  * decoded pure-JVM in MysqlBinlog.scala — no client library). The
  * shared vocabulary:
  *
  *   - [[CdcCodec.RawEvent]]: (type, timestamp, payload bytes, byte
  *     offsets). MySQL's 19-byte v4 event header carries exactly these
  *     fields (type_code, timestamp, event_length/next_position —
  *     reference binlog_table_reader.cc:151-154); `pos`/`endPos` are
  *     the resume/admission offsets, identical in both formats.
  *   - [[RawEventSource]]: sequential event iteration over one log
  *     file after a header check (GCDC: magic+version; MySQL: the
  *     4-byte 0xfe 'b''i''n' magic + the FORMAT_DESCRIPTION event).
  *   - [[CdcRowDecoder]]: stateful event→rows decode carrying the
  *     TABLE_MAP registry and transaction GTID across events
  *     (reference :393-416); a MySQL decoder implements the per-type
  *     value decode via the TABLE_MAP column-type/metadata arrays
  *     (`Field::unpack`, reference :151-154) where GCDC reads its
  *     self-describing layout. The column-pruning mask (`needed`) and
  *     drift-epoch semantics are format-independent contracts.
  *   - index enumeration: `mysql-bin.index` and GCDC's `binlog.index`
  *     share the one-path-per-line format (reference :12-19) —
  *     [[CdcCodec.readIndex]] already parses both.
  *
  * Each format plugs in as ONE [[BinlogFormatAdapter]] implementation:
  * no partition planner, pushdown rule, or streaming-offset change.
  * The `binlogFormat` source option selects the adapter by name (see
  * [[BinlogFormats]]).
  *
  * '''The production deployment seam — live replication-protocol
  * ingestion.''' Both the reference and this engine are FILE-based:
  * they read binlog files someone ships (the reference from inside
  * mysqld's own datadir, this engine from any Hadoop-addressable root
  * — see [[LogFs]]). The mode a production CDC user asks for first is
  * LIVE ingestion: connect to mysqld as a replica — `COM_REGISTER_SLAVE`
  * + `COM_BINLOG_DUMP_GTID` over the client protocol — and consume the
  * event stream the server pushes, no file shipping at all (the
  * Debezium deployment shape). That mode is a FOURTH implementation of
  * exactly this interface, not an engine change: the wire frames the
  * replica receives are the same v4 events [[MysqlBinlog]] already
  * decodes (each prefixed by one status byte), so `open` becomes a
  * socket-backed [[RawEventSource]], `readIndex`/`filesMeta` enumerate
  * server binlogs via `SHOW BINARY LOGS` / the dump position instead
  * of an index file, `lastCompleteOffset` is the stream's
  * acknowledged position, and the row decode is reused verbatim.
  * The PROTOCOL layer of that plug is implemented and spec-pinned:
  * [[MysqlReplica]] speaks the public client/server wire (protocol-41
  * handshake, `mysql_native_password` scramble, `COM_REGISTER_SLAVE`,
  * `COM_BINLOG_DUMP_GTID`) and returns the dump as a
  * [[RawEventSource]] through the SAME [[MysqlBinlog.EventReader]] the
  * file path uses — byte-for-byte parity with the file reader is
  * pinned against the loopback [[FakeMysqld]] stand-in. What remains
  * is deployment work (no mysqld exists in this offline build
  * environment): pointing it at a real endpoint and the DSv2 adapter
  * wiring above; see DESIGN.md "The replication-protocol seam".
  */
trait RawEventSource extends Iterator[CdcCodec.RawEvent] with AutoCloseable

/** Stateful event→row decode for one (db, table) target; see
  * [[CdcCodec.RowDecoder]] for the reference semantics (TABLE_MAP
  * registry, GTID tracking, pruning mask, drift epochs). */
trait CdcRowDecoder {
  def decode(ev: CdcCodec.RawEvent): Seq[CdcCodec.CdcRow]
}

/** One pluggable binlog format: index enumeration + per-file event
  * iteration + stateful row decode, plus the format-dependent offsets
  * the scan/streaming layers need (file header length, row-event type
  * test, torn-tail boundary, schema inference). */
trait BinlogFormatAdapter {
  /** Byte offset of the first event (GCDC: 8-byte magic+version;
    * MySQL: the 4-byte 0xfe 'b' 'i' 'n' magic). */
  def headerLen: Long
  def readIndex(indexFile: String): Seq[String]
  def open(path: String): RawEventSource
  def decoder(targetDb: String, targetTable: String,
      needed: Int => Boolean = _ => true,
      expectedSchema: Option[StructType] = None,
      driftEpochs: Boolean = false): CdcRowDecoder
  /** Does this event type carry row images (vs control state)? The
    * partition reader uses this to skip out-of-range row events without
    * decoding while still replaying control events for state. */
  def isRowEvent(tpe: Byte): Boolean
  /** Offset of the last COMPLETE event — the streaming admission
    * boundary (a producer's in-flight append may leave a torn tail). */
  def lastCompleteOffset(path: String): Long
  /** Newest matching TABLE_MAP schema for DSv2 schema inference. */
  def inferSourceSchema(indexFile: String, db: String, table: String): Option[StructType]
  /** Per-file pruning metadata for the WHOLE file list (one call — the
    * planner must not pay per-file I/O twice), aligned with `files`.
    * None = unprunable (conservative keep). GCDC serves this from its
    * log-close sidecars; MySQL derives gtid bounds from consecutive
    * files' PREVIOUS_GTIDS events — the format's OWN metadata, so
    * gtid-range scans prune files on a real binlog with nothing extra
    * written. */
  def filesMeta(files: Seq[String]): Seq[Option[CdcCodec.FileMeta]]
  /** (db, table) pairs for catalog listing. Both formats re-emit
    * TABLE_MAP per transaction, so the NEWEST file names every table
    * still receiving changes — listing deliberately reads ONE file,
    * bounded I/O at any log size (a 100 TB log lists as fast as a 100
    * MB one). GCDC upgrades to the COMPLETE set when every file has a
    * v2 sidecar (per-table stats maps — tiny reads, no log decode).
    * `loadTable` stays exact either way: schema inference walks
    * newest-first until the table's TABLE_MAP is found. */
  def listTables(indexFile: String): Seq[(String, String)]
}

/** Registry resolving the `binlogFormat` source option — a NAME ships
  * to executors (plain string serialization) and resolves locally, so
  * adapter objects never need to be serializable themselves. */
object BinlogFormats {
  def forName(name: String): BinlogFormatAdapter = name match {
    case "gcdc" => GcdcAdapter
    case "mysql" => MysqlBinlogAdapter
    case "mariadb" => MariaDbAdapter
    case other => throw new IllegalArgumentException(
      s"binlogcdc: unknown binlogFormat '$other' (supported: gcdc, mysql, mariadb)")
  }
}

/** Format-agnostic fixture producer interface: the CDC fixtures write
  * one event storyline through either format's writer, so the same
  * DuckDB oracle checks both decoders (see CdcFixture). Timestamps are
  * epoch millis; value conventions are the engine-internal ones
  * (micros-Long timestamps, epoch-day Int dates, String/UTF8String). */
trait FixtureSink extends AutoCloseable {
  /** Declare the set of transactions executed BEFORE this log file
    * (sid → disjoint sorted [start, end) gno intervals) — MySQL's
    * PREVIOUS_GTIDS event, written by mysqld at every binlog's start.
    * Formats without the concept ignore it (GCDC's sidecars carry
    * richer bounds already). Call before any other event. */
  def previousGtids(executed: Map[String, Seq[(Long, Long)]]): Unit = ()
  def tableMap(tsMs: Long, tableId: Long, db: String, table: String,
      schema: StructType): Unit
  def gtid(tsMs: Long, gno: Long, sourceId: String): Unit
  def writeRows(tsMs: Long, tableId: Long, schema: StructType,
      rows: Seq[Array[Any]]): Unit
  def deleteRows(tsMs: Long, tableId: Long, schema: StructType,
      rows: Seq[Array[Any]]): Unit
  def updateRows(tsMs: Long, tableId: Long, schema: StructType,
      pairs: Seq[(Array[Any], Array[Any])]): Unit
}

/** The built-in GCDC format behind the adapter interface. */
object GcdcAdapter extends BinlogFormatAdapter {
  override def headerLen: Long = CdcCodec.HeaderLen.toLong
  override def readIndex(indexFile: String): Seq[String] =
    CdcCodec.readIndex(indexFile)
  override def open(path: String): RawEventSource =
    new CdcCodec.EventReader(path)
  override def decoder(targetDb: String, targetTable: String,
      needed: Int => Boolean, expectedSchema: Option[StructType],
      driftEpochs: Boolean): CdcRowDecoder =
    new CdcCodec.RowDecoder(targetDb, targetTable, needed,
      expectedSchema, driftEpochs)
  override def isRowEvent(tpe: Byte): Boolean =
    tpe == CdcCodec.EventType.WriteRows ||
      tpe == CdcCodec.EventType.UpdateRows ||
      tpe == CdcCodec.EventType.DeleteRows
  override def lastCompleteOffset(path: String): Long =
    CdcCodec.lastCompleteOffset(path)
  override def inferSourceSchema(indexFile: String, db: String,
      table: String): Option[StructType] =
    CdcCodec.inferSourceSchema(indexFile, db, table)
  override def filesMeta(files: Seq[String]): Seq[Option[CdcCodec.FileMeta]] =
    files.map(CdcCodec.readMeta)
  override def listTables(indexFile: String): Seq[(String, String)] =
    CdcCodec.listTables(indexFile)
}
