package graft.cdc

import org.apache.spark.sql.types.StructType

/** The REAL-binlog adapter seam (SURVEY.md §7.0/§7.4 declares the MySQL
  * wire format a non-goal — no client/driver libraries exist offline;
  * DESIGN.md "Real-binlog adapter seam" documents the mapping). The
  * engine's scan, pushdown, partition-planning, streaming-offset, and
  * schema-synthesis layers consume ONLY this interface's vocabulary:
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
  * So a `mysql-binlog-connector`-style decoder plugs in as ONE
  * [[BinlogFormatAdapter]] implementation: no partition planner,
  * pushdown rule, or streaming-offset change — the non-goal is an
  * adapter away, not a rewrite. [[GcdcAdapter]] below is the engine's
  * own format expressed through the same interface, which keeps the
  * seam honest at compile time (the traits are implemented, not
  * aspirational).
  */
trait RawEventSource extends Iterator[CdcCodec.RawEvent] with AutoCloseable

/** Stateful event→row decode for one (db, table) target; see
  * [[CdcCodec.RowDecoder]] for the reference semantics (TABLE_MAP
  * registry, GTID tracking, pruning mask, drift epochs). */
trait CdcRowDecoder {
  def decode(ev: CdcCodec.RawEvent): Seq[CdcCodec.CdcRow]
}

/** One pluggable binlog format: index enumeration + per-file event
  * iteration + stateful row decode. */
trait BinlogFormatAdapter {
  def readIndex(indexFile: String): Seq[String]
  def open(path: String): RawEventSource
  def decoder(targetDb: String, targetTable: String,
      needed: Int => Boolean = _ => true,
      expectedSchema: Option[StructType] = None,
      driftEpochs: Boolean = false): CdcRowDecoder
}

/** The built-in GCDC format behind the adapter interface. */
object GcdcAdapter extends BinlogFormatAdapter {
  override def readIndex(indexFile: String): Seq[String] =
    CdcCodec.readIndex(indexFile)
  override def open(path: String): RawEventSource =
    new CdcCodec.EventReader(path)
  override def decoder(targetDb: String, targetTable: String,
      needed: Int => Boolean, expectedSchema: Option[StructType],
      driftEpochs: Boolean): CdcRowDecoder =
    new CdcCodec.RowDecoder(targetDb, targetTable, needed,
      expectedSchema, driftEpochs)
}
