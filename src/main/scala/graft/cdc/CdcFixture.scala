package graft.cdc

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._

/** Deterministic CDC log derived from the driver's `orders` table, so the
  * custom source itself is DuckDB-verifiable: the exact event stream is
  * reconstructable in ANSI SQL over orders.parquet (see queries/Cdc.scala).
  *
  * Event storyline (all indices over orders sorted by o_orderkey,
  * idx = ROW_NUMBER()-1):
  *  - inserts: batches of 10 consecutive orders per transaction
  *    (multi-row WRITE_ROWS — regression surface for reference defect #1),
  *    gno = idx / 10;
  *  - updates: every order with o_orderkey % 10 == 0 gets
  *    o_totalprice *= 1.1 (gno = 1_000_000 + idx);
  *  - deletes: every order with o_orderkey % 100 == 0 is deleted
  *    (gno = 2_000_000 + idx; row image carries the updated price, since
  *    %100==0 implies %10==0);
  *  - event time = 2024-01-01T00:00:00Z + gno seconds;
  *  - a second interleaved table (graft.audit) exercises the
  *    table-identity filter (binlog_table_reader.cc:178) and the
  *    interleaved-TABLE_MAP regression (reference defect #2);
  *  - the log rotates across 4 files (index file lists them), each file
  *    self-contained (TABLE_MAP re-emitted, txns never span files).
  */
object CdcFixture {
  val Db = "graft"
  val Table = "orders"
  val BaseMs: Long = 1704067200000L // 2024-01-01T00:00:00Z
  val TableId = 1L
  val AuditTableId = 2L
  val NotesTableId = 3L
  val NumFiles = 4
  /** The single-source log's server identity (appears as `__source_id`
    * on every row; constant in the oracles). */
  val SourceId = "11111111-1111-1111-1111-111111111111"
  /** The multi-source log's two servers — their gno sequences COLLIDE
    * numerically (both start at 0), which is the whole point of cdc19. */
  val SourceA = "aaaaaaaa-0000-0000-0000-000000000001"
  val SourceB = "bbbbbbbb-0000-0000-0000-000000000002"

  private val cache = mutable.Map.empty[String, String]
  private val cacheMs = mutable.Map.empty[String, String]
  private val cacheDr = mutable.Map.empty[String, String]
  private val cacheMy = mutable.Map.empty[String, String]
  private val cacheMyDec = mutable.Map.empty[String, String]
  private val cacheMyZ = mutable.Map.empty[String, String]
  private val cacheMyU = mutable.Map.empty[String, String]
  private val cacheMyC = mutable.Map.empty[String, String]
  private val cacheMyJ = mutable.Map.empty[String, String]
  private val cacheMyE = mutable.Map.empty[String, String]
  private val cacheMyY = mutable.Map.empty[String, String]
  private val cacheMyL = mutable.Map.empty[String, String]
  private val cacheMyF = mutable.Map.empty[String, String]
  private val cacheMyM = mutable.Map.empty[String, String]
  private val cacheMyDt = mutable.Map.empty[String, String]
  private val cacheMyEm = mutable.Map.empty[String, String]
  private val cacheMyRi = mutable.Map.empty[String, String]
  private val cacheMyDl = mutable.Map.empty[String, String]
  private val cacheMyQ = mutable.Map.empty[String, String]
  private val cacheMyTg = mutable.Map.empty[String, String]
  private val cacheMyPj = mutable.Map.empty[String, String]
  private val cacheMaria = mutable.Map.empty[String, String]
  private val cacheMariaZ = mutable.Map.empty[String, String]
  private val cacheMyNb = mutable.Map.empty[String, String]
  private val cacheMyDr = mutable.Map.empty[String, String]

  /** Shared idempotent-generation shape: `<tmpdir>/<prefix>-<sfDir
    * hash>` with a `_SUCCESS` marker guarding regeneration; returns the
    * index file path. One implementation so the three log families
    * can't drift in their cache/marker layout (the verify recipe
    * enumerates the prefixes — keep it in sync when adding one). */
  private def ensureLog(cache: mutable.Map[String, String], prefix: String,
      sfDir: String)(generate: String => Unit): String = synchronized {
    cache.getOrElseUpdate(sfDir, {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val dir = Paths.get(sys.props("java.io.tmpdir"), s"$prefix-$tag")
      val index = dir.resolve("binlog.index")
      val done = dir.resolve("_SUCCESS")
      if (!Files.exists(done)) {
        Files.createDirectories(dir)
        generate(dir.toString)
        Files.createFile(done)
      }
      index.toString
    })
  }

  /** Idempotently generate the CDC log for sfDir; returns index file path. */
  def ensure(spark: SparkSession, sfDir: String): String =
    // v4: sidecars register mappings at TABLE_MAP time (rows=0 c-lines)
    ensureLog(cache, "graft-cdc4", sfDir)(
      generate(spark, sfDir, _, p => new CdcCodec.LogWriter(p)))

  /** The SAME event storyline written as a REAL MySQL binlog v4 (CRC32
    * checksummed, FULL row metadata) — so the MysqlBinlog decoder is
    * verified by the same DuckDB oracle as the GCDC one (cdc21-cdc23).
    * No sidecars: a real mysqld writes none, so sidecar-served pushdowns
    * (aggregates, OFFSET, file pruning) honestly decline on this log. */
  def ensureMysql(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMy, "graft-cdcmy", sfDir)(
      generate(spark, sfDir, _, p => new MysqlBinlog.Writer(p, checksum = true)))

  /** The SAME storyline with `binlog_row_metadata=MINIMAL` — the
    * mysqld PRODUCTION DEFAULT: no column names and no ENUM/SET member
    * lists in the TABLE_MAP, but SIGNEDNESS (like charset/geometry
    * type) IS still logged — only names, label lists, and PK info are
    * FULL-only. Readers must supply an explicit schema (positional
    * type matching); cdc34 proves the whole DSv2 path over it against
    * the same oracle as cdc21. */
  def ensureMysqlMinimal(spark: SparkSession, sfDir: String): String =
    // v2: SIGNEDNESS TLV present under MINIMAL (matches real mysqld)
    ensureLog(cacheMyM, "graft-cdcmym2", sfDir)(
      generate(spark, sfDir, _, p =>
        new MysqlBinlog.Writer(p, checksum = true, fullMetadata = false)))

  /** The SAME storyline again with `binlog_transaction_compression=ON`
    * semantics: every transaction's TABLE_MAP/rows events ride inside
    * one zstd TRANSACTION_PAYLOAD event (MySQL 8.0.20+). cdc25 proves
    * the compressed wire decodes to the identical oracle result. */
  def ensureMysqlZstd(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyZ, "graft-cdcmyz", sfDir)(
      generate(spark, sfDir, _, p =>
        new MysqlBinlog.Writer(p, checksum = true, compressTxns = true)))

  /** MySQL-format log whose table is decimal-typed — NEWDECIMAL on the
    * real wire (packed base-10^9 groups, sign-complemented bytes; the
    * layout the reference reads via Field_new_decimal::unpack,
    * binlog_table_reader.cc:151-157). Every column is a deterministic
    * SQL cast of orders, so the cdc24 oracle recomputes it in DuckDB and
    * hash-compares decoded values: five (precision, scale) shapes across
    * the partial/full group boundaries, a negative column, and a
    * nullable one. Inserts only, batches of 100, gno = batch index. */
  def ensureMysqlDecimal(spark: SparkSession, sfDir: String): String =
    // v2: integer-derived values (no double→decimal rounding in the loop)
    ensureLog(cacheMyDec, "graft-cdcmydec2", sfDir)(
      generateMysqlDecimal(spark, sfDir, _))

  val DecimalTable = "decorders"
  val DecimalTableId = 9L

  /** The decimal column derivations, shared verbatim with the cdc24
    * oracle SQL (Spark and DuckDB both evaluate them). Every value is
    * built from INTEGER arithmetic and an exact string→decimal cast, so
    * no engine's double→decimal rounding participates; the five
    * (precision, scale) shapes still cross the base-10^9 packed-group
    * boundaries of the NEWDECIMAL wire layout. */
  val DecimalDerivations: Seq[String] = Seq(
    "o_orderkey",
    "CAST(o_custkey AS DECIMAL(9,0)) AS cust",
    "CASE WHEN o_orderkey % 7 = 3 THEN NULL ELSE " +
      "CAST(CAST(o_orderkey * 97 + 11 AS STRING) || '.' || " +
      "lpad(CAST(o_orderkey % 100 AS STRING), 2, '0') AS DECIMAL(12,2)) END AS price",
    "CAST('-' || CAST(o_orderkey + 5 AS STRING) || '.' || " +
      "lpad(CAST(o_orderkey * 7 % 1000000 AS STRING), 6, '0') AS DECIMAL(18,6)) AS neg",
    "CAST(CAST(o_orderkey AS STRING) || '.' || " +
      "lpad(CAST(o_orderkey * 31 % 1000000000 AS STRING), 9, '0') AS DECIMAL(20,9)) AS fine",
    "CAST(CAST(o_orderkey * 1000003 AS STRING) || '.' || " +
      "lpad(CAST(o_orderkey * 13 % 1000000 AS STRING), 6, '0') AS DECIMAL(28,6)) AS wide",
    "o_orderpriority AS prio")

  /** Output projection shared by the cdc24 Spark query and oracle: every
    * decimal column leaves the comparison as its canonical full-scale
    * string (Spark `Decimal.toString` ≡ DuckDB decimal→VARCHAR for
    * values with a nonzero integer part), because the driver's hash
    * canonicalization of DECIMAL at precision > 18 is
    * representation-sensitive across engines even when values agree.
    * The wire decode itself still round-trips typed decimals — the cast
    * sits on top of the decoded column. */
  val DecimalOutputCols: Seq[String] = Seq(
    "o_orderkey",
    "CAST(cust AS STRING) AS cust",
    "CAST(price AS STRING) AS price",
    "CAST(neg AS STRING) AS neg",
    "CAST(fine AS STRING) AS fine",
    "CAST(wide AS STRING) AS wide",
    "prio")

  private def generateMysqlDecimal(spark: SparkSession, sfDir: String,
      outDir: String): Unit =
    generateDerivedMysql(spark, sfDir, outDir, DecimalDerivations,
      DecimalTable, DecimalTableId, Set.empty)

  /** UNSIGNED columns on the real wire: the SIGNEDNESS TLV marks them,
    * values decode into the widened Spark surface (u8→SMALLINT,
    * u16→INT, u32→BIGINT, u64→DECIMAL(20,0)). u32/u64 values sit near
    * their type maxima so the sign bit of the narrow encoding is
    * exercised, and u16 is nullable. cdc26's oracle recomputes the same
    * derivations. */
  def ensureMysqlUnsigned(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyU, "graft-cdcmyu", sfDir)(
      generateDerivedMysql(spark, sfDir, _, UnsignedDerivations,
        UnsignedTable, UnsignedTableId, Set("u8", "u16", "u32", "u64")))

  val UnsignedTable = "uorders"
  val UnsignedTableId = 11L

  /** CHAR columns on the real wire (MYSQL_TYPE_STRING, the TABLE_MAP
    * metadata quirk that folds the length's high bits into the type
    * byte): CHAR(1), CHAR(15), and a >255-byte CHAR exercising the
    * folded-length encoding. cdc27's oracle recomputes the same
    * derivations. */
  def ensureMysqlChar(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyC, "graft-cdcmyc", sfDir)(
      generateDerivedMysql(spark, sfDir, _, CharDerivations,
        CharTable, CharTableId, Set.empty,
        Map("status_c" -> 1, "prio_c" -> 15, "wide_c" -> 300)))

  val CharTable = "corders"
  val CharTableId = 13L

  val CharDerivations: Seq[String] = Seq(
    "o_orderkey",
    "o_orderstatus AS status_c",
    "CASE WHEN o_orderkey % 9 = 4 THEN NULL ELSE o_orderpriority END AS prio_c",
    "rpad(o_orderpriority, 300, 'x') AS wide_c")

  /** JSON columns on the real wire (MYSQL_TYPE_JSON: the binary JSON
    * document layout of json_binary.h, decoded to canonical compact
    * text). The constructed text is ALREADY canonical — object keys
    * pre-sorted the way MySQL sorts them (length, then bytes), compact
    * separators, shortest-form numbers — so writer-encode → binary →
    * decoder-emit is the identity and DuckDB rebuilds the exact string.
    * Exercises: nested object/array, empty object/array, int16-inline
    * array elements, int32/int64 members, doubles, a >127-byte string
    * (2-byte varlen), negative ints, literals, scalar roots (int and
    * string), array roots, and a nullable JSON column. */
  def ensureMysqlJson(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyJ, "graft-cdcmyj", sfDir)(
      generateDerivedMysql(spark, sfDir, _, JsonDerivations,
        JsonTable, JsonTableId, Set.empty,
        jsonCols = Set("jdoc", "jsc", "jarr")))

  val JsonTable = "jorders"
  val JsonTableId = 15L

  val JsonDerivations: Seq[String] = Seq(
    "o_orderkey",
    "CASE WHEN o_orderkey % 7 = 3 THEN NULL ELSE " +
      "'{\"k\":' || o_orderkey || ',\"st\":\"' || o_orderstatus || " +
      "'\",\"big\":' || (o_orderkey * 1000003) || ',\"pad\":\"' || " +
      "rpad(o_orderpriority, 140, 'x') || '\",\"meta\":{\"d\":' || " +
      "CASE WHEN o_orderkey % 2 = 0 THEN '0.5' ELSE '1.5' END || " +
      "',\"em\":{},\"pri\":\"' || o_orderpriority || '\"},\"tags\":[' || " +
      "(o_orderkey % 3) || ',true,false,null,[]]}' END AS jdoc",
    "CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey % 100 AS STRING) " +
      "ELSE '\"s' || (o_orderkey % 10) || '\"' END AS jsc",
    "'[' || (o_orderkey % 5) || ',\"a\",null,' || (0 - (o_orderkey % 50) - 1) || " +
      "',{\"x\":' || (o_orderkey % 9) || '}]' AS jarr")

  /** ENUM/SET columns on the real wire: values travel as 1/2-byte
    * member indexes (ENUM) and a member bitmask (SET) inside a STRING
    * slot whose metadata carries the real type; the member lists ride
    * the ENUM/SET_STR_VALUE optional-metadata TLVs, so FULL-metadata
    * readers surface label strings. cdc30's oracle recomputes the same
    * label/membership strings from orders directly. */
  def ensureMysqlEnum(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyE, "graft-cdcmye", sfDir)(
      generateDerivedMysql(spark, sfDir, _, EnumDerivations,
        EnumTable, EnumTableId, Set.empty,
        enumCols = Map(
          "status_e" -> EnumStatusMembers,
          "prio_e" -> EnumPrioMembers),
        setCols = Map("flags_s" -> SetFlagMembers)))

  /** The SAME ENUM/SET storyline under `binlog_row_metadata=MINIMAL`
    * (the mysqld production default): no COLUMN_NAME and no
    * ENUM/SET_STR_VALUE TLVs on the wire, so the decoder surfaces the
    * documented RAW value — the 1-based member index (INT) for ENUM,
    * the member bitmask (BIGINT) for SET. cdc36's oracle recomputes
    * exactly those integers from orders. */
  def ensureMysqlEnumMinimalMeta(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyEm, "graft-cdcmyem", sfDir)(
      generateDerivedMysql(spark, sfDir, _, EnumDerivations,
        EnumTable, EnumTableId, Set.empty,
        enumCols = Map(
          "status_e" -> EnumStatusMembers,
          "prio_e" -> EnumPrioMembers),
        setCols = Map("flags_s" -> SetFlagMembers),
        fullMetadata = false))

  /** A `binlog_row_image=MINIMAL` log (the at-scale production setting):
    * full-image INSERTs, then UPDATEs whose before images carry only the
    * PK and whose after images carry the PK + the changed column, then
    * DELETEs whose images carry only the PK. cdc37 reads it with a
    * PK+envelope projection — exactly what the thinned images carry —
    * and hash-checks the full op/gtid storyline against DuckDB; any
    * wider projection fails loud at the decoder (GoldenPolicySpec /
    * CdcHardeningSpec pin that direction). */
  def ensureMysqlMinimalImage(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyRi, "graft-cdcmyri", sfDir)(
      generateMinimalImage(spark, sfDir, _))

  /** A log with the FULL production statement framing: every DML
    * transaction is GTID → QUERY(BEGIN) → TABLE_MAP → rows → XID (the
    * exact event chain mysqld writes), and DDL statements — which run
    * in their OWN GTID scope with NO XID — are interleaved between
    * transactions. Pins the identity-scope rules end-to-end through
    * the driver oracle: BEGIN must NOT close the scope (rows follow
    * it), each DDL consumes its gno (no DDL gno may ever stamp a
    * row), and XID closes cleanly before the next GTID. cdc38 reads
    * the storyline; the fail-loud directions (unrecognized identity
    * after a DDL) are golden-pinned in GoldenPolicySpec. */
  def ensureMysqlDdlScope(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyDl, "graft-cdcmydl", sfDir)(
      generateDdlScope(spark, sfDir, _))

  val DdlScopeTable = "dorders"
  val DdlScopeTableId = 29L

  /** A log from a MySQL 8.3+/8.4 server with GTID TAGS in use: insert
    * transactions rotate through three identity streams — untagged,
    * `:etl`, `:repair` — each with its OWN gno counter (gno uniqueness
    * is per (uuid, tag)); the update phase runs entirely under the
    * `repair` tag, the "maintenance traffic tagged out-of-band" pattern
    * tags exist for. cdc43 reads the storyline: every row's
    * __source_id must carry `uuid:tag` (bare uuid for untagged) and
    * per-stream gnos must not collide across streams. The log ROTATES
    * (after insert batch 30 where the SF has one, and before the update
    * phase), each file opening with the tagged-format PREVIOUS_GTIDS
    * an 8.3+ server writes — cdc49 reads the same storyline with
    * `startingGtid`, proving prefix files prune off the tagged
    * metadata. */
  def ensureMysqlTagged(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyTg, "graft-cdcmytg2", sfDir)(
      generateTagged(spark, sfDir, _))

  val TaggedTable = "gorders"
  val TaggedTableId = 33L

  /** A log written with `binlog_row_value_options=PARTIAL_JSON`: the
    * insert phase carries full JSON documents; the update phase ships
    * PARTIAL_UPDATE_ROWS (type 39) events whose after images encode the
    * JSON column as a Json_diff_vector — REPLACE of a scalar and a
    * nested member, INSERT of a new member, REMOVE of a member, and
    * array-element REPLACE/INSERT — applied by the reader against the
    * before image. cdc44 reads the storyline and extracts fields from
    * both images; the oracle recomputes each extracted value from
    * orders, so a mis-applied (or silently skipped) diff
    * hash-mismatches. */
  def ensureMysqlPartialJson(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyPj, "graft-cdcmypj", sfDir)(
      generatePartialJson(spark, sfDir, _))

  val PartialJsonTable = "pjorders"
  val PartialJsonTableId = 35L

  private def generatePartialJson(spark: SparkSession, sfDir: String,
      outDir: String): Unit = {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "o_orderstatus", "o_orderpriority")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = true),
      StructField("jdoc", StringType, nullable = true)))
    val src = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    def doc(k: Long, st: String, pri: String): String =
      s"""{"k":$k,"st":"$st","cnt":${k % 500},"meta":{"pri":"$pri","d":${
        if (k % 2 == 0) "0.5" else "1.5"}},"tags":[${k % 3},${k % 7}]}"""
    val w = new MysqlBinlog.Writer(s"$outDir/binlog.000000", checksum = true,
      jsonCols = Set("jdoc"))
    try {
      def txn(g: Long)(body: Long => Unit): Unit = {
        val ts = BaseMs + g * 1000L
        w.gtid(ts, g, SourceId)
        w.query(ts, Db, "BEGIN")
        w.tableMap(ts, PartialJsonTableId, Db, PartialJsonTable, schema)
        body(ts)
        w.xid(ts, g)
      }
      src.grouped(100).zipWithIndex.foreach { case (batch, i) =>
        txn(i.toLong)(ts => w.writeRows(ts, PartialJsonTableId, schema,
          batch.toSeq.map { case (k, st, pri) =>
            Array[Any](k, doc(k, st, pri))
          }))
      }
      val upd = src.filter(_._1 % 3 == 0)
      upd.grouped(100).zipWithIndex.foreach { case (batch, b) =>
        txn(100000L + b)(ts =>
          w.updateRowsPartialJson(ts, PartialJsonTableId, schema,
            batch.toSeq.map { case (k, st, pri) =>
              (Array[Any](k, doc(k, st, pri)),
                Array[Any](k, null), // jdoc rides the diff vector
                Map("jdoc" -> Seq(
                  (0, "$.cnt", Some((k % 500 + 1000).toString)),
                  (0, "$.meta.pri", Some("\"urgent\"")),
                  (2, "$.st", None),
                  (1, "$.flag", Some("true")),
                  (0, "$.tags[1]", Some("9")),
                  (1, "$.tags[2]", Some("\"z\"")))))
            }))
      }
    } finally w.close()
    Files.writeString(Paths.get(outDir, "binlog.index"), "binlog.000000\n")
  }

  /** A MariaDB 10.x binlog: the fork's identity layer end-to-end —
    * GTID events (type 162) carry domain-server-seq triples and OPEN
    * the transaction (no BEGIN QUERY), inserts rotate between two
    * multi-master servers (101/102) in domain 0, standalone DDL gtids
    * run in their own domain 1, updates and deletes follow under one
    * server each, and rows ship in the V1 event layout. The log
    * rotates across three files, each opening with the GTID_LIST
    * state. cdc50 reads the storyline: __source_id must carry
    * `domain-server`, __gtid the per-domain seq, and no DDL seq may
    * ever stamp a row. */
  def ensureMaria(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMaria, "graft-cdcmaria", sfDir)(
      generateMaria(spark, sfDir, _))

  /** The SAME MariaDB storyline with `log_bin_compress=ON` bodies:
    * every rows event ships as its compressed variant (166-168, V1
    * post-header plain + one zlib record) and the DDL statements as
    * compressed QUERY (165) — so cdc52 shares cdc50's oracle verbatim
    * and any divergence is the compression layer's fault alone. */
  def ensureMariaCompressed(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMariaZ, "graft-cdcmariaz", sfDir)(
      generateMaria(spark, sfDir, _, compress = true))

  val MariaTable = "morders"
  val MariaTableId = 37L

  private def generateMaria(spark: SparkSession, sfDir: String,
      outDir: String, compress: Boolean = false): Unit = {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_orderkey % 1000 AS BIGINT) AS val")
    val schema = StructType(df.schema.fields.map(_.copy(nullable = true)))
    val rows: Array[Array[Any]] = df.collect()
      .map(r => schema.fields.indices.map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toArray[Any])
      .sortBy(_(0).asInstanceOf[Long])
    // GTID_LIST state: last seq per (domain, server), as mariadbd keeps
    val state = mutable.LinkedHashMap.empty[(Long, Long), Long]
    val files = mutable.ArrayBuffer.empty[String]
    var w: MysqlBinlog.Writer = null
    def rotate(): Unit = {
      if (w != null) w.close()
      val name = f"binlog.${files.length}%06d"
      w = new MysqlBinlog.Writer(s"$outDir/$name", checksum = true,
        maria = true)
      w.gtidList(state.toSeq.map { case ((d, s), q) => (d, s, q) })
      files += name
    }
    try {
      rotate()
      def txn(domain: Long, server: Long, seq: Long, tsG: Long)(
          body: Long => Unit): Unit = {
        val ts = BaseMs + tsG * 1000L
        w.currentServerId = server
        w.gtidMaria(ts, seq, domain) // non-standalone: opens the body
        w.tableMap(ts, MariaTableId, Db, MariaTable, schema)
        body(ts)
        w.xid(ts, seq)
        state((domain, server)) = math.max(state.getOrElse((domain, server), 0L), seq)
      }
      def ddl(seq: Long): Unit = {
        val ts = BaseMs + (50000L + seq) * 1000L
        w.currentServerId = 101L
        w.gtidMaria(ts, seq, domain = 1L, standalone = true)
        val sql = s"ALTER TABLE $MariaTable COMMENT 'epoch $seq'"
        if (compress) w.queryCompressed(ts, Db, sql) else w.query(ts, Db, sql)
        state((1L, 101L)) = math.max(state.getOrElse((1L, 101L), 0L), seq)
      }
      rows.grouped(100).zipWithIndex.foreach { case (batch, i) =>
        // rotation point mid-insert at min(30, nBatches): with >= 31
        // insert batches (sf0.01+) file 0 carries domain-0 seqs 1-30;
        // smaller SFs never reach i==30, so the log has 2 files and
        // file 0 tops out at nBatches. What holds at EVERY SF is
        // pruning correctness (the g>N predicate still excludes every
        // file-0 row), not the specific bound or the 3-file shape
        if (i == 30) rotate()
        txn(domain = 0L, server = if (i % 2 == 0) 101L else 102L,
          seq = i + 1L, tsG = i.toLong)(ts =>
          if (compress) w.writeRowsCompressed(ts, MariaTableId, schema, batch.toSeq)
          else w.writeRows(ts, MariaTableId, schema, batch.toSeq))
        if (i % 20 == 19) ddl(i / 20 + 1L) // standalone DDL, own domain
      }
      rotate() // update + delete phases in their own file
      val upd = rows.filter(_(0).asInstanceOf[Long] % 3 == 0)
      upd.grouped(100).zipWithIndex.foreach { case (batch, b) =>
        val g = 100000L + b
        txn(domain = 0L, server = 102L, seq = g, tsG = g) { ts =>
          val pairs = batch.toSeq.map { r =>
            val after = r.clone()
            after(1) = r(1).asInstanceOf[Long] + 1000L
            (r, after)
          }
          if (compress) w.updateRowsCompressed(ts, MariaTableId, schema, pairs)
          else w.updateRows(ts, MariaTableId, schema, pairs)
        }
      }
      val del = rows.filter(_(0).asInstanceOf[Long] % 7 == 0)
      del.grouped(100).zipWithIndex.foreach { case (batch, d) =>
        val g = 200000L + d
        txn(domain = 0L, server = 101L, seq = g, tsG = g) { ts =>
          val imgs = batch.toSeq.map { r =>
            val img = r.clone()
            val k = r(0).asInstanceOf[Long]
            if (k % 3 == 0) img(1) = r(1).asInstanceOf[Long] + 1000L
            img
          }
          if (compress) w.deleteRowsCompressed(ts, MariaTableId, schema, imgs)
          else w.deleteRows(ts, MariaTableId, schema, imgs)
        }
      }
    } finally if (w != null) w.close()
    Files.writeString(Paths.get(outDir, "binlog.index"),
      files.mkString("", "\n", "\n"))
  }

  private def generateTagged(spark: SparkSession, sfDir: String,
      outDir: String): Unit = {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_orderkey % 1000 AS BIGINT) AS val")
    val schema = StructType(df.schema.fields.map(_.copy(nullable = true)))
    val rows: Array[Array[Any]] = df.collect()
      .map(r => schema.fields.indices.map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toArray[Any])
      .sortBy(_(0).asInstanceOf[Long])
    // per-stream executed gnos so each rotated file can open with the
    // tagged-format PREVIOUS_GTIDS an 8.3+ server writes (gno
    // uniqueness — and therefore the executed set — is per (uuid, tag))
    val executed = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Long]]
    val files = mutable.ArrayBuffer.empty[String]
    var w: MysqlBinlog.Writer = null
    def rotate(): Unit = {
      if (w != null) w.close()
      val name = f"binlog.${files.length}%06d"
      w = new MysqlBinlog.Writer(s"$outDir/$name", checksum = true)
      w.previousGtidsTagged(
        executed.map { case (k, gs) => k -> toIntervals(gs.toSeq) }.toMap)
      files += name
    }
    try {
      rotate()
      def txn(tag: Option[String], gno: Long, tsG: Long)(
          body: Long => Unit): Unit = {
        val ts = BaseMs + tsG * 1000L
        tag match {
          case None => w.gtid(ts, gno, SourceId)
          case Some(t) => w.gtidTagged(ts, gno, SourceId, t)
        }
        executed.getOrElseUpdate(tag.fold(SourceId)(t => s"$SourceId:$t"),
          mutable.ArrayBuffer.empty[Long]) += gno
        w.query(ts, Db, "BEGIN")
        w.tableMap(ts, TaggedTableId, Db, TaggedTable, schema)
        body(ts)
        w.xid(ts, gno)
      }
      rows.grouped(100).zipWithIndex.foreach { case (batch, i) =>
        // rotation point mid-insert at min(30, nBatches): with >= 31
        // insert batches (sf0.01+) file 0 carries stream gnos 1-10 and
        // cdc49's startingGtid=10 prunes it whole; smaller SFs never
        // reach i==30 (2-file log, lower file-0 bounds). Pruning
        // CORRECTNESS (the g>N predicate excludes every file-0 row)
        // is what holds at every SF, not the specific bound
        if (i == 30) rotate()
        val tag = (i % 3) match {
          case 0 => None
          case 1 => Some("etl")
          case _ => Some("repair")
        }
        txn(tag, i / 3 + 1L, i.toLong)(ts =>
          w.writeRows(ts, TaggedTableId, schema, batch.toSeq))
      }
      rotate() // update phase in its own file
      val upd = rows.filter(_(0).asInstanceOf[Long] % 3 == 0)
      upd.grouped(100).zipWithIndex.foreach { case (batch, b) =>
        val g = 100000L + b
        txn(Some("repair"), g, g)(ts =>
          w.updateRows(ts, TaggedTableId, schema, batch.toSeq.map { r =>
            val after = r.clone()
            after(1) = r(1).asInstanceOf[Long] + 1000L
            (r, after)
          }))
      }
    } finally if (w != null) w.close()
    Files.writeString(Paths.get(outDir, "binlog.index"),
      files.mkString("", "\n", "\n"))
  }

  private def generateDdlScope(spark: SparkSession, sfDir: String,
      outDir: String): Unit = {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_orderkey % 1000 AS BIGINT) AS val")
    val schema = StructType(df.schema.fields.map(_.copy(nullable = true)))
    val rows: Array[Array[Any]] = df.collect()
      .map(r => schema.fields.indices.map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toArray[Any])
      .sortBy(_(0).asInstanceOf[Long])
    val w = new MysqlBinlog.Writer(s"$outDir/binlog.000000", checksum = true)
    try {
      def txn(g: Long)(body: Long => Unit): Unit = {
        val ts = BaseMs + g * 1000L
        w.gtid(ts, g, SourceId)
        w.query(ts, Db, "BEGIN")
        w.tableMap(ts, DdlScopeTableId, Db, DdlScopeTable, schema)
        body(ts)
        w.xid(ts, g)
      }
      def ddl(g: Long): Unit = {
        val ts = BaseMs + g * 1000L
        w.gtid(ts, g, SourceId)
        w.query(ts, Db,
          s"ALTER TABLE $DdlScopeTable COMMENT 'epoch $g'") // no XID
      }
      rows.grouped(100).zipWithIndex.foreach { case (batch, i) =>
        txn(i.toLong)(ts => w.writeRows(ts, DdlScopeTableId, schema, batch.toSeq))
        if (i % 5 == 4) ddl(50000L + i) // DDL between transactions
      }
      ddl(60000L) // DDL directly before the update phase
      val upd = rows.filter(_(0).asInstanceOf[Long] % 3 == 0)
      upd.grouped(100).zipWithIndex.foreach { case (batch, b) =>
        txn(100000L + b)(ts =>
          w.updateRows(ts, DdlScopeTableId, schema, batch.toSeq.map { r =>
            val after = r.clone()
            after(1) = r(1).asInstanceOf[Long] + 1000L
            (r, after)
          }))
      }
    } finally w.close()
    Files.writeString(Paths.get(outDir, "binlog.index"), "binlog.000000\n")
  }

  /** A log written as if `binlog_rows_query_log_events=ON`: each DML
    * statement's original SQL rides a ROWS_QUERY event ahead of its
    * TABLE_MAP — except every 4th insert transaction, written WITHOUT
    * one (a producer session with the flag off), so the nullable
    * `__query` surface is exercised end-to-end. cdc39 reads the
    * storyline with `rowsQuery=true`; the oracle recomputes every
    * statement string (and the NULLs) from orders. */
  def ensureMysqlRowsQuery(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyQ, "graft-cdcmyq", sfDir)(
      generateRowsQuery(spark, sfDir, _))

  val RowsQueryTable = "qorders"
  val RowsQueryTableId = 31L

  private def generateRowsQuery(spark: SparkSession, sfDir: String,
      outDir: String): Unit = {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_orderkey % 1000 AS BIGINT) AS val")
    val schema = StructType(df.schema.fields.map(_.copy(nullable = true)))
    val rows: Array[Array[Any]] = df.collect()
      .map(r => schema.fields.indices.map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toArray[Any])
      .sortBy(_(0).asInstanceOf[Long])
    val w = new MysqlBinlog.Writer(s"$outDir/binlog.000000", checksum = true)
    try {
      // mysqld's event order with binlog_rows_query_log_events=ON:
      // GTID → QUERY(BEGIN) → ROWS_QUERY → TABLE_MAP → rows → XID
      def txn(g: Long, stmt: Option[String])(body: Long => Unit): Unit = {
        val ts = BaseMs + g * 1000L
        w.gtid(ts, g, SourceId)
        w.query(ts, Db, "BEGIN")
        stmt.foreach(w.rowsQuery(ts, _))
        w.tableMap(ts, RowsQueryTableId, Db, RowsQueryTable, schema)
        body(ts)
        w.xid(ts, g)
      }
      rows.grouped(100).zipWithIndex.foreach { case (batch, i) =>
        val stmt = if (i % 4 == 3) None // flag-off producer session
          else Some(s"INSERT INTO $RowsQueryTable /* batch $i */")
        txn(i.toLong, stmt)(ts =>
          w.writeRows(ts, RowsQueryTableId, schema, batch.toSeq))
      }
      val upd = rows.filter(_(0).asInstanceOf[Long] % 3 == 0)
      upd.grouped(100).zipWithIndex.foreach { case (batch, b) =>
        txn(100000L + b,
          Some(s"UPDATE $RowsQueryTable SET val = val + 1000 /* batch $b */"))(ts =>
          w.updateRows(ts, RowsQueryTableId, schema, batch.toSeq.map { r =>
            val after = r.clone()
            after(1) = r(1).asInstanceOf[Long] + 1000L
            (r, after)
          }))
      }
    } finally w.close()
    Files.writeString(Paths.get(outDir, "binlog.index"), "binlog.000000\n")
  }

  val MinImageTable = "porders"
  val MinImageTableId = 27L

  private def generateMinimalImage(spark: SparkSession, sfDir: String,
      outDir: String): Unit = {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey",
        "CAST(o_orderkey % 1000 AS BIGINT) AS val",
        "concat('n', CAST(o_orderkey % 97 AS STRING)) AS note")
    val schema = StructType(df.schema.fields.map(_.copy(nullable = true)))
    val rows: Array[Array[Any]] = df.collect()
      .map(r => schema.fields.indices.map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toArray[Any])
      .sortBy(_(0).asInstanceOf[Long])
    val w = new MysqlBinlog.Writer(s"$outDir/binlog.000000", checksum = true)
    try {
      w.tableMap(BaseMs, MinImageTableId, Db, MinImageTable, schema)
      rows.grouped(100).zipWithIndex.foreach { case (batch, i) =>
        val ts = BaseMs + i * 1000L
        w.gtid(ts, i.toLong, SourceId)
        w.writeRows(ts, MinImageTableId, schema, batch.toSeq)
      }
      val upd = rows.filter(_(0).asInstanceOf[Long] % 3 == 0)
      upd.grouped(100).zipWithIndex.foreach { case (batch, b) =>
        val g = 100000L + b
        val ts = BaseMs + g * 1000L
        w.gtid(ts, g, SourceId)
        w.updateRowsMinimal(ts, MinImageTableId, schema, batch.toSeq.map { r =>
          val after = r.clone()
          after(1) = r(1).asInstanceOf[Long] + 1000L
          (r, after)
        })
      }
      val del = rows.filter(_(0).asInstanceOf[Long] % 7 == 0)
      del.grouped(100).zipWithIndex.foreach { case (batch, b) =>
        val g = 200000L + b
        val ts = BaseMs + g * 1000L
        w.gtid(ts, g, SourceId)
        w.deleteRowsMinimal(ts, MinImageTableId, schema, batch.toSeq)
      }
    } finally w.close()
    Files.writeString(Paths.get(outDir, "binlog.index"), "binlog.000000\n")
  }

  /** A `binlog_row_image=NOBLOB` log: full-image INSERTs (a new row's
    * blob always "changed"), UPDATEs whose images carry every NON-blob
    * column — payload appears only in after images of the statement
    * that changed it — and DELETEs whose before images carry the
    * non-blob columns. The differentiator vs MINIMAL (cdc37): `val` is
    * readable across the WHOLE storyline including before images;
    * only `payload` projections fail loud on thinned events. */
  def ensureMysqlNoblobImage(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyNb, "graft-cdcmynb", sfDir)(
      generateNoblobImage(spark, sfDir, _))

  val NoblobTable = "borders"
  val NoblobTableId = 37L

  private def generateNoblobImage(spark: SparkSession, sfDir: String,
      outDir: String): Unit = {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey",
        "CAST(o_orderkey % 1000 AS BIGINT) AS val",
        "CAST(concat('p', CAST(o_orderkey % 89 AS STRING)) AS BINARY) AS payload")
    val schema = StructType(df.schema.fields.map(_.copy(nullable = true)))
    val rows: Array[Array[Any]] = df.collect()
      .map(r => schema.fields.indices.map(i =>
        if (r.isNullAt(i)) null else r.get(i)).toArray[Any])
      .sortBy(_(0).asInstanceOf[Long])
    val w = new MysqlBinlog.Writer(s"$outDir/binlog.000000", checksum = true)
    try {
      w.tableMap(BaseMs, NoblobTableId, Db, NoblobTable, schema)
      rows.grouped(100).zipWithIndex.foreach { case (batch, i) =>
        val ts = BaseMs + i * 1000L
        w.gtid(ts, i.toLong, SourceId)
        w.writeRows(ts, NoblobTableId, schema, batch.toSeq)
      }
      // phase 1: non-blob UPDATE — payload untouched, so NOBLOB thins
      // it from BOTH images (shared after bitmap sees it unchanged)
      val upd = rows.filter(_(0).asInstanceOf[Long] % 3 == 0)
      upd.grouped(100).zipWithIndex.foreach { case (batch, b) =>
        val g = 100000L + b
        val ts = BaseMs + g * 1000L
        w.gtid(ts, g, SourceId)
        w.updateRowsNoblob(ts, NoblobTableId, schema, batch.toSeq.map { r =>
          val after = r.clone()
          after(1) = r(1).asInstanceOf[Long] + 1000L
          (r, after)
        })
      }
      // phase 2: blob UPDATE — the changed payload appears in the after
      // image (and ONLY there); `val` reflects phase 1's state
      val bup = rows.filter(_(0).asInstanceOf[Long] % 5 == 0)
      bup.grouped(100).zipWithIndex.foreach { case (batch, b) =>
        val g = 150000L + b
        val ts = BaseMs + g * 1000L
        w.gtid(ts, g, SourceId)
        w.updateRowsNoblob(ts, NoblobTableId, schema, batch.toSeq.map { r =>
          val k = r(0).asInstanceOf[Long]
          val cur = r.clone()
          if (k % 3 == 0) cur(1) = r(1).asInstanceOf[Long] + 1000L
          val after = cur.clone()
          after(2) = s"q${k % 89}".getBytes("UTF-8")
          (cur, after)
        })
      }
      val del = rows.filter(_(0).asInstanceOf[Long] % 7 == 0)
      del.grouped(100).zipWithIndex.foreach { case (batch, b) =>
        val g = 200000L + b
        val ts = BaseMs + g * 1000L
        w.gtid(ts, g, SourceId)
        w.deleteRowsNoblob(ts, NoblobTableId, schema, batch.toSeq.map { r =>
          val k = r(0).asInstanceOf[Long]
          val cur = r.clone()
          if (k % 3 == 0) cur(1) = r(1).asInstanceOf[Long] + 1000L
          cur
        })
      }
    } finally w.close()
    Files.writeString(Paths.get(outDir, "binlog.index"), "binlog.000000\n")
  }

  /** A MySQL binlog with an ALTER TABLE mid-file: epoch 1 declares
    * (k, keep, v DOUBLE); epoch 2 — new table id, like mysqld assigns
    * after DDL — REORDERS to (extra, k, keep, price), renaming `v` to
    * `price` and adding `extra` at the FRONT (so the epoch remap is a
    * genuine permutation, not just a suffix pad). FULL row metadata
    * carries the names the remap matches by. Same key/value derivation
    * as the gcdc drifted log (cdc20), so cdc47's oracle is the same
    * reconstruction against the reordered newest schema. Epoch 2 also
    * UPDATES a subset of epoch-1 keys (%100==0) in the NEW layout —
    * before images carry the server-preserved renamed value
    * (extra=NULL, price=old v), after images set extra=k*7,
    * price=p*5 — so cdc48's latest-image compaction crosses the ALTER:
    * updated keys materialize the post-ALTER state, untouched epoch-1
    * keys the remapped nulls. */
  def ensureMysqlDrifted(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyDr, "graft-cdcmydr2", sfDir)(
      generateMysqlDrifted(spark, sfDir, _))

  val MysqlEvolvingTable = "vorders"
  val MysqlEvolvingTableId1 = 39L
  val MysqlEvolvingTableId2 = 40L

  private def generateMysqlDrifted(spark: SparkSession, sfDir: String,
      outDir: String): Unit = {
    val keyPrice = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val s1 = StructType(Seq(StructField("k", LongType),
      StructField("keep", StringType), StructField("v", DoubleType)))
    val s2 = StructType(Seq(StructField("extra", LongType),
      StructField("k", LongType), StructField("keep", StringType),
      StructField("price", DoubleType)))
    val w = new MysqlBinlog.Writer(s"$outDir/binlog.000000", checksum = true)
    try {
      w.tableMap(BaseMs, MysqlEvolvingTableId1, Db, MysqlEvolvingTable, s1)
      keyPrice.filter(_._1 % 50 == 0).zipWithIndex.foreach { case ((k, p), i) =>
        val ts = BaseMs + i * 1000L
        w.gtid(ts, i.toLong, SourceId)
        w.writeRows(ts, MysqlEvolvingTableId1, s1, Seq(Array[Any](k, s"k$k", p)))
      }
      // the ALTER boundary: mysqld re-emits TABLE_MAP with a fresh id
      w.tableMap(BaseMs, MysqlEvolvingTableId2, Db, MysqlEvolvingTable, s2)
      keyPrice.filter(_._1 % 50 == 25).zipWithIndex.foreach { case ((k, p), i) =>
        val gno = 100000L + i
        val ts = BaseMs + gno * 1000L
        w.gtid(ts, gno, SourceId)
        w.writeRows(ts, MysqlEvolvingTableId2, s2,
          Seq(Array[Any](k * 3, k, s"k$k", p * 2)))
      }
      // post-ALTER updates of epoch-1 keys, in the NEW layout: the
      // server's before image preserves the renamed column's value
      // (price = old v) and reads NULL for the added column
      keyPrice.filter(_._1 % 100 == 0).zipWithIndex.foreach { case ((k, p), i) =>
        val gno = 200000L + i
        val ts = BaseMs + gno * 1000L
        w.gtid(ts, gno, SourceId)
        w.updateRows(ts, MysqlEvolvingTableId2, s2, Seq(
          (Array[Any](null, k, s"k$k", p), Array[Any](k * 7, k, s"k$k", p * 5))))
      }
    } finally w.close()
    Files.writeString(Paths.get(outDir, "binlog.index"), "binlog.000000\n")
  }

  val EnumTable = "eorders"
  val EnumTableId = 17L
  val EnumStatusMembers: IndexedSeq[String] = IndexedSeq("F", "O", "P")
  val EnumPrioMembers: IndexedSeq[String] = IndexedSeq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  val SetFlagMembers: IndexedSeq[String] = IndexedSeq("a", "b", "c", "d")

  val EnumDerivations: Seq[String] = Seq(
    "o_orderkey",
    "o_orderstatus AS status_e",
    "CASE WHEN o_orderkey % 11 = 5 THEN NULL ELSE o_orderpriority END AS prio_e",
    "concat_ws(',', CASE WHEN o_orderkey % 2 = 1 THEN 'a' END, " +
      "CASE WHEN o_orderkey % 3 = 1 THEN 'b' END, " +
      "CASE WHEN o_orderkey % 5 = 1 THEN 'c' END, " +
      "CASE WHEN o_orderkey % 7 = 1 THEN 'd' END) AS flags_s")

  /** YEAR / BIT / TIME columns on the real wire: YEAR's offset-1900
    * byte (0 = literal 0000), BIT's big-endian bitfield with the split
    * (bits%8, bits/8) metadata, and TIME2's offset-binary signed
    * duration (6-byte fsp=6 form, ±838 h range — surfaced as signed
    * microseconds). cdc31's oracle recomputes all of it as integer
    * arithmetic, identical in both engines. */
  def ensureMysqlYearBitTime(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyY, "graft-cdcmyy", sfDir)(
      generateDerivedMysql(spark, sfDir, _, YearBitTimeDerivations,
        YearBitTimeTable, YearBitTimeTableId, Set.empty,
        yearCols = Set("yr", "yr_n"),
        bitCols = Map("b10" -> 10, "b64" -> 64),
        timeCols = Set("t_us")))

  val YearBitTimeTable = "yorders"
  val YearBitTimeTableId = 19L

  val YearBitTimeDerivations: Seq[String] = Seq(
    "o_orderkey",
    "CAST(CASE WHEN o_orderkey % 13 = 6 THEN 0 ELSE 1901 + o_orderkey % 255 END AS SMALLINT) AS yr",
    "CASE WHEN o_orderkey % 9 = 2 THEN NULL ELSE CAST(1901 + o_orderkey % 100 AS SMALLINT) END AS yr_n",
    "CAST(o_orderkey % 1024 AS BIGINT) AS b10",
    "CAST(o_orderkey * 2654435761 AS BIGINT) AS b64",
    "CAST((CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE -1 END) * " +
      "((o_orderkey % 839) * 3600000000 + (o_orderkey % 60) * 60000000 + " +
      "(o_orderkey % 53) * 1000000 + o_orderkey % 1000000) AS BIGINT) AS t_us")

  /** TIME2 at every sub-fsp6 storage form on the real wire: fsp 0
    * (3-byte intpart only — the mysqld DEFAULT for a plain TIME
    * column), fsp 1/2 (one SIGNED frac byte), fsp 3/4 (a signed frac
    * short), fsp 5 (the 6-byte combined form) — with signs alternating
    * and small-magnitude negatives whose integer part is zero, the
    * case that crosses the floor-shift/truncated-mod seam
    * (intpart++ compensation). All integer arithmetic; cdc33's oracle
    * recomputes identical microsecond values in DuckDB. */
  def ensureMysqlTimeFsp(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyF, "graft-cdcmyf", sfDir)(
      generateDerivedMysql(spark, sfDir, _, TimeFspDerivations,
        TimeFspTable, TimeFspTableId, Set.empty,
        timeFsp = Map("t0" -> 0, "t1" -> 1, "t3" -> 3, "t4" -> 4, "t5" -> 5)))

  val TimeFspTable = "forders"
  val TimeFspTableId = 23L

  val TimeFspDerivations: Seq[String] = Seq(
    "o_orderkey",
    // whole seconds, full ±838 h range
    "CAST((CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE -1 END) * " +
      "((o_orderkey % 839) * 3600 + (o_orderkey % 60) * 60 + o_orderkey % 53) " +
      "* 1000000 AS BIGINT) AS t0",
    // deciseconds, nullable
    "CASE WHEN o_orderkey % 9 = 4 THEN NULL ELSE " +
      "CAST((CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE -1 END) * " +
      "((o_orderkey % 3600) * 1000000 + (o_orderkey % 10) * 100000) AS BIGINT) END AS t1",
    // milliseconds, many |value| < 1 s negatives (zero int part)
    "CAST((CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE -1 END) * " +
      "(o_orderkey % 2000) * 1000 AS BIGINT) AS t3",
    // hundred-microsecond steps, sub-second magnitudes
    "CAST((CASE WHEN o_orderkey % 5 = 2 THEN -1 ELSE 1 END) * " +
      "(o_orderkey % 10000) * 100 AS BIGINT) AS t4",
    // ten-microsecond steps through the 6-byte combined form
    "CAST((CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE -1 END) * " +
      "((o_orderkey % 100) * 1000000 + (o_orderkey % 100000) * 10) AS BIGINT) AS t5")

  /** DATETIME2/TIMESTAMP2 at sub-fsp6 storage forms on the real wire:
    * the fractional part is stored in ceil(fsp/2) big-endian bytes
    * whose UNIT follows the byte count, not the digit count (1 byte =
    * centiseconds, 2 = hundred-µs, 3 = µs) — so the odd fsps 1/3/5
    * exercise the seam where a digits-based decode would be off by 10x
    * (DATETIME(3) is the common production shape). Coverage: DATETIME
    * fsp 0/1/3/4/6 (one nullable), TIMESTAMP fsp 1/3/5/6 (one
    * nullable). All integer arithmetic from o_orderkey; cdc35's oracle
    * rebuilds identical instants with DuckDB's interval constructors
    * (the reference decodes these via Field::unpack field metadata,
    * binlog_table_reader.cc:151-157). */
  def ensureMysqlDtFsp(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyDt, "graft-cdcmydt", sfDir)(
      generateDerivedMysql(spark, sfDir, _, DtFspDerivations,
        DtFspTable, DtFspTableId, Set.empty,
        dtFsp = Map("dt0" -> 0, "dt1" -> 1, "dt3" -> 3, "dt4" -> 4,
          "dt6" -> 6, "ts1" -> 1, "ts3" -> 3, "ts5" -> 5, "ts6" -> 6)))

  val DtFspTable = "dtorders"
  val DtFspTableId = 25L

  /** Spark-dialect derivations; cdc35's oracle mirrors each with
    * DuckDB's `TIMESTAMP '<base>' + to_microseconds(...)` — the same
    * split-dialect convention as cdc32 (neither engine parses the
    * other's NTZ constructor). Every fraction is an exact multiple of
    * 10^(6-fsp) µs, the only values mysqld can store at that fsp. */
  val DtFspDerivations: Seq[String] = Seq(
    "o_orderkey",
    // DATETIME(0): whole seconds
    "timestampadd(SECOND, CAST(o_orderkey % 86400 AS BIGINT), " +
      "TIMESTAMP_NTZ '1997-03-05 00:00:00') AS dt0",
    // DATETIME(1): decisecond steps through the 1-byte (centi) form
    "timestampadd(MICROSECOND, CAST((o_orderkey % 3600) * 1000000 + " +
      "(o_orderkey % 10) * 100000 AS BIGINT), " +
      "TIMESTAMP_NTZ '1997-03-05 00:00:00') AS dt1",
    // DATETIME(3): milliseconds (2-byte hundred-µs form), nullable
    "CASE WHEN o_orderkey % 9 = 4 THEN NULL ELSE " +
      "timestampadd(MICROSECOND, CAST((o_orderkey % 86400) * 1000000 + " +
      "(o_orderkey % 1000) * 1000 AS BIGINT), " +
      "TIMESTAMP_NTZ '1997-03-05 00:00:00') END AS dt3",
    // DATETIME(4): hundred-µs steps
    "timestampadd(MICROSECOND, CAST((o_orderkey % 86400) * 1000000 + " +
      "(o_orderkey % 10000) * 100 AS BIGINT), " +
      "TIMESTAMP_NTZ '1997-03-05 00:00:00') AS dt4",
    // DATETIME(6): full microseconds
    "timestampadd(MICROSECOND, CAST((o_orderkey % 86400) * 1000000 + " +
      "o_orderkey * 31 % 1000000 AS BIGINT), " +
      "TIMESTAMP_NTZ '1997-03-05 00:00:00') AS dt6",
    // TIMESTAMP(1): decisecond steps (base 2023-11-14 22:13:20 UTC)
    "timestamp_micros(1700000000000000 + (o_orderkey % 100000) * 1000000 + " +
      "(o_orderkey % 10) * 100000) AS ts1",
    // TIMESTAMP(3): milliseconds
    "timestamp_micros(1700000000000000 + (o_orderkey % 100000) * 1000000 + " +
      "(o_orderkey % 1000) * 1000) AS ts3",
    // TIMESTAMP(5): ten-µs steps through the 3-byte form
    "timestamp_micros(1700000000000000 + (o_orderkey % 100000) * 1000000 + " +
      "(o_orderkey % 100000) * 10) AS ts5",
    // TIMESTAMP(6): full microseconds, nullable
    "CASE WHEN o_orderkey % 7 = 2 THEN NULL ELSE " +
      "timestamp_micros(1700000000000000 + (o_orderkey % 100000) * 1000000 + " +
      "o_orderkey * 97 % 1000000) END AS ts6")

  /** MEDIUMINT + legacy temporal columns on the real wire: INT24's
    * 3-byte two's complement (signed near ±max, unsigned near 2^24-1
    * via the SIGNEDNESS TLV, and a nullable one), plus the pre-5.6.4
    * temporal encodings a modern reader must still accept: TIME
    * (3-byte LE ±HHMMSS), DATETIME (8-byte LE decimal YYYYMMDDHHMMSS,
    * nullable), TIMESTAMP (4-byte LE unix seconds). The reference
    * decodes all of these through Field::unpack
    * (binlog_table_reader.cc:151-157). */
  def ensureMysqlLegacy(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMyL, "graft-cdcmyl", sfDir)(
      generateDerivedMysql(spark, sfDir, _, LegacyDerivations,
        LegacyTable, LegacyTableId, Set("um24"),
        int24Cols = Set("m24", "m24_n", "um24"),
        legacyTimeCols = Set("t_old"),
        legacyDatetimeCols = Set("dt_old"),
        legacyTimestampCols = Set("ts_old")))

  val LegacyTable = "morders"
  val LegacyTableId = 21L

  /** The integer-valued derivations, shared VERBATIM with cdc32's
    * oracle SQL (pure integer arithmetic — identical in both engines). */
  val LegacyIntDerivations: Seq[String] = Seq(
    "CAST((CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE -1 END) * " +
      "(8388607 - o_orderkey % 8388608) AS INT) AS m24",
    "CASE WHEN o_orderkey % 6 = 1 THEN NULL ELSE " +
      "CAST(o_orderkey % 100 - 50 AS INT) END AS m24_n",
    "CAST(16777215 - o_orderkey % 16777216 AS INT) AS um24",
    "CAST((CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE -1 END) * " +
      "((o_orderkey % 839) * 3600 + (o_orderkey % 60) * 60 + " +
      "o_orderkey % 53) * 1000000 AS BIGINT) AS t_old")

  /** Fixture-side (Spark dialect) derivations: the integer columns plus
    * whole-second timestamp constructors. cdc32's oracle rebuilds the
    * same VALUES with DuckDB's constructors (`make_timestamp`,
    * `TIMESTAMP + to_seconds`) — the one query family whose fixture and
    * oracle expressions differ textually, because neither engine parses
    * the other's NTZ constructor. */
  val LegacyDerivations: Seq[String] =
    "o_orderkey" +: LegacyIntDerivations :+
    ("CASE WHEN o_orderkey % 11 = 7 THEN NULL ELSE " +
      "make_timestamp_ntz(1997, 1 + o_orderkey % 12, 1 + o_orderkey % 28, " +
      "CAST(o_orderkey % 24 AS INT), CAST(o_orderkey % 60 AS INT), " +
      "o_orderkey % 60) END AS dt_old") :+
    "timestamp_seconds(1700000000 + o_orderkey % 100000) AS ts_old"

  val UnsignedDerivations: Seq[String] = Seq(
    "o_orderkey",
    "CAST(o_orderkey % 256 AS SMALLINT) AS u8",
    "CASE WHEN o_orderkey % 5 = 2 THEN NULL ELSE CAST(o_orderkey % 65536 AS INT) END AS u16",
    "CAST(4294967295 - o_orderkey AS BIGINT) AS u32",
    "CAST(CAST('18446744073709551615' AS DECIMAL(20,0)) - o_orderkey AS DECIMAL(20,0)) AS u64")

  /** cdc26's output projection: u64 (the one DECIMAL(20,0) column)
    * leaves as its canonical digit string — same representation-
    * robustness rationale as [[DecimalOutputCols]]. */
  val UnsignedOutputCols: Seq[String] = Seq(
    "o_orderkey", "u8", "u16", "u32", "CAST(u64 AS STRING) AS u64")

  /** One derived-from-orders table, inserts only, batches of 100,
    * gno = batch index — the storyline shared by cdc24/cdc26. */
  private def generateDerivedMysql(spark: SparkSession, sfDir: String,
      outDir: String, derivations: Seq[String], table: String,
      tableId: Long, unsignedCols: Set[String],
      charCols: Map[String, Int] = Map.empty,
      jsonCols: Set[String] = Set.empty,
      enumCols: Map[String, IndexedSeq[String]] = Map.empty,
      setCols: Map[String, IndexedSeq[String]] = Map.empty,
      yearCols: Set[String] = Set.empty,
      bitCols: Map[String, Int] = Map.empty,
      timeCols: Set[String] = Set.empty,
      timeFsp: Map[String, Int] = Map.empty,
      int24Cols: Set[String] = Set.empty,
      legacyTimeCols: Set[String] = Set.empty,
      legacyDatetimeCols: Set[String] = Set.empty,
      legacyTimestampCols: Set[String] = Set.empty,
      dtFsp: Map[String, Int] = Map.empty,
      fullMetadata: Boolean = true): Unit = {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr(derivations: _*)
    val schema = StructType(df.schema.fields.map(_.copy(nullable = true)))
    val rows: Array[Array[Any]] = df.collect()
      .map(r => schema.fields.indices.map { i =>
        if (r.isNullAt(i)) null
        else schema.fields(i).dataType match {
          case TimestampType =>
            DateTimeUtils.fromJavaTimestamp(r.getAs[java.sql.Timestamp](i))
          case TimestampNTZType =>
            DateTimeUtils.localDateTimeToMicros(r.getAs[java.time.LocalDateTime](i))
          case _ => r.get(i)
        }
      }.toArray[Any])
      .sortBy(_(0).asInstanceOf[Long])
    val w = new MysqlBinlog.Writer(s"$outDir/binlog.000000", checksum = true,
      fullMetadata = fullMetadata,
      unsignedCols = unsignedCols, charCols = charCols, jsonCols = jsonCols,
      enumCols = enumCols, setCols = setCols,
      yearCols = yearCols, bitCols = bitCols, timeCols = timeCols,
      timeFsp = timeFsp,
      int24Cols = int24Cols, legacyTimeCols = legacyTimeCols,
      legacyDatetimeCols = legacyDatetimeCols,
      legacyTimestampCols = legacyTimestampCols,
      dtFsp = dtFsp)
    try {
      w.tableMap(BaseMs, tableId, Db, table, schema)
      rows.grouped(100).zipWithIndex.foreach { case (batch, i) =>
        val ts = BaseMs + i * 1000L
        w.gtid(ts, i.toLong, SourceId)
        w.writeRows(ts, tableId, schema, batch.toSeq)
      }
    } finally w.close()
    Files.writeString(Paths.get(outDir, "binlog.index"), "binlog.000000\n")
  }

  /** Multi-source replication log: two servers write interleaved
    * transactions into ONE log, each with its own gno sequence starting
    * at 0 — the collision the bare-gno identity cannot resolve. Source A
    * inserts the `o_orderkey % 4 == 1` orders, source B the `% 4 == 3`
    * ones, both in key order, batches of 10, gno = batch index;
    * event time = BaseMs + (2·gno + [src==B]) seconds. Everything is a
    * pure function of orders.parquet, so cdc19's oracle reconstructs it
    * in SQL. */
  def ensureMultiSource(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheMs, "graft-cdcms2", sfDir)(generateMultiSource(spark, sfDir, _))

  /** Schema-drift log: table `graft.evolving` changes shape between the
    * two files — epoch 1 declares (k, keep, v DOUBLE); epoch 2 renames
    * `v` to `price` and adds `extra`. Under the default fail-loud policy
    * this log is unreadable past file 0; with `schemaDrift=epochs` one
    * query spans both (epoch-1 rows read (k, keep, null, null) against
    * the newest schema). Pure function of orders.parquet: epoch 1 holds
    * the `o_orderkey % 50 == 0` keys (gno = row index), epoch 2 the
    * `% 50 == 25` keys with price = o_totalprice * 2 and extra = key * 3
    * (gno = 100000 + row index). */
  def ensureDrifted(spark: SparkSession, sfDir: String): String =
    ensureLog(cacheDr, "graft-cdcdr2", sfDir)(generateDrifted(spark, sfDir, _))

  val EvolvingTable = "evolving"
  val EvolvingTableId = 7L

  private def generateDrifted(spark: SparkSession, sfDir: String,
      outDir: String): Unit = {
    val keyPrice = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val s1 = StructType(Seq(StructField("k", LongType),
      StructField("keep", StringType), StructField("v", DoubleType)))
    val s2 = StructType(Seq(StructField("k", LongType),
      StructField("keep", StringType), StructField("price", DoubleType),
      StructField("extra", LongType)))
    val w0 = new CdcCodec.LogWriter(s"$outDir/binlog.000000")
    try {
      w0.tableMap(BaseMs, EvolvingTableId, Db, EvolvingTable, s1)
      keyPrice.filter(_._1 % 50 == 0).zipWithIndex.foreach { case ((k, p), i) =>
        val ts = BaseMs + i * 1000L
        w0.gtid(ts, i.toLong, SourceId)
        w0.writeRows(ts, EvolvingTableId, s1, Seq(Array[Any](k, s"k$k", p)))
      }
    } finally w0.close()
    val w1 = new CdcCodec.LogWriter(s"$outDir/binlog.000001")
    try {
      w1.tableMap(BaseMs, EvolvingTableId, Db, EvolvingTable, s2)
      keyPrice.filter(_._1 % 50 == 25).zipWithIndex.foreach { case ((k, p), i) =>
        val gno = 100000L + i
        val ts = BaseMs + gno * 1000L
        w1.gtid(ts, gno, SourceId)
        w1.writeRows(ts, EvolvingTableId, s2,
          Seq(Array[Any](k, s"k$k", p * 2, k * 3)))
      }
    } finally w1.close()
    Files.writeString(Paths.get(outDir, "binlog.index"),
      "binlog.000000\nbinlog.000001\n")
  }

  private def generateMultiSource(spark: SparkSession, sfDir: String,
      outDir: String): Unit = {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    val schema = StructType(df.schema.fields.map(_.copy(nullable = true)))
    val keyIdx = schema.fieldIndex("o_orderkey")
    val rows: Array[Array[Any]] = df.collect()
      .map(r => schema.fields.indices.map { i =>
        schema.fields(i).dataType match {
          case TimestampType =>
            DateTimeUtils.fromJavaTimestamp(r.getAs[java.sql.Timestamp](i))
          case TimestampNTZType =>
            DateTimeUtils.localDateTimeToMicros(r.getAs[java.time.LocalDateTime](i))
          case _ => r.get(i)
        }
      }.toArray[Any])
      .sortBy(_(keyIdx).asInstanceOf[Long])
    def batchesOf(residue: Long): Seq[(Long, Seq[Array[Any]])] =
      rows.filter(_(keyIdx).asInstanceOf[Long] % 4 == residue)
        .grouped(10).zipWithIndex.map { case (b, i) => (i.toLong, b.toSeq) }.toSeq
    val a = batchesOf(1L).map(("A", _))
    val b = batchesOf(3L).map(("B", _))
    // strict interleave A,B,A,B... then whichever source has more batches
    val interleaved = a.zip(b).flatMap { case (x, y) => Seq(x, y) } ++
      (if (a.length > b.length) a.drop(b.length) else b.drop(a.length))
    val w = new CdcCodec.LogWriter(s"$outDir/binlog.000000")
    try {
      w.tableMap(BaseMs, TableId, Db, Table, schema)
      interleaved.foreach { case (src, (gno, batch)) =>
        val ts = BaseMs + (2 * gno + (if (src == "B") 1 else 0)) * 1000L
        w.gtid(ts, gno, if (src == "A") SourceA else SourceB)
        w.writeRows(ts, TableId, schema, batch)
      }
    } finally w.close()
    Files.writeString(Paths.get(outDir, "binlog.index"), "binlog.000000\n")
  }

  private def generate(spark: SparkSession, sfDir: String, outDir: String,
      newSink: String => FixtureSink): Unit = {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    val schema = StructType(df.schema.fields.map(_.copy(nullable = true)))
    val keyIdx = schema.fieldIndex("o_orderkey")
    val priceIdx = schema.fieldIndex("o_totalprice")

    val rows: Array[Array[Any]] = df.collect()
      .map(r => schema.fields.indices.map { i =>
        schema.fields(i).dataType match {
          case TimestampType =>
            DateTimeUtils.fromJavaTimestamp(r.getAs[java.sql.Timestamp](i))
          case TimestampNTZType =>
            DateTimeUtils.localDateTimeToMicros(r.getAs[java.time.LocalDateTime](i))
          case _ => r.get(i)
        }
      }.toArray[Any])
      .sortBy(_(keyIdx).asInstanceOf[Long])

    val auditSchema = StructType(Seq(
      StructField("audit_id", LongType), StructField("note", StringType)))
    // nullable column exercised through the oracle-verified path:
    // note NULL when o_orderkey % 3 == 0
    val notesSchema = StructType(Seq(
      StructField("note_id", LongType), StructField("note", StringType)))

    // one transaction = (gno, writer actions)
    sealed trait Txn { def gno: Long }
    final case class Ins(gno: Long, batch: Seq[Array[Any]]) extends Txn
    final case class Upd(gno: Long, before: Array[Any], after: Array[Any]) extends Txn
    final case class Del(gno: Long, row: Array[Any]) extends Txn
    final case class Audit(gno: Long, row: Array[Any]) extends Txn
    final case class Note(gno: Long, row: Array[Any]) extends Txn

    val txns = mutable.ArrayBuffer.empty[Txn]
    rows.grouped(10).zipWithIndex.foreach { case (batch, b) =>
      txns += Ins(b.toLong, batch.toSeq)
      // interleave an unrelated table's txn every 40 batches
      if (b % 40 == 0)
        txns += Audit(500000L + b, Array[Any](b.toLong, s"audit-$b"))
    }
    rows.zipWithIndex.foreach { case (r, idx) =>
      if (r(keyIdx).asInstanceOf[Long] % 10 == 0) {
        val after = r.clone()
        after(priceIdx) = r(priceIdx).asInstanceOf[Double] * 1.1
        txns += Upd(1000000L + idx, r, after)
      }
    }
    rows.zipWithIndex.foreach { case (r, idx) =>
      val key = r(keyIdx).asInstanceOf[Long]
      if (key % 20 == 0) {
        val note: Any = if (key % 3 == 0) null else s"n$key"
        txns += Note(3000000L + idx, Array[Any](key, note))
      }
    }
    rows.zipWithIndex.foreach { case (r, idx) =>
      if (r(keyIdx).asInstanceOf[Long] % 100 == 0) {
        val img = r.clone()
        img(priceIdx) = r(priceIdx).asInstanceOf[Double] * 1.1
        txns += Del(2000000L + idx, img)
      }
    }

    // event time = base + gno seconds: trivially SQL-reconstructable
    def ts(gno: Long): Long = BaseMs + gno * 1000L

    val perFile = (txns.length + NumFiles - 1) / NumFiles
    // executed-before gno set per file (MySQL PREVIOUS_GTIDS; the GCDC
    // sink ignores it — its sidecars carry tighter bounds already)
    val executedSoFar = mutable.ArrayBuffer.empty[Long]
    val files = txns.grouped(perFile).zipWithIndex.map { case (chunk, i) =>
      val name = f"binlog.$i%06d"
      val w = newSink(s"$outDir/$name")
      try {
        w.previousGtids(Map(SourceId -> toIntervals(executedSoFar.toSeq)))
        executedSoFar ++= chunk.map(_.gno)
        val t0 = ts(chunk.head.gno)
        w.tableMap(t0, TableId, Db, Table, schema)
        w.tableMap(t0, AuditTableId, Db, "audit", auditSchema)
        w.tableMap(t0, NotesTableId, Db, "notes", notesSchema)
        chunk.foreach { txn =>
          val t = ts(txn.gno)
          w.gtid(t, txn.gno, SourceId)
          txn match {
            case Ins(_, batch) => w.writeRows(t, TableId, schema, batch)
            case Upd(_, b, a) => w.updateRows(t, TableId, schema, Seq((b, a)))
            case Del(_, r) => w.deleteRows(t, TableId, schema, Seq(r))
            case Audit(_, r) => w.writeRows(t, AuditTableId, auditSchema, Seq(r))
            case Note(_, r) => w.writeRows(t, NotesTableId, notesSchema, Seq(r))
          }
        }
      } finally w.close()
      name
    }.toList
    Files.writeString(Paths.get(outDir, "binlog.index"), files.mkString("", "\n", "\n"))
  }

  /** Sorted distinct gnos → disjoint [start, end) intervals. */
  private def toIntervals(gnos: Seq[Long]): Seq[(Long, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    gnos.distinct.sorted.foreach { g =>
      if (out.nonEmpty && out.last._2 == g)
        out(out.length - 1) = (out.last._1, g + 1)
      else out += ((g, g + 1))
    }
    out.toSeq
  }
}
