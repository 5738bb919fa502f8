package graft.queries

import graft.QDef
import graft.cdc.{CdcFixture, CdcSchema}
import org.apache.spark.sql.functions._

/** CDC capabilities beyond the plain scan: time-travel snapshots by GTID
  * (the CDC idiom the reference enables but cannot express itself),
  * change-range deltas, multi-table logs, and the REAL MySQL binlog v4
  * wire format (cdc21-cdc23).
  */
object CdcExt {

  /** The same event storyline as [[Cdc.scan]], but read from a REAL
    * MySQL binlog v4 file set (CRC32-checksummed, FULL row metadata)
    * through the `binlogFormat=mysql` adapter — the byte layout the
    * reference itself decodes (binlog_table_reader.cc:98-435). */
  private def mysqlScan(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val index = CdcFixture.ensureMysql(s, dir)
    s.read.format("binlogcdc")
      .option("indexFile", index)
      .option("database", CdcFixture.Db)
      .option("table", CdcFixture.Table)
      .option("binlogFormat", "mysql")
      .load()
  }

  // per-root build locks for the fan-out fixture (LlmExt2's buildOnce
  // discipline: marker written LAST, one lock per scoped root)
  private val fanoutLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** One-pass multi-table materialization of the fixture log
    * ([[graft.sources.CdcFanout]]): orders + audit from ONE decode,
    * built once per JVM per sfDir. Returns the per-table frame paths. */
  private[queries] def ensureFanout(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[(String, String), String] = {
    val root = graft.TmpDirs.scoped("graft-cdcfan-" + graft.TmpDirs.pathKey(dir))
    val lock = fanoutLocks.computeIfAbsent(root, _ => new Object)
    lock.synchronized {
      if (!new java.io.File(s"$root/_FANOUT").exists()) {
        val index = CdcFixture.ensure(s, dir)
        graft.sources.CdcFanout.materializeTables(s, index,
          Seq((CdcFixture.Db, CdcFixture.Table), (CdcFixture.Db, "audit")),
          root)
        new java.io.File(s"$root/_FANOUT").createNewFile()
        ()
      }
    }
    Map(
      (CdcFixture.Db, CdcFixture.Table) ->
        s"$root/${CdcFixture.Db}__${CdcFixture.Table}",
      (CdcFixture.Db, "audit") -> s"$root/${CdcFixture.Db}__audit")
  }

  /** The INCREMENTAL fan-out fixture: the same orders+audit frames, but
    * materialized in TWO [[graft.sources.CdcFanout.appendTables]]
    * increments (first half of the log's files via a subset index, then
    * the full index — only the new files are walked the second time).
    * Equality with the one-shot frames is the operator's contract. */
  private[queries] def ensureIncrFanout(s: org.apache.spark.sql.SparkSession,
      dir: String): Map[(String, String), String] = {
    val root = graft.TmpDirs.scoped("graft-cdcfani-" + graft.TmpDirs.pathKey(dir))
    val lock = fanoutLocks.computeIfAbsent(root, _ => new Object)
    val tables = Seq((CdcFixture.Db, CdcFixture.Table), (CdcFixture.Db, "audit"))
    lock.synchronized {
      if (!new java.io.File(s"$root/_FANOUT").exists()) {
        val index = CdcFixture.ensure(s, dir)
        val files = graft.cdc.CdcCodec.readIndex(index)
        val idx1 = s"$root/binlog1.index"
        new java.io.File(root).mkdirs()
        java.nio.file.Files.writeString(java.nio.file.Paths.get(idx1),
          files.take(math.max(files.length / 2, 1)).mkString("", "\n", "\n"))
        graft.sources.CdcFanout.appendTables(s, idx1, tables, s"$root/out")
        graft.sources.CdcFanout.appendTables(s, index, tables, s"$root/out")
        new java.io.File(s"$root/_FANOUT").createNewFile()
        ()
      }
    }
    Map(
      (CdcFixture.Db, CdcFixture.Table) ->
        s"$root/out/${CdcFixture.Db}__${CdcFixture.Table}",
      (CdcFixture.Db, "audit") -> s"$root/out/${CdcFixture.Db}__audit")
  }

  /** The LAND-THEN-READ replication fixture: the mysql fixture's files
    * served by [[graft.cdc.FakeMysqld]] over the loopback socket — with
    * `caching_sha2_password` auth (the MySQL-8 default) and heartbeats
    * interleaved — consumed by [[graft.sources.ReplicaTail]]: raw event
    * bytes land in a binlog directory (O(one event) driver memory, no
    * row buffering), folded incrementally through the distributed
    * fan-out decode into a per-table parquet frame. Built once per JVM
    * per sfDir; returns the materialized orders-frame path. */
  private[queries] def ensureReplicaTail(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val root = graft.TmpDirs.scoped("graft-cdcrt-" + graft.TmpDirs.pathKey(dir))
    val lock = fanoutLocks.computeIfAbsent(root, _ => new Object)
    lock.synchronized {
      if (!new java.io.File(s"$root/_TAILED").exists()) {
        val index = CdcFixture.ensureMysql(s, dir)
        val files = graft.cdc.CdcCodec.readIndex(index)
        val srv = new graft.cdc.FakeMysqld(files, "repl", "s3cret",
          authPlugin = graft.cdc.MysqlReplica.Sha2Plugin,
          heartbeatEvery = 512)
        try {
          graft.sources.ReplicaTail.run(s, "127.0.0.1", srv.port,
            "repl", "s3cret", serverId = 4242L,
            tables = Seq((CdcFixture.Db, CdcFixture.Table)),
            landRoot = s"$root/land", outRoot = s"$root/out",
            maxBytesPerFold = 1L << 20)
          srv.firstFailure.foreach(t => throw t)
        } finally srv.close()
        new java.io.File(s"$root/_TAILED").createNewFile()
        ()
      }
    }
    s"$root/out/${CdcFixture.Db}__${CdcFixture.Table}"
  }

  /** Register (idempotently) a CdcTableCatalog over `index` and return
    * its name. One catalog per distinct log: Spark caches catalog
    * INSTANCES by name and a later conf.set never re-initializes one,
    * so the name embeds the sanitized path AND its hash — a collision
    * needs two paths agreeing on both, vs. the sanitized form alone
    * (`sf0.01` vs `sf0_01`) or a bare 32-bit hash. */
  private def cdcCatalog(s: org.apache.spark.sql.SparkSession, index: String): String = {
    val cat = "cdc_" + index.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + java.lang.Integer.toHexString(index.hashCode)
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.CdcTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.indexFile", index)
    cat
  }

  val defs: Seq[QDef] = Seq(

    // cdc01 through the MySQL v4 decoder: full scan, hash-compared to
    // the same oracle — schema inference (FULL-metadata column names),
    // the 19-byte header walk, CRC verification, TABLE_MAP/GTID state,
    // multi-row events, null bitmaps, and every column type in orders
    // all sit on this one hash
    QDef("cdc21_mysql_scan",
      s"${Cdc.eventsCte} SELECT * FROM cdc_tm") { (s, dir) => mysqlScan(s, dir) },

    // cdc01 again through MySQL 8.0 transaction compression: each
    // transaction's TABLE_MAP + rows events decode out of one zstd
    // TRANSACTION_PAYLOAD event — same storyline, same oracle hash, so
    // the compressed wire is provably lossless through the full DSv2
    // path (scan, filters, streaming offsets all outer-event-granular)
    QDef("cdc25_mysql_compressed",
      s"${Cdc.eventsCte} SELECT * FROM cdc_tm") { (s, dir) =>
      val index = CdcFixture.ensureMysqlZstd(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.Table)
        .option("binlogFormat", "mysql")
        .load()
    },

    // NEWDECIMAL on the real wire: a decimal-typed table (five
    // precision/scale shapes across the base-10^9 group boundaries, a
    // negative column, a nullable one) decoded from packed bytes and
    // hash-compared against DuckDB recomputing the same derivations.
    // Values are integer-derived (exact string→decimal casts — no
    // double rounding in either engine), and every decimal column is
    // compared as its canonical full-scale string because hash
    // canonicalization of >18-precision DECIMAL is representation-
    // sensitive across engines even when values agree. Inserts in
    // batches of 100, gno = batch index.
    QDef("cdc24_mysql_decimal",
      s"""WITH ord AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |), t AS (
         |  SELECT ${CdcFixture.DecimalDerivations.mkString(",\n  ")},
         |  idx FROM ord
         |)
         |SELECT ${CdcFixture.DecimalOutputCols.mkString(",\n  ")},
         |  1 AS __op,
         |  CAST(idx // 100 AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(CAST(idx // 100 AS BIGINT)) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM t""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlDecimal(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.DecimalTable)
        .option("binlogFormat", "mysql")
        .load()
        .selectExpr(CdcFixture.DecimalOutputCols ++
          Seq("__op", "__gtid", "__tm", "__source_id"): _*)
    },

    // UNSIGNED integers on the real wire: the SIGNEDNESS TLV drives
    // type widening (u8→SMALLINT, u16→INT, u32→BIGINT, u64→DECIMAL),
    // with u32/u64 values near their maxima so the narrow encoding's
    // sign bit is live, and a nullable unsigned column. u64 — the one
    // DECIMAL(20,0) — is compared as its canonical digit string (same
    // representation-robustness rationale as cdc24).
    QDef("cdc26_mysql_unsigned",
      s"""WITH ord AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |), t AS (
         |  SELECT ${CdcFixture.UnsignedDerivations.mkString(",\n  ")},
         |  idx FROM ord
         |)
         |SELECT ${CdcFixture.UnsignedOutputCols.mkString(",\n  ")},
         |  1 AS __op,
         |  CAST(idx // 100 AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(CAST(idx // 100 AS BIGINT)) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM t""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlUnsigned(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.UnsignedTable)
        .option("binlogFormat", "mysql")
        .load()
        .selectExpr(CdcFixture.UnsignedOutputCols ++
          Seq("__op", "__gtid", "__tm", "__source_id"): _*)
    },

    // CHAR columns on the real wire: MYSQL_TYPE_STRING's TABLE_MAP
    // metadata folds the declared length's high bits into the type
    // byte — CHAR(1), nullable CHAR(15), and a 300-byte CHAR hit both
    // sides of the folded-length encoding
    QDef("cdc27_mysql_char",
      s"""WITH ord AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |)
         |SELECT ${CdcFixture.CharDerivations.mkString(",\n  ")},
         |  1 AS __op,
         |  CAST(idx // 100 AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(CAST(idx // 100 AS BIGINT)) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM ord""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlChar(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.CharTable)
        .option("binlogFormat", "mysql")
        .load()
    },

    // JSON columns on the real wire: MYSQL_TYPE_JSON's binary document
    // format (json_binary.h — sorted-key containers with u16/u32 offset
    // tables, inline scalars, varlen strings) decoded to canonical
    // compact text. The fixture constructs the text in already-canonical
    // form, so the binary round-trip is the identity and DuckDB rebuilds
    // the same strings character-for-character: nested/empty containers,
    // int16-inline array elements, int64 members, doubles, a >127-byte
    // string, scalar and array roots, and a nullable JSON column all sit
    // on this hash.
    QDef("cdc28_mysql_json",
      s"""WITH ord AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |)
         |SELECT ${CdcFixture.JsonDerivations.mkString(",\n  ")},
         |  1 AS __op,
         |  CAST(idx // 100 AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(CAST(idx // 100 AS BIGINT)) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM ord""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlJson(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.JsonTable)
        .option("binlogFormat", "mysql")
        .load()
    },

    // JSON consumption over the CDC stream: the decoded JSON column fed
    // through Spark's codegen'd get_json_object (path extraction of
    // strings, nested members, array elements, nested objects, and a
    // numeric cast) — DuckDB re-parses the same documents with its own
    // JSON reader, so the hash proves two independent JSON parsers agree
    // on every extracted value. This is the "query the JSON payload"
    // shape a real CDC consumer runs constantly.
    QDef("cdc29_mysql_json_extract",
      s"""WITH ord AS (
         |  SELECT * FROM orders
         |), j AS (
         |  SELECT o_orderkey, ${CdcFixture.JsonDerivations(1)}
         |  FROM ord
         |)
         |SELECT o_orderkey,
         |  json_extract_string(jdoc, '$$.st') AS st,
         |  json_extract_string(jdoc, '$$.meta.pri') AS pri,
         |  json_extract_string(jdoc, '$$.tags[0]') AS t0,
         |  json_extract_string(jdoc, '$$.meta.em') AS em,
         |  CAST(json_extract_string(jdoc, '$$.big') AS BIGINT) AS big
         |FROM j WHERE jdoc IS NOT NULL""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlJson(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.JsonTable)
        .option("binlogFormat", "mysql")
        .load()
        .filter(col("jdoc").isNotNull)
        .select(col("o_orderkey"),
          get_json_object(col("jdoc"), "$.st").as("st"),
          get_json_object(col("jdoc"), "$.meta.pri").as("pri"),
          get_json_object(col("jdoc"), "$.tags[0]").as("t0"),
          get_json_object(col("jdoc"), "$.meta.em").as("em"),
          get_json_object(col("jdoc"), "$.big").cast("bigint").as("big"))
    },

    // ENUM/SET columns on the real wire: 1/2-byte member indexes and a
    // member bitmask packed in a STRING slot, unfolded via the metadata
    // real-type bytes, with member lists from the ENUM/SET_STR_VALUE
    // TLVs driving label decode. The oracle recomputes the same labels
    // and comma-joined memberships from orders — ENUM with 3 and 5
    // members, a nullable ENUM, and a 4-member SET with every subset
    // shape (incl. empty) sit on this hash.
    QDef("cdc30_mysql_enum",
      s"""WITH ord AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |)
         |SELECT ${CdcFixture.EnumDerivations.mkString(",\n  ")},
         |  1 AS __op,
         |  CAST(idx // 100 AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(CAST(idx // 100 AS BIGINT)) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM ord""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlEnum(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.EnumTable)
        .option("binlogFormat", "mysql")
        .load()
    },

    // YEAR/BIT/TIME columns on the real wire: the offset-1900 year
    // byte (with the literal-0000 zero), big-endian bitfields at both
    // a sub-byte width and the full 64 bits, and TIME2's offset-binary
    // signed duration with live sign and fractional bits. All integer
    // arithmetic — the oracle recomputes identical values in DuckDB.
    QDef("cdc31_mysql_year_bit_time",
      s"""WITH ord AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |)
         |SELECT ${CdcFixture.YearBitTimeDerivations.mkString(",\n  ")},
         |  1 AS __op,
         |  CAST(idx // 100 AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(CAST(idx // 100 AS BIGINT)) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM ord""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlYearBitTime(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.YearBitTimeTable)
        .option("binlogFormat", "mysql")
        .load()
    },

    // MEDIUMINT + the legacy temporal encodings on the real wire:
    // INT24's 3-byte two's complement (signed near ±max, unsigned near
    // 2^24-1, nullable), legacy TIME's ±HHMMSS 3-byte LE, legacy
    // DATETIME's 8-byte decimal YYYYMMDDHHMMSS, legacy TIMESTAMP's
    // 4-byte unix seconds. Integer columns share the derivation text
    // with the oracle; the timestamp constructors are per-engine
    // (make_timestamp_ntz has no DuckDB spelling) but whole-second, so
    // values agree exactly.
    QDef("cdc32_mysql_mediumint_legacy_temporals",
      s"""WITH ord AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |)
         |SELECT o_orderkey,
         |  ${CdcFixture.LegacyIntDerivations.mkString(",\n  ")},
         |  CASE WHEN o_orderkey % 11 = 7 THEN NULL ELSE
         |    make_timestamp(1997, 1 + o_orderkey % 12, 1 + o_orderkey % 28,
         |      o_orderkey % 24, o_orderkey % 60, o_orderkey % 60) END AS dt_old,
         |  TIMESTAMP '2023-11-14 22:13:20' + to_seconds(CAST(o_orderkey % 100000 AS BIGINT)) AS ts_old,
         |  1 AS __op,
         |  CAST(idx // 100 AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(CAST(idx // 100 AS BIGINT)) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM ord""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlLegacy(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.LegacyTable)
        .option("binlogFormat", "mysql")
        .load()
    },

    // cdc21 again under binlog_row_metadata=MINIMAL — the mysqld
    // PRODUCTION DEFAULT (no column names or ENUM/SET label lists on
    // the wire; SIGNEDNESS is still logged, as real mysqld does even
    // under MINIMAL): the reader supplies the schema explicitly and the
    // decoder matches positionally by type; same storyline, same oracle
    // hash
    QDef("cdc34_mysql_minimal_metadata",
      s"${Cdc.eventsCte} SELECT * FROM cdc_tm") { (s, dir) =>
      val index = CdcFixture.ensureMysqlMinimal(s, dir)
      val base = s.read.parquet(s"$dir/orders.parquet").schema
      val schema = org.apache.spark.sql.types.StructType(
        base.fields.map(_.copy(nullable = true)))
      s.read.format("binlogcdc")
        .schema(CdcSchema.withEnvelope(schema))
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.Table)
        .option("binlogFormat", "mysql")
        .load()
    },

    // TIME2's sub-fsp6 storage forms on the real wire: fsp 0 (the
    // mysqld default for plain TIME), 1, 3, 4 (signed frac byte/short
    // with the intpart++ negative-fraction seam), and 5 (6-byte
    // combined) — including sub-second negatives whose integer part is
    // zero. All integer arithmetic, recomputed identically by DuckDB.
    QDef("cdc33_mysql_time_fsp",
      s"""WITH ord AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |)
         |SELECT ${CdcFixture.TimeFspDerivations.mkString(",\n  ")},
         |  1 AS __op,
         |  CAST(idx // 100 AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(CAST(idx // 100 AS BIGINT)) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM ord""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlTimeFsp(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.TimeFspTable)
        .option("binlogFormat", "mysql")
        .load()
    },

    // DATETIME2/TIMESTAMP2 sub-fsp6 fractional seconds on the real
    // wire: the fraction is stored in ceil(fsp/2) BE bytes whose unit
    // follows the BYTE count (1 byte = centiseconds, 2 = hundred-µs,
    // 3 = µs), so the odd fsps 1/3/5 are the seam where a digits-based
    // decode is off by 10x — DATETIME(3) is the common production
    // shape. Full microsecond fidelity against the DuckDB oracle.
    QDef("cdc35_mysql_datetime_fsp",
      s"""WITH ord AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |)
         |SELECT o_orderkey,
         |  TIMESTAMP '1997-03-05 00:00:00' + to_seconds(CAST(o_orderkey % 86400 AS BIGINT)) AS dt0,
         |  TIMESTAMP '1997-03-05 00:00:00' + to_microseconds(CAST((o_orderkey % 3600) * 1000000 + (o_orderkey % 10) * 100000 AS BIGINT)) AS dt1,
         |  CASE WHEN o_orderkey % 9 = 4 THEN NULL ELSE
         |    TIMESTAMP '1997-03-05 00:00:00' + to_microseconds(CAST((o_orderkey % 86400) * 1000000 + (o_orderkey % 1000) * 1000 AS BIGINT)) END AS dt3,
         |  TIMESTAMP '1997-03-05 00:00:00' + to_microseconds(CAST((o_orderkey % 86400) * 1000000 + (o_orderkey % 10000) * 100 AS BIGINT)) AS dt4,
         |  TIMESTAMP '1997-03-05 00:00:00' + to_microseconds(CAST((o_orderkey % 86400) * 1000000 + o_orderkey * 31 % 1000000 AS BIGINT)) AS dt6,
         |  TIMESTAMP '2023-11-14 22:13:20' + to_microseconds(CAST((o_orderkey % 100000) * 1000000 + (o_orderkey % 10) * 100000 AS BIGINT)) AS ts1,
         |  TIMESTAMP '2023-11-14 22:13:20' + to_microseconds(CAST((o_orderkey % 100000) * 1000000 + (o_orderkey % 1000) * 1000 AS BIGINT)) AS ts3,
         |  TIMESTAMP '2023-11-14 22:13:20' + to_microseconds(CAST((o_orderkey % 100000) * 1000000 + (o_orderkey % 100000) * 10 AS BIGINT)) AS ts5,
         |  CASE WHEN o_orderkey % 7 = 2 THEN NULL ELSE
         |    TIMESTAMP '2023-11-14 22:13:20' + to_microseconds(CAST((o_orderkey % 100000) * 1000000 + o_orderkey * 97 % 1000000 AS BIGINT)) END AS ts6,
         |  1 AS __op,
         |  CAST(idx // 100 AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(CAST(idx // 100 AS BIGINT)) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM ord""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlDtFsp(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.DtFspTable)
        .option("binlogFormat", "mysql")
        .load()
    },

    // cdc30's ENUM/SET wire bytes under binlog_row_metadata=MINIMAL
    // (the mysqld production default): no ENUM/SET_STR_VALUE label TLVs
    // and no COLUMN_NAME on the wire, so the decoder surfaces the
    // documented RAW values — the 1-based member index (INT) for ENUM,
    // the member bitmask (BIGINT, LSB = first member) for SET. The
    // oracle recomputes exactly those integers from orders.
    QDef("cdc36_mysql_enum_minimal_metadata",
      s"""WITH ord AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |)
         |SELECT o_orderkey,
         |  CAST(CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 WHEN 'P' THEN 3 END AS INT) AS status_e,
         |  CAST(CASE WHEN o_orderkey % 11 = 5 THEN NULL
         |       ELSE CAST(substr(o_orderpriority, 1, 1) AS INT) END AS INT) AS prio_e,
         |  CAST(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END
         |     + CASE WHEN o_orderkey % 3 = 1 THEN 2 ELSE 0 END
         |     + CASE WHEN o_orderkey % 5 = 1 THEN 4 ELSE 0 END
         |     + CASE WHEN o_orderkey % 7 = 1 THEN 8 ELSE 0 END AS BIGINT) AS flags_s,
         |  1 AS __op,
         |  CAST(idx // 100 AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(CAST(idx // 100 AS BIGINT)) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM ord""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlEnumMinimalMeta(s, dir)
      // MINIMAL metadata ships no names: the reader supplies the schema
      // (positional type matching), typed at the raw-value surface
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("status_e",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("prio_e",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("flags_s",
          org.apache.spark.sql.types.LongType)))
      s.read.format("binlogcdc")
        .schema(CdcSchema.withEnvelope(schema))
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.EnumTable)
        .option("binlogFormat", "mysql")
        .load()
    },

    // binlog_row_image=MINIMAL (the at-scale production setting):
    // UPDATE before images carry only the PK, after images the PK +
    // changed columns, DELETE images only the PK. The projection-exact
    // decode policy means the PK+envelope projection — all the thinned
    // images carry — reads the full op/gtid storyline; selecting a
    // thinned column fails loud (GoldenPolicySpec). The pruned scan is
    // also the scale shape: only PK bytes are ever materialized.
    QDef("cdc37_mysql_minimal_row_image",
      s"""WITH ord AS (
         |  SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |),
         |up AS (
         |  SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS uidx
         |  FROM ord WHERE o_orderkey % 3 = 0
         |),
         |del AS (
         |  SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS didx
         |  FROM ord WHERE o_orderkey % 7 = 0
         |),
         |ev AS (
         |  SELECT o_orderkey, 1 AS __op, CAST(idx // 100 AS BIGINT) AS g FROM ord
         |  UNION ALL SELECT o_orderkey, 2 AS __op, CAST(100000 + uidx // 100 AS BIGINT) FROM up
         |  UNION ALL SELECT o_orderkey, 3 AS __op, CAST(100000 + uidx // 100 AS BIGINT) FROM up
         |  UNION ALL SELECT o_orderkey, 0 AS __op, CAST(200000 + didx // 100 AS BIGINT) FROM del
         |)
         |SELECT o_orderkey, __op, g AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(g) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM ev""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlMinimalImage(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.MinImageTable)
        .option("binlogFormat", "mysql")
        .load()
        .select(col("o_orderkey"), col(CdcSchema.OpCol),
          col(CdcSchema.GtidCol), col(CdcSchema.TmCol),
          col(CdcSchema.SourceIdCol))
    },

    // the FULL production statement framing: GTID → QUERY(BEGIN) →
    // TABLE_MAP → rows → XID per transaction, DDL statements (own GTID
    // scope, no XID) interleaved between them. Driver-checks the
    // identity-scope rules the decoder enforces: BEGIN must not close
    // the scope, every DDL consumes its gno (a DDL gno stamped on any
    // row would hash-mismatch here), XID closes before the next GTID.
    QDef("cdc38_mysql_ddl_scope",
      s"""WITH ord AS (
         |  SELECT o_orderkey, CAST(o_orderkey % 1000 AS BIGINT) AS val,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |),
         |up AS (
         |  SELECT o_orderkey, val, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS uidx
         |  FROM ord WHERE o_orderkey % 3 = 0
         |),
         |ev AS (
         |  SELECT o_orderkey, val, 1 AS __op, CAST(idx // 100 AS BIGINT) AS g FROM ord
         |  UNION ALL SELECT o_orderkey, val, 2 AS __op, CAST(100000 + uidx // 100 AS BIGINT) FROM up
         |  UNION ALL SELECT o_orderkey, val + 1000, 3 AS __op, CAST(100000 + uidx // 100 AS BIGINT) FROM up
         |)
         |SELECT o_orderkey, val, __op, g AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(g) AS __tm,
         |  '${CdcFixture.SourceId}' AS __source_id
         |FROM ev""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlDdlScope(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.DdlScopeTable)
        .option("binlogFormat", "mysql")
        .load()
        .select(col("o_orderkey"), col("val"), col(CdcSchema.OpCol),
          col(CdcSchema.GtidCol), col(CdcSchema.TmCol),
          col(CdcSchema.SourceIdCol))
    },

    // ROWS_QUERY passthrough (binlog_rows_query_log_events=ON): with
    // rowsQuery=true the nullable __query envelope column carries each
    // statement's original SQL, stamped on every row the statement
    // produced — and NULL for transactions whose producer session had
    // the flag off (every 4th insert batch in the fixture). A statement
    // leaking onto another transaction's rows, or a flag-off NULL
    // filled with a stale statement, hash-mismatches here.
    QDef("cdc39_mysql_rows_query",
      """WITH ord AS (
        |  SELECT o_orderkey, CAST(o_orderkey % 1000 AS BIGINT) AS val,
        |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
        |),
        |up AS (
        |  SELECT o_orderkey, val, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS uidx
        |  FROM ord WHERE o_orderkey % 3 = 0
        |),
        |ev AS (
        |  SELECT o_orderkey, val, 1 AS __op, CAST(idx // 100 AS BIGINT) AS g,
        |    CASE WHEN (idx // 100) % 4 = 3 THEN NULL
        |      ELSE 'INSERT INTO qorders /* batch ' || CAST(idx // 100 AS VARCHAR) || ' */'
        |    END AS __query
        |  FROM ord
        |  UNION ALL SELECT o_orderkey, val, 2, CAST(100000 + uidx // 100 AS BIGINT),
        |    'UPDATE qorders SET val = val + 1000 /* batch ' || CAST(uidx // 100 AS VARCHAR) || ' */'
        |  FROM up
        |  UNION ALL SELECT o_orderkey, val + 1000, 3, CAST(100000 + uidx // 100 AS BIGINT),
        |    'UPDATE qorders SET val = val + 1000 /* batch ' || CAST(uidx // 100 AS VARCHAR) || ' */'
        |  FROM up
        |)
        |SELECT o_orderkey, val, __op, g AS __gtid, __query FROM ev""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlRowsQuery(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.RowsQueryTable)
        .option("binlogFormat", "mysql")
        .option("rowsQuery", "true")
        .load()
        .select(col("o_orderkey"), col("val"), col(CdcSchema.OpCol),
          col(CdcSchema.GtidCol), col(CdcSchema.QueryCol))
    },

    // DSv2 TableCatalog surface: pure-SQL access to the log's tables
    // with no per-table registration (the reference's CREATE TABLE ...
    // ENGINE=BINLOGDB surface, minus the DDL) — `cdc.<db>.<table>`
    // resolves through CdcTableCatalog, schema inferred from the log's
    // own TABLE_MAPs, and the WHERE __op pushdown still reaches the
    // byte decoder through the catalog path.
    QDef("cdc40_catalog_sql",
      s"""${Cdc.eventsCte}
         |SELECT o_orderkey, o_totalprice, __op, __gtid
         |FROM cdc_tm WHERE __op = 1""".stripMargin) { (s, dir) =>
      val cat = cdcCatalog(s, CdcFixture.ensure(s, dir))
      s.sql(s"""SELECT o_orderkey, o_totalprice, __op, __gtid
               |FROM $cat.${CdcFixture.Db}.${CdcFixture.Table}
               |WHERE __op = 1""".stripMargin)
    },

    // SQL time travel through the catalog: VERSION AS OF <gno> is the
    // log's own version axis (the event prefix up to transaction gno —
    // cdc09's as-of snapshot is this plus latest-image compaction).
    // The bound enters the scan as a base pushed filter, so
    // sidecar/PREVIOUS_GTIDS pruning skips files wholly past the
    // requested point: time travel deep into a 100 TB log reads the
    // prefix, not the log.
    QDef("cdc41_catalog_time_travel",
      s"""${Cdc.eventsCte}
         |SELECT o_orderkey, o_totalprice, __op, __gtid
         |FROM cdc_tm WHERE __gtid <= 1000750""".stripMargin) { (s, dir) =>
      val cat = cdcCatalog(s, CdcFixture.ensure(s, dir))
      s.sql(s"""SELECT o_orderkey, o_totalprice, __op, __gtid
               |FROM $cat.${CdcFixture.Db}.${CdcFixture.Table}
               |VERSION AS OF 1000750""".stripMargin)
    },

    // startingGtid: "consume changes AFTER transaction G" (exclusive)
    // — the Kafka startingOffsets analogue. The bound is a base pushed
    // filter, so batch scans prune prefix files by sidecar gtid bounds
    // and a FRESH stream's initial offset starts at the first
    // possibly-relevant file instead of replaying the log (spec'd at
    // the stream level; this oracle pins the option's row semantics).
    QDef("cdc42_starting_gtid",
      s"""${Cdc.eventsCte}
         |SELECT o_orderkey, o_totalprice, __op, __gtid
         |FROM cdc_tm WHERE __gtid > 1000200""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensure(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.Table)
        .option("startingGtid", "1000200")
        .load()
        .select(col("o_orderkey"), col("o_totalprice"), col(CdcSchema.OpCol),
          col(CdcSchema.GtidCol))
    },

    // startingTimestamp: the __tm twin of cdc42 — "consume changes
    // stamped at or after T" (INCLUSIVE epoch micros, Kafka's
    // startingTimestamp convention). Same base-pushed-filter machinery,
    // so sidecar __tm bounds prune prefix files for batch scans and the
    // fresh stream's initial offset alike (stream-level prefix skip
    // spec'd in CdcSourceSpec; this oracle pins inclusive-bound row
    // semantics). The bound lands mid-insert-phase exactly ON insert
    // batch gno 100 (batch gnos are DENSE at every SF, so the boundary
    // event always exists): a fencepost error (exclusive >) drops that
    // whole 10-row insert batch and hash-mismatches.
    QDef("cdc45_starting_timestamp",
      s"""${Cdc.eventsCte}
         |SELECT o_orderkey, o_totalprice, __op, __gtid, __tm
         |FROM cdc_tm
         |WHERE __tm >= TIMESTAMP '2024-01-01 00:00:00' + to_seconds(100)"""
        .stripMargin) { (s, dir) =>
      val index = CdcFixture.ensure(s, dir)
      val tMicros = (CdcFixture.BaseMs / 1000 + 100L) * 1000000L
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.Table)
        .option("startingTimestamp", tMicros.toString)
        .load()
        .select(col("o_orderkey"), col("o_totalprice"), col(CdcSchema.OpCol),
          col(CdcSchema.GtidCol), col(CdcSchema.TmCol))
    },

    // binlog_row_image=NOBLOB, the second partial-image mode: images
    // carry every NON-blob column (vs MINIMAL's PK-only), so the `val`
    // storyline is readable across before images, updates, and deletes
    // — exactly what this oracle hash-checks, including phase-2 blob
    // updates whose before/after `val` reflects phase 1's +1000 on
    // %3==0 rows. A decoder that thinned like MINIMAL (PK only) or
    // un-thinned the blob would fail loud / hash-mismatch. The payload
    // column is never selected: projection-exact decode skips the blob
    // bytes entirely (GoldenPolicySpec pins the fail-loud direction).
    QDef("cdc46_mysql_noblob_row_image",
      s"""WITH ord AS (
         |  SELECT o_orderkey, CAST(o_orderkey % 1000 AS BIGINT) AS val0,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |),
         |up AS (
         |  SELECT o_orderkey, val0,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS uidx
         |  FROM ord WHERE o_orderkey % 3 = 0
         |),
         |bup AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 3 = 0 THEN val0 + 1000 ELSE val0 END AS cur,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS vidx
         |  FROM ord WHERE o_orderkey % 5 = 0
         |),
         |del AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 3 = 0 THEN val0 + 1000 ELSE val0 END AS cur,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS didx
         |  FROM ord WHERE o_orderkey % 7 = 0
         |),
         |ev AS (
         |  SELECT o_orderkey, val0 AS val, 1 AS __op, CAST(idx // 100 AS BIGINT) AS g FROM ord
         |  UNION ALL SELECT o_orderkey, val0, 2, CAST(100000 + uidx // 100 AS BIGINT) FROM up
         |  UNION ALL SELECT o_orderkey, val0 + 1000, 3, CAST(100000 + uidx // 100 AS BIGINT) FROM up
         |  UNION ALL SELECT o_orderkey, cur, 2, CAST(150000 + vidx // 100 AS BIGINT) FROM bup
         |  UNION ALL SELECT o_orderkey, cur, 3, CAST(150000 + vidx // 100 AS BIGINT) FROM bup
         |  UNION ALL SELECT o_orderkey, cur, 0, CAST(200000 + didx // 100 AS BIGINT) FROM del
         |)
         |SELECT o_orderkey, val, __op, g AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(g) AS __tm
         |FROM ev""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlNoblobImage(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.NoblobTable)
        .option("binlogFormat", "mysql")
        .load()
        .select(col("o_orderkey"), col("val"), col(CdcSchema.OpCol),
          col(CdcSchema.GtidCol), col(CdcSchema.TmCol))
    },

    // schema-drift epochs on the REAL MySQL wire format (round 11 —
    // previously a gcdc-only feature): the log ALTERs vorders mid-file,
    // and epoch 2 is a genuine PERMUTATION of epoch 1 (extra added at
    // the front, v renamed to price), so the name-matched remap moves
    // every surviving column to a different index. FULL row metadata
    // carries the names; epoch-1 rows surface (null, k, keep, null)
    // against the newest schema. A positional (non-remapped) decode
    // would read k's bytes into extra and hash-mismatch instantly.
    QDef("cdc47_mysql_drift_epochs",
      """WITH e1 AS (
        |  SELECT o_orderkey,
        |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx
        |  FROM orders WHERE o_orderkey % 50 = 0),
        |e2 AS (
        |  SELECT o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx
        |  FROM orders WHERE o_orderkey % 50 = 25),
        |up AS (
        |  SELECT o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS uidx
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT CAST(NULL AS BIGINT) AS extra, o_orderkey AS k,
        |  'k' || CAST(o_orderkey AS VARCHAR) AS keep,
        |  CAST(NULL AS DOUBLE) AS price,
        |  CAST(1 AS INTEGER) AS __op, CAST(idx AS BIGINT) AS __gtid
        |FROM e1
        |UNION ALL
        |SELECT o_orderkey * 3, o_orderkey, 'k' || CAST(o_orderkey AS VARCHAR),
        |  o_totalprice * 2, CAST(1 AS INTEGER), CAST(100000 + idx AS BIGINT)
        |FROM e2
        |UNION ALL
        |SELECT CAST(NULL AS BIGINT), o_orderkey, 'k' || CAST(o_orderkey AS VARCHAR),
        |  o_totalprice, CAST(2 AS INTEGER), CAST(200000 + uidx AS BIGINT)
        |FROM up
        |UNION ALL
        |SELECT o_orderkey * 7, o_orderkey, 'k' || CAST(o_orderkey AS VARCHAR),
        |  o_totalprice * 5, CAST(3 AS INTEGER), CAST(200000 + uidx AS BIGINT)
        |FROM up""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlDrifted(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.MysqlEvolvingTable)
        .option("binlogFormat", "mysql")
        .option("schemaDrift", "epochs")
        .load()
        .select(col("extra"), col("k"), col("keep"), col("price"),
          col(CdcSchema.OpCol), col(CdcSchema.GtidCol))
    },

    // latest-image compaction ACROSS the ALTER boundary — the
    // production materialization over a drifted log: updated epoch-1
    // keys surface the post-ALTER after image (extra=k*7, price=p*5),
    // untouched epoch-1 keys the epoch-remapped nulls, epoch-2 inserts
    // their full values. One max_by aggregation over the epoch-shaped
    // stream; the remap and the compaction compose with no special
    // casing.
    QDef("cdc48_mysql_drift_latest_image",
      """WITH ord AS (SELECT o_orderkey, o_totalprice FROM orders)
        |SELECT CASE WHEN o_orderkey % 100 = 0 THEN o_orderkey * 7 END AS extra,
        |  o_orderkey AS k, 'k' || CAST(o_orderkey AS VARCHAR) AS keep,
        |  CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 5 END AS price
        |FROM ord WHERE o_orderkey % 50 = 0
        |UNION ALL
        |SELECT o_orderkey * 3, o_orderkey, 'k' || CAST(o_orderkey AS VARCHAR),
        |  o_totalprice * 2
        |FROM ord WHERE o_orderkey % 50 = 25""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlDrifted(s, dir)
      val cdc = s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.MysqlEvolvingTable)
        .option("binlogFormat", "mysql")
        .option("schemaDrift", "epochs")
        .load()
      Cdc.latestImage(cdc, Seq("k"))
        .select(col("extra"), col("k"), col("keep"), col("price"))
    },

    // MySQL 8.3+ tagged GTIDs (GTID_TAGGED_LOG_EVENT, type 42): insert
    // txns rotate untagged / :etl / :repair identity streams — each
    // with its OWN gno counter — and the update phase runs entirely
    // under :repair (maintenance traffic tagged out-of-band, the
    // pattern tags exist for). The oracle recomputes every row's
    // `uuid:tag` __source_id and per-stream gno: a tag dropped, a
    // stale identity stamped, or streams' gnos collapsed into one
    // counter all hash-mismatch.
    QDef("cdc43_mysql_tagged_gtid",
      s"""WITH ord AS (
         |  SELECT o_orderkey, CAST(o_orderkey % 1000 AS BIGINT) AS val,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |),
         |ins AS (
         |  SELECT o_orderkey, val, CAST(idx // 100 AS BIGINT) AS b FROM ord
         |),
         |up AS (
         |  SELECT o_orderkey, val,
         |    CAST(100000 + (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // 100 AS BIGINT) AS g
         |  FROM ord WHERE o_orderkey % 3 = 0
         |),
         |ev AS (
         |  SELECT o_orderkey, val, 1 AS __op, b // 3 + 1 AS g, b AS tsg,
         |    CASE CAST(b % 3 AS INTEGER)
         |      WHEN 0 THEN '${CdcFixture.SourceId}'
         |      WHEN 1 THEN '${CdcFixture.SourceId}:etl'
         |      ELSE '${CdcFixture.SourceId}:repair' END AS src
         |  FROM ins
         |  UNION ALL SELECT o_orderkey, val, 2, g, g,
         |    '${CdcFixture.SourceId}:repair' FROM up
         |  UNION ALL SELECT o_orderkey, val + 1000, 3, g, g,
         |    '${CdcFixture.SourceId}:repair' FROM up
         |)
         |SELECT o_orderkey, val, __op, CAST(g AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(tsg) AS __tm,
         |  src AS __source_id
         |FROM ev""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlTagged(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.TaggedTable)
        .option("binlogFormat", "mysql")
        .load()
        .select(col("o_orderkey"), col("val"), col(CdcSchema.OpCol),
          col(CdcSchema.GtidCol), col(CdcSchema.TmCol),
          col(CdcSchema.SourceIdCol))
    },

    // cdc43's log with startingGtid: the tagged fixture ROTATES (file 0
    // tops out at stream gno 10 at every SF), and each file opens with
    // the 8.3+ TAGGED-format PREVIOUS_GTIDS — so "resume after
    // transaction 10" both prunes file 0 whole off the tagged metadata
    // (partition counts pinned in MysqlBinlogSpec) and filters rows by
    // gno across all three identity streams. A reader that can't parse
    // the tagged set degrades to full-log decode (round-11 behavior);
    // one that misparses it mis-prunes and hash-mismatches here.
    QDef("cdc49_mysql_tagged_starting_gtid",
      s"""WITH ord AS (
         |  SELECT o_orderkey, CAST(o_orderkey % 1000 AS BIGINT) AS val,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |),
         |ins AS (
         |  SELECT o_orderkey, val, CAST(idx // 100 AS BIGINT) AS b FROM ord
         |),
         |up AS (
         |  SELECT o_orderkey, val,
         |    CAST(100000 + (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // 100 AS BIGINT) AS g
         |  FROM ord WHERE o_orderkey % 3 = 0
         |),
         |ev AS (
         |  SELECT o_orderkey, val, 1 AS __op, b // 3 + 1 AS g, b AS tsg,
         |    CASE CAST(b % 3 AS INTEGER)
         |      WHEN 0 THEN '${CdcFixture.SourceId}'
         |      WHEN 1 THEN '${CdcFixture.SourceId}:etl'
         |      ELSE '${CdcFixture.SourceId}:repair' END AS src
         |  FROM ins
         |  UNION ALL SELECT o_orderkey, val, 2, g, g,
         |    '${CdcFixture.SourceId}:repair' FROM up
         |  UNION ALL SELECT o_orderkey, val + 1000, 3, g, g,
         |    '${CdcFixture.SourceId}:repair' FROM up
         |)
         |SELECT o_orderkey, val, __op, CAST(g AS BIGINT) AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(tsg) AS __tm,
         |  src AS __source_id
         |FROM ev WHERE g > 10""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlTagged(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.TaggedTable)
        .option("binlogFormat", "mysql")
        .option("startingGtid", "10")
        .load()
        .select(col("o_orderkey"), col("val"), col(CdcSchema.OpCol),
          col(CdcSchema.GtidCol), col(CdcSchema.TmCol),
          col(CdcSchema.SourceIdCol))
    },

    // MariaDB (binlogFormat=mariadb): the most-deployed MySQL fork's
    // identity layer end-to-end — GTID events carry domain-server-seq
    // triples AND open the transaction (no BEGIN query event), inserts
    // rotate between two multi-master servers in domain 0 (so
    // __source_id flips `0-101`/`0-102` batch by batch), standalone
    // DDL gtids consume their own domain-1 seqs (none may ever stamp a
    // row), and rows ship in the V1 event layout. The oracle recomputes
    // every row's op, per-domain seq, timestamp, and domain-server
    // identity from orders; a dropped tag-in, stale scope, or V1
    // post-header misparse hash-mismatches.
    QDef("cdc50_mariadb",
      s"""WITH ord AS (
         |  SELECT o_orderkey, CAST(o_orderkey % 1000 AS BIGINT) AS val0,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |),
         |up AS (
         |  SELECT o_orderkey, val0,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS uidx
         |  FROM ord WHERE o_orderkey % 3 = 0
         |),
         |del AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 3 = 0 THEN val0 + 1000 ELSE val0 END AS cur,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS didx
         |  FROM ord WHERE o_orderkey % 7 = 0
         |),
         |ev AS (
         |  SELECT o_orderkey, val0 AS val, 1 AS __op,
         |    CAST(idx // 100 + 1 AS BIGINT) AS g, idx // 100 AS tsg,
         |    CASE WHEN CAST(idx // 100 AS INTEGER) % 2 = 0
         |      THEN '0-101' ELSE '0-102' END AS src
         |  FROM ord
         |  UNION ALL SELECT o_orderkey, val0, 2,
         |    CAST(100000 + uidx // 100 AS BIGINT), 100000 + uidx // 100,
         |    '0-102' FROM up
         |  UNION ALL SELECT o_orderkey, val0 + 1000, 3,
         |    CAST(100000 + uidx // 100 AS BIGINT), 100000 + uidx // 100,
         |    '0-102' FROM up
         |  UNION ALL SELECT o_orderkey, cur, 0,
         |    CAST(200000 + didx // 100 AS BIGINT), 200000 + didx // 100,
         |    '0-101' FROM del
         |)
         |SELECT o_orderkey, val, __op, g AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(tsg) AS __tm,
         |  src AS __source_id
         |FROM ev""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMaria(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.MariaTable)
        .option("binlogFormat", "mariadb")
        .load()
        .select(col("o_orderkey"), col("val"), col(CdcSchema.OpCol),
          col(CdcSchema.GtidCol), col(CdcSchema.TmCol),
          col(CdcSchema.SourceIdCol))
    },

    // cdc50's log with startingGtid: "resume after domain-0 seq 30" —
    // the maria fixture rotates after insert batch 30 (file 0 tops out
    // at domain-0 seq 30 / domain-1 seq 1 at every SF — only the i=19
    // DDL precedes the rotation), so the
    // GTID_LIST metadata prunes file 0 whole (partition counts pinned
    // in MysqlBinlogSpec) while rows filter by seq across domains. The
    // fork twin of cdc49: a reader that misparsed GTID_LIST would
    // mis-prune and hash-mismatch here.
    QDef("cdc51_mariadb_starting_gtid",
      s"""WITH ord AS (
         |  SELECT o_orderkey, CAST(o_orderkey % 1000 AS BIGINT) AS val0,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |),
         |up AS (
         |  SELECT o_orderkey, val0,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS uidx
         |  FROM ord WHERE o_orderkey % 3 = 0
         |),
         |del AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 3 = 0 THEN val0 + 1000 ELSE val0 END AS cur,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS didx
         |  FROM ord WHERE o_orderkey % 7 = 0
         |),
         |ev AS (
         |  SELECT o_orderkey, val0 AS val, 1 AS __op,
         |    CAST(idx // 100 + 1 AS BIGINT) AS g, idx // 100 AS tsg,
         |    CASE WHEN CAST(idx // 100 AS INTEGER) % 2 = 0
         |      THEN '0-101' ELSE '0-102' END AS src
         |  FROM ord
         |  UNION ALL SELECT o_orderkey, val0, 2,
         |    CAST(100000 + uidx // 100 AS BIGINT), 100000 + uidx // 100,
         |    '0-102' FROM up
         |  UNION ALL SELECT o_orderkey, val0 + 1000, 3,
         |    CAST(100000 + uidx // 100 AS BIGINT), 100000 + uidx // 100,
         |    '0-102' FROM up
         |  UNION ALL SELECT o_orderkey, cur, 0,
         |    CAST(200000 + didx // 100 AS BIGINT), 200000 + didx // 100,
         |    '0-101' FROM del
         |)
         |SELECT o_orderkey, val, __op, g AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(tsg) AS __tm,
         |  src AS __source_id
         |FROM ev WHERE g > 30""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMaria(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.MariaTable)
        .option("binlogFormat", "mariadb")
        .option("startingGtid", "30")
        .load()
        .select(col("o_orderkey"), col("val"), col(CdcSchema.OpCol),
          col(CdcSchema.GtidCol), col(CdcSchema.TmCol),
          col(CdcSchema.SourceIdCol))
    },

    // log_bin_compress=ON: cdc50's exact storyline with every rows
    // event shipped as its MariaDB compressed variant (types 166-168 —
    // V1 post-header plain, width+bitmaps+images as one zlib record)
    // and the DDL statements as compressed QUERY (165). The oracle is
    // cdc50's verbatim, so any divergence — a wrong compressed-record
    // boundary, a mis-inflated body, a DDL seq leaking onto rows — is
    // the compression layer's fault alone and hash-mismatches. The
    // byte layout itself is additionally pinned against hand-authored
    // golden vectors in MariaCompressedSpec (python-zlib streams, not
    // this repo's writer).
    QDef("cdc52_mariadb_compressed",
      s"""WITH ord AS (
         |  SELECT o_orderkey, CAST(o_orderkey % 1000 AS BIGINT) AS val0,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
         |),
         |up AS (
         |  SELECT o_orderkey, val0,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS uidx
         |  FROM ord WHERE o_orderkey % 3 = 0
         |),
         |del AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 3 = 0 THEN val0 + 1000 ELSE val0 END AS cur,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS didx
         |  FROM ord WHERE o_orderkey % 7 = 0
         |),
         |ev AS (
         |  SELECT o_orderkey, val0 AS val, 1 AS __op,
         |    CAST(idx // 100 + 1 AS BIGINT) AS g, idx // 100 AS tsg,
         |    CASE WHEN CAST(idx // 100 AS INTEGER) % 2 = 0
         |      THEN '0-101' ELSE '0-102' END AS src
         |  FROM ord
         |  UNION ALL SELECT o_orderkey, val0, 2,
         |    CAST(100000 + uidx // 100 AS BIGINT), 100000 + uidx // 100,
         |    '0-102' FROM up
         |  UNION ALL SELECT o_orderkey, val0 + 1000, 3,
         |    CAST(100000 + uidx // 100 AS BIGINT), 100000 + uidx // 100,
         |    '0-102' FROM up
         |  UNION ALL SELECT o_orderkey, cur, 0,
         |    CAST(200000 + didx // 100 AS BIGINT), 200000 + didx // 100,
         |    '0-101' FROM del
         |)
         |SELECT o_orderkey, val, __op, g AS __gtid,
         |  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(tsg) AS __tm,
         |  src AS __source_id
         |FROM ev""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMariaCompressed(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.MariaTable)
        .option("binlogFormat", "mariadb")
        .load()
        .select(col("o_orderkey"), col("val"), col(CdcSchema.OpCol),
          col(CdcSchema.GtidCol), col(CdcSchema.TmCol),
          col(CdcSchema.SourceIdCol))
    },

    // binlog_row_value_options=PARTIAL_JSON: the update phase's after
    // images carry Json_diff_vectors (REPLACE/INSERT/REMOVE over
    // members and array elements) that the decoder applies against the
    // before image. Both images' fields extract through Spark's
    // get_json_object; the oracle recomputes every extracted value —
    // including an untouched member proving base preservation and the
    // REMOVEd member reading NULL — from orders directly.
    QDef("cdc44_mysql_partial_json",
      s"""WITH up AS (
         |  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS uidx
         |  FROM orders WHERE o_orderkey % 3 = 0
         |)
         |SELECT o_orderkey, 2 AS __op,
         |  CAST(100000 + uidx // 100 AS BIGINT) AS __gtid,
         |  CAST(o_orderkey % 500 AS BIGINT) AS cnt,
         |  o_orderpriority AS pri,
         |  CAST(CASE WHEN o_orderkey % 2 = 0 THEN 0.5 ELSE 1.5 END AS DOUBLE) AS d,
         |  o_orderstatus AS st,
         |  CAST(NULL AS VARCHAR) AS flag,
         |  CAST(o_orderkey % 7 AS BIGINT) AS t1,
         |  CAST(NULL AS VARCHAR) AS t2
         |FROM up
         |UNION ALL
         |SELECT o_orderkey, 3,
         |  CAST(100000 + uidx // 100 AS BIGINT),
         |  CAST(o_orderkey % 500 + 1000 AS BIGINT),
         |  'urgent',
         |  CAST(CASE WHEN o_orderkey % 2 = 0 THEN 0.5 ELSE 1.5 END AS DOUBLE),
         |  CAST(NULL AS VARCHAR), 'true', CAST(9 AS BIGINT), 'z'
         |FROM up""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMysqlPartialJson(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.PartialJsonTable)
        .option("binlogFormat", "mysql")
        .load()
        .filter(col(CdcSchema.OpCol).isin(
          CdcSchema.Op.UpdateBefore, CdcSchema.Op.UpdateAfter))
        .select(col("o_orderkey"), col(CdcSchema.OpCol), col(CdcSchema.GtidCol),
          get_json_object(col("jdoc"), "$.cnt").cast("bigint").as("cnt"),
          get_json_object(col("jdoc"), "$.meta.pri").as("pri"),
          get_json_object(col("jdoc"), "$.meta.d").cast("double").as("d"),
          get_json_object(col("jdoc"), "$.st").as("st"),
          get_json_object(col("jdoc"), "$.flag").as("flag"),
          get_json_object(col("jdoc"), "$.tags[1]").cast("bigint").as("t1"),
          get_json_object(col("jdoc"), "$.tags[2]").as("t2"))
    },

    // cdc03 through the MySQL decoder: latest-image compaction
    QDef("cdc22_mysql_latest_image",
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 100 <> 0""".stripMargin) { (s, dir) =>
      Cdc.latestImage(mysqlScan(s, dir), Seq("o_orderkey"))
    },

    // cdc06 through the MySQL decoder: atomic before/after update pairs.
    // Single-pass pairing: ONE scan, conditional aggregation per
    // (gtid, key) — the former before/after self-join referenced the
    // scan twice, so every binlog byte was DECODED twice (the r9 plan
    // audit's one efficiency flag). Decode cost is the dominant term
    // for a CDC scan, and the same groupBy shuffle was being paid by
    // the join anyway (16-byte keys, map-side partials).
    QDef("cdc23_mysql_update_deltas",
      """SELECT o_orderkey,
        |  o_totalprice AS before_price,
        |  o_totalprice * 1.1 AS after_price,
        |  o_totalprice * 1.1 - o_totalprice AS delta
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin) { (s, dir) =>
      val cdc = mysqlScan(s, dir)
      cdc.filter(col(CdcSchema.OpCol).isin(
          CdcSchema.Op.UpdateBefore, CdcSchema.Op.UpdateAfter))
        .groupBy(col(CdcSchema.GtidCol), col("o_orderkey"))
        .agg(
          max(when(col(CdcSchema.OpCol) === CdcSchema.Op.UpdateBefore,
            col("o_totalprice"))).as("before_price"),
          max(when(col(CdcSchema.OpCol) === CdcSchema.Op.UpdateAfter,
            col("o_totalprice"))).as("after_price"))
        .select(col("o_orderkey"), col("before_price"), col("after_price"),
          (col("after_price") - col("before_price")).as("delta"))
    },

    // as-of snapshot: the table's state as of transaction G. The __gtid
    // filter pushes into the source, so only the needed log prefix is
    // decoded — log-position pruning would skip whole files at scale.
    QDef("cdc09_asof_snapshot",
      """WITH ord AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
        |)
        |SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 AND 1000000 + idx <= 1000750
        |       THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice
        |FROM ord""".stripMargin) { (s, dir) =>
      val snapshotGtid = 1000750L // inserts + first 751 update txns
      val cdc = Cdc.scan(s, dir).filter(col(CdcSchema.GtidCol) <= snapshotGtid)
      Cdc.latestImage(cdc, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
    },

    // SCD2 history materialization: every (insert|update-after) image is
    // a version row; valid_to = next version's gtid, or the delete gtid
    // for the final version of deleted keys. The other classic CDC
    // consumption shape next to latest-image (SCD1): one window + one
    // small join, no state. Oracle reconstructs versions from orders via
    // the fixture's gtid scheme (insert gno = idx div 10, update gno =
    // 1e6 + idx, delete gno = 2e6 + idx)
    QDef("cdc13_scd2_history",
      """WITH ranked AS (
        |  SELECT o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS idx
        |  FROM orders),
        |v1 AS (
        |  SELECT o_orderkey, o_totalprice AS price, idx // 10 AS valid_from,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 1000000 + idx END AS valid_to
        |  FROM ranked),
        |v2 AS (
        |  SELECT o_orderkey, o_totalprice * 1.1 AS price,
        |    1000000 + idx AS valid_from,
        |    CASE WHEN o_orderkey % 100 = 0 THEN 2000000 + idx END AS valid_to
        |  FROM ranked WHERE o_orderkey % 10 = 0)
        |SELECT o_orderkey, price, CAST(valid_from AS BIGINT) AS valid_from,
        |  CAST(valid_to AS BIGINT) AS valid_to, valid_to IS NULL AS is_current
        |FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)""".stripMargin) { (s, dir) =>
      // ONE scan (the former versions/deletes pair read the log twice,
      // decoding every byte twice): delete gtids ride a whole-partition
      // window over the SAME per-key partitioning the version ordering
      // needs, so the single shuffle serves both.
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_orderkey"))
      Cdc.scan(s, dir)
        .filter(col(CdcSchema.OpCol).isin(
          CdcSchema.Op.Insert, CdcSchema.Op.UpdateAfter, CdcSchema.Op.Delete))
        .select(col("o_orderkey"), col("o_totalprice").as("price"),
          col(CdcSchema.GtidCol).as("valid_from"), col(CdcSchema.OpCol).as("__o"))
        .withColumn("del_gtid", max(when(col("__o") === CdcSchema.Op.Delete,
          col("valid_from"))).over(w))
        .filter(col("__o") =!= CdcSchema.Op.Delete)
        .withColumn("next_from",
          lead(col("valid_from"), 1).over(w.orderBy(col("valid_from"))))
        .withColumn("valid_to", coalesce(col("next_from"), col("del_gtid")))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("o_orderkey"), col("price"), col("valid_from"),
          col("valid_to"), col("is_current"))
    },

    // change-range delta: which keys changed between two transactions
    QDef("cdc10_changes_between",
      """WITH ord AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
        |)
        |SELECT o_orderkey, CAST(1000000 + idx AS BIGINT) AS __gtid
        |FROM ord
        |WHERE o_orderkey % 10 = 0 AND 1000000 + idx > 1000200 AND 1000000 + idx <= 1000900""".stripMargin) { (s, dir) =>
      Cdc.scan(s, dir)
        .filter(col(CdcSchema.GtidCol) > 1000200L && col(CdcSchema.GtidCol) <= 1000900L
          && col(CdcSchema.OpCol) === CdcSchema.Op.UpdateAfter)
        .select(col("o_orderkey"), col(CdcSchema.GtidCol))
    },

    // second table in the same log: the audit stream (interleaved
    // TABLE_MAPs exercised end-to-end)
    QDef("cdc11_audit_table",
      """WITH ord AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
        |), batches AS (SELECT DISTINCT idx // 10 AS b FROM ord)
        |SELECT b AS audit_id, 'audit-' || CAST(b AS VARCHAR) AS note,
        |  CAST(1 AS INTEGER) AS __op, 500000 + b AS __gtid
        |FROM batches WHERE b % 40 = 0""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensure(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", "audit")
        .load()
        .select(col("audit_id"), col("note"), col(CdcSchema.OpCol), col(CdcSchema.GtidCol))
    },

    // bare COUNT(*): with v2 sidecars this is answered entirely from
    // per-file metadata (complete aggregate pushdown — the log is never
    // decoded); the oracle hash-check proves the sidecar counts are the
    // true row counts
    QDef("cdc16_count_pushdown",
      s"""${Cdc.eventsCte}
         |SELECT COUNT(*) AS n FROM cdc_tm""".stripMargin) { (s, dir) =>
      Cdc.scan(s, dir).agg(count(lit(1)).as("n"))
    },

    // CDC high-water mark: min/max transaction id + last event time +
    // count — all four served from sidecar metadata (complete aggregate
    // pushdown); the oracle proves the sidecar bounds are the true ones
    QDef("cdc17_high_water_mark",
      s"""${Cdc.eventsCte}
         |SELECT MIN(__gtid) AS lo, MAX(__gtid) AS hi,
         |  MAX(__tm) AS last_tm, COUNT(*) AS n
         |FROM cdc_tm""".stripMargin) { (s, dir) =>
      Cdc.scan(s, dir).agg(
        min(col(CdcSchema.GtidCol)).as("lo"), max(col(CdcSchema.GtidCol)).as("hi"),
        max(col(CdcSchema.TmCol)).as("last_tm"), count(lit(1)).as("n"))
    },

    // OFFSET pushdown: resume consumption from row N of the log — the
    // v2 sidecar row counts prune every file wholly inside the skipped
    // prefix (never opened) and only the boundary file discards its
    // residual. The oracle replays log order (gtid, then key within an
    // insert batch, then before<after in an update pair) and offsets in
    // SQL — hash parity proves the pushed skip is exactly the log prefix
    QDef("cdc18_offset_resume",
      s"""${Cdc.eventsCte}
         |SELECT * FROM cdc_tm
         |ORDER BY __gtid, o_orderkey, __op OFFSET 7500""".stripMargin) { (s, dir) =>
      Cdc.scan(s, dir).offset(7500)
    },

    // per-transaction audit: event counts by op within each GTID — the
    // "what did transaction G touch" consumption shape; one partial-
    // aggregated shuffle on __gtid
    QDef("cdc14_txn_stats",
      s"""${Cdc.eventsCte}
         |SELECT __gtid, COUNT(*) AS n_events,
         |  COUNT(*) FILTER (WHERE __op = 1) AS n_ins,
         |  COUNT(*) FILTER (WHERE __op IN (2, 3)) AS n_upd_img,
         |  COUNT(*) FILTER (WHERE __op = 0) AS n_del,
         |  MIN(__tm) AS tm
         |FROM cdc_tm GROUP BY __gtid""".stripMargin) { (s, dir) =>
      Cdc.scan(s, dir).groupBy(col(CdcSchema.GtidCol))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col(CdcSchema.OpCol) === CdcSchema.Op.Insert, 1L).otherwise(0L)).as("n_ins"),
          sum(when(col(CdcSchema.OpCol).isin(CdcSchema.Op.UpdateBefore, CdcSchema.Op.UpdateAfter), 1L)
            .otherwise(0L)).as("n_upd_img"),
          sum(when(col(CdcSchema.OpCol) === CdcSchema.Op.Delete, 1L).otherwise(0L)).as("n_del"),
          min(col(CdcSchema.TmCol)).as("tm"))
    },

    // multi-source replication identity (closes the reference's GTID gap:
    // binlog_table_reader.h:32 keeps only the bare gno; the commented-out
    // PREVIOUS_GTIDS block at binlog_table_reader.cc:418-425 never landed).
    // Two servers write one log, gno sequences both starting at 0 — the
    // per-source rows prove __source_id separates them, and the two
    // global counts prove the collision is real and resolved: distinct
    // bare gnos < distinct (source, gno) pairs, so any dedup/offset
    // tracking keyed on bare __gtid WOULD silently merge transactions.
    QDef("cdc19_multi_source_identity",
      s"""WITH a AS (
         |  SELECT o_orderkey,
         |    (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // 10 AS gno
         |  FROM orders WHERE o_orderkey % 4 = 1),
         |b AS (
         |  SELECT o_orderkey,
         |    (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // 10 AS gno
         |  FROM orders WHERE o_orderkey % 4 = 3),
         |per AS (
         |  SELECT '${CdcFixture.SourceA}' AS __source_id, COUNT(*) AS n_rows,
         |    CAST(COUNT(DISTINCT gno) AS BIGINT) AS n_txns,
         |    MIN(gno) AS min_gtid, MAX(gno) AS max_gtid,
         |    CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
         |  FROM a
         |  UNION ALL
         |  SELECT '${CdcFixture.SourceB}', COUNT(*),
         |    CAST(COUNT(DISTINCT gno) AS BIGINT), MIN(gno), MAX(gno),
         |    CAST(SUM(o_orderkey) AS BIGINT)
         |  FROM b),
         |gl AS (
         |  SELECT CAST(COUNT(DISTINCT gno) AS BIGINT) AS n_txns_bare,
         |    CAST(COUNT(DISTINCT (src, gno)) AS BIGINT) AS n_txns_pairs
         |  FROM (SELECT 'A' AS src, gno FROM a UNION ALL SELECT 'B', gno FROM b))
         |SELECT per.*, gl.n_txns_bare, gl.n_txns_pairs FROM per, gl""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureMultiSource(s, dir)
      val ms = s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.Table)
        .load()
      val per = ms.groupBy(col(CdcSchema.SourceIdCol))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col(CdcSchema.GtidCol)).as("n_txns"),
          min(col(CdcSchema.GtidCol)).as("min_gtid"),
          max(col(CdcSchema.GtidCol)).as("max_gtid"),
          sum(col("o_orderkey")).as("key_sum"))
      val glob = ms.agg(
        countDistinct(col(CdcSchema.GtidCol)).as("n_txns_bare"),
        countDistinct(col(CdcSchema.SourceIdCol), col(CdcSchema.GtidCol))
          .as("n_txns_pairs"))
      per.crossJoin(broadcast(glob))
    },

    // schema-drift epochs end-to-end: the log's table renames a column
    // and adds another between files; with schemaDrift=epochs one scan
    // spans the ALTER boundary — epoch-1 rows surface (k, keep, null,
    // null) against the newest schema, epoch-2 rows carry full values.
    // The oracle pins the exact per-epoch null semantics (strictly
    // better than the reference, which silently corrupts on drift via
    // its TABLE_MAP bug at binlog_table_reader.cc:402-406).
    QDef("cdc20_schema_drift_epochs",
      """WITH e1 AS (
        |  SELECT o_orderkey,
        |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx
        |  FROM orders WHERE o_orderkey % 50 = 0),
        |e2 AS (
        |  SELECT o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx
        |  FROM orders WHERE o_orderkey % 50 = 25)
        |SELECT o_orderkey AS k, 'k' || CAST(o_orderkey AS VARCHAR) AS keep,
        |  CAST(NULL AS DOUBLE) AS price, CAST(NULL AS BIGINT) AS extra,
        |  CAST(1 AS INTEGER) AS __op, CAST(idx AS BIGINT) AS __gtid
        |FROM e1
        |UNION ALL
        |SELECT o_orderkey, 'k' || CAST(o_orderkey AS VARCHAR),
        |  o_totalprice * 2, o_orderkey * 3,
        |  CAST(1 AS INTEGER), CAST(100000 + idx AS BIGINT)
        |FROM e2""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensureDrifted(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.EvolvingTable)
        .option("schemaDrift", "epochs")
        .load()
        .select(col("k"), col("keep"), col("price"), col("extra"),
          col(CdcSchema.OpCol), col(CdcSchema.GtidCol))
    },

    // nullable column through the full verified path: NULL bitmap on the
    // wire -> InternalRow null -> parquet null -> DuckDB NULL compare
    QDef("cdc12_nullable_column",
      """WITH ord AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
        |)
        |SELECT o_orderkey AS note_id,
        |  CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE 'n' || CAST(o_orderkey AS VARCHAR) END AS note,
        |  CAST(3000000 + idx AS BIGINT) AS __gtid
        |FROM ord WHERE o_orderkey % 20 = 0""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensure(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", index)
        .option("database", CdcFixture.Db)
        .option("table", "notes")
        .load()
        .select(col("note_id"), col("note"), col(CdcSchema.GtidCol))
    },

    // multi-table shared-scan materialization: orders + audit land from
    // ONE decode pass over the log (CdcFanout — N tables, one log
    // read), then the query joins ACROSS the two materialized frames:
    // each audit row's batch id against that batch's insert rows. The
    // from-scratch per-table oracle is valid because the fan-out frames
    // are spec-pinned row-identical to the per-table scans.
    QDef("cdc53_fanout_multi_table",
      """WITH ord AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
        |), a AS (
        |  SELECT DISTINCT CAST(idx // 10 AS BIGINT) AS audit_id FROM ord
        |  WHERE (idx // 10) % 40 = 0
        |), ins AS (SELECT CAST(idx // 10 AS BIGINT) AS g FROM ord)
        |SELECT a.audit_id, 'audit-' || CAST(a.audit_id AS VARCHAR) AS note,
        |  COUNT(*) AS n_batch
        |FROM a JOIN ins ON ins.g = a.audit_id
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val paths = ensureFanout(s, dir)
      val orders = s.read.parquet(paths((CdcFixture.Db, CdcFixture.Table)))
      val audit = s.read.parquet(paths((CdcFixture.Db, "audit")))
      audit.select(col("audit_id"), col("note"))
        .join(orders.filter(col(CdcSchema.OpCol) === CdcSchema.Op.Insert)
          .select(col(CdcSchema.GtidCol).as("audit_id")), Seq("audit_id"))
        .groupBy(col("audit_id"), col("note"))
        .agg(count(lit(1)).as("n_batch"))
    },

    // the INCREMENTAL fan-out (appendTables): the replication loop's
    // per-run shape — decode only the log bytes past the committed
    // offsets, append per-table, commit offsets last. The fixture
    // materializes in TWO increments (half the files, then the rest);
    // the same oracle as cdc53 holds because increments compose to the
    // one-shot materialization (spec-pinned, incl. mid-file resume).
    QDef("cdc54_fanout_incremental",
      """WITH ord AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx FROM orders
        |), a AS (
        |  SELECT DISTINCT CAST(idx // 10 AS BIGINT) AS audit_id FROM ord
        |  WHERE (idx // 10) % 40 = 0
        |), ins AS (SELECT CAST(idx // 10 AS BIGINT) AS g FROM ord)
        |SELECT a.audit_id, 'audit-' || CAST(a.audit_id AS VARCHAR) AS note,
        |  COUNT(*) AS n_batch
        |FROM a JOIN ins ON ins.g = a.audit_id
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val paths = ensureIncrFanout(s, dir)
      val orders = s.read.parquet(paths((CdcFixture.Db, CdcFixture.Table)))
      val audit = s.read.parquet(paths((CdcFixture.Db, "audit")))
      audit.select(col("audit_id"), col("note"))
        .join(orders.filter(col(CdcSchema.OpCol) === CdcSchema.Op.Insert)
          .select(col(CdcSchema.GtidCol).as("audit_id")), Seq("audit_id"))
        .groupBy(col("audit_id"), col("note"))
        .agg(count(lit(1)).as("n_batch"))
    },

    // scheme-qualified log root through the DRIVER's oracle gate: the
    // same scan as cdc02's op-count shape, but the index file is
    // addressed as a file:// URI, so the whole LogFs seam (index parse,
    // relative-entry resolution, sidecar pruning metadata, per-file
    // event readers on executors) is hash-checked against DuckDB every
    // round — LocalFileSystem under file:// exercises exactly the code
    // path an hdfs:// root takes. Oracle = the event stream
    // reconstruction, identical to the bare-path scan's.
    // LIVE replication-protocol ingestion through the ORACLE gate: the
    // mysql fixture's files served by the loopback stand-in mysqld
    // (FakeMysqld — real wire protocol, scramble VERIFIED), consumed as
    // a replica (MysqlReplica: protocol-41 handshake +
    // mysql_native_password + COM_REGISTER_SLAVE + COM_BINLOG_DUMP_GTID),
    // decoded by the SAME RowDecoder as the file scan — so the result
    // hash-equals cdc21's oracle. The replication stream is ONE socket
    // BY PROTOCOL (every CDC client's shape, Debezium included); the
    // scale posture is land-then-read: the live tail feeds the fan-out
    // materializer and analytics read THAT distributed. This query pins
    // the wire path's correctness end-to-end.
    QDef("cdc56_replica_scan",
      s"${Cdc.eventsCte} SELECT * FROM cdc_tm") { (s, dir) =>
      val index = CdcFixture.ensureMysql(s, dir)
      val files = graft.cdc.CdcCodec.readIndex(index)
      val srcSchema = graft.cdc.MysqlBinlog
        .inferSourceSchema(index, CdcFixture.Db, CdcFixture.Table)
        .getOrElse(sys.error(s"no TABLE_MAP for the fixture table in $index"))
      val full = CdcSchema.withEnvelope(srcSchema)
      val w = srcSchema.length
      val srv = new graft.cdc.FakeMysqld(files, "repl", "s3cret")
      try {
        val sess = graft.cdc.MysqlReplica.connect(
          "127.0.0.1", srv.port, "repl", "s3cret")
        try {
          sess.registerSlave(serverId = 4242L)
          val dec = new graft.cdc.MysqlBinlog.RowDecoder(
            CdcFixture.Db, CdcFixture.Table,
            expectedSchema = Some(srcSchema))
          val events = sess.dumpFrom(serverId = 4242L)
          // this query decodes the dump ON THE DRIVER (it IS the wire-
          // parity gate: one socket, one decoder, hash-equal to the
          // distributed file scan) — so its buffer is bounded LOUD like
          // every driver collect in this repo. Production-scale
          // ingestion is the land-then-read path (ReplicaTail → fan-out
          // frames, cdc57), which never buffers rows on the driver.
          val maxRows = s.conf.get(
            "spark.graft.replica.maxBufferedRows", "2000000").toLong
          var nBuf = 0L
          val rows = Seq.newBuilder[org.apache.spark.sql.catalyst.InternalRow]
          try {
            while (events.hasNext) dec.decode(events.next()).foreach { r =>
              nBuf += 1
              require(nBuf <= maxRows,
                s"cdc56_replica_scan: dump exceeds $maxRows driver-buffered " +
                  "rows (spark.graft.replica.maxBufferedRows) — use the " +
                  "land-then-read ingestion path (ReplicaTail) for dumps " +
                  "of this size")
              val vals = new Array[Any](w + 4)
              System.arraycopy(r.values, 0, vals, 0, w)
              vals(w) = r.op; vals(w + 1) = r.gtid
              vals(w + 2) = r.tmMicros; vals(w + 3) = r.sourceId
              rows += new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(vals)
            }
          } finally events.close()
          srv.firstFailure.foreach(t => throw t)
          org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(
            s, s.sparkContext.parallelize(rows.result(), 4), full)
        } finally sess.close()
      } finally srv.close()
    },

    // LIVE replication as an INGESTION MODE through the oracle gate —
    // the land-then-read posture cdc56's driver-decode gate documents,
    // now real code: FakeMysqld (caching_sha2_password auth — the
    // MySQL-8 default — plus interleaved heartbeats) streams the mysql
    // fixture's files; ReplicaTail lands the server's own event bytes
    // into a binlog directory (contiguity-checked appends, zero driver
    // row buffering) and folds them incrementally through the
    // distributed CdcFanout.appendTables decode. The query reads the
    // MATERIALIZED per-table frame — executors decoded it, not the
    // driver — and must hash-equal the same oracle as the file scan
    // (cdc21) and the driver-decode wire gate (cdc56).
    QDef("cdc57_replica_tail",
      s"${Cdc.eventsCte} SELECT * FROM cdc_tm") { (s, dir) =>
      s.read.parquet(ensureReplicaTail(s, dir))
    },

    QDef("cdc55_scheme_root_scan",
      s"""${Cdc.eventsCte}
         |SELECT __op, COUNT(*) AS n, MIN(__gtid) AS min_gtid,
         |  MAX(__gtid) AS max_gtid, CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
         |FROM cdc_tm GROUP BY __op""".stripMargin) { (s, dir) =>
      val index = CdcFixture.ensure(s, dir)
      s.read.format("binlogcdc")
        .option("indexFile", s"file://$index")
        .option("database", CdcFixture.Db)
        .option("table", CdcFixture.Table)
        .load()
        .groupBy(col(CdcSchema.OpCol))
        .agg(count(lit(1)).as("n"),
          min(col(CdcSchema.GtidCol)).as("min_gtid"),
          max(col(CdcSchema.GtidCol)).as("max_gtid"),
          sum(col("o_custkey")).as("sum_cust"))
    }
  )
}
