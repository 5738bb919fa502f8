package graft

import java.nio.file.Files

import graft.cdc.{CdcCodec, FakeMysqld, MysqlBinlog, MysqlReplica}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Live replication-protocol ingestion (MysqlReplica) against the
  * loopback stand-in server (FakeMysqld), which VERIFIES the client's
  * mysql_native_password scramble math and streams a real binlog
  * file's own bytes as OK-prefixed dump packets behind a fabricated
  * ROTATE — the wire shape a real mysqld dump has. The contract: the
  * socket path and the file path are the SAME reader, so events,
  * offsets, CRC policy, and decoded rows must match byte-for-byte.
  */
class MysqlReplicaSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType),
    StructField("s", StringType)))

  private def r(id: Long): Array[Any] = Array[Any](id, id * 0.5, s"row$id")

  private def writeLog(checksum: Boolean): String = {
    val dir = Files.createTempDirectory("replica-spec").toString
    val p = s"$dir/binlog.000000"
    val w = new MysqlBinlog.Writer(p, checksum = checksum)
    w.tableMap(1000L, 7L, "db", "t", schema)
    w.gtid(1000L, 1L, "11111111-2222-3333-4444-555555555555")
    w.writeRows(1000L, 7L, schema, Seq(r(1), r(2)))
    w.gtid(2000L, 2L, "11111111-2222-3333-4444-555555555555")
    w.updateRows(2000L, 7L, schema, Seq((r(1), Array[Any](1L, 9.5, "row1b"))))
    w.gtid(3000L, 3L, "11111111-2222-3333-4444-555555555555")
    w.deleteRows(3000L, 7L, schema, Seq(r(2)))
    w.close()
    p
  }

  private def events(src: graft.cdc.RawEventSource)
      : Seq[(Byte, Long, Seq[Byte], Long, Long)] = {
    try {
      val out = Seq.newBuilder[(Byte, Long, Seq[Byte], Long, Long)]
      while (src.hasNext) {
        val e = src.next()
        out += ((e.tpe, e.tsMs, e.payload.toSeq, e.pos, e.endPos))
      }
      out.result()
    } finally src.close()
  }

  test("dump stream equals the file reader byte-for-byte (CRC32 file): events, payloads, true offsets") {
    val log = writeLog(checksum = true)
    val srv = new FakeMysqld(log, "repl", "s3cret")
    try {
      val sess = MysqlReplica.connect("127.0.0.1", srv.port, "repl", "s3cret")
      try {
        sess.registerSlave(serverId = 4242L)
        val live = events(sess.dumpFrom(serverId = 4242L))
        val file = events(new MysqlBinlog.EventReader(log))
        assert(file.nonEmpty, "fixture log decoded no events")
        assert(live == file,
          s"replication stream diverged from the file reader " +
            s"(live=${live.length} events, file=${file.length})")
      } finally sess.close()
      assert(srv.firstFailure.isEmpty, s"server side failed: ${srv.firstFailure}")
    } finally srv.close()
  }

  test("decoded ROWS through the live stream equal the file decode (uncheck-summed file)") {
    val log = writeLog(checksum = false)
    val srv = new FakeMysqld(log, "repl", "pw")
    try {
      val sess = MysqlReplica.connect("127.0.0.1", srv.port, "repl", "pw")
      try {
        def rows(src: graft.cdc.RawEventSource): Seq[(Int, Long, Seq[Any])] = {
          val dec = new MysqlBinlog.RowDecoder("db", "t")
          val out = Seq.newBuilder[(Int, Long, Seq[Any])]
          try {
            while (src.hasNext)
              dec.decode(src.next()).foreach { cr: CdcCodec.CdcRow =>
                out += ((cr.op, cr.gtid, cr.values.toSeq.map {
                  case u: org.apache.spark.unsafe.types.UTF8String => u.toString
                  case v => v
                }))
              }
          } finally src.close()
          out.result()
        }
        val live = rows(sess.dumpFrom(serverId = 77L))
        val file = rows(new MysqlBinlog.EventReader(log))
        assert(file.length == 5, s"expected 5 change rows, got ${file.length}")
        assert(live == file, "live-decoded rows diverged from file decode")
      } finally sess.close()
    } finally srv.close()
  }

  test("bad password refuses loud with the server's errno, never a silent empty stream") {
    val log = writeLog(checksum = true)
    val srv = new FakeMysqld(log, "repl", "right")
    try {
      val ex = intercept[java.io.IOException] {
        MysqlReplica.connect("127.0.0.1", srv.port, "repl", "wrong")
      }
      assert(ex.getMessage.contains("1045"), ex.getMessage)
    } finally srv.close()
  }

  test("caching_sha2_password fast path: connect + dump parity, wrong password refuses with 1045") {
    val log = writeLog(checksum = true)
    val srv = new FakeMysqld(Seq(log), "repl", "s3cret",
      authPlugin = MysqlReplica.Sha2Plugin)
    try {
      val sess = MysqlReplica.connect("127.0.0.1", srv.port, "repl", "s3cret")
      try {
        sess.registerSlave(serverId = 11L)
        val live = events(sess.dumpFrom(serverId = 11L))
        val file = events(new MysqlBinlog.EventReader(log))
        assert(live == file, "sha2-authed stream diverged from file reader")
      } finally sess.close()
      assert(srv.firstFailure.isEmpty, s"server side failed: ${srv.firstFailure}")
    } finally srv.close()
    val srv2 = new FakeMysqld(Seq(log), "repl", "right",
      authPlugin = MysqlReplica.Sha2Plugin)
    try {
      val ex = intercept[java.io.IOException] {
        MysqlReplica.connect("127.0.0.1", srv2.port, "repl", "wrong")
      }
      assert(ex.getMessage.contains("1045"), ex.getMessage)
    } finally srv2.close()
  }

  test("AuthSwitchRequest: client recomputes the scramble under the server-named plugin") {
    val log = writeLog(checksum = true)
    // greeting advertises native, server then switches to caching_sha2
    // with a FRESH scramble — a client that resends the old token fails
    val srv = new FakeMysqld(Seq(log), "repl", "s3cret",
      authPlugin = MysqlReplica.NativePlugin, forceAuthSwitch = true)
    try {
      val sess = MysqlReplica.connect("127.0.0.1", srv.port, "repl", "s3cret")
      try {
        sess.registerSlave(serverId = 12L)
        val live = events(sess.dumpFrom(serverId = 12L))
        assert(live.nonEmpty, "switched-auth dump served no events")
      } finally sess.close()
      assert(srv.firstFailure.isEmpty, s"server side failed: ${srv.firstFailure}")
    } finally srv.close()
  }

  test("handshake capability check: a server without PLUGIN_AUTH gets a named refusal, not out-of-bounds") {
    val log = writeLog(checksum = true)
    val srv = new FakeMysqld(Seq(log), "repl", "pw",
      advertisePluginAuth = false)
    try {
      val ex = intercept[IllegalArgumentException] {
        MysqlReplica.connect("127.0.0.1", srv.port, "repl", "pw")
      }
      assert(ex.getMessage.contains("CLIENT_PLUGIN_AUTH"), ex.getMessage)
    } finally srv.close()
  }

  test("checksum session variable: a dump that skipped SET @master_binlog_checksum is refused (errno 1220)") {
    val log = writeLog(checksum = true) // CRC32 binlog: the 5.6+ default
    val srv = new FakeMysqld(log, "repl", "pw")
    try {
      val sess = MysqlReplica.connect("127.0.0.1", srv.port, "repl", "pw",
        sendChecksumVar = false)
      try {
        sess.registerSlave(serverId = 13L)
        val ex = intercept[java.io.IOException] {
          events(sess.dumpFrom(serverId = 13L))
        }
        assert(ex.getMessage.contains("1220"), ex.getMessage)
        assert(ex.getMessage.toLowerCase.contains("checksum"), ex.getMessage)
      } finally sess.close()
    } finally srv.close()
  }

  test("heartbeats are liveness, not file bytes: interleaved HEARTBEATs leave the decode byte-identical") {
    val log = writeLog(checksum = true)
    val srv = new FakeMysqld(Seq(log), "repl", "pw", heartbeatEvery = 2)
    try {
      val sess = MysqlReplica.connect("127.0.0.1", srv.port, "repl", "pw")
      try {
        sess.registerSlave(serverId = 14L)
        val live = events(sess.dumpFrom(serverId = 14L))
        val file = events(new MysqlBinlog.EventReader(log))
        assert(live == file,
          "heartbeat-interleaved stream diverged from the file reader " +
            "(a heartbeat advanced offsets or row state)")
      } finally sess.close()
      assert(srv.firstFailure.isEmpty, s"server side failed: ${srv.firstFailure}")
    } finally srv.close()
  }

  test("GTID-set resume: a non-empty executed set replays ZERO applied transactions") {
    val log = writeLog(checksum = true)
    val uuid = "11111111-2222-3333-4444-555555555555"
    val srv = new FakeMysqld(Seq(log), "repl", "pw")
    try {
      val sess = MysqlReplica.connect("127.0.0.1", srv.port, "repl", "pw")
      try {
        sess.registerSlave(serverId = 15L)
        def rows(src: graft.cdc.RawEventSource): Seq[(Int, Long)] = {
          val dec = new MysqlBinlog.RowDecoder("db", "t")
          val out = Seq.newBuilder[(Int, Long)]
          try {
            while (src.hasNext)
              dec.decode(src.next()).foreach(cr => out += ((cr.op, cr.gtid)))
          } finally src.close()
          out.result()
        }
        // gnos 1 (2 inserts) and 2 (1 update = 2 change rows) already
        // applied: only gno 3's delete row may arrive
        val got = rows(sess.dumpFrom(serverId = 15L,
          executed = Map(uuid -> 2L)))
        assert(got.map(_._2).forall(_ == 3L),
          s"server replayed applied transactions: $got")
        assert(got.length == 1, s"expected exactly the gno-3 delete, got $got")
      } finally sess.close()
      assert(srv.firstFailure.isEmpty, s"server side failed: ${srv.firstFailure}")
    } finally srv.close()
  }

  test("sha2 scramble math matches the documented caching_sha2_password fast-path construction") {
    // independent recomputation of
    // SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) ++ scramble)
    def sha(b: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)
    val scr = Array.tabulate[Byte](20)(i => (7 * i + 3).toByte)
    val p1 = sha("pw".getBytes("UTF-8"))
    val inner = sha(sha(p1) ++ scr)
    val expected = p1.zip(inner).map { case (a, b) => (a ^ b).toByte }.toSeq
    assert(MysqlReplica.sha2PasswordToken("pw", scr).toSeq == expected)
    assert(MysqlReplica.sha2PasswordToken("", scr).isEmpty,
      "empty password sends an empty auth response")
  }

  test("scramble math matches the documented mysql_native_password construction") {
    // independent recomputation of SHA1(pwd) XOR SHA1(scr ++ SHA1(SHA1(pwd)))
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val scr = Array.tabulate[Byte](20)(i => (i + 1).toByte)
    val p1 = md.digest("pw".getBytes("UTF-8"))
    val p2 = java.security.MessageDigest.getInstance("SHA-1").digest(p1)
    val m2 = java.security.MessageDigest.getInstance("SHA-1")
    m2.update(scr); m2.update(p2)
    val mix = m2.digest()
    val expected = p1.zip(mix).map { case (a, b) => (a ^ b).toByte }.toSeq
    assert(MysqlReplica.nativePasswordToken("pw", scr).toSeq == expected)
    assert(MysqlReplica.nativePasswordToken("", scr).isEmpty,
      "empty password sends an empty auth response")
  }
}
