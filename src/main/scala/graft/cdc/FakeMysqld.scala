package graft.cdc

import java.io.{DataInputStream, DataOutputStream, RandomAccessFile}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

/** Loopback stand-in mysqld for the replication-protocol specs: speaks
  * the REAL wire protocol and VERIFIES the client rather than waving
  * it through — v10 greeting (capability bits configurable), scramble
  * verification for BOTH `mysql_native_password` and
  * `caching_sha2_password` (fast path, incl. an AuthSwitchRequest
  * round when `forceAuthSwitch` is set), the
  * `SET @master_binlog_checksum` session-variable gate a real mysqld
  * enforces before dumping checksummed binlogs (a dump that skipped it
  * is REFUSED with the server's own error — so a client that forgets
  * the handshake stays test-visible), COM_REGISTER_SLAVE, and
  * COM_BINLOG_DUMP_GTID with REAL (file, pos) resume and executed-
  * GTID-set transaction skipping. Events stream as OK-prefixed packets
  * carrying the binlog FILES' OWN bytes, opening with the fabricated
  * ROTATE a real dump sends (and one per file switch — the name cue a
  * landing client needs).
  *
  * Failure injection and liveness, for the ingestion-loop specs:
  *   - `heartbeatEvery = n` interleaves a HEARTBEAT_LOG_EVENT packet
  *     after every n events (and on every idle poll in live mode) —
  *     heartbeats are liveness, not file bytes, and the client must
  *     not let them advance offsets or row state;
  *   - `dropAfterEvents = n` closes the socket abruptly (no EOF, no
  *     ERR) after the n-th event packet of the FIRST dump — the
  *     reconnect-and-resume story; subsequent connections serve
  *     normally;
  *   - `live = true` keeps the dump open at end-of-data, polling the
  *     files for GROWTH (a producer appending mid-dump) and
  *     heartbeating while idle, until [[finishLive]] — the mid-run
  *     growth story. Accepts connections sequentially until closed
  *     (a dropped client can reconnect).
  *
  * This is the offline-testable half of live ingestion: a real mysqld
  * is the same bytes over a different socket.
  */
final class FakeMysqld(binlogPaths: Seq[String], user: String,
    password: String,
    authPlugin: String = MysqlReplica.NativePlugin,
    advertisePluginAuth: Boolean = true,
    forceAuthSwitch: Boolean = false,
    heartbeatEvery: Int = 0,
    live: Boolean = false,
    dropAfterEvents: Int = -1) extends AutoCloseable {
  def this(binlogPath: String, user: String, password: String) =
    this(Seq(binlogPath), user, password)
  import MysqlReplica.{readPacket, writePacket, nativePasswordToken, sha2PasswordToken}
  import MysqlBinlog.EventType

  private val server =
    new ServerSocket(0, 4, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort

  @volatile private var failure: Throwable = _
  def firstFailure: Option[Throwable] = Option(failure)

  @volatile private var finished = !live
  /** Live mode: declare the producer done — the dump drains remaining
    * growth and then EOFs. */
  def finishLive(): Unit = finished = true

  @volatile private var droppedOnce = false

  private val scramble =
    "abcdefgh0123456789jk".getBytes(StandardCharsets.US_ASCII) // 20 bytes
  private val scramble2 =
    "ZYXWVUTSRQPONMLKJIHG".getBytes(StandardCharsets.US_ASCII) // switch round

  /** Whether the served logs are CRC32-checksummed (first file's FDE
    * declares it) — the condition under which a real mysqld REFUSES a
    * dump whose connection never set @master_binlog_checksum. */
  private lazy val logsChecksummed: Boolean = {
    val raf = new RandomAccessFile(binlogPaths.head, "r")
    try {
      raf.seek(4 + 9) // magic + header bytes up to event-size field
      val sz = Array.fill(4)(raf.read())
      val size = sz(0) | (sz(1) << 8) | (sz(2) << 16) | (sz(3) << 24)
      raf.seek(4 + size - 5)
      raf.read() == 1
    } finally raf.close()
  }

  private val thread = new Thread(() => serveLoop(), "fake-mysqld")
  thread.setDaemon(true)
  thread.start()

  private def serveLoop(): Unit = {
    while (!server.isClosed) {
      val sock =
        try server.accept()
        catch { case _: java.net.SocketException => return }
      try handle(sock)
      catch { case t: Throwable => if (failure == null) failure = t }
      finally sock.close()
    }
  }

  private def expectedToken(plugin: String, scr: Array[Byte]): Array[Byte] =
    plugin match {
      case MysqlReplica.NativePlugin => nativePasswordToken(password, scr)
      case MysqlReplica.Sha2Plugin => sha2PasswordToken(password, scr)
      case other => sys.error(s"FakeMysqld: unsupported plugin $other")
    }

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    // v10 greeting
    val g = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(g)
    d.write(10)
    d.write("8.0.99-graft-fake".getBytes(StandardCharsets.US_ASCII)); d.write(0)
    d.write(Array[Byte](1, 0, 0, 0)) // thread id
    d.write(scramble, 0, 8); d.write(0)
    d.write(0x00); d.write(0x82) // cap lo: PROTOCOL_41|SECURE_CONNECTION
    d.write(33) // charset
    d.write(0x02); d.write(0x00) // status
    // cap hi: PLUGIN_AUTH (0x0008 -> caps bit 0x80000) unless the spec
    // strips it to pin the client's capability refusal
    d.write(if (advertisePluginAuth) 0x08 else 0x00); d.write(0x00)
    d.write(21) // auth data len (20 + NUL)
    d.write(new Array[Byte](10))
    d.write(scramble, 8, 12); d.write(0)
    d.write(authPlugin.getBytes(StandardCharsets.US_ASCII))
    d.write(0)
    writePacket(out, 0, g.toByteArray)
    // auth: VERIFY the scramble token
    val (_, resp) = readPacket(in)
    var o = 4 + 4 + 1 + 23
    val uEnd = { var i = o; while (resp(i) != 0) i += 1; i }
    val gotUser = new String(resp, o, uEnd - o, StandardCharsets.UTF_8)
    o = uEnd + 1
    val tLen = resp(o) & 0xff; o += 1
    var gotToken = java.util.Arrays.copyOfRange(resp, o, o + tLen)
    var verifyPlugin = authPlugin
    var verifyScramble = scramble
    var seq = 2
    if (forceAuthSwitch) {
      // AuthSwitchRequest: flip to the OTHER plugin with a FRESH
      // scramble — the client must recompute, not resend
      val other =
        if (authPlugin == MysqlReplica.NativePlugin) MysqlReplica.Sha2Plugin
        else MysqlReplica.NativePlugin
      val sw = new java.io.ByteArrayOutputStream()
      sw.write(0xfe)
      sw.write(other.getBytes(StandardCharsets.US_ASCII)); sw.write(0)
      sw.write(scramble2); sw.write(0)
      writePacket(out, seq, sw.toByteArray)
      val (s2, tok2) = readPacket(in)
      seq = s2 + 1
      gotToken = tok2
      verifyPlugin = other
      verifyScramble = scramble2
    }
    val expected = expectedToken(verifyPlugin, verifyScramble)
    if (gotUser != user || !java.util.Arrays.equals(gotToken, expected)) {
      writePacket(out, seq, errPacket(1045,
        s"Access denied for user '$gotUser'"))
      return
    }
    if (verifyPlugin == MysqlReplica.Sha2Plugin) {
      // fast-path verdict, then the OK — the real two-packet sequence
      writePacket(out, seq, Array[Byte](0x01, 0x03)); seq += 1
    }
    writePacket(out, seq, Array[Byte](0, 0, 0, 2, 0, 0, 0)) // OK
    // command loop: COM_QUERY (checksum session var) / REGISTER_SLAVE
    // -> OK; DUMP_GTID -> stream
    var checksumVar = false
    var looping = true
    while (looping) {
      val (_, cmd) = readPacket(in)
      (cmd(0) & 0xff) match {
        case 0x03 => // COM_QUERY
          val sql = new String(cmd, 1, cmd.length - 1, StandardCharsets.UTF_8)
          if (sql.toLowerCase.matches(
              "\\s*set\\s+@master_binlog_checksum\\s*=.*")) {
            checksumVar = true
            writePacket(out, 1, Array[Byte](0, 0, 0, 2, 0, 0, 0))
          } else writePacket(out, 1, errPacket(1064,
            s"FakeMysqld does not speak SQL: $sql"))
        case 0x15 => writePacket(out, 1, Array[Byte](0, 0, 0, 2, 0, 0, 0))
        case 0x1e =>
          if (logsChecksummed && !checksumVar) {
            // the real mysqld refusal (errno 1220) for a dump whose
            // connection skipped the checksum handshake
            writePacket(out, 1, errPacket(1220,
              "Replica can not handle replication events with the " +
                "checksum that the source is configured to log; set " +
                "@master_binlog_checksum on this connection first"))
          } else dump(out, parseDump(cmd))
          looping = false
        case c =>
          writePacket(out, 1, errPacket(1047, s"unknown command $c"))
      }
    }
  }

  /** COM_BINLOG_DUMP_GTID payload: flags u16, server-id u32, name-len
    * u32, name, pos u64, data-len u32, data = n_sids u64 + per sid
    * (sid 16B, n_intervals u64, per interval start u64 + end u64,
    * end EXCLUSIVE). */
  private def parseDump(cmd: Array[Byte]): FakeMysqld.DumpReq = {
    var o = 1 + 2 + 4
    def u32(): Long = {
      val v = (cmd(o) & 0xffL) | ((cmd(o + 1) & 0xffL) << 8) |
        ((cmd(o + 2) & 0xffL) << 16) | ((cmd(o + 3) & 0xffL) << 24)
      o += 4; v
    }
    def u64(): Long = { val lo = u32(); val hi = u32(); lo | (hi << 32) }
    val nameLen = u32().toInt
    val name = new String(cmd, o, nameLen, StandardCharsets.UTF_8)
    o += nameLen
    val pos = u64()
    u32() // data length (trust the structure)
    val nSids = u64()
    val executed = (0L until nSids).map { _ =>
      val sid = java.util.Arrays.copyOfRange(cmd, o, o + 16); o += 16
      val nIv = u64()
      val ivs = (0L until nIv).map(_ => (u64(), u64()))
      uuidOf(sid) -> ivs
    }.toMap
    FakeMysqld.DumpReq(name, pos, executed)
  }

  private def uuidOf(sid: Array[Byte]): String = {
    val h = sid.map(b => f"${b & 0xff}%02x").mkString
    s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20)}"
  }

  private def basename(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)

  private def dump(rawOut: DataOutputStream, req: FakeMysqld.DumpReq): Unit = {
    // a real mysqld streams the dump through the net buffer and only
    // flushes at batch/idle boundaries; per-packet flush here capped
    // the loopback wire rows at syscall cost and understated the
    // client's ceiling — buffer the event stream, flush when idle, at
    // EOF, and on ERR (an injected abrupt drop deliberately does NOT
    // flush: a real crash tears mid-packet)
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(rawOut, 1 << 16))
    var seq = 1
    var sent = 0
    def sendPacket(payload: Array[Byte]): Unit = {
      // writePacket framing without the per-packet flush
      val len = payload.length
      out.write(len & 0xff); out.write((len >> 8) & 0xff)
      out.write((len >> 16) & 0xff); out.write(seq & 0xff)
      out.write(payload)
      seq += 1
    }
    def sendEvent(ev: Array[Byte]): Boolean = {
      val p = new Array[Byte](ev.length + 1)
      p(0) = 0; System.arraycopy(ev, 0, p, 1, ev.length)
      sendPacket(p)
      sent += 1
      if (dropAfterEvents > 0 && !droppedOnce && sent >= dropAfterEvents) {
        droppedOnce = true
        return false // abrupt close: no EOF, no ERR — the socket just dies
      }
      if (heartbeatEvery > 0 && sent % heartbeatEvery == 0)
        sendPacket(heartbeatPacket("current"))
      true
    }
    val startIdx =
      if (req.file.isEmpty) 0
      else binlogPaths.indexWhere(p => basename(p) == req.file)
    if (startIdx < 0) {
      sendPacket(errPacket(1236,
        s"Could not find first log file name in binary log index file " +
          s"(${req.file})"))
      out.flush()
      return
    }
    var idx = startIdx
    while (idx < binlogPaths.length) {
      val path = binlogPaths(idx)
      val minPos = if (idx == startIdx) math.max(req.pos, 4L) else 4L
      // the fabricated ROTATE a real dump opens each served file with:
      // the landing client's file-name cue
      if (!sendEvent(fabricatedRotate(basename(path), minPos))) return
      var offset = 4L
      var gtidSkip = false
      var fileDone = false
      while (!fileDone) {
        val (events, newOffset) = completeEventsFrom(path, offset)
        offset = newOffset
        events.foreach { case (ev, startPos) =>
          val tpe = ev(4)
          if (tpe == EventType.Gtid) {
            // executed-set filtering: a transaction the replica
            // already applied is SKIPPED server-side (auto-position)
            val sid = java.util.Arrays.copyOfRange(ev, 19 + 1, 19 + 17)
            var gno = 0L
            var i = 0
            while (i < 8) { gno |= (ev(36 + i) & 0xffL) << (8 * i); i += 1 }
            gtidSkip = req.executed.get(uuidOf(sid))
              .exists(_.exists { case (s, e) => gno >= s && gno < e })
          } else if (tpe == EventType.FormatDescription) gtidSkip = false
          val send =
            (tpe == EventType.FormatDescription || startPos >= minPos) &&
              !(gtidSkip && tpe != EventType.FormatDescription)
          if (send && !sendEvent(ev)) return // injected drop
        }
        if (events.isEmpty) {
          if (idx < binlogPaths.length - 1) fileDone = true // next file
          else if (finished) {
            sendPacket(Array[Byte](0xfe.toByte, 0, 0, 2, 0)) // EOF
            out.flush()
            return
          } else {
            // live mode: idle — flush the buffered stream (the client
            // must see everything served so far), heartbeat, poll
            out.flush()
            if (heartbeatEvery > 0) {
              sendPacket(heartbeatPacket(basename(path)))
              out.flush()
            }
            Thread.sleep(10)
          }
        }
      }
      idx += 1
    }
  }

  private def errPacket(errno: Int, msg: String): Array[Byte] = {
    val m = msg.getBytes(StandardCharsets.UTF_8)
    val b = new java.io.ByteArrayOutputStream()
    b.write(0xff); b.write(errno & 0xff); b.write((errno >> 8) & 0xff)
    b.write('#'); b.write("HY000".getBytes(StandardCharsets.US_ASCII))
    b.write(m)
    b.toByteArray
  }

  /** The artificial ROTATE a dump opens with: ts 0, LOG_EVENT_ARTIFICIAL
    * flag, position + next-file-name payload, no checksum. */
  private def fabricatedRotate(name: String, pos: Long): Array[Byte] = {
    val n = name.getBytes(StandardCharsets.US_ASCII)
    val size = 19 + 8 + n.length
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(0) // ts
    b.put(EventType.Rotate) // ROTATE
    b.putInt(1) // server id
    b.putInt(size)
    b.putInt(0) // log_pos: artificial
    b.putShort(0x20.toShort) // LOG_EVENT_ARTIFICIAL_F
    b.putLong(pos)
    b.put(n)
    b.array()
  }

  /** HEARTBEAT_LOG_EVENT: generated, never file bytes — body is the
    * current file name; no checksum (the client filters by TYPE before
    * any CRC concern, exactly as it must). */
  private def heartbeatPacket(name: String): Array[Byte] = {
    val n = name.getBytes(StandardCharsets.US_ASCII)
    val size = 19 + n.length
    val b = java.nio.ByteBuffer.allocate(size + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(0.toByte) // OK prefix
    b.putInt(0) // ts
    b.put(EventType.Heartbeat)
    b.putInt(1) // server id
    b.putInt(size)
    b.putInt(0) // log_pos (heartbeats carry the end offset; 0 is fine
    // for a stand-in — clients must not use it)
    b.putShort(0.toShort)
    b.put(n)
    b.array()
  }

  /** COMPLETE events in `path` from byte offset `from` (event start
    * offsets included for resume filtering), walked inside ONE chunked
    * read (a per-event seek+read walk cost 4 syscalls/event and capped
    * the loopback wire rows at the SERVER's walk, understating the
    * client's ceiling). A torn tail (the producer's in-flight append)
    * or an event crossing the 8 MiB chunk boundary is left for the
    * next call — binlog events are bounded far below the chunk. */
  private def completeEventsFrom(path: String,
      from: Long): (Seq[(Array[Byte], Long)], Long) = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val len = raf.length()
      val off = math.max(from, 4L)
      if (off >= len) return (Nil, off)
      val chunkLen = math.min(len - off, 8L << 20).toInt
      val buf = new Array[Byte](chunkLen)
      raf.seek(off); raf.readFully(buf)
      val out = Seq.newBuilder[(Array[Byte], Long)]
      var p = 0
      var done = false
      while (!done) {
        if (p + 19 > chunkLen) done = true
        else {
          val size = (buf(p + 9) & 0xff) | ((buf(p + 10) & 0xff) << 8) |
            ((buf(p + 11) & 0xff) << 16) | ((buf(p + 12) & 0xff) << 24)
          if (size < 19 || p.toLong + size > chunkLen) done = true
          else {
            out += ((java.util.Arrays.copyOfRange(buf, p, p + size),
              off + p))
            p += size
          }
        }
      }
      (out.result(), off + p)
    } finally raf.close()
  }

  def close(): Unit = {
    finished = true
    server.close()
  }
}

private object FakeMysqld {
  /** Parsed COM_BINLOG_DUMP_GTID request. */
  final case class DumpReq(file: String, pos: Long,
      executed: Map[String, Seq[(Long, Long)]])
}
