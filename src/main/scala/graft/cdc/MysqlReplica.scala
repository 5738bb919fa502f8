package graft.cdc

import java.io.{DataInputStream, DataOutputStream, IOException, InputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** LIVE replication-protocol ingestion — the fourth plug behind the
  * [[BinlogFormatAdapter]] seam, implemented against the PUBLIC MySQL
  * client/server protocol (no client library): connect to mysqld as a
  * replica, authenticate (`mysql_native_password` or the MySQL-8
  * default `caching_sha2_password` fast path, with AuthSwitch
  * handling), negotiate the binlog checksum session variable,
  * `COM_REGISTER_SLAVE`, then `COM_BINLOG_DUMP_GTID` — and consume the
  * OK-prefixed event stream the server pushes, with NO file shipping
  * (the Debezium deployment shape; the reference cannot do this at all
  * — it reads mysqld's local files from inside the server,
  * binlog_table_reader.cc:75-96).
  *
  * Two consumption modes off one socket:
  *   - [[Session.dumpFrom]] — the DECODE path: the stream is re-framed
  *     as the binlog byte layout (4-byte magic + v4 events) and handed
  *     to the SAME [[MysqlBinlog.EventReader]] the file path uses —
  *     one CRC/FDE/flavor policy for both ingestion modes. Heartbeats
  *     and the dump's artificial events are dropped BEFORE framing
  *     (they are not file bytes and must not advance reader offsets).
  *   - [[Session.dumpRaw]] — the LANDING path: classified raw items
  *     ([[DumpItem.FileSwitch]] from artificial ROTATEs,
  *     [[DumpItem.Event]] with the server's own file-offset `endPos`,
  *     [[DumpItem.Heartbeat]] as the idle-liveness signal) for
  *     [[graft.sources.ReplicaTail]]'s land-then-read loop: one socket
  *     lands bytes (the protocol's single-stream constraint), the
  *     distributed fan-out decode reads the landed files.
  *
  * Decode parity with the file reader is spec-pinned byte-for-byte
  * against a loopback stand-in server ([[FakeMysqld]]) that speaks the
  * same wire protocol — the offline-testable half of the seam; a real
  * mysqld endpoint is the same bytes over a different socket.
  *
  * Protocol scope: protocol-41 handshake with capability verification
  * (PLUGIN_AUTH / SECURE_CONNECTION checked before indexing into the
  * auth fields — exotic forks refuse loud, not out-of-bounds);
  * `mysql_native_password` and `caching_sha2_password` FAST-path
  * scrambles (real math, not stubs) plus AuthSwitchRequest; the
  * `SET @master_binlog_checksum` session variable a real mysqld
  * REQUIRES before it will dump CRC32-checksummed events (the default
  * since 5.6); REGISTER_SLAVE; DUMP_GTID from an optionally NON-empty
  * executed GTID set (per-uuid high-water resume — zero replayed
  * transactions); HEARTBEAT_LOG_EVENT (and V2) skip; single-packet
  * events (≥16 MiB events fail loud rather than silently mis-framed);
  * ERR packets surfaced with the server's errno and message. TLS and
  * caching_sha2's FULL auth exchange (RSA password encryption over an
  * insecure channel — only reached when the server has no cached
  * credential AND the channel is plaintext) are deployment hardening,
  * documented not stubbed: the client refuses loud naming both outs
  * (TLS, or prime the server's cache with one prior TLS login).
  */
object MysqlReplica {

  // capability flags (public protocol constants)
  private val ClientProtocol41 = 0x00000200L
  private val ClientSecureConnection = 0x00008000L
  private val ClientPluginAuth = 0x00080000L

  private val ComQuery = 0x03
  private val ComRegisterSlave = 0x15
  private val ComBinlogDumpGtid = 0x1e

  val NativePlugin = "mysql_native_password"
  val Sha2Plugin = "caching_sha2_password"

  /** One item of the raw dump stream (the landing path's unit). */
  sealed trait DumpItem
  object DumpItem {
    /** Artificial ROTATE: the server names the binlog file the
      * following events belong to, and the offset the next event
      * starts at (the requested resume position, or 4 for a fresh
      * file). Not file bytes — never landed. */
    final case class FileSwitch(name: String, pos: Long) extends DumpItem
    /** One binlog event EXACTLY as stored in the server's file
      * (header + body + checksum if any). `endPos` is the header's
      * log_pos — the event's END offset in its own file — so a lander
      * can verify append contiguity (`endPos - bytes.length` must
      * equal the landed length) and skip already-landed duplicates on
      * resume. */
    final case class Event(bytes: Array[Byte], tpe: Byte, endPos: Long)
      extends DumpItem
    /** HEARTBEAT_LOG_EVENT: the server's idle-liveness signal. Carries
      * no file bytes and MUST NOT advance reader or landing state —
      * surfaced so a tail loop can use it as "the server is alive and
      * idle" (e.g. to fold pending landed bytes). */
    case object Heartbeat extends DumpItem
  }

  // ------------------------------------------------------- packet framing

  /** One MySQL packet: 3-byte LE length + 1-byte sequence + payload.
    * Returns (seq, payload). 0xffffff-length continuation frames (16 MiB
    * payloads) fail loud — no event in scope approaches the bound. */
  private[cdc] def readPacket(in: DataInputStream): (Int, Array[Byte]) = {
    val h = in.readNBytes(4)
    if (h.length < 4) throw new IOException("connection closed mid-packet")
    val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
    require(len < 0xffffff,
      "16 MiB packet continuation not supported (event exceeds one packet)")
    val seq = h(3) & 0xff
    val p = in.readNBytes(len)
    if (p.length < len) throw new IOException("connection closed mid-packet")
    (seq, p)
  }

  private[cdc] def writePacket(out: DataOutputStream, seq: Int,
      payload: Array[Byte]): Unit = {
    val len = payload.length
    out.write(len & 0xff); out.write((len >> 8) & 0xff)
    out.write((len >> 16) & 0xff); out.write(seq & 0xff)
    out.write(payload); out.flush()
  }

  private def err(payload: Array[Byte], what: String): Nothing = {
    // ERR: 0xff, errno u16le, '#'+sqlstate(5) [protocol41], message
    val errno = (payload(1) & 0xff) | ((payload(2) & 0xff) << 8)
    val msgOff = if (payload.length > 3 && payload(3) == '#') 9 else 3
    val msg = new String(payload, msgOff, payload.length - msgOff,
      StandardCharsets.UTF_8)
    throw new IOException(s"$what: server ERR $errno: $msg")
  }

  /** `mysql_native_password` auth token:
    * SHA1(pwd) XOR SHA1(scramble ++ SHA1(SHA1(pwd))). */
  private[graft] def nativePasswordToken(password: String,
      scramble: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha = MessageDigest.getInstance("SHA-1")
    val p1 = sha.digest(password.getBytes(StandardCharsets.UTF_8))
    val p2 = sha.digest(p1)
    sha.update(scramble); sha.update(p2)
    val mix = sha.digest()
    val out = new Array[Byte](20)
    var i = 0
    while (i < 20) { out(i) = (p1(i) ^ mix(i)).toByte; i += 1 }
    out
  }

  /** `caching_sha2_password` FAST-path auth token (the scramble the
    * server's credential cache verifies):
    * SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) ++ scramble). */
  private[graft] def sha2PasswordToken(password: String,
      scramble: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val sha = MessageDigest.getInstance("SHA-256")
    val p1 = sha.digest(password.getBytes(StandardCharsets.UTF_8))
    val p2 = sha.digest(p1)
    sha.update(p2); sha.update(scramble)
    val mix = sha.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) { out(i) = (p1(i) ^ mix(i)).toByte; i += 1 }
    out
  }

  private def tokenFor(plugin: String, password: String,
      scramble: Array[Byte]): Array[Byte] = plugin match {
    case NativePlugin => nativePasswordToken(password, scramble)
    case Sha2Plugin => sha2PasswordToken(password, scramble)
    case other => throw new IOException(
      s"authentication: server requests unsupported plugin '$other' — " +
        s"this client speaks $NativePlugin and $Sha2Plugin (fast path); " +
        "create the replication user with one of those")
  }

  /** A GTID a replica has already applied: uuid string (the
    * `__source_id` form, dashes accepted) → highest applied gno. The
    * dump command encodes each as the interval [1, gno+1), so the
    * server SKIPS those transactions instead of replaying them. */
  private[cdc] def encodeGtidSet(executed: Map[String, Long]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(b)
    writeU64(d, executed.size.toLong) // n_sids
    executed.toSeq.sortBy(_._1).foreach { case (uuid, hi) =>
      require(hi >= 1, s"executed gno high-water must be >= 1, got $hi ($uuid)")
      d.write(sidBytes(uuid))
      writeU64(d, 1L) // n_intervals
      writeU64(d, 1L) // interval start (inclusive)
      writeU64(d, hi + 1L) // interval end (EXCLUSIVE — the mysql layout)
    }
    b.toByteArray
  }

  private[cdc] def sidBytes(uuid: String): Array[Byte] = {
    val hex = uuid.replace("-", "")
    require(hex.length == 32, s"bad server uuid '$uuid'")
    Array.tabulate[Byte](16)(i =>
      Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  // --------------------------------------------------------------- client

  /** An authenticated replica session. Single-threaded, one dump per
    * session (mysqld's own constraint). */
  final class Session private[cdc] (socket: Socket, in: DataInputStream,
      out: DataOutputStream) extends AutoCloseable {

    private def command(payload: Array[Byte], what: String): Unit = {
      writePacket(out, 0, payload) // each command restarts the sequence
      val (_, resp) = readPacket(in)
      if ((resp(0) & 0xff) == 0xff) err(resp, what)
      require((resp(0) & 0xff) == 0x00, s"$what: unexpected response " +
        f"0x${resp(0) & 0xff}%02x")
    }

    /** Minimal COM_QUERY for OK-only statements (session variables).
      * Result-set-producing queries are out of scope by design — this
      * client is a replication consumer, not a SQL shell. */
    private[cdc] def queryOk(sql: String): Unit = {
      val q = sql.getBytes(StandardCharsets.UTF_8)
      val b = new Array[Byte](1 + q.length)
      b(0) = ComQuery.toByte
      System.arraycopy(q, 0, b, 1, q.length)
      command(b, s"COM_QUERY($sql)")
    }

    /** The checksum handshake a real mysqld REQUIRES before dumping
      * CRC32-checksummed binlogs (the server default since 5.6): a
      * dump requested without it is refused with "Replica can not
      * handle replication events with the checksum that the source is
      * configured to log" — so [[connect]] sends this right after auth
      * (opt-out only for the refusal spec). */
    private[cdc] def negotiateChecksum(): Unit =
      queryOk("SET @master_binlog_checksum = @@global.binlog_checksum")

    /** COM_REGISTER_SLAVE — announce this consumer in SHOW REPLICAS. */
    def registerSlave(serverId: Long, reportHost: String = "graft"): Unit = {
      val host = reportHost.getBytes(StandardCharsets.UTF_8)
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(ComRegisterSlave)
      writeU32(d, serverId)
      d.write(host.length); d.write(host)
      d.write(0) // user
      d.write(0) // password
      d.write(0); d.write(0) // port u16le (0 = not listening)
      writeU32(d, 0L) // replication rank (unused)
      writeU32(d, 0L) // master id (0 = let the server fill it)
      command(b.toByteArray, "COM_REGISTER_SLAVE")
    }

    private def sendDumpCommand(serverId: Long, file: String, pos: Long,
        executed: Map[String, Long]): Unit = {
      val name = file.getBytes(StandardCharsets.UTF_8)
      val gtids = encodeGtidSet(executed)
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(ComBinlogDumpGtid)
      d.write(0); d.write(0) // flags u16le
      writeU32(d, serverId)
      writeU32(d, name.length.toLong)
      d.write(name)
      writeU64(d, pos)
      writeU32(d, gtids.length.toLong)
      d.write(gtids)
      writePacket(out, 0, b.toByteArray)
    }

    /** The RAW dump stream for the land-then-read loop: every server
      * packet classified as [[DumpItem.FileSwitch]] (artificial ROTATE
      * — file name + next offset, not file bytes),
      * [[DumpItem.Heartbeat]] (idle liveness, not file bytes), or
      * [[DumpItem.Event]] (the file's OWN bytes — header + body +
      * checksum exactly as stored, with the header's log_pos exposed
      * for contiguity checks). EOF ends the iterator (a real server
      * blocks instead — tests and catch-up reads end). ERR packets
      * throw with the server's errno. */
    def dumpRaw(serverId: Long, file: String = "",
        pos: Long = MysqlBinlog.MagicLen.toLong,
        executed: Map[String, Long] = Map.empty): Iterator[DumpItem] = {
      sendDumpCommand(serverId, file, pos, executed)
      new Iterator[DumpItem] {
        private var nextItem: DumpItem = _
        private var finished = false
        private def advance(): Unit = {
          while (nextItem == null && !finished) {
            val (_, p) = readPacket(in)
            (p(0) & 0xff) match {
              case 0x00 =>
                val ev = java.util.Arrays.copyOfRange(p, 1, p.length)
                require(ev.length >= MysqlBinlog.HeaderLen,
                  s"dump event shorter than a v4 header (${ev.length} bytes)")
                val tpe = ev(4)
                val flags = (ev(17) & 0xff) | ((ev(18) & 0xff) << 8)
                val artificial = (flags & 0x20) != 0
                if (tpe == MysqlBinlog.EventType.Heartbeat ||
                    tpe == MysqlBinlog.EventType.HeartbeatV2)
                  nextItem = DumpItem.Heartbeat
                else if (artificial && tpe == MysqlBinlog.EventType.Rotate) {
                  // body: position u64le + file name to end (artificial
                  // events carry no checksum)
                  var p8 = 0L
                  var i = 0
                  while (i < 8) {
                    p8 |= (ev(19 + i) & 0xffL) << (8 * i); i += 1
                  }
                  nextItem = DumpItem.FileSwitch(new String(ev, 27,
                    ev.length - 27, StandardCharsets.UTF_8), p8)
                } else if (artificial) {
                  // other fabricated events (e.g. a fake FDE some
                  // proxies send) are not file bytes: drop
                } else {
                  val endPos = (ev(13) & 0xffL) | ((ev(14) & 0xffL) << 8) |
                    ((ev(15) & 0xffL) << 16) | ((ev(16) & 0xffL) << 24)
                  nextItem = DumpItem.Event(ev, tpe, endPos)
                }
              case 0xfe => finished = true // EOF: server has no more
              case _ => err(p, "binlog dump stream")
            }
          }
        }
        def hasNext: Boolean = { advance(); nextItem != null }
        def next(): DumpItem = {
          if (!hasNext) throw new NoSuchElementException
          val c = nextItem; nextItem = null; c
        }
      }
    }

    /** COM_BINLOG_DUMP_GTID from (file, pos), optionally with a
      * NON-empty executed GTID set (`executed`: uuid → applied gno
      * high-water; the server skips those transactions — mid-stream
      * resume with ZERO replayed rows). Returns the live event stream
      * as a [[RawEventSource]]: the same [[MysqlBinlog.EventReader]]
      * (CRC verify, FDE policy, flavor check) over the re-framed
      * socket bytes. Artificial events (the dump's ROTATE) and
      * heartbeats are dropped BEFORE framing — they are not file bytes
      * and must not advance reader offsets — so `pos`/`endPos` are
      * true binlog offsets. */
    def dumpFrom(serverId: Long, file: String = "",
        pos: Long = MysqlBinlog.MagicLen.toLong,
        executed: Map[String, Long] = Map.empty): RawEventSource = {
      val raw = dumpRaw(serverId, file, pos, executed)
      var sawFde = false
      val packets: Iterator[Array[Byte]] = raw.flatMap {
        case DumpItem.Event(ev, tpe, _) =>
          // drop any pre-FDE stragglers so framing starts at the FDE
          // (offsets stay the file's own)
          if (sawFde) Some(ev)
          else if (tpe == MysqlBinlog.EventType.FormatDescription) {
            sawFde = true; Some(ev)
          } else None
        case _ => None // FileSwitch / Heartbeat: not file bytes
      }
      val stream = new ChunkStream(Iterator(MysqlBinlog.Magic) ++ packets)
      new MysqlBinlog.EventReader(stream,
        s"replica://${socket.getInetAddress.getHostAddress}:${socket.getPort}",
        maria = false)
    }

    def close(): Unit = socket.close()
  }

  /** Connect + protocol-41 handshake + auth (`mysql_native_password`
    * or `caching_sha2_password` fast path, AuthSwitch honored), then
    * the `SET @master_binlog_checksum` session handshake
    * (`sendChecksumVar = false` only exists so the refusal a real
    * server raises without it stays test-visible). */
  def connect(host: String, port: Int, user: String,
      password: String, sendChecksumVar: Boolean = true): Session = {
    val socket = new Socket(host, port)
    try {
      // buffered socket read: packet framing reads header+payload per
      // event, and an unbuffered stream pays 2+ syscalls per packet —
      // measurable at millions of events on the dump path
      val in = new DataInputStream(
        new java.io.BufferedInputStream(socket.getInputStream, 1 << 16))
      val out = new DataOutputStream(socket.getOutputStream)
      val (_, hello) = readPacket(in)
      if ((hello(0) & 0xff) == 0xff) err(hello, "handshake")
      require((hello(0) & 0xff) == 10,
        s"unsupported handshake protocol version ${hello(0) & 0xff}")
      var o = 1
      while (hello(o) != 0) o += 1 // server_version
      o += 1
      o += 4 // thread id
      val scramble1 = java.util.Arrays.copyOfRange(hello, o, o + 8)
      o += 8 + 1 // + filler
      val capLo = (hello(o) & 0xffL) | ((hello(o + 1) & 0xffL) << 8)
      o += 2
      o += 1 + 2 // charset, status
      val capHi = (hello(o) & 0xffL) | ((hello(o + 1) & 0xffL) << 8)
      o += 2
      val caps = capLo | (capHi << 16)
      // verify the capability bits BEFORE indexing into the auth-data
      // fields the layout below assumes — an exotic fork missing them
      // gets a named refusal, not an index-out-of-bounds
      val needed = Seq(
        ClientProtocol41 -> "CLIENT_PROTOCOL_41",
        ClientSecureConnection -> "CLIENT_SECURE_CONNECTION",
        ClientPluginAuth -> "CLIENT_PLUGIN_AUTH")
      val missing = needed.collect { case (bit, n) if (caps & bit) == 0 => n }
      require(missing.isEmpty,
        s"handshake: server at $host:$port lacks required capabilit" +
          s"${if (missing.length == 1) "y" else "ies"} " +
          s"${missing.mkString(", ")} (capabilities 0x${caps.toHexString}) " +
          "— this client requires the protocol-41 plugin-auth handshake " +
          "every MySQL/MariaDB >= 5.5 server offers")
      val authLen = hello(o) & 0xff
      o += 1 + 10 // + reserved
      // part-2 carries max(13, authLen-8) bytes, NUL-terminated; the
      // scramble is 20 bytes total
      val part2Len = math.max(12, authLen - 9)
      val scramble = scramble1 ++
        java.util.Arrays.copyOfRange(hello, o, o + part2Len)
      o += math.max(13, authLen - 8)
      // the server's default auth plugin for this account (PLUGIN_AUTH
      // verified above): NUL-terminated to end of packet
      val pEnd = {
        var i = o
        while (i < hello.length && hello(i) != 0) i += 1
        i
      }
      val serverPlugin = new String(hello, o, pEnd - o, StandardCharsets.US_ASCII)
      val plugin =
        if (serverPlugin.isEmpty) NativePlugin // pre-5.6 layout: no name
        else serverPlugin
      val token = tokenFor(plugin, password, scramble)
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      writeU32(d, ClientProtocol41 | ClientSecureConnection | ClientPluginAuth)
      writeU32(d, 1L << 24) // max packet
      d.write(33) // utf8
      d.write(new Array[Byte](23))
      d.write(user.getBytes(StandardCharsets.UTF_8)); d.write(0)
      d.write(token.length); d.write(token)
      d.write(plugin.getBytes(StandardCharsets.US_ASCII))
      d.write(0)
      writePacket(out, 1, b.toByteArray)
      // auth result loop: OK / ERR / AuthSwitchRequest (0xfe: redo the
      // scramble under the named plugin) / AuthMoreData (0x01: the
      // caching_sha2 fast-path verdict)
      var done = false
      var switches = 0
      var seq = 2
      while (!done) {
        val (s, resp) = readPacket(in)
        seq = s + 1
        (resp(0) & 0xff) match {
          case 0x00 => done = true
          case 0xff => err(resp, "authentication")
          case 0xfe =>
            switches += 1
            require(switches <= 2,
              "authentication: server keeps switching auth plugins")
            var i = 1
            while (i < resp.length && resp(i) != 0) i += 1
            val newPlugin = new String(resp, 1, i - 1, StandardCharsets.US_ASCII)
            // auth data: the new scramble (20 bytes, often +NUL)
            var end = resp.length
            if (end > i + 1 && resp(end - 1) == 0) end -= 1
            val newScramble = java.util.Arrays.copyOfRange(resp, i + 1, end)
            writePacket(out, seq, tokenFor(newPlugin, password, newScramble))
          case 0x01 =>
            // caching_sha2 AuthMoreData: 0x03 = fast auth success (an
            // OK follows), 0x04 = full auth required
            (resp(1) & 0xff) match {
              case 0x03 => // fall through: next packet is the OK
              case 0x04 => throw new IOException(
                "authentication: caching_sha2_password FULL auth required " +
                  "(no cached credential on the server and the channel is " +
                  "plaintext) — connect over TLS, or prime the server's " +
                  "auth cache with one prior TLS/socket login for this " +
                  "user; the RSA password exchange is deployment " +
                  "hardening, not implemented")
              case other => throw new IOException(
                f"authentication: unexpected AuthMoreData 0x$other%02x")
            }
          case other => throw new IOException(
            f"authentication: unexpected response 0x$other%02x")
        }
      }
      val sess = new Session(socket, in, out)
      if (sendChecksumVar) sess.negotiateChecksum()
      sess
    } catch { case e: Throwable => socket.close(); throw e }
  }

  private def writeU32(d: DataOutputStream, v: Long): Unit = {
    d.write((v & 0xff).toInt); d.write(((v >> 8) & 0xff).toInt)
    d.write(((v >> 16) & 0xff).toInt); d.write(((v >> 24) & 0xff).toInt)
  }
  private def writeU64(d: DataOutputStream, v: Long): Unit = {
    writeU32(d, v & 0xffffffffL); writeU32(d, (v >>> 32) & 0xffffffffL)
  }

  /** InputStream over an iterator of byte chunks — the re-framing shim
    * between dump packets and the byte-stream EventReader. */
  private final class ChunkStream(chunks: Iterator[Array[Byte]])
      extends InputStream {
    private var cur: Array[Byte] = Array.emptyByteArray
    private var off = 0
    private def ensure(): Boolean = {
      while (off >= cur.length) {
        if (!chunks.hasNext) return false
        cur = chunks.next(); off = 0
      }
      true
    }
    override def read(): Int =
      if (!ensure()) -1 else { val b = cur(off) & 0xff; off += 1; b }
    override def read(b: Array[Byte], o: Int, l: Int): Int = {
      if (l == 0) return 0
      if (!ensure()) return -1
      val n = math.min(l, cur.length - off)
      System.arraycopy(cur, off, b, o, n); off += n; n
    }
  }
}
