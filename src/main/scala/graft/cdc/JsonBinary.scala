package graft.cdc

import java.io.IOException
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** MySQL binary JSON codec — the on-disk/in-binlog representation of the
  * JSON column type (MYSQL_TYPE_JSON, 245). The layout is the public
  * protocol documented in mysql's json_binary.h (and decoded by every
  * CDC client): a one-byte type code, then either an inline scalar or a
  * sorted-key container with offset tables sized u16 ("small") or u32
  * ("large").
  *
  * The reference never reached JSON columns (its `Field::unpack` subset
  * at binlog_table_reader.cc:151-157 stops at the scalar types), but a
  * real mysqld CDC stream carries them constantly — SURVEY §2.B notes
  * the type "would surface as text", and that is exactly what this codec
  * does: decode to a canonical COMPACT JSON string (no whitespace; object
  * members in the container's stored order, which MySQL sorts by key
  * length then bytes; shortest-round-trip doubles via Java semantics).
  *
  * Decode accepts the full scalar/container surface (small+large
  * containers, all inline forms, int16..uint64, double, utf8 strings
  * with multi-byte varlen). The opaque type (0x0f — MySQL packs DECIMAL/
  * DATE/TIME values inside JSON that way) and the 5.7-only custom types
  * fail loud rather than guess.
  *
  * Encode (fixture writer / mysqld stand-in) parses JSON text with
  * Jackson, sorts object keys the way MySQL does (length, then bytes;
  * duplicate keys keep the LAST value, matching mysqld), picks signed
  * int16/int32/int64 for integers (uint64 only past Long.MaxValue), and
  * selects the small format whenever count/size/offsets fit u16.
  *
  * All reads are bounds-checked against the document slice and recursion
  * is depth-capped, so corrupt bytes surface as IOException — the same
  * fail-loud posture as the rest of the binlog parser (fuzz-covered in
  * MysqlBinlogSpec).
  */
object JsonBinary {

  // type codes (json_binary.h)
  private val SmallObject = 0x00
  private val LargeObject = 0x01
  private val SmallArray = 0x02
  private val LargeArray = 0x03
  private val Literal = 0x04
  private val Int16 = 0x05
  private val UInt16 = 0x06
  private val Int32 = 0x07
  private val UInt32 = 0x08
  private val Int64 = 0x09
  private val UInt64 = 0x0a
  private val DoubleT = 0x0b
  private val StringT = 0x0c
  private val Opaque = 0x0f

  private val LitNull = 0x00
  private val LitTrue = 0x01
  private val LitFalse = 0x02

  private val MaxDepth = 100

  // ---------------------------------------------------------------- decode

  /** Decode one binary JSON document (type byte + payload) to canonical
    * compact JSON text. */
  def decode(doc: Array[Byte]): String = {
    if (doc.length < 1) throw new IOException("json binary: empty document")
    val sb = new java.lang.StringBuilder(doc.length * 2)
    writeValue(doc, doc(0) & 0xff, 1, sb, 0)
    sb.toString
  }

  private def u16(a: Array[Byte], p: Int): Int = {
    checkBounds(a, p, 2)
    (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8)
  }

  private def u32(a: Array[Byte], p: Int): Long = {
    checkBounds(a, p, 4)
    (a(p) & 0xffL) | ((a(p + 1) & 0xffL) << 8) |
      ((a(p + 2) & 0xffL) << 16) | ((a(p + 3) & 0xffL) << 24)
  }

  private def i64(a: Array[Byte], p: Int): Long = {
    checkBounds(a, p, 8)
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (a(p + i) & 0xffL); i -= 1 }
    v
  }

  private def checkBounds(a: Array[Byte], p: Int, n: Int): Unit =
    // long arithmetic: a corrupt varlen length near Int.MaxValue would
    // overflow p + n negative and slip past an int comparison
    if (p < 0 || n < 0 || p.toLong + n > a.length)
      throw new IOException(
        s"json binary: read of $n bytes at $p past end (${a.length})")

  /** Variable-length unsigned int (string/opaque data lengths): 7 bits
    * per byte, LSB group first, high bit = continuation. */
  private def varlen(a: Array[Byte], p0: Int): (Int, Int) = {
    var v = 0L
    var shift = 0
    var p = p0
    var done = false
    while (!done) {
      checkBounds(a, p, 1)
      val b = a(p) & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
      p += 1
      if ((b & 0x80) == 0) done = true
      else if (shift > 28) throw new IOException("json binary: varlen overflow")
    }
    if (v > Int.MaxValue) throw new IOException(s"json binary: length $v too large")
    (v.toInt, p)
  }

  /** Append the value with type `tpe` whose data starts at `pos`. */
  private def writeValue(a: Array[Byte], tpe: Int, pos: Int,
      sb: java.lang.StringBuilder, depth: Int): Unit = {
    if (depth > MaxDepth) throw new IOException("json binary: nesting too deep")
    tpe match {
      case SmallObject => container(a, pos, sb, depth, small = true, isObj = true)
      case LargeObject => container(a, pos, sb, depth, small = false, isObj = true)
      case SmallArray => container(a, pos, sb, depth, small = true, isObj = false)
      case LargeArray => container(a, pos, sb, depth, small = false, isObj = false)
      case Literal =>
        checkBounds(a, pos, 1)
        (a(pos) & 0xff) match {
          case LitNull => sb.append("null")
          case LitTrue => sb.append("true")
          case LitFalse => sb.append("false")
          case other => throw new IOException(s"json binary: bad literal $other")
        }
      case Int16 => sb.append(u16(a, pos).toShort.toInt)
      case UInt16 => sb.append(u16(a, pos))
      case Int32 => sb.append(u32(a, pos).toInt)
      case UInt32 => sb.append(u32(a, pos))
      case Int64 => sb.append(i64(a, pos))
      case UInt64 =>
        val v = i64(a, pos)
        if (v >= 0) sb.append(v)
        else sb.append(java.math.BigInteger.valueOf(v)
          .add(java.math.BigInteger.ONE.shiftLeft(64)))
      case DoubleT =>
        sb.append(java.lang.Double.toString(
          java.lang.Double.longBitsToDouble(i64(a, pos))))
      case StringT =>
        val (len, dataPos) = varlen(a, pos)
        checkBounds(a, dataPos, len)
        escape(new String(a, dataPos, len, StandardCharsets.UTF_8), sb)
      case Opaque => throw new IOException(
        "json binary: opaque value (MySQL packs DECIMAL/DATE/TIME inside " +
          "JSON as opaque — not in the subset)")
      case other => throw new IOException(s"json binary: unknown type 0x${other.toHexString}")
    }
  }

  /** Object/array: count, size, [key entries,] value entries, payload.
    * All offsets are relative to `start` (the first count byte). */
  private def container(a: Array[Byte], start: Int,
      sb: java.lang.StringBuilder, depth: Int, small: Boolean,
      isObj: Boolean): Unit = {
    val offSz = if (small) 2 else 4
    val count = if (small) u16(a, start) else {
      val c = u32(a, start)
      if (c > Int.MaxValue) throw new IOException("json binary: container count overflow")
      c.toInt
    }
    val size = if (small) u16(a, start + offSz).toLong else u32(a, start + offSz)
    if (start + size > a.length)
      throw new IOException(s"json binary: container size $size past end")
    // each element needs at least one value entry inside `size`: rejects
    // bogus counts before the entry-table arithmetic can overflow
    if (count.toLong * (1 + offSz) > size)
      throw new IOException(s"json binary: count $count too large for size $size")
    val keyEntries = start + 2 * offSz
    val valEntries = keyEntries + (if (isObj) count * (offSz + 2) else 0)
    sb.append(if (isObj) '{' else '[')
    var i = 0
    while (i < count) {
      if (i > 0) sb.append(',')
      if (isObj) {
        val ke = keyEntries + i * (offSz + 2)
        val keyOff = if (small) u16(a, ke).toLong else u32(a, ke)
        val keyLen = u16(a, ke + offSz) // key length is u16 in BOTH formats
        if (keyOff + keyLen > size)
          throw new IOException("json binary: key offset past container")
        checkBounds(a, start + keyOff.toInt, keyLen)
        escape(new String(a, start + keyOff.toInt, keyLen, StandardCharsets.UTF_8), sb)
        sb.append(':')
      }
      val ve = valEntries + i * (1 + offSz)
      checkBounds(a, ve, 1 + offSz)
      val vt = a(ve) & 0xff
      if (inlined(vt, small)) {
        // the offset field IS the value (2 or 4 bytes)
        writeValue(a, vt, ve + 1, sb, depth + 1)
      } else {
        val off = if (small) u16(a, ve + 1).toLong else u32(a, ve + 1)
        if (off >= size)
          throw new IOException("json binary: value offset past container")
        writeValue(a, vt, start + off.toInt, sb, depth + 1)
      }
      i += 1
    }
    sb.append(if (isObj) '}' else ']')
  }

  /** Literal/int16/uint16 inline in both formats; int32/uint32 also
    * inline in the large format (the offset field is 4 bytes there). */
  private def inlined(tpe: Int, small: Boolean): Boolean = tpe match {
    case Literal | Int16 | UInt16 => true
    case Int32 | UInt32 => !small
    case _ => false
  }

  private def escape(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case ctrl if ctrl < 0x20 => sb.append(f"\\u${ctrl.toInt}%04x")
        case other => sb.append(other)
      }
      i += 1
    }
    sb.append('"')
  }

  // ---------------------------------------------------------------- encode

  private val mapper = new ObjectMapper()

  /** Encode JSON text into MySQL binary JSON (type byte + payload) — the
    * mysqld stand-in for the fixture writer. */
  def encode(text: String): Array[Byte] = {
    val node =
      try mapper.readTree(text)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"not valid JSON: ${e.getMessage}")
      }
    val (tpe, payload) = serialize(node, 0)
    val out = new Array[Byte](1 + payload.length)
    out(0) = tpe.toByte
    System.arraycopy(payload, 0, out, 1, payload.length)
    out
  }

  /** (type code, payload bytes) for one value, containers bottom-up. */
  private def serialize(node: JsonNode, depth: Int): (Int, Array[Byte]) = {
    if (depth > MaxDepth)
      throw new IllegalArgumentException("JSON nesting too deep")
    if (node.isNull) (Literal, Array(LitNull.toByte))
    else if (node.isBoolean)
      (Literal, Array((if (node.asBoolean) LitTrue else LitFalse).toByte))
    else if (node.isIntegralNumber) {
      val big = node.bigIntegerValue()
      if (big.bitLength() >= 64 && big.signum() > 0) {
        // positive past Long.MaxValue: uint64 (what mysqld stores)
        if (big.bitLength() > 64)
          throw new IllegalArgumentException(s"integer $big out of uint64 range")
        (UInt64, le(big.longValue(), 8))
      } else {
        val v = node.longValue()
        if (v >= Short.MinValue && v <= Short.MaxValue) (Int16, le(v, 2))
        else if (v >= Int.MinValue && v <= Int.MaxValue) (Int32, le(v, 4))
        else (Int64, le(v, 8))
      }
    } else if (node.isNumber) {
      val d = node.doubleValue()
      // e.g. 1e400 → Infinity, which decode would emit as bare
      // 'Infinity' — invalid JSON; reject instead of corrupting
      require(!d.isNaN && !d.isInfinite,
        s"JSON number ${node.asText} outside the double range")
      (DoubleT, le(java.lang.Double.doubleToLongBits(d), 8))
    }
    else if (node.isTextual) {
      val bytes = node.textValue().getBytes(StandardCharsets.UTF_8)
      val lenB = varlenBytes(bytes.length)
      val out = new Array[Byte](lenB.length + bytes.length)
      System.arraycopy(lenB, 0, out, 0, lenB.length)
      System.arraycopy(bytes, 0, out, lenB.length, bytes.length)
      (StringT, out)
    } else if (node.isArray) {
      val children = (0 until node.size).map(i => serialize(node.get(i), depth + 1))
      containerBytes(None, children)
    } else if (node.isObject) {
      // MySQL key order: ascending by length, then by bytes; duplicate
      // keys keep the last value (mysqld's normalization)
      val fields = {
        val it = node.properties().iterator()
        val buf = scala.collection.mutable.LinkedHashMap.empty[String, JsonNode]
        while (it.hasNext) { val e = it.next(); buf(e.getKey) = e.getValue }
        buf.toSeq
      }
      val sorted = fields.sortBy { case (k, _) =>
        (k.getBytes(StandardCharsets.UTF_8).length, k)
      }
      val keys = sorted.map(_._1.getBytes(StandardCharsets.UTF_8))
      keys.foreach(k => require(k.length <= 0xffff, "JSON object key too long"))
      val children = sorted.map { case (_, v) => serialize(v, depth + 1) }
      containerBytes(Some(keys), children)
    } else
      throw new IllegalArgumentException(s"unsupported JSON node ${node.getNodeType}")
  }

  /** Lay out one container. Small format when count, total size, and
    * every offset fit u16; large otherwise. */
  private def containerBytes(keys: Option[Seq[Array[Byte]]],
      children: Seq[(Int, Array[Byte])]): (Int, Array[Byte]) = {
    val count = children.length
    def layout(small: Boolean): Option[Array[Byte]] = {
      val offSz = if (small) 2 else 4
      val isObj = keys.isDefined
      val headerSz = 2 * offSz +
        (if (isObj) count * (offSz + 2) else 0) + count * (1 + offSz)
      val keyBytes = keys.map(_.map(_.length).sum).getOrElse(0)
      // keys first (right after the entry tables), then spilled values
      var valueOff = headerSz + keyBytes
      val valueOffsets = new Array[Int](count)
      var i = 0
      while (i < count) {
        val (tpe, payload) = children(i)
        if (!inlined(tpe, small)) { valueOffsets(i) = valueOff; valueOff += payload.length }
        i += 1
      }
      val totalSize = valueOff
      if (small && (count > 0xffff || totalSize > 0xffff)) return None
      val out = new java.io.ByteArrayOutputStream(totalSize)
      def putN(v: Long, n: Int): Unit = { var j = 0; while (j < n) { out.write(((v >> (8 * j)) & 0xff).toInt); j += 1 } }
      putN(count.toLong, offSz)
      putN(totalSize.toLong, offSz)
      var keyOff = headerSz
      keys.foreach(_.foreach { k =>
        putN(keyOff.toLong, offSz); putN(k.length.toLong, 2); keyOff += k.length
      })
      i = 0
      while (i < count) {
        val (tpe, payload) = children(i)
        out.write(tpe)
        if (inlined(tpe, small)) {
          // payload is exactly the scalar's little-endian bytes
          var j = 0
          while (j < offSz) { out.write(if (j < payload.length) payload(j) & 0xff else 0); j += 1 }
        } else putN(valueOffsets(i).toLong, offSz)
        i += 1
      }
      keys.foreach(_.foreach(k => out.write(k, 0, k.length)))
      i = 0
      while (i < count) {
        val (tpe, payload) = children(i)
        if (!inlined(tpe, small)) out.write(payload, 0, payload.length)
        i += 1
      }
      Some(out.toByteArray)
    }
    val isObj = keys.isDefined
    layout(small = true) match {
      case Some(b) => (if (isObj) SmallObject else SmallArray, b)
      case None =>
        val b = layout(small = false).get
        (if (isObj) LargeObject else LargeArray, b)
    }
  }

  private def le(v: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = (v >> (8 * i)).toByte; i += 1 }
    out
  }

  private def varlenBytes(len: Int): Array[Byte] = {
    var v = len
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while (v > 0x7f) { buf += ((v & 0x7f) | 0x80).toByte; v >>= 7 }
    buf += v.toByte
    buf.toArray
  }

  // ------------------------------------ PARTIAL_JSON diffs (WL#2955/#4143)

  /** `binlog_row_value_options=PARTIAL_JSON` update payloads: instead of
    * the full after-image document, a JSON column carries a
    * `Json_diff_vector` — the public layout replicas apply
    * (mysql-server sql/json_diff.cc): a sequence of diffs, each
    *
    *   operation  u8        0 = REPLACE, 1 = INSERT, 2 = REMOVE
    *   path_len   lenenc    MySQL net_field_length packed int
    *   path       bytes     JSON path text, e.g. `$.a.b[3]` — diff
    *                        paths are always specific legs (member name
    *                        or array index), never wildcards
    *   value_len  lenenc    REPLACE/INSERT only
    *   value      bytes     a complete binary JSON doc (type + payload)
    *
    * Diff application follows mysqld's semantics: REPLACE requires the
    * path to exist; INSERT requires an object member NOT to exist, and
    * inserts/appends at an array index ≤ size; REMOVE requires
    * existence. A diff that cannot apply fails loud — on a replica
    * that's an apply error, and a CDC reader silently skipping one
    * would serve a wrong after-image. The result is re-canonicalized
    * through encode→decode so the text is byte-identical to what a
    * full-value decode of mysqld's resulting document would produce
    * (MySQL's stored key order: length, then bytes). */
  def applyDiffs(beforeText: String, diffBytes: Array[Byte]): String = {
    val root0 = mapper.readTree(beforeText)
    var root: JsonNode = root0
    var p = 0
    while (p < diffBytes.length) {
      val op = diffBytes(p) & 0xff
      p += 1
      require(op >= 0 && op <= 2, s"json diff: unknown operation $op")
      val (pathLen, p1) = netFieldLength(diffBytes, p)
      checkBounds(diffBytes, p1, pathLen.toInt)
      val path = new String(diffBytes, p1, pathLen.toInt, StandardCharsets.UTF_8)
      p = p1 + pathLen.toInt
      val value: JsonNode =
        if (op == 2) null
        else {
          val (valLen, p2) = netFieldLength(diffBytes, p)
          checkBounds(diffBytes, p2, valLen.toInt)
          val doc = java.util.Arrays.copyOfRange(diffBytes, p2, p2 + valLen.toInt)
          p = p2 + valLen.toInt
          mapper.readTree(decode(doc))
        }
      root = applyOne(root, op, parsePath(path), path, value)
    }
    decode(encode(mapper.writeValueAsString(root)))
  }

  /** Encode a diff vector (fixture writer / mysqld stand-in): ops are
    * (operation, path, json text value — None for REMOVE). */
  def encodeDiffs(diffs: Seq[(Int, String, Option[String])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    diffs.foreach { case (op, path, value) =>
      require(op >= 0 && op <= 2, s"json diff op $op")
      require((op == 2) == value.isEmpty,
        "REPLACE/INSERT need a value; REMOVE must not carry one")
      out.write(op)
      val pb = path.getBytes(StandardCharsets.UTF_8)
      out.write(netFieldBytes(pb.length.toLong)); out.write(pb)
      value.foreach { v =>
        val doc = encode(v)
        out.write(netFieldBytes(doc.length.toLong)); out.write(doc)
      }
    }
    out.toByteArray
  }

  /** One parsed path leg: Left(member name) or Right(array index). */
  private def parsePath(path: String): Seq[Either[String, Int]] = {
    require(path.nonEmpty && path(0) == '$', s"json diff path must start with $$: '$path'")
    val legs = Seq.newBuilder[Either[String, Int]]
    var i = 1
    while (i < path.length) {
      path(i) match {
        case '.' =>
          i += 1
          if (i < path.length && path(i) == '"') {
            // quoted member ("a b", "x\"y") — MySQL quotes non-identifiers
            val sb = new java.lang.StringBuilder
            i += 1
            var closed = false
            while (i < path.length && !closed) {
              path(i) match {
                case '\\' if i + 1 < path.length => sb.append(path(i + 1)); i += 2
                case '"' => closed = true; i += 1
                case ch => sb.append(ch); i += 1
              }
            }
            require(closed, s"unterminated quoted member in path '$path'")
            legs += Left(sb.toString)
          } else {
            val start = i
            while (i < path.length && path(i) != '.' && path(i) != '[') i += 1
            require(i > start, s"empty member name in path '$path'")
            legs += Left(path.substring(start, i))
          }
        case '[' =>
          val close = path.indexOf(']', i)
          require(close > i + 1, s"bad array leg in path '$path'")
          val idx = path.substring(i + 1, close).trim
          require(idx.forall(_.isDigit), s"non-numeric array index in diff path '$path'")
          legs += Right(idx.toInt)
          i = close + 1
        case ch => throw new IllegalArgumentException(
          s"unexpected '$ch' in json diff path '$path'")
      }
    }
    legs.result()
  }

  /** Apply one diff; returns the (possibly replaced) root. */
  private def applyOne(root: JsonNode, op: Int,
      legs: Seq[Either[String, Int]], path: String,
      value: JsonNode): JsonNode = {
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    def fail(why: String): Nothing = throw new IOException(
      s"json diff cannot apply: $why (op=${Seq("REPLACE","INSERT","REMOVE")(op)}, path=$path)")
    if (legs.isEmpty) {
      // root path `$`: only REPLACE is meaningful (mysqld sends a full
      // value for root replacement, but the layout can express it)
      if (op != 0) fail("INSERT/REMOVE at the root")
      return value
    }
    // walk to the parent of the last leg — every intermediate leg must
    // exist (diffs never auto-create)
    var node: JsonNode = root
    legs.dropRight(1).foreach {
      case Left(m) =>
        if (node == null || !node.isObject || !node.has(m)) fail(s"missing member '$m'")
        node = node.get(m)
      case Right(k) =>
        if (node == null || !node.isArray || k >= node.size) fail(s"missing index $k")
        node = node.get(k)
    }
    (legs.last, node) match {
      case (Left(m), o: ObjectNode) => op match {
        case 0 => if (!o.has(m)) fail(s"REPLACE of absent member '$m'") else o.set(m, value)
        case 1 => if (o.has(m)) fail(s"INSERT over existing member '$m'") else o.set(m, value)
        case 2 => if (!o.has(m)) fail(s"REMOVE of absent member '$m'") else o.remove(m)
      }
      case (Right(k), a: ArrayNode) => op match {
        case 0 => if (k >= a.size) fail(s"REPLACE past array end ($k >= ${a.size})") else a.set(k, value)
        case 1 => if (k > a.size) fail(s"INSERT past array end ($k > ${a.size})") else a.insert(k, value)
        case 2 => if (k >= a.size) fail(s"REMOVE past array end ($k >= ${a.size})") else a.remove(k)
      }
      case (Left(m), _) => fail(s"parent of '$m' is not an object")
      case (Right(k), _) => fail(s"parent of [$k] is not an array")
    }
    root
  }

  /** MySQL net_field_length packed integer: (value, next position). */
  private def netFieldLength(a: Array[Byte], p: Int): (Long, Int) = {
    checkBounds(a, p, 1)
    val b0 = a(p) & 0xff
    if (b0 < 0xfb) (b0.toLong, p + 1)
    else if (b0 == 0xfc) { checkBounds(a, p + 1, 2); (u16(a, p + 1).toLong, p + 3) }
    else if (b0 == 0xfd) {
      checkBounds(a, p + 1, 3)
      (((a(p + 1) & 0xff) | ((a(p + 2) & 0xff) << 8) | ((a(p + 3) & 0xff) << 16)).toLong, p + 4)
    } else if (b0 == 0xfe) { checkBounds(a, p + 1, 8); (i64(a, p + 1), p + 9) }
    else throw new IOException(s"json diff: bad packed-length lead byte 0x${b0.toHexString}")
  }

  private def netFieldBytes(v: Long): Array[Byte] = {
    if (v < 0xfb) Array(v.toByte)
    else if (v <= 0xffff) Array(0xfc.toByte) ++ le(v, 2)
    else if (v <= 0xffffff) Array(0xfd.toByte) ++ le(v, 3)
    else Array(0xfe.toByte) ++ le(v, 8)
  }
}
