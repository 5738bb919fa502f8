package graft

import java.io.IOException

import graft.cdc.JsonBinary
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** MySQL binary JSON codec (json_binary.h layout): canonical round-trip,
  * the small/large format switch, inline-scalar forms, MySQL's key
  * ordering, and fail-loud bounds behavior on corrupt bytes. The
  * cdc28_mysql_json oracle query covers the same codec end-to-end
  * through the binlog source against DuckDB. */
class JsonBinarySpec extends AnyFunSuite {

  private def roundTrip(canonical: String): Unit =
    assert(JsonBinary.decode(JsonBinary.encode(canonical)) === canonical)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("scalar roots round-trip canonically") {
    Seq("null", "true", "false", "0", "42", "-13", "32767", "-32768",
      "32768", "2147483647", "2147483648", "9223372036854775807",
      "0.5", "-1.5", "\"\"", "\"abc\"", "\"s5\"").foreach(roundTrip)
  }

  test("uint64 root: positive past Long.MaxValue") {
    roundTrip("18446744073709551615")
  }

  test("containers round-trip: nested, empty, mixed scalars") {
    roundTrip("[]")
    roundTrip("{}")
    roundTrip("[1,true,false,null,[]]")
    roundTrip("[-50,\"a\",null,{\"x\":7}]")
    roundTrip("""{"k":123,"st":"O","big":123000369,"meta":{"d":0.5,"em":{}}}""")
    roundTrip("[[[[\"deep\"]]]]")
  }

  test("object keys sort MySQL-style: by length, then bytes") {
    // input order scrambled; stored (and therefore emitted) order is
    // (len, bytes): b, a10 < ab? no — "b"(1) first, then "ab"(2), "a10"(3)
    val enc = JsonBinary.encode("""{"ab":2,"b":1,"a10":3}""")
    assert(JsonBinary.decode(enc) === """{"b":1,"ab":2,"a10":3}""")
  }

  test("duplicate keys keep the last value (mysqld normalization)") {
    assert(JsonBinary.decode(JsonBinary.encode("""{"a":1,"a":2}""")) === """{"a":2}""")
  }

  test("long strings use multi-byte varlen lengths") {
    val s = "x" * 200 // > 127: 2-byte varlen
    roundTrip(s""""$s"""")
    val s2 = "y" * 20000 // > 16383: 3-byte varlen
    roundTrip(s""""$s2"""")
  }

  test("string escapes survive the round-trip") {
    roundTrip("\"a\\\"b\\\\c\\nd\\te\\u0001f\"")
    roundTrip("\"snowman ☃ and emoji 😀\"") // multi-byte utf8
  }

  test("large format kicks in past the u16 size limit and stays correct") {
    // 30k inline int16 elements: 4 + 30000·3 entry bytes > 64 KiB -> large
    // (20k would fit small at 60 KB — inline scalars spill no payload)
    val big = (0 until 30000).mkString("[", ",", "]")
    val enc = JsonBinary.encode(big)
    assert((enc(0) & 0xff) === 0x03, "expected large-array type byte")
    assert(JsonBinary.decode(enc) === big)
    // object with enough members to spill: large object
    val bigObj = (0 until 9000).map(i => s""""k$i":$i""").mkString("{", ",", "}")
    val encO = JsonBinary.encode(bigObj)
    assert((encO(0) & 0xff) === 0x01, "expected large-object type byte")
    // emitted order is (len, bytes), so compare as parsed maps
    val dec = JsonBinary.decode(encO)
    assert(dec.length === bigObj.length)
    assert(dec.startsWith("""{"k0":0,"""))
  }

  test("small format is used whenever it fits") {
    assert((JsonBinary.encode("""{"a":1}""")(0) & 0xff) === 0x00)
    assert((JsonBinary.encode("""[1,2]""")(0) & 0xff) === 0x02)
  }

  test("inline int16 in small containers occupies the offset slot") {
    // [1] : count 2B, size 2B, one entry (1B type + 2B inline) = 7 bytes
    val enc = JsonBinary.encode("[1]")
    assert(enc.length === 1 + 7)
  }

  test("opaque and unknown types fail loud") {
    val opaque = Array[Byte](0x0f, 0x00)
    val e = intercept[IOException](JsonBinary.decode(opaque))
    assert(e.getMessage.contains("opaque"))
    intercept[IOException](JsonBinary.decode(Array[Byte](0x77, 0x00)))
    intercept[IOException](JsonBinary.decode(Array.emptyByteArray))
  }

  test("golden bytes: hand-authored documents decode to pinned text") {
    // laid out from the public json_binary.h spec, NOT via encode() —
    // pins the byte layout so encoder/decoder co-drift cannot pass
    def hex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2)
        .map(java.lang.Integer.parseInt(_, 16).toByte).toArray
    // small object {"a":1,"bc":"x"}: count=2, size=0x17, key entries
    // (offset,len), value entries (type, inline-or-offset), keys, values
    assert(JsonBinary.decode(hex(
      "00 0200 1700 1200 0100 1300 0200 05 0100 0c 1500 61 6263 01 78"))
      === """{"a":1,"bc":"x"}""")
    // small array [true,null,-1]: literals inline (0x04/01, 0x04/00),
    // int16 inline (0x05 ffff)
    assert(JsonBinary.decode(hex("02 0300 0d00 04 0100 04 0000 05 ffff"))
      === "[true,null,-1]")
    // scalar roots: int32 (0x07), uint64 past Long.MaxValue (0x0a),
    // double 0.5 (0x0b IEEE LE), string with 1-byte varlen (0x0c)
    assert(JsonBinary.decode(hex("07 40e20100")) === "123456")
    assert(JsonBinary.decode(hex("0a ffffffffffffffff"))
      === "18446744073709551615")
    assert(JsonBinary.decode(hex("0b 000000000000e03f")) === "0.5")
    assert(JsonBinary.decode(hex("0c 02 6869")) === "\"hi\"")
  }

  test("huge varlen string length fails loud instead of overflowing the bounds check") {
    // varlen 0x7fffffff: int arithmetic would wrap p + n negative and
    // slip past the check into an ArrayIndexOutOfBounds crash
    val doc = Array[Byte](0x0c, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0x07)
    intercept[IOException](JsonBinary.decode(doc))
  }

  test("numbers outside the double range are rejected at encode") {
    intercept[IllegalArgumentException](JsonBinary.encode("1e400"))
    intercept[IllegalArgumentException](JsonBinary.encode("""{"a":-1e999}"""))
  }

  test("corrupt bytes surface as IOException, never as runtime crashes") {
    val seeds = Seq("""{"a":[1,2,{"b":"c"}],"d":0.5}""", "[1,2,3]", "\"abc\"")
      .map(JsonBinary.encode)
    val rnd = new scala.util.Random(20260813L)
    seeds.foreach { doc =>
      (0 until 2000).foreach { _ =>
        val mutated = doc.clone()
        val flips = 1 + rnd.nextInt(4)
        (0 until flips).foreach { _ =>
          mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
        }
        val truncated = java.util.Arrays.copyOf(
          mutated, 1 + rnd.nextInt(mutated.length))
        try { JsonBinary.decode(mutated); JsonBinary.decode(truncated); () }
        catch { case _: IOException => () } // the only acceptable failure
      }
    }
  }

  test("property: random JSON trees round-trip through the binary form") {
    val scalarGen: Gen[String] = Gen.oneOf(
      Gen.choose(Int.MinValue.toLong - 5, Int.MaxValue.toLong + 5).map(_.toString),
      Gen.oneOf("null", "true", "false"),
      Gen.alphaNumStr.map(s => "\"" + s.take(30) + "\""),
      Gen.choose(0, 1000).map(n => s"$n.5"))
    def treeGen(depth: Int): Gen[String] =
      if (depth == 0) scalarGen
      else Gen.frequency(
        3 -> scalarGen,
        1 -> Gen.listOfN(3, treeGen(depth - 1)).map(_.mkString("[", ",", "]")),
        1 -> Gen.listOfN(3, treeGen(depth - 1)).map { vs =>
          // keys of equal length in ascending order => already canonical
          vs.zipWithIndex.map { case (v, i) => s""""k$i":$v""" }
            .mkString("{", ",", "}")
        })
    check(Prop.forAll(treeGen(3)) { doc =>
      JsonBinary.decode(JsonBinary.encode(doc)) == doc
    })
  }
}
