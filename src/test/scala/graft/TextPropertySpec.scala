package graft

import graft.functions.ExprHelpers
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based specs for the text kernels the oracles rely on:
  * random token arrays checked against straight-line Scala references,
  * pinning the exact bit/fold layout the DuckDB oracle SQL replays.
  */
class TextPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  // small vocabulary so runs and cross-token collisions actually occur
  private val genToken: Gen[String] =
    Gen.oneOf(Seq("a", "b", "batch", "join", "w1", "w2"))
  private val genTokens: Gen[List[String]] = Gen.listOf(genToken)

  test("collapseRepeats over random docs equals a run-collapse fold reference") {
    // ONE Spark job over a batch of random docs (not one job per sample)
    val rnd = new scala.util.Random(42)
    val vocab = Seq("a", "b", "batch", "join", "w1", "w2")
    val docs = (0 until 300).map { i =>
      val n = rnd.nextInt(30) + 1
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val out = graft.ops.TextAnalysis.collapseRepeats(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").toList
      val ref = toks.foldLeft(List.empty[String]) {
        case (acc, t) if acc.headOption.contains(t) => acc
        case (acc, t) => t :: acc
      }.reverse
      assert(out(id) == (ref.mkString(" "), (toks.length - ref.length).toLong),
        s"doc $id: '$text'")
    }
  }

  test("simhash64Poly: bit layout matches an independent per-bit vote reference") {
    check(Prop.forAll(genTokens) { toks =>
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any])
      val got = ExprHelpers.simhash64Poly(arr)
      // reference: recompute the two 31-bit poly hashes per token and
      // vote bit-by-bit, exactly as the DuckDB oracle CTEs do
      def poly(s: String, base: Long): Long =
        s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * base + (b & 0xFF)) % 2147483647L)
      var ref = 0L
      (0 until 62).foreach { bit =>
        val tally = toks.map { t =>
          val h = if (bit < 31) poly(t, 131L) else poly(t, 137L)
          val b = if (bit < 31) bit else bit - 31
          if (((h >>> b) & 1L) == 1L) 1 else -1
        }.sum
        if (tally > 0) ref |= (1L << bit)
      }
      got == ref && (got >>> 62) == 0L
    })
  }

  test("polyTokenHash: stays in [0, 2^31-1) and matches a BigInt-exact fold") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.oneOf(131L, 137L)) { (s, base) =>
      val got = ExprHelpers.polyTokenHash(UTF8String.fromString(s), base)
      val ref = s.getBytes("UTF-8").foldLeft(BigInt(0))(
        (h, b) => (h * base + (b & 0xFF)) % 2147483647L)
      got == ref.toLong && got >= 0L && got < 2147483647L
    })
  }
}
