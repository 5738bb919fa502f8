package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference-object expressions (NearestCells, PqCodes, PqLut)
  * claim byte-identical results to the literal-expression forms they
  * replaced for plan-cost reasons. Those literal forms no longer exist
  * in the engine, so this spec RECONSTRUCTS each one from Column
  * primitives (struct arrays + array_sort/array_min + literal
  * centroid/codeword arrays — exactly the replaced construction) and
  * pins equality on random data. Guards future kernel edits: a changed
  * fold order or tie-break here would silently shift IVF cells or PQ
  * codes while every higher-level invariant still passed. */
class RefObjExprSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(19)
  private def vecs(n: Int, dim: Int) =
    (0L until n.toLong).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))

  test("NearestCells equals the literal struct-array_sort probe construction") {
    val dim = 16
    val cents = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    // duplicate one centroid so the (negsim, cell) tie-break is exercised
    cents(5) = cents(2).clone()
    val df = vecs(200, dim).toDF("vec_id", "embedding").localCheckpoint(true)
    val literal: Column = {
      val entries = array(cents.zipWithIndex.toIndexedSeq.map { case (c, i) =>
        struct((lit(-2.0) * dot_product(col("embedding"), lit(c))).as("negsim"),
          lit(i).as("cell"))
      }: _*)
      slice(transform(array_sort(entries), p => p.getField("cell")), 1, 3)
    }
    val out = df.select(col("vec_id"),
        nearest_cells(col("embedding"), cents, 3).as("got"), literal.as("exp"))
      .filter(not(col("got") === col("exp")))
    assert(out.count() == 0, s"nearest_cells diverged:\n${out.head(3).mkString("\n")}")
  }

  test("NearestCells fails loud at plan time on nProbe < 1 or empty centroids") {
    val cents = Array.fill(4)(Array.fill(8)(rnd.nextGaussian()))
    val e1 = intercept[IllegalArgumentException] {
      nearest_cells(col("embedding"), cents, 0)
    }
    assert(e1.getMessage.contains("nProbe"))
    val e2 = intercept[IllegalArgumentException] {
      nearest_cells(col("embedding"), cents, -1)
    }
    assert(e2.getMessage.contains("nProbe"))
    val e3 = intercept[IllegalArgumentException] {
      nearest_cells(col("embedding"), Array.empty[Array[Double]], 1)
    }
    assert(e3.getMessage.contains("empty centroid"))
  }

  test("PqCodes/PqLut equal the literal struct-min / sliced-dot constructions") {
    val dim = 16; val m = 4; val dsub = dim / m; val ksub = 8
    val books = Array.fill(m)(Array.fill(ksub)(Array.fill(dsub)(rnd.nextGaussian())))
    // duplicated codeword in one subspace exercises the code tie-break
    books(1)(6) = books(1)(3).clone()
    val df = vecs(200, dim).toDF("vec_id", "embedding").localCheckpoint(true)
    def norm2(v: Array[Double]): Double = v.map(x => x * x).sum
    val literalCodes: Column = array((0 until m).map { j =>
      val sub = slice(col("embedding"), j * dsub + 1, dsub)
      array_min(array(books(j).zipWithIndex.toIndexedSeq.map { case (cw, c) =>
        struct((lit(norm2(cw)) - lit(2.0) * dot_product(sub, lit(cw))).as("d"),
          lit(c).as("code"))
      }: _*)).getField("code")
    }: _*)
    val literalLut: Column = array((0 until m).map { j =>
      array(books(j).toIndexedSeq.map(cw =>
        dot_product(slice(col("embedding"), j * dsub + 1, dsub), lit(cw))): _*)
    }: _*)
    val out = df.select(
        pq_codes(col("embedding"), books, dsub).as("gc"), literalCodes.as("ec"),
        pq_lut(col("embedding"), books, dsub).as("gl"), literalLut.as("el"))
      .filter(not(col("gc") === col("ec")) || not(col("gl") === col("el")))
    assert(out.count() == 0, s"PQ expressions diverged:\n${out.head(3).mkString("\n")}")
  }
}
