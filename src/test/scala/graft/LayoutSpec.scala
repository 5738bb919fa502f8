package graft

import graft.ops.Layout
import graft.ops.Layout.Dim
import org.apache.spark.sql.functions._

/** Z-order layout: the interleave formula, the operator's invariants,
  * and the pruning property the layout exists for (tight per-file
  * min/max spans on every interleaved dimension).
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue matches the scalar reference interleave on a full grid") {
    val dims = Seq(Dim("a", 0L, 15L), Dim("b", 0L, 15L))
    val grid = for { a <- 0L to 15L; b <- 0L to 15L } yield (a, b)
    val got = grid.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(dims, 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    grid.foreach { case (a, b) =>
      // bounds span exactly 2^4 values, so bucket == value
      val expect = Layout.interleaveRef(Array(a, b), 4)
      assert(got((a, b)) == expect, s"($a,$b)")
    }
    // bijective over the grid: 256 distinct keys covering [0, 256)
    assert(got.values.toSet == (0L until 256L).toSet)
  }

  test("out-of-range values clamp into edge buckets; 3 dims interleave") {
    val dims = Seq(Dim("a", 10L, 17L), Dim("b", 0L, 7L), Dim("c", 0L, 7L))
    val df = Seq((5L, 3L, 4L), (99L, 3L, 4L), (10L, 3L, 4L), (17L, 3L, 4L))
      .toDF("a", "b", "c")
    val z = df.select(Layout.zValue(dims, 3).as("z")).collect().map(_.getLong(0))
    assert(z(0) == z(2)) // below lo == lo
    assert(z(1) == z(3)) // above hi == hi
    assert(z(0) == Layout.interleaveRef(Array(0L, 3L, 4L), 3))
    assert(z(1) == Layout.interleaveRef(Array(7L, 3L, 4L), 3))
  }

  test("zOrderBy preserves the row multiset and sorts by the key") {
    val dims = Seq(Dim("x", 0L, 1023L), Dim("y", 0L, 1023L))
    val df = spark.range(2000).select(
      (col("id") * 37 % 1024).as("x"), (col("id") * 101 % 1024).as("y"))
    val out = Layout.zOrderBy(df, dims, bits = 10, numFiles = 4)
    assert(out.columns.contains("__z"))
    assert(out.drop("__z").except(df).isEmpty && df.except(out.drop("__z")).isEmpty)
    // sorted within partitions, range-partitioned across them: the
    // concatenation of partitions in order is globally z-sorted
    val perPart = out.select(spark_partition_id().as("p"), col("__z"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(perPart.sortBy(_._1).map(_._2).sliding(2).forall(
      s => s.length < 2 || s(0) <= s(1)))
    // collision guard: a fresh name is required
    intercept[IllegalArgumentException] {
      Layout.zOrderBy(df.withColumn("__z", lit(1)), dims, 10, 4)
    }
  }

  test("pruning: z-layout bounds BOTH dimensions' per-file spans; linear does not") {
    val n = 1 << 14
    val dims = Seq(Dim("x", 0L, 127L), Dim("y", 0L, 127L))
    // uniform 128x128 grid, one point per cell, shuffled arrival order
    val df = spark.range(n).select(
      (col("id") % 128).as("x"), ((col("id") * 2654435761L % n) % 128).as("y"))
    val files = 16
    def spans(laid: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      laid.groupBy(spark_partition_id()).agg(
        min("x"), max("x"), min("y"), max("y"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val zSpans = spans(Layout.zOrderBy(df, dims, bits = 7, numFiles = files))
    val linSpans = spans(df.repartitionByRange(files, col("x"))
      .sortWithinPartitions("x"))
    // a box query on y: files whose [yLo, yHi] misses [0, 31] are skipped
    def skipped(s: Array[(Long, Long, Long, Long)]): Int =
      s.count { case (_, _, yLo, yHi) => yHi < 0 || yLo > 31 }
    // linear layout: every file spans all of y — nothing prunes
    assert(skipped(linSpans) == 0)
    // z-layout: most files miss the box entirely
    assert(skipped(zSpans) >= zSpans.length / 2,
      s"z-layout skipped ${skipped(zSpans)} of ${zSpans.length}")
    // and the x dimension still prunes too: most files' x-span is a
    // fraction of the domain (a sampled range-partition boundary that
    // straddles a quadrant transition can make ONE file wide — that is
    // the z-curve's known discontinuity, not a layout failure, so the
    // bound is 3/4-of-files rather than forall)
    val tightX = zSpans.count { case (xLo, xHi, _, _) => xHi - xLo <= 64 }
    assert(tightX * 4 >= zSpans.length * 3,
      zSpans.map { case (a, b, _, _) => s"$a-$b" }.mkString(","))
  }
}
