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

  test("hilbert: bijective over the grid and every curve step is a grid neighbor") {
    val bits = 6 // 64x64 grid, 4096 cells
    val dims = (Dim("a", 0L, 63L), Dim("b", 0L, 63L))
    val grid = for { a <- 0L to 63L; b <- 0L to 63L } yield (a, b)
    val got = grid.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.hilbertValue(dims._1, dims._2, bits).as("h"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
    // bijective: positions are exactly [0, 4096)
    assert(got.map(_._1).sorted.toSeq == (0L until 4096L).toSeq)
    // the defining property Z-order lacks: consecutive curve positions
    // are ALWAYS grid neighbors (|dx| + |dy| == 1) — no diagonal jumps
    val byPos = got.sortBy(_._1).map(_._2)
    byPos.sliding(2).filter(_.length == 2).foreach { w =>
      val ((ax, ay), (bx, by)) = (w(0), w(1))
      assert(math.abs(ax - bx) + math.abs(ay - by) == 1,
        s"jump from ($ax,$ay) to ($bx,$by)")
    }
    // matches the scalar kernel (the expression's codegen and eval paths
    // share it; this pins the bucket plumbing around it)
    val direct = graft.functions.ExprHelpers.hilbertIndex(5L, 40L, bits)
    assert(got.find(_._2 == ((5L, 40L))).get._1 == direct)
  }

  test("hilbertOrderBy clusters: per-file spans stay tight on both dims") {
    val dims = (Dim("x", 0L, 127L), Dim("y", 0L, 127L))
    val df = spark.range(1 << 14).select(
      (col("id") % 128).as("x"), ((col("id") * 2654435761L % (1 << 14)) % 128).as("y"))
    val out = Layout.hilbertOrderBy(df, dims._1, dims._2, bits = 7, numFiles = 16)
    assert(out.drop("__h").except(df).isEmpty && df.except(out.drop("__h")).isEmpty)
    val spans = out.groupBy(spark_partition_id()).agg(
      min("x"), max("x"), min("y"), max("y"))
      .collect().map(r => (r.getLong(2) - r.getLong(1), r.getLong(4) - r.getLong(3)))
    // Hilbert has no quadrant-transition diagonal: every 1/16 segment of
    // the curve stays inside a bounded window on BOTH dimensions
    assert(spans.forall { case (dx, dy) => dx <= 80 && dy <= 80 },
      spans.mkString(","))
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
