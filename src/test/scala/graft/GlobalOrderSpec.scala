package graft

import graft.ops.{GlobalOrder, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalOrder (distributed global row number) must equal the naive
  * single-partition window for ANY partition count, and
  * deterministicSplit must be reproducible and duplicate-consistent.
  */
class GlobalOrderSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = {
    // keys deliberately skewed and out of insertion order, with ties on
    // the primary sort key (v) resolved by the unique id
    (0 until 500).map(i => ((i * 37) % 500L, (i % 13).toLong)).toDF("id", "v")
  }

  test("globalRowNumber equals the naive global window at any partition count") {
    val naive = df.withColumn("pos",
        row_number().over(Window.orderBy($"v".desc, $"id")).cast("long"))
      .select($"id", $"pos")
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (n <- Seq(1, 3, 8)) {
      val got = GlobalOrder.globalRowNumber(df, Seq($"v".desc, $"id"),
          numPartitions = n)
        .select($"id", $"pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected, s"mismatch at numPartitions=$n")
    }
  }

  test("globalRowNumber is correct with Catalyst exchange reuse disabled") {
    // the count pass and the assignment pass share one RDD (zipWithIndex),
    // so correctness is structural — it must NOT depend on exchange reuse
    // (the advisor's round-4 failure scenario for the two-branch form)
    val naive = df.withColumn("pos",
        row_number().over(Window.orderBy($"v".desc, $"id")).cast("long"))
      .select($"id", $"pos")
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    withSQLConf("spark.sql.exchange.reuse" -> "false") {
      val got = GlobalOrder.globalRowNumber(df, Seq($"v".desc, $"id"),
          numPartitions = 4)
        .select($"id", $"pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected)
    }
  }

  test("globalRowNumber assigns a dense 1..N permutation") {
    val pos = GlobalOrder.globalRowNumber(df, Seq($"v", $"id"), numPartitions = 5)
      .select($"pos").as[Long].collect().sorted
    assert(pos.toSeq == (1L to 500L))
  }

  test("deterministicSplit is reproducible, covers all docs, and is duplicate-consistent") {
    val docs = (0 until 200).map(i => (i.toLong, s"doc text number ${i % 50}"))
      .toDF("doc_id", "text") // 4 exact copies of each distinct text
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val a = TextAnalysis.deterministicSplit(docs, "text", splits)
    val b = TextAnalysis.deterministicSplit(docs.repartition(7), "text", splits)
    assert(a.groupBy("split").count().collect().map(_.getLong(1)).sum == 200)
    // same assignment regardless of partitioning
    val ma = a.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val mb = b.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ma == mb)
    // duplicate texts always share a split (contamination guard)
    val perText = a.groupBy("text").agg(countDistinct("split").as("n"))
      .agg(max("n")).head().getLong(0)
    assert(perText == 1L)
  }

  test("chunkDocs covers every token exactly, at all edge lengths") {
    // lengths around every boundary: 1, stride-1, stride, stride+1,
    // width, width+1, exact multiples, and a long doc
    val lens = Seq(1, 23, 24, 25, 32, 33, 48, 49, 96, 100, 240, 241)
    val docs = lens.zipWithIndex.map { case (len, i) =>
      (i.toLong, (0 until len).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocs(docs, "text", "doc_id", width = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val byDoc = chunks.groupBy(_._1)
    lens.zipWithIndex.foreach { case (len, i) =>
      val cs = byDoc(i.toLong).sortBy(_._2)
      assert(cs.length == math.ceil(len / 24.0).toInt, s"chunk count for len=$len")
      // chunk i starts at token i*stride and the last chunk ends at n
      cs.foreach { case (_, ci, nct, first) =>
        assert(first == s"t${ci * 24}", s"first token of chunk $ci at len=$len")
        assert(nct == math.min(32, len - ci * 24), s"chunk len of $ci at len=$len")
      }
      assert(cs.last._2 * 24 + cs.last._3 == len, s"coverage at len=$len")
    }
  }

  test("deterministicSplit rejects weights that do not sum to outOf") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.deterministicSplit(docs, "text", Seq("train" -> 70, "val" -> 10))
    }
  }
}
