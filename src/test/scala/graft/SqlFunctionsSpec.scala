package graft

import org.apache.spark.sql.functions._

/** The custom expressions must be reachable from pure SQL after
  * GraftExtensions.register — no Scala imports — and agree with the
  * Column-API wrappers.
  */
class SqlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val registered: Unit = GraftExtensions.register(spark)

  test("scalar expressions are SQL-callable and match the Column API") {
    registered
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f), "a b c a", "hello"),
      (Array(0f, 0f, 0f), Array(1f, 0f, 0f), "x y", "world"))
      .toDF("va", "vb", "txt", "s")
    df.createOrReplaceTempView("sqlfn_t")
    val viaSql = spark.sql(
      """SELECT cosine_sim(va, vb) AS cs, simhash64(split(txt, ' ')) AS sh,
        |  simhash64_poly(split(txt, ' ')) AS shp,
        |  rolling_hash(split(txt, ' ')) AS rh, mod_poly_hash(s) AS mp,
        |  sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS ic,
        |  minhash_sig(split(txt, ' '), 4, 2) AS ms
        |FROM sqlfn_t""".stripMargin).collect()
    import graft.functions.VectorFunctions._
    val viaApi = df.select(
      cosine_sim($"va", $"vb").as("cs"), simhash64(split($"txt", " ")).as("sh"),
      simhash64_poly(split($"txt", " ")).as("shp"),
      rolling_hash(split($"txt", " ")).as("rh"), mod_poly_hash($"s").as("mp"),
      sorted_intersect_count(array(lit("a"), lit("b"), lit("c")),
        array(lit("b"), lit("c"), lit("d"))).as("ic"),
      minhash_sig(split($"txt", " "), 4, 2).as("ms")).collect()
    assert(viaSql.map(_.toString).toSeq == viaApi.map(_.toString).toSeq)
    assert(viaSql.head.getInt(5) == 2) // {b,c}
  }

  test("kmv sketch aggregate works from SQL and estimates exactly below saturation") {
    registered
    spark.range(100).toDF("x").createOrReplaceTempView("sqlfn_r")
    val est = spark.sql(
      "SELECT kmv_estimate(kmv_sketch(x, 1024), 1024) AS est FROM sqlfn_r")
      .head().getDouble(0)
    assert(est == 100.0) // n < k -> exact
  }

  test("non-literal k fails loud") {
    registered
    spark.range(3).toDF("x").createOrReplaceTempView("sqlfn_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_sketch(x, cast(x AS INT)) FROM sqlfn_bad").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
