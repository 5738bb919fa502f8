package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: approx-vs-exact error magnitudes for q47/q53/q61/q62, used
  * to set the invariant-oracle bounds empirically (all estimators are
  * seeded/deterministic, so observed error at a SF is a fixed number). */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val li = Tables.load(spark, sfDir, "lineitem")
    // q47: approx_count_distinct + approx_percentile vs exact
    val q47 = li.groupBy($"l_returnflag").agg(
      approx_count_distinct($"l_partkey").as("acd"),
      countDistinct($"l_partkey").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("amed"),
      expr("percentile(l_extendedprice, 0.45)").as("p45"),
      expr("percentile(l_extendedprice, 0.55)").as("p55"))
    q47.collect().foreach { r =>
      println(s"PROBE q47 ${r.get(0)} acd=${r.getLong(1)} exact=${r.getLong(2)} " +
        f"relerr=${math.abs(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(2)}%.4f " +
        s"amed=${r.getDouble(3)} p45=${r.getDouble(4)} p55=${r.getDouble(5)}")
    }
    // q53: sample size vs n*0.1
    val n = li.count()
    val ns = li.sample(withReplacement = false, 0.1, seed = 42).count()
    println(f"PROBE q53 n=$n sampled=$ns ratio=${ns.toDouble / n}%.4f")
    // q61: CMS overestimate magnitudes
    val bytes = li.select(expr("count_min_sketch(l_suppkey, 0.001d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = li.groupBy($"l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val overs = Tables.load(spark, sfDir, "supplier").select($"s_suppkey").as[Long].collect()
      .map(k => cms.estimateCount(Long.box(k)) - exact.getOrElse(k, 0L))
    println(s"PROBE q61 n=$n epsN=${0.001 * n} maxOver=${overs.max} minOver=${overs.min}")
    // q62: KMV estimate errors
    import graft.functions.VectorFunctions._
    val k = 1024
    val orders = Tables.load(spark, sfDir, "orders")
    val sk = orders.groupBy($"o_orderstatus").agg(kmv_sketch($"o_custkey", k).as("sk"))
    val a = sk.select($"o_orderstatus".as("sa"), $"sk".as("ska"))
    val b = sk.select($"o_orderstatus".as("sb"), $"sk".as("skb"))
    val ests = a.join(b, $"sa" < $"sb").select($"sa", $"sb",
      kmv_estimate($"ska", k).as("ea"), kmv_estimate($"skb", k).as("eb"),
      kmv_estimate(kmv_merge($"ska", $"skb", k), k).as("eu"),
      kmv_intersect_estimate($"ska", $"skb", k).as("ei"))
      .collect()
    val dd = orders.select($"o_orderstatus".as("st"), $"o_custkey".as("ck")).distinct()
    val exSt = dd.groupBy($"st").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exInt = dd.as("x").join(dd.as("y"),
        col("x.ck") === col("y.ck") && col("x.st") < col("y.st"))
      .groupBy(col("x.st"), col("y.st")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    ests.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (xa, xb) = (exSt(sa), exSt(sb))
      val xi = exInt.getOrElse((sa, sb), 0L)
      val xu = xa + xb - xi
      println(f"PROBE q62 $sa-$sb a=${r.getDouble(2)}%.1f/$xa (${math.abs(r.getDouble(2) - xa) / xa}%.4f) " +
        f"b=${r.getDouble(3)}%.1f/$xb (${math.abs(r.getDouble(3) - xb) / xb}%.4f) " +
        f"u=${r.getDouble(4)}%.1f/$xu (${math.abs(r.getDouble(4) - xu) / xu}%.4f) " +
        f"i=${r.getDouble(5)}%.1f/$xi (absOverU=${math.abs(r.getDouble(5) - xi) / xu}%.4f)")
    }
    spark.stop()
  }
}
