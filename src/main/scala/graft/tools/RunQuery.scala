package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted correctness dump: run only the named SparkEntry queries
  * (args: sfDir outDir name1 [name2 ...]) — same output layout as
  * graft.Verify, for fast iteration on one query at any scale factor.
  * The oracle_sql.json it writes contains only the named queries, so
  * scripts/check_oracle.py compares exactly this subset.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: RunQuery <sfDir> <outDir> <name...>")
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) =>
          fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        case None => System.err.println(s"[runquery] unknown query: $name")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
