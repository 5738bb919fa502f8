package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection: `runMain graft.tools.Explain <queryName> [sfDir]`
  * prints the formatted physical plan — the iterate-on-the-plan loop the
  * builder prompt asks for (pushed filters, scan pruning, codegen spans,
  * join strategies).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    spark.stop()
  }
}
