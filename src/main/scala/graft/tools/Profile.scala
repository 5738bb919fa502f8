package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-profiler: runMain graft.tools.Profile <queryName> <reps> [sfDir]
  * — warms up once, then times `reps` executions. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args(1).toInt
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // drop eagerly-cached state (localCheckpoint RDDs) between reps —
    // accumulated copies otherwise inflate later samples; blocking so
    // the removal cost stays outside the next timed window (see Bench)
    def release(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    fn(spark, sfDir).count() // warmup
    release()
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      release()
      dt
    }
    println(f"PROFILE $name: min=${times.min}%.2f median=${times.sorted.apply(reps / 2)}%.2f max=${times.max}%.2f")
    spark.stop()
  }
}
