package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-profiler: runMain graft.tools.Profile <queryName> <reps>
  * [sfDir] [warmups] — runs `warmups` untimed executions (default 1),
  * then times `reps`. The IVF/PQ family needs ~5 warmups to reach
  * steady state: C2 compilation of the kmeans/encode/score paths ramps
  * over the first ~5 executions (a monotone per-rep decrease, measured
  * round 9 — NOT host noise or tiny-task scheduling; spread at
  * steady state is < 1.3x). */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args(1).toInt
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    // match the bench environment when reproducing bench numbers:
    // SPARK_GRAFT_CPUS=32 (the driver's bench runs local[32])
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    val warmups = if (args.length > 3) args(3).toInt else 1
    (1 to warmups).foreach { _ => fn(spark, sfDir).count(); release() }
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      release()
      dt
    }
    val all = times.map(t => f"$t%.2f").mkString(" ")
    println(f"PROFILE $name: min=${times.min}%.2f median=${times.sorted.apply(reps / 2)}%.2f max=${times.max}%.2f reps=[$all]")
    spark.stop()
  }
}
