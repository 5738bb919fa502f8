package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Build-time extension entry point:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  * }}}
  * injects the engine's planner strategies into every session. The
  * runtime twin for sessions built elsewhere (the driver's Verify/Bench
  * mains) is `graft.plans.AsOfJoin.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
