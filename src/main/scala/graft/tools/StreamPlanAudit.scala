package graft.tools

import org.apache.spark.sql.streaming.StreamingQuery

/** Registry of the streaming surface's EXECUTED micro-batch plans, for
  * [[PlanLint]]: the streaming QDefs drain their query into a memory
  * sink and return the sink table, so the plan a batch-side audit sees
  * is a trivial memory scan — the real plan (state stores, stream-side
  * joins, exchanges) lives on the StreamExecution and dies with it.
  * Every drain site records it here right after `processAllAvailable`,
  * keyed by the query-name prefix (`str01`, `cdc08`), and PlanLint
  * lints the recorded plan next to the batch one. */
object StreamPlanAudit {
  private val plans =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Record `q`'s last executed plan under `key` (call between
    * processAllAvailable and stop — after stop the execution is gone). */
  def record(key: String, q: StreamingQuery): Unit =
    org.apache.spark.sql.graftbridge.Bridge.lastStreamingPlan(q)
      .foreach(p => plans.put(key, p))

  /** Record an explicitly rendered plan: foreachBatch-shaped queries
    * (the semantic-dedup gate) run their real work as inner BATCH
    * queries — the StreamExecution's own plan is a trivial source
    * projection, so those drain sites hand the inner verdict plan here
    * instead. */
  def recordPlan(key: String, plan: String): Unit = {
    plans.put(key, plan); ()
  }

  def get(key: String): Option[String] = Option(plans.get(key))
}
