package graft.tools

import org.apache.spark.sql.SparkSession

/** Automated plan audit over the ENTIRE query surface — the "would this
  * survive 100x?" check as a tool instead of a per-round manual sweep.
  *
  * `runMain graft.tools.PlanLint [sfDir] [nameFilter]`
  *
  * For every SparkEntry query (batch only — streaming frames cannot be
  * planned without a sink), builds the DataFrame against `sfDir`
  * (default sf0.001) and greps the PHYSICAL plan for the anti-patterns
  * that do not survive scale:
  *
  *   - CartesianProduct        — unbounded pair blowup
  *   - BroadcastNestedLoopJoin — O(n*m) compare without an equi-key
  *   - Exchange SinglePartition over NON-reduced input — a one-task
  *     stage that serializes the whole input through one core (a
  *     global window / repartition(1) shape). The partials-merge form
  *     — SinglePartition feeding a Final aggregate whose input is
  *     already partial-aggregated to O(#partitions) rows — is the
  *     sound scalar-aggregate shape and passes.
  *
  * Prints one line per offender with the matched fragment. Exit 1 if
  * any query outside the recorded allowlist trips — so the check can
  * gate a round. The allowlist entries each carry the justification;
  * an empty allowlist is the goal state and currently holds.
  */
object PlanLint {

  /** (query, pattern) pairs accepted with a recorded reason — the
    * round-10 audit of every hit. A BroadcastNestedLoopJoin is sound
    * exactly when its broadcast side is SMALL BY CONTRACT (a query set,
    * a sketch, a scalar, a dimension table) — the op never replicates
    * the corpus; each entry names that contract. New hits (and any
    * CartesianProduct, never allowed) fail the lint. */
  private val Allow: Map[(String, String), String] = {
    val bnlj = "BroadcastNestedLoopJoin"
    val knn = "query set broadcast by contract; corpus side streams once" +
      " (Similarity scaladoc)"
    Map(
      ("llm09_knn_brute", bnlj) -> knn,
      ("llm16_knn_ivf", bnlj) -> knn,
      ("llm41_knn_pq", bnlj) -> knn,
      ("llm42_knn_ivfpq", bnlj) -> knn,
      ("llm45_knn_ivf_prebuilt", bnlj) -> knn,
      ("llm64_knn_filtered", bnlj) -> knn,
      ("llm65_knn_ivf_append", bnlj) -> knn,
      ("llm67_knn_ivf_delete", bnlj) -> knn,
      ("llm70_knn_ivf_compact", bnlj) -> knn,
      ("str12_stream_knn", bnlj) -> knn,
      ("llm20_embed_neardup_exact", bnlj) ->
        "exact-verify stage: candidate pairs broadcast (LSH-pruned, ≪ corpus)",
      ("llm19_jaccard_block", bnlj) ->
        "prefix-filter candidates broadcast (pigeonhole-pruned, ≪ n²)",
      ("llm26_tfidf_topterms", bnlj) ->
        "1-row corpus-size scalar cross join",
      ("cdc19_multi_source_identity", bnlj) ->
        "per-source watermark frame (≤ #sources rows) broadcast",
      ("q09_cross_join", bnlj) ->
        "the cross-join capability itself, region×nation (tiny dims)",
      ("q10_theta_join", bnlj) ->
        "non-equi theta join with a broadcast dimension side",
      ("q53_sample", bnlj) ->
        "1-row sampling-threshold scalar cross join",
      ("q61_heavy_hitters_cms", bnlj) ->
        "merged CMS sketch (1 row) cross join",
      ("q62_kmv_distinct", bnlj) ->
        "merged KMV sketch (1 row) cross join",
      ("q74_funnel", bnlj) ->
        "per-stage scalar counts (≤ #stages rows) cross join") ++ {
      val sp = "SinglePartition"
      val cumsum = "bucket-offset cumsum: the exchange input is the " +
        "per-__bucket totals — O(#buckets) rows by construction (fixed " +
        "small bucket count; GlobalOrder/Packing two-level design)"
      Map(
        ("llm23_sequence_pack", sp) -> cumsum,
        ("llm43_multimodal_pairs", sp) -> cumsum,
        ("llm55_token_budget", sp) -> cumsum)
    }
  }

  private val Patterns = Seq(
    "CartesianProduct",
    "BroadcastNestedLoopJoin")

  /** First SinglePartition exchange whose direct child is NOT a PARTIAL
    * aggregate (i.e. the rows entering the one-task stage are not
    * already partial-reduced to O(#partitions)), as (childFragment).
    * Requiring `partial_` matters: a FINAL keyed aggregate child means
    * the exchange funnels O(#groups) rows — unbounded at scale, the
    * exact one-task shape the lint exists to catch. Text-level: in the
    * rendered tree the child is the next line, one level deeper —
    * robust under AQE's Initial/Final plan sections. */
  private[graft] def singlePartitionOffense(plan: String): Option[String] = {
    val lines = plan.linesIterator.toArray
    def partialAgg(l: String) =
      (l.contains("HashAggregate") || l.contains("SortAggregate") ||
        l.contains("ObjectHashAggregate")) && l.contains("partial_")
    lines.zipWithIndex.collectFirst {
      case (l, i) if l.contains("Exchange SinglePartition") &&
          (i + 1 >= lines.length || !partialAgg(lines(i + 1))) =>
        if (i + 1 < lines.length) lines(i + 1).trim.take(90) else "(leaf)"
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    var bad = 0
    var checked = 0
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(n.contains))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        if (!df.isStreaming) {
          checked += 1
          val plan = df.queryExecution.executedPlan.toString
          Patterns.foreach { p =>
            if (plan.contains(p)) {
              val why = Allow.get((name, p))
              if (why.isDefined)
                println(s"ALLOW $name: $p (${why.get})")
              else {
                bad += 1
                println(s"FAIL  $name: $p")
              }
            }
          }
          singlePartitionOffense(plan).foreach { frag =>
            Allow.get((name, "SinglePartition")) match {
              case Some(why) =>
                println(s"ALLOW $name: SinglePartition ($why)")
              case None =>
                bad += 1
                println(s"FAIL  $name: Exchange SinglePartition over $frag")
            }
          }
        } else println(s"SKIP  $name: streaming")
      } catch {
        case e: Exception =>
          // planning must not fail either — an unbuildable query is a bug
          bad += 1
          println(s"FAIL  $name: planning threw ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    println(s"plan-lint: $checked batch plans checked, $bad offenders")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
