package graft

import org.scalatest.funsuite.AnyFunSuite

/** The re-laid layout policy as a pure function — pinned so the bench
  * methodology can't drift silently (the split count is part of what
  * every published headline number means). */
class BenchPolicySpec extends AnyFunSuite {
  private val MiB = 1024L * 1024

  test("splitCount: ~4 MiB per file, floor 2, cap cpus") {
    // tiny tables never shatter (the round-9 62-row-file lesson) but
    // always exercise the multi-file code paths (floor 2)
    assert(Bench.splitCount(0L, 32) == 2)
    assert(Bench.splitCount(600 * 1024, 32) == 2) // sf0.1 documents
    assert(Bench.splitCount(800 * 1024, 32) == 2) // sf0.1 embeddings
    // mid-size tables scale with bytes
    assert(Bench.splitCount(2723766L, 32) == 2)   // sf0.1 orders (2.6 MiB)
    assert(Bench.splitCount(10818932L, 32) == 3)  // sf0.1 lineitem (10.3 MiB)
    assert(Bench.splitCount(100 * MiB, 32) == 25)
    // the core count caps the fan-out
    assert(Bench.splitCount(10L * 1024 * MiB, 32) == 32)
    assert(Bench.splitCount(100 * MiB, 8) == 8)
  }

  test("gate rotation: deterministic per round, disjoint consecutive slices, cycles the pool, never a headline query") {
    val headline = Seq("q01", "q03", "llm05")
    val all = headline ++ (1 to 20).map(i => f"x$i%02d")
    val r16 = Bench.rotatedQueries(all, headline, round = 16, k = 8)
    // deterministic: same inputs, same selection
    assert(r16 == Bench.rotatedQueries(all, headline, round = 16, k = 8))
    assert(r16.length == 8 && r16.forall(q => !headline.contains(q)))
    // consecutive rounds cover different slices (pool 20, k 8: rounds
    // 16/17 start at 8 and 16 of the sorted pool — overlap only via
    // wraparound, never identical)
    val r17 = Bench.rotatedQueries(all, headline, round = 17, k = 8)
    assert(r16 != r17)
    // the pool cycles: ceil(20/8)=3 consecutive rounds touch everything
    val threeRounds = (16 to 18).flatMap(
      Bench.rotatedQueries(all, headline, _, k = 8)).toSet
    assert(threeRounds == all.filterNot(headline.contains).toSet,
      "three consecutive rounds must cover the whole non-headline pool")
    // degenerate pools behave
    assert(Bench.rotatedQueries(headline, headline, 16, 8).isEmpty)
    assert(Bench.rotatedQueries(headline :+ "only", headline, 16, 8)
      == Seq("only"))
  }

  test("currentRound: highest driver CORRECTNESS round + 1, the bench_gate.sh convention") {
    assert(Bench.currentRound(Seq("CORRECTNESS_r15.json",
      "CORRECTNESS_r09.json", "BENCH_r15.json", "notes.txt")) == 16)
    assert(Bench.currentRound(Seq("BENCH_r15.json")) == 1)
    assert(Bench.currentRound(Nil) == 1)
  }

  test("prev-archive picker: newest round first, gate beats driver at the same round") {
    // the bench_gate.sh order, mirrored: an embedded prev annotation
    // must come from the ADJACENT round's baseline (gate preferred —
    // always parseable) rather than falling back rounds when a driver
    // archive is tail-truncated (the round-10 crying-wolf post-mortem)
    val names = Seq("BENCH_r08.json", "BENCH_r11_gate.json", "BENCH_r11.json",
      "BENCH_r09.json", "BENCH_r10_gate.json", "BENCH_r11_full.json",
      "CORRECTNESS_r11.json", "notes.txt")
    assert(Bench.prevCandidateOrder(names) == Seq(
      "BENCH_r11_gate.json", "BENCH_r11.json", "BENCH_r10_gate.json",
      "BENCH_r09.json", "BENCH_r08.json"),
      "picker order drifted")
    // _full and unrelated files never enter the candidate list
    assert(!Bench.prevCandidateOrder(names).contains("BENCH_r11_full.json"))
  }

  test("plan-lint SinglePartition detector: fires on global-window, passes partials-merge") {
    import graft.tools.PlanLint.singlePartitionOffenses
    // global window: the whole input funnels through one task — offender
    val globalWindow =
      """AdaptiveSparkPlan isFinalPlan=false
        |+- Window [row_number() windowspecdefinition(...)], [ts ASC]
        |   +- Sort [ts ASC NULLS FIRST], false, 0
        |      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]
        |         +- Project [ts, v]
        |            +- FileScan parquet [ts,v]""".stripMargin
    assert(singlePartitionOffenses(globalWindow).exists(_.contains("Project")))
    // scalar aggregate: partial-agg output (O(#partitions) rows) merges
    // through SinglePartition — the sound shape, not an offender
    val partialsMerge =
      """HashAggregate(keys=[], functions=[sum(x)])
        |+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
        |   +- HashAggregate(keys=[], functions=[partial_sum(x)])
        |      +- FileScan parquet [x]""".stripMargin
    assert(singlePartitionOffenses(partialsMerge).isEmpty)
    // a FINAL keyed aggregate feeding the exchange is NOT exempt: the
    // one-task stage processes O(#groups) rows — unbounded at scale
    val finalKeyedAgg =
      """Window [row_number() windowspecdefinition(...)], [s ASC]
        |+- Sort [s ASC NULLS FIRST], false, 0
        |   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=7]
        |      +- HashAggregate(keys=[k], functions=[sum(x)])
        |         +- Exchange hashpartitioning(k, 32)""".stripMargin
    assert(singlePartitionOffenses(finalKeyedAgg).exists(_.contains("HashAggregate")))
    // TWO offending exchanges in one plan return TWO fragments — the
    // allowlist admits exactly one occurrence, so a second unjustified
    // SinglePartition entering an already-allowed query still fails
    val twoOffenders = globalWindow + "\n" + finalKeyedAgg
    assert(singlePartitionOffenses(twoOffenders).length == 2)
  }

  test("plan-lint pattern matching counts occurrences, not booleans") {
    import graft.tools.PlanLint.countOccurrences
    val plan =
      """BroadcastNestedLoopJoin BuildRight, Inner
        |+- Project [a]
        |+- BroadcastNestedLoopJoin BuildLeft, Cross""".stripMargin
    assert(countOccurrences(plan, "BroadcastNestedLoopJoin") == 2)
    assert(countOccurrences(plan, "CartesianProduct") == 0)
  }
}
