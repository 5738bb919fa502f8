package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper

/** Round-over-round bench comparison — the delta gate.
  *
  * `runMain graft.tools.BenchDelta <old.json> <new.json> [pctThreshold]`
  *
  * Reads two Bench JSON artifacts (either the raw one-line form or the
  * driver's wrapper with a `parsed` field), compares the common query
  * set, and prints a table of queries whose time moved more than
  * `pctThreshold` (default 25) in either direction, plus the
  * common-subset totals and the median per-query ratio. The MEDIAN is
  * the environment detector: ambient host drift moves every query by a
  * similar factor (median ≈ the drift), while a plan regression moves
  * one query far off the median. Exit code 1 when any query regresses
  * past the threshold AFTER dividing out the median ratio — i.e. only
  * plan-shaped regressions fail the gate, uniform host drift does not.
  * When both artifacts carry a re-laid series (`"relaid":true`), the
  * headline `queries` maps are already layout-normalized; pass files
  * from the same series to keep the compare apples-to-apples.
  */
object BenchDelta {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDelta <old.json> <new.json> [pct]")
    val pct = if (args.length > 2) args(2).toDouble else 25.0
    val m = new ObjectMapper
    // each artifact parses ONCE (either the raw one-line form or the
    // driver's wrapper with a `parsed` field); queries/failed/spread
    // are in-memory views over the same tree
    def rootOf(path: String): com.fasterxml.jackson.databind.JsonNode = {
      var node = m.readTree(new java.io.File(path))
      if (node.has("parsed")) node = node.get("parsed")
      node
    }
    val rootA = rootOf(args(0))
    val rootB = rootOf(args(1))
    def numMap(node: com.fasterxml.jackson.databind.JsonNode,
        field: String): Map[String, Double] = {
      val q = node.get(field)
      if (q == null) Map.empty
      else {
        val it = q.properties().iterator()
        val out = Map.newBuilder[String, Double]
        while (it.hasNext) {
          val e = it.next()
          out += e.getKey -> e.getValue.asDouble()
        }
        out.result()
      }
    }
    def queriesOf(node: com.fasterxml.jackson.databind.JsonNode,
        path: String): Map[String, Double] = {
      require(node.get("queries") != null, s"$path: no 'queries' field")
      numMap(node, "queries").filter(_._2 >= 0) // -1 = failed: excluded
    }
    val a = queriesOf(rootA, args(0))
    val b = queriesOf(rootB, args(1))
    // queries recorded as FAILED (value < 0) in an artifact: these are
    // excluded from the timing compare, but a failure in the NEW
    // artifact must fail the gate — otherwise a crashed query silently
    // drops out of the common set and the compare passes vacuously
    val failedNew = numMap(rootB, "queries").collect {
      case (k, v) if v < 0 => k
    }.toSeq.sorted
    if (failedNew.nonEmpty) {
      println(s"FAILED in new artifact (no timing recorded): " +
        failedNew.mkString(", "))
      sys.exit(2)
    }
    // per-query in-run sample spreads (max/min across reps), when the
    // artifacts carry them: a cross-run ratio smaller than the query's
    // own within-run spread is not evidence of anything — the noise
    // floor the round-9 A/B/C triplet demonstrated (each pair of clean
    // identical-binary runs flagged a DIFFERENT >25% mover set)
    val noise = {
      val sa = numMap(rootA, "spread").filter(_._2 > 0)
      val sb = numMap(rootB, "spread").filter(_._2 > 0)
      (sa.keySet ++ sb.keySet).map(k =>
        k -> math.max(sa.getOrElse(k, 1.0), sb.getOrElse(k, 1.0))).toMap
    }
    val common = (a.keySet & b.keySet).toSeq.sorted
    require(common.nonEmpty, "no common queries between the two artifacts")
    // median ratio over queries big enough for the ratio to mean
    // anything (a 30 ms query's ratio is scheduling noise)
    val ratios = common.collect {
      case q if a(q) > 0.05 => b(q) / a(q)
    }.sorted
    // The median-as-drift-detector needs a mostly-STABLE query
    // population: with only a handful of queries (a
    // SPARK_GRAFT_BENCH_ONLY re-check of 2-3 flagged movers), a
    // genuine shared regression IS the median and would be divided out
    // entirely — certifying the regression as drift. Below 8 usable
    // ratios, fall back to RAW ratios (median forced to 1.0): the
    // conservative direction — drift may be flagged for a human to
    // adjudicate, a real shared regression is never normalized away.
    val medianUsable = ratios.length >= 8
    val median =
      if (!medianUsable) {
        if (ratios.nonEmpty) println(
          s"WARNING: only ${ratios.length} usable ratios — too few for " +
            "drift estimation; comparing RAW ratios (no median " +
            "normalization). Expect ambient-drift false flags; " +
            "adjudicate by eye against the documented 1.4-2x wobble.")
        1.0
      }
      else if (ratios.length % 2 == 1) ratios(ratios.length / 2)
      else (ratios(ratios.length / 2 - 1) + ratios(ratios.length / 2)) / 2
    val sumA = common.map(a).sum
    val sumB = common.map(b).sum
    println(f"common ${common.length} queries: old ${sumA}%.2f s -> new " +
      f"${sumB}%.2f s (${sumB / sumA}%.2fx); median per-query ratio " +
      f"$median%.2fx (ambient drift estimate)")
    val flagged = common.flatMap { q =>
      val adj = b(q) / median // divide out ambient drift
      val d = (adj - a(q)) / math.max(a(q), 0.001) * 100
      // beyond the threshold AND beyond the query's own within-run
      // sample spread (when the artifacts carry one)
      val ratio = adj / math.max(a(q), 0.001)
      val beyondNoise = ratio > noise.getOrElse(q, 1.0) ||
        ratio < 1.0 / noise.getOrElse(q, 1.0)
      if (math.abs(d) > pct && math.max(a(q), b(q)) > 0.05 && beyondNoise)
        Some((d, q, a(q), b(q), adj))
      else None
    }.sortBy(-_._1)
    if (flagged.isEmpty) println(s"no query moved >$pct% beyond ambient drift")
    else {
      println(f"${"query"}%-38s ${"old"}%8s ${"new"}%8s ${"adj"}%8s ${"delta"}%8s")
      flagged.foreach { case (d, q, oa, ob, adj) =>
        println(f"$q%-38s $oa%8.3f $ob%8.3f $adj%8.3f ${d}%+7.1f%%")
      }
    }
    val regressed = flagged.count(_._1 > 0)
    if (regressed > 0) {
      println(s"$regressed quer${if (regressed == 1) "y" else "ies"} " +
        s"regressed >$pct% beyond ambient drift")
      sys.exit(1)
    }
  }
}
