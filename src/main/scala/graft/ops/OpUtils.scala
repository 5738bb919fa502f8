package graft.ops

private[graft] object OpUtils {

  /** Helper-column name absent from `taken` — compared
    * case-INsensitively, because Spark resolves column names
    * case-insensitively by default, so a fixed "__bin" would clobber a
    * caller's "__BIN" even though the strings differ. */
  def freshCol(taken: Iterable[String], base: String): String = {
    val lower = taken.map(_.toLowerCase).toSet
    var n = base
    var i = 0
    while (lower.contains(n.toLowerCase)) { i += 1; n = s"$base$i" }
    n
  }

  /** Parallelism floor for CPU-dense narrow stages (media codec decode,
    * tokenize+shingle). A narrow stage runs only as wide as its input's
    * partition count, regardless of cores: a blob table read from a
    * couple of parquet files decodes 2-wide on a 32-core host — the
    * round-10 quiet-window adjudication measured exactly that (2.0-2.4x
    * on llm19/llm32/llm58 from a 32-file → 2-file layout change, and
    * worse still on a 1-file layout). When the incoming partitioning is
    * narrower than half the session default parallelism, repartition up
    * to the default; otherwise pass through untouched. At 100 TB a scan
    * has thousands of partitions, so the floor is a no-op by
    * construction — it only ever fires on narrow inputs, where the
    * shuffle it inserts is small for the same reason the input is
    * narrow. Decode cost dominates blob-shuffle cost by orders of
    * magnitude whenever the branch triggers. Streaming frames pass
    * through (micro-batch partitioning is the planner's).
    *
    * Width is estimated from the LOGICAL plan's file-scan leaves
    * (Spark's own `FilePartition.maxSplitBytes` formula over the
    * leaves' listed bytes) rather than `df.rdd.getNumPartitions`: the
    * RDD conversion pays a second physical planning of the query and,
    * under AQE on shuffled inputs, can materialize upstream query
    * stages just to COUNT partitions before repartitioning re-executes
    * them. By contract the helper is applied to un-shuffled scan
    * inputs (narrow transforms of a file read); a frame whose leaves
    * are not all file relations passes through untouched. */
  def parallelismFloor(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (target > 1 &&
          fileScanWidth(df).exists(_ < math.max(2, target / 2)))
        df.repartition(target)
      else df
    }
  }

  /** Estimated scan width: for each leaf `HadoopFsRelation`, replay
    * Spark's split-size formula (`FilePartition.maxSplitBytes`) over
    * the file index's total bytes — openCostInBytes per file, capped
    * at maxPartitionBytes, floored at bytes-per-core — and sum the
    * resulting split counts. Listing comes from the already-cached
    * `FileIndex`; nothing is planned or executed. None when any leaf
    * is not a file relation (local/in-memory/v2 inputs — out of the
    * helper's contract, caller's frame passes through). */
  private def fileScanWidth(df: org.apache.spark.sql.DataFrame): Option[Long] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val spark = df.sparkSession
    val conf = spark.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val maxSplitDefault = conf.filesMaxPartitionBytes
    val cores = math.max(1, spark.sparkContext.defaultParallelism)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val widths = leaves.map {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        val nFiles = fs.location.inputFiles.length.toLong
        val totalBytes = fs.location.sizeInBytes + nFiles * openCost
        val bytesPerCore = totalBytes / cores
        val maxSplit = math.min(maxSplitDefault, math.max(openCost, bytesPerCore))
        Some(if (maxSplit <= 0) nFiles
             else (totalBytes + maxSplit - 1) / maxSplit)
      case _ => None
    }
    if (widths.nonEmpty && widths.forall(_.isDefined)) Some(widths.flatten.sum)
    else None
  }
}
