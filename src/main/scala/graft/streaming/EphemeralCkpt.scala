package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session-conf scoping for synchronously-drained ephemeral streams.
  *
  * Spark 4.1 wraps every checkpoint file in ChecksumCheckpointFileManager:
  * each state-store delta / offset-log / commit-log write computes and
  * writes a sidecar checksum file, and every stream CLOSE parks on the
  * async checksum future (ChecksumCancellableFSDataOutputStream.close →
  * awaitResult). For a durable checkpoint that is cheap corruption
  * insurance; for the engine's drained-to-completion ephemeral
  * checkpoints (fresh dir per start, deleted at stop — never read back,
  * never restarted) it is pure overhead on the task close path: jstack
  * over str01's stateful stage attributed the bulk of the non-CPU task
  * time to that await (~320 ms/task run-vs-cpu gap), and disabling the
  * checksums cut str01's steady-state job wall 0.773 s → 0.545 s.
  *
  * Scoped set/restore, same pattern as drain's shuffle-partition clamp:
  * the conf must stay false until the LAST state commit, so the restore
  * runs after stop(), not after start(). A durable production stream
  * (one that passes its own checkpointLocation and expects to restart
  * from it) keeps the Spark default.
  */
object EphemeralCkpt {
  val ChecksumConf = "spark.sql.streaming.checkpoint.fileChecksum.enabled"

  def withoutChecksums[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(ChecksumConf)
    spark.conf.set(ChecksumConf, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ChecksumConf, v)
      case None    => spark.conf.unset(ChecksumConf)
    }
  }
}
