package graft.sources

import org.apache.spark.sql.connector.metric.{CustomSumMetric, CustomTaskMetric}

/** DSv2 custom metrics for the CDC scan — the scan's story in the
  * Spark UI's SQL tab. Task side: events decoded and change-rows
  * emitted per partition reader (their ratio exposes decode
  * selectivity — pushed envelope filters and other-table skips). Driver
  * side: log files pruned at planning by sidecar/PREVIOUS_GTIDS bounds
  * or a pushed OFFSET — at ~1M log files the pruned count IS the
  * difference between scanning the log and scanning a slice. */
object CdcMetrics {
  final class EventsDecoded extends CustomSumMetric {
    override def name(): String = "cdcEventsDecoded"
    override def description(): String = "CDC events decoded"
  }
  final class RowsEmitted extends CustomSumMetric {
    override def name(): String = "cdcRowsEmitted"
    override def description(): String = "CDC change rows emitted"
  }
  final class FilesPruned extends CustomSumMetric {
    override def name(): String = "cdcFilesPruned"
    override def description(): String = "CDC log files pruned at planning"
  }
  final case class TaskMetric(metricName: String, v: Long) extends CustomTaskMetric {
    override def name(): String = metricName
    override def value(): Long = v
  }
}
