package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All relational queries read through here so that the scan side stays
  * uniform: plain parquet scans that Catalyst can push filters/column
  * pruning into. At 100 TB these would be partitioned/bucketed tables —
  * the query code below never depends on physical layout, only on the
  * logical schema, so swapping the loader for a bucketed catalog table
  * changes no query.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
      // reader rejects. Read nanos as long and convert to a microsecond
      // TimestampType (the driver data is µs-precision, so lossless).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register all tables as temp views (idempotent) for spark.sql queries. */
  def views(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
