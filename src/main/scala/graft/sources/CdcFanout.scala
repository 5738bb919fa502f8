package graft.sources

import graft.cdc.{BinlogFormats, CdcSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MULTI-TABLE shared-scan materialization: decode a CDC log ONCE and
  * land one typed change-frame per table.
  *
  * A catalog user replicating N tables from one log through the
  * per-table `binlogcdc` scans pays N full passes over the log bytes —
  * each scan's table-identity skip makes the N-1 foreign passes cheap
  * CPU-wise, but every pass still reads every log byte (the reference
  * has the same cost shape: one storage-engine handler per table, each
  * `rnd_next` walk reading the whole binlog,
  * /root/reference/binlogdb.cc:477-551). At 100 TB of log, N tables
  * must not cost N × 100 TB of I/O.
  *
  * One-pass fan-out: each log file (the unit of parallelism, as in the
  * batch scan) is decoded by ONE event walk feeding N per-table
  * decoders — control events (TABLE_MAP, GTID) update every decoder's
  * state, row events are decoded exactly once by the owning table's
  * decoder and byte-skipped by the rest. The decoded rows land in a
  * UNION-schema staging frame `(envelope, __tbl, __t0 … __tN struct)`
  * written as parquet PARTITIONED BY `__tbl`, so the per-table
  * extraction pass is partition-pruned (reads only its own directory)
  * AND column-pruned (its own struct column; the other tables' struct
  * columns are all-null in its partition and never read). Total cost:
  * one log read + one row-data write + one partition/column-pruned
  * re-read per table — instead of N log reads.
  *
  * The per-table frames carry exactly the `binlogcdc` scan's schema
  * (source columns in binlog order, then the §1.5 envelope), so a
  * consumer can swap a per-table scan for a materialized frame
  * verbatim (spec-pinned frame equality).
  */
object CdcFanout {

  /** Decode-pass accounting: one increment per log FILE walked. The
    * one-decode contract ("N tables, one log read") is spec-pinned on
    * this counter — in local mode the executor shares the JVM, so the
    * spec reads it directly. */
  private[graft] val filesDecoded = new java.util.concurrent.atomic.AtomicLong

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '_') c else '_')

  /** Materialize `tables` (as (database, table) pairs) from the log at
    * `indexFile` into `$outRoot/<db>__<table>` parquet frames, decoding
    * the log exactly once. Returns the per-table output paths. The
    * staging frame is left under `$outRoot/shared.decoded` (it IS the
    * one-pass product; callers may delete it after extraction). */
  def materializeTables(spark: SparkSession, indexFile: String,
      tables: Seq[(String, String)], outRoot: String,
      format: String = "gcdc"): Map[(String, String), String] = {
    require(tables.nonEmpty, "cdcFanout: no tables requested")
    require(tables.distinct.length == tables.length,
      s"cdcFanout: duplicate table in $tables")
    val adapter = BinlogFormats.forName(format)
    val targets: Seq[(String, String, StructType)] = tables.map {
      case (db, tbl) =>
        val src = adapter.inferSourceSchema(indexFile, db, tbl).getOrElse {
          throw new IllegalArgumentException(
            s"cdcFanout: no TABLE_MAP for $db.$tbl found in CDC log $indexFile")
        }
        (db, tbl, src)
    }
    val files = adapter.readIndex(indexFile)
    require(files.nonEmpty, s"cdcFanout: empty CDC log index $indexFile")

    val staged = StructType(
      CdcSchema.envelope ++
        Seq(StructField("__tbl", StringType, nullable = false)) ++
        targets.zipWithIndex.map { case ((_, _, sch), i) =>
          StructField(s"__t$i", sch, nullable = true)
        })
    val fmt = format
    val serTargets = targets.toArray // (db, table, schema): all serializable
    val nSlots = serTargets.length
    val rdd = spark.sparkContext
      .parallelize(files, files.length)
      .mapPartitions { fileIt =>
        fileIt.flatMap { path =>
          filesDecoded.incrementAndGet()
          val ad = BinlogFormats.forName(fmt)
          val decs = serTargets.map { case (db, tbl, sch) =>
            ad.decoder(db, tbl, _ => true, expectedSchema = Some(sch))
          }
          val tblKeys = serTargets.map { case (db, tbl, _) =>
            UTF8String.fromString(s"$db.$tbl")
          }
          val events = ad.open(path)
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => events.close()))
          events.flatMap { ev =>
            var out = List.empty[InternalRow]
            var i = nSlots - 1
            while (i >= 0) {
              // ONE walk: control events update every decoder's state;
              // a row event decodes once (owner) and byte-skips elsewhere
              decs(i).decode(ev).foreach { r =>
                val vals = new Array[Any](5 + nSlots)
                vals(0) = r.op
                vals(1) = r.gtid
                vals(2) = r.tmMicros
                vals(3) = r.sourceId
                vals(4) = tblKeys(i)
                vals(5 + i) = new GenericInternalRow(r.values)
                out ::= new GenericInternalRow(vals)
              }
              i -= 1
            }
            out
          }
        }
      }
    Bridge.internalCreateDataFrame(spark, rdd, staged)
      .write.mode("overwrite").partitionBy("__tbl")
      .parquet(s"$outRoot/shared.decoded")

    // per-table extraction: partition-pruned (its own __tbl directory)
    // + column-pruned (its own struct column) — no second log decode
    targets.zipWithIndex.map { case ((db, tbl, sch), i) =>
      val dest = s"$outRoot/${sanitize(db)}__${sanitize(tbl)}"
      spark.read.parquet(s"$outRoot/shared.decoded")
        .filter(col("__tbl") === s"$db.$tbl")
        .select(sch.fieldNames.toSeq.map(n =>
          col(s"__t$i").getField(n).as(n)) ++
          CdcSchema.envelope.map(f => col(f.name)): _*)
        .write.mode("overwrite").parquet(dest)
      (db, tbl) -> dest
    }.toMap
  }
}
