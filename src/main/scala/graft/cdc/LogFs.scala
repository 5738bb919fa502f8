package graft.cdc

import java.io.{BufferedInputStream, InputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Hadoop-FileSystem routing for every binlog READ the engine does —
  * the log-side twin of [[graft.ops.IndexFs]] (which already routes the
  * persisted-index lifecycle). The reference gets server-local file
  * access for free by living inside mysqld
  * (binlog_table_reader.cc:75-96 reads the server's own files); a Spark
  * engine does not: every executor must be able to open the log path,
  * and on a real cluster logs live on a shared store (`hdfs://`,
  * `file://` on an NFS mount, an object store) — not on each worker's
  * local disk. Routing opens and stats through
  * `Path.getFileSystem(conf)` makes a scheme-qualified log root work
  * end-to-end (batch scan, streaming offsets, fan-out, catalog),
  * while bare local paths keep resolving to the local filesystem
  * exactly as before.
  *
  * Fixture WRITERS deliberately stay `java.io` — producing logs is the
  * server's job (mysqld writes to its own disk); only the consumer
  * side of the seam must speak distributed filesystems.
  *
  * Configuration resolution: the active/default SparkSession's Hadoop
  * conf when one exists in this JVM (driver, and local-mode tasks);
  * otherwise the classpath `Configuration` (cluster executors get
  * core-site.xml via HADOOP_CONF_DIR — the standard connector story).
  * The fallback is cached: `new Configuration()` re-parses XML per
  * call, and partition readers open one file per task.
  */
private[graft] object LogFs {

  private lazy val fallbackConf = new Configuration()

  // one conf per JVM, resolved at first use: `newHadoopConf()` CLONES
  // the base conf and re-applies every SQL conf entry — milliseconds
  // per call, paid per file open (per partition per task, plus per-file
  // sidecar reads at planning) — which doubled sub-0.1 s CDC scans
  // when resolved per open. Hadoop conf entries that change AFTER the
  // first binlog read of the JVM are not picked up (set
  // spark.hadoop.* before reading CDC tables — the standard
  // connector caveat).
  @volatile private var cached: Configuration = _

  private def conf(): Configuration = {
    val c = cached
    if (c != null) return c
    val fresh = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(fallbackConf)
    cached = fresh
    fresh
  }

  /** Drop the cached conf so the NEXT read re-resolves it — for specs
    * that register a filesystem scheme (e.g. the object-store-semantics
    * stand-in) after some earlier suite already triggered the one-time
    * resolution. Production never needs this: the cache is the point
    * (see the field comment). */
  private[graft] def resetForTests(): Unit = cached = null

  def fs(path: String): FileSystem = new Path(path).getFileSystem(conf()) match {
    // reads only, so skip the checksum layer: the logs were written by
    // mysqld (or the fixture writers), never by LocalFileSystem, so no
    // .crc sidecars exist — the wrapper buys a per-open .crc stat and a
    // 4 KiB-chunked read path for nothing
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case f => f
  }

  /** Byte length of `path`; 0 when missing (the list-time rotation
    * race: an index entry can name a file the producer has not flushed
    * yet — callers already treat "too short" as "skip, retry later"). */
  def lenOrZero(path: String): Long = {
    try {
      val st = fs(path).getFileStatus(new Path(path))
      if (st.isFile) st.getLen else 0L
    } catch { case _: java.io.FileNotFoundException => 0L }
  }

  def exists(path: String): Boolean = fs(path).exists(new Path(path))

  /** (length, mtime) stat pair for cheap change fingerprints; (0, 0)
    * when missing. One RPC on HDFS. */
  def statKey(path: String): (Long, Long) = {
    try {
      val st = fs(path).getFileStatus(new Path(path))
      (st.getLen, st.getModificationTime)
    } catch { case _: java.io.FileNotFoundException => (0L, 0L) }
  }

  /** Buffered sequential read stream — the drop-in for
    * `new BufferedInputStream(new FileInputStream(path))` in the event
    * readers (their access pattern is strictly sequential, which every
    * Hadoop filesystem serves well). */
  def open(path: String): InputStream =
    // explicit 64 KiB FS buffer: the default io.file.buffer.size is
    // 4 KiB, which 16x-es the syscall count of the old
    // FileInputStream+64 KiB-buffer readers and measurably taxed the
    // single-file decode benchmarks; the outer BufferedInputStream
    // keeps the readers' byte-at-a-time access cheap
    new BufferedInputStream(fs(path).open(new Path(path), 1 << 16), 1 << 16)

  /** Whole small file as UTF-8 (index files, sidecars — both are tiny
    * by construction). */
  def readUtf8(path: String): String = {
    val in = open(path)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Resolve one index-file ENTRY against the index file's parent:
    * scheme-qualified entries pass through; absolute bare entries keep
    * the index's scheme/authority; relative entries resolve under the
    * parent directory — so an `hdfs://` index file with the usual
    * relative `mysql-bin.000001` lines yields fully-addressed log
    * paths, and a bare local index keeps producing bare local paths. */
  def resolveSibling(indexFile: String, entry: String): String = {
    if (entry.contains("://")) return entry
    val ip =
      if (indexFile.contains("://") ||
          java.nio.file.Paths.get(indexFile).isAbsolute)
        new Path(indexFile)
      else new Path(java.nio.file.Paths.get(indexFile)
        .toAbsolutePath.toString)
    new Path(ip.getParent, entry).toString
  }
}
