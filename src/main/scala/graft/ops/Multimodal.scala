package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (builder mandate): image/audio/video as
  * opaque `BinaryType` payloads with typed metadata structs; decode /
  * feature-extract / resize / frame-sample operators whose decode step is
  * STUBBED (no image/audio libs in this container) behind a deterministic
  * fake, while the Spark-side plumbing — schema, batch shape, partition
  * iteration, column pruning — is real and tested.
  *
  * 100 TB posture: payloads live in parquet binary columns, so column
  * pruning keeps blobs unread unless selected; per-partition batch
  * processing (mapPartitions) is the Scala analogue of `mapInPandas` —
  * decode state (a codec handle, a model) initializes once per partition,
  * not per row.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType)))

  /** Synthesize a media table from documents: payload = UTF-8 bytes of
    * the text standing in for encoded media, metadata derived
    * deterministically. Stands in for `spark.read.parquet` over a real
    * media lake with an identical schema. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
        lit(3).as("channels"),
        (when(col("doc_id") % 2 === 0, "png").otherwise("jpeg")).as("format"))
        .as("meta"))

  /** ======== STUB ======== placeholder for a real image decode: a
    * deterministic 16-bin byte histogram normalized by payload length.
    * A production build replaces `fakeDecodeFeatures` with a codec call;
    * everything around it (batching, schema, iteration) is unchanged. */
  def fakeDecodeFeatures(payload: Array[Byte], bins: Int = 16): Array[Float] = {
    val hist = new Array[Float](bins)
    if (payload == null || payload.isEmpty) return hist
    var i = 0
    while (i < payload.length) {
      hist(((payload(i) & 0xFF) * bins) / 256) += 1f
      i += 1
    }
    var b = 0
    while (b < bins) { hist(b) /= payload.length; b += 1 }
    hist
  }

  /** Batch feature extraction over partitions — the mapInPandas-shaped
    * path: one iterator pass per partition, per-partition init, output
    * schema declared up front. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "payload") ++ Seq(
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    val keepIdx = media.schema.fields.indices.filter(_ != payloadIdx)
    media.mapPartitions { rows =>
      // per-partition init happens here (codec handle, model, ...)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val kept = keepIdx.map(r.get)
        Row.fromSeq(kept ++ Seq(
          if (payload == null) 0 else payload.length,
          fakeDecodeFeatures(payload).toSeq))
      }
    }(enc)
  }

  /** ======== STUB ======== "resize": deterministic payload truncation to
    * maxBytes standing in for a pixel resample; metadata updated to the
    * target dims the way a real resize would. */
  def resizeStub(media: DataFrame, w: Int, h: Int, maxBytes: Int = 256): DataFrame =
    media
      .withColumn("payload",
        when(length(col("payload")) > maxBytes,
          expr(s"substring(payload, 1, $maxBytes)")).otherwise(col("payload")))
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.channels").as("channels"), col("meta.format").as("format")))

  /** Frame sampling for "video" payloads: split the byte stream into
    * nFrames equal slices (stub for keyframe extraction), one output row
    * per frame — a generator-shaped op done with posexplode. */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame = {
    val sliced = media
      .withColumn("n", length(col("payload")))
      .withColumn("fsz", greatest(lit(1), ceil(col("n").cast("double") / nFrames).cast("int")))
      .withColumn("frames",
        expr(s"transform(sequence(0, ${nFrames - 1}), i -> substring(payload, i * fsz + 1, fsz))"))
    sliced.select(col("media_id"), col("meta"),
      posexplode(col("frames")).as(Seq("frame_idx", "frame_bytes")))
      .filter(length(col("frame_bytes")) > 0)
  }
}
