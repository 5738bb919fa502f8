package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (builder mandate): image/audio/video as
  * opaque `BinaryType` payloads with typed metadata structs.
  *
  * The IMAGE path is real end to end: [[imageTable]] encodes genuine
  * PNGs (JDK `javax.imageio`, no external codec), [[extractFeatures]]
  * decodes real pixels per partition and histograms them, [[resize]]
  * nearest-neighbor-resamples decoded pixels and re-encodes. The AUDIO
  * path is real too: [[audioTable]] encodes genuine RIFF/PCM WAVs (JDK
  * `javax.sound.sampled`), [[audioFeatures]] decodes the 16-bit
  * samples per partition and computes integer signal stats. Because
  * the source pixels/samples are deterministic functions of the media
  * id and both codecs are lossless, every decoded value is
  * DuckDB-recomputable — the llm12/llm32/llm57 oracles hash-check the
  * full encode→decode→transform pipelines, not fakes. VIDEO keyframe
  * extraction ([[sampleFrames]]) remains a byte-slicing stand-in: no
  * video codec ships with the JDK, so that one op keeps the
  * declared-stub shape over [[mediaTable]]'s opaque byte-stream
  * payloads.
  *
  * 100 TB posture: payloads live in parquet binary columns, so column
  * pruning keeps blobs unread unless selected; decode runs per
  * partition (mapPartitions — the Scala analogue of `mapInPandas`),
  * so codec state initializes once per partition, not per row, and the
  * work is embarrassingly parallel across partitions.
  */
object Multimodal {

  // ImageIO's default temp-FILE cache would turn every tiny in-memory
  // encode into disk I/O on the executor — stream-only is correct here
  ImageIO.setUseCache(false)

  val MediaMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType)))

  /** Synthesize an opaque byte-stream media table from documents:
    * payload = UTF-8 bytes of the text standing in for an ENCODED VIDEO
    * stream, metadata derived deterministically. Serves the ops whose
    * codec genuinely does not exist in the JDK (frame sampling); the
    * image ops use [[imageTable]]'s real PNGs instead. */
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

  // ------------------------------------------------------------ real images

  /** Deterministic tiny test image for one media id: dims w=(id%8)+2,
    * h=(id%6)+2, channel values r=(7id+3x+5y)%256, g=(11id+17x+23y)%256,
    * b=(29id+13x+19y)%256 — pure integer functions a SQL oracle
    * recomputes exactly (PNG is lossless, so decode returns these very
    * values). */
  def imageDims(id: Long): (Int, Int) =
    (((id % 8) + 2).toInt, ((id % 6) + 2).toInt)

  def pixelRgb(id: Long, x: Int, y: Int): Int = {
    val r = ((7 * id + 3 * x + 5 * y) % 256).toInt
    val g = ((11 * id + 17 * x + 23 * y) % 256).toInt
    val b = ((29 * id + 13 * x + 19 * y) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** One real PNG for one media id (JDK encoder). */
  def encodePng(id: Long): Array[Byte] = {
    require(id >= 0, s"media id must be non-negative, got $id")
    val (w, h) = imageDims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelRgb(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def decodePng(payload: Array[Byte], ctx: String): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null)
      throw new IllegalStateException(
        s"$ctx: payload is not a decodable image (corrupt media lake?)")
    img
  }

  /** A real image lake stand-in: one PNG per document id, encoded per
    * partition. Stands in for `spark.read.parquet` over a media lake
    * whose ingest wrote (id, encoded_bytes, metadata). */
  def imageTable(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id").cast("long").as("media_id"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", MediaMetaType)))
    val enc = RowEncoder.encoderFor(outSchema)
    // parallelism floor before the codec pass (the videoTable pattern,
    // r17): PNG encode is CPU-dense and otherwise runs only as wide as
    // the docs table's file count; no-op on streaming or wide scans
    OpUtils.parallelismFloor(ids).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = imageDims(id)
        Row(id, encodePng(id), Row(w, h, 3, "png"))
      }
    }(enc)
  }

  /** Batch feature extraction with a REAL per-partition image decode:
    * 16-bin histogram over all decoded channel bytes (normalized), the
    * exact pixel count, and the exact channel sum. The two integer
    * columns pin every pixel of every image to the oracle; the float
    * histogram feeds downstream similarity ops. */
  def extractFeatures(media: DataFrame, bins: Int = 16): DataFrame = {
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "payload") ++ Seq(
      StructField("n_pixels", IntegerType),
      StructField("channel_sum", LongType),
      StructField("features", ArrayType(FloatType))))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    val keepIdx = media.schema.fields.indices.filter(_ != payloadIdx)
    media.mapPartitions { rows =>
      // per-partition init: ImageIO plugin lookup happens once here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val img = decodePng(payload, "extractFeatures")
        val (w, h) = (img.getWidth, img.getHeight)
        val hist = new Array[Float](bins)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            var c = 0
            while (c < 3) {
              val v = (rgb >> (8 * c)) & 0xff
              hist((v * bins) / 256) += 1f
              sum += v
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val total = 3 * w * h
        var b = 0
        while (b < bins) { hist(b) /= total; b += 1 }
        Row.fromSeq(keepIdx.map(r.get) ++ Seq(w * h, sum, hist.toSeq))
      }
    }(enc)
  }

  /** [[imageTable]] with every `corruptEvery`-th payload TRUNCATED to
    * half its bytes — the realistic broken-blob population (failed
    * uploads, torn writes) an ingest gate must survive. Works on batch
    * and streaming inputs alike (stateless narrow map). */
  def corruptedImageTable(docs: DataFrame, corruptEvery: Long): DataFrame = {
    require(corruptEvery > 0, s"corruptEvery must be positive, got $corruptEvery")
    val ids = docs.select(col("doc_id").cast("long").as("media_id"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val png = encodePng(id)
        val payload =
          if (id % corruptEvery == 0) java.util.Arrays.copyOf(png, png.length / 2)
          else png
        Row(id, payload)
      }
    }(enc)
  }

  /** Decode if possible; None on any codec failure (truncated/corrupt
    * payloads must not kill a pipeline that GATES on decodability). */
  def tryDecodePng(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Media admission gate: keep only payloads that actually DECODE,
    * emitting the decoded dims — the validation pass a media lake runs
    * at ingest (fail-soft: a corrupt blob is dropped, never a query
    * failure). Stateless and narrow, so the same operator serves batch
    * audits and streaming ingest (str15). */
  def imageAdmissionGate(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_pixels", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    val idIdx = media.schema.fieldIndex("media_id")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        tryDecodePng(r.getAs[Array[Byte]](payloadIdx)).map { img =>
          Row(r.getLong(idIdx), img.getWidth, img.getHeight,
            img.getWidth * img.getHeight)
        }
      }
    }(enc)
  }

  /** Content hash over DECODED pixels: fold h = (h·131 + channelByte)
    * mod (2^31 − 1) across (w, h, then every pixel's r,g,b in scan
    * order) — two images hash equal iff their decoded content is equal,
    * regardless of how the bytes were encoded (PNG vs re-encode vs
    * different compressor settings). The fold is the same portable
    * polynomial the text fingerprints use, so a SQL oracle replays it
    * exactly. */
  def decodedPixelHash(img: BufferedImage): Long = {
    val P = 2147483647L // 2^31 - 1
    var hsh = 0L
    def mix(v: Int): Unit = hsh = (hsh * 131 + v) % P
    mix(img.getWidth); mix(img.getHeight)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        mix((p >> 16) & 0xff); mix((p >> 8) & 0xff); mix(p & 0xff)
        x += 1
      }
      y += 1
    }
    hsh
  }

  /** Content-addressable image dedup: decode every payload, hash the
    * PIXELS (not the bytes — the same picture re-encoded by a different
    * compressor byte-differs but pixel-matches), then min-id survivor
    * per content group. EXACTLY one decode pass: the canon id is a
    * window min over the hash key, so the plan is one MapPartitions
    * decode subtree feeding one hash-keyed exchange — the groupBy+join
    * form planned the decode TWICE (the aggregate side partial-
    * aggregates before its exchange, so the subtrees differ and Spark
    * cannot reuse the exchange), a 2× on the dominant cost at lake
    * scale. The image twin of `Dedup.exact`, and the dedup a media
    * lake actually needs (byte-hash dedup misses every re-encoded
    * copy). Single-decode is plan-asserted in LlmOpsSpec. */
  def imageContentDedup(media: DataFrame): DataFrame = {
    val hashSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content_hash", LongType)))
    val enc = RowEncoder.encoderFor(hashSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    val idIdx = media.schema.fieldIndex("media_id")
    val hashed = media.mapPartitions { rows =>
      rows.map { r =>
        val img = decodePng(r.getAs[Array[Byte]](payloadIdx), "imageContentDedup")
        Row(r.getLong(idIdx), decodedPixelHash(img))
      }
    }(enc)
    val canonW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash"))
    hashed
      .withColumn("canon_id", min(col("media_id")).over(canonW))
      .select(col("media_id"), col("content_hash"), col("canon_id"),
        (col("media_id") =!= col("canon_id")).as("is_dup"))
  }

  /** Real resize: decode, nearest-neighbor resample to (dw, dh) —
    * out(x,y) = src(x·sw/dw, y·sh/dh), the deterministic integer
    * mapping — and re-encode as PNG. Metadata rewritten to the target
    * dims. Downstream decodes see genuinely resampled pixels (llm32
    * re-decodes and oracle-checks the channel sum). */
  def resize(media: DataFrame, dw: Int, dh: Int): DataFrame = {
    require(dw > 0 && dh > 0, s"resize: bad target dims ${dw}x$dh")
    val outSchema = media.schema
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    OpUtils.parallelismFloor(media).mapPartitions { rows =>
      rows.map { r =>
        val src = decodePng(r.getAs[Array[Byte]](payloadIdx), "resize")
        val (sw, sh) = (src.getWidth, src.getHeight)
        val out = new BufferedImage(dw, dh, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < dh) {
          var x = 0
          while (x < dw) {
            out.setRGB(x, y, src.getRGB(x * sw / dw, y * sh / dh))
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        val meta = r.getAs[Row](metaIdx)
        val vals = r.toSeq.toArray
        vals(payloadIdx) = bos.toByteArray
        vals(metaIdx) = Row(dw, dh, meta.get(2), meta.get(3))
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(enc)
  }

  // ------------------------------------------------------------- real audio

  /** Deterministic PCM test signal for one media id: mono 16-bit at
    * 8 kHz, n = (id%50)+20 samples, sample k = ((73·id + 37·k) % 4096)
    * − 2048 — a pure integer function a SQL oracle recomputes exactly
    * (WAV/PCM is lossless, so decode returns these very values). */
  def audioLen(id: Long): Int = ((id % 50) + 20).toInt

  def audioSample(id: Long, k: Int): Int =
    (((73 * id + 37 * k) % 4096) - 2048).toInt

  /** The JDK's audio SPI providers, resolved ONCE per JVM and called
    * directly. `AudioSystem.write`/`getAudioInputStream` resolve their
    * provider through `JDK13Services.getProviders` on EVERY call — a
    * global monitor plus a classloader/service scan, which under
    * multi-core executors turns into a lock convoy (r17 jstack: 717 of
    * 960 task samples BLOCKED on that monitor once the codec stage ran
    * 32-wide; per-row decode cost rose ~90×). These are the same
    * singleton provider instances the registry would hand back —
    * stateless, thread-safe, same codec, same bytes — resolved with the
    * per-task-init discipline of guide §4.5. */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val out = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) out += it.next()
    // probe RIFF/WAVE readers FIRST: rejection probes are not free — the
    // JDK's SoftMidiAudioFileReader takes the same JDK13Services global
    // monitor per probe (the very convoy this bypass removes) before
    // throwing UnsupportedAudioFileException. For a WAV payload only the
    // wave readers accept, so putting them first changes which readers
    // get ASKED, never which reader DECODES — bytes identical.
    val (wave, rest) =
      out.result().partition(_.getClass.getSimpleName.contains("WaveFileReader"))
    wave ++ rest
  }
  private lazy val audioWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    val out = Seq.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    while (it.hasNext) out += it.next()
    out.result()
  }

  /** One real WAV (RIFF/PCM, JDK `javax.sound.sampled` encoder — the
    * registry's own WaveFileWriter, called directly; see audioWriters). */
  def encodeWav(id: Long): Array[Byte] = {
    require(id >= 0, s"media id must be non-negative, got $id")
    val n = audioLen(id)
    val data = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val s = audioSample(id, k)
      data(2 * k) = (s & 0xff).toByte // little-endian 16-bit signed
      data(2 * k + 1) = ((s >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
      /* signed = */ true, /* bigEndian = */ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioWriters.find(_.isFileTypeSupported(wave, ais)) match {
      case Some(w) => w.write(ais, wave, bos)
      case None => throw new IllegalStateException(
        "no JDK AudioFileWriter supports WAVE — broken JRE audio SPI")
    }
    bos.toByteArray
  }

  val AudioMetaType: StructType = StructType(Seq(
    StructField("n_samples", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType)))

  /** A real audio lake stand-in: one WAV per document id. */
  def audioTable(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id").cast("long").as("media_id"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", AudioMetaType)))
    val enc = RowEncoder.encoderFor(outSchema)
    // parallelism floor before the codec pass (the videoTable pattern,
    // r17): WAV encode + downstream decode run in this one stage, which
    // is file-count-wide without it (llm57's measured 0.5 s single task)
    OpUtils.parallelismFloor(ids).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, encodeWav(id), Row(audioLen(id), 8000, 1, "wav"))
      }
    }(enc)
  }

  /** Decode one WAV payload to its 16-bit PCM samples (JDK codec — the
    * registry's own readers, probed directly in registration order;
    * each non-matching reader rejects with UnsupportedAudioFileException
    * exactly as it would inside AudioSystem.getAudioInputStream, so the
    * selected codec and decoded bytes are identical — only the
    * per-call global provider-registry lock is gone; see audioReaders). */
  def decodeWavSamples(payload: Array[Byte], ctx: String): Array[Int] = {
    val ais = audioReaders.iterator.flatMap { r =>
      try Some(r.getAudioInputStream(new ByteArrayInputStream(payload)))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
      }
    }.nextOption().getOrElse(throw new IllegalStateException(
      s"$ctx: payload is not a decodable audio stream (corrupt media lake?)"))
    try {
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        throw new IllegalStateException(
          s"$ctx: expected mono 16-bit signed PCM, got $fmt")
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val out = new Array[Int](n)
      var k = 0
      while (k < n) {
        val lo = bytes(2 * k) & 0xff
        val hi = bytes(2 * k + 1).toInt // sign-extends
        out(k) = if (fmt.isBigEndian) (lo << 8) | (hi & 0xff) else (hi << 8) | lo
        k += 1
      }
      out
    } finally ais.close()
  }

  /** Batch audio features with a REAL per-partition WAV decode: exact
    * sample count, sum of absolute amplitudes, zero-crossing count, and
    * peak amplitude — all integers, so the oracle pins every decoded
    * sample (the audio analogue of [[extractFeatures]]'s pixel sums).
    * The signal-shaped stats (zero-crossing rate ~ pitch, RMS energy ~
    * loudness) are the standard cheap audio-quality filters a training
    * pipeline gates on before an expensive model pass. */
  def audioFeatures(audio: DataFrame): DataFrame = {
    val outSchema = StructType(audio.schema.fields.filterNot(_.name == "payload") ++ Seq(
      StructField("n_samples", IntegerType),
      StructField("sum_abs", LongType),
      StructField("zero_crossings", IntegerType),
      StructField("peak", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = audio.schema.fieldIndex("payload")
    val keepIdx = audio.schema.fields.indices.filter(_ != payloadIdx)
    audio.mapPartitions { rows =>
      rows.map { r =>
        val s = decodeWavSamples(r.getAs[Array[Byte]](payloadIdx), "audioFeatures")
        var sumAbs = 0L; var zc = 0; var peak = 0
        var k = 0
        while (k < s.length) {
          val a = math.abs(s(k))
          sumAbs += a
          if (a > peak) peak = a
          if (k > 0 && s(k - 1) * s(k) < 0) zc += 1
          k += 1
        }
        // Seq[Any]: a plain Seq(Int, Long, Int, Int) numeric-widens every
        // element to Long (weak conformance) and the encoder rejects the
        // boxed Long where the schema says INT
        Row.fromSeq(keepIdx.map(r.get) ++ Seq[Any](s.length, sumAbs, zc, peak))
      }
    }(enc)
  }

  // ------------------------------------------------------------- real video

  /** Deterministic tiny MJPEG clip for one media id: nFrames=(id%3)+2
    * SOLID-COLOR frames of (id%6)+8 × (id%4)+8 pixels, frame f's RGB =
    * (32+(7id+29f)%192, 32+(11id+31f)%192, 32+(13id+37f)%192). Solid
    * colors keep the JPEG round trip within a small quantization error,
    * so decoded channel means sit within ±4 of the formula — the
    * invariant the llm58 oracle checks as booleans (the same
    * exact-value+bound-boolean pattern as the sketch oracles). */
  def videoDims(id: Long): (Int, Int) = (((id % 6) + 8).toInt, ((id % 4) + 8).toInt)
  def videoFrameCount(id: Long): Int = ((id % 3) + 2).toInt
  def videoFrameRgb(id: Long, f: Int): (Int, Int, Int) = (
    (32 + (7 * id + 29 * f) % 192).toInt,
    (32 + (11 * id + 31 * f) % 192).toInt,
    (32 + (13 * id + 37 * f) % 192).toInt)

  private def fourcc(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)
  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** One real MJPEG-in-AVI clip: a RIFF 'AVI ' container (the actual
    * on-disk AVI chunk layout — hdrl/avih header LIST, then a movi LIST
    * of '00dc' frames) whose frames are genuine JPEGs from the JDK
    * encoder. Both halves are real formats the JDK can produce and
    * parse — the video modality's codec boundary is no longer a
    * byte-slicing fake. */
  def encodeMjpegAvi(id: Long): Array[Byte] = {
    require(id >= 0, s"media id must be non-negative, got $id")
    val (w, h) = videoDims(id)
    val n = videoFrameCount(id)
    val frames = (0 until n).map { f =>
      val (r, g, b) = videoFrameRgb(id, f)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fourcc(cc) ++ u32le(body.length.toLong) ++ body ++ pad
    }
    def list(tpe: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ u32le(body.length + 4L) ++ fourcc(tpe) ++ body
    // avih main header: 56 bytes (frame timing, counts, dims)
    val avih = u32le(40000L) ++ u32le(0L) ++ u32le(0L) ++ u32le(0L) ++
      u32le(n.toLong) ++ u32le(0L) ++ u32le(1L) ++ u32le(0L) ++
      u32le(w.toLong) ++ u32le(h.toLong) ++ Array.fill(16)(0.toByte)
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.flatMap(fb => chunk("00dc", fb)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ u32le(body.length.toLong) ++ body
  }

  /** Walk the RIFF container and decode every '00dc' JPEG frame. */
  def decodeMjpegFrames(payload: Array[Byte], ctx: String): Seq[BufferedImage] = {
    def le32(at: Int): Long =
      (payload(at) & 0xffL) | ((payload(at + 1) & 0xffL) << 8) |
        ((payload(at + 2) & 0xffL) << 16) | ((payload(at + 3) & 0xffL) << 24)
    def cc(at: Int): String = new String(payload, at, 4, StandardCharsets.US_ASCII)
    if (payload.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ")
      throw new IllegalStateException(s"$ctx: payload is not a RIFF/AVI clip")
    val out = Seq.newBuilder[BufferedImage]
    def walk(from: Int, end: Int): Unit = {
      var p = from
      while (p + 8 <= end) {
        val id = cc(p); val sz = le32(p + 4).toInt
        val body = p + 8
        if (id == "LIST" && sz >= 4) walk(body + 4, body + sz)
        else if (id == "00dc") {
          val img = ImageIO.read(new ByteArrayInputStream(
            java.util.Arrays.copyOfRange(payload, body, body + sz)))
          if (img == null)
            throw new IllegalStateException(s"$ctx: undecodable frame at offset $p")
          out += img
        }
        p = body + sz + (sz % 2) // chunks are even-aligned
      }
    }
    walk(12, payload.length)
    out.result()
  }

  /** A real video lake stand-in: one MJPEG clip per document id. */
  def videoTable(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id").cast("long").as("media_id"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", MediaMetaType)))
    val enc = RowEncoder.encoderFor(outSchema)
    OpUtils.parallelismFloor(ids).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = videoDims(id)
        Row(id, encodeMjpegAvi(id), Row(w, h, 3, "mjpeg"))
      }
    }(enc)
  }

  /** Real keyframe extraction: per-partition RIFF walk + JPEG decode of
    * every frame, one output row per frame with the decoded dims and
    * per-channel pixel means. JPEG is lossy, so the means are checked
    * against the source formula as a BOUND (|mean − target| ≤ 4), not
    * an equality — the downstream boolean is what the oracle pins. */
  def videoFrames(video: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = video.schema.fieldIndex("payload")
    val idIdx = video.schema.fieldIndex("media_id")
    OpUtils.parallelismFloor(video).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val frames = decodeMjpegFrames(r.getAs[Array[Byte]](payloadIdx), "videoFrames")
        frames.zipWithIndex.map { case (img, f) =>
          val (w, h) = (img.getWidth, img.getHeight)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val cnt = (w * h).toDouble
          Row(id, f, w, h, sr / cnt, sg / cnt, sb / cnt)
        }
      }
    }(enc)
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * nFrames equal slices — kept as the OPAQUE-codec generator shape
    * (posexplode over byte slices) for formats with no JVM decoder;
    * [[videoFrames]] is the real-decode path for MJPEG clips. */
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
