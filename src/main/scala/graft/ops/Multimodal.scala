package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * batched per-partition featurization.
  *
  * Real pipelines carry image/audio/video as parquet `binary` columns with
  * a metadata struct; decode/resize/frame-sample run as batched
  * per-partition workers. The IMAGE leg ([[mmImageDecode]]) is a REAL
  * decode: `javax.imageio` (the JDK's PNG codec — no external media lib)
  * parses genuine PNG payloads from the binary column and the emitted
  * stats come from the decoded raster. The AUDIO leg ([[mmAudioDecode]])
  * is likewise REAL: `javax.sound.sampled` (the JDK's RIFF/WAVE codec)
  * round-trips genuine WAV containers and the stats come from the
  * decoded PCM frames. The VIDEO leg ([[mmVideoDecode]]) is REAL too:
  * multi-frame animated GIF containers (the one animated format the JDK
  * codec set handles) are written with an explicit 256-level grayscale
  * palette — a lossless encoding — and decode re-reads EVERY frame via
  * the GIF `ImageReader`, samples every 2nd frame, and emits per-frame
  * raster statistics. [[mmFrameSample]] remains the codec-free
  * byte-window variant of frame sampling (the shape used when payloads
  * are opaque). Everything Spark-side — schema, binary column, batch
  * shape, partition-parallel execution, output schema — is real on
  * every leg.
  *
  * Scale posture: mapPartitions processes fixed-size batches (no
  * per-row framework overhead, bounded memory per batch), partition
  * parallelism is the scan parallelism, and featurization is map-only —
  * no shuffle at any size.
  */
object Multimodal {
  final val BatchSize = 64
  final val FeatDim = 4

  // ImageIO's default stream cache is DISK-backed: every read/write of a
  // blob creates (and fsyncs) a temp file under java.io.tmpdir. With 32
  // decode threads per executor and ~700-byte payloads that is pure
  // filesystem churn — measured 5× wall on mm_image_decode once /tmp got
  // busy. Executors must never touch local disk per tiny blob; the
  // in-memory cache is strictly correct for heap-backed byte streams.
  javax.imageio.ImageIO.setUseCache(false)

  val outputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** STUB decoder: deterministic byte statistics standing in for a real
    * image/audio decode (mean, L2/255, min, max over payload bytes). */
  private[graft] def fakeDecodeFeatures(bytes: Array[Byte]): Array[Double] = {
    var sum = 0.0; var sq = 0.0; var mn = 255.0; var mx = 0.0
    var i = 0
    while (i < bytes.length) {
      val b = (bytes(i) & 0xFF).toDouble
      sum += b; sq += b * b; if (b < mn) mn = b; if (b > mx) mx = b
      i += 1
    }
    val n = math.max(1, bytes.length).toDouble
    Array(sum / n, math.sqrt(sq / n) / 255.0, mn, mx)
  }

  /** documents.text → opaque binary payload + metadata struct, then
    * batched per-partition featurize. */
  private def mmFeaturesCore(spark: SparkSession, dir: String): DataFrame = {
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        struct(lit("application/octet-stream").as("mime"),
          length(col("text").cast("binary")).cast("long").as("n_bytes")).as("meta"))
    val encoder = org.apache.spark.sql.Encoders.row(outputSchema)
    media.select(col("doc_id"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap { batch =>
          // One batch = one stub "decoder call" (real decoders amortize
          // model/codec setup across the batch exactly like this).
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]]("payload")
            val meta = r.getAs[Row]("meta")
            Row(r.getAs[Long]("doc_id"), meta.getAs[String]("mime"),
              meta.getAs[Long]("n_bytes"), fakeDecodeFeatures(bytes))
          }
        }
      }(encoder)
  }

  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    mmFeaturesCore(spark, dir).orderBy("doc_id")

  /** Driver-facing flattening of [[mmFeatures]]: the harness's pandas row
    * check cannot sort an `array<double>` column, so the registered query
    * emits the four feature scalars as f0..f3. Library users keep the
    * array-typed [[mmFeatures]] API.
    */
  def mmFeaturesFlat(spark: SparkSession, dir: String): DataFrame =
    mmFeaturesCore(spark, dir)
      .select(col("doc_id"), col("mime"), col("n_bytes"),
        col("features")(0).as("f0"), col("features")(1).as("f1"),
        col("features")(2).as("f2"), col("features")(3).as("f3"))
      .orderBy("doc_id")

  /** Oracle: the stub features are byte statistics over ASCII text
    * (TESTDATA documents are verified all-ASCII, so bytes == codepoints
    * and strlen == len), and DuckDB reproduces them exactly — integer
    * byte sums are exact in doubles (< 2^53) and /, sqrt are IEEE
    * correctly rounded on both engines, so every double is bit-identical.
    * Empty text is special-cased (DuckDB's str_split('','') yields ['']
    * with unicode('') = -1, unlike the stub's 0-byte statistics).
    */
  val mmFeaturesSql: String = """
    WITH b AS (
      SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        list_transform(str_split(text, ''), c -> unicode(c)) AS cps
      FROM documents),
    s AS (
      SELECT doc_id, n_bytes,
        CAST(list_sum(cps) AS DOUBLE) AS sm,
        CAST(list_sum(list_transform(cps, x -> x * x)) AS DOUBLE) AS sq,
        CAST(list_min(cps) AS DOUBLE) AS mn,
        CAST(list_max(cps) AS DOUBLE) AS mx
      FROM b)
    SELECT doc_id, 'application/octet-stream' AS mime, n_bytes,
      CASE WHEN n_bytes = 0 THEN 0.0 ELSE sm / n_bytes END AS f0,
      CASE WHEN n_bytes = 0 THEN 0.0 ELSE sqrt(sq / n_bytes) / 255.0 END AS f1,
      CASE WHEN n_bytes = 0 THEN 255.0 ELSE mn END AS f2,
      CASE WHEN n_bytes = 0 THEN 0.0 ELSE mx END AS f3
    FROM s ORDER BY doc_id"""

  // ── mm_frame_sample — video-frame-sampling plumbing over binary ──────
  final val FrameLen = 64
  final val FrameStride = 48
  final val FrameKeepEvery = 2

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("off_bytes", LongType, nullable = false),
    StructField("f_len", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Frame sampling over an opaque binary payload: the video path of a
    * multimodal pipeline — split the container into frames (here: 64-byte
    * windows at stride 48, a REAL decoder would emit codec frames), keep
    * every 2nd frame, fingerprint each kept frame. The frame splitter runs
    * as batched `mapPartitions` over the binary column (map-only — frames
    * of a payload never leave their partition, the shape that holds when
    * each payload is megabytes); the fingerprint is the shared
    * `poly_hash_cp` kernel over the frame bytes (payloads are ASCII text
    * here, so bytes == codepoints and the oracle replays the identical
    * hash over `substr(text, ...)`). Output is scalar-only (driver's
    * pandas check cannot sort binary columns). */
  private[graft] def mmFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val encoder = org.apache.spark.sql.Encoders.row(frameSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
          val id = r.getAs[Long]("doc_id")
          val bytes = r.getAs[Array[Byte]]("payload")
          Iterator.from(0).map(_.toLong)
            .takeWhile(idx => idx * FrameStride < bytes.length)
            .filter(_ % FrameKeepEvery == 0)
            .map { idx =>
              val off = (idx * FrameStride).toInt
              val fLen = math.min(FrameLen, bytes.length - off)
              Row(id, idx, off.toLong, fLen.toLong,
                java.util.Arrays.copyOfRange(bytes, off, off + fLen))
            }
      }
    }(encoder)
  }

  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.register(spark)
    mmFrames(spark, dir)
      .select(col("doc_id"), col("frame_idx"), col("off_bytes"), col("f_len"),
        graft.functions.poly_hash_cp(col("frame").cast("string")).as("checksum"))
      .orderBy("doc_id", "frame_idx")
  }

  val mmFrameSampleSql: String = s"""
    WITH f AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS len, text,
        unnest(range(0, (CAST(strlen(text) AS BIGINT) + ${FrameStride - 1}) // $FrameStride)) AS idx
      FROM documents),
    k AS (SELECT doc_id, idx AS frame_idx, idx * $FrameStride AS off_bytes,
        least($FrameLen, len - idx * $FrameStride) AS f_len,
        substr(text, CAST(idx * $FrameStride + 1 AS INT),
          CAST(least($FrameLen, len - idx * $FrameStride) AS INT)) AS fr
      FROM f WHERE idx % $FrameKeepEvery = 0)
    SELECT doc_id, frame_idx, off_bytes, f_len,
      ${graft.util.TextUtil.polySql("fr")} AS checksum
    FROM k ORDER BY doc_id, frame_idx"""

  // ── mm_image_decode — REAL image decode over a binary PNG column ────
  final val ImgW = 16
  final val ImgH = 16

  /** Deterministic grayscale pixel value for (doc, x, y): integer formula
    * over doc_id and text length, so a SQL engine can recompute every
    * pixel without an image codec. */
  private[graft] def pixelValue(docId: Long, len: Long, x: Int, y: Int): Int =
    ((docId * 31L + len * 17L + x * 7L + y * 13L) % 256L).toInt

  /** Encode the deterministic image as a REAL PNG via `javax.imageio`
    * (JDK codec — no external media lib needed). */
  private[graft] def encodePng(docId: Long, len: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(ImgW, ImgH,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) { raster.setSample(x, y, 0, pixelValue(docId, len, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  val imageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("png", BinaryType, nullable = false)))

  val imageStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_min", LongType, nullable = false),
    StructField("px_max", LongType, nullable = false),
    StructField("px_wsum", LongType, nullable = false)))

  /** (doc_id, png) binary-column frame: each document carries a real
    * 16×16 grayscale PNG payload (deterministic content). Map-only. */
  private[graft] def mmImages(spark: SparkSession, dir: String): DataFrame = {
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text").cast("binary")).cast("long").as("len"))
    val encoder = org.apache.spark.sql.Encoders.row(imageSchema)
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap(_.iterator.map { r =>
        val id = r.getLong(0)
        Row(id, encodePng(id, r.getLong(1)))
      })
    }(encoder)
  }

  /** The image leg of the multimodal pipeline with a REAL decode — no
    * stub: `javax.imageio.ImageIO.read` parses the PNG payload from the
    * binary column and the emitted statistics come from the DECODED
    * raster (sum / min / max / position-weighted checksum over raster
    * order, all exact BIGINT). Because the encoded image content is a
    * deterministic integer formula, the DuckDB oracle recomputes the same
    * stats pixel-by-pixel without a codec — any decoder deviation
    * (wrong pixel, wrong order, wrong dimensions) breaks the hash.
    * Batched mapPartitions, map-only, frames never leave their partition:
    * the same scale shape as the stubbed legs. */
  /** Raster statistics of a decoded single-band image: (width, height,
    * Σv, min, max, Σv·(y·w+x+1)). The ONE definition of the pixel fold —
    * [[mmImageDecode]] and [[mmModalityRouter]] both decode through it,
    * so the raster traversal order (row-major, position-weighted) can
    * never diverge between the dedicated op and the router. */
  private[graft] def pngRasterStats(blob: Array[Byte]): (Int, Int, Long, Long, Long, Long) = {
    val in = new java.io.ByteArrayInputStream(blob)
    try {
      val img = javax.imageio.ImageIO.read(in)
      val raster = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L; var mn = 255L; var mx = 0L; var wsum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = raster.getSample(x, y, 0).toLong
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          wsum += v * (y.toLong * w + x + 1)
          x += 1
        }
        y += 1
      }
      (w, h, sum, mn, mx, wsum)
    } finally in.close()
  }

  /** Parse a WAV container through the real JDK codec and return the raw
    * 16-bit mono little-endian PCM bytes; the AudioInputStream is closed
    * in finally. The REFERENCE decoder: [[wavPcmBytesDirect]] is the hot
    * path, and AudioParitySpec pins byte-identical output of the two on
    * the whole generated corpus. */
  private[graft] def wavPcmBytes(blob: Array[Byte]): Array[Byte] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian, s"unexpected decoded format: $fmt")
      ais.readAllBytes()
    } finally ais.close()
  }

  /** Direct RIFF/WAVE chunk walk returning the same PCM bytes as
    * [[wavPcmBytes]] without the per-blob `AudioSystem` SPI dispatch
    * (provider discovery + stream plumbing dominated the decode at
    * ~0.5 ms/clip; the container math is microseconds). Validates the
    * same contract the codec did — RIFF/WAVE magic, fmt chunk with
    * PCM(1), mono, 16-bit — and errors loudly on anything else. Chunks
    * are walked by (id, size) with word alignment, so extra chunks
    * (LIST/fact) are skipped exactly as the codec skips them. */
  private[graft] def wavPcmBytesDirect(blob: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.remaining >= 12 && bb.getInt(0) == 0x46464952, "not RIFF") // "RIFF"
    require(bb.getInt(8) == 0x45564157, "not WAVE") // "WAVE"
    var pos = 12
    var fmtOk = false
    while (pos + 8 <= blob.length) {
      val id = bb.getInt(pos)
      val size = bb.getInt(pos + 4)
      // Long arithmetic: a crafted size near Int.MaxValue would overflow
      // an int sum negative, slip past the require, and surface later as
      // IndexOutOfBounds instead of this loud contract error.
      require(size >= 0 && pos.toLong + 8L + size <= blob.length,
        s"truncated chunk at $pos")
      if (id == 0x20746d66) { // "fmt "
        require(size >= 16, "short fmt chunk")
        val audioFormat = bb.getShort(pos + 8).toInt
        val channels = bb.getShort(pos + 10).toInt
        val bits = bb.getShort(pos + 22).toInt
        require(audioFormat == 1 && channels == 1 && bits == 16,
          s"unexpected WAV format: fmt=$audioFormat ch=$channels bits=$bits")
        fmtOk = true
      } else if (id == 0x61746164) { // "data"
        require(fmtOk, "data chunk before fmt chunk")
        return java.util.Arrays.copyOfRange(blob, pos + 8, pos + 8 + size)
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    throw new IllegalArgumentException("no data chunk in WAV container")
  }

  /** i-th signed 16-bit little-endian sample of a PCM byte array. */
  @inline private[graft] def pcmSample(pcm: Array[Byte], i: Int): Long =
    ((pcm(i * 2 + 1).toInt << 8) | (pcm(i * 2) & 0xFF)).toLong

  def mmImageDecode(spark: SparkSession, dir: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(imageStatsSchema)
    mmImages(spark, dir).mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap(_.iterator.map { r =>
        val (w, h, sum, mn, mx, wsum) = pngRasterStats(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), w.toLong, h.toLong, sum, mn, mx, wsum)
      })
    }(encoder).orderBy("doc_id")
  }

  /** Oracle: replay the pixel formula directly (i = y·W + x raster
    * order) — equality proves the PNG round-trip decoded every pixel
    * at its exact position. */
  val mmImageDecodeSql: String = s"""
    WITH d AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS len FROM documents),
    px AS (SELECT doc_id, p.range AS i,
        (doc_id * 31 + len * 17 + (p.range % $ImgW) * 7 + (p.range // $ImgW) * 13) % 256 AS v
      FROM d, range(0, ${ImgW * ImgH}) p)
    SELECT doc_id, CAST($ImgW AS BIGINT) AS width, CAST($ImgH AS BIGINT) AS height,
      CAST(SUM(v) AS BIGINT) AS px_sum, CAST(MIN(v) AS BIGINT) AS px_min,
      CAST(MAX(v) AS BIGINT) AS px_max, CAST(SUM(v * (i + 1)) AS BIGINT) AS px_wsum
    FROM px GROUP BY doc_id ORDER BY doc_id"""

  // ── mm_image_resize — REAL decode → integer resize → codec round-trip ─
  final val ResizeF = 2

  /** Integer 2×2 box downsample of a decoded single-band raster:
    * out(x, y) = ⌊(v(2x,2y) + v(2x+1,2y) + v(2x,2y+1) + v(2x+1,2y+1))/4⌋.
    * Box (average-pool) resize with EXACT integer arithmetic — the
    * resize kernel a SQL engine replays bit-for-bit, where Graphics2D's
    * bilinear/bicubic float paths are implementation-defined and would
    * break the oracle. The real imaging work is real: decode the PNG,
    * sample the raster, build the downsampled image, RE-ENCODE it
    * through the codec, decode it AGAIN for the emitted stats — any
    * deviation anywhere in the decode→resize→encode→decode chain
    * (wrong sample position, wrong raster order, lossy round-trip)
    * breaks the hash. */
  private[graft] def resizeBox(img: java.awt.image.BufferedImage,
      f: Int): java.awt.image.BufferedImage = {
    val (w, h) = (img.getWidth / f, img.getHeight / f)
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val src = img.getRaster; val dst = out.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = 0; var dy = 0
        while (dy < f) {
          var dx = 0
          while (dx < f) { acc += src.getSample(x * f + dx, y * f + dy, 0); dx += 1 }
          dy += 1
        }
        dst.setSample(x, y, 0, acc / (f * f))
        x += 1
      }
      y += 1
    }
    out
  }

  /** The resize leg the brief lists alongside decode / feature-extract /
    * frame-sample: per blob, a full decode → integer box downsample
    * ([[resizeBox]]) → PNG re-encode → second decode, emitting the
    * resized raster's statistics ([[pngRasterStats]] — the shared pixel
    * fold). Batched mapPartitions, map-only, blobs never leave their
    * partition; the PNG in flight shrinks 4× (the point of resizing in
    * a training pipeline: normalize resolution BEFORE the shuffle). */
  def mmImageResize(spark: SparkSession, dir: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(imageStatsSchema)
    mmImages(spark, dir).mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap(_.iterator.map { r =>
        val in = new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))
        val img = try javax.imageio.ImageIO.read(in) finally in.close()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(resizeBox(img, ResizeF), "png", bos)
        val (w, h, sum, mn, mx, wsum) = pngRasterStats(bos.toByteArray)
        Row(r.getLong(0), w.toLong, h.toLong, sum, mn, mx, wsum)
      })
    }(encoder).orderBy("doc_id")
  }

  /** Oracle: replay the source-pixel formula, average each 2×2 block
    * with integer division, and fold the downsampled raster in row-major
    * order — codec-free arithmetic equal to the double round-trip. */
  val mmImageResizeSql: String = s"""
    WITH d AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS len FROM documents),
    px AS (SELECT doc_id, p.range % $ImgW AS x, p.range // $ImgW AS y,
        (doc_id * 31 + len * 17 + (p.range % $ImgW) * 7 + (p.range // $ImgW) * 13) % 256 AS v
      FROM d, range(0, ${ImgW * ImgH}) p),
    rs AS (SELECT doc_id, x // $ResizeF AS rx, y // $ResizeF AS ry,
        CAST(SUM(v) AS BIGINT) // ${ResizeF * ResizeF} AS v
      FROM px GROUP BY 1, 2, 3)
    SELECT doc_id,
      CAST(${ImgW / ResizeF} AS BIGINT) AS width,
      CAST(${ImgH / ResizeF} AS BIGINT) AS height,
      CAST(SUM(v) AS BIGINT) AS px_sum, CAST(MIN(v) AS BIGINT) AS px_min,
      CAST(MAX(v) AS BIGINT) AS px_max,
      CAST(SUM(v * (ry * ${ImgW / ResizeF} + rx + 1)) AS BIGINT) AS px_wsum
    FROM rs GROUP BY doc_id ORDER BY doc_id"""

  // ── mm_audio_decode — REAL audio decode over a binary WAV column ────
  final val AudioRateHz = 8000f
  final val AudioMaxSamples = 512

  /** Samples per clip: 256..511, varying with the document. */
  private[graft] def audioSampleCount(docId: Long, len: Long): Int =
    (256 + (docId * 7 + len) % 256).toInt

  /** Deterministic signed 16-bit PCM sample for (doc, i): integer formula
    * a SQL engine replays without an audio codec. */
  private[graft] def audioSample(docId: Long, i: Int): Int =
    (((docId * 131L + i * 1009L) % 65536L) - 32768L).toInt

  /** Encode the deterministic clip as a REAL WAV container via
    * `javax.sound.sampled.AudioSystem` (JDK RIFF/WAVE writer — no
    * external media lib): 8 kHz mono 16-bit signed little-endian PCM. */
  private[graft] def encodeWav(docId: Long, len: Long): Array[Byte] = {
    val n = audioSampleCount(docId, len)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = audioSample(docId, i)
      pcm(i * 2) = (v & 0xFF).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(AudioRateHz, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("wav", BinaryType, nullable = false)))

  val audioStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("s_sum", LongType, nullable = false),
    StructField("s_min", LongType, nullable = false),
    StructField("s_max", LongType, nullable = false),
    StructField("s_wsum", LongType, nullable = false),
    StructField("s_energy", LongType, nullable = false),
    StructField("n_zcross", LongType, nullable = false)))

  /** (doc_id, wav) binary-column frame: each document carries a real
    * RIFF/WAVE payload (deterministic PCM content). Map-only. */
  private[graft] def mmAudio(spark: SparkSession, dir: String): DataFrame = {
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text").cast("binary")).cast("long").as("len"))
    val encoder = org.apache.spark.sql.Encoders.row(audioSchema)
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap(_.iterator.map { r =>
        val id = r.getLong(0)
        Row(id, encodeWav(id, r.getLong(1)))
      })
    }(encoder)
  }

  /** The audio leg of the multimodal pipeline with a REAL decode — no
    * stub: `AudioSystem.getAudioInputStream` parses the WAV container
    * from the binary column (format + frame count from the RIFF header)
    * and the emitted statistics come from the DECODED samples: count,
    * sum, min, max, position-weighted sum, energy (Σv²) and
    * zero-crossings — all exact BIGINT. The clip content is a
    * deterministic integer formula, so the DuckDB oracle recomputes every
    * sample codec-free: a wrong sample, wrong byte order, or dropped
    * frame breaks the hash. Batched mapPartitions, map-only — the same
    * scale shape as the image leg. */
  def mmAudioDecode(spark: SparkSession, dir: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(audioStatsSchema)
    mmAudio(spark, dir).mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap(_.iterator.map { r =>
        val pcm = wavPcmBytesDirect(r.getAs[Array[Byte]](1))
        val n = pcm.length / 2
        var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
        var wsum = 0L; var energy = 0L; var zc = 0L
        var prevNonNeg = false
        var i = 0
        while (i < n) {
          val v = pcmSample(pcm, i)
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          wsum += v * (i + 1); energy += v * v
          val nonNeg = v >= 0
          if (i > 0 && nonNeg != prevNonNeg) zc += 1
          prevNonNeg = nonNeg
          i += 1
        }
        Row(r.getLong(0), n.toLong, sum, mn, mx, wsum, energy, zc)
      })
    }(encoder).orderBy("doc_id")
  }

  /** Oracle: replay the PCM formula directly — equality proves the WAV
    * round-trip decoded every frame at its exact position with the right
    * byte order and sign. Window SUMs are HUGEINT in DuckDB → every
    * output column CAST AS BIGINT (round-2 rule). */
  val mmAudioDecodeSql: String = s"""
    WITH d AS (SELECT doc_id, 256 + (doc_id * 7 + CAST(strlen(text) AS BIGINT)) % 256 AS ns
      FROM documents),
    s AS (SELECT doc_id, p.range AS i,
        (doc_id * 131 + p.range * 1009) % 65536 - 32768 AS v
      FROM d, range(0, $AudioMaxSamples) p WHERE p.range < ns),
    z AS (SELECT doc_id, i, v,
        CASE WHEN i > 0 AND (v >= 0) <>
          (lag(v) OVER (PARTITION BY doc_id ORDER BY i) >= 0)
        THEN 1 ELSE 0 END AS zc
      FROM s)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
      CAST(SUM(v) AS BIGINT) AS s_sum, CAST(MIN(v) AS BIGINT) AS s_min,
      CAST(MAX(v) AS BIGINT) AS s_max,
      CAST(SUM(v * (i + 1)) AS BIGINT) AS s_wsum,
      CAST(SUM(v * v) AS BIGINT) AS s_energy,
      CAST(SUM(zc) AS BIGINT) AS n_zcross
    FROM z GROUP BY doc_id ORDER BY doc_id"""

  // ── mm_video_decode — REAL multi-frame decode over a binary GIF column ──
  final val VidW = 8
  final val VidH = 8
  final val VidMaxFrames = 6
  final val VidKeepEvery = 2

  /** Frames per clip: 3..6, varying with the document. */
  private[graft] def videoFrameCount(docId: Long): Int = (3 + docId % 4).toInt

  /** Deterministic grayscale pixel for (doc, frame, x, y) — integer
    * formula a SQL engine replays without a codec. */
  private[graft] def videoPixel(docId: Long, f: Int, x: Int, y: Int): Int =
    ((docId * 31L + f * 101L + x * 7L + y * 13L) % 256L).toInt

  /** 256-level grayscale palette: with an EXPLICIT IndexColorModel the
    * GIF encode is lossless (palette entry i = gray i), so the container
    * round-trip is bit-exact — verified by the oracle hash. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = new Array[Byte](256)
    var i = 0
    while (i < 256) { g(i) = i.toByte; i += 1 }
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Encode the deterministic clip as a REAL multi-frame animated GIF via
    * the JDK's `ImageWriter` sequence API (`prepareWriteSequence` /
    * `writeToSequence`) — an actual video-style container: one file,
    * many frames, a codec on both ends. */
  private[graft] def encodeGif(docId: Long): Array[Byte] = {
    val cm = grayPalette
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val nf = videoFrameCount(docId)
    var f = 0
    while (f < nf) {
      val img = new java.awt.image.BufferedImage(VidW, VidH,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val raster = img.getRaster
      var y = 0
      while (y < VidH) {
        var x = 0
        while (x < VidW) { raster.setSample(x, y, 0, videoPixel(docId, f, x, y)); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  val videoSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("gif", BinaryType, nullable = false)))

  val videoStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_min", LongType, nullable = false),
    StructField("px_max", LongType, nullable = false),
    StructField("px_wsum", LongType, nullable = false)))

  /** (doc_id, gif) binary-column frame: each document carries a real
    * multi-frame animated GIF payload. Map-only. */
  private[graft] def mmVideos(spark: SparkSession, dir: String): DataFrame = {
    val media = Tables.documents(spark, dir).select(col("doc_id"))
    val encoder = org.apache.spark.sql.Encoders.row(videoSchema)
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap(_.iterator.map { r =>
        val id = r.getLong(0)
        Row(id, encodeGif(id))
      })
    }(encoder)
  }

  /** The video leg of the multimodal pipeline with a REAL multi-frame
    * decode — no stub: the GIF `ImageReader` parses the container from
    * the binary column, `getNumImages` discovers the frame count, every
    * 2nd frame is decoded (`reader.read(f)`) and its raster statistics
    * emitted (sum / min / max / position-weighted checksum, exact
    * BIGINT). The encoded frames follow a deterministic integer formula,
    * so the DuckDB oracle recomputes every kept frame pixel-by-pixel
    * codec-free — a dropped frame, wrong frame order, palette drift, or
    * wrong pixel breaks the hash. Batched mapPartitions, map-only:
    * frames never leave their payload's partition, the shape that holds
    * when each clip is megabytes. */
  def mmVideoDecode(spark: SparkSession, dir: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(videoStatsSchema)
    mmVideos(spark, dir).mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap(_.iterator.flatMap { r =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        // dispose/close even when a malformed payload makes the decode
        // throw — per-row native/heap leaks compound over a long scan
        try {
          reader.setInput(iis)
          val nf = reader.getNumImages(true)
          (0 until nf).filter(_ % VidKeepEvery == 0).map { f =>
            val img = reader.read(f)
            var sum = 0L; var mn = 255L; var mx = 0L; var wsum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                // getRGB (not the raster sample) so the value is the COLOR,
                // independent of how the decoder ordered the palette.
                val v = (img.getRGB(x, y) & 0xFF).toLong
                sum += v; if (v < mn) mn = v; if (v > mx) mx = v
                wsum += v * (y.toLong * img.getWidth + x + 1)
                x += 1
              }
              y += 1
            }
            Row(r.getLong(0), f.toLong, nf.toLong, sum, mn, mx, wsum)
          }
        } finally {
          reader.dispose()
          iis.close()
        }
      })
    }(encoder).orderBy("doc_id", "frame_idx")
  }

  /** Oracle: replay the pixel formula for every kept frame — equality
    * proves the animated container decoded every frame, in order, with
    * exact pixel values. */
  val mmVideoDecodeSql: String = s"""
    WITH d AS (SELECT doc_id, 3 + doc_id % 4 AS nf FROM documents),
    fr AS (SELECT doc_id, nf, f.range AS f
      FROM d, range(0, $VidMaxFrames) f
      WHERE f.range < nf AND f.range % $VidKeepEvery = 0),
    px AS (SELECT doc_id, nf, f, p.range AS i,
        (doc_id * 31 + f * 101 + (p.range % $VidW) * 7 + (p.range // $VidW) * 13) % 256 AS v
      FROM fr, range(0, ${VidW * VidH}) p)
    SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, CAST(nf AS BIGINT) AS n_frames,
      CAST(SUM(v) AS BIGINT) AS px_sum, CAST(MIN(v) AS BIGINT) AS px_min,
      CAST(MAX(v) AS BIGINT) AS px_max, CAST(SUM(v * (i + 1)) AS BIGINT) AS px_wsum
    FROM px GROUP BY doc_id, f, nf ORDER BY doc_id, frame_idx"""

  // ── mm_modality_router — magic-byte dispatch over mixed binaries ─────
  val routerStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("modality", org.apache.spark.sql.types.StringType, nullable = false),
    StructField("n_units", LongType, nullable = false),
    StructField("payload_sum", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Schema-on-read modality dispatch — the ingest step a mixed media
    * lake needs when blobs arrive UNTAGGED: one batched mapPartitions
    * pass sniffs each blob's magic bytes (\\x89PNG vs RIFF) and routes it
    * to the matching REAL decoder — the SAME [[pngRasterStats]] /
    * [[wavPcmBytes]] kernels the dedicated ops use — emitting a uniform
    * (modality, units, payload sum, position checksum) row.
    * The mixed input is images for even doc_ids, WAV clips for odd ones
    * (deterministic split, so the oracle replays both formula legs and
    * unions them). Map-only; blobs never leave their partition. An
    * unknown magic errors loudly rather than silently skipping. */
  def mmModalityRouter(spark: SparkSession, dir: String): DataFrame = {
    val mixed = mmImages(spark, dir).filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("png").as("blob"))
      .unionByName(mmAudio(spark, dir).filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("wav").as("blob")))
    val encoder = org.apache.spark.sql.Encoders.row(routerStatsSchema)
    mixed.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap(_.iterator.map { r =>
        val id = r.getLong(0)
        val blob = r.getAs[Array[Byte]](1)
        if (blob.length >= 4 && (blob(0) & 0xFF) == 0x89 && blob(1) == 'P' &&
            blob(2) == 'N' && blob(3) == 'G') {
          val (w, h, sum, _, _, wsum) = pngRasterStats(blob)
          Row(id, "image", w.toLong * h, sum, wsum)
        } else if (blob.length >= 4 && blob(0) == 'R' && blob(1) == 'I' &&
            blob(2) == 'F' && blob(3) == 'F') {
          val pcm = wavPcmBytesDirect(blob)
          val n = pcm.length / 2
          var sum = 0L; var wsum = 0L
          var i = 0
          while (i < n) {
            val v = pcmSample(pcm, i)
            sum += v; wsum += v * (i + 1)
            i += 1
          }
          Row(id, "audio", n.toLong, sum, wsum)
        } else {
          throw new IllegalArgumentException(
            s"doc $id: unknown magic ${blob.take(4).mkString(",")}")
        }
      })
    }(encoder).orderBy("doc_id")
  }
  /** Oracle: the two deterministic payload formulas, routed by the same
    * parity split and unioned. */
  val mmModalityRouterSql: String = s"""
    WITH d AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS len FROM documents),
    px AS (SELECT doc_id, p.range AS i,
        (doc_id * 31 + len * 17 + (p.range % $ImgW) * 7 + (p.range // $ImgW) * 13) % 256 AS v
      FROM d, range(0, ${ImgW * ImgH}) p WHERE doc_id % 2 = 0),
    img AS (SELECT doc_id, 'image' AS modality,
        CAST(COUNT(*) AS BIGINT) AS n_units, CAST(SUM(v) AS BIGINT) AS payload_sum,
        CAST(SUM(v * (i + 1)) AS BIGINT) AS checksum
      FROM px GROUP BY doc_id),
    ad AS (SELECT doc_id, 256 + (doc_id * 7 + len) % 256 AS ns
      FROM d WHERE doc_id % 2 = 1),
    sm AS (SELECT doc_id, p.range AS i,
        (doc_id * 131 + p.range * 1009) % 65536 - 32768 AS v
      FROM ad, range(0, $AudioMaxSamples) p WHERE p.range < ns),
    au AS (SELECT doc_id, 'audio' AS modality,
        CAST(COUNT(*) AS BIGINT) AS n_units, CAST(SUM(v) AS BIGINT) AS payload_sum,
        CAST(SUM(v * (i + 1)) AS BIGINT) AS checksum
      FROM sm GROUP BY doc_id)
    SELECT * FROM img UNION ALL SELECT * FROM au ORDER BY doc_id"""

  // ── mm_phash — perceptual-hash image near-dup detection (dHash) ──────
  /** Image deduplication by PERCEPTUAL hash — the multimodal leg of the
    * dedup family (what LAION/DataComp-style curation runs on images,
    * where `dedup_exact` on bytes misses re-encodes and small edits):
    * dHash (difference hash) over the decoded raster. Chain per image,
    * all REAL codec work: encode the deterministic 16×16 grayscale
    * content as a genuine PNG → `ImageIO.read` it back → integer 2×2
    * box downsample ([[resizeBox]] — the exact-arithmetic kernel
    * [[mmImageResize]] already uses) → 56-bit gradient hash (bit
    * cy·7+cx set iff the 8×8 mean at (cx+1,cy) > at (cx,cy)). dHash is
    * BRIGHTNESS-SHIFT invariant by construction (gradients ignore a
    * constant offset) — the property that makes it a perceptual hash
    * rather than a checksum.
    *
    * The image corpus is FAMILY-structured so near-dups really exist:
    * every 16 consecutive doc_ids share one avalanche-mixed base image
    * (bounded-BIGINT multiply-mix, oracle-replayable) and each member
    * perturbs a single distinct diagonal pixel by +128 mod 256 — a
    * one-pixel edit that moves one 8×8 cell mean by ±32 and flips 0-2
    * gradient bits, so same-family pairs span Hamming 0..4 and the ≤
    * [[PhHam]] cut genuinely separates them (AnalyticsOpsSpec counts
    * both sides). Cross-family hashes are mixer-random (expected
    * Hamming ≈ 28) and never collide on a band.
    *
    * Pairing is the [[Dedup.dedupSimhash]] machinery re-targeted: the
    * 56-bit hash splits into four 14-bit chunks; Hamming ≤ 2 damages at
    * most 2 chunks, so one of the C(4,2)=6 chunk-PAIR keys is always
    * intact (pigeonhole-exact) — corpus-sized data shuffles only on the
    * 28-bit band key, never an all-pairs join; degenerate buckets stay
    * capped by the same [[graft.util.Skew.cappedSelfPairs]] guard
    * (identical-hash buckets are bounded at the family stride 16 by
    * construction — the cap is posture, mirrored in the oracle).
    * Verified with exact `bit_count(xor)`. The DuckDB oracle replays
    * pixels → box means → gradient bits → pack → bands → verify in pure
    * BIGINT, so a codec deviation anywhere breaks the hash. */
  final val PhFamStride = 16L
  final val PhHam = 2L
  final val PhChunkBits = 14
  final val PhBucketCap = 2000L

  /** Deterministic family-structured pixel (see [[mmPhash]]): avalanche-
    * mixed base keyed on the family id, two perturbed pixels per member.
    * The mixer is the repo's multiply-XOR avalanche (the same shape as
    * Dedup's ngram mixer / VectorSearch.planeVal) — a single
    * multiplicative hash is LINEAR (m(v+d) = m(v)+m(d) mod 2^31), which
    * made adjacent-box gradients near-constant across families and let
    * 2,192 cross-family pairs leak through Hamming ≤ 2 on the first cut;
    * the xor-shift steps break the linearity and cross-family hashes go
    * mixer-random. All intermediates < 2^62 — exact in BIGINT on both
    * engines (nothing wraps; ANSI mode never throws). */
  private[graft] def phPixel(docId: Long, x: Int, y: Int): Int = {
    val fam = (docId / PhFamStride) % 65536L
    val v = fam * 1000003L + y * 131L + x * 31L + 7L
    val x1 = ((v % 1048576L) * 2654435761L) % 2147483648L
    val x2 = ((x1 ^ (x1 / 65536L)) * 2246822519L) % 2147483648L
    val base = ((x2 ^ (x2 / 8192L)) / 8388608L).toInt
    val r = (docId % PhFamStride).toInt
    if ((x == r && y == r) || (x == (r + 5) % 16 && y == (r + 11) % 16))
      (base + 128) % 256
    else base
  }

  private[graft] def phEncodePng(docId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(ImgW, ImgH,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) { raster.setSample(x, y, 0, phPixel(docId, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real-codec dHash: PNG decode → integer box downsample → 56-bit
    * horizontal-gradient hash of the 8×8 mean grid. */
  private[graft] def phashFromPng(blob: Array[Byte]): Long = {
    val in = new java.io.ByteArrayInputStream(blob)
    val img = try javax.imageio.ImageIO.read(in) finally in.close()
    val small = resizeBox(img, ResizeF)
    val r = small.getRaster
    var hash = 0L
    var cy = 0
    while (cy < ImgH / ResizeF) {
      var cx = 0
      while (cx < ImgW / ResizeF - 1) {
        if (r.getSample(cx + 1, cy, 0) > r.getSample(cx, cy, 0))
          hash |= 1L << (cy * (ImgW / ResizeF - 1) + cx)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  private val phashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** (doc_id, phash) via the full encode→decode→resize→hash codec chain —
    * batched mapPartitions, map-only. */
  private[graft] def mmPhashes(spark: SparkSession, dir: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(phashSchema)
    Tables.documents(spark, dir).select(col("doc_id"))
      .mapPartitions { rows =>
        rows.grouped(BatchSize).flatMap(_.iterator.map { r =>
          val id = r.getLong(0)
          Row(id, phashFromPng(phEncodePng(id)))
        })
      }(encoder)
  }

  /** (staged hash table, banded candidate pairs) — factored so the
    * [[graft.Audits]] `mm_phash.candidates` probe counts the EXACT
    * candidate frame the registered query verifies (family structure
    * bounds it at ~(stride−1)/2 per doc; a banding collapse shows up
    * here first). */
  private[graft] def mmPhashCandidates(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val hashes = graft.util.Persist.stage(mmPhashes(spark, dir))
    val chunkScale = 1L << PhChunkBits
    val chunks = hashes.select(col("doc_id") +: (0 until 4).map(k =>
      (graft.util.Det.idiv(col("phash"), 1L << (PhChunkBits * k)) % chunkScale)
        .as(s"c$k")): _*)
    val expl = chunks.select(col("doc_id"),
      posexplode(array(Dedup.ChunkPairs.map { case (i, j) =>
        col(s"c$i") * chunkScale + col(s"c$j")
      }: _*)).as(Seq("pi", "pv")))
    (hashes, graft.util.Skew.cappedSelfPairs(expl, "doc_id",
      Seq("pi", "pv"), PhBucketCap))
  }

  def mmPhash(spark: SparkSession, dir: String): DataFrame = {
    val (hashes, cand) = mmPhashCandidates(spark, dir)
    cand
      .join(hashes.select(col("doc_id").as("a_id"), col("phash").as("ah")), "a_id")
      .join(hashes.select(col("doc_id").as("b_id"), col("phash").as("bh")), "b_id")
      .select(col("a_id"), col("b_id"),
        bit_count(col("ah").bitwiseXOR(col("bh"))).cast("long").as("hamming"))
      .filter(col("hamming") <= PhHam)
      .orderBy("a_id", "b_id")
  }
  val mmPhashSql: String = {
    val cs = 1L << PhChunkBits
    s"""
    WITH d AS (SELECT doc_id FROM documents),
    pv AS (SELECT doc_id, p.range AS i,
        (p.range % $ImgW) AS xx, (p.range // $ImgW) AS yy,
        doc_id % $PhFamStride AS r,
        (((doc_id // $PhFamStride) % 65536) * 1000003
           + (p.range // $ImgW) * 131 + (p.range % $ImgW) * 31 + 7) AS vv
      FROM d, range(0, ${ImgW * ImgH}) p),
    mx1 AS (SELECT *, ((vv % 1048576) * 2654435761) % 2147483648 AS x1 FROM pv),
    mx2 AS (SELECT *, (xor(x1, x1 // 65536) * 2246822519) % 2147483648 AS x2 FROM mx1),
    px AS (SELECT doc_id, i,
        CASE WHEN (xx = r AND yy = r)
               OR (xx = (r + 5) % 16 AND yy = (r + 11) % 16)
          THEN xor(x2, x2 // 8192) // 8388608 + 128
          ELSE xor(x2, x2 // 8192) // 8388608
        END AS v0
      FROM mx2),
    pxm AS (SELECT doc_id, i, v0 % 256 AS v FROM px),
    g AS (SELECT doc_id, (i % $ImgW) // $ResizeF AS cx, (i // $ImgW) // $ResizeF AS cy,
        CAST(SUM(v) // ${ResizeF * ResizeF} AS BIGINT) AS gv
      FROM pxm GROUP BY 1, 2, 3),
    bits AS (SELECT a.doc_id, a.cy * ${ImgW / ResizeF - 1} + a.cx AS b
      FROM g a JOIN g n ON n.doc_id = a.doc_id AND n.cy = a.cy AND n.cx = a.cx + 1
      WHERE a.cx < ${ImgW / ResizeF - 1} AND n.gv > a.gv),
    ph AS (SELECT d.doc_id,
        COALESCE(CAST(SUM(CAST(1 AS BIGINT) << b) AS BIGINT), 0) AS phash
      FROM d LEFT JOIN bits USING (doc_id) GROUP BY 1),
    wide AS (SELECT doc_id, phash,
        (phash // ${1L << (PhChunkBits * 0)}) % $cs AS c0,
        (phash // ${1L << (PhChunkBits * 1)}) % $cs AS c1,
        (phash // ${1L << (PhChunkBits * 2)}) % $cs AS c2,
        (phash // ${1L << (PhChunkBits * 3)}) % $cs AS c3
      FROM ph),
    pairs AS (SELECT doc_id, p.pi AS pi,
        CASE p.pi WHEN 0 THEN c0*$cs+c1 WHEN 1 THEN c0*$cs+c2
                  WHEN 2 THEN c0*$cs+c3 WHEN 3 THEN c1*$cs+c2
                  WHEN 4 THEN c1*$cs+c3 ELSE c2*$cs+c3 END AS pv
      FROM wide, (SELECT range AS pi FROM range(0, 6)) p),
    bsizes AS (SELECT pi, pv FROM pairs GROUP BY 1, 2
               HAVING COUNT(*) <= $PhBucketCap),
    kept AS (SELECT p.* FROM pairs p JOIN bsizes USING (pi, pv)),
    cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
             FROM kept x JOIN kept y
               ON x.pi = y.pi AND x.pv = y.pv AND x.doc_id < y.doc_id)
    SELECT a_id, b_id,
      CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM cand JOIN wide a ON a.doc_id = a_id JOIN wide b ON b.doc_id = b_id
    WHERE bit_count(xor(a.phash, b.phash)) <= $PhHam
    ORDER BY a_id, b_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_phash" -> (mmPhash _),
    "mm_modality_router" -> (mmModalityRouter _),
    "mm_features" -> ((s, d) => mmFeaturesFlat(s, d)),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_image_decode" -> (mmImageDecode _),
    "mm_image_resize" -> (mmImageResize _),
    "mm_audio_decode" -> (mmAudioDecode _),
    "mm_video_decode" -> (mmVideoDecode _))
  val oracles: Map[String, String] = Map(
    "mm_phash" -> mmPhashSql,
    "mm_video_decode" -> mmVideoDecodeSql,
    "mm_modality_router" -> mmModalityRouterSql,
    "mm_features" -> mmFeaturesSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_image_decode" -> mmImageDecodeSql,
    "mm_image_resize" -> mmImageResizeSql,
    "mm_audio_decode" -> mmAudioDecodeSql)
}
