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
  * per-partition workers. This container has no media libs (SURVEY §6), so
  * the DECODE STEP IS STUBBED with a deterministic fake (byte-statistics
  * "features"); everything Spark-side — schema, binary column, batch
  * shape, partition-parallel execution, output schema — is real.
  *
  * Scale posture: mapPartitions processes fixed-size batches (no
  * per-row framework overhead, bounded memory per batch), partition
  * parallelism is the scan parallelism, and featurization is map-only —
  * no shuffle at any size.
  */
object Multimodal {
  final val BatchSize = 64
  final val FeatDim = 4

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> ((s, d) => mmFeaturesFlat(s, d)),
    "mm_frame_sample" -> (mmFrameSample _))
  val oracles: Map[String, String] = Map(
    "mm_features" -> mmFeaturesSql,
    "mm_frame_sample" -> mmFrameSampleSql)
}
