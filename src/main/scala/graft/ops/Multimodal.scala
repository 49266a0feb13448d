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
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
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
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> ((s, d) => mmFeatures(s, d)))
  // No oracleSql: non-SQL-expressible (driver records rows-only check).
  val oracles: Map[String, String] = Map.empty
}
