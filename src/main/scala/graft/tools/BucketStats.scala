package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blocking-scheme audit: for each named candidate-generation scheme,
  * print the bucket-size distribution its self-join will see — total
  * keyed rows, bucket count, Σ b·(b−1)/2 raw candidate pairs, the pairs
  * surviving the scheme's degenerate-bucket cap, and the ten largest
  * buckets. This is the measurement the >3× scaling audit (SURVEY
  * §13.6) records before tightening any blocking stage: candidate
  * growth is THE scale risk of every near-dup pass, and a cap chosen
  * blind is either silent truncation or dead insurance.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.BucketStats \
  *   [ngram|lsh|lsh_tuned|simhash ...]
  */
object BucketStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schemes = if (args.nonEmpty) args.toSeq
      else Seq("ngram", "lsh", "lsh_tuned", "simhash")
    schemes.foreach { s => report(spark, sfDir, s) }
    spark.stop()
  }

  private def keyedFrame(spark: SparkSession, dir: String,
      scheme: String): (DataFrame, Seq[String], Long) = scheme match {
    case "ngram" =>
      val mh = graft.ops.Dedup.ngramSignatures(spark, dir)
      (graft.ops.Dedup.ngramBandKeyed(mh), Seq("bk"),
        graft.ops.Dedup.NgramBucketCap)
    case "lsh" =>
      val e = graft.Tables.embeddings(spark, dir)
      (graft.ops.VectorSearch.lshBands(e, "vec_id", "embedding"),
        Seq("band_idx", "band_val"), graft.ops.VectorSearch.LshBucketCap)
    case "lsh_tuned" =>
      val e = graft.Tables.embeddings(spark, dir)
      (graft.ops.VectorSearch.lshBands(e, "vec_id", "embedding",
          planesPerBand = graft.ops.VectorSearch.LshTunedPlanesPerBand,
          bands = graft.ops.VectorSearch.LshTunedBands),
        Seq("band_idx", "band_val"), graft.ops.VectorSearch.LshBucketCap)
    case "simhash" =>
      val chunks = graft.ops.Dedup.simhashChunksDf(spark, dir)
      val expl = chunks.select(col("doc_id"),
        posexplode(array(graft.ops.Dedup.ChunkPairs.map { case (i, j) =>
          col(s"c$i") * 65536L + col(s"c$j")
        }: _*)).as(Seq("pi", "pv")))
      (expl, Seq("pi", "pv"), graft.ops.Dedup.SimhashBucketCap)
    case other => sys.error(s"unknown scheme: $other")
  }

  private def report(spark: SparkSession, dir: String, scheme: String): Unit = {
    val (keyed, bucketCols, cap) = keyedFrame(spark, dir, scheme)
    val sizes = keyed.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("n")).cache()
    val agg = sizes.agg(
      count(lit(1)).as("n_buckets"),
      sum("n").as("n_rows"),
      sum(col("n") * (col("n") - 1) / 2).as("raw_pairs"),
      sum(when(col("n") <= cap, col("n") * (col("n") - 1) / 2)
        .otherwise(0L)).as("capped_pairs"),
      max("n").as("max_bucket")).head()
    val top = sizes.orderBy(col("n").desc).limit(10).collect()
      .map(_.getAs[Long]("n")).mkString(",")
    println(s"BUCKETS scheme=$scheme dir=$dir cap=$cap " +
      s"rows=${agg.getAs[Long]("n_rows")} buckets=${agg.getAs[Long]("n_buckets")} " +
      s"rawPairs=${agg.getAs[Any]("raw_pairs")} cappedPairs=${agg.getAs[Any]("capped_pairs")} " +
      s"top10=$top")
    sizes.unpersist()
  }
}
