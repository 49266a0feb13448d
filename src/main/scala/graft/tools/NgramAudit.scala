package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot audit for dedup_ngram_jaccard's candidate stage: distinct
  * candidate pairs and their minhash signature-agreement histogram; with
  * arg "full", also the exact-jaccard histogram (expensive — fetches
  * gram arrays per pair, keep to sf ≤ 0.1). These are the numbers that
  * decide where the signature prefilter floor sits. */
object NgramAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val full = args.contains("full")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.register(spark)
    if (args.contains("stages")) {
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"NGRAM stage=$label%s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val mh2 = graft.ops.Dedup.ngramSignatures(spark, sfDir)
      t("sig_build")(mh2.count())
      val keyed2 = graft.ops.Dedup.ngramBandKeyed(mh2)
      t("band_join_count") {
        val kept = keyed2.select("doc_id", "bk")
        println("  raw_join=" + kept.as("x").join(kept.as("y"),
          col("x.bk") === col("y.bk") &&
            col("x.doc_id") < col("y.doc_id")).count())
      }
      t("full_query")(
        graft.ops.Dedup.dedupNgramJaccard(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      spark.stop()
      return
    }
    val mh = graft.ops.Dedup.ngramSignatures(spark, sfDir)
    val keyed = graft.ops.Dedup.ngramBandKeyed(mh)
    val cand = graft.util.Skew.cappedSelfPairs(keyed, "doc_id",
      Seq("bk"), graft.ops.Dedup.NgramBucketCap)
    val slim = mh.select(col("doc_id"), col("sig"))
    val sigEq = aggregate(
      zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
    val sigged = cand
      .join(slim.select(col("doc_id").as("a_id"), col("sig").as("sa")), "a_id")
      .join(slim.select(col("doc_id").as("b_id"), col("sig").as("sb")), "b_id")
      .select(col("a_id"), col("b_id"), sigEq.as("sig_eq"))
    val hist = sigged.groupBy("sig_eq").agg(count(lit(1)).as("n"))
      .orderBy("sig_eq").collect()
    val total = hist.map(_.getLong(1)).sum
    println(s"NGRAM dir=$sfDir distinct_cand=$total " +
      s"survivors=${hist.filter(_.getLong(0) >= graft.ops.Dedup.NgramSigFloor)
        .map(_.getLong(1)).sum}")
    hist.foreach(r => println(s"NGRAM sig=${r.get(0)} n=${r.get(1)}"))
    if (args.contains("out"))
      println(s"NGRAM out_rows=${graft.ops.Dedup.dedupNgramJaccard(spark, sfDir).count()}")
    if (args.contains("stages")) {
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"NGRAM stage=$label%s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val mh2 = graft.ops.Dedup.ngramSignatures(spark, sfDir)
      t("sig_build")(mh2.count())
      val keyed2 = graft.ops.Dedup.ngramBandKeyed(mh2)
      val cand2 = graft.util.Skew.cappedSelfPairs(keyed2, "doc_id",
        Seq("bk"), graft.ops.Dedup.NgramBucketCap)
      t("cand")(println(s"  n_cand=${cand2.count()}"))
      t("full_query")(
        graft.ops.Dedup.dedupNgramJaccard(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    if (full) {
      val scored = sigged.filter(col("sig_eq") >= 0L)
        .join(mh.select(col("doc_id").as("a_id"), col("grams").as("ga")), "a_id")
        .join(mh.select(col("doc_id").as("b_id"), col("grams").as("gb")), "b_id")
        .withColumn("inter",
          call_function("sorted_intersect_count", col("ga"), col("gb")).cast("double"))
        .withColumn("j", col("inter")
          / (size(col("ga")) + size(col("gb")) - col("inter")))
      scored.groupBy(floor(col("j") * 10).as("j_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("j_bucket").collect()
        .foreach(r => println(s"NGRAM jb=${r.get(0)} n=${r.get(1)}"))
    }
    spark.stop()
  }
}
