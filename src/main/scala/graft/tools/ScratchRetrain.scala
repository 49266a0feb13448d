package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off r19 profiling scratch: per-phase wall times of the
  * vs_ivf_retrain composition (drifted arm), to locate the residual
  * cost after the shared-model/fused-pass rework. Not part of any
  * registered query path. */
object ScratchRetrain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCRATCH $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // Warm the memo first (not timed against the phases).
    t("warm-full-key") {
      graft.SparkEntry.queries("vs_ivf_retrain")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    (1 to 2).foreach { i =>
      t(s"rep$i-full-key") {
        graft.SparkEntry.queries("vs_ivf_retrain")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val isNew = col("vec_id") % 50 === 0
    val mx = e.filter(!isNew)
      .agg(max(array_max(transform(col("embedding"), x => abs(x)))).as("maxabs"))
    val shifted = e.filter(isNew).crossJoin(broadcast(mx))
      .select(col("vec_id"),
        transform(col("embedding"), x => x + col("maxabs")).as("v"))
    val qn = t("stage-qn") {
      val f = graft.util.Persist.stage(shifted.crossJoin(broadcast(mx))
        .select(col("vec_id"), transform(col("v"), x =>
          round(x * lit(127.0) / col("maxabs"), 0).cast("long")).as("q")))
      f.count(); f
    }
    val (qAll, model0) = t("base-model-memo-hit") {
      graft.ops.VectorSearch.ivfBaseGridModel(spark, sfDir)
    }
    val qb = qAll.filter(!(col("vec_id") % 50 === 0))
    val qu = t("stage-qu") {
      val f = graft.util.Persist.stage(qb.unionByName(qn))
      f.count(); f
    }
    val m1 = t("fitInt-merged") {
      graft.ops.IvfIndex.fitInt(qu, "vec_id", "q", k = 8, iters = 2)
    }
    t("sse-fused") {
      def sseCol(m: graft.ops.IvfIndex.IntModel) =
        least(m.centroids.map { case (_, cv) =>
          graft.functions.int_sq_l2(col("q"),
            org.apache.spark.sql.functions.typedlit(cv)) }: _*)
      qu.select(sseCol(model0).as("d0"), sseCol(m1).as("d1"))
        .agg(sum("d0"), sum("d1")).head()
    }
    spark.stop()
  }
}
