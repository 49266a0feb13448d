package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of one pruned-LSH serve micro-batch — where does
  * the per-batch latency actually go (sig job / probe+collect /
  * rescore)?  Scratch diagnostic, not product surface.
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PrunedProfile"
  */
object PrunedProfile {
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
    import spark.implicits._

    val (flat, r, b) = graft.streaming.Streaming.lshServeGeometry(spark, sfDir)
    println(s"PROF geometry r=$r b=$b planes=${r * b}")
    val bandsT = spark.table(
      graft.ops.VectorSearch.storedTable("graft_lsh_bands", sfDir))
    val vecsT = spark.table(
      graft.ops.VectorSearch.storedTable("graft_lsh_vecs", sfDir))
    println(s"PROF bands rows=${bandsT.count()} files=" +
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(
          graft.ops.VectorSearch.storedTable("graft_lsh_bands", sfDir))))

    val batchRows = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .orderBy("q_id").limit(64).collect()
      .map(row => (row.getLong(0), row.getSeq[Float](1)))

    // sub-stage isolation: where in the probe job does the time go?
    {
      val batch = batchRows.toSeq.toDF("q_id", "qv")
      val qrows = batch.select(col("q_id"), col("qv"),
        graft.functions.lsh_band_vals(col("qv"), flat, 64, r, b).as("bv"))
        .collect()
      val sigLocal = qrows.toSeq.flatMap { qr =>
        qr.getSeq[Long](2).zipWithIndex.map { case (v, i) => (qr.getLong(0), i, v) }
      }
      val probeVals = sigLocal.map(_._3).distinct
      for (rep <- 1 to 3) {
        var t0 = System.nanoTime()
        val nScan = bandsT.filter(
          graft.functions.in_long_set(bandsT("band_val"), probeVals)).count()
        val tScan = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val nAll = bandsT.count()
        val tAll = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val joined = bandsT
          .filter(graft.functions.in_long_set(bandsT("band_val"), probeVals))
          .join(broadcast(sigLocal.toDF("q_id", "band_idx", "band_val")),
            Seq("band_idx", "band_val"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"))
        val nJoin = joined.count()
        val tJoin = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val nDist = joined.distinct().count()
        val tDist = (System.nanoTime() - t0) / 1e9
        println(f"PROF sub rep=$rep scanFiltered=$tScan%.3f ($nScan rows) " +
          f"scanAll=$tAll%.3f ($nAll) join=$tJoin%.3f ($nJoin) +distinct=$tDist%.3f ($nDist)")
      }
      // driver-vs-executor split: task time of the large-InSet count
      {
        val taskNs = new java.util.concurrent.atomic.AtomicLong(0)
        val nTasks = new java.util.concurrent.atomic.AtomicLong(0)
        val lst = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            taskNs.addAndGet(te.taskMetrics.executorRunTime * 1000000L)
            nTasks.incrementAndGet()
          }
        }
        spark.sparkContext.addSparkListener(lst)
        val t0 = System.nanoTime()
        bandsT.filter(
          graft.functions.in_long_set(bandsT("band_val"), probeVals)).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        spark.sparkContext.removeSparkListener(lst)
        println(f"PROF split wall=$wall%.3f taskSum=${taskNs.get / 1e9}%.3f tasks=${nTasks.get}")
      }
      // pushdown on/off and small-set probes to localize the cost
      for (rep <- 1 to 2) {
        spark.conf.set("spark.sql.parquet.filterPushdown", "false")
        var t0 = System.nanoTime()
        val nOff = bandsT.filter(
          graft.functions.in_long_set(bandsT("band_val"), probeVals)).count()
        val tOff = (System.nanoTime() - t0) / 1e9
        spark.conf.set("spark.sql.parquet.filterPushdown", "true")
        t0 = System.nanoTime()
        val nSmall = bandsT.filter(
          graft.functions.in_long_set(bandsT("band_val"), probeVals.take(10))).count()
        val tSmall = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val nCheap = bandsT.filter(col("band_val") % 1000000L === 7L).count()
        val tCheap = (System.nanoTime() - t0) / 1e9
        println(f"PROF iso rep=$rep pushdownOff=$tOff%.3f ($nOff) " +
          f"small10=$tSmall%.3f ($nSmall) cheapPred=$tCheap%.3f ($nCheap)")
      }
      val planQ = bandsT.filter(
        graft.functions.in_long_set(bandsT("band_val"), probeVals))
      planQ.count()
      println("PROF scan plan:\n" +
        planQ.queryExecution.executedPlan.toString().take(2500))
    }
    for (rep <- 1 to 3) {
      val batch = batchRows.toSeq.toDF("q_id", "qv")
      var t0 = System.nanoTime()
      val qrows = batch.select(col("q_id"), col("qv"),
        graft.functions.lsh_band_vals(col("qv"), flat, 64, r, b).as("bv"))
        .collect()
      val tSig = (System.nanoTime() - t0) / 1e9
      val sigLocal = qrows.toSeq.flatMap { qr =>
        qr.getSeq[Long](2).zipWithIndex.map { case (v, i) => (qr.getLong(0), i, v) }
      }
      val probeVals = sigLocal.map(_._3).distinct
      t0 = System.nanoTime()
      val candStage = bandsT
        .filter(graft.functions.in_long_set(bandsT("band_val"), probeVals))
        .join(broadcast(sigLocal.toDF("q_id", "band_idx", "band_val")),
          Seq("band_idx", "band_val"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"))
        .distinct()
      val candRows = candStage.collect()
      val tProbe = (System.nanoTime() - t0) / 1e9
      val qvOf = qrows.map(qr => qr.getLong(0) -> qr.getSeq[Float](1)).toMap
      val candIds = candRows.map(_.getLong(1)).distinct.toSeq
      t0 = System.nanoTime()
      val pairDf = candRows.toSeq
        .map(cr => (cr.getLong(0), cr.getLong(1), qvOf(cr.getLong(0))))
        .toDF("q_id", "vec_id", "qv")
      val n = broadcast(pairDf)
        .join(vecsT.filter(graft.functions.in_long_set(vecsT("vec_id"), candIds)), "vec_id")
        .select(col("q_id"), col("vec_id").as("c_id"),
          (lit(1000000L) - round(graft.functions.cosine_similarity(
            col("qv"), col("cv")) * 1000000.0).cast("long")).as("nd"))
        .filter(col("nd").isNotNull)
        .groupBy("q_id")
        .agg(graft.functions.top_k_min_pairs_distinct(col("nd"), col("c_id"), 10)
          .as("top"))
        .count()
      val tRescore = (System.nanoTime() - t0) / 1e9
      println(f"PROF rep=$rep sig=$tSig%.3f probe=$tProbe%.3f rescore=$tRescore%.3f " +
        f"sigRows=${sigLocal.size} probeVals=${probeVals.size} cands=${candRows.length} out=$n")
    }
    spark.stop()
  }
}
