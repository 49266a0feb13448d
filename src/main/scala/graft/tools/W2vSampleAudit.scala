package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the Word2Vec FIT stage full-corpus vs sample-trained on one
  * dir — the evidence behind `ingestTextW2v(sampleMod)`'s scaladoc
  * numbers. Fit is the serial (numPartitions=1) stage; transform is
  * map-only and common to both. */
object W2vSampleAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    docs.count() // warm the scan
    for (mod <- Seq(1L, 4L, 1L, 4L)) {
      val t0 = System.nanoTime()
      val store = graft.VectorStore.ingestTextW2v(docs, "doc_id", "text",
        sampleMod = mod)
      val n = store.df.count()
      println(f"W2V $dir sampleMod=$mod rows=$n total=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
