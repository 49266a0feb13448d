package graft.tools

import graft.ops.VectorSearch
import org.apache.spark.sql.SparkSession

/** Measures `vs_nng_merge` against the from-scratch alternative on one
  * dir: the merged index's graded recall + wall vs `vs_nng_search`
  * (one full build over the union). The merge claim — from-scratch
  * recall within noise at lower cost — is set from this output. */
object NngMergeAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (key <- Seq("vs_nng_merge", "vs_nng_search", "vs_nng_merge")) {
      val t0 = System.nanoTime()
      val head = VectorSearch.queries(key)(spark, dir)
        .select("mean_recall_ppm", "below_floor").head()
      println(f"MERGE-AUDIT $dir $key recall_ppm=${head.getLong(0)} " +
        f"below_floor=${head.getLong(1)} wall=${(System.nanoTime() - t0) / 1e9}%.1f s" +
        " (first wall of each key includes its builds; buildShared memoizes within the session)")
    }
    spark.stop()
  }
}
