package graft.tools

import graft.ops.{NnGraph, VectorSearch}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Phase timing for vs_nng_search: grid / build / search / grade. */
object NngProfile {
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
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      def lap(what: String): Unit = {
        println(f"NNGPROF rep$rep $what%s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
      }
      val qv = graft.util.Persist.stage(VectorSearch.int8Grid(spark, sfDir))
      qv.count(); lap("grid")
      val (g, init) = NnGraph.build(qv)
      val gs = graft.util.Persist.stage(g)
      gs.count(); lap("build")
      val qs = qv.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("qd").as("qq"))
      val v = NnGraph.search(gs, init, qv, qs)
      v.count(); lap("search")
    }
    spark.stop()
  }
}
