package graft.tools

import graft.ops.{NnGraph, VectorSearch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maintenance audit for vs_nng_delete: patched vs naive-drop recall
  * and the patch-candidate bound, at any delete rate (DEL_MOD env) —
  * the measurements in vsNngDelete's scaladoc (sf1: mod 40 → 0.885 vs
  * 0.879 with 117k candidates; mod 4 → 0.887 vs 0.835).
  *
  *   SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf1 DEL_MOD=4 \
  *     sbt "runMain graft.tools.NngDeleteAudit"
  */
object NngDeleteAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dmod = sys.env.getOrElse("DEL_MOD", VectorSearch.DeleteMod.toString).toLong
    val qv = graft.util.Persist.stage(VectorSearch.int8Grid(spark, sfDir), eager = true)
    val (refinedL, initL) = NnGraph.build(qv)
    val refined = graft.util.Persist.stage(refinedL, eager = true)
    val init = graft.util.Persist.stage(initL, eager = true)
    val sur = graft.util.Persist.stage(
      qv.filter(col("vec_id") % dmod =!= 0), eager = true)
    def vic(c: org.apache.spark.sql.Column) = c % dmod === 0
    val keep = refined.filter(!vic(col("src")) && !vic(col("dst")))
    val pc = refined.as("a").join(refined.as("b"), col("a.dst") === col("b.src"))
      .filter(!vic(col("a.src")) && vic(col("a.dst")) && !vic(col("b.dst")) &&
        col("a.src") =!= col("b.dst"))
      .select(col("a.src").as("src"), col("b.dst").as("dst")).distinct()
    println(s"DEL patch_candidates=${pc.count()}")
    val wS = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
    val patched = keep.unionByName(NnGraph.score(pc, sur))
      .withColumn("rn", dense_rank().over(wS)).filter(col("rn") <= NnGraph.K)
      .select("src", "dst", "d2")
    val initSur = init.filter(!vic(col("src")) && !vic(col("dst")))
    val qsDel = graft.util.Persist.stage(
      sur.filter(col("vec_id") % 100 === 5)
        .select(col("vec_id").as("q_id"), col("qd").as("qq")), eager = true)
    val wQ = Window.partitionBy("q_id").orderBy(col("d2"), col("c_id"))
    val exact = graft.util.Persist.stage(
      sur.crossJoin(broadcast(qsDel))
        .select(col("q_id"), col("vec_id").as("c_id"),
          NnGraph.intD2(col("qd"), col("qq")).as("d2"))
        .withColumn("rn", row_number().over(wQ))
        .filter(col("rn") <= NnGraph.TopK).select("q_id", "c_id"), eager = true)
    def grade(graph: org.apache.spark.sql.DataFrame): Long = {
      val approx = NnGraph.search(graph, initSur, sur, qsDel)
        .withColumn("rn", row_number().over(wQ))
        .filter(col("rn") <= NnGraph.TopK).select("q_id", "c_id")
      val g = exact.join(approx.withColumn("hit", lit(1L)), Seq("q_id", "c_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))), count(lit(1))).head()
      1000000L * g.getLong(0) / g.getLong(1)
    }
    println(s"DEL naive_ppm=${grade(keep)}")
    println(s"DEL patched_ppm=${grade(patched)}")
    spark.stop()
  }
}
