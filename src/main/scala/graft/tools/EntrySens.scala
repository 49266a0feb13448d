package graft.tools

import graft.ops.NnGraph
import graft.util.Det
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Entry-set sensitivity measurement (r12): on the isotropic corpus the
  * search recall depends on WHICH fixed entry set the walk starts from —
  * this sweeps several hash-coin salts plus the legacy first-k rule over
  * ONE shared graph build and prints recall@5 per rule, so the scaladoc
  * claim about the entry lottery's magnitude is a measured number. Not
  * registered; run with SPARK_GRAFT_SF_DIR. */
object EntrySens {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qv = graft.util.Persist.stage(
      graft.ops.VectorSearch.int8Grid(spark, sfDir), eager = true)
    val n = qv.count()
    val (graphL, initL) = NnGraph.build(qv)
    val graph = graft.util.Persist.stage(graphL, eager = true)
    val init = graft.util.Persist.stage(initL, eager = true)
    graph.count(); init.count()
    println(s"corpus n=$n, graph built")

    val qs = graft.util.Persist.stage(
      qv.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("qd").as("qq")), eager = true)
    val wQ = Window.partitionBy("q_id").orderBy(col("d2"), col("c_id"))
    val exact = graft.util.Persist.stage(
      qv.crossJoin(broadcast(qs))
        .select(col("q_id"), col("vec_id").as("c_id"),
          NnGraph.intD2(col("qd"), col("qq")).as("d2"))
        .withColumn("rn", row_number().over(wQ))
        .filter(col("rn") <= NnGraph.TopK).select("q_id", "c_id"), eager = true)
    val nExact = exact.count()

    def grade(name: String, ent: DataFrame): Unit = {
      val v = NnGraph.search(graph, init, qv, qs,
        entrySource = Some(ent))
      val approx = v.withColumn("rn", row_number().over(wQ))
        .filter(col("rn") <= NnGraph.TopK).select("q_id", "c_id")
      val hits = exact.join(approx, Seq("q_id", "c_id")).count()
      println(f"entry rule $name%-12s recall@5 = ${hits.toDouble / nExact}%.4f ($hits/$nExact)")
    }

    // Production rule (salt 0) replays inside search(); variants pre-cut
    // the corpus to 256 rows under a salted rank — search's internal
    // rank then passes any 256-row source through unchanged.
    grade("prod(salt0)", qv)
    for (salt <- Seq(1L, 2L, 3L, 4L)) {
      val ent = qv
        .orderBy(Det.hashCoin(col("vec_id") + lit(salt * 97L)), col("vec_id"))
        .limit(NnGraph.Entries)
      grade(s"salt$salt", ent)
    }
    grade("legacy(id<k)", qv.filter(col("vec_id") < NnGraph.Entries))
    spark.stop()
  }
}
