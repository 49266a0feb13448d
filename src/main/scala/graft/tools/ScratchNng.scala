package graft.tools

import graft.ops.NnGraph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway geometry sweep for vs_nng_search. Not registered. */
object ScratchNng {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val rounds = sys.env.getOrElse("NNG_ROUNDS", "3").toInt
    val s = sys.env.getOrElse("NNG_S", "16").toInt

    val qv = graft.util.Persist.stage(
      graft.ops.VectorSearch.int8Grid(spark, sfDir), eager = true)
    val n = qv.count()
    println(s"corpus n=$n rounds=$rounds S=$s")

    val tB0 = System.nanoTime()
    val (graphL, initL) = NnGraph.build(qv, rounds = rounds, sampleS = s)
    val graph = graft.util.Persist.stage(graphL, eager = true)
    val init = graft.util.Persist.stage(initL, eager = true)
    graph.count(); init.count()
    println(f"build wall=${(System.nanoTime() - tB0) / 1e9}%.2f s")

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
    exact.count()

    // edge recall: fraction of true 16-NN edges present in the graph
    if (sys.env.get("NNG_EDGE_RECALL").contains("1")) {
      val wS = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
      val trueNN = qv.as("a").crossJoin(qv.as("b"))
        .filter(col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
          NnGraph.intD2(col("a.qd"), col("b.qd")).as("d2"))
        .withColumn("rn", row_number().over(wS))
        .filter(col("rn") <= NnGraph.K).select("src", "dst")
      val er = trueNN.join(graph.select("src", "dst").withColumn("hit", lit(1L)),
          Seq("src", "dst"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("h"), count(lit(1)).as("n")).head()
      println(f"edge_recall_ppm=${1000000L * er.getLong(0) / er.getLong(1)}")
    }

    val combos = Seq(
      // (entries, beam, hops)
      (NnGraph.Entries, NnGraph.Beam, NnGraph.Hops))
    for ((entries, beam, hops) <- combos) {
      val t0 = System.nanoTime()
      val approx = NnGraph.search(graph, init, qv, qs, entries, beam, hops)
        .withColumn("rn", row_number().over(wQ))
        .filter(col("rn") <= NnGraph.TopK).select("q_id", "c_id")
      val graded = exact.join(approx.withColumn("hit", lit(1L)), Seq("q_id", "c_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("h"), count(lit(1)).as("n")).head()
      val ppm = 1000000L * graded.getLong(0) / graded.getLong(1)
      println(f"COMBO entries=$entries beam=$beam hops=$hops " +
        f"recall_ppm=$ppm search_wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
