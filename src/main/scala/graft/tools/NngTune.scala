package graft.tools

import graft.ops.{NnGraph, VectorSearch}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Ad-hoc NN-descent geometry probe: for each (K, rounds, entries, beam,
  * hops) combo, print graph edge-recall (fraction of true top-K
  * neighbors present in the built graph) and end-to-end search
  * recall@5 — the measurements behind [[graft.ops.NnGraph]]'s constants.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.NngTune"
  */
object NngTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qv = graft.util.Persist.stage(VectorSearch.int8Grid(spark, sfDir))
    val combos: Seq[(Int, Int, Int, Int, Int)] =
      if (args.nonEmpty) args.map { a =>
        val Array(k, r, e, b, h) = a.split(",").map(_.toInt); (k, r, e, b, h)
      }.toSeq
      else Seq((16, 2, 8, 16, 4), (16, 3, 8, 16, 4), (16, 4, 8, 16, 4),
        (24, 3, 8, 16, 4), (16, 3, 8, 24, 6))
    for ((k, rounds, entries, beam, hops) <- combos) {
      val t0 = System.nanoTime()
      val (g0, init) = NnGraph.build(qv, k, rounds)
      val g = graft.util.Persist.stage(g0)
      // graph edge recall vs true top-k
      val wS = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
      val truek = qv.select(col("vec_id").as("src"), col("qd").as("aq"))
        .join(qv.select(col("vec_id").as("dst"), col("qd").as("bq")))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"), NnGraph.intD2(col("aq"), col("bq")).as("d2"))
        .withColumn("rn", row_number().over(wS)).filter(col("rn") <= k)
        .select("src", "dst")
      val gRec = truek.join(g.select("src", "dst").withColumn("hit", lit(1)),
          Seq("src", "dst"), "left")
        .agg(sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)))
        .head().getDouble(0)
      // search recall@5
      val qs = qv.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("qd").as("qq"))
      val wQ = Window.partitionBy("q_id").orderBy(col("d2"), col("c_id"))
      val approx = NnGraph.search(g, init, qv, qs, entries, beam, hops)
        .withColumn("rn", row_number().over(wQ)).filter(col("rn") <= 5)
        .select("q_id", "c_id")
      val exact = qv.crossJoin(broadcast(qs))
        .select(col("q_id"), col("vec_id").as("c_id"),
          NnGraph.intD2(col("qd"), col("qq")).as("d2"))
        .withColumn("rn", row_number().over(wQ)).filter(col("rn") <= 5)
        .select("q_id", "c_id")
      val sRec = exact.join(approx.withColumn("hit", lit(1)), Seq("q_id", "c_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)))
        .head().getDouble(0)
      println(f"NNGTUNE k=$k%d rounds=$rounds%d entries=$entries%d beam=$beam%d " +
        f"hops=$hops%d graph_recall=$gRec%.3f search_recall=$sRec%.3f " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
