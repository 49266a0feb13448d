package graft.tools

import graft.ops.NnGraph
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/** Unbalanced-merge measurement (r12, VERDICT r11 #6): `vs_nng_merge`
  * registers a 2:1 split, but production consolidation is a big base +
  * a small fresh segment. This replays the exact merge path (segment
  * builds → cross-segment chain seeds → dense_rank cut → one polish
  * round → union long links) at MERGE_MOD (default 20, i.e. a 19:1
  * split) and grades overall recall plus recall for queries drawn from
  * the SMALL segment — the rows whose reachability the cross-seed
  * budget must carry. Not registered. */
object MergeSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf1")
    val mod = sys.env.getOrElse("MERGE_MOD", "20").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qv = graft.util.Persist.stage(
      graft.ops.VectorSearch.int8Grid(spark, sfDir), eager = true)
    val ca = graft.util.Persist.stage(qv.filter(col("vec_id") % mod =!= 0), eager = false)
    val cb = graft.util.Persist.stage(qv.filter(col("vec_id") % mod === 0), eager = false)
    println(s"split mod=$mod: |A|=${ca.count()} |B|=${cb.count()}")
    val t0 = System.nanoTime()
    val (ga, initA) = NnGraph.build(ca)
    val (gb, initB) = NnGraph.build(cb)
    def inB(c: Column): Column = c % mod === 0
    val cross = NnGraph.seedGraph(qv).filter(inB(col("src")) =!= inB(col("dst")))
    val xh = NnGraph.score(cross, qv)
    println(s"cross-seed pairs: ${xh.count()}")
    val wSrc = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
    val mg0 = graft.util.Persist.stage(
      ga.unionByName(gb).unionByName(xh)
        .unionByName(xh.select(col("dst").as("src"), col("src").as("dst"), col("d2")))
        .withColumn("rn", dense_rank().over(wSrc)).filter(col("rn") <= NnGraph.K)
        .select("src", "dst", "d2"),
      eager = false)
    val merged = graft.util.Persist.stage(NnGraph.polishRound(mg0, qv), eager = true)
    merged.count()
    println(f"merge wall (incl. builds) ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // Queries: the registered rule plus a denser draw from segment B so
    // the small-segment recall has a real sample size.
    val qs = graft.util.Persist.stage(
      qv.filter(col("vec_id") % 100 === 7 ||
          (col("vec_id") % mod === 0 &&
            graft.util.Det.idiv(col("vec_id"), mod) % 10 === 7))
        .select(col("vec_id").as("q_id"), col("qd").as("qq")), eager = true)
    val wQ = Window.partitionBy("q_id").orderBy(col("d2"), col("c_id"))
    val exact = graft.util.Persist.stage(
      qv.crossJoin(broadcast(qs))
        .select(col("q_id"), col("vec_id").as("c_id"),
          NnGraph.intD2(col("qd"), col("qq")).as("d2"))
        .withColumn("rn", row_number().over(wQ))
        .filter(col("rn") <= NnGraph.TopK).select("q_id", "c_id"), eager = true)
    val v = NnGraph.search(merged, initA.unionByName(initB), qv, qs)
    val approx = v.withColumn("rn", row_number().over(wQ))
      .filter(col("rn") <= NnGraph.TopK).select("q_id", "c_id")
    val hit = exact.join(approx, Seq("q_id", "c_id"))
    def recall(pred: Column): String = {
      val h = hit.filter(pred).count(); val e = exact.filter(pred).count()
      f"${h.toDouble / e}%.4f ($h/$e)"
    }
    println(s"overall recall@5      = ${recall(lit(true))}")
    println(s"small-segment queries = ${recall(col("q_id") % mod === 0)}")
    println(s"big-segment queries   = ${recall(col("q_id") % mod =!= 0)}")
    spark.stop()
  }
}
