package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone driver for the serving-rate harnesses (the blocks Bench
  * appends to its JSON) so a serve-side change can be measured without
  * paying the full sweep:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ServeProbe lsh ivf"
  */
object ServeProbe {
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
    val which =
      if (args.isEmpty) Seq("lsh", "ivf", "lsh_pruned", "ivf_pruned") else args.toSeq
    val harnesses = Map(
      "ivf" -> (graft.streaming.Streaming.serveIvfRate _),
      "lsh" -> (graft.streaming.Streaming.serveLshRate _),
      "ivf_pruned" -> (graft.streaming.Streaming.serveIvfRatePruned _),
      "lsh_pruned" -> (graft.streaming.Streaming.serveLshRatePruned _),
      "lsh_warm" -> (graft.streaming.Streaming.serveLshRateWarm _))
    for (name <- which; run <- harnesses.get(name)) {
      val lats = run(spark, sfDir, 8, 64)
      val sorted = lats.sorted
      val p50 = sorted(sorted.size / 2)
      val p95 = sorted(((sorted.size - 1) * 95) / 100)
      println(f"SERVE $name p50=$p50%.3f s p95=$p95%.3f s qps=${8 * 64 / lats.sum}%.1f " +
        s"lats=${lats.map(l => f"$l%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
