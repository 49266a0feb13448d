package graft.tools
import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for registered queries to
  * files — the plan evidence for optimization rounds
  * (plans/rNN/<query>_before.txt / _after.txt).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ExplainFmt plans/r19 _before q1 q2 ..."
  */
object ExplainFmt {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainFmt <outDir> <suffix> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (q <- args.drop(2)) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"$q$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explain] wrote $q$suffix (${txt.length} chars)")
    }
    spark.stop()
  }
}
