package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints the physical plan of registered queries (plan-shape audits). */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (q <- args) {
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
