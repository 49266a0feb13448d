package graft

import org.apache.spark.sql.SparkSession

/** One-stop session builder with graft's recommended configuration:
  * functions injected via [[GraftExtensions]], AQE with skew-join
  * handling, UTC session time, and the parquet nanos escape hatch the
  * events table needs. Local sizing defaults match the test rig; on a
  * cluster, pass the master/shuffle settings your deployment uses.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 0): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (shufflePartitions > 0) b.config("spark.sql.shuffle.partitions", shufflePartitions)
    else b
  }
}
