package graft

import graft.ops.Lake
import graft.util.Det
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

class LakeSpec extends SparkSpec {

  // Unwrap AQE wrapper nodes (AdaptiveSparkPlanExec holds its final plan
  // in executedPlan, QueryStageExec holds its subtree in .plan — neither
  // exposes them via children) so plan-shape assertions see the real
  // operators.
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  test("bucketed join runs as a SortMergeJoin with zero shuffle exchange") {
    val join = Lake.bucketedJoinFrame(spark, sf)
    // collect() executes THIS Dataset's QueryExecution, so the adaptive
    // plan below is the final post-AQE plan (a writer.save() would plan
    // and execute a separate QueryExecution and leave this one initial).
    join.collect()
    val nodes = flatten(join.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      s"expected SortMergeJoin in:\n${join.queryExecution.executedPlan}")
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeLike]),
      s"bucketed join must not shuffle either side:\n${join.queryExecution.executedPlan}")
  }

  test("partitioned scan prunes to exactly one day directory") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val out = Lake.lakePartitionedScan(spark, sf)
    out.collect()
    val scans = flatten(out.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
      .filter(_.relation.location.rootPaths.exists(
        _.toString.contains("events_by_day")))
    assert(scans.nonEmpty, s"no partitioned scan in:\n${out.queryExecution.executedPlan}")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, "day filter not applied as a partition filter")
    // the whole layout has ~30 day directories; the pruned scan reads 1
    val totalDays = Lake.partitionedEvents(spark).select("day").distinct().count()
    assert(totalDays > 1)
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).length == 1,
      s"expected 1 selected day partition of $totalDays")
  }

  test("lake_format_roundtrip: CSV, JSON, and ORC copies are lossless vs parquet") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("r_name"), r.getAs[Long]("n_nations"),
        r.getAs[Long]("n_suppliers"), r.getAs[String]("first_supplier"))
    val got = Lake.lakeFormatRoundtrip(spark, sf).collect().map(key).toSeq
    val plain = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(spark, sf).select("s_suppkey", "s_name", "s_nationkey"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("r_name")
      .agg(countDistinct(col("n_nationkey")).as("n_nations"),
        count(lit(1)).as("n_suppliers"), min("s_name").as("first_supplier"))
      .orderBy("r_name")
      .collect().map(key).toSeq
    assert(got.nonEmpty && got == plain)
  }

  test("lake_bucketed_join equals the same join + aggregate over plain parquet") {
    val got = Lake.lakeBucketedJoin(spark, sf).collect()
      .map(r => (r.getAs[String]("o_orderpriority"),
        r.getAs[Long]("n_items"), r.getAs[Long]("revenue_c"))).toSeq
    val plain = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(Det.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_c"))
      .orderBy("o_orderpriority")
      .collect()
      .map(r => (r.getAs[String]("o_orderpriority"),
        r.getAs[Long]("n_items"), r.getAs[Long]("revenue_c"))).toSeq
    assert(got.nonEmpty && got == plain)
  }
}
