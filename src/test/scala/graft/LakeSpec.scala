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
