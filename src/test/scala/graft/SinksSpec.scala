package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  test("bucketed tables join with zero exchange (co-located sort-merge join)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    Sinks.writeBucketed(li, "li_b", "l_orderkey", 4)
    Sinks.writeBucketed(ord, "ord_b", "o_orderkey", 4)
    // hint("merge") forces SortMergeJoin (the shape a fact-fact join takes
    // at scale, where neither side broadcasts) — bucket co-location must
    // then eliminate the shuffle on both sides.
    val joined = Sinks.table(spark, "li_b").hint("merge")
      .join(Sinks.table(spark, "ord_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
  }

  test("partitioned writes prune to the matching partition directories") {
    val ev = Tables.events(spark, sf)
      .withColumn("day", expr("ts div 86400000000000"))
    val path = java.nio.file.Files.createTempDirectory("graft-part").toString
    Sinks.writePartitioned(ev, path, Seq("day"))
    val oneDay = spark.read.parquet(path).filter(col("day") === 19723)
    val scan = oneDay.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(day"), scan)
  }
}
