package graft

import graft.util.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedAgg gives identical results to a direct aggregation") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(graft.util.Det.cents(col("value"))).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(ev, Seq(col("event_type")), 16, col("event_id"),
        Seq(count(lit(1)).as("n"), sum(graft.util.Det.cents(col("value"))).as("s")),
        Seq(sum("n").as("n"), sum("s").as("s")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedJoin gives identical results to a direct join") {
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val direct = ord.join(cust, "o_custkey").count()
    val salted = Skew.saltedJoin(ord, cust, "o_custkey", 8, col("o_orderkey")).count()
    assert(salted == direct)
  }
}
