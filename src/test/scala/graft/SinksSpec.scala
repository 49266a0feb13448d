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

  test("csv, json, and orc round-trip the documents table with explicit schemas") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "source", "n_chars")
    val schema = docs.schema
    val base = java.nio.file.Files.createTempDirectory("graft-src").toString
    docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    docs.write.mode("overwrite").json(s"$base/json")
    Sinks.writeOrc(docs, s"$base/orc")
    val fromCsv = Sinks.readCsv(spark, s"$base/csv", schema)
    val fromJson = Sinks.readJson(spark, s"$base/json", schema)
    val fromOrc = Sinks.readOrc(spark, s"$base/orc", schema)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).map(_.mkString("|")).sorted.toSeq
    assert(canon(fromCsv) == canon(docs))
    assert(canon(fromJson) == canon(docs))
    assert(canon(fromOrc) == canon(docs))
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
