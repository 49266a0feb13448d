package graft.ops

import graft.Tables
import graft.util.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-ish relational operator suite.
  *
  * Demonstrates the general query engine the reference delegates to
  * Postgres (reference: sea-orm query builder, src/main.rs:86-96 filters/
  * order/limit) — re-expressed as declarative DataFrame plans so Catalyst
  * does pushdown, pruning, join planning; AQE handles runtime re-planning.
  *
  * Oracle parity: money math in exact integer cents (see
  * [[graft.util.Det]]), all outputs totally ordered by their keys.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Q1: pricing summary. Scan → filter (pushed to parquet) → partial
    * agg → final agg. At 100 TB: map-side combine on LONG sums; no
    * shuffle beyond the 6-group exchange. */
  def q1Agg: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"), col("l_shipdate"))
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_base_c"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_c"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge_c"),
        count(lit(1)).as("n"))
      .withColumn("avg_price_c", floor(col("sum_base_c") / col("n")).cast("long"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String = s"""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c,
      CAST(SUM(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_c,
      CAST(SUM(${centsSql("l_extendedprice" + "*(1-l_discount)")}) AS BIGINT) AS sum_disc_c,
      CAST(SUM(${centsSql("l_extendedprice" + "*(1-l_discount)*(1+l_tax)")}) AS BIGINT) AS sum_charge_c,
      COUNT(*) AS n,
      CAST(floor(CAST(SUM(${centsSql("l_extendedprice")}) AS BIGINT) / COUNT(*)) AS BIGINT) AS avg_price_c
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1Agg)

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql)
}
