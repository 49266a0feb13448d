package graft.ops

import graft.Tables
import graft.util.Det._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Q3: shipping-priority style 3-way join + top-10 revenue.
    * Catalyst/AQE picks broadcast for the segment-filtered customer side
    * when small; at 100 TB both sides shuffle on the join key and AQE
    * re-plans at runtime — no hand scheduling. */
  def q3JoinTopk: Q = (spark, dir) => {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15")))
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
      .filter(col("l_shipdate") > to_timestamp(lit("1998-03-15")))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"), col("revenue_c"))
      .orderBy(col("revenue_c").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3JoinTopkSql: String = s"""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      CAST(SUM(${centsSql("l_extendedprice*(1-l_discount)")}) AS BIGINT) AS revenue_c
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue_c DESC, o_orderkey LIMIT 10"""

  /** Q4: EXISTS semi-join (left_semi — no row duplication, early out). */
  def q4Semijoin: Q = (spark, dir) => {
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    val bigLines = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey")
    ord.join(bigLines, ord("o_orderkey") === bigLines("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  val q4SemijoinSql: String = """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Q5: 5-way star join — revenue by nation for one region. Dims
    * (region, nation, supplier) broadcast; fact joins shuffle with AQE. */
  def q5Multijoin: Q = (spark, dir) => {
    val reg = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey") &&
        cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
      .orderBy(col("revenue_c").desc, col("n_name"))
  }

  val q5MultijoinSql: String = s"""
    SELECT n_name,
      CAST(SUM(${centsSql("l_extendedprice*(1-l_discount)")}) AS BIGINT) AS revenue_c
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name ORDER BY revenue_c DESC, n_name"""

  /** Q7: window functions — monthly revenue per supplier with rank and
    * running total. One shuffle on l_suppkey serves both windows. */
  def q7Window: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val monthly = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        date_trunc("month", col("l_shipdate")).cast("date").as("month"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_c"))
      .groupBy("l_suppkey", "month")
      .agg(sum("rev_c").as("rev_c"))
    val bySupp = Window.partitionBy("l_suppkey")
    monthly
      .withColumn("rev_rank",
        rank().over(bySupp.orderBy(col("rev_c").desc, col("month"))))
      .withColumn("running_c",
        sum("rev_c").over(bySupp.orderBy("month")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rev_rank") <= 3)
      .orderBy("l_suppkey", "month")
  }

  val q7WindowSql: String = s"""
    WITH monthly AS (
      SELECT l_suppkey, CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        CAST(SUM(${centsSql("l_extendedprice*(1-l_discount)")}) AS BIGINT) AS rev_c
      FROM lineitem GROUP BY 1, 2)
    SELECT l_suppkey, month, rev_c,
      rank() OVER (PARTITION BY l_suppkey ORDER BY rev_c DESC, month) AS rev_rank,
      CAST(SUM(rev_c) OVER (PARTITION BY l_suppkey ORDER BY month
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
    FROM monthly
    QUALIFY rev_rank <= 3
    ORDER BY l_suppkey, month"""

  /** Q8: ROLLUP multi-level aggregate (partial aggregation per level). */
  def q8Rollup: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus", "l_quantity")
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"),
        count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  val q8RollupSql: String = s"""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c,
      COUNT(*) AS n,
      CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus"""

  /** Q9: NOT EXISTS anti-join — customers with no very large order. */
  def q9Antijoin: Q = (spark, dir) => {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_acctbal")
    val big = Tables.orders(spark, dir)
      .select("o_custkey", "o_totalprice")
      .filter(col("o_totalprice") > 450000)
      .select("o_custkey")
    cust.join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), cents(col("c_acctbal")).as("acctbal_c"))
      .orderBy("c_custkey")
  }

  val q9AntijoinSql: String = s"""
    SELECT c_custkey, c_name, ${centsSql("c_acctbal")} AS acctbal_c
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    ORDER BY c_custkey"""

  /** Q10: per-group top-N via one window shuffle on the group key. */
  def q10TopnGroup: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_c"), col("rn"))
      .orderBy("c_mktsegment", "rn")
  }

  val q10TopnGroupSql: String = s"""
    SELECT c_mktsegment, o_orderkey, ${centsSql("o_totalprice")} AS price_c,
      row_number() OVER (PARTITION BY c_mktsegment
        ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders JOIN customer ON o_custkey = c_custkey
    QUALIFY rn <= 3
    ORDER BY c_mktsegment, rn"""

  /** Q11: correlated scalar subquery — customers whose balance exceeds
    * 5% of their own average order value (exact integer predicate). Spark expresses the decorrelated
    * form directly (aggregate + join) — the plan Catalyst rewrites a
    * correlated subquery into anyway; the oracle keeps the correlated
    * SQL shape to prove semantic equivalence. */
  def q11CorrSubquery: Q = (spark, dir) => {
    val perCust = Tables.orders(spark, dir)
      .select(col("o_custkey"), cents(col("o_totalprice")).as("p_c"))
      .groupBy("o_custkey")
      .agg(floor(sum("p_c") / count(lit(1))).cast("long").as("avg_order_c"),
        count(lit(1)).as("n_orders"))
    Tables.customer(spark, dir).select(col("c_custkey"), cents(col("c_acctbal")).as("acctbal_c"))
      .join(perCust, col("c_custkey") === col("o_custkey"))
      .filter(col("acctbal_c") * 20 > col("avg_order_c"))
      .select("c_custkey", "acctbal_c", "avg_order_c", "n_orders")
      .orderBy("c_custkey")
  }
  val q11CorrSubquerySql: String = s"""
    SELECT c_custkey, ${centsSql("c_acctbal")} AS acctbal_c,
      (SELECT CAST(floor(SUM(${centsSql("o_totalprice")}) / COUNT(*)) AS BIGINT)
       FROM orders WHERE o_custkey = c_custkey) AS avg_order_c,
      (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
    FROM customer
    WHERE ${centsSql("c_acctbal")} * 20 >
      (SELECT CAST(floor(SUM(${centsSql("o_totalprice")}) / COUNT(*)) AS BIGINT)
       FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey"""

  /** Q12: pivot — order counts and cent volumes cross-tabulated
    * status × priority. Spark's `pivot` with an EXPLICIT value list — no
    * extra job to discover distinct pivot values (an implicit pivot runs
    * a collect first). Compiles to the two-level aggregate shape: a
    * map-side-combined aggregate on (status, priority) collapses the
    * corpus to |statuses × priorities| rows, then the pivot aggregate
    * rotates those few rows — both exchanges carry aggregate rows only.
    * The oracle is the equivalent conditional aggregation. */
  final val Priorities = Seq(
    "1-URGENT" -> "p1", "2-HIGH" -> "p2", "3-MEDIUM" -> "p3",
    "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5")
  def q12Pivot: Q = (spark, dir) => {
    val piv = Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        cents(col("o_totalprice")).as("p_c"))
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", Priorities.map(_._1))
      .agg(count(lit(1)).as("n"), sum("p_c").as("sum_c"))
    piv.select(col("o_orderstatus") +: Priorities.flatMap { case (v, short) =>
      Seq(coalesce(col(s"`${v}_n`"), lit(0L)).as(s"${short}_n"),
        coalesce(col(s"`${v}_sum_c`"), lit(0L)).as(s"${short}_sum_c"))
    }: _*).orderBy("o_orderstatus")
  }
  val q12PivotSql: String = {
    val cols = Priorities.map { case (v, short) =>
      s"""CAST(SUM(CASE WHEN o_orderpriority = '$v' THEN 1 ELSE 0 END) AS BIGINT) AS ${short}_n,
      CAST(SUM(CASE WHEN o_orderpriority = '$v' THEN ${centsSql("o_totalprice")} ELSE 0 END) AS BIGINT) AS ${short}_sum_c"""
    }.mkString(",\n      ")
    s"""
    SELECT o_orderstatus,
      $cols
    FROM orders GROUP BY 1 ORDER BY o_orderstatus"""
  }

  /** Q13: GROUPING SETS over two *independent* dimensions — the
    * multi-dimensional report shape that rollup/cube can't express
    * (rollup is the nested-prefix special case, see [[q8Rollup]]).
    * Spark plans one scan + one Expand (each row is replicated once per
    * grouping set with the non-member columns nulled) feeding a single
    * hash aggregate — partial aggregation still applies per set, so the
    * exchange carries |flags|+|statuses| rows, not the corpus. Ordering
    * by grouping_id first keeps NULL placement irrelevant (within a gid
    * each grouping column is all-null or all-non-null), sidestepping the
    * Spark NULLS FIRST / DuckDB NULLS LAST default mismatch. */
  def q13GroupingSets: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus", "l_extendedprice")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(cents(col("l_extendedprice"))).as("sum_price_c"),
        count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }
  val q13GroupingSetsSql: String = s"""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_price_c,
      COUNT(*) AS n,
      CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    ORDER BY gid, l_returnflag, l_linestatus"""

  /** Q14: exact distributed percentiles (median + p90) per group, in
    * integer cents — the "exact quantile without a sketch" shape, via
    * the TWO-PASS BUCKETED RANK (the pattern proven in pipeline_pack):
    * l_returnflag has only a handful of distinct values, so a
    * row_number window partitioned by it sorts millions of rows per
    * task and scales superlinearly (6.2× time for 10× data at sf1).
    * Instead: (A) bucket values by `p_c div 16384` and hash-aggregate
    * (group, bucket) counts — map-side combined, the shuffle carries
    * only |groups|·|buckets| rows; a window over THAT tiny frame gives
    * each bucket's exclusive prefix and the group total n, from which
    * the rank positions lo=(n+1)÷2, hi=n÷2+1, p90=⌈9n/10⌉ locate their
    * containing buckets. (B) a broadcast semi-join narrows the corpus
    * to those ≤3 buckets per group, and row_number within (group,
    * bucket) — now thousands of rows, not millions — plus the prefix
    * offset reconstructs the exact global rank. Ties share a bucket
    * (the bucket is a function of the value), so value-at-rank stays
    * order-independent. Median is emitted doubled (med2_c =
    * val[lo]+val[hi]) to stay in BIGINT. At 100 TB: two scans, both
    * shuffles bounded (histogram frame / target-bucket rows only), no
    * full per-group sort anywhere; bucket width would be picked from a
    * coarse first-pass histogram instead of a constant. */
  def q14Median: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val BucketW = 16384L
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), cents(col("l_extendedprice")).as("p_c"))
      .withColumn("bkt", idiv(col("p_c"), BucketW))
    val counts = li.groupBy("l_returnflag", "bkt").agg(count(lit(1)).as("cnt"))
    val wPre = Window.partitionBy("l_returnflag").orderBy("bkt")
    val pre = counts
      .withColumn("cum", sum("cnt").over(wPre))
      .withColumn("pfx", col("cum") - col("cnt"))
      .withColumn("n", sum("cnt").over(Window.partitionBy("l_returnflag")))
      .withColumn("lo", idiv(col("n") + 1, 2L))
      .withColumn("hi", idiv(col("n"), 2L) + 1)
      .withColumn("p90", idiv(col("n") * 9 + 9, 10L))
    val inBkt = (r: Column) => r > col("pfx") && r <= col("cum")
    val targets = pre
      .filter(inBkt(col("lo")) or inBkt(col("hi")) or inBkt(col("p90")))
      .select("l_returnflag", "bkt", "pfx", "n", "lo", "hi", "p90")
    val wB = Window.partitionBy("l_returnflag", "bkt").orderBy("p_c")
    val ranked = li.join(broadcast(targets), Seq("l_returnflag", "bkt"))
      .withColumn("rn", col("pfx") + row_number().over(wB).cast("long"))
      .filter(col("rn") === col("lo") or col("rn") === col("hi") or col("rn") === col("p90"))
    ranked.groupBy("l_returnflag")
      .agg(max("n").as("n"),
        (sum(when(col("rn") === col("lo"), col("p_c")).otherwise(0L)) +
          sum(when(col("rn") === col("hi"), col("p_c")).otherwise(0L))).as("med2_c"),
        max(when(col("rn") === col("p90"), col("p_c"))).as("p90_c"))
      .orderBy("l_returnflag")
  }
  val q14MedianSql: String = s"""
    WITH r AS (
      SELECT l_returnflag, ${centsSql("l_extendedprice")} AS p_c,
        CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY ${centsSql("l_extendedprice")}) AS BIGINT) AS rn,
        COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem)
    SELECT l_returnflag, MAX(n) AS n,
      CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN p_c ELSE 0 END)
         + SUM(CASE WHEN rn = n // 2 + 1 THEN p_c ELSE 0 END) AS BIGINT) AS med2_c,
      CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN p_c END) AS BIGINT) AS p90_c
    FROM r
    WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1 OR rn = (9 * n + 9) // 10
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  /** Q15: set operations — INTERSECT and EXCEPT compile to (null-safe)
    * semi/anti hash joins on the deduplicated key sets, not sorts.
    * Segments: customers with an URGENT order ∩ customers with a HIGH
    * order, minus customers holding any order above 500k — the audience-
    * segmentation shape. Each leg is a filtered projection of the same
    * orders scan; the final count is exact. */
  def q15Setops: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderpriority"), col("o_totalprice"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val high = o.filter(col("o_orderpriority") === "2-HIGH").select("o_custkey")
    val big = o.filter(col("o_totalprice") > 500000).select("o_custkey")
    urgent.intersect(high).except(big)
      .agg(count(lit(1)).as("n_custs"), sum("o_custkey").as("key_sum"))
  }
  val q15SetopsSql: String = """
    WITH seg AS (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_totalprice > 500000)
    SELECT COUNT(*) AS n_custs, CAST(SUM(o_custkey) AS BIGINT) AS key_sum FROM seg"""

  /** Q16: unpivot/melt — the inverse of [[q12Pivot]], via
    * `Dataset.unpivot` (one Expand node: each aggregate row is
    * replicated once per measure — no join, no shuffle beyond the
    * upstream 3-group aggregate). Wide per-flag totals become the long
    * (flag, measure, value) form that generic reporting/plotting
    * consumers want. */
  def q16Unpivot: Q = (spark, dir) => {
    val wide = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .groupBy("l_returnflag")
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_price_c"),
        count(lit(1)).as("n_rows"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty_c"), col("sum_price_c"), col("n_rows")),
        "measure", "value")
      .orderBy("l_returnflag", "measure")
  }
  val q16UnpivotSql: String = s"""
    WITH wide AS (
      SELECT l_returnflag,
        CAST(SUM(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c,
        CAST(SUM(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_price_c,
        COUNT(*) AS n_rows
      FROM lineitem GROUP BY 1)
    SELECT l_returnflag, measure, value FROM (
      SELECT l_returnflag, 'sum_qty_c' AS measure, sum_qty_c AS value FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_price_c', sum_price_c FROM wide
      UNION ALL
      SELECT l_returnflag, 'n_rows', n_rows FROM wide)
    ORDER BY l_returnflag, measure"""

  // ── q17_cube — CUBE over status × priority (all 4 grouping sets) ─────
  /** CUBE = every subset of the two dimensions in one pass — completes
    * the multi-level-aggregate trio (ROLLUP q8, GROUPING SETS q13). One
    * scan + Expand(4 sets) + a single partially-aggregated hash
    * aggregate: the Expand multiplies rows ×4 BEFORE the exchange, but
    * map-side partial aggregation collapses each set to its |keys|
    * partials per map partition, so the shuffle carries O(sets ·
    * |status×priority|) rows however large the fact table. `gid` keys
    * the output rows so NULL-as-total and NULL-as-value can never
    * collide in the compare. */
  def q17Cube: Q = (spark, dir) => {
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        cents(col("o_totalprice")).as("p_c"))
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("p_c").as("sum_c"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
  }
  val q17CubeSql: String = s"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS sum_c,
      CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus, o_orderpriority"""

  /** Q18 (large-volume orders): HAVING over a fact aggregate BEFORE any
    * join — the per-order quantity total is map-side combined and the
    * >threshold survivors are a tiny frame, so the joins back to orders
    * and customer see only qualifying keys (AQE broadcasts the survivor
    * side). The anti-pattern this avoids at 100 TB is joining first and
    * aggregating the multiplied rows. */
  final val Q18MinQtyC = 25000L // 250.00 in cents
  def q18Having: Q = (spark, dir) => {
    val big = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity")
      .groupBy("l_orderkey")
      .agg(sum(cents(col("l_quantity"))).as("total_qty_c"))
      .filter(col("total_qty_c") > Q18MinQtyC)
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name")
    big.join(ord, big("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        cents(col("o_totalprice")).as("o_totalprice_c"), col("total_qty_c"))
      .orderBy(col("total_qty_c").desc, col("o_orderkey"))
      .limit(20)
  }
  val q18HavingSql: String = s"""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(${centsSql("l_quantity")}) AS BIGINT) AS total_qty_c
      FROM lineitem GROUP BY 1 HAVING SUM(${centsSql("l_quantity")}) > $Q18MinQtyC)
    SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      ${centsSql("o_totalprice")} AS o_totalprice_c, total_qty_c
    FROM big JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty_c DESC, o_orderkey LIMIT 20"""

  /** Q19 (disjunctive predicate revenue): the OR-of-ANDs shape that
    * exercises CNF extraction — Catalyst pulls the common `p_partkey =
    * l_partkey` out and pushes the brand/size IN-bounds into the part
    * scan, so the join never sees a cartesian and the fact side filters
    * on quantity before joining. One scalar output row, exact cents. */
  def q19Disjunctive: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val pred =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#22" && col("p_size").between(1, 30) &&
        col("l_quantity").between(10, 35)) ||
      (col("p_brand") === "Brand#33" && col("p_size").between(1, 45) &&
        col("l_quantity").between(20, 50))
    li.join(part, li("l_partkey") === part("p_partkey"))
      .filter(pred)
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_c"),
        count(lit(1)).as("n"))
  }
  val q19DisjunctiveSql: String = s"""
    SELECT CAST(SUM(${centsSql("l_extendedprice*(1-l_discount)")}) AS BIGINT) AS revenue_c,
      COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 30
            AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 45
            AND l_quantity BETWEEN 20 AND 50)"""

  /** Q20 (nested-aggregate semijoin): suppliers whose shipped STANDARD-
    * part quantity exceeds the all-supplier average of that same
    * quantity — an aggregate filtered by an aggregate over itself. The
    * per-supplier frame is computed ONCE and staged; the average is a
    * 1-row broadcast onto it (never a self-join of the fact); the
    * surviving keys semijoin the supplier dim. Integer threshold: the
    * exact-cents mean as `floor(sum/n)`. */
  def q20NestedSemijoin: Q = (spark, dir) => {
    val std = Tables.part(spark, dir)
      .select("p_partkey", "p_type").filter(col("p_type") === "STANDARD")
      .select("p_partkey")
    val perSupp = graft.util.Persist.stage(
      Tables.lineitem(spark, dir)
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(std, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(sum(cents(col("l_quantity"))).as("qty_c")),
      eager = false)
    val avg = perSupp.agg(
      floor(sum("qty_c") / count(lit(1))).cast("long").as("avg_c"))
    val winners = perSupp.crossJoin(broadcast(avg))
      .filter(col("qty_c") > col("avg_c"))
      .select("l_suppkey", "qty_c")
    Tables.supplier(spark, dir).select("s_suppkey", "s_name")
      .join(winners, col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("qty_c"))
      .orderBy("s_suppkey")
  }
  val q20NestedSemijoinSql: String = s"""
    WITH ps AS (
      SELECT l_suppkey, CAST(SUM(${centsSql("l_quantity")}) AS BIGINT) AS qty_c
      FROM lineitem
      WHERE EXISTS (SELECT 1 FROM part
                    WHERE p_partkey = l_partkey AND p_type = 'STANDARD')
      GROUP BY 1),
    a AS (SELECT CAST(floor(SUM(qty_c) / COUNT(*)) AS BIGINT) AS avg_c FROM ps)
    SELECT s_suppkey, s_name, qty_c
    FROM supplier JOIN ps ON l_suppkey = s_suppkey, a
    WHERE qty_c > avg_c
    ORDER BY s_suppkey"""

  /** Q22 (above-average-balance customers with no pending orders): a scalar aggregate
    * subquery (the global positive-balance mean, exact-cents floor) used
    * as a filter, then an anti-join against orders — the combined
    * shape TPC-H saves for last. The mean is a 1-row broadcast onto the
    * customer scan (never a self-join); the anti-join shuffles only the
    * above-mean survivors. Per-nation report in exact cents. */
  def q22AntijoinSubquery: Q = (spark, dir) => {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), cents(col("c_acctbal")).as("bal_c"))
    val avg = cust.filter(col("bal_c") > 0)
      .agg(floor(sum("bal_c") / count(lit(1))).cast("long").as("avg_c"))
    val rich = cust.crossJoin(broadcast(avg)).filter(col("bal_c") > col("avg_c"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "P").select("o_custkey")
    rich.join(ord, rich("c_custkey") === ord("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"), sum("bal_c").as("sum_bal_c"))
      .orderBy("c_nationkey")
  }
  val q22AntijoinSubquerySql: String = s"""
    WITH c AS (SELECT c_custkey, c_nationkey,
        ${centsSql("c_acctbal")} AS bal_c FROM customer),
    a AS (SELECT CAST(floor(SUM(bal_c) / COUNT(*)) AS BIGINT) AS avg_c
      FROM c WHERE bal_c > 0)
    SELECT c_nationkey, COUNT(*) AS n_cust,
      CAST(SUM(bal_c) AS BIGINT) AS sum_bal_c
    FROM c, a
    WHERE bal_c > avg_c
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    GROUP BY 1 ORDER BY c_nationkey"""

  /** Q2 (min-cost supplier, adapted — no partsupp table in this corpus):
    * for every size-15 part, the cheapest unit price any supplier has
    * shipped it at (integer milli-cents: floor(price_c·100/qty_c)), and
    * the smallest suppkey achieving that minimum, with the supplier's
    * nation. The correlated-min subquery becomes ONE aggregate to
    * per-(part,supplier) grain + a window MIN over the already-reduced
    * frame — the fact is never self-joined; part and supplier dims
    * broadcast onto the survivors. */
  def q2MinCost: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val p15 = Tables.part(spark, dir)
      .filter(col("p_size") === 15).select("p_partkey", "p_brand")
    val perPS = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        cents(col("l_extendedprice")).as("ep_c"), cents(col("l_quantity")).as("q_c"))
      .join(broadcast(p15), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), col("l_suppkey"),
        floor(col("ep_c") * lit(100) / col("q_c")).cast("long").as("unit_mc"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("unit_mc").as("unit_mc"))
    val w = Window.partitionBy("l_partkey")
    val best = perPS
      .withColumn("min_mc", min("unit_mc").over(w))
      .filter(col("unit_mc") === col("min_mc"))
      .groupBy("l_partkey")
      .agg(min("l_suppkey").as("s_suppkey"), min("min_mc").as("min_unit_mc"))
    best
      .join(broadcast(p15), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name", "s_nationkey")),
        Seq("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("l_partkey").as("p_partkey"), col("p_brand"),
        col("min_unit_mc"), col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("p_partkey")
  }
  val q2MinCostSql: String = s"""
    WITH p15 AS (SELECT p_partkey, p_brand FROM part WHERE p_size = 15),
    ps AS (
      SELECT l_partkey, l_suppkey,
        MIN(CAST(floor(${centsSql("l_extendedprice")} * 100.0
                       / ${centsSql("l_quantity")}) AS BIGINT)) AS unit_mc
      FROM lineitem
      WHERE EXISTS (SELECT 1 FROM p15 WHERE p_partkey = l_partkey)
      GROUP BY 1, 2),
    best AS (
      SELECT l_partkey, MIN(l_suppkey) AS s_suppkey, MIN(min_mc) AS min_unit_mc
      FROM (SELECT l_partkey, l_suppkey, unit_mc,
              MIN(unit_mc) OVER (PARTITION BY l_partkey) AS min_mc
            FROM ps)
      WHERE unit_mc = min_mc GROUP BY 1)
    SELECT b.l_partkey AS p_partkey, p.p_brand, b.min_unit_mc,
      b.s_suppkey, s.s_name, n.n_name
    FROM best b
    JOIN p15 p ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY p_partkey"""

  /** Q6 (forecasting revenue delta): the canonical single-scan
    * filter-aggregate — every predicate (ship year, discount band,
    * quantity cap) pushes to the parquet scan, the projection prunes to
    * 4 columns, and the aggregate is one map-side-combined LONG sum.
    * The simplest query in the family, kept as the pushdown showcase
    * (PlanShapeSpec asserts the PushedFilters). */
  def q6FilterAgg: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .select("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-01-01")) &&
        cents(col("l_discount")).between(5, 7) && col("l_quantity") < 24)
      .agg(sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_c"),
        count(lit(1)).as("n"))
  }
  val q6FilterAggSql: String = s"""
    SELECT CAST(SUM(${centsSql("l_extendedprice*l_discount")}) AS BIGINT) AS revenue_c,
      COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND ${centsSql("l_discount")} BETWEEN 5 AND 7
      AND l_quantity < 24"""

  /** Q21 (suppliers who kept waiting orders, adapted lateness = shipped
    * >60 days after the order date): count, per supplier, the
    * multi-supplier orders where THIS supplier shipped late and no other
    * supplier did — TPC-H's EXISTS + NOT-EXISTS double correlation.
    * Shape: ONE pass reduces the fact to per-(order,supplier) grain with
    * a late flag, per-order supplier/late-supplier counts come from a
    * second aggregate of that same reduced frame, and the two re-join
    * co-partitioned on orderkey — the raw fact is never self-joined.
    * Top-20 by wait count (suppkey tie-break) via TakeOrderedAndProject. */
  def q21LateSuppliers: Q = (spark, dir) => {
    val lateSec = 60L * 86400L
    val perOS = graft.util.Persist.stage(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max((col("l_shipdate").cast("long") >
          col("o_orderdate").cast("long") + lateSec).cast("int")).as("late")),
      eager = false)
    val perOrder = perOS.groupBy(col("l_orderkey").as("okey"))
      .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"))
    perOS.filter(col("late") === 1)
      .join(perOrder, col("l_orderkey") === col("okey"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey")).limit(20)
  }
  val q21LateSuppliersSql: String = s"""
    WITH os AS (
      SELECT l_orderkey, l_suppkey,
        MAX(CASE WHEN epoch(l_shipdate) > epoch(o_orderdate) + 60*86400
                 THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1, 2),
    po AS (SELECT l_orderkey AS okey, COUNT(*) AS n_supp,
        SUM(late) AS n_late FROM os GROUP BY 1)
    SELECT s_suppkey, s_name, COUNT(*) AS numwait
    FROM os JOIN po ON okey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE late = 1 AND n_supp > 1 AND n_late = 1
    GROUP BY 1, 2
    ORDER BY numwait DESC, s_suppkey LIMIT 20"""

  // ── q23_bloom_semijoin — Bloom runtime-filter + exact semi-join ──────
  final val BloomBits = 131072L // sized for the build side: m ≈ 10·n keys
  final val BloomP = 1000000007L
  final val BloomHashes: Seq[(Long, Long)] =
    Seq((2654435761L, 3L), (2246822519L, 11L), (3266489917L, 19L))

  /** The runtime-filter pattern made explicit (what Spark's own
    * `spark.sql.optimizer.runtime.bloomFilter` injects, and every
    * warehouse's RF does): the small build side (urgent orders) is
    * summarized into a [[BloomBits]]-bit Bloom filter built
    * DISTRIBUTED (distinct bit positions via an aggregate — bounded
    * ≤ m·k rows), collected as index-sized driver state (like the IVF
    * centroids) and PACKED into 64-bit words, so each probe-side
    * membership test is one O(1) element_at + bitwise AND (an
    * array_contains over the raw bit list would be O(m) per row — a
    * first cut measured 3.5 s at sf0.1 from exactly that); the probe
    * side is pre-filtered with k such codegen'd tests BEFORE the
    * shuffle, and the exact semi-join removes the false positives. No
    * false negatives (Bloom guarantee) → the result equals the plain
    * semi-join, which IS the oracle. m must scale with the build side
    * (a saturated filter prunes nothing): 2^17 bits ≈ right for the
    * 10^4-key build here; production RFs size m ≈ 10·n at runtime.
    * Integer hashes, u reduced mod p before the multiply (the
    * [[Events]] count-min overflow rule). */
  private def bloomBits(u: Column): Seq[Column] = BloomHashes.map { case (a, b) =>
    pmod(pmod(pmod(u, lit(BloomP)) * a + b, lit(BloomP)), lit(BloomBits))
  }
  private[graft] def bloomPrefiltered(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bits = urgent
      .select(explode(array(bloomBits(col("o_orderkey")): _*)).as("bit"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long]((BloomBits / 64).toInt)
    bits.foreach(bit => words((bit >> 6).toInt) |= 1L << (bit & 63))
    val wordsL = typedlit(words.toSeq)
    def hit(h: Column): Column =
      (element_at(wordsL, idiv(h, 64L).cast("int") + 1)
        .bitwiseAND(shl(lit(1L), (h % 64L).cast("int"))) =!= 0L)
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .filter(bloomBits(col("l_orderkey")).map(hit).reduce(_ && _))
  }
  def q23BloomSemijoin: Q = (spark, dir) => {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    bloomPrefiltered(spark, dir)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .agg(count(lit(1)).as("n"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_c"))
  }
  val q23BloomSemijoinSql: String = s"""
    SELECT COUNT(*) AS n,
      CAST(SUM(${centsSql("l_extendedprice*(1-l_discount)")}) AS BIGINT) AS revenue_c
    FROM lineitem
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_orderkey = l_orderkey
                    AND o_orderpriority = '1-URGENT')"""

  val queries: Map[String, Q] = Map(
    "q17_cube" -> q17Cube,
    "q18_having" -> q18Having,
    "q23_bloom_semijoin" -> q23BloomSemijoin,
    "q2_min_cost" -> q2MinCost,
    "q6_filter_agg" -> q6FilterAgg,
    "q21_late_suppliers" -> q21LateSuppliers,
    "q22_antijoin_subquery" -> q22AntijoinSubquery,
    "q19_disjunctive" -> q19Disjunctive,
    "q20_nested_semijoin" -> q20NestedSemijoin,
    "q16_unpivot" -> q16Unpivot,
    "q14_median" -> q14Median,
    "q15_setops" -> q15Setops,
    "q1_agg" -> q1Agg,
    "q12_pivot" -> q12Pivot,
    "q13_grouping_sets" -> q13GroupingSets,
    "q11_corr_subquery" -> q11CorrSubquery,
    "q3_join_topk" -> q3JoinTopk,
    "q4_semijoin" -> q4Semijoin,
    "q5_multijoin" -> q5Multijoin,
    "q7_window" -> q7Window,
    "q8_rollup" -> q8Rollup,
    "q9_antijoin" -> q9Antijoin,
    "q10_topn_group" -> q10TopnGroup)

  val oracles: Map[String, String] = Map(
    "q17_cube" -> q17CubeSql,
    "q18_having" -> q18HavingSql,
    "q23_bloom_semijoin" -> q23BloomSemijoinSql,
    "q2_min_cost" -> q2MinCostSql,
    "q6_filter_agg" -> q6FilterAggSql,
    "q21_late_suppliers" -> q21LateSuppliersSql,
    "q22_antijoin_subquery" -> q22AntijoinSubquerySql,
    "q19_disjunctive" -> q19DisjunctiveSql,
    "q20_nested_semijoin" -> q20NestedSemijoinSql,
    "q16_unpivot" -> q16UnpivotSql,
    "q14_median" -> q14MedianSql,
    "q15_setops" -> q15SetopsSql,
    "q1_agg" -> q1AggSql,
    "q12_pivot" -> q12PivotSql,
    "q13_grouping_sets" -> q13GroupingSetsSql,
    "q11_corr_subquery" -> q11CorrSubquerySql,
    "q3_join_topk" -> q3JoinTopkSql,
    "q4_semijoin" -> q4SemijoinSql,
    "q5_multijoin" -> q5MultijoinSql,
    "q7_window" -> q7WindowSql,
    "q8_rollup" -> q8RollupSql,
    "q9_antijoin" -> q9AntijoinSql,
    "q10_topn_group" -> q10TopnGroupSql)
}
