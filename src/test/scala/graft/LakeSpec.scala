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

  test("lake_analyze: exact stats match direct computation; KMV estimate inside error bound") {
    val rows = Lake.lakeAnalyze(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows.size == 5)
    def direct(df: org.apache.spark.sql.DataFrame, c: String) = {
      val vs = df.select(col(c).cast("long")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0)))
      (vs.length.toLong, vs.count(_.isEmpty).toLong,
        vs.flatten.distinct.length.toLong, vs.flatten.min, vs.flatten.max)
    }
    val li = Tables.lineitem(spark, sf)
    val checks = Seq(
      "lineitem.l_orderkey" -> direct(li, "l_orderkey"),
      "lineitem.l_suppkey" -> direct(li, "l_suppkey"),
      "orders.o_custkey" -> direct(Tables.orders(spark, sf), "o_custkey"))
    checks.foreach { case (name, (n, nn, ndv, mn, mx)) =>
      val r = rows(name)
      assert(r.getAs[Long]("n_rows") == n, name)
      assert(r.getAs[Long]("n_null") == nn, name)
      assert(r.getAs[Long]("ndv_exact") == ndv, name)
      assert(r.getAs[Long]("min_v") == mn && r.getAs[Long]("max_v") == mx, name)
    }
    // KMV estimator: exact below k, else within 4 sigma (sigma ~ 1/sqrt(k)
    // ~ 12.5% at k=64) of the true NDV — loose enough to never flake,
    // tight enough that a broken estimator (off by 2x) fails
    rows.values.foreach { r =>
      val exact = r.getAs[Long]("ndv_exact")
      val est = r.getAs[Long]("ndv_kmv")
      if (exact < Lake.AnalyzeKmvK) assert(est == exact, s"below k must be exact: $r")
      else assert(math.abs(est - exact).toDouble / exact <= 0.5,
        s"KMV estimate $est vs exact $exact out of bound")
    }
  }

  test("lake_cdc: snapshot diff equals the driver-side diff and never shuffles") {
    val out = Lake.lakeCdc(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // plan shape: the diff join over the two bucketed snapshots is a
    // SortMergeJoin with zero shuffle exchange below it (the final
    // orderBy adds a range exchange ABOVE the join — assert on the join
    // subtree only).
    val smj = flatten(out.queryExecution.executedPlan)
      .collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected SortMergeJoin in:\n${out.queryExecution.executedPlan}")
    assert(!flatten(smj.get).exists(_.isInstanceOf[ShuffleExchangeLike]),
      s"snapshot-diff join must not shuffle either side:\n${smj.get}")
    // semantics: replay the diff driver-side from the raw table + rules
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
        Det.cents(col("o_totalprice")).as("price_c")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val v1 = base.map(t => t._1 -> (t._2, t._3)).toMap
    val v2 = (base.filter(_._1 % 11 != 0).map { case (k, s, p) =>
        if (k % 7 == 0) k -> (("U", p + 10000L)) else k -> ((s, p))
      } ++ base.filter(_._1 % 13 == 0).map { case (k, _, p) => (-k - 1) -> (("N", p)) }).toMap
    val want = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    (v1.keySet ++ v2.keySet).foreach { k =>
      (v1.get(k), v2.get(k)) match {
        case (None, Some((s, p))) => want += ((k, "insert", s, p))
        case (Some((s, p)), None) => want += ((k, "delete", s, p))
        case (Some(a), Some(b)) if a != b =>
          want += ((k, "update_pre", a._1, a._2)); want += ((k, "update_post", b._1, b._2))
        case _ => ()
      }
    }
    val got = rows.map(r => (r.getAs[Long]("o_orderkey"), r.getAs[String]("change_type"),
      r.getAs[String]("o_orderstatus"), r.getAs[Long]("price_c"))).toSeq.sorted
    assert(got == want.toSeq.sorted)
    // all four change types occur at this SF
    assert(got.map(_._2).toSet ==
      Set("insert", "delete", "update_pre", "update_post"))
  }
}
