package graft

import graft.ops.{NnGraph, VectorSearch}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** The NN-descent k-NN graph index ([[graft.ops.NnGraph]] /
  * `vs_nng_search`): recall floor at every SF, degree cap, plan shape
  * (no corpus cross product anywhere in build or search), and the
  * determinism the SQL oracle replay depends on.
  */
class NngSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  test("vs_nng_search clears the recall floor at sf0.001 / sf0.01 / sf0.1") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = SparkEntry.queries("vs_nng_search")(spark, dir).collect()
      assert(rows.nonEmpty)
      val ppm = rows.head.getAs[Long]("mean_recall_ppm")
      info(s"$dir mean_recall_ppm=$ppm")
      assert(rows.forall(_.getAs[Long]("below_floor") == 0L),
        s"$dir: mean recall $ppm ppm under floor ${VectorSearch.NngRecallFloorPpm}")
    }
  }

  test("build emits at most K ranked neighbors per node, none reflexive") {
    val qv = VectorSearch.int8Grid(spark, sf)
    val (g, _) = NnGraph.build(qv)
    val bad = g.filter(col("src") === col("dst")).count()
    assert(bad == 0L, s"$bad reflexive edges")
    val overK = g.groupBy("src").count()
      .filter(col("count") > NnGraph.K).count()
    assert(overK == 0L, s"$overK nodes over the degree cap")
  }

  test("tail plan no cartesian/BNL") {
    // SCOPE (r10 advice): Persist.stage localCheckpoints truncate
    // lineage, so this final-frame plan covers only the post-checkpoint
    // tail (the grade select). The build's internal joins are asserted
    // by the staged-plan audit test below, which sees every stage.
    val df = SparkEntry.queries("vs_nng_search")(spark, sf)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "NN-descent planned a cartesian product")
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      "NN-descent planned a broadcast nested loop join")
  }

  test("EVERY staged build plan is keyed — audited through the lineage cuts") {
    // The Persist plan audit records each staged frame's pre-AQE plan
    // at construction time, BEFORE the checkpoint hides it — so this
    // asserts the scaladoc's actual claim: no cartesian/BNL anywhere in
    // the NN-descent build (init scoring, every polish round). The
    // corpus frame is staged first, exactly as vsNngSearch does, so the
    // audit scope is the build itself (int8Grid's own bounded
    // 1-row-maxabs broadcast crossJoin is upstream of the cut and
    // documented). Search/grade stages keep their bounded broadcast
    // crossJoins (entries, exact baseline) and are NOT claimed BNL-free.
    val qv = graft.util.Persist.stage(
      VectorSearch.int8Grid(spark, sf), eager = false)
    graft.util.Persist.beginPlanAudit()
    // endPlanAudit in the finally (r12 advice): a throwing build must
    // not leave the audit switched on for every later stage; the
    // success path's second end() is a documented no-op.
    val plans =
      try { NnGraph.build(qv); graft.util.Persist.endPlanAudit() }
      finally graft.util.Persist.endPlanAudit()
    assert(plans.nonEmpty, "audit captured no staged plans")
    info(s"audited ${plans.size} staged build frames")
    assert(!plans.exists(_.contains("CartesianProduct")),
      "a staged build frame planned a cartesian product")
    assert(!plans.exists(_.contains("BroadcastNestedLoopJoin")),
      "a staged build frame planned a broadcast nested loop join")
  }

  test("init graph is mixer-random: no closed stride sublattice") {
    // The stride init froze at n=2000, K=24 (offsets all multiples of
    // 80 -> candidates never leave a 25-node coset). The mixer draw must
    // produce offsets spread over the whole id range.
    val qv = VectorSearch.int8Grid(spark, sf)
    val n = qv.count()
    val g0 = NnGraph.initGraph(qv, n)
    val distinctOffs = g0
      .select((((col("dst") - col("src")) % n) + n) % n).distinct().count()
    assert(distinctOffs > n / 4,
      s"init offsets collapsed to $distinctOffs distinct values for n=$n")
  }

  test("build is deterministic across invocations (oracle replay contract)") {
    val qv = VectorSearch.int8Grid(spark, sf)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("src", "dst").select("src", "dst", "d2")
        .collect().map(_.toSeq).toSeq
    assert(key(NnGraph.build(qv)._1) == key(NnGraph.build(qv)._1))
  }
}
