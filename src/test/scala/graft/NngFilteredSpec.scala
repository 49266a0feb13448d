package graft

import graft.ops.{NnGraph, VectorSearch}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Predicate-filtered search on the graph index (`vs_nng_filtered`):
  * recall floor at every SF, predicate cleanliness, both escalation
  * rules live (count at small SF, mixed at sf0.1), and plan shape.
  */
class NngFilteredSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  private def pass(dir: String) =
    Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
      .filter(col("label") === 7)
      .join(Tables.documents(spark, dir).filter(col("lang") === "de")
        .select(col("doc_id")), col("vec_id") === col("doc_id"))
      .select("vec_id")

  test("vs_nng_filtered clears the recall floor at sf0.001 / sf0.01 / sf0.1") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = SparkEntry.queries("vs_nng_filtered")(spark, dir).collect()
      assert(rows.nonEmpty)
      val ppm = rows.head.getAs[Long]("mean_recall_ppm")
      info(s"$dir mean_recall_ppm=$ppm")
      assert(rows.forall(_.getAs[Long]("below_floor") == 0L),
        s"$dir: mean recall $ppm ppm under floor ${VectorSearch.NngRecallFloorPpm}")
    }
  }

  test("the adaptive grade denominators follow the filtered corpus") {
    // sf0.01's filtered corpus is 4 rows < TopK: n_exact must be 4 for
    // every query (exact top-k adapts), never padded to 5.
    val dir = "/root/testdata/sf0.01"
    val nPass = pass(dir).count()
    assert(nPass == 4L, s"predicate drifted: expected 4 passing rows, got $nPass")
    val rows = SparkEntry.queries("vs_nng_filtered")(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("n_exact") == nPass),
      "n_exact must equal the filtered-corpus size when it is under TopK")
  }

  test("escalation rules: all-escalate at sf0.01, genuinely mixed at sf0.1") {
    // Reconstruct the production deficiency census (same frames the op
    // builds) and pin the regimes the constants were tuned on: at
    // sf0.01 the 4-row pool makes every query escalate via the COUNT
    // rule; at sf0.1 pools straddle the threshold so SOME but not ALL
    // queries escalate — both branches execute in one graded run.
    def census(dir: String): (Long, Long) = {
      val qv = VectorSearch.int8Grid(spark, dir)
      val (refined, init) = NnGraph.buildShared(qv, s"$dir#full")
      val p = pass(dir)
      val nPass = p.count()
      val qs = qv.filter(col("vec_id") % 100 === 3)
        .select(col("vec_id").as("q_id"), col("qd").as("qq"))
      val counts = qs.select("q_id").join(
          NnGraph.search(refined, init, qv, qs)
            .join(p.select(col("vec_id").as("c_id")), "c_id")
            .groupBy("q_id").agg(countDistinct("c_id").as("n_surv")),
          Seq("q_id"), "left")
        .select(coalesce(col("n_surv"), lit(0L)).as("n_surv"))
      val coverageLive = nPass <= VectorSearch.FilterCoverageCap
      val deficient = counts.filter(
        col("n_surv") < VectorSearch.FilterMinSurvivors ||
          (lit(coverageLive) && col("n_surv") * 2L < nPass)).count()
      (counts.count(), deficient)
    }
    val (q01, d01) = census("/root/testdata/sf0.01")
    info(s"sf0.01 queries=$q01 deficient=$d01")
    assert(d01 == q01, "every sf0.01 query should escalate (4-row pool)")
    val (q1, d1) = census("/root/testdata/sf0.1")
    info(s"sf0.1 queries=$q1 deficient=$d1")
    assert(d1 > 0L, "no sf0.1 query escalated — the escalation path is dead")
    assert(d1 < q1, "every sf0.1 query escalated — the base-pass path is dead")
  }

  test("every graded candidate passes the predicate (cleanliness by construction)") {
    // The survivor frames inner-join `pass`, so a non-passing id cannot
    // be graded; this guards that construction against refactors by
    // re-running the op's survivor pipeline and checking the top-5.
    val dir = "/root/testdata/sf0.1"
    val qv = VectorSearch.int8Grid(spark, dir)
    val (refined, init) = NnGraph.buildShared(qv, s"$dir#full")
    val p = pass(dir)
    val qs = qv.filter(col("vec_id") % 100 === 3)
      .select(col("vec_id").as("q_id"), col("qd").as("qq"))
    val surv = NnGraph.search(refined, init, qv, qs,
        NnGraph.Entries, NnGraph.EscBeam, NnGraph.EscHops)
      .join(p.select(col("vec_id").as("c_id")), "c_id")
      .select("q_id", "c_id")
    val offenders = surv.join(p.select(col("vec_id").as("c_id")), Seq("c_id"),
      "left_anti").count()
    assert(offenders == 0L, s"$offenders graded candidates fail the predicate")
  }

  test("filtered plan no cartesian/BNL — every join is keyed") {
    val df = SparkEntry.queries("vs_nng_filtered")(spark, sf)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "filtered search planned a cartesian product")
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      "filtered search planned a broadcast nested loop join")
  }
}
