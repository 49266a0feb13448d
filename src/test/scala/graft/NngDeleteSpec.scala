package graft

import graft.ops.{NnGraph, VectorSearch}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tombstone deletion with patch-through repair (`vs_nng_delete`):
  * recall floor at every SF, deletion cleanliness, the patch-candidate
  * bound and restored degree invariants, and plan shape.
  */
class NngDeleteSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  test("vs_nng_delete clears the recall floor at sf0.001 / sf0.01 / sf0.1") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = SparkEntry.queries("vs_nng_delete")(spark, dir).collect()
      assert(rows.nonEmpty)
      val ppm = rows.head.getAs[Long]("mean_recall_ppm")
      info(s"$dir mean_recall_ppm=$ppm")
      assert(rows.forall(_.getAs[Long]("below_floor") == 0L),
        s"$dir: mean recall $ppm ppm under floor ${VectorSearch.NngRecallFloorPpm}")
    }
  }

  test("deleted ids can never surface: visited set is victim-free") {
    // Cleanliness is by construction (candidate scoring inner-joins the
    // survivor corpus); this guards the construction against refactors.
    val dir = "/root/testdata/sf0.01"
    val qv = VectorSearch.int8Grid(spark, dir)
    val (refined, init) = NnGraph.build(qv)
    def vic(c: org.apache.spark.sql.Column) = c % VectorSearch.DeleteMod === 0
    val sur = qv.filter(!vic(col("vec_id")))
    val keep = refined.filter(!vic(col("src")) && !vic(col("dst")))
    val initSur = init.filter(!vic(col("src")) && !vic(col("dst")))
    val qsDel = sur.filter(col("vec_id") % 100 === 5)
      .select(col("vec_id").as("q_id"), col("qd").as("qq"))
    val visited = NnGraph.search(keep, initSur, sur, qsDel)
    assert(visited.filter(vic(col("c_id"))).count() == 0L,
      "a deleted id appeared in the search's visited set")
  }

  test("patch candidates are bounded and the repair restores full-K adjacency") {
    val dir = "/root/testdata/sf0.01"
    val qv = VectorSearch.int8Grid(spark, dir)
    val (refined, _) = NnGraph.build(qv)
    def vic(c: org.apache.spark.sql.Column) = c % VectorSearch.DeleteMod === 0
    val sur = qv.filter(!vic(col("vec_id")))
    val nVic = qv.filter(vic(col("vec_id"))).count()
    val keep = refined.filter(!vic(col("src")) && !vic(col("dst")))
    // The production candidate frame (victim fan-in capped at K nearest
    // in-edges): the |victims|*K^2 bound is by construction — K capped
    // in-edges x <=K out-edges per victim. The UNCAPPED frame violates
    // it (r10 measured 3458 > 3328 here: victim in-degree is unbounded),
    // which is exactly the hub-delete skew blowup the cap exists for.
    val pc = VectorSearch.nngPatchCandidates(refined)
    val nPc = pc.count()
    info(s"victims=$nVic patch_candidates=$nPc bound=${nVic * NnGraph.K * NnGraph.K}")
    assert(nPc <= nVic * NnGraph.K * NnGraph.K,
      s"patch candidates $nPc exceed the |victims|*K^2 bound")
    val wS = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
    val patched = keep.unionByName(NnGraph.score(pc, sur))
      .withColumn("rn", dense_rank().over(wS)).filter(col("rn") <= NnGraph.K)
      .select("src", "dst", "d2")
    // dense_rank can keep duplicate rows of an edge that is both kept
    // and re-proposed — degree is DISTINCT neighbors, capped at K
    val overK = patched.groupBy("src")
      .agg(countDistinct("dst").as("deg"))
      .filter(col("deg") > NnGraph.K).count()
    assert(overK == 0L, s"$overK survivors over the degree cap after patching")
    // survivors that LOST a victim edge and have patch candidates end
    // back at a full K list
    val lost = refined.filter(!vic(col("src")) && vic(col("dst")))
      .select("src").distinct()
    val refilled = lost.join(
        patched.groupBy("src").agg(countDistinct("dst").as("deg")), "src")
      .filter(col("deg") === NnGraph.K).count()
    info(s"survivors that lost edges: ${lost.count()}, back at full K: $refilled")
    assert(refilled > 0L, "no damaged survivor was refilled to a full K list")
  }

  // SCOPE: Persist.stage lineage cuts mean this covers the post-
  // checkpoint tail; the staged-plan audit test in NngSpec covers the
  // shared build's internal stages (r10 advice).
  test("delete tail plan no cartesian/BNL") {
    val df = SparkEntry.queries("vs_nng_delete")(spark, sf)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "delete planned a cartesian product")
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      "delete planned a broadcast nested loop join")
  }
}
