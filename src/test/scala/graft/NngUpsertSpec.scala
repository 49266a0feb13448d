package graft

import graft.ops.{NnGraph, VectorSearch}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-incremental graph-index maintenance (`vs_nng_upsert`): recall
  * floor at every SF, the repair step's measured necessity, structural
  * invariants of the updated adjacency, and plan shape.
  */
class NngUpsertSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  test("vs_nng_upsert clears the recall floor at sf0.001 / sf0.01 / sf0.1") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = SparkEntry.queries("vs_nng_upsert")(spark, dir).collect()
      assert(rows.nonEmpty)
      val ppm = rows.head.getAs[Long]("mean_recall_ppm")
      info(s"$dir mean_recall_ppm=$ppm")
      assert(rows.forall(_.getAs[Long]("below_floor") == 0L),
        s"$dir: mean recall $ppm ppm under floor ${VectorSearch.NngRecallFloorPpm}")
    }
  }

  test("reverse repair is load-bearing: unrepaired graph grades strictly worse") {
    // Same pipeline minus the repair merge: the new nodes keep only
    // their outbound k-NN edges plus whatever base init long-links
    // happen to land on them — no NEAR inbound edges for greedy
    // routing to follow. Measured gap grows with corpus: 0.95 vs 1.0
    // at sf0.1 here, 0.637 (below floor) vs 0.835 at sf1.
    val dir = "/root/testdata/sf0.1"
    val qv = VectorSearch.int8Grid(spark, dir)
    val base = qv.filter(col("vec_id") % VectorSearch.UpsertMod =!= 0)
    val (refined, init) = NnGraph.build(base)
    val qsNew = qv.filter(col("vec_id") % VectorSearch.UpsertMod === 0)
      .select(col("vec_id").as("q_id"), col("qd").as("qq"))
    val wQ = Window.partitionBy("q_id").orderBy(col("d2"), col("c_id"))
    val newEdges = NnGraph.search(refined, init, base, qsNew,
        NnGraph.PlaceEntries, NnGraph.PlaceBeam, NnGraph.PlaceHops)
      .withColumn("rn", row_number().over(wQ))
      .filter(col("rn") <= NnGraph.K)
      .select(col("q_id").as("src"), col("c_id").as("dst"), col("d2"))
    val exact = qv.crossJoin(broadcast(qsNew))
      .select(col("q_id"), col("vec_id").as("c_id"),
        NnGraph.intD2(col("qd"), col("qq")).as("d2"))
      .withColumn("rn", row_number().over(wQ))
      .filter(col("rn") <= NnGraph.TopK).select("q_id", "c_id")
    def ppm(graph: org.apache.spark.sql.DataFrame): Long = {
      val approx = NnGraph.search(graph, init, qv, qsNew, entrySource = Some(base))
        .withColumn("rn", row_number().over(wQ))
        .filter(col("rn") <= NnGraph.TopK).select("q_id", "c_id")
      val g = exact.join(approx.withColumn("hit", lit(1L)), Seq("q_id", "c_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))), count(lit(1))).head()
      1000000L * g.getLong(0) / g.getLong(1)
    }
    val unrepairedPpm = ppm(refined.unionByName(newEdges))
    val wS = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
    val repaired = refined.unionByName(
        newEdges.select(col("dst").as("src"), col("src").as("dst"), col("d2")))
      .withColumn("rn", row_number().over(wS)).filter(col("rn") <= NnGraph.K)
      .select("src", "dst", "d2")
    val repairedPpm = ppm(repaired.unionByName(newEdges))
    info(s"unrepaired=$unrepairedPpm repaired=$repairedPpm")
    assert(repairedPpm == 1000000L, s"repaired recall $repairedPpm at sf0.1")
    assert(unrepairedPpm < repairedPpm,
      s"repair bought nothing: $unrepairedPpm vs $repairedPpm")
  }

  test("updated adjacency: degree cap holds, placement lands only in base") {
    val dir = "/root/testdata/sf0.01"
    val qv = VectorSearch.int8Grid(spark, dir)
    val base = qv.filter(col("vec_id") % VectorSearch.UpsertMod =!= 0)
    val (refined, init) = NnGraph.build(base)
    val qsNew = qv.filter(col("vec_id") % VectorSearch.UpsertMod === 0)
      .select(col("vec_id").as("q_id"), col("qd").as("qq"))
    val wQ = Window.partitionBy("q_id").orderBy(col("d2"), col("c_id"))
    val wS = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
    val newEdges = NnGraph.search(refined, init, base, qsNew,
        NnGraph.PlaceEntries, NnGraph.PlaceBeam, NnGraph.PlaceHops)
      .withColumn("rn", row_number().over(wQ))
      .filter(col("rn") <= NnGraph.K)
      .select(col("q_id").as("src"), col("c_id").as("dst"), col("d2"))
    // placement edges must point exclusively into the base index
    assert(newEdges.filter(col("dst") % VectorSearch.UpsertMod === 0).count() == 0L,
      "placement produced an edge to a not-yet-indexed batch id")
    // every batch node got a full K placement list (search visited
    // enough of the base corpus)
    val short = newEdges.groupBy("src").count()
      .filter(col("count") =!= NnGraph.K).count()
    assert(short == 0L, s"$short batch nodes without K placement edges")
    val repaired = refined.unionByName(
        newEdges.select(col("dst").as("src"), col("src").as("dst"), col("d2")))
      .withColumn("rn", row_number().over(wS)).filter(col("rn") <= NnGraph.K)
      .select("src", "dst", "d2")
    val overK = repaired.unionByName(newEdges).groupBy("src").count()
      .filter(col("count") > NnGraph.K).count()
    assert(overK == 0L, s"$overK nodes over the degree cap after repair")
    // repair actually landed: some base nodes now point at batch ids
    val inbound = repaired.filter(col("dst") % VectorSearch.UpsertMod === 0)
      .select("dst").distinct().count()
    info(s"batch nodes with near inbound edges: $inbound of ${qsNew.count()}")
    assert(inbound > 0L, "no reverse edge survived the repair merge")
  }

  // SCOPE: Persist.stage lineage cuts mean this covers the post-
  // checkpoint tail; the staged-plan audit test in NngSpec covers the
  // shared build's internal stages (r10 advice).
  test("upsert tail plan no cartesian/BNL") {
    val df = SparkEntry.queries("vs_nng_upsert")(spark, sf)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "upsert planned a cartesian product")
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      "upsert planned a broadcast nested loop join")
  }
}
