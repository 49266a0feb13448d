package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.Row

/** The three-arm cost-based router (`vs_planned_route`): the cost rule's
  * routing at real sizes, all three arms driven through cost overrides,
  * the brute arm's exactness, and the index arms' grading sanity.
  */
class PlannedRouteSpec extends SparkSpec {

  private def byPred(rows: Array[Row]): Map[String, (String, Long, Long)] =
    rows.groupBy(_.getAs[String]("pred")).map { case (p, rs) =>
      p -> ((rs.head.getAs[String]("plan"), rs.head.getAs[Long]("n_pass"),
        rs.head.getAs[Long]("n_est")))
    }

  test("real costs at sf0.001: thin predicates brute, fat predicate IVF") {
    val m = byPred(SparkEntry.queries("vs_planned_route")(spark, sf).collect())
    assert(m("p1_thin")._1 == "brute" && m("p2_tiny")._1 == "brute")
    assert(m("p3_fat")._1 == "ivf",
      s"fat predicate should cross the IVF cost at n=500: $m")
    // the cost crossing is arithmetic, not accident: est > 3n/8
    val n = Tables.embeddings(spark, sf).count()
    assert(m("p3_fat")._3 > n * VectorSearch.IvfTrainedNprobe / VectorSearch.PlanIvfCells)
  }

  test("cost overrides drive every arm, and routing tracks argmin") {
    // graph forced: IVF priced out, graph cheaper than every estimate
    val g = byPred(VectorSearch.vsPlannedRouteWith(spark, sf,
      costIvf = Long.MaxValue, costGraph = 1L).collect())
    assert(g.values.forall(_._1 == "graph"), s"graph not forced: $g")
    // ivf forced: brute priced out of the fat predicate only
    val i = byPred(VectorSearch.vsPlannedRouteWith(spark, sf,
      costIvf = 100L, costGraph = Long.MaxValue - 1).collect())
    assert(i("p3_fat")._1 == "ivf" && i("p2_tiny")._1 == "brute", s"$i")
    // brute forced: both indexes priced out relative to every estimate
    val b = byPred(VectorSearch.vsPlannedRouteWith(spark, sf,
      costIvf = Long.MaxValue, costGraph = Long.MaxValue).collect())
    assert(b.values.forall(_._1 == "brute"), s"brute not forced: $b")
  }

  test("brute rows grade perfect; index arms grade sane and complete") {
    val rows = SparkEntry.queries("vs_planned_route")(spark, sf).collect()
    val (brute, indexed) = rows.partition(_.getAs[String]("plan") == "brute")
    assert(brute.nonEmpty && indexed.nonEmpty)
    // the brute arm IS the exact truth
    assert(brute.forall(r =>
      r.getAs[Long]("n_hits") == r.getAs[Long]("n_exact")))
    // every query graded on every predicate, n_exact = TopK
    val nQ = rows.map(_.getAs[Long]("q_id")).distinct.length
    assert(rows.length == 3 * nQ)
    // exact truth is top-K, capped by the predicate's own pass size
    assert(rows.forall(r => r.getAs[Long]("n_exact") ==
      math.min(graft.ops.NnGraph.TopK.toLong, r.getAs[Long]("n_pass"))))
    // the IVF arm finds a nonzero share (nprobe=3 of 8 cells)
    val ivfHits = indexed.filter(_.getAs[String]("plan") == "ivf")
      .map(_.getAs[Long]("n_hits")).sum
    assert(ivfHits > 0, "IVF arm found nothing at all")
  }
}
