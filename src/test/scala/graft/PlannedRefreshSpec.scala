package graft

import org.apache.spark.sql.Row

/** ANALYZE refresh after index maintenance (`vs_planned_refresh`): the
  * delete targets the fat predicate's own selectivity, so the fresh
  * post-delete estimate must cross the arm boundary and FLIP the route
  * — and routing on the stale pre-delete estimate must give the wrong
  * plan (the classic production planner bug, demonstrated).
  */
class PlannedRefreshSpec extends SparkSpec {

  private def rows: Map[(String, String), Row] =
    SparkEntry.queries("vs_planned_refresh")(spark, sf).collect()
      .map(r => (r.getAs[String]("phase"), r.getAs[String]("pred")) -> r).toMap

  test("the refresh flips the fat predicate's route when cardinality crosses the boundary") {
    val pre = rows(("1_pre", "p3_fat"))
    val post = rows(("2_post", "p3_fat"))
    assert(pre.getAs[String]("plan") == "ivf" && post.getAs[String]("plan") == "brute",
      s"expected ivf -> brute: pre=${pre.getAs[String]("plan")} post=${post.getAs[String]("plan")}")
    assert(post.getAs[Long]("n_est") < pre.getAs[Long]("n_est"),
      "the refreshed estimate must see the deleted rows")
    assert(post.getAs[Long]("n_total") < pre.getAs[Long]("n_total"))
    assert(post.getAs[Long]("cost_ivf") < pre.getAs[Long]("cost_ivf"),
      "the refreshed occupancy must see the pruned assignment")
  }

  test("stale stats give the WRONG route — the bug the refresh exists to fix") {
    val pre = rows(("1_pre", "p3_fat"))
    val post = rows(("2_post", "p3_fat"))
    // a router that kept the stale estimate against the post-delete
    // index would still pick an index arm; the fresh estimate says brute
    val staleEst = pre.getAs[Long]("n_est")
    val (cIvf, cGraph) = (post.getAs[Long]("cost_ivf"), post.getAs[Long]("cost_graph"))
    val stalePlan =
      if (staleEst <= cIvf && staleEst <= cGraph) "brute"
      else if (cIvf <= cGraph) "ivf" else "graph"
    assert(stalePlan != post.getAs[String]("plan"),
      s"stale route $stalePlan should differ from fresh ${post.getAs[String]("plan")}")
  }

  test("thin predicates stay brute through the maintenance") {
    for (p <- Seq("p1_thin", "p2_tiny"); ph <- Seq("1_pre", "2_post"))
      assert(rows((ph, p)).getAs[String]("plan") == "brute", s"($ph,$p)")
  }
}
