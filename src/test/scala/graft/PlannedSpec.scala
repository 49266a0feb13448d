package graft

import graft.ops.VectorSearch

/** Selectivity-adaptive filtered-search planner (`vs_search_planned`):
  * routing honesty at oracle SF, both arms exercised via the cutoff
  * parameter, brute-arm exactness, graph-arm quality.
  */
class PlannedSpec extends SparkSpec {

  test("default routing at oracle SF: every predicate honestly routes to brute") {
    // 500-row corpora sit far below the visited-budget cutoff — an
    // index walk would score MORE candidates than the exact scan.
    val rows = SparkEntry.queries("vs_search_planned")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("plan") == "brute"),
      "a toy-SF predicate routed to the graph arm")
    // brute is exact by construction: every grade is perfect
    assert(rows.forall(r => r.getAs[Long]("n_hits") == r.getAs[Long]("n_exact")))
    assert(rows.map(_.getAs[String]("pred")).distinct.sorted.toSeq ==
      Seq("p1_thin", "p2_tiny", "p3_fat"))
  }

  test("shrunken cutoff splits the routes and the graph arm still delivers") {
    // cutoff 10: p1 (4 passing) and p2 (6) stay brute, p3 (246) crosses
    // to the graph arm — both plans execute in ONE run, so the routing
    // logic and the graph arm's survivor/escalation plumbing are
    // exercised without sf1-scale cost.
    val rows = VectorSearch.vsSearchPlannedWith(spark, sf, 10L).collect()
    val plans = rows.map(r =>
      r.getAs[String]("pred") -> r.getAs[String]("plan")).distinct.toMap
    assert(plans == Map("p1_thin" -> "brute", "p2_tiny" -> "brute",
      "p3_fat" -> "graph"), s"unexpected routing: $plans")
    // graph arm on a 50%-selectivity predicate at sf0.01: the filtered
    // top-5 sit well inside the beam's reach — recall must be perfect.
    val g = rows.filter(_.getAs[String]("pred") == "p3_fat")
    assert(g.nonEmpty)
    assert(g.forall(r => r.getAs[Long]("n_hits") == r.getAs[Long]("n_exact")),
      "graph arm dropped an exact filtered neighbor at oracle SF")
    // and the brute arms stay exact
    assert(rows.filterNot(_.getAs[String]("pred") == "p3_fat")
      .forall(r => r.getAs[Long]("n_hits") == r.getAs[Long]("n_exact")))
  }
}
