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

  test("KMV sketch statistic routes every predicate identically to the exact count") {
    // The 100 TB posture: routing reads O(k) driver state, not a scan.
    // Both at the default cutoff (all brute) and at the arm-splitting
    // cutoff 10 (p3 crosses to the graph), the sketch must make the
    // SAME choices — and since grading never consults the statistic,
    // identical routing means identical output rows.
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("pred"), r.getAs[String]("plan"),
        r.getAs[Long]("n_pass"), r.getAs[Long]("q_id"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_hits"))).toSeq
    for (cut <- Seq(VectorSearch.PlanBruteCutoff, 10L)) {
      val exact = rowsOf(VectorSearch.vsSearchPlannedWith(spark, sf, cut))
      val kmv = rowsOf(VectorSearch.vsSearchPlannedWith(spark, sf, cut,
        routeStat = Some((_, f) => VectorSearch.kmvPassEstimate(f))))
      assert(kmv == exact,
        s"sketch-routed output diverged from exact-routed at cutoff $cut")
    }
    // The estimator itself: exact below k distinct ids, bounded error
    // above (k=64 → σ ≈ 1/√k ≈ 12.5%; assert a generous 50% band so
    // data drift can't flake the suite while a broken estimator —
    // off by orders of magnitude — still fails).
    for ((tag, pass) <- VectorSearch.plannerPreds(spark, sf)) {
      val n = pass.count()
      val est = VectorSearch.kmvPassEstimate(pass)
      if (n < VectorSearch.PlanKmvK)
        assert(est == n, s"$tag: KMV below k must be exact ($est vs $n)")
      else assert(math.abs(est - n) <= n / 2,
        s"$tag: KMV estimate $est vs exact $n outside 50% band")
    }
  }

  test("persisted ANALYZE stats route identically to the KMV sketch at the default cutoff") {
    // The cost-based-planner loop (r14 verdict #4): routing reads the
    // STORED histogram artifact, never the pass frame. Identity is
    // asserted on the full graded rows — routing-independent grading
    // means identical plans imply identical output.
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("pred"), r.getAs[String]("plan"),
        r.getAs[Long]("n_pass"), r.getAs[Long]("q_id"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_hits"))).toSeq
    val stats = rowsOf(SparkEntry.queries("vs_planned_stats")(spark, sf))
    val kmv = rowsOf(SparkEntry.queries("vs_planned_kmv")(spark, sf))
    assert(stats == kmv, "stats-routed grading diverged from sketch-routed")
    // The estimates themselves: p3_fat is single-column, so the
    // histogram estimate must be EXACT; the conjunctions stay within
    // a generous independence band (the synthetic label/lang columns
    // are independent by construction).
    val est = VectorSearch.plannerStatsEstimates(spark, sf)
    for ((tag, pass) <- VectorSearch.plannerPreds(spark, sf)) {
      val n = pass.count()
      if (tag == "p3_fat") assert(est(tag) == n, s"$tag: $est vs $n")
      else assert(math.abs(est(tag) - n) <= (n max 8L),
        s"$tag: stats estimate ${est(tag)} vs exact $n outside band")
    }
  }
}
