package graft

import graft.ops.{Events, Lake, Relational, VectorSearch}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Plan-shape regression guards for the round-5 operators: the
  * scale-critical properties (pushdown, scan counts, shuffle counts)
  * asserted on the executed post-AQE plans, so a refactor that silently
  * de-optimizes a plan fails a spec, not a production run.
  */
class PlanShapeSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  private def executedNodes(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    df.collect()
    flatten(df.queryExecution.executedPlan)
  }

  test("vs_filtered_search pushes both metadata predicates into the parquet scans") {
    val nodes = executedNodes(VectorSearch.vsFilteredSearch(spark, sf))
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    val pushed = scans.flatMap(_.dataFilters).map(_.toString).mkString("; ")
    assert(scans.exists(_.dataFilters.exists(_.toString.contains("label"))),
      s"label filter not pushed to a scan: $pushed")
    assert(scans.exists(_.dataFilters.exists(_.toString.contains("lang"))),
      s"lang filter not pushed to a scan: $pushed")
  }

  test("vs_lsh_tuned: band join is keyed — no cartesian/BNL anywhere in the pair plan") {
    val nodes = executedNodes(VectorSearch.vsLshTuned(spark, sf))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "tuned LSH pair generation fell back to a cartesian product")
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      "tuned LSH pair generation planned a broadcast nested loop join")
  }

  test("mm_image_decode is map-only: no shuffle between scan and decode") {
    val nodes = executedNodes(graft.ops.Multimodal.mmImageDecode(spark, sf)
      .limit(1))
    // The only allowed exchanges are the loader fan-out repartition and
    // the final orderBy's range exchange — never a key shuffle between
    // the two mapPartitions stages.
    val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.forall(s =>
        s.outputPartitioning.getClass.getSimpleName.contains("RoundRobin") ||
        s.outputPartitioning.getClass.getSimpleName.contains("Range")),
      s"unexpected key shuffle in decode path: ${shuffles.map(_.outputPartitioning)}")
  }

  test("ev_gap_fill scans the events table exactly once") {
    val nodes = executedNodes(Events.evGapFill(spark, sf))
    // the staged hourly aggregate is the ONLY consumer of the raw scan;
    // bounds, type list, and probe all read the checkpointed frame
    val eventScans = nodes.collect {
      case s: FileSourceScanExec if s.relation.location.inputFiles
        .exists(_.contains("events")) => s
    }
    assert(eventScans.length <= 1,
      s"gap fill must not rescan events (found ${eventScans.length} scans)")
  }

  test("q14_median: no per-group-only corpus sort — row_number is bucketed, targets broadcast") {
    val nodes = executedNodes(Relational.q14Median(spark, sf))
    // The scale hazard this guards: a row_number window partitioned by
    // l_returnflag ALONE sorts millions of rows per task (|groups| is
    // tiny). The bucketed-rank rewrite must (a) partition every
    // row_number by (group, bucket) and (b) narrow the corpus to the
    // target buckets via a broadcast join, never a shuffled one.
    val windows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    val rowNumberWindows = windows.filter(
      _.windowExpression.exists(_.toString.contains("row_number")))
    assert(rowNumberWindows.nonEmpty, "expected a row_number window")
    rowNumberWindows.foreach { w =>
      assert(w.partitionSpec.length >= 2 &&
          w.partitionSpec.exists(_.toString.contains("bkt")),
        s"row_number window must partition by (group, bucket), got ${w.partitionSpec}")
    }
    assert(nodes.exists(_.getClass.getSimpleName.contains("BroadcastHashJoin")),
      "target-bucket narrowing must be a broadcast hash join")
  }

  test("vs_range_search: corpusCap bounds the quadratic baseline via a pushed scan filter") {
    val key = "graft.range.corpusCap"
    assert(VectorSearch.rangeCorpusCap.isEmpty,
      "cap must be UNSET by default — Verify's correctness gate runs the full corpus")
    sys.props(key) = "10"
    try {
      val df = VectorSearch.vsRangeSearch(spark, sf)
      // Inspect the PRE-AQE physical plan: under the cap the result can
      // be empty, and AQE then rewrites the whole tree to EmptyRelation,
      // erasing every Filter/Scan node from the executed plan.
      val scans = flatten(df.queryExecution.sparkPlan)
        .collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty &&
          scans.forall(_.dataFilters.exists(_.toString.contains("vec_id"))),
        s"vec_id bound not pushed to every corpus scan: " +
          scans.flatMap(_.dataFilters).mkString("; "))
      assert(df.count() <= 45, "bounded baseline evaluated more than cap choose 2 pairs")
    } finally sys.props.remove(key)
  }

  test("lake_compact reads the compacted copy in at most 4 partitions") {
    val df = Lake.lakeCompact(spark, sf)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    val scan = nodes.collect { case s: FileSourceScanExec => s }.head
    assert(scan.inputRDD.getNumPartitions <= 4,
      s"compacted scan should be <= 4 partitions, got ${scan.inputRDD.getNumPartitions}")
  }

  test("pipeline_stratified_sample plans WindowGroupLimit (map-side top-K before the shuffle)") {
    val nodes = executedNodes(graft.ops.Pipeline.pipelineStratifiedSample(spark, sf))
    assert(nodes.exists(_.getClass.getSimpleName.contains("WindowGroupLimit")),
      s"rank<=K filter should rewrite to WindowGroupLimit; got: ${nodes.map(_.nodeName).distinct}")
  }

  test("vs_mips_search: TakeOrderedAndProject cut, corpus never shuffled (only the 1-row bounds agg)") {
    val nodes = executedNodes(VectorSearch.vsMipsSearch(spark, sf))
    assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")))
    // ignore the loader's local single-row-group fan-out (RoundRobin —
    // a no-op at real scale); count only key/single-partition exchanges
    val shuffles = nodes.collect {
      case e: ShuffleExchangeExec
        if !e.outputPartitioning.toString.contains("RoundRobin") => e
    }
    assert(shuffles.length <= 1,
      s"expected at most the bounds-aggregate exchange, got ${shuffles.map(_.outputPartitioning)}")
  }

  test("graph_triangles: every join is keyed — no cartesian product in the wedge plan") {
    val nodes = executedNodes(graft.ops.Graph.graphTriangles(spark, sf))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      s"wedge enumeration must join on the pivot vertex: ${nodes.map(_.nodeName).distinct}")
  }

  test("ev_heavy_hitters: at most two corpus scans and no distinct-key hash shuffle") {
    val nodes = executedNodes(Events.evHeavyHitters(spark, sf))
    val eventScans = nodes.collect {
      case s: FileSourceScanExec if s.relation.location.inputFiles
        .exists(_.contains("events")) => s
    }
    assert(eventScans.length <= 2,
      s"sketch-then-verify must not rescan events (${eventScans.length} scans)")
    // the candidate filter must be a broadcast, never a key shuffle of
    // the corpus onto the hash
    assert(nodes.exists(_.nodeName.contains("Broadcast")),
      s"candidate semi-filter should broadcast: ${nodes.map(_.nodeName).distinct}")
    val keyShuffles = nodes.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("k#") => e
    }
    assert(keyShuffles.isEmpty,
      s"corpus must never shuffle on the sketch key: ${keyShuffles.map(_.outputPartitioning)}")
  }

  test("vs_knn_classify: broadcast query set, no non-broadcast cartesian") {
    val nodes = executedNodes(VectorSearch.vsKnnClassify(spark, sf))
    assert(nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      s"query set should broadcast onto the corpus scan: ${nodes.map(_.nodeName).distinct}")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")))
  }

  test("pipeline_pack: the corpus cumsum window is bucket-partitioned, never single-partition") {
    val nodes = executedNodes(graft.ops.Pipeline.pipelinePack(spark, sf))
    val bktExchanges = nodes.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] &&
          e.outputPartitioning.toString.contains("bkt") => e
    }
    assert(bktExchanges.nonEmpty,
      s"per-bucket local cumsum must partition on bkt: ${nodes.map(_.nodeName).distinct}")
  }

  test("round-6 prefix/rank ops: corpus windows are bucket-partitioned, never single-partition") {
    for ((name, df) <- Seq(
        "pipeline_token_budget" -> graft.ops.Pipeline.pipelineTokenBudget(spark, sf),
        "pipeline_epoch_shuffle" -> graft.ops.Pipeline.pipelineEpochShuffle(spark, sf),
        "pipeline_interleave" -> graft.ops.Pipeline.pipelineInterleave(spark, sf))) {
      val nodes = executedNodes(df)
      val bktExchanges = nodes.collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] &&
            e.outputPartitioning.toString.contains("bkt") => e
      }
      assert(bktExchanges.nonEmpty,
        s"$name per-bucket cumsum/rank must partition on bkt: ${nodes.map(_.nodeName).distinct}")
    }
  }

  test("text_boilerplate: df side is size-planned, not hint-forced; df is an aggregate, not a window") {
    val df = graft.ops.TextAnalysis.textBoilerplate(spark, sf)
    // no broadcast() hint anywhere: the frequent-shingle set grows with
    // the corpus, so the join strategy must stay Catalyst's size-based
    // choice (broadcast at test SF is fine; forced broadcast is not)
    val logical = df.queryExecution.analyzed
    assert(!logical.collect { case h if h.nodeName.contains("Hint") => h }.exists(_ => true),
      "document-frequency join must not force a broadcast hint")
    val nodes = executedNodes(df)
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")))
    // the df count must be a (map-side combinable) hash aggregate, never
    // a windowed COUNT OVER (PARTITION BY h) — the skew trap
    assert(!nodes.exists(_.nodeName.contains("Window")),
      s"df must be a hash aggregate, not a windowed count: ${nodes.map(_.nodeName).distinct}")
  }

  test("text_collocations and ev_user_features keep their claimed cut/exchange shapes") {
    val colloc = executedNodes(graft.ops.TextAnalysis.textCollocations(spark, sf))
    assert(colloc.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
      s"top-20 cut should be TakeOrderedAndProject: ${colloc.map(_.nodeName).distinct}")
    val feats = executedNodes(Events.evUserFeatures(spark, sf))
    val userExchanges = feats.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] &&
          e.outputPartitioning.toString.contains("user_id") => e
    }
    // one hash exchange for the (user, day) distinct partials + one on
    // user_id (the final orderBy's range exchange is presentation only)
    assert(userExchanges.nonEmpty && userExchanges.length <= 2,
      s"feature aggregate should hash-shuffle on user_id at most twice: ${userExchanges.map(_.outputPartitioning)}")
  }

  test("ev_top_paths and vs_prefix_search plan TakeOrderedAndProject, not a global sort") {
    for (df <- Seq(Events.evTopPaths(spark, sf),
        VectorSearch.vsPrefixSearch(spark, sf))) {
      val nodes = executedNodes(df)
      assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
        s"global top-k cut should be TakeOrderedAndProject; got: ${nodes.map(_.nodeName).distinct}")
    }
  }

  test("q6_filter_agg pushes every predicate into the parquet scan") {
    val nodes = executedNodes(Relational.q6FilterAgg(spark, sf))
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    val pushed = scans.flatMap(_.dataFilters).map(_.toString).mkString("; ")
    for (c <- Seq("l_shipdate", "l_quantity", "l_discount"))
      assert(pushed.contains(c), s"$c not pushed to the scan: $pushed")
    // and the pruned read schema carries only the 4 referenced columns
    assert(scans.head.requiredSchema.fieldNames.length == 4,
      s"projection not pruned: ${scans.head.requiredSchema.fieldNames.mkString(",")}")
  }

  test("vs_maxsim_search and vs_pq_rerank: top-k via TakeOrderedAndProject, no corpus key shuffle") {
    for ((name, df) <- Seq(
        "vs_maxsim_search" -> VectorSearch.vsMaxsimSearch(spark, sf),
        "vs_pq_rerank" -> VectorSearch.vsPqRerank(spark, sf))) {
      val nodes = executedNodes(df)
      assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
        s"$name should cut with TakeOrderedAndProject: ${nodes.map(_.nodeName).distinct}")
      assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
        s"$name planned a cartesian product")
    }
  }

  test("dedup_containment: candidate generation is keyed — no cartesian/BNL") {
    val nodes = executedNodes(graft.ops.Dedup.dedupContainment(spark, sf))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "containment candidate join fell back to a cartesian product")
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      "containment candidate join planned a broadcast nested loop join")
  }

  test("ev_count_min and ev_quantile_sketch: bounded sketch shuffle, no corpus global sort") {
    for ((name, df) <- Seq(
        "ev_count_min" -> Events.evCountMin(spark, sf),
        "ev_quantile_sketch" -> Events.evQuantileSketch(spark, sf))) {
      val nodes = executedNodes(df)
      // no SortExec feeding an Exchange over the raw corpus: the only
      // sorts allowed are inside the final (tiny) ordered output / window
      val rangeShuffles = nodes.collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning.getClass.getSimpleName.contains("Range") => e
      }
      assert(rangeShuffles.size <= 1,
        s"$name should have at most the final order's range exchange")
    }
  }

  test("ev_sequence_pattern: both lookahead frames share ONE per-user window node") {
    val nodes = executedNodes(Events.evSequencePattern(spark, sf))
    val windows = nodes.filter(_.nodeName == "Window")
    // two different RANGE frames, same (partition, order) → Spark must
    // plan a single Window operator (one user-keyed shuffle), and that
    // operator is evaluated once thanks to the staged-frame reuse
    assert(windows.size <= 2, // staged appears under views and clicks branches
      s"expected the two lookahead mins to share Window nodes, got ${windows.size}")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")))
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")))
  }

  test("text_gopher_quality: pure hash aggregates — no window, no cartesian") {
    val nodes = executedNodes(graft.ops.TextAnalysis.textGopherQuality(spark, sf))
    assert(!nodes.exists(_.nodeName == "Window"),
      "repetition metrics must be aggregate-shaped, not window-shaped")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")))
  }

  test("lake_delete_vectors: the positional delete apply is a broadcast anti-join") {
    val nodes = executedNodes(Lake.lakeDeleteVectors(spark, sf))
    val bhj = nodes.filter(_.nodeName.contains("BroadcastHashJoin"))
    assert(bhj.exists(_.toString.contains("LeftAnti")),
      "delete vectors must apply as a broadcast LeftAnti, not a shuffle join")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")))
    assert(!nodes.exists(_.nodeName.contains("SortMergeJoin")),
      "no shuffle join anywhere — deletes are small and data is map-only")
  }

  test("mm_phash: band join is keyed and the hash path is map-only") {
    val nodes = executedNodes(graft.ops.Multimodal.mmPhash(spark, sf))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "phash pair generation fell back to a cartesian product")
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      "phash pair generation planned a broadcast nested loop join")
  }

  test("graph_sssp relaxation joins broadcast the bounded distance frame") {
    val nodes = executedNodes(graft.ops.Graph.graphSssp(spark, sf))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "sssp must never plan a cartesian product")
    // per-round relax = edges ⋈ broadcast(settled distances): at least
    // one broadcast hash join must survive into the executed plan
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      "expected the relax joins to broadcast the |nodes|-row distance frame")
  }

  test("lake_analyze scans each analyzed table exactly once") {
    val nodes = executedNodes(Lake.lakeAnalyze(spark, sf))
    // the stacked (cname, v) frame is staged; raw stats, exact NDV and
    // the KMV heap all read the checkpoint, so the underlying lineitem
    // and orders parquet each appear as at most one scan in the final
    // plan (zero when AQE reuses the checkpointed RDD directly)
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    def scansOf(table: String) = scans.count(
      _.relation.location.rootPaths.exists(_.toString.contains(table)))
    assert(scansOf("lineitem.parquet") <= 1, "lineitem scanned more than once")
    assert(scansOf("orders.parquet") <= 1, "orders scanned more than once")
  }

  test("vs_diversify: corpus work is one broadcast candidate cut; greedy joins are keyed") {
    val nodes = executedNodes(VectorSearch.vsDiversify(spark, sf))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "MMR must never plan a cartesian product")
    // the only nested-loop allowed is the bounded broadcast query set
    // against the corpus (the candidate cut — vs_knn_join's shape)
    val bnl = nodes.filter(_.nodeName.contains("BroadcastNestedLoopJoin"))
    assert(bnl.size <= 1, s"expected at most the candidate-cut BNL, got ${bnl.size}")
  }

  // ── r15 keys ─────────────────────────────────────────────────────────

  test("vs_nng_store: manifest is pure hash aggregates over the reloaded tables") {
    val nodes = executedNodes(VectorSearch.vsNngStore(spark, sf))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")))
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")))
    assert(!nodes.exists(_.nodeName == "Window"),
      "the manifest must be aggregate-shaped, not window-shaped")
    // and it reads the STORED tables, not memo lineage
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    assert(scans.exists(_.relation.location.rootPaths
        .exists(_.toString.contains("graft-nngstore"))),
      "manifest does not scan the external store")
  }

  test("vs_nng_load: search hops join the reloaded graph with keyed joins only") {
    val df = VectorSearch.vsNngLoad(spark, sf)
    df.collect()
    val nodes = executedNodes(df)
    // same contract as vs_nng_search's tail: the grade select carries
    // no cartesian; the two bounded broadcast crossJoins (query seeding
    // + exact grading) are the declared exceptions
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "cold-start serve planned a cartesian product")
  }

  test("vs_ivf_load / vs_lsh_load: cold serves plan no cartesian anywhere") {
    // FileScan provenance of the store tables is asserted in
    // IvfStoreSpec/LshStoreSpec via spark.table (the serve pipelines
    // stage intermediates, which truncates lineage in the tail plan);
    // here the contract is join shape only.
    for ((fn, tag) <- Seq(
        (VectorSearch.vsIvfLoad, "ivf"),
        (VectorSearch.vsLshLoad, "lsh"))) {
      val df = fn(spark, sf)
      df.collect()
      val nodes = executedNodes(df)
      assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
        s"$tag cold serve planned a cartesian product")
    }
  }

  test("vs_planned_stats: routing reads the stats table — no extra corpus scan for the decision") {
    val nodes = executedNodes(VectorSearch.vsPlannedStats(spark, sf))
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")))
    // the executed grading plan must NOT contain a scan of the stats
    // table at all: the estimates were consulted driver-side from the
    // tiny reloaded artifact BEFORE the plan was built — the routing
    // cost is zero in the distributed plan
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    assert(!scans.exists(_.relation.location.rootPaths
        .exists(_.toString.contains("graft-plannerstats"))),
      "the stats artifact leaked into the distributed grading plan")
  }
}
