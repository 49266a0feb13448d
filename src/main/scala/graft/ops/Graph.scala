package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.util.Det.idiv

/** Graph analytics over derived graphs (companion to the connected-
  * components operator in [[Dedup]]).
  *
  * The graph here is the event-type transition graph (nodes = event
  * types, edge weight = observed consecutive-pair count — the same lag
  * window as `ev_transition`), but the operators are generic edge-list
  * algorithms: at 100 TB the edge list is the billions-of-rows frame and
  * every iteration is one join + one aggregate on the dst key — the
  * standard Pregel-as-DataFrame shape with no driver-side graph state.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  final val Scale = 1000000L // rank fixed-point scale (1.0 = 1e6)
  final val Iters = 3

  /** Weighted directed edges (prev→next, weight = pair count) from the
    * per-user event sequences — [[Events.transitionPairs]] is the one
    * definition of transition semantics. One window shuffle on user_id,
    * then a |types²|-row aggregate. */
  private def edges(spark: SparkSession, dir: String): DataFrame =
    Events.transitionPairs(spark, dir)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("w"))

  // ── graph_pagerank — fixed-point integer PageRank, 3 iterations ──────
  /** PageRank in EXACT fixed-point integer arithmetic (rank scaled by
    * 1e6, damping 0.85 as the rational 85/100): every contribution is
    * `(85·r·w) div (100·out)` in BIGINT, so the result is bit-identical
    * on any engine and any execution order — no float accumulation
    * anywhere. Each iteration is the distributed shape: edges ⋈ ranks on
    * src (broadcast — ranks is |nodes| rows), contribution aggregate on
    * dst, left join back onto the node set for sinks that received
    * nothing. The edge frame is staged once and reused by all
    * iterations; iteration count is fixed (unrolled in the oracle), the
    * convergence-loop variant would reuse [[graft.util.Persist.stage]]
    * per round exactly like the connected-components rounds. */
  def graphPagerank: Q = (spark, dir) => {
    val e = graft.util.Persist.stage(edges(spark, dir), eager = false)
    val nodes = e.select(col("prev_type").as("node"))
      .union(e.select(col("next_type")))
      .distinct()
    val outs = e.groupBy("prev_type").agg(sum("w").as("out_w"))
    var rank: DataFrame = nodes.withColumn("r", lit(Scale))
    for (_ <- 1 to Iters) {
      val contrib = e.join(outs, "prev_type")
        .join(broadcast(rank), col("prev_type") === col("node"))
        .select(col("next_type"),
          idiv(lit(85) * col("r") * col("w"), lit(100) * col("out_w")).as("c"))
        .groupBy("next_type").agg(sum("c").as("cs"))
      rank = nodes.join(contrib, col("node") === col("next_type"), "left")
        .select(col("node"),
          (lit(15L * Scale / 100L) + coalesce(col("cs"), lit(0L))).as("r"))
    }
    rank.withColumn("rank_pos",
        row_number().over(Window.orderBy(col("r").desc, col("node"))).cast("long"))
      .orderBy("node")
  }
  val graphPagerankSql: String = {
    val base = 15L * Scale / 100L
    def iter(prev: String, cur: String): String = s"""
    c$cur AS (SELECT e.next_type AS node,
        CAST(SUM((85 * r.r * e.w) // (100 * o.out_w)) AS BIGINT) AS cs
      FROM edges e JOIN outs o USING (prev_type)
      JOIN r$prev r ON r.node = e.prev_type GROUP BY 1),
    r$cur AS (SELECT n.node, CAST($base + COALESCE(cs, 0) AS BIGINT) AS r
      FROM nodes n LEFT JOIN c$cur ON c$cur.node = n.node)"""
    s"""
    WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
    lagged AS (SELECT event_type AS next_type,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
      FROM ev),
    edges AS (SELECT prev_type, next_type, COUNT(*) AS w
      FROM lagged WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    nodes AS (SELECT DISTINCT prev_type AS node FROM edges
              UNION SELECT DISTINCT next_type FROM edges),
    outs AS (SELECT prev_type, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY 1),
    r0 AS (SELECT node, CAST($Scale AS BIGINT) AS r FROM nodes),
    ${iter("0", "1")},
    ${iter("1", "2")},
    ${iter("2", "3")}
    SELECT node, r,
      CAST(row_number() OVER (ORDER BY r DESC, node) AS BIGINT) AS rank_pos
    FROM r3 ORDER BY node"""
  }

  // ── graph_triangles — degree-ordered triangle enumeration ────────────
  /** Triangle listing over the undirected transition graph via
    * degree-ordered edge orientation (the classic MapReduce triangle
    * trick — Cohen 2009, Suri & Vassilvitskii 2011): orient every edge
    * from its lower-(degree, id) endpoint to the higher, enumerate
    * wedges only from each triangle's SMALLEST vertex, and close them
    * with a semi-join back on the oriented edge set. Orientation bounds
    * per-vertex wedge fan-out by the smaller endpoint's out-degree
    * (O(m^1.5) wedges total) — a hub of degree d contributes no d²
    * blow-up, which is what makes the join plan survive skewed
    * real-world graphs at 100 TB; the closing check is a shuffle
    * semi-join on the (v, w) key, never a cartesian. The degree frame is
    * |nodes| rows (broadcast); output triangles are canonicalized
    * (ta < tb < tc by id) so the orientation is invisible to the
    * oracle's plain three-way self-join. */
  def graphTriangles: Q = (spark, dir) => {
    val und = graft.util.Persist.stage(
      edges(spark, dir)
        .select(least(col("prev_type"), col("next_type")).as("a"),
          greatest(col("prev_type"), col("next_type")).as("b"))
        .filter(col("a") =!= col("b")).distinct(),
      eager = false)
    val deg = und.select(col("a").as("n")).union(und.select(col("b")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // Orient a—b from the lower (degree, id) endpoint; carry the head's
    // rank so wedge enumeration can order its two heads without a join.
    val oriented = und
      .join(broadcast(deg.select(col("n").as("a"), col("d").as("da"))), "a")
      .join(broadcast(deg.select(col("n").as("b"), col("d").as("db"))), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") &&
        (struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v"))))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    wedges
      .join(oriented.select(col("u").as("y"), col("v").as("z")),
        Seq("y", "z"), "left_semi")
      .select(array_sort(array(col("x"), col("y"), col("z"))).as("t"))
      .select(col("t")(0).as("ta"), col("t")(1).as("tb"), col("t")(2).as("tc"))
      .orderBy("ta", "tb", "tc")
  }
  val graphTrianglesSql: String = """
    WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
    lagged AS (SELECT event_type AS next_type,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
      FROM ev),
    und AS (SELECT DISTINCT least(prev_type, next_type) AS a,
        greatest(prev_type, next_type) AS b
      FROM lagged WHERE prev_type IS NOT NULL AND prev_type <> next_type)
    SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
    FROM und e1 JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ORDER BY ta, tb, tc"""

  // ── graph_label_prop — min-label propagation, fixed rounds ───────────
  final val LpIters = 3
  /** Min-label propagation over the undirected transition graph: every
    * node starts labelled with itself, and each round takes the MIN over
    * its own and its neighbours' labels — [[LpIters]] fixed rounds
    * (unrolled in the oracle like [[graphPagerank]]'s), so after round k
    * a node carries the smallest label within distance k. String MIN is
    * exact on both engines — no float, no tie ambiguity. Each round is
    * the Pregel-as-DataFrame shape: symmetric edge list ⋈ labels on the
    * neighbour key (broadcast here — labels is |nodes| rows; at
    * billions of nodes the same plan runs as a keyed shuffle join), MIN
    * aggregate on the node key, left join back for isolated nodes. The
    * symmetric edge frame is staged once and reused by all rounds. */
  def graphLabelProp: Q = (spark, dir) => {
    val e = graft.util.Persist.stage(
      edges(spark, dir).filter(col("prev_type") =!= col("next_type")),
      eager = false)
    val sym = e.select(col("prev_type").as("n"), col("next_type").as("nb"))
      .union(e.select(col("next_type"), col("prev_type")))
      .distinct()
    val nodes = e.select(col("prev_type").as("node"))
      .union(e.select(col("next_type")))
      .distinct()
    var lab: DataFrame = nodes.withColumn("label", col("node"))
    for (_ <- 1 to LpIters) {
      val nbMin = sym.join(broadcast(lab), col("nb") === col("node"))
        .groupBy("n").agg(min("label").as("m"))
      lab = lab.join(nbMin, col("node") === col("n"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("m"), col("label"))).as("label"))
    }
    lab.orderBy("node")
  }
  val graphLabelPropSql: String = {
    def iter(prev: String, cur: String): String = s"""
    m$cur AS (SELECT s.n AS node, MIN(l.label) AS m
      FROM sym s JOIN l$prev l ON l.node = s.nb GROUP BY 1),
    l$cur AS (SELECT l.node, least(l.label, COALESCE(m.m, l.label)) AS label
      FROM l$prev l LEFT JOIN m$cur m ON m.node = l.node)"""
    s"""
    WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
    lagged AS (SELECT event_type AS next_type,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
      FROM ev),
    edges AS (SELECT prev_type, next_type FROM lagged
      WHERE prev_type IS NOT NULL AND prev_type <> next_type GROUP BY 1, 2),
    sym AS (SELECT prev_type AS n, next_type AS nb FROM edges
            UNION SELECT next_type, prev_type FROM edges),
    nodes AS (SELECT DISTINCT prev_type AS node FROM edges
              UNION SELECT DISTINCT next_type FROM edges),
    l0 AS (SELECT node, node AS label FROM nodes),
    ${iter("0", "1")},
    ${iter("1", "2")},
    ${iter("2", "3")}
    SELECT node, label FROM l3 ORDER BY node"""
  }

  // ── graph_kcore — iterative k-core peeling over the near-dup graph ───
  final val KcK = 2
  final val KcIters = 3

  /** K-core decomposition ([[KcK]]-core, [[KcIters]] fixed peel rounds,
    * unrolled in the oracle like the other iterative graph ops) over the
    * MinHash near-duplicate pair graph ([[Dedup.dedupMinhashLsh]] — the
    * bucketed, 100 TB-safe pair generator): repeatedly drop nodes with
    * degree < k among surviving nodes. Separates dense duplicate
    * families (cliquish cores that survive) from incidental chains
    * (peeled away) — the structure a curation run uses to pick "delete
    * the whole family" vs "keep and link". Each round is one
    * both-endpoints-alive semi-join + one degree aggregate on the node
    * key; the symmetric edge frame is staged once. Output: surviving
    * nodes with their final in-core degree. */
  def graphKcore: Q = (spark, dir) => {
    // sym is staged ONCE and each round's survivor set is staged per
    // round — without this every later round's plan re-embeds all
    // earlier rounds twice (alive appears on both join sides), an
    // O(2^rounds) lineage blow-up (the same policy as dedup_clusters'
    // per-round checkpoint).
    val sym = graft.util.Persist.stage({
      // The memoized pair graph directly — the registered key's orderBy
      // tail would only be re-sorted away by the union/distinct here.
      val pairs = Dedup.minhashVerifiedPairs(spark, dir).select("a_id", "b_id")
      pairs.select(col("a_id").as("n"), col("b_id").as("nb"))
        .union(pairs.select(col("b_id"), col("a_id")))
        .distinct()
    }, eager = false)
    var alive: DataFrame = sym.select(col("n")).distinct()
    var deg: DataFrame = null
    for (_ <- 1 to KcIters) {
      deg = graft.util.Persist.stage(
        sym
          .join(alive, "n")
          .join(alive.select(col("n").as("nb")), "nb")
          .groupBy("n").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= KcK),
        eager = false)
      alive = deg.select("n")
    }
    deg.select(col("n").as("doc_id"), col("deg")).orderBy("doc_id")
  }
  val graphKcoreSql: String = {
    def iter(prev: String, cur: String): String = s"""
    d$cur AS (SELECT s.n, COUNT(*) AS deg
      FROM sym s JOIN a$prev x ON x.n = s.n JOIN a$prev y ON y.n = s.nb
      GROUP BY 1 HAVING COUNT(*) >= $KcK),
    a$cur AS (SELECT n FROM d$cur)"""
    Dedup.minhashCtesShared + s""",
    pairs AS (SELECT a_id, b_id FROM jj WHERE jaccard >= 0.7),
    sym AS (SELECT a_id AS n, b_id AS nb FROM pairs
            UNION SELECT b_id, a_id FROM pairs),
    a0 AS (SELECT DISTINCT n FROM sym),
    ${iter("0", "1")},
    ${iter("1", "2")},
    ${iter("2", "3")}
    SELECT n AS doc_id, CAST(deg AS BIGINT) AS deg FROM d3 ORDER BY doc_id"""
  }

  // ── graph_sssp — weighted single-source shortest path, fixed rounds ──
  final val SsspIters = 3
  final val SsspScale = 1000000L // cost numerator: rarer transition = costlier hop

  /** Weighted single-source shortest path via [[SsspIters]] Bellman-Ford
    * relaxation rounds (unrolled in the oracle like [[graphPagerank]]'s
    * iterations — after round k every node holds the cheapest ≤ k-hop
    * path). Edge cost is the integer `1e6 // w + 1` — rarer transitions
    * cost more, so the result ranks event types by how cheaply the
    * common flow reaches them from the source (MIN node id — a
    * deterministic relational pick, no driver constant). All arithmetic
    * is BIGINT min-plus, so both engines agree bit-for-bit; unreached
    * nodes stay NULL (never a float ∞ sentinel). Each round is the
    * Pregel-as-DataFrame shape: edges ⋈ settled distances on the src key
    * (broadcast — distances is |nodes| rows; at billions of nodes the
    * same plan is a keyed shuffle join), MIN-relax aggregate on the dst
    * key, left join back so untouched nodes keep their distance. The
    * NULL-aware min is an explicit CASE chain on both engines — Spark's
    * `least` skips NULLs but other engines differ, so the op never leans
    * on that divergence. The edge frame is staged once for all rounds. */
  def graphSssp: Q = (spark, dir) => {
    val e = graft.util.Persist.stage(
      edges(spark, dir)
        .filter(col("prev_type") =!= col("next_type"))
        .select(col("prev_type"), col("next_type"),
          (idiv(lit(SsspScale), col("w")) + lit(1L)).as("cost")),
      eager = false)
    val nodes = e.select(col("prev_type").as("node"))
      .union(e.select(col("next_type")))
      .distinct()
    val src = nodes.agg(min("node").as("src"))
    var d: DataFrame = nodes.crossJoin(broadcast(src))
      .select(col("node"),
        when(col("node") === col("src"), lit(0L))
          .otherwise(lit(null).cast("long")).as("dist"))
    for (_ <- 1 to SsspIters) {
      val relax = e
        .join(broadcast(d.filter(col("dist").isNotNull)
          .select(col("node").as("prev_type"), col("dist").as("sd"))), "prev_type")
        .select(col("next_type"), (col("sd") + col("cost")).as("nd"))
        .groupBy("next_type").agg(min("nd").as("m"))
      d = d.join(relax, col("node") === col("next_type"), "left")
        .select(col("node"),
          when(col("dist").isNull, col("m"))
            .when(col("m").isNull, col("dist"))
            .when(col("m") < col("dist"), col("m"))
            .otherwise(col("dist")).as("dist"))
    }
    d.orderBy("node")
  }
  val graphSsspSql: String = {
    def iter(prev: String, cur: String): String = s"""
    r$cur AS (SELECT e.next_type AS node, MIN(d.dist + e.cost) AS m
      FROM ec e JOIN d$prev d ON d.node = e.prev_type AND d.dist IS NOT NULL
      GROUP BY 1),
    d$cur AS (SELECT n.node,
        CASE WHEN n.dist IS NULL THEN r.m
             WHEN r.m IS NULL THEN n.dist
             WHEN r.m < n.dist THEN r.m ELSE n.dist END AS dist
      FROM d$prev n LEFT JOIN r$cur r ON r.node = n.node)"""
    s"""
    WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
    lagged AS (SELECT event_type AS next_type,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
      FROM ev),
    edges AS (SELECT prev_type, next_type, COUNT(*) AS w
      FROM lagged WHERE prev_type IS NOT NULL AND prev_type <> next_type
      GROUP BY 1, 2),
    ec AS (SELECT prev_type, next_type,
        CAST($SsspScale // w + 1 AS BIGINT) AS cost FROM edges),
    nodes AS (SELECT DISTINCT prev_type AS node FROM edges
              UNION SELECT DISTINCT next_type FROM edges),
    s AS (SELECT MIN(node) AS src FROM nodes),
    d0 AS (SELECT node,
        CASE WHEN node = (SELECT src FROM s) THEN CAST(0 AS BIGINT) END AS dist
      FROM nodes),
    ${iter("0", "1")},
    ${iter("1", "2")},
    ${iter("2", "3")}
    SELECT node, dist FROM d3 ORDER BY node"""
  }

  val queries: Map[String, Q] = Map(
    "graph_kcore" -> graphKcore,
    "graph_pagerank" -> graphPagerank,
    "graph_sssp" -> graphSssp,
    "graph_triangles" -> graphTriangles,
    "graph_label_prop" -> graphLabelProp)
  val oracles: Map[String, String] = Map(
    "graph_kcore" -> graphKcoreSql,
    "graph_pagerank" -> graphPagerankSql,
    "graph_sssp" -> graphSsspSql,
    "graph_triangles" -> graphTrianglesSql,
    "graph_label_prop" -> graphLabelPropSql)
}
