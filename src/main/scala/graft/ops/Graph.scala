package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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
          expr("(85 * r * w) div (100 * out_w)").as("c"))
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

  val queries: Map[String, Q] = Map("graph_pagerank" -> graphPagerank)
  val oracles: Map[String, String] = Map("graph_pagerank" -> graphPagerankSql)
}
