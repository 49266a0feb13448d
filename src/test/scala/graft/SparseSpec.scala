package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Sparse-vector MIPS (`vs_sparse_search`): the posting join must be
  * EXACT (not candidate generation) — proven by a driver-side replay of
  * the full sparse dot over the collected grid at sf0.001 — the
  * tie-kept top-M sparsify must bound postings per vector, and the plan
  * must broadcast the query side (no corpus cross product).
  */
class SparseSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  test("posting-join scores equal the brute-force sparse dot (exactness)") {
    val grid = VectorSearch.int8Grid(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    // driver replay of the tie-kept top-M sparsify
    def sparse(v: Array[Long]): Map[Int, Long] = {
      val thr = v.map(math.abs).sorted(Ordering[Long].reverse)(VectorSearch.SparseTopM - 1)
      v.zipWithIndex.collect {
        case (w, i) if math.abs(w) >= thr && w != 0L => (i + 1) -> w
      }.toMap
    }
    val sp = grid.map { case (id, v) => id -> sparse(v) }
    val queries = sp.keys.filter(_ % 100 == 0)
    val expected = (for (q <- queries) yield {
      val scored = sp.toSeq
        .map { case (c, cv) =>
          val dot = sp(q).foldLeft(0L) { case (acc, (d, wq)) =>
            acc + cv.getOrElse(d, 0L) * wq
          }
          (c, dot)
        }
        .filter { case (c, _) => sp(q).keySet.intersect(sp(c).keySet).nonEmpty }
        .sortBy { case (c, dot) => (-dot, c) }
        .take(VectorSearch.SparseTopK)
      q -> scored
    }).toMap
    val got = SparkEntry.queries("vs_sparse_search")(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getLong(3))).toSeq
      }
    assert(got.keySet == expected.keySet.map(identity))
    for ((q, exp) <- expected)
      assert(got(q) == exp.map { case (c, d) => (c, d) },
        s"query $q: got ${got(q)} expected $exp")
  }

  test("tie-kept top-M sparsify bounds postings per vector") {
    val grid = VectorSearch.int8Grid(spark, sf)
    val thr = element_at(
      sort_array(transform(col("qd"), x => abs(x)), asc = false),
      VectorSearch.SparseTopM)
    val counts = grid.withColumn("thr", thr)
      .select(col("vec_id"),
        size(filter(col("qd"), w => abs(w) >= col("thr") && w =!= 0)).as("n"),
        size(filter(col("qd"), w => w =!= 0)).as("nz"))
      .collect()
    for (r <- counts) {
      val (n, nz) = (r.getInt(1), r.getInt(2))
      assert(n <= 64, s"vec ${r.getLong(0)}: $n postings > dim")
      // nz >= M -> the M-th largest |w| is nonzero, so at least M dims
      // survive; nz < M -> thr = 0 and exactly the nonzero dims survive.
      assert(n >= math.min(VectorSearch.SparseTopM, nz),
        s"vec ${r.getLong(0)}: $n postings < min(M, $nz)")
    }
  }

  test("plan broadcasts the query postings; no cartesian/BNL") {
    val df = SparkEntry.queries("vs_sparse_search")(spark, sf)
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.getClass.getSimpleName.contains("CartesianProduct")),
      "sparse search planned a cartesian product")
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      "sparse search planned a BNL join")
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      "query postings were not broadcast")
  }
}
