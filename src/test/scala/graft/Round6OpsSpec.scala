package graft

import graft.ops.{Events, Graph, Pipeline, TextAnalysis}
import org.apache.spark.sql.functions._

/** Behavior specs for the round-6 operator additions (boilerplate
  * detection, token-budget selection, label propagation). Each test
  * asserts equivalence with a brute-force plain-Scala reference — a
  * genuinely different computation path from the distributed plan. */
class Round6OpsSpec extends SparkSpec {

  private def toks(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq

  test("text_boilerplate equals brute-force shingle document frequency") {
    val got = TextAnalysis.textBoilerplate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_boiler"), r.getAs[Long]("n_shingles"))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
      .filter(_._2.length >= TextAnalysis.BoilerShingle)
    val perDoc = docs.map { case (id, ts) =>
      id -> ts.sliding(TextAnalysis.BoilerShingle).map(_.mkString(" ")).toSet
    }
    val df = perDoc.flatMap(_._2).groupBy(identity).map { case (s, v) => s -> v.size }
    val want = perDoc.map { case (id, sh) =>
      id -> (sh.count(s => df(s) >= TextAnalysis.BoilerDf).toLong, sh.size.toLong)
    }.filter(_._2._1 > 0).toMap
    assert(got == want)
    assert(got.nonEmpty, "test corpus should contain boilerplate shingles")
    // near-dup groups exist, so some docs must also have NON-boilerplate content
    assert(got.exists { case (_, (b, n)) => b < n })
  }

  test("pipeline_token_budget: two-pass prefix equals sequential greedy selection") {
    val rows = Pipeline.pipelineTokenBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    // the selection is a contiguous prefix: offsets chain exactly
    val byOff = rows.sortBy(_.getAs[Long]("off"))
    assert(byOff.head.getAs[Long]("off") == 0L)
    byOff.sliding(2).filter(_.length == 2).foreach { w =>
      assert(w(1).getAs[Long]("off") ==
        w(0).getAs[Long]("off") + w(0).getAs[Long]("n_tok"))
    }
    assert(byOff.last.getAs[Long]("off") < Pipeline.TokenBudget)
    // greedy reference ranked by the independent text_quality operator
    val scored = TextAnalysis.textQuality(spark, sf)
      .select("doc_id", "score", "n_tok").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("score"), r.getAs[Long]("n_tok")))
      .sortBy(t => (-t._2, t._1))
    var cum = 0L
    val want = scored.takeWhile { case (_, _, t) =>
      val in = cum < Pipeline.TokenBudget; cum += t; in
    }.map(_._1).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == want)
    // scores agree with the quality operator
    val scoreOf = scored.map(t => t._1 -> t._2).toMap
    rows.foreach(r => assert(r.getAs[Long]("score") == scoreOf(r.getAs[Long]("doc_id"))))
  }

  test("graph_label_prop equals brute-force min-label iteration") {
    val got = Graph.graphLabelProp(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val und = Events.transitionPairs(spark, sf)
      .select("prev_type", "next_type").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = und.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    val nodes = und.map(_._1).distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to Graph.LpIters)
      lab = nodes.map { n =>
        n -> (nbrs(n).map(lab) :+ lab(n)).min
      }.toMap
    assert(got == lab)
    assert(got.nonEmpty)
    // propagation did something: at least one node carries a foreign label
    assert(got.exists { case (n, l) => n != l } || got.size == 1)
  }
}
