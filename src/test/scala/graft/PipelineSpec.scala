package graft

import graft.ops.Pipeline
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"

  test("pipeline_curate stages partition every source's documents") {
    val rows = Pipeline.pipelineCurate(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = Seq("n_probe", "n_dup", "n_lang", "n_quality", "n_contam", "n_kept")
        .map(r.getAs[Long]).sum
      assert(total == r.getAs[Long]("n_docs"),
        s"${r.getAs[String]("source")}: stages don't partition")
      assert(r.getAs[Long]("n_kept") == 0 || r.getAs[Long]("kept_chars") > 0)
    }
  }

  test("pipeline_curate thresholds actually discriminate on this corpus") {
    // A curation report that drops nothing (or everything) is a
    // mis-tuned pipeline; pin that every major stage fires somewhere
    // and a real fraction of the corpus survives.
    val rows = Pipeline.pipelineCurate(spark, sf01).collect()
    def tot(c: String) = rows.map(_.getAs[Long](c)).sum
    assert(tot("n_probe") > 0)
    assert(tot("n_lang") > 0)
    assert(tot("n_quality") > 0)
    assert(tot("n_contam") > 0)
    val kept = tot("n_kept"); val docs = tot("n_docs")
    assert(kept > 0 && kept < docs, s"kept $kept of $docs")
  }

  test("pipeline_curate kept set equals the standalone operators' verdicts") {
    // The single-scan map-side stage columns must agree doc-for-doc with
    // the standalone operators they re-express (the formulas are shared;
    // this pins the plan-shape refactor can't drift semantically).
    import graft.ops.{Dedup, TextAnalysis}
    val docs = Tables.documents(spark, sf01)
      .select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val survivors = Dedup.dedupExact(spark, sf01).collect()
      .map(_.getAs[Long]("keep_id")).toSet
    val en = TextAnalysis.textLangId(spark, sf01).collect()
      .filter(_.getAs[String]("pred_lang") == "en").map(_.getAs[Long]("doc_id")).toSet
    val goodQ = TextAnalysis.textQuality(spark, sf01).collect()
      .filter(_.getAs[Long]("score") >= Pipeline.QualityFloor)
      .map(_.getAs[Long]("doc_id")).toSet
    val contam = TextAnalysis.textDecontaminate(spark, sf01).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val expectedKept = docs.keySet.filter(id => id % 20 != 0 && survivors(id) &&
      en(id) && goodQ(id) && !contam(id))
    val expectedPerSource = expectedKept.groupBy(docs).view.mapValues(_.size.toLong).toMap
    val got = Pipeline.pipelineCurate(spark, sf01).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    assert(got.filter(_._2 > 0) == expectedPerSource.filter(_._2 > 0))
    assert(expectedKept.nonEmpty)
  }

  test("pipeline_curate probe attribution matches the eval-set rule exactly") {
    val got = Pipeline.pipelineCurate(spark, sf01).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_probe")).toMap
    val expected = Tables.documents(spark, sf01)
      .filter(col("doc_id") % 20 === 0)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    assert(got.filter(_._2 > 0) == expected)
  }

  test("pipeline_sample_mix: deterministic, rate-respecting, hash-stable membership") {
    def rows(dir: String) = Pipeline.pipelineSampleMix(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rate_bp"),
        r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"), r.getAs[Long]("chars_kept")))
      .toSeq
    val a = rows(sf01)
    assert(a == rows(sf01)) // rerun-identical: no RNG state anywhere
    assert(a.nonEmpty && a.forall { case (_, rate, total, kept, _) =>
      rate >= 2500 && rate <= 10000 && kept <= total
    })
    // full-rate sources keep everything; downsampled sources keep a
    // fraction statistically near their rate (coin is ~uniform mod 1e4)
    a.foreach { case (src, rate, total, kept, _) =>
      if (rate == 10000L) assert(kept == total, s"$src at full rate dropped rows")
      else {
        val expectedFrac = rate.toDouble / 10000.0
        val frac = kept.toDouble / total
        assert(math.abs(frac - expectedFrac) < 0.2,
          s"$src kept $frac of docs at target $expectedFrac")
      }
    }
    // membership is per-row hash-stable: the sf0.001 corpus is a prefix
    // of no other SF, but re-deriving the coin locally must agree
    val hm = graft.util.TextUtil.HashMod
    def coin(source: String, id: Long): Long = {
      val s = s"$source:$id"
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % hm) * Pipeline.MixSpread % hm % 10000L
    }
    val docs = Tables.documents(spark, sf01).select("doc_id", "source").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val expected = docs.groupBy(_._2).view.mapValues { ds =>
      ds.count { case (id, src) =>
        val rate = 10000L / (1L + java.lang.Math.floorMod(
          src.filter(_.isDigit).toLong, 4L))
        coin(src, id) < rate
      }.toLong
    }.toMap
    assert(a.map(r => r._1 -> r._4).toMap == expected)
  }
}
