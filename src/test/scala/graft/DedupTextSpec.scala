package graft

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.Row

class DedupTextSpec extends SparkSpec {

  test("dedup_exact keeps the min doc_id per content hash") {
    val rows = Dedup.dedupExact(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n") >= 1L))
  }

  test("dedup_minhash_lsh candidates verify with exact jaccard >= 0.7") {
    val rows = Dedup.dedupMinhashLsh(spark, sf).collect()
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.7))
    assert(rows.forall(r => r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
  }

  test("dedup_simhash pairs have hamming <= 2") {
    val rows = Dedup.dedupSimhash(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("hamming") <= 2L))
  }

  test("dedup_ngram_jaccard finds near-length high-overlap pairs") {
    val rows = Dedup.dedupNgramJaccard(spark, sf).collect()
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.8))
  }

  test("minhash-LSH pairs at >=0.8 are also found by exact ngram path on this corpus") {
    def key(r: Row) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
    val mh = Dedup.dedupMinhashLsh(spark, sf).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.8).map(key).toSet
    val ng = Dedup.dedupNgramJaccard(spark, sf).collect().map(key).toSet
    assert(mh.forall(ng.contains) || mh.isEmpty)
  }

  test("dedup_embedding maps each dup to a single earlier keeper") {
    val rows = Dedup.dedupEmbedding(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("dup_id")).distinct.length == rows.length)
    assert(rows.forall(r => r.getAs[Long]("keep_id") < r.getAs[Long]("dup_id")))
  }

  test("text_lang_id predicts a profile language per doc") {
    val rows = TextAnalysis.textLangId(spark, sf).collect()
    val langs = TextAnalysis.StopwordProfiles.map(_._1).toSet
    assert(rows.nonEmpty && rows.forall(r => langs.contains(r.getAs[String]("pred_lang"))))
  }

  test("text_quality ratios are in [0,1] and score in [0,1000]") {
    val rows = TextAnalysis.textQuality(spark, sf).collect()
    assert(rows.forall { r =>
      val u = r.getAs[Double]("uniq_ratio"); val a = r.getAs[Double]("alpha_ratio")
      u >= 0 && u <= 1 && a >= 0 && a <= 1 && r.getAs[Long]("score") <= 1000
    })
  }

  test("text_tokens aggregates per source with bpe >= ws token counts") {
    val rows = TextAnalysis.textTokens(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("sum_bpe_tok") >= r.getAs[Long]("sum_ws_tok")))
  }

  test("text_kmv_sketch estimates distinct tokens within sketch error bounds") {
    val rows = TextAnalysis.textKmvSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("kmv_estimate")
      // KMV with k=64 has ~1/sqrt(k-2) ≈ 13% stddev; allow 3σ.
      assert(math.abs(est - exact) <= math.max(3.0, 0.4 * exact),
        s"${r.getAs[String]("source")}: exact=$exact est=$est")
    }
  }

  test("text_fingerprint emits min-hash and distinct-window stats per doc") {
    val rows = TextAnalysis.textFingerprint(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_windows")))
  }
}
