package graft

import graft.ops.{Dedup, VectorSearch}
import graft.util.Skew
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Banded-vs-exact recall guarantees for the LSH paths — pins the
  * documented behavior so band-parameter changes can't silently zero
  * recall. Everything here is deterministic (fixed corpus, LCG planes,
  * integer hashes): the asserted floors are measured values with
  * headroom, not statistical expectations.
  */
class LshRecallSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"
  private val sf1 = "/root/testdata/sf0.1"

  private def pairs(rows: Array[Row], a: String, b: String): Set[(Long, Long)] =
    rows.map(r => (r.getAs[Long](a), r.getAs[Long](b))).toSet

  test("embedding LSH recall vs the exact baseline stays in the documented regime") {
    // Documented (Dedup.dedupEmbedding / VectorSearch.vsLshSearch): the
    // 16-plane bands are intentionally selective at the corpus's sim≈0.5
    // regime — recall of exact >=0.4 pairs is LOW but must never zero
    // out, and every banded survivor must be a true >=0.4 pair.
    for (dir <- Seq(sf01, sf1)) {
      val exact = pairs(VectorSearch.vsRangeSearch(spark, dir).collect(), "a_id", "b_id")
      val banded = pairs(VectorSearch.vsLshSearch(spark, dir).collect(), "a_id", "b_id")
      assert(exact.nonEmpty, s"$dir: exact baseline is empty — vacuous recall")
      assert(banded.nonEmpty, s"$dir: banded output is empty — recall zeroed")
      assert(banded.subsetOf(exact), s"$dir: banded pair failed the exact filter")
      val recall = banded.size.toDouble / exact.size
      info(s"$dir: banded recall ${banded.size}/${exact.size} = $recall")
      assert(recall >= 0.05, s"$dir: recall $recall collapsed below the documented floor")
    }
  }

  test("narrower bands raise candidate recall (the knob for a 0.4-recall requirement)") {
    val e = Tables.embeddings(spark, sf01).select("vec_id", "embedding")
    val exact = pairs(VectorSearch.vsRangeSearch(spark, sf01).collect(), "a_id", "b_id")
    def candRecall(planesPerBand: Int): Double = {
      val bands = VectorSearch.lshBands(e, "vec_id", "embedding",
        planesPerBand = planesPerBand, bands = 16)
      val cand = pairs(Skew.cappedSelfPairs(bands, "vec_id",
        Seq("band_idx", "band_val"), VectorSearch.LshBucketCap).collect(), "a_id", "b_id")
      exact.count(cand.contains).toDouble / exact.size
    }
    val r8 = candRecall(8)
    val r16 = candRecall(16)
    info(s"candidate recall: 8-plane $r8 vs 16-plane $r16")
    assert(r8 > r16, s"8-plane bands ($r8) must out-recall 16-plane bands ($r16)")
  }

  test("ngram minhash banding recalls 100% of exact >=0.8 char-gram pairs") {
    // The near-dup guarantee the blocking is designed around: every pair
    // with exact char-3-gram Jaccard >= 0.8 (TESTDATA's planted
    // near-dups) shares a (minhash-band ∧ length-band) key, so the
    // banded output must EQUAL the exact all-pairs result — zero lost
    // recall, zero false survivors.
    graft.functions.register(spark)
    val g = Tables.documents(spark, sf01).filter(length(col("text")) >= 3)
      .select(col("doc_id"), expr(
        "array_sort(array_distinct(transform(sequence(1, length(lower(text))-2), " +
        "i -> poly_hash_cp(substr(lower(text), i, 3)))))").as("grams"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[scala.collection.Seq[Long]]("grams").toArray))
      .sortBy(_._1)
    def inter(x: Array[Long], y: Array[Long]): Int = {
      var i = 0; var j = 0; var n = 0
      while (i < x.length && j < y.length) {
        if (x(i) == y(j)) { n += 1; i += 1; j += 1 }
        else if (x(i) < y(j)) i += 1 else j += 1
      }
      n
    }
    val exact = (for {
      i <- g.indices.iterator; j <- (i + 1 until g.length).iterator
      in = inter(g(i)._2, g(j)._2)
      jac = in.toDouble / (g(i)._2.length + g(j)._2.length - in)
      if jac >= 0.8
    } yield (g(i)._1, g(j)._1)).toSet
    val banded = pairs(Dedup.dedupNgramJaccard(spark, sf01).collect(), "a_id", "b_id")
    assert(exact.nonEmpty, "no exact >=0.8 pairs — vacuous")
    assert(banded == exact,
      s"missed: ${(exact -- banded).take(5)}; extra: ${(banded -- exact).take(5)}")
  }
}
