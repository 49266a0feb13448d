package graft

import graft.functions._
import graft.ops.IvfIndex
import graft.util.TextUtil
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** Proves the hand-rolled index/dedup paths against Spark MLlib — the
  * standard library on the classpath — not just against DuckDB (the
  * BASELINE's "MLlib/DataFrame for batch embedding + index build"
  * clause). The custom paths exist because they are integer-exact and
  * SQL-oracle-able; these specs show they also agree with (and are not
  * worse than) what MLlib computes for the same task at sf0.01.
  */
class MllibParitySpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.01"

  private lazy val vecs =
    Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
  private lazy val mlVecs = vecs.select(col("vec_id"),
    array_to_vector(col("embedding").cast("array<double>")).as("features"))

  test("IvfIndex Lloyd trainer is cost-competitive with MLlib KMeans") {
    val n = vecs.count().toDouble
    val km = new KMeans().setK(8).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").fit(mlVecs)
    val mllibMsd = km.summary.trainingCost / n
    val model = IvfIndex.fit(vecs, "vec_id", "embedding", k = 8, iters = 2)
    val customMsd = vecs.select(
      least(model.centroids.map { case (_, c) =>
        val d = l2_distance(col("embedding"), typedlit(c))
        d * d
      }: _*).as("d2")).agg(avg("d2")).head().getDouble(0)
    info(f"mean squared distance: mllib=$mllibMsd%.5f custom=$customMsd%.5f " +
      f"ratio=${customMsd / mllibMsd}%.3f")
    // MLlib gets k-means|| init + 10 iterations vs our deterministic
    // first-k init + 2; competitive means the same ballpark, not a win.
    assert(customMsd <= 1.5 * mllibMsd + 1e-9,
      s"custom trainer quantizes >1.5x worse than MLlib KMeans: $customMsd vs $mllibMsd")
  }

  test("integer-grid Lloyd (vs_ivf_trained trainer) matches MLlib KMeans cost ballpark") {
    val n = vecs.count().toDouble
    val km = new KMeans().setK(8).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").fit(mlVecs)
    val mllibMsd = km.summary.trainingCost / n
    val mx = vecs.agg(max(array_max(transform(col("embedding"), x => abs(x))))
      .cast("double")).head().getDouble(0)
    val qv = vecs.select(col("vec_id"),
      transform(col("embedding"), x => round(x * lit(127.0) / lit(mx), 0).cast("long")).as("q"))
    val im = IvfIndex.fitInt(qv, "vec_id", "q", k = 8, iters = 2)
    // De-quantize the integer centroids back to float space for an
    // apples-to-apples squared-Euclidean cost.
    val centsF = im.centroids.map { case (cid, c) =>
      (cid, c.map(x => x.toDouble * mx / 127.0))
    }
    val intMsd = vecs.select(
      least(centsF.map { case (_, c) =>
        val d = l2_distance(col("embedding"), typedlit(c))
        d * d
      }: _*).as("d2")).agg(avg("d2")).head().getDouble(0)
    info(f"mean squared distance: mllib=$mllibMsd%.5f intGrid=$intMsd%.5f " +
      f"ratio=${intMsd / mllibMsd}%.3f")
    assert(intMsd <= 1.5 * mllibMsd + 1e-9,
      s"integer-grid trainer quantizes >1.5x worse than MLlib KMeans: $intMsd vs $mllibMsd")
  }

  test("dedup_minhash_lsh pair set agrees with MLlib MinHashLSH at the same threshold") {
    val ours = ops.Dedup.dedupMinhashLsh(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ours.nonEmpty, "no verified near-dup pairs at sf0.01 — test is vacuous")

    // Same shingling as the custom path, then the MLlib standard pipeline:
    // binary HashingTF shingle vectors -> MinHashLSH -> approxSimilarityJoin
    // at Jaccard distance 0.3 (= Jaccard similarity 0.7, the custom verify
    // threshold).
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"),
        TextUtil.toksCol.as("toks"))
      .filter(size(col("toks")) >= 3)
    val sh = docs.select(col("doc_id"),
      array_distinct(expr(
        "transform(sequence(0, size(toks)-3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"))
        .as("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(sh).select("doc_id", "features")
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(16).setSeed(7L)
    val pairs = lsh.fit(feat).approxSimilarityJoin(feat, feat, 0.3, "jdist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val inter = (ours intersect pairs).size.toDouble
    val recallOfOurs = inter / ours.size
    val recallOfMllib = if (pairs.isEmpty) 1.0 else inter / pairs.size
    info(f"ours=${ours.size} mllib=${pairs.size} inter=${inter.toInt} " +
      f"recall(ours in mllib)=$recallOfOurs%.3f recall(mllib in ours)=$recallOfMllib%.3f")
    // The two pipelines hash shingles into different spaces (poly_hash vs
    // 2^18 HashingTF) so exact-boundary pairs may differ; the planted
    // near-dup pairs sit well above 0.7 and must agree.
    assert(recallOfOurs >= 0.9, s"MLlib MinHashLSH missed our pairs: $recallOfOurs")
    assert(recallOfMllib >= 0.9, s"our pipeline missed MLlib pairs: $recallOfMllib")
  }

  test("embedding LSH candidate family agrees with MLlib BucketedRandomProjectionLSH") {
    // Ground truth: the exact all-pairs cosine-sim >= 0.4 set
    // (vs_range_search semantics). On unit-normalized vectors Euclidean
    // distance sqrt(2*(1-sim)) is monotone in cosine distance, so BRP-LSH
    // with threshold sqrt(2*0.6) finds exactly the sim >= 0.4 pairs it
    // reaches through its buckets.
    val exact = ops.VectorSearch.vsRangeSearch(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val unit = vecs.select(col("vec_id"),
      array_to_vector(vector_normalize(col("embedding")).cast("array<double>"))
        .as("features"))
    val brp = new BucketedRandomProjectionLSH().setInputCol("features")
      .setOutputCol("hashes").setBucketLength(0.5).setNumHashTables(8).setSeed(11L)
    val found = brp.fit(unit).approxSimilarityJoin(unit, unit, math.sqrt(2 * 0.6) + 1e-9, "edist")
      .select(col("datasetA.vec_id").as("a"), col("datasetB.vec_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inter = (found intersect exact).size.toDouble
    val recall = inter / exact.size
    // BRP pairs are a SUBSET of the exact set (its distance filter is
    // exact; only bucketing loses pairs) — precision must be 1.
    val extras = found -- exact
    info(f"exact=${exact.size} brp=${found.size} recall=$recall%.3f extras=${extras.size}")
    assert(extras.isEmpty,
      s"BRP-LSH returned pairs outside the exact sim>=0.4 set: ${extras.take(5)}")
    assert(recall >= 0.5, s"BRP-LSH recall vs exact too low: $recall")
  }
}
