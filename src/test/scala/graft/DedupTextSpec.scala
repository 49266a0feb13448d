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

  test("simhash chunk-pair banding is pigeonhole-exact: output == brute-force hamming <= 2") {
    // ≤2 bit errors damage ≤2 of the 4 chunks, so one of the C(4,2)=6
    // chunk pairs is always intact — the banded candidate join must lose
    // NO qualifying pair vs. the O(n²) scan it replaces at scale.
    val chunks = Dedup.simhashChunksDf(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Array(r.getAs[Long]("c0"), r.getAs[Long]("c1"), r.getAs[Long]("c2"), r.getAs[Long]("c3")))
      .sortBy(_._1)
    val brute = (for {
      i <- chunks.indices.iterator; j <- (i + 1 until chunks.length).iterator
      ham = (0 until 4).map(c =>
        java.lang.Long.bitCount(chunks(i)._2(c) ^ chunks(j)._2(c))).sum
      if ham <= 2
    } yield (chunks(i)._1, chunks(j)._1)).toSet
    val banded = Dedup.dedupSimhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(banded == brute)
  }

  test("simhash candidate keys are 32-bit chunk pairs, not a fixed 2^16 space") {
    val chunks = Dedup.simhashChunksDf(spark, sf).collect()
    // Pair keys c_i*65536 + c_j exceed any single chunk's 16-bit range:
    // the bucket keyspace grows with content, not a fixed 65,536 buckets.
    val pairKeys = chunks.flatMap { r =>
      val c = Array(r.getAs[Long]("c0"), r.getAs[Long]("c1"), r.getAs[Long]("c2"), r.getAs[Long]("c3"))
      Dedup.ChunkPairs.map { case (i, j) => c(i) * 65536L + c(j) }
    }
    assert(pairKeys.max > 65535L)
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

  test("connected components label a 64-deep chain in O(log) rounds") {
    // A chain is the worst case for min-id propagation (O(diameter) = 63
    // rounds); the alternating large-star/small-star loop must collapse
    // it in a logarithmic number of rounds.
    import spark.implicits._
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(chain)
    val out = labels.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id")))
    assert(out.length == 64)
    assert(out.forall(_._2 == 0L))
    assert(rounds <= 15, s"took $rounds rounds")
  }

  test("connected components use reliable checkpoints when a checkpoint dir is set") {
    // Covers persistRound's cluster-mode branch: with a checkpoint dir
    // configured, rounds materialize via reliable checkpoint() instead
    // of localCheckpoint, with identical results.
    val dirFile = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    // The public API cannot unset a checkpoint dir; the test hook can
    // (r15 — previously a documented JVM-wide leak that flipped every
    // later suite's Persist.stage onto the reliable branch). Restore
    // the local branch in a finally; delete the tree on JVM exit.
    graft.util.Persist.deleteOnExit(dirFile)
    val dir = dirFile.toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      import spark.implicits._
      val chain = (0L until 16L).map(i => (i, i + 1)).toDF("a_id", "b_id")
      val out = Dedup.connectedComponentsWithRounds(chain)._1.collect()
      assert(out.length == 17 && out.forall(_.getAs[Long]("cluster_id") == 0L))
      // the checkpoint dir was actually used
      assert(new java.io.File(dir).listFiles != null)
    } finally org.apache.spark.GraftCheckpointTestHook.clear(spark.sparkContext)
  }

  test("connected components match a union-find oracle on random graphs") {
    import spark.implicits._
    // Deterministic pseudo-random graphs (LCG seeds): mixed shapes —
    // chains, cliques, isolated edges — checked against exact union-find.
    for (seed <- Seq(1L, 7L, 42L)) {
      var x = seed
      def nextInt(bound: Int): Int = {
        x = (x * 6364136223846793005L + 1442695040888963407L)
        (java.lang.Math.floorMod(x >>> 16, bound.toLong)).toInt
      }
      val n = 30
      val edges = (0 until 40).map(_ => (nextInt(n).toLong, nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      // union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(a: Int): Int = { var r = a; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val ra = find(a.toInt); val rb = find(b.toInt)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> {
          // component min = min over all nodes sharing the root
          val root = find(id.toInt)
          (0 until n).filter(v => find(v) == root)
            .filter(v => edges.exists(e => e._1 == v || e._2 == v)).min.toLong
        }).toMap
      val got = Dedup.connectedComponentsWithRounds(edges.toDF("a_id", "b_id"))._1
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("connected components handle two components and an empty graph") {
    import spark.implicits._
    val two = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("a_id", "b_id")
    val lbl = Dedup.connectedComponentsWithRounds(two)._1.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"))).toMap
    assert(lbl == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.connectedComponentsWithRounds(empty)._1.collect().isEmpty)
  }

  test("dedup_embedding maps each dup to a single earlier keeper") {
    val rows = Dedup.dedupEmbedding(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("dup_id")).distinct.length == rows.length)
    assert(rows.forall(r => r.getAs[Long]("keep_id") < r.getAs[Long]("dup_id")))
  }

  test("dedup_semantic keeps exactly the best-scoring member of a planted family") {
    import spark.implicits._
    // Planted 3-member near-dup family {10,11,12} (chain pairs — CC must
    // close it) plus an isolated pair {20,21}. Best member of the family
    // is the score-9 tie broken to the SMALLER id (11).
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("a_id", "b_id")
    val scores = Seq((10L, 5L), (11L, 9L), (12L, 9L), (20L, 3L), (21L, 7L))
      .toDF("doc_id", "score")
    val got = Dedup.semanticSurvivors(pairs, scores).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("score"), r.getAs[Long]("survives"))).toSeq
    assert(got == Seq(
      (10L, 10L, 5L, 0L), (11L, 10L, 9L, 1L), (12L, 10L, 9L, 0L),
      (20L, 20L, 3L, 0L), (21L, 20L, 7L, 1L)))
  }

  test("dedup_semantic: one survivor per cluster, members match dedup_embedding pairs") {
    val rows = Dedup.dedupSemantic(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, ms) =>
      assert(ms.map(_.getAs[Long]("survives")).sum == 1L,
        s"cluster $cid must keep exactly one member")
      val best = ms.maxBy(m => (m.getAs[Long]("score"), -m.getAs[Long]("doc_id")))
      assert(best.getAs[Long]("survives") == 1L,
        s"cluster $cid survivor is not the (score desc, id asc) best")
    }
    // members = exactly the endpoints of the verified embedding pair graph
    val endpoints = Dedup.dedupEmbedding(spark, sf).collect()
      .flatMap(r => Seq(r.getAs[Long]("dup_id"), r.getAs[Long]("keep_id"))).toSet
    // dedup_embedding keeps only the FIRST keeper per dup, so its
    // endpoint set can be a subset of the full pair graph's — every
    // emitted endpoint must still be a labeled member.
    assert(endpoints.subsetOf(rows.map(_.getAs[Long]("doc_id")).toSet))
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

  test("text_chunk windows tile each document: contiguous indices, exact lengths") {
    val rows = TextAnalysis.textChunk(spark, sf).collect()
    assert(rows.nonEmpty)
    val S = TextAnalysis.ChunkStride.toLong
    val W = TextAnalysis.ChunkSize.toLong
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { cs =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      assert(sorted.map(_.getAs[Long]("chunk_idx")).toSeq ==
        (0L until sorted.length).toSeq)
      // Reconstruct the document length from the last chunk, then every
      // chunk's length must be exactly min(W, len - idx·S).
      val m = sorted.length - 1L
      val len = m * S + sorted.last.getAs[Long]("chunk_len")
      sorted.foreach { c =>
        val i = c.getAs[Long]("chunk_idx")
        assert(c.getAs[Long]("chunk_len") == math.min(W, len - i * S))
      }
    }
  }

  test("text_decontaminate flags only non-probe docs with bounded hit ratios") {
    val rows = TextAnalysis.textDecontaminate(spark, sf).collect()
    assert(rows.nonEmpty) // the planted dup clusters overlap the probe set
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 20 != 0) // probe docs never flag themselves
      val hits = r.getAs[Long]("n_hits"); val total = r.getAs[Long]("n_shingles")
      assert(hits >= 1 && hits <= total)
      val ratio = r.getAs[Double]("hit_ratio")
      assert(ratio > 0.0 && ratio <= 1.0)
    }
  }

  test("text_bm25 ranks by exact integer micro-score, query doc matches all terms") {
    val rows = TextAnalysis.textBm25(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= TextAnalysis.Bm25TopK)
    val scores = rows.map(_.getAs[Long]("score_micro")).toSeq
    assert(scores == scores.sortBy(-_))
    // Doc 0 is the query source, so it matches every query term and must
    // place in the top-k with the maximal n_match.
    val d0 = rows.find(_.getAs[Long]("doc_id") == 0L)
    assert(d0.isDefined)
    assert(d0.get.getAs[Long]("n_match") == rows.map(_.getAs[Long]("n_match")).max)
  }

  test("text_corpus_overlap: θ-sample estimates track the exact cross-split overlap") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("text_corpus_overlap")(spark, sf).collect().head
    // structural invariants of the θ-sketch algebra
    val (nA, nB, nI, nU) = (row.getAs[Long]("n_train_sample"),
      row.getAs[Long]("n_test_sample"), row.getAs[Long]("n_inter"),
      row.getAs[Long]("n_union"))
    assert(row.getAs[Long]("theta") > 0L)
    assert(nI <= math.min(nA, nB) && nU == nA + nB - nI)
    // exact ground truth, computed the slow way (full distinct-set join)
    val bucket = (col("doc_id") % 1000000007L * 2654435761L % 1000000007L) % 10
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .withColumn("toks",
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0))
      .filter(size(col("toks")) >= graft.ops.TextAnalysis.DecontShingle)
      .withColumn("split", when(bucket < 8, "train").when(bucket >= 9, "test"))
      .filter(col("split").isNotNull)
    val sh = docs.select(col("split"), explode(transform(
        sequence(lit(0), size(col("toks")) - graft.ops.TextAnalysis.DecontShingle),
        i => array_join(slice(col("toks"), i + 1,
          lit(graft.ops.TextAnalysis.DecontShingle)), " "))).as("s"))
      .distinct()
    val a = sh.filter(col("split") === "train").select("s")
    val b = sh.filter(col("split") === "test").select("s")
    val exactInter = a.join(b, "s").count()
    val exactUnion = a.count() + b.count() - exactInter
    val truePpm = 1000000L * exactInter / exactUnion
    info(s"exact inter=$exactInter union=$exactUnion ppm=$truePpm; " +
      s"sketch est_inter=${row.getAs[Long]("est_inter")} ppm=${row.getAs[Long]("jaccard_ppm")}")
    // the K=4096 sample must land within 2x of truth on this corpus
    val est = row.getAs[Long]("est_inter")
    assert(est * 2 >= exactInter && est <= exactInter * 2,
      s"est_inter $est vs exact $exactInter out of 2x band")
    val ppm = row.getAs[Long]("jaccard_ppm")
    assert(ppm * 2 >= truePpm && ppm <= truePpm * 2,
      s"jaccard_ppm $ppm vs exact $truePpm out of 2x band")
  }
}
