package graft

import graft.ops.IvfIndex
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  private lazy val vectors = Tables.embeddings(spark, sf).select("vec_id", "embedding")

  test("Lloyd iterations do not increase quantization error") {
    val m0 = IvfIndex.fit(vectors, "vec_id", "embedding", k = 8, iters = 0)
    val m3 = IvfIndex.fit(vectors, "vec_id", "embedding", k = 8, iters = 3)
    val e0 = IvfIndex.quantizationError(vectors, "embedding", m0)
    val e3 = IvfIndex.quantizationError(vectors, "embedding", m3)
    assert(e3 <= e0 + 1e-9, s"error went up: $e0 -> $e3")
  }

  test("fit is deterministic across runs") {
    val a = IvfIndex.fit(vectors, "vec_id", "embedding", k = 4, iters = 2)
    val b = IvfIndex.fit(vectors, "vec_id", "embedding", k = 4, iters = 2)
    assert(a == b)
  }

  test("vs_ivf_trained grades the trained codebook with one recall row per query") {
    val rows = ops.VectorSearch.vsIvfTrained(spark, sf).collect()
    val nQueries = vectors.filter(col("vec_id") % 100 === 0).count()
    assert(rows.length == nQueries)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 5L)
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      // The query's own cell is always probed, so the self-match at
      // distance 0 is always recalled.
      assert(r.getAs[Long]("n_hits") >= 1L)
      // THE acceptance gate: the query reports the floor verdict in
      // below_floor rather than throwing; this spec is what enforces it.
      assert(r.getAs[Long]("below_floor") == 0L)
      assert(r.getAs[Long]("mean_recall_ppm") >= ops.VectorSearch.IvfTrainedRecallFloorPpm)
    }
    val meanPpm = 1000000L * rows.map(_.getAs[Long]("n_hits")).sum /
      rows.map(_.getAs[Long]("n_exact")).sum
    info(s"sf=$sf mean recall ppm = $meanPpm over ${rows.length} queries")
    assert(rows.head.getAs[Long]("mean_recall_ppm") == meanPpm)
  }

  test("integer Lloyd trainer is deterministic and lives on the int8 grid") {
    import org.apache.spark.sql.functions.{abs => cabs, array_max, transform => ctransform, broadcast, round => cround, lit, max => cmax}
    val e = vectors
    val mx = e.agg(cmax(array_max(ctransform(col("embedding"), x => cabs(x)))).as("maxabs"))
    val qv = e.crossJoin(broadcast(mx)).select(col("vec_id"),
      ctransform(col("embedding"),
        x => cround(x * lit(127.0) / col("maxabs"), 0).cast("long")).as("q"))
    val a = IvfIndex.fitInt(qv, "vec_id", "q", k = 8, iters = 2)
    val b = IvfIndex.fitInt(qv, "vec_id", "q", k = 8, iters = 2)
    assert(a == b)
    a.centroids.foreach { case (_, c) =>
      assert(c.forall(x => x >= -127L && x <= 127L))
    }
    // Training moved at least one centroid off its init vector.
    val init = IvfIndex.fitInt(qv, "vec_id", "q", k = 8, iters = 0)
    assert(a != init)
  }

  test("vs_ivf_upsert: one report row per appended vector, conserved cell stats") {
    val rows = ops.VectorSearch.vsIvfUpsert(spark, sf).collect()
    val nBatch = vectors.filter(col("vec_id") % 50 === 0).count()
    val nBase = vectors.filter(col("vec_id") % 50 =!= 0).count()
    assert(rows.length == nBatch)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 5L)
      // self is in the appended index and its own cell is probe 1, so
      // the self-match is always recalled (vs_ivf_trained's convention)
      assert(r.getAs[Long]("n_hits") >= 1L)
      assert(r.getAs[Long]("below_floor") == 0L)
      assert(r.getAs[Long]("cell_n_new") >= 1L)
      assert(r.getAs[Long]("drift_ppm") >= 0L)
    }
    // per-cell stats are consistent within a cell and conserve the batch
    val byCell = rows.groupBy(_.getAs[Long]("cell"))
    byCell.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("cell_n_new")).toSet.size == 1)
      assert(rs.map(_.getAs[Long]("cell_n_base")).toSet.size == 1)
      assert(rs.length.toLong == rs.head.getAs[Long]("cell_n_new"))
    }
    assert(byCell.values.map(_.head.getAs[Long]("cell_n_new")).sum == nBatch)
    assert(byCell.values.map(_.head.getAs[Long]("cell_n_base")).sum <= nBase)
    // drift of in-distribution data should be mild: appended vectors are
    // drawn from the same corpus, so per-cell mean d2 stays within 3x of
    // the base mean (ppm 3e6) — the alarm headroom a retrain trigger
    // would use
    rows.foreach(r => assert(r.getAs[Long]("drift_ppm") <= 3000000L,
      s"drift_ppm ${r.getAs[Long]("drift_ppm")} suspiciously high for in-distribution append"))
    val meanPpm = 1000000L * rows.map(_.getAs[Long]("n_hits")).sum /
      rows.map(_.getAs[Long]("n_exact")).sum
    info(s"sf=$sf ivf upsert mean recall ppm = $meanPpm over ${rows.length} appended")
    assert(rows.head.getAs[Long]("mean_recall_ppm") == meanPpm)
  }

  test("probe search returns k neighbors per query with sane recall vs exact") {
    val model = IvfIndex.fit(vectors, "vec_id", "embedding", k = 8, iters = 2)
    val queries = vectors.filter(col("vec_id") % 100 === 0)
    val approx = IvfIndex.search(vectors, "vec_id", "embedding", model,
      queries, "vec_id", "embedding", nprobe = 4, kNeighbors = 5).collect()
    val byQ = approx.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty && byQ.values.forall(_.length == 5))
    // Self-match must always be found (query's own cell is its nearest
    // probe), at distance 0.
    byQ.foreach { case (q, rows) =>
      assert(rows.exists(r => r.getAs[Long]("c_id") == q && r.getAs[Double]("dist") == 0.0))
    }
  }
}
