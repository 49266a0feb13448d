package graft

import graft.ops.VectorSearch

/** The drift-triggered retrain (`vs_ivf_retrain`) — the loop
  * `vs_ivf_upsert`'s `drift_ppm` signals but never closed: a drifted
  * append must FIRE the flag and the retrain must actually recover the
  * index (SSE down, serving grade not worse); an undrifted append must
  * NOT fire it, and the after-arms must replay the frozen model.
  */
class IvfRetrainSpec extends SparkSpec {

  test("drifted append fires the flag and the retrain recovers the index") {
    val row = SparkEntry.queries("vs_ivf_retrain")(spark, sf).head()
    assert(row.getAs[Long]("retrain_due") == 1L,
      s"a +maxabs shift must push drift past the threshold: " +
        s"drift=${row.getAs[Long]("drift_max_ppm")}")
    assert(row.getAs[Long]("drift_max_ppm") >= VectorSearch.RetrainDriftPpm)
    assert(row.getAs[Long]("sse_after") < row.getAs[Long]("sse_before"),
      s"retrain on the merged corpus must cut quantization error: " +
        s"${row.getAs[Long]("sse_before")} -> ${row.getAs[Long]("sse_after")}")
    assert(row.getAs[Long]("recall_after_ppm") >= row.getAs[Long]("recall_before_ppm"),
      "retrain must not degrade the serving grade")
    info(s"drift=${row.getAs[Long]("drift_max_ppm")} ppm, " +
      s"sse ${row.getAs[Long]("sse_before")} -> ${row.getAs[Long]("sse_after")}, " +
      s"recall ${row.getAs[Long]("recall_before_ppm")} -> " +
      s"${row.getAs[Long]("recall_after_ppm")} ppm")
  }

  test("undrifted append does NOT fire the flag; no silent retrain") {
    val row = VectorSearch.ivfRetrainWith(spark, sf, drifted = false).head()
    assert(row.getAs[Long]("retrain_due") == 0L,
      s"same-distribution append must stay under the threshold: " +
        s"drift=${row.getAs[Long]("drift_max_ppm")}")
    assert(row.getAs[Long]("sse_after") == row.getAs[Long]("sse_before"),
      "without the flag the frozen model must be replayed unchanged")
    assert(row.getAs[Long]("recall_after_ppm") == row.getAs[Long]("recall_before_ppm"))
  }
}
