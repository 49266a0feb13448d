package graft

import org.apache.spark.sql.functions._

/** Planted-skew stress (verdict r6 item 4 / r8 item 6): SynthScale's skew
  * mode plants a hot user (~1% of ALL events on one user_id) and a hot
  * embedding (1 in 128 vectors identical → one over-cap bucket in every
  * LSH band). These specs prove the skew machinery ENGAGES on planted
  * hot keys and that results remain exactly correct — not merely that the
  * helpers work on uniform data (SkewSpec) or on synthetic 10-row frames.
  */
class PlantedSkewSpec extends SparkSpec {
  private val Copies = 8

  private lazy val skewDir: String = {
    val out = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // hotEvery=5 (20% of events on one user): the sf0.001 corpus has only
    // a few hundred users, so the production-profile 1% plant would not
    // dominate the organic per-user counts; at sf1 stress runs the
    // default 1-in-100 is used.
    graft.tools.SynthScale.run(spark, sf, out, Copies, skew = true, skewHotEvery = 5L)
    out
  }

  test("skew plant is real: one user dominates the event stream") {
    val ev = Tables.events(spark, skewDir)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    val counts = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val total = counts.map(_._2).sum
    val hot = counts.maxBy(_._2)
    val medianOther = {
      val others = counts.filter(_._1 != hot._1).map(_._2).sorted
      others(others.length / 2)
    }
    assert(hot._2 >= total / 6, s"hot user ${hot._1} has ${hot._2} of $total")
    assert(hot._2 > 20L * medianOther,
      s"plant too weak: hot ${hot._2} vs median $medianOther")
  }

  test("ev_skew_agg (saltedAgg) is exact on the planted-hot-user corpus") {
    val got = SparkEntry.queries("ev_skew_agg")(spark, skewDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Tables.events(spark, skewDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(graft.util.Det.cents(col("value"))).as("sum_value_c"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("ev_bot_detect is exact on the planted-hot-user corpus (whale cadence)") {
    val got = SparkEntry.queries("ev_bot_detect")(spark, skewDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val ev = Tables.events(spark, skewDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hotUid = ev.groupBy(_._1).view.mapValues(_.length).maxBy(_._2)._1
    val want = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val d = ts.sliding(2).collect { case Array(a, b) =>
        math.min((b - a) / 1000000L, graft.ops.Events.BotGapCapS) }.toSeq
      if (d.length < graft.ops.Events.BotMinGaps) None
      else {
        val n = d.length.toLong; val sd = d.sum; val sd2 = d.map(x => x * x).sum
        val cv2 = if (sd == 0) 0L
          else ((BigInt(1000000) * (BigInt(n) * sd2 - BigInt(sd) * sd)) /
            (BigInt(sd) * sd)).toLong
        Some((uid, n, sd / n, cv2,
          if (cv2 < graft.ops.Events.BotCv2FloorPpm) 1L else 0L))
      }
    }.sortBy(_._1)
    assert(got.toSeq == want)
    // the whale actually exercises the aggregate: it must clear the
    // min-gap filter by a wide margin on the planted corpus
    assert(want.exists { case (uid, n, _, _, _) =>
      uid == hotUid && n > 50L * graft.ops.Events.BotMinGaps })
  }

  test("cappedSelfPairs engages on the planted over-cap LSH buckets and stays exact") {
    val cap = 20L
    val e = Tables.embeddings(spark, skewDir)
    val bands = graft.ops.VectorSearch.lshBands(e, "vec_id", "embedding")
    // engagement: the identical planted vectors land in the SAME bucket of
    // every band, and that bucket exceeds the cap in all 16 bands
    val hotIds = e.filter(pmod(col("vec_id"), lit(128L)) === 0L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(hotIds.size > cap, s"plant too small: ${hotIds.size} hot vectors")
    val sizes = bands.groupBy("band_idx", "band_val").count()
    val overCap = sizes.filter(col("count") > cap).count()
    assert(overCap >= graft.ops.VectorSearch.LshBands,
      s"expected an over-cap bucket in every band, got $overCap")
    val got = graft.util.Skew.cappedSelfPairs(bands, "vec_id",
        Seq("band_idx", "band_val"), cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no hot-hot pair can survive: identical vectors share ONLY over-cap buckets
    assert(!got.exists { case (a, b) => hotIds(a) && hotIds(b) })
    // exactness: independent driver-side replay over the collected band frame
    val bandRows = bands.collect().map(r => ((r.getInt(1), r.getLong(2)), r.getLong(0)))
    val byBucket = bandRows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val want = byBucket.valuesIterator.filter(_.length <= cap).flatMap { ids =>
      for (i <- ids.indices.iterator; j <- (i + 1) until ids.length)
        yield (ids(i), ids(j))
    }.toSet
    assert(got == want)
  }
}
