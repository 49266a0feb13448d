package graft

import org.apache.spark.sql.functions._

/** ev_bot_detect: planted-cadence check (a metronome bot must flag, a
  * bursty human must not) plus an exact driver-side replay on the real
  * sf0.001 corpus.
  */
class BotDetectSpec extends SparkSpec {

  test("planted metronome bot flags; bursty human does not") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-bot").toString
    // bot: exact 60 s ticks; human: same span, bursty gaps (1 s..hours)
    val botRows = (0 until 30).map(i => (i.toLong, i * 60L * 1000000000L, 1L))
    val gaps = Seq(1L, 5L, 7200L, 30L, 2L, 900L, 11L, 3600L, 4L, 250L)
    val humanTs = gaps ++ gaps ++ gaps // 30 gaps
    val humanRows = humanTs.scanLeft(0L)(_ + _).zipWithIndex.map {
      case (tSec, i) => (100L + i, tSec * 1000000000L, 2L)
    }
    (botRows ++ humanRows)
      .toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val got = graft.ops.Events.evBotDetect(spark, base).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == (0L, 1L), s"metronome bot must flag with cv2=0: ${got(1L)}")
    assert(got(2L)._2 == 0L, s"bursty human must not flag: ${got(2L)}")
    assert(got(2L)._1 > graft.ops.Events.BotCv2FloorPpm)
  }

  test("exact replay on sf0.001") {
    val got = graft.ops.Events.evBotDetect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val d = ts.sliding(2).collect { case Array(a, b) =>
        math.min((b - a) / 1000000L, graft.ops.Events.BotGapCapS) }.toSeq
      if (d.length < graft.ops.Events.BotMinGaps) None
      else {
        val n = d.length.toLong; val sd = d.sum; val sd2 = d.map(x => x * x).sum
        // BigInt replay of the exact single decimal floor division
        val cv2 = if (sd == 0) 0L
          else ((BigInt(1000000) * (BigInt(n) * sd2 - BigInt(sd) * sd)) /
            (BigInt(sd) * sd)).toLong
        Some((uid, n, sd / n, cv2,
          if (cv2 < graft.ops.Events.BotCv2FloorPpm) 1L else 0L))
      }
    }.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("ANSI mode: whale past the r9 ladder bound, constant-gap and zero-gap users") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-bot-ansi").toString
    // Whale: 400k alternating 100 s / 500 s gaps ⇒ Σd = 1.2e8, (Σd)² ≈
    // 1.44e16, and the r9 ladder's r1*1000 could reach 1.44e19 > 2⁶³ —
    // ARITHMETIC_OVERFLOW under ANSI before this fix. cv² = (a−b)²/(a+b)²
    // = 400²/600² ⇒ exactly 444444 ppm (n even).
    val nW = 400000
    val whaleGaps = Array.tabulate(nW)(i => if (i % 2 == 0) 100L else 500L)
    val whaleTs = whaleGaps.scanLeft(0L)(_ + _)
    val whale = whaleTs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t * 1000000000L, 1L)
    }
    // Constant-gap metronome (Σd > 0, cv² = 0 ⇒ flags) and an all-zero-gap
    // user (Σd = 0 branch: 25 events on one timestamp, distinct event_ids).
    val metro = (0 until 30).map(i => (1000000L + i, i * 60L * 1000000000L, 2L))
    val zero = (0 until 25).map(i => (2000000L + i, 777L * 1000000000L, 3L))
    (whale.toSeq ++ metro ++ zero)
      .toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val prior = spark.conf.getOption("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val got = graft.ops.Events.evBotDetect(spark, base).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
      assert(got(1L) == (nW.toLong, 444444L, 0L), s"whale: ${got(1L)}")
      assert(got(2L) == (29L, 0L, 1L), s"metronome: ${got(2L)}")
      assert(got(3L) == (24L, 0L, 1L), s"zero-gap: ${got(3L)}")
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
        case None => spark.conf.unset("spark.sql.ansi.enabled")
      }
    }
  }
}
