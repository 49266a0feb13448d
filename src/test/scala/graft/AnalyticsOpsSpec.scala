package graft

import graft.ops.{Events, Lake, Multimodal, Relational, TextAnalysis}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Behavior specs for the round-5 operator additions (transition matrix,
  * integer z-test anomaly, JSON props parse, pivot, merge-upsert, frame
  * sampling, bigram LM counts). Each test asserts a property the oracle
  * cannot (conservation laws, brute-force equivalence via a DIFFERENT
  * computation path, idempotence). */
class AnalyticsOpsSpec extends SparkSpec {

  test("ev_transition conserves events: sum(n) == |events| - |users|") {
    val t = Events.evTransition(spark, sf).collect()
    assert(t.nonEmpty)
    val total = t.map(_.getAs[Long]("n")).sum
    val ev = Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // every user contributes (events_u - 1) transitions
    assert(total == nEvents - nUsers)
    t.foreach(r => assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n")))
  }

  test("ev_anomaly equals the brute-force 2-sigma test on collected hourly counts") {
    val flagged = Events.evAnomaly(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_idx"))).toSet
    val hourly = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts div 1000) div 3600000000").as("hour_idx"))
      .groupBy("event_type", "hour_idx").count().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_idx"), r.getAs[Long]("count")))
    val byType = hourly.groupBy(_._1)
    val expected = byType.toSeq.flatMap { case (tpe, rows) =>
      val n = rows.length.toLong
      val s = rows.map(_._3).sum
      val ssq = rows.map(c => c._3 * c._3).sum
      rows.toSeq.filter { case (_, _, c) =>
        val dev = c * n - s
        dev * dev > 4L * (n * ssq - s * s)
      }.map(r => (tpe, r._2))
    }.toSet
    assert(flagged == expected)
    assert(flagged.nonEmpty, "test corpus should contain at least one 2-sigma hour")
  }

  test("ev_props_parse: JSON path agrees with an independent regexp parse") {
    val json = Events.evPropsParse(spark, sf).collect()
    val rx = Tables.events(spark, sf)
      .select(col("event_type"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
        sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"),
        countDistinct(col("k")).as("n_distinct_k"))
      .orderBy("event_type").collect()
    assert(json.nonEmpty && json.toSeq == rx.toSeq)
    json.foreach(r => assert(r.getAs[Long]("n_k") == r.getAs[Long]("n"),
      "every props payload should parse"))
  }

  test("q12_pivot row-sums equal the plain per-status aggregate") {
    val piv = Relational.q12Pivot(spark, sf).collect()
    assert(piv.nonEmpty)
    val plain = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(graft.util.Det.cents(col("o_totalprice"))).as("sum_c"))
      .collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_c"))).toMap
    piv.foreach { r =>
      val n = Relational.Priorities.map(p => r.getAs[Long](s"${p._2}_n")).sum
      val s = Relational.Priorities.map(p => r.getAs[Long](s"${p._2}_sum_c")).sum
      assert((n, s) == plain(r.getAs[String]("o_orderstatus")))
    }
  }

  test("lake mergeUpsert accounting and idempotence") {
    import spark.implicits._
    val base = Seq((1L, "A", 10.0, 1L), (2L, "B", 20.0, 1L), (3L, "C", 30.0, 1L))
      .toDF("k", "status", "price", "version")
    val changes = Seq((2L, "U", 25.0, 2L), (9L, "N", 90.0, 2L))
      .toDF("k", "status", "price", "version")
    val once = Lake.mergeUpsert(base, changes, "k", "version")
    val rows = once.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[String]("status"), r.getAs[Double]("price"))).toSet
    assert(rows == Set((1L, "A", 10.0), (2L, "U", 25.0), (3L, "C", 30.0), (9L, "N", 90.0)))
    // re-applying the same change batch is a no-op (latest-version-wins
    // over identical rows)
    val twice = Lake.mergeUpsert(once, changes, "k", "version").collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[String]("status"), r.getAs[Double]("price"))).toSet
    assert(twice == rows)
  }

  test("lake_merge_upsert query: updates replace, inserts add, others persist") {
    val merged = Lake.lakeMergeUpsert(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderstatus") -> r.getAs[Long]("n")).toMap
    val orders = Tables.orders(spark, sf)
    val nBase = orders.count()
    val nUpd = orders.filter(col("o_orderkey") % 7 === 0).count()
    val nIns = orders.filter(col("o_orderkey") % 13 === 0).count()
    assert(merged.values.sum == nBase + nIns)
    assert(merged("U") == nUpd && merged("N") == nIns)
  }

  test("mm_frame_sample offsets/lengths/checksums equal a per-doc recompute") {
    val M = graft.util.TextUtil.HashMod
    def poly(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % M)
    val frames = Multimodal.mmFrameSample(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(frames.nonEmpty)
    frames.foreach { case (id, fs) =>
      val text = docs(id)
      val expected = Iterator.from(0)
        .takeWhile(i => i * Multimodal.FrameStride < text.length)
        .filter(_ % Multimodal.FrameKeepEvery == 0)
        .map { i =>
          val off = i * Multimodal.FrameStride
          val len = math.min(Multimodal.FrameLen, text.length - off)
          (i.toLong, off.toLong, len.toLong, poly(text.substring(off, off + len)))
        }.toSeq
    val got = fs.sortBy(_.getAs[Long]("frame_idx")).toSeq.map(r =>
        (r.getAs[Long]("frame_idx"), r.getAs[Long]("off_bytes"),
          r.getAs[Long]("f_len"), r.getAs[Long]("checksum")))
      assert(got == expected, s"doc $id frame mismatch")
    }
  }

  test("mm_phash: codec-path dHash equals formula replay; banding is lossless; families separate") {
    // 1. the REAL codec chain (PNG encode -> ImageIO decode -> box resize
    //    -> gradient hash) must equal an independent pure-formula replay
    val hashes = Multimodal.mmPhashes(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.nonEmpty)
    def formulaHash(id: Long): Long = {
      def g(cx: Int, cy: Int): Int =
        (Multimodal.phPixel(id, 2 * cx, 2 * cy) + Multimodal.phPixel(id, 2 * cx + 1, 2 * cy)
          + Multimodal.phPixel(id, 2 * cx, 2 * cy + 1)
          + Multimodal.phPixel(id, 2 * cx + 1, 2 * cy + 1)) / 4
      var h = 0L
      for (cy <- 0 until 8; cx <- 0 until 7)
        if (g(cx + 1, cy) > g(cx, cy)) h |= 1L << (cy * 7 + cx)
      h
    }
    hashes.foreach { case (id, h) => assert(h == formulaHash(id), s"doc $id phash") }
    // 2. the chunk-pair banding is LOSSLESS for Hamming <= 2 (pigeonhole):
    //    op output == brute-force all-pairs cut
    val got = Multimodal.mmPhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("hamming")))
      .toSet
    val ids = hashes.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      a = ids(i); b = ids(j)
      ham = java.lang.Long.bitCount(hashes(a) ^ hashes(b)).toLong
      if ham <= Multimodal.PhHam
    } yield (a, b, ham)).toSet
    assert(got == want)
    // 3. family structure: every reported pair is within one 16-doc
    //    family (cross-family hashes are mixer-random), and the one-pixel
    //    edits genuinely split families — some pairs pass, some fail
    assert(got.nonEmpty)
    got.foreach { case (a, b, _) =>
      assert(a / Multimodal.PhFamStride == b / Multimodal.PhFamStride,
        s"cross-family pair ($a,$b) leaked through the Hamming cut") }
    val withinAll = ids.groupBy(_ / Multimodal.PhFamStride).values
      .map(f => f.length.toLong * (f.length - 1) / 2).sum
    assert(got.size < withinAll, "every within-family pair passed - the perturbation is too weak")
  }

  test("mm_image_decode payloads are real PNGs and decode to the formula pixels") {
    // The payload must be a genuine PNG container (magic header), not the
    // raw pixel buffer, and the decoded stats must equal an independent
    // pixel-formula recompute — proving ImageIO round-trips every pixel.
    val imgs = Multimodal.mmImages(spark, sf).collect()
    assert(imgs.nonEmpty)
    val magic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    imgs.foreach { r =>
      val png = r.getAs[Array[Byte]]("png")
      assert(png.take(4).sameElements(magic), "payload is not a PNG container")
      assert(png.length != Multimodal.ImgW * Multimodal.ImgH,
        "payload suspiciously equals the raw pixel buffer size")
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").length.toLong).toMap
    val stats = Multimodal.mmImageDecode(spark, sf).collect()
    assert(stats.length == docs.size)
    stats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val vs = for (y <- 0 until Multimodal.ImgH; x <- 0 until Multimodal.ImgW)
        yield Multimodal.pixelValue(id, docs(id), x, y).toLong
      assert(r.getAs[Long]("width") == Multimodal.ImgW)
      assert(r.getAs[Long]("height") == Multimodal.ImgH)
      assert(r.getAs[Long]("px_sum") == vs.sum, s"doc $id sum")
      assert(r.getAs[Long]("px_min") == vs.min && r.getAs[Long]("px_max") == vs.max)
      assert(r.getAs[Long]("px_wsum") ==
        vs.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum, s"doc $id wsum")
    }
  }

  test("mm_audio_decode payloads are real WAVs and decode to the formula PCM") {
    // The payload must be a genuine RIFF/WAVE container (magic header +
    // header overhead), and the decoded stats must equal an independent
    // sample-formula recompute — proving AudioSystem round-trips every
    // 16-bit little-endian frame.
    val wavs = Multimodal.mmAudio(spark, sf).collect()
    assert(wavs.nonEmpty)
    wavs.foreach { r =>
      val wav = r.getAs[Array[Byte]]("wav")
      assert(new String(wav.take(4), "US-ASCII") == "RIFF", "payload is not RIFF")
      assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE", "payload is not WAVE")
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").length.toLong).toMap
    val stats = Multimodal.mmAudioDecode(spark, sf).collect()
    assert(stats.length == docs.size)
    stats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = Multimodal.audioSampleCount(id, docs(id))
      val vs = (0 until n).map(i => Multimodal.audioSample(id, i).toLong)
      assert(r.getAs[Long]("n_samples") == n.toLong, s"doc $id n")
      assert(r.getAs[Long]("s_sum") == vs.sum, s"doc $id sum")
      assert(r.getAs[Long]("s_min") == vs.min && r.getAs[Long]("s_max") == vs.max)
      assert(r.getAs[Long]("s_wsum") ==
        vs.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum, s"doc $id wsum")
      assert(r.getAs[Long]("s_energy") == vs.map(v => v * v).sum, s"doc $id energy")
      assert(r.getAs[Long]("n_zcross") == vs.sliding(2).count {
        case Seq(a, b) => (a >= 0) != (b >= 0); case _ => false
      }, s"doc $id zcross")
    }
  }

  test("text_bigram_lm top-1 equals brute-force bigram count per source") {
    val top = TextAnalysis.textBigramLm(spark, sf).collect()
    assert(top.nonEmpty)
    // ranks contiguous from 1, counts non-increasing within source
    top.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Int]("rn").toLong).toSeq == (1L to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getAs[Long]("n") >= b.getAs[Long]("n")
        case _ => true
      })
    }
    // brute force on the driver with the same tokenizer regex
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
    val brute = docs.groupBy(_.getAs[String]("source")).map { case (src, rows) =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
      rows.foreach { r =>
        val toks = r.getAs[String]("text").toLowerCase
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        toks.sliding(2).filter(_.length == 2)
          .foreach(bg => counts.update(bg.mkString(" "), counts.getOrElse(bg.mkString(" "), 0L) + 1))
      }
      src -> counts.toMap
    }
    top.filter(_.getAs[Int]("rn") == 1).foreach { r =>
      val src = r.getAs[String]("source")
      val maxN = brute(src).values.max
      assert(r.getAs[Long]("n") == maxN, s"source $src top bigram count")
      assert(brute(src)(r.getAs[String]("bigram")) == maxN)
    }
  }
}
