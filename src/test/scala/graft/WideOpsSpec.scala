package graft

import graft.ops.{Events, Graph, Lake, Relational, TextAnalysis, VectorSearch}
import org.apache.spark.sql.functions._

/** Behavior specs for the round-5 widening batch (filtered vector
  * search, grouping sets, exact percentiles, set ops, gap fill, text
  * normalization, vector centroids, compaction, incremental aggregates,
  * integer PageRank). Each test checks the operator against an
  * INDEPENDENT computation path — plain-Scala brute force on collected
  * sf0.001 data, a different DataFrame decomposition, or a conservation
  * law — never the operator's own SQL oracle.
  */
class WideOpsSpec extends SparkSpec {

  private val HashMod = 1000000007L
  private def polyCp(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % HashMod)

  test("vs_filtered_search equals brute-force ranking over the filtered candidate set") {
    val rows = VectorSearch.vsFilteredSearch(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val en = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .filter(_.getString(1) == "en").map(_.getLong(0)).toSet
    val qv = emb.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val want = emb.toSeq
      .filter(e => Set(1, 3, 5, 7, 9)(e._3) && en(e._1))
      .map(e => (e._1, BigDecimal(1.0 - cos(e._2, qv)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy(p => (p._2, p._1)).take(10).map(_._1)
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == want)
    rows.foreach { r =>
      assert(Set(1, 3, 5, 7, 9)(r.getAs[Int]("label")) && r.getAs[String]("lang") == "en")
    }
  }

  test("q13_grouping_sets: each gid slice equals the plain per-dimension groupBy") {
    val rows = Relational.q13GroupingSets(spark, sf).collect()
    val byFlag = rows.filter(_.getAs[Long]("gid") == 1L)
      .map(r => r.getAs[String]("l_returnflag") -> (r.getAs[Long]("sum_price_c"), r.getAs[Long]("n"))).toMap
    val byStatus = rows.filter(_.getAs[Long]("gid") == 2L)
      .map(r => r.getAs[String]("l_linestatus") -> (r.getAs[Long]("sum_price_c"), r.getAs[Long]("n"))).toMap
    assert(byFlag.size + byStatus.size == rows.length)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"),
        graft.util.Det.cents(col("l_extendedprice")).as("p_c"))
    val f = li.groupBy("l_returnflag").agg(sum("p_c").as("s"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("s"), r.getAs[Long]("n"))).toMap
    val s = li.groupBy("l_linestatus").agg(sum("p_c").as("s"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("s"), r.getAs[Long]("n"))).toMap
    assert(byFlag == f && byStatus == s)
  }

  test("q14_median equals the sorted-array percentile on collected data") {
    val rows = Relational.q14Median(spark, sf).collect()
    assert(rows.nonEmpty)
    val data = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), graft.util.Det.cents(col("l_extendedprice")).as("p_c"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("p_c")))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    rows.foreach { r =>
      val vs = data(r.getAs[String]("l_returnflag"))
      val n = vs.length
      assert(r.getAs[Long]("n") == n.toLong)
      val med2 = vs((n + 1) / 2 - 1) + vs(n / 2 + 1 - 1)
      val p90 = vs((9 * n + 9) / 10 - 1)
      assert(r.getAs[Long]("med2_c") == med2, s"median mismatch for ${r.getString(0)}")
      assert(r.getAs[Long]("p90_c") == p90, s"p90 mismatch for ${r.getString(0)}")
    }
  }

  test("q15_setops equals plain-Scala set algebra") {
    val o = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val urgent = o.filter(_._2 == "1-URGENT").map(_._1).toSet
    val high = o.filter(_._2 == "2-HIGH").map(_._1).toSet
    val big = o.filter(_._3 > 500000).map(_._1).toSet
    val seg = (urgent intersect high) diff big
    val r = Relational.q15Setops(spark, sf).head()
    assert(r.getAs[Long]("n_custs") == seg.size.toLong)
    assert(seg.isEmpty || r.getAs[Long]("key_sum") == seg.sum)
  }

  test("ev_gap_fill emits a dense contiguous spine that conserves event counts") {
    val rows = Events.evGapFill(spark, sf).collect()
    assert(rows.nonEmpty)
    val hours = rows.map(_.getAs[Long]("hour_idx"))
    val (h0, h1) = (hours.min, hours.max)
    val types = rows.map(_.getAs[String]("event_type")).distinct
    // every type covers the identical full [h0, h1] spine
    assert(rows.length == types.length * (h1 - h0 + 1).toInt)
    types.foreach { t =>
      val hs = rows.filter(_.getString(0) == t).map(_.getAs[Long]("hour_idx")).sorted
      assert(hs.toSeq == (h0 to h1).toSeq)
    }
    // zero-filling must not invent events
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.events(spark, sf).count())
    assert(rows.exists(_.getAs[Long]("n") == 0L), "spine should contain at least one gap")
  }

  test("text_clean matches plain-Scala normalization (length, changed flag, hash)") {
    val rows = TextAnalysis.textClean(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val raw = docs(r.getAs[Long]("doc_id"))
      val clean = raw.toLowerCase.replaceAll("[ \\t\\n\\r\\f\\u000B]+", " ").trim
      assert(r.getAs[Long]("raw_len") == raw.codePointCount(0, raw.length).toLong)
      assert(r.getAs[Long]("clean_len") == clean.codePointCount(0, clean.length).toLong)
      assert(r.getAs[Long]("changed") == (if (clean != raw) 1L else 0L))
      assert(r.getAs[Long]("clean_hash") == polyCp(clean))
    }
  }

  test("vs_centroids equals the plain-Scala id-ordered fold") {
    val rows = VectorSearch.vsCentroids(spark, sf).collect()
    val emb = Tables.embeddings(spark, sf).select("label", "vec_id", "embedding").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    val groups = emb.groupBy(_._1)
    assert(rows.length == groups.size)
    rows.foreach { r =>
      val vs = groups(r.getAs[Long]("label")).sortBy(_._2).map(_._3)
      val n = vs.length
      assert(r.getAs[Long]("n") == n.toLong)
      val sum = vs.foldLeft(Array.fill(64)(0.0)) { (acc, v) =>
        Array.tabulate(64)(i => acc(i) + v(i))
      }
      def rd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("c0") == rd(sum(0) / n))
      assert(r.getAs[Double]("c3") == rd(sum(3) / n))
      val csum = sum.foldLeft(0.0)((a, x) => a + x / n)
      assert(r.getAs[Double]("csum") == rd(csum))
    }
  }

  test("lake_compact preserves content and actually compacts the files") {
    val out = Lake.lakeCompact(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("id_sum"))).toSeq
    val want = Tables.events(spark, sf).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("event_id").as("id_sum"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("id_sum"))).toSeq
    assert(out == want)
    def parquetFiles(p: String): Int =
      new java.io.File(p).listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(Lake.fragmentedEventsPath) == 64)
    assert(parquetFiles(Lake.compactedEventsPath) <= 4)
  }

  test("lake_incremental_agg merge equals the direct full aggregate") {
    val out = Lake.lakeIncrementalAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("sum_c"))).toSeq
    val want = Tables.events(spark, sf)
      .select(col("event_type"), graft.util.Det.cents(col("value")).as("v_c"))
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("v_c").as("s"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("s"))).toSeq
    assert(out == want)
    val deltas = Lake.lakeIncrementalAgg(spark, sf).collect().map(_.getAs[Long]("n_delta"))
    assert(deltas.exists(_ > 0L), "delta segment should be non-empty")
  }

  test("vs_binary_search: signatures match plain-Scala packing and rerank is exact on candidates") {
    val rows = VectorSearch.vsBinarySearch(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def sig(v: Array[Double], off: Int): Long =
      (0 until 32).foldLeft(0L)((acc, i) => acc + (if (v(i + off) > 0) 1L << i else 0L))
    val sigs = emb.map { case (id, v) => id -> (sig(v, 0), sig(v, 32)) }.toMap
    val (qlo, qhi) = sigs(0L)
    val qv = emb.find(_._1 == 0L).get._2
    def ham(id: Long): Long = {
      val (lo, hi) = sigs(id)
      java.lang.Long.bitCount(lo ^ qlo).toLong + java.lang.Long.bitCount(hi ^ qhi)
    }
    // Hamming column matches the independent packing
    rows.foreach(r => assert(r.getAs[Long]("ham") == ham(r.getAs[Long]("vec_id"))))
    // result ids = brute-force candidate set (top-64 by hamming) reranked by cosine
    val cand = emb.map(_._1).sortBy(id => (ham(id), id)).take(64).toSet
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val want = emb.filter(e => cand(e._1))
      .map(e => (e._1, BigDecimal(1.0 - cos(e._2, qv)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy(p => (p._2, p._1)).take(10).map(_._1).toSeq
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == want)
  }

  test("text_redact counts and hash match plain-Scala replacement") {
    val rows = TextAnalysis.textRedact(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    def poly(s: String): Long = polyCp(s) // [a-z0-9] tokens: byte == codepoint
    var redactedSomething = false
    rows.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val redacted = toks.map(t => if (poly(t) % 97 == 0) "<r>" else t)
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
      assert(r.getAs[Long]("n_redacted") == toks.count(t => poly(t) % 97 == 0).toLong)
      assert(r.getAs[Long]("redacted_hash") == polyCp(redacted.mkString(" ")))
      if (r.getAs[Long]("n_redacted") > 0) redactedSomething = true
    }
    assert(redactedSomething, "corpus should trip the denylist at least once")
  }

  test("ev_histogram conserves counts, respects bucket bounds, and matches per-bucket extremes") {
    val rows = Events.evHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), graft.util.Det.cents(col("value")).as("v_c")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("v_c")))
    assert(rows.map(_.getAs[Long]("n")).sum == vals.length.toLong)
    val mn = vals.map(_._2).min
    val mx = vals.map(_._2).max
    val want = vals.groupBy { case (t, v) => (t, (v - mn) * 16 / (mx - mn + 1)) }
      .map { case (k, vs) => k -> (vs.length.toLong, vs.map(_._2).min, vs.map(_._2).max) }
    assert(rows.length == want.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getAs[Long]("bucket"))
      assert(k._2 >= 0 && k._2 < 16)
      val (n, lo, hi) = want(k)
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("lo_c") == lo && r.getAs[Long]("hi_c") == hi)
    }
  }

  test("q16_unpivot is the exact inverse of re-pivoting") {
    val long = Relational.q16Unpivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("value")).toMap
    val wide = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), graft.util.Det.cents(col("l_quantity")).as("q_c"),
        graft.util.Det.cents(col("l_extendedprice")).as("p_c"))
      .groupBy("l_returnflag")
      .agg(sum("q_c").as("q"), sum("p_c").as("p"), count(lit(1)).as("n")).collect()
    assert(wide.nonEmpty && long.size == wide.length * 3)
    wide.foreach { r =>
      val flag = r.getString(0)
      assert(long((flag, "sum_qty_c")) == r.getAs[Long]("q"))
      assert(long((flag, "sum_price_c")) == r.getAs[Long]("p"))
      assert(long((flag, "n_rows")) == r.getAs[Long]("n"))
    }
  }

  test("ev_moving_window: RANGE frame sums trailing 3 hours by VALUE, not row position") {
    val rows = Events.evMovingWindow(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { rs =>
      val m = rs.map(r => r.getAs[Long]("hour_idx") ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_value_c"))).toMap
      rs.foreach { r =>
        val h = r.getAs[Long]("hour_idx")
        // independent recompute: sum over hours in [h-2, h] that exist
        val win = (h - 2 to h).flatMap(m.get)
        assert(r.getAs[Long]("mov_n") == win.map(_._1).sum)
        assert(r.getAs[Long]("mov_sum_c") == win.map(_._2).sum)
      }
    }
  }

  test("dedup_survivor: best member of every near-dup cluster survives; losers are dropped") {
    val rows = graft.ops.Dedup.dedupSurvivor(spark, sf).collect()
    assert(rows.nonEmpty)
    val pairs = graft.ops.Dedup.dedupMinhashLsh(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val scores = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score")).toMap
    def beats(x: Long, y: Long): Boolean = // (score desc, id asc)
      scores(x) > scores(y) || (scores(x) == scores(y) && x < y)
    val neighbors = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val survives = r.getAs[Long]("survives") == 1L
      assert(survives == neighbors(id).forall(nb => beats(id, nb)))
      assert(r.getAs[Long]("n_neighbors") == neighbors(id).size.toLong)
    }
    // the greedy rule keeps each connected cluster's global best
    assert(rows.exists(_.getAs[Long]("survives") == 1L))
    assert(rows.exists(_.getAs[Long]("survives") == 0L))
  }

  test("graph_pagerank equals the plain-Scala fixed-point iteration") {
    val rows = Graph.graphPagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent edge derivation: per-user ordered event sequences
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val edges = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val out = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to Graph.Iters) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => (85L * rank(e._1) * e._3) / (100L * out(e._1))).sum
      }
      rank = nodes.map(n => n -> (150000L + contrib.getOrElse(n, 0L))).toMap
    }
    val got = rows.map(r => r.getAs[String]("node") -> r.getAs[Long]("r")).toMap
    assert(got == rank)
    // rank_pos is a 1..n permutation consistent with descending r
    val pos = rows.sortBy(_.getAs[Long]("rank_pos")).map(_.getAs[Long]("r")).toSeq
    assert(pos == pos.sortBy(-_))
    assert(rows.map(_.getAs[Long]("rank_pos")).sorted.toSeq == (1L to rows.length).toSeq)
  }

  test("ev_forecast equals the plain-Scala integer Holt recursion") {
    val got = Events.evForecast(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_hours"), r.getAs[Long]("level"),
          r.getAs[Long]("trend"), r.getAs[Long]("forecast"))).toMap
    assert(got.nonEmpty)
    // independent dense series + sequential fold (floor semantics via
    // Math.floorDiv — all registered numerators are arranged positive,
    // where floorDiv and truncation agree)
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "(ts div 1000) div 3600000000 AS hour_idx")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val h0 = ev.map(_._2).min; val h1 = ev.map(_._2).max
    val byType = ev.groupBy(_._1)
    val k = Events.HoltShift
    byType.foreach { case (tpe, es) =>
      val counts = es.groupBy(_._2).map { case (h, v) => h -> v.size.toLong }
      val series = (h0 to h1).map(h => counts.getOrElse(h, 0L))
      var l = series.head; var tt = k
      series.tail.foreach { n =>
        val lN = Math.floorDiv(n + 3 * l, 4L)
        tt = Math.floorDiv(lN - l + 3 * tt + k, 4L)
        l = lN
      }
      val (nh, lvl, tr, fc) = got(tpe)
      assert(nh == h1 - h0 + 1, tpe)
      assert(lvl == l, s"$tpe level")
      assert(tr == tt - k, s"$tpe trend")
      assert(fc == l + tt - k, s"$tpe forecast")
    }
    assert(got.keySet == byType.keySet)
  }

  test("graph_sssp equals the plain-Scala Bellman-Ford relaxation") {
    val rows = Graph.graphSssp(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent edge derivation (same as the pagerank test), self-loops
    // dropped, cost = 1e6 // w + 1
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val edges = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.filter(p => p._1 != p._2)
      .groupBy(identity).map { case (k, v) =>
        (k._1, k._2, Graph.SsspScale / v.size.toLong + 1L) }.toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val src = nodes.min
    var dist: Map[String, Option[Long]] =
      nodes.map(n => n -> (if (n == src) Some(0L) else None)).toMap
    for (_ <- 1 to Graph.SsspIters) {
      val relax = edges.flatMap { case (u, v, c) => dist(u).map(d => v -> (d + c)) }
        .groupBy(_._1).map { case (v, ds) => v -> ds.map(_._2).min }
      dist = nodes.map { n =>
        n -> ((dist(n), relax.get(n)) match {
          case (None, m) => m
          case (d, None) => d
          case (Some(d), Some(m)) => Some(math.min(d, m))
        })
      }.toMap
    }
    val got = rows.map(r => r.getAs[String]("node") ->
      (if (r.isNullAt(r.fieldIndex("dist"))) None else Some(r.getAs[Long]("dist")))).toMap
    assert(got == dist)
    assert(got(src).contains(0L)) // source settles at zero
  }
}
