package graft

import graft.ops.{Events, Graph, Pipeline, Relational, TextAnalysis, VectorSearch}
import org.apache.spark.sql.functions._

/** Behavior specs for the round-6 operator additions (boilerplate
  * detection, token-budget selection, label propagation). Each test
  * asserts equivalence with a brute-force plain-Scala reference — a
  * genuinely different computation path from the distributed plan. */
class Round6OpsSpec extends SparkSpec {

  private def toks(text: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq

  /** Spark ROUND semantics (half away from zero) — NOT math.rint's
    * half-to-even; see VectorSpec's replay convention. */
  private def roundHalfAway(y: Double): Long =
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong

  test("text_boilerplate equals brute-force shingle document frequency") {
    val got = TextAnalysis.textBoilerplate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_boiler"), r.getAs[Long]("n_shingles"))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
      .filter(_._2.length >= TextAnalysis.BoilerShingle)
    val perDoc = docs.map { case (id, ts) =>
      id -> ts.sliding(TextAnalysis.BoilerShingle).map(_.mkString(" ")).toSet
    }
    val df = perDoc.flatMap(_._2).groupBy(identity).map { case (s, v) => s -> v.size }
    val want = perDoc.map { case (id, sh) =>
      id -> (sh.count(s => df(s) >= TextAnalysis.BoilerDf).toLong, sh.size.toLong)
    }.filter(_._2._1 > 0).toMap
    assert(got == want)
    assert(got.nonEmpty, "test corpus should contain boilerplate shingles")
    // near-dup groups exist, so some docs must also have NON-boilerplate content
    assert(got.exists { case (_, (b, n)) => b < n })
  }

  test("pipeline_token_budget: two-pass prefix equals sequential greedy selection") {
    val rows = Pipeline.pipelineTokenBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    // the selection is a contiguous prefix: offsets chain exactly
    val byOff = rows.sortBy(_.getAs[Long]("off"))
    assert(byOff.head.getAs[Long]("off") == 0L)
    byOff.sliding(2).filter(_.length == 2).foreach { w =>
      assert(w(1).getAs[Long]("off") ==
        w(0).getAs[Long]("off") + w(0).getAs[Long]("n_tok"))
    }
    assert(byOff.last.getAs[Long]("off") < Pipeline.TokenBudget)
    // greedy reference ranked by the independent text_quality operator
    val scored = TextAnalysis.textQuality(spark, sf)
      .select("doc_id", "score", "n_tok").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("score"), r.getAs[Long]("n_tok")))
      .sortBy(t => (-t._2, t._1))
    var cum = 0L
    val want = scored.takeWhile { case (_, _, t) =>
      val in = cum < Pipeline.TokenBudget; cum += t; in
    }.map(_._1).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == want)
    // scores agree with the quality operator
    val scoreOf = scored.map(t => t._1 -> t._2).toMap
    rows.foreach(r => assert(r.getAs[Long]("score") == scoreOf(r.getAs[Long]("doc_id"))))
  }

  test("ev_attribution equals a sequential per-user replay") {
    val got = Events.evAttribution(spark, sf).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("n_users"), r.getAs[Long]("sum_value_c")))
      .toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val credited = ev.groupBy(_._3).toSeq.flatMap { case (user, es) =>
      var touch: String = null
      es.sortBy(e => (e._2, e._1)).flatMap { case (_, _, _, tpe, v) =>
        val out = if (tpe == "purchase")
          Seq((if (touch == null) "organic" else touch, user,
            math.floor(v * 100 + 0.5).toLong))
        else Seq.empty
        if (tpe == "click" || tpe == "view") touch = tpe
        out
      }
    }
    val want = credited.groupBy(_._1).map { case (ch, vs) =>
      ch -> (vs.length.toLong, vs.map(_._2).distinct.length.toLong, vs.map(_._3).sum)
    }
    assert(got == want)
    assert(got.contains("organic") || got.size > 1)
  }

  test("pipeline_epoch_shuffle: positions are the exact coin-rank permutation per epoch") {
    val M = graft.util.TextUtil.HashMod
    def poly(s: String): Long =
      s.map(_.toLong).reduceLeft((a, b) => (a * 31 + b) % M)
    def coin(epoch: Long, id: Long): Long =
      (poly(s"$epoch:$id") * Pipeline.MixSpread) % M
    val rows = Pipeline.pipelineEpochShuffle(spark, sf).collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("pos"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("coin")))
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val perms = rows.groupBy(_._1)
    assert(perms.keySet == (0L until Pipeline.Epochs).toSet)
    perms.foreach { case (e, rs) =>
      // independent coin computation and ranking
      rs.foreach { case (_, _, id, c) => assert(c == coin(e, id)) }
      val want = ids.map(id => (coin(e, id), id)).sorted.map(_._2).toSeq
      assert(rs.sortBy(_._2).map(_._3).toSeq == want)
      assert(rs.map(_._2).sorted.toSeq == (1L to ids.length.toLong))
    }
    // epochs permute differently
    assert(perms(0L).sortBy(_._2).map(_._3).toSeq != perms(1L).sortBy(_._2).map(_._3).toSeq)
  }

  test("vs_recall_eval agrees with set-intersecting the registered searches") {
    val got = VectorSearch.queries("vs_recall_eval")(spark, sf).collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("recall_ppm"))).toMap
    val ivf = VectorSearch.queries("vs_ivf_search")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
      .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    val exact = VectorSearch.queries("vs_knn_join")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
      .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    assert(got.keySet == exact.keySet)
    got.foreach { case (q, (hits, ppm)) =>
      val want = (exact(q) & ivf.getOrElse(q, Set.empty)).size.toLong
      assert(hits == want, s"q=$q")
      assert(ppm == hits * 1000000L / 5L)
    }
    // the IVF path is lossy by design somewhere, and useful everywhere
    assert(got.values.forall(_._1 >= 1L))
  }

  test("text_lm_score equals brute-force bigram frequency accounting") {
    val got = TextAnalysis.textLmScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("sum_freq"), r.getAs[Long]("min_freq"), r.getAs[Long]("lm_milli")))
      .toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
      .filter(_._2.length >= 2)
    val perDoc = docs.map { case (id, ts) =>
      id -> ts.sliding(2).map(_.mkString(" ")).toSeq
    }
    val cb = perDoc.flatMap(_._2).groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val want = perDoc.map { case (id, bs) =>
      val s = bs.map(cb).sum
      id -> (bs.length.toLong, s, bs.map(cb).min, s * 1000L / bs.length)
    }.toMap
    assert(got == want)
    assert(got.nonEmpty)
    // near-dup docs share bigrams, so some bigram frequencies exceed 1
    assert(got.values.exists(_._2 > got.values.map(_._1).max))
  }

  private def centsOf(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  test("q18/q19/q20 equal brute-force replays over collected tables") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))

    // q18: per-order quantity totals over threshold, top-20
    val got18 = Relational.q18Having(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("total_qty_c")))
    val totals = li.groupBy(_._1).map { case (k, v) => k -> v.map(l => centsOf(l._4)).sum }
    val want18 = totals.toSeq.filter(_._2 > Relational.Q18MinQtyC)
      .sortBy { case (k, q) => (-q, k) }.take(20)
    assert(got18.toSeq == want18.map(t => (t._1, t._2)))
    assert(got18.nonEmpty)

    // q19: disjunctive predicate revenue
    val parts = Tables.part(spark, sf).select("p_partkey", "p_brand", "p_size")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val hits19 = li.filter { case (_, pk, _, q, _, _) =>
      val (b, s) = parts(pk)
      (b == "Brand#11" && s >= 1 && s <= 15 && q >= 1 && q <= 20) ||
      (b == "Brand#22" && s >= 1 && s <= 30 && q >= 10 && q <= 35) ||
      (b == "Brand#33" && s >= 1 && s <= 45 && q >= 20 && q <= 50)
    }
    val got19 = Relational.q19Disjunctive(spark, sf).collect().head
    assert(got19.getAs[Long]("n") == hits19.length.toLong)
    assert(got19.getAs[Long]("revenue_c") ==
      hits19.map(l => centsOf(l._5 * (1 - l._6))).sum)
    assert(hits19.nonEmpty)

    // q20: above-average suppliers of STANDARD parts
    val std = Tables.part(spark, sf).filter(col("p_type") === "STANDARD")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val perSupp = li.filter(l => std(l._2)).groupBy(_._3)
      .map { case (s, v) => s -> v.map(l => centsOf(l._4)).sum }
    val avg = math.floorDiv(perSupp.values.sum, perSupp.size.toLong)
    val want20 = perSupp.filter(_._2 > avg).toSeq.sortBy(_._1)
    val got20 = Relational.q20NestedSemijoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("qty_c")))
    assert(got20.toSeq == want20)
    assert(got20.nonEmpty && got20.length < perSupp.size)
  }

  test("ev_count_min: estimates are one-sided (>= truth) and equal a brute-force sketch") {
    val rows = Events.evCountMin(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("user_id")) ->
        (r.getAs[Long]("est_n"), r.getAs[Long]("true_n"))).toMap
    val ev = Tables.events(spark, sf).select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val types = ev.map(_._1).distinct
    assert(rows.size == types.length * Events.CmProbeKeys.toInt)
    // CM guarantee: estimate never undercounts
    rows.values.foreach { case (est, tru) => assert(est >= tru) }
    // brute-force sketch replay
    def bkt(u: Long, a: Long, b: Long): Long = ((u * a + b) % Events.CmP) % Events.CmW
    val regs = ev.flatMap { case (t, u) =>
      Events.CmHashes.zipWithIndex.map { case ((a, b), i) => ((t, i, bkt(u, a, b)), 1L) }
    }.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val tru = ev.filter(_._2 < Events.CmProbeKeys).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    for (t <- types; u <- 0L until Events.CmProbeKeys) {
      val est = Events.CmHashes.zipWithIndex.map { case ((a, b), i) =>
        regs.getOrElse((t, i, bkt(u, a, b)), 0L)
      }.min
      assert(rows((t, u)) == ((est, tru.getOrElse((t, u), 0L))), s"($t,$u)")
    }
    // truth is non-trivial on the test corpus
    assert(rows.values.exists(_._2 > 0))
  }

  test("q22_antijoin_subquery equals a brute-force replay") {
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), centsOf(r.getDouble(2))))
    val pending = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "P").select("o_custkey").collect()
      .map(_.getLong(0)).toSet
    val pos = cust.map(_._3).filter(_ > 0)
    val avg = math.floorDiv(pos.sum, pos.length.toLong)
    val survivors = cust.filter(c => c._3 > avg && !pending(c._1))
    val want = survivors.groupBy(_._2).map { case (n, v) =>
      n -> (v.length.toLong, v.map(_._3).sum) }
    val got = Relational.q22AntijoinSubquery(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("n_cust"), r.getAs[Long]("sum_bal_c")))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("lake_time_travel: version chain is monotone and as-of-latest equals the full table") {
    val full = Tables.events(spark, sf).count()
    val counts = (0 to 2).map(v => graft.ops.Lake.readAsOf(spark, sf, v).count())
    assert(counts(0) < counts(1) && counts(1) < counts(2))
    assert(counts(2) == full)
    // as-of-1 content equals the relational commit filter
    val got = graft.ops.Lake.readAsOf(spark, sf, 1)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want = Tables.events(spark, sf).filter(pmod(col("event_id"), lit(3L)) <= 1)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("q2_min_cost equals a brute-force replay") {
    val p15 = Tables.part(spark, sf).filter(col("p_size") === 15)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), centsOf(r.getDouble(2)), centsOf(r.getDouble(3))))
      .filter(l => p15(l._1))
    val unit = li.map { case (p, s, ep, q) =>
      ((p, s), math.floor(ep.toDouble * 100 / q).toLong) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val want = unit.groupBy(_._1._1).map { case (p, m) =>
      val mn = m.values.min
      p -> (m.filter(_._2 == mn).keys.map(_._2).min, mn)
    }
    val got = Relational.q2MinCost(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("s_suppkey"), r.getAs[Long]("min_unit_mc")))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q6_filter_agg equals a brute-force replay") {
    // epoch-second comparison: Timestamp.valueOf parses in the JVM
    // default TZ, while the op filters in session-TZ UTC
    val li = Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("long"), col("l_discount"),
        col("l_quantity"), col("l_extendedprice")).collect()
    val lo = java.time.Instant.parse("1995-01-01T00:00:00Z").getEpochSecond
    val hi = java.time.Instant.parse("1996-01-01T00:00:00Z").getEpochSecond
    val sel = li.filter { r =>
      val sd = r.getLong(0); val dc = centsOf(r.getDouble(1))
      sd >= lo && sd < hi && dc >= 5 && dc <= 7 && r.getDouble(2) < 24
    }
    val want = (sel.map(r => centsOf(r.getDouble(3) * r.getDouble(1))).sum, sel.length.toLong)
    val row = Relational.q6FilterAgg(spark, sf).collect().head
    assert((row.getAs[Long]("revenue_c"), row.getAs[Long]("n")) == want)
    assert(want._2 > 0)
  }

  test("q21_late_suppliers equals a brute-force replay") {
    val od = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime / 1000).toMap
    val os = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey", "l_shipdate")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        if (r.getTimestamp(2).getTime / 1000 > od(r.getLong(0)) + 60L * 86400L) 1 else 0))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    val perOrder = os.groupBy(_._1._1).map { case (o, m) =>
      o -> (m.size, m.values.sum) }
    val numwait = os.toSeq.collect {
      case ((o, s), 1) if perOrder(o)._1 > 1 && perOrder(o)._2 == 1 => s
    }.groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    val want = numwait.toSeq.sortBy { case (s, n) => (-n, s) }.take(20).toMap
    val got = Relational.q21LateSuppliers(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("numwait")).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("lake_zone_map: manifest pruning skips files and preserves the filter result") {
    val (qlo, qhi) = graft.ops.Lake.zoneMapQueryRange(spark, sf)
    val (picked, total) = graft.ops.Lake.zoneMapPickedFiles(spark, sf, qlo, qhi)
    assert(total == 8L, s"expected 8 range files, got $total")
    assert(picked.length < total, "zone map must actually skip files")
    val got = graft.ops.Lake.lakeZoneMap(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("sum_value_c"))).toMap
    val want = Tables.events(spark, sf)
      .filter(col("event_id").between(qlo, qhi))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100 + 0.5).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("s"))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("ev_quantile_sketch: containing-bin guarantee vs exact quantiles") {
    val got = Events.evQuantileSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("q_pm")) ->
        (r.getAs[Long]("est_c"), r.getAs[Long]("n"))).toMap
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value") * 100 + 0.5).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, v) => t -> v.map(_._2).sorted }
    val all = vals.values.flatten
    val width = (all.max - all.min + 1 + Events.QsBins - 1) / Events.QsBins
    for (((t, q), (est, n)) <- got) {
      assert(n == vals(t).length.toLong)
      val rank = ((q * n + 999) / 1000).toInt // 1-indexed ceil
      val exact = vals(t)(rank - 1)
      assert(est >= exact && est - exact < width + 1,
        s"($t,$q): est=$est exact=$exact width=$width")
    }
    assert(got.size == vals.size * Events.QsQuantiles.size)
  }

  test("ev_rfm equals a brute-force replay") {
    val p = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000L / 86400000000L, centsOf(r.getDouble(2))))
    val maxDay = p.map(_._2).max
    val want = p.groupBy(_._1).toSeq.map { case (_, v) =>
      val ds = maxDay - v.map(_._2).max
      val freq = v.length; val mon = v.map(_._3).sum
      val r = if (ds <= 6) 4L else if (ds <= 13) 3L else if (ds <= 20) 2L else 1L
      val f = if (freq >= 8) 4L else if (freq >= 4) 3L else if (freq >= 2) 2L else 1L
      val m = if (mon >= 50000L) 4L else if (mon >= 20000L) 3L else if (mon >= 5000L) 2L else 1L
      ((r, f, m), mon)
    }.groupBy(_._1).map { case (k, v) => k -> (v.size.toLong, v.map(_._2).sum) }
    val got = Events.evRfm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("sum_mon_c"))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("dedup_containment equals a brute-force all-pairs replay (prefix filter lossless)") {
    val M = 1000000007L
    def polyHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % M)
    def grams(text: String): Set[Long] = {
      val ts = toks(text)
      if (ts.length < 3) Set.empty
      else ts.sliding(3).map(w => polyHash(w.mkString(" "))).toSet
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), grams(r.getString(1))))
      .filter(_._2.size >= graft.ops.Dedup.ContMinGrams)
    val want = (for {
      (a, ga) <- docs; (b, gb) <- docs if a < b
      inter = (ga & gb).size.toLong
      pm = inter * 1000 / math.min(ga.size, gb.size)
      if pm >= graft.ops.Dedup.ContThreshPm
    } yield (a, b) -> pm).toMap
    val got = graft.ops.Dedup.dedupContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("cont_pm")).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("dedup_containment catches asymmetric subset pairs Jaccard misses") {
    // synthetic corpus: doc 1 is a strict prefix-quote of doc 0 (~35% of
    // its tokens) — containment of the quote is 1.0 while Jaccard is far
    // below any near-dup threshold; doc 2 is unrelated.
    val full = (1 to 40).map(i => s"tok$i").mkString(" ")
    val quote = (1 to 14).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    import spark.implicits._
    val docs = Seq((0L, full), (1L, quote), (2L, other)).toDF("doc_id", "text")
    val got = graft.ops.Dedup.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("cont_pm")).toMap
    assert(got == Map((0L, 1L) -> 1000L))
    // and the symmetric Jaccard of that pair is low (quote has 12
    // shingles, full has 38; intersection 12 → J = 12/38 ≈ 0.32)
    assert(12.0 / 38.0 < 0.8)
  }

  test("vs_pq_rerank: exact grid distances, candidates from ADC, top-10 of candidate set") {
    val got = VectorSearch.vsPqRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("adist"), r.getAs[Long]("exact_d2")))
    assert(got.length == 10)
    // replay the int8 grid quantization brute-force
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val maxabs = e.map(_._2.map(math.abs).max).max
    val quant = e.map { case (id, v) =>
      id -> v.map(x => roundHalfAway(x * 127.0 / maxabs)) }.toMap
    val qv = quant(0L)
    def d2(a: Array[Long]) = a.zip(qv).map { case (x, q) => (x - q) * (x - q) }.sum
    // every emitted exact_d2 is the true grid distance
    got.foreach { case (id, _, ex) => assert(ex == d2(quant(id)), s"vec $id") }
    // output is sorted by exact distance and is the exact top-10 of its candidate set:
    // no non-candidate can beat the worst emitted unless ADC ranked it out — so at
    // minimum the emitted set must contain the TRUE exact top-1 (vec 0 itself, d2=0)
    assert(got.map(_._3).sorted.sameElements(got.map(_._3)))
    assert(got.head._1 == 0L && got.head._3 == 0L)
  }

  test("vs_maxsim_search equals brute-force MaxSim over int8 slices") {
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val maxabs = e.map(_._2.map(math.abs).max).max
    val quant = e.map { case (id, v) =>
      id -> v.map(x => roundHalfAway(x * 127.0 / maxabs)) }
    val q = quant.find(_._1 == 0L).get._2
    val dsub = 64 / VectorSearch.MsSlices
    def slices(a: Array[Long]) =
      (0 until VectorSearch.MsSlices).map(i => a.slice(i * dsub, (i + 1) * dsub))
    val qs = slices(q)
    val want = quant.map { case (id, d) =>
      val ds = slices(d)
      id -> qs.map(qi => ds.map(di => qi.zip(di).map { case (a, b) => a * b }.sum).max).sum
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = VectorSearch.vsMaxsimSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("maxsim")))
    assert(got.toSeq == want.toSeq)
    assert(got.head._1 == 0L) // the query is its own best match
  }

  test("text_tfidf equals brute-force tf-idf top-3") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
      .filter(_._2.nonEmpty)
    val nd = docs.length.toLong
    val tf = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, v) => (id, t, v.length.toLong) } }
    val df = tf.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val want = tf.map { case (id, t, f) =>
      (id, t, math.floor(f * 1000000.0 * nd / df(t) + 0.5).toLong) }
      .groupBy(_._1).toSeq.flatMap { case (id, v) =>
        v.sortBy { case (_, t, s) => (-s, t) }.take(TextAnalysis.TfidfTopK)
          .zipWithIndex.map { case ((_, t, s), i) => (id, i + 1L, t, s) }
      }.toSet
    val got = TextAnalysis.textTfidf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank"), r.getString(2),
        r.getAs[Long]("score_micro"))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("pipeline_corpus_stats equals a brute-force profile") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getString(3), r.getString(2), r.getLong(4), toks(r.getString(1)).length))
    val want = docs.groupBy(_._1).map { case (src, v) =>
      src -> (v.length.toLong, v.map(_._3).sum, v.map(_._3).min, v.map(_._3).max,
        v.map(_._2).distinct.length.toLong, v.map(_._4.toLong).sum,
        v.count(_._4 == 0).toLong, v.map(_._3).sum / v.length)
    }
    val got = Pipeline.pipelineCorpusStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars"),
        r.getAs[Long]("min_chars"), r.getAs[Long]("max_chars"), r.getAs[Long]("n_langs"),
        r.getAs[Long]("sum_toks"), r.getAs[Long]("n_empty"), r.getAs[Long]("avg_chars")))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("ev_changepoint equals brute-force exhaustive split search") {
    val hourUs = 3600L * 1000000L
    val ev = Tables.events(spark, sf).select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 1000L / hourUs))
    val want = ev.groupBy(_._1).map { case (t, v) =>
      val series = v.groupBy(_._2).map { case (h, w) => (h, w.length.toLong) }
        .toSeq.sortBy(_._1)
      val n = series.length.toLong
      val tot = series.map(_._2).sum
      var csum = 0L
      val cands = series.zipWithIndex.dropRight(1).map { case ((h, c), idx) =>
        csum += c
        val i = idx + 1L
        val ml = csum * 1000 / i
        val mr = (tot - csum) * 1000 / (n - i)
        (h, math.abs(ml - mr), ml, mr)
      }
      val bestScore = cands.map(_._2).max
      val best = cands.filter(_._2 == bestScore).minBy(_._1)
      t -> (best._1, bestScore, n, tot, best._3, best._4)
    }
    val got = Events.evChangepoint(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("split_hour"),
        r.getAs[Long]("score_milli"), r.getAs[Long]("n_hours"),
        r.getAs[Long]("n_events"), r.getAs[Long]("mean_l_milli"),
        r.getAs[Long]("mean_r_milli"))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("ev_rolling_distinct equals brute-force 7-day rolling distinct") {
    val dayUs = 86400L * 1000000L
    val ev = Tables.events(spark, sf).select("event_type", "ts", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1) / 1000L / dayUs, r.getLong(2)))
    val maxDay = ev.map(_._2).max
    val byType = ev.groupBy(_._1)
    val want = (for {
      (t, v) <- byType.toSeq
      d <- v.map(_._2).min to maxDay
      users = v.filter(e => e._2 >= d - 6 && e._2 <= d).map(_._3).distinct
      if users.nonEmpty
    } yield (t, d) -> users.length.toLong).toMap
    val got = Events.evRollingDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("t_day")) -> r.getAs[Long]("n_users_7d"))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
    // rolling > daily somewhere (the window actually accumulates)
    val daily = ev.distinct.groupBy(e => (e._1, e._2)).map { case (k, v) =>
      k -> v.map(_._3).distinct.length.toLong }
    assert(got.exists { case (k, n) => daily.getOrElse(k, 0L) < n })
  }

  test("mm_modality_router: magic-byte dispatch agrees with the per-modality decoders") {
    val got = graft.ops.Multimodal.mmModalityRouter(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getAs[Long]("n_units"),
        r.getAs[Long]("payload_sum"), r.getAs[Long]("checksum"))).toMap
    val nDocs = Tables.documents(spark, sf).count()
    assert(got.size.toLong == nDocs)
    // every even doc routed to image, odd to audio
    got.foreach { case (id, (m, _, _, _)) =>
      assert(m == (if (id % 2 == 0) "image" else "audio"), s"doc $id")
    }
    // image rows agree with the dedicated image decoder
    val img = graft.ops.Multimodal.mmImageDecode(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("px_sum"), r.getAs[Long]("px_wsum"))).toMap
    got.filter(_._2._1 == "image").foreach { case (id, (_, _, s, w)) =>
      assert((s, w) == img(id), s"doc $id")
    }
    // audio rows agree with the dedicated audio decoder
    val aud = graft.ops.Multimodal.mmAudioDecode(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_samples"), r.getAs[Long]("s_sum"),
        r.getAs[Long]("s_wsum"))).toMap
    got.filter(_._2._1 == "audio").foreach { case (id, (_, n, s, w)) =>
      assert((n, s, w) == aud(id), s"doc $id")
    }
  }

  test("mm_image_resize: codec round-trip preserves the exact integer box average") {
    // Decode every source PNG driver-side, box-average it in plain
    // Scala, and require the operator's emitted stats (which pass
    // through a REAL encode->decode round trip of the resized image)
    // to match exactly — proving both the resize arithmetic and that
    // the PNG round-trip is lossless for the 8-bit gray raster.
    val got = graft.ops.Multimodal.mmImageResize(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("width"), r.getAs[Long]("height"),
        r.getAs[Long]("px_sum"), r.getAs[Long]("px_wsum"))).toMap
    val f = graft.ops.Multimodal.ResizeF
    val w = graft.ops.Multimodal.ImgW / f
    assert(got.nonEmpty)
    graft.ops.Multimodal.mmImages(spark, sf).collect().foreach { r =>
      val id = r.getLong(0)
      val in = new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))
      val img = try javax.imageio.ImageIO.read(in) finally in.close()
      val ras = img.getRaster
      var sum = 0L; var wsum = 0L
      for (ry <- 0 until w; rx <- 0 until w) {
        var acc = 0
        for (dy <- 0 until f; dx <- 0 until f)
          acc += ras.getSample(rx * f + dx, ry * f + dy, 0)
        val v = (acc / (f * f)).toLong
        sum += v; wsum += v * (ry.toLong * w + rx + 1)
      }
      assert(got(id) == (w.toLong, w.toLong, sum, wsum), s"doc $id")
    }
  }

  test("q23_bloom_semijoin: bloom prefilter is lossless and actually prunes") {
    val row = Relational.q23BloomSemijoin(spark, sf).collect().head
    // exact replay: plain semi-join
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val matched = li.filter(l => urgent(l._1))
    val want = (matched.length.toLong,
      matched.map(l => centsOf(l._2 * (1 - l._3))).sum)
    assert((row.getAs[Long]("n"), row.getAs[Long]("revenue_c")) == want)
    assert(want._1 > 0)
    // the prefilter passes every true match (losslessness) but fewer
    // rows than the full table (it actually prunes before the shuffle)
    val pre = Relational.bloomPrefiltered(spark, sf).count()
    assert(pre >= want._1, "bloom dropped a true match")
    assert(pre < li.length, s"bloom pruned nothing: $pre of ${li.length}")
  }

  test("graph_kcore equals brute-force iterative peeling") {
    val pairs = graft.ops.Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sym = (pairs ++ pairs.map(_.swap)).distinct
    var alive = sym.map(_._1).toSet
    var deg = Map.empty[Long, Int]
    for (_ <- 1 to Graph.KcIters) {
      deg = sym.filter { case (a, b) => alive(a) && alive(b) }
        .groupBy(_._1).map { case (n, v) => n -> v.length }
        .filter(_._2 >= Graph.KcK)
      alive = deg.keySet
    }
    val got = Graph.graphKcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("deg")).toMap
    assert(got == deg.map { case (k, v) => k -> v.toLong })
    assert(got.nonEmpty, "corpus should contain a dense duplicate family (2-core)")
    // peeling did something: some chain node was removed
    assert(got.size < sym.map(_._1).distinct.length)
  }

  test("graph_label_prop equals brute-force min-label iteration") {
    val got = Graph.graphLabelProp(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val und = Events.transitionPairs(spark, sf)
      .select("prev_type", "next_type").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = und.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    val nodes = und.map(_._1).distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to Graph.LpIters)
      lab = nodes.map { n =>
        n -> (nbrs(n).map(lab) :+ lab(n)).min
      }.toMap
    assert(got == lab)
    assert(got.nonEmpty)
    // propagation did something: at least one node carries a foreign label
    assert(got.exists { case (n, l) => n != l } || got.size == 1)
  }

  test("text_gopher_quality equals brute-force repetition metrics") {
    val got = TextAnalysis.textGopherQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("top_word_n"),
          r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_dup"),
          r.getAs[Long]("keep"))).toMap
    val want = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
      .filter(_._2.length >= 2)
      .map { case (id, ts) =>
        val bgs = ts.sliding(2).map(_.mkString(" ")).toSeq
        val nWords = ts.length.toLong
        val topW = ts.groupBy(identity).values.map(_.size).max.toLong
        val nBg = bgs.length.toLong
        val nDup = nBg - bgs.distinct.length.toLong
        val keep = nWords >= TextAnalysis.GopherMinWords &&
          nDup * 1000L <= nBg * TextAnalysis.GopherDupPm &&
          topW * 1000L <= nWords * TextAnalysis.GopherTopPm
        id -> (nWords, topW, nBg, nDup, if (keep) 1L else 0L)
      }.toMap
    assert(got == want)
    // the rule must actually split the corpus (both classes present)
    assert(got.values.exists(_._5 == 1L) && got.values.exists(_._5 == 0L))
  }

  test("ev_sequence_pattern equals a sequential per-user replay") {
    val got = Events.evSequencePattern(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_views"), r.getAs[Long]("n_conversions"))).toMap
    val ev = Tables.events(spark, sf)
      .select(expr("ts div 1000").as("ts_us"), col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = ev.groupBy(_._2).flatMap { case (user, es) =>
      val views = es.filter(_._3 == "view").map(_._1)
      val clicks = es.filter(_._3 == "click").map(_._1)
      val purchases = es.filter(_._3 == "purchase").map(_._1)
      val conv = views.count { t =>
        val cs = clicks.filter(c => c > t && c <= t + Events.Seq1Us)
        cs.nonEmpty && {
          val c = cs.min
          purchases.exists(p => p > c && p <= c + Events.Seq2Us)
        }
      }
      if (conv > 0) Some(user -> (views.length.toLong, conv.toLong)) else None
    }
    assert(got == want)
    assert(got.nonEmpty)
    // strictness: some user must have a view that did NOT convert
    assert(got.values.exists { case (v, c) => c < v })
  }

  test("pipeline_interleave equals the sequential stride schedule") {
    val rows = Pipeline.pipelineInterleave(spark, sf).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[Long]("w"), r.getAs[Long]("vt")))
    val docs = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val w = 1L + src.drop(3).toLong % 3L
      ds.map(_._1).sorted.zipWithIndex.map { case (id, i) =>
        (id, src, w, (i + 1L) * (Pipeline.StrideLcm / w))
      }
    }.sortBy { case (id, src, _, vt) => (vt, src, id) }
      .zipWithIndex
      .map { case ((id, src, w, vt), i) => (i + 1L, id, src, w, vt) }
    assert(rows.toSeq == want)
    // weighting is visible: among the first 20% of positions, weight-3
    // sources must out-emit weight-1 sources
    val head = rows.take(rows.length / 5)
    val by = head.groupBy(_._4).view.mapValues(_.length).toMap
    assert(by.getOrElse(3L, 0) > by.getOrElse(1L, 0))
  }

  test("lake_delete_vectors: positional anti-join equals the logical filter") {
    val got = graft.ops.Lake.lakeDeleteVectors(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("id_sum"), r.getAs[Long]("sum_value_c")))
      .toMap
    val ev = Tables.events(spark, sf)
      .select("event_type", "event_id", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = ev.filter(_._3 % 7L != 0L).groupBy(_._1).map { case (t, rs) =>
      t -> (rs.length.toLong, rs.map(_._2).sum, rs.map(r => centsOf(r._4)).sum)
    }
    assert(got == want)
    // the delete set is non-trivial: some rows really were tombstoned
    assert(ev.exists(_._3 % 7L == 0L))
  }

  test("vs_diversify equals a sequential MMR greedy replay") {
    // The int8 grid is collected from Spark (re-quantizing on the driver
    // could round differently); candidate cut, pairwise sims, and the
    // greedy itself are replayed sequentially in exact Long arithmetic.
    val grid = VectorSearch.int8Grid(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val want = grid.keys.filter(_ % 100L == 0L).toSeq.sorted.flatMap { qid =>
      val cand = grid.keys.filter(_ != qid).toSeq
        .map(c => c -> dot(grid(c), grid(qid)))
        .sortBy { case (c, rel) => (-rel, c) }
        .take(VectorSearch.MmrC)
      val rel = cand.toMap
      var sel = Vector(cand.head._1)
      var out = Vector((qid, cand.head._1, 1L, cand.head._2 * 2L))
      for (s <- 2 to VectorSearch.MmrK) {
        val pick = cand.filter(c => !sel.contains(c._1)).map { case (c, r) =>
          val maxsim = sel.map(t => dot(grid(c), grid(t))).max
          (c, r * 2L - maxsim)
        }.minBy { case (c, mmr) => (-mmr, c) }
        sel :+= pick._1
        out :+= ((qid, pick._1, s.toLong, pick._2))
      }
      out
    }
    val got = VectorSearch.vsDiversify(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Long]("step"), r.getAs[Long]("mmr"))).toSeq
    assert(got == want)
    // diversification did something: for some query the rank-2 pick by
    // pure relevance is NOT the step-2 MMR pick
    val relRank2: Map[Long, Long] = grid.keys.filter(_ % 100L == 0L).map { qid =>
      qid -> grid.keys.filter(_ != qid).toSeq
        .map(c => c -> dot(grid(c), grid(qid)))
        .sortBy { case (c, rel) => (-rel, c) }
        .apply(1)._1
    }.toMap
    val mmrStep2 = got.filter(_._3 == 2L).map(t => t._1 -> t._2).toMap
    assert(relRank2.exists { case (q, c) => mmrStep2(q) != c })
  }
}
