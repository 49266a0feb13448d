package graft

import graft.ops.Dedup

/** The candidate-telemetry alarm rule (VERDICT r11 #2): the sweep's
  * per-row bounds must (a) pass on every production candidate frame and
  * (b) TRIP on the historical r10 blocking collapse — otherwise the
  * alarm is either noisy or vacuous. The collapse is reproduced with
  * the real code path (`ngramSignatures(mixed = false)`: no avalanche
  * mix → all 16 affine permutations are monotone in the gram hash →
  * every slot images the same global-min gram → band keys collapse to
  * length∧min-gram), run through the production join
  * ([[Dedup.ngramRawPairsFrom]]), and counted exactly as Bench counts
  * it.
  */
class AuditAlarmSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"

  test("every production candidate frame sits inside its alarm bound") {
    for ((name, a) <- Audits.audits.toSeq.sortBy(_._1)) {
      val v = a.count(spark, sf01)
      val rows = a.rows(spark, sf01)
      info(f"$name: $v over $rows rows = ${v.toDouble / rows}%.2f/row (bound ${a.maxPerRow}%.1f)")
      assert(!Audits.breached(a, v, rows),
        f"$name breaches its own bound on the clean corpus — bound too tight or a regression")
      assert(v >= 0, s"$name audit failed to run")
    }
  }

  test("the r10 unmixed-minhash blocking collapse trips the raw-pairs alarm") {
    // At sf0.01 the quadratic blowup hasn't bitten yet (500 docs →
    // collapsed 126/row, measured); the alarm exists to catch it at
    // sweep scale, so reproduce at sf0.1 where it must trip.
    val sf1dir = "/root/testdata/sf0.1"
    val audit = Audits.audits("dedup_ngram_jaccard.raw_pairs")
    val rows = audit.rows(spark, sf1dir)
    val healthy = audit.count(spark, sf1dir)
    val collapsed =
      Dedup.ngramRawPairsFrom(Dedup.ngramSignatures(spark, sf1dir, mixed = false))
        ._2.count()
    info(f"raw pairs: healthy $healthy (${healthy.toDouble / rows}%.1f/row) vs " +
      f"collapsed $collapsed (${collapsed.toDouble / rows}%.1f/row), bound ${audit.maxPerRow}%.1f/row")
    assert(!Audits.breached(audit, healthy, rows), "healthy frame must not alarm")
    assert(Audits.breached(audit, collapsed, rows),
      f"the reproduced r10 collapse ($collapsed raw pairs over $rows docs) " +
      f"must exceed ${audit.maxPerRow}%.1f/row — the alarm is vacuous otherwise")
    // Measured 3.8× at sf0.1 — the gap grows with n (collapsed buckets
    // are corpus fractions, so collapsed/row ∝ n while healthy/row is
    // ~flat: 318→457 across sf0.1→sf1); the NgramBucketCap bounds the
    // per-bucket blowup, which is why this is 3.8× and not 300×.
    assert(collapsed > healthy * 3,
      "collapse reproduction is too mild to be the r10 bug class")
  }

  test("lshTunedGeo operating ceiling: geometry saturates past ~119k and the measured floor trips the alarm") {
    import graft.ops.VectorSearch
    val geo = VectorSearch.lshTunedGeo
    val (rMax, bMax) = geo.last
    val ceiling = VectorSearch.LshAdaptCandsPerRow * (1L << (rMax + 1)) / bMax
    assert(ceiling > 100000L && ceiling < 140000L, s"ceiling moved: $ceiling")
    // Below the ceiling the pick still adapts; past it, getOrElse holds
    // the last geometry — the documented saturation.
    assert(VectorSearch.lshAdaptiveGeometry(20000L, geo) != geo.last,
      "sf1-scale corpus should not be saturated")
    assert(VectorSearch.lshAdaptiveGeometry(ceiling + 1, geo) == geo.last)
    assert(VectorSearch.lshAdaptiveGeometry(750000L, geo) == geo.last)
    // Measured past the ceiling (tools/LshCeilingProbe, r13; n=750k
    // synthetic ISOTROPIC vectors — no planted pairs, so the count is
    // pure random floor — through the EXACT production audit):
    // 45,637,584 candidates = 60.85/row vs the 10.0/row bound → the
    // alarm fires, 6.1× over. The uniform 2^-r model predicted
    // 12.58/row; real sign-correlation on 64-dim data runs ~4.8× that
    // (Jensen: E[(1−θ/π)^r] > 2^−r), so the floor crosses the bound
    // near the documented n* itself — the guard has no dead zone
    // between "geometry saturated" and "alarm fires".
    val audit = Audits.audits("vs_lsh_tuned.candidates")
    assert(Audits.breached(audit, 45637584L, 750000L),
      "the measured past-ceiling candidate volume must trip the bound")
    // The measured slope (60.85/row at 750k → per-row ∝ n at fixed
    // geometry) back-projects to the bound being crossed at
    // n ≈ 750k·10/60.85 ≈ 123k — within 4% of the ceiling estimate.
    val alarmAt = (750000L * audit.maxPerRow / 60.85).toLong
    assert(math.abs(alarmAt - ceiling) < ceiling / 5,
      s"alarm onset $alarmAt vs ceiling $ceiling drifted apart")
  }
}
