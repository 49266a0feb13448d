package graft.util

/** Host-load calibration sentinel (r12 verdict item #2: two consecutive
  * rounds shipped final sweep artifacts from a drifting host, and the
  * diagnosis each time was manual re-probing after the fact).
  *
  * [[spinSeconds]] times a FIXED single-threaded integer-mix loop —
  * pure CPU, no allocation, no I/O — so its wall time on an idle host
  * is a stable constant for a given JVM/CPU class, and the
  * before/after pair bracketing a sweep records the sweep's load
  * context inside the artifact itself: a ~1.2× uniform per-key drift
  * accompanied by a ~1.2× calibration inflation is host load, not a
  * code regression, decidable from the committed JSON alone.
  *
  * The loop body is the splitmix64-style xor-shift/multiply mix (two
  * 64-bit multiplies + shifts per iteration) — long-latency enough
  * that neither superscalar width nor SIMD hides host contention, and
  * the result feeds a volatile sink so the JIT cannot eliminate it.
  * Each call pre-spins 1/10 of the iterations untimed so the first
  * measurement isn't polluted by JIT compilation of its own loop. */
object Calibrate {
  /** Tuned to ~0.3–0.5 s on an idle host of this class (measured; see
    * CalibrateSpec which pins only determinism, not wall time). */
  final val Iters = 400000000L

  @volatile private var sink = 0L // defeats dead-code elimination

  private def spin(n: Long): Long = {
    var h = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < n) {
      h = (h ^ (h >>> 33)) * 0xFF51AFD7ED558CCDL + i
      i += 1L
    }
    h
  }

  /** Wall-clock seconds for the fixed spin (warmup pre-spin included
    * but untimed). */
  def spinSeconds(): Double = {
    sink = spin(Iters / 10L) // JIT/OSR warmup, untimed
    val t0 = System.nanoTime()
    sink = spin(Iters)
    (System.nanoTime() - t0) / 1e9
  }

  /** Disagreement ratio of a before/after pair: max/min, ≥ 1. */
  def ratio(a: Double, b: Double): Double =
    if (a <= 0 || b <= 0) Double.PositiveInfinity
    else math.max(a, b) / math.min(a, b)

  /** A sweep whose calibration pair disagrees by more than this is
    * load-contaminated: its numbers carry unknown host drift. */
  final val DriftLimit = 1.2
}
