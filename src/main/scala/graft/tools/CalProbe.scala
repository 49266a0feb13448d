package graft.tools

/** Evidence harness for the r14 calibration-sentinel fix (see
  * [[graft.util.Calibrate.spinSecondsIsolated]]): is the "after" spin
  * measuring AMBIENT host drift (what the guard exists to catch) or
  * the sweep's own shadow — residual state a 32-thread load leaves in
  * the measuring JVM?
  *
  * Protocol: in-JVM spin (fresh) and isolated subprocess spin → 60 s of
  * all-core load → both spins immediately → 15 s idle → both → 30 s
  * idle → both. Measured on this host class (r14): the in-JVM spin
  * reads 1.27–1.32× fresh after the load and stays there indefinitely
  * (an earlier variant of this probe held the inflation flat through
  * 6 min of idle), while the isolated spin stays at the fresh constant
  * throughout — the in-JVM after-spin measures JVM state, not host
  * state, which is why Bench/Steady bracket their sweeps with the
  * subprocess variant.
  */
object CalProbe {
  def main(args: Array[String]): Unit = {
    def both(tag: String, fresh: Double, freshIso: Double): Unit = {
      val j = graft.util.Calibrate.spinSeconds()
      val i = graft.util.Calibrate.spinSecondsIsolated()
      println(f"CALPROBE $tag%s in_jvm=$j%.3f s (x${j / fresh}%.3f) " +
        f"isolated=$i%.3f s (x${i / freshIso}%.3f)")
    }
    val fresh = graft.util.Calibrate.spinSeconds()
    val freshIso = graft.util.Calibrate.spinSecondsIsolated()
    println(f"CALPROBE fresh in_jvm=$fresh%.3f s isolated=$freshIso%.3f s")
    val threads = (1 to 32).map { _ =>
      val t = new Thread(() => {
        val stop = System.nanoTime() + 60L * 1000000000L
        var h = 1L
        while (System.nanoTime() < stop) { h = h * 6364136223846793005L + 1442695040888963407L }
        if (h == 42L) println("") // keep h live
      })
      t.setDaemon(true); t.start(); t
    }
    threads.foreach(_.join())
    both("immediately_after_load", fresh, freshIso)
    Thread.sleep(15000); both("after_15s_idle", fresh, freshIso)
    Thread.sleep(30000); both("after_45s_idle", fresh, freshIso)
  }
}
