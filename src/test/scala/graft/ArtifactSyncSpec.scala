package graft

import org.scalatest.funsuite.AnyFunSuite

/** Standing guard for the r12/r13 end-of-round blemish: both of those
  * rounds committed final bench artifacts and THEN registered one more
  * key in the snapshot commit, so the judged sweeps didn't cover the
  * registry (r12: stream_decontaminate's stale reps; r13:
  * stream_semantic_gate absent from the 155-key sweeps while HEAD had
  * 156). Two invariant tiers:
  *
  *   - ALWAYS: every key in a committed artifact names a registered
  *     query (an artifact can lag the registry mid-round while keys are
  *     being added, but it can never carry a key the registry dropped),
  *     and the steady file carries its calibration context.
  *   - FREEZE GATE (`SPARK_GRAFT_FREEZE=1 sbt test` — run this as the
  *     end-of-round check after regenerating artifacts): exact key-set
  *     EQUALITY between the registry and both committed artifacts, so
  *     a late registration fails the suite instead of shipping
  *     uncovered.
  */
class ArtifactSyncSpec extends AnyFunSuite {
  private def keysOf(path: String, inQueriesBlock: Boolean): Set[String] = {
    val f = new java.io.File(path)
    assert(f.isFile, s"$path missing — regenerate it (see SURVEY final-state procedure)")
    val txt = {
      val s = scala.io.Source.fromFile(f, "UTF-8")
      try s.mkString finally s.close()
    }
    val body = if (inQueriesBlock)
      """"queries"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse(fail(s"$path: no queries object"))
    else txt
    """"([a-z0-9_]+)"\s*:\s*-?[0-9.eE+]+""".r.findAllMatchIn(body)
      .map(_.group(1)).toSet
  }

  private val registry = SparkEntry.queries.keySet
  private lazy val steadyAll = keysOf("bench_steady.json", inQueriesBlock = false)
  private lazy val steady = steadyAll.filterNot(_.startsWith("_cal"))
  private lazy val sf1 = keysOf("bench_sf1.json", inQueriesBlock = true)

  test("committed artifacts never carry unregistered keys") {
    assert((steady -- registry).isEmpty,
      s"bench_steady.json keys not in registry: ${(steady -- registry).toSeq.sorted}")
    assert((sf1 -- registry).isEmpty,
      s"bench_sf1.json keys not in registry: ${(sf1 -- registry).toSeq.sorted}")
  }

  test("steady reference carries its calibration context") {
    assert(steadyAll.contains("_cal_before_s") && steadyAll.contains("_cal_after_s"),
      "bench_steady.json lacks the _cal_* sentinel keys — written by a pre-r13 Steady?")
  }

  test("freeze gate: artifacts cover the registry exactly (SPARK_GRAFT_FREEZE=1)") {
    assume(sys.env.get("SPARK_GRAFT_FREEZE").contains("1"),
      "mid-round run: registry may legitimately lead the artifacts; " +
        "run SPARK_GRAFT_FREEZE=1 sbt test as the end-of-round gate")
    assert(registry == steady,
      s"registry vs bench_steady.json: +${(registry -- steady).toSeq.sorted} " +
        s"-${(steady -- registry).toSeq.sorted}")
    assert(registry == sf1,
      s"registry vs bench_sf1.json: +${(registry -- sf1).toSeq.sorted} " +
        s"-${(sf1 -- registry).toSeq.sorted}")
  }
}
