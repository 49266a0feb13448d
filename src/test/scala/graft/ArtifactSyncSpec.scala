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
    val body = if (inQueriesBlock) {
      val b = """"queries"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse(fail(s"$path: no queries object"))
      // Same truncation guard as SweepDiff (r14 advice): a nested
      // object inside "queries" would make the first-closing-brace
      // capture under-read the artifact — and this coverage gate would
      // under-assert together with the diff tool. Fail loudly.
      assert(!b.contains("{"),
        s"$path: queries object contains a nested '{' — flat-object parse would truncate")
      b
    } else txt
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

  test("freeze gate: CATALOG.md registration lines are in sync (SPARK_GRAFT_FREEZE=1)") {
    assume(sys.env.get("SPARK_GRAFT_FREEZE").contains("1"),
      "mid-round run: CatalogSpec is the standing guard; this tier makes the " +
        "end-of-round freeze command catch doc drift too")
    // r16 verdict #1: the final product commit (35e7607) shifted
    // Streaming.scala registration lines AFTER the last CATALOG.md
    // regeneration, and the freeze ritual only ran ArtifactSyncSpec —
    // so sbt test shipped red. Duplicate CatalogSpec's line-pin check
    // here so the ONE end-of-round command covers it.
    val rowRe = """\| `([a-z0-9_]+)` \| .+ \| ([^|: ]+):(\d+) \|""".r
    val rows = {
      val s = scala.io.Source.fromFile("CATALOG.md", "UTF-8")
      try s.getLines().collect { case rowRe(k, f, l) => (k, f, l.toInt) }.toList
      finally s.close()
    }
    val lineCache = scala.collection.mutable.Map.empty[String, Map[String, Int]]
    def registrations(file: String): Map[String, Int] =
      lineCache.getOrElseUpdate(file, {
        val s = scala.io.Source.fromFile(file, "UTF-8")
        val re = """"([a-z0-9_]+)" -> """.r.unanchored
        try s.getLines().zipWithIndex.collect {
          case (re(k), i) => k -> (i + 1)
        }.toList.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
        finally s.close()
      })
    val drifted = rows.collect {
      case (k, f, l) if registrations(f).get(k) != Some(l) =>
        s"$k ($f: catalog $l vs actual ${registrations(f).getOrElse(k, -1)})"
    }
    assert(drifted.isEmpty,
      s"CATALOG.md stale — run `sbt \"runMain graft.tools.CatalogRepin\"`: " +
        drifted.take(5).mkString("; "))
  }

  private def shaOf(path: String, key: String): Option[String] = {
    val txt = {
      val s = scala.io.Source.fromFile(path, "UTF-8")
      try s.mkString finally s.close()
    }
    ("\"" + key + """"\s*:\s*"([0-9a-f]{7,40})"""").r
      .findFirstMatchIn(txt).map(_.group(1))
  }

  test("freeze gate: no product-source change since artifact regeneration (SPARK_GRAFT_FREEZE=1)") {
    assume(sys.env.get("SPARK_GRAFT_FREEZE").contains("1"),
      "mid-round run: product sources may legitimately lead the artifacts")
    // r14 verdict #6: key-set equality alone let a post-regeneration
    // product-source refactor ship with one-commit-stale sweeps. Each
    // artifact records the HEAD it was generated at; the gate passes
    // only if src/main is IDENTICAL between that SHA and the tree under
    // test (commits that touch only tests/docs/artifacts stay legal —
    // the snapshot commit itself doesn't trip it).
    // r15 verdict #3 / advice: the skew sweeps shipped one-commit-stale
    // twice (3ed8f96 / 870400d vs the bench artifacts' fa6ea5a) because
    // only the bench artifacts were SHA-gated. The hostile-audit
    // evidence is a product claim like any other — gate all four.
    for ((path, key) <- Seq(("bench_steady.json", "_git_sha"),
                            ("bench_sf1.json", "git_sha"),
                            ("skew_sweep.json", "git_sha"),
                            ("skew_sweep_sf1.json", "git_sha"))) {
      val sha = shaOf(path, key)
      assert(sha.isDefined,
        s"$path carries no $key stamp — regenerate with the r15+ Steady/Bench")
      val changed = util.GitInfo.changedProductSources(sha.get)
      assert(changed.isDefined,
        s"git unavailable or ${sha.get} unknown — freeze gate cannot verify $path")
      assert(changed.get.isEmpty,
        s"product sources changed since $path was generated at ${sha.get.take(12)}: " +
          s"${changed.get.sorted.mkString(", ")} — regenerate the artifacts at HEAD")
    }
  }

  test("stampSha marks dirty product trees, and the freeze gate rejects the mark") {
    // r18 verdict #4: lsh_ceiling.json was generated from a DIRTY
    // pre-commit tree and stamped the clean base SHA — the artifact's
    // content contradicted the tree its stamp named. stampSha (used by
    // every artifact writer) appends "-dirty" when src/main has
    // uncommitted changes; the suffix must (a) track the actual tree
    // state and (b) fail the freeze gate's quote-bounded hex match, so
    // a dirty-tree artifact reads "carries no stamp" instead of
    // passing on the stale SHA.
    (util.GitInfo.headSha(), util.GitInfo.stampSha()) match {
      case (Some(head), Some(stamp)) =>
        val treeDirty = util.GitInfo.changedProductSources(head).exists(_.nonEmpty)
        assert(stamp == (if (treeDirty) s"$head-dirty" else head),
          s"stampSha $stamp inconsistent with tree state (dirty=$treeDirty)")
        val gateRegex = ("\"git_sha\"\\s*:\\s*\"([0-9a-f]{7,40})\"").r
        assert(gateRegex.findFirstMatchIn(s""""git_sha":"$head-dirty"""").isEmpty,
          "freeze-gate regex accepted a -dirty stamp — dirty artifacts would pass")
        assert(gateRegex.findFirstMatchIn(s""""git_sha":"$head"""").isDefined)
      case _ => cancel("git unavailable — stamp behavior not checkable here")
    }
  }
}
