package graft.tools

/** Calibration-normalized diff of two bench artifacts:
  *
  *   sbt "runMain graft.tools.SweepDiff BENCH_r13.json bench_result.json"
  *
  * Every sweep JSON since r13 carries its own calibration pair, so the
  * "is this 1.2× a regression or a slower host day?" question is
  * decidable from the artifacts alone — this tool does that decision
  * mechanically: it scales every per-key ratio by the AMBIENT factor
  * (the calibration-spin ratio between the two files) and reports only
  * keys whose normalized ratio escapes [1/outlier, outlier]. A uniform
  * host shift therefore reports ZERO outliers; a genuine per-key
  * regression survives normalization. Keys present in only one file
  * are listed separately (added/removed surface, not drift).
  *
  * Parsing is the same dependency-free regex approach Bench uses for
  * its steady reference; works on bench_result.json / bench_sf1.json /
  * BENCH_r*.json (any flat `"queries":{...}` object with an optional
  * `"calibration":{...}` sibling).
  */
object SweepDiff {
  private def flatBlock(txt: String, path: String, name: String): Option[Map[String, Double]] =
    (s""""$name"\\s*:\\s*\\{([^}]*)\\}""").r.findFirstMatchIn(txt).map { m =>
      val qBlock = m.group(1)
      // The first-closing-brace regex silently truncates if the object
      // ever gains a nested object (r14 advice) — in that case the
      // captured block would contain the nested '{'; fail loudly instead
      // of under-reading the artifact.
      require(!qBlock.contains("{"),
        s"$path: $name object contains a nested '{' — the flat-object parse would truncate it")
      """"([^"]+)"\s*:\s*(-?[0-9.eE+]+)""".r.findAllMatchIn(qBlock)
        .map(mm => mm.group(1) -> mm.group(2).toDouble).toMap
    }

  private def parse(path: String)
      : (Map[String, Double], Option[Map[String, Double]], Option[Double]) = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    val qs = flatBlock(txt, path, "queries").getOrElse(
      sys.error(s"$path: no \"queries\" object found"))
    // The per-key MEDIANS block (r16: Bench emits median-of-reps beside
    // the min headline) — one-shot mins swing up to 3.6× under this
    // host's roaming stalls, so median-vs-median is the
    // adjudication-grade comparison when BOTH artifacts carry it.
    val meds = flatBlock(txt, path, "medians")
    val cal = """"calibration"\s*:\s*\{[^}]*"before_s"\s*:\s*([0-9.eE+]+)[^}]*"after_s"\s*:\s*([0-9.eE+]+)""".r
      .findFirstMatchIn(txt)
      .map(m => (m.group(1).toDouble + m.group(2).toDouble) / 2.0)
    (qs, meds, cal)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SweepDiff <old.json> <new.json> [outlierFactor]")
    val outlier = if (args.length > 2) args(2).toDouble else 1.5
    val (oldMin, oldMed, oldCal) = parse(args(0))
    val (newMin, newMed, newCal) = parse(args(1))
    // Medians only when both sides have them — a median-vs-min mix
    // would manufacture a systematic ratio shift.
    val (oldQ, newQ, basis) = (oldMed, newMed) match {
      case (Some(a), Some(b)) => (a, b, "median")
      case _ => (oldMin, newMin, "min")
    }
    println(s"SWEEPDIFF basis=$basis")
    val ambient = (oldCal, newCal) match {
      case (Some(a), Some(b)) => b / a
      case _ => 1.0
    }
    println(f"SWEEPDIFF ambient_factor=$ambient%.3f " +
      s"(old_cal=${oldCal.map(c => f"$c%.3f").getOrElse("n/a")} " +
      s"new_cal=${newCal.map(c => f"$c%.3f").getOrElse("n/a")})")
    val common = (oldQ.keySet & newQ.keySet).toSeq.sorted
      .filter(k => oldQ(k) > 0 && newQ(k) > 0)
    val normalized = common.map(k => (k, newQ(k) / oldQ(k) / ambient))
    val sortedR = normalized.map(_._2).sorted
    if (sortedR.nonEmpty) {
      val med = sortedR(sortedR.size / 2)
      println(f"SWEEPDIFF keys=${common.size} median_normalized_ratio=$med%.3f " +
        f"sum_old=${common.map(oldQ).sum}%.1f s sum_new=${common.map(newQ).sum}%.1f s")
    }
    // Tiny keys drown in scheduler noise; only flag outliers with a
    // meaningful absolute cost on at least one side.
    val flagged = normalized.filter { case (k, r) =>
      (r > outlier || r < 1.0 / outlier) && math.max(oldQ(k), newQ(k)) >= 0.5
    }
    if (flagged.isEmpty) println("SWEEPDIFF no normalized outliers - any shift is uniform host drift")
    flagged.sortBy { case (_, r) => -math.max(r, 1 / r) }.foreach { case (k, r) =>
      println(f"SWEEPDIFF OUTLIER $k%s normalized=${r}%.2fx raw=${newQ(k) / oldQ(k)}%.2fx " +
        f"(${oldQ(k)}%.2f s -> ${newQ(k)}%.2f s)")
    }
    val added = (newQ.keySet -- oldQ.keySet).toSeq.sorted
    val removed = (oldQ.keySet -- newQ.keySet).toSeq.sorted
    if (added.nonEmpty) println(s"SWEEPDIFF added: ${added.mkString(", ")}")
    if (removed.nonEmpty) println(s"SWEEPDIFF removed: ${removed.mkString(", ")}")
  }
}
