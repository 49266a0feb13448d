package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `bench_steady.json`: per-query trailing-median steady states
  * (median of SPARK_GRAFT_REPS reps, default 5, noop sink) that
  * `graft.Bench` uses as its stall detector. Run on an idle host:
  *   sbt "runMain graft.tools.Steady bench_steady.json"
  * The medians are a detection reference only — bench headlines always
  * come from the bench's own reps.
  */
object Steady {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("bench_steady.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // Comma-separated subset probe (same convention as Verify). A subset
    // run prints STEADY lines but does NOT rewrite the json output.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.trim).filter(_.nonEmpty)
      .map(_.split(',').map(_.trim).toSet)
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Calibration sentinel (r13): bracket the sweep with the fixed spin
    // so the steady file carries its own load context, and REFUSE to
    // write a reference whose host drifted mid-sweep — a drifted
    // bench_steady.json poisons every later round's stall detector.
    val calBefore = graft.util.Calibrate.spinSecondsIsolated()
    val medians = selected.map { case (name, fn) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = ts(ts.size / 2)
      println(f"STEADY $name%s median=$med%.3f s reps=${ts.map(t => f"$t%.2f").mkString(",")}")
      name -> med
    }
    val calAfter = graft.util.Calibrate.spinSecondsIsolated()
    val calRatio = graft.util.Calibrate.ratio(calBefore, calAfter)
    println(f"STEADY_CAL before=$calBefore%.3f s after=$calAfter%.3f s ratio=$calRatio%.3f")
    val drifted = calRatio > graft.util.Calibrate.DriftLimit
    if (drifted) System.err.println(
      f"[steady] CALIBRATION DRIFT: spin $calBefore%.3f s -> $calAfter%.3f s " +
      f"(ratio $calRatio%.2f > ${graft.util.Calibrate.DriftLimit}): host load changed " +
      "DURING the sweep - REFUSING to write the steady reference. " +
      "Re-run on an idle host (override with SPARK_GRAFT_STEADY_FORCE=1).")
    val force = sys.env.get("SPARK_GRAFT_STEADY_FORCE").contains("1")
    if (only.isEmpty && (!drifted || force)) {
      // _cal_* keys ride in the same flat object; Bench's stall lookup
      // is by query name, so they are inert there but keep the load
      // context inside the committed artifact.
      // _git_sha is a string value: Bench's numeric-only stall-lookup
      // regex and ArtifactSyncSpec's numeric key scrape both skip it,
      // while the freeze gate reads it to pin regeneration to HEAD.
      val shaEntry = graft.util.GitInfo.stampSha()
        .map(s => "\"_git_sha\":\"" + s + "\",").getOrElse("")
      val json = "{" + shaEntry + (medians ++ Seq(
          "_cal_before_s" -> calBefore, "_cal_after_s" -> calAfter))
        .map { case (k, v) => "\"" + k + "\":" + graft.util.Jnum.f4(v) }
        .mkString(",") + "}"
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
    if (drifted && !force && only.isEmpty) sys.exit(2)
  }
}
