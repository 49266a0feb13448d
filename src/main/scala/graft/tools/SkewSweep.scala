package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hostile-skew audit sweep (r14 verdict #3): every candidate-volume
  * alarm bound in [[graft.Audits]] was calibrated on the driver's
  * word-soup/isotropic corpus — this tool measures what each guard does
  * on a corpus built to break it ([[SynthScale.hostile]]: Zipf event
  * keys, a hub-dominated transition graph, one mega-duplicate document
  * family, a dense identical-embedding plant), and records the verdict
  * per audit in a committed artifact:
  *
  *   sbt "runMain graft.tools.SkewSweep /root/testdata/sf0.1 skew_sweep.json"
  *
  * For each audit the artifact carries the BASELINE (unplanted) and
  * HOSTILE counts plus the interpretation a reader needs:
  *   - `alarm` true on hostile = the guard FIRED LOUDLY (a bench sweep
  *     on such data prints the alarm and lists the key — the designed
  *     behavior for a blocking collapse);
  *   - `alarm` false on hostile = the guard HELD the volume inside its
  *     linear bound (the caps absorbed the plant) — also designed;
  *   - the failure mode this sweep exists to rule out is a hostile
  *     count far above baseline with NO alarm and NO engaged cap
  *     (silent quadratic work): `silent_degradation` flags exactly
  *     that combination mechanically.
  * Guard-exactness is recorded next to the volumes: the salted
  * aggregation must stay EXACT under the Zipf law, and exact dedup must
  * collapse the mega-family to one survivor. SkewSweepSpec pins the
  * same invariants at spec scale on every run.
  */
object SkewSweep {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("skew_sweep.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hostileDir = java.nio.file.Files.createTempDirectory("graft-hostile").toString
    graft.util.Persist.deleteOnExit(new java.io.File(hostileDir))
    SynthScale.hostile(spark, src, hostileDir)

    // Plant-strength facts, so the artifact proves the corpus is hostile.
    val ev = graft.Tables.events(spark, hostileDir)
    val nEv = ev.count()
    val topUser = ev.groupBy("user_id").count().orderBy(col("count").desc)
      .head()
    val hubShare = ev.filter(col("event_type") === "view").count()
    val docs = graft.Tables.documents(spark, hostileDir)
    val nDocs = docs.count()
    val megaFamily = docs.groupBy("text").count().agg(max("count")).head().getLong(0)
    val emb = graft.Tables.embeddings(spark, hostileDir)
    val nVec = emb.count()
    val hotVecs = emb.groupBy("embedding").count().agg(max("count")).head().getLong(0)

    // Guard exactness under the plants (the guards' CONTRACT, not just
    // their volume): salted aggregation vs a plain groupBy on the Zipf
    // stream; exact dedup survivor count vs distinct texts.
    val salted = graft.SparkEntry.queries("ev_skew_agg")(spark, hostileDir)
      .collect().map(_.toSeq).toSet
    val plain = graft.Tables.events(spark, hostileDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(graft.util.Det.cents(col("value"))).as("sum_value_c"))
      .collect().map(_.toSeq).toSet
    val saltedExact = salted == plain
    // dedup_exact emits one row per distinct text (h, keep_id, n):
    // its row count IS the survivor count.
    val survivors = graft.SparkEntry.queries("dedup_exact")(spark, hostileDir).count()
    val distinctTexts = docs.select("text").distinct().count()
    val dedupExactOk = survivors == distinctTexts

    def auditLine(dir: String): Map[String, (Long, Long, Boolean)] =
      graft.Audits.audits.map { case (name, a) =>
        val (c, r) =
          try (a.count(spark, dir), a.rows(spark, dir))
          catch { case e: Throwable =>
            System.err.println(s"[skew] audit $name failed on $dir: ${e.getMessage}")
            (-1L, -1L)
          }
        name -> ((c, r, c >= 0 && graft.Audits.breached(a, c, r)))
      }
    val base = auditLine(src)
    val host = auditLine(hostileDir)

    def fmt(d: Double) = graft.util.Jnum.f3(d) // locale-fixed: machine-parsed JSON
    val auditJson = graft.Audits.audits.keys.toSeq.sorted.map { name =>
      val (bc, br, bAlarm) = base(name)
      val (hc, hr, hAlarm) = host(name)
      val bound = graft.Audits.audits(name).maxPerRow
      // Silent degradation = hostile per-row volume blows past 4× the
      // baseline per-row AND past half the alarm bound, with no alarm:
      // quadratic work arriving invisibly.
      val bpr = if (br > 0) bc.toDouble / br else 0.0
      val hpr = if (hr > 0) hc.toDouble / hr else 0.0
      val silent = !hAlarm && hc >= 0 && hpr > 4 * math.max(bpr, 0.01) &&
        hpr > bound / 2
      s""""$name":{"baseline_count":$bc,"baseline_rows":$br,""" +
        s""""baseline_per_row":${fmt(bpr)},"hostile_count":$hc,""" +
        s""""hostile_rows":$hr,"hostile_per_row":${fmt(hpr)},""" +
        s""""bound":$bound,"alarm_baseline":$bAlarm,"alarm_hostile":$hAlarm,""" +
        s""""silent_degradation":$silent}"""
    }.mkString("{", ",", "}")

    val gitSha = graft.util.GitInfo.stampSha().getOrElse("unknown")
    val json = s"""{"src":"$src","git_sha":"$gitSha",""" +
      s""""plants":{"events":$nEv,"top_user_events":${topUser.getLong(1)},""" +
      s""""hub_view_events":$hubShare,"docs":$nDocs,""" +
      s""""mega_family_size":$megaFamily,"vectors":$nVec,""" +
      s""""hot_vector_copies":$hotVecs},""" +
      s""""guards":{"salted_agg_exact":$saltedExact,""" +
      s""""dedup_exact_survivors_ok":$dedupExactOk,""" +
      s""""survivors":$survivors,"distinct_texts":$distinctTexts},""" +
      s""""audits":$auditJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"SKEWSWEEP wrote $out")
    println(json)
    spark.stop()
  }
}
