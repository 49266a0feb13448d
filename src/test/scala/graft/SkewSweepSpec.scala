package graft

import org.apache.spark.sql.functions._

/** Hostile-corpus guard behavior (r14 verdict #3, the spec twin of
  * tools/SkewSweep and the committed skew_sweep.json): the audit bounds
  * were calibrated on the synthetic word-soup corpus, so this suite
  * re-plants the three adversarial distributions at spec scale
  * ([[graft.tools.SynthScale.hostile]]) and pins what each guard must
  * do — fire LOUDLY or hold the volume, never degrade silently.
  *
  * Measured at sf0.1 (skew_sweep.json, r15): the 500-doc mega-family
  * drives minhash candidates to 25.1/row vs bound 2.0 → the volume
  * alarm fires (loud); every other audit stays inside its bound; the
  * salted aggregation and exact dedup stay EXACT under the Zipf/hub/
  * mega-dup plants; zero silent degradations.
  */
class SkewSweepSpec extends SparkSpec {
  private val MegaDupEvery = 5L

  private lazy val hostileDir: String = {
    val out = java.nio.file.Files.createTempDirectory("graft-hostile-spec").toString
    graft.tools.SynthScale.hostile(spark, sf, out,
      megaDupEvery = MegaDupEvery, hotVecEvery = 16L)
    out
  }

  test("the plants are real: Zipf head user, hub event type, mega-dup family") {
    val ev = Tables.events(spark, hostileDir)
    val total = ev.count()
    val counts = ev.groupBy("user_id").count().collect().map(_.getLong(1)).sorted
    val median = counts(counts.length / 2)
    // Zipf(1) head: ~1/H_U of ALL events on rank 1 (≥10% at any test
    // U), and clearly above the median user — the whale profile the
    // salted aggregate must absorb.
    assert(counts.last * 10 >= total && counts.last > 3L * math.max(median, 1L),
      s"Zipf head ${counts.last} of $total (median $median) not dominant")
    val hub = ev.filter(col("event_type") === "view").count()
    assert(hub * 10 >= total * 7, s"hub share $hub/$total below 70%")
    val docs = Tables.documents(spark, hostileDir)
    val family = docs.groupBy("text").count().agg(max("count")).head().getLong(0)
    val expect = docs.count() / MegaDupEvery
    assert(family >= expect, s"mega family $family below planted $expect")
  }

  test("salted aggregation stays exact under the Zipf law") {
    val salted = SparkEntry.queries("ev_skew_agg")(spark, hostileDir)
      .collect().map(_.toSeq).toSet
    val plain = Tables.events(spark, hostileDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(graft.util.Det.cents(col("value"))).as("sum_value_c"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain, "saltedAgg diverged from the plain aggregate on Zipf keys")
  }

  test("exact dedup collapses the mega-family to one survivor") {
    val survivors = SparkEntry.queries("dedup_exact")(spark, hostileDir).count()
    val distinctTexts = Tables.documents(spark, hostileDir)
      .select("text").distinct().count()
    assert(survivors == distinctTexts)
  }

  test("the mega-family cannot pass silently: the minhash volume alarm fires") {
    val a = Audits.audits("dedup_minhash_lsh.candidates")
    val (c, r) = (a.count(spark, hostileDir), a.rows(spark, hostileDir))
    // family of n/5 identical docs → ≥ C(family, 2) banded candidates —
    // far past the 2.0/row bound, so Bench would print the alarm and
    // list the key. Loud is the contract; silence is the bug.
    assert(Audits.breached(a, c, r),
      s"mega-dup family produced $c candidates over $r docs without tripping the alarm")
    // …and the candidates are real duplicates, not blocking noise: the
    // registered query's verify keeps every within-family pair.
    val family = Tables.documents(spark, hostileDir)
      .groupBy("text").count().agg(max("count")).head().getLong(0)
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, hostileDir).count()
    assert(pairs >= family * (family - 1) / 2,
      s"verified pairs $pairs below the family's ${family * (family - 1) / 2}")
  }

  test("committed skew artifacts track the audit registry (ArtifactSyncSpec's discipline)") {
    // A new Audits entry must not silently lag the committed hostile
    // sweeps: always — the artifacts carry no unknown audit keys;
    // under the freeze flag — exact key equality, so adding an audit
    // forces a skew-sweep regeneration the way adding a query forces
    // a bench regeneration.
    val registry = Audits.audits.keySet
    for (path <- Seq("skew_sweep.json", "skew_sweep_sf1.json")) {
      val f = new java.io.File(path)
      assert(f.isFile, s"$path missing — run graft.tools.SkewSweep")
      val txt = {
        val s = scala.io.Source.fromFile(f, "UTF-8")
        try s.mkString finally s.close()
      }
      val keys = """"([a-z0-9_.]+)"\s*:\s*\{\s*"baseline_count"""".r
        .findAllMatchIn(txt).map(_.group(1)).toSet
      assert(keys.nonEmpty, s"$path: no audit entries parsed")
      assert((keys -- registry).isEmpty,
        s"$path carries unknown audits: ${(keys -- registry).toSeq.sorted}")
      if (sys.env.get("SPARK_GRAFT_FREEZE").contains("1"))
        assert(keys == registry,
          s"$path lags the audit registry: missing ${(registry -- keys).toSeq.sorted}")
    }
  }

  test("every other audit holds its bound on the hostile corpus") {
    // The guards' division of labor: the mega-family is SUPPOSED to trip
    // the minhash/content-volume alarms; everything else (n-adaptive
    // embedding LSH under the identical-vector plant, phash banding,
    // the delete-repair construction bound) must absorb the plants
    // inside its linear bound — a breach here would be a guard that
    // needed the word-soup distribution to look healthy.
    val expectLoud = Set("dedup_minhash_lsh.candidates",
      "dedup_simhash.candidates", "dedup_ngram_jaccard.raw_pairs",
      "dedup_containment.candidates")
    for ((name, a) <- Audits.audits if !expectLoud(name)) {
      val (c, r) = (a.count(spark, hostileDir), a.rows(spark, hostileDir))
      assert(!Audits.breached(a, c, r),
        s"$name breached on hostile: $c over $r rows (bound ${a.maxPerRow}/row)")
    }
  }
}
