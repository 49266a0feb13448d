package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives a corpus PAST the `lshTunedGeo` operating ceiling and proves
  * the `vs_lsh_tuned.candidates` audit alarm actually fires there
  * (r12 verdict #6: the ceiling — r stops at 24, so beyond
  * n* ≈ 2·2^25/b(24) = 2·33,554,432/563 ≈ 119k vectors the geometry
  * saturates and the random collision floor resumes growing ∝ n — was
  * documented and bound-guarded, but nothing had MEASURED a corpus past
  * it to show the guard trips).
  *
  * Synthesizes n isotropic 64-dim vectors (deterministic per-(id,dim)
  * avalanche mixer — pure noise, so every banded candidate is random
  * floor; planted near-dup mass would only ADD to the count), writes
  * them as `embeddings.parquet`, and evaluates the EXACT production
  * audit (`Audits.audits("vs_lsh_tuned.candidates")`) plus
  * `Audits.breached` — the same calls Bench makes when it fills
  * `audit_alarms` (AuditAlarmSpec pins the breach → audit_alarms
  * wiring; this probe supplies the measured past-ceiling corpus).
  *
  * Expected floor at saturation: count/row ≈ n·b/2^(r+1) =
  * n·563/33,554,432 — crosses the 10.0/row bound at n ≈ 596k.
  *
  *   java -cp "target/scala-2.13/classes:SPARK_JARS_GLOB" -Xmx24g \
  *     graft.tools.LshCeilingProbe [n] [workDir]
  *
  * (SPARK_JARS_GLOB = the spark jars directory glob; spelling it out
  * here would nest a comment open token inside this scaladoc.)
  */
object LshCeilingProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(750000L)
    val work = if (args.length > 1) args(1) else "/tmp/lsh_ceiling_probe"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Past-ceiling banding shuffles n·b band rows (n=750k → 422M);
    // 32 shuffle partitions put ~13M rows in each hash aggregate and
    // OOM — this probe sizes partitions for ITS data volume (the
    // spill-aware knob the production sweep never needs at its SFs).
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "512"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Deterministic isotropic noise in [-0.5, 0.5): the planeVal-style
    // two-round multiply-xor mixer over (id·64 + dim), as a codegen'd
    // Column so generation is one map-only pass.
    def mix(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val h1 = (x * 2654435761L) % 2147483648L
      val h2 = (h1.bitwiseXOR(shiftright(h1, 16)) * 2246822519L) % 2147483648L
      h2.bitwiseXOR(shiftright(h2, 13))
    }
    val emb = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        (mix((col("id") * 64L + d + 1L) % 2147483648L)
          .cast("double") / 2147483648.0 - 0.5).cast("float")).as("embedding"),
      lit(0).as("label"))
    emb.write.mode("overwrite").parquet(s"$work/embeddings.parquet")

    // TWO ARMS over the same corpus (r17 verdict #4): arm A replays the
    // pre-extension table (truncated at r=24 — the old operating
    // ceiling) and must ALARM; arm B runs the SHIPPED audit end-to-end
    // on the extended table and must come back under the designed
    // bound. One committed artifact carries both measurements.
    val audit = graft.Audits.audits("vs_lsh_tuned.candidates")
    val geoFull = graft.ops.VectorSearch.lshTunedGeo
    def arm(label: String, geo: Seq[(Int, Int)],
        run: () => Long): (Boolean, String) = {
      val (r, b) = graft.ops.VectorSearch.lshAdaptiveGeometry(n, geo)
      val t0 = System.nanoTime()
      val count = run()
      val rows = audit.rows(spark, work)
      val secs = (System.nanoTime() - t0) / 1e9
      val perRow = count.toDouble / math.max(rows, 1L)
      val alarm = graft.Audits.breached(audit, count, rows)
      val floor = n.toDouble * b / (1L << (r + 1)).toDouble
      println(f"PROBE arm=$label r=$r b=$b count=$count rows=$rows " +
        f"perRow=$perRow%.2f bound=${audit.maxPerRow}%.1f " +
        f"expectedFloor=$floor%.2f alarm=$alarm wall=$secs%.1f s")
      (alarm,
        f"""{"arm":"$label","r":$r,"b":$b,"n":$n,"count":$count,""" +
        f""""per_row":$perRow%.3f,"bound":${audit.maxPerRow}%.1f,""" +
        f""""expected_floor":$floor%.3f,"alarm":$alarm,"wall_s":$secs%.1f}""")
    }
    val geoOld = geoFull.filter(_._1 <= 24)
    val (alarmA, jsonA) = arm("pre_extension_r24", geoOld, () =>
      graft.ops.VectorSearch.lshTunedCandidates(spark, work, geoOld).count())
    // Arm B is the exact production audit call — the same count Bench
    // makes when it fills audit_alarms.
    val (alarmB, jsonB) = arm("extended_table", geoFull, () =>
      audit.count(spark, work))
    val ok = alarmA && !alarmB
    val sha = graft.util.GitInfo.stampSha().getOrElse("unknown")
    val artifact =
      s"""{"probe":"lsh_ceiling","git_sha":"$sha","n":$n,"arms":[$jsonA,$jsonB],""" +
      s""""expected":"pre_extension alarms, extended clears","ok":$ok}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("lsh_ceiling.json"),
      (artifact + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"PROBE artifact: $artifact")
    if (!ok) System.err.println(
      "PROBE FAILED: expected the pre-extension arm to alarm and the extended arm to clear")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
