package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Guard against parquet logical-type drift on `events.ts`.
  *
  * The driver's testdata generator has shipped `ts` as parquet
  * TIMESTAMP(NANOS) in some rounds (loads as BIGINT ns under
  * `nanosAsLong`) and as plain TIMESTAMP(µs) in others (loads as
  * TimestampType). Round 8 lost 39 queries to exactly this drift. These
  * specs pin the contract: whatever the writer chose, `Tables.events` and
  * `Streaming.readEvents` deliver BIGINT nanoseconds, bit-identical across
  * encodings, and a representative event query agrees bit-for-bit.
  */
class SchemaDriftSpec extends SparkSpec {

  /** Write `df` as ONE parquet file literally named `events.parquet`,
    * mirroring the driver's single-file layout (Streaming.readEvents'
    * pathGlobFilter matches leaf file names, so the name matters). */
  private def writeSingleFile(df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val staging = s"$dir/_staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = Files.list(Paths.get(staging)).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staging))
  }

  /** Write the sf0.001 events table twice — ts as BIGINT ns and as a
    * µs-precision timestamp — and return the two dirs. */
  private lazy val (nsDir, usDir): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val ev = Tables.events(spark, sf) // already normalized to BIGINT ns
    val nsD = s"$base/ns"; val usD = s"$base/us"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(nsD))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(usD))
    writeSingleFile(ev, nsD)
    // Restore the session's writer encoding afterwards: the SparkSpec
    // session is shared across suites, and leaving TIMESTAMP_MICROS set
    // would silently change every later timestamp-writing test.
    val key = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try writeSingleFile(ev.withColumn("ts", timestamp_micros(expr("ts div 1000"))), usD)
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    (nsD, usD)
  }

  test("Tables.events normalizes BIGINT-ns and TIMESTAMP(us) encodings identically") {
    val fromNs = Tables.events(spark, nsDir)
    val fromUs = Tables.events(spark, usDir)
    assert(fromNs.schema("ts").dataType == LongType)
    assert(fromUs.schema("ts").dataType == LongType)
    // raw file really is TimestampType before normalization — the guard is
    // only meaningful if the two inputs genuinely differ on disk
    assert(spark.read.parquet(s"$usDir/events.parquet")
      .schema("ts").dataType == TimestampType)
    val a = fromNs.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = fromUs.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "ts must be bit-identical across parquet encodings")
  }

  test("a representative event query is bit-identical across encodings") {
    def run(dir: String) =
      graft.streaming.Streaming.windowAggBatch(spark, dir)
        .collect().map(_.toSeq).toSeq
    assert(run(nsDir) == run(usDir))
  }

  test("id-width drift: int32 ids and float values normalize to canonical types") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val base = java.nio.file.Files.createTempDirectory("graft-drift32").toString
    val docs = Tables.documents(spark, sf)
      .withColumn("doc_id", col("doc_id").cast(IntegerType))
      .withColumn("n_chars", col("n_chars").cast(IntegerType))
    docs.write.mode("overwrite").parquet(s"$base/documents.parquet")
    assert(spark.read.parquet(s"$base/documents.parquet")
      .schema("doc_id").dataType == IntegerType)
    val loaded = Tables.documents(spark, base)
    assert(loaded.schema("doc_id").dataType == LongType)
    assert(loaded.schema("n_chars").dataType == LongType)
    // a representative doc query runs and matches the canonical-file result
    val got = SparkEntry.queries("text_quality")(spark, base)
      .collect().map(_.toSeq).toSeq
    val want = SparkEntry.queries("text_quality")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("Streaming.readEvents adapts its declared schema to the file encoding") {
    for (dir <- Seq(nsDir, usDir)) {
      val sdf = graft.streaming.Streaming.readEvents(spark, dir)
      assert(sdf.isStreaming)
      assert(sdf.schema("ts").dataType == LongType,
        s"streaming ts must normalize to BIGINT ns for $dir")
    }
    // end-to-end: the streaming window agg over the timestamp-encoded dir
    // equals the batch result over the ns-encoded dir
    val q = graft.streaming.Streaming.windowAggStream(spark, usDir)
      .writeStream.format("memory").queryName("drift_guard")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val got = spark.table("drift_guard").orderBy("win_us", "event_type")
      .collect().map(_.toSeq).toSeq
    val want = graft.streaming.Streaming.windowAggBatch(spark, nsDir)
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }
}
