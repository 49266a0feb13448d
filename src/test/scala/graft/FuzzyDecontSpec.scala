package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** text_fuzzy_decontaminate's reason to exist, proven end-to-end: a
  * PARAPHRASED benchmark row — every 8th token substituted, so no 8
  * consecutive original tokens survive — shares ZERO 8-token shingles
  * with its probe source (the exact text_decontaminate scan cannot flag
  * it) while keeping word-3-shingle Jaccard in the ~0.45 paraphrase
  * regime, and the fuzzy cross-split band join catches it. */
class FuzzyDecontSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"

  test("planted paraphrase: exact 8-gram probe misses, fuzzy banding catches") {
    graft.functions.register(spark)
    val docs = Tables.documents(spark, sf01).select(col("doc_id"), col("text"))
    // Probe doc (eval side): longest text among doc_id % 20 == 0 so the
    // paraphrase has a real shingle population.
    val probeRow = docs.filter(col("doc_id") % 20 === 0)
      .orderBy(length(col("text")).desc, col("doc_id")).head()
    val probeId = probeRow.getAs[Long]("doc_id")
    // Tokenize EXACTLY as the ops do (TextUtil.toksCol through Spark).
    val toks = docs.filter(col("doc_id") === probeId)
      .select(graft.util.TextUtil.toksCol.as("toks"))
      .head().getAs[scala.collection.Seq[String]]("toks")
    assert(toks.length >= 40, s"probe doc $probeId too short (${toks.length} tokens)")
    // Paraphrase: substitute indices 7, 15, 23, … — every window of 8
    // consecutive tokens contains >= 1 substitution, so no 8-token
    // shingle of the original survives.
    val para = toks.zipWithIndex.map { case (t, i) =>
      if (i % 8 == 7) s"zzq${i}x" else t }
    val plantedId = 1000001L // % 20 = 1 -> corpus (train) side
    val planted = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(plantedId, para.mkString(" "))), 1),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val aug = docs.unionByName(planted)

    // 1. The EXACT probe's view: shared 8-token shingles between the
    //    planted doc and the whole probe set (doc_id % 20 == 0) — the
    //    quantity text_decontaminate counts as n_hits. Must be ZERO.
    val sh = aug
      .select(col("doc_id"), graft.util.TextUtil.toksCol.as("toks"))
      .filter(size(col("toks")) >= TextAnalysis.DecontShingle)
      .select(col("doc_id"), explode(TextAnalysis.decontShingles).as("s"))
    val probeShingles = sh.filter(col("doc_id") % 20 === 0).select("s").distinct()
    val exactHits = sh.filter(col("doc_id") === plantedId)
      .join(probeShingles, "s").count()
    assert(exactHits == 0L,
      s"paraphrase still shares $exactHits exact 8-gram shingles — plant too mild")

    // 2. The FUZZY op over the augmented corpus must flag the pair.
    val flagged = TextAnalysis.fuzzyDecontPairs(spark, aug)
      .filter(col("doc_id") === plantedId).collect()
    val hit = flagged.find(_.getAs[Long]("probe_id") == probeId)
    assert(hit.isDefined,
      s"fuzzy decontamination missed the planted (${plantedId}, $probeId) pair; " +
      s"flagged for planted doc: ${flagged.map(_.getAs[Long]("probe_id")).mkString(",")}")
    val j = hit.get.getAs[Double]("jaccard")
    info(f"planted pair caught: probe=$probeId jaccard=$j%.3f (threshold ${TextAnalysis.FuzzyDecontThreshold})")
    assert(j >= TextAnalysis.FuzzyDecontThreshold && j < 0.75,
      f"plant landed at jaccard $j%.3f — outside the paraphrase regime this spec pins")
  }
}
