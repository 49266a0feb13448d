package graft.ops

import graft.Tables
import graft.functions._
import graft.util.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Deduplication suite for the LLM-training-data pipeline (documents +
  * embeddings tables) — the operator family a 100 TB corpus clean-up needs.
  *
  * Scale posture: every near-dup operator generates candidate pairs through
  * a *bucketing key* (MinHash LSH band, SimHash chunk, source block) and
  * only verifies candidates exactly — never an O(n²) all-pairs join over
  * the corpus. Exact dedup is a single hash aggregate with map-side
  * combine. All hash arithmetic is integer (poly_hash mod 1e9+7) so the
  * DuckDB oracle regenerates identical buckets.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  private final val M = graft.util.TextUtil.HashMod
  private def toksCol: Column = graft.util.TextUtil.toksCol
  private val toksSql = graft.util.TextUtil.toksSql
  private def polySql(c: String) = graft.util.TextUtil.polySql(c)

  // ── dedup_exact — md5(text) hash-group, keep min id ──────────────────
  /** One hash aggregate (map-side combined); the canonical survivor is the
    * min doc_id per content hash. At 100 TB: shuffle on the 128-bit hash,
    * perfectly parallel, no skew (hashes uniform). */
  def dedupExact: Q = (spark, dir) => {
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .orderBy("keep_id")
  }
  val dedupExactSql = """
    SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n
    FROM documents GROUP BY 1 ORDER BY keep_id"""

  // ── dedup_minhash_lsh — 3-shingle → 16 minhashes → 4 bands → Jaccard ─
  /** Word 3-shingles → poly_hash → K=16 permuted minhashes → 4 bands of 4.
    * Candidates share a band key (hash join on the band string — the 100 TB
    * path: corpus-sized data only shuffles on band keys, and banding keys
    * can be salted if a degenerate bucket appears). Candidates are then
    * verified with exact shingle-set Jaccard ≥ 0.7. */
  def dedupMinhashLsh: Q = (spark, dir) => {
    // materializedColumn: tokenize once per row — otherwise CollapseProject
    // inlines the tokenize into every toks[i] reference inside the shingle
    // lambda (O(len·refs) recompute blowup).
    val docs = materializedColumn(Tables.documents(spark, dir).select("doc_id", "text"),
        "toks", toksCol)
      .select(col("doc_id"), col("toks"))
      .filter(size(col("toks")) >= 3)
    val sh = docs.select(col("doc_id"),
      array_distinct(expr(
        "transform(sequence(0, size(toks)-3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"))
        .as("shingles"))
    val hx = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      .select(col("doc_id"), poly_hash(col("s")).as("h"))
    // One custom aggregate (graft.functions.MinhashSig) maintains all 16
    // permuted minima in a single primitive buffer per group.
    val mh = hx.groupBy("doc_id").agg(minhash_sig(col("h"), 16).as("sig"))
    val bandKeys = (0 until 4).map { b =>
      concat_ws(":", lit(b) +: (0 until 4).map(j => col("sig").getItem(4 * b + j)): _*)
    }
    val bands = mh.select(col("doc_id"), explode(array(bandKeys: _*)).as("bk"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    // Exact Jaccard verified over the *hashed* shingle sets (long arrays —
    // set ops ~10× cheaper than over shingle strings; collisions affect
    // both engines identically so the oracle stays exact).
    val hsets = hx.groupBy("doc_id").agg(collect_set(col("h")).as("hs"))
    cand
      .join(hsets.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
      .join(hsets.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
      .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("double"))
      .select(col("a_id"), col("b_id"),
        r6(col("inter") / (size(col("ha")) + size(col("hb")) - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
      .orderBy("a_id", "b_id")
  }
  /** Shared CTE chain: tokenize → shingle → minhash → bands → verified
    * near-dup pairs (used by both the pair query and the cluster query). */
  private val minhashCtes = s"""
    WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
    tt AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
    sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles FROM tt),
    shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    hx AS (SELECT doc_id, ${polySql("s")} AS h FROM shx),
    ks AS (SELECT range AS k FROM range(0, 16)),
    mh AS (SELECT doc_id, k, MIN((h * (2*k+1) + 1000003*k) % $M) AS mh
           FROM hx, ks GROUP BY 1, 2),
    bands AS (SELECT doc_id, (k // 4) || ':' || string_agg(mh::VARCHAR, ':' ORDER BY k) AS bk
              FROM mh GROUP BY doc_id, k // 4),
    cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
             FROM bands x JOIN bands y ON x.bk = y.bk AND x.doc_id < y.doc_id),
    hsets AS (SELECT doc_id, list(DISTINCT h) AS hs FROM hx GROUP BY doc_id),
    jj AS (SELECT a_id, b_id,
             round(len(list_intersect(a.hs, b.hs))::DOUBLE
               / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))), 6) AS jaccard
           FROM cand JOIN hsets a ON a.doc_id = a_id JOIN hsets b ON b.doc_id = b_id)"""

  val dedupMinhashLshSql: String = minhashCtes +
    "\n    SELECT a_id, b_id, jaccard FROM jj WHERE jaccard >= 0.7 ORDER BY a_id, b_id"

  // ── dedup_clusters — connected components over near-dup pairs ────────
  /** Min-id label propagation over the verified MinHash pair graph:
    * every duplicate document resolves to the smallest doc_id in its
    * connected component (the retained canonical). Bounded synchronous
    * iterations (dup-cluster diameters are tiny; at 100 TB this is the
    * standard alternating large-star/small-star loop, each round one
    * shuffle on the label key). Oracle: DuckDB recursive reachability. */
  final val ClusterIters = 50 // convergence-loop hard cap
  def dedupClusters: Q = (spark, dir) => {
    // Materialize the pair graph ONCE before iterating: lazy lineage would
    // re-run the whole minhash pipeline in every propagation round (and
    // the label DF's plan would nest i copies of it by round i). The
    // cluster-scale equivalent is checkpointing to reliable storage.
    val pairs = dedupMinhashLsh(spark, dir).select("a_id", "b_id")
      .localCheckpoint(true)
    // Symmetric edge list + self-loops = neighborhood including self.
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .union(pairs.select(col("a_id").as("src"), col("a_id").as("dst")))
      .union(pairs.select(col("b_id").as("src"), col("b_id").as("dst")))
      .distinct()
    var labels = edges.select(col("src").as("id"), col("src").as("lbl")).distinct()
      .localCheckpoint(true)
    // Iterate to convergence (labels only decrease, so a stable sum is a
    // fixed point — matching the oracle's full transitive closure), with
    // a hard cap as a runaway guard.
    // sum over an EMPTY frame is NULL — coalesce so a pair-free corpus
    // converges immediately instead of NPE-ing.
    def labelSum(): Long = {
      val v = labels.agg(sum("lbl")).head().get(0)
      if (v == null) 0L else v.asInstanceOf[Long]
    }
    var prevSum = -1L
    var curSum = labelSum()
    var rounds = 0
    while (curSum != prevSum && rounds < ClusterIters) {
      labels = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2"))
        .agg(min("lbl").as("lbl"))
        .select(col("id2").as("id"), col("lbl"))
        .localCheckpoint(true) // keep each round's plan flat
      prevSum = curSum
      curSum = labelSum()
      rounds += 1
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
      .orderBy("doc_id")
  }
  val dedupClustersSql: String = minhashCtes + s""",
    pairs AS (SELECT a_id, b_id FROM jj WHERE jaccard >= 0.7),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION SELECT b_id, a_id FROM pairs
      UNION SELECT a_id, a_id FROM pairs
      UNION SELECT b_id, b_id FROM pairs),
    reach AS (
      WITH RECURSIVE r(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src)
      SELECT * FROM r)
    SELECT src AS doc_id, MIN(dst) AS cluster_id
    FROM reach GROUP BY src ORDER BY doc_id"""

  // ── dedup_simhash — 64-bit SimHash as 4×16-bit chunks, Hamming ≤ 12 ──
  /** Token-hash sign votes per bit; the 64-bit signature is kept as four
    * 16-bit chunks. Candidate pairs share at least one identical chunk
    * (pigeonhole-exact for Hamming ≤ 3, high-recall heuristic beyond);
    * the chunk value is the join key, so corpus-sized data shuffles only
    * on (chunk_idx, chunk_val). Verified with exact bit_count(xor). */
  def dedupSimhash: Q = (spark, dir) => {
    val h = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toksCol).as("tok"))
      .select(col("doc_id"), poly_hash(col("tok")).as("h"))
    // One custom aggregate (graft.functions.SimhashChunks) folds all 64
    // sign counters in a single primitive buffer per group — vs. 64
    // separate SUM(CASE ...) columns. Same integer math as the oracle.
    val chunks = h.groupBy("doc_id").agg(simhash_chunks(col("h")).as("ch"))
      .select(col("doc_id"), col("ch").getItem(0).as("c0"), col("ch").getItem(1).as("c1"),
        col("ch").getItem(2).as("c2"), col("ch").getItem(3).as("c3"))
    val expl = chunks.select(col("doc_id"),
      posexplode(array((0 until 4).map(c => col(s"c$c")): _*)).as(Seq("ci", "cv")))
    val cand = expl.as("x").join(expl.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val ham = (0 until 4).map(c =>
      bit_count(col(s"ac$c").bitwiseXOR(col(s"bc$c")))).reduce(_ + _).cast("long")
    cand
      .join(chunks.select(col("doc_id").as("a_id"),
        col("c0").as("ac0"), col("c1").as("ac1"), col("c2").as("ac2"), col("c3").as("ac3")), "a_id")
      .join(chunks.select(col("doc_id").as("b_id"),
        col("c0").as("bc0"), col("c1").as("bc1"), col("c2").as("bc2"), col("c3").as("bc3")), "b_id")
      .select(col("a_id"), col("b_id"), ham.as("hamming"))
      .filter(col("hamming") <= 2)
      .orderBy("a_id", "b_id")
  }
  val dedupSimhashSql = s"""
    WITH tok AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
    h AS (SELECT doc_id, ${polySql("tok")} AS h FROM tok),
    bits AS (SELECT doc_id, i,
               SUM(CASE WHEN (h * (2*i+3) % $M) % 2 = 0 THEN 1 ELSE -1 END) AS s
             FROM h, (SELECT range AS i FROM range(0, 64)) GROUP BY 1, 2),
    chunks AS (SELECT doc_id, i // 16 AS ci,
                 CAST(SUM(CASE WHEN s >= 0 THEN 1 << (i % 16) ELSE 0 END) AS BIGINT) AS cv
               FROM bits GROUP BY 1, 2),
    cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
             FROM chunks x JOIN chunks y
               ON x.ci = y.ci AND x.cv = y.cv AND x.doc_id < y.doc_id),
    wide AS (SELECT doc_id,
               MAX(CASE WHEN ci = 0 THEN cv END) AS c0, MAX(CASE WHEN ci = 1 THEN cv END) AS c1,
               MAX(CASE WHEN ci = 2 THEN cv END) AS c2, MAX(CASE WHEN ci = 3 THEN cv END) AS c3
             FROM chunks GROUP BY 1)
    SELECT a_id, b_id,
      CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
         + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS BIGINT) AS hamming
    FROM cand JOIN wide a ON a.doc_id = a_id JOIN wide b ON b.doc_id = b_id
    WHERE bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
        + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) <= 2
    ORDER BY a_id, b_id"""

  // ── dedup_ngram_jaccard — exact char-3-gram Jaccard, length-blocked ──
  /** Exact character-3-gram Jaccard with length-band blocking: each doc
    * emits keys ⌊len/16⌋ and ⌊len/16⌋+1, so any pair within 16 chars of
    * each other shares a key (high-Jaccard dups are always near-length; dup clusters span up to ~12 chars).
    * Blocking bounds the pair space: at 100 TB pairs shuffle on the band
    * key, never all-pairs. */
  def dedupNgramJaccard: Q = (spark, dir) => {
    graft.functions.register(spark)
    // Grams are poly_hashed to longs: set ops over long arrays are ~10×
    // cheaper than string arrays and deterministic on both engines.
    // Materialize lower(text) once per row (see materializedColumn) —
    // otherwise the lowercasing is inlined into every per-gram reference.
    val g = materializedColumn(
        Tables.documents(spark, dir).filter(length(col("text")) >= 3)
          .select(col("doc_id"),
            (length(col("text")).cast("long") / 16).cast("long").as("lb"), col("text")),
        "t", lower(col("text")))
      .select(col("doc_id"), col("lb"),
        expr("array_sort(array_distinct(transform(sequence(1, length(t)-2), " +
          "i -> poly_hash_cp(substr(t, i, 3)))))").as("grams"))
    val keyed = g.select(col("doc_id"), explode(array(col("lb"), col("lb") + 1)).as("bk"))
    // Dedup candidate ids BEFORE the expensive set intersection.
    val cand = keyed.as("a").join(keyed.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    cand
      .join(g.select(col("doc_id").as("a_id"), col("grams").as("ga")), "a_id")
      .join(g.select(col("doc_id").as("b_id"), col("grams").as("gb")), "b_id")
      .withColumn("inter", sorted_intersect_count(col("ga"), col("gb")).cast("double"))
      .select(col("a_id"), col("b_id"),
        r6(col("inter") / (size(col("ga")) + size(col("gb")) - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("a_id", "b_id")
  }
  /** Unrolled 3-byte polyhash: ((c1·31+c2) mod M ·31 + c3) mod M. */
  val dedupNgramJaccardSql = s"""
    WITH g AS (SELECT doc_id, len(text) // 16 AS lb,
        list_distinct(list_transform(range(1, len(lower(text))-1),
          i -> ((((CAST(unicode(lower(text)[i]) AS BIGINT) * 31
                 + unicode(lower(text)[i+1])) % $M) * 31
                 + unicode(lower(text)[i+2])) % $M))) AS grams
      FROM documents WHERE len(text) >= 3),
    keyed AS (SELECT doc_id, unnest([lb, lb + 1]) AS bk FROM g),
    cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM keyed a JOIN keyed b ON a.bk = b.bk AND a.doc_id < b.doc_id),
    jj AS (SELECT a_id, b_id,
        round(len(list_intersect(ga.grams, gb.grams))::DOUBLE
          / (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))), 6) AS jaccard
      FROM cand JOIN g ga ON ga.doc_id = a_id JOIN g gb ON gb.doc_id = b_id)
    SELECT a_id, b_id, jaccard FROM jj WHERE jaccard >= 0.8 ORDER BY a_id, b_id"""

  // ── dedup_embedding — embedding-cosine near-dup keep/drop decision ───
  /** Cosine near-dup pairs (≥ 0.4 on this corpus) reduced to a dedup
    * decision: each duplicate maps to its lowest-id retained neighbor.
    * Exact pair generation here is the bounded oracle baseline; the 100 TB
    * candidate path is the LSH band join of
    * [[graft.ops.VectorSearch.vsLshSearch]]. */
  def dedupEmbedding: Q = (spark, dir) => {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"),
      inner_product(col("embedding"), col("embedding")).as("nsq"))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("va"), col("nsq").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("vb"), col("nsq").as("nb"))
    val w = Window.partitionBy("dup_id").orderBy("keep_id")
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id").as("keep_id"), col("b_id").as("dup_id"),
        r6(inner_product(col("va"), col("vb")) / sqrt(col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= 0.4)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("dup_id"), col("keep_id"), col("sim"))
      .orderBy("dup_id")
  }
  val dedupEmbeddingSql = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    p AS (SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
        round(list_inner_product(a.v, b.v)
          / sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v)), 6) AS sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT dup_id, keep_id, sim FROM p
    WHERE sim >= 0.4
    QUALIFY row_number() OVER (PARTITION BY dup_id ORDER BY keep_id) = 1
    ORDER BY dup_id"""

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_simhash" -> dedupSimhash,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_embedding" -> dedupEmbedding,
    "dedup_clusters" -> dedupClusters)

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_embedding" -> dedupEmbeddingSql,
    "dedup_clusters" -> dedupClustersSql)
}
