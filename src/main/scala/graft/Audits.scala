package graft

import org.apache.spark.sql.SparkSession

/** Candidate-volume telemetry for the bench sweep.
  *
  * Every round-10 perf root-cause (the ngram blocking collapse, the LSH
  * S-curve volume) was found by counting CANDIDATE frames offline —
  * the banded/bucketed pair volumes that must stay linear in corpus
  * size, and silently go quadratic when a blocking key degenerates.
  * These audits count the EXACT frames the registered queries run
  * (shared constructors, not replicas), so [[Bench]] can emit them in
  * `bench_result.json` and a superlinear drift is visible in ONE sweep
  * diff instead of a dedicated investigation.
  *
  * Untimed: Bench runs them AFTER the timed reps. Each is one extra
  * evaluation of a candidate stage (seconds at sf0.1); the nng entry
  * reuses the session's memoized graph build, so it costs one keyed
  * join, not an index construction. */
object Audits {
  val audits: Map[String, (SparkSession, String) => Long] = Map(
    // Banded near-dup pair volumes (post bucket-cap, pre verify).
    "dedup_minhash_lsh.candidates" -> ((s, d) =>
      ops.Dedup.minhashPerAndCandidates(s, d)._2.count()),
    "dedup_simhash.candidates" -> ((s, d) =>
      ops.Dedup.simhashCandidates(ops.Dedup.simhashChunksDf(s, d)).count()),
    // RAW banded pair stream (pre-prefilter, pre-distinct) — the r10
    // blocking-collapse bug surfaced in exactly this count.
    "dedup_ngram_jaccard.raw_pairs" -> ((s, d) =>
      ops.Dedup.ngramRawPairs(s, d)._2.count()),
    "dedup_embedding.candidates" -> ((s, d) =>
      ops.Dedup.embeddingCandidates(s, d).count()),
    // Delete-repair patch candidates: bounded at |victims|*K^2 by the
    // victim fan-in cap — this count is the standing proof.
    "vs_nng_delete.patch_candidates" -> ((s, d) => {
      val qv = graft.util.Persist.stage(
        ops.VectorSearch.int8Grid(s, d), eager = false)
      val (refined, _) = ops.NnGraph.buildShared(qv, s"$d#full")
      ops.VectorSearch.nngPatchCandidates(refined).count()
    }))
}
