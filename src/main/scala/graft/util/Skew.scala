package graft.util

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-handling building blocks for hot keys at 100 TB.
  *
  * AQE's skew-join split handles storage-level skew automatically (left
  * on in graft sessions); these helpers cover the aggregation side,
  * where one giant key (a viral document bucket, a degenerate LSH band)
  * would otherwise pin a single reducer.
  */
object Skew {

  /** Two-phase salted aggregation: spread each hot key's rows over
    * `salts` sub-keys, partially aggregate, then merge the partials.
    * `saltOn` must be a DETERMINISTIC per-row expression (an id column):
    * a nondeterministic salt (partition id, monotonic id, rand) re-salts
    * rows when a map stage is partially recomputed after a fetch
    * failure, silently double-counting or dropping them — the
    * groupBy-flavored analogue of SPARK-23207. `partials` aggregate raw
    * rows; `merge` combines partial columns — both phases keep map-side
    * combine, and no reducer ever sees more than ~1/salts of the
    * hottest key.
    *
    * {{{
    * // skew-proof count + sum per event_type:
    * Skew.saltedAgg(events, Seq(col("event_type")), 16, col("event_id"),
    *   Seq(count(lit(1)).as("n"), sum("value").as("s")),
    *   Seq(sum("n").as("n"), sum("s").as("s")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], salts: Int, saltOn: Column,
      partials: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltOn), lit(salts)))
    val phase1 = salted.groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys: _*).agg(merge.head, merge.tail: _*)
  }

  /** Candidate-pair generation over a bucketed signature frame (LSH
    * bands, SimHash chunks) with a degenerate-bucket cap — the skew case
    * a bucketed self-join cannot salt away: salting a bucket would split
    * its rows across sub-keys and silently LOSE the cross-salt pairs, so
    * the only scale-safe treatment of a pathological bucket (every row
    * hashing to one band value — a corpus of near-identical boilerplate)
    * is to measure it and exclude it. A bucket of b rows emits b²/2
    * pairs; at 100 TB one million-row bucket is 5·10¹¹ pairs on one
    * reducer. Buckets over `cap` are dropped, and surviving buckets pair
    * up through the usual hash join on the bucket key. The signature
    * frame is materialized once ([[Persist.stage]] — reliable checkpoint
    * in cluster mode) and reused by the size count and both join sides.
    *
    * Bucket sizes are counted with a PLAIN groupBy count — not
    * [[saltedAgg]]: COUNT is algebraic, so map-side partial aggregation
    * already collapses a degenerate bucket to one pre-combined row per
    * map partition before the shuffle; salting an algebraic count would
    * add a second shuffle for zero skew benefit. saltedAgg exists for
    * aggregations whose per-key reduce work is NOT collapsed map-side
    * (see [[graft.ops.Events]]' ev_skew_agg).
    *
    * Callers' SQL oracles mirror the cap with a COUNT(*) <= cap bucket
    * filter, so capping is part of the operator contract, not a silent
    * truncation; `cap` must sit far above any bucket the test corpus can
    * produce (see callers) so test-scale results equal the uncapped join.
    */
  def cappedSelfPairs(bands: DataFrame, idCol: String, bucketCols: Seq[String],
      cap: Long): DataFrame = {
    val b = Persist.stage(bands, eager = false)
    val sizes = b.groupBy(bucketCols.map(col): _*).agg(count(lit(1)).as("n"))
    val ok = sizes.filter(col("n") <= cap).select(bucketCols.map(col): _*)
    val kept = b.join(ok, bucketCols)
    kept.as("x").join(kept.as("y"),
        bucketCols.map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _) &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"))
      .distinct()
  }

  /** Salted join of a skewed fact side against a small-ish dimension:
    * the fact side is salted in [0, salts) on a deterministic per-row
    * expression (see [[saltedAgg]] for why it must be deterministic);
    * the dim side is exploded `salts`× so every (key, salt) matches.
    * Bounds any single reducer's share of a hot key to ~1/salts; dim
    * replication is the price (use only when the dim side is the small
    * one). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      saltOn: Column): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltOn), lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
