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
