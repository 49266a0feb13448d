package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE definition of the tokenizer and of the DuckDB polyhash
  * fragment. These are load-bearing for oracle parity — every suite
  * (dedup, text analysis, vector ingest) must tokenize and hash
  * identically on both engines, so they live in exactly one place.
  */
object TextUtil {
  final val HashMod = 1000000007L

  /** Affine minhash permutation step: slot k of a signature is
    * min over shingle hashes h of (h·(2k+1) + MinhashStep·k) mod
    * [[HashMod]]. Every producer of a minhash signature —
    * [[graft.functions.MinhashSig]] (batch aggregate),
    * [[graft.ops.Dedup]]'s ngram sigCol, the streaming per-row twin
    * [[graft.streaming.Streaming.fuzzySigFrame]], and all their SQL
    * oracle CTEs — MUST use these two constants, or batch ≡ stream ≡
    * oracle equality silently breaks outside the spec'd scale factors
    * (r12 advice: the literals were duplicated at each site). */
  final val MinhashStep = 1000003L

  /** Lowercased alnum tokens of the `text` column. */
  def toksCol: Column =
    filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)

  /** DuckDB fragment mirroring [[toksCol]]. */
  val toksSql: String =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** DuckDB polyhash over the CODEPOINTS of string expression `c` —
    * mirrors [[graft.functions.PolyHash]] for ASCII-only strings (e.g.
    * alnum tokens) and [[graft.functions.PolyHashCp]] for any string. */
  def polySql(c: String): String =
    s"list_reduce(list_transform(range(1, len($c)+1), i -> CAST(unicode($c[i]) AS BIGINT)), (a, b) -> (a*31 + b) % $HashMod)"
}
