package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset card: the one-row corpus summary that documents a training
  * dataset (docs, tokens, chars, language/source diversity, exact
  * duplicate rate, length extremes) — computed in ONE aggregation pass
  * over one pre-projection (the fused-scan discipline: the corpus is read
  * once, every statistic rides the same scan; count_distincts expand the
  * aggregate, not the number of passes).
  *
  * All statistics are integers or exact counts, so the card replays
  * bit-identically cross-engine (hash the text with an oracle-portable
  * hasher to make `distinct_texts` checkable).
  */
object Card {

  def report(df: DataFrame, textCol: String, langCol: String, sourceCol: String,
             shortDocTokens: Int = 30,
             textHasher: Column => Column = xxhash64(_)): DataFrame = {
    val base = df.select(
      TextAnalysis.tokens(col(textCol)).as("__toks"), // split ONCE; size() is O(1) per use
      length(col(textCol)).as("__len"),
      col(langCol).as("__lang"), col(sourceCol).as("__src"),
      textHasher(col(textCol)).as("__th"))
    base.agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("__toks"))).cast(LongType).as("n_tokens"),
      sum(col("__len")).cast(LongType).as("n_chars"),
      count_distinct(col("__lang")).as("n_langs"),
      count_distinct(col("__src")).as("n_sources"),
      count_distinct(col("__th")).as("distinct_texts"),
      sum(when(size(col("__toks")) < shortDocTokens, 1L).otherwise(0L))
        .cast(LongType).as("short_docs"),
      min(size(col("__toks"))).cast(LongType).as("min_tokens"),
      max(size(col("__toks"))).cast(LongType).as("max_tokens"))
  }

  /** [[report]] per segment — the per-language/per-source card rows a
    * mixture dataset documents ("how much of each language, how duplicated
    * is each source"). Same single fused pass, grouped; output bounded by
    * the segment cardinality.
    */
  def reportBy(df: DataFrame, groupCol: String, textCol: String,
               langCol: String, sourceCol: String,
               shortDocTokens: Int = 30,
               textHasher: Column => Column = xxhash64(_)): DataFrame = {
    val base = df.select(
      col(groupCol).as("grp"),
      TextAnalysis.tokens(col(textCol)).as("__toks"),
      length(col(textCol)).as("__len"),
      col(langCol).as("__lang"), col(sourceCol).as("__src"),
      textHasher(col(textCol)).as("__th"))
    base.groupBy("grp").agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("__toks"))).cast(LongType).as("n_tokens"),
      sum(col("__len")).cast(LongType).as("n_chars"),
      count_distinct(col("__lang")).as("n_langs"),
      count_distinct(col("__src")).as("n_sources"),
      count_distinct(col("__th")).as("distinct_texts"),
      sum(when(size(col("__toks")) < shortDocTokens, 1L).otherwise(0L))
        .cast(LongType).as("short_docs"),
      min(size(col("__toks"))).cast(LongType).as("min_tokens"),
      max(size(col("__toks"))).cast(LongType).as("max_tokens"))
  }
}
