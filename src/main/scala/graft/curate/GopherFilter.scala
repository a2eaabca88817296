package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Gopher-style quality-filter decision table (Rae et al. 2021, the
  * "quality filtering" rules of the MassiveText pipeline): per-document
  * keep/drop verdicts from document-length, mean-word-length and
  * repetition rules, composed from [[TextAnalysis.repetitionColumns]].
  *
  * Every rule is evaluated as an INTEGER cross-multiplication
  * (`numerator * 100 <= denominator * pct`), never a float ratio, so the
  * DuckDB oracle compares hash-exact booleans. Declared variant: the
  * published top-n-gram rules threshold the fraction of *characters* in
  * the most frequent n-gram; this engine's counters are *occurrence*
  * fractions (`top_bigram_n / n_bigrams`) — same signal, integer-exact,
  * and the thresholds are parameters, not constants.
  *
  * Scale shape: pure per-row column arithmetic over the repetition
  * counters — map-side, shuffle-free, one whole-stage-codegen span; at
  * 100 TB this is a scan, like the counters it composes. */
object GopherFilter {

  /** Integer thresholds: token-count bounds, mean-word-length bounds
    * (chars per whitespace token, text length including spaces), and
    * percent caps on the repetition fractions. Defaults are tuned to the
    * synthetic corpus (median 56 tokens/doc) — the published Gopher
    * bounds (50..100k tokens, 3..10 chars) are one parameterization. */
  final case class Thresholds(
      minTokens: Long = 25,
      maxTokens: Long = 100000,
      minMeanWordChars: Long = 3,
      maxMeanWordChars: Long = 12,
      topBigramPct: Long = 20,
      topTrigramPct: Long = 18,
      dup5gramPct: Long = 30)

  /** (id, n_tokens, five rule booleans, keep = conjunction) per input
    * row. A document with no n-grams of a given order passes that rule
    * vacuously (short docs are the length rule's business). */
  def gopherFilter(
      docs: DataFrame,
      t: Thresholds = Thresholds(),
      idCol: String = "doc_id",
      textCol: String = "text",
      nCharsCol: String = "n_chars"): DataFrame = {
    val reps = TextAnalysis.repetitionColumns(col(textCol))
    val base = reps.foldLeft(docs.select(col(idCol), col(textCol), col(nCharsCol))) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    def fracOk(num: Column, den: Column, pct: Long): Column =
      den === 0L || num * 100L <= den * pct
    val lengthOk = col("n_tokens") >= t.minTokens && col("n_tokens") <= t.maxTokens
    val wordLenOk = lit(t.minMeanWordChars) * col("n_tokens") <= col(nCharsCol) &&
      col(nCharsCol) <= lit(t.maxMeanWordChars) * col("n_tokens")
    val topBiOk = fracOk(col("top_bigram_n"), col("n_bigrams"), t.topBigramPct)
    val topTriOk = fracOk(col("top_trigram_n"), col("n_trigrams"), t.topTrigramPct)
    val dup5Ok = fracOk(col("dup_5gram_n"), col("n_5grams"), t.dup5gramPct)
    base.select(
      col(idCol),
      col("n_tokens"),
      lengthOk.as("length_ok"),
      wordLenOk.as("word_len_ok"),
      topBiOk.as("top_bigram_ok"),
      topTriOk.as("top_trigram_ok"),
      dup5Ok.as("dup_5gram_ok"),
      (lengthOk && wordLenOk && topBiOk && topTriOk && dup5Ok).as("keep"))
  }

  /** CHARACTER-fraction percent caps for [[gopherFilterCharFrac]] — the
    * published rule's native unit (Rae et al. 2021 threshold the fraction
    * of characters in the top n-gram / in duplicated n-grams). Defaults
    * mirror [[Thresholds]]' occurrence caps. */
  final case class CharThresholds(
      minTokens: Long = 25,
      maxTokens: Long = 100000,
      minMeanWordChars: Long = 3,
      maxMeanWordChars: Long = 12,
      topBigramCharPct: Long = 20,
      topTrigramCharPct: Long = 18,
      dup5gramCharPct: Long = 30)

  /** The CHARACTER-fraction variant of [[gopherFilter]] (round-6): the
    * top-bigram/trigram and dup-5-gram rules threshold the n-grams'
    * character mass against the document's character count
    * (`num_chars * 100 <= n_chars * pct`, integer-exact), per the
    * published rule; [[gopherFilter]]'s occurrence fractions remain the
    * default tier. Numerators from
    * [[TextAnalysis.repetitionCharColumns]] (occurrence-weighted char
    * mass — the declared convention); length and word-length rules are
    * unchanged. Same output schema as [[gopherFilter]], so the two tiers
    * are drop-in interchangeable. Pure scan, shuffle-free. */
  def gopherFilterCharFrac(
      docs: DataFrame,
      t: CharThresholds = CharThresholds(),
      idCol: String = "doc_id",
      textCol: String = "text",
      nCharsCol: String = "n_chars"): DataFrame = {
    val cols = TextAnalysis.repetitionCharColumnsWithTokens(col(textCol))
    val base = cols.foldLeft(docs.select(col(idCol), col(textCol), col(nCharsCol))) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    def fracOk(num: Column, pct: Long): Column =
      col(nCharsCol) === 0L || num * 100L <= col(nCharsCol) * pct
    val lengthOk = col("n_tokens") >= t.minTokens && col("n_tokens") <= t.maxTokens
    val wordLenOk = lit(t.minMeanWordChars) * col("n_tokens") <= col(nCharsCol) &&
      col(nCharsCol) <= lit(t.maxMeanWordChars) * col("n_tokens")
    val topBiOk = fracOk(col("top_bigram_chars"), t.topBigramCharPct)
    val topTriOk = fracOk(col("top_trigram_chars"), t.topTrigramCharPct)
    val dup5Ok = fracOk(col("dup_5gram_chars"), t.dup5gramCharPct)
    base.select(
      col(idCol),
      col("n_tokens"),
      lengthOk.as("length_ok"),
      wordLenOk.as("word_len_ok"),
      topBiOk.as("top_bigram_ok"),
      topTriOk.as("top_trigram_ok"),
      dup5Ok.as("dup_5gram_ok"),
      (lengthOk && wordLenOk && topBiOk && topTriOk && dup5Ok).as("keep"))
  }
}
