package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Heuristic document-quality rule sets from the public pretraining
  * literature — the filters a large-scale training-data pipeline runs
  * before dedup (they are pure map stages: zero shuffle, codegen'd
  * builtins only, so they pipeline with the parquet scan and cost one
  * pass over the text regardless of corpus size).
  *
  * Two families:
  *   - [[gopherSignals]]: document-level repetition/shape rules in the
  *     style of Gopher (Rae et al. 2021, "Scaling Language Models",
  *     appendix A — word-count bounds, mean-word-length band,
  *     symbol-to-word ratio, bullet/ellipsis line fractions,
  *     alphabetic-word fraction, stop-word presence).
  *   - [[c4LineFilter]]: line-level cleaning in the style of C4
  *     (Raffel et al. 2020, §2.2 — keep only lines that look like
  *     sentences: terminal punctuation, a minimum word count, no
  *     boilerplate/code markers).
  *
  * All ratios are rounded to 4 decimals BEFORE thresholding so the
  * keep decision is bit-identical across engines (the DuckDB oracles
  * replicate every rule).
  */
object QualityRules {

  /** Gopher-family stop words (a presence check, not a ratio — the
    * rule is "≥ 2 of these appear"). */
  private val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document Gopher-style quality signals + keep decision.
    *
    * Signals (each also returned, so downstream consumers can re-mix
    * thresholds without recomputing the scan):
    *   - `n_words` in [minWords, maxWords]
    *   - `mean_word_len` in [3, 10]
    *   - `symbol_ratio` ('#' and '…'-as-'...' per word) ≤ 0.1
    *   - `frac_bullet_lines` (lines starting "- ", "* ", "• ") ≤ 0.9
    *   - `frac_ellipsis_lines` (lines ending "...") ≤ 0.3
    *   - `frac_alpha_words` (words containing a letter) ≥ 0.8
    *   - `n_stop_hits` (distinct Gopher stop words present) ≥ 2
    */
  def gopherSignals(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    // All lambda-bearing signals are computed ONCE inside a single
    // bound struct: subtrees containing lambda functions are excluded
    // from Spark's subexpression elimination, so spelling each signal
    // out per output column would re-tokenize / re-scan the lines per
    // reference. The struct lands in its own projection (CollapseProject
    // keeps non-cheap, multiply-referenced aliases separate), and the
    // downstream keep/extract projections only touch struct fields.
    import graft.functions.TextFunctions.bound
    val text = col(textCol)
    def frac(n: Column, d: Column): Column =
      round(n.cast("double") / d, 4)
    val occHash = length(text) - length(regexp_replace(text, "#", ""))
    val occEll = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3

    val sig = bound(tokens(text)) { toks =>
      bound(split(text, "\n")) { lines =>
        val nWords = size(toks)
        val nLines = size(lines)
        struct(
          nWords.as("n_words"),
          frac(aggregate(toks, lit(0L), (acc, t) => acc + length(t)), nWords)
            .as("mean_word_len"),
          frac(occHash + occEll, nWords).as("symbol_ratio"),
          frac(size(filter(lines, l =>
            substring(l, 1, 2) === "- " || substring(l, 1, 2) === "* " ||
              substring(l, 1, 2) === "• ")), nLines)
            .as("frac_bullet_lines"),
          frac(size(filter(lines, l => l.like("%..."))), nLines)
            .as("frac_ellipsis_lines"),
          frac(size(filter(toks, t => t.rlike("[a-z]"))), nWords)
            .as("frac_alpha_words"),
          size(filter(
            typedLit(gopherStops), sw => array_contains(toks, sw)))
            .as("n_stop_hits"))
      }
    }
    docs.select(col(idCol).as("doc_id"), sig.as("__sig"))
      .select(col("doc_id"), col("__sig.*"))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 &&
          col("frac_bullet_lines") <= 0.9 &&
          col("frac_ellipsis_lines") <= 0.3 &&
          col("frac_alpha_words") >= 0.8 &&
          col("n_stop_hits") >= 2)
  }

  /** C4-style line filter: a line survives iff it ends in terminal
    * punctuation (`.` `!` `?` `"`), has ≥ `minLineWords` words, and
    * carries none of the boilerplate markers (curly braces, the word
    * "javascript", the phrase "lorem ipsum" — case-insensitive).
    *
    * Returns per-doc line counts, the md5 of the cleaned text
    * (kept lines re-joined with '\n') and `keep` = any line survived.
    * The cleaned text itself is reconstructable from the survivors;
    * returning the hash keeps the operator's output narrow (ids +
    * counters), which is what a 100-TB filter stage should emit. */
  def c4LineFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLineWords: Int = 5): DataFrame = {
    import graft.functions.TextFunctions.bound
    val keptLine: Column => Column = l => {
      val lo = lower(l)
      (l.like("%.") || l.like("%!") || l.like("%?") || l.like("%\"")) &&
        size(split(trim(l), " ")) >= minLineWords &&
        !lo.contains("javascript") && !lo.contains("lorem ipsum") &&
        !l.contains("{") && !l.contains("}")
    }
    // line split + filter run ONCE per row (bound + own projection —
    // see gopherSignals' note on lambda trees and CSE); cleaned_md5 is
    // NULL (not md5 of the empty string) when nothing survives —
    // "no cleaned text" is a distinct state downstream consumers
    // filter on, and it is the one empty-list representation SQL
    // engines agree about (DuckDB's array_to_string([]) is already
    // NULL where Spark's array_join([]) is '')
    val sig = bound(split(col(textCol), "\n")) { lines =>
      bound(filter(lines, keptLine)) { kept =>
        struct(
          size(lines).as("n_lines"),
          size(kept).as("n_kept"),
          when(size(kept) > 0, md5(array_join(kept, "\n")))
            .as("cleaned_md5"),
          (size(kept) > 0).as("keep"))
      }
    }
    docs.select(col(idCol).as("doc_id"), sig.as("__sig"))
      .select(col("doc_id"), col("__sig.*"))
  }
}
