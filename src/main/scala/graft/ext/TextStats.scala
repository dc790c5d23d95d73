package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, and fingerprinting. All are pure
  * codegen'd column expressions — no UDFs — so they stay inside whole-stage
  * codegen and scale linearly over a 100 TB corpus scan. (Beyond the
  * reference surface; required by the build brief.)
  */
object TextStats {

  /** Whitespace tokens of the lowercased, trimmed text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-style pre-tokenization pattern (the GPT-2 family's splitter, minus
    * lookahead so the same pattern runs on RE2-based engines too): English
    * contractions, optionally-space-prefixed letter runs, digit runs,
    * punctuation runs, and residual whitespace. */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish subword-boundary tokens (pre-tokenizer granularity — the unit a
    * byte-pair encoder would merge within). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Token count at BPE pre-tokenizer granularity, excluding pure-whitespace
    * matches — the cheap corpus-scale proxy for "how many tokens will this
    * document cost" ahead of real BPE merging. */
  def bpeTokenCount(text: Column): Column =
    size(filter(bpeTokens(text), t => !t.rlike("^\\s+$")))

  /** Count of tokens that appear in `words`. */
  def wordHits(text: Column, words: Seq[String]): Column = {
    val dict = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(dict, t)))
  }

  val enStop = Seq("the", "and", "of", "to", "a", "is", "in", "for", "on", "with")
  val deStop = Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit")
  val frStop = Seq("le", "la", "les", "et", "est", "un", "une", "pour")
  val esStop = Seq("el", "los", "las", "y", "es", "un", "una", "por")

  def punctCount(text: Column): Column = regexp_count(text, lit("[.,!?;:]"))

  /** Heuristic quality score in [0,1]: length band + stopword presence +
    * punctuation sanity. Pure integer comparisons and constant additions, so
    * bit-reproducible everywhere. */
  def qualityScore(text: Column): Column = {
    val tc = tokenCount(text)
    val sw = wordHits(text, enStop).cast("double") / tc
    val pr = punctCount(text).cast("double") / length(text)
    (when(tc.between(30, 500), 0.5).otherwise(0.0)
      + when(sw >= 0.05, 0.3).otherwise(0.0)
      + when(pr <= 0.1, 0.2).otherwise(0.0))
  }

  /** N-gram-heuristic language ID: stopword hit counts per language, argmax
    * with deterministic tie-break (en > de > fr > es). */
  def langId(text: Column): Column = {
    val en = wordHits(text, enStop)
    val de = wordHits(text, deStop)
    val fr = wordHits(text, frStop)
    val es = wordHits(text, esStop)
    when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Canonical-form content fingerprint: md5 of whitespace-normalized
    * lowercase text. Stable across engines; the key for exact dedup. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling polynomial hash (Rabin-Karp style) over the normalized text —
    * an alternative cheap fingerprint with incremental-update structure.
    * One codegen'd character loop per row ([[graft.funcs.RollingHash]]:
    * `h = (h·131 + c) mod 2^31−1`), no per-character array materialization,
    * and the identical fold runs in ANSI SQL for the DuckDB oracle (q30). */
  def rollingHash(text: Column): Column = {
    graft.funcs.VectorFunctions.register(org.apache.spark.sql.SparkSession.active)
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    graft.funcs.VectorFunctions.rollingHash(norm)
  }

  /** All per-document stats in one projection. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("token_count", tokenCount(t))
      .withColumn("n_chars_calc", length(t))
      .withColumn("punct_ratio", punctCount(t).cast("double") / length(t))
      .withColumn("stop_ratio", wordHits(t, enStop).cast("double") / tokenCount(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
