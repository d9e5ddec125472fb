package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (builder brief):
  * language-ID (n-gram/stopword heuristic), quality scoring, token
  * counting, and document fingerprinting. All pure column expressions —
  * narrow, codegen'd, SQL-oracle-checkable. */
object TextAnalysis {

  val enStopwords: Seq[String] = Seq("the", "of", "and", "a", "to", "in")

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword-run count: alnum runs + standalone punctuation marks. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Stopword hit count (distinct-insensitive, whole-word). */
  def stopwordHits(text: Column): Column = {
    val ws = filter(split(lower(text), "[^a-z0-9]+"), w => length(w) > 0)
    size(filter(ws, w => w.isin(enStopwords: _*)))
  }

  /** Heuristic language id: English if the stopword ratio clears 2%,
    * else 'other' (the real signal at 100 TB would be an n-gram profile —
    * same plan shape: one projection). */
  def langIdHeuristic(text: Column): Column = {
    val toks = wsTokenCount(text).cast("double")
    when(toks > 0 && stopwordHits(text) / toks >= 0.02, lit("en"))
      .otherwise(lit("other"))
  }

  /** Quality score in [0,1]: blends length, alpha ratio and stopword ratio
    * (reference has no analogue — this is the training-data-pipeline op). */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val alpha = length(regexp_replace(lower(text), "[^a-z]", "")).cast("double")
    val toks = wsTokenCount(text).cast("double")
    val lenScore = least(n / 500.0, lit(1.0))
    val alphaScore = when(n > 0, alpha / n).otherwise(lit(0.0))
    val stopScore = when(toks > 0, least(stopwordHits(text) / toks * 10.0, lit(1.0)))
      .otherwise(lit(0.0))
    round((lenScore + alphaScore + stopScore) / 3.0, 6)
  }

  /** Content fingerprint of whitespace/case-normalized text (rolling-hash
    * analogue, exactly reproducible in any engine with md5). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))
}
