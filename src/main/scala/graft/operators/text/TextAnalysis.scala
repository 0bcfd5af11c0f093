package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Text-analysis operators for training-data pipelines: language ID
  * (marker-token heuristic), quality scoring, token counting, document
  * fingerprinting. All whole-stage-codegen native plans (map-only — zero
  * shuffle), so they stream at scan speed over a 100 TB corpus.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** Regex word-ish tokens (BPE-style pre-tokenization approximation):
    * letter runs, digit runs, or single non-space symbols.
    */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  /** Marker lists per language (n-gram/stopword heuristic LID). Deliberately
    * tiny — the operator shape (per-language scores → argmax) is the point;
    * swap real frequency tables in production.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "la", "y", "es", "los"))

  /** (doc_id, lang marker scores, predicted) — predicted = argmax score with
    * first-listed language winning ties, 'und' (undetermined) when all zero.
    */
  def languageId(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = langMarkers.foldLeft(docs.select(col(idCol), col(textCol))) {
      case (df, (lang, markers)) => df.withColumn(s"score_$lang", markerCount(toks, markers))
    }
    val best = langMarkers.map { case (lang, _) => (lang, col(s"score_$lang")) }
      .foldLeft(lit("und").as("x") -> lit(0).as("y")) { case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
      }
    scored
      .withColumn("predicted_lang", best._1)
      .select((col(idCol) +: langMarkers.map { case (l, _) =>
        col(s"score_$l").cast("long").as(s"score_$l") } :+ col("predicted_lang")): _*)
  }

  /** Quality features: token count, char count, mean token length,
    * punctuation count, stopword ratio (per-mille as long — engine-stable).
    */
  def quality(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val stop = markerCount(toks, Seq("the", "a", "of", "and", "is", "to", "in"))
    docs.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      length(col(textCol)).cast("long").as("n_chars"),
      size(regexp_extract_all(col(textCol), lit("[^a-zA-Z0-9 ]"), lit(0))).cast("long")
        .as("n_punct"),
      round(stop.cast("double") / size(toks).cast("double") * 1000).cast("long")
        .as("stopword_pm"))
  }

  /** Token counts: whitespace tokens + regex (BPE-ish) tokens. */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_ws_tokens"),
      size(regexTokens(col(textCol))).cast("long").as("n_re_tokens"))

  /** Content fingerprint via the custom rolling-hash expression. */
  def fingerprints(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), GraftFunctions.fingerprint(col(textCol)).as("fingerprint"))
}
