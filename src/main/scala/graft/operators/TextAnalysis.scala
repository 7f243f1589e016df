package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable._
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table: language ID,
  * quality scoring, token statistics, fingerprinting. Everything is a
  * narrow per-row projection or a single hash aggregation — shuffle-free
  * or one-shuffle plans that scale linearly with document count.
  */
object TextAnalysis {

  /** Stopword lists per language for the n-gram/stopword heuristic
    * language identifier. Order matters: it is the deterministic
    * tie-break (first language with the max score wins).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "zh" -> Seq("de0", "shi4", "bu4", "le0", "zai4"))

  /** Per-language stopword hit count over a token array column. */
  def stopwordScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language ID: per-language stopword scores + argmax prediction
    * (ties resolved by [[stopwords]] order). Output:
    * doc_id, s_en..s_zh, lang_pred.
    */
  def langId(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = documents.select(
      col("doc_id") +: stopwords.map { case (l, ws) => stopwordScore(toks, ws).as(s"s_$l") }: _*)
    val best = greatest(stopwords.map { case (l, _) => col(s"s_$l") }: _*)
    // first language (in declaration order) hitting the max score wins
    val firstMatch = stopwords.reverse.foldLeft(lit("und")) { case (alt, (l, _)) =>
      when(col(s"s_$l") === best, lit(l)).otherwise(alt)
    }
    scored.withColumn("lang_pred", firstMatch)
  }

  /** Heuristic quality score in [0,1]: token volume, stopword density,
    * and mean token length, each saturating. Deterministic per-row
    * double arithmetic. Output: doc_id, n_toks, quality.
    */
  def qualityScore(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nToks = size(toks).cast("double")
    val avgLen = (col("n_chars").cast("double") - (nToks - 1.0)) / nToks
    val stopRatio = stopwordScore(toks, stopwords.head._2).cast("double") / nToks
    val quality = round(
      least(nToks / 100.0, lit(1.0)) * 0.5 +
      stopRatio * 0.3 +
      least(avgLen / 8.0, lit(1.0)) * 0.2, 6)
    documents.select(col("doc_id"), size(toks).as("n_toks"), quality.as("quality"))
  }

  /** Global token frequency: top `limit` tokens by count (count desc,
    * token asc). One explode + one hash aggregate + TakeOrdered.
    */
  def tokenCounts(documents: DataFrame, limit: Int = 100): DataFrame =
    documents
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(limit)

  /** Per (lang, source) document statistics: counts, exact char sums,
    * mean chars, token sums. Integer sums — fully deterministic.
    */
  def docStats(documents: DataFrame): DataFrame =
    documents
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        round(sum("n_chars").cast("double") / count(lit(1)), 6).as("avg_chars"),
        sum(size(tokens(col("text"))).cast("long")).as("sum_tokens"))

  /** Whitespace vs BPE-ish regex token counts per document. */
  def tokenCounting(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_ws_tokens"),
      regexTokenCount(col("text")).as("n_re_tokens"))

  /** Rolling-hash document fingerprint (order-sensitive). */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      rollingFingerprint(tokens(col("text"))).as("fp"))
}
