package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Util._

/** Extended text-analysis ops for LLM training-data pipelines
  * (SURVEY.md §2.11 extensions): language-ID, quality scoring, BPE-ish
  * token counting, shingle fingerprinting.
  *
  * All four are single-pass scans with per-row expression work followed
  * by at most one hash aggregate — the at-scale shape is "map-side
  * everything": no join, no extra shuffle beyond the final groupBy, and
  * the per-doc expressions stay in whole-stage codegen (built-in
  * functions + HOFs only, no UDFs).
  */
object TextAnalysis {

  private def toks: Column = split(lower(col("text")), " ")

  /** Deterministic per-language marker-token profiles. On real corpora
    * these would be the top character n-grams / function words per
    * language; the mechanism (profile hit-count → argmax with a stable
    * tie-break) is the standard dictionary language-ID shape. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("stream", "merge", "hash", "row"),
    "en" -> Seq("the", "a", "table", "order"),
    "es" -> Seq("agg", "scan", "group", "slow"),
    "fr" -> Seq("query", "batch", "data", "key"),
    "zh" -> Seq("join", "small", "customer", "value"))

  /** n-gram-dictionary language ID: occurrence count of each language's
    * marker tokens, argmax with alphabetical tie-break; output is the
    * label × prediction confusion matrix. */
  def qTextLangid(s: SparkSession, sf: String): DataFrame = {
    val scored = Tables.documents(s, sf).withColumn("tk", toks)
    val withScores = markers.foldLeft(scored) { case (df, (l, ms)) =>
      df.withColumn(s"s_$l",
        size(filter(col("tk"), t => ms.map(t === _).reduce(_ || _))))
    }
    // argmax with alphabetical preference on ties — mirrored CASE chain
    // in the oracle SQL.
    val langs = markers.map(_._1)
    def sc(l: String): Column = col(s"s_$l")
    val predicted =
      when(langs.tail.map(o => sc("de") >= sc(o)).reduce(_ && _), "de")
        .when(langs.drop(2).map(o => sc("en") >= sc(o)).reduce(_ && _), "en")
        .when(langs.drop(3).map(o => sc("es") >= sc(o)).reduce(_ && _), "es")
        .when(sc("fr") >= sc("zh"), "fr")
        .otherwise("zh")
    withScores.withColumn("pred_lang", predicted)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred_lang")
  }

  /** Heuristic quality score per doc — repetition (distinct-token
    * ratio), mean word length, stopword ratio — aggregated per source.
    * Per-doc score is rounded (at a tie-free scale, see below) before
    * the decimal-sum average so the cross-engine aggregate is exact. */
  def qTextQuality(s: SparkSession, sf: String): DataFrame = {
    val d = Tables.documents(s, sf)
      .withColumn("tk", toks)
      .withColumn("n_words", size(col("tk")).cast("double"))
      .withColumn("distinct_ratio",
        size(array_distinct(col("tk"))) / col("n_words"))
      .withColumn("mean_wlen",
        (col("n_chars") - col("n_words") + lit(1.0)) / col("n_words"))
      .withColumn("stop_ratio",
        size(filter(col("tk"), t => t === "the" || t === "a")) / col("n_words"))
      // round at scale 6, NOT 4: quality values are exact multiples of
      // 2.5e-5 on this formula, which sit ON the 1e-4 rounding grid's
      // midpoints — Spark (shortest-decimal HALF_UP) and DuckDB
      // (binary-value) break those ties differently (bit us at sf0.1).
      // At 1e-6 every value is an even multiple of the half-step, so no
      // tie exists on either engine.
      .withColumn("quality", round(
        lit(0.4) * col("distinct_ratio") +
        lit(0.3) * least(col("mean_wlen") / lit(8.0), lit(1.0)) +
        lit(0.3) * (lit(1.0) - col("stop_ratio")), 6))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           (dsum(col("quality"), 6) / count(lit(1))).as("avg_quality"),
           sum(when(col("quality") < 0.5, 1L).otherwise(0L)).as("n_low"))
      .orderBy("source")
  }

  /** BPE-ish token accounting: lexer-style regex tokens (letter runs /
    * digit runs / single symbols), plus a 4-chars-per-piece subword
    * estimate — the whitespace count and the piece count bracket the
    * true BPE token count. */
  def qTextTokens(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .withColumn("rtk",
        regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
      .select(
        col("doc_id"),
        size(col("rtk")).cast("long").as("n_tokens"),
        aggregate(transform(col("rtk"), t => ceil(length(t) / lit(4.0)).cast("long")),
                  lit(0L), (a, x) => a + x).as("n_pieces"))
      .orderBy("doc_id")

  /** Document fingerprint: minimum md5 over word 3-shingles (a 1-grid
    * winnowing fingerprint). Groups sharing a fingerprint are near-dup
    * cluster candidates; emitted clusters of ≥ 2. */
  def qTextFingerprint(s: SparkSession, sf: String): DataFrame = {
    val t = split(col("text"), " ")
    val fp = when(size(t) >= 3,
        array_min(transform(sequence(lit(0), size(t) - 3),
          i => md5(concat_ws(" ", slice(t, i + 1, lit(3)))))))
      .otherwise(md5(col("text")))
    Tables.documents(s, sf)
      .select(col("doc_id"), fp.as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .where(col("n_docs") >= 2)
      .orderBy("fp")
  }
}
