package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Text-analysis operators for large-scale training-data pipelines
  * (builder-prompt requirement: language-ID, quality scoring, token
  * counting, document fingerprinting). All are per-document column
  * expressions — zero shuffle except the fingerprint window (partitioned
  * by doc, so it stays within a partition after one hash-partitioning by
  * doc_id). Everything stays inside whole-stage codegen: no UDFs.
  *
  * Cross-engine determinism: counts are integers; ratios are rounded;
  * hashes derive from sha256 hex prefixes (identical in DuckDB).
  */
object TextAnalysis {

  // Marker stopword sets for the n-gram/stopword language heuristic.
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "it"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "des"))

  private def words(c: Column): Column = split(c, " ")

  private def hits(c: Column, lang: String): Column =
    size(filter(words(c), w => array_contains(
      array(markers(lang).map(lit): _*), w)))

  /** Language identification by stopword-marker scoring with a fixed
    * priority tie-break (en > es > de > fr; no hits → "und"). */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .withColumn("en_hits", hits(col("text"), "en").cast("long"))
      .withColumn("es_hits", hits(col("text"), "es").cast("long"))
      .withColumn("de_hits", hits(col("text"), "de").cast("long"))
      .withColumn("fr_hits", hits(col("text"), "fr").cast("long"))
    val best = greatest(col("en_hits"), col("es_hits"), col("de_hits"),
      col("fr_hits"))
    d.withColumn("predicted_lang",
        when(best === 0, "und")
          .when(col("en_hits") === best, "en")
          .when(col("es_hits") === best, "es")
          .when(col("de_hits") === best, "de")
          .otherwise("fr"))
      .select(col("doc_id"), col("en_hits"), col("es_hits"),
        col("de_hits"), col("fr_hits"), col("predicted_lang"),
        (col("predicted_lang") === col("lang")).as("matches_label"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length / vocabulary-diversity / stopword-density
    * signals with an integer-arithmetic keep rule (engine-portable). */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_words", size(words(col("text"))).cast("long"))
      .withColumn("n_distinct_words",
        size(array_distinct(words(col("text")))).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("stop_hits", hits(col("text"), "en").cast("long"))
      .withColumn("avg_word_len",
        round(col("n_chars").cast("double") / col("n_words"), 4))
      .withColumn("distinct_permille",
        expr("n_distinct_words * 1000 div n_words")) // integer division
      .withColumn("keep",
        col("n_words") >= 20 && col("n_chars") >= 100 &&
          col("distinct_permille") >= 300)
      .select("doc_id", "n_words", "n_distinct_words", "n_chars",
        "stop_hits", "avg_word_len", "distinct_permille", "keep")
      .orderBy("doc_id")

  /** Token counting: whitespace tokens, a BPE-ish ~4-chars/token
    * estimate (the reference's embedding-cap rule, doc2vec.ts:2002-2008),
    * and regex word tokens. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("ws_tokens", size(words(col("text"))).cast("long"))
      .withColumn("est_bpe_tokens",
        ceil(length(col("text")).cast("double") / 4).cast("long"))
      .withColumn("alpha_tokens",
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
          .cast("long"))
      .withColumn("over_embed_cap", length(col("text")) > 32764)
      .select("doc_id", "ws_tokens", "est_bpe_tokens", "alpha_tokens",
        "over_embed_cap")
      .orderBy("doc_id")

  /** Document fingerprinting by winnowing: k-gram (k=8) rolling hashes
    * (sha256-prefix integers), window (w=4) minima, distinct minima form
    * the fingerprint set. Standard winnowing as in Schleimer et al.
    * (SIGMOD'03), with a cross-engine-deterministic hash. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val w = 4
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("i",
        explode(sequence(lit(1),
          greatest(lit(1), length(col("text")) - (k - 1)))))
      .withColumn("gram", substring(col("text"), col("i"), lit(k)))
      .withColumn("h",
        conv(substring(sha2(col("gram"), 256), 1, 12), 16, 10).cast("long"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("win_min", min(col("h")).over(win))
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("win_min")).as("n_fingerprints"),
        array_join(sort_array(array_distinct(collect_list(col("win_min")))),
          ",").as("fp_sig"))
      .orderBy("doc_id")
  }
}
