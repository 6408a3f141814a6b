package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: language ID, quality
  * scoring, token counting. All outputs are integers (counts, floored
  * ratios) so results are engine-reproducible; all expressions are
  * codegen'd built-ins.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword
    * heuristic language identifier. Distinct-word overlap with each
    * list is the language score.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这")
  )

  private def words(c: Column): Column = split(Dedup.normalize(c), " ")

  /** C8: heuristic language ID. Scores = stopword overlap per
    * language; argmax wins, alphabetical tiebreak, no overlap → "und".
    * Implemented as array_max over (score, reverse-alpha lang) structs
    * — a single expression, no UDF, no shuffle.
    */
  def langId(c: Column): Column = {
    val w = array_distinct(words(c))
    val scored = Stopwords.toSeq.sortBy(_._1).zipWithIndex.map { case ((lang, sw), rank) =>
      struct(
        size(array_intersect(w, array(sw.map(lit): _*))).as("score"),
        lit(-rank).as("tie"), // ties resolve alphabetically-first under max
        lit(lang).as("lang")
      )
    }
    val bestLang = array_max(array(scored: _*))
    when(bestLang.getField("score") > 0, bestLang.getField("lang")).otherwise(lit("und"))
  }

  /** C9: quality signals, all integer: char count, word count,
    * punctuation count, stopword occurrences (en), and a 0-100 floored
    * stopword-ratio score.
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    val w = words(c)
    val en = array(Stopwords("en").map(lit): _*)
    df.select(
      col(idCol),
      length(c).cast("long").as("n_chars"),
      size(w).cast("long").as("n_words"),
      size(filter(w, x => array_contains(en, x))).cast("long").as("n_stop"),
      regexp_count(c, lit("[.,;:!?]")).cast("long").as("n_punct")
    ).withColumn(
      "stop_score",
      when(col("n_words") > 0, floor(lit(100.0) * col("n_stop") / col("n_words"))).otherwise(0L)
    )
  }

  /** C9b: repetition/shape statistics, all integer: scaled average
    * word length (floor(10*letters/words)), max single-word repetition
    * count (template/boilerplate detector), distinct-word count.
    */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    df.select(
      col(idCol),
      floor(lit(10.0) * length(regexp_replace(Dedup.normalize(col(textCol)), " ", "")) / size(w))
        .as("avg_word_len_x10"),
      graft.functions.VecOps.max_word_rep(w).as("max_word_rep"),
      size(array_distinct(w)).cast("long").as("n_distinct_words")
    )
  }

  /** C10: token counts — whitespace tokens and a BPE-ish regex
    * tokenization (letter runs / digit runs / single punctuation).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    df.select(
      col(idCol),
      regexp_count(c, lit("[^ ]+")).cast("long").as("n_ws_tokens"),
      regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).cast("long").as("n_bpe_tokens")
    )
  }
}
