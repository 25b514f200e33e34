package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column functions, all composed from codegen'd built-ins.
  *
  * `preprocess` re-expresses the reference's description-cleaning pipeline
  * (reference: services/index_service.py:14-53): lowercase, standardize
  * domain terms with capture-group rewrites, strip special chars except
  * `%`, collapse whitespace.
  */
object TextFunctions {

  /** Reference services/index_service.py:preprocess_description. */
  def preprocess(c: Column): Column = {
    var x = lower(coalesce(c, lit("")))
    // capture-group rewrites (Java replacement syntax `$1`)
    x = regexp_replace(x, "thc:?\\s*(\\d+\\.?\\d*)%?", "thc $1%")
    x = regexp_replace(x, "cbd:?\\s*(\\d+\\.?\\d*)%?", "cbd $1%")
    x = regexp_replace(x, "hybrid[ -]?dominant", "hybrid")
    x = regexp_replace(x, "indica[ -]?dominant", "indica")
    x = regexp_replace(x, "sativa[ -]?dominant", "sativa")
    // keep word chars, whitespace and % ; then collapse whitespace
    x = regexp_replace(x, "[^\\w\\s%]", " ")
    trim(regexp_replace(x, "\\s+", " "))
  }

  /** Whitespace tokens of already-normalized text; [] for blank input. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count (0 for blank). */
  def wsTokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: letter runs, single digits, single punct. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0)))

  /** Word n-grams ("shingles") over a token array; [] when too short.
    * Native single-pass expression — see [[WordShingles]] for why a
    * lambda formulation is quadratic. */
  def shingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      WordShingles(org.apache.spark.sql.graft.bridge.expression(toks), n))

  /** English-ish stopword list shared with the DuckDB oracles. */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that")

  def stopwordCount(toks: Column): Column = countInSet(toks, Stopwords)

  /** Native multiplicity count of tokens within a fixed word set. */
  def countInSet(toks: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graft.bridge.column(
      CountInSet(org.apache.spark.sql.graft.bridge.expression(toks), words))

  /** Alphabetic character count. */
  def alphaCount(c: Column): Column =
    length(regexp_replace(c, "[^A-Za-z]", ""))
}
