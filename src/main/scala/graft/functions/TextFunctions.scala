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

  /** Reference services/index_service.py:preprocess_description.
    *
    * The original formulation ran SEVEN regexp_replace passes (each one
    * allocates a fresh string per row); the hottest CPU of every text
    * pipeline is this chain, so the passes are merged into three
    * provably-equivalent ones (spec-pinned against the 7-pass reference
    * in TextFunctionsSpec):
    *  - thc/cbd unit rewrites share one alternation: the patterns are
    *    literal-disjoint (a thc match span contains no 'b'/'d', so it can
    *    neither create nor destroy a cbd match, and the replacements
    *    introduce neither literal), so sequential replaceAll ≡ one
    *    left-to-right alternation pass;
    *  - the three `X[ -]?dominant` rewrites are disjoint on their leading
    *    literals and none of the replacements contains `dominant`, so the
    *    same argument applies;
    *  - strip-specials-then-collapse-whitespace is one pass: each special
    *    became a single space and every \s+ run then collapsed, so a run
    *    of [specials ∪ whitespace] maps to exactly one space either way
    *    (`\w` and `\s` are both ASCII classes in Java regex, so the runs
    *    partition identically). */
  def preprocess(c: Column): Column = {
    var x = lower(coalesce(c, lit("")))
    // capture-group rewrites (Java replacement syntax `$1`)
    x = regexp_replace(x, "(thc|cbd):?\\s*(\\d+\\.?\\d*)%?", "$1 $2%")
    x = regexp_replace(x, "(hybrid|indica|sativa)[ -]?dominant", "$1")
    // keep word chars, whitespace and %; specials AND whitespace runs
    // both land on one space
    trim(regexp_replace(x, "[^\\w%]+", " "))
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
