package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.3).
  * All pure `Column` expressions — codegen'd, shuffle-free, scale
  * linearly with the corpus.
  */
object TextOps {

  /** Whitespace tokenization (raw case preserved). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct k-gram token shingles as space-joined strings; empty
    * array when the doc has fewer than k tokens. Delegates to the
    * custom `Shingles` Catalyst expression (graft.functions) — the
    * pure-HOF formulation is interpreted and an order of magnitude
    * slower per document. */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.exprs.shingles(text, k)

  /** BPE-ish token count: letter runs, single digits, single symbols. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Whitespace token count. */
  def wsCount(text: Column): Column = size(tokens(text)).cast("long")

  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Count of stopword tokens (from a token-array column). */
  def stopCount(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))
      .cast("long")

  /** Language-marker hit count for a token array. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(x => x: Any): _*))).cast("long")

  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "et", "les"),
    "es" -> Seq("el", "los", "y"))

  /** Canonical form for fingerprinting: lowercase, strip non-alnum,
    * squeeze whitespace. */
  def canonical(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Canonical-form MD5 fingerprint — the dedup key for "same content
    * modulo punctuation/case/spacing". */
  def fingerprint(text: Column): Column = md5(canonical(text))

  /** 64-bit polynomial rolling hash of the canonical form (base-31,
    * wrap-around multiply — needs non-ANSI arithmetic). Cheaper than
    * md5 at 100 TB; same dedup-key role. */
  def rollingHash(text: Column): Column = {
    val chars = split(canonical(text), "")
    aggregate(chars, lit(0L), (acc, c) => acc * lit(31L) + ascii(c).cast("long"))
  }
}
