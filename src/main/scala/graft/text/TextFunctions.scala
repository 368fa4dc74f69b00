package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure `Column` expressions (whole-stage codegen, no
  * UDFs) so they stay inside the scan pipeline at 100 TB — one pass, no
  * shuffle until the caller aggregates.
  *
  * The clinical reference's text surface is regex validation + redaction
  * (`validation/pandera_schemas.py:24-25`, `compliance/phi_redaction.py`);
  * these operators extend it to the LLM-data-pipeline surface named in
  * BASELINE.json.
  */
object TextFunctions {

  /** Whitespace tokenization (the reference's only tokenizer is whitespace
    * splitting in UI word counts; BPE-ish regex variant below). */
  /** Contract note: an empty/whitespace-only string yields [""] (one
    * empty token), so tokenCount("") == 1. Deliberate: DuckDB's
    * regexp_split_to_array shares the quirk, and every oracle counts
    * tokens through the same definition — changing one side alone would
    * break t1/t2/t3/t13 hash-matches. Filter empty docs upstream if the
    * distinction matters (the curation quality gate already excludes
    * them: length term 0 ⇒ score < 0.3). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def charCount(text: Column): Column = length(text).cast("long")

  /** BPE-ish subword proxy: count of letter-runs, digit-runs and single
    * punctuation marks (a deterministic stand-in for a real BPE vocab).
    * RE2-compatible pattern so the DuckDB oracle computes the same count. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Count of characters in `text` matching the regex char-class. */
  def charClassCount(text: Column, charClass: String): Column =
    (length(text) - length(regexp_replace(text, charClass, ""))).cast("long")

  def punctCount(text: Column): Column = charClassCount(text, "[.,;:!?]")
  def digitCount(text: Column): Column = charClassCount(text, "[0-9]")
  def upperCount(text: Column): Column = charClassCount(text, "[A-Z]")

  /** Fraction of whitespace tokens that appear in `words` (stopword ratio —
    * the workhorse of quality scoring). */
  def wordSetRatio(text: Column, words: Seq[String]): Column = {
    val hits = size(filter(tokens(text),
      t => array_contains(typedlit(words), t))).cast("double")
    hits / size(tokens(text)).cast("double")
  }

  /** Common-English stopword list (public, abridged). */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be", "are")

  /** Quality score in [0,1]: long-enough docs with low punctuation/digit
    * noise and some stopword mass score high (reference shape: participation
    * quality bands, `dim_study_overview.sql:82-97`, re-targeted at text). */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val lengthTerm = least(n / 500.0, lit(1.0)) * 0.4
    val punctTerm = greatest(lit(0.0),
      lit(0.3) - punctCount(text).cast("double") / greatest(n, lit(1.0)) * 3.0)
    val stopTerm = least(wordSetRatio(text, EnglishStopwords) * 3.0, lit(1.0)) * 0.3
    round(lengthTerm + punctTerm + stopTerm, 6)
  }

  def qualityBand(text: Column): Column = {
    val q = qualityScore(text)
    when(q >= 0.6, "HIGH").when(q >= 0.3, "MEDIUM").otherwise("LOW")
  }

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic (public stopword lists, abridged). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "y", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有"))

  /** Number of whitespace tokens of `text` within `markers`. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(typedlit(markers), t))).cast("long")

  /** Language-ID heuristic: argmax of marker hits, ties broken by language
    * code order, "und" (undetermined) when no marker hits at all.
    *
    * Single pass by construction: one tokenizer split, one `aggregate`
    * over the tokens accumulating all five marker counts at once, argmax
    * computed inside the finish lambda. The previous formulation composed
    * `markerHits` columns into a greatest + when-chain tree — every
    * reference re-evaluated the interpreted split+filter subtree (no CSE
    * for interpreted higher-order functions), costing ~10+ tokenizer
    * passes per row and measuring 3.6× super-linear on the 2× rehearsal's
    * longer salted tokens. `array_position` keeps the first-language-wins
    * tie-break (first index of the max).
    *
    * NULL text folds to "und" (not NULL): `aggregate` over a NULL token
    * array is NULL, while the pre-r8 when-chain fell through to 'und' —
    * the coalesce pins the original contract (r8 ADVICE). */
  def detectLang(text: Column): Column = {
    val langs = LangMarkers.map(_._1)
    val zero = array(LangMarkers.map(_ => lit(0)): _*)
    coalesce(aggregate(tokens(text), zero,
      (acc, t) => array(LangMarkers.zipWithIndex.map { case ((_, ms), i) =>
        element_at(acc, i + 1) +
          when(array_contains(typedlit(ms), t), 1).otherwise(0)
      }: _*),
      acc => when(array_max(acc) > 0,
        element_at(typedlit(langs), array_position(acc, array_max(acc)).cast("int")))
        .otherwise(lit("und"))), lit("und"))
  }

  /** Array of `n`-token shingles as a pure Column expression (empty array
    * when the doc has fewer than `n` tokens). */
  def shingleArray(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Within-document repetition ratio (the Gopher-family repetition
    * quality rule, Rae et al. 2021 §A1.1 — public literature): the
    * fraction of n-gram OCCURRENCES that are repeats of an earlier n-gram
    * in the same document, `1 − distinct/total`. 0 for unrepetitive prose,
    * → 1 for degenerate loops; docs with fewer than `n` tokens score 0.
    * Pure Column expression — stays in the scan pipeline, no shuffle.
    * NOTE: the higher-order functions here (`transform`/`array_distinct`)
    * run interpreted; the hot-path equivalent is the codegen'd
    * [[graft.functions.ShingleStats]] expression (`graft_shingle_stats`),
    * ~30× faster at sf0.1 — this form is kept as its equivalence
    * reference (ShingleStatsSpec). */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = shingleArray(text, n)
    val total = size(sh).cast("double")
    when(total > 0,
      round(lit(1.0) - size(array_distinct(sh)).cast("double") / total, 6))
      .otherwise(0.0)
  }

  /** Whitespace-canonical form used for fingerprinting/dedup. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Deterministic 128-bit content fingerprint of the normalized text
    * (reference F10 surrogate-key shape, `fact_subject_outcomes.sql:19`). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** 60-bit integer hash of a string via md5 (stable across engines:
    * DuckDB `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`). Used as the
    * shingle hash for MinHash. */
  def hash60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), lit("|"), c)), 1, 15), 16, 10)
      .cast("long")

  /** Token positions (1-based) surviving adjacent-duplicate collapse:
    * position i is kept iff i = 1 or token(i) ≠ token(i−1) — the REPAIR
    * twin of the repetition DETECTORS (t15/t26): re-joining the kept
    * positions collapses stutter runs ("a a the" → "a the"), the
    * within-doc cousin of RefinedWeb/FineWeb duplicate-line removal
    * (line granularity is vacuous on a one-line corpus).
    *
    * `toks` MUST be a materialized column REFERENCE (project
    * `tokens(text)` into a named column first), never the split
    * expression inline: lambda bodies re-evaluate their inlined inputs
    * per element, so an inline split turns this O(n) scan into O(n²)
    * re-tokenizations per row — measured as a 22 s bench row before the
    * projection discipline (round 10). */
  def keptAdjacentPositions(toks: Column): Column =
    filter(sequence(lit(1), size(toks)),
      i => i === 1 || element_at(toks, i) =!= element_at(toks, i - 1))

  /** Kept positions (`kept` = [[keptAdjacentPositions]] output column)
    * re-joined into the cleaned text. Both arguments must be column
    * references (see [[keptAdjacentPositions]]). */
  def joinKeptTokens(toks: Column, kept: Column): Column =
    array_join(transform(kept, i => element_at(toks, i)), " ")
}
