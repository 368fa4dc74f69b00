package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style rule-based document quality filtering (Rae et al. 2021,
  * "Scaling Language Models" Appendix A — the public heuristic rule set
  * RedPajama/Dolma/FineWeb re-implement): a battery of per-document
  * structural rules, each a cheap predicate over the raw text, whose
  * conjunction is the keep decision. Complements the CONTINUOUS quality
  * score ([[TextFunctions.qualityScore]]) — production curation runs the
  * hard rule battery first (cheap, codegen'd, interpretable) and scores
  * only survivors.
  *
  * Determinism discipline: every rule is an INTEGER comparison — ratio
  * thresholds are cross-multiplied (`10·n_sym ≤ n_words` instead of
  * `n_sym/n_words ≤ 0.1`), so there is no float surface at all and the
  * DuckDB oracle replays each rule bit-exactly.
  *
  * 100 TB shape: one projection over the corpus scan — no shuffle, no
  * join, no aggregation; the rule battery is exactly the kind of
  * before-any-shuffle selectivity the curation funnel wants first.
  */
object QualityRules {

  /** The Gopher stop-word battery (Appendix A, verbatim list). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule columns over `text`. Each is BOOLEAN; thresholds
    * follow the paper with the word-count floor scaled to this corpus's
    * ~70-token documents (Gopher's 50-word floor, kept; its 100k ceiling,
    * kept).
    *
    *  - `r_wordcount`: 50 ≤ word count ≤ 100000
    *  - `r_meanwordlen`: mean word length in [3, 10] chars
    *    (3·n ≤ Σlen ≤ 10·n)
    *  - `r_symbolratio`: ≤ 10% of words contain # or … (10·n_sym ≤ n)
    *  - `r_alphawords`: ≥ 80% of words contain an alphabetic char
    *    (5·n_alpha ≥ 4·n)
    *  - `r_bulletlines`: ≤ 90% of lines start with a bullet
    *    (10·n_bullet ≤ 9·n_lines)
    *  - `r_duplines`: ≤ 30% duplicate lines (10·(n_lines − n_distinct) ≤
    *    3·n_lines)
    *  - `r_stopwords`: contains ≥ 2 DISTINCT words from the Gopher
    *    stop-word battery
    */
  def rules(text: Column): Seq[(String, Column)] = {
    val w = TextFunctions.tokens(text)
    val n = size(w).cast("long")
    val sumLen = aggregate(transform(w, t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val nSym = size(filter(w,
      t => t.contains("#") || t.contains("…"))).cast("long")
    val nAlpha = size(filter(w, t => t.rlike("[A-Za-z]"))).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l => {
      val t = ltrim(l)
      t.startsWith("- ") || t.startsWith("* ") || t.startsWith("•")
    })).cast("long")
    val nDistinctLines = size(array_distinct(lines)).cast("long")
    val nStop = size(array_intersect(
      array_distinct(transform(w, t => lower(t))),
      array(GopherStopwords.map(lit): _*))).cast("long")
    Seq(
      "r_wordcount" -> (n >= 50L && n <= 100000L),
      "r_meanwordlen" -> (sumLen >= n * 3L && sumLen <= n * 10L),
      "r_symbolratio" -> (nSym * 10L <= n),
      "r_alphawords" -> (nAlpha * 5L >= n * 4L),
      "r_bulletlines" -> (nBullet * 10L <= nLines * 9L),
      "r_duplines" -> ((nLines - nDistinctLines) * 10L <= nLines * 3L),
      "r_stopwords" -> (nStop >= 2L))
  }

  /** Rule verdict frame columns: every rule boolean, the packed bitmask
    * (bit i = rule i passed, in [[rules]] order), and the conjunction
    * `keep`. */
  def verdictColumns(text: Column): Seq[Column] = {
    val rs = rules(text)
    val mask = rs.zipWithIndex
      .map { case ((_, c), i) => when(c, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _)
    rs.map { case (name, c) => c.as(name) } ++
      Seq(mask.as("rule_mask"),
        rs.map(_._2).reduce(_ && _).as("keep"))
  }
}
