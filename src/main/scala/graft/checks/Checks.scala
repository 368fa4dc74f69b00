package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality check algebra (SURVEY.md §2.9, V1–V11).
  *
  * The reference runs two validation engines (pandera + Great Expectations,
  * `validation/validator.py:38-145`) plus dbt schema tests; every rule
  * reduces to "predicate → violation count". Here each check compiles to a
  * single conditional-count [[Column]], and a whole suite evaluates in ONE
  * aggregation job over the table (reference runs one pass per engine per
  * rule) — at 100 TB this is one scan, no shuffle beyond the final
  * single-row reduce.
  *
  * Uniqueness and referential integrity need their own shuffle (group-by /
  * anti-join) and are exposed as separate plan builders.
  */
sealed trait Check {
  /** Column name for this check's violation count in the report row. */
  def name: String

  /** True on rows violating the rule (null-safe: null input is only a
    * violation for NotNull, matching pandera's `nullable=True` default). */
  def violation: Column
}

/** V1 — reference `pandera_schemas.py:19-23`, dbt `not_null`. */
final case class NotNull(column: String) extends Check {
  val name = s"${column}_null"
  def violation: Column = col(column).isNull
}

/** V3 — value-in-set, reference `pandera_schemas.py:31,49-51`. Values may
  * be strings or numbers (GE `value_set` kwargs carry either). */
final case class InSet(column: String, allowed: Seq[Any]) extends Check {
  val name = s"${column}_not_in_set"
  def violation: Column = col(column).isNotNull && !col(column).isin(allowed: _*)
}

/** V4 — numeric range [lo, hi], reference `pandera_schemas.py:33-36`.
  * `strictLo`/`strictHi` exclude the bound itself (GE `strict_min`/
  * `strict_max` in `visits_suite.json:18`). */
final case class InRange(column: String, lo: Double, hi: Double,
    strictLo: Boolean = false, strictHi: Boolean = false) extends Check {
  val name = s"${column}_out_of_range"
  def violation: Column = {
    val belowLo = if (strictLo) col(column) <= lo else col(column) < lo
    val aboveHi = if (strictHi) col(column) >= hi else col(column) > hi
    col(column).isNotNull && (belowLo || aboveHi)
  }
}

/** V5 — string length bound, reference `pandera_schemas.py:17-25`. */
final case class MaxLength(column: String, maxLen: Int) extends Check {
  val name = s"${column}_too_long"
  def violation: Column = col(column).isNotNull && length(col(column)) > maxLen
}

/** V5 — minimum string length (GE length expectations carry both bounds;
  * min 1 is the common "non-empty" rule). */
final case class MinLength(column: String, minLen: Int) extends Check {
  val name = s"${column}_too_short"
  def violation: Column = col(column).isNotNull && length(col(column)) < minLen
}

/** Name-disambiguating wrapper: two same-type rules on one column derive
  * the same report-column name, and a duplicate alias would make one
  * rule's count silently shadow the other in the aggregation row. The
  * suite loader wraps later duplicates with a numbered name. */
final case class Renamed(inner: Check, name: String) extends Check {
  def violation: Column = inner.violation
}

/** V5 — regex format, reference `pandera_schemas.py:24-25` (`rlike`). */
final case class MatchesRegex(column: String, pattern: String) extends Check {
  val name = s"${column}_bad_format"
  def violation: Column = col(column).isNotNull && !col(column).rlike(pattern)
}

/** V6 — cross-column predicate, reference `pandera_schemas.py:81-85`
  * (`LBLNOR <= LBHNOR` etc.). `expectation` must hold on every row where it
  * is non-null. */
final case class CrossColumn(name: String, expectation: Column) extends Check {
  def violation: Column = expectation.isNotNull && !expectation
}

object Checks {

  /** Evaluate a suite in one aggregation pass: returns a single-row frame
    * with one BIGINT violation count per check (V11 report shape). */
  def evaluate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    // coalesce: sum over an EMPTY table is NULL — a zero-row domain must
    // report zero violations, not NULLs that NPE the report reader
    val aggs = checks.map(c =>
      coalesce(sum(when(c.violation, 1L).otherwise(0L)), lit(0L)).as(c.name))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** [[evaluate]] plus the row count in the SAME aggregation pass —
    * `n_rows` first, then one count per check. The landing gate needs
    * both; a separate df.count() would be a second full scan per domain
    * on the green path. Works with an empty suite (count only). */
  def evaluateWithCount(df: DataFrame, checks: Seq[Check]): DataFrame = {
    // a check literally named "n_rows" would shadow the synthetic count
    // column and make downstream getAs[Long]("n_rows") resolve ambiguously
    require(checks.forall(_.name != "n_rows"),
      "check name 'n_rows' collides with the synthetic row-count column")
    val aggs = count(lit(1)).as("n_rows") +: checks.map(c =>
      coalesce(sum(when(c.violation, 1L).otherwise(0L)), lit(0L)).as(c.name))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Per-check sample of offending rows (reference `validation/
    * validator.py:63-77` attaches failing examples to the report; pandera
    * calls them `failure_cases`). Returns check name → up to `n` offending
    * rows as JSON strings.
    *
    * Scale shape: ONE scan filtered to rows violating ANY check (the
    * disjunction prunes at the source), then a shuffle over only the
    * violating rows to take a deterministic top-N per check — sample cost
    * is proportional to the violation count, never the table. The
    * violated-check tags are computed once per row, not once per check.
    */
  def sampleFailures(df: DataFrame, checks: Seq[Check], n: Int = 5): Map[String, Seq[String]] = {
    require(checks.nonEmpty, "empty check suite")
    import org.apache.spark.sql.expressions.Window
    val offending = df.filter(checks.map(_.violation).reduce(_ || _))
    val tagged = offending.select(
      array_compact(array(checks.map(c =>
        when(c.violation, lit(c.name))): _*)).as("__checks"),
      to_json(struct(df.columns.map(col): _*)).as("__row"))
    tagged.select(explode(col("__checks")).as("check"), col("__row"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy("check").orderBy("__row")))
      .filter(col("__rn") <= n)
      .select("check", "__row")
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getString(1)).toSeq.sorted }
  }

  /** V2 — duplicate-key detection: keys occurring more than once. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).count().filter(col("count") > 1)

  /** V2 as a scalar: number of keys with duplicates. */
  def duplicateKeyCount(df: DataFrame, keys: Seq[String]): DataFrame =
    duplicateKeys(df, keys).agg(count(lit(1)).as(s"${keys.mkString("_")}_dup_keys"))

  /** V8 — referential integrity: child rows whose key has no parent
    * (dbt `relationships` test → left anti join). NULL child keys are
    * NOT orphans, matching dbt's semantics — a missing FK is NotNull's
    * violation (see trait doc), not a referential one; counting it here
    * would double-report. */
  def orphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    // renamed parent key avoids AMBIGUOUS_REFERENCE when both sides use
    // the same column name
    val keys = parent.select(col(parentKey).as("__parent_key")).distinct()
    child.filter(child(childKey).isNotNull)
      .join(keys, child(childKey) === col("__parent_key"), "left_anti")
  }

  /** V7 — row-count bounds (reference `pandera_public.py:132-135`). */
  def rowCountInBounds(df: DataFrame, lo: Long, hi: Long): DataFrame =
    df.agg(count(lit(1)).as("n_rows"))
      .select(col("n_rows"),
        (col("n_rows") >= lo && col("n_rows") <= hi).as("in_bounds"))

  /** V9 — proportion threshold (dbt_utils `not_null_proportion` shape,
    * reference `analytics/dbt/models/schema.yml`): fraction of rows
    * satisfying `predicate` must be ≥ `minProportion`. Returns one row
    * (n_rows, n_satisfied, proportion, passed). */
  def proportionAtLeast(df: DataFrame, predicate: Column,
      minProportion: Double): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      sum(when(predicate, 1L).otherwise(0L)).as("n_satisfied"))
      .select(col("n_rows"), col("n_satisfied"),
        (col("n_satisfied").cast("double") / col("n_rows").cast("double"))
          .as("proportion"),
        (col("n_satisfied").cast("double") / col("n_rows").cast("double")
          >= minProportion).as("passed"))

  /** V9 — recency (dbt_utils `recency`): max(tsCol) within `maxAgeDays`
    * of the injected anchor. */
  def recency(df: DataFrame, tsCol: String, anchor: Column,
      maxAgeDays: Int): DataFrame =
    df.agg(max(col(tsCol)).as("latest"))
      .select(col("latest"),
        (datediff(anchor.cast("date"), col("latest").cast("date")) <= maxAgeDays)
          .as("passed"))

  /** V10 — freshness lag in minutes against a reference instant
    * (reference `src/common/freshness.py:33-57`; the anchor is injected so
    * runs are deterministic, SURVEY §7.3 risk #2). */
  def freshnessLagMinutes(df: DataFrame, tsCol: String, anchor: Column): DataFrame =
    df.agg(max(col(tsCol)).as("latest"))
      .select(((anchor.cast("long") - col("latest").cast("long")) / 60L)
        .cast("long").as("lag_minutes"))
}
