package graft.checks

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative check-suite loader for Great-Expectations-style JSON suite
  * documents (reference `great_expectations/expectations/visits_suite.json`,
  * `public_cdm_basic.json`; suites are created/loaded in
  * `validation/ge_expectations.py:47-96`). The reference declares DQ rules
  * as data, not code — this loader closes the same gap for the engine:
  * parse a suite document into the [[Check]] algebra, so the landing gate
  * and the red/green demo read the actual suite file.
  *
  * Row-predicate expectations compile to [[Check]]s and evaluate in the
  * usual ONE aggregation pass; table-level expectations (uniqueness,
  * row-count bounds) and schema-level ones (column existence) are carried
  * structurally and evaluated by their matching plan builders — uniqueness
  * is the only shuffling check, exactly as in hand-built suites.
  *
  * Supported `expectation_type`s (the set used by the reference's suites
  * plus the length/regex types its programmatic suites add):
  *  - expect_column_values_to_not_be_null        → [[NotNull]]
  *  - expect_column_values_to_be_in_set          → [[InSet]]
  *  - expect_column_values_to_be_between         → [[InRange]] (strict_min/strict_max honored)
  *  - expect_column_values_to_match_regex        → [[MatchesRegex]]
  *  - expect_column_value_lengths_to_be_between  → [[MinLength]] / [[MaxLength]] (both bounds gate)
  *  - expect_column_values_to_be_unique          → unique column (table-level)
  *  - expect_table_row_count_to_be_between       → row-count bounds (table-level)
  *  - expect_column_to_exist                     → column existence (schema-level)
  * An unknown expectation type fails loudly — a silently dropped rule is a
  * gate that stopped gating.
  */
object SuiteLoader {

  final case class Suite(
      name: String,
      rowChecks: Seq[Check],
      uniqueColumns: Seq[String],
      columnsMustExist: Seq[String],
      rowCountBounds: Option[(Long, Long)]) {

    /** Every column the suite references (for existence screening). */
    def referencedColumns: Seq[String] = {
      def colOf(c: Check): Option[String] = c match {
        case NotNull(c) => Some(c)
        case InSet(c, _) => Some(c)
        case InRange(c, _, _, _, _) => Some(c)
        case MaxLength(c, _) => Some(c)
        case MinLength(c, _) => Some(c)
        case MatchesRegex(c, _) => Some(c)
        case Renamed(inner, _) => colOf(inner)
        case _ => None
      }
      (columnsMustExist ++ uniqueColumns ++
        rowChecks.flatMap(colOf)).distinct
    }
  }

  final case class SuiteResult(
      suite: String, nRows: Long, violations: Map[String, Long],
      missingColumns: Seq[String]) {
    def passed: Boolean = missingColumns.isEmpty && violations.values.forall(_ == 0L)
  }

  def fromFile(path: String): Suite =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  /** Load a suite bundled as a classpath resource (the engine ships its
    * domain suites under `graft/suites/`). */
  def fromResource(resource: String): Suite = {
    val in = getClass.getClassLoader.getResourceAsStream(resource)
    require(in != null, s"suite resource not found: $resource")
    try fromJson(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  def fromJson(json: String): Suite = {
    val root = new ObjectMapper().readTree(json)
    val name = Option(root.get("expectation_suite_name"))
      .map(_.asText).getOrElse("unnamed_suite")
    val expectations = Option(root.get("expectations"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)

    val rowChecks = Seq.newBuilder[Check]
    val unique = Seq.newBuilder[String]
    val exists = Seq.newBuilder[String]
    var bounds: Option[(Long, Long)] = None

    expectations.foreach { e =>
      val kind = e.get("expectation_type").asText
      val kw = e.get("kwargs")
      def column = kw.get("column").asText
      // GE spells one-sided bounds as explicit JSON null ({"max_value":
      // null}); NullNode.asDouble() is 0.0, which would silently invert
      // the check — explicit null must mean ABSENT, not zero
      def opt(field: String): Option[JsonNode] =
        Option(kw.get(field)).filterNot(_.isNull)
      def num(field: String, default: Double): Double =
        opt(field).map(_.asDouble).getOrElse(default)
      def flag(field: String): Boolean =
        opt(field).exists(_.asBoolean)
      kind match {
        case "expect_column_values_to_not_be_null" =>
          rowChecks += NotNull(column)
        case "expect_column_values_to_be_in_set" =>
          // integral vs fractional must survive the parse: asLong on 0.5
          // would validate against a silently corrupted set
          val vs = kw.get("value_set").elements().asScala.map { v: JsonNode =>
            if (v.isIntegralNumber) (v.asLong: Any)
            else if (v.isNumber) (v.asDouble: Any)
            else (v.asText: Any)
          }.toSeq
          rowChecks += InSet(column, vs)
        case "expect_column_values_to_be_between" =>
          rowChecks += InRange(column,
            num("min_value", Double.NegativeInfinity),
            num("max_value", Double.PositiveInfinity),
            strictLo = flag("strict_min"), strictHi = flag("strict_max"))
        case "expect_column_values_to_match_regex" =>
          rowChecks += MatchesRegex(column, kw.get("regex").asText)
        case "expect_column_value_lengths_to_be_between" =>
          // both bounds gate; a length rule with neither is malformed
          val lo = opt("min_value").map(_.asInt)
          val hi = opt("max_value").map(_.asInt)
          require(lo.nonEmpty || hi.nonEmpty,
            s"length expectation on '$column' carries no bounds in suite '$name'")
          lo.foreach(l => rowChecks += MinLength(column, l))
          hi.foreach(h => rowChecks += MaxLength(column, h))
        case "expect_column_values_to_be_unique" =>
          unique += column
        case "expect_table_row_count_to_be_between" =>
          bounds = Some((
            opt("min_value").map(_.asLong).getOrElse(0L),
            opt("max_value").map(_.asLong).getOrElse(Long.MaxValue)))
        case "expect_column_to_exist" =>
          exists += column
        case other =>
          throw new IllegalArgumentException(
            s"unsupported expectation_type '$other' in suite '$name'")
      }
    }
    // two same-type rules on one column derive the same report-column
    // name; a duplicate alias would make one count silently shadow the
    // other in the aggregation row — number later duplicates instead
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val deduped = rowChecks.result().map { c =>
      val n = seen.updateWith(c.name)(x => Some(x.getOrElse(0) + 1)).get
      if (n == 1) c else Renamed(c, s"${c.name}_$n")
    }
    Suite(name, deduped, unique.result().distinct,
      exists.result().distinct, bounds)
  }

  /** Evaluate a loaded suite against a frame. Missing referenced columns
    * short-circuit (their checks cannot be planned); otherwise the row
    * checks run as one aggregation pass (with the row count folded in),
    * each unique column adds its group-by, and the row-count bound reuses
    * the already-computed count — no extra scan. */
  def evaluate(df: DataFrame, suite: Suite): SuiteResult = {
    val missing = suite.referencedColumns.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      return SuiteResult(suite.name, -1L, Map.empty, missing)

    val row = Checks.evaluateWithCount(df, suite.rowChecks).collect()(0)
    val nRows = row.getAs[Long]("n_rows")
    val rowViolations =
      suite.rowChecks.map(c => c.name -> row.getAs[Long](c.name)).toMap
    val uniqueViolations = suite.uniqueColumns.map { c =>
      s"${c}_duplicate_keys" ->
        Checks.duplicateKeyCount(df, Seq(c)).collect()(0).getLong(0)
    }.toMap
    val boundViolation = suite.rowCountBounds.map { case (lo, hi) =>
      "row_count_out_of_bounds" -> (if (nRows >= lo && nRows <= hi) 0L else 1L)
    }.toMap
    SuiteResult(suite.name, nRows,
      rowViolations ++ uniqueViolations ++ boundViolation, Seq.empty)
  }
}
