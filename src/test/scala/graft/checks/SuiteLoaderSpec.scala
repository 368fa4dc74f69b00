package graft.checks

import graft.SparkSpec
import graft.standards.Omop
import org.apache.spark.sql.functions._

class SuiteLoaderSpec extends SparkSpec {

  test("parses every supported expectation type from suite JSON") {
    val s = SuiteLoader.fromResource("graft/suites/person_suite.json")
    assert(s.name == "person_suite")
    assert(s.rowChecks.map(_.getClass.getSimpleName).sorted ==
      Seq("InRange", "InSet", "NotNull"))
    assert(s.uniqueColumns == Seq("person_id"))
    assert(s.columnsMustExist ==
      Seq("person_id", "year_of_birth", "gender_concept_id"))
    assert(s.rowCountBounds.contains((100L, 10000L)))
    // numeric value_set parsed as longs (GE kwargs carry numbers here)
    val inSet = s.rowChecks.collectFirst { case c: InSet => c }.get
    assert(inSet.allowed == Seq(8507L, 8532L, 8551L, 0L))
  }

  test("strict bounds: strict_max excludes the bound itself") {
    import spark.implicits._
    val suite = SuiteLoader.fromJson(
      """{"expectation_suite_name":"visits",
          "expectations":[{"expectation_type":"expect_column_values_to_be_between",
            "kwargs":{"column":"cost","min_value":0,"max_value":500,"strict_max":true}}]}""")
    val df = Seq(0.0, 499.99, 500.0, -1.0).toDF("cost")
    val r = SuiteLoader.evaluate(df, suite)
    // 500.0 (strict max) and -1.0 violate; 0 (inclusive min) passes
    assert(r.violations("cost_out_of_range") == 2L)
    assert(!r.passed)
  }

  test("unknown expectation type fails loudly, not silently") {
    intercept[IllegalArgumentException] {
      SuiteLoader.fromJson(
        """{"expectations":[{"expectation_type":"expect_quantiles_to_be_magic",
            "kwargs":{}}]}""")
    }
  }

  test("missing referenced column short-circuits instead of failing analysis") {
    import spark.implicits._
    val suite = SuiteLoader.fromJson(
      """{"expectations":[{"expectation_type":"expect_column_to_exist",
            "kwargs":{"column":"ghost"}}]}""")
    val r = SuiteLoader.evaluate(Seq(1).toDF("x"), suite)
    assert(r.missingColumns == Seq("ghost") && !r.passed)
  }

  test("explicit JSON null bounds mean unbounded, not zero") {
    import spark.implicits._
    // GE spells one-sided bounds as explicit null; NullNode.asDouble()=0
    // would flag every positive value
    val suite = SuiteLoader.fromJson(
      """{"expectations":[
           {"expectation_type":"expect_column_values_to_be_between",
            "kwargs":{"column":"v","min_value":null,"max_value":100}},
           {"expectation_type":"expect_table_row_count_to_be_between",
            "kwargs":{"min_value":1,"max_value":null}}]}""")
    val r = SuiteLoader.evaluate(Seq(-500.0, 50.0, 150.0).toDF("v"), suite)
    assert(r.violations("v_out_of_range") == 1L) // only 150 > 100
    assert(r.violations("row_count_out_of_bounds") == 0L)
  }

  test("length expectations gate BOTH bounds (min 1 = non-empty rule)") {
    import spark.implicits._
    val suite = SuiteLoader.fromJson(
      """{"expectations":[
           {"expectation_type":"expect_column_value_lengths_to_be_between",
            "kwargs":{"column":"id","min_value":1,"max_value":5}}]}""")
    val r = SuiteLoader.evaluate(Seq("", "ok", "toolong").toDF("id"), suite)
    assert(r.violations("id_too_short") == 1L)
    assert(r.violations("id_too_long") == 1L)
    assert(!r.passed)
    intercept[IllegalArgumentException] {
      SuiteLoader.fromJson(
        """{"expectations":[
             {"expectation_type":"expect_column_value_lengths_to_be_between",
              "kwargs":{"column":"id"}}]}""")
    }
  }

  test("two same-type rules on one column both gate (no name shadowing)") {
    import spark.implicits._
    val suite = SuiteLoader.fromJson(
      """{"expectations":[
           {"expectation_type":"expect_column_values_to_be_between",
            "kwargs":{"column":"age","min_value":0,"max_value":150}},
           {"expectation_type":"expect_column_values_to_be_between",
            "kwargs":{"column":"age","min_value":18,"max_value":65}}]}""")
    val r = SuiteLoader.evaluate(Seq(5.0, 40.0, 200.0).toDF("age"), suite)
    assert(r.violations("age_out_of_range") == 1L)   // 200 breaks [0,150]
    assert(r.violations("age_out_of_range_2") == 2L) // 5 and 200 break [18,65]
  }

  test("fractional value_set entries survive the parse") {
    import spark.implicits._
    val suite = SuiteLoader.fromJson(
      """{"expectations":[
           {"expectation_type":"expect_column_values_to_be_in_set",
            "kwargs":{"column":"dose","value_set":[0.5, 1.5]}}]}""")
    val r = SuiteLoader.evaluate(Seq(0.5, 1.5, 1.0).toDF("dose"), suite)
    assert(r.violations("dose_not_in_set") == 1L) // only 1.0 is outside
  }

  test("person_suite passes on the OMOP generator output and catches seeded damage") {
    val suite = SuiteLoader.fromResource("graft/suites/person_suite.json")
    val person = Omop.person(spark, 500, 42L)
    val good = SuiteLoader.evaluate(person, suite)
    assert(good.passed && good.nRows == 500)
    // duplicate person_id + out-of-range birth year both trip the suite
    val damaged = person.limit(1)
      .withColumn("year_of_birth", lit(1850L))
      .unionByName(person)
    val bad = SuiteLoader.evaluate(damaged, suite)
    assert(!bad.passed)
    assert(bad.violations("person_id_duplicate_keys") == 1L)
    assert(bad.violations("year_of_birth_out_of_range") == 1L)
  }
}
