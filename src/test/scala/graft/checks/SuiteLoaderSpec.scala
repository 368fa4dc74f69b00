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
