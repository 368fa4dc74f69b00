package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared as a named query
  * over the driver testdata plus (where ANSI-SQL-expressible) a DuckDB
  * oracle. Query families live in `graft.queries`; the engine library itself
  * is under `graft.{io,checks,standards,warehouse,analytics,stats,ml,
  * privacy,dedup,text,similarity,streaming}`.
  */
object SparkEntry {

  private def families: Seq[Q] =
    ScanProjectQueries.all ++
      JoinQueries.all ++
      AggQueries.all ++
      WindowSortQueries.all ++
      ScalarQueries.all ++
      DqQueries.all ++
      EventQueries.all ++
      TextQueries.all ++
      CorpusQueries.all ++
      EmbeddingQueries.all ++
      ClinicalQueries.all ++
      OmopQueries.all ++
      SinkSqlQueries.all ++
      LakehouseQueries.all ++
      ConnectorQueries.all ++
      PrivacyMiscQueries.all ++
      TimeJoinQueries.all ++
      GraphQueries.all ++
      TpchQueries.all ++
      MvQueries.all ++
      StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    JoinQueries.all.find(_.name == "j1_star_join_broadcast").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
