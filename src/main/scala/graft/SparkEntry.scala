package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{Extended, Relational, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family from SURVEY.md §2 (and the beyond-reference
  * training-data ops) is exposed as a named query over the testdata tables,
  * with a DuckDB-runnable ANSI oracle where SQL-expressible.
  */
object SparkEntry {

  private def suites: Seq[Relational.Q] = Relational.all ++ TrainingData.all ++ Extended.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    graft.warehouse.Warehouse.registerTestdata(spark, "/root/testdata/sf0.001")
    spark.sql(Relational.sqlQ3)
  }

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * CACHE CONTRACT: a few queries persist a query-level intermediate
    * (MEMORY_AND_DISK) that the returned plan still references — q120's
    * and q126's scored/vocabulary projections — so they cannot unpersist
    * before returning. Harnesses that run many queries on one session
    * (Verify, Bench) call `spark.catalog.clearCache()` between queries;
    * a long-lived session composing query fns should do the same (or
    * unpersist after consuming each result) or those entries accumulate,
    * one corpus-sized cache entry per invocation. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    suites.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
