package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog lives in [[Queries]]; each entry covers one or more
  * SURVEY.md §2 operators (the `operators` field names them) and carries a
  * DuckDB oracle SQL statement where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's richest pipeline shape: parse → event-time tumbling
    * window → sentiment aggregation (configmap:58-74).
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    Queries.all.find(_.name == "q_sentiment_window").get
      .spark(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
