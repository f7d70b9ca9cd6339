package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference README's first query shape (filter → top-k →
    * select), re-expressed on the driver's lineitem table.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.TextVector.queries ++
    graft.queries.Events.queries ++
    graft.queries.CoreLib.queries ++
    graft.queries.Corpus.queries ++
    graft.queries.Production.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
    graft.queries.TextVector.oracle ++
    graft.queries.Events.oracle ++
    graft.queries.CoreLib.oracle ++
    graft.queries.Corpus.oracle ++
    graft.queries.Production.oracle // empty: rows-only by design
}
