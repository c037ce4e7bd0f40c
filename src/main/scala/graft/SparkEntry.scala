package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's entries; `oracleSql` carries
  * the DuckDB-equivalent SQL for the hash-compare gate (keys without SQL get
  * a rows-only check). Column names are aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §2.2: grouped MAX + ordered presentation)
    * on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.queries("agg_groupby_max")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Windows.queries ++ ops.Fn.queries ++
      ops.Streaming.queries ++ ops.Text.queries ++ ops.Similarity.queries ++
      ops.Mr.queries ++ ops.IO.queries ++ ops.Multimodal.queries ++
      ops.Graph.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops → driver
    * records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.Windows.oracle ++ ops.Fn.oracle ++
      ops.Streaming.oracle ++ ops.Text.oracle ++ ops.Similarity.oracle ++
      ops.Mr.oracle ++ ops.IO.oracle ++ ops.Multimodal.oracle ++
      ops.Graph.oracle
}
