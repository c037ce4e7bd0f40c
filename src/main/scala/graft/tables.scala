package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver testdata star schema (TESTDATA.md).
  *
  * Every operator in the engine reads through here so that scan behavior is
  * uniform: columnar parquet scans, Catalyst-prunable, filter-pushdown-able.
  * At 100 TB these would be partitioned/bucketed external tables; the reader
  * API is identical, so nothing above this layer changes with scale.
  *
  * Reference equivalence: the reference's only "catalog" is a manifest file
  * mapping file name -> worker ports (`Master/master_handler.py:107-119`);
  * here the parquet footer + file listing is the manifest.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")

  /** `events.ts` has shipped in two testdata generations: parquet
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read as
    * long via `nanosAsLong` and truncate to micros) and native
    * TIMESTAMP(MICROS) without timezone (scanned as TIMESTAMP_NTZ).
    * Branch on the SCANNED type so either generation loads identically:
    * the NTZ micros are cast to the session-UTC instant type every
    * consumer already assumes — value-identical under the UTC session
    * timezone, and exactly the microsecond instants DuckDB sees when it
    * loads the same file.
    *
    * The legacy path requires `spark.sql.legacy.parquet.nanosAsLong=true`
    * at session construction (Verify/Bench/SparkSpec builders) — a loader
    * must never mutate session config as a plan-build side effect (racy
    * across concurrent queries, leaks into unrelated reads).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
