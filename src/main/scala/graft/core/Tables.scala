package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * The reference stores documents in Crux (its own storage layer,
  * `/root/reference/src/dataworks/db/app_db.clj:19-26`); our storage layer is
  * columnar Parquet so Catalyst gets predicate pushdown + column pruning +
  * partition pruning for free (SURVEY.md §4). At 100 TB these reads are the
  * scan layer: filters/projections issued on the returned DataFrame reach the
  * parquet reader (verify via `.explain`'s PushedFilters/ReadSchema).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects by default (PARQUET_TYPE_ILLEGAL). Read the
    * physical long and truncate to microseconds — exactly what DuckDB does
    * natively (its TIMESTAMP is µs), so oracle comparisons line up. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** events with `ts` as the RAW nanosecond long. Time-range queries should
    * filter on this column — a predicate on the converted timestamp wraps
    * the column in `timestamp_micros(ts div 1000)` and parquet can't push
    * it; the equivalent raw-long comparison pushes to the scan (and prunes
    * row groups via min/max stats). */
  def eventsRawTs(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
