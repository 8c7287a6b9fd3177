package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.parquet` carries an INT64 TIMESTAMP(NANOS) column which Spark's
  * parquet reader rejects by default; we read it as raw epoch-nanosecond
  * longs (`spark.sql.legacy.parquet.nanosAsLong`). That is also the shape
  * the reference pipeline works with: `updated_at` is an epoch-nanoseconds
  * integer divided by 1e9 at the edge (reference `src/main.py:126-128`), so
  * all nanosecond→timestamp conversion goes through
  * [[graft.functions.TimeFns.nanosToTimestamp]].
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
