package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the engine's canonical tables (Parquet at a scale-factor
  * directory). Columnar at rest; Catalyst prunes columns and pushes
  * predicates into these scans, so operators should `select`/`filter`
  * as early as possible and let the optimizer do the rest.
  *
  * Reference has no scan path at all (data synthesized in-process,
  * hnsw.cc:336-346, 446-456) — this is the Spark-native ingest surface.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")

  /** `events.ts` is physical parquet `timestamp[ns]`, which Spark 4 only
    * reads via the nanosAsLong legacy conf (as a Long of epoch nanos).
    * Normalized here to a microsecond TIMESTAMP_NTZ column so every
    * downstream operator (and the DuckDB oracle, which reads the same
    * file as TIMESTAMP_NS) sees identical wall-clock values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer `div` (not `/`, which goes through double and can lose µs)
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions
        .expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
}
