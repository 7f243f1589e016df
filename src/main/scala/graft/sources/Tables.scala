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

  /** `events.ts` normalized to a microsecond TIMESTAMP_NTZ column so
    * every downstream operator (and the DuckDB oracle, reading the
    * same file) sees identical wall-clock values — robust to the two
    * physical encodings the generator has produced: parquet
    * `timestamp[ns]` (which Spark 4 only reads via the nanosAsLong
    * legacy conf, as a Long of epoch nanos) and plain `timestamp[us]`
    * (read natively as TIMESTAMP_NTZ).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    val norm = df.schema("ts").dataType match {
      // integer `div` (not `/`, which goes through double and can lose µs)
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions
          .expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
      case _ =>
        org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz")
    }
    df.withColumn("ts", norm)
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
}
