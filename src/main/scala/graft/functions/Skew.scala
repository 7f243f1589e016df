package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation. When one grouping key
  * carries a disproportionate share of rows (a hot user, a stop-word),
  * the single reducer for that key becomes the straggler. Salting
  * splits each key into `buckets` sub-keys for a partial aggregate,
  * then combines partials in a second (tiny) aggregate keyed by the
  * true key — the hot key's work spreads over `buckets` reducers.
  *
  * AQE's skew-join handling covers joins; this utility covers
  * aggregations, where decomposable measures (sum/count/min/max) make
  * the two-phase split exact. The salt derives from a caller-provided
  * unique column via the portable hash — deterministic, no RNG.
  */
object Skew {

  /** Exact salted sum+count per key. `uniqueCol` seeds the salt (any
    * high-cardinality column — a row id). The sum accumulates in
    * DECIMAL(38,12) (Portable's determinism rule): a raw double sum
    * would differ from a direct groupBy in the last ulps because the
    * two-phase plan adds in a different order. Output `sum_value` is
    * the rounded double, identical to `Portable.dsumRounded` directly.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
                     uniqueCol: Column, buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df
      .withColumn("_salt", pmod(Portable.md5Int(uniqueCol.cast("string")), lit(buckets)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(
        Portable.dsum(valueCol).as("_psum"),
        count(lit(1)).as("_pcnt"))
      .groupBy(keyCols: _*)
      .agg(
        round(sum("_psum").cast("double"), 6).as("sum_value"),
        sum("_pcnt").as("n_rows"))
  }

  /** Salted INNER equi-join for a skewed fact side. A plain shuffled
    * join lands every row of a hot key on ONE reducer; salting splits
    * the fact side into `buckets` sub-keys and replicates each
    * dimension row once per bucket, so the join key becomes
    * (key, salt) and the hot key's probe work spreads over `buckets`
    * reducers. EXACT: a fact row joins only its own salt's dimension
    * copy, so each matching (fact, dim) pair is produced exactly once
    * — salting must be invisible in the result (the oracle is the
    * plain join).
    *
    * When the dimension is broadcastable there is no shuffle to skew
    * and this is pure overhead — the technique targets the mid-size
    * dimension (too big to broadcast, small enough that ×buckets
    * replication is cheap) with a power-law fact key. AQE's skew-join
    * split covers sort-merge joins adaptively at runtime; the explicit
    * salt covers what AQE can't: skew materializing mid-stage, and
    * aggregation-above-join pipelines where the salt can ride into the
    * downstream groupBy ([[saltedSumCount]]'s two-phase shape).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 uniqueCol: Column, buckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(Portable.md5Int(uniqueCol.cast("string")), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** PRE-FAN-OUT SPREAD: widen `df` to at least the cluster's core
    * count before a stage whose per-row work dwarfs its input bytes —
    * a big generator fan-out (covariance's d²/2 pair explode, an N×
    * cross product) or per-row crypto/codec work (md5 per gram).
    * Partition sizing must follow the GENERATED volume, not the scan
    * bytes: a small single-file scan otherwise serializes the whole
    * downstream sweep into one task. Conditional on the CURRENT
    * partition count so it only ever WIDENS — on a real cluster where
    * the scan already yields ≥ cores partitions this is a no-op (no
    * shuffle added); results are invariant because every caller's
    * downstream arithmetic is partition-order independent (decimal
    * sums, hashes, per-row projections).
    */
  def spreadToCores(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Width probe WITHOUT materializing an RDD (df.rdd would force a
    // plan→RDD conversion per call and read a pre-AQE count anyway):
    // estimate the scan's partition count from the optimizer's size
    // statistics against the file-split size — the same arithmetic the
    // file source uses to split. Unknown stats (sizeInBytes at the
    // conf's defaultSizeInBytes ceiling) read as "already wide": the
    // cluster-scale default where adding a shuffle is the only way to
    // be wrong.
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Stats at the defaultSizeInBytes ceiling mean UNKNOWN, not wide —
    // for those (rare: non-file relations, some post-transform plans)
    // fall back to the physical RDD's partition count. The conversion
    // costs one plan→RDD translation, paid only on the unknown path;
    // the common file-scan path stays stats-only.
    val estParts =
      if (size >= BigInt(spark.sessionState.conf.defaultSizeInBytes))
        BigInt(df.rdd.getNumPartitions)
      else size / maxPart + 1
    if (estParts >= target) df else df.repartition(target)
  }
}
