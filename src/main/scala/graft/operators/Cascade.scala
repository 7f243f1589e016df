package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Multi-tier serving cascade — the production funnel the compressed
  * tiers exist for, composed end-to-end:
  *
  *   1-bit signatures (XOR+popcount, d/8 bytes/row)  → shortlist l1
  *   SQ8 affine ADC over ONLY those l1 rows          → shortlist l2
  *   exact L2 over ONLY those l2 raw rows            → final top-k
  *
  * Each stage reads strictly less data per candidate than the next
  * stage pays per row, so the expensive arithmetic touches a
  * geometrically shrinking candidate set: at 100 TB the Hamming pass
  * is the only corpus-wide scan (and the smallest possible one —
  * 32× under raw), SQ8 reads l1 code rows, the exact stage reads l2
  * raw rows. Every stage is deterministic with ties broken by vec_id,
  * so the WHOLE cascade — not just the final answer — oracle-checks
  * against a three-CTE SQL mirror.
  */
object Cascade {

  /** Serve one query through the binary → SQ8 → exact funnel.
    *
    * @param binDir [[Binary.ensureEncoded]] signature table
    * @param sqDir  [[Sq.ensureEncoded]] flat SQ8 code table
    * @param l1     Hamming shortlist size (corpus-wide scan output)
    * @param l2     SQ8 shortlist size (exact-read budget)
    */
  def topK(spark: SparkSession, binDir: String, sqDir: String,
           embeddings: DataFrame, queries: DataFrame, k: Int,
           l1: Int, l2: Int, roundTo: Int = 6,
           excluded: Option[DataFrame] = None): DataFrame = {
    require(l1 >= l2 && l2 >= k, s"funnel must narrow: l1=$l1 >= l2=$l2 >= k=$k")
    // stage 1: 1-bit Hamming shortlist — l1 ids to the driver (id-
    // pushdown formation, the rerank contract; tombstones drop here,
    // the widest gate, so they reach neither later stage)
    val ids1 = Binary.hammingTopK(spark, binDir, queries, l1, excluded)
      .select("vec_id").collect().map(_.getLong(0))
    // stage 2: SQ8 ADC over ONLY the l1 surviving code rows
    val ids2 = Sq.adcTopKStored(spark, sqDir, queries, l2, roundTo,
        predicate = Some(col("vec_id").isin(ids1.map(Long.box): _*)))
      .select("vec_id").collect().map(_.getLong(0))
    // stage 3: exact L2 over ONLY the l2 raw rows
    embeddings.filter(col("vec_id").isin(ids2.map(Long.box): _*))
      .crossJoin(broadcast(queries))
      .select(col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), roundTo).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }
}
