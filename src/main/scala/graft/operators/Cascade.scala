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
    // ONE logical plan end to end: each stage's survivors gate the next
    // tier through a broadcast LEFT SEMI join (the topKBatch shape) —
    // no driver collects, no O(l1) In-literal plans. Tombstones drop at
    // stage 1, the widest gate, so they reach neither later stage.
    val c1 = Binary.hammingTopK(spark, binDir, queries, l1, excluded)
      .select("vec_id")
    // stage 2: SQ8 ADC over ONLY the l1 surviving code rows
    val c2 = Sq.adcTopKStored(spark, sqDir, queries, l2, roundTo,
        candidates = Some(c1))
      .select("vec_id")
    // stage 3: exact L2 over ONLY the l2 raw rows
    embeddings.join(broadcast(c2), Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(queries))
      .select(col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), roundTo).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** Fully DECLARATIVE single-query funnel over the raw vector table —
    * signatures and SQ8 codes computed in-plan (no persisted layouts),
    * stage gates expressed as `limit` + semi-joins instead of driver
    * collects: one logical plan end to end, so the funnel is usable as
    * a SQL TVF (`cascade_topk`) and inside larger plans. Semantics are
    * identical to [[topK]] over layouts encoded with the same
    * thresholds/bounds (CascadeSpec pins the equality); the persisted
    * forms remain the serving path — this form re-encodes per query.
    */
  def topKFlat(emb: DataFrame, queries: DataFrame, k: Int, l1: Int, l2: Int,
               roundTo: Int = 6): DataFrame = {
    require(l1 >= l2 && l2 >= k, s"funnel must narrow: l1=$l1 >= l2=$l2 >= k=$k")
    // single-query form: a multi-row queries frame would silently mix
    // every query's signature/LUT into one shortlist and return a
    // meaningless top-k — fail loudly (the batch form covers Q > 1).
    // take(2) collects the query side ONCE and the row is reused for
    // every downstream broadcast, so the arity guard costs no extra
    // action on the hot serving path (it replaces three re-evaluations
    // of the queries plan with one localized row).
    val qSchema = queries.select(col("query_vec")).schema
    val qRows = queries.select(col("query_vec")).take(2)
    require(qRows.length == 1,
      "topKFlat serves exactly one query row; use topKBatch for Q > 1")
    val queriesLocal = emb.sparkSession.createDataFrame(
      java.util.Arrays.asList(qRows(0)), qSchema)
    val thr = Binary.thresholds(emb)
    val words = (thr.length + Binary.BitsPerWord - 1) / Binary.BitsPerWord
    val (lo, hi) = Sq.bounds(emb)
    val qluts = Pq.withLuts(
      queriesLocal.select(lit(0L).as("query_id"), col("query_vec")),
      Sq.affineBooks(lo, hi))
    val qsig = queriesLocal.select(Binary.signatureCol(col("query_vec"), thr).as("qsig"))
    val c1 = emb
      .select(col("vec_id"), Binary.signatureCol(col("embedding"), thr).as("sig"))
      .crossJoin(broadcast(qsig))
      .select(col("vec_id"), Binary.hammingCol(col("sig"), col("qsig"), words).as("hamming"))
      .orderBy(col("hamming"), col("vec_id")).limit(l1)
      .select("vec_id")
    val c2 = emb.join(broadcast(c1), Seq("vec_id"))
      .select(col("vec_id"), Sq.encodeCol(col("embedding"), lo, hi).as("codes"))
      .crossJoin(broadcast(qluts))
      .select(col("vec_id"), Pq.adcDistBatch(lo.length, 256, roundTo).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(l2)
      .select("vec_id")
    emb.join(broadcast(c2), Seq("vec_id"))
      .crossJoin(broadcast(queriesLocal))
      .select(col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), roundTo).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** BATCH funnel: Q queries, ONE scan per tier, no driver round-trips
    * — each stage's survivors meet the next tier's table through a
    * broadcast join on (query_id, vec_id), and the bounded-heap
    * aggregate ranks per query at every gate. The amortized serving
    * shape: Q·l1 signature survivors gate the code scan, Q·l2 code
    * survivors gate the raw read.
    */
  def topKBatch(spark: SparkSession, binDir: String, sqDir: String,
                embeddings: DataFrame, queries: DataFrame, k: Int,
                l1: Int, l2: Int, roundTo: Int = 6,
                exactSums: Boolean = true,
                excluded: Option[DataFrame] = None): DataFrame = {
    require(l1 >= l2 && l2 >= k, s"funnel must narrow: l1=$l1 >= l2=$l2 >= k=$k")
    val c1 = Binary.hammingTopKBatch(spark, binDir, queries, l1, excluded)
      .select(col("query_id"), col("vec_id"))
    val (lo, hi) = Sq.readBounds(spark, sqDir)
    val books = Sq.affineBooks(lo, hi)
    val d = lo.length
    val adc = if (exactSums) Pq.adcDistBatch(d, 256, roundTo)
              else Pq.adcDistBatchDouble(d, 256, roundTo)
    val scored2 = spark.read.parquet(sqDir)
      .join(broadcast(c1), Seq("vec_id"))
      .join(broadcast(Pq.withLuts(queries, books)), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), adc.as("dist"))
    val c2 = Ivf.heapTopKPerQuery(scored2, l2, "dist")
      .select(col("query_id"), col("vec_id"))
    val scored3 = embeddings
      .join(broadcast(c2), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(l2Distance(col("embedding"), col("query_vec")), roundTo).as("dist"))
    Ivf.heapTopKPerQuery(scored3, k, "dist")
  }
}
