package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Exact k-nearest-neighbor operators — the semantic contract of the
  * reference's `Hnsw::FindNearest` (hnsw.cc:276-285), made distributed.
  *
  * Physical shapes (SURVEY.md §3.1):
  *  - single query: `orderBy(dist, id).limit(k)` plans as
  *    `TakeOrderedAndProject` — per-partition heap top-k, final top-k on
  *    the driver. This is exactly the reference's priority-queue
  *    truncation (hnsw.cc:266-273) but partition-parallel: at 100 TB,
  *    each task ships only k rows to the driver.
  *  - query batch: broadcast the (small) query side into a nested-loop
  *    join, then per-query top-k via a row_number window; the scored
  *    product shuffles once on query_id. For huge query sets the ANN
  *    paths (Hnsw.searchTopK / Ivf.topK) replace the window entirely.
  *
  * Distances are rounded where declared (oracle hashing), raw where
  * composed further.
  */
object Knn {

  /** Exact top-k for a single query vector. `embeddings(idCol, vecCol)`.
    * Tie-break on id (top-k ties are real at small scale).
    */
  def topK(embeddings: DataFrame, queryVec: Column, k: Int,
           idCol: String = "vec_id", vecCol: String = "embedding",
           roundTo: Int = 6): DataFrame =
    embeddings
      .select(col(idCol), round(l2Distance(col(vecCol), queryVec), roundTo).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)

  /** Exact per-query top-k for a batch of queries.
    * `queries(queryIdCol, queryVecCol)` is expected to be small enough to
    * broadcast (the scored product is |emb| × |q|; callers cap |q|).
    */
  def topKBatch(embeddings: DataFrame, queries: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding",
                queryIdCol: String = "query_id", queryVecCol: String = "query_vec",
                roundTo: Int = 6): DataFrame = {
    val scored = embeddings.crossJoin(broadcast(queries))
      .select(
        col(queryIdCol),
        col(idCol),
        round(l2Distance(col(vecCol), col(queryVecCol)), roundTo).as("dist"))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("dist"), col(idCol))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Brute-force cosine top-k (similarity search baseline over an
    * embedding column). Highest similarity first.
    */
  def cosineTopK(embeddings: DataFrame, queryVec: Column, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 roundTo: Int = 6): DataFrame =
    embeddings
      .select(col(idCol), round(cosineSimilarity(col(vecCol), queryVec), roundTo).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
}
