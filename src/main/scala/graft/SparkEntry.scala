package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Knn
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query takes (spark, sfDir), reads only driver-provided
  * Parquet, and aliases every computed column identically to its
  * `oracleSql` counterpart (the driver's compare sorts columns by name
  * before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_knn_topk")(spark, "/root/testdata/sf0.001")

  // The fixed single-query protocol: the stored vector of vec_id=0,
  // perturbed per the reference's RgbTest (hnsw.cc:352-356).
  private def queryVecOf(emb: DataFrame, id: Long) =
    emb.filter(col("vec_id") === id).select(perturbQuery(col("embedding")).as("query_vec"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- vector: distance + exact kNN (hnsw.cc:74-83, 276-285) ----
    "q_l2_distance" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      emb.crossJoin(broadcast(queryVecOf(emb, 0)))
        .select(col("vec_id"), round(l2Distance(col("embedding"), col("query_vec")), 6).as("dist"))
    }),
    "q_knn_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Knn.topK(emb.crossJoin(broadcast(queryVecOf(emb, 0))), col("query_vec"), 10)
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_l2_distance" ->
      """SELECT vec_id, round(list_distance(embedding::DOUBLE[], q.query_vec), 6) AS dist
         FROM embeddings, (SELECT [CAST(embedding[1] AS DOUBLE)+1.0, CAST(embedding[2] AS DOUBLE)-1.0]
                                  || list_transform(embedding[3:], x -> CAST(x AS DOUBLE)) AS query_vec
                           FROM embeddings WHERE vec_id=0) q""",
    "q_knn_topk" ->
      """SELECT vec_id, round(list_distance(embedding::DOUBLE[], q.query_vec), 6) AS dist
         FROM embeddings, (SELECT [CAST(embedding[1] AS DOUBLE)+1.0, CAST(embedding[2] AS DOUBLE)-1.0]
                                  || list_transform(embedding[3:], x -> CAST(x AS DOUBLE)) AS query_vec
                           FROM embeddings WHERE vec_id=0) q
         ORDER BY dist, vec_id LIMIT 10""",
  )
}
