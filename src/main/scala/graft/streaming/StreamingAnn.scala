package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Hnsw

/** Streaming ANN serving: a STREAM of query vectors answered from a
  * PERSISTED routed index — the retrieval-endpoint loop of a production
  * pipeline (queries arrive continuously; the index is the long-lived
  * state, exactly the reference's resident `Hnsw` object,
  * hnsw.cc:114-137, with the stream replacing the call site).
  *
  * Each micro-batch routes through the stored centroids (broadcast, C
  * rows) and probes only its nprobe cells' stored graphs — no k-means,
  * no graph construction, per-batch cost O(batch · nprobe). The
  * composition is `foreachBatch` because the cogroup search is a batch
  * plan; results are byte-identical to the batch
  * [[Hnsw.searchRoutedWithIndex]] over the same rows (spec-pinned).
  */
object StreamingAnn {

  /** Start serving `queries` — a streaming DataFrame with
    * `(query_id, query_vec)` — from the index at `indexDir`, handing
    * each answered micro-batch `(query_id, vec_id, dist)` to `sink`.
    */
  def serveQueries(queries: DataFrame, indexDir: String, k: Int, p: Hnsw.Params,
                   nprobe: Int)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(Hnsw.searchRoutedWithIndex(batch.sparkSession, indexDir,
          batch.toDF(), k, p, nprobe), batchId)
      }
      .start()
}
