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

  /** Auto-recluster policy for the [[maintainIvf]] family: after each
    * micro-batch append, if the layout's cell skew has crossed
    * `maxSkew` ([[graft.operators.Ivf.needsRecluster]]), retrain
    * centroids from the layout's own live rows
    * ([[graft.operators.Ivf.retrainCentroids]] — hash-spread seeds +
    * `iters` Lloyd rounds) and [[graft.operators.Ivf
    * .reclusterPartitioned]] BEFORE the next batch. The recluster
    * publishes one atomic snapshot generation with its
    * generation-scoped centroids, so concurrent readers mid-stream see
    * either the old layout with old routing or the new with new —
    * never a torn mix. `c = 0` keeps the layout's current centroid
    * count. The skew check costs one narrow `(vec_id, cell)` scan per
    * batch; the recluster itself is full-layout I/O and fires only on
    * drift.
    */
  final case class ReclusterPolicy(maxSkew: Double = 4.0, c: Int = 0, iters: Int = 1)

  private def maybeRecluster(spark: org.apache.spark.sql.SparkSession,
                             layoutDir: String,
                             policy: Option[ReclusterPolicy]): Unit =
    policy.foreach { pol =>
      if (graft.operators.Ivf.needsRecluster(spark, layoutDir, pol.maxSkew)) {
        val c = if (pol.c > 0) pol.c
          else graft.operators.Ivf.centroidsOf(spark, layoutDir).count().toInt
        graft.operators.Ivf.reclusterPartitioned(spark, layoutDir,
          graft.operators.Ivf.retrainCentroids(spark, layoutDir, c, pol.iters))
      }
    }

  /** Start serving `queries` — a streaming DataFrame with
    * `(query_id, query_vec)` — from the index at `indexDir`, handing
    * each answered micro-batch `(query_id, vec_id, dist)` to `sink`.
    *
    * The `_deletes` tombstone sidecar is consulted PER MICRO-BATCH
    * ([[Hnsw.searchRoutedWithIndexDeletes]]): a takedown recorded while
    * the stream runs is excluded from every subsequent batch's results
    * with no restart and no index rewrite — the serving-tier contract
    * that makes takedowns immediate. With no sidecar the behavior (and
    * plan) is the plain routed serve, byte-identical to batch serving
    * (spec-pinned).
    */
  def serveQueries(queries: DataFrame, indexDir: String, k: Int, p: Hnsw.Params,
                   nprobe: Int)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(Hnsw.searchRoutedWithIndexDeletes(batch.sparkSession, indexDir,
          batch.toDF(), k, p, nprobe), batchId)
      }
      .start()

  /** Streaming index MAINTENANCE: a stream of new vectors
    * `(vec_id, embedding)` appended into a generational HNSW index at
    * `indexDir` — each micro-batch runs the incremental insert
    * ([[Hnsw.insertInto]]: only affected shards rebuild) and publishes
    * an immutable new generation, so concurrent readers keep serving
    * the previous one. The daily/streaming-append half of a production
    * retrieval pipeline; [[serveQueries]] is the query half.
    */
  def maintainIndex(newVectors: DataFrame, indexDir: String,
                    p: Hnsw.Params): StreamingQuery =
    newVectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Hnsw.appendGeneration(batch.toDF(), indexDir, p)
      }
      .start()

  /** Streaming maintenance of a persisted ROUTED (cell-sharded) HNSW
    * index: each micro-batch routes onto the layout's current serving
    * centroids and rebuilds ONLY the receiving cells
    * ([[Hnsw.insertIntoRouted]]), published as one atomic snapshot
    * generation — concurrent [[serveQueries]] readers keep a
    * consistent (nodes, edges, centroids) triple through every flip.
    * With a `recluster` policy, after each append the routed skew
    * trigger ([[Hnsw.needsReclusterRouted]]) may fire a retrain from
    * the layout's own rows ([[Hnsw.retrainCentroidsRouted]]) +
    * [[Hnsw.reclusterRouted]] BEFORE the next batch — the routed twin
    * of [[maintainIvf]]'s drift repair.
    */
  def maintainRouted(newVectors: DataFrame, indexDir: String, p: Hnsw.Params,
                     replication: Int = 2,
                     recluster: Option[ReclusterPolicy] = None): StreamingQuery =
    newVectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        Hnsw.insertIntoRouted(spark, indexDir, batch.toDF(), p, replication)
        recluster.foreach { pol =>
          if (Hnsw.needsReclusterRouted(spark, indexDir, pol.maxSkew)) {
            val c = if (pol.c > 0) pol.c
              else Hnsw.routedCentroidsOf(spark, indexDir).count().toInt
            Hnsw.reclusterRouted(spark, indexDir,
              Hnsw.retrainCentroidsRouted(spark, indexDir, c, pol.iters),
              p, replication)
          }
        }
      }
      .start()

  /** Streaming maintenance of a cell-partitioned IVF layout: each
    * micro-batch of `(vec_id, embedding)` rows appends cell-locally
    * through [[graft.operators.Ivf.insertInto]] — assignment against
    * the layout's frozen `_centroids` sidecar, only the receiving
    * `cell=` subtrees gain files, so per-batch I/O is O(batch) and the
    * probe scan of concurrent readers picks each appended file up as
    * it lands (Parquet is immutable-file append — readers never see a
    * torn row). The flat-layout twin of [[maintainIndex]]: no graph to
    * rebuild means no generation swap is needed; a streamed layout is
    * IDENTICAL to a batch-built one (StreamingMultimodalSpec pins
    * serving equality).
    */
  def maintainIvf(newVectors: DataFrame, layoutDir: String,
                  recluster: Option[ReclusterPolicy] = None): StreamingQuery =
    newVectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.operators.Ivf.insertInto(batch.sparkSession, layoutDir, batch.toDF())
        maybeRecluster(batch.sparkSession, layoutDir, recluster)
      }
      .start()

  /** [[maintainIvf]] for a COSINE layout: each micro-batch
    * unit-normalizes (the layout's own transform) before the
    * cell-local append ([[graft.operators.Ivf.insertIntoCosine]]);
    * the kind guard rejects a mis-wired plain/MIPS dir on the FIRST
    * batch instead of silently drifting the schema.
    */
  def maintainIvfCosine(newVectors: DataFrame, layoutDir: String,
                        recluster: Option[ReclusterPolicy] = None): StreamingQuery =
    newVectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.operators.Ivf.insertIntoCosine(batch.sparkSession, layoutDir, batch.toDF())
        maybeRecluster(batch.sparkSession, layoutDir, recluster)
      }
      .start()

  /** [[maintainIvf]] for a MIPS layout: each micro-batch augments with
    * the layout's RECORDED `_graft_maxnorm` build constant
    * ([[graft.operators.Ivf.insertIntoMips]] — a larger-norm arrival
    * clamps its extra coordinate; served dots stay exact).
    */
  def maintainIvfMips(newVectors: DataFrame, layoutDir: String,
                      recluster: Option[ReclusterPolicy] = None): StreamingQuery =
    newVectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.operators.Ivf.insertIntoMips(batch.sparkSession, layoutDir, batch.toDF())
        maybeRecluster(batch.sparkSession, layoutDir, recluster)
      }
      .start()

  /** Streaming maintenance of an IVF-SQ8 code layout: each micro-batch
    * encodes with the frozen `_bounds` (out-of-range components clamp —
    * the documented drift posture), assigns with the frozen
    * `_centroids`, and appends cell-locally ([[graft.operators.Sq.insertInto]]).
    * The compressed-tier member of the [[maintainIvf]] family.
    */
  def maintainSq(newVectors: DataFrame, layoutDir: String): StreamingQuery =
    newVectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.operators.Sq.insertInto(batch.sparkSession, layoutDir, batch.toDF())
      }
      .start()

  /** Streaming maintenance of a binary signature table: each
    * micro-batch encodes with the frozen `_thresholds` and appends
    * ([[graft.operators.Binary.insertInto]]) — the funnel's widest gate
    * grows with the corpus, no rebuild.
    */
  def maintainBinary(newVectors: DataFrame, layoutDir: String): StreamingQuery =
    newVectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.operators.Binary.insertInto(batch.sparkSession, layoutDir, batch.toDF())
      }
      .start()

  /** Streaming maintenance of a plain IVF-PQ code layout: each
    * micro-batch encodes with the frozen `_codebooks`, assigns with the
    * frozen `_centroids`, and appends cell-locally
    * ([[graft.operators.Pq.insertInto]]) — completing the
    * [[maintainIvf]] family on the compressed tier (the kind guard
    * rejects a residual layout on the first batch).
    */
  def maintainPq(newVectors: DataFrame, layoutDir: String,
                 m: Int, subDim: Int): StreamingQuery =
    newVectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.operators.Pq.insertInto(batch.sparkSession, layoutDir, batch.toDF(),
          m, subDim)
      }
      .start()

  /** Streaming maintenance of a RESIDUAL IVF-PQ code layout: each
    * micro-batch assigns with the frozen `_centroids`, encodes its
    * residuals x − centroid(cell) with the frozen residual-trained
    * `_codebooks`, and appends cell-locally
    * ([[graft.operators.Pq.insertIntoResidual]]; the `pq_residual`
    * kind guard rejects a plain code dir on the first batch).
    */
  def maintainResidual(newVectors: DataFrame, layoutDir: String): StreamingQuery =
    newVectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.operators.Pq.insertIntoResidual(batch.sparkSession, layoutDir, batch.toDF())
      }
      .start()
}
