package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextAnalysis

/** Streaming INGESTION form of the curation pipeline
  * ([[graft.operators.CorpusPipeline]]): the narrow per-document
  * stages — language ID, quality scoring, exact content dedup — run on
  * the stream as documents arrive; the pair-generating near-dup stages
  * stay batch (they need corpus-wide joins). This is the standard
  * production split: cheap per-doc classification + exact dedup at
  * ingestion, expensive cross-doc dedup as scheduled batch compaction
  * over the ingested table.
  *
  * Scale shape: the filters are pure columns (no state at all); the
  * exact dedup keeps ONE md5 per distinct surviving text inside the
  * watermark horizon (`dropDuplicatesWithinWatermark`), so state is
  * bounded by arrival rate × watermark, never by corpus size. A
  * duplicate arriving after the horizon is the compaction job's to
  * remove — the same contract as every at-ingestion dedup tier.
  */
object StreamingCuration {

  /** Filter + exact-dedup a document stream (columns `ts, doc_id,
    * text, n_chars` at minimum). Language/quality semantics are
    * IDENTICAL to the batch [[graft.operators.CorpusPipeline.filtered]]
    * (same classifier columns over one tokenization); the dedup keeps
    * the first in-watermark arrival per md5(text).
    *
    * The full curation stage set composes in: `blocklist` prepends the
    * URL/domain provenance gate ([[TextAnalysis.blockedCol]] — drop
    * docs linking a blocked domain) and `redactPii = true` slots PII
    * redaction between the quality filter and the dedup (the batch
    * [[graft.operators.CorpusPipeline.curatedDocs]] stage order, so
    * dedup keys on the REDACTED bytes and documents differing only in
    * their PII still collapse). `gopher = true` adds the
    * [[TextAnalysis.gopherRules]] composite cut beside the quality
    * score (same signals, same thresholds as the batch operator). All
    * three are stateless narrow columns — the stream's state stays the
    * watermark-bounded md5 set.
    */
  def curateStream(docs: DataFrame, lang: String, minQuality: Double,
                   watermark: String = "1 hour",
                   redactPii: Boolean = false,
                   blocklist: Seq[String] = Nil,
                   gopher: Boolean = false,
                   normalize: Boolean = false): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    // fix-text ahead of lang-ID, exactly the batch stage order — a
    // stateless narrow column, so stream ≡ batch holds trivially
    val normed =
      if (normalize) docs.withColumn("text", TextAnalysis.fixText(col("text")))
      else docs
    val gated =
      if (blocklist.isEmpty) normed
      else normed.filter(!TextAnalysis.blockedCol(col("text"), blocklist))
    val filtered0 = gated
      .withWatermark("ts", watermark)
      .filter(TextAnalysis.langPredCol(toks) === lang &&
        TextAnalysis.qualityCol(toks, col("n_chars")) >= minQuality)
    val filtered =
      if (gopher) filtered0.filter(TextAnalysis.gopherPassCol(toks))
      else filtered0
    val redacted =
      if (redactPii) filtered.withColumn("text", TextAnalysis.redactCol(col("text")))
      else filtered
    redacted
      .withColumn("text_md5", md5(col("text")))
      .dropDuplicatesWithinWatermark("text_md5")
      .drop("text_md5")
  }

  /** Streaming maintenance for the Count-Min sketch: each micro-batch
    * appends its OWN sketch cells as immutable files — no
    * read-modify-write, no state store; mergeability
    * ([[graft.operators.TextAnalysis.cmsSketch]]: sketch of a union =
    * cell-wise sum) makes the served sketch `sum(c)` over everything
    * appended, read back with [[graft.operators.TextAnalysis.cmsFromDir]].
    * Appended bytes per batch are ≤ rows·width cells regardless of
    * batch size; a periodic [[graft.operators.TextAnalysis.compactCms]]
    * folds the accumulated increments back to one generation.
    */
  def maintainCms(newDocs: DataFrame, sketchDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        TextAnalysis.cmsSketch(batch.toDF())
          .write.mode("append").parquet(sketchDir)
      }
      .start()

  /** Streaming crawl-frontier URL dedup: each micro-batch's kept
    * arrivals — docs whose canonical URL is novel to the bucketed
    * store AND batch-first ([[graft.operators.TextAnalysis
    * .incrementalUrlDedup]]) — go to `handler`, then the batch's novel
    * canonical forms absorb. Per-batch cost ∝ batch (the store side of
    * the anti-join reads pre-partitioned); micro-batch replay is
    * idempotent (all-known URLs keep nothing, append nothing), so
    * at-least-once delivery never double-ingests a page.
    */
  def dedupStreamUrls(newDocs: DataFrame, urlTable: String)(
      handler: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        handler(graft.operators.TextAnalysis.incrementalUrlDedup(
          batch.sparkSession, urlTable, batch.toDF()), id)
      }
      .start()

  /** Streaming ingest-time NEAR-dup: each micro-batch runs
    * [[graft.operators.Dedup.minhashPairsIncremental]] against the
    * persisted MinHash store — pairs vs everything absorbed so far
    * (plus within-batch) go to `handler`, then the batch absorbs. The
    * cross-doc stage that [[curateStream]] declares out of streaming
    * scope becomes incremental here because the store keys arrivals by
    * LSH bucket: per-batch cost is the BATCH's signatures + one
    * bucket-store probe, never a corpus rescan.
    */
  def dedupStreamMinhash(newDocs: DataFrame, storeDir: String,
                         threshold: Double = 0.7)(
      handler: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        handler(graft.operators.Dedup.minhashPairsIncremental(
          batch.sparkSession, storeDir, batch.toDF(), threshold), id)
      }
      .start()

  /** Streaming near-dup CLUSTER maintenance — [[dedupStreamMinhash]]
    * composed with the incremental label store: each micro-batch (1)
    * finds its near-dup pairs against the persisted MinHash store and
    * absorbs its signatures ([[graft.operators.Dedup
    * .minhashPairsIncremental]] — batch × corpus + batch × batch, cost
    * ∝ batch), then (2) absorbs those pairs AND the batch's docs into
    * the append-only cluster-label store ([[graft.operators.Dedup
    * .clustersIncremental]] — contracted-graph re-converge, delta-only
    * append). After every micro-batch,
    * [[graft.operators.Dedup.clusterStoreLabels]] serves exactly the
    * labeling batch clustering over everything ingested would produce
    * (spec-pinned per batch) — the full ingest-time near-dup story,
    * pairs and labels both incremental, with per-batch cost ∝ batch
    * and replay-idempotent stores.
    */
  def clusterStreamMinhash(newDocs: DataFrame, minhashDir: String,
                           clusterTable: String, threshold: Double = 0.7)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val df = batch.toDF()
        val pairs = graft.operators.Dedup.minhashPairsIncremental(
          df.sparkSession, minhashDir, df, threshold)
        // the absorb (delta checkpoint + append) runs eagerly inside the
        // call; the returned full labeling is lazy and intentionally
        // unused — the store serves reads via clusterStoreLabels
        graft.operators.Dedup.clustersIncremental(df.sparkSession, clusterTable,
          df.select("doc_id"), pairs.select("id1", "id2"))
        ()
      }
      .start()

  /** Streaming maintenance of the DSIR importance model
    * ([[graft.operators.Sampling.dsirScorer]]'s λ fit): each
    * micro-batch appends its OWN per-bucket target/source gram counts
    * (`(b, tc, sc)`, ≤ `buckets` rows — corpus-independent) as
    * immutable files, the [[maintainCms]] pattern — no read-modify-
    * write, no state store. Counts of a union are per-bucket sums, so
    * [[dsirScorerFromDir]]'s fold serves EXACTLY the model a batch fit
    * over everything appended would produce — rescoring with refreshed
    * λ per maintenance window is one read + one ≤ `buckets`-row
    * collect, never a reference-corpus rescan.
    */
  def maintainDsirModel(newDocs: DataFrame, isTarget: org.apache.spark.sql.Column,
                        modelDir: String, buckets: Int = 256)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Sampling.dsirModelIncrement(batch.toDF(), isTarget, buckets)
          .write.mode("append").parquet(modelDir)
      }
      .start()

  /** The frozen DSIR scorer refreshed from a [[maintainDsirModel]] dir:
    * fold the appended increments (per-bucket sums), freeze λ as plan
    * literals, return the stateless scoring projection — bit-equal to
    * [[graft.operators.Sampling.dsirScorer]] fit on the union of every
    * batch absorbed so far (spec-pinned at each window boundary).
    */
  def dsirScorerFromDir(spark: org.apache.spark.sql.SparkSession, modelDir: String,
                        buckets: Int = 256): DataFrame => DataFrame = {
    val counts = spark.read.parquet(modelDir)
      .groupBy("b").agg(sum("tc").as("tc"), sum("sc").as("sc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    graft.operators.Sampling.dsirScorerFromCounts(counts, buckets)
  }

  /** Streaming maintenance of the per-source quality-quantile sketch
    * ([[TextAnalysis.qualitySketch]]): each micro-batch appends its
    * own (source, qbin, c) increment — O(distinct bins) rows, never
    * corpus-sized — and `TextAnalysis.qualitySketchFromDir` +
    * `thresholdsFromSketch` serve gate thresholds from the fold. The
    * quantile twin of [[maintainCms]]: curation thresholds stay
    * current without ever re-scanning summarized documents.
    */
  def maintainQualitySketch(newDocs: DataFrame,
                            sketchDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        TextAnalysis.qualitySketch(batch.toDF())
          .write.mode("append").parquet(sketchDir)
      }
      .start()
}
