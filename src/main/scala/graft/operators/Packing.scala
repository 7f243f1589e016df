package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-then-chunk step that turns a curated
  * corpus into fixed-token-budget training sequences: conceptually
  * concatenate each group's token stream in a stable order and cut at
  * `budget` boundaries. A document belongs to the sequence in which it
  * STARTS (`seq_id = floor(exclusiveCumTokens / budget)`), which is a
  * pure window cumsum — no sequential packer state. No counterpart in
  * the reference (vector-only surface).
  *
  * Scale shape: ONE window per group key — groups pack in parallel
  * across the cluster and no global sort exists anywhere (a corpus-wide
  * ordering would serialize 100 TB through one partition; per-source
  * packing is also what keeps a source's documents adjacent, which is
  * what training-data curation wants). The greedy "skip to the next
  * sequence when a document doesn't fit" variant needs a sequential
  * scan per group and changes results by at most one straddling
  * document per boundary — not worth losing the parallel plan.
  */
object Packing {

  /** Assign each document to its training sequence. Output:
    * `(orderCol, groupCol, n_tokens, seq_id, seq_pos)` where `seq_id`
    * is the group-local sequence index from 0 and `seq_pos` the 1-based
    * position of the document within its sequence.
    */
  def packSequences(documents: DataFrame, groupCol: String, orderCol: String,
                    nTokens: Column, budget: Int): DataFrame =
    packSequencesBy(documents, groupCol, Seq(orderCol), nTokens, budget)

  /** [[packSequences]] with a COMPOSITE order key — e.g. `(doc_id,
    * copy_idx)` after epoch mixing, where upsampled copies are distinct
    * rows that must occupy distinct positions in the token stream.
    * `orderCols` must be a TOTAL order within each group: the cumsum
    * frame is ROWS-based (explicitly — the default RANGE frame would
    * give peer rows one shared cum value, diverging from the sequential
    * concat-then-chunk semantics), so tied keys would pack in an
    * unspecified relative order.
    */
  def packSequencesBy(documents: DataFrame, groupCol: String, orderCols: Seq[String],
                      nTokens: Column, budget: Int): DataFrame = {
    val ord = orderCols.map(col)
    val byGroup = Window.partitionBy(groupCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(ord ++ Seq(col(groupCol), nTokens.cast("long").as("n_tokens")): _*)
      .withColumn("cum", sum(col("n_tokens")).over(byGroup))
      .select(ord ++ Seq(col(groupCol), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget).as("seq_id")): _*)
      .withColumn("seq_pos",
        row_number().over(Window.partitionBy(col(groupCol), col("seq_id")).orderBy(ord: _*)))
  }

  /** Sliding-window document chunking — the RAG/pretraining step that
    * cuts each document into overlapping `window`-word pieces every
    * `stride` words. Chunk `i` of a document covers words
    * `[i·stride, i·stride + window)`; a document emits
    * `1 + floor(max(n − window, 0) / stride)` chunks, so a document
    * shorter than `window` is exactly one (short) chunk; when
    * `n > window`, at most `stride − 1` trailing words past the final
    * window are dropped (standard sliding-window truncation).
    *
    * Scale shape: entirely NARROW — per row, a split, a bounded
    * `sequence` explode (fan-out ≈ n/stride), and an array slice. No
    * shuffle, no window function, no state; 100 TB chunks at scan
    * speed and the output inherits the input's partitioning. Output:
    * `(doc_id, chunk_id, n_words, chunk_text)`.
    */
  def chunkDocs(documents: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"chunk window must be >= 1 (got $window)")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window] (got stride=$stride, window=$window)")
    val w = graft.functions.TextFunctions.tokens(col("text"))
    documents
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0),
          floor(greatest(size(col("w")) - window, lit(0)) / stride).cast("int")))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("w"), col("chunk_id") * stride + 1, lit(window)).as("cw"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("cw")).cast("long").as("n_words"),
        concat_ws(" ", col("cw")).as("chunk_text"))
  }
}
