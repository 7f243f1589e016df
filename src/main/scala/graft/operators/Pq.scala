package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Product quantization (PQ) — the standard memory-compression path for
  * vector search at 100 TB scale: a dim-d float32 vector (4·d bytes)
  * becomes m sub-space codes (m bytes at c ≤ 256), and queries run
  * against the codes via asymmetric distance computation (ADC) — one
  * m·c lookup table per query instead of any full-vector arithmetic.
  * No counterpart in the reference (its index holds raw vectors,
  * hnsw.cc:33-43); this is the classic Jégou/Douze/Schmid design
  * re-expressed relationally.
  *
  * Everything is deterministic — codebooks are per-subspace
  * [[Ivf.kmeans]] runs (fixed-iteration Lloyd, DECIMAL-exact means),
  * assignment ties break by centroid id, ADC sums accumulate through
  * DECIMAL(38,12) — so both the code table and the ADC top-k
  * hash-check against DuckDB.
  *
  * Scale shape: codebooks are m·c rows (collected/broadcast — the
  * legitimately tiny side); encoding is m narrow passes + one skinny
  * (vec_id, subspace, code) shuffle for the per-subspace argmin; ADC
  * serving is a broadcast hash join of the code table against the m·c
  * LUT + a per-vector sum of m doubles — the vector table itself is
  * read once at ENCODE time and never again.
  */
object Pq {

  /** 1-based slice of subspace `s` (length `subDim`) of a vector. */
  def subVector(vec: Column, s: Int, subDim: Int): Column =
    slice(vec, s * subDim + 1, subDim)

  /** Per-subspace codebooks `(subspace, centroid_id, centroid_vec)`:
    * one deterministic [[Ivf.kmeans]] per subspace over the sliced
    * sub-vectors (seed rule and tie-breaks identical to IVF's).
    */
  def codebooks(embeddings: DataFrame, m: Int, subDim: Int, c: Int, iters: Int): DataFrame =
    (0 until m).map { s =>
      Ivf.kmeans(
          embeddings.select(col("vec_id"),
            subVector(col("embedding"), s, subDim).as("embedding")),
          c, iters)
        .select(lit(s).as("subspace"), col("centroid_id"), col("centroid_vec"))
    }.reduce(_ unionByName _)

  // Driver-resident codebook memo (m·c·subDim doubles per entry) —
  // same amortization contract as Ivf.kmeansCached: `key` must
  // identify the source table (the declared queries key by data dir).
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int, Int, Int), Array[(Int, Long, Seq[Double])]]

  /** [[codebooks]] memoized per (key, m, subDim, c, iters). */
  def codebooksCached(embeddings: DataFrame, m: Int, subDim: Int, c: Int, iters: Int,
                      key: String): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // Same hazard as Ivf.kmeansCached: a different table under a reused
    // key would get bit-wrong codebooks with no error — fail loudly.
    IndexMeta.requireKeyMatchesScan(embeddings, key)
    memo.getOrElseUpdate((key, m, subDim, c, iters),
        codebooks(embeddings, m, subDim, c, iters)
          .as[(Int, Long, Seq[Double])].collect())
      .toSeq.toDF("subspace", "centroid_id", "centroid_vec")
  }

  /** Encode every vector: `(vec_id, subspace, code)` — per-subspace
    * nearest-centroid argmin (ties → smaller centroid id, the
    * [[Ivf.assignWith]] convention).
    */
  def encode(embeddings: DataFrame, books: DataFrame, m: Int, subDim: Int): DataFrame = {
    val subs = (0 until m).map { s =>
      embeddings.select(col("vec_id"), lit(s).as("subspace"),
        subVector(col("embedding"), s, subDim).as("sub"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy("vec_id", "subspace").orderBy(col("d"), col("centroid_id"))
    subs.join(broadcast(books), Seq("subspace"))
      .select(col("vec_id"), col("subspace"), col("centroid_id"),
        l2Distance(col("sub"), col("centroid_vec")).as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("subspace"), col("centroid_id").cast("int").as("code"))
  }

  /** Code table rendered one row per vector, codes joined subspace-order
    * with '_' (the driver's compare cannot sort list columns).
    */
  def codesAsString(enc: DataFrame): DataFrame =
    enc.groupBy("vec_id")
      .agg(concat_ws("_",
        transform(array_sort(collect_list(struct(col("subspace"), col("code")))),
          x => x.getField("code").cast("string"))).as("codes"))

  /** ADC top-k: distance from the query to each vector's QUANTIZED
    * reconstruction, computed as Σ_s lut[s, code_s] with
    * lut[s, j] = ‖query_s − codebook_s[j]‖² — the per-query lookup
    * table is m·c rows, broadcast; per-vector work is m map-side
    * lookups + one DECIMAL-exact sum (order-invariant at any partition
    * count). `queries` is a single-row `(query_vec)` frame of doubles.
    */
  def adcTopK(embeddings: DataFrame, books: DataFrame, queries: DataFrame,
              m: Int, subDim: Int, k: Int, roundTo: Int = 6): DataFrame = {
    val enc = encode(embeddings, books, m, subDim)
    val lut = books.crossJoin(broadcast(queries))
      .select(col("subspace"), col("centroid_id").cast("int").as("code"),
        l2DistanceSq(col("centroid_vec"),
          slice(col("query_vec"), col("subspace") * lit(subDim) + lit(1), lit(subDim)))
          .as("d2"))
    enc.join(broadcast(lut), Seq("subspace", "code"))
      .groupBy("vec_id")
      .agg(round(sqrt(sum(col("d2").cast("decimal(38,12)")).cast("double")), roundTo)
        .as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** Quantized reconstruction `(vec_id, recon)` — concatenated codebook
    * centroids of each vector's codes (spec surface: ADC distances must
    * equal direct distances to these reconstructions).
    */
  def reconstruct(embeddings: DataFrame, books: DataFrame, m: Int, subDim: Int): DataFrame =
    encode(embeddings, books, m, subDim)
      .join(broadcast(books), Seq("subspace"))
      .filter(col("code") === col("centroid_id").cast("int"))
      .groupBy("vec_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("subspace"), col("centroid_vec")))),
        x => x.getField("centroid_vec"))).as("recon"))
}
