package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for a training-data pipeline:
  * media as opaque `binary` columns plus typed metadata, with
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real — schemas, batched partition
  * processing, frame slicing, metadata math are all exactly what a
  * production pipeline runs. The codec itself is a STUB
  * ([[StubCodec]]): no image/audio libraries exist in this
  * environment, so "decode" is a deterministic bytes→features fake
  * with the same signature a real codec adapter would have. Swapping
  * in javacv/ffmpeg changes one function, not the pipeline.
  *
  * Scale notes: feature extraction runs `mapPartitions` with an
  * explicit micro-batch size — the shape that amortizes per-batch codec
  * or model-session startup and keeps peak memory at `batchSize ×
  * avgAssetBytes` per task regardless of partition size. Frame
  * sampling is pure column arithmetic (`substring` over binary inside
  * codegen), so Catalyst prunes and pushes around it freely.
  */
object Multimodal {

  /** Canonical media-asset schema: id, payload, mime + pixel metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** STUB decode/embed kernel — deterministic stand-in for a real codec
    * (??? boundary). Features are a rolling FNV-1a-style hash of the
    * payload, folded per feature slot into [0, 1) floats: stable across
    * JVMs/partitionings, so pipeline tests assert real equalities.
    */
  object StubCodec {
    def featuresOf(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 2166136261L
      var i = 0
      while (i < bytes.length) {
        h = (h ^ (bytes(i) & 0xffL)) * 16777619L & 0xffffffffL
        out(i % dim) = ((h % 104729L).toFloat / 104729f)
        i += 1
      }
      out
    }
  }

  /** Deterministic media-asset view of the `documents` table — the
    * driver corpus has no binary column, so the declared multimodal
    * queries treat each document's UTF-8 bytes as an opaque payload
    * with synthesized (but deterministic, hence oracle-able) pixel
    * metadata. The pipeline around the payload — schema, batching,
    * frame math, resize math — is exactly what a real binary column
    * would flow through.
    */
  def assetsFromDocuments(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    documents.select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("media"),
      lit("text/plain").as("mime"),
      (pmod(col("n_chars"), lit(640)) + 32).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"))
  }

  /** Batched feature extraction: `(asset_id, features: array<float>)`.
    * Processes each partition in micro-batches of `batchSize` rows —
    * the real-codec shape (one codec/model session per batch).
    */
  def extractFeatures(assets: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "media").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real adapter would open one codec session for `batch` here
        batch.map { r =>
          Row(r.getLong(0), StubCodec.featuresOf(r.getAs[Array[Byte]](1), dim))
        }
      }
    }(enc)
  }

  /** Frame sampling: treat the payload as `frameBytes`-sized frames and
    * keep every `stride`-th, emitting `(asset_id, frame_idx, frame)`.
    * Pure codegen'd column ops — binary `substring` over a generated
    * index sequence, then posexplode.
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col("media")) / frameBytes).cast("int")
    val idxs = when(nFrames > 0,
      sequence(lit(0), nFrames - 1, lit(stride))).otherwise(array().cast("array<int>"))
    assets
      .select(col("asset_id"),
        posexplode(transform(idxs,
          i => substring(col("media"), i * frameBytes + 1, lit(frameBytes))))
          .as(Seq("pos", "frame")),
        element_at(idxs, col("pos") + 1).as("frame_idx"))
      .select("asset_id", "frame_idx", "frame")
  }

  /** Resize metadata to fit a bounding box preserving aspect ratio —
    * the metadata half of a resize (the pixel half is codec work).
    */
  def resizeMeta(assets: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"),
      lit(1.0))
    assets.select(
      col("asset_id"), col("mime"), col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("out_width"),
      floor(col("height") * scale).cast("int").as("out_height"))
  }
}
