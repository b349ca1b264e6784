package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads plus a typed metadata struct, processed in partition-local
  * batches.
  *
  * The Spark-side plumbing — schema, partitioning, batched iteration
  * shape — is real and tested. The codec itself is a clearly-marked
  * STUB (this container has no image/audio libraries): `decodeStub`
  * derives deterministic features from the raw bytes where a real
  * implementation would invoke a decoder. Swapping in a real codec
  * changes ONE function and nothing about the dataflow.
  */
object Multimodal {

  /** One media row: payload + typed metadata (the schema a 100 TB media
    * lake would carry; payloads stay opaque to Catalyst). */
  case class MediaRecord(
      media_id: Long,
      modality: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      format: String)

  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      // STUB output: a real pipeline would emit e.g. CLIP embeddings
      features: Array[Float])

  case class Frame(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  /** Pack a text corpus into fake media rows (payload = utf-8 bytes).
    * Stands in for `spark.read.format("binaryFile")` over a media lake;
    * keeps everything deterministic and self-contained. */
  def packDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        // modality assignment is content-derived, so it is stable
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        encode(col("text"), "utf-8").as("payload"),
        (pmod(col("doc_id"), lit(64)) + lit(16)).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + lit(16)).cast("int").as("height"),
        lit("raw").as("format"))
      .as[MediaRecord]
  }

  /** ======================== STUB ========================
    * A real implementation decodes payloads with an image/audio codec
    * and runs a feature extractor, in batches sized for the model. This
    * stub keeps the exact same batch shape (partition-local groups of
    * `batchSize`) and emits deterministic byte-statistics features so
    * the pipeline is testable end-to-end without codecs. */
  def decodeStub(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // batched iteration mirrors a vectorized model-inference call
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val bytes = m.payload
          val n = bytes.length.max(1)
          // STUB feature vector: 8 coarse byte-histogram bins + shape
          val hist = new Array[Float](8)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1f; i += 1 }
          var b = 0
          while (b < 8) { hist(b) /= n.toFloat; b += 1 }
          MediaFeatures(m.media_id, m.modality, bytes.length.toLong,
            hist ++ Array(m.width.toFloat, m.height.toFloat))
        }
      }
    }
  }

  /** ======================== STUB ========================
    * Image resize: a real implementation hands each batch to an image
    * library (nearest-neighbor / bilinear over decoded pixels). The
    * stub runs TRUE nearest-neighbor over the raw byte grid instead —
    * payload treated as a row-major `width × height` byte image with
    * wrap-around for short payloads — preserving the exact dataflow:
    * partition-local batches, typed in/out records, new dimensions
    * stamped into the metadata. Swapping in a codec changes only the
    * per-record body. */
  def resizeStub(
      media: Dataset[MediaRecord], outW: Int, outH: Int,
      batchSize: Int = 64): Dataset[MediaRecord] = {
    require(outW > 0 && outH > 0, s"target dims must be positive: $outW x $outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          // a zero-byte payload has nothing to sample — emit an empty
          // payload with the target dims stamped (matching the oracle's
          // empty resample of an empty text) instead of wrapping into an
          // out-of-bounds read
          if (m.payload.isEmpty) m.copy(payload = Array.emptyByteArray,
            width = outW, height = outH)
          else {
            val n = m.payload.length
            val out = new Array[Byte](outW * outH)
            var y = 0
            while (y < outH) {
              val sy = y * m.height / outH
              var x = 0
              while (x < outW) {
                val sx = x * m.width / outW
                out(y * outW + x) = m.payload((sy * m.width + sx) % n)
                x += 1
              }
              y += 1
            }
            m.copy(payload = out, width = outW, height = outH)
          }
        }
      }
    }
  }

  /** Frame sampling for "video" payloads: split the payload into
    * `frames` equal chunks (a real impl would demux keyframes). The
    * explode is partition-local — no shuffle. */
  def frameSample(media: Dataset[MediaRecord], frames: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "video").flatMap { m =>
      val n = m.payload.length
      val step = math.max(1, n / frames)
      (0 until frames).iterator.takeWhile(i => i * step < n).map { i =>
        Frame(m.media_id, i, m.payload.slice(i * step, math.min(n, (i + 1) * step)))
      }
    }
  }

  /** End-to-end feature pipeline over the documents table: pack →
    * (repartition for downstream parallelism) → batch-decode → summary.
    * The repartition models routing media rows to GPU-sized tasks. */
  def featurePipeline(spark: SparkSession, docs: DataFrame, partitions: Int = 8): DataFrame = {
    val media = packDocuments(docs).repartition(partitions, col("media_id"))
    val feats = decodeStub(media)
    feats.toDF()
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(size(col("features"))).cast("long").as("total_feature_dims"))
      .orderBy(col("modality"))
  }
}
