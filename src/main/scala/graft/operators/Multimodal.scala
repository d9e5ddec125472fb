package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline (builder brief):
  * image/audio/video payloads ride as opaque `binary` columns next to a
  * typed metadata struct; decode / feature-extract / resize / frame-sample
  * are per-partition batch transforms.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC FAKE (clearly marked below): it derives pseudo-features
  * from the payload bytes with a seeded rolling hash. Everything around it
  * — schema, partitioning, batch shape (fixed-size micro-batches inside
  * `mapPartitions`, the JVM analogue of an Arrow-batched pandas UDF),
  * null/empty handling — is real and tested, so swapping in a true codec
  * is a one-function change.
  */
object Multimodal {

  val Modalities = Seq("image", "audio", "video")

  /** Rows of the multimodal assets table. `bytes` is the opaque payload;
    * `width/height` apply to image+video, `sample_rate` to audio,
    * `n_frames` to video (−1 where not applicable). */
  final case class Asset(
      asset_id: Long,
      modality: String,
      bytes: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  final case class AssetFeatures(
      asset_id: Long,
      modality: String,
      n_bytes: Int,
      features: Array[Float])

  /** Synthesize a deterministic assets table from the documents table:
    * payload bytes = UTF-8 of the text (a stand-in blob), metadata derived
    * from doc_id — pure projection, no shuffle, scales with the scan. */
  def synthAssets(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").cast("long").as("asset_id"),
      element_at(typedLit(Modalities), (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
        .as("modality"),
      encode(col("text"), "UTF-8").as("bytes"),
      (lit(64) + pmod(col("doc_id"), lit(16)) * 32).cast("int").as("width"),
      (lit(64) + pmod(col("doc_id") * 7, lit(16)) * 32).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(-1)
        .cast("int").as("sample_rate"),
      when(pmod(col("doc_id"), lit(3)) === 2,
        (lit(8) + pmod(col("doc_id"), lit(120))).cast("int"))
        .otherwise(-1).as("n_frames"))

  /** DETERMINISTIC FAKE DECODE — stands in for a real image/audio decoder.
    * Per feature dim d: a position-weighted byte sum over the payload's
    * bytes at positions ≡ d (mod dims), scrambled by a Knuth multiplicative
    * constant mod 2^31 and mapped into [-1, 1). Order- and byte-sensitive
    * (a permuted or corrupted payload changes every touched dim), and —
    * deliberately — restateable in plain SQL over the byte values, so the
    * whole mapInPandas-shaped plumbing is driver-oracle-checkable end to
    * end (VERDICT r3 item 7). Replace with a codec call to go real. */
  private[graft] def fakeDecode(bytes: Array[Byte], dims: Int): Array[Float] = {
    val taps = new Array[Long](dims)
    var i = 0
    while (i < bytes.length) {
      // byte as unsigned, weight = 1 + position within the dim's stride.
      // Reduced mod 2^31 PER STEP (ADVICE r4): every term is nonnegative, so
      // the running floorMod equals the true sum mod 2^31 — bit-identical to
      // the DuckDB oracle's unbounded list_sum % 2^31 — while a raw signed
      // Long sum could overflow negative on a multi-GB payload and silently
      // break the SQL-parity contract.
      taps(i % dims) = Math.floorMod(
        taps(i % dims) + (i / dims + 1).toLong * (bytes(i) & 0xff), 2147483648L)
      i += 1
    }
    val out = new Array[Float](dims)
    i = 0
    while (i < dims) {
      val v = (taps(i) * 2654435761L + (i + 1)) % 2147483648L
      out(i) = (v.toDouble / 2147483648.0 * 2.0 - 1.0).toFloat
      i += 1
    }
    out
  }

  /** Feature extraction: per-partition, fixed-size micro-batches (the
    * Arrow/pandas-UDF batch shape — a real decoder would decode a batch at
    * a time on accelerator). Narrow transform: no shuffle, scales linearly
    * with partitions. */
  def extractFeatures(assets: Dataset[Asset], dims: Int = 16,
      batchSize: Int = 64): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a vectorized decode kernel would run
        batch.iterator.map { a =>
          val payload = if (a.bytes == null) Array.empty[Byte] else a.bytes
          AssetFeatures(a.asset_id, a.modality, payload.length,
            fakeDecode(payload, dims))
        }
      }
    }
  }

  /** Resize metadata transform (image/video only): scales width/height to
    * fit a bounding box, preserving aspect ratio — pure column math. */
  def resizeMeta(assets: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    assets
      .withColumn("out_width",
        when(col("modality") === "audio", lit(-1))
          .otherwise(greatest(lit(1), floor(col("width") * scale))).cast("int"))
      .withColumn("out_height",
        when(col("modality") === "audio", lit(-1))
          .otherwise(greatest(lit(1), floor(col("height") * scale))).cast("int"))
  }

  /** Frame sampling plan for video assets: every `stride`-th frame index as
    * an array column (the shuffle-free analogue of frame extraction; a real
    * pipeline would explode this and decode per frame). */
  def frameSamplePlan(assets: DataFrame, stride: Int): DataFrame =
    assets.withColumn("frame_ids",
      when(col("modality") === "video" && col("n_frames") > 0,
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>")))
}
