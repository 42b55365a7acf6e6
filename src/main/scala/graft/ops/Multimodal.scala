package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata travelling alongside.
  *
  * The real decode (JPEG/PNG/audio codecs) is STUBBED — the container has no
  * media libraries — behind [[MediaDecoder]]; everything Spark-side (schema,
  * batch iteration shape, partition-wise processing, metadata struct) is
  * real and tested. On a cluster you swap [[MediaDecoder.decodeStub]] for a
  * JNI/javacv call without touching the plan.
  */
object Multimodal {

  /** Decoded-asset metadata row. */
  case class MediaMeta(asset_id: Long, modality: String, n_bytes: Int,
                       width: Int, height: Int, duration_ms: Int,
                       content_hash: Long)

  /** STUB decoder: a real implementation parses the container header.
    * This deterministic fake derives plausible dimensions from the md5 of
    * the payload — chosen over a JVM hash so any engine (the DuckDB oracle
    * included) can recompute the values and the plumbing is testable
    * byte-for-byte across engines. */
  object MediaDecoder {
    private def md5Hex(payload: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(payload)
        .map("%02x".format(_)).mkString

    /** First 8 md5 hex chars as an unsigned 32-bit value. */
    def payloadSeed(payload: Array[Byte]): Long =
      java.lang.Long.parseLong(md5Hex(payload).substring(0, 8), 16)

    /** First 15 md5 hex chars as a (positive) 60-bit content hash. */
    def contentHash(payload: Array[Byte]): Long =
      java.lang.Long.parseLong(md5Hex(payload).substring(0, 15), 16)

    def decodeStub(modality: String, payload: Array[Byte]): (Int, Int, Int) = {
      val h = payloadSeed(payload)
      val w = (64 + h % 1024).toInt
      val ht = (64 + (h / 1024) % 1024).toInt
      val d = (1000 + h % 600000).toInt
      modality match {
        case "image" => (w, ht, 0)
        case "audio" => (0, 0, d)
        case "video" => (w, ht, d)
        case _       => (0, 0, 0)
      }
    }
  }

  /** Wrap a text corpus as fake media assets: binary payload + modality —
    * gives the pipeline a `binary` column to exercise end to end. */
  def asAssets(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("content"))

  /** Partition-wise feature extraction over binary payloads — the Scala
    * analogue of a batched `mapInPandas` decode: one decoder instance per
    * partition, streaming rows, no driver materialization. */
  def extractMeta(assets: DataFrame): Dataset[MediaMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "modality", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup happens here in a real codec
        it.map { case (id, modality, payload) =>
          val (w, h, d) = MediaDecoder.decodeStub(modality, payload)
          MediaMeta(id, modality, payload.length, w, h, d,
            MediaDecoder.contentHash(payload))
        }
      }
  }

  /** Pure-expression twin of [[extractMeta]]: the stub's metadata derived
    * with codegen'd column functions (md5 → seed → dims), no mapPartitions.
    * For metadata-only consumers (frame/resize planning) this keeps column
    * pruning and whole-stage codegen intact — the [[extractMeta]] iterator
    * exists for the real-codec swap, where a JNI decoder genuinely needs
    * per-partition setup and this path stops being available. Parity
    * between the two is spec-guarded (MultimodalSpec). */
  def extractMetaExpr(assets: DataFrame): DataFrame =
    assets
      .withColumn("__seed",
        conv(substring(md5(col("content")), 1, 8), 16, 10).cast("long"))
      .select(col("asset_id"), col("modality"),
        length(col("content")).cast("int").as("n_bytes"),
        when(col("modality").isin("image", "video"),
          (lit(64) + expr("__seed % 1024")).cast("int"))
          .otherwise(0).as("width"),
        when(col("modality").isin("image", "video"),
          (lit(64) + expr("(__seed div 1024) % 1024")).cast("int"))
          .otherwise(0).as("height"),
        when(col("modality").isin("audio", "video"),
          (lit(1000) + expr("__seed % 600000")).cast("int"))
          .otherwise(0).as("duration_ms"),
        conv(substring(md5(col("content")), 1, 15), 16, 10).cast("long")
          .as("content_hash"))

  /** Resize plan for visual assets: fit the longest side to `maxDim`
    * preserving aspect ratio, never upscaling. Dimension math is integer
    * division (`div`) so any engine recomputes it exactly; the resized
    * payload itself is the stubbed step — represented by a deterministic
    * md5-derived hash of (content_hash, target dims), the value a real
    * implementation would replace with the re-encoded bytes. Pure
    * expressions — the plan stays codegen'd and distributed. */
  def resizePlan(meta: DataFrame, maxDim: Int = 256): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    def fit(side: String) =
      when(longSide <= maxDim, col(side))
        .otherwise(greatest(lit(1),
          expr(s"($side * $maxDim) div greatest(width, height)")))
    meta.filter(col("width") > 0)
      .withColumn("new_w", fit("width").cast("long"))
      .withColumn("new_h", fit("height").cast("long"))
      .select(col("asset_id"), col("modality"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("new_w"), col("new_h"),
        conv(substring(md5(concat_ws("_",
            col("content_hash").cast("string"),
            concat(col("new_w"), lit("x"), col("new_h")))), 1, 8), 16, 10)
          .cast("long").as("resized_hash"))
  }

  /** Frame-sampling plan for video assets: every `everyMs` milliseconds up
    * to `maxFrames` — emits (asset_id, frame_idx, ts_ms) rows; the actual
    * pixel fetch is the stubbed decode. Pure expressions: the explode stays
    * distributed and codegen'd. */
  def frameSamplePlan(meta: DataFrame, everyMs: Int = 1000,
                      maxFrames: Int = 32): DataFrame =
    meta.filter(col("modality") === "video")
      .withColumn("frame_idx", explode(sequence(lit(0),
        least(floor(col("duration_ms") / everyMs).cast("int"), lit(maxFrames - 1)))))
      .select(col("asset_id"), col("frame_idx"),
        (col("frame_idx") * everyMs).as("ts_ms"))
}
