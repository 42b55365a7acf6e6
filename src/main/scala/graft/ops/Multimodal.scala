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

  // --------------------------------------------------------------------
  // REAL decoders (round 16). The carried "environment-blocked" framing
  // was only true for VIDEO: the JDK itself ships real codecs —
  // javax.imageio (PNG/JPEG/GIF/BMP decode + encode) and
  // javax.sound.sampled (WAV parse + write) — so the image and audio
  // halves of the seam run genuine byte-level work with zero external
  // libraries. The DuckDB oracle cannot replay a PNG parse, so these
  // paths are verified by spec round-trips (MultimodalSpec: synthesized
  // dims == decoded dims; resized payloads re-decode to the claimed
  // dims) and benched (x08 keys); the md5-stub paths above keep the
  // cross-engine oracle rows. Video keeps the stub — no JDK video
  // codec exists; that swap genuinely needs JavaCV/JNI on the cluster.
  // --------------------------------------------------------------------

  /** Real byte-level codec helpers over JDK built-ins. One instance of
    * the underlying readers per call — cheap relative to codec work and
    * safe under mapPartitions concurrency (ImageIO static entry points
    * are thread-safe; reader instances are not shared). */
  object RealMediaDecoder {
    // ImageIO defaults to FILE-backed stream caches: every header read
    // and every PNG encode creates (and deletes) a temp file on disk.
    // Round-16 profile: the spread x08r codec stage showed 31.9 s task
    // run vs 6.5 s CPU — 25 s of temp-file I/O and registry waits
    // across 32 tasks. Memory-cached streams produce byte-identical
    // output; set once at class load (JVM-global, idempotent).
    javax.imageio.ImageIO.setUseCache(false)
    /** Header-only dimension read: acquires an ImageReader and asks for
      * width/height WITHOUT decoding the raster. At 100 TB, metadata
      * extraction must not pay a full pixel decode — this is the
      * streaming-parse discipline a production media pipeline uses. */
    def imageDims(payload: Array[Byte]): (Int, Int) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException(
            "no ImageIO reader recognizes the payload")
        val r = readers.next()
        try { r.setInput(iis); (r.getWidth(0), r.getHeight(0)) }
        finally r.dispose()
      } finally iis.close()
    }

    /** Full raster decode (the expensive path — resize needs pixels). */
    def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) throw new IllegalArgumentException(
        "ImageIO could not decode the payload")
      img
    }

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** WAV header parse (no sample decode): frame count / frame rate. */
    def wavDurationMs(payload: Array[Byte]): Int = {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val frames = aff.getFrameLength
      val rate = aff.getFormat.getFrameRate
      if (frames < 0 || rate <= 0) throw new IllegalArgumentException(
        "WAV header carries no frame length/rate")
      math.round(frames * 1000.0 / rate).toInt
    }

    /** Decode, fit the longest side to `maxDim` (never upscale, aspect
      * preserved — the same rule as [[resizePlan]]), bilinear rescale,
      * re-encode PNG. Returns (bytes, origW, origH, newW, newH). */
    def resizeImage(payload: Array[Byte], maxDim: Int)
        : (Array[Byte], Int, Int, Int, Int) = {
      val img = decodeImage(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val long0 = math.max(w, h)
      if (long0 <= maxDim) (encodePng(img), w, h, w, h)
      else {
        val nw = math.max(1, w * maxDim / long0)
        val nh = math.max(1, h * maxDim / long0)
        val out = new java.awt.image.BufferedImage(nw, nh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
        } finally g.dispose()
        (encodePng(out), w, h, nw, nh)
      }
    }
  }

  /** Deterministic REAL payload synthesis: even ids become actual PNG
    * images (dimensions derived from the id, pixels from an id-seeded
    * LCG), odd ids actual 16-bit mono WAV clips (sample count derived
    * from the id). The fixtures carry text, not media — this gives the
    * real codec path genuine bytes to chew on, deterministically, so
    * specs can verify decode output against the synthesis parameters.
    * Runs as mapPartitions: one encoder scope per partition, the same
    * distribution shape a real ingest's decode stage has. */
  def asAssetsReal(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Round-16 A/B: the codec kernel (PNG deflate / WAV frame write,
    // ~1 ms/row) inherited the one-task width of the single-row-group
    // corpus scan — x08r/x08z ran ~5 s profile wall, serial, with 31
    // cores idle. The id frame is ~40 KB at sf0.1, UNDER
    // Par.fanOutReady's 128 KB stats floor (that floor is sized for
    // streaming microbatches of TEXT, where the amplifier is a
    // tokenizer — here the amplifier is a per-row codec three orders
    // heavier per byte), so this site spreads explicitly: profile wall
    // 5.1/4.9 -> 1.4/1.2 s at sf0.1, and the exchange carries ids
    // only. Only the synthesis seam pays it; real deployments scan
    // already-wide asset tables. (text was never consumed — selecting
    // it shipped every document's bytes through the serializer for
    // nothing.) Bench-entry totals additionally moved to the frozen
    // mediaStatic + ImageIO.setUseCache(false): x08r 3.13 -> 0.62 s,
    // x08z 3.58 -> 0.08 s (OPTIMIZATION_r16.md).
    docs.select(col(idCol).cast("long").as(idCol))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 2 == 0) {
            val (w, h) = synthImageDims(id)
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var seed = id * 6364136223846793005L + 1442695040888963407L
            val px = new Array[Int](w * h)
            var i = 0
            while (i < px.length) {
              seed = seed * 6364136223846793005L + 1442695040888963407L
              px(i) = (seed >>> 40).toInt & 0xffffff
              i += 1
            }
            img.setRGB(0, 0, w, h, px, 0, w)
            (id, "image", RealMediaDecoder.encodePng(img))
          } else {
            val n = synthWavSamples(id)
            val pcm = new Array[Byte](n * 2)
            var seed = id * 2862933555777941757L + 3037000493L
            var i = 0
            while (i < n) {
              seed = seed * 2862933555777941757L + 3037000493L
              val s = (seed >>> 48).toShort
              pcm(2 * i) = (s & 0xff).toByte
              pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
              i += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
              true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            (id, "audio", bos.toByteArray)
          }
        }
      }.toDF("asset_id", "modality", "content")
  }

  /** Synthesis parameters, exposed so specs can verify decode output
    * against them independently. */
  def synthImageDims(id: Long): (Int, Int) =
    ((16 + id % 48).toInt, (16 + (id / 48) % 48).toInt)
  def synthWavSamples(id: Long): Int = (800 + id % 8000).toInt

  /** [[extractMeta]] over REAL payloads: header-only image dimension
    * parse, WAV header duration — no raster/sample decode anywhere in
    * the metadata path. Same MediaMeta schema as the stub path, so
    * downstream consumers (resizePlan, frameSamplePlan) are reusable
    * unchanged. */
  def extractMetaReal(assets: DataFrame): Dataset[MediaMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "modality", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          val (w, h, d) = modality match {
            case "image" =>
              val (iw, ih) = RealMediaDecoder.imageDims(payload)
              (iw, ih, 0)
            case "audio" =>
              (0, 0, RealMediaDecoder.wavDurationMs(payload))
            case _ =>
              // video: no JDK codec — the one genuinely stubbed branch
              MediaDecoder.decodeStub(modality, payload)
          }
          MediaMeta(id, modality, payload.length, w, h, d,
            MediaDecoder.contentHash(payload))
        }
      }
  }

  /** Real resize over image payloads: decode → bilinear fit-to-max →
    * PNG re-encode, per partition. Output carries the resized BYTES —
    * the thing [[resizePlan]]'s stub replaced with a hash. */
  def resizeReal(assets: DataFrame, maxDim: Int = 256): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(col("modality") === "image")
      .select("asset_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (bytes, w, h, nw, nh) =
            RealMediaDecoder.resizeImage(payload, maxDim)
          (id, w, h, nw, nh, bytes)
        }
      }.toDF("asset_id", "width", "height", "new_w", "new_h", "content")
  }
}
