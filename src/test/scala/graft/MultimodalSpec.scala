package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal plumbing invariants: modality-dependent decode shape, frame
  * plan bounds, resize fit rules. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Multimodal.asAssets(
    Seq.tabulate(30)(i => (i.toLong, s"doc number $i with some text"))
      .toDF("doc_id", "text"))
  private lazy val metaDs = Multimodal.extractMeta(assets)
  private lazy val meta = metaDs.toDF()

  test("extractMeta: modality decides which dimensions are populated") {
    val rows = metaDs.collect()
    assert(rows.length == 30)
    rows.foreach { m =>
      m.modality match {
        case "image" => assert(m.width > 0 && m.height > 0 && m.duration_ms == 0)
        case "audio" => assert(m.width == 0 && m.height == 0 && m.duration_ms > 0)
        case "video" => assert(m.width > 0 && m.height > 0 && m.duration_ms > 0)
      }
      assert(m.n_bytes > 0 && m.content_hash > 0)
    }
  }

  test("extractMetaExpr == extractMeta (pure-expression parity)") {
    val cols = Seq("asset_id", "modality", "n_bytes", "width", "height",
      "duration_ms", "content_hash")
    val viaExpr = Multimodal.extractMetaExpr(assets)
      .select(cols.map(col): _*).orderBy("asset_id").collect()
    val viaIter = meta
      .select(cols.map(col): _*).orderBy("asset_id").collect()
    assert(viaExpr.toSeq == viaIter.toSeq)
  }

  test("frameSamplePlan: only video, bounded frames, fixed spacing") {
    val frames = Multimodal.frameSamplePlan(meta, everyMs = 1000, maxFrames = 32)
      .collect()
    val byAsset = frames.groupBy(_.getLong(0))
    assert(byAsset.nonEmpty)
    byAsset.foreach { case (_, fs) =>
      assert(fs.length <= 32)
      assert(fs.map(_.getInt(1)).sorted.toSeq == (0 until fs.length))
      fs.foreach(r => assert(r.getInt(2) == r.getInt(1) * 1000))
    }
  }

  test("resizePlan: fit-to-max, never upscale, aspect order preserved") {
    val out = Multimodal.resizePlan(meta, maxDim = 256).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, h) = (r.getLong(2), r.getLong(3))
      val (nw, nh) = (r.getLong(4), r.getLong(5))
      assert(nw <= w && nh <= h, "never upscale")
      assert(nw >= 1 && nh >= 1)
      if (math.max(w, h) > 256) assert(math.max(nw, nh) == 256)
      else assert((nw, nh) == ((w, h)))
      assert((w >= h) == (nw >= nh), "aspect ordering preserved")
    }
  }

  // ---- real codec path (JDK built-ins: javax.imageio / javax.sound) ----

  private lazy val realAssets = Multimodal.asAssetsReal(
    Seq.tabulate(40)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text"))
    .cache()

  test("real path: synthesized PNG/WAV payloads decode back to exactly " +
      "the synthesis parameters (header-only parse, no raster decode)") {
    val rows = Multimodal.extractMetaReal(realAssets).collect()
    assert(rows.length == 40)
    rows.foreach { m =>
      assert(m.n_bytes > 0 && m.content_hash > 0)
      if (m.modality == "image") {
        val (ew, eh) = Multimodal.synthImageDims(m.asset_id)
        assert((m.width, m.height) == ((ew, eh)),
          s"asset ${m.asset_id}: decoded ${(m.width, m.height)} != " +
            s"synthesized ${(ew, eh)}")
        assert(m.duration_ms == 0)
      } else {
        assert(m.modality == "audio")
        val expectMs = math.round(
          Multimodal.synthWavSamples(m.asset_id) * 1000.0 / 8000.0).toInt
        assert(m.duration_ms == expectMs,
          s"asset ${m.asset_id}: WAV header ${m.duration_ms}ms != " +
            s"synthesized ${expectMs}ms")
        assert(m.width == 0 && m.height == 0)
      }
    }
  }

  test("real path: header-only dims equal a full raster decode") {
    realAssets.filter(col("modality") === "image")
      .select("content").as[Array[Byte]].collect().foreach { payload =>
        val (hw, hh) = Multimodal.RealMediaDecoder.imageDims(payload)
        val img = Multimodal.RealMediaDecoder.decodeImage(payload)
        assert((hw, hh) == ((img.getWidth, img.getHeight)))
      }
  }

  test("real resize: output bytes are valid PNG that re-decode to the " +
      "claimed fitted dimensions") {
    val out = Multimodal.resizeReal(realAssets, maxDim = 24).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      val (nw, nh) = (r.getInt(3), r.getInt(4))
      assert(nw <= w && nh <= h, "never upscale")
      if (math.max(w, h) > 24) assert(math.max(nw, nh) == 24)
      else assert((nw, nh) == ((w, h)))
      assert((w >= h) == (nw >= nh), "aspect ordering preserved")
      // the round-trip proof: the re-encoded payload is itself a
      // decodable PNG carrying exactly the claimed dimensions
      val img = Multimodal.RealMediaDecoder.decodeImage(
        r.getAs[Array[Byte]](5))
      assert((img.getWidth, img.getHeight) == ((nw, nh)))
    }
  }
}
