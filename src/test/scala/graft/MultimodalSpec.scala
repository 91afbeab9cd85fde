package graft

import graft.multimodal.MultimodalOps._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val ids = Seq(0L, 3L, 47L, 255L, 1000L)

  test("encode/decode round trip: header fields match the codec arithmetic") {
    val media = syntheticMedia(ids.toDF("doc_id"), "doc_id", "video")
    val metas = decodeMeta(media).collect().map(m => m.id -> m).toMap
    ids.foreach { id =>
      val m = metas(id)
      assert(m.width === 16 + (id % 48).toInt)
      assert(m.height === 16 + ((id * 7) % 48).toInt)
      assert(m.channels === 3)
      assert(m.duration_ms === 1000L + (id % 60) * 500L)
      assert(m.body_len === 256 + (id % 256).toInt * 4)
      assert(m.media_type === "video")
    }
  }

  test("binary payload layout: 29-byte header + body, body bytes match formula") {
    val row = syntheticMedia(Seq(42L).toDF("doc_id"), "doc_id", "image").collect().head
    val body = SyntheticCodec.decodeBody(row.content)
    assert(row.content.length === 29 + SyntheticCodec.bodyLen(42L))
    (0 until body.length).foreach { p =>
      assert((body(p) & 0xFF) === SyntheticCodec.bodyByte(42L, p))
    }
  }

  test("mediaFeatures: stripe sums match a direct fold") {
    val id = 7L
    val feats = mediaFeatures(syntheticMedia(Seq(id).toDF("doc_id"), "doc_id", "image"), dim = 8)
      .collect().map(f => f.d -> (f.stripe_sum, f.n)).toMap
    val n = SyntheticCodec.bodyLen(id)
    val expected = (0 until n).groupBy(_ % 8)
      .map { case (d, ps) => d -> (ps.map(p => SyntheticCodec.bodyByte(id, p).toLong).sum, ps.size.toLong) }
    assert(feats === expected)
  }

  test("frameSample: one frame per 250ms inclusive of 0 and duration") {
    val id = 10L
    val frames = frameSample(syntheticMedia(Seq(id).toDF("doc_id"), "doc_id", "video"), 250)
      .collect().sortBy(_.frame_idx)
    val dur = SyntheticCodec.durationMs(id, "video")
    assert(frames.length === (dur / 250 + 1).toInt)
    assert(frames.head.frame_ts_ms === 0L)
    assert(frames.last.frame_ts_ms === dur)
  }

  test("resize: nearest-neighbor stride sample, checksum matches a direct decode") {
    val id = 300L // bodyLen = 256 + 44*4 = 432
    val r = resize(syntheticMedia(Seq(id).toDF("doc_id"), "doc_id", "image"), 8, 8)
      .collect().head
    assert(r.out_w === 8 && r.out_h === 8 && r.out_len === 64)
    val n = SyntheticCodec.bodyLen(id)
    val expected = (0 until 64).map(i => SyntheticCodec.bodyByte(id, ((i.toLong * n) / 64).toInt).toLong).sum
    assert(r.body_sum === expected)
  }

  test("distributed path: features over the documents table are non-empty and 8-striped") {
    val docs = spark.read.parquet(s"$SF/documents.parquet")
    val feats = mediaFeatures(syntheticMedia(docs, "doc_id", "image"), dim = 8)
    val counts = feats.groupBy("id").count().select("count").distinct().as[Long].collect()
    assert(counts.toSeq === Seq(8L))
  }

  // --- the REAL codec: PPM (P6) payloads through the same operators ---

  /** 4×2 RGB test card: distinct per-pixel channel values. */
  private def testCard(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 11 + 5) % 256).toByte)

  test("PPM: encode → decodeMeta/decodePixels round-trips real bytes") {
    val (w, h) = (4, 2)
    val px = testCard(w, h)
    val bytes = PpmCodec.encode(w, h, px)
    // header is genuine ASCII PPM — any external viewer would accept it
    assert(new String(bytes.take(2), "US-ASCII") == "P6")
    val media = Seq((77L, "image", bytes)).toDF("id", "media_type", "content")
      .as[graft.multimodal.MediaRow]
    val m = decodeMeta(media).collect().head
    assert(m.format == "ppm" && m.width == w && m.height == h &&
      m.channels == 3 && m.duration_ms == 0L && m.body_len == w * h * 3)
    val (dw, dh, dpx) = PpmCodec.decodePixels(bytes)
    assert(dw == w && dh == h && dpx.toSeq == px.toSeq)
    // comments and extra whitespace in the header are legal PPM
    val commented = ("P6\n# test card\n 4 2\n255\n".getBytes("US-ASCII") ++ px)
    assert(PpmCodec.decodePixels(commented)._3.toSeq == px.toSeq)
  }

  test("PPM: true 2-D nearest-neighbor resize (downscale picks grid corners)") {
    val (w, h) = (4, 4)
    // pixel (x, y) has R = 16*y + x so sampled coordinates are readable
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) px((y * w + x) * 3) = (16 * y + x).toByte
    val out = PpmCodec.resize(w, h, px, 2, 2)
    // NN at ⌊i·4/2⌋: samples x ∈ {0, 2}, y ∈ {0, 2}
    val rs = (0 until 4).map(i => out(i * 3) & 0xFF)
    assert(rs == Seq(0, 2, 32, 34))
    // identity resize reproduces the input grid exactly
    assert(PpmCodec.resize(w, h, px, w, h).toSeq == px.toSeq)
  }

  test("PPM: mediaFeatures and resize run the same distributed operators") {
    val rows = Seq(1L, 2L, 3L).map(id =>
      (id, "image", PpmCodec.encode(4, 2, testCard(4, 2))))
    val media = rows.toDF("id", "media_type", "content").as[graft.multimodal.MediaRow]
    val feats = mediaFeatures(media, dim = 4).collect()
    assert(feats.length == 12 && feats.map(_.n).sum == 3L * 4 * 2 * 3)
    // stripe sums fold the REAL pixel bytes
    val expected = (0 until 24).groupBy(_ % 4)
      .map { case (d, ps) => d -> ps.map(p => ((p * 11 + 5) % 256).toLong).sum }
    feats.filter(_.id == 1L).foreach(f => assert(f.stripe_sum == expected(f.d)))
    val r = resize(media, 2, 2).collect().head
    assert(r.out_len == 2 * 2 * 3) // H×W×3 thumbnail, not a 1-D stride
    // mixed corpus: synthetic and PPM payloads in ONE dataset decode per-row
    val mixed = media.union(syntheticMedia(Seq(9L).toDF("doc_id"), "doc_id", "image"))
    val metas = decodeMeta(mixed).collect().map(m => m.id -> m.format).toMap
    assert(metas(1L) == "ppm" && metas(9L) == "gmm1")
  }

  test("malformed PPM payloads reject cleanly, never wrap or mis-offset") {
    import graft.multimodal.MultimodalOps.PpmCodec
    def bytes(s: String, tail: Array[Byte] = Array.empty): Array[Byte] =
      s.getBytes("US-ASCII") ++ tail
    // dimension overflow: 1431655766*3 wraps an Int to 2 — must be a clean
    // rejection, not a 2-byte raster tagged a billion pixels wide
    intercept[IllegalArgumentException](
      PpmCodec.decodeMeta(1L, bytes("P6 1431655766 1 255\n", Array[Byte](0, 0))))
    intercept[IllegalArgumentException]( // 10-digit width wraps to 1
      PpmCodec.decodeMeta(1L, bytes("P6 4294967297 1 255\n", Array[Byte](0, 0, 0))))
    intercept[IllegalArgumentException]( // zero dims
      PpmCodec.decodeMeta(1L, bytes("P6 0 0 255\n")))
    intercept[IllegalArgumentException]( // junk byte where whitespace must be
      PpmCodec.decodeMeta(1L, bytes("P6 1 1 255X", Array.fill[Byte](4)(0))))
    // a conformant 1x1 image still parses
    val ok = PpmCodec.decodeMeta(1L, bytes("P6 1 1 255\n", Array[Byte](1, 2, 3)))
    assert(ok.width == 1 && ok.height == 1)
  }

  test("GMM1 decodeBody honors the declared bodyLen; trailing padding is ignored") {
    import graft.multimodal.MultimodalOps.SyntheticCodec
    val enc = SyntheticCodec.encode(3L, "image")
    val padded = enc ++ Array.fill[Byte](16)(0x7F.toByte)
    assert(SyntheticCodec.decodeBody(padded).sameElements(SyntheticCodec.decodeBody(enc)),
      "trailing bytes past the declared bodyLen must not enter feature sums")
  }

  test("frameSample: stills emit NO frames; argument contracts reject at the driver") {
    val mixed = syntheticMedia(Seq(1L).toDF("doc_id"), "doc_id", "video")
      .union(syntheticMedia(Seq(2L).toDF("doc_id"), "doc_id", "image"))
    val frames = frameSample(mixed, 250L).collect().map(_.id).distinct
    assert(frames.sameElements(Array(1L)), "an image (duration 0) has no frames")
    intercept[IllegalArgumentException](frameSample(mixed, 0L))
    intercept[IllegalArgumentException](mediaFeatures(mixed, dim = 0))
    intercept[IllegalArgumentException](resize(mixed, -1, 8))
  }
}
