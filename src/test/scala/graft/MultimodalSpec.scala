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
}
