package graft.multimodal

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media object: opaque binary `content` + typed metadata columns.
  * This is the on-wire schema a 100 TB multimodal corpus would use —
  * parquet with a BINARY column and scalar metadata, partitioned by id. */
final case class MediaRow(id: Long, media_type: String, content: Array[Byte])

final case class MediaMeta(id: Long, media_type: String, format: String,
                           width: Int, height: Int, channels: Int,
                           duration_ms: Long, body_len: Int)

final case class MediaFeature(id: Long, d: Int, stripe_sum: Long, n: Long)

final case class MediaFrame(id: Long, frame_idx: Int, frame_ts_ms: Long)

final case class MediaResized(id: Long, out_w: Int, out_h: Int,
                              out_len: Int, body_sum: Long)

/**
 * Multimodal (image/audio/video) column operators. The reference has no
 * multimodal surface at all (SURVEY §2.7); this module supplies the
 * training-data-pipeline shape: binary payload column + typed metadata,
 * decode → feature-extract → frame-sample as distributed typed
 * transformations.
 *
 * Codecs: every operator dispatches per payload on magic bytes between a
 * REAL pure-JVM PPM (P6) image codec ([[MultimodalOps.PpmCodec]]: header
 * parse, pixel decode, true 2-D nearest-neighbor resize — no dependencies)
 * and a deterministic synthetic container format (`GMM1`) whose header and
 * body are pure integer functions of the id. The synthetic codec remains
 * the ORACLE fixture (DuckDB recomputes its arithmetic exactly, so the
 * mm_* queries hash-check end to end); the PPM path proves the same
 * distributed plumbing — binary parquet schema, `mapPartitions` batch
 * shape, per-partition decoder reuse, exploded frame rows — decodes real
 * bytes. Exotic formats (JPEG/MP4) would slot in as further magic
 * branches (JNI/javacpp) with no plan-shape change.
 */
object MultimodalOps {

  /** The deterministic fake codec — the `???` boundary a real deployment
    * replaces. Header layout: magic "GMM1" | type byte | w:i32 | h:i32 |
    * c:i32 | durMs:i64 | bodyLen:i32, then bodyLen pseudo-pixel bytes. */
  object SyntheticCodec {
    val Magic: Int = 0x474D4D31 // "GMM1"

    def width(id: Long): Int       = 16 + math.floorMod(id, 48L).toInt
    def height(id: Long): Int      = 16 + math.floorMod(id * 7, 48L).toInt
    def channels(mt: String): Int  = mt match { case "image" => 3; case "audio" => 1; case _ => 3 }
    def durationMs(id: Long, mt: String): Long =
      if (mt == "image") 0L else 1000L + (id % 60) * 500L
    // floorMod: total over negative ids (Java % would go sub-floor or
    // negative-length); identical to % for the nonneg oracle fixtures
    def bodyLen(id: Long): Int     = 256 + math.floorMod(id, 256L).toInt * 4
    /** pseudo-pixel at offset p — small-int arithmetic so any SQL engine can
      * recompute it without 64-bit wraparound. */
    def bodyByte(id: Long, p: Int): Int =
      math.floorMod(math.floorMod(id, 1000003L).toInt * 31 + p * 7 + 13, 256)

    def encode(id: Long, mt: String): Array[Byte] = {
      val n = bodyLen(id)
      val buf = ByteBuffer.allocate(4 + 1 + 4 + 4 + 4 + 8 + 4 + n)
      buf.putInt(Magic)
      buf.put((mt match { case "image" => 1; case "audio" => 2; case _ => 3 }).toByte)
      buf.putInt(width(id)).putInt(height(id)).putInt(channels(mt))
      buf.putLong(durationMs(id, mt)).putInt(n)
      var p = 0
      while (p < n) { buf.put(bodyByte(id, p).toByte); p += 1 }
      buf.array()
    }

    def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta = {
      val buf = ByteBuffer.wrap(bytes)
      require(buf.getInt() == Magic, s"bad magic for id=$id")
      val mt = buf.get() match { case 1 => "image"; case 2 => "audio"; case _ => "video" }
      MediaMeta(id, mt, "gmm1", buf.getInt(), buf.getInt(), buf.getInt(),
        buf.getLong(), buf.getInt())
    }

    /** GMM1 header length: magic(4) + type(1) + w/h/c(12) + durMs(8) +
      * bodyLen(4). */
    val HeaderLen: Int = 29

    /** Stubbed pixel decode: returns the DECLARED body (a real codec would
      * return H×W×C pixels here). Reading to bytes.length instead of the
      * header's bodyLen would silently fold any trailing padding into
      * feature sums. */
    def decodeBody(bytes: Array[Byte]): Array[Byte] = {
      val n = ByteBuffer.wrap(bytes, HeaderLen - 4, 4).getInt
      require(bytes.length >= HeaderLen + n, "truncated GMM1 body")
      java.util.Arrays.copyOfRange(bytes, HeaderLen, HeaderLen + n)
    }
  }

  /**
   * REAL pure-JVM codec for binary PPM (P6) images — zero dependencies:
   * ASCII header `P6 <w> <h> <maxval>` (whitespace-separated, `#` comments
   * legal) followed by w·h·3 raw RGB bytes. This closes the "decode an
   * image doesn't decode an image" gap: PPM payloads flow through the SAME
   * distributed operators as the synthetic fixtures — [[decodeMeta]],
   * [[mediaFeatures]] and [[resize]] dispatch on the payload's magic bytes,
   * and the PPM resize is a true 2-D nearest-neighbor resample of the
   * H×W×3 pixel grid. The synthetic codec remains the fixture generator
   * (its arithmetic body is what the DuckDB oracle can recompute).
   */
  object PpmCodec {
    def isPpm(bytes: Array[Byte]): Boolean =
      bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6'

    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"P6 body must be w*h*3 bytes, got ${rgb.length}")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(rgb, 0, out, header.length, rgb.length)
      out
    }

    /** Header scan: returns (width, height, bodyOffset). Maxval > 255
      * (2-byte samples) is rejected — single-byte RGB only. */
    private def header(bytes: Array[Byte]): (Int, Int, Int) = {
      var p = 2 // past "P6"
      def skipWs(): Unit = {
        var in = true
        while (in && p < bytes.length) {
          val c = bytes(p).toChar
          if (c == '#') while (p < bytes.length && bytes(p) != '\n') p += 1
          else if (c.isWhitespace) p += 1
          else in = false
        }
      }
      def int(): Int = {
        skipWs()
        var v = 0L; var any = false
        while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
          v = v * 10 + (bytes(p) - '0'); p += 1; any = true
          // cap before Int overflow: a crafted 10-digit dimension must be
          // a clean "malformed PPM" rejection, not a wrapped width that
          // defeats the body-length require and crashes in resize
          require(v <= Int.MaxValue, "malformed PPM header: field overflows")
        }
        require(any, "malformed PPM header")
        v.toInt
      }
      val w = int(); val h = int(); val maxval = int()
      require(w > 0 && h > 0, s"malformed PPM header: non-positive dims ${w}x$h")
      require(maxval > 0 && maxval < 256, s"unsupported PPM maxval $maxval")
      // exactly ONE whitespace byte separates maxval from the raster — a
      // junk byte here means the raster offset is wrong, not truncated
      require(p < bytes.length && bytes(p).toChar.isWhitespace,
        "malformed PPM header: raster must follow one whitespace byte")
      p += 1
      val body = w.toLong * h * 3
      require(body <= Int.MaxValue && bytes.length - p >= body, "truncated PPM body")
      (w, h, p)
    }

    def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta = {
      val (w, h, off) = header(bytes)
      MediaMeta(id, "image", "ppm", w, h, 3, 0L, bytes.length - off)
    }

    /** (width, height, H×W×3 pixel bytes). */
    def decodePixels(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      val (w, h, off) = header(bytes)
      (w, h, java.util.Arrays.copyOfRange(bytes, off, off + w * h * 3))
    }

    /** 2-D nearest-neighbor resample of the pixel grid to outW×outH. */
    def resize(w: Int, h: Int, pixels: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
      val out = new Array[Byte](outW * outH * 3)
      var y = 0
      while (y < outH) {
        val sy = ((y.toLong * h) / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = ((x.toLong * w) / outW).toInt
          val src = (sy * w + sx) * 3
          val dst = (y * outW + x) * 3
          out(dst) = pixels(src); out(dst + 1) = pixels(src + 1); out(dst + 2) = pixels(src + 2)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Magic-dispatched metadata decode: real PPM or the synthetic container. */
  private def metaOf(id: Long, bytes: Array[Byte]): MediaMeta =
    if (PpmCodec.isPpm(bytes)) PpmCodec.decodeMeta(id, bytes)
    else SyntheticCodec.decodeMeta(id, bytes)

  /** Magic-dispatched body decode (PPM → pixel bytes). */
  private def bodyOf(bytes: Array[Byte]): Array[Byte] =
    if (PpmCodec.isPpm(bytes)) PpmCodec.decodePixels(bytes)._3
    else SyntheticCodec.decodeBody(bytes)

  /** Attach a synthetic binary payload per id — the fixture loader standing
    * in for `spark.read.format("binaryFile")` over a media lake. */
  def syntheticMedia(ids: DataFrame, idCol: String, mediaType: String): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, mediaType, SyntheticCodec.encode(id, mediaType))))
  }

  /** Parse header metadata out of the binary column (distributed, typed);
    * dispatches per payload on magic bytes (PPM or synthetic). */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r => metaOf(r.id, r.content)))
  }

  /**
   * Fixed-dim feature extraction: summed pseudo-pixel value + count per
   * stripe (body offset mod `dim`), one output row per (id, stripe) — the
   * exploded layout hashes stably (exact integers, no float-rounding
   * semantics to match across engines) and joins cleanly with the
   * embeddings table. Batch shape: one decoder instance per partition,
   * streamed row-wise.
   */
  def mediaFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeature] = {
    require(dim >= 1, s"mediaFeatures needs dim >= 1, got $dim")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val body = bodyOf(r.content)
        val sums = new Array[Long](dim)
        val counts = new Array[Long](dim)
        var p = 0
        while (p < body.length) {
          val d = p % dim
          sums(d) += body(p) & 0xFF
          counts(d) += 1
          p += 1
        }
        (0 until dim).iterator.map(d => MediaFeature(r.id, d, sums(d), counts(d)))
      }
    }
  }

  /**
   * Nearest-neighbor resize to an `outW`×`outH` thumbnail: sample
   * `outW·outH` pseudo-pixels at stride positions `⌊i·n/k⌋` over the
   * decoded body (a real codec resamples the H×W×C pixel grid; the synthetic
   * body is 1-D, so the stride sampling IS its nearest-neighbor resize).
   * Output keeps the resized length and a body checksum rather than the
   * bytes so the contract hash-oracles exactly; the byte array is built and
   * summed the way a real thumbnail stage would, one decoder per partition.
   */
  def resize(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[MediaResized] = {
    require(outW >= 1 && outH >= 1, s"resize needs positive dims, got ${outW}x$outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (PpmCodec.isPpm(r.content)) {
          // real 2-D nearest-neighbor resample over the H×W×3 pixel grid
          val (w, h, px) = PpmCodec.decodePixels(r.content)
          val out = PpmCodec.resize(w, h, px, outW, outH)
          var i = 0; var sum = 0L
          while (i < out.length) { sum += out(i) & 0xFF; i += 1 }
          MediaResized(r.id, outW, outH, out.length, sum)
        } else {
          val body = SyntheticCodec.decodeBody(r.content)
          val k = outW * outH
          val out = new Array[Byte](k)
          var i = 0; var sum = 0L
          while (i < k) {
            out(i) = body(((i.toLong * body.length) / k).toInt)
            sum += out(i) & 0xFF
            i += 1
          }
          MediaResized(r.id, outW, outH, k, sum)
        }
      }
    }
  }

  /** Sample frame timestamps every `everyMs` from video/audio payloads —
    * the explode step of a frame-extraction pipeline (a real codec would
    * attach the decoded frame bytes per row). */
  def frameSample(media: Dataset[MediaRow], everyMs: Long): Dataset[MediaFrame] = {
    require(everyMs >= 1, s"frameSample needs everyMs >= 1, got $everyMs")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val meta = metaOf(r.id, r.content)
        // stills (duration 0) have NO frames — without the guard the
        // inclusive range emits one phantom frame per image in a mixed
        // corpus (the doc scopes this operator to video/audio payloads)
        if (meta.duration_ms <= 0L) Iterator.empty
        else (0L to meta.duration_ms by everyMs).iterator.zipWithIndex
          .map { case (ts, i) => MediaFrame(r.id, i, ts) }
      }
    }
  }
}
