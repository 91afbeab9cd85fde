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
 * DECODE IS STUBBED: no codec libraries exist in this environment, so
 * "decoding" parses a deterministic synthetic container format (`GMM1`)
 * whose header and body are pure integer functions of the id. Everything
 * around the stub — the binary parquet schema, `mapPartitions` batch shape,
 * per-partition decoder reuse, exploded frame rows — is the real 100 TB
 * plumbing; swapping [[SyntheticCodec]] for a JNI/javacpp codec changes no
 * plan shape. Because the fake is arithmetic, DuckDB can recompute the
 * contract exactly, so even the stubbed path is hash-oracle-checked.
 */
object MultimodalOps {

  /** The deterministic fake codec — the `???` boundary a real deployment
    * replaces. Header layout: magic "GMM1" | type byte | w:i32 | h:i32 |
    * c:i32 | durMs:i64 | bodyLen:i32, then bodyLen pseudo-pixel bytes. */
  object SyntheticCodec {
    val Magic: Int = 0x474D4D31 // "GMM1"

    def width(id: Long): Int       = 16 + (id % 48).toInt
    def height(id: Long): Int      = 16 + ((id * 7) % 48).toInt
    def channels(mt: String): Int  = mt match { case "image" => 3; case "audio" => 1; case _ => 3 }
    def durationMs(id: Long, mt: String): Long =
      if (mt == "image") 0L else 1000L + (id % 60) * 500L
    def bodyLen(id: Long): Int     = 256 + (id % 256).toInt * 4
    /** pseudo-pixel at offset p — small-int arithmetic so any SQL engine can
      * recompute it without 64-bit wraparound. */
    def bodyByte(id: Long, p: Int): Int =
      (((id % 1000003L).toInt * 31 + p * 7 + 13) % 256)

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

    /** Stubbed pixel decode: returns the body bytes (a real codec would
      * return H×W×C pixels here). */
    def decodeBody(bytes: Array[Byte]): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, 29, bytes.length)
  }

  /** Attach a synthetic binary payload per id — the fixture loader standing
    * in for `spark.read.format("binaryFile")` over a media lake. */
  def syntheticMedia(ids: DataFrame, idCol: String, mediaType: String): Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, mediaType, SyntheticCodec.encode(id, mediaType))))
  }

  /** Parse header metadata out of the binary column (distributed, typed). */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r => SyntheticCodec.decodeMeta(r.id, r.content)))
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
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val body = SyntheticCodec.decodeBody(r.content)
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
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
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

  /** Sample frame timestamps every `everyMs` from video/audio payloads —
    * the explode step of a frame-extraction pipeline (a real codec would
    * attach the decoded frame bytes per row). */
  def frameSample(media: Dataset[MediaRow], everyMs: Long): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val meta = SyntheticCodec.decodeMeta(r.id, r.content)
        (0L to meta.duration_ms by everyMs).iterator.zipWithIndex
          .map { case (ts, i) => MediaFrame(r.id, i, ts) }
      }
    }
  }
}
