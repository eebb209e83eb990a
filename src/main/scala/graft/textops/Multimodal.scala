package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, decoded in partition-sized batches.
 *
 * The decode is REAL (round-5, closing the repo's last stub): pure-JVM
 * fixed-offset parsing of codec-free container formats — no native
 * codec library needed, every header field and every content byte is
 * genuinely read out of the payload:
 *
 *  - image → BMP (`BM` magic, BITMAPINFOHEADER: width/height i32-LE at
 *    offsets 18/22, 24 bpp, bottom-up rows padded to 4 bytes);
 *  - audio → WAV (`RIFF…WAVE` canonical 44-byte header: PCM 16-bit
 *    mono, sample rate u32-LE at 24, data size u32-LE at 40);
 *  - video → YUV4MPEG2 / .y4m (plain-text `YUV4MPEG2 W… H… C444`
 *    header line, then `FRAME\n`-delimited raw w*h*3 planes).
 *
 * A production deployment swaps the three format branches for codec
 * calls (JPEG/FLAC/H.264 via JNI or `mapInPandas`+PIL); the Spark-side
 * contract — schema, partitioning, mapPartitions batch shape, feature
 * join — is identical. The reference engine has no media path; this is
 * the LLM-training-data extension (SURVEY §6).
 *
 * Oracle strategy: `sha` is md5 of the UPPERCASE HEX encoding of the
 * payload (Spark `hex()` and DuckDB `hex()` agree byte-for-byte), so a
 * raw hex sidecar lets DuckDB re-derive sha, byte length and every
 * header field by fixed-offset `substr` + `('0x…')::BIGINT` arithmetic
 * — the decode becomes hash-verified, not rows-only.
 */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      url: String,
      media_type: String, // image | audio | video
      payload: Array[Byte])

  /** Decoded per-media metadata + content features. Fields not carried
   *  by a format are None (the driver query coalesces to 0 — real
   *  values are always positive). */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Int,
      sha: String,                  // md5(hex(payload)) — see oracle note
      width: Option[Int],           // image, video
      height: Option[Int],
      sample_rate: Option[Int],     // audio
      n_frames: Option[Long],       // audio: PCM frames; video: container frames
      duration_ms: Option[Double],  // audio, video (video fixed 25 fps)
      features: Array[Float])       // 16-bin content histogram (decoded data only)

  // ---- little-endian byte writers/readers (the fixed-offset contract) --

  private def w16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def w32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private val HexDigits = "0123456789ABCDEF".toCharArray
  /** Uppercase hex — byte-identical to Spark's `hex()` and DuckDB's `hex()`. */
  private[textops] def hexUpper(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) {
      sb.append(HexDigits((b(i) >> 4) & 0xf)).append(HexDigits(b(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  // ---- synthetic payload generators (deterministic, REAL containers) --

  /** 24bpp bottom-up BMP with the canonical 54-byte header. */
  private[textops] def bmpPayload(width: Int, height: Int, seed: Long): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4 // rows pad to 4 bytes
    val dataSize = rowSize * height
    val out = new java.io.ByteArrayOutputStream(54 + dataSize)
    out.write('B'); out.write('M')
    out.write(w32(54 + dataSize)); out.write(w32(0)); out.write(w32(54))
    out.write(w32(40)); out.write(w32(width)); out.write(w32(height))
    out.write(w16(1)); out.write(w16(24)); out.write(w32(0)); out.write(w32(dataSize))
    out.write(w32(2835)); out.write(w32(2835)); out.write(w32(0)); out.write(w32(0))
    val rnd = new scala.util.Random(seed * 7919L + 13L)
    val row = new Array[Byte](rowSize) // pad bytes stay zero
    (0 until height).foreach { _ =>
      var i = 0
      while (i < width * 3) { row(i) = rnd.nextInt(256).toByte; i += 1 }
      out.write(row)
    }
    out.toByteArray
  }

  /** PCM 16-bit mono WAV with the canonical 44-byte RIFF header. */
  private[textops] def wavPayload(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val dataSize = nSamples * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes); out.write(w32(36 + dataSize)); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); out.write(w32(16))
    out.write(w16(1)); out.write(w16(1)) // PCM, mono
    out.write(w32(sampleRate)); out.write(w32(sampleRate * 2)) // byte rate
    out.write(w16(2)); out.write(w16(16)) // block align, bits/sample
    out.write("data".getBytes); out.write(w32(dataSize))
    val rnd = new scala.util.Random(seed * 6271L + 29L)
    (0 until nSamples).foreach(_ => out.write(w16(rnd.nextInt(65536))))
    out.toByteArray
  }

  /** YUV4MPEG2 C444 stream: text header + FRAME-delimited raw planes. */
  private[textops] def y4mPayload(width: Int, height: Int, frames: Int, seed: Long): Array[Byte] = {
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val fSize = width * height * 3
    val out = new java.io.ByteArrayOutputStream(header.length + frames * (6 + fSize))
    out.write(header)
    val rnd = new scala.util.Random(seed * 104729L + 7L)
    val frame = new Array[Byte](fSize)
    (0 until frames).foreach { _ =>
      out.write("FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      rnd.nextBytes(frame)
      out.write(frame)
    }
    out.toByteArray
  }

  /** Deterministic synthetic media table derived from any id column —
   *  payloads are REAL container files (BMP / WAV / y4m) with seeded
   *  content bytes, standing in for WARC media records. */
  def syntheticMedia(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val mt = Seq("image", "audio", "video")((id % 3).toInt)
      val payload = mt match {
        case "image" => bmpPayload(4 + (id % 13).toInt, 4 + (id % 11).toInt, id)
        case "audio" => wavPayload(Seq(8000, 16000, 22050, 44100)((id % 4).toInt),
          64 + (id % 160).toInt * 2, id)
        case _ => y4mPayload(4 + (id % 6).toInt * 2, 4 + (id % 4).toInt * 2,
          3 + (id % 6).toInt, id)
      }
      MediaRow(id, s"http://crawl.test/media/$id", mt, payload)
    }
  }

  // ---- decoders (pure JVM, fixed-offset / delimiter parses) -----------

  /** (width, height, pixel bytes with row padding stripped). */
  private[textops] def decodeBmp(p: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(p.length >= 54 && p(0) == 'B' && p(1) == 'M', "not a BMP payload")
    val dataOff = u32(p, 10).toInt
    val width = u32(p, 18).toInt
    val height = u32(p, 22).toInt
    require(u16(p, 28) == 24, s"unsupported bpp ${u16(p, 28)}")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val px = new Array[Byte](width * 3 * height)
    (0 until height).foreach { r =>
      System.arraycopy(p, dataOff + r * rowSize, px, r * width * 3, width * 3)
    }
    (width, height, px)
  }

  /** (sampleRate, channels, bitsPerSample, nFrames, 16-bit samples). */
  private[textops] def decodeWav(p: Array[Byte]): (Int, Int, Int, Long, Array[Short]) = {
    require(p.length >= 44 &&
      new String(p, 0, 4, "US-ASCII") == "RIFF" &&
      new String(p, 8, 4, "US-ASCII") == "WAVE", "not a WAV payload")
    val channels = u16(p, 22)
    val sampleRate = u32(p, 24).toInt
    val blockAlign = u16(p, 32)
    val bits = u16(p, 34)
    val dataSize = u32(p, 40).toInt
    val nFrames = dataSize / blockAlign
    val samples = new Array[Short](dataSize / 2)
    var i = 0
    while (i < samples.length) { samples(i) = u16(p, 44 + i * 2).toShort; i += 1 }
    (sampleRate, channels, bits, nFrames, samples)
  }

  /** (width, height, frame payloads — the raw C444 planes per FRAME). */
  private[textops] def decodeY4m(p: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
    val nl = p.indexOf('\n'.toByte)
    require(nl > 0, "no y4m header line")
    val header = new String(p, 0, nl, "US-ASCII")
    require(header.startsWith("YUV4MPEG2"), "not a y4m payload")
    require(header.contains("C444"), s"unsupported chroma in: $header")
    def tag(t: Char): Int = header.split(' ')
      .collectFirst { case s if s.nonEmpty && s.head == t => s.tail.takeWhile(_.isDigit).toInt }
      .getOrElse(throw new IllegalArgumentException(s"missing $t tag: $header"))
    val (width, height) = (tag('W'), tag('H'))
    val fSize = width * height * 3
    val stride = 6 + fSize // "FRAME\n" + planes
    val body = p.length - (nl + 1)
    require(body % stride == 0, s"ragged y4m body: $body % $stride != 0")
    val frames = (0 until body / stride).map { i =>
      val fr = new Array[Byte](fSize)
      System.arraycopy(p, nl + 1 + i * stride + 6, fr, 0, fSize)
      fr
    }
    (width, height, frames)
  }

  /** Normalized 16-bin histogram over 0-255 content values — the
   *  featurize step shared by all three decoders (content bytes only,
   *  headers excluded: a header tweak must not move the features). */
  private def hist16(values: Iterator[Int]): Array[Float] = {
    val f = new Array[Float](16)
    var n = 0
    values.foreach { v => f(v >> 4) += 1f; n += 1 }
    if (n > 0) { var j = 0; while (j < 16) { f(j) /= n; j += 1 } }
    f
  }

  /** Full decode of one media row — header meta + content features. */
  private[textops] def decode(m: MediaRow): MediaFeatures = {
    val sha = graft.util.TextUtil.md5Hex(hexUpper(m.payload))
    m.media_type match {
      case "image" =>
        val (w, h, px) = decodeBmp(m.payload)
        MediaFeatures(m.media_id, m.media_type, m.payload.length, sha,
          Some(w), Some(h), None, None, None,
          hist16(px.iterator.map(_ & 0xff)))
      case "audio" =>
        val (sr, _, _, nFrames, samples) = decodeWav(m.payload)
        MediaFeatures(m.media_id, m.media_type, m.payload.length, sha,
          None, None, Some(sr), Some(nFrames), Some(nFrames * 1000.0 / sr),
          hist16(samples.iterator.map(s => math.min(math.abs(s.toInt) >> 11, 15) << 4)))
      case _ =>
        val (w, h, frames) = decodeY4m(m.payload)
        MediaFeatures(m.media_id, m.media_type, m.payload.length, sha,
          Some(w), Some(h), None, Some(frames.length.toLong),
          Some(frames.length * 1000.0 / 25.0),
          hist16(frames.iterator.flatMap(_.iterator.map(_ & 0xff))))
    }
  }

  /** Feature extraction over the binary column; mapPartitions keeps
   *  decoder state per task (a real codec would amortize model/codec
   *  init the same way — the mapPartitions boundary IS the batch
   *  shape). Malformed payloads throw — a production pipeline wraps
   *  this in a try→quarantine-table branch rather than masking them. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: initialize codec/model once per partition here
      it.map(decode)
    }
  }

  /** Frame sampling for video payloads: every k-th FRAME of the y4m
   *  stream, emitted as (media_id, frame_idx, frame_sha) with
   *  frame_sha = md5(hex(frame planes)) — DuckDB re-derives it from
   *  the raw hex sidecar by offset arithmetic. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.media_type == "video").flatMap { m =>
      val (_, _, frames) = decodeY4m(m.payload)
      frames.iterator.zipWithIndex.collect {
        case (fr, i) if i % everyK == 0 =>
          (m.media_id, i, graft.util.TextUtil.md5Hex(hexUpper(fr)))
      }
    }.toDF("media_id", "frame_idx", "frame_sha")
  }
}
