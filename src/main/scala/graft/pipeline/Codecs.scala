package graft.pipeline

import java.util.zip.Inflater

/**
 * Pure-JVM decoders for real public media formats — PNG, BMP, WAV — used by
 * [[MultimodalOps.decode]]. Each parser reads the container header for the
 * typed metadata (dimensions / channels) and computes an 8-float feature
 * vector from the payload's content bytes, so the decode step is a real
 * codec for real files while unknown payloads still fall back to the
 * deterministic FNV stub (which the synthetic-corpus oracle replays).
 *
 * Formats are parsed from their public specifications:
 *  - PNG: 8-byte signature, big-endian chunk layout, IHDR fields
 *    (width/height/bit-depth/color-type), zlib IDAT streams.
 *  - BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian.
 *  - WAV: RIFF container, fmt + data chunks, little-endian.
 */
object Codecs {

  /** Decoded media: dimensions (for audio: sampleRate x samplesPerChannel),
    * channel count, 8-float content feature. */
  final case class Decoded(format: String, width: Int, height: Int,
      nChannels: Int, feature: Array[Float])

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** 8-bucket mean of a byte range, normalised to [0,1] — the cheap
    * content feature shared by the image paths. */
  private def bucketMeans(bytes: Array[Byte], from: Int, until: Int): Array[Float] = {
    val n = math.max(until - from, 0)
    if (n == 0) return Array.fill(8)(0.0f)
    val sums = new Array[Long](8)
    val cnts = new Array[Long](8)
    var i = 0
    while (i < n) {
      val bucket = i * 8 / n
      sums(bucket) += (bytes(from + i) & 0xFF)
      cnts(bucket) += 1
      i += 1
    }
    Array.tabulate(8)(b => if (cnts(b) == 0) 0.0f
      else (sums(b).toDouble / cnts(b) / 255.0).toFloat)
  }

  // ------------------------------------------------------------------ PNG

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  def isPng(b: Array[Byte]): Boolean =
    b != null && b.length >= 33 && PngSig.indices.forall(i => b(i) == PngSig(i))

  /** PNG: IHDR dimensions + color-type channel count; feature = 8-bucket
    * means of the INFLATED (filtered-domain) IDAT bytes. */
  def parsePng(b: Array[Byte]): Option[Decoded] = {
    if (!isPng(b)) return None
    // first chunk must be IHDR: length at 8, type at 12
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val width = beInt(b, 16)
    val height = beInt(b, 20)
    val colorType = b(25) & 0xFF
    val nChannels = colorType match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    if (width <= 0 || height <= 0) return None
    // walk chunks, concatenate IDAT payloads, inflate
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    var ok = true
    while (ok && off + 8 <= b.length) {
      val len = beInt(b, off)
      val typ = new String(b, off + 4, 4, "US-ASCII")
      if (len < 0 || off + 8 + len > b.length) ok = false
      else {
        if (typ == "IDAT") idat.write(b, off + 8, len)
        if (typ == "IEND") ok = false
        off += 8 + len + 4 // length + type + data + crc
      }
    }
    val feature =
      if (idat.size == 0) Array.fill(8)(0.0f)
      else try {
        val inf = new Inflater()
        inf.setInput(idat.toByteArray)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inf.finished() && !inf.needsInput()) {
          val n = inf.inflate(buf)
          if (n > 0) out.write(buf, 0, n)
        }
        inf.end()
        val raw = out.toByteArray
        bucketMeans(raw, 0, raw.length)
      } catch { case _: Exception => Array.fill(8)(0.0f) }
    Some(Decoded("png", width, height, nChannels, feature))
  }

  // ------------------------------------------------------------------ BMP

  def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length >= 54 && b(0) == 'B' && b(1) == 'M'

  /** Uncompressed BITMAPINFOHEADER BMP: dimensions from the header, pixel
    * stats straight off the (raw, bottom-up) pixel array. */
  def parseBmp(b: Array[Byte]): Option[Decoded] = {
    if (!isBmp(b)) return None
    val pixelOffset = leInt(b, 10)
    val headerSize = leInt(b, 14)
    if (headerSize < 40) return None // core headers unsupported
    val width = leInt(b, 18)
    val height = math.abs(leInt(b, 22)) // negative = top-down
    val bpp = leShort(b, 28)
    val compression = leInt(b, 30)
    if (width <= 0 || height == 0 || compression != 0) return None
    val nChannels = bpp match {
      case 8 => 1
      case 24 => 3
      case 32 => 4
      case _ => return None
    }
    if (pixelOffset < 54 || pixelOffset > b.length) return None
    Some(Decoded("bmp", width, height, nChannels,
      bucketMeans(b, pixelOffset, b.length)))
  }

  // ------------------------------------------------------------------ WAV

  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** PCM WAV: width = sample rate, height = samples per channel, channels
    * from the fmt chunk; feature = 8-bucket RMS of 16-bit samples (mean
    * byte level for 8-bit audio). */
  def parseWav(b: Array[Byte]): Option[Decoded] = {
    if (!isWav(b)) return None
    var off = 12
    var channels = -1; var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (channels < 0 || dataOff < 0)) {
      val typ = new String(b, off, 4, "US-ASCII")
      val len = leInt(b, off + 4)
      if (len < 0 || off + 8 + len > b.length) return None
      typ match {
        case "fmt " if len >= 16 =>
          channels = leShort(b, off + 8 + 2)
          sampleRate = leInt(b, off + 8 + 4)
          bits = leShort(b, off + 8 + 14)
        case "data" =>
          dataOff = off + 8; dataLen = len
        case _ =>
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (channels <= 0 || sampleRate <= 0 || dataOff < 0) return None
    val bytesPerSample = math.max(bits / 8, 1)
    val nFrames = dataLen / (bytesPerSample * channels)
    val feature =
      if (bits == 16) {
        // 8-bucket RMS over signed 16-bit samples, normalised by 2^15
        val nSamples = dataLen / 2
        val sums = new Array[Double](8); val cnts = new Array[Long](8)
        var i = 0
        while (i < nSamples) {
          val v = (leShort(b, dataOff + 2 * i).toShort).toDouble / 32768.0
          val bucket = i * 8 / math.max(nSamples, 1)
          sums(bucket) += v * v; cnts(bucket) += 1
          i += 1
        }
        Array.tabulate(8)(k => if (cnts(k) == 0) 0.0f
          else math.sqrt(sums(k) / cnts(k)).toFloat)
      } else bucketMeans(b, dataOff, dataOff + math.max(dataLen, 0))
    Some(Decoded("wav", sampleRate, nFrames, channels, feature))
  }

  /** Dispatch on magic bytes; None = unknown format (caller falls back to
    * the deterministic stub). */
  def parse(b: Array[Byte]): Option[Decoded] =
    if (isPng(b)) parsePng(b)
    else if (isBmp(b)) parseBmp(b)
    else if (isWav(b)) parseWav(b)
    else None
}
