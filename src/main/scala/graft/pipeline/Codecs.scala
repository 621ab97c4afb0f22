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
      val bucket = (i.toLong * 8 / n).toInt // long: i*8 wraps above 256M
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
    // walk chunks, concatenate IDAT payloads, inflate. Long offset math:
    // a crafted chunk length near Int.MaxValue must fail the bounds guard,
    // not wrap around it.
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8L
    var ok = true
    while (ok && off + 8 <= b.length) {
      val len = beInt(b, off.toInt)
      val typ = new String(b, off.toInt + 4, 4, "US-ASCII")
      if (len < 0 || off + 8 + len > b.length) ok = false
      else {
        if (typ == "IDAT") idat.write(b, off.toInt + 8, len)
        if (typ == "IEND") ok = false
        off += 8L + len + 4 // length + type + data + crc
      }
    }
    // cap = declared raw scanline size from the ACTUAL bit depth (1..16
    // bits per sample), doubled for Adam7 interlacing (7 sub-images carry
    // extra filter bytes) — a valid 16-bit or interlaced PNG must not be
    // zeroed by a cap sized for 8-bit. A decompression bomb beyond the cap
    // throws inside inflateAll and falls back to the zero feature (header
    // metadata stays valid). Saturating clamps keep every product in Long.
    val bitDepth = math.max(b(24) & 0xFF, 1)
    val interlaced = (b(28) & 0xFF) != 0
    val bytesPerRow = math.min(
      (width.toLong * nChannels * bitDepth + 7) / 8, Int.MaxValue.toLong)
    val rawBound = math.min(
      height.toLong * (bytesPerRow + 1), Int.MaxValue.toLong)
    // Bound by BOTH the declared-geometry size AND the maximum deflate
    // expansion of the actual IDAT payload (~1032:1 for stored deflate):
    // a crafted IHDR declaring huge width/height must not let a small
    // deflate bomb force a multi-GB allocation.
    val declaredCap = math.min(
      (if (interlaced) rawBound * 2 else rawBound) + 65536L,
      Int.MaxValue.toLong)
    val cap = math.min(declaredCap, idat.size.toLong * 1032L + 65536L)
    val feature =
      if (idat.size == 0) Array.fill(8)(0.0f)
      else try {
        val raw = inflateAll(idat.toByteArray, cap)
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
    // height <= 0, not == 0: math.abs(Int.MinValue) IS Int.MinValue
    if (width <= 0 || height <= 0 || compression != 0) return None
    val nChannels = bpp match {
      case 8 => 1
      case 24 => 3
      case 32 => 4
      case _ => return None
    }
    if (pixelOffset < 54 || pixelOffset > b.length) return None
    // declared pixel array must fit the payload (Long math: crafted dims
    // near Int.MaxValue must fail here, not pose as valid metadata; the
    // pixel-count bound comes first so the stride product cannot wrap)
    if (width.toLong * height > b.length) return None
    val strideL = ((width.toLong * (bpp / 8) + 3) / 4) * 4
    if (pixelOffset.toLong + strideL * height > b.length) return None
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
    // Long offset math: a crafted chunk length near Int.MaxValue must fail
    // the bounds guard, not wrap around it into OOB reads
    var off = 12L
    var channels = -1; var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (channels < 0 || dataOff < 0)) {
      val typ = new String(b, off.toInt, 4, "US-ASCII")
      val len = leInt(b, off.toInt + 4)
      if (len < 0 || off + 8 + len > b.length) return None
      typ match {
        case "fmt " if len >= 16 =>
          channels = leShort(b, off.toInt + 8 + 2)
          sampleRate = leInt(b, off.toInt + 8 + 4)
          bits = leShort(b, off.toInt + 8 + 14)
        case "data" =>
          dataOff = off.toInt + 8; dataLen = len
        case _ =>
      }
      off += 8L + len + (len & 1) // chunks are word-aligned
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
          val bucket = (i.toLong * 8 / math.max(nSamples, 1)).toInt
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

  // ------------------------------------------------- grayscale pixel decode

  /** Grayscale image: row-major top-down luma in [0,1]. */
  final case class Gray(width: Int, height: Int, px: Array[Float])

  /** Inflate with a hard output cap. `maxOut` bounds decompression-bomb
    * payloads (a few KB of deflate can declare GBs of output); a stream
    * that exceeds the cap, requests a preset dictionary, or stops making
    * progress without finishing is malformed for our purposes and throws —
    * every caller catches and returns None, honouring the NULL-for-
    * undecodable contract instead of hanging or OOMing an executor. */
  private def inflateAll(data: Array[Byte], maxOut: Long): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var stalled = false
    while (!inf.finished() && !inf.needsInput() && !stalled) {
      val n = inf.inflate(buf)
      if (n > 0) {
        if (out.size().toLong + n > maxOut)
          throw new java.util.zip.DataFormatException("inflate output cap")
        out.write(buf, 0, n)
      } else if (inf.needsDictionary()) {
        throw new java.util.zip.DataFormatException("preset dictionary")
      } else if (!inf.finished() && !inf.needsInput()) {
        // no progress, no declared reason: malformed stream
        stalled = true
      }
    }
    inf.end()
    if (stalled) throw new java.util.zip.DataFormatException("inflate stall")
    out.toByteArray
  }

  /** Full PNG pixel decode for 8-bit-depth gray / RGB / gray+alpha / RGBA:
    * walks IDAT, inflates, reverses the per-scanline filters (None / Sub /
    * Up / Average / Paeth, PNG spec §9), averages the colour channels.
    * Palette and 16-bit images return None (callers fall back). */
  def pngGray(b: Array[Byte]): Option[Gray] = {
    if (!isPng(b)) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val width = beInt(b, 16)
    val height = beInt(b, 20)
    val bitDepth = b(24) & 0xFF
    val colorType = b(25) & 0xFF
    if (width <= 0 || height <= 0 || bitDepth != 8) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case _ => return None // palette needs PLTE handling
    }
    if ((b(26) & 0xFF) != 0 || (b(27) & 0xFF) != 0 || (b(28) & 0xFF) != 0)
      return None // non-default compression/filter/interlace
    // Long arithmetic throughout the header math: a crafted chunk length or
    // width x height near Int.MaxValue must fail these guards, not wrap
    // around them into out-of-bounds reads / bogus allocations. The pixel
    // count is bounded FIRST (product <= 2^62, cannot itself wrap) so the
    // scanline product below stays well inside Long range.
    if (width.toLong * height > Int.MaxValue) return None
    val strideL = width.toLong * channels
    val needL = height.toLong * (strideL + 1) // filter byte + scanline per row
    if (needL > Int.MaxValue) return None
    val stride = strideL.toInt
    val need = needL.toInt
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8L
    var walking = true
    while (walking && off + 8 <= b.length) {
      val len = beInt(b, off.toInt)
      val typ = new String(b, off.toInt + 4, 4, "US-ASCII")
      if (len < 0 || off + 8 + len > b.length) walking = false
      else {
        if (typ == "IDAT") idat.write(b, off.toInt + 8, len)
        if (typ == "IEND") walking = false
        off += 8L + len + 4
      }
    }
    if (idat.size == 0) return None
    val raw = try inflateAll(idat.toByteArray, need)
      catch { case _: Exception => return None }
    if (raw.length < need) return None
    val recon = new Array[Int](height * stride)
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xFF
      var i = 0
      while (i < stride) {
        val x = raw(y * (stride + 1) + 1 + i) & 0xFF
        val left = if (i >= channels) recon(y * stride + i - channels) else 0
        val up = if (y > 0) recon((y - 1) * stride + i) else 0
        val ul = if (y > 0 && i >= channels)
          recon((y - 1) * stride + i - channels) else 0
        val v = filter match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        recon(y * stride + i) = v & 0xFF
        i += 1
      }
      y += 1
    }
    val colourCh = if (colorType == 2 || colorType == 6) 3 else 1
    val px = new Array[Float](width * height)
    var p = 0
    while (p < width * height) {
      var s = 0
      var c = 0
      while (c < colourCh) { s += recon(p * channels + c); c += 1 }
      px(p) = s.toFloat / (colourCh * 255.0f)
      p += 1
    }
    Some(Gray(width, height, px))
  }

  /** Uncompressed BMP pixel decode (8 / 24 / 32 bpp): rows are stored
    * bottom-up (top-down when the header height is negative) and padded to
    * 4-byte boundaries; colour channels are averaged. */
  def bmpGray(b: Array[Byte]): Option[Gray] = {
    if (!isBmp(b)) return None
    val pixelOffset = leInt(b, 10)
    if (leInt(b, 14) < 40) return None
    val width = leInt(b, 18)
    val rawHeight = leInt(b, 22)
    val height = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val bpp = leShort(b, 28)
    // height <= 0, not == 0: math.abs(Int.MinValue) IS Int.MinValue
    if (width <= 0 || height <= 0 || leInt(b, 30) != 0) return None
    val bytesPerPx = bpp match {
      case 8 => 1; case 24 => 3; case 32 => 4
      case _ => return None
    }
    // Long arithmetic: crafted width/height/offset values near Int.MaxValue
    // must fail the bounds check, not wrap around it into OOB reads. The
    // pixel count is bounded FIRST (each pixel needs >= 1 payload byte and
    // the product <= 2^62 cannot itself wrap), which keeps the stride
    // product below inside Long range (strideL*height < 8 * b.length).
    if (width.toLong * height > b.length) return None
    val strideL = ((width.toLong * bytesPerPx + 3) / 4) * 4
    if (pixelOffset < 54 || pixelOffset.toLong + strideL * height > b.length)
      return None
    val stride = strideL.toInt // fits: stride * height <= b.length
    val colourCh = math.min(bytesPerPx, 3)
    val px = new Array[Float](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      var x = 0
      while (x < width) {
        var s = 0
        var c = 0
        while (c < colourCh) {
          s += b(pixelOffset + srcRow * stride + x * bytesPerPx + c) & 0xFF
          c += 1
        }
        px(y * width + x) = s.toFloat / (colourCh * 255.0f)
        x += 1
      }
      y += 1
    }
    Some(Gray(width, height, px))
  }

  /** Grayscale decode dispatch (PNG / BMP only — audio has no pixels). */
  def gray(b: Array[Byte]): Option[Gray] =
    if (isPng(b)) pngGray(b)
    else if (isBmp(b)) bmpGray(b)
    else None

  // --------------------------------------------------- perceptual hashing

  /** Box-average downsample to exactly (w x h) cells. */
  def downsample(g: Gray, w: Int, h: Int): Array[Float] = {
    val out = new Array[Float](w * h)
    var cy = 0
    while (cy < h) {
      val y0 = cy * g.height / h
      val y1 = math.max((cy + 1) * g.height / h, y0 + 1)
      var cx = 0
      while (cx < w) {
        val x0 = cx * g.width / w
        val x1 = math.max((cx + 1) * g.width / w, x0 + 1)
        var s = 0.0
        var y = y0
        while (y < math.min(y1, g.height)) {
          var x = x0
          while (x < math.min(x1, g.width)) { s += g.px(y * g.width + x); x += 1 }
          y += 1
        }
        out(cy * w + cx) =
          (s / ((math.min(y1, g.height) - y0) * (math.min(x1, g.width) - x0))).toFloat
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** aHash (average hash): 8x8 box downsample, bit p set iff cell p is
    * strictly brighter than the mean; cell (0,0) lands in bit 63 so the
    * hash reads top-left-first. Robust to uniform brightness/contrast
    * shifts; 64-bit signature feeds the same band-join machinery as
    * SimHash. */
  def aHash64(g: Gray): Long = {
    val cells = downsample(g, 8, 8)
    var mean = 0.0
    cells.foreach(mean += _)
    mean /= 64.0
    var h = 0L
    var p = 0
    while (p < 64) {
      if (cells(p) > mean) h |= (1L << (63 - p))
      p += 1
    }
    h
  }

  /** dHash (difference hash): 9x8 downsample, bit p (row r, col c) set iff
    * cell (r,c) is brighter than its right neighbour (r,c+1); same
    * top-left-first bit order as [[aHash64]]. */
  def dHash64(g: Gray): Long = {
    val cells = downsample(g, 9, 8)
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c) > cells(r * 9 + c + 1)) h |= (1L << (63 - (r * 8 + c)))
        c += 1
      }
      r += 1
    }
    h
  }

  /** Static kernels for the Catalyst expressions (`ahash64`/`dhash64`):
    * boxed null when the payload is not a decodable image. */
  // The NULL-for-undecodable contract is enforced here, not just by the
  // header guards: these wrappers run inside codegen'd expressions over
  // arbitrary corpus bytes, and ANY residual decoder defect must cost one
  // NULL hash, never a task (catch is Exception — errors like OOM still
  // propagate).
  def aHash64OrNull(b: Array[Byte]): java.lang.Long =
    try gray(b) match {
      case Some(g) => java.lang.Long.valueOf(aHash64(g))
      case None => null
    } catch { case _: Exception => null }
  def dHash64OrNull(b: Array[Byte]): java.lang.Long =
    try gray(b) match {
      case Some(g) => java.lang.Long.valueOf(dHash64(g))
      case None => null
    } catch { case _: Exception => null }

  /** Encode a grayscale image as a REAL 24-bpp uncompressed BMP (the
    * format [[bmpGray]] reads back bit-for-bit) — used by tests and the
    * synthetic image corpora of the oracle queries.
    * @param px row-major TOP-DOWN byte luma */
  def encodeBmp24(px: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(px.length == width * height, "px must be width*height lumas")
    val stride = ((width * 3 + 3) / 4) * 4
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize)
    def putLeInt(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte
      out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLeInt(2, 54 + dataSize)  // file size
    putLeInt(10, 54)            // pixel offset
    putLeInt(14, 40)            // BITMAPINFOHEADER
    putLeInt(18, width)
    putLeInt(22, height)        // positive = bottom-up
    out(26) = 1                 // planes
    out(28) = 24                // bpp
    putLeInt(34, dataSize)
    var y = 0
    while (y < height) {
      val srcRow = height - 1 - y // write bottom-up
      var x = 0
      while (x < width) {
        val v = px(srcRow * width + x)
        val off = 54 + y * stride + x * 3
        out(off) = v; out(off + 1) = v; out(off + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }
}
