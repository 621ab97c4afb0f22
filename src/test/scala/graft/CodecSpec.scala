package graft

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

import graft.pipeline.{Codecs, MultimodalOps}

/** Real-format decode: PNG / BMP / WAV fixtures built byte-by-byte from the
  * public specs, parsed by the pure-JVM codecs; unknown payloads fall back
  * to the deterministic FNV stub. */
class CodecSpec extends SparkSpec {
  import spark.implicits._

  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def be32(v: Int) =
    Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def bmpFixture: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    // BITMAPFILEHEADER: 2x2 24bpp, pixel array at 54, rows padded to 4 bytes
    out.write('B'); out.write('M')
    out.write(le32(70)); out.write(le32(0)); out.write(le32(54))
    // BITMAPINFOHEADER
    out.write(le32(40)); out.write(le32(2)); out.write(le32(2))
    out.write(le16(1)); out.write(le16(24)); out.write(le32(0))
    out.write(le32(16)); out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(0)); out.write(le32(0))
    // two rows of 2 BGR pixels + 2 pad bytes each; all bytes 0x80
    out.write(Array.fill[Byte](16)(0x80.toByte))
    out.toByteArray
  }

  private def wavFixture: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes); out.write(le32(36 + 16)); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(1)) // mono
    out.write(le32(8000)); out.write(le32(16000))
    out.write(le16(2)); out.write(le16(16))
    out.write("data".getBytes); out.write(le32(16))
    // 8 constant samples at 2^14 -> amplitude 0.5, RMS 0.5 in every bucket
    (0 until 8).foreach(_ => out.write(le16(16384)))
    out.toByteArray
  }

  private def pngFixture: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length)); out.write(typ.getBytes("US-ASCII"))
      out.write(data); out.write(be32(0)) // parser skips CRC
    }
    // IHDR: 3x2, 8-bit truecolor (3 channels)
    chunk("IHDR", be32(3) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 0))
    // raw scanlines: filter byte 0 + 9 pixel bytes (all 0xFF) per row
    val raw = Array.fill(2)(0.toByte +: Array.fill[Byte](9)(0xFF.toByte))
      .flatten.toArray
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](256)
    val z = new ByteArrayOutputStream()
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  test("BMP header + pixel stats") {
    val d = Codecs.parse(bmpFixture).get
    assert(d.format == "bmp" && d.width == 2 && d.height == 2 && d.nChannels == 3)
    // every pixel/pad byte is 0x80 -> each bucket mean 128/255
    d.feature.foreach(f => assert(math.abs(f - 128f / 255f) < 1e-6))
  }

  test("WAV fmt chunk + bucket RMS") {
    val d = Codecs.parse(wavFixture).get
    assert(d.format == "wav" && d.width == 8000 && d.height == 8 && d.nChannels == 1)
    d.feature.foreach(f => assert(math.abs(f - 0.5f) < 1e-6))
  }

  test("PNG IHDR + inflated IDAT stats") {
    val d = Codecs.parse(pngFixture).get
    assert(d.format == "png" && d.width == 3 && d.height == 2 && d.nChannels == 3)
    // inflated stream = 20 bytes: 2 filter zeros + 18x 0xFF; bucket means
    // depend on where the zeros land but the mean of means is (2*0+18*255)/20
    val mean = d.feature.map(_.toDouble).sum / 8
    assert(math.abs(mean - (18.0 * 255 / 20) / 255 / 1.0) < 0.11)
    assert(d.feature.forall(f => f >= 0f && f <= 1f))
  }

  test("unknown payloads fall back to the FNV stub; dispatch is per row") {
    val media = Seq(
      (1L, bmpFixture), (2L, wavFixture), (3L, pngFixture),
      (4L, "just some text".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val got = MultimodalOps.decode(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[String]("format")).toMap
    assert(got == Map(1L -> "bmp", 2L -> "wav", 3L -> "png", 4L -> "synthetic"))
  }

  test("truncated containers are rejected, not crashed") {
    for (fix <- Seq(bmpFixture, wavFixture, pngFixture); cut <- Seq(4, 20)) {
      val short = fix.take(cut)
      assert(Codecs.parse(short).isEmpty || cut >= fix.length)
    }
    assert(Codecs.parse(null).isEmpty)
  }

  test("malformed headers: overflow-scale lengths and zlib tricks never throw or hang") {
    def png(ihdrData: Array[Byte], rest: Array[Byte]*): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
      out.write(be32(ihdrData.length)); out.write("IHDR".getBytes("US-ASCII"))
      out.write(ihdrData); out.write(be32(0))
      rest.foreach(out.write)
      out.toByteArray
    }
    // 1) chunk length near Int.MaxValue: off+8+len used to wrap negative
    //    and pass the bounds guard, then read out of bounds
    val hugeChunk = png(be32(4) ++ be32(4) ++ Array[Byte](8, 0, 0, 0, 0),
      be32(0x7FFFFFF0) ++ "IDAT".getBytes("US-ASCII") ++ Array.fill[Byte](8)(0))
    assert(Codecs.gray(hugeChunk).isEmpty)
    Codecs.parse(hugeChunk) // must not throw
    // 2) width x height whose scanline product overflows Int
    val hugeDims = png(be32(1 << 20) ++ be32(1 << 20) ++
      Array[Byte](8, 2, 0, 0, 0))
    assert(Codecs.gray(hugeDims).isEmpty)
    Codecs.parse(hugeDims)
    // 3) zlib stream demanding a preset dictionary (FDICT bit): the decoder
    //    must fail it, not spin forever waiting for a dictionary
    val fdict = {
      val z = Array[Byte](0x78, 0x20, 0, 0, 0, 1, 1, 2, 3) // FDICT set
      png(be32(4) ++ be32(4) ++ Array[Byte](8, 0, 0, 0, 0),
        be32(z.length) ++ "IDAT".getBytes("US-ASCII") ++ z ++ be32(0),
        be32(0) ++ "IEND".getBytes("US-ASCII") ++ be32(0))
    }
    assert(Codecs.gray(fdict).isEmpty)
    Codecs.parse(fdict)
    // 4) BMP whose stride x height wraps Int
    val bmp = {
      val out = new ByteArrayOutputStream()
      out.write('B'); out.write('M')
      out.write(le32(70)); out.write(le32(0)); out.write(le32(54))
      out.write(le32(40)); out.write(le32(0x40000000)); out.write(le32(0x40000000))
      out.write(le16(1)); out.write(le16(24)); out.write(le32(0))
      out.write(le32(16)); out.write(le32(2835)); out.write(le32(2835))
      out.write(le32(0)); out.write(le32(0))
      out.write(Array.fill[Byte](16)(0x80.toByte))
      out.toByteArray
    }
    assert(Codecs.gray(bmp).isEmpty && Codecs.parse(bmp).isEmpty)
    // 5) WAV chunk length near Int.MaxValue: offset math must not wrap
    val wav = {
      val out = new ByteArrayOutputStream()
      out.write("RIFF".getBytes); out.write(le32(36)); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); out.write(le32(0x7FFFFFF0))
      out.write(Array.fill[Byte](24)(0))
      out.toByteArray
    }
    assert(Codecs.parse(wav).isEmpty)
    def bmpWith(w: Int, h: Int, bpp: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write('B'); out.write('M')
      out.write(le32(70)); out.write(le32(0)); out.write(le32(54))
      out.write(le32(40)); out.write(le32(w)); out.write(le32(h))
      out.write(le16(1)); out.write(le16(bpp)); out.write(le32(0))
      out.write(le32(16)); out.write(le32(2835)); out.write(le32(2835))
      out.write(le32(0)); out.write(le32(0))
      out.write(Array.fill[Byte](16)(0x80.toByte))
      out.toByteArray
    }
    // 6) BMP whose strideL x height wraps LONG (2^31-1 squared at 32bpp)
    val bmpLongWrap = bmpWith(0x7FFFFFFF, 0x7FFFFFFF, 32)
    assert(Codecs.gray(bmpLongWrap).isEmpty && Codecs.parse(bmpLongWrap).isEmpty)
    // 7) BMP height = Int.MinValue: math.abs is a no-op on it
    val bmpMinH = bmpWith(1, 0x80000000, 8)
    assert(Codecs.gray(bmpMinH).isEmpty && Codecs.parse(bmpMinH).isEmpty)
    // 8) PNG whose scanline product wraps LONG (2^31-1 squared, RGBA)
    val pngLongWrap = png(be32(0x7FFFFFFF) ++ be32(0x7FFFFFFF) ++
      Array[Byte](8, 6, 0, 0, 0),
      be32(8) ++ "IDAT".getBytes("US-ASCII") ++
        Array[Byte](0x78, 0x9C.toByte, 3, 0, 0, 0, 0, 1) ++ be32(0),
      be32(0) ++ "IEND".getBytes("US-ASCII") ++ be32(0))
    assert(Codecs.gray(pngLongWrap).isEmpty)
    Codecs.parse(pngLongWrap)
  }

  test("inflate cap is bounded by the IDAT payload's max deflate expansion") {
    // IHDR declares a bogus giant geometry (so the declared-size cap
    // saturates at Int.MaxValue) but carries a small IDAT. The cap must
    // now come from the payload (idat * 1032 + 64KB), bounding peak
    // allocation at ~MBs even for a crafted header. A near-max-ratio
    // VALID stream (1MB of zeros deflates to ~1KB) must still fit under
    // that payload cap — the bound is the theoretical deflate maximum,
    // never tighter.
    def be32(v: Int): Array[Byte] = Array[Byte]((v >>> 24).toByte,
      (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val deflater = new Deflater(Deflater.BEST_COMPRESSION)
    deflater.setInput(new Array[Byte](1 << 20)) // 1MB of zeros
    deflater.finish()
    val z = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    val idat = z.toByteArray
    assert(idat.length < 8192, "fixture should be near the max ratio")
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    out.write(be32(13)); out.write("IHDR".getBytes("US-ASCII"))
    out.write(be32(1 << 24)); out.write(be32(1 << 24)) // absurd 16M x 16M
    out.write(Array[Byte](8, 6, 0, 0, 0)); out.write(be32(0))
    out.write(be32(idat.length)); out.write("IDAT".getBytes("US-ASCII"))
    out.write(idat); out.write(be32(0))
    out.write(be32(0)); out.write("IEND".getBytes("US-ASCII")); out.write(be32(0))
    val decoded = Codecs.parse(out.toByteArray)
    assert(decoded.nonEmpty)
    // the stream inflated under the payload cap: zero-pixel means, not the
    // zero FALLBACK (identical here — what matters is no throw, no 2GB
    // allocation, and header metadata intact)
    assert(decoded.get.width == (1 << 24) && decoded.get.format == "png")
  }

  test("16-bit-depth PNG metadata features survive the inflate cap") {
    // valid 16-bit grayscale 4x4: raw = 4 rows of (filter 0 + 8 bytes)
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length)); out.write(typ.getBytes("US-ASCII"))
      out.write(data); out.write(be32(0))
    }
    chunk("IHDR", be32(4) ++ be32(4) ++ Array[Byte](16, 0, 0, 0, 0))
    val raw = Array.fill(4)(0.toByte +: Array.fill[Byte](8)(0xAB.toByte))
      .flatten.toArray
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](256)
    val z = new ByteArrayOutputStream()
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.empty[Byte])
    val parsed = Codecs.parse(out.toByteArray)
    assert(parsed.isDefined)
    // the 16-bit stream is ~2x the 8-bit cap estimate; features must be
    // real bucket means (0xAB bytes), not the zeroed fallback
    assert(parsed.get.feature.forall(_ > 0.5f))
    // 16-bit pixel DECODE is unsupported by design -> None, no throw
    assert(Codecs.gray(out.toByteArray).isEmpty)
  }

  // ---------------------------------------------- pixels + perceptual hash

  /** Deterministic 16x16 gradient-with-blocks test image. */
  private def gradientPx(bright: Int => Boolean): Array[Byte] =
    Array.tabulate(256) { p =>
      val base = (p * 200 / 255) + 20
      (if (bright(p / 32)) math.min(base + 55, 255) else base).toByte
    }

  test("BMP encode -> gray decode round-trips the pixel array") {
    val px = Array.tabulate(64)(i => (i * 4).toByte)
    val bytes = Codecs.encodeBmp24(px, 8, 8)
    val g = Codecs.bmpGray(bytes).get
    assert(g.width == 8 && g.height == 8)
    px.indices.foreach(i =>
      assert(math.abs(g.px(i) - (px(i) & 0xFF) / 255.0f) < 1e-6,
        s"pixel $i diverged"))
    // the general parse sees the same container
    assert(Codecs.parse(bytes).get.format == "bmp")
  }

  test("PNG gray decode reverses Sub/Up/Average/Paeth filters exactly") {
    // 4x4 grayscale image, one row per filter type, pixel values chosen so
    // every filter's reconstruction is exercised with carries
    val width = 4
    val rows = Array(
      Array(10, 60, 110, 160),   // filter 0 (None)
      Array(20, 70, 120, 170),   // filter 1 (Sub): deltas vs left
      Array(30, 80, 130, 180),   // filter 2 (Up): deltas vs up
      Array(40, 90, 140, 190))   // filter 4 (Paeth)
    def enc(y: Int, f: Int): Array[Byte] = {
      val cur = rows(y)
      val up = if (y > 0) rows(y - 1) else Array.fill(width)(0)
      f.toByte +: Array.tabulate(width) { x =>
        val left = if (x > 0) cur(x - 1) else 0
        val ul = if (x > 0) up(x - 1) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up(x)
          case 3 => (left + up(x)) / 2
          case 4 =>
            val p = left + up(x) - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up(x))
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up(x) else ul
        }
        ((cur(x) - pred) & 0xFF).toByte
      }
    }
    val raw = Array(enc(0, 0), enc(1, 1), enc(2, 2), enc(3, 4)).flatten
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length)); out.write(typ.getBytes("US-ASCII"))
      out.write(data); out.write(be32(0))
    }
    chunk("IHDR", be32(4) ++ be32(4) ++ Array[Byte](8, 0, 0, 0, 0)) // gray
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](256)
    val z = new ByteArrayOutputStream()
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.empty[Byte])
    val g = Codecs.pngGray(out.toByteArray).get
    assert(g.width == 4 && g.height == 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(math.abs(g.px(y * 4 + x) - rows(y)(x) / 255.0f) < 1e-6,
        s"($y,$x): ${g.px(y * 4 + x)} vs ${rows(y)(x) / 255.0f}")
  }

  test("aHash is invariant to brightness shift; dHash to contrast scale") {
    val a = gradientPx(b => (b % 3) == 0)
    val brighter = a.map(v => math.min((v & 0xFF) + 30, 255).toByte)
    def gr(px: Array[Byte]) = Codecs.bmpGray(Codecs.encodeBmp24(px, 16, 16)).get
    assert(Codecs.aHash64(gr(a)) == Codecs.aHash64(gr(brighter)))
    assert(Codecs.dHash64(gr(a)) == Codecs.dHash64(gr(brighter)))
    val scaled = a.map(v => ((v & 0xFF) * 4 / 5).toByte)
    assert(Codecs.dHash64(gr(a)) == Codecs.dHash64(gr(scaled)))
  }

  test("ahash64/dhash64 SQL functions match the kernels and NULL on junk") {
    import org.apache.spark.sql.functions.col
    val img = Codecs.encodeBmp24(gradientPx(b => b % 3 == 0), 16, 16)
    val g = Codecs.bmpGray(img).get
    graft.functions.funcs.registerAll(spark)
    val df = Seq((1L, img), (2L, "junk".getBytes("UTF-8")))
      .toDF("id", "payload")
    df.createOrReplaceTempView("imgs")
    val got = spark.sql(
      "SELECT id, ahash64(payload) AS a, dhash64(payload) AS d FROM imgs")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) == ((Some(Codecs.aHash64(g)), Some(Codecs.dHash64(g)))))
    assert(got(2L) == ((None, None)))
    // Column API route agrees (exercises codegen through a projection)
    val viaCol = df.select(col("id"),
        graft.functions.funcs.ahash64(col("payload")).as("a"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(viaCol(1L).contains(Codecs.aHash64(g)) && viaCol(2L).isEmpty)
  }

  test("imageNearDuplicates recall: edited copy found, distinct image not") {
    val original = gradientPx(b => (b % 3) == 0)
    // light edit: bump one 32-pixel block slightly (survives hashing)
    val edited = original.clone()
    (0 until 8).foreach(i => edited(i) =
      math.min((edited(i) & 0xFF) + 12, 255).toByte)
    // genuinely different structure
    val other = gradientPx(b => (b % 2) == 0).reverse
    val media = Seq(
      (1L, Codecs.encodeBmp24(original, 16, 16)),
      (2L, Codecs.encodeBmp24(edited, 16, 16)),
      (3L, Codecs.encodeBmp24(other, 16, 16)),
      (4L, "not an image".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val pairs = graft.pipeline.DedupOps.imageNearDuplicates(media, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "edited copy must be recalled")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "structurally different image must not pair")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "undecodable payload must be absent")
    // hashes surface per-item too
    val hs = MultimodalOps.imageHashes(media).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(hs(1L).isDefined && hs(4L).isEmpty)
  }
}
