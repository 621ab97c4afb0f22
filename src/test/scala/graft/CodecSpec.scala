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
}
