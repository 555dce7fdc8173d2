package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** [[MediaCodec]] byte-level contracts: spec-conformant headers,
  * exact roundtrips including row padding and the bottom-up flip,
  * a real RIFF chunk walk (unknown chunks, odd-size padding), and
  * loud failures on formats the decoders do not actually parse. */
class MediaCodecSpec extends AnyFunSuite {

  private def pixels(n: Int): Array[Byte] =
    Array.tabulate(n * 3)(j => ((j * 37 + 11) % 256).toByte)

  test("BMP roundtrip is exact for a padded width (w=3: 3 pad bytes/row)") {
    val bgr = pixels(3 * 2)
    val bytes = MediaCodec.encodeBmp(3, 2, bgr)
    // header facts: magic, offset 54, 40-byte DIB, 24 bpp, BI_RGB
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    assert((bytes(10) & 0xff) == 54 && (bytes(14) & 0xff) == 40)
    assert((bytes(28) & 0xff) == 24 && bytes(30) == 0)
    // rowSize = 12 for w=3 → file = 54 + 2*12
    assert(bytes.length == 54 + 24)
    val img = MediaCodec.decodeBmp(bytes)
    assert(img.width == 3 && img.height == 2)
    assert(img.bgr.toSeq == bgr.toSeq)
  }

  test("BMP storage is genuinely bottom-up: first stored row is the " +
       "LAST image row") {
    val bgr = pixels(4 * 2) // w=4: no padding, rows 12 bytes
    val bytes = MediaCodec.encodeBmp(4, 2, bgr)
    assert(bytes.slice(54, 54 + 12).toSeq == bgr.slice(12, 24).toSeq)
    assert(bytes.slice(66, 78).toSeq == bgr.slice(0, 12).toSeq)
  }

  test("BMP decoder refuses what it does not parse") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodeBmp("notabmp".getBytes ++ new Array[Byte](64))
    }
    val good = MediaCodec.encodeBmp(2, 2, pixels(4))
    val bad = good.clone(); bad(28) = 8 // claim 8 bpp
    intercept[IllegalArgumentException] { MediaCodec.decodeBmp(bad) }
    val short = good.take(good.length - 4) // truncate pixel data
    intercept[IllegalArgumentException] { MediaCodec.decodeBmp(short) }
  }

  test("WAV roundtrip preserves signed 16-bit samples exactly") {
    val samples = Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue, 123)
    val wav = MediaCodec.encodeWavPcm16(8000, samples)
    assert(wav.length == 44 + 12)
    val decoded = MediaCodec.decodeWav(wav)
    assert(decoded.sampleRate == 8000)
    assert(decoded.samples.toSeq == samples.toSeq)
  }

  test("WAV decoder walks chunks for real: an unknown odd-sized chunk " +
       "before fmt is skipped with RIFF padding honored") {
    val samples = Array[Short](5, -7, 9)
    val base = MediaCodec.encodeWavPcm16(8000, samples)
    // splice LIST chunk of ODD size 3 (padded to 4) between WAVE and fmt
    val extra = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 0)
    val spliced = base.slice(0, 12) ++ extra ++ base.drop(12)
    // fix the RIFF size field (bytes 4..7, little-endian)
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    val decoded = MediaCodec.decodeWav(spliced)
    assert(decoded.samples.toSeq == samples.toSeq)
  }

  test("WAV decoder refuses stereo and non-PCM") {
    val good = MediaCodec.encodeWavPcm16(8000, Array[Short](1, 2))
    val stereo = good.clone(); stereo(22) = 2
    intercept[IllegalArgumentException] { MediaCodec.decodeWav(stereo) }
    val alaw = good.clone(); alaw(20) = 6
    intercept[IllegalArgumentException] { MediaCodec.decodeWav(alaw) }
  }

  test("AVI roundtrip: every frame exact, dimensions from avih") {
    val frames = (0 until 3).map(f =>
      Array.tabulate(5 * 2 * 3)(j => ((f * 91 + j * 13) % 256).toByte))
    val avi = MediaCodec.encodeAviDib(5, 2, 25, frames)
    assert(new String(avi, 8, 4) == "AVI ")
    val (w, h, decoded) = MediaCodec.decodeAviFrames(avi)
    assert(w == 5 && h == 2 && decoded.length == 3)
    decoded.zip(frames).foreach { case (d, e) =>
      assert(d.toSeq == e.toSeq)
    }
  }

  test("AVI decoder refuses hostile avih dimensions instead of " +
       "overflowing rowSize*h into a bare array error") {
    val frames = Seq(Array.tabulate(5 * 2 * 3)(j => (j % 256).toByte))
    val avi = MediaCodec.encodeAviDib(5, 2, 25, frames)
    // locate avih and plant w,h that overflow Int in rowSize*h
    val avihOff = avi.indexOfSlice("avih".getBytes)
    assert(avihOff > 0)
    def putLe32(off: Int, v: Long): Unit = (0 until 4).foreach(i =>
      avi(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    putLe32(avihOff + 8 + 32, 0x40000L)  // w = 262144 > 2^16
    putLe32(avihOff + 8 + 36, 0x40000L)
    val e = intercept[IllegalArgumentException] {
      MediaCodec.decodeAviFrames(avi)
    }
    assert(e.getMessage.contains("unreasonable dimensions"))
  }

  test("PNG roundtrip is exact through real DEFLATE + Sub/Paeth " +
       "filters (9x3: width no multiple of 4)") {
    val rgb = Array.tabulate(9 * 3 * 3)(j => ((j * 37 + 11) % 256).toByte)
    val png = MediaCodec.encodePng(9, 3, rgb)
    // signature + IHDR present
    assert((png(0) & 0xff) == 0x89 && new String(png, 1, 3) == "PNG")
    val img = MediaCodec.decodePng(png)
    assert(img.width == 9 && img.height == 3)
    assert(img.rgb.toSeq == rgb.toSeq)
  }

  test("PNG decoder unfilters all five filter types (hand-built " +
       "None/Sub/Up/Average/Paeth scanlines)") {
    // 2x5 image, one row per filter type; build the filtered stream by
    // the spec's own definitions, deflate it, wrap in chunks
    val w = 2; val h = 5; val stride = w * 3
    val rgb = Array.tabulate(stride * h)(j => ((j * 29 + 3) % 256).toByte)
    def px(y: Int, x: Int): Int =
      if (x < 0 || y < 0) 0 else rgb(y * stride + x) & 0xff
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(y) // filter type = row number: 0..4
      for (x <- 0 until stride) {
        val pred = y match {
          case 0 => 0
          case 1 => px(y, x - 3)
          case 2 => px(y - 1, x)
          case 3 => (px(y, x - 3) + px(y - 1, x)) / 2
          case _ => paeth(px(y, x - 3), px(y - 1, x), px(y - 1, x - 3))
        }
        raw.write((px(y, x) - pred) & 0xff)
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw.toByteArray); d.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(t: String, data: Array[Byte]) = {
      val crc = new java.util.zip.CRC32()
      crc.update(t.getBytes); crc.update(data)
      be32(data.length) ++ t.getBytes ++ data ++ be32(crc.getValue.toInt)
    }
    val sig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
      .map(_.toByte)
    val png = sig ++
      chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", z.toByteArray) ++ chunk("IEND", Array.empty[Byte])
    val img = MediaCodec.decodePng(png)
    assert(img.rgb.toSeq == rgb.toSeq,
      "five-filter unfiltering diverged from the spec definitions")
  }

  test("PNG decoder refuses corrupt CRCs, bad signatures, and " +
       "non-truecolor files") {
    val good = MediaCodec.encodePng(2, 2, Array.fill[Byte](12)(1))
    intercept[IllegalArgumentException] {
      MediaCodec.decodePng("nope".getBytes)
    }
    val corrupted = good.clone()
    corrupted(corrupted.length - 5) = (corrupted(corrupted.length - 5) ^ 1).toByte
    intercept[IllegalArgumentException] { MediaCodec.decodePng(corrupted) }
    val gray = good.clone()
    gray(8 + 4 + 4 + 9) = 0 // color type byte inside IHDR
    intercept[IllegalArgumentException] { MediaCodec.decodePng(gray) }
  }

  test("pipeline stats match a direct computation of the pixel rule") {
    val id = 4242L
    val img = MediaCodec.decodeBmp(
      MediaCodec.encodeBmp(8, 4, Multimodal.bmpPixels(id, 8, 4)))
    var sum = 0L
    for (i <- 0 until 32)
      sum += (id * 31 + i * 7) % 256 + (id * 17 + i * 11) % 256 +
             (id * 13 + i * 3) % 256
    val got = img.bgr.grouped(3).map(p =>
      (p(0) & 0xff) + (p(1) & 0xff) + (p(2) & 0xff)).sum
    assert(got.toLong == sum)
  }
}
