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
