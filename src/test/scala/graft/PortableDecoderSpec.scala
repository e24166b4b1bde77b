package graft

import graft.multimodal.{PortableDecoder, PortableMedia}

/** Real-format decode semantics (no Spark needed — the decoder is pure
  * JVM code; the distributed plumbing is MultimodalSpec's and q102's
  * job): synthesis round-trip, header quirks a real parser must
  * survive, and malformed-input rejection. */
class PortableDecoderSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("decode inverts synthesis for every kind") {
    (0L until 30L).foreach { id =>
      val kind = PortableMedia.kindOf(id)
      val m = PortableDecoder.decode(kind, PortableMedia.blob(id))
      assert(m.ok, s"id=$id kind=$kind failed to decode")
      kind match {
        case "image" =>
          assert(m.width == 4 + (id % 13).toInt && m.height == 4 + (id % 11).toInt)
          assert(m.nFrames == 1 && m.sampleRate == 0)
        case "audio" =>
          assert(m.sampleRate == 8000 + (id % 8).toInt * 1000)
          assert(m.nFrames == 500 + (id % 250).toInt)
        case _ =>
          assert(m.width == 8 && m.height == 8)
          assert(m.nFrames == 2 + ((id / 3) % 3).toInt)
      }
    }
  }

  test("P6 parser handles comments and multi-whitespace headers") {
    val px = Array.fill(12)(7.toByte) // 2x2 RGB
    val withComment = ("P6\n# a netpbm comment\n 2  2\n255\n"
      .getBytes("US-ASCII")) ++ px
    val m = PortableDecoder.decode("image", withComment)
    assert(m.ok && m.width == 2 && m.height == 2, m.toString)
  }

  test("malformed input is refused, not thrown") {
    assert(!PortableDecoder.decode("image", "P5\n2 2\n255\n".getBytes).ok)
    assert(!PortableDecoder.decode("image", Array[Byte]()).ok)
    // truncated pixel payload
    val short = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ Array.fill(5)(1.toByte)
    assert(!PortableDecoder.decode("image", short).ok)
    // a still with trailing bytes is not a valid single image
    val extra = PortableMedia.imageBytes(2, 2, 1L) ++ Array[Byte](9)
    assert(!PortableDecoder.decode("image", extra).ok)
    // WAV with a corrupted RIFF tag
    val wav = PortableMedia.wavBytes(8000, 10, 1L)
    wav(0) = 'X'.toByte
    assert(!PortableDecoder.decode("audio", wav).ok)
    // features of undecodable input: defined zeros, right arity
    val f = PortableDecoder.features("image", Array[Byte](1, 2, 3), 8)
    assert(f.length == 8 && f.forall(_ == 0f))
  }

  test("BMP decode inverts synthesis across the padding lattice") {
    // w = 4..12 crosses every 4-byte row-padding residue; h varies too
    (0L until 63L).foreach { id =>
      val m = PortableDecoder.decode("image", PortableMedia.bmpBlob(id))
      assert(m.ok, s"id=$id BMP failed to decode")
      assert(m.width == 4 + (id % 9).toInt && m.height == 4 + (id % 7).toInt)
      assert(m.nFrames == 1 && m.sampleRate == 0)
      // byte accounting incl. padded rows
      val rowSize = ((m.width * 3 + 3) / 4) * 4
      assert(PortableMedia.bmpBlob(id).length == 54 + rowSize * m.height)
    }
  }

  test("BMP top-down (negative height) decodes; malformed BMP refused") {
    val b = PortableMedia.bmpBytes(5, 3, 9L)
    // flip to top-down: height field at offset 22, little-endian -3
    val neg = b.clone()
    val nh = -3
    neg(22) = (nh & 0xFF).toByte; neg(23) = ((nh >> 8) & 0xFF).toByte
    neg(24) = ((nh >> 16) & 0xFF).toByte; neg(25) = ((nh >> 24) & 0xFF).toByte
    val m = PortableDecoder.decode("image", neg)
    assert(m.ok && m.width == 5 && m.height == 3)
    // 8-bit palette BMP (bpp=8) is codec-free but unsupported: refused
    val pal = b.clone(); pal(28) = 8.toByte
    assert(!PortableDecoder.decode("image", pal).ok)
    // RLE compression flag: refused
    val rle = b.clone(); rle(30) = 1.toByte
    assert(!PortableDecoder.decode("image", rle).ok)
    // truncated pixel array: refused
    assert(!PortableDecoder.decode("image",
      java.util.Arrays.copyOf(b, b.length - 1)).ok)
    // trailing bytes: refused (still = exactly one pixel array)
    assert(!PortableDecoder.decode("image", b ++ Array[Byte](0)).ok)
  }

  test("BMP features mean-pool the pixel bytes, skipping row padding") {
    // 1x2 all-255 pixels: rowSize 4 has 1 pad byte of 0 per row — if
    // padding leaked into the pool the mean would drop below 1
    val hdr = PortableMedia.bmpBytes(1, 2, 0L)
    val full = hdr.clone()
    // overwrite the two 3-byte pixels (offsets 54..56 and 58..60)
    Seq(54, 55, 56, 58, 59, 60).foreach(i => full(i) = 255.toByte)
    val f = PortableDecoder.features("image", full, 2)
    assert(f.forall(v => math.abs(v - 1f) < 1e-6), f.mkString(","))
  }

  test("features mean-pool the real payload") {
    // all-zero pixels → all-zero features; all-255 → all-one features
    val zero = ("P6\n4 4\n255\n".getBytes("US-ASCII")) ++
      Array.fill(48)(0.toByte)
    assert(PortableDecoder.features("image", zero, 4).forall(_ == 0f))
    val full = ("P6\n4 4\n255\n".getBytes("US-ASCII")) ++
      Array.fill(48)(255.toByte)
    assert(PortableDecoder.features("image", full, 4).forall(v =>
      math.abs(v - 1f) < 1e-6))
    // WAV silence → zero features
    val silent = {
      val b = PortableMedia.wavBytes(8000, 100, 0L)
      java.util.Arrays.fill(b, 44, b.length, 0.toByte); b
    }
    assert(PortableDecoder.features("audio", silent, 4).forall(_ == 0f))
  }
}
