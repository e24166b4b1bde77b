package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Deterministic REAL-container builders for [[PortableDecoder]]: every
  * header field is a pure function of the id, so the q102 oracle
  * re-derives the expected metadata arithmetically (header length via
  * string length, payload via the same formulas) and the end-to-end
  * check proves the parser inverts the synthesis.
  *
  * Formulas (id is the non-negative doc id):
  *  - kind: id % 3 → image / audio / video
  *  - image: w = 4 + id % 13, h = 4 + id % 11, maxval 255
  *  - audio: PCM16 mono, rate = 8000 + (id % 8)·1000,
  *    samples = 500 + id % 250, canonical 44-byte header
  *  - video: 2 + (id / 3) % 3 concatenated 8×8 P6 frames */
object PortableMedia {

  def kindOf(id: Long): String = (id % 3) match {
    case 0 => "image"
    case 1 => "audio"
    case _ => "video"
  }

  private def pixel(seed: Long, i: Int): Byte = ((seed * 31 + i) % 256).toByte

  def imageBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"P6\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII))
    var i = 0
    while (i < 3 * w * h) { out.write(pixel(seed, i) & 0xFF); i += 1 }
    out.toByteArray
  }

  def wavBytes(rate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val dataLen = 2 * nSamples
    val out = new ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def ascii(s: String): Unit =
      out.write(s.getBytes(StandardCharsets.US_ASCII))
    ascii("RIFF"); le32(36L + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16L); le16(1); le16(1) // PCM, mono
    le32(rate.toLong); le32(rate.toLong * 2); le16(2); le16(16)
    ascii("data"); le32(dataLen.toLong)
    var i = 0
    while (i < nSamples) {
      le16(((seed * 7 + i.toLong * 13) % 65536).toInt)
      i += 1
    }
    out.toByteArray
  }

  /** Classic Windows BMP: 14-byte BITMAPFILEHEADER + 40-byte
    * BITMAPINFOHEADER, uncompressed 24-bit BGR, bottom-up rows padded
    * to 4 bytes — the other still format a JVM can parse without any
    * codec library. Total size = 54 + ((3w + 3) / 4 · 4) · h. */
  def bmpBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataLen = rowSize * h
    val out = new ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write('B'); out.write('M')
    le32(54L + dataLen); le32(0L); le32(54L)          // file header
    le32(40L); le32(w.toLong); le32(h.toLong)          // info header
    le16(1); le16(24); le32(0L); le32(dataLen.toLong)  // planes/bpp/BI_RGB
    le32(2835L); le32(2835L); le32(0L); le32(0L)       // 72 dpi, palette
    var y = 0
    while (y < h) {
      var x = 0
      while (x < 3 * w) { out.write(pixel(seed, y * 3 * w + x) & 0xFF); x += 1 }
      var p = 3 * w
      while (p < rowSize) { out.write(0); p += 1 }
      y += 1
    }
    out.toByteArray
  }

  /** q103 synthesis formulas: w = 4 + id % 9, h = 4 + id % 7. */
  def bmpBlob(id: Long): Array[Byte] =
    bmpBytes(4 + (id % 9).toInt, 4 + (id % 7).toInt, id)

  def videoBytes(frames: Int, seed: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var f = 0
    while (f < frames) { out.write(imageBytes(8, 8, seed + f)); f += 1 }
    out.toByteArray
  }

  def blob(id: Long): Array[Byte] = kindOf(id) match {
    case "image" =>
      imageBytes(4 + (id % 13).toInt, 4 + (id % 11).toInt, id)
    case "audio" =>
      wavBytes(8000 + (id % 8).toInt * 1000, 500 + (id % 250).toInt, id)
    case _ =>
      videoBytes(2 + ((id / 3) % 3).toInt, id)
  }
}
