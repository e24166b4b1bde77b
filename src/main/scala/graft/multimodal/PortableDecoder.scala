package graft.multimodal

/** Pure-JVM decoder for CODEC-FREE container formats — real parsing,
  * zero native libraries:
  *
  *  - `image`: binary PPM (netpbm P6) — header `P6 <w> <h> <maxval>`
  *    with whitespace/`#`-comment handling, then `3·w·h` raw RGB bytes —
  *    or classic Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
  *    uncompressed 24-bit, padded bottom-up/top-down rows), sniffed by
  *    container magic;
  *  - `video`: a concatenated-P6 stream (the netpbm animation
  *    convention: frames are back-to-back P6 images);
  *  - `audio`: RIFF/WAVE PCM — proper chunk walk to `fmt ` and `data`,
  *    sample rate and frame count from the real header fields.
  *
  * This is the slice of the multimodal surface an environment without
  * codec libraries can still decode FOR REAL; codec-bound formats
  * (JPEG, H.264, FLAC, ...) stay behind the [[NativeDecoder]] binding
  * seam. Malformed input returns `ok = false` metadata rather than
  * throwing — a poisoned blob must not kill the partition. */
object PortableDecoder extends MediaDecoder {

  // ---- P6 ------------------------------------------------------------

  /** Parse one P6 image at `off`: Some((w, h, offsetAfterPixels)). */
  private def parseP6(bytes: Array[Byte], off: Int): Option[(Int, Int, Int)] = {
    var i = off
    def eof = i >= bytes.length
    def skipWs(): Unit = {
      var more = true
      while (more && !eof) {
        val c = bytes(i)
        if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
        else if (c == '#') { while (!eof && bytes(i) != '\n') i += 1 }
        else more = false
      }
    }
    def readInt(): Option[Int] = {
      skipWs()
      var v = 0L
      var any = false
      while (!eof && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); any = true; i += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    if (i + 2 > bytes.length || bytes(i) != 'P' || bytes(i + 1) != '6') return None
    i += 2
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255
      // exactly one whitespace byte separates the header from pixels
      if !eof && (bytes(i) == '\n' || bytes(i) == ' ' || bytes(i) == '\r' ||
        bytes(i) == '\t')
      px = i + 1
      end = px.toLong + 3L * w * h
      if end <= bytes.length
    } yield (w, h, end.toInt)
  }

  /** Count back-to-back P6 frames; (w, h, frames) of a valid stream. */
  private def parseP6Stream(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    var off = 0
    var dims: Option[(Int, Int)] = None
    var frames = 0
    var ok = true
    while (ok && off < bytes.length) {
      parseP6(bytes, off) match {
        case Some((w, h, next)) =>
          if (dims.isEmpty) dims = Some((w, h))
          frames += 1; off = next
        case None => ok = false // trailing garbage invalidates the stream
      }
    }
    if (ok && frames > 0) dims.map { case (w, h) => (w, h, frames) } else None
  }

  // ---- BMP (BITMAPINFOHEADER, uncompressed 24-bit) --------------------

  /** Parse a classic BMP still: Some((w, h, dataOff, rowSize)).
    * Accepts bottom-up (h > 0) and top-down (h < 0) rows; requires
    * BI_RGB 24-bit and the pixel array to end exactly at EOF (stills
    * refuse trailing bytes, like the P6 path). */
  private def parseBmp(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    val h = math.abs(hRaw)
    if (hdrSize < 40 || w <= 0 || hRaw == 0 || planes != 1 || bpp != 24 ||
      compression != 0) return None
    val rowSize = ((w * 3 + 3) / 4) * 4
    val end = dataOff + rowSize.toLong * h
    if (dataOff < 54 || end != b.length) return None
    Some((w, h, dataOff.toInt, rowSize))
  }

  // ---- RIFF/WAVE -----------------------------------------------------

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && t.indices.forall(j => b(i + j) == t.charAt(j))

  /** Chunk-walk a RIFF/WAVE file: Some((sampleRate, nSampleFrames,
    * dataOff, dataLen)). */
  private def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12
    var rate = -1
    var blockAlign = -1
    var data: Option[(Int, Int)] = None
    while (i + 8 <= b.length && (rate < 0 || data.isEmpty)) {
      val sz = le32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      if (tag(b, i, "fmt ") && sz >= 16) {
        rate = le32(b, i + 8 + 4).toInt
        blockAlign = le16(b, i + 8 + 12)
      } else if (tag(b, i, "data")) {
        data = Some((i + 8, sz.toInt))
      }
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    for {
      (off, len) <- data
      if rate > 0 && blockAlign > 0
    } yield (rate, len / blockAlign, off, len)
  }

  // ---- MediaDecoder --------------------------------------------------

  private def bad(kind: String) = MediaMeta(kind, 0, 0, 0, 0, ok = false)

  def decode(kind: String, bytes: Array[Byte]): MediaMeta = kind match {
    // stills sniff the container magic: 'BM' -> BMP, 'P6' -> netpbm
    case "image" if bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M' =>
      parseBmp(bytes) match {
        case Some((w, h, _, _)) => MediaMeta(kind, w, h, 0, 1, ok = true)
        case None => bad(kind)
      }
    case "image" => parseP6(bytes, 0) match {
      // a still must be exactly one frame — trailing bytes are refused
      case Some((w, h, end)) if end == bytes.length =>
        MediaMeta(kind, w, h, 0, 1, ok = true)
      case _ => bad(kind)
    }
    case "video" => parseP6Stream(bytes) match {
      case Some((w, h, n)) => MediaMeta(kind, w, h, 0, n, ok = true)
      case None => bad(kind)
    }
    case "audio" => parseWav(bytes) match {
      case Some((rate, frames, _, _)) =>
        MediaMeta(kind, 0, 0, rate, frames, ok = true)
      case None => bad(kind)
    }
    case _ => bad(kind)
  }

  /** Mean-pooled features over `dim` equal slices of the decoded
    * payload: RGB bytes / 255 for stills and streams (first frame),
    * |16-bit PCM| / 32768 for audio. Undecodable input → zeros. */
  def features(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
    def pool(off: Int, len: Int, stride: Int, read: Int => Float): Array[Float] = {
      val n = len / stride
      val out = new Array[Float](dim)
      if (n == 0) return out
      val cnt = new Array[Int](dim)
      var i = 0
      while (i < n) {
        val slot = (i.toLong * dim / n).toInt
        out(slot) += read(off + i * stride); cnt(slot) += 1
        i += 1
      }
      var j = 0
      while (j < dim) { if (cnt(j) > 0) out(j) /= cnt(j); j += 1 }
      out
    }
    kind match {
      case "image" if bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M' =>
        parseBmp(bytes) match {
          case Some((w, h, off, rowSize)) =>
            // pool over the BGR bytes row-wise, skipping the 4-byte pad
            val n = 3 * w * h
            val out = new Array[Float](dim)
            val cnt = new Array[Int](dim)
            var i = 0
            while (i < n) {
              val row = i / (3 * w); val c = i % (3 * w)
              val slot = (i.toLong * dim / n).toInt
              out(slot) += (bytes(off + row * rowSize + c) & 0xFF) / 255.0f
              cnt(slot) += 1
              i += 1
            }
            var j = 0
            while (j < dim) { if (cnt(j) > 0) out(j) /= cnt(j); j += 1 }
            out
          case None => new Array[Float](dim)
        }
      case "image" | "video" => parseP6(bytes, 0) match {
        case Some((w, h, end)) =>
          val px = end - 3 * w * h
          pool(px, 3 * w * h, 1, i => (bytes(i) & 0xFF) / 255.0f)
        case None => new Array[Float](dim)
      }
      case "audio" => parseWav(bytes) match {
        case Some((_, _, off, len)) =>
          pool(off, len, 2, i => math.abs(le16(bytes, i).toShort.toInt) / 32768.0f)
        case None => new Array[Float](dim)
      }
      case _ => new Array[Float](dim)
    }
  }
}
