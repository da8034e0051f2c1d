package graft.operators

import java.io.ByteArrayOutputStream

/**
 * Minimal pure-JVM RIFF/AVI codec for UNCOMPRESSED (BI_RGB 24-bit) and
 * MJPEG video streams — the containers a JDK-only environment can decode
 * for real (raw frames need no codec at all; MJPEG frames are JPEGs,
 * which `javax.imageio` ships). This is what makes [[Multimodal.videoFrames]]
 * a REAL decode path rather than a byte-slicing stub: it walks the RIFF
 * chunk tree, reads the stream headers, and yields true per-frame pixel
 * data. Compressed codecs (H.264 etc.) remain out of scope — no codec
 * libraries in this container — and fall back to the documented stub.
 *
 * The encoder exists for deterministic synthesis (tests and the q58 media
 * generator build clips whose structure is a pure function of the source
 * row, so a SQL oracle can predict what the decoder must recover).
 *
 * Layout handled (strict enough for synthesis, tolerant enough to skip
 * unknown chunks):
 * {{{
 * RIFF <size> 'AVI '
 *   LIST 'hdrl'  avih(56)  LIST 'strl' [ strh(56) strf(40=BITMAPINFOHEADER) ]
 *   LIST 'movi'  ('00db' raw-BGR | '00dc' jpeg)*
 * }}}
 */
object AviCodec {

  /** One decoded clip: dims from the BITMAPINFOHEADER, fps from strh
    * rate/scale, frames as raw byte payloads of their chunks ('00db' raw
    * bottom-up BGR rows padded to 4-byte stride; '00dc' JPEG). */
  final case class Clip(
      width: Int, height: Int, fps: Double, mjpeg: Boolean,
      frames: IndexedSeq[Array[Byte]]) {
    def durationMs: Long =
      if (fps <= 0) 0L else math.round(frames.length * 1000.0 / fps)
  }

  /** BGR row stride padded to 4 bytes — the BMP/AVI raw-frame convention. */
  def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  // ---- encode ------------------------------------------------------------

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(fcc(id)); out.write(le32(body.length)); out.write(body)
    if (body.length % 2 == 1) out.write(0) // RIFF chunks are word-aligned
    out.toByteArray
  }
  private def list(listType: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(fcc("LIST")); out.write(le32(body.length + 4))
    out.write(fcc(listType)); out.write(body)
    out.toByteArray
  }

  /** Build an uncompressed (BI_RGB, 24-bit) AVI. Each frame must be
    * `rowStride(width) * height` bytes of bottom-up BGR rows. */
  def encodeRaw(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] =
    encode(width, height, fps, frames, mjpeg = false)

  /** Build an MJPEG AVI: each frame is a complete JPEG payload. */
  def encodeMjpeg(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] =
    encode(width, height, fps, frames, mjpeg = true)

  private def encode(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]], mjpeg: Boolean): Array[Byte] = {
    val stride = rowStride(width)
    if (!mjpeg) frames.foreach(f => require(f.length == stride * height,
      s"raw frame must be stride($stride) * height($height) bytes, got ${f.length}"))
    val maxFrame = frames.foldLeft(0)((m, f) => math.max(m, f.length))

    val avih = new ByteArrayOutputStream()
    avih.write(le32(1000000 / math.max(fps, 1))) // dwMicroSecPerFrame
    avih.write(le32(0)); avih.write(le32(0))     // maxBytesPerSec, padding
    avih.write(le32(0))                          // dwFlags
    avih.write(le32(frames.length))              // dwTotalFrames
    avih.write(le32(0)); avih.write(le32(1))     // initialFrames, dwStreams
    avih.write(le32(maxFrame))                   // suggestedBufferSize
    avih.write(le32(width)); avih.write(le32(height))
    (0 until 4).foreach(_ => avih.write(le32(0))) // reserved

    val strh = new ByteArrayOutputStream()
    strh.write(fcc("vids"))
    strh.write(fcc(if (mjpeg) "MJPG" else "DIB "))
    strh.write(le32(0))                          // dwFlags
    strh.write(le16(0)); strh.write(le16(0))     // priority, language
    strh.write(le32(0))                          // initialFrames
    strh.write(le32(1)); strh.write(le32(math.max(fps, 1))) // scale, rate
    strh.write(le32(0))                          // start
    strh.write(le32(frames.length))              // length (frames)
    strh.write(le32(maxFrame))                   // suggestedBufferSize
    strh.write(le32(-1))                         // quality
    strh.write(le32(0))                          // sampleSize
    strh.write(le16(0)); strh.write(le16(0))     // rcFrame
    strh.write(le16(width)); strh.write(le16(height))

    val strf = new ByteArrayOutputStream()       // BITMAPINFOHEADER
    strf.write(le32(40))
    strf.write(le32(width)); strf.write(le32(height))
    strf.write(le16(1)); strf.write(le16(24))    // planes, bitCount
    strf.write(if (mjpeg) fcc("MJPG") else le32(0)) // biCompression
    strf.write(le32(stride * height))            // biSizeImage
    strf.write(le32(0)); strf.write(le32(0))     // ppm x/y
    strf.write(le32(0)); strf.write(le32(0))     // clrUsed, clrImportant

    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)
    val frameId = if (mjpeg) "00dc" else "00db"
    val movi = list("movi",
      frames.foldLeft(Array.emptyByteArray)((acc, f) => acc ++ chunk(frameId, f)))

    val out = new ByteArrayOutputStream()
    val body = fcc("AVI ") ++ hdrl ++ movi
    out.write(fcc("RIFF")); out.write(le32(body.length)); out.write(body)
    out.toByteArray
  }

  // ---- decode ------------------------------------------------------------

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Parse an AVI; None for anything that is not a well-formed clip of a
    * stream type we decode (raw BI_RGB 24-bit or MJPEG). Never throws on
    * malformed bytes — a corpus decode job treats those as stub rows. */
  def parse(bytes: Array[Byte]): Option[Clip] = {
    try {
      if (bytes.length < 12 || fourCC(bytes, 0) != "RIFF" ||
        fourCC(bytes, 8) != "AVI ") return None
      var width = 0; var height = 0
      var rate = 0; var scale = 1
      var mjpeg = false; var okFormat = false
      val frames = IndexedSeq.newBuilder[Array[Byte]]

      def walk(from: Int, to: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = fourCC(bytes, off)
          val size = readLe32(bytes, off + 4)
          if (size < 0 || off + 8 + size > to) return // truncated — stop
          if (id == "LIST") {
            walk(off + 12, off + 8 + size) // skip the 4-byte list type
          } else id match {
            case "strh" if size >= 32 =>
              if (fourCC(bytes, off + 8) == "vids") {
                scale = math.max(readLe32(bytes, off + 8 + 20), 1)
                rate = readLe32(bytes, off + 8 + 24)
              }
            case "strf" if size >= 20 =>
              width = readLe32(bytes, off + 8 + 4)
              height = readLe32(bytes, off + 8 + 8)
              val bitCount = (bytes(off + 8 + 14) & 0xFF) |
                ((bytes(off + 8 + 15) & 0xFF) << 8)
              val compression = readLe32(bytes, off + 8 + 16)
              val compFcc = fourCC(bytes, off + 8 + 16)
              if (compression == 0 && bitCount == 24) okFormat = true
              else if (compFcc == "MJPG") { okFormat = true; mjpeg = true }
            case frameId if frameId.endsWith("db") || frameId.endsWith("dc") =>
              frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
            case _ => () // unknown chunk — skip
          }
          off += 8 + size + (size % 2) // word alignment
        }
      }
      walk(12, math.min(bytes.length, 8 + readLe32(bytes, 4)))
      val fs = frames.result()
      if (!okFormat || width <= 0 || height <= 0 || fs.isEmpty) None
      else {
        val stride = rowStride(width)
        // raw frames must actually carry a full pixel grid
        if (!mjpeg && fs.exists(_.length < stride * height)) None
        else Some(Clip(width, height,
          if (scale > 0) rate.toDouble / scale else 0.0, mjpeg, fs))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** 8-bin normalized luminance histogram of one frame — raw BGR directly,
    * MJPEG through `javax.imageio`. None if an MJPEG frame fails to decode. */
  def frameLuminance(clip: Clip, frame: Array[Byte]): Option[Array[Float]] = {
    val hist = new Array[Long](8)
    if (clip.mjpeg) {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return None
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          hist(lum >> 5) += 1
          x += 1
        }
        y += 1
      }
      val n = (img.getWidth.toLong * img.getHeight).toFloat
      Some(hist.map(_ / n))
    } else {
      val stride = rowStride(clip.width)
      var y = 0
      while (y < clip.height) {
        var x = 0
        while (x < clip.width) {
          val p = y * stride + x * 3 // bottom-up order is luminance-neutral
          val lum = ((frame(p + 2) & 0xFF) * 299 + (frame(p + 1) & 0xFF) * 587 +
            (frame(p) & 0xFF) * 114) / 1000
          hist(lum >> 5) += 1
          x += 1
        }
        y += 1
      }
      val n = (clip.width.toLong * clip.height).toFloat
      Some(hist.map(_ / n))
    }
  }
}
