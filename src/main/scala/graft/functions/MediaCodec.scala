package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM encoders/decoders for three PUBLIC container formats —
  * PNG (RFC 2083), WAV (RIFF/WAVE), GIF89a — used by the multimodal
  * operator so the "decode" step does real byte-level work end to end
  * (signature checks, big/little-endian header fields, chunk CRCs,
  * zlib inflate) instead of a stub. No external media libraries: only
  * `java.util.zip` (CRC32, Deflater/Inflater) and `java.nio`.
  *
  * The encoders exist so tests and the synthetic media table can PLANT
  * known dimensions and verify the decoders recover them from the
  * bytes alone — the decoders never see the metadata columns.
  */
object MediaCodec {

  // ------------------------------------------------------------------ PNG

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc(typ: Array[Byte], data: Array[Byte]): Int = {
    val c = new CRC32
    c.update(typ); c.update(data)
    c.getValue.toInt
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(t).put(data).putInt(crc(t, data))
      .array()
  }

  /** Minimal valid 8-bit-grayscale PNG: signature + IHDR + one IDAT
    * (zlib-deflated scanlines, filter 0) + IEND, all CRCs real. Pixel
    * (x, y) cycles through `content`. */
  def pngEncode(width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate / adaptive / no interlace
      .array()
    val raw = new Array[Byte](height * (1 + width)) // filter byte 0 + row
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = y * width + x
        raw(y * (1 + width) + 1 + x) =
          if (content.isEmpty) (i % 251).toByte else content(i % content.length)
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw); deflater.finish()
    // loop to completion: a single deflate() call into a fixed buffer
    // silently truncates the IDAT once the stream outgrows it (poorly
    // compressible data overshoots raw.length for large images)
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zout.write(buf, 0, n)
    }
    deflater.end()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zout.toByteArray) ++ chunk("IEND", Array.empty)
  }

  /** Parsed PNG header facts, all recovered from bytes: dimensions and
    * depth from IHDR, `crcOk` by recomputing the IHDR CRC, `pixelsOk`
    * by actually INFLATING the IDAT stream and checking the scanline
    * byte count is height·(1+width). */
  final case class PngInfo(width: Int, height: Int, bitDepth: Int, colorType: Int,
      crcOk: Boolean, pixelsOk: Boolean)

  def pngDecode(bytes: Array[Byte]): Option[PngInfo] = {
    if (bytes.length < 8 + 25 || !bytes.take(8).sameElements(PngSig)) return None
    val bb = ByteBuffer.wrap(bytes, 8, bytes.length - 8)
    val ihdrLen = bb.getInt
    val typ = new Array[Byte](4); bb.get(typ)
    if (ihdrLen != 13 || new String(typ, "US-ASCII") != "IHDR") return None
    val data = new Array[Byte](13); bb.get(data)
    val storedCrc = bb.getInt
    val d = ByteBuffer.wrap(data)
    val w = d.getInt; val h = d.getInt
    val depth = d.get() & 0xff; val color = d.get() & 0xff
    // walk remaining chunks, inflating every IDAT
    val inflater = new Inflater
    var pixelBytes = 0L
    var sawEnd = false
    try {
      while (bb.remaining() >= 12 && !sawEnd) {
        val len = bb.getInt
        val t = new Array[Byte](4); bb.get(t)
        val name = new String(t, "US-ASCII")
        if (len < 0 || len > bb.remaining() - 4) return None
        val payload = new Array[Byte](len); bb.get(payload)
        bb.getInt // chunk CRC (IHDR's is the one we verify explicitly)
        name match {
          case "IDAT" =>
            // corrupt deflate data must take the None path (the Option
            // contract extractFeatures relies on), not kill the task;
            // a preset-dictionary stream (FDICT) would otherwise spin
            // this loop forever (inflate()=0, needsInput=false)
            inflater.setInput(payload)
            val out = new Array[Byte](8192)
            try while (!inflater.needsInput && !inflater.finished &&
                !inflater.needsDictionary)
              pixelBytes += inflater.inflate(out)
            catch { case _: java.util.zip.DataFormatException => return None }
            if (inflater.needsDictionary) return None
          case "IEND" => sawEnd = true
          case _ => ()
        }
      }
    } finally inflater.end()
    Some(PngInfo(w, h, depth, color,
      crcOk = storedCrc == crc("IHDR".getBytes("US-ASCII"), data),
      pixelsOk = sawEnd && pixelBytes == h.toLong * (1 + w)))
  }

  /** Real nearest-neighbor PNG downscale: inflate the scanlines, sample
    * every `scale`-th pixel, re-encode. `scale` ≥ 1 keeps ≥1×1.
    * Returns (bytes, newWidth, newHeight) — the dims come from the
    * DECODED header, the one source of truth, so a caller can never
    * re-derive them from metadata and silently disagree with the
    * payload. */
  def pngResize(bytes: Array[Byte], maxDim: Int): Option[(Array[Byte], Int, Int)] =
    pngDecode(bytes).filter(i => i.crcOk && i.pixelsOk).map { info =>
      val scale = math.max(1, math.max(info.width, info.height) / math.max(1, maxDim))
      val nw = math.max(1, info.width / scale)
      val nh = math.max(1, info.height / scale)
      val raw = pngInflateRaw(bytes, info)
      val out = new Array[Byte](nw * nh)
      var y = 0
      while (y < nh) {
        var x = 0
        while (x < nw) {
          out(y * nw + x) = raw(y * scale * (1 + info.width) + 1 + x * scale)
          x += 1
        }
        y += 1
      }
      (pngEncode(nw, nh, out), nw, nh) // content laid row-major == exact pixels
    }

  private def pngInflateRaw(bytes: Array[Byte], info: PngInfo): Array[Byte] = {
    val bb = ByteBuffer.wrap(bytes, 8, bytes.length - 8)
    val out = new Array[Byte](info.height * (1 + info.width))
    val inflater = new Inflater
    var off = 0
    var sawEnd = false
    try {
      // same chunk-walk discipline as pngDecode: validate each length
      // and stop at IEND — trailing garbage after the trailer would
      // otherwise be read as a chunk header (negative/oversized len ->
      // allocation or underflow crash)
      while (bb.remaining() >= 12 && !sawEnd) {
        val len = bb.getInt
        val t = new Array[Byte](4); bb.get(t)
        val name = new String(t, "US-ASCII")
        if (len < 0 || len > bb.remaining() - 4) return out
        val payload = new Array[Byte](len); bb.get(payload)
        bb.getInt
        name match {
          case "IDAT" =>
            inflater.setInput(payload)
            try while (!inflater.needsInput && !inflater.finished &&
                !inflater.needsDictionary && off < out.length)
              off += inflater.inflate(out, off, out.length - off)
            catch { case _: java.util.zip.DataFormatException => return out }
          case "IEND" => sawEnd = true
          case _ => ()
        }
      }
    } finally inflater.end()
    out
  }

  // ------------------------------------------------------------------ WAV

  /** Minimal valid PCM WAV: RIFF header + "fmt " (16-byte PCM block:
    * channels, sample rate, byte rate, block align, bits) + "data" with
    * `nSamples` 16-bit little-endian samples cycling through `content`. */
  def wavEncode(channels: Int, sampleRate: Int, nSamples: Int, content: Array[Byte]): Array[Byte] = {
    val bits = 16
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort)
      .putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < dataSize / 2) {
      val b = if (content.isEmpty) i else content(i % content.length) & 0xff
      bb.putShort((b * 257 - 32768).toShort) // spread bytes over the 16-bit range
      i += 1
    }
    bb.array()
  }

  final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int, nSamples: Long)

  def wavDecode(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes.length < 44) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); bb.get(riff)
    bb.getInt // riff size
    val wave = new Array[Byte](4); bb.get(wave)
    if (new String(riff, "US-ASCII") != "RIFF" || new String(wave, "US-ASCII") != "WAVE") return None
    var channels = 0; var rate = 0; var bits = 0; var dataSize = -1L; var blockAlign = 1
    var malformed = false
    while (bb.remaining() >= 8 && !malformed) {
      val id = new Array[Byte](4); bb.get(id)
      val size = bb.getInt
      // a negative size (corrupt header) must take the None path, not
      // throw from ByteBuffer.position
      if (size < 0) malformed = true
      else {
        new String(id, "US-ASCII") match {
          case "fmt " if size >= 16 && bb.remaining() >= 16 =>
            val fmtStart = bb.position()
            bb.getShort // audio format
            channels = bb.getShort & 0xffff
            rate = bb.getInt
            bb.getInt // byte rate
            blockAlign = bb.getShort & 0xffff
            bits = bb.getShort & 0xffff
            bb.position(math.min(fmtStart.toLong + size, bb.limit().toLong).toInt)
          case "data" =>
            dataSize = size.toLong
            bb.position(math.min(bb.position().toLong + size, bb.limit().toLong).toInt)
          case _ =>
            bb.position(math.min(bb.position().toLong + size, bb.limit().toLong).toInt)
        }
        // RIFF pads odd-sized chunks to even with one byte the size
        // field does not count — skipping it keeps later chunk reads
        // aligned on spec-conformant real-world files
        if (size % 2 == 1 && bb.remaining() >= 1) bb.position(bb.position() + 1)
      }
    }
    if (malformed) return None
    if (channels == 0 || dataSize < 0) None
    else Some(WavInfo(channels, rate, bits, dataSize / math.max(1, blockAlign)))
  }

  // ------------------------------------------------------------------ GIF

  /** Minimal valid GIF89a: header + logical screen descriptor (width/
    * height little-endian uint16, no global color table) + trailer. */
  def gifEncode(width: Int, height: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
      .putShort(width.toShort).putShort(height.toShort)
      .put(0.toByte)  // packed: no global color table
      .put(0.toByte)  // background color
      .put(0.toByte)  // aspect ratio
      .put(0x3b.toByte) // trailer
    bb.array()
  }

  final case class GifInfo(width: Int, height: Int, version: String, terminated: Boolean)

  def gifDecode(bytes: Array[Byte]): Option[GifInfo] = {
    if (bytes.length < 13) return None
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF89a" && hdr != "GIF87a") return None
    val bb = ByteBuffer.wrap(bytes, 6, 4).order(ByteOrder.LITTLE_ENDIAN)
    Some(GifInfo(bb.getShort & 0xffff, bb.getShort & 0xffff, hdr.substring(3),
      terminated = (bytes(bytes.length - 1) & 0xff) == 0x3b))
  }
}
