package graft.mm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL pure-JVM media codecs behind the multimodal decode boundary.
  *
  * The rest of the multimodal family ([[Multimodal]]) stubs the codec
  * because this container has no native image/audio libraries — but
  * the JDK itself ships two genuine ones: `javax.imageio` (PNG) and
  * `javax.sound.sampled` (WAV/PCM). This module runs them for real:
  * deterministic media is ENCODED to actual container bytes and
  * DECODED back through the standard library codec, per partition, and
  * the decoded pixel/sample statistics are what the queries emit. PNG
  * and PCM-WAV are lossless, so a SQL oracle that replays the
  * generator arithmetic verifies the full encode→decode loop preserved
  * every pixel/sample — a much stronger check than byte-replay of a
  * stub, and the proof that the mapPartitions batch seam the stubs
  * established really does host a production codec unchanged.
  *
  * All generator arithmetic is integer-exact so both engines replay it
  * bit-for-bit; codec objects are allocated per call (they are cheap;
  * ImageIO's tmp-file cache — the one genuinely expensive part — is
  * disabled once per JVM below).
  */
object Codecs {
  ImageIO.setUseCache(false) // keep encode/decode in-heap, no temp files

  // ---- PNG ----------------------------------------------------------

  /** Deterministic grayscale test pattern — integer arithmetic only. */
  def grayAt(x: Int, y: Int, docId: Long): Int =
    ((x * 31L + y * 17L + docId) % 256L).toInt

  def pngWidth(docId: Long): Int = (8 + docId % 24).toInt
  def pngHeight(docId: Long): Int = (8 + (docId * 7) % 24).toInt

  /** Real PNG bytes (signature, IHDR, zlib-compressed IDAT, ...) for
    * the doc's deterministic image. */
  def encodePng(docId: Long): Array[Byte] = {
    val w = pngWidth(docId)
    val h = pngHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = grayAt(x, y, docId)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode real PNG bytes → (width, height, Σ red-channel) — the
    * checksum is over DECODED pixels, so it proves the roundtrip. */
  def decodePngStats(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    var s = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s += (img.getRGB(x, y) >> 16) & 0xff
        x += 1
      }
      y += 1
    }
    (w, h, s)
  }

  /** Real PNG bytes for an explicit (w, h, seed) grayscale frame —
    * lets one doc carry a deterministic FRAME SEQUENCE (seed varies
    * per frame, dims stay fixed) for the video-shaped queries. */
  def encodePngGray(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = grayAt(x, y, seed)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode real PNG bytes → row-major red-channel pixel vector. */
  def decodeGrayVec(bytes: Array[Byte]): Array[Int] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val out = new Array[Int](img.getWidth * img.getHeight)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        out(y * img.getWidth + x) = (img.getRGB(x, y) >> 16) & 0xff
        x += 1
      }
      y += 1
    }
    out
  }

  /** Σ |a−b| over two equal-length decoded frames. */
  def absDiffSum(a: Array[Int], b: Array[Int]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
    s
  }

  // Reused codec plumbing for the per-doc frame loops (r17 kernel
  // diet): ImageIO.write/read re-resolve a writer/reader per call and
  // allocate a fresh BufferedImage + stream wrapper per frame —
  // measured churn, not codec work. One PNG writer/reader per thread,
  // re-targeted per frame; the codec itself (encoder/decoder plugin)
  // is unchanged, so the bytes and decoded pixels are identical.
  private val pngWriter =
    ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
      ImageIO.getImageWritersByFormatName("png").next())
  private val pngReader =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      ImageIO.getImageReadersByFormatName("png").next())

  /** Scene-cut statistics for one doc's deterministic 6-frame sequence
    * — the [[graft.ops.PipelineQueries.multimodalVideoScenecut]] inner
    * loop as ONE kernel: every frame is still encoded to genuine PNG
    * bytes and decoded back through the real javax.imageio codec (the
    * key's contract), but the frame BufferedImage, the byte sink, the
    * two decoded-pixel buffers and the writer/reader instances are
    * allocated once per doc/thread instead of 6-12 times per doc —
    * and pixels move via the raster's bulk getSamples/DataBufferInt
    * instead of per-pixel get/setRGB colour-model round-trips. Output
    * is pinned byte-equal to the composed per-frame functions
    * (encodePngGray → decodeGrayVec → absDiffSum) by Opt17Spec.
    * Returns (cut_at, max_diff, n_static_transitions). */
  def sceneCutStats(id: Long): (Long, Long, Long) = {
    val w = pngWidth(id)
    val h = pngHeight(id)
    val cut = (2 + id % 3).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    val bos = new ByteArrayOutputStream()
    val writer = pngWriter.get()
    val reader = pngReader.get()
    var prev = new Array[Int](w * h)
    var cur = new Array[Int](w * h)
    val diffs = new Array[Long](5)
    var f = 0
    while (f < 6) {
      val seed = if (f < cut) id else id + 500000L
      var y = 0
      var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = grayAt(x, y, seed)
          data(i) = (g << 16) | (g << 8) | g
          x += 1
          i += 1
        }
        y += 1
      }
      bos.reset()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), null)
      ios.close()
      val iis = ImageIO.createImageInputStream(
        new ByteArrayInputStream(bos.toByteArray))
      reader.setInput(iis)
      val dec = reader.read(0)
      iis.close()
      // band 0 is the red channel for any RGB/gray colour model — the
      // same value decodeGrayVec reads via (getRGB >> 16) & 0xff,
      // without the per-pixel colour-model conversion
      dec.getRaster.getSamples(0, 0, w, h, 0, cur)
      if (f > 0) diffs(f - 1) = absDiffSum(prev, cur)
      val t = prev; prev = cur; cur = t
      f += 1
    }
    var maxDiff = 0L
    var cutAt = 1
    var nStatic = 0L
    var k = 0
    while (k < 5) {
      if (diffs(k) > maxDiff) { maxDiff = diffs(k); cutAt = k + 1 }
      if (diffs(k) == 0L) nStatic += 1
      k += 1
    }
    (cutAt.toLong, maxDiff, nStatic)
  }

  /** Decode real PNG bytes and extract ViT-style non-overlapping p×p
    * patches: (tiles per row, tiles per col, an exact integer checksum
    * Σ over tiles of (tileIndex+1)·tileSum over DECODED red-channel
    * pixels). Edge tiles sum whatever pixels exist (no padding). The
    * position-weighted checksum pins both every tile's content AND its
    * grid position, so a transposed or shifted patch grid fails the
    * oracle. */
  def decodePngTileStats(bytes: Array[Byte], p: Int): (Int, Int, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val ntx = (w + p - 1) / p
    val nty = (h + p - 1) / p
    val sums = new Array[Long](ntx * nty)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        sums((y / p) * ntx + x / p) += (img.getRGB(x, y) >> 16) & 0xff
        x += 1
      }
      y += 1
    }
    var cks = 0L
    var t = 0
    while (t < sums.length) { cks += (t + 1L) * sums(t); t += 1 }
    (ntx, nty, cks)
  }

  /** Real GIF bytes for the doc's deterministic image. GIF is
    * palette-indexed; an explicit 256-entry GRAYSCALE palette makes
    * the 8-bit gray pattern representable exactly (index i = gray i),
    * so the lossy-looking format round-trips losslessly here — the
    * palette-format counterpart of the PNG path, sharing its oracle.
    * Without the explicit palette the writer would quantize. */
  def encodeGif(docId: Long): Array[Byte] = {
    val w = pngWidth(docId)
    val h = pngHeight(docId)
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new BufferedImage(w, h,
      BufferedImage.TYPE_BYTE_INDEXED, cm)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.getRaster.setSample(x, y, 0, grayAt(x, y, docId))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  /** Decode real GIF bytes → (width, height, Σ gray) via the palette
    * lookup `getRGB` resolves — same checksum contract as
    * [[decodePngStats]]. */
  def decodeGifStats(bytes: Array[Byte]): (Int, Int, Long) =
    decodePngStats(bytes) // ImageIO dispatches on content, not name

  /** Decode real PNG bytes → nearest-neighbor resize to `side`×`side`
    * → RE-ENCODE to PNG → decode AGAIN → (srcW, srcH, Σ resized gray).
    * The checksum is read from the second decode, so it proves the
    * full decode→transform→encode→decode chain end to end; nearest
    * neighbor (`sx = x·w/side`) is integer arithmetic, so the oracle
    * replays the resized sum from the generator formula alone. */
  def resizePngStats(bytes: Array[Byte], side: Int): (Int, Int, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val out = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        out.setRGB(x, y, img.getRGB(x * w / side, y * h / side))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    val img2 = ImageIO.read(new ByteArrayInputStream(bos.toByteArray))
    var s = 0L
    y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        s += (img2.getRGB(x, y) >> 16) & 0xff
        x += 1
      }
      y += 1
    }
    (w, h, s)
  }

  // ---- JPEG ---------------------------------------------------------

  /** Real JPEG bytes for the doc's deterministic grayscale image —
    * `javax.imageio`'s second genuine codec, the LOSSY twin of
    * [[encodePng]]. Quality is set explicitly so the DCT quantization
    * tables (and therefore the decode error) are fixed; for a given
    * input + quality the encode is deterministic. */
  def encodeJpeg(docId: Long, quality: Float = 0.95f): Array[Byte] = {
    val w = pngWidth(docId)
    val h = pngHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, grayAt(x, y, docId))
        x += 1
      }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** Decode real JPEG bytes → (width, height, max |decoded−source|,
    * Σ |decoded−source|) against the deterministic generator. JPEG is
    * lossy, so unlike the PNG checksum the per-pixel values cannot be
    * replayed by an oracle — the contract is the decoded DIMENSIONS
    * (exact) plus BOUNDED pixel error (flags the oracle predicts). */
  def decodeJpegDelta(bytes: Array[Byte], docId: Long): (Int, Int, Long, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    var maxD = 0L
    var sumD = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = math.abs(raster.getSample(x, y, 0) - grayAt(x, y, docId)).toLong
        if (d > maxD) maxD = d
        sumD += d
        x += 1
      }
      y += 1
    }
    (w, h, maxD, sumD)
  }

  // ---- WAV ----------------------------------------------------------

  val WavRate = 16000f

  def wavSamples(docId: Long): Int = (200 + docId % 256).toInt

  /** Deterministic signed 16-bit PCM sample — integer arithmetic only. */
  def sampleAt(i: Int, docId: Long): Int =
    ((i * 37L + docId * 101L) % 65536L - 32768L).toInt

  /** Real RIFF/WAVE bytes (header + PCM16-LE mono payload) for the
    * doc's deterministic signal. */
  def encodeWav(docId: Long): Array[Byte] = {
    val n = wavSamples(docId)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sampleAt(i, docId)
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(WavRate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode real WAV bytes → decimate by 2 (every even-index sample —
    * the naive 16 kHz→8 kHz downsample) → RE-ENCODE at the halved rate
    * → decode AGAIN → (n out-samples, out rate, Σ out-sample²). The
    * energy is read from the second decode, so the full
    * decode→resample→encode→decode chain is proven; decimation is
    * index arithmetic, so the oracle replays the energy from the
    * generator formula alone. */
  def decimateWavStats(bytes: Array[Byte]): (Long, Long, Long) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val f = in.getFormat
    require(f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
      !f.isBigEndian, s"unexpected decoded format: $f")
    val raw = in.readAllBytes()
    val nIn = raw.length / 2
    val nOut = (nIn + 1) / 2
    val out = new Array[Byte](nOut * 2)
    var i = 0
    while (i < nOut) {
      out(2 * i) = raw(4 * i)
      out(2 * i + 1) = raw(4 * i + 1)
      i += 1
    }
    val halfFmt = new AudioFormat(WavRate / 2, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(out), halfFmt,
      nOut.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val in2 = AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bos.toByteArray))
    val raw2 = in2.readAllBytes()
    var e = 0L
    var n = 0L
    i = 0
    while (i + 1 < raw2.length) {
      val s = ((raw2(i) & 0xff) | (raw2(i + 1) << 8)).toShort.toInt
      e += s.toLong * s
      n += 1
      i += 2
    }
    (n, in2.getFormat.getSampleRate.toLong, e)
  }

  /** Decode real WAV bytes → (n samples, sample rate, Σ sample²) from
    * the DECODED stream (format parsed from the container header). */
  def decodeWavStats(bytes: Array[Byte]): (Long, Long, Long) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val f = in.getFormat
    require(f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
      !f.isBigEndian, s"unexpected decoded format: $f")
    val raw = in.readAllBytes()
    var e = 0L
    var n = 0L
    var i = 0
    while (i + 1 < raw.length) {
      val s = ((raw(i) & 0xff) | (raw(i + 1) << 8)).toShort.toInt
      e += s.toLong * s
      n += 1
      i += 2
    }
    (n, f.getSampleRate.toLong, e)
  }

  /** Frame-energy voice-activity detection over DECODED WAV samples:
    * chop into `frame`-sample frames (the last one partial), a frame
    * is "speech" when its energy exceeds `threshold`, and a segment
    * is a maximal run of speech frames. Returns (n_frames, n_speech,
    * n_segments). Exact integer energies, so the oracle replays the
    * generator arithmetic. */
  def decodeWavVad(bytes: Array[Byte], frame: Int,
      threshold: Long): (Long, Long, Long) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val raw = in.readAllBytes()
    val n = raw.length / 2
    val nFrames = (n + frame - 1) / frame
    var nSpeech = 0L
    var nSeg = 0L
    var prevSpeech = false
    var fr = 0
    while (fr < nFrames) {
      var e = 0L
      var i = fr * frame
      val end = math.min(i + frame, n)
      while (i < end) {
        val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
        e += s.toLong * s
        i += 1
      }
      val sp = e > threshold
      if (sp) {
        nSpeech += 1
        if (!prevSpeech) nSeg += 1
      }
      prevSpeech = sp
      fr += 1
    }
    (nFrames.toLong, nSpeech, nSeg)
  }

  // ---- BMP ----------------------------------------------------------

  def bmpWidth(docId: Long): Int = (8 + (docId * 3) % 24).toInt
  def bmpHeight(docId: Long): Int = (8 + (docId * 5) % 24).toInt

  /** Real Windows-BMP bytes (BITMAPFILEHEADER + 24-bit DIB) for the
    * doc's deterministic image — the JDK's third genuine image codec
    * after PNG/GIF, and the UNCOMPRESSED one, so it exercises the
    * row-padding path the zlib formats never touch. */
  def encodeBmp(docId: Long): Array[Byte] = {
    val w = bmpWidth(docId)
    val h = bmpHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = grayAt(x, y, docId)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  // ---- TIFF ---------------------------------------------------------

  def wbmpWidth(docId: Long): Int = (8 + (docId * 17) % 24).toInt
  def wbmpHeight(docId: Long): Int = (8 + (docId * 19) % 24).toInt

  /** Real WBMP bytes (the WAP 1-bit bitmap — the JDK's FIFTH genuine
    * image codec): the deterministic gray image THRESHOLDED at 128
    * into TYPE_BYTE_BINARY. WBMP is the only 1-bit container in
    * javax.imageio, exercising bit-packed rows none of the byte/int
    * formats touch; decoded white pixels read back as 255 in the red
    * channel, so [[decodePngStats]]' px_sum doubles as the
    * white-pixel census × 255. */
  def encodeWbmp(docId: Long): Array[Byte] = {
    val w = wbmpWidth(docId)
    val h = wbmpHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (grayAt(x, y, docId) >= 128) 0xffffff else 0)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "wbmp", bos), "no WBMP writer")
    bos.toByteArray
  }

  def pnmWidth(docId: Long): Int = (8 + (docId * 23) % 24).toInt
  def pnmHeight(docId: Long): Int = (8 + (docId * 29) % 24).toInt

  /** Real binary PPM (P6) bytes for the doc's deterministic image —
    * the SIXTH genuine codec, hand-rolled at the byte level (NetPBM
    * is the one interchange container javax.imageio never ships):
    * ASCII header (magic, a `#` comment, dims, maxval) followed by
    * the raw RGB raster — the text-header/binary-raster split no
    * other codec here exercises. */
  def encodePnm(docId: Long): Array[Byte] = {
    val w = pnmWidth(docId)
    val h = pnmHeight(docId)
    val bos = new ByteArrayOutputStream()
    bos.write(s"P6\n# graft doc $docId\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = grayAt(x, y, docId)
        bos.write(g); bos.write(g); bos.write(g)
        x += 1
      }
      y += 1
    }
    bos.toByteArray
  }

  /** Parse P6 (whitespace- and comment-tolerant header, per the NetPBM
    * spec: tokens separated by whitespace, `#` comments run to EOL,
    * exactly ONE whitespace byte between maxval and the raster) and
    * return (width, height, Σ red channel). */
  def decodePnmStats(bytes: Array[Byte]): (Int, Int, Long) = {
    var pos = 0
    def token(): String = {
      while (pos < bytes.length &&
          (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      val st = pos
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace)
        pos += 1
      new String(bytes, st, pos - st,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    require(token() == "P6", "not a binary PPM")
    val w = token().toInt
    val h = token().toInt
    val maxv = token().toInt
    require(maxv == 255, s"unsupported maxval $maxv")
    pos += 1 // the single post-maxval whitespace byte
    var sum = 0L
    var i = 0
    val n = w * h
    while (i < n) { sum += (bytes(pos + 3 * i) & 0xff); i += 1 }
    (w, h, sum)
  }

  def tiffWidth(docId: Long): Int = (8 + (docId * 11) % 24).toInt
  def tiffHeight(docId: Long): Int = (8 + (docId * 13) % 24).toInt

  /** Real TIFF bytes for the doc's deterministic image — the JDK's
    * FOURTH genuine image codec (the javax.imageio TIFF plugin,
    * JDK 9+): baseline grayscale-in-RGB TIFF with full IFD/tag
    * structure, exercising the directory-based container format the
    * stream formats (PNG/GIF/BMP) never touch. */
  def encodeTiff(docId: Long): Array[Byte] = {
    val w = tiffWidth(docId)
    val h = tiffHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = grayAt(x, y, docId)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "tiff", bos), "no TIFF writer")
    bos.toByteArray
  }

  /** Decode image bytes → 8-bucket luminance histogram (red channel
    * div 32) off the DECODED pixels. */
  def decodeImageHist(bytes: Array[Byte]): Array[Long] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val hist = new Array[Long](8)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        hist(((img.getRGB(x, y) >> 16) & 0xff) >> 5) += 1
        x += 1
      }
      y += 1
    }
    hist
  }

  /** Decode WAV bytes → integer autocorrelation pitch probe: best lag
    * in [minLag, maxLag] by R(τ) = Σ vᵢ·vᵢ₊τ over DECODED samples
    * (ties to the smallest lag). Exact longs throughout → the oracle
    * replays the generator arithmetic. Returns (n, bestLag, bestR). */
  def decodeWavPitch(bytes: Array[Byte], minLag: Int, maxLag: Int)
      : (Long, Long, Long) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val raw = in.readAllBytes()
    val n = raw.length / 2
    val v = new Array[Int](n)
    var i = 0
    while (i < n) {
      v(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    var bestLag = minLag.toLong
    var bestR = Long.MinValue
    var lag = minLag
    while (lag <= maxLag) {
      var r = 0L
      i = 0
      while (i + lag < n) {
        r += v(i).toLong * v(i + lag)
        i += 1
      }
      if (r > bestR) { bestR = r; bestLag = lag.toLong }
      lag += 1
    }
    (n.toLong, bestLag, bestR)
  }

  def qoiWidth(docId: Long): Int = (8 + (docId * 17) % 24).toInt
  def qoiHeight(docId: Long): Int = (8 + (docId * 19) % 24).toInt

  /** Real QOI bytes (the 2022 "Quite OK Image" format,
    * qoiformat.org spec) for the doc's deterministic gray image —
    * the SEVENTH genuine codec, hand-rolled at the byte level like
    * [[encodePnm]]: 14-byte header (magic "qoif", BE dims, channels,
    * colorspace), then the op-chunk stream — RUN (repeat biased −1),
    * INDEX (64-slot (3r+5g+7b+11a)%64 color cache), DIFF (2-bit
    * wraparound channel deltas), LUMA (6-bit dg + 4-bit dr−dg/db−dg
    * — the op the +31 gray ramp exercises on every pixel step), and
    * the RGB literal fallback; 7×0x00 + 0x01 end marker. A gray ramp
    * image hits RUN, INDEX, LUMA and RGB paths, so the roundtrip
    * certifies the whole op alphabet. */
  def encodeQoi(docId: Long): Array[Byte] = {
    val w = qoiWidth(docId)
    val h = qoiHeight(docId)
    val bos = new ByteArrayOutputStream()
    bos.write("qoif".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def be32(v: Int): Unit = {
      bos.write((v >>> 24) & 0xff); bos.write((v >>> 16) & 0xff)
      bos.write((v >>> 8) & 0xff); bos.write(v & 0xff)
    }
    be32(w); be32(h)
    bos.write(3) // channels RGB
    bos.write(0) // sRGB + linear alpha
    val index = new Array[Int](64) // packed 0xRRGGBBAA, init zero
    var pr = 0; var pg = 0; var pb = 0; val pa = 255
    var prevPacked = (pr << 24) | (pg << 16) | (pb << 8) | pa
    var run = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = grayAt(x, y, docId)
        val packed = (g << 24) | (g << 16) | (g << 8) | 255
        if (packed == prevPacked) {
          run += 1
          if (run == 62) { bos.write(0xc0 | (run - 1)); run = 0 }
        } else {
          if (run > 0) { bos.write(0xc0 | (run - 1)); run = 0 }
          val hash = (g * 3 + g * 5 + g * 7 + 255 * 11) % 64
          if (index(hash) == packed) {
            bos.write(hash)
          } else {
            index(hash) = packed
            val dr = ((g - pr) << 24) >> 24 // wraparound signed byte
            val dg = ((g - pg) << 24) >> 24
            val db = ((g - pb) << 24) >> 24
            val drg = dr - dg
            val dbg = db - dg
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
                db >= -2 && db <= 1) {
              bos.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) |
                (db + 2))
            } else if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
                dbg >= -8 && dbg <= 7) {
              bos.write(0x80 | (dg + 32))
              bos.write(((drg + 8) << 4) | (dbg + 8))
            } else {
              bos.write(0xfe); bos.write(g); bos.write(g); bos.write(g)
            }
          }
          pr = g; pg = g; pb = g
          prevPacked = packed
        }
        x += 1
      }
      y += 1
    }
    if (run > 0) bos.write(0xc0 | (run - 1))
    var i = 0
    while (i < 7) { bos.write(0); i += 1 }
    bos.write(1)
    bos.toByteArray
  }

  /** Decode QOI bytes (full op alphabet incl. RGBA) and return
    * (width, height, Σ red channel) — the generator-replay contract
    * shared by every codec key. */
  def decodeQoiStats(bytes: Array[Byte]): (Int, Int, Long) = {
    require(bytes.length >= 14 &&
      new String(bytes, 0, 4,
        java.nio.charset.StandardCharsets.US_ASCII) == "qoif",
      "not a QOI stream")
    def be32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    val w = be32(4)
    val h = be32(8)
    var pos = 14
    val index = new Array[Int](64)
    var r = 0; var g = 0; var b = 0; var a = 255
    var sum = 0L
    var emitted = 0L
    val total = w.toLong * h
    while (emitted < total) {
      val op = bytes(pos) & 0xff; pos += 1
      var runLen = 1
      if (op == 0xfe) { // RGB
        r = bytes(pos) & 0xff; g = bytes(pos + 1) & 0xff
        b = bytes(pos + 2) & 0xff; pos += 3
      } else if (op == 0xff) { // RGBA
        r = bytes(pos) & 0xff; g = bytes(pos + 1) & 0xff
        b = bytes(pos + 2) & 0xff; a = bytes(pos + 3) & 0xff; pos += 4
      } else (op >>> 6) match {
        case 0 => // INDEX
          val p = index(op & 0x3f)
          r = (p >>> 24) & 0xff; g = (p >>> 16) & 0xff
          b = (p >>> 8) & 0xff; a = p & 0xff
        case 1 => // DIFF
          r = (r + ((op >> 4) & 3) - 2) & 0xff
          g = (g + ((op >> 2) & 3) - 2) & 0xff
          b = (b + (op & 3) - 2) & 0xff
        case 2 => // LUMA
          val dg = (op & 0x3f) - 32
          val nxt = bytes(pos) & 0xff; pos += 1
          r = (r + dg + ((nxt >> 4) & 0xf) - 8) & 0xff
          g = (g + dg) & 0xff
          b = (b + dg + (nxt & 0xf) - 8) & 0xff
        case _ => // RUN
          runLen = (op & 0x3f) + 1
      }
      index((r * 3 + g * 5 + b * 7 + a * 11) % 64) =
        (r << 24) | (g << 16) | (b << 8) | a
      sum += r.toLong * runLen
      emitted += runLen
    }
    require(emitted == total, s"raster under/overrun: $emitted vs $total")
    (w, h, sum)
  }
}
