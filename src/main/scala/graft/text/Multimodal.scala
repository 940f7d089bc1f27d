package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.control.NonFatal

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * IMAGES decode for real through [[ImageIoCodec]] (JDK `javax.imageio`:
  * PNG/JPEG/BMP/GIF), AUDIO through [[WavCodec]] (JDK
  * `javax.sound.sampled`: WAV/PCM/AIFF/AU), and VIDEO through
  * [[AviCodec]] — a hand-written RIFF/AVI muxer + demuxer (the JDK has
  * no video container parser) whose frame payloads (MJPEG/PNG) decode
  * through the real image path. No external libraries anywhere; the
  * one genuine gap is interframe codecs (H.264 &c.), which demux fine
  * but have no pure-JDK frame decoder. The Spark-side contract
  * (schema, partitioning, batch shape, null handling) is identical on
  * all paths, which is the demonstration that the decoder boundary is
  * a one-function swap.
  */
object Multimodal {

  /** Canonical media-column schema: content + sidecar metadata. */
  val mediaMetadataType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // "image" | "audio" | "video"
    StructField("format", StringType),       // container/codec tag
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  /** STUB codec: parses the deterministic fake header this module writes
    * (`"GFT0" | media_type | format | width | height | duration`) and
    * treats everything after byte 36 as payload (the header is
    * 4+8+8+4+4+8 = 36 bytes — see `HeaderBytes`). A real deployment
    * replaces these two functions with actual decoders; signatures and
    * schemas are the contract.
    */
  object StubCodec {
    val HeaderBytes = 36 // 4 magic + 8 type + 8 format + 4 w + 4 h + 8 duration

    def encodeHeader(mediaType: String, format: String, w: Int, h: Int, durMs: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(HeaderBytes)
      bb.put("GFT0".getBytes, 0, 4)
      bb.put(padTo8(mediaType), 0, 8)
      bb.put(padTo8(format), 0, 8)
      bb.putInt(w); bb.putInt(h); bb.putLong(durMs)
      bb.array()
    }

    private def padTo8(s: String): Array[Byte] = {
      val out = new Array[Byte](8)
      val b = s.getBytes
      System.arraycopy(b, 0, out, 0, math.min(8, b.length))
      out
    }

    def decodeMetadata(bytes: Array[Byte]): Option[(String, String, Int, Int, Long, Long)] = {
      if (bytes == null || bytes.length < HeaderBytes) return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val magic = new Array[Byte](4); bb.get(magic)
      if (new String(magic) != "GFT0") return None
      val mt = new Array[Byte](8); bb.get(mt)
      val fm = new Array[Byte](8); bb.get(fm)
      val w = bb.getInt; val h = bb.getInt; val d = bb.getLong
      Some((new String(mt).trim.replace("\u0000", ""),
        new String(fm).trim.replace("\u0000", ""), w, h, d, bytes.length.toLong))
    }
  }

  /** REAL image codec over JDK `javax.imageio` — PNG/JPEG/BMP/GIF need no
    * external library. Metadata reads are header-only (`ImageReader
    * .getWidth/getHeight` parse the container header, no pixel decode), so
    * the metadata path stays cheap at scale; full pixel decode is a
    * separate, explicitly-priced function.
    */
  object ImageIoCodec {
    // executors must not write ImageIO's temp-file cache on shared disks
    javax.imageio.ImageIO.setUseCache(false)

    /** Deterministic test/query image: grayscale PNG whose pixel (x, y)
      * has luma `(31x + 17y + seed) mod 256` — lossless, so a decoder
      * can be value-checked against the closed-form generator.
      */
    def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((31L * x + 17L * y + seed) % 256).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Header-only (format, width, height) — no pixel decode. None for
      * unrecognized input AND for recognized-but-corrupt headers
      * (`getWidth` throws `IIOException` there).
      */
    def imageMetadata(bytes: Array[Byte]): Option[(String, Int, Int)] = {
      if (bytes == null || bytes.length == 0) return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getFormatName.toLowerCase(java.util.Locale.ROOT), r.getWidth(0), r.getHeight(0)))
          }
          // NonFatal, not just IOException: JDK readers throw unchecked
          // exceptions on hostile bytes too (GIF LZW code sizes ->
          // IndexOutOfBounds, crafted ICC profiles -> CMMException), and
          // the per-row-UDF contract is None-on-corrupt, never a failed
          // task. Errors (OOM &c.) still propagate.
          catch { case NonFatal(_) => None }
          finally r.dispose()
        }
      } finally iis.close()
    }

    /** Decompression-bomb ceiling for full pixel decodes: a hostile
      * header can declare any dimensions in a few bytes and
      * `ImageIO.read` will obligingly allocate and grind through them —
      * unbounded CPU + a multi-GB buffer from inside a per-row UDF
      * (found by mutation fuzzing: one flipped IHDR byte turned an 8×6
      * fixture into a minutes-long decode). 64M pixels passes any sane
      * training image (8192×8192) and caps the buffer at ~256 MB.
      */
    val MaxDecodePixels: Long = 64L * 1024 * 1024

    /** Full pixel decode with the codec-wide failure contract: None for
      * null/empty input, unrecognized formats (`ImageIO.read` returns
      * null), corrupt-but-recognized bytes (valid PNG signature,
      * truncated body — `ImageIO.read` throws `IIOException` there, and
      * a per-row UDF must not let that fail the job), AND
      * hostile-dimension headers (pre-checked via the header-only parse
      * BEFORE any pixel allocation — see [[MaxDecodePixels]]).
      */
    private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      val ok = imageMetadata(bytes).exists { case (_, w, h) =>
        w > 0 && h > 0 && w.toLong * h <= MaxDecodePixels
      }
      if (!ok) return None
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case NonFatal(_) => None } // None-on-corrupt, incl. unchecked JDK reader throws
    }

    /** Nearest-neighbor resize: decode → sample source pixel
      * `(tx·w/tw, ty·h/th)` (integer floor) per target pixel → re-encode
      * PNG. NN is chosen over area/bilinear because it is exactly
      * specified — target pixels are a pure index function of source
      * pixels, so a resize → decode chain stays value-checkable with no
      * interpolation tolerance. Real pipelines swap the kernel; the
      * decode → transform → re-encode plumbing is the contract.
      */
    def resizeNearest(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
      // the TARGET is bounded by the same ceiling as the decode side: a
      // caller-supplied 100000x100000 would allocate a ~40 GB buffer and
      // grind 10^10 setRGB calls inside a per-row UDF - the exact class
      // MaxDecodePixels exists to prevent
      if (tw <= 0 || th <= 0 || tw.toLong * th > MaxDecodePixels) return None
      val img = readImage(bytes).getOrElse(return None)
      val out = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val w = img.getWidth; val h = img.getHeight
      var ty = 0
      while (ty < th) {
        val sy = ty * h / th
        var tx = 0
        while (tx < tw) {
          out.setRGB(tx, ty, img.getRGB(tx * w / tw, sy))
          tx += 1
        }
        ty += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }

    /** Full decode → sum of per-pixel luma (blue channel). Value-pins the
      * pixel data itself, not just the header.
      */
    def pixelLumaSum(bytes: Array[Byte]): Option[Long] =
      readImage(bytes).map { img =>
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            s += img.getRGB(x, y) & 0xff
            x += 1
          }
          y += 1
        }
        s
      }

    /** Image quality statistics over the decoded pixels — the image twin
      * of the text/audio quality scorers: a training pipeline drops
      * dark/blank (low mean), washed-out (low spread), and clipped
      * (min/max pinned) images. All-INTEGER outputs over the luma
      * channel (pixel count, sum, sum of squares, min, max — mean and
      * variance are one division away), so comparisons stay exact.
      */
    def imageStats(bytes: Array[Byte]): Option[(Long, Long, Long, Int, Int)] =
      readImage(bytes).map { img =>
        var sum = 0L; var sumSq = 0L; var lo = 255; var hi = 0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val v = img.getRGB(x, y) & 0xff
            sum += v; sumSq += v.toLong * v
            if (v < lo) lo = v
            if (v > hi) hi = v
            x += 1
          }
          y += 1
        }
        (img.getWidth.toLong * img.getHeight, sum, sumSq, lo, hi)
      }
  }

  /** REAL audio codec over JDK `javax.sound.sampled` — WAV/PCM needs no
    * external library, exactly as PNG needed none for images. Metadata
    * reads are header-only (`AudioSystem.getAudioFileFormat` parses the
    * RIFF header, no sample decode), so the metadata path stays cheap at
    * scale; the full sample decode is a separate, explicitly-priced
    * function. The same RIFF discipline, written by hand, drives the
    * video container in [[AviCodec]].
    */
  object WavCodec {

    /** The JDK's audio file readers, resolved ONCE per JVM (r21):
      * `AudioSystem.getAudioFileFormat`/`getAudioInputStream` funnel
      * every call through `JDK13Services.getProviders`, a static
      * SYNCHRONIZED registry — 32 parallel per-row decode tasks
      * serialize on that monitor (measured: the audio queries ran ~2×
      * SLOWER parallel than serial). Same provider set and iteration
      * contract as AudioSystem (ServiceLoader; first reader that
      * accepts the bytes wins), resolved without the per-call lock.
      */
    private lazy val audioReaders: Array[javax.sound.sampled.spi.AudioFileReader] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) buf += it.next()
      // container readers FIRST (stable within each group): the JDK's
      // SoftMidiAudioFileReader otherwise precedes the Wave reader in
      // ServiceLoader order, and its accept-probe calls
      // MidiSystem.getSequence, whose JDK13Services provider lookup is a
      // static SYNCHRONIZED classpath scan per call — a thread-dumped
      // 32-task decode stage spent 95% of its time blocked on that
      // monitor. With the RIFF-family readers first, well-formed input
      // never reaches the MIDI probe; corrupt input still falls through
      // the full chain (None-on-corrupt contract unchanged).
      val (container, exotic) = buf.partition { r =>
        val n = r.getClass.getSimpleName
        n.startsWith("Wave") || n.startsWith("Aiff") || n.startsWith("Au")
      }
      (container ++ exotic).toArray
    }

    /** AudioSystem.getAudioFileFormat minus the global lock. A FRESH
      * ByteArrayInputStream per provider attempt instead of relying on
      * each provider's reset-on-failure contract.
      */
    private def fileFormatOf(bytes: Array[Byte]): javax.sound.sampled.AudioFileFormat = {
      var i = 0
      while (i < audioReaders.length) {
        try return audioReaders(i)
          .getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
        i += 1
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        "no registered audio file reader accepts this container")
    }

    /** AudioSystem.getAudioInputStream minus the global lock. */
    private def audioStreamOf(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      var i = 0
      while (i < audioReaders.length) {
        try return audioReaders(i)
          .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
        i += 1
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        "no registered audio file reader accepts this container")
    }

    /** 44-byte canonical RIFF header + room for `nSamples` PCM16 mono
      * samples; caller writes the samples into the returned buffer.
      */
    private def wavBuffer(nSamples: Int, sampleRateHz: Int): java.nio.ByteBuffer = {
      val dataLen = nSamples * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes, 0, 4); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes, 0, 4)
      bb.put("fmt ".getBytes, 0, 4); bb.putInt(16)
      bb.putShort(1)                       // PCM
      bb.putShort(1)                       // mono
      bb.putInt(sampleRateHz)
      bb.putInt(sampleRateHz * 2)          // byte rate
      bb.putShort(2)                       // block align
      bb.putShort(16)                      // bits per sample
      bb.put("data".getBytes, 0, 4); bb.putInt(dataLen)
      bb
    }

    /** Deterministic test/query clip: 16-bit PCM mono WAV whose sample i
      * is `((173·i + seed) mod 4001) − 2000` — lossless PCM, so a decoder
      * can be value-checked against the closed-form generator. The RIFF
      * container is written by hand ([[wavBuffer]]); the DECODE side goes
      * through `javax.sound.sampled`, which is the real codec under test.
      */
    def encodeWav(nSamples: Int, sampleRateHz: Int, seed: Long): Array[Byte] = {
      val bb = wavBuffer(nSamples, sampleRateHz)
      var i = 0
      while (i < nSamples) {
        bb.putShort((((173L * i + seed) % 4001) - 2000).toShort)
        i += 1
      }
      bb.array()
    }

    /** Header-only (container, channels, sample rate, frames, duration) —
      * no sample decode. Unknown/corrupt containers → None.
      */
    def audioMetadata(bytes: Array[Byte]): Option[(String, Int, Int, Long, Long)] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val aff = fileFormatOf(bytes)
        val fmt = aff.getFormat
        // the JDK parser accepts a fmt chunk with sample rate 0 — that is
        // corrupt input, not a divide-by-zero crash in a per-row UDF.
        // Compare against 1, not 0: AIFF's COMM rate is an extended
        // FLOAT, so a crafted 0.5 Hz passes a > 0 float check but
        // truncates to 0 in the integer division below
        if (fmt.getSampleRate < 1) return None
        // getFrameLength is NOT_SPECIFIED (-1) for containers with
        // unknown data size (e.g. streaming AU with 0xFFFFFFFF length);
        // that would flow through as n_frames=-1 and a negative duration
        if (aff.getFrameLength < 0) return None
        val frames = aff.getFrameLength.toLong
        val durMs = frames * 1000L / fmt.getSampleRate.toLong
        Some((aff.getType.toString.toLowerCase(java.util.Locale.ROOT), fmt.getChannels,
          fmt.getSampleRate.toInt, frames, durMs))
      } catch {
        // NonFatal subsumes UnsupportedAudioFileException/IOException and
        // also the unchecked throws the JDK audio parsers produce on
        // hostile headers (ArrayIndexOutOfBounds, NegativeArraySize) -
        // the per-row-UDF contract is None-on-corrupt, never a failed task
        case NonFatal(_) => None
      }
    }

    /** Decode all 16-bit signed samples (across channels, interleaved) to
      * one array, plus the container's `AudioFormat` so callers can check
      * channels/rate without a second header parse. None for non-PCM16
      * or corrupt input.
      */
    private def decodeSamplesWithFormat(
        bytes: Array[Byte]): Option[(Array[Short], javax.sound.sampled.AudioFormat)] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val ais = audioStreamOf(bytes)
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            return None
          // NOT readAllBytes: AudioInputStream.read returns 0 (not -1)
          // when fewer than one frame's bytes remain (e.g. a corrupt
          // block-align), and readAllBytes spins forever on a 0-return —
          // a mutation-fuzz-found infinite loop inside a per-row UDF.
          // Also bound the total by the container size: PCM16 payload
          // can never exceed the bytes that hold it, so a header
          // claiming more is corrupt input.
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = ais.read(buf)
          while (n > 0 && bos.size <= bytes.length) { bos.write(buf, 0, n); n = ais.read(buf) }
          // a 0-return is CORRUPT FRAMING (clean EOF is -1), whether on
          // the first read (block-align > buffer) or mid-stream (payload
          // truncated inside a frame) — all-or-nothing, same as the
          // container size bound: never a silently shorter clip
          if (n == 0 || bos.size > bytes.length) return None
          val raw = bos.toByteArray
          val out = new Array[Short](raw.length / 2)
          var i = 0
          if (fmt.isBigEndian)
            while (i + 1 < raw.length) { out(i / 2) = ((raw(i) << 8) | (raw(i + 1) & 0xff)).toShort; i += 2 }
          else
            while (i + 1 < raw.length) { out(i / 2) = ((raw(i + 1) << 8) | (raw(i) & 0xff)).toShort; i += 2 }
          Some((out, fmt))
        } finally ais.close()
      } catch {
        case NonFatal(_) => None // same None-on-corrupt contract as audioMetadata
      }
    }

    private def decodeSamples(bytes: Array[Byte]): Option[Array[Short]] =
      decodeSamplesWithFormat(bytes).map(_._1)

    /** Full decode → sum of all 16-bit signed samples across channels.
      * Value-pins the PCM payload itself, not just the header (the audio
      * twin of [[ImageIoCodec.pixelLumaSum]]).
      */
    def sampleSum(bytes: Array[Byte]): Option[Long] = {
      val out = decodeSamples(bytes)
      out.map { s => var acc = 0L; var i = 0; while (i < s.length) { acc += s(i); i += 1 }; acc }
    }

    /** Nearest-neighbor sample-rate conversion: decode → output sample j
      * reads source sample `j·srcRate/dstRate` (integer floor, output
      * length `n·dstRate/srcRate` floored) → re-encode WAV at the target
      * rate. The audio twin of [[ImageIoCodec.resizeNearest]]: NN over an
      * interpolating kernel keeps the transform exactly specified, so a
      * resample → decode chain is value-checkable with no tolerance; a
      * real pipeline swaps in a windowed-sinc kernel behind the same
      * signature.
      */
    def resampleNearest(bytes: Array[Byte], dstRate: Int): Option[Array[Byte]] = {
      if (dstRate <= 0) return None
      decodeSamplesWithFormat(bytes).collect {
        // mono only: the NN index walks the interleaved sample array, so
        // multi-channel input would mix channels. Rate < 1 is corrupt
        // input (a crafted fractional AIFF rate truncates to 0 in the
        // integer math — the > 0 float check alone would still divide by
        // zero); the length bound keeps a mutated 1 Hz header from
        // wrapping outLen negative through toInt and crashing the buffer
        // allocation from inside a per-row UDF — bounded like the image
        // path bounds pixels (64M samples)
        case (s, fmt) if fmt.getChannels == 1 && fmt.getSampleRate >= 1 &&
            s.length.toLong * dstRate / fmt.getSampleRate.toInt <= 64L * 1024 * 1024 =>
          val srcRate = fmt.getSampleRate.toInt
          val outLen = (s.length.toLong * dstRate / srcRate).toInt
          val bb = wavBuffer(outLen, dstRate)
          var j = 0
          while (j < outLen) {
            bb.putShort(s((j.toLong * srcRate / dstRate).toInt))
            j += 1
          }
          bb.array()
      }
    }

    /** Audio quality statistics over the decoded PCM — the audio twin of
      * the text quality scorer: a training pipeline filters clips on
      * silence (low energy), DC offset, clipping (peak at full scale),
      * and noise character (zero-crossing rate). All-INTEGER outputs
      * (count, sum, sum of squares, strict sign-change count, peak
      * magnitude) so downstream comparisons are exact; RMS/rates are
      * one division away for the caller.
      */
    def audioStats(bytes: Array[Byte]): Option[(Long, Long, Long, Long, Int)] =
      decodeSamples(bytes).map { s =>
        var sum = 0L; var sumSq = 0L; var zc = 0L; var peak = 0
        var i = 0
        while (i < s.length) {
          val v = s(i).toInt
          sum += v; sumSq += v.toLong * v
          if (i > 0 && v * s(i - 1).toInt < 0) zc += 1
          val a = math.abs(v); if (a > peak) peak = a
          i += 1
        }
        (s.length.toLong, sum, sumSq, zc, peak)
      }
  }

  /** Video: REAL RIFF/AVI container, written and demuxed by hand with
    * the same byte-level discipline as [[WavCodec.wavBuffer]] (AVI and
    * WAV share the RIFF grammar). The muxer writes a spec-shaped file —
    * `LIST hdrl` (an `avih` main header plus one `LIST strl` with
    * `strh`/`strf`), `LIST movi` holding one `00dc` chunk per frame
    * (even-padded, as RIFF requires), and an `idx1` keyframe index —
    * and the demuxer does a full RIFF walk: it finds `movi` wherever it
    * sits, descends into `rec ` grouping lists (real multiplexers emit
    * them), honors pad bytes, and reads chunk sizes as unsigned 32-bit
    * in Long arithmetic so a hostile length prefix cannot wrap a bounds
    * check. Frame payloads are whatever the fccHandler says — `MJPG`
    * (JPEG-in-AVI, the classic MJPEG layout) and `MPNG` (PNG-in-AVI)
    * both decode through the real `javax.imageio` path, so the
    * container AND the per-frame codec are real end-to-end. The only
    * remaining externality is interframe codecs (H.264 &c.), which no
    * pure-JDK decoder exists for — that is a codec gap, not a stubbed
    * boundary: such a chunk demuxes fine and fails frame decode with
    * the shared None/empty contract.
    *
    * Reference for the contract: the q44 frame-sampling oracle
    * (`queries/LlmData.scala`) pins the sampling semantics; the AVI
    * layout itself is the public RIFF/AVI spec.
    */
  object AviCodec {
    private val Keyframe = 0x10 // AVIIF_KEYFRAME / AVIF_HASINDEX share the bit value

    private def le(n: Int): java.nio.ByteBuffer =
      java.nio.ByteBuffer.allocate(n).order(java.nio.ByteOrder.LITTLE_ENDIAN)

    /** RIFF chunk: fourcc + u32 size + body, padded to even length (the
      * size field records the UNPADDED length — readers re-pad).
      */
    private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = le(8 + body.length + (body.length & 1))
      bb.put(id.getBytes("US-ASCII"), 0, 4); bb.putInt(body.length); bb.put(body)
      bb.array()
    }

    private def list(typ: String, parts: Seq[Array[Byte]]): Array[Byte] = {
      val n = parts.map(_.length).sum
      val bb = le(12 + n)
      bb.put("LIST".getBytes("US-ASCII"), 0, 4); bb.putInt(4 + n)
      bb.put(typ.getBytes("US-ASCII"), 0, 4)
      parts.foreach(bb.put)
      bb.array()
    }

    /** Mux already-encoded frame payloads (JPEG for `MJPG`, PNG for
      * `MPNG`) into a complete AVI byte stream: RIFF header, `hdrl`
      * (avih + strl(strh + strf/BITMAPINFOHEADER)), `movi` with one
      * `00dc` chunk per frame, `idx1` marking every frame a keyframe.
      */
    def encodeAvi(frames: Seq[Array[Byte]], w: Int, h: Int, frameMs: Long,
        handler: String): Array[Byte] = {
      val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
      val avih = {
        val b = le(56)
        b.putInt((frameMs * 1000L).toInt) // dwMicroSecPerFrame
        b.putInt(0); b.putInt(0)          // dwMaxBytesPerSec, dwPaddingGranularity
        b.putInt(Keyframe)                // dwFlags = AVIF_HASINDEX
        b.putInt(frames.size)             // dwTotalFrames
        b.putInt(0); b.putInt(1)          // dwInitialFrames, dwStreams
        b.putInt(maxFrame)                // dwSuggestedBufferSize
        b.putInt(w); b.putInt(h)          // dwWidth, dwHeight
        b.array()                         // dwReserved[4] = 0 (allocate zeros)
      }
      val strh = {
        val b = le(56)
        b.put("vids".getBytes("US-ASCII"), 0, 4)
        b.put(handler.getBytes("US-ASCII"), 0, 4)
        b.putInt(0); b.putInt(0); b.putInt(0) // dwFlags, wPriority+wLanguage, dwInitialFrames
        b.putInt(frameMs.toInt)           // dwScale (ms per frame…)
        b.putInt(1000)                    // …over dwRate 1000 = fps
        b.putInt(0)                       // dwStart
        b.putInt(frames.size)             // dwLength, in dwScale units
        b.putInt(maxFrame)                // dwSuggestedBufferSize
        b.putInt(-1); b.putInt(0)         // dwQuality (default), dwSampleSize
        b.putShort(0); b.putShort(0)      // rcFrame left, top
        b.putShort(w.toShort); b.putShort(h.toShort)
        b.array()
      }
      val strf = { // BITMAPINFOHEADER
        val b = le(40)
        b.putInt(40); b.putInt(w); b.putInt(h)
        b.putShort(1); b.putShort(24)     // biPlanes, biBitCount
        b.put(handler.getBytes("US-ASCII"), 0, 4) // biCompression
        b.putInt(w * h * 3)               // biSizeImage (nominal)
        b.array()                         // x/y ppm + clr fields = 0
      }
      val hdrl = list("hdrl", Seq(chunk("avih", avih),
        list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
      val moviChunks = frames.map(chunk("00dc", _))
      val movi = list("movi", moviChunks)
      val idx1 = {
        val b = le(16 * frames.size)
        var off = 4 // offsets are relative to the 'movi' type fourcc
        frames.zip(moviChunks).foreach { case (f, c) =>
          b.put("00dc".getBytes("US-ASCII"), 0, 4)
          b.putInt(Keyframe); b.putInt(off); b.putInt(f.length)
          off += c.length
        }
        chunk("idx1", b.array())
      }
      val body = Array(hdrl, movi, idx1)
      val total = body.map(_.length).sum
      val bb = le(12 + total)
      bb.put("RIFF".getBytes("US-ASCII"), 0, 4); bb.putInt(4 + total)
      bb.put("AVI ".getBytes("US-ASCII"), 0, 4)
      body.foreach(bb.put)
      bb.array()
    }

    /** Deterministic test/query clip: `nFrames` PNG payloads (handler
      * `MPNG`) where frame t's pixel (x, y) has luma
      * `(31x + 17y + seed + 97t) mod 256` — PNG because it is lossless,
      * so per-frame decodes stay value-checkable against the closed-form
      * generator (JPEG would interpose an IDCT tolerance); the container
      * walked by the demuxer is the same real AVI either way, and the
      * MJPEG layout is pinned by spec with real JPEG payloads.
      */
    def encodeAviPngSeq(w: Int, h: Int, nFrames: Int, frameMs: Long, seed: Long): Array[Byte] =
      encodeAvi(Array.tabulate(nFrames)(t => ImageIoCodec.encodePng(w, h, seed + 97L * t)),
        w, h, frameMs, "MPNG")

    private def fcc(bytes: Array[Byte], i: Int): String =
      new String(bytes, i, 4, "US-ASCII")
    // u32 read in Long domain: a hostile 0xFFFFFFFF size must compare as
    // 4 294 967 295, not wrap negative and slip past a bounds check
    private def u32(bytes: Array[Byte], i: Int): Long =
      ((bytes(i) & 0xffL)) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)

    /** Demux: full RIFF walk to every video chunk (`##dc` compressed /
      * `##db` uncompressed, `rec ` grouping lists included), returning
      * payload byte-arrays in stream order. Stream numbers are two
      * DECIMAL digits — the precedent is ffmpeg, whose
      * `avi_stream2fourcc` writes `'0'+n/10, '0'+n%10` on the mux side
      * and `get_stream_idx` reads decimal digits on the demux side, so
      * stream 10 is `10dc`, never `0Adc`. (vfw.h's `MAKEAVICKID` is NOT
      * decimal — it packs per-nibble `'0'+hi, '0'+lo`, encoding stream
      * 10 as `0:`; files in the wild follow ffmpeg, not the macro's
      * >9-stream corner.) A nonstandard hex-looking id is SKIPPED like
      * any non-video chunk
      * rather than counted as a stream (one stray `0Adc` must not trip
      * the multi-stream rejection and void a file's valid `00dc`
      * frames). A file whose video chunks span MORE than one (decimal)
      * stream is rejected whole rather than demuxed to an interleaved
      * mash of both streams' frames. Truncated, overrunning, or non-AVI
      * input → empty: the all-or-nothing per-row failure contract every
      * codec here shares — never a silently shorter or mixed clip.
      */
    def extractFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
      if (bytes == null || bytes.length < 12 ||
          fcc(bytes, 0) != "RIFF" || fcc(bytes, 8) != "AVI ") return Seq.empty
      val end = 8L + u32(bytes, 4)
      if (end < 12 || end > bytes.length) return Seq.empty // truncated container
      val out = Seq.newBuilder[(String, Array[Byte])]
      def isVideoChunk(id: String) =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.substring(2) == "dc" || id.substring(2) == "db")
      // walk one chunk run [i, limit); inMovi flags whether video chunks
      // and rec-lists are expected here. Returns false on any
      // malformation. depth caps list nesting: real AVIs are 2 deep
      // (movi → rec), and unbounded recursion on a crafted
      // thousands-deep rec chain would overflow the stack in a
      // per-row UDF — the same class of hostile input as the u32 sizes.
      def walk(start: Long, limit: Long, inMovi: Boolean, depth: Int): Boolean = {
        if (depth > 16) return false
        var i = start
        while (i < limit) {
          if (i + 8 > limit) return false // truncated chunk header
          val id = fcc(bytes, i.toInt)
          val size = u32(bytes, i.toInt + 4)
          val dataEnd = i + 8 + size
          if (dataEnd > limit) return false // hostile/truncated size
          if (id == "LIST") {
            if (size < 4) return false
            val typ = fcc(bytes, i.toInt + 8)
            if (typ == "movi" || (inMovi && typ == "rec "))
              { if (!walk(i + 12, dataEnd, inMovi = true, depth + 1)) return false }
            // other lists (hdrl, strl, odml…) carry no frames: skip whole
          } else if (inMovi && isVideoChunk(id)) {
            out += ((id.substring(0, 2).toUpperCase(java.util.Locale.ROOT),
              java.util.Arrays.copyOfRange(bytes, i.toInt + 8, dataEnd.toInt)))
          }
          i = dataEnd + (size & 1) // RIFF even-padding
        }
        true
      }
      if (!walk(12, end, inMovi = false, depth = 0)) Seq.empty
      else {
        val frames = out.result()
        // all-or-nothing across streams: frames from a single video
        // stream or nothing — never a merged multi-stream sequence
        if (frames.iterator.map(_._1).toSet.size > 1) Seq.empty
        else frames.map(_._2)
      }
    }

    /** Header-only metadata from `hdrl` — (handler, width, height,
      * n_frames, duration_ms) — no frame decode, the AVI twin of
      * [[ImageIoCodec.imageMetadata]]. None for malformed input.
      */
    def aviMetadata(bytes: Array[Byte]): Option[(String, Int, Int, Long, Long)] = {
      if (bytes == null || bytes.length < 12 ||
          fcc(bytes, 0) != "RIFF" || fcc(bytes, 8) != "AVI ") return None
      val end = 8L + u32(bytes, 4)
      if (end < 12 || end > bytes.length) return None
      var i = 12L
      while (i + 8 <= end) {
        val size = u32(bytes, i.toInt + 4)
        val dataEnd = i + 8 + size
        if (dataEnd > end) return None
        if (fcc(bytes, i.toInt) == "LIST" && size >= 4 &&
            fcc(bytes, i.toInt + 8) == "hdrl") {
          // avih sits right after the list type; honor its DECLARED size
          // (the field exists so writers may extend the header past the
          // canonical 56 bytes) — we only require the fields we read
          if (i + 12 + 8 > dataEnd || fcc(bytes, i.toInt + 12) != "avih") return None
          val avihSize = u32(bytes, i.toInt + 16)
          if (avihSize < 56 || i + 20 + avihSize > dataEnd) return None
          val a = i.toInt + 20 // avih body
          val usPerFrame = u32(bytes, a)
          val nFrames = u32(bytes, a + 16)
          val wL = u32(bytes, a + 32)
          val hL = u32(bytes, a + 36)
          // same corrupt-header-is-None policy as the duration overflow:
          // a u32 width/height of 0 or past Int.MaxValue would present a
          // degenerate or negative geometry as valid metadata
          if (wL <= 0 || wL > Int.MaxValue || hL <= 0 || hL > Int.MaxValue) return None
          val w = wL.toInt
          val h = hL.toInt
          // two hostile u32-max values multiply past Long.MaxValue and
          // wrap the duration negative — corrupt header, not metadata
          if (nFrames > 0 && usPerFrame > Long.MaxValue / nFrames) return None
          val durMs = nFrames * usPerFrame / 1000L
          // the VIDEO stream's strh carries the fccHandler: scan strl
          // lists for fccType 'vids' (stream order is not mandated, so
          // an audio-first AVI must not report its audio codec here)
          var j = i + 20 + avihSize + (avihSize & 1)
          while (j + 12 <= dataEnd) {
            val s = u32(bytes, j.toInt + 4)
            if (j + 8 + s > dataEnd) return None
            if (fcc(bytes, j.toInt) == "LIST" && s >= 4 &&
                fcc(bytes, j.toInt + 8) == "strl" &&
                j + 12 + 8 + 8 <= dataEnd && fcc(bytes, j.toInt + 12) == "strh" &&
                // honor the strh's DECLARED size like avih above: it must
                // cover the two fields we read (fccType+fccHandler, 8
                // bytes) and fit its list - a strh declaring size 0
                // followed by bytes spelling 'vids' would otherwise
                // present the NEXT chunk's bytes as a codec handler
                u32(bytes, j.toInt + 16) >= 8 &&
                j + 20 + u32(bytes, j.toInt + 16) <= dataEnd &&
                fcc(bytes, j.toInt + 20) == "vids")
              return Some((fcc(bytes, j.toInt + 24).trim.toLowerCase(java.util.Locale.ROOT), w, h,
                nFrames, durMs))
            j += 8 + s + (s & 1)
          }
          return None
        }
        i = dataEnd + (size & 1)
      }
      None
    }
  }

  /** Frame sampling over the AVI container: every `stride`-th REAL frame
    * payload out of the demuxer, exploded one row per frame with its
    * original index — same output shape as the stub [[sampleFrames]],
    * but the frame bytes are decodable images out of a real container.
    */
  def sampleAviFrames(df: DataFrame, binaryCol: String, stride: Int = 2): DataFrame = {
    val sampler = udf { (bytes: Array[Byte]) =>
      AviCodec.extractFrames(bytes).zipWithIndex
        .collect { case (f, t) if t % stride == 0 => (t, f) }
    }
    df.select(col("*"), explode(sampler(col(binaryCol))).as("f"))
      .withColumn("frame_idx", col("f._1"))
      .withColumn("frame", col("f._2"))
      .drop("f")
  }

  /** Decode the metadata struct from a binary media column in the
    * GFT0 demo container (q37's decoder-swap round trip; every real
    * container now has its own codec — images [[ImageIoCodec]], audio
    * [[WavCodec]], video [[AviCodec]]).
    */
  val decodeMetadataUdf = udf { (bytes: Array[Byte]) =>
    StubCodec.decodeMetadata(bytes)
  }

  /** Real-image twin of [[decodeMetadataUdf]]: same `media_meta` struct,
    * decoded by `javax.imageio` from actual PNG/JPEG/BMP/GIF bytes. The
    * two UDFs being drop-in interchangeable is the decoder-swap contract.
    */
  val decodeImageMetadataUdf = udf { (bytes: Array[Byte]) =>
    ImageIoCodec.imageMetadata(bytes).map { case (fm, w, h) =>
      ("image", fm, w, h, 0L, if (bytes == null) 0L else bytes.length.toLong)
    }
  }

  def withMetadata(df: DataFrame, binaryCol: String, out: String = "media_meta"): DataFrame =
    df.withColumn(out,
      decodeMetadataUdf(col(binaryCol)).cast(mediaMetadataType))

  def withImageMetadata(df: DataFrame, binaryCol: String, out: String = "media_meta"): DataFrame =
    df.withColumn(out,
      decodeImageMetadataUdf(col(binaryCol)).cast(mediaMetadataType))

  /** Real-audio twin of [[decodeMetadataUdf]]: same `media_meta` struct,
    * decoded by `javax.sound.sampled` from actual WAV/AIFF/AU bytes.
    * `width` carries the channel count and `height` the sample rate —
    * the struct is the cross-modality contract, the per-modality column
    * aliasing happens at the query layer.
    */
  val decodeAudioMetadataUdf = udf { (bytes: Array[Byte]) =>
    WavCodec.audioMetadata(bytes).map { case (fm, ch, rate, _, durMs) =>
      ("audio", fm, ch, rate, durMs, if (bytes == null) 0L else bytes.length.toLong)
    }
  }

  def withAudioMetadata(df: DataFrame, binaryCol: String, out: String = "media_meta"): DataFrame =
    df.withColumn(out,
      decodeAudioMetadataUdf(col(binaryCol)).cast(mediaMetadataType))

  /** STUB feature extraction: a fixed-length float feature vector from
    * the payload (deterministic byte-histogram projection standing in for
    * a real embedding model; the batch shape — one vector per row,
    * `array<float>` — is what downstream ANN consumes).
    */
  def extractFeatures(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null) return out
    var i = StubCodec.HeaderBytes
    while (i < bytes.length) {
      out((bytes(i) & 0xff) % dim) += 1.0f
      i += 1
    }
    val n = math.max(1, bytes.length - StubCodec.HeaderBytes)
    var j = 0
    while (j < dim) { out(j) /= n; j += 1 }
    out
  }

  val extractFeaturesUdf = udf((b: Array[Byte]) => extractFeatures(b))

  /** STUB frame sampling: every `stride`-th payload chunk as a "frame"
    * (real video decode replaces the chunking; the exploded one-row-per-
    * frame shape and frame index column are the contract).
    */
  def sampleFrames(df: DataFrame, binaryCol: String, stride: Int = 4, frameSize: Int = 64): DataFrame = {
    val sampleUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.length <= StubCodec.HeaderBytes) Seq.empty[Array[Byte]]
      else bytes.drop(StubCodec.HeaderBytes).grouped(frameSize).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => chunk }.toSeq
    }
    df.select(col("*"), posexplode(sampleUdf(col(binaryCol))).as(Seq("frame_idx", "frame")))
  }
}
