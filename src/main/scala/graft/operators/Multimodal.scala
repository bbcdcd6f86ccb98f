package graft.operators

import org.apache.spark.sql.{Column, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._

import graft.functions.hashes

/** Decoded audio statistics of one payload — the output row of
  * [[Multimodal.decodeAudioStats]]'s REAL javax.sound WAV decode. */
case class AudioStats(id: Long, n_samples: Long, sample_rate: Int,
    channels: Int, mean_abs: Double)

/** Pixel statistics of one decoded image — the output row of
  * [[Multimodal.decodeImageStats]]'s REAL javax.imageio decode. */
case class ImageStats(id: Long, width: Int, height: Int,
    mean_r: Double, mean_g: Double, mean_b: Double)

/** Per-video decoded statistics over the SAMPLED frames only — the
  * output row of [[Multimodal.decodeSampledVideoStats]]. */
case class VideoStats(id: Long, n_frames: Int, n_sampled: Int,
    width: Int, height: Int,
    mean_r: Double, mean_g: Double, mean_b: Double)

/** Multimodal (image/audio/video) column handling: media travels as
  * an opaque `binary` column plus typed metadata; decode and
  * feature-extraction run batched per partition so a codec library
  * amortizes its init cost across a partition's rows.
  *
  * The image path is REAL: [[encodePng]]/[[decodeImageStats]] run the
  * JDK's built-in javax.imageio PNG codec (headless-safe) through the
  * [[decodePartitions]] batching seam — actual pixels in, actual
  * per-channel statistics out (q92 oracle-verifies them). Formats the
  * JDK cannot decode (JPEG content, audio, video) would plug a codec
  * library into the SAME seam; for those payloads the codec-free
  * fallbacks are [[hashFeatures]] (content fingerprint, not pixels)
  * and [[byteDownsample]] (byte-stride thumbnail, not a pixel
  * resize) — honest binary operations, named for what they are.
  */
object Multimodal {

  /** Magic-byte MIME sniffing (the only content inspection that does
    * not require a codec). */
  def sniffMime(payload: Column): Column =
    when(hex(substring(payload, 1, 2)) === "FFD8", "image/jpeg")
      .when(hex(substring(payload, 1, 4)) === "89504E47", "image/png")
      .when(hex(substring(payload, 1, 4)) === "52494646", "audio/wav")
      .otherwise("application/octet-stream")

  /** Typed media metadata struct: mime + size (a real pipeline adds
    * width/height/duration from the decoder). */
  def mediaMetadata(payload: Column): Column =
    struct(
      sniffMime(payload).as("mime"),
      octet_length(payload).as("n_bytes"))

  /** Frame sampling: cut the payload into `frameSize`-byte frames,
    * keeping at most `maxFrames` (uniform-from-start sampling). Pure
    * codegen'd expression — array<binary> out, zero shuffle. */
  def frameSample(payload: Column, frameSize: Int, maxFrames: Int): Column = {
    val nFrames = least(
      ceil(octet_length(payload).cast("double") / frameSize).cast("int"),
      lit(maxFrames))
    when(octet_length(payload) === 0, array().cast("array<binary>"))
      .otherwise(transform(
        sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => substring(payload, (i * frameSize + 1).cast("int"), lit(frameSize))))
  }

  /** Content-FINGERPRINT feature vector: k features in [0,1) derived
    * from the payload's base64 via the oracle-mirrorable md5 hash. A
    * deterministic signature of the BYTES (near-dup detection, stable
    * bucketing), not a pixel decode — the pixel path is
    * [[decodeImageStats]]; an external codec for non-JDK formats
    * plugs into the same [[decodePartitions]] seam. */
  def hashFeatures(payload: Column, k: Int): Column = {
    val b64 = base64(payload)
    transform(sequence(lit(0), lit(k - 1)),
      i => (hashes.md5Hash60(concat(b64, lit("#"), i.cast("string")))
        % 1000L).cast("double") / 1000.0)
  }

  /** Byte-stride DOWNSAMPLE to at most `targetBytes` (byte i·k for
    * k = ceil(n/target)) — binary in, smaller binary out: a payload
    * thumbnail for transport/preview budgets, not a pixel resize
    * (that belongs in a [[decodePartitions]] kernel next to
    * [[decodeImageStats]]). Positions past the payload produce empty
    * slices, so short payloads pass through unchanged. */
  def byteDownsample(payload: Column, targetBytes: Int): Column = {
    val stride = greatest(
      ceil(octet_length(payload).cast("double") / targetBytes).cast("int"),
      lit(1))
    // transform + fold, NOT a targetBytes-wide literal concat: the
    // expression tree stays constant-depth, so a realistic target
    // (64 KiB) cannot blow up analysis time or generated-method size
    aggregate(
      transform(sequence(lit(0), lit(targetBytes - 1)),
        i => substring(payload, (i * stride + 1).cast("int"), lit(1))),
      lit(Array.emptyByteArray),
      (acc, b) => concat(acc, b))
  }

  /** The per-partition batching seam codecs plug into: one `decode`
    * call per partition, iterator-to-iterator (no materialization),
    * so codec/library init happens once per task — the
    * mapInPandas-style batch shape, in Scala. */
  def decodePartitions[T: Encoder](media: Dataset[Row],
      decode: Iterator[Row] => Iterator[T]): Dataset[T] =
    media.mapPartitions(decode)

  /** REAL in-JVM PNG encode (javax.imageio — PNG ships with the JDK,
    * headless-safe): a width×height RGB image whose left half is the
    * solid color `rgbLeft` and right half `rgbRight` (0xRRGGBB). With
    * an even width the per-channel pixel means are exactly
    * (left+right)/2 — which is what lets q92's DuckDB oracle predict
    * the DECODED statistics from the generation arithmetic alone. */
  /** ImageIO defaults to a FILE-backed stream cache: every encode or
    * decode creates+deletes a temp file, which under 32 concurrent
    * codec tasks turns into filesystem contention (measured 10× CPU
    * inflation at sf0.1). In-memory streams are strictly better for
    * payload-sized images. Static JVM-wide flag; setting it in both
    * kernels keeps each correct in isolation. DELIBERATE process-wide
    * choice: any other ImageIO user in this JVM also loses the file
    * cache — acceptable for an executor process (whose ImageIO use IS
    * these kernels), and only ever an in-memory/temp-file trade, never
    * a correctness change. */
  private[operators] def disableImageIoFileCache(): Unit =
    if (javax.imageio.ImageIO.getUseCache) // skip the sync path when done
      javax.imageio.ImageIO.setUseCache(false)

  def encodePng(width: Int, height: Int,
      rgbLeft: Int, rgbRight: Int): Array[Byte] =
    new PngEncoder().encode(width, height, rgbLeft, rgbRight)

  /** Minimal deterministic VIDEO container ("GVID": magic + BE32
    * frame count + per frame BE32 length + an ordinary encoded image)
    * — the third modality next to q92/q149's PNG and q102/q150's WAV.
    * Real containers (MP4/MKV) need codec libraries this environment
    * doesn't ship; the CONTAINER is the honest part a Spark pipeline
    * owns anyway (frame indexing, length-prefixed seeking, strided
    * sampling without decoding skipped frames), and each frame is a
    * REAL PNG decoded by the stock-JDK reader, so the per-frame
    * decode work is not stubbed. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      8 + frames.map(4 + _.length).sum)
    bb.put("GVID".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(frames.size)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** REAL video frame-sample kernel for [[decodePartitions]]: rows of
    * (id: long, payload: binary GVID container) → [[VideoStats]].
    * Every `stride`-th frame (0, stride, 2·stride, …) is DECODED —
    * all pixels visited, channel means measured from decoded data —
    * and the frames in between are SKIPPED by the length prefix
    * without touching their bytes: the decode cost scales with
    * sampled frames, not container size, which is the point of
    * frame-sampling a 100 TB video corpus. One PNG ImageReader per
    * partition (the q92 reader-reuse finding); frames must share
    * dimensions (a real pipeline normalizes first — fails loudly
    * otherwise). */
  def decodeSampledVideoStats(stride: Int)(
      rows: Iterator[Row]): Iterator[VideoStats] = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    disableImageIoFileCache()
    val it0 = javax.imageio.ImageIO.getImageReadersByFormatName("png")
    require(it0.hasNext, "no PNG ImageReader installed")
    val reader = it0.next()
    def readPng(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try { reader.setInput(iis); reader.read(0) }
      finally { reader.setInput(null); iis.close() }
    }
    val out = rows.map { r =>
      val id = r.getLong(0)
      val bb = java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](1))
      val magic = new Array[Byte](4)
      bb.get(magic)
      require(new String(magic,
          java.nio.charset.StandardCharsets.US_ASCII) == "GVID",
        s"video $id: bad container magic")
      val nf = bb.getInt
      var f = 0
      var sampled = 0
      var w = -1
      var h = -1
      var sr = 0L; var sg = 0L; var sb = 0L
      while (f < nf) {
        val len = bb.getInt
        if (f % stride == 0) {
          val frame = new Array[Byte](len)
          bb.get(frame)
          val img = readPng(frame)
          if (w < 0) { w = img.getWidth; h = img.getHeight }
          else require(img.getWidth == w && img.getHeight == h,
            s"video $id: frame $f is ${img.getWidth}x${img.getHeight}, " +
              s"expected ${w}x$h — normalize frames upstream")
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          sampled += 1
        } else bb.position(bb.position() + len)
        f += 1
      }
      // an EMPTY container is well-formed data (encodeVideo(Seq())
      // produces one), not a defect like bad magic or dimension
      // drift — emit a zero row instead of aborting the job
      if (sampled == 0) VideoStats(id, nf, 0, 0, 0, 0.0, 0.0, 0.0)
      else {
        val nPix = sampled.toLong * w * h
        VideoStats(id, nf, sampled, w, h,
          sr.toDouble / nPix, sg.toDouble / nPix, sb.toDouble / nPix)
      }
    }
    new Iterator[VideoStats] {
      override def hasNext: Boolean = {
        val more = out.hasNext
        if (!more) reader.dispose()
        more
      }
      override def next(): VideoStats = out.next()
    }
  }

  /** REAL image decode kernel for [[decodePartitions]]: rows of
    * (id: long, payload: binary) → [[ImageStats]] via javax.imageio
    * (PNG/BMP/GIF/JPEG with the stock JDK). Every pixel is visited —
    * the means are measured from decoded image data, not read from
    * any header — so q92's oracle match proves an actual decode ran.
    * Fails loudly on an undecodable payload: silently dropping rows
    * would corrupt a training corpus downstream.
    *
    * ImageReaders are created ONCE PER (partition, format) and reused
    * across the partition's rows: the convenience `ImageIO.read` does
    * a synchronized reader-registry lookup per image, which under 32
    * concurrent tasks serializes the whole decode (measured 6.7× on
    * this box: 5.5 s → 0.8 s for 192k small PNGs). Amortizing codec
    * init per task is exactly what the [[decodePartitions]] seam is
    * for. The format is sniffed from magic bytes, not trusted from
    * metadata. */
  def decodeImageStats(rows: Iterator[Row]): Iterator[ImageStats] =
    decodeStatsCore(rows, resize = None)

  /** [[decodeImageStats]] composed with a NEAREST-NEIGHBOR RESIZE to
    * `outW`×`outH` — the thumbnail/normalization step a multimodal
    * training pipeline runs before feature extraction: the stats are
    * computed over the SAMPLED grid only (source pixel
    * (⌊i·w/outW⌋, ⌊j·h/outH⌋) for each output cell — integer index
    * arithmetic, so an external mirror can predict exactly which
    * source pixels are read). Source dimensions are reported, so a
    * consumer sees what was resized from; a match against the q149
    * oracle proves decode AND the resize index arithmetic, because
    * the sampled color mix differs from the full-image mix. */
  def decodeResizedStats(outW: Int, outH: Int)(
      rows: Iterator[Row]): Iterator[ImageStats] =
    decodeStatsCore(rows, resize = Some((outW, outH)))

  private def decodeStatsCore(rows: Iterator[Row],
      resize: Option[(Int, Int)]): Iterator[ImageStats] =
    decodeImages(rows) { (id, img) =>
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      val n = resize match {
        case None =>
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF
              sb += p & 0xFF
              x += 1
            }
            y += 1
          }
          w.toLong * h
        case Some((ow, oh)) =>
          var j = 0
          while (j < oh) {
            var i = 0
            while (i < ow) {
              val p = img.getRGB(i * w / ow, j * h / oh)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF
              sb += p & 0xFF
              i += 1
            }
            j += 1
          }
          ow.toLong * oh
      }
      ImageStats(id, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }

  /** PERCEPTUAL HASH kernel: decode, nearest-neighbor sample the
    * `gridW`×`gridH` grid (the [[decodeResizedStats]] index
    * arithmetic), threshold each sampled cell's integer luma
    * ((r+g+b) div 3) at `threshold`, and pack the bits row-major into
    * one long (bit i = cell (i div gridW, i mod gridW)) — the
    * aHash-family fingerprint image dedup pipelines run before a
    * Hamming-distance blocking join ([[Dedup.hammingNearDupPairs]]).
    * Integer arithmetic end-to-end, so an oracle that knows the
    * generation formula can predict the hash bit for bit. */
  def decodeGridHash(gridW: Int, gridH: Int, threshold: Int)(
      rows: Iterator[Row]): Iterator[(Long, Long)] = {
    require(gridW > 0 && gridH > 0 && gridW * gridH <= 64,
      s"grid ${gridW}x$gridH must fit a 64-bit hash")
    decodeImages(rows) { (id, img) =>
      val w = img.getWidth
      val h = img.getHeight
      var bits = 0L
      var j = 0
      while (j < gridH) {
        var i = 0
        while (i < gridW) {
          val p = img.getRGB(i * w / gridW, j * h / gridH)
          val lum =
            (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
          if (lum >= threshold) bits |= 1L << (j * gridW + i)
          i += 1
        }
        j += 1
      }
      (id, bits)
    }
  }

  /** VIDEO perceptual fingerprints — the [[decodeGridHash]] kernel
    * applied to every `stride`-th frame of a GVID container
    * ([[encodeVideo]]): rows of (id, payload) → one
    * (id, frame index, 64-bit grid hash) row per SAMPLED frame, the
    * frames between skipped by the length prefix without touching
    * their bytes (the [[decodeSampledVideoStats]] seeking contract —
    * fingerprint cost scales with sampled frames, not container
    * bytes). Per-frame rows, not a per-video digest, by design: the
    * downstream near-dup join is frame-grain (two videos near-dup
    * when SOME frame pair is within radius — a clip or re-encode
    * shares frames, not necessarily all of them), so the aggregation
    * to video grain belongs to the pair side where min-Hamming is
    * taken, and this kernel stays a pure streaming map. */
  def decodeSampledVideoGridHash(stride: Int, gridW: Int, gridH: Int,
      threshold: Int)(rows: Iterator[Row]): Iterator[(Long, Int, Long)] = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    require(gridW > 0 && gridH > 0 && gridW * gridH <= 64,
      s"grid ${gridW}x$gridH must fit a 64-bit hash")
    disableImageIoFileCache()
    val it0 = javax.imageio.ImageIO.getImageReadersByFormatName("png")
    require(it0.hasNext, "no PNG ImageReader installed")
    val reader = it0.next()
    def readPng(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try { reader.setInput(iis); reader.read(0) }
      finally { reader.setInput(null); iis.close() }
    }
    def gridHash(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      var bits = 0L
      var j = 0
      while (j < gridH) {
        var i = 0
        while (i < gridW) {
          val p = img.getRGB(i * w / gridW, j * h / gridH)
          val lum =
            (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
          if (lum >= threshold) bits |= 1L << (j * gridW + i)
          i += 1
        }
        j += 1
      }
      bits
    }
    val out = rows.flatMap { r =>
      val id = r.getLong(0)
      val bb = java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](1))
      val magic = new Array[Byte](4)
      bb.get(magic)
      require(new String(magic,
          java.nio.charset.StandardCharsets.US_ASCII) == "GVID",
        s"video $id: bad container magic")
      val nf = bb.getInt
      val fps = Seq.newBuilder[(Long, Int, Long)]
      var f = 0
      while (f < nf) {
        val len = bb.getInt
        if (f % stride == 0) {
          val frame = new Array[Byte](len)
          bb.get(frame)
          fps += ((id, f, gridHash(readPng(frame))))
        } else bb.position(bb.position() + len)
        f += 1
      }
      fps.result()
    }
    new Iterator[(Long, Int, Long)] {
      override def hasNext: Boolean = {
        val more = out.hasNext
        if (!more) reader.dispose()
        more
      }
      override def next(): (Long, Int, Long) = out.next()
    }
  }

  /** The shared per-partition image-decode scaffold: cached per-task
    * ImageReaders keyed by sniffed format (see [[decodeImageStats]]
    * for why the convenience ImageIO.read is 6.7× slower here),
    * disposal on exhaustion AND task completion, iterator-to-iterator.
    * `f` maps each (id, decoded image) to the output row. */
  private def decodeImages[T](rows: Iterator[Row])(
      f: (Long, java.awt.image.BufferedImage) => T): Iterator[T] = {
    disableImageIoFileCache()
    val readers =
      scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]
    def readerFor(fmt: String) = readers.getOrElseUpdate(fmt, {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
      require(it.hasNext, s"no ImageReader installed for format $fmt")
      it.next()
    })
    def fmt(b: Array[Byte], id: Long): String =
      if (b.length >= 4 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G') "png"
      else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
      else if (b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
      else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF &&
        (b(1) & 0xFF) == 0xD8) "jpeg"
      else throw new IllegalArgumentException(
        s"payload for id $id is not a decodable image (unknown magic)")
    val decoded = rows.map { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val reader = readerFor(fmt(bytes, id))
      val is = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val img =
        try {
          reader.setInput(is)
          reader.read(0)
        } finally {
          reader.setInput(null)
          is.close()
        }
      require(img != null, s"payload for id $id is not a decodable image")
      f(id, img)
    }
    // dispose the cached readers when the task is done with them:
    // ImageReader holds native/heap decode buffers that otherwise live
    // until GC notices them. Exhaustion alone is not enough — a decode
    // failure or a downstream limit stops consuming before hasNext
    // ever returns false — so ALSO dispose on task completion (which
    // fires on failure and early termination too). Idempotent: both
    // paths can fire.
    var disposed = false
    def disposeAll(): Unit = if (!disposed) {
      disposed = true
      readers.valuesIterator.foreach(_.dispose())
      readers.clear()
    }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => disposeAll()))
    new Iterator[T] {
      override def hasNext: Boolean = {
        val h = decoded.hasNext
        if (!h) disposeAll()
        h
      }
      override def next(): T = decoded.next()
    }
  }

  /** REAL in-JVM WAV decode kernel for [[decodePartitions]] — the
    * audio analog of [[decodeImageStats]], on the other JDK-native
    * codec family (javax.sound.sampled; WAV/PCM ships with the JDK,
    * headless-safe). Rows of (id: long, payload: binary) →
    * [[AudioStats]]: AudioSystem parses the RIFF container, every
    * frame's bytes are read, and the mean |amplitude| is measured
    * from the DECODED samples — so q102's oracle match (which
    * predicts the statistic from generation arithmetic alone) proves
    * a real decode ran. 16-bit signed PCM only (what [[WavEncoder]]
    * writes, and the dominant uncompressed interchange format);
    * anything else fails loudly — silently mis-decoding a training
    * corpus is worse than stopping. A codec library for compressed
    * formats (mp3/flac) would plug into this same seam.
    *
    * File readers are resolved ONCE PER PARTITION via ServiceLoader
    * and tried MOVE-TO-FRONT: the convenience
    * `AudioSystem.getAudioInputStream` consults a SYNCHRONIZED
    * provider registry per payload (the ImageIO.read hazard
    * [[decodeImageStats]] documents, on the audio registry —
    * measured 17.8 s wall / 29.7 cpu-s at sf0.1, parallelism 1.7×),
    * and even with the lookup hoisted, probing providers in fixed
    * order costs one thrown UnsupportedAudioFileException per
    * non-matching provider per payload — plus a registry-locking
    * MIDI provider — which still held the kernel at ~10 s (measured;
    * a reader pinned up front runs 0.36 s). Move-to-front makes a
    * homogeneous corpus hit the right provider first from the second
    * row on, while mixed corpora keep the full fallback chain.
    *
    * Resource posture (the [[decodeImageStats]] disposal-audit
    * question, answered for this path): each payload's
    * AudioInputStream is opened and closed within ONE `next()` call
    * (`finally ais.close()`), so a decode failure or a downstream
    * early termination (limit) leaves nothing open across rows; the
    * cached AudioFileReader providers are stateless service objects
    * with no native or heap decode buffers. Unlike ImageReader, there
    * is nothing a task-completion listener would need to release —
    * the hook is deliberately absent, not forgotten. */
  def decodeAudioStats(rows: Iterator[Row]): Iterator[AudioStats] =
    audioStatsCore(rows, stride = 1)

  /** [[decodeAudioStats]] composed with FRAME-STRIDED RESAMPLING —
    * the audio analog of [[decodeResizedStats]]: only every
    * `stride`-th frame (all its channels) contributes to the
    * amplitude statistic, selected by integer frame arithmetic so an
    * external mirror can predict exactly which samples are read.
    * Source frame count is still reported. */
  def decodeResampledAudioStats(stride: Int)(
      rows: Iterator[Row]): Iterator[AudioStats] = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    audioStatsCore(rows, stride)
  }

  private def audioStatsCore(rows: Iterator[Row],
      stride: Int): Iterator[AudioStats] =
    pcmDecode(rows) { (id, rate, channels, big, data) =>
      val n = data.length / (2 * channels)
      var absSum = 0L
      var f = 0
      var nSel = 0L
      while (f < n) {
        var ch = 0
        while (ch < channels) {
          val i = (f * channels + ch) * 2
          // sign comes from the high byte; (hi << 8) | lo is the
          // signed 16-bit sample for either endianness
          val lo = data(if (big) i + 1 else i) & 0xFF
          val hi = data(if (big) i else i + 1).toInt
          absSum += math.abs((hi << 8) | lo)
          ch += 1
        }
        nSel += 1
        f += stride
      }
      AudioStats(id, n, rate, channels,
        if (nSel == 0) 0.0 else absSum.toDouble / (nSel * channels))
    }

  /** AUDIO PERCEPTUAL HASH kernel — the [[decodeGridHash]] idea on
    * the time axis: decode ([[pcmDecode]] — the real javax.sound
    * RIFF parse), split the decoded frames into `windows` contiguous
    * windows by the same integer index arithmetic as the grid
    * sampler (window k covers frames [k·n/W, (k+1)·n/W)), and set
    * bit k when the window's mean |amplitude| across all channels
    * reaches `threshold` — an energy-contour fingerprint (the
    * spectral-band-energy family audio dedup pipelines run, reduced
    * to the band a PCM decode gives for free), packed row-major into
    * one long for [[Dedup.hammingNearDupPairs]]. The comparison is
    * exact-integer (Σ|s| ≥ threshold · frames · channels), so an
    * oracle that knows the generation formula predicts the hash bit
    * for bit — the q102 proof obligation (oracle match ⇒ a real
    * decode ran) carried to the dedup fingerprint. */
  def decodeAudioEnergyHash(windows: Int, threshold: Int)(
      rows: Iterator[Row]): Iterator[(Long, Long)] = {
    require(windows > 0 && windows <= 64,
      s"windows must fit a 64-bit hash: $windows")
    pcmDecode(rows) { (id, _, channels, big, data) =>
      val n = data.length / (2 * channels)
      require(n >= windows,
        s"audio $id has $n frames < $windows hash windows")
      var bits = 0L
      var k = 0
      while (k < windows) {
        val lo = k * n / windows
        val hi = (k + 1) * n / windows
        var absSum = 0L
        var f = lo
        while (f < hi) {
          var ch = 0
          while (ch < channels) {
            val i = (f * channels + ch) * 2
            val l = data(if (big) i + 1 else i) & 0xFF
            val h = data(if (big) i else i + 1).toInt
            absSum += math.abs((h << 8) | l)
            ch += 1
          }
          f += 1
        }
        if (absSum >= threshold.toLong * (hi - lo) * channels)
          bits |= 1L << k
        k += 1
      }
      (id, bits)
    }
  }

  /** The shared PCM decode core: provider-cached container parse +
    * 16-bit-signed-PCM contract check, handing `f` the raw decoded
    * sample bytes. Factoring keeps the provider move-to-front and
    * the loud non-PCM failure (documented on [[decodeAudioStats]])
    * in ONE place for every audio kernel. */
  private def pcmDecode[T](rows: Iterator[Row])(
      f: (Long, Int, Int, Boolean, Array[Byte]) => T): Iterator[T] = {
    var readers = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val b = Vector.newBuilder[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) b += it.next()
      val rs = b.result()
      require(rs.nonEmpty, "no AudioFileReader providers installed")
      rs
    }
    def open(bytes: Array[Byte],
        id: Long): javax.sound.sampled.AudioInputStream = {
      var i = 0
      while (i < readers.length) {
        val rd = readers(i)
        try {
          val ais = rd.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          if (i != 0) readers = rd +: readers.filterNot(_ eq rd)
          return ais
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => ()
        }
        i += 1
      }
      throw new IllegalArgumentException(
        s"payload for id $id is not a decodable audio file")
    }
    rows.map { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val ais = open(bytes, id)
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16,
          s"payload for id $id is not 16-bit signed PCM: $fmt")
        f(id, fmt.getSampleRate.toInt, fmt.getChannels,
          fmt.isBigEndian, ais.readAllBytes())
      } finally ais.close()
    }
  }
}

/** Per-partition WAV encoder: the CANONICAL RIFF/WAVE PCM container
  * (44-byte header + little-endian 16-bit mono samples), written
  * directly from the public spec. The JDK's own writer path
  * (`AudioSystem.write` / WaveFileWriter) takes a synchronized
  * provider-registry and format-conversion lookup PER FILE, which
  * under 32 concurrent encode tasks serialized the q102 kernel even
  * after hoisting the provider lookup (measured: 17.8 → 11.0 s wall
  * against ~1 s of actual byte work) — and the container is a fixed
  * 44-byte header, not a codec. ConnectorSpec asserts this encoder's
  * output is BYTE-IDENTICAL to `AudioSystem.write`'s for the same
  * samples, so fidelity is proven, not assumed; the DECODE side
  * ([[Multimodal.decodeAudioStats]]) stays 100% javax.sound. */
final class WavEncoder {
  /** `samples` as one mono 16-bit PCM WAV file. */
  def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def ascii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte
      out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    ascii(0, "RIFF"); le32(4, 36 + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16) // PCM fmt chunk is 16 bytes
    le16(20, 1)                     // audio format 1 = PCM
    le16(22, 1)                     // channels
    le32(24, sampleRate)
    le32(28, sampleRate * 2)        // byte rate = rate × blockAlign
    le16(32, 2)                     // block align (mono 16-bit)
    le16(34, 16)                    // bits per sample
    ascii(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xFF).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }
}

/** Per-partition PNG encoder: one writer-registry lookup per
  * instance, reused across a partition's rows (the same synchronized-
  * registry hazard [[Multimodal.decodeImageStats]] documents, on the
  * write side). Not thread-safe — one instance per task. */
final class PngEncoder {
  Multimodal.disableImageIoFileCache()
  private val writer = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
    require(it.hasNext, "no PNG ImageWriter installed")
    it.next()
  }

  /** See [[Multimodal.encodePng]] for the image contract. */
  def encode(width: Int, height: Int,
      rgbLeft: Int, rgbRight: Int): Array[Byte] =
    encodePixels(width, height,
      (x, _) => if (x < width / 2) rgbLeft else rgbRight)

  /** Arbitrary-pixel variant: `rgbAt(x, y)` supplies each pixel —
    * the q168 gradient fixture writes GRAY pixels (r = g = b = v) so
    * the decoded luma equals the generation value exactly and the
    * oracle can predict per-sample comparisons with no rounding
    * surface. */
  def encodePixels(width: Int, height: Int,
      rgbAt: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, rgbAt(x, y))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val os = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(os)
      writer.write(img)
      os.flush()
    } finally {
      writer.setOutput(null)
      os.close()
    }
    bos.toByteArray
  }
}
