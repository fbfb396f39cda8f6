package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed batch-shaped media processing — the Scala analogue of a
  * `mapInPandas` decode stage (the north-star multimodal surface).
  *
  * `decodeBatched` consumes each partition as an iterator, assembles
  * fixed-size batches (the "batch shape" a vectorized decoder or an
  * inference runtime wants), runs the decoder once per batch, and emits
  * typed features. That generic decoder is a STUB — deterministic
  * pseudo-features derived from payload bytes, clearly marked — because
  * the container ships no compressed-codec libraries; everything
  * Spark-side (encoders, partition iteration, batch assembly, output
  * schema) is real and tested in MediaBatchSpec. The two UNCOMPRESSED
  * formats below it — PPM images and RIFF PCM WAV audio — are REAL
  * decode kernels, not stubs: header/chunk parsing and sample math
  * straight from the bytes.
  *
  * Scale posture: a narrow mapPartitions — no shuffle, no driver
  * involvement; batch size bounds peak memory per task regardless of
  * partition size.
  */
object MediaBatchProcessor {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  final case class MediaFeatures(doc_id: Long, media_type: String,
      byte_len: Long, batch_size: Int, features: Array[Double])

  val DefaultBatchSize = 64

  /** STUB decoder: a real implementation would hand `batch` to a codec /
    * model runtime. Emits 4 deterministic pseudo-features per payload
    * (length, first/last byte, byte sum mod 997). */
  private def stubDecodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val len = m.payload.length.toLong
      val first = if (len > 0) (m.payload(0) & 0xff).toDouble else 0.0
      val last = if (len > 0) (m.payload(m.payload.length - 1) & 0xff).toDouble else 0.0
      var sum = 0L
      var i = 0
      while (i < m.payload.length) { sum += (m.payload(i) & 0xff); i += 1 }
      MediaFeatures(m.doc_id, m.media_type, len, batch.size,
        Array(len.toDouble, first, last, (sum % 997).toDouble))
    }

  def decodeBatched(media: Dataset[MediaRow],
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(batch => stubDecodeBatch(batch.toSeq))
    }
  }

  // ---------------------------------------------------------------------
  // REAL decode path: PPM (P6). Unlike the stub above, nothing here is a
  // placeholder — PPM is an uncompressed format (ASCII header + raw RGB
  // bytes) decodable with zero codec libraries, so the parse, the
  // per-channel statistics, and the average-hash below are the actual
  // pixel math a production image-curation stage runs.
  // ---------------------------------------------------------------------

  /** A decoded P6 image: `pixels` is row-major RGB, 3 bytes/pixel. */
  final case class PpmImage(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte])

  final case class PpmFeatures(doc_id: Long, width: Int, height: Int,
      mean_r: Long, mean_g: Long, mean_b: Long, lum_mean: Long,
      ahash_hi: Long, ahash_lo: Long)

  /** REAL P6 parser: magic, whitespace-separated width/height/maxval
    * (with `#` comment support, per the netpbm spec), one whitespace,
    * then exactly width·height·3 raw bytes. Dimensions come from the
    * BYTES — not from any metadata column — which is the property that
    * makes downstream math a decode rather than a relabel. */
  def decodePpm(bytes: Array[Byte]): PpmImage = {
    var i = 0
    def fail(msg: String) =
      throw new IllegalArgumentException(s"not a P6 PPM: $msg (offset $i)")
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\t' || b == '\r'
    def skipWs(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        if (isWs(bytes(i))) i += 1
        else if (bytes(i) == '#') { // comment runs to end of line
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else in = false
      }
    }
    def readInt(): Int = {
      skipWs()
      val start = i
      var v = 0
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      if (i == start) fail("expected integer")
      v
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') fail("bad magic")
    i = 2
    val w = readInt(); val h = readInt(); val maxVal = readInt()
    if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
    if (maxVal <= 0 || maxVal > 255) fail(s"unsupported maxval $maxVal")
    if (i >= bytes.length || !isWs(bytes(i))) fail("missing raster separator")
    i += 1 // exactly ONE whitespace byte before the raster, per spec
    val need = w * h * 3
    if (bytes.length - i < need)
      fail(s"raster truncated: need $need, have ${bytes.length - i}")
    PpmImage(w, h, maxVal, java.util.Arrays.copyOfRange(bytes, i, i + need))
  }

  /** Real P6 writer (header + raw raster) — the round-trip partner
    * MediaBatchSpec uses to prove the parser reads what a conforming
    * writer emits. */
  def encodePpm(img: PpmImage): Array[Byte] = {
    require(img.pixels.length == img.width * img.height * 3, "raster size")
    val header = s"P6\n${img.width} ${img.height}\n${img.maxVal}\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    header ++ img.pixels
  }

  /** Integer luminance — (2R + 5G + B) div 8, an exact-integer stand-in
    * for the rec601 weights (0.25/0.625/0.125) so Spark and any SQL
    * oracle agree bit-for-bit. */
  private def lum(r: Int, g: Int, b: Int): Int = (2 * r + 5 * g + b) / 8

  /** REAL average-hash: block-mean the luminance plane to an 8×8 grid
    * (requires width and height divisible by 8), threshold each block
    * against the global block mean (strict >), bit k = row·8+col in
    * row-major order. Returned split as (hi, lo) 32-bit halves so both
    * are non-negative BIGINTs an exact SQL oracle can reproduce without
    * sign gymnastics. */
  def averageHash(img: PpmImage): (Long, Long) = {
    require(img.width % 8 == 0 && img.height % 8 == 0,
      s"aHash needs 8-divisible dims, got ${img.width}x${img.height}")
    val bw = img.width / 8; val bh = img.height / 8
    val blocks = new Array[Long](64)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val p = (y * img.width + x) * 3
        val l = lum(img.pixels(p) & 0xff, img.pixels(p + 1) & 0xff,
          img.pixels(p + 2) & 0xff)
        blocks((y / bh) * 8 + (x / bw)) += l
        x += 1
      }
      y += 1
    }
    val per = bw.toLong * bh
    var k = 0
    while (k < 64) { blocks(k) /= per; k += 1 }
    val mean = blocks.sum / 64
    var hi = 0L; var lo = 0L
    k = 0
    while (k < 64) {
      if (blocks(k) > mean) {
        if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
      }
      k += 1
    }
    (hi, lo)
  }

  /** Decode + featurize one PPM payload: per-channel integer means,
    * mean luminance, and the average-hash. All integer division, so
    * the result is engine-exact. */
  def ppmFeatures(docId: Long, payload: Array[Byte]): PpmFeatures = {
    val img = decodePpm(payload)
    val n = img.width.toLong * img.height
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
    var p = 0
    while (p < img.pixels.length) {
      val r = img.pixels(p) & 0xff
      val g = img.pixels(p + 1) & 0xff
      val b = img.pixels(p + 2) & 0xff
      sr += r; sg += g; sb += b; sl += lum(r, g, b)
      p += 3
    }
    val (hi, lo) = averageHash(img)
    PpmFeatures(docId, img.width, img.height,
      sr / n, sg / n, sb / n, sl / n, hi, lo)
  }

  /** The batch-shaped REAL decode stage: same partition/batch plumbing
    * as [[decodeBatched]], but the per-batch body does actual header
    * parsing and pixel arithmetic — no stub label applies to this
    * path. */
  def decodePpmBatched(media: Dataset[MediaRow],
      batchSize: Int = DefaultBatchSize): Dataset[PpmFeatures] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map(m => ppmFeatures(m.doc_id, m.payload)))
    }
  }

  // ---------------------------------------------------------------------
  // REAL decode path #2: WAV (RIFF PCM). Like PPM, uncompressed PCM WAV
  // is decodable with zero codec libraries — a binary chunked container
  // (RIFF header, `fmt ` format chunk, `data` sample chunk, unknown
  // chunks skipped by declared size) holding little-endian integer
  // samples. The chunk walk, the two's-complement sample decode, and
  // the per-channel statistics are the actual audio math a curation
  // stage runs; nothing below is a stub.
  // ---------------------------------------------------------------------

  /** A decoded PCM WAV: `samples` is interleaved per-frame
    * (frame-major, channel-minor), each value already sign-decoded
    * (16-bit two's complement, or 8-bit unsigned rebased to signed). */
  final case class WavAudio(numChannels: Int, sampleRate: Int,
      bitsPerSample: Int, samples: Array[Int]) {
    def numFrames: Int = if (numChannels == 0) 0 else samples.length / numChannels
  }

  final case class WavFeatures(doc_id: Long, n_channels: Int,
      sample_rate: Int, bits_per_sample: Int, n_frames: Long,
      sum_ch0: Long, sum_ch1: Long, peak_ch0: Long, peak_ch1: Long,
      energy_ch0: Long, energy_ch1: Long)

  /** REAL RIFF/WAVE parser: validates the `RIFF…WAVE` envelope, then
    * walks the chunk list by declared (little-endian, even-padded)
    * sizes — unknown chunks (`LIST`, `fact`, …) are SKIPPED, not
    * errors, which is what makes this a container parse rather than a
    * fixed-offset read. Requires a PCM (`audioFormat == 1`) `fmt `
    * chunk before `data`, 8- or 16-bit samples, and a sample region
    * sized to a whole number of frames. Every decoded property comes
    * from the BYTES, not from any metadata column. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"not a PCM WAV: $msg")
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    def tag(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
      fail("bad RIFF/WAVE envelope")
    var i = 12
    var numChannels = 0; var sampleRate = 0; var bits = 0
    var fmtSeen = false
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= bytes.length && dataOff < 0) {
      val id = tag(i)
      val size = u32(i + 4)
      if (size > bytes.length - (i + 8)) fail(s"chunk '$id' overruns payload")
      val sz = size.toInt
      id match {
        case "fmt " =>
          if (sz < 16) fail(s"fmt chunk too short ($sz)")
          val audioFormat = u16(i + 8)
          if (audioFormat != 1) fail(s"audioFormat $audioFormat (want PCM=1)")
          numChannels = u16(i + 10)
          sampleRate = u32(i + 12).toInt
          bits = u16(i + 22)
          if (numChannels < 1) fail(s"$numChannels channels")
          if (bits != 8 && bits != 16) fail(s"unsupported $bits-bit samples")
          val blockAlign = u16(i + 20)
          if (blockAlign != numChannels * (bits / 8))
            fail(s"blockAlign $blockAlign != channels×bytes/sample")
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) fail("data chunk before fmt chunk")
          dataOff = i + 8; dataLen = sz
        case _ => () // skip unknown chunk (LIST, fact, …) by its size
      }
      i += 8 + sz + (sz & 1) // chunks are word-aligned: odd sizes pad 1
    }
    if (dataOff < 0) fail("no data chunk")
    val bytesPerSample = bits / 8
    val frameBytes = numChannels * bytesPerSample
    if (dataLen % frameBytes != 0)
      fail(s"data length $dataLen is not a whole number of $frameBytes-byte frames")
    val n = dataLen / bytesPerSample
    val samples = new Array[Int](n)
    var k = 0
    while (k < n) {
      samples(k) =
        if (bits == 16) u16(dataOff + 2 * k) match { // two's complement
          case u if u >= 0x8000 => u - 0x10000
          case u => u
        }
        else u8(dataOff + k) - 128 // 8-bit WAV is unsigned, rebase
      k += 1
    }
    WavAudio(numChannels, sampleRate, bits, samples)
  }

  /** Real canonical WAV writer (RIFF + fmt + data) — the round-trip
    * partner MediaBatchSpec uses, and the payload builder for the
    * registered `mm_wav_decode` query (binary little-endian header
    * fields are not expressible in a SQL payload literal the way PPM's
    * ASCII header was). `samples` interleaved signed values. */
  def encodeWav(audio: WavAudio): Array[Byte] = {
    require(audio.bitsPerSample == 8 || audio.bitsPerSample == 16,
      s"unsupported ${audio.bitsPerSample}-bit samples")
    require(audio.samples.length % audio.numChannels == 0, "partial frame")
    val bps = audio.bitsPerSample / 8
    val dataLen = audio.samples.length * bps
    val out = new Array[Byte](44 + dataLen)
    def put(i: Int, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, out, i, b.length)
    }
    def p16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(i: Int, v: Long): Unit = {
      p16(i, (v & 0xffff).toInt); p16(i + 2, ((v >> 16) & 0xffff).toInt)
    }
    put(0, "RIFF"); p32(4, 36L + dataLen); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16L)
    p16(20, 1); p16(22, audio.numChannels)
    p32(24, audio.sampleRate.toLong)
    p32(28, audio.sampleRate.toLong * audio.numChannels * bps)
    p16(32, audio.numChannels * bps); p16(34, audio.bitsPerSample)
    put(36, "data"); p32(40, dataLen.toLong)
    var k = 0
    while (k < audio.samples.length) {
      val s = audio.samples(k)
      if (audio.bitsPerSample == 16) p16(44 + 2 * k, s & 0xffff)
      else out(44 + k) = ((s + 128) & 0xff).toByte
      k += 1
    }
    out
  }

  /** Decode + featurize one WAV payload: header properties plus
    * per-channel integer sum, peak (max |s|), and energy (Σ s²) for
    * the first two channels (0 past the channel count). All exact
    * integer arithmetic — engine-exact against a SQL oracle. */
  def wavFeatures(docId: Long, payload: Array[Byte]): WavFeatures = {
    val a = decodeWav(payload)
    val sums = new Array[Long](2); val peaks = new Array[Long](2)
    val energies = new Array[Long](2)
    var k = 0
    while (k < a.samples.length) {
      val c = k % a.numChannels
      if (c < 2) {
        val s = a.samples(k).toLong
        sums(c) += s
        if (math.abs(s) > peaks(c)) peaks(c) = math.abs(s)
        energies(c) += s * s
      }
      k += 1
    }
    WavFeatures(docId, a.numChannels, a.sampleRate, a.bitsPerSample,
      a.numFrames.toLong, sums(0), sums(1), peaks(0), peaks(1),
      energies(0), energies(1))
  }

  final case class WavWindowFeatures(doc_id: Long, win_no: Int,
      n_samples: Long, zcr: Long, sum_abs: Long, peak: Long)

  /** Windowed audio analysis over the REAL decoded PCM (round 13):
    * channel-0 samples in fixed windows of `winFrames`, each window
    * scored with the classic speech/music discriminators — zero-
    * crossing count (strict sign change between consecutive samples,
    * crossings at window boundaries excluded so windows are
    * independent), Σ|s| (the integer RMS proxy), and peak |s|. All
    * exact integers, so a SQL oracle rebuilding the PCM from the
    * fixture model reproduces every cell. A short final window is
    * emitted with its true sample count, not padded. */
  def wavWindowFeatures(docId: Long, payload: Array[Byte],
      winFrames: Int = 16): Seq[WavWindowFeatures] = {
    require(winFrames >= 2, s"window must hold >= 2 samples, got $winFrames")
    val a = decodeWav(payload)
    val n = a.numFrames
    (0 until (n + winFrames - 1) / winFrames).map { w =>
      val from = w * winFrames
      val until = math.min(from + winFrames, n)
      var zcr = 0L; var sabs = 0L; var peak = 0L
      var k = from
      while (k < until) {
        val s = a.samples(k * a.numChannels).toLong // channel 0
        if (k > from) {
          val prev = a.samples((k - 1) * a.numChannels).toLong
          if ((prev < 0) != (s < 0)) zcr += 1
        }
        sabs += math.abs(s)
        if (math.abs(s) > peak) peak = math.abs(s)
        k += 1
      }
      WavWindowFeatures(docId, w, (until - from).toLong, zcr, sabs, peak)
    }
  }

  /** Batch-shaped windowed audio features — narrow mapPartitions; the
    * per-payload window fan-out stays inside the task. */
  def wavWindowsBatched(media: Dataset[MediaRow],
      winFrames: Int = 16,
      batchSize: Int = DefaultBatchSize): Dataset[WavWindowFeatures] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize)
        .flatMap(_.flatMap(m => wavWindowFeatures(m.doc_id, m.payload, winFrames)))
    }
  }

  /** Batch-shaped WAV decode — the audio twin of [[decodePpmBatched]];
    * a narrow mapPartitions, real parse, no stub label. */
  def decodeWavBatched(media: Dataset[MediaRow],
      batchSize: Int = DefaultBatchSize): Dataset[WavFeatures] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map(m => wavFeatures(m.doc_id, m.payload)))
    }
  }

  // ---------------------------------------------------------------------
  // REAL decode path #3: PNG (round 12). The first COMPRESSED format —
  // the codec is zlib/DEFLATE, which the JDK ships (`java.util.zip
  // .Inflater`/`Deflater`), so unlike JPEG no external library is
  // needed: signature + chunk walk (big-endian lengths, CRC32-checked),
  // IHDR parse, concatenated-IDAT inflate, then per-scanline UNFILTER —
  // all five PNG filter types (None/Sub/Up/Average/Paeth) — straight
  // from the spec. Nothing below is a stub; every decoded property
  // comes from the BYTES.
  // ---------------------------------------------------------------------

  private val PngSignature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG Paeth predictor (spec §9.4): the neighbor (left, up, or
    * upper-left) closest to the linear estimate p = a + b − c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL PNG decoder for 8-bit truecolor (color type 2, the raster
    * shape the pipeline produces): validates the 8-byte signature,
    * walks chunks by big-endian declared length VERIFYING each CRC32,
    * parses IHDR (width/height from the bytes — never from metadata),
    * inflates the concatenated IDAT zlib stream, and reverses the
    * per-scanline filter byte: None(0), Sub(1), Up(2), Average(3) —
    * floor((left+up)/2) — and Paeth(4). Ancillary chunks (tEXt, gAMA,
    * …) are skipped by size, which is what makes this a container
    * parse. Returns the same [[PpmImage]] raster the PPM path yields,
    * so all downstream pixel math is shared. */
  def decodePng(bytes: Array[Byte]): PpmImage = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"not a supported PNG: $msg")
    if (bytes.length < 8 || !PngSignature.indices.forall(i => bytes(i) == PngSignature(i)))
      fail("bad signature")
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    def tag(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var i = 8
    var w = 0; var h = 0; var ihdrSeen = false; var iendSeen = false
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 8 <= bytes.length && !iendSeen) {
      val len = u32(i)
      if (len > bytes.length - (i + 12)) fail(s"chunk '${tag(i + 4)}' overruns payload")
      val sz = len.toInt
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, i + 4, 4 + sz) // CRC covers type + data
      if (crc.getValue != u32(i + 8 + sz))
        fail(s"chunk '${tag(i + 4)}' CRC mismatch")
      tag(i + 4) match {
        case "IHDR" =>
          if (sz != 13) fail(s"IHDR length $sz")
          w = u32(i + 8).toInt; h = u32(i + 12).toInt
          if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
          // allocation guard: a hostile IHDR must not OOM the executor
          if (w.toLong * h * 3 + h > Int.MaxValue / 2)
            fail(s"dimensions ${w}x$h exceed decoder bounds")
          val bitDepth = bytes(i + 16) & 0xff
          val colorType = bytes(i + 17) & 0xff
          if (bitDepth != 8 || colorType != 2)
            fail(s"unsupported bitDepth=$bitDepth colorType=$colorType (want 8-bit RGB)")
          if ((bytes(i + 18) & 0xff) != 0) fail("nonzero compression method")
          if ((bytes(i + 19) & 0xff) != 0) fail("nonzero filter method")
          if ((bytes(i + 20) & 0xff) != 0) fail("interlaced (Adam7) unsupported")
          ihdrSeen = true
        case "IDAT" =>
          if (!ihdrSeen) fail("IDAT before IHDR")
          idat.write(bytes, i + 8, sz)
        case "IEND" => iendSeen = true
        case _ => () // ancillary chunk (tEXt, gAMA, pHYs, …): skip by size
      }
      i += 12 + sz
    }
    if (!ihdrSeen) fail("no IHDR chunk")
    if (!iendSeen) fail("no IEND chunk")
    // inflate the concatenated IDAT zlib stream
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride)) // filter byte + scanline, per row
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // n == 0 with the stream unfinished means the inflater cannot
        // make progress — either the payload ran out (needsInput) or it
        // demands something we never supply (FDICT preset dictionary →
        // needsDictionary). Both must fail loudly: a hostile IDAT must
        // not be able to hang the executor in this loop.
        if (n == 0 && !inf.finished())
          fail(if (inf.needsInput()) "IDAT stream truncated"
               else "unsupported zlib stream (preset dictionary?)")
        off += n
      }
    } catch {
      case e: java.util.zip.DataFormatException => fail(s"corrupt DEFLATE: ${e.getMessage}")
    } finally inf.end()
    if (off != raw.length) fail(s"decompressed size $off != expected ${raw.length}")
    // unfilter: recon(x) per spec, bytes-per-pixel = 3
    val px = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= 3) px(rowOut + x - 3) & 0xff else 0
        val up = if (y > 0) px(rowOut - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) px(rowOut - stride + x - 3) & 0xff else 0
        val recon = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, ul)
          case other => fail(s"unknown filter type $other (row $y)")
        }
        px(rowOut + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    PpmImage(w, h, 255, px)
  }

  /** Real conforming PNG writer — the round-trip partner MediaBatchSpec
    * uses and the payload builder for `mm_png_decode`. Each scanline is
    * FILTERED with type (row mod 5), so a multi-row image exercises all
    * five filter reversals in the decoder (an all-None writer would
    * leave Sub/Up/Average/Paeth untested); the stream is zlib-deflated
    * and wrapped in CRC32-stamped IHDR/IDAT/IEND chunks. */
  def encodePng(img: PpmImage): Array[Byte] = {
    require(img.maxVal == 255, "PNG writer emits 8-bit RGB only")
    require(img.pixels.length == img.width * img.height * 3, "raster size")
    val stride = img.width * 3
    val raw = new Array[Byte](img.height * (1 + stride))
    var y = 0
    while (y < img.height) {
      val f = y % 5
      raw(y * (1 + stride)) = f.toByte
      val rowOut = y * (1 + stride) + 1
      val rowPx = y * stride
      var x = 0
      while (x < stride) {
        val cur = img.pixels(rowPx + x) & 0xff
        val left = if (x >= 3) img.pixels(rowPx + x - 3) & 0xff else 0
        val up = if (y > 0) img.pixels(rowPx - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) img.pixels(rowPx - stride + x - 3) & 0xff else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(rowOut + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw); def_.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!def_.finished()) zbuf.write(tmp, 0, def_.deflate(tmp))
    def_.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSignature, 0, 8)
    def writeChunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(be32(data.length.toLong), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((img.width >> 24) & 0xff).toByte
    ihdr(1) = ((img.width >> 16) & 0xff).toByte
    ihdr(2) = ((img.width >> 8) & 0xff).toByte
    ihdr(3) = (img.width & 0xff).toByte
    ihdr(4) = ((img.height >> 24) & 0xff).toByte
    ihdr(5) = ((img.height >> 16) & 0xff).toByte
    ihdr(6) = ((img.height >> 8) & 0xff).toByte
    ihdr(7) = (img.height & 0xff).toByte
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk("IHDR", ihdr)
    writeChunk("IDAT", zbuf.toByteArray)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** REAL image resize (round 13 — retires `mm_resize_stub`): integer
    * area-average (box) downsample by an integer factor. Output pixel
    * (X,Y) channel c = floor(mean of the factor×factor input block) —
    * Σ of factor² samples div factor², exact integer math, so the
    * result is engine-exact against a SQL oracle re-running the same
    * sums. This is the standard antialiasing downsample (each source
    * pixel contributes exactly once — no sampling skew), and it runs
    * on the DECODED raster, so chaining it after [[decodePng]] touches
    * every real pixel. */
  def resizeBox(img: PpmImage, factor: Int): PpmImage = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    require(img.width % factor == 0 && img.height % factor == 0,
      s"box resize needs factor-divisible dims, got " +
        s"${img.width}x${img.height} / $factor")
    if (factor == 1) return img
    val ow = img.width / factor; val oh = img.height / factor
    val out = new Array[Byte](ow * oh * 3)
    val per = factor * factor
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var sr = 0; var sg = 0; var sb = 0
        var dy = 0
        while (dy < factor) {
          var dx = 0
          val rowBase = ((oy * factor + dy) * img.width + ox * factor) * 3
          while (dx < factor) {
            val p = rowBase + dx * 3
            sr += img.pixels(p) & 0xff
            sg += img.pixels(p + 1) & 0xff
            sb += img.pixels(p + 2) & 0xff
            dx += 1
          }
          dy += 1
        }
        val o = (oy * ow + ox) * 3
        out(o) = (sr / per).toByte
        out(o + 1) = (sg / per).toByte
        out(o + 2) = (sb / per).toByte
        ox += 1
      }
      oy += 1
    }
    PpmImage(ow, oh, img.maxVal, out)
  }

  final case class PngFeatures(doc_id: Long, width: Int, height: Int,
      mean_r: Long, mean_g: Long, mean_b: Long, lum_mean: Long,
      ahash_hi: Long, ahash_lo: Long)

  /** Decode + featurize one PNG payload: signature/chunk/CRC walk,
    * IHDR parse, inflate, unfilter — then the SAME integer pixel math
    * as the PPM path (per-channel means, mean luminance, block-mean
    * average-hash), so PNG and PPM of identical rasters agree
    * bit-for-bit and one SQL oracle covers both. */
  def pngFeatures(docId: Long, payload: Array[Byte]): PngFeatures = {
    val img = decodePng(payload)
    val n = img.width.toLong * img.height
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
    var p = 0
    while (p < img.pixels.length) {
      val r = img.pixels(p) & 0xff
      val g = img.pixels(p + 1) & 0xff
      val b = img.pixels(p + 2) & 0xff
      sr += r; sg += g; sb += b; sl += lum(r, g, b)
      p += 3
    }
    val (hi, lo) = averageHash(img)
    PngFeatures(docId, img.width, img.height,
      sr / n, sg / n, sb / n, sl / n, hi, lo)
  }

  /** Batch-shaped PNG decode — same narrow mapPartitions shape as the
    * PPM/WAV paths; real inflate + unfilter per payload, no stub. */
  def decodePngBatched(media: Dataset[MediaRow],
      batchSize: Int = DefaultBatchSize): Dataset[PngFeatures] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map(m => pngFeatures(m.doc_id, m.payload)))
    }
  }

  final case class JpegFeatures(doc_id: Long, width: Int, height: Int,
      mean_r: Long, mean_g: Long, mean_b: Long, lum_mean: Long,
      ahash_hi: Long, ahash_lo: Long)

  /** Decode + featurize one baseline JPEG payload via [[JpegKernel]]:
    * marker walk, DQT/DHT parse, Huffman decode, dequant, IDCT,
    * YCbCr→RGB — then the SAME integer pixel math as the PPM/PNG paths
    * (channel means, luminance, block-mean aHash), so one oracle model
    * covers every image format. */
  def jpegFeatures(docId: Long, payload: Array[Byte]): JpegFeatures = {
    val img = JpegKernel.decodeJpeg(payload)
    val n = img.width.toLong * img.height
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
    var p = 0
    while (p < img.pixels.length) {
      val r = img.pixels(p) & 0xff
      val g = img.pixels(p + 1) & 0xff
      val b = img.pixels(p + 2) & 0xff
      sr += r; sg += g; sb += b; sl += lum(r, g, b)
      p += 3
    }
    val (hi, lo) = averageHash(img)
    JpegFeatures(docId, img.width, img.height,
      sr / n, sg / n, sb / n, sl / n, hi, lo)
  }

  /** Batch-shaped JPEG decode — the same narrow mapPartitions shape as
    * the PPM/WAV/PNG paths; real entropy decode + IDCT per payload. */
  def decodeJpegBatched(media: Dataset[MediaRow],
      batchSize: Int = DefaultBatchSize): Dataset[JpegFeatures] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map(m => jpegFeatures(m.doc_id, m.payload)))
    }
  }

  final case class VideoFrameFeatures(doc_id: Long, frame_no: Int,
      width: Int, height: Int, mean_r: Long, mean_g: Long, mean_b: Long,
      lum_mean: Long)

  /** REAL video-frame decode (round 13 — retires the last contract-only
    * media stub): split an MJPEG payload into its frames
    * ([[JpegKernel.splitMjpeg]] — exact boundary scan, not an offset
    * heuristic), decode EVERY frame through the full baseline JPEG
    * kernel, and emit per-frame pixel statistics. One doc → one row per
    * frame; the frame count comes from the BYTES, never from metadata. */
  def videoFrameFeatures(docId: Long,
      payload: Array[Byte]): Seq[VideoFrameFeatures] =
    JpegKernel.splitMjpeg(payload).zipWithIndex.map { case (fb, fno) =>
      val img = JpegKernel.decodeJpeg(fb)
      val n = img.width.toLong * img.height
      var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
      var p = 0
      while (p < img.pixels.length) {
        val r = img.pixels(p) & 0xff
        val g = img.pixels(p + 1) & 0xff
        val b = img.pixels(p + 2) & 0xff
        sr += r; sg += g; sb += b; sl += lum(r, g, b)
        p += 3
      }
      VideoFrameFeatures(docId, fno, img.width, img.height,
        sr / n, sg / n, sb / n, sl / n)
    }

  /** Batch-shaped MJPEG decode — narrow mapPartitions; the per-payload
    * fan-out (frames per doc) happens inside the task, so memory is
    * bounded by one payload's frames, never a partition's. */
  def decodeVideoFramesBatched(media: Dataset[MediaRow],
      batchSize: Int = DefaultBatchSize): Dataset[VideoFrameFeatures] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize)
        .flatMap(_.flatMap(m => videoFrameFeatures(m.doc_id, m.payload)))
    }
  }

  final case class ResizeFeatures(doc_id: Long, src_width: Int,
      src_height: Int, new_width: Int, new_height: Int,
      mean_r: Long, mean_g: Long, mean_b: Long, lum_mean: Long,
      ahash_hi: Long, ahash_lo: Long)

  /** Decode one PNG payload, box-downsample the REAL raster by
    * `factor`, and featurize the RESIZED image with the shared integer
    * pixel math (channel means, luminance, block-mean aHash) — so the
    * oracle re-runs the identical sums on the resized pixels and every
    * output is decode+resize-exact, not metadata arithmetic. */
  def resizePngFeatures(docId: Long, payload: Array[Byte],
      factor: Int): ResizeFeatures = {
    val src = decodePng(payload)
    val img = resizeBox(src, factor)
    val n = img.width.toLong * img.height
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
    var p = 0
    while (p < img.pixels.length) {
      val r = img.pixels(p) & 0xff
      val g = img.pixels(p + 1) & 0xff
      val b = img.pixels(p + 2) & 0xff
      sr += r; sg += g; sb += b; sl += lum(r, g, b)
      p += 3
    }
    val (hi, lo) = averageHash(img)
    ResizeFeatures(docId, src.width, src.height, img.width, img.height,
      sr / n, sg / n, sb / n, sl / n, hi, lo)
  }

  /** Batch-shaped decode→resize→featurize stage — the real resize path
    * a training pipeline runs (narrow mapPartitions, batch-bounded
    * memory, no shuffle). */
  def resizePngBatched(media: Dataset[MediaRow], factor: Int,
      batchSize: Int = DefaultBatchSize): Dataset[ResizeFeatures] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize)
        .flatMap(_.map(m => resizePngFeatures(m.doc_id, m.payload, factor)))
    }
  }
}
