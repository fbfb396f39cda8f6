package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed batch-shaped media processing — the Scala analogue of a
  * `mapInPandas` decode stage (the north-star multimodal surface).
  *
  * `decodeBatched` consumes each partition as an iterator, assembles
  * fixed-size batches (the "batch shape" a vectorized decoder or an
  * inference runtime wants), runs the decoder once per batch, and emits
  * typed features. The decoder here is a STUB — deterministic
  * pseudo-features derived from payload bytes, clearly marked — because
  * the container ships no image/audio codecs; everything Spark-side
  * (encoders, partition iteration, batch assembly, output schema) is
  * real and tested in MediaBatchSpec.
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
}
