package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.operators.MediaBatchProcessor._

class MediaBatchSpec extends SparkTestBase {

  private def media = {
    import spark.implicits._
    MultimodalQueries.withMedia(Tables(spark, sfDir, "documents"))
      .select(col("doc_id"), col("payload"), col("meta.media_type").as("media_type"))
      .as[MediaRow]
  }

  test("batched decode covers every row exactly once with typed output") {
    val out = decodeBatched(media, batchSize = 32)
    assert(out.count() == 500)
    assert(out.select("doc_id").distinct().count() == 500)
    // features are deterministic: byte_len equals the UTF-8 length
    val joined = out.toDF().join(
      Tables(spark, sfDir, "documents")
        .select(col("doc_id"), expr("octet_length(text)").cast("long").as("expect_len")),
      "doc_id")
    assert(joined.filter(col("byte_len") =!= col("expect_len")).count() == 0)
  }

  test("batch shape: no batch exceeds the configured size") {
    val out = decodeBatched(media, batchSize = 16)
    assert(out.agg(max("batch_size")).collect()(0).getInt(0) <= 16)
    assert(out.agg(min("batch_size")).collect()(0).getInt(0) >= 1)
  }

  test("feature vector has the documented arity and is reproducible") {
    val a = decodeBatched(media).collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val b = decodeBatched(media).collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 4))
  }

  // ---- REAL PPM decode path (no stub): exact pixel-math assertions ----

  test("decodePpm: hand-computed 8x8 image — channel means, lum mean, " +
      "and every hash bit are exact") {
    // left half solid (200,100,50), right half solid (10,20,30)
    val px = new Array[Byte](8 * 8 * 3)
    for (y <- 0 until 8; x <- 0 until 8) {
      val p = (y * 8 + x) * 3
      val (r, g, b) = if (x < 4) (200, 100, 50) else (10, 20, 30)
      px(p) = r.toByte; px(p + 1) = g.toByte; px(p + 2) = b.toByte
    }
    val f = ppmFeatures(7L, encodePpm(PpmImage(8, 8, 255, px)))
    assert((f.width, f.height) == (8, 8))
    assert(f.mean_r == (200 + 10) / 2 && f.mean_g == 60 && f.mean_b == 40)
    // lum: left (400+500+50)/8 = 118, right (20+100+30)/8 = 18; mean 68
    assert(f.lum_mean == 68)
    // bits set exactly on the left half: cols 0..3 of every row
    val expect = (0 until 64).filter(k => k % 8 < 4)
      .foldLeft(0L)((acc, k) => acc | (1L << k))
    assert(((f.ahash_hi << 32) | f.ahash_lo) == expect)
  }

  test("decodePpm: dimensions come from the bytes (parser, not metadata), " +
      "comments and multi-digit dims parse; malformed payloads fail loudly") {
    val px = Array.fill[Byte](16 * 2 * 3)(100.toByte)
    val withComment =
      ("P6\n# a netpbm comment\n16 2\n255\n").getBytes("US-ASCII") ++ px
    val img = decodePpm(withComment)
    assert(img.width == 16 && img.height == 2 && img.pixels.length == 96)
    intercept[IllegalArgumentException](decodePpm("P5\n8 8\n255\n".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      decodePpm("P6\n8 8\n255\n".getBytes("US-ASCII"))) // truncated raster
    intercept[IllegalArgumentException](
      decodePpm("P6\n8 8\n70000\n".getBytes("US-ASCII"))) // 2-byte maxval
  }

  test("averageHash block-means a 16x16 image (4 pixels/block), equal to " +
      "the 8x8 image of its block averages") {
    val rnd = new scala.util.Random(42)
    val big = new Array[Byte](16 * 16 * 3)
    rnd.nextBytes(big)
    val bigHash = averageHash(PpmImage(16, 16, 255, big))
    // reference: shrink by hand with the same integer-lum-then-mean order
    def lum(p: Int) = (2 * (big(p) & 0xff) + 5 * (big(p + 1) & 0xff) +
      (big(p + 2) & 0xff)) / 8
    val blocks = Array.tabulate(64) { k =>
      val (by, bx) = (k / 8, k % 8)
      val s = (for (dy <- 0 until 2; dx <- 0 until 2)
        yield lum((((by * 2 + dy) * 16) + (bx * 2 + dx)) * 3).toLong).sum
      s / 4
    }
    val mean = blocks.sum / 64
    var hi = 0L; var lo = 0L
    for (k <- 0 until 64 if blocks(k) > mean)
      if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
    assert(bigHash == ((hi, lo)))
  }

  test("decodePpmBatched on the fixture: near-dup payloads (same text bytes) " +
      "collide on the full hash; decode equals the single-row path") {
    import spark.implicits._
    val m = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr("""encode(concat('P6\n8 8\n255\n',
          | substr(repeat(text, cast(192 div octet_length(text) as int) + 1),
          |        1, 192)), 'UTF-8')""".stripMargin).as("payload"),
        lit("image/ppm").as("media_type"))
      .as[MediaRow]
    val feats = decodePpmBatched(m, batchSize = 32).collect()
    assert(feats.length == 500)
    // distributed result equals the driver-side single-payload decode
    val local = m.collect().map(r => ppmFeatures(r.doc_id, r.payload))
      .map(f => f.doc_id -> f).toMap
    feats.foreach(f => assert(f == local(f.doc_id)))
    // identical text → identical image → identical hash (the mm dedup tier)
    val byText = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), md5(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val hashOf = feats.map(f => f.doc_id -> ((f.ahash_hi, f.ahash_lo))).toMap
    byText.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
      val hs = grp.keys.map(hashOf).toSet
      assert(hs.size == 1, s"byte-identical payloads hashed differently: $grp")
    }
  }

  test("decodeWav round-trips the canonical writer: header fields and " +
      "signed samples recovered bit-exactly, stats hand-checked") {
    // 2 frames × 2 channels, values spanning the signed 16-bit range
    val a = WavAudio(2, 8000, 16, Array(-32768, 32767, -1, 1))
    val back = decodeWav(encodeWav(a))
    assert(back.numChannels == 2 && back.sampleRate == 8000 &&
      back.bitsPerSample == 16 && back.numFrames == 2)
    assert(back.samples.sameElements(a.samples))
    val f = wavFeatures(7L, encodeWav(a))
    assert(f == WavFeatures(7L, 2, 8000, 16, 2,
      sum_ch0 = -32769L, sum_ch1 = 32768L,
      peak_ch0 = 32768L, peak_ch1 = 32767L,
      energy_ch0 = 1073741824L + 1L, energy_ch1 = 1073676289L + 1L))
  }

  test("decodeWav is a chunk walker, not a fixed-offset read: unknown " +
      "chunks (odd-sized, word-padded) are skipped by declared size") {
    val a = WavAudio(1, 44100, 16, Array(100, -100, 5))
    val canon = encodeWav(a)
    // splice a 5-byte LIST chunk (odd → 1 pad byte) between fmt and data
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = canon.slice(0, 36) ++ junk ++ canon.drop(36)
    // RIFF size field is now stale, which a size-tolerant parser ignores
    val back = decodeWav(spliced)
    assert(back.samples.sameElements(a.samples) && back.sampleRate == 44100)
  }

  test("decodeWav: 8-bit unsigned samples rebase to signed; malformed " +
      "containers fail loudly") {
    val a = WavAudio(1, 8000, 8, Array(-128, 0, 127))
    assert(decodeWav(encodeWav(a)).samples.sameElements(a.samples))
    val good = encodeWav(WavAudio(1, 8000, 16, Array(1, 2)))
    intercept[IllegalArgumentException](decodeWav("RIFX".getBytes ++ good.drop(4)))
    intercept[IllegalArgumentException](decodeWav(good.dropRight(1))) // truncated data
    val nonPcm = good.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException](decodeWav(nonPcm))
  }

  test("textToWavRow: an empty-text document modulates silence — no " +
      "ArithmeticException from `% 0`, and the decode is all-zero") {
    val row = MultimodalQueries.textToWavRow(7L, "")
    val f = wavFeatures(row.doc_id, row.payload)
    assert(f.n_frames == 64 && f.n_channels == 2)
    assert(f.sum_ch0 == 0 && f.sum_ch1 == 0 && f.peak_ch0 == 0 &&
      f.peak_ch1 == 0 && f.energy_ch0 == 0 && f.energy_ch1 == 0)
    // and the oracle carries the matching arm
    assert(MultimodalQueries.oracles("mm_wav_decode")
      .contains("CASE WHEN n = 0 THEN 0"), "oracle lost the empty-text arm")
  }

  test("decodePng round-trips the canonical writer: all five filter types " +
      "(rows 0-7 cycle None/Sub/Up/Average/Paeth) reverse to the exact raster") {
    // a raster with structure in BOTH axes so Sub/Up/Average/Paeth each
    // produce distinct filtered bytes (a constant raster would let a
    // wrong predictor accidentally round-trip)
    val px = Array.tabulate(8 * 8 * 3)(i => ((i * 37 + (i / 24) * 11) % 256).toByte)
    val img = PpmImage(8, 8, 255, px)
    val png = encodePng(img)
    // signature + the writer really filtered: rows carry types 0..4
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val back = decodePng(png)
    assert(back.width == 8 && back.height == 8)
    assert(back.pixels.sameElements(px), "unfilter did not invert the writer")
    // PNG and PPM of the SAME raster featurize identically (shared math)
    val pf = ppmFeatures(5L, encodePpm(img))
    val gf = pngFeatures(5L, png)
    assert((gf.mean_r, gf.mean_g, gf.mean_b, gf.lum_mean, gf.ahash_hi, gf.ahash_lo) ==
      (pf.mean_r, pf.mean_g, pf.mean_b, pf.lum_mean, pf.ahash_hi, pf.ahash_lo))
  }

  test("decodePng is a checked container parse: ancillary chunks skipped, " +
      "CRC/signature/IHDR/truncation failures are loud") {
    val img = PpmImage(8, 8, 255, Array.tabulate(192)(i => (i % 251).toByte))
    val png = encodePng(img)
    // splice an ancillary tEXt chunk between IHDR (ends at 8+25) and IDAT
    val crc = new java.util.zip.CRC32()
    val body = "tEXt".getBytes("US-ASCII") ++ "k v".getBytes("US-ASCII")
    crc.update(body)
    val c = crc.getValue
    val tEXt = Array[Byte](0, 0, 0, 3) ++ body ++ Array(
      ((c >> 24) & 0xff).toByte, ((c >> 16) & 0xff).toByte,
      ((c >> 8) & 0xff).toByte, (c & 0xff).toByte)
    val spliced = png.slice(0, 33) ++ tEXt ++ png.drop(33)
    assert(decodePng(spliced).pixels.sameElements(img.pixels))
    // corrupt one IDAT payload byte → CRC mismatch, loud
    val corrupt = png.clone(); corrupt(50) = (corrupt(50) ^ 0x7f).toByte
    intercept[IllegalArgumentException](decodePng(corrupt))
    intercept[IllegalArgumentException](decodePng(png.dropRight(13))) // no IEND
    intercept[IllegalArgumentException](decodePng("JUNK".getBytes ++ png.drop(4)))
    val gray = png.clone(); gray(8 + 8 + 9) = 0 // colorType byte inside IHDR
    intercept[IllegalArgumentException](decodePng(gray)) // CRC catches it first — still loud
  }

  test("hostile zlib FDICT stream fails loudly instead of hanging the " +
      "inflate loop (n==0, needsDictionary — neither finished nor needsInput)") {
    // hand-build a PNG whose IDAT is a zlib stream demanding a preset
    // dictionary: CMF=0x78, FLG=0x20 (FDICT bit set; (0x7820)%31==0 so
    // the header checksum passes), 4-byte DICTID, then junk. Inflater
    // stalls on it forever unless the decoder treats no-progress-while-
    // unfinished as an error.
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
    }
    val ihdr = Array[Byte](0, 0, 0, 8, 0, 0, 0, 8, 8, 2, 0, 0, 0)
    val fdict = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0x5a, 0x5a, 0x5a)
    val hostile = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", fdict) ++
      chunk("IEND", Array.emptyByteArray)
    val e = intercept[IllegalArgumentException](decodePng(hostile))
    assert(e.getMessage.contains("preset dictionary"), e.getMessage)
  }

  test("JPEG flat-block round trip is EXACT: encode->decode reproduces " +
      "the integer rgb->ycc->rgb model on every pixel (the oracle contract)") {
    // 16x16, four flat 8x8 blocks with distinct RGB triples — block
    // rasters exercise DC prediction across MCUs and all three
    // component pipelines; flatness makes the DCT path lossless
    val vals = Array((200, 30, 90), (12, 250, 7), (128, 128, 128), (255, 0, 255))
    val px = new Array[Byte](16 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 16) {
      val (r, g, b) = vals((y / 8) * 2 + x / 8)
      val p = (y * 16 + x) * 3
      px(p) = r.toByte; px(p + 1) = g.toByte; px(p + 2) = b.toByte
    }
    val img = PpmImage(16, 16, 255, px)
    val dec = JpegKernel.decodeJpeg(JpegKernel.encodeJpeg(img))
    assert(dec.width == 16 && dec.height == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val (r0, g0, b0) = vals((y / 8) * 2 + x / 8)
      val (yy, cb, cr) = JpegKernel.rgbToYcc(r0, g0, b0)
      val (er, eg, eb) = JpegKernel.yccToRgb(yy, cb, cr)
      val p = (y * 16 + x) * 3
      assert((dec.pixels(p) & 0xff) == er &&
        (dec.pixels(p + 1) & 0xff) == eg &&
        (dec.pixels(p + 2) & 0xff) == eb,
        s"pixel ($x,$y): got (${dec.pixels(p) & 0xff},${dec.pixels(p + 1) & 0xff}," +
          s"${dec.pixels(p + 2) & 0xff}) want ($er,$eg,$eb)")
    }
  }

  test("JPEG non-flat round trip exercises the AC run/size path within " +
      "the standard lossy bound; hostile/unsupported streams fail loudly") {
    // deterministic pseudo-random raster: many nonzero AC coefficients,
    // ZRL-able zero runs, negative magnitudes
    val px = Array.tabulate(16 * 16 * 3)(i => ((i * 131 + 17) % 251).toByte)
    val img = PpmImage(16, 16, 255, px)
    val jpeg = JpegKernel.encodeJpeg(img)
    val dec = JpegKernel.decodeJpeg(jpeg)
    assert(dec.width == 16 && dec.height == 16)
    var worst = 0
    for (p <- px.indices) {
      val d = math.abs((dec.pixels(p) & 0xff) - (px(p) & 0xff))
      if (d > worst) worst = d
    }
    // AC quantizer 16 → per-coefficient error <= 8; the block-wise
    // worst case stays well under 96 levels in practice
    assert(worst <= 96, s"round-trip error $worst exceeds the lossy bound")
    // hostility: bad SOI, truncation, progressive SOF2, restart interval
    intercept[IllegalArgumentException](JpegKernel.decodeJpeg("JUNK".getBytes))
    intercept[IllegalArgumentException](
      JpegKernel.decodeJpeg(jpeg.take(jpeg.length / 2)))
    val sof2 = jpeg.clone()
    // find the SOF0 marker (FF C0) and flip it to SOF2 (progressive)
    val at = sof2.indices.dropRight(1).find(i =>
      (sof2(i) & 0xff) == 0xff && (sof2(i + 1) & 0xff) == 0xc0).get
    sof2(at + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](JpegKernel.decodeJpeg(sof2))
  }

  test("wavWindowFeatures: hand-computed zero crossings, window " +
      "independence at boundaries, short final window unpadded") {
    // mono, 10 samples. Window 0 (samples 0–7) crossings: +5→−3,
    // −2→+7, 0→−6 (zero counts as non-negative, so 7→0 is NOT one).
    // The 7→8 boundary pair (−6→+1) is EXCLUDED by window independence;
    // window 1's own +1→−1 pair counts.
    val samples = Array(5, 5, -3, -2, 7, 7, 0, -6, 1, -1)
    val wav = encodeWav(WavAudio(1, 8000, 16, samples))
    val w = wavWindowFeatures(1L, wav, winFrames = 8)
    assert(w.length == 2)
    assert(w(0) == WavWindowFeatures(1L, 0, 8L, 3L, 35L, 7L), w(0).toString)
    // window 1: samples (1, −1) → one crossing, short (2 samples)
    assert(w(1) == WavWindowFeatures(1L, 1, 2L, 1L, 2L, 1L), w(1).toString)
    // sign convention: 0 counts as non-negative (7→0 is NOT a crossing)
  }

  test("splitMjpeg: exact frame boundaries through stuffed entropy data; " +
      "every frame decodes independently; truncation fails loudly") {
    // three frames with distinct content — the middle one pseudo-random
    // so its entropy stream almost surely contains stuffed 0xFF bytes
    def flat(v: Int) = PpmImage(16, 16, 255,
      Array.fill(768)(v.toByte))
    val noisy = PpmImage(16, 16, 255,
      Array.tabulate(768)(i => ((i * 197 + 43) % 251).toByte))
    val frames = Seq(flat(40), noisy, flat(200))
    val stream = frames.flatMap(f => JpegKernel.encodeJpeg(f)).toArray
    val split = JpegKernel.splitMjpeg(stream)
    assert(split.length == 3, s"got ${split.length} frames")
    // frame 0 and 2 are flat: exact round trip through the color model
    val d0 = JpegKernel.decodeJpeg(split(0))
    val (y0, cb0, cr0) = JpegKernel.rgbToYcc(40, 40, 40)
    val (er, _, _) = JpegKernel.yccToRgb(y0, cb0, cr0)
    assert((d0.pixels(0) & 0xff) == er)
    assert(JpegKernel.decodeJpeg(split(2)).width == 16)
    // the noisy middle frame decodes (boundary was exact despite
    // stuffed bytes) and stays within the lossy bound
    val d1 = JpegKernel.decodeJpeg(split(1))
    assert(d1.width == 16 && d1.height == 16)
    // videoFrameFeatures emits one row per frame in order
    val vf = videoFrameFeatures(5L, stream)
    assert(vf.map(_.frame_no) == Seq(0, 1, 2))
    assert(vf.head.mean_r == er.toLong)
    // hostility: truncated last frame, junk between frames
    intercept[IllegalArgumentException](
      JpegKernel.splitMjpeg(stream.dropRight(7)))
    intercept[IllegalArgumentException](
      JpegKernel.splitMjpeg(stream ++ Array[Byte](0x12, 0x34)))
  }

  test("JPEG 4:2:0: grayscale flat blocks round-trip EXACTLY through the " +
      "subsampled layout; color content stays within the lossy bound") {
    // gray: r=g=b=v → y = (256v)>>8 = v exactly, cb=cr=128 → the
    // half-res chroma planes are FLAT, so 4:2:0 is lossless here and
    // the decoded pixel must be (v,v,v) bit-for-bit
    val vals = Array(17, 96, 201, 250)
    val px = new Array[Byte](16 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = vals((y / 8) * 2 + x / 8)
      val p = (y * 16 + x) * 3
      px(p) = v.toByte; px(p + 1) = v.toByte; px(p + 2) = v.toByte
    }
    val jpeg = JpegKernel.encodeJpeg420(PpmImage(16, 16, 255, px))
    val dec = JpegKernel.decodeJpeg(jpeg)
    assert(dec.width == 16 && dec.height == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = vals((y / 8) * 2 + x / 8)
      val p = (y * 16 + x) * 3
      assert((dec.pixels(p) & 0xff) == v && (dec.pixels(p + 1) & 0xff) == v &&
        (dec.pixels(p + 2) & 0xff) == v,
        s"pixel ($x,$y): got ${dec.pixels(p) & 0xff} want $v")
    }
    // color content: chroma planes are quadrant-flat (AC coefficients
    // in play) → lossy; replication upsample + quantization must stay
    // within the standard bound
    val cpx = Array.tabulate(16 * 16 * 3)(i => ((i * 131 + 17) % 251).toByte)
    val cdec = JpegKernel.decodeJpeg(
      JpegKernel.encodeJpeg420(PpmImage(16, 16, 255, cpx)))
    var worst = 0
    for (p <- cpx.indices) {
      val d = math.abs((cdec.pixels(p) & 0xff) - (cpx(p) & 0xff))
      if (d > worst) worst = d
    }
    // a NOISE image is 4:2:0's pathological case (opposite-chroma
    // neighbors collapse into one half-res sample), so compare against
    // the IDEAL 4:2:0 reference — full-res forward transform, 2×2
    // box-averaged chroma, replication upsample, inverse transform,
    // NO codec — which isolates quantization/entropy error (bounded
    // like 4:4:4) from the layout's inherent information loss
    val ideal = {
      val n = 16 * 16
      val yP = new Array[Int](n); val cbF = new Array[Int](n)
      val crF = new Array[Int](n)
      for (p <- 0 until n) {
        val (y, cb, cr) = JpegKernel.rgbToYcc(cpx(3 * p) & 0xff,
          cpx(3 * p + 1) & 0xff, cpx(3 * p + 2) & 0xff)
        yP(p) = y; cbF(p) = cb; crF(p) = cr
      }
      def ds(f: Array[Int], x: Int, y: Int): Int = {
        val qx = (x / 2) * 2; val qy = (y / 2) * 2
        (f(qy * 16 + qx) + f(qy * 16 + qx + 1) +
          f((qy + 1) * 16 + qx) + f((qy + 1) * 16 + qx + 1)) / 4
      }
      Array.tabulate(n) { p =>
        val x = p % 16; val y = p / 16
        JpegKernel.yccToRgb(yP(p), ds(cbF, x, y), ds(crF, x, y))
      }
    }
    var worstVsIdeal = 0
    for (p <- 0 until 16 * 16) {
      val (ir, ig, ib) = ideal(p)
      val d = math.max(math.abs((cdec.pixels(3 * p) & 0xff) - ir),
        math.max(math.abs((cdec.pixels(3 * p + 1) & 0xff) - ig),
          math.abs((cdec.pixels(3 * p + 2) & 0xff) - ib)))
      if (d > worstVsIdeal) worstVsIdeal = d
    }
    assert(worstVsIdeal <= 96,
      s"codec error vs ideal-4:2:0 reference $worstVsIdeal (raw worst $worst)")
    // dims not MCU-divisible fail loudly
    intercept[IllegalArgumentException](
      JpegKernel.encodeJpeg420(PpmImage(8, 8, 255, new Array[Byte](192))))
  }

  test("resizeBox: hand-computed 2x box average, floor semantics, and a " +
      "full decode->resize->featurize round trip on a real PNG") {
    // 2x2 -> 1x1: output = floor(mean of 4) per channel
    val tiny = PpmImage(2, 2, 255, Array[Byte](
      10, 0, 0,  20, 0, 0,
      30, 0, 0,  43, 0, 0)) // r: (10+20+30+43)/4 = 103/4 = 25 (floor)
    val r1 = resizeBox(tiny, 2)
    assert(r1.width == 1 && r1.height == 1)
    assert((r1.pixels(0) & 0xff) == 25 && (r1.pixels(1) & 0xff) == 0)
    // factor 1 is the identity; non-divisible dims fail loudly
    assert(resizeBox(tiny, 1) eq tiny)
    intercept[IllegalArgumentException](
      resizeBox(PpmImage(3, 3, 255, new Array[Byte](27)), 2))
    // end-to-end: a 16x16 byte-cycled PNG decoded + resized via the
    // kernel equals resizeBox applied to the raw raster directly
    val row = MultimodalQueries.textToPngRowSized(7L, "The quick brown fox", 16, 16)
    val viaKernel = resizePngFeatures(row.doc_id, row.payload, 2)
    val raw = {
      val bytes = "The quick brown fox".getBytes("US-ASCII")
      PpmImage(16, 16, 255,
        Array.tabulate(768)(i => bytes(i % bytes.length)))
    }
    val resized = resizeBox(raw, 2)
    val direct = ppmFeatures(7L, encodePpm(resized))
    assert(viaKernel.src_width == 16 && viaKernel.new_width == 8)
    assert(viaKernel.mean_r == direct.mean_r &&
      viaKernel.mean_g == direct.mean_g &&
      viaKernel.mean_b == direct.mean_b &&
      viaKernel.lum_mean == direct.lum_mean)
    assert(viaKernel.ahash_hi == direct.ahash_hi &&
      viaKernel.ahash_lo == direct.ahash_lo)
  }

  test("textToPngRow: empty text encodes silence; fixture decode matches " +
      "the byte-cycled model the oracle computes") {
    val empty = MultimodalQueries.textToPngRow(3L, "")
    val f0 = pngFeatures(empty.doc_id, empty.payload)
    assert(f0.mean_r == 0 && f0.lum_mean == 0 && f0.ahash_hi == 0 && f0.ahash_lo == 0)
    val row = MultimodalQueries.textToPngRow(9L, "AB")
    val f = pngFeatures(row.doc_id, row.payload)
    // bytes cycle A,B,A,B… → r always 'A'(65) at even raster offsets:
    // raster i = text[i mod 2]; channel r sits at i=3k → alternates 65/66
    assert(f.width == 8 && f.height == 8)
    assert(f.mean_r == (32 * 65 + 32 * 66) / 64)
  }

  test("decodePngBatched on the fixture: every document decodes, and the " +
      "PNG features equal the PPM features of the same byte-cycled raster") {
    val df = MultimodalQueries.queries("mm_png_decode")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getInt(1) == 8 && r.getInt(2) == 8))
  }

  test("decodeWavBatched on the fixture equals the driver-side single-" +
      "payload decode, and every signal hits negative samples") {
    val df = MultimodalQueries.queries("mm_wav_decode")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 500)
    // the ·517 spread guarantees the sign path is exercised: every
    // docs's 128 samples include at least one negative (sum < peak·128
    // would be too weak — check min directly via energy>0 and sum<0 mix)
    assert(rows.forall(_.getLong(df.columns.indexOf("n_frames")) == 64L))
    assert(rows.exists(_.getLong(df.columns.indexOf("sum_ch0")) < 0L),
      "no negative-sum channel anywhere — sign decode not exercised")
  }

  // ------------------------------------------------------------------
  // round 14: AAN fast IDCT, progressive (SOF2), DRI/RSTn restarts
  // ------------------------------------------------------------------

  test("AAN factorized IDCT agrees with the reference O(64^2) IDCT on " +
      "seeded random coefficient blocks: rounded pixels identical, real " +
      "outputs within 1e-9") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 0 until 200) {
      // dequantized coefficient magnitudes as the decoder sees them
      val coefNat = Array.fill(64)((rnd.nextInt(201) - 100) * 8.0)
      val ref = JpegKernel.idctRef(coefNat)
      val ws = new Array[Double](64)
      for (nat <- 0 until 64)
        ws(nat) = coefNat(nat) *
          JpegKernel.AanScale(nat & 7) * JpegKernel.AanScale(nat >> 3) / 8.0
      JpegKernel.idctAan(ws)
      for (p <- 0 until 64) {
        assert(math.abs(ref(p) - ws(p)) < 1e-9,
          s"slot $p: ref ${ref(p)} vs aan ${ws(p)}")
        assert(Math.round(ref(p)) == Math.round(ws(p)),
          s"slot $p rounds differently: ${ref(p)} vs ${ws(p)}")
      }
    }
  }

  test("progressive JPEG (SOF2) decodes to EXACTLY the baseline pixels of " +
      "the same raster: successive approximation + spectral selection are " +
      "a reordering of the same quantized coefficients") {
    // non-flat 32x32: 16 blocks/component drive EOBRUN > 1, ZRL runs,
    // negative coefficients, and refinement correction bits
    val noisy = PpmImage(32, 32, 255,
      Array.tabulate(32 * 32 * 3)(i => ((i * 131 + 17) % 251).toByte))
    val base = JpegKernel.decodeJpeg(JpegKernel.encodeJpeg(noisy))
    val prog = JpegKernel.decodeJpeg(JpegKernel.encodeJpegProgressive(noisy))
    assert(prog.width == 32 && prog.height == 32)
    assert(java.util.Arrays.equals(prog.pixels, base.pixels),
      "progressive decode != baseline decode of the same raster")
    // flat blocks: the oracle-fixture case — all-zero AC bands make the
    // AC scans pure EOB runs (EOB4 codes), still pixel-exact
    val vals = Array((200, 30, 90), (12, 250, 7), (128, 128, 128), (255, 0, 255))
    val px = new Array[Byte](16 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 16) {
      val (r, g, b) = vals((y / 8) * 2 + x / 8)
      val p = (y * 16 + x) * 3
      px(p) = r.toByte; px(p + 1) = g.toByte; px(p + 2) = b.toByte
    }
    val flat = PpmImage(16, 16, 255, px)
    assert(java.util.Arrays.equals(
      JpegKernel.decodeJpeg(JpegKernel.encodeJpegProgressive(flat)).pixels,
      JpegKernel.decodeJpeg(JpegKernel.encodeJpeg(flat)).pixels))
    // truncating a progressive stream fails loudly
    val pj = JpegKernel.encodeJpegProgressive(noisy)
    intercept[IllegalArgumentException](
      JpegKernel.decodeJpeg(pj.take(pj.length / 2)))
  }

  test("restart intervals (DRI/RSTn): baseline and progressive streams " +
      "with restarts decode to the no-restart pixels; a broken marker " +
      "sequence fails loudly") {
    val noisy = PpmImage(32, 32, 255,
      Array.tabulate(32 * 32 * 3)(i => ((i * 197 + 43) % 251).toByte))
    val plain = JpegKernel.decodeJpeg(JpegKernel.encodeJpeg(noisy))
    // baseline with Ri=3 (16 MCUs -> 5 restart markers)
    val dri = JpegKernel.encodeJpegDri(noisy, 3)
    assert(java.util.Arrays.equals(JpegKernel.decodeJpeg(dri).pixels,
      plain.pixels), "DRI baseline decode != plain baseline decode")
    // progressive with Ri=3: EOB runs flushed at each restart
    val pdri = JpegKernel.encodeJpegProgressive(noisy, restartInterval = 3)
    assert(java.util.Arrays.equals(JpegKernel.decodeJpeg(pdri).pixels,
      plain.pixels), "DRI progressive decode != plain baseline decode")
    // corrupt the first restart marker's index: RSTn out of sequence
    val broken = dri.clone()
    val at = broken.indices.dropRight(1).find(i =>
      (broken(i) & 0xff) == 0xff && (broken(i + 1) & 0xff) == 0xd0).get
    broken(at + 1) = 0xd5.toByte
    intercept[IllegalArgumentException](JpegKernel.decodeJpeg(broken))
    // standalone markers in the header walk fail loudly (TEM, bare RST)
    intercept[IllegalArgumentException](JpegKernel.decodeJpeg(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x01)))
    intercept[IllegalArgumentException](JpegKernel.decodeJpeg(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd3.toByte)))
    intercept[IllegalArgumentException](JpegKernel.splitMjpeg(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x01)))
  }

  test("splitMjpeg passes RSTn restart markers inside entropy data and " +
      "still finds exact frame boundaries") {
    val a = PpmImage(16, 16, 255, Array.fill(768)(60.toByte))
    val noisy = PpmImage(16, 16, 255,
      Array.tabulate(768)(i => ((i * 89 + 7) % 251).toByte))
    val stream = (JpegKernel.encodeJpegDri(a, 2) ++
      JpegKernel.encodeJpegDri(noisy, 1) ++
      JpegKernel.encodeJpeg(a)).toArray
    val frames = JpegKernel.splitMjpeg(stream)
    assert(frames.length == 3, s"got ${frames.length} frames")
    val plain = JpegKernel.decodeJpeg(JpegKernel.encodeJpeg(noisy))
    assert(java.util.Arrays.equals(
      JpegKernel.decodeJpeg(frames(1)).pixels, plain.pixels))
  }
}
