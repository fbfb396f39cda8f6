package graft.operators

import graft.operators.MediaBatchProcessor.PpmImage

/** REAL baseline JPEG (SOF0) codec — the last contract-only image
  * format in the COVERAGE ledger, now a pure-JVM kernel (round 13):
  * marker walk, DQT/DHT/SOF0/SOS parse, canonical Huffman decode with
  * byte unstuffing, dequantization, full 8×8 IDCT, and fixed-point
  * YCbCr→RGB — every decoded property comes from the BYTES. The
  * encoder below is the conforming round-trip partner (interleaved
  * 4:4:4 MCUs, ITU T.81 Annex K standard Huffman tables, byte
  * stuffing) used by the fixture payload builder and MediaBatchSpec.
  *
  * Supported profile (fail-loudly on anything else — the honest
  * contract the PNG kernel set): baseline DCT (SOF0), 8-bit precision,
  * 1 or 3 components, no chroma subsampling (all sampling factors
  * 1×1), no restart intervals. That covers the canonical writer's
  * output and the common 4:4:4 corpus tier; progressive/subsampled
  * decode is a documented extension, not a silent wrong answer.
  *
  * Exactness contract for the oracle: the color transforms are FIXED-
  * POINT INTEGER (floor shifts, below), and the fixture's rasters are
  * FLAT per 8×8 block, so each block's DCT has only a DC coefficient —
  * with the DC quantizer 8 dividing the FDCT's 8·(v−128) exactly, the
  * quantize→dequantize→IDCT chain is lossless on flat blocks and the
  * decoded pixels are predictable integers a SQL oracle re-derives.
  * The Huffman/bitstream path this exercises is the REAL general
  * machinery (DC prediction across MCUs, category coding, EOB); AC
  * run/length coding is exercised by MediaBatchSpec's non-flat
  * round-trip, where the assertion is the standard lossy-bound one.
  *
  * Scale posture: a per-payload kernel invoked from a narrow
  * mapPartitions — no shuffle, no driver involvement; the O(64²)
  * reference DCT is the clarity choice (an AAN factorization is the
  * drop-in speedup when decode dominates a profile).
  */
object JpegKernel {

  // ---- fixed-point color transforms (shared with the SQL oracle) ----
  // Forward (JFIF weights scaled by 256, floor via arithmetic shift):
  //   y  =      (77 r + 150 g +  29 b) >> 8          ∈ [0, 255]
  //   cb = 128 + ((−43 r −  85 g + 128 b) >> 8)      ∈ [0, 255]
  //   cr = 128 + ((128 r − 107 g −  21 b) >> 8)      ∈ [0, 255]
  // Inverse (clamped):
  //   r = y + ((359 (cr−128)) >> 8)
  //   g = y − ((88 (cb−128) + 183 (cr−128)) >> 8)
  //   b = y + ((454 (cb−128)) >> 8)
  // The >> 8 is FLOOR division by 256 — the oracle must use
  // floor(x/256.0), not DuckDB's truncating `//`.
  def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = (
    (77 * r + 150 * g + 29 * b) >> 8,
    128 + ((-43 * r - 85 * g + 128 * b) >> 8),
    128 + ((128 * r - 107 * g - 21 * b) >> 8))

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = (
    clamp(y + ((359 * (cr - 128)) >> 8)),
    clamp(y - ((88 * (cb - 128) + 183 * (cr - 128)) >> 8)),
    clamp(y + ((454 * (cb - 128)) >> 8)))

  // ---- quantization tables (flat: DC 8, AC 16) ----
  // DC = 8 divides the FDCT's 8·(v−128) exactly → flat blocks
  // round-trip losslessly while the decoder still performs a REAL
  // dequantization multiply it would get wrong with any other table.
  private[operators] val QuantDc = 8
  private[operators] val QuantAc = 16
  private def quantTable(): Array[Int] =
    Array.tabulate(64)(i => if (i == 0) QuantDc else QuantAc)

  // ---- zigzag scan order: zigzag(k) = natural index of position k ----
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ---- ITU T.81 Annex K standard Huffman specifications ----
  // BITS (codes per length 1..16) + HUFFVAL, exactly as a conforming
  // encoder emits them in DHT and a conforming decoder rebuilds the
  // canonical code from them.
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman code assignment (T.81 §C.2): codes per length
    * from BITS, values in HUFFVAL order. Returns (symbol, code, len)
    * triples — the one table both the encoder map and the decoder map
    * are built from, so they cannot disagree. */
  private def canonicalCodes(bits: Array[Int],
      vals: Array[Int]): Seq[(Int, Int, Int)] = {
    require(bits.length == 16, "BITS must have 16 entries")
    require(bits.sum == vals.length,
      s"BITS total ${bits.sum} != HUFFVAL length ${vals.length}")
    val out = Seq.newBuilder[(Int, Int, Int)]
    var code = 0; var k = 0; var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += ((vals(k), code, len)); code += 1; k += 1; i += 1
      }
      code <<= 1; len += 1
    }
    out.result()
  }

  private final class EncTable(bits: Array[Int], vals: Array[Int]) {
    val codeOf: Map[Int, (Int, Int)] =
      canonicalCodes(bits, vals).map { case (s, c, l) => s -> ((c, l)) }.toMap
  }
  private final class DecTable(bits: Array[Int], vals: Array[Int]) {
    val symbolOf: Map[(Int, Int), Int] =
      canonicalCodes(bits, vals).map { case (s, c, l) => ((l, c), s) }.toMap
  }

  // ---- reference DCT (double precision, O(64²) per block) ----
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private def c0(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** FDCT of one level-shifted 8×8 block (row-major spatial in,
    * natural-order frequency out). */
  private def fdct(s: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            acc += s(y * 8 + x) * CosT(x)(u) * CosT(y)(v)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = 0.25 * c0(u) * c0(v) * acc
        u += 1
      }
      v += 1
    }
    out
  }

  /** IDCT of one dequantized 8×8 coefficient block (natural order in,
    * row-major spatial out, still level-shifted). */
  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0.0) acc += c0(u) * c0(v) * c * CosT(x)(u) * CosT(y)(v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = 0.25 * acc
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- bit I/O with byte stuffing ----
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** pad the final partial byte with 1-bits (T.81 convention) */
    def flush(): Unit = if (n > 0) { put(0xff, 8 - n); () }
  }

  private final class BitReader(bytes: Array[Byte], private var pos: Int,
      fail: String => Nothing) {
    private var acc = 0; private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (pos >= bytes.length) fail("entropy stream truncated")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) fail("entropy stream truncated at 0xFF")
          val m = bytes(pos) & 0xff; pos += 1
          if (m != 0x00)
            fail(f"unexpected marker 0xFF$m%02X inside entropy stream " +
              "(restart markers unsupported)")
          b = 0xff
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decodeSymbol(t: DecTable): Int = {
      var code = 0; var len = 0
      while (len < 16) {
        code = (code << 1) | bit(); len += 1
        t.symbolOf.get((len, code)) match {
          case Some(s) => return s
          case None => ()
        }
      }
      fail("invalid Huffman code (no symbol within 16 bits)")
    }
    def position: Int = pos
  }

  /** DC/AC category (number of magnitude bits) of a coefficient. */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }
  /** magnitude bits for value v in category s (negative values are
    * one's-complemented, per T.81 receive/extend) */
  private def magnitudeBits(v: Int, s: Int): Int =
    if (v >= 0) v else v + (1 << s) - 1
  /** T.81 EXTEND: reconstruct a signed value from s magnitude bits */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // =====================================================================
  // Encoder
  // =====================================================================

  /** Conforming baseline JPEG writer, interleaved 4:4:4 (one 8×8 block
    * per component per MCU). Requires 8-divisible dimensions (a
    * production encoder edge-pads; the canonical writer fails loudly
    * instead of inventing pixels). */
  def encodeJpeg(img: PpmImage): Array[Byte] = encodeBaseline(img, 1)

  /** Conforming 4:2:0 writer — the dominant real-world JPEG layout:
    * Y at 2×2 sampling (four blocks per MCU), chroma planes 2×2
    * box-averaged to half resolution (one block each per MCU).
    * Requires 16-divisible dimensions. */
  def encodeJpeg420(img: PpmImage): Array[Byte] = encodeBaseline(img, 2)

  private def encodeBaseline(img: PpmImage, sub: Int): Array[Byte] = {
    require(img.maxVal == 255, "JPEG writer takes 8-bit RGB")
    require(img.width % (8 * sub) == 0 && img.height % (8 * sub) == 0,
      s"writer needs ${8 * sub}-divisible dims, got ${img.width}x${img.height}")
    require(img.pixels.length == img.width * img.height * 3, "raster size")
    val w = img.width; val h = img.height
    // color transform into three full-resolution planes
    val full = Array.ofDim[Int](3, w * h)
    var p = 0
    while (p < w * h) {
      val (y, cb, cr) = rgbToYcc(img.pixels(3 * p) & 0xff,
        img.pixels(3 * p + 1) & 0xff, img.pixels(3 * p + 2) & 0xff)
      full(0)(p) = y; full(1)(p) = cb; full(2)(p) = cr
      p += 1
    }
    // chroma subsample (sub=2: 2×2 integer box average; sub=1: as-is)
    val cw = w / sub; val ch = h / sub
    def subsampled(c: Int): Array[Int] =
      if (sub == 1) full(c)
      else Array.tabulate(cw * ch) { q =>
        val qx = q % cw; val qy = q / cw
        (full(c)((2 * qy) * w + 2 * qx) + full(c)((2 * qy) * w + 2 * qx + 1) +
          full(c)((2 * qy + 1) * w + 2 * qx) +
          full(c)((2 * qy + 1) * w + 2 * qx + 1)) / 4
      }
    // per-component plane, plane width, blocks-per-MCU factor
    val planes = Array(full(0), subsampled(1), subsampled(2))
    val planeW = Array(w, cw, cw)
    val sampF = Array(sub, 1, 1)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    // DQT: two 8-bit tables (0 = luma, 1 = chroma; identical flat
    // tables here, but the decoder must still route by Tq)
    val qt = quantTable()
    marker(0xdb); u16(2 + 2 * 65)
    for (id <- 0 to 1) { u8(id); for (k <- 0 until 64) u8(qt(Zigzag(k))) }
    // SOF0
    marker(0xc0); u16(8 + 3 * 3)
    u8(8); u16(h); u16(w); u8(3)
    for (cid <- 1 to 3) {
      u8(cid)
      u8(if (cid == 1) (sub << 4) | sub else 0x11)
      u8(if (cid == 1) 0 else 1)
    }
    // DHT: the four standard tables
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8(tcTh); bits.foreach(u8); vals.foreach(u8)
    }
    dht(0x00, DcLumaBits, DcLumaVals)
    dht(0x10, AcLumaBits, AcLumaVals)
    dht(0x01, DcChromaBits, DcChromaVals)
    dht(0x11, AcChromaBits, AcChromaVals)
    // SOS
    marker(0xda); u16(6 + 2 * 3)
    u8(3)
    u8(1); u8(0x00) // Y: DC table 0, AC table 0
    u8(2); u8(0x11) // Cb: DC table 1, AC table 1
    u8(3); u8(0x11) // Cr
    u8(0); u8(63); u8(0) // Ss, Se, Ah/Al (baseline fixed values)
    // entropy-coded data: MCUs in raster order; per MCU the Y component
    // contributes sub×sub blocks, each chroma component one block
    val encDc = Array(new EncTable(DcLumaBits, DcLumaVals),
      new EncTable(DcChromaBits, DcChromaVals))
    val encAc = Array(new EncTable(AcLumaBits, AcLumaVals),
      new EncTable(AcChromaBits, AcChromaVals))
    val bw = new BitWriter(out)
    val pred = new Array[Int](3)
    def putCode(t: EncTable, sym: Int): Unit = t.codeOf.get(sym) match {
      case Some((c, l)) => bw.put(c, l)
      case None => throw new IllegalStateException(
        f"symbol 0x$sym%02X not in Huffman table")
    }
    val block = new Array[Double](64)
    def encodeBlock(comp: Int, ox: Int, oy: Int): Unit = {
      val tid = if (comp == 0) 0 else 1
      val pw = planeW(comp)
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          block(yy * 8 + xx) = planes(comp)((oy + yy) * pw + ox + xx) - 128.0
          xx += 1
        }
        yy += 1
      }
      val coef = fdct(block)
      val zz = new Array[Int](64)
      var k = 0
      while (k < 64) {
        zz(k) = Math.round(coef(Zigzag(k)) / qt(Zigzag(k))).toInt
        k += 1
      }
      // DC: category + magnitude bits of the prediction diff
      val diff = zz(0) - pred(comp); pred(comp) = zz(0)
      val s = category(diff)
      putCode(encDc(tid), s)
      if (s > 0) bw.put(magnitudeBits(diff, s), s)
      // AC: run/size symbols, ZRL for 16-zero runs, EOB at the end
      var run = 0
      k = 1
      while (k < 64) {
        if (zz(k) == 0) run += 1
        else {
          while (run >= 16) { putCode(encAc(tid), 0xf0); run -= 16 }
          val sa = category(zz(k))
          putCode(encAc(tid), (run << 4) | sa)
          bw.put(magnitudeBits(zz(k), sa), sa)
          run = 0
        }
        k += 1
      }
      if (run > 0) putCode(encAc(tid), 0x00) // EOB
    }
    var my = 0
    while (my < h / (8 * sub)) {
      var mx = 0
      while (mx < w / (8 * sub)) {
        var vy = 0
        while (vy < sampF(0)) {
          var vx = 0
          while (vx < sampF(0)) {
            encodeBlock(0, (mx * sampF(0) + vx) * 8, (my * sampF(0) + vy) * 8)
            vx += 1
          }
          vy += 1
        }
        encodeBlock(1, mx * 8, my * 8)
        encodeBlock(2, mx * 8, my * 8)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // =====================================================================
  // MJPEG (motion-JPEG) container: a video stream as back-to-back
  // standalone baseline JPEG frames — a REAL video format (the AVI/MOV
  // 'MJPG' codec payload, and the wire format of countless IP cameras).
  // With byte stuffing in force (0xFF in entropy data is always followed
  // by 0x00) and restart markers rejected, the only 0xFF D9 in a frame
  // is its EOI, so the boundary scan below is exact, not heuristic.
  // =====================================================================

  /** Split a concatenated-JPEG (MJPEG) payload into its frames: each
    * frame is walked marker-by-marker (segments skipped by declared
    * length) to its SOS, then through the entropy stream respecting
    * byte stuffing, to its EOI. Fails loudly on anything that is not a
    * clean frame sequence — a truncated or corrupt tail must not
    * silently yield fewer frames. */
  def splitMjpeg(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a supported MJPEG stream: $msg")
    def u8(p: Int): Int = {
      if (p >= bytes.length) fail(s"truncated at offset $p")
      bytes(p) & 0xff
    }
    def u16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
    val frames = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i < bytes.length) {
      val start = i
      if (u8(i) != 0xff || u8(i + 1) != 0xd8) fail(s"expected SOI at offset $i")
      i += 2
      var inFrame = true
      while (inFrame) {
        if (u8(i) != 0xff) fail(s"expected marker at offset $i")
        var m = u8(i + 1); var mi = i + 1
        while (m == 0xff) { mi += 1; m = u8(mi) }
        i = mi + 1
        m match {
          case 0xd9 => inFrame = false // EOI before SOS: header-only frame
          case 0xda => // SOS: skip its header, then scan stuffed entropy
            i += u16(i)
            var inEntropy = true
            while (inEntropy) {
              if (u8(i) == 0xff) {
                u8(i + 1) match {
                  case 0x00 => i += 2 // stuffed data byte
                  case 0xd9 => i += 2; inEntropy = false; inFrame = false
                  case other => fail(
                    f"marker 0xFF$other%02X inside entropy stream " +
                      "(restart markers unsupported)")
                }
              } else i += 1
            }
          case 0xdd =>
            if (u16(i + 2) != 0) fail("restart intervals unsupported")
            i += u16(i)
          case _ => i += u16(i) // any length-carrying segment
        }
      }
      frames += java.util.Arrays.copyOfRange(bytes, start, i)
    }
    val out = frames.result()
    if (out.isEmpty) fail("empty stream")
    out
  }

  // =====================================================================
  // Decoder
  // =====================================================================

  private final case class Component(id: Int, hv: Int, tq: Int,
      var dcTable: Int = 0, var acTable: Int = 0)

  /** REAL baseline JPEG decoder (profile documented in the object
    * Scaladoc). Returns the same [[PpmImage]] raster the PPM/PNG paths
    * yield, so all downstream pixel math is shared. Grayscale (1
    * component) decodes with Y replicated to RGB. */
  def decodeJpeg(bytes: Array[Byte]): PpmImage = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a supported JPEG: $msg")
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      fail("bad SOI")
    var i = 2
    def u8(p: Int): Int = { if (p >= bytes.length) fail("truncated"); bytes(p) & 0xff }
    def u16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
    val qts = Array.ofDim[Int](4, 64) // natural order
    val qtSeen = new Array[Boolean](4)
    val dcTables = new Array[DecTable](4)
    val acTables = new Array[DecTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var sosAt = -1
    while (sosAt < 0) {
      if (i + 1 >= bytes.length) fail("ran out of segments before SOS")
      if (u8(i) != 0xff) fail(f"expected marker at offset $i, got 0x${u8(i)}%02X")
      var m = u8(i + 1); var mi = i + 1
      while (m == 0xff) { mi += 1; m = u8(mi) } // 0xFF fill bytes
      i = mi + 1
      m match {
        case 0xd9 => fail("EOI before SOS")
        case 0xdb => // DQT — may hold several tables
          val len = u16(i); var p = i + 2
          while (p < i + len) {
            val pqTq = u8(p)
            if ((pqTq >> 4) != 0) fail("16-bit quant tables unsupported")
            val tq = pqTq & 0x0f
            var k = 0
            while (k < 64) { qts(tq)(Zigzag(k)) = u8(p + 1 + k); k += 1 }
            qtSeen(tq) = true
            p += 65
          }
          i += len
        case 0xc4 => // DHT — may hold several tables
          val len = u16(i); var p = i + 2
          while (p < i + len) {
            val tcTh = u8(p)
            val bits = Array.tabulate(16)(k => u8(p + 1 + k))
            val nv = bits.sum
            val vals = Array.tabulate(nv)(k => u8(p + 17 + k))
            val t = new DecTable(bits, vals)
            if ((tcTh >> 4) == 0) dcTables(tcTh & 0x0f) = t
            else acTables(tcTh & 0x0f) = t
            p += 17 + nv
          }
          i += len
        case 0xc0 => // SOF0 — the supported frame type
          val len = u16(i)
          if (u8(i + 2) != 8) fail(s"precision ${u8(i + 2)} (want 8)")
          h = u16(i + 3); w = u16(i + 5)
          if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
          if (w.toLong * h * 3 + h > Int.MaxValue / 2)
            fail(s"dimensions ${w}x$h exceed decoder bounds")
          if (w % 8 != 0 || h % 8 != 0)
            fail(s"non-8-divisible dims ${w}x$h unsupported (no edge padding)")
          val nf = u8(i + 7)
          if (nf != 1 && nf != 3) fail(s"$nf components (want 1 or 3)")
          comps = Array.tabulate(nf) { c =>
            val base = i + 8 + 3 * c
            Component(u8(base), u8(base + 1), u8(base + 2))
          }
          comps.foreach { c =>
            val (hi, vi) = (c.hv >> 4, c.hv & 0x0f)
            if (hi < 1 || hi > 2 || vi < 1 || vi > 2)
              fail(f"sampling factors 0x${c.hv}%02X (1x1 and 2x2 supported — " +
                "4:4:4, 4:2:0, grayscale)")
            if (c.tq > 3) fail(s"quant table id ${c.tq}")
          }
          i += len
        case sof if sof >= 0xc1 && sof <= 0xcf && sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
          fail(f"SOF 0x$sof%02X (progressive/extended) unsupported — baseline SOF0 only")
        case 0xdd => // DRI
          val len = u16(i)
          if (u16(i + 2) != 0) fail("restart intervals unsupported")
          i += len
        case 0xda => // SOS
          if (comps == null) fail("SOS before SOF0")
          val len = u16(i)
          val ns = u8(i + 2)
          if (ns != comps.length) fail(s"scan components $ns != frame ${comps.length}")
          var c = 0
          while (c < ns) {
            val cs = u8(i + 3 + 2 * c); val tdTa = u8(i + 4 + 2 * c)
            comps.find(_.id == cs) match {
              case Some(comp) =>
                comp.dcTable = tdTa >> 4; comp.acTable = tdTa & 0x0f
              case None => fail(s"scan names unknown component $cs")
            }
            c += 1
          }
          sosAt = i + len
        case _ => // APPn, COM, others with a length field: skip
          i += u16(i)
      }
    }
    comps.foreach { c =>
      if (!qtSeen(c.tq)) fail(s"component ${c.id} references missing quant table ${c.tq}")
      if (dcTables(c.dcTable) == null) fail(s"missing DC Huffman table ${c.dcTable}")
      if (acTables(c.acTable) == null) fail(s"missing AC Huffman table ${c.acTable}")
    }
    // entropy decode — general interleaved MCU structure: the MCU is
    // 8·maxH × 8·maxV image pixels; each component contributes h_i·v_i
    // blocks per MCU into its own (possibly subsampled) plane, which is
    // replication-upsampled at reconstruction (the standard fast chroma
    // upsample). 4:4:4 is the all-1×1 special case; 4:2:0 is Y=2×2,
    // C=1×1.
    val nc = comps.length
    val hs = comps.map(c => c.hv >> 4)
    val vs = comps.map(c => c.hv & 0x0f)
    val maxH = hs.max; val maxV = vs.max
    if (w % (8 * maxH) != 0 || h % (8 * maxV) != 0)
      fail(s"dims ${w}x$h not divisible by the ${8 * maxH}x${8 * maxV} MCU " +
        "(no edge padding)")
    val pw = Array.tabulate(nc)(c => w * hs(c) / maxH)
    val ph = Array.tabulate(nc)(c => h * vs(c) / maxV)
    val planes = Array.tabulate(nc)(c => new Array[Int](pw(c) * ph(c)))
    val br = new BitReader(bytes, sosAt, fail)
    val pred = new Array[Int](nc)
    val zz = new Array[Int](64)
    val coef = new Array[Double](64)
    var my = 0
    while (my < h / (8 * maxV)) {
      var mx = 0
      while (mx < w / (8 * maxH)) {
        var c = 0
        while (c < nc) {
          val comp = comps(c)
          var vy = 0
          while (vy < vs(c)) {
            var vx = 0
            while (vx < hs(c)) {
              java.util.Arrays.fill(zz, 0)
              // DC
              val s = br.decodeSymbol(dcTables(comp.dcTable))
              if (s > 11) fail(s"DC category $s out of range")
              pred(c) += extend(br.bits(s), s)
              zz(0) = pred(c)
              // AC
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = br.decodeSymbol(acTables(comp.acTable))
                val run = rs >> 4; val sa = rs & 0x0f
                if (sa == 0) {
                  if (run == 15) k += 16 // ZRL
                  else eob = true // EOB (run must be 0 in baseline)
                } else {
                  k += run
                  if (k > 63) fail("AC run overflows block")
                  zz(k) = extend(br.bits(sa), sa)
                  k += 1
                }
              }
              // dequantize into natural order + IDCT
              val qt = qts(comp.tq)
              var j = 0
              while (j < 64) {
                coef(Zigzag(j)) = zz(j).toDouble * qt(Zigzag(j))
                j += 1
              }
              val sp = idct(coef)
              val ox = (mx * hs(c) + vx) * 8
              val oy = (my * vs(c) + vy) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  val v = Math.round(sp(yy * 8 + xx)).toInt + 128
                  planes(c)((oy + yy) * pw(c) + ox + xx) = clamp(v)
                  xx += 1
                }
                yy += 1
              }
              vx += 1
            }
            vy += 1
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    // color reconstruction with replication upsample of subsampled planes
    def sample(c: Int, x: Int, y: Int): Int =
      planes(c)((y * vs(c) / maxV) * pw(c) + (x * hs(c) / maxH))
    val px = new Array[Byte](w * h * 3)
    var y0 = 0
    while (y0 < h) {
      var x0 = 0
      while (x0 < w) {
        val p = y0 * w + x0
        val (r, g, b) =
          if (nc == 1) { val v = sample(0, x0, y0); (v, v, v) }
          else yccToRgb(sample(0, x0, y0), sample(1, x0, y0), sample(2, x0, y0))
        px(3 * p) = r.toByte; px(3 * p + 1) = g.toByte; px(3 * p + 2) = b.toByte
        x0 += 1
      }
      y0 += 1
    }
    PpmImage(w, h, 255, px)
  }
}
