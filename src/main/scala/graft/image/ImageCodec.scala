package graft.image

/**
 * Deterministic raster synthesis + toy lossless/lossy codecs + PSNR + pHash.
 *
 * The corpus per BASELINE.json input_hint carries `(image_id, bytes, w, h,
 * fmt, caption, phash)`; the per-row output invariant is decoded-pixel
 * PSNR >= 40 dB for lossy formats (exact for lossless) plus caption equality.
 * The container has no image libraries, so we define our own trivially
 * portable formats whose decode is bit-stable across JVMs:
 *
 *   fmt = "png" (lossless stand-in): header + raw RGB bytes.
 *   fmt = "jpg" (lossy stand-in):   header + RGB quantized to steps of 4;
 *         uniform error in [-2,2] ⇒ MSE ≈ 1.7 ⇒ PSNR ≈ 47.9 dB — a real
 *         (non-infinite) check against the >= 40 dB bar.
 *
 * Header: 'G','L'|'Q', wHi, wLo, hHi, hLo, then w*h*3 pixel bytes.
 * The source raster is a smooth deterministic function of (image_id, x, y)
 * via a splitmix64-style hash — same on every JVM, no java.util.Random.
 */
object ImageCodec {
  final val MagicLossless: Byte = 'L'
  final val MagicLossy: Byte = 'Q'
  final val Quant = 4

  /** splitmix64 finalizer — public-domain mixing constants. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def seedOf(imageId: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < imageId.length) { h = 31 * h + imageId.charAt(i); i += 1 }
    mix64(h)
  }

  /** Smooth-ish deterministic RGB raster, row-major, 3 bytes/pixel. */
  def raster(imageId: String, w: Int, h: Int): Array[Byte] = {
    val seed = seedOf(imageId)
    val out = new Array[Byte](w * h * 3)
    val bx = ((seed & 0xff) % 97).toInt
    val by = (((seed >>> 8) & 0xff) % 89).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        // smooth gradients + a little hash texture so quantization error is real
        val tex = (mix64(seed ^ (x.toLong << 32) ^ y.toLong) & 0x07).toInt
        out(base) = ((bx + 2 * x + y + tex) & 0xff).toByte
        out(base + 1) = ((by + x + 2 * y + tex) & 0xff).toByte
        out(base + 2) = ((bx + by + x + y + 2 * tex) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  def encode(imageId: String, w: Int, h: Int, fmt: String): Array[Byte] = {
    val px = raster(imageId, w, h)
    val lossy = fmt == "jpg"
    val out = new Array[Byte](6 + px.length)
    out(0) = 'G'; out(1) = if (lossy) MagicLossy else MagicLossless
    out(2) = ((w >> 8) & 0xff).toByte; out(3) = (w & 0xff).toByte
    out(4) = ((h >> 8) & 0xff).toByte; out(5) = (h & 0xff).toByte
    var i = 0
    while (i < px.length) {
      val v = px(i) & 0xff
      out(6 + i) = if (lossy) ((v / Quant) * Quant + Quant / 2).min(255).toByte else px(i)
      i += 1
    }
    out
  }

  /** Losslessly encode an existing RGB raster (w*h*3 bytes). */
  def encodeRaster(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(px.length == w * h * 3, "raster size mismatch")
    val out = new Array[Byte](6 + px.length)
    out(0) = 'G'; out(1) = MagicLossless
    out(2) = ((w >> 8) & 0xff).toByte; out(3) = (w & 0xff).toByte
    out(4) = ((h >> 8) & 0xff).toByte; out(5) = (h & 0xff).toByte
    System.arraycopy(px, 0, out, 6, px.length)
    out
  }

  /** Decode to (w, h, rgb). Throws on bad magic — corpus bytes are trusted. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 6 && bytes(0) == 'G', "bad image magic")
    val w = ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val h = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
    val px = java.util.Arrays.copyOfRange(bytes, 6, 6 + w * h * 3)
    (w, h, px)
  }

  /** PSNR in dB between two equal-size pixel arrays; infinite ⇒ 999.0. */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, "pixel size mismatch")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0.0) 999.0
    else {
      val mse = se / a.length
      10.0 * math.log10(255.0 * 255.0 / mse)
    }
  }

  /** PSNR of an encoded payload vs the authoritative raster of image_id. */
  def psnrVsReference(imageId: String, bytes: Array[Byte]): Double = {
    val (w, h, px) = decode(bytes)
    psnr(raster(imageId, w, h), px)
  }

  /** 64-bit average-hash: 8x8 downsampled luminance thresholded by mean. */
  def phash(imageId: String, w: Int, h: Int): Long = phashOf(raster(imageId, w, h), w, h)

  def phashOf(px: Array[Byte], w: Int, h: Int): Long = {
    val grid = new Array[Double](64)
    val cnt = new Array[Int](64)
    var y = 0
    while (y < h) {
      val gy = math.min(y * 8 / math.max(h, 1), 7)
      var x = 0
      while (x < w) {
        val gx = math.min(x * 8 / math.max(w, 1), 7)
        val base = (y * w + x) * 3
        val lum = 0.299 * (px(base) & 0xff) + 0.587 * (px(base + 1) & 0xff) +
          0.114 * (px(base + 2) & 0xff)
        grid(gy * 8 + gx) += lum
        cnt(gy * 8 + gx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    var mean = 0.0
    while (i < 64) { if (cnt(i) > 0) grid(i) /= cnt(i); mean += grid(i); i += 1 }
    mean /= 64
    var bits = 0L
    i = 0
    while (i < 64) { if (grid(i) >= mean) bits |= (1L << i); i += 1 }
    bits
  }

  def caption(imageId: String): String = {
    val seed = seedOf(imageId)
    val adj = Vector("quiet", "bright", "rusty", "gentle", "vast", "amber",
      "hollow", "silver", "mossy", "pale")
    val noun = Vector("harbor", "meadow", "rooftop", "canyon", "lantern",
      "orchard", "glacier", "market", "bridge", "archway")
    val verb = Vector("at dawn", "after rain", "in fog", "under stars",
      "at dusk", "in summer", "mid-winter", "in shadow")
    s"a ${adj((seed & 0x7fffffff).toInt % 10)} ${noun(((seed >>> 16) & 0x7fffffff).toInt % 10)} ${verb(((seed >>> 32) & 0x7fffffff).toInt % 8)} (#$imageId)"
  }
}
