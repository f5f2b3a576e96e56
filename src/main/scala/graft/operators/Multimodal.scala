package graft.operators

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads travel as opaque
  * BINARY columns with typed metadata, decoded/featurized in batched
  * per-partition passes (the `mapPartitions` boundary amortizes codec
  * initialization exactly like `mapInPandas` batches do).
  *
  * Two tiers, stated honestly:
  *  - IMAGES are decoded FOR REAL via the JDK's own codecs
  *    (`javax.imageio` — PNG/JPEG/BMP/GIF/WBMP ship with `java.desktop`,
  *    zero external dependencies): [[decodeImages]] yields true pixel
  *    dimensions/bands plus a canonical raster hash, [[resizeImages]]
  *    produces real nearest-neighbour thumbnails from the decoded raster.
  *    Determinism: pixels are read with `Raster.getSample` (raw sample
  *    values — `BufferedImage.getRGB` would push grayscale through a
  *    colorspace conversion), and PNG is lossless, so
  *    decode(encodePng(pixels)) == pixels byte-for-byte — the
  *    `multimodal_decode` gate asserts exactly that round-trip.
  *  - AUDIO is decoded FOR REAL for the PCM container formats the JDK
  *    ships readers for (`javax.sound.sampled` — WAV/AIFF/AU):
  *    [[decodeAudios]] yields true rate/channels/frames, a canonical
  *    container-format-invariant PCM hash, and integer energy-window
  *    features. Compressed audio (MP3/AAC/Opus) has no in-JDK codec and
  *    falls through to None.
  *  - VIDEO (and compressed-audio) containers have no in-JDK codec; those
  *    payloads go through the byte-level featurizer path
  *    ([[decode]]/[[frameMeta]]) — a real deterministic computation (byte
  *    histogram features, fixed-stride frame offsets), but explicitly NOT
  *    a media decode; a production pipeline swaps an FFI codec into the
  *    same `mapPartitions` seam.
  */
object Multimodal {
  val FrameStride = 64

  case class MediaMeta(n_bytes: Long, n_distinct_bytes: Int, n_frames: Int)
  case class DecodedDoc(
      id: Long,
      n_bytes: Long,
      n_distinct_bytes: Int,
      n_frames: Int,
      features: Array[Float])
  case class ImageDecoded(
      id: Long,
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      pixel_md5: Option[String])

  // ---- real image decode (javax.imageio) ----------------------------------

  /** Hex md5 of raw bytes — matches Spark/DuckDB `md5()` over the same
    * BINARY, so raster hashes can be cross-checked in-plan. */
  def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  /** Decode one image payload → (width, height, bands, canonical pixel
    * bytes). Canonical order: row-major, band-interleaved (y, then x, then
    * band), raw raster samples via `Raster.getSample` — no colorspace
    * conversion ever touches the values, so lossless formats round-trip
    * byte-exactly. Samples wider than 8 bits (e.g. 16-bit grayscale PNG)
    * are written big-endian over ceil(maxSampleBits/8) bytes — a uniform
    * width across bands so the layout stays positional; truncating to the
    * low byte would collide distinct 16-bit images under pixel_md5 (the
    * exact-dedup key) and break the round-trip claim. 8-bit images keep
    * the 1-byte-per-sample canonical form. None when the payload is not a
    * decodable image (F4 posture: preserved as a null row, never dropped
    * or thrown). */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try {
      ImageIO.setUseCache(false) // in-memory streams; no temp-file cache
      val img = ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val r = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val nb = r.getNumBands
        val bytesPer =
          math.max(1,
            ((0 until nb).map(r.getSampleModel.getSampleSize).max + 7) / 8)
        val out = new Array[Byte](w * h * nb * bytesPer)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < nb) {
              val s = r.getSample(x, y, b)
              var k = (bytesPer - 1) * 8
              while (k >= 0) { out(i) = (s >>> k).toByte; i += 1; k -= 8 }
              b += 1
            }
            x += 1
          }
          y += 1
        }
        Some((w, h, nb, out))
      }
    } catch { case _: Exception => None }

  /** Batched REAL image decode over (id BIGINT, payload BINARY) →
    * (id, width, height, channels, pixel_md5). Partition-parallel, no
    * shuffle; undecodable payloads yield null metadata columns. The
    * pixel_md5 is over the canonical raster bytes (see [[decodeImage]]),
    * giving an exact-dedup key for image content that is independent of
    * the container encoding (the same pixels as PNG or BMP hash equal). */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String): Dataset[ImageDecoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        decodeImage(payload) match {
          case Some((w, h, nb, px)) =>
            ImageDecoded(id, Some(w), Some(h), Some(nb), Some(md5Hex(px)))
          case None => ImageDecoded(id, None, None, None, None)
        }
      })
  }

  /** Nearest-neighbour resample of canonical pixel bytes (shared by the
    * DataFrame path and the gate's codec-free expected value):
    * out(x, y, b) = in(x·W/w, y·H/h, b), floor division — fully
    * deterministic across JVMs (no Graphics2D antialiasing/dither). */
  def resamplePixels(px: Array[Byte], srcW: Int, srcH: Int, bands: Int,
      w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * bands)
    var i = 0
    var y = 0
    while (y < h) {
      val sy = y * srcH / h
      var x = 0
      while (x < w) {
        val sx = x * srcW / w
        val base = (sy * srcW + sx) * bands
        var b = 0
        while (b < bands) { out(i) = px(base + b); i += 1; b += 1 }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real image resize: decode via [[decodeImage]], nearest-neighbour
    * resample to w×h. None for undecodable payloads. The resample's unit
    * is the PIXEL: its "bands" argument is the canonical bytes-per-pixel
    * (bands × bytes-per-sample), so >8-bit rasters keep their multi-byte
    * samples intact through the copy. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decodeImage(payload).map { case (sw, sh, _, px) =>
      resamplePixels(px, sw, sh, px.length / (sw * sh), w, h)
    }

  /** Batched real resize over (id, payload) → (id, thumb BINARY of
    * w·h·bands raw samples, null when undecodable). */
  def resizeImages(df: DataFrame, idCol: String, payloadCol: String,
      w: Int = 16, h: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, resizeImage(p, w, h).orNull) })
      .toDF("id", "thumb")
  }

  // ---- deterministic image fixtures (gate + spec inputs) -------------------

  /** Deterministic pixel fixture: w·h·channels canonical bytes derived
    * from a seed string (shared by the PNG generator and the gate's
    * expected-value computation, which never touches a codec). */
  def syntheticPixels(seed: String, w: Int, h: Int, channels: Int): Array[Byte] = {
    val src = seed.getBytes("UTF-8")
    require(src.nonEmpty, "syntheticPixels needs a non-empty seed")
    val out = new Array[Byte](w * h * channels)
    var i = 0
    while (i < out.length) {
      out(i) = src(((i * 31) + 7) % src.length); i += 1
    }
    out
  }

  /** Encode the [[syntheticPixels]] fixture as a real PNG via ImageIO
    * (grayscale for channels = 1, RGB for channels = 3) — raw raster
    * samples are set with `Raster.setSample`, so the lossless round-trip
    * through [[decodeImage]] reproduces them byte-for-byte. */
  def syntheticImagePng(seed: String, w: Int, h: Int, channels: Int): Array[Byte] =
    pngFromPixels(syntheticPixels(seed, w, h, channels), w, h, channels)

  /** A rescaled TWIN of the [[syntheticPixels]] fixture, as a real PNG:
    * the base pixels nearest-neighbour-upscaled by `factor` and encoded.
    * Because both the upscale and [[dHash]]'s 9×8 downsample are floor
    * nearest-neighbour, floor(floor(x·f·W/9)/f) = floor(x·W/9) — the twin
    * resamples back to the base's exact gray grid, so its dHash EQUALS the
    * base image's (the planted-duplicate fixture for the image near-dup
    * gate). */
  def syntheticTwinPng(
      seed: String, w: Int, h: Int, channels: Int, factor: Int = 2): Array[Byte] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val base = syntheticPixels(seed, w, h, channels)
    pngFromPixels(resamplePixels(base, w, h, channels, w * factor, h * factor),
      w * factor, h * factor, channels)
  }

  /** High-entropy deterministic pixel fixture for PERCEPTUAL-hash tests:
    * an md5 keystream (digest of "seed#block" per 16-byte block). The
    * low-entropy [[syntheticPixels]] is fine for lossless round-trip gates
    * but useless for dHash fixtures — its bytes cycle through the seed
    * string, so the gradient-SIGN pattern is set by the cycle layout and
    * distinct seeds collide to the same dHash. md5 bytes make each
    * gradient sign an independent coin flip, so distinct fixtures land
    * ~32 bits apart (far outside the radius-3 near-dup gate). */
  def noisePixels(seed: String, w: Int, h: Int, channels: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * channels)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    var block = 0
    while (i < out.length) {
      val d = md.digest((seed + "#" + block).getBytes("UTF-8"))
      var k = 0
      while (k < 16 && i < out.length) { out(i) = d(k); i += 1; k += 1 }
      block += 1
    }
    out
  }

  /** [[noisePixels]] encoded as a real PNG — the base fixture for the
    * image near-dup gate. */
  def noisePng(seed: String, w: Int, h: Int, channels: Int): Array[Byte] =
    pngFromPixels(noisePixels(seed, w, h, channels), w, h, channels)

  /** Rescaled twin of [[noisePng]] (same floor-nesting identity as
    * [[syntheticTwinPng]]): a different PNG bitstream whose dHash provably
    * equals the base's. */
  def noiseTwinPng(
      seed: String, w: Int, h: Int, channels: Int, factor: Int = 2): Array[Byte] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val base = noisePixels(seed, w, h, channels)
    pngFromPixels(resamplePixels(base, w, h, channels, w * factor, h * factor),
      w * factor, h * factor, channels)
  }

  /** Encode canonical 8-bit pixels (row-major, band-interleaved) as a real
    * PNG via ImageIO — the shared encoder behind the synthetic fixtures. */
  def pngFromPixels(px: Array[Byte], w: Int, h: Int, channels: Int): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels must be 1 or 3, got $channels")
    require(px.length == w * h * channels,
      s"pixel buffer ${px.length} != $w*$h*$channels")
    val imgType =
      if (channels == 1) BufferedImage.TYPE_BYTE_GRAY
      else BufferedImage.TYPE_3BYTE_BGR
    val img = new BufferedImage(w, h, imgType)
    val r = img.getRaster
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < channels) {
          r.setSample(x, y, b, px(i) & 0xff); i += 1; b += 1
        }
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---- perceptual hash + image near-dup dedup -------------------------------

  /** 64-bit difference hash (dHash — the standard perceptual image
    * fingerprint: Krawetz 2013, "Kind of Like That"): decode, resample the
    * canonical raster to a 9×8 gray grid (nearest-neighbour, floor), set
    * bit y·8+x iff gray(x+1, y) > gray(x, y). Gray is the integer mean of
    * the per-band sample values (big-endian multi-byte samples included),
    * so the whole pipeline — decode, resample, gradient — is pure integer
    * math: the hash is deterministic across JVMs and invariant to
    * container format (PNG vs BMP of the same pixels hash equal) and to
    * nearest-neighbour rescaling that preserves the 9×8 grid (see
    * [[syntheticTwinPng]]). None for undecodable payloads (F4 posture). */
  def dHash(payload: Array[Byte]): Option[Long] =
    decodeImage(payload).map { case (w, h, nb, px) =>
      val bytesPer = px.length / (w * h * nb)
      val pixelBytes = nb * bytesPer
      val thumb = resamplePixels(px, w, h, pixelBytes, 9, 8)
      def gray(x: Int, y: Int): Long = {
        val base = (y * 9 + x) * pixelBytes
        var s = 0L
        var b = 0
        while (b < nb) {
          var v = 0L
          var k = 0
          while (k < bytesPer) {
            v = (v << 8) | (thumb(base + b * bytesPer + k) & 0xffL); k += 1
          }
          s += v
          b += 1
        }
        s / nb
      }
      var hash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (gray(x + 1, y) > gray(x, y)) hash |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      hash
    }

  /** Batched [[dHash]] over (id BIGINT, payload BINARY) → (id, dhash
    * BIGINT, null when undecodable). Partition-parallel, no shuffle. */
  def imageDHashes(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, dHash(p).map(java.lang.Long.valueOf).orNull)
      })
      .toDF("id", "dhash")
  }

  /** Image near-duplicate pairs by banded dHash Hamming join — the image
    * twin of SimHash text near-dup, sharing its candidate-generation
    * kernel ([[Dedup.hamming64Pairs]]: pigeonhole-banded self-join, exact
    * popcount verification, recall 1 within the radius at any
    * maxHamming 0..63). Undecodable payloads are excluded (no hash to
    * band). Output: (id_a, id_b, hamming INT), id_a < id_b.
    *
    * Scale shape: candidates-only verification — the only shuffle is the
    * (band, band_value) self-join key; no all-pairs anywhere; the hashes
    * are 8-byte scalars (never rasters) on the wire. */
  def imageNearDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 3): DataFrame =
    Dedup.hamming64Pairs(
      imageDHashes(df, idCol, payloadCol).where(col("dhash").isNotNull),
      "id", "dhash", maxHamming)

  /** Image near-dup canonicalization — "keep one copy per perceptual
    * cluster", the image twin of [[Dedup.nearDupCanonical]] with the same
    * output contract: (id, canonical_id, is_canonical). Pairs → connected
    * components → min id per component; images with no near-dup (and
    * undecodable payloads) are their own canonical. */
  def imageNearDupCanonical(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 3,
      maxIters: Int = 10): DataFrame = {
    val pairs = imageNearDupPairs(df, idCol, payloadCol, maxHamming)
      .select("id_a", "id_b")
    val labels = Dedup.connectedMinLabels(pairs, maxIters)
    df.select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("label"), col("id")).as("canonical_id"),
        (coalesce(col("label"), col("id")) === col("id")).as("is_canonical"))
  }

  // ---- real audio decode (javax.sound.sampled) -----------------------------

  case class AudioDecoded(
      id: Long,
      sample_rate: Option[Int],
      channels: Option[Int],
      bits: Option[Int],
      n_frames: Option[Long],
      pcm_md5: Option[String],
      energies: Option[Array[Long]])

  /** Decode one audio payload → (sampleRate, channels, bitsPerSample,
    * frames, canonical PCM bytes). The JDK's own `javax.sound.sampled`
    * readers handle WAV/AIFF/AU PCM — the audio analogue of the ImageIO
    * image path, zero external dependencies. Canonical PCM order:
    * frame-major, channel-interleaved, each sample SIGNED BIG-ENDIAN over
    * its container byte width — so the same samples as WAV (little-endian)
    * or AIFF (big-endian) canonicalize to identical bytes and `pcm_md5`
    * is container-format-invariant, exactly like the image raster hash.
    * Only PCM_SIGNED payloads decode (compressed/float encodings would
    * need a codec the JDK lacks); anything else is None (F4 posture). */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Int, Long, Array[Byte])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        val bytesPer = (f.getSampleSizeInBits + 7) / 8
        if (f.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            f.getFrameSize != bytesPer * f.getChannels) None
        else {
          val raw = ais.readAllBytes()
          val canon =
            if (f.isBigEndian || bytesPer == 1) raw
            else { // swap each sample's bytes to big-endian in place
              val out = new Array[Byte](raw.length)
              var o = 0
              while (o + bytesPer <= raw.length) {
                var k = 0
                while (k < bytesPer) {
                  out(o + k) = raw(o + bytesPer - 1 - k); k += 1
                }
                o += bytesPer
              }
              out
            }
          Some((f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits,
            (canon.length / (bytesPer * f.getChannels)).toLong, canon))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Per-window energy over canonical PCM: for each window of
    * `windowFrames` frames, Σ |sample| across frames and channels — pure
    * integer math over the signed big-endian samples, so the vector is
    * byte-exact deterministic (the audio twin of the image dHash's
    * integer-only posture). The trailing partial window counts. */
  def pcmEnergyWindows(
      canon: Array[Byte], channels: Int, bytesPer: Int,
      windowFrames: Int): Array[Long] = {
    require(windowFrames > 0, s"windowFrames must be positive, got $windowFrames")
    val frameBytes = channels * bytesPer
    val nFrames = canon.length / frameBytes
    val out = new Array[Long]((nFrames + windowFrames - 1) / windowFrames)
    var fr = 0
    while (fr < nFrames) {
      var s = 0L
      var o = fr * frameBytes
      val end = math.min(fr + windowFrames, nFrames) * frameBytes
      while (o < end) {
        var v = canon(o).toLong // sign-carrying high byte
        var k = 1
        while (k < bytesPer) { v = (v << 8) | (canon(o + k) & 0xffL); k += 1 }
        s += math.abs(v)
        o += bytesPer
      }
      out(fr / windowFrames) = s
      fr += windowFrames
    }
    out
  }

  /** Batched REAL audio decode over (id BIGINT, payload BINARY) →
    * (id, sample_rate, channels, bits, n_frames, pcm_md5, energies).
    * Partition-parallel, no shuffle; undecodable payloads yield null
    * metadata (F4). `energies` is the [[pcmEnergyWindows]] vector at
    * `energyWindowFrames` — the fixed-size-per-window feature a curation
    * pipeline clusters or thresholds on (silence/clipping detection). */
  def decodeAudios(
      df: DataFrame, idCol: String, payloadCol: String,
      energyWindowFrames: Int = 1024): Dataset[AudioDecoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        decodeAudio(payload) match {
          case Some((rate, ch, bits, frames, canon)) =>
            AudioDecoded(id, Some(rate), Some(ch), Some(bits), Some(frames),
              Some(md5Hex(canon)),
              Some(pcmEnergyWindows(canon, ch, (bits + 7) / 8,
                energyWindowFrames)))
          case None =>
            AudioDecoded(id, None, None, None, None, None, None)
        }
      })
  }

  // ---- deterministic audio fixtures (gate + spec inputs) -------------------

  /** Deterministic canonical PCM16 fixture: nFrames·channels signed
    * big-endian samples from the md5 keystream — [[noisePixels]] reused as
    * a pure keystream (nFrames × channels grid of 2-byte "bands"). */
  def syntheticPcm16(seed: String, nFrames: Int, channels: Int): Array[Byte] =
    noisePixels(seed, nFrames, channels, 2)

  /** Encode canonical PCM16 samples as a REAL container via the JDK's own
    * writers: WAV (little-endian) or AIFF (big-endian). Both are lossless
    * PCM, so decode(encode(samples)) reproduces the canonical bytes — and
    * the two containers of the same samples share one pcm_md5. */
  def pcm16Container(
      canon: Array[Byte], rate: Int, channels: Int,
      aiff: Boolean = false): Array[Byte] = {
    require(canon.length % (2 * channels) == 0,
      s"canonical PCM16 length ${canon.length} not a multiple of frame size")
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, channels, true, aiff) // signed; AIFF is big-endian
    val data =
      if (aiff) canon
      else { // container wants little-endian: swap each sample's two bytes
        val out = new Array[Byte](canon.length)
        var o = 0
        while (o + 1 < canon.length) {
          out(o) = canon(o + 1); out(o + 1) = canon(o); o += 2
        }
        out
      }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt,
      canon.length / (2 * channels))
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      if (aiff) javax.sound.sampled.AudioFileFormat.Type.AIFF
      else javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ---- opaque-payload featurizer (codec-less fallback) ---------------------

  /** Byte-level featurizer for payloads with no in-JDK codec (audio/video
    * containers): byte histogram → 16-bucket L1-normalized feature vector,
    * "frames" as fixed-stride offsets. A real deterministic computation,
    * explicitly NOT a media decode — swap an FFI codec into the same seam
    * for production audio/video. */
  private def byteFeatures(payload: Array[Byte]): (MediaMeta, Array[Float]) = {
    val hist = new Array[Int](256)
    payload.foreach(b => hist(b & 0xff) += 1)
    val distinct = hist.count(_ > 0)
    val nFrames = payload.length / FrameStride + 1
    val feat = new Array[Float](16)
    var i = 0
    while (i < 256) { feat(i / 16) += hist(i); i += 1 }
    val total = math.max(1.0f, payload.length.toFloat)
    (0 until 16).foreach(j => feat(j) /= total)
    (MediaMeta(payload.length, distinct, nFrames), feat)
  }

  /** Batched byte-level featurization over (id BIGINT, payload BINARY).
    * Partition-parallel; one task per input split, no shuffle. */
  def decode(df: DataFrame, idCol: String, payloadCol: String): Dataset[DecodedDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init hook (an FFI codec would be set up here)
        it.map { case (id, payload) =>
          val (meta, feat) = byteFeatures(payload)
          DecodedDoc(id, meta.n_bytes, meta.n_distinct_bytes, meta.n_frames, feat)
        }
      }
  }

  /** Byte-grid resample for OPAQUE payloads (no codec): nearest-neighbour
    * sample of the raw bytes onto a w·h grid — keeps a fixed-size BINARY
    * contract for codec-less media; use [[resizeImages]] for real images. */
  def resizeOpaque(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (payload.isEmpty) return out
    var i = 0
    while (i < out.length) {
      out(i) = payload((i.toLong * payload.length / out.length).toInt)
      i += 1
    }
    out
  }

  /** Batched opaque-payload resample over (id, payload) — (id, thumb
    * BINARY(w·h)). */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
      w: Int = 16, h: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, resizeOpaque(p, w, h)) })
      .toDF("id", "thumb")
  }

  /** Frame sampling metadata only (cheap path; still batched). */
  def frameMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    decode(df, idCol, payloadCol)
      .toDF()
      .select(col("id"), col("n_bytes"), col("n_distinct_bytes"), col("n_frames"))
}
