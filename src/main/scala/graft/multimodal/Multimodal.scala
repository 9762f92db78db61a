package graft.multimodal

import graft.etl.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decoded image: header fields plus the pixel array in top-down row
  * order (top-level — Spark Encoders cannot derive nested case classes). */
case class BmpImage(width: Int, height: Int, bitsPerPixel: Int, pixels: Array[Byte])

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed by batch-shaped partition functions — the Spark-side
  * skeleton of an image/audio/video pipeline.
  *
  * The decode step is a REAL format parse: payloads are valid 8-bit
  * grayscale BMP images (BITMAPFILEHEADER + BITMAPINFOHEADER + 256-entry
  * palette + bottom-up, 4-byte-aligned pixel rows), built by
  * [[Multimodal.encodeBmpGray]] with document bytes as pixel data, and
  * [[Multimodal.decodeBmpGray]] validates the magic/compression/bpp and
  * extracts dimensions + pixels exactly as an image library would read the
  * header. Heavier codecs (JPEG, audio resampling, video frame sampling)
  * would slot into the same seam: no codec libraries exist in this
  * environment, but the decode contract, the mapPartitions batch shape
  * (iterator-in/iterator-out, per-partition setup amortization), and the
  * failure mode (malformed payload → IllegalArgumentException) are real
  * and tested.
  *
  * Scale notes (100 TB): payloads never enter a shuffle — decode +
  * feature extraction is a narrow mapPartitions over the scan, and
  * downstream joins/groupBys carry only the fixed-width feature vector +
  * metadata.
  */
object Multimodal {

  val FeatureDim = 16

  /** Fixed image width for the synthetic BMP payloads (a multiple of 4, so
    * rows need no padding on encode; decode still honors the general
    * 4-byte stride). */
  val BmpWidth = 64

  private val HeaderSize = 14 + 40 + 256 * 4 // file header + info header + palette

  /** Build a REAL 8-bit grayscale BMP whose pixel data is `data` (padded
    * with zeros to fill the last row), rows stored bottom-up per the spec.
    * Any positive `w`: rows are written at the spec's 4-byte-aligned
    * stride (zero padding), which the decoder already drops — so
    * decode→resize→re-encode round-trips for ANY width, e.g. the odd
    * widths `resizeHalf` produces from non-multiple-of-8 sources. */
  def encodeBmpGray(data: Array[Byte], w: Int = BmpWidth): Array[Byte] = {
    require(w > 0, s"width must be positive, got $w")
    val stride = ((w + 3) / 4) * 4
    val h = math.max(1, (data.length + w - 1) / w)
    val out = new Array[Byte](HeaderSize + stride * h)
    def putI16(p: Int, v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >>> 8).toByte
    }
    def putI32(p: Int, v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >>> 8).toByte
      out(p + 2) = (v >>> 16).toByte; out(p + 3) = (v >>> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putI32(2, out.length) // file size
    putI32(10, HeaderSize) // pixel array offset
    putI32(14, 40) // BITMAPINFOHEADER size
    putI32(18, w)
    putI32(22, h)
    putI16(26, 1) // planes
    putI16(28, 8) // bits per pixel
    putI32(30, 0) // BI_RGB, uncompressed
    putI32(34, stride * h) // image size
    putI32(46, 256) // palette entries
    var i = 0
    while (i < 256) { // grayscale palette: entry i = (B=i, G=i, R=i, 0)
      val p = 54 + i * 4
      out(p) = i.toByte; out(p + 1) = i.toByte; out(p + 2) = i.toByte
      i += 1
    }
    var row = 0
    while (row < h) {
      val src = row * w
      val n = math.min(w, data.length - src)
      if (n > 0) System.arraycopy(data, src, out, HeaderSize + (h - 1 - row) * stride, n)
      row += 1
    }
    out
  }

  /** Parse an 8-bit uncompressed BMP: validate magic/bpp/compression, read
    * the little-endian header fields, and return dimensions + pixels in
    * top-down order (rows re-flipped, stride padding dropped). Malformed
    * payloads raise IllegalArgumentException — the per-record failure a
    * production decode stage routes to a quarantine sink. */
  def decodeBmpGray(bmp: Array[Byte]): BmpImage = {
    def u16(p: Int): Int = (bmp(p) & 0xFF) | ((bmp(p + 1) & 0xFF) << 8)
    def i32(p: Int): Int = (bmp(p) & 0xFF) | ((bmp(p + 1) & 0xFF) << 8) |
      ((bmp(p + 2) & 0xFF) << 16) | ((bmp(p + 3) & 0xFF) << 24)
    if (bmp.length < 54 || bmp(0) != 'B' || bmp(1) != 'M')
      throw new IllegalArgumentException("not a BMP payload (bad magic)")
    val offset = i32(10)
    val w = i32(18)
    val h = i32(22)
    val bpp = u16(28)
    val compression = i32(30)
    if (w <= 0 || h <= 0 || bpp != 8 || compression != 0)
      throw new IllegalArgumentException(
        s"unsupported BMP: ${w}x$h bpp=$bpp compression=$compression")
    val stride = ((w + 3) / 4) * 4 // rows are 4-byte aligned in the file
    if (offset < 54 || offset.toLong + h.toLong * stride > bmp.length)
      throw new IllegalArgumentException(
        "truncated BMP pixel array or malformed pixel offset")
    val pixels = new Array[Byte](w * h)
    var row = 0
    while (row < h) {
      System.arraycopy(bmp, offset + (h - 1 - row) * stride, pixels, row * w, w)
      row += 1
    }
    BmpImage(w, h, bpp, pixels)
  }

  /** 16-bin byte histogram over decoded pixels, L1-normalized — the
    * stand-in for an embedding model applied to the decoded image. */
  private[graft] def histogram(pixels: Array[Byte]): Array[Float] = {
    val counts = new Array[Int](FeatureDim)
    var i = 0
    while (i < pixels.length) {
      counts((pixels(i) & 0xFF) % FeatureDim) += 1
      i += 1
    }
    val n = math.max(1, pixels.length).toFloat
    counts.map(_ / n)
  }

  /** 2× box downsample: each output pixel is the integer mean of its 2×2
    * source block (edge blocks clamp to the pixels that exist, so odd
    * dimensions lose no rows/columns). Integer sum/count division keeps
    * the result bit-exact across platforms — no float resampling kernel
    * to disagree about. */
  def resizeHalf(img: BmpImage): BmpImage = {
    val nw = math.max(1, img.width / 2)
    val nh = math.max(1, img.height / 2)
    val out = new Array[Byte](nw * nh)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        var sum = 0
        var cnt = 0
        var dy = 0
        while (dy < 2) {
          val sy = y * 2 + dy
          if (sy < img.height) {
            var dx = 0
            while (dx < 2) {
              val sx = x * 2 + dx
              if (sx < img.width) {
                sum += img.pixels(sy * img.width + sx) & 0xFF
                cnt += 1
              }
              dx += 1
            }
          }
          dy += 1
        }
        out(y * nw + x) = (sum / cnt).toByte
        x += 1
      }
      y += 1
    }
    BmpImage(nw, nh, 8, out)
  }

  /** Metadata-only media table: payload = UTF-8 bytes of `text` standing in
    * for an arbitrary blob (qmm_meta hashes/measures it without decoding —
    * mime-agnostic by design). */
  def media(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("n_chars").as("n_bytes"),
        col("lang").as("source_lang"),
        col("source").as("origin")).as("meta"))

  /** Image media table: each document's bytes wrapped into a real grayscale
    * BMP (the encode would be the ingest step of an image pipeline). Built
    * via mapPartitions for the same batch shape the decoder uses. */
  def mediaBmp(spark: SparkSession, sfDir: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"),
        col("n_chars"), col("lang"), col("source"))
      .as[(Long, Array[Byte], Long, String, String)]
      .mapPartitions(_.map { case (id, raw, nChars, lang, source) =>
        (id, "image/bmp", encodeBmpGray(raw), nChars, lang, source)
      })
      .toDF("media_id", "mime", "payload", "n_bytes", "source_lang", "origin")
      .select(col("media_id"), col("mime"), col("payload"),
        struct(col("n_bytes"), col("source_lang"), col("origin")).as("meta"))
  }

  /** Batch decode + feature extraction over the binary payload via
    * mapPartitions — iterator in/out so a real decoder amortizes per-batch
    * setup (codec contexts, model load) across the partition. Parses the
    * BMP header for real ([[decodeBmpGray]]) and features the pixel data. */
  def decodeFeatures(spark: SparkSession, mediaDf: DataFrame): DataFrame = {
    val sp = spark
    import sp.implicits._
    val feats = mediaDf.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup for a heavier codec would go here
        rows.map { case (id, payload) =>
          val img = decodeBmpGray(payload)
          val f = histogram(img.pixels)
          val argmax = f.indices.maxBy(i => (f(i), -i)) // ties → lowest index
          (id, img.width, img.height, f, argmax)
        }
      }
      .toDF("media_id", "width", "height", "features", "dominant_bucket")
    mediaDf.select(col("media_id"), col("meta"))
      .join(feats, "media_id")
  }

  /** Tiny multi-frame container for the frame-sampling path: magic "GVID",
    * u32 frame count, u32 per-frame byte size, then `n` equal-size BMP
    * frames back-to-back — the minimal stand-in for a video container
    * (every real one also prefixes frame geometry and lets a reader seek
    * `header + i·frameSize` without decoding predecessors). Frame `f`'s
    * pixels are the base bytes brightness-shifted by `(f·7) mod 256`, so
    * frames differ deterministically and frame 0 IS the base image. */
  def encodeVideoGray(data: Array[Byte], nFrames: Int): Array[Byte] = {
    require(nFrames > 0, s"frame count must be positive, got $nFrames")
    val frames = (0 until nFrames).map { f =>
      encodeBmpGray(data.map(b => (((b & 0xFF) + f * 7) % 256).toByte))
    }
    val frameSize = frames.head.length
    val out = new Array[Byte](12 + frameSize * nFrames)
    out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'
    def putI32(p: Int, v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >>> 8).toByte
      out(p + 2) = (v >>> 16).toByte; out(p + 3) = (v >>> 24).toByte
    }
    putI32(4, nFrames)
    putI32(8, frameSize)
    frames.zipWithIndex.foreach { case (fr, i) =>
      System.arraycopy(fr, 0, out, 12 + i * frameSize, frameSize)
    }
    out
  }

  /** Seek-and-decode every `stride`-th frame (0, stride, 2·stride, …) —
    * the frame-sampling read pattern: the container header gives direct
    * offsets, so skipped frames are never decoded (for a real codec with
    * keyframes the same seam samples at I-frame granularity). Malformed
    * magic/geometry raises, as in [[decodeBmpGray]]. */
  def sampleFrames(video: Array[Byte], stride: Int): Seq[(Int, BmpImage)] = {
    require(stride > 0, s"stride must be positive, got $stride")
    def i32(p: Int): Int = (video(p) & 0xFF) | ((video(p + 1) & 0xFF) << 8) |
      ((video(p + 2) & 0xFF) << 16) | ((video(p + 3) & 0xFF) << 24)
    if (video.length < 12 || video(0) != 'G' || video(1) != 'V' ||
      video(2) != 'I' || video(3) != 'D')
      throw new IllegalArgumentException("not a GVID payload (bad magic)")
    val n = i32(4)
    val frameSize = i32(8)
    if (n <= 0 || frameSize <= 0 || 12L + n.toLong * frameSize > video.length)
      throw new IllegalArgumentException("truncated GVID frame data")
    (0 until n by stride).map { i =>
      i -> decodeBmpGray(java.util.Arrays.copyOfRange(video, 12 + i * frameSize,
        12 + (i + 1) * frameSize))
    }
  }

  private val qmmMeta = QueryDef(
    "qmm_meta",
    build = (spark, sfDir) =>
      media(spark, sfDir)
        .select(
          col("media_id"),
          col("mime"),
          length(col("payload")).cast(LongType).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("meta.source_lang").as("source_lang"))
        .orderBy(col("media_id")),
    oracle = Some(
      // DuckDB md5 is VARCHAR-only; hashing the text hashes the same UTF-8
      // bytes Spark's encode() produced.
      "SELECT doc_id AS media_id, 'text/plain' AS mime, " +
        "CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, " +
        "md5(text) AS payload_md5, lang AS source_lang " +
        "FROM documents ORDER BY media_id"))

  /** No oracle: the mapPartitions decode is not SQL-expressible. Decode
    * correctness (header fields, pixel round-trip, malformed payloads) is
    * covered by MultimodalSpec; determinism by RegistrySpec's run-twice. */
  private val qmmFeatures = QueryDef(
    "qmm_features",
    build = (spark, sfDir) =>
      decodeFeatures(spark, mediaBmp(spark, sfDir))
        .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
          col("width"), col("height"),
          // list columns crash the harness's pandas row-sort even on the
          // rows-only (no-oracle) path — emit the vector as a joined string
          array_join(transform(col("features"), x => x.cast(StringType)), ",")
            .as("features"), col("dominant_bucket"))
        .orderBy(col("media_id")),
    oracle = None)

  /** No oracle: decode → resize → re-encode is not SQL-expressible. The
    * resize math (block means, edge clamping, round-trip through a second
    * decode) is covered by MultimodalSpec; determinism by RegistrySpec.
    * Batch shape: one narrow mapPartitions carries decode + resize +
    * re-encode together, so at 100 TB the payload is read once, never
    * shuffled, and the output row carries only the RESIZED payload's hash
    * + integer stats, not the payload. */
  private val qmmResize = QueryDef(
    "qmm_resize",
    build = (spark, sfDir) => {
      val sp = spark
      import sp.implicits._
      mediaBmp(spark, sfDir)
        .select(col("media_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.map { case (id, payload) =>
            val img = decodeBmpGray(payload)
            val half = resizeHalf(img)
            val re = encodeBmpGray(half.pixels, half.width)
            var sum = 0L
            var i = 0
            while (i < half.pixels.length) { sum += half.pixels(i) & 0xFF; i += 1 }
            (id, img.width, img.height, half.width, half.height, re, sum)
          }
        }
        .toDF("media_id", "width", "height", "new_width", "new_height", "resized", "pixel_sum")
        .select(col("media_id"), col("width"), col("height"),
          col("new_width"), col("new_height"),
          md5(col("resized")).as("resized_md5"), col("pixel_sum"))
        .orderBy(col("media_id"))
    },
    oracle = None)

  /** No oracle: container parse + frame decode is not SQL-expressible.
    * Frame-sampling semantics (header offsets, stride selection, frame-0
    * identity with the base image, brightness-shift means, malformed
    * magic) are covered by MultimodalSpec; determinism by RegistrySpec.
    * Batch shape: ONE narrow mapPartitions builds the container, seeks,
    * and decodes the sampled frames — at 100 TB the video payload is read
    * once where it lands and only (frame_idx, integer stats, md5) rows —
    * never frames — enter the shuffle for the output sort. */
  private val qmmFrames = QueryDef(
    "qmm_frames",
    build = (spark, sfDir) => {
      val sp = spark
      import sp.implicits._
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.flatMap { case (id, raw) =>
            val video = encodeVideoGray(raw, nFrames = 6)
            sampleFrames(video, stride = 2).map { case (idx, img) =>
              var sum = 0L
              var i = 0
              while (i < img.pixels.length) { sum += img.pixels(i) & 0xFF; i += 1 }
              (id, idx, img.width, img.height, sum / img.pixels.length,
                java.security.MessageDigest.getInstance("MD5")
                  .digest(img.pixels).map("%02x".format(_)).mkString)
            }
          }
        }
        .toDF("media_id", "frame_idx", "width", "height", "mean_pixel", "frame_md5")
        .orderBy(col("media_id"), col("frame_idx"))
    },
    oracle = None)

  /** Minimal PCM audio container: magic "GPCM", u32 LE sample count,
    * u32 LE sample rate, then `n` little-endian int16 samples — the
    * seek-friendly shape of a real PCM WAV data chunk. */
  def encodePcm(samples: Array[Short], rate: Int = 16000): Array[Byte] = {
    val out = new Array[Byte](12 + samples.length * 2)
    out(0) = 'G'; out(1) = 'P'; out(2) = 'C'; out(3) = 'M'
    def putI32(p: Int, v: Int): Unit = {
      out(p) = (v & 0xFF).toByte; out(p + 1) = ((v >> 8) & 0xFF).toByte
      out(p + 2) = ((v >> 16) & 0xFF).toByte; out(p + 3) = ((v >> 24) & 0xFF).toByte
    }
    putI32(4, samples.length)
    putI32(8, rate)
    var i = 0
    while (i < samples.length) {
      out(12 + i * 2) = (samples(i) & 0xFF).toByte
      out(12 + i * 2 + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  /** Parse [[encodePcm]]'s container; validates magic and length. */
  def decodePcm(pcm: Array[Byte]): (Int, Array[Short]) = {
    require(pcm.length >= 12 && pcm(0) == 'G' && pcm(1) == 'P' && pcm(2) == 'C' && pcm(3) == 'M',
      "decodePcm: bad magic")
    def i32(p: Int): Int = (pcm(p) & 0xFF) | ((pcm(p + 1) & 0xFF) << 8) |
      ((pcm(p + 2) & 0xFF) << 16) | ((pcm(p + 3) & 0xFF) << 24)
    val n = i32(4)
    val rate = i32(8)
    require(n >= 0 && pcm.length == 12 + n * 2, "decodePcm: truncated payload")
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      s(i) = ((pcm(12 + i * 2) & 0xFF) | (pcm(12 + i * 2 + 1) << 8)).toShort
      i += 1
    }
    (rate, s)
  }

  /** Per-doc synthetic int16 sample `i`: ((id·31 + i·17) mod 2¹⁶) − 2¹⁵ —
    * pure BIGINT arithmetic both engines can compute, which is what makes
    * qmm_audio the multimodal family's one ORACLE-CHECKED decode path. */
  def pcmSample(mediaId: Long, i: Int): Short =
    (((mediaId * 31 + i.toLong * 17) % 65536) - 32768).toShort

  /** Audio-frame energy analysis — the audio counterpart of qmm_features:
    * synthesize each doc's PCM payload (≤ 1200 samples, count from
    * n_chars), then decode it and aggregate per 256-sample window the
    * EXACT integer stats a VAD / loudness-normalization pass needs
    * (count, amplitude sum = DC offset, sum of squares = energy). Encode →
    * decode → window stats ride ONE narrow mapPartitions: the payload is
    * built and consumed in place, never shuffled — only (id, win, 3
    * BIGINTs) rows reach the output sort.
    *
    * UNLIKE the image/video decode paths this one IS oracle-checked: the
    * samples are a deterministic integer formula ([[pcmSample]]), so
    * DuckDB recomputes the identical windows from `generate_series`
    * without ever seeing the binary — pinning not just the plumbing but
    * the DECODED VALUES cross-engine (a corrupted encode/decode would
    * shift every sum). */
  private val qmmAudio = QueryDef(
    "qmm_audio",
    build = (spark, sfDir) => {
      val sp = spark
      import sp.implicits._
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), least(col("n_chars"), lit(1200L)).cast(IntegerType).as("n"))
        .as[(Long, Int)]
        .mapPartitions { rows =>
          rows.flatMap { case (id, n) =>
            val pcm = encodePcm(Array.tabulate(n)(i => pcmSample(id, i)))
            val (_, samples) = decodePcm(pcm)
            // Single pass into primitive per-window accumulators: the
            // groupBy(_ / 256) fold this replaces allocated a Map plus
            // index Seqs PER DOCUMENT, which at corpus scale was pure
            // constant-factor churn (the round-7 bench's one budget miss).
            val nWin = (samples.length + 255) / 256
            val cnt = new Array[Long](nWin)
            val amp = new Array[Long](nWin)
            val sq = new Array[Long](nWin)
            var i = 0
            while (i < samples.length) {
              val w = i >> 8
              val v = samples(i).toLong
              cnt(w) += 1L; amp(w) += v; sq(w) += v * v
              i += 1
            }
            (0 until nWin).map(w => (id, w.toLong, cnt(w), amp(w), sq(w)))
          }
        }
        .toDF("media_id", "win", "n_samples", "sum_amp", "sum_sq")
        .orderBy(col("media_id"), col("win"))
    },
    oracle = Some(
      "WITH d AS (SELECT doc_id AS media_id, CAST(least(n_chars, 1200) AS INTEGER) AS n FROM documents), " +
        "i AS (SELECT media_id, unnest(generate_series(0, n - 1)) AS idx FROM d WHERE n >= 1), " +
        "s AS (SELECT media_id, CAST(idx // 256 AS BIGINT) AS win, " +
        "((media_id * 31 + idx * 17) % 65536) - 32768 AS v FROM i) " +
        "SELECT media_id, win, CAST(count(*) AS BIGINT) AS n_samples, " +
        "CAST(sum(v) AS BIGINT) AS sum_amp, CAST(sum(v * v) AS BIGINT) AS sum_sq " +
        "FROM s GROUP BY media_id, win ORDER BY media_id, win"))

  /** Deterministic synthetic pixel for [[qmmPhash]] — the image analogue
    * of [[pcmSample]]: both engines can regenerate the pixel without the
    * binary. */
  def phashPixel(mediaId: Long, y: Int, x: Int): Int =
    ((mediaId * 7 + y.toLong * 13 + x.toLong * 5) % 256).toInt

  /** Perceptual average-hash (aHash) over a REAL encode→decode round trip —
    * the image-dedup primitive (near-identical crawl images collapse to
    * equal or Hamming-close hashes). Each doc synthesizes a 32×32 grayscale image
    * from the [[phashPixel]] integer formula, encodes it as a real BMP,
    * decodes it back, and computes the 8×8 block hash: bit(by,bx) = 1 iff
    * blockSum·64 > totalSum — all integer arithmetic, no mean rounding.
    * The 64 bits are emitted as two 32-bit halves (phash_lo = blocks
    * 0–31, phash_hi = 32–63; DuckDB rejects 1<<63, and split halves are
    * the standard SQL carry for 64-bit hashes) plus the popcount.
    *
    * Encode → decode → hash ride ONE narrow mapPartitions (payload never
    * shuffled); the oracle regenerates the pixels from `generate_series`
    * without seeing the binary — so a corrupted encode/decode (stride,
    * bottom-up flip, palette) shifts block sums and fails the hash match,
    * making this the image family's second oracle-checked decode path
    * after qmm_audio. */
  private val qmmPhash = QueryDef(
    "qmm_phash",
    build = (spark, sfDir) => {
      val sp = spark
      import sp.implicits._
      Tables.documents(spark, sfDir)
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions { rows =>
          rows.map { id =>
            val data = Array.tabulate(32 * 32) { i =>
              phashPixel(id, i / 32, i % 32).toByte
            }
            val img = decodeBmpGray(encodeBmpGray(data, w = 32))
            require(img.width == 32 && img.height == 32, s"bad round trip for $id")
            val px = img.pixels
            var total = 0L
            var i = 0
            while (i < px.length) { total += (px(i) & 0xFF); i += 1 }
            var lo = 0L; var hi = 0L; var ones = 0L
            var by = 0
            while (by < 8) {
              var bx = 0
              while (bx < 8) {
                var bsum = 0L
                var dy = 0
                while (dy < 4) {
                  var dx = 0
                  while (dx < 4) {
                    bsum += (px((by * 4 + dy) * 32 + (bx * 4 + dx)) & 0xFF)
                    dx += 1
                  }
                  dy += 1
                }
                if (bsum * 64 > total) {
                  val idx = by * 8 + bx
                  if (idx < 32) lo += 1L << idx else hi += 1L << (idx - 32)
                  ones += 1
                }
                bx += 1
              }
              by += 1
            }
            (id, lo, hi, ones)
          }
        }
        .toDF("media_id", "phash_lo", "phash_hi", "n_ones")
        .orderBy(col("media_id"))
    },
    oracle = Some(
      "WITH d AS (SELECT doc_id AS media_id FROM documents), " +
        "i AS (SELECT media_id, unnest(generate_series(0, 1023)) AS idx FROM d), " +
        "p AS (SELECT media_id, CAST(idx // 32 AS BIGINT) AS y, CAST(idx % 32 AS BIGINT) AS x, " +
        "(media_id * 7 + (idx // 32) * 13 + (idx % 32) * 5) % 256 AS v FROM i), " +
        "t AS (SELECT media_id, CAST(sum(v) AS BIGINT) AS total FROM p GROUP BY media_id), " +
        "b AS (SELECT media_id, CAST(y // 4 AS BIGINT) AS yb, CAST(x // 4 AS BIGINT) AS xb, " +
        "CAST(sum(v) AS BIGINT) AS bsum FROM p GROUP BY 1, 2, 3), " +
        "bits AS (SELECT b.media_id, yb * 8 + xb AS bi, " +
        "CASE WHEN bsum * 64 > total THEN 1 ELSE 0 END AS bit " +
        "FROM b JOIN t ON b.media_id = t.media_id) " +
        "SELECT media_id, " +
        "CAST(sum(CASE WHEN bi < 32 THEN bit * (CAST(1 AS BIGINT) << CAST(bi AS INTEGER)) ELSE 0 END) AS BIGINT) AS phash_lo, " +
        "CAST(sum(CASE WHEN bi >= 32 THEN bit * (CAST(1 AS BIGINT) << CAST(bi - 32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS phash_hi, " +
        "CAST(sum(bit) AS BIGINT) AS n_ones " +
        "FROM bits GROUP BY media_id ORDER BY media_id"))

  /** Pixel-intensity histogram over the REAL BMP encode→decode round
    * trip — the exposure/contrast audit an image-corpus pipeline runs
    * before training (dead-black, blown-white, or low-dynamic-range
    * images show up as collapsed bins): each doc's 32×32 grayscale
    * image rides the same [[phashPixel]] formula → [[encodeBmpGray]] →
    * [[decodeBmpGray]] path as qmm_phash, then the DECODED pixels are
    * bucketed into 16 intensity bins (v div 16, pure integer). The
    * oracle regenerates the pixels from `generate_series` without ever
    * seeing the binary. Honest coverage note: a histogram is
    * permutation-INVARIANT, so pixel-reordering corruption (the classic
    * bottom-up flip) passes it — qmm_phash's position-sensitive block
    * hash is what catches those; this path pins the VALUE distribution
    * (palette remaps, dropped/duplicated stride bytes shift bin counts
    * and fail the hash).
    *
    * Scale: encode → decode → 16-cell histogram in ONE narrow
    * mapPartitions; payloads never shuffle, output is 16·n_docs rows. */
  private val qmmHistogram = QueryDef(
    "qmm_histogram",
    build = (spark, sfDir) => {
      val sp = spark
      import sp.implicits._
      Tables.documents(spark, sfDir)
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions { rows =>
          rows.flatMap { id =>
            val data = Array.tabulate(32 * 32) { i =>
              phashPixel(id, i / 32, i % 32).toByte
            }
            val img = decodeBmpGray(encodeBmpGray(data, w = 32))
            require(img.width == 32 && img.height == 32, s"bad round trip for $id")
            val bins = new Array[Long](16)
            var i = 0
            while (i < img.pixels.length) {
              bins((img.pixels(i) & 0xFF) >> 4) += 1L
              i += 1
            }
            (0 until 16).filter(bins(_) > 0L).map(b => (id, b.toLong, bins(b)))
          }
        }
        .toDF("media_id", "bin", "n_px")
        .orderBy(col("media_id"), col("bin"))
    },
    oracle = Some(
      "WITH d AS (SELECT doc_id AS media_id FROM documents), " +
        "i AS (SELECT media_id, unnest(generate_series(0, 1023)) AS idx FROM d), " +
        "p AS (SELECT media_id, " +
        "((media_id * 7 + (idx // 32) * 13 + (idx % 32) * 5) % 256) // 16 AS bin FROM i) " +
        "SELECT media_id, CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_px " +
        "FROM p GROUP BY media_id, bin ORDER BY media_id, bin"))

  /** Silence / clipping audit over the decoded PCM stream — the audio
    * corpus-quality screen (dead microphones and clipped takes are the
    * two dominant discard reasons): per doc, counts of near-silent
    * (|v| < 1000) and near-clipped (|v| > 32000) samples plus the exact
    * amplitude extremes, all integer, from the same
    * [[pcmSample]] → [[encodePcm]] → [[decodePcm]] round trip as
    * qmm_audio — the audio family's second oracle-checked decode path
    * (windowed energy pins per-window sums; this pins the tails of the
    * amplitude distribution).
    *
    * Scale: one narrow mapPartitions, one output row per doc. */
  private val qmmSilence = QueryDef(
    "qmm_silence",
    build = (spark, sfDir) => {
      val sp = spark
      import sp.implicits._
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), least(col("n_chars"), lit(1200L)).cast(IntegerType).as("n"))
        .as[(Long, Int)]
        .mapPartitions { rows =>
          rows.flatMap { case (id, n) =>
            if (n < 1) None
            else {
              val pcm = encodePcm(Array.tabulate(n)(i => pcmSample(id, i)))
              val (_, samples) = decodePcm(pcm)
              var silent = 0L; var clipped = 0L
              var mn = Long.MaxValue; var mx = Long.MinValue
              var i = 0
              while (i < samples.length) {
                val v = samples(i).toLong
                val a = math.abs(v)
                if (a < 1000L) silent += 1L
                if (a > 32000L) clipped += 1L
                if (v < mn) mn = v
                if (v > mx) mx = v
                i += 1
              }
              Some((id, samples.length.toLong, silent, clipped, mn, mx))
            }
          }
        }
        .toDF("media_id", "n_samples", "n_silent", "n_clipped", "min_amp", "max_amp")
        .orderBy(col("media_id"))
    },
    oracle = Some(
      "WITH d AS (SELECT doc_id AS media_id, CAST(least(n_chars, 1200) AS INTEGER) AS n FROM documents), " +
        "i AS (SELECT media_id, unnest(generate_series(0, n - 1)) AS idx FROM d WHERE n >= 1), " +
        "s AS (SELECT media_id, ((media_id * 31 + idx * 17) % 65536) - 32768 AS v FROM i) " +
        "SELECT media_id, CAST(count(*) AS BIGINT) AS n_samples, " +
        "CAST(sum(CASE WHEN abs(v) < 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent, " +
        "CAST(sum(CASE WHEN abs(v) > 32000 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped, " +
        "CAST(min(v) AS BIGINT) AS min_amp, CAST(max(v) AS BIGINT) AS max_amp " +
        "FROM s GROUP BY media_id ORDER BY media_id"))

  def defs: Seq[QueryDef] =
    Seq(qmmMeta, qmmFeatures, qmmResize, qmmFrames, qmmAudio, qmmPhash,
      qmmHistogram, qmmSilence)
}
