package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column operators for training-data pipelines: image/audio/video
 * payloads as opaque `binary` columns with typed metadata, processed in
 * partition-sized batches.
 *
 * Image and audio decoding is REAL and in-JDK: `javax.imageio.ImageIO`
 * (png/jpeg/bmp/gif/wbmp readers ship with the JDK) and
 * `javax.sound.sampled.AudioSystem` (WAV/PCM). No external codec libraries
 * are required. Video has no JDK decoder, so its operator surface is the
 * metadata-driven frame-sampling PLAN (`frameSamplePlan`, pure Catalyst) —
 * the per-frame byte decode is the one documented non-goal.
 *
 * Scale shape: decode runs inside `mapPartitions` over streaming iterators
 * (no partition-wide materialization), so memory is bounded by
 * `spark.sql.files.maxPartitionBytes` + one payload, and a 100 TB media
 * table decodes embarrassingly parallel.
 */
object Multimodal {

  /** Typed metadata carried with every media payload. */
  case class MediaMeta(
      mediaType: String,   // "image" | "audio" | "video"
      format: String,      // container/codec, e.g. "png", "wav", "mp4"
      width: Int,          // image/video; 0 for audio
      height: Int,
      sampleRate: Int,     // audio; 0 otherwise
      durationMs: Long)    // audio/video; 0 for still images

  case class MediaRecord(id: Long, payload: Array[Byte], meta: MediaMeta)

  case class ImageFeatures(id: Long, width: Int, height: Int,
      channels: Int, meanLuma: Double, phash: Long)

  case class AudioFrames(id: Long, frameIdx: Int, startMs: Long, rms: Double)

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mediaType", StringType), StructField("format", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sampleRate", IntegerType), StructField("durationMs", LongType))))))

  // -------------------------------------------------------------------------
  // Codecs — real JDK decoders. Deterministic: same bytes → same features.
  // -------------------------------------------------------------------------
  object Codecs {

    /** Decode an image with the JDK's ImageIO and extract features in one
      * pixel pass: Rec.601 mean luma (normalized to [0,1]) and a 64-bit
      * average-hash (8×8 luma block grid, bit set where block > grid mean).
      * Returns None when the payload is not a decodable image. */
    def decodeImage(id: Long, payload: Array[Byte]): Option[ImageFeatures] = {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val channels = img.getColorModel.getNumComponents
        val blocks = new Array[Double](64)
        val counts = new Array[Int](64)
        var sum = 0.0
        var y = 0
        while (y < h) {
          val by = math.min(7, y * 8 / h)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = 0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            sum += luma
            val b = by * 8 + math.min(7, x * 8 / w)
            blocks(b) += luma; counts(b) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < 64) { if (counts(i) > 0) blocks(i) /= counts(i); i += 1 }
        val gridMean = blocks.sum / 64.0
        var ph = 0L
        i = 0
        while (i < 64) { if (blocks(i) > gridMean) ph |= (1L << i); i += 1 }
        Some(ImageFeatures(id, w, h, channels,
          sum / (w.toDouble * h) / 255.0, ph))
      }
    }

    /** Decode a WAV payload with javax.sound.sampled and window it into
      * `hopMs` frames: per frame, RMS of the channel-averaged normalized
      * samples. Supports the canonical 16-bit signed PCM WAV (either
      * endianness); throws on other encodings — the contract, not a fake. */
    def sampleAudio(payload: Array[Byte], hopMs: Long): Seq[(Long, Double)] = {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16,
          s"sampleAudio supports 16-bit PCM, got ${fmt.getSampleSizeInBits}-bit")
        val bytes = in.readAllBytes()
        val channels = fmt.getChannels
        val frameSize = fmt.getFrameSize
        val nFrames = bytes.length / frameSize
        val rate = fmt.getSampleRate.toDouble
        val hop = math.max(1, (rate * hopMs / 1000.0).toInt)
        val big = fmt.isBigEndian
        def sample(frame: Int, ch: Int): Double = {
          val o = frame * frameSize + ch * 2
          val s =
            if (big) ((bytes(o) << 8) | (bytes(o + 1) & 0xFF)).toShort
            else ((bytes(o + 1) << 8) | (bytes(o) & 0xFF)).toShort
          s / 32768.0
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
        var start = 0
        var idx = 0
        while (start < nFrames) {
          val end = math.min(start + hop, nFrames)
          var acc = 0.0
          var f = start
          while (f < end) {
            var s = 0.0
            var c = 0
            while (c < channels) { s += sample(f, c); c += 1 }
            s /= channels
            acc += s * s
            f += 1
          }
          out += ((idx * hopMs, math.sqrt(acc / (end - start))))
          start += hop
          idx += 1
        }
        out.toSeq
      } finally in.close()
    }

    /** Spectral fingerprint: per hop frame, the index of the candidate
      * frequency with the highest Goertzel power — the Shazam-family idea
      * reduced to its deterministic core (dominant-band sequences survive
      * amplitude scaling and additive noise where waveform bytes do not).
      * Same 16-bit-PCM decode contract as [[sampleAudio]]; frames shorter
      * than 2 samples are dropped. Returns one band index per frame. */
    def audioFingerprint(payload: Array[Byte], hopMs: Long,
                         bands: Seq[Double]): Seq[Int] = {
      require(bands.nonEmpty, "need candidate frequencies")
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16,
          s"audioFingerprint supports 16-bit PCM, got ${fmt.getSampleSizeInBits}-bit")
        val bytes = in.readAllBytes()
        val channels = fmt.getChannels
        val frameSize = fmt.getFrameSize
        val nFrames = bytes.length / frameSize
        val rate = fmt.getSampleRate.toDouble
        val hop = math.max(2, (rate * hopMs / 1000.0).toInt)
        val big = fmt.isBigEndian
        def sample(frame: Int): Double = {
          var s = 0.0; var c = 0
          while (c < channels) {
            val o = frame * frameSize + c * 2
            val v =
              if (big) ((bytes(o) << 8) | (bytes(o + 1) & 0xFF)).toShort
              else ((bytes(o + 1) << 8) | (bytes(o) & 0xFF)).toShort
            s += v / 32768.0; c += 1
          }
          s / channels
        }
        // Goertzel per band per frame: power at frequency f over the hop
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var start = 0
        while (start + 2 <= nFrames) {
          val end = math.min(start + hop, nFrames)
          var best = 0; var bestP = -1.0
          var bi = 0
          while (bi < bands.length) {
            val w = 2.0 * math.Pi * bands(bi) / rate
            val coeff = 2.0 * math.cos(w)
            var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
            var f = start
            while (f < end) {
              s0 = sample(f) + coeff * s1 - s2
              s2 = s1; s1 = s0
              f += 1
            }
            val p = s1 * s1 + s2 * s2 - coeff * s1 * s2
            if (p > bestP) { bestP = p; best = bi }
            bi += 1
          }
          out += best
          start += hop
        }
        out.toSeq
      } finally in.close()
    }

    /** DCT perceptual hash (pHash, the classic robust image fingerprint):
      * area-averaged 32×32 luma grid → 2D DCT-II → the 63 low-frequency
      * coefficients of the top-left 8×8 block (DC excluded — it carries
      * only global brightness) → bit set where the coefficient exceeds
      * their median. Sign-pattern-of-low-frequencies is what survives
      * re-encoding, resampling, and brightness/contrast scaling — the
      * transformations that defeat byte-exact and average-hash dedup.
      * O(32³) per image, deterministic: same pixels → same 64-bit hash.
      *
      * HASH VERSION NOTE: the r15 cell-iteration rewrite below changed
      * cell boundaries (floor(g·d/N) ranges instead of the old per-pixel
      * min(N−1, y·N/h) mapping) for ALL images, not just the w/h < 32
      * hole it fixed — pHash values persisted from pre-r15 rounds are
      * incomparable with current ones and need recomputation. */
    def dctPHash(payload: Array[Byte]): Option[Long] = {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val N = 32
        val w = img.getWidth; val h = img.getHeight
        val acc = Array.ofDim[Double](N, N)
        // box-average PER GRID CELL (iterate cells, not source pixels): the
        // source range [g·d/N, max(g·d/N + 1, (g+1)·d/N)) is never empty,
        // so an image narrower than the grid (w or h < N) cannot leave
        // zero-luma cells — an empty cell reads as black and drags the
        // low-frequency DCT toward an artifact of the GRID, not the image
        // (measured: a bilinear 0.5× downsample to 32×24 drifted 12 bits
        // under the pixel→cell mapping, 0–2 under this one)
        var gy = 0
        while (gy < N) {
          val y0 = gy * h / N; val y1 = math.max(y0 + 1, (gy + 1) * h / N)
          var gx = 0
          while (gx < N) {
            val x0 = gx * w / N; val x1 = math.max(x0 + 1, (gx + 1) * w / N)
            var s = 0.0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                s += 0.299 * ((rgb >> 16) & 0xFF) +
                  0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            acc(gy)(gx) = s / ((y1 - y0).toLong * (x1 - x0))
            gx += 1
          }
          gy += 1
        }
        val cos = Array.tabulate(8, N)((k, n) =>
          math.cos(math.Pi * (n + 0.5) * k / N))
        // rows then columns; only the first 8 frequencies are ever read
        val rowDct = Array.ofDim[Double](8, N)
        var u = 0
        while (u < 8) {
          var j = 0
          while (j < N) {
            var s = 0.0; var n = 0
            while (n < N) { s += acc(n)(j) * cos(u)(n); n += 1 }
            rowDct(u)(j) = s; j += 1
          }
          u += 1
        }
        val coef = new Array[Double](63)
        var idx = 0
        u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            if (u != 0 || v != 0) {
              var s = 0.0; var n = 0
              while (n < N) { s += rowDct(u)(n) * cos(v)(n); n += 1 }
              coef(idx) = s; idx += 1
            }
            v += 1
          }
          u += 1
        }
        val med = coef.sorted.apply(31)
        var ph = 0L; var b = 0
        while (b < 63) { if (coef(b) > med) ph |= (1L << b); b += 1 }
        Some(ph)
      }
    }

    /** Encode a deterministic RGB test pattern as a real PNG. */
    def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = (x * 7 + id * 31) & 0xFF
          val g = (y * 13 + id * 17) & 0xFF
          val b = ((x + y) * 5 + id * 43) & 0xFF
          img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | b.toInt)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Encode a deterministic sine tone as a real 16-bit mono PCM WAV. */
    def encodeWav(freqHz: Double, durationMs: Long, sampleRate: Int): Array[Byte] = {
      val n = (sampleRate * durationMs / 1000L).toInt
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = (math.sin(2 * math.Pi * freqHz * i / sampleRate) * 16384).toShort
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Decode + feature-extract images, batched per partition. Rows stream
    * through the iterator (no partition-wide materialization); undecodable
    * payloads are dropped (flatMap), not failed — corrupt media is a fact of
    * life in a 100 TB crawl. */
  def imageFeatures(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "image").mapPartitions { it =>
      it.flatMap(r => Codecs.decodeImage(r.id, r.payload))
    }
  }

  /** Per-audio spectral fingerprints: (id, fp = dominant-band sequence).
    * Decode batches per partition; non-audio and undecodable rows drop. */
  def audioFingerprints(media: Dataset[MediaRecord], hopMs: Long = 250L,
                        bands: Seq[Double] = (0 until 10).map(i => 220.0 + i * 110.0))
      : DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "audio").mapPartitions { it =>
      it.flatMap { r =>
        scala.util.Try(Codecs.audioFingerprint(r.payload, hopMs, bands))
          .toOption.map(fp => (r.id, fp))
      }
    }.toDF("id", "fp")
  }

  /** Spectral near-duplicate audio groups: exact match on the dominant-band
    * sequence (amplitude-invariant, noise-robust — the bytes differ, the
    * fingerprint doesn't). One hash groupBy on the sequence; smallest id
    * represents. Returns (id, rep). */
  def nearDupAudio(media: Dataset[MediaRecord], hopMs: Long = 250L): DataFrame = {
    val fp = audioFingerprints(media, hopMs)
    fp.groupBy(col("fp")).agg(min(col("id")).as("rep"),
        collect_list(col("id")).as("ids"))
      .select(explode(col("ids")).as("id"), col("rep"))
  }

  /** Per-image DCT perceptual hashes: (id, phash64). Decode batches per
    * partition like [[imageFeatures]]; undecodable payloads drop. */
  def imageDctHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "image").mapPartitions { it =>
      it.flatMap(r => Codecs.dctPHash(r.payload).map(h => (r.id, h)))
    }.toDF("id", "phash64")
  }

  /** Perceptual near-duplicate image clusters: pHash Hamming ≤ `maxHamming`
    * pairs → connected components. Candidate generation is the pigeonhole
    * band trick (maxHamming+1 bit-bands of the 64-bit hash — any pair
    * within the budget collides on at least one untouched band), so the
    * only join is an equi-join on (band, band_bits): no all-pairs product
    * at any corpus size, same shape as the SimHash text machinery.
    * Verification is a codegen'd `bit_count(xor)`. Returns (id, rep). */
  def nearDupImages(media: Dataset[MediaRecord], maxHamming: Int = 6): DataFrame =
    phashClusters(imageDctHashes(media).localCheckpoint(true), maxHamming)

  /** The clustering stage of [[nearDupImages]], factored over any
    * (id, phash64) frame so the pigeonhole machinery is gate-able without
    * an image decode in the loop (the oracle replays 64-bit integer math;
    * it cannot replay a PNG decoder): maxHamming+1 bit-bands — any pair
    * within the Hamming budget collides on at least one untouched band —
    * so the only join is an equi-join on (band, band_bits); verification
    * is a codegen'd `bit_count(xor)`; components via the shared WCC.
    * Returns (id, rep). */
  def phashClusters(hashes: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, "maxHamming out of range")
    val bands = maxHamming + 1
    val width = (64 + bands - 1) / bands
    val chunks = hashes.select(col("id"), col("phash64"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"i -> (phash64 >> (i * $width)) & ${(1L << math.min(width, 63)) - 1})")))
      .select(col("id"), col("phash64"), col("pos").as("band"), col("col").as("bits"))
    val cand = chunks.select(col("id").as("a"), col("phash64").as("ha"),
        col("band"), col("bits"))
      .join(chunks.select(col("id").as("b"), col("phash64").as("hb"),
        col("band"), col("bits")), Seq("band", "bits"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("hb")).distinct()
    val pairs = cand
      .filter(expr(s"bit_count(ha ^ hb) <= $maxHamming"))
      .select(col("a").as("src"), col("b").as("dst"),
        expr("CAST(bit_count(ha ^ hb) AS DOUBLE)").as("value"))
    Dedup.clustersFromPairs(hashes.select(col("id")), pairs)
  }

  /** Resize plan: pure-metadata transform (target dims + scale factor) — runs
    * entirely in Catalyst; the byte-level resample composes with
    * imageFeatures' decode batching. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.withColumn("scale",
      when(greatest(col("meta.width"), col("meta.height")) <= maxSide, lit(1.0))
        .otherwise(lit(maxSide) / greatest(col("meta.width"), col("meta.height")).cast("double")))
      .withColumn("target_width", ceil(col("meta.width") * col("scale")).cast("int"))
      .withColumn("target_height", ceil(col("meta.height") * col("scale")).cast("int"))

  /** Window audio payloads into hop frames: one row per frame with real
    * decoded RMS (16-bit PCM WAV via the JDK). */
  def audioFrames(media: Dataset[MediaRecord], hopMs: Long = 1000L): Dataset[AudioFrames] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "audio")
      .flatMap { r =>
        Codecs.sampleAudio(r.payload, hopMs).zipWithIndex.map {
          case ((startMs, rms), idx) => AudioFrames(r.id, idx, startMs, rms)
        }
      }
  }

  /** Frame-sampling PLAN for video: one row per scheduled frame timestamp,
    * derived from duration metadata only — pure Catalyst (sequence+explode),
    * no byte decode (the JDK has no video codec; the plan is the contract a
    * decode stage plugs into). */
  def frameSamplePlan(media: DataFrame, hopMs: Long = 1000L): DataFrame =
    media.filter(col("meta.mediaType") === "video")
      .select(col("id"),
        posexplode(sequence(lit(0L),
          greatest(((col("meta.durationMs") - 1) / hopMs).cast("long"), lit(0L)))))
      .select(col("id"), col("pos").cast("int").as("frameIdx"),
        (col("col") * hopMs).as("startMs"))

  /** Synthesize a deterministic media table with REAL payloads — PNG images
    * and PCM WAV audio encoded with the same JDK codecs — used by tests and
    * demos since the driver testdata carries no binaries. */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val mt = Seq("image", "audio", "video")((id % 3).toInt)
      mt match {
        case "image" =>
          val w = 64 + (id % 64).toInt; val h = 48 + (id % 16).toInt
          MediaRecord(id, Codecs.encodePng(id, w, h),
            MediaMeta("image", "png", w, h, 0, 0L))
        case "audio" =>
          val dur = 300L + (id % 5) * 200L
          MediaRecord(id, Codecs.encodeWav(220.0 + (id % 10) * 110.0, dur, 8000),
            MediaMeta("audio", "wav", 0, 0, 8000, dur))
        case _ =>
          // no JDK video codec: opaque payload + metadata (frameSamplePlan
          // consumes only the metadata)
          val payload = Array.tabulate[Byte](64)(i => ((id * 31 + i) & 0xFF).toByte)
          MediaRecord(id, payload, MediaMeta("video", "mp4", 1280, 720, 0, 2000L + (id % 8000)))
      }
    }
  }
}
