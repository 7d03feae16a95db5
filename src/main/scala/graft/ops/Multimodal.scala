package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extraction as batched per-partition transforms.
  *
  * Two tiers of decode:
  *   - REAL JDK codecs (no extra deps): PNG via `javax.imageio`, WAV/PCM
  *     via `javax.sound.sampled`, plus a length-prefixed multi-frame
  *     container for frame sampling ([[imageDecodeStats]],
  *     [[audioDecodeStats]], [[frameSampleStats]]) — payloads generated
  *     from a closed-form pixel/sample formula so a SQL oracle verifies
  *     the full encode→decode roundtrip without a codec.
  *   - the original byte-statistics stub ([[decodeBatchStub]]) kept as
  *     the seam demo for codecs the JDK lacks (JPEG2000, H.264, …).
  * Everything Spark-side — schema, batching, partition parallelism, the
  * mapPartitions seam where a codec library is invoked once per batch
  * rather than once per row — is real and tested in both tiers.
  */
object Multimodal {

  // ImageIO's stream cache defaults to FILE-backed: every ImageIO.read /
  // ImageIO.write through an InputStream/OutputStream creates (and
  // deletes) a temp cache file on disk. The per-frame payloads here are
  // KB-scale ByteArray streams, so the cache buys nothing — and at
  // local[32] the temp-file create/delete storm serializes 32 decode
  // tasks on the filesystem (the r18 driver measured
  // multimodal_frame_sample/video_temporal running ~3x SLOWER at 32
  // cores than at 8 — scaling ratios 0.35/0.37). Memory-backed cache
  // streams are bit-identical (PNG is lossless either way); this is a
  // pure contention fix. Process-wide JDK setting; initialized with the
  // object so every executor that touches a Multimodal closure gets it.
  javax.imageio.ImageIO.setUseCache(false)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false))), nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decoder: a real implementation would hand `payloads` (one batch,
    * not one row) to an image/audio codec. The fake derives `dim` floats
    * from byte statistics so tests are deterministic. Accumulation is in
    * double with a single final float rounding — an order-insensitive
    * result (double roundoff never crosses a float rounding boundary
    * here), which lets a SQL oracle reproduce the features exactly.
    */
  def decodeBatchStub(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
    payloads.map { bytes =>
      val acc = new Array[Double](dim)
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += (bytes(i) & 0xFF) / 255.0
        i += 1
      }
      val out = new Array[Float](dim)
      i = 0
      while (i < dim) { out(i) = acc(i).toFloat; i += 1 }
      out
    }

  /** Batched feature extraction over the binary column. Batches inside
    * each partition (batchSize rows per decoder call) — the shape a
    * Pandas-UDF/`mapInPandas` pipeline has in PySpark, here as
    * mapPartitions over grouped iterators: codec init once per partition,
    * vectorized calls per batch, streaming (never materializes a
    * partition).
    */
  def extractFeatures(media: DataFrame, dim: Int = 8, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload"), col("meta.mime").as("mime"))
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one decoder invocation per batch — the expensive-init seam
          val feats = decodeBatchStub(batch.map(_.getAs[Array[Byte]]("payload")), dim)
          batch.lazyZip(feats).map { (row, f) =>
            Row(row.getLong(0), row.getAs[Array[Byte]]("payload").length.toLong,
              row.getString(2), f)
          }
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /** Build a demo media table from the documents table (utf-8 bytes as the
    * "payload") — exercises the real binary-column path end-to-end.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/plain").as("mime"),
        lit(0).as("width"), lit(0).as("height")).as("meta"))

  // --------------------------------------------------------------------
  // REAL codecs (JDK-native, zero extra dependencies): PNG via
  // javax.imageio, WAV/PCM via javax.sound.sampled. The payloads are
  // generated deterministically from a closed-form pixel/sample formula,
  // so a SQL oracle can recompute every decoded statistic without a codec
  // — the roundtrip (encode → real compressed container → decode →
  // aggregate) is machine-verified end to end. PNG is lossless and
  // TYPE_BYTE_GRAY raster access bypasses color-space conversion, so the
  // recovered samples are bit-exact; WAV is uncompressed PCM.
  // --------------------------------------------------------------------

  /** Deterministic grayscale pixel for (id, x, y); range [0, 256). */
  def pixel(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Per-id image dims: a small mix of shapes so width/height are decoded,
    * not assumed. */
  def imgW(id: Long): Int = 16 + (id % 3).toInt * 4
  def imgH(id: Long): Int = 12 + (id % 2).toInt * 4

  /** Encode the deterministic pattern for `id` as a real PNG. */
  def makePng(id: Long): Array[Byte] = {
    val (w, h) = (imgW(id), imgH(id))
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, pixel(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded-image statistics: (width, height, sumGray, sumTopLeft) where
    * sumTopLeft sums the x < w/2, y < h/2 quadrant (the area-average
    * "resize" cell a 2× downsample would produce, scaled by its count). */
  def decodeImageStats(png: Array[Byte]): (Int, Int, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val r = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L; var tl = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = r.getSample(x, y, 0)
        sum += v
        if (x < w / 2 && y < h / 2) tl += v
        x += 1
      }
      y += 1
    }
    (w, h, sum, tl)
  }

  /** Nearest-neighbor resize of a decoded PNG raster to (ow, oh): output
    * pixel (x, y) samples source pixel (x·w/ow, y·h/oh) — integer
    * division, the standard NN mapping. Deterministic and lossless on the
    * sampled pixels, so the SQL oracle reproduces the ENTIRE resized
    * image from the closed-form generator; returns (sumResized) for the
    * aggregate surface.
    */
  def resizeSum(png: Array[Byte], ow: Int, oh: Int): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val r = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        sum += r.getSample(x * w / ow, sy, 0)
        x += 1
      }
      y += 1
    }
    sum
  }

  private val resizeStatSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("src_w", IntegerType, nullable = false),
    StructField("src_h", IntegerType, nullable = false),
    StructField("out_sum", LongType, nullable = false),
    StructField("out_mean", DoubleType, nullable = false)))

  /** Decode + nearest-neighbor resize stage (the thumbnail/preprocess
    * step of an image pipeline): same batched narrow mapPartitions seam
    * as [[imageDecodeStats]]; scan-bound at any corpus size.
    */
  def imageResizeStats(media: DataFrame, ow: Int, oh: Int,
                       batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { row =>
            val png = row.getAs[Array[Byte]](1)
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
            val s = resizeSum(png, ow, oh)
            Row(row.getLong(0), img.getWidth, img.getHeight, s,
              s.toDouble / (ow.toLong * oh))
          }
        }
      }
    spark.createDataFrame(out, resizeStatSchema)
  }

  /** Encode the deterministic pattern for `id` as a real JPEG — the LOSSY
    * branch of the codec seam (PNG exercises the lossless one). Explicit
    * quality 0.95: the pattern's mod-256 wraps are the adversarial
    * high-frequency case for a DCT codec, and the verdict bounds below are
    * calibrated against this writer setting.
    */
  def makeJpeg(id: Long): Array[Byte] = {
    val (w, h) = (imgW(id), imgH(id))
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, pixel(id, x, y)); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Decode a JPEG and compare against the closed-form pattern:
    * (width, height, meanAbsErr, maxAbsErr). Lossy decode means the
    * recovered samples are NOT bit-exact (unlike PNG), so correctness is a
    * tolerance verdict — the seeded-ANN pattern — not a hash match.
    */
  def jpegDecodeCompare(id: Long, jpeg: Array[Byte]): (Int, Int, Double, Int) = {
    val img0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    // normalize to single-band gray in case the decoder hands back RGB
    val img =
      if (img0.getRaster.getNumBands == 1) img0
      else {
        val g = new java.awt.image.BufferedImage(
          img0.getWidth, img0.getHeight, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val gg = g.createGraphics(); gg.drawImage(img0, 0, 0, null); gg.dispose(); g
      }
    val r = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    var sumErr = 0L; var maxErr = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val e = math.abs(r.getSample(x, y, 0) - pixel(id, x, y))
        sumErr += e
        if (e > maxErr) maxErr = e
        x += 1
      }
      y += 1
    }
    (w, h, sumErr.toDouble / (w.toLong * h), maxErr)
  }

  def jpegMedia(ids: DataFrame): DataFrame = encodeMedia(ids, makeJpeg)

  /** Verdict bounds for [[jpegDecodeStats]], calibrated on the quality-0.95
    * writer over the adversarial mod-wrap pattern (see JpegSpec, which
    * measures the actual error envelope and asserts headroom): DCT ringing
    * at a 255→0 wrap can push a single pixel tens of levels, but the mean
    * absolute error stays within a few levels.
    */
  val JpegMeanAbsErrBound = 8.0
  val JpegMaxAbsErrBound = 128

  private val jpegStatSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_ok", BooleanType, nullable = false),
    StructField("px_ok", BooleanType, nullable = false)))

  /** Decode stage for the lossy codec: same batched narrow mapPartitions
    * seam as [[imageDecodeStats]], but emitting tolerance VERDICTS
    * (dims are exact even under lossy compression; pixel values are
    * bounded-error). The oracle recomputes dims from the closed form and
    * asserts the verdicts are uniformly true.
    */
  def jpegDecodeStats(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { row =>
            val id = row.getLong(0)
            val (w, h, meanErr, maxErr) = jpegDecodeCompare(id, row.getAs[Array[Byte]](1))
            Row(id, w, h, meanErr <= JpegMeanAbsErrBound, maxErr <= JpegMaxAbsErrBound)
          }
        }
      }
    spark.createDataFrame(out, jpegStatSchema)
  }

  /** Deterministic 16-bit PCM sample for (id, i); range [-2048, 2047]. */
  def sample(id: Long, i: Int): Int = ((id * 131 + i * 17) % 4096).toInt - 2048
  def audioN(id: Long): Int = 800 + (id % 5).toInt * 100
  val AudioRate = 8000f

  /** Encode the deterministic samples for `id` as a real WAV container
    * (PCM_SIGNED, 16-bit little-endian, mono). */
  def makeWav(id: Long): Array[Byte] = {
    val n = audioN(id)
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sample(id, i)
      raw(i * 2) = (s & 0xFF).toByte
      raw(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, AudioRate, 16, 1, 2, AudioRate, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded-audio statistics: (nSamples, sampleRate, sumAbs). The WAV
    * header drives the format — nothing is assumed from the generator. */
  def decodeWavStats(wav: Array[Byte]): (Long, Int, Long) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"unexpected WAV format: $fmt")
    val raw = ais.readAllBytes()
    val n = raw.length / 2
    var sumAbs = 0L
    var i = 0
    while (i < n) {
      val s = ((raw(i * 2) & 0xFF) | (raw(i * 2 + 1).toInt << 8)).toShort.toInt
      sumAbs += math.abs(s)
      i += 1
    }
    (n.toLong, fmt.getSampleRate.toInt, sumAbs)
  }

  // --- trivial multi-frame container ("GFV1"): the JDK has no video
  // codec, so frames are real PNGs inside a length-prefixed container —
  // frame SAMPLING and per-frame DECODE are real; only inter-frame
  // compression is out of scope. Frame f of media id uses the pixel
  // pattern of id*1000 + f.
  def videoFrames(id: Long): Int = 3 + (id % 3).toInt

  def makeVideo(id: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(0x47465631) // "GFV1"
    val nf = videoFrames(id)
    out.writeInt(nf)
    var f = 0
    while (f < nf) {
      val png = makePng(id * 1000 + f)
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    bos.toByteArray
  }

  /** Sample every `stride`-th frame and decode it: Seq of
    * (frameIdx, width, height, sumGray). */
  def sampleFrames(video: Array[Byte], stride: Int): Seq[(Int, Int, Int, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(video))
    require(in.readInt() == 0x47465631, "bad container magic")
    val nf = in.readInt()
    (0 until nf).flatMap { f =>
      val len = in.readInt()
      val png = new Array[Byte](len)
      in.readFully(png)
      if (f % stride == 0) {
        val (w, h, sum, _) = decodeImageStats(png)
        Some((f, w, h, sum))
      } else None
    }
  }

  private val videoTemporalSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_cuts", LongType, nullable = false),
    StructField("is_static", BooleanType, nullable = false)))

  /** Video TEMPORAL quality — the video-corpus curation pass (drop
    * static clips, count scene cuts for sampling density): per video,
    * the number of frame boundaries whose mean-gray jump is ≥
    * `cutThresh` levels, and whether every boundary is a zero jump
    * (static). Frames may change dimensions, so the mean comparison
    * cross-multiplies EXACTLY — |sg_f·n_{f−1} − sg_{f−1}·n_f| vs
    * cutThresh·n_f·n_{f−1}, all BIGINT — no float ever forms. Real
    * container+PNG decode per video inside the batched seam; each
    * video's frame loop is bounded by its own frame count (the
    * sampleFrames shape), videos never shuffle.
    */
  def videoTemporalStats(media: DataFrame, cutThresh: Int = 8,
                         batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { row =>
            val frames = sampleFrames(row.getAs[Array[Byte]](1), stride = 1)
            var cuts = 0L
            var static = true
            var i = 1
            while (i < frames.size) {
              val (_, w0, h0, sg0) = frames(i - 1)
              val (_, w1, h1, sg1) = frames(i)
              val (n0, n1) = (w0.toLong * h0, w1.toLong * h1)
              val diff = math.abs(sg1 * n0 - sg0 * n1)
              if (diff != 0L) static = false
              if (diff >= cutThresh.toLong * n0 * n1) cuts += 1
              i += 1
            }
            Row(row.getLong(0), frames.size, cuts, static)
          }
        }
      }
    spark.createDataFrame(out, videoTemporalSchema)
  }

  private val imageStatSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_gray", DoubleType, nullable = false),
    StructField("mean_tl", DoubleType, nullable = false)))

  private val payloadSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Encode stage: ids → (media_id, payload) with a REAL binary container
    * per row. `make` runs in a narrow mapPartitions; the payload then
    * flows through the DataFrame as a genuine `binary` column. */
  private def encodeMedia(ids: DataFrame, make: Long => Array[Byte]): DataFrame = {
    val spark = ids.sparkSession
    val out = ids.select(col("media_id")).rdd.mapPartitions { it =>
      it.map { row => val id = row.getLong(0); Row(id, make(id)) }
    }
    spark.createDataFrame(out, payloadSchema)
  }

  def imageMedia(ids: DataFrame): DataFrame = encodeMedia(ids, makePng)
  def audioMedia(ids: DataFrame): DataFrame = encodeMedia(ids, makeWav)
  def videoMedia(ids: DataFrame): DataFrame = encodeMedia(ids, makeVideo)

  /** Image corpus WITH DUPLICATES: the pattern id is `media_id % patMod`,
    * so every residue class shares one byte-identical image — the fixture
    * for perceptual-hash dedup (a real image corpus has re-uploads and
    * re-encodes; here duplication is closed-form so the oracle knows the
    * ground truth). */
  def dupImageMedia(ids: DataFrame, patMod: Long): DataFrame =
    encodeMedia(ids, id => makePng(id % patMod))

  /** Difference-hash (dHash, the standard cheap perceptual image hash):
    * NN-downsample the decoded gray raster to a (gw × gh) grid — integer
    * sampling, no interpolation — then one bit per horizontal neighbor
    * pair: bit(gy·(gw−1)+gx) = 1 iff grid(gx+1, gy) > grid(gx, gy).
    * gw=9, gh=7 → 56 bits, inside a signed long (the 63-bit-safety
    * convention of SignBits/SimHash). NN sampling + integer compares are
    * EXACT, so the SQL oracle recomputes the hash from the closed-form
    * pattern with no codec — see [[phashSqlExpr]].
    */
  def phash(png: Array[Byte], gw: Int = 9, gh: Int = 7): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val r = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    var bits = 0L
    var gy = 0
    while (gy < gh) {
      val sy = gy * h / gh
      var gx = 0
      while (gx < gw - 1) {
        val a = r.getSample(gx * w / gw, sy, 0)
        val b = r.getSample((gx + 1) * w / gw, sy, 0)
        if (b > a) bits |= 1L << (gy * (gw - 1) + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** The identical dHash as engine-portable SQL over a pattern-id
    * expression (the generator formula [[pixel]]/[[imgW]]/[[imgH]]
    * inlined): for the oracle ONLY — the engine side decodes REAL PNGs;
    * the oracle knows the closed form, so equality proves the whole
    * encode → PNG → decode → NN-sample → hash chain. `//` is DuckDB
    * integer division.
    */
  def phashSqlExpr(p: String, gw: Int = 9, gh: Int = 7): String = {
    def px(gx: Int, gy: Int): String = {
      val sx = s"(($gx * (16 + (($p) % 3) * 4)) // $gw)"
      val sy = s"(($gy * (12 + (($p) % 2) * 4)) // $gh)"
      s"((($p) * 31 + $sx * 7 + $sy * 13) % 256)"
    }
    (for (gy <- 0 until gh; gx <- 0 until gw - 1) yield {
      val bit = 1L << (gy * (gw - 1) + gx)
      s"(CASE WHEN ${px(gx + 1, gy)} > ${px(gx, gy)} THEN ${bit}::BIGINT ELSE 0::BIGINT END)"
    }).mkString(" + ")
  }

  private val phashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** Perceptual-hash image dedup: decode + dHash in one batched narrow
    * pass (the codec seam), then ONE combiner-friendly groupBy on the
    * 8-byte hash — the image-side analog of exact text dedup, and the
    * standard first pass of image-corpus curation (re-uploads and
    * lossless re-encodes collapse; near-dup variants would add a
    * hamming-band LSH exactly like [[Dedup.simhashPairs]]). Emits every
    * image with its hash, its duplicate-group size, and the keep flag
    * (smallest media_id per group).
    */
  def phashDedup(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val hashed = spark.createDataFrame(
      media.select(col("media_id"), col("payload")).rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { row =>
            Row(row.getLong(0), phash(row.getAs[Array[Byte]](1)))
          }
        }
      }, phashSchema)
    val groups = hashed.groupBy(col("phash"))
      .agg(count(lit(1)).as("group_n"), min(col("media_id")).as("keeper"))
    hashed.join(broadcast(groups), "phash")
      .select(col("media_id"), col("phash"), col("group_n"),
        (col("media_id") === col("keeper")).as("keep"))
  }

  /** Decode stage over a (media_id, payload) frame: batched mapPartitions
    * on the consumer side of the codec seam (same shape as
    * [[extractFeatures]]). A narrow, shuffle-free pass — at 100 TB this is
    * scan-bound, exactly what a decode stage should be. */
  def imageDecodeStats(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { row =>
            val (w, h, sum, tl) = decodeImageStats(row.getAs[Array[Byte]](1))
            Row(row.getLong(0), w, h, sum.toDouble / (w.toLong * h),
              tl.toDouble / ((w / 2).toLong * (h / 2)))
          }
        }
      }
    spark.createDataFrame(out, imageStatSchema)
  }

  private val audioStatSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("mean_abs", DoubleType, nullable = false)))

  def audioDecodeStats(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { row =>
            val (n, rate, sumAbs) = decodeWavStats(row.getAs[Array[Byte]](1))
            Row(row.getLong(0), n, rate, sumAbs.toDouble / n)
          }
        }
      }
    spark.createDataFrame(out, audioStatSchema)
  }

  /** Per-sample quality counters off one decode pass: (n, nSilent,
    * nClipped, energy = Σ s², peak = max |s|). All integers — silence
    * and clipping counts against |s| thresholds, energy bounded by
    * n·2¹⁵² well inside a long at any clip length this corpus grows to.
    */
  def decodeWavQuality(wav: Array[Byte], silenceThresh: Int,
                       clipThresh: Int): (Long, Long, Long, Long, Int) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"unexpected WAV format: $fmt")
    val raw = ais.readAllBytes()
    val n = raw.length / 2
    var silent = 0L; var clipped = 0L; var energy = 0L; var peak = 0
    var i = 0
    while (i < n) {
      val s = ((raw(i * 2) & 0xFF) | (raw(i * 2 + 1).toInt << 8)).toShort.toInt
      val a = math.abs(s)
      if (a < silenceThresh) silent += 1
      if (a >= clipThresh) clipped += 1
      energy += s.toLong * s
      if (a > peak) peak = a
      i += 1
    }
    (n.toLong, silent, clipped, energy, peak)
  }

  /** Per-pixel quality counters off one decode pass: (w, h, Σg, Σg²,
    * min g, max g) — all exact integers from the gray raster. */
  def decodePngQuality(png: Array[Byte]): (Int, Int, Long, Long, Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val r = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    var sg = 0L; var sg2 = 0L; var mn = 255; var mx = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = r.getSample(x, y, 0)
        sg += g; sg2 += g.toLong * g
        if (g < mn) mn = g
        if (g > mx) mx = g
        x += 1
      }
      y += 1
    }
    (w, h, sg, sg2, mn, mx)
  }

  private val imageQualitySchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("aspect_ppm", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("var_num", LongType, nullable = false),
    StructField("min_g", IntegerType, nullable = false),
    StructField("max_g", IntegerType, nullable = false),
    StructField("is_flat", BooleanType, nullable = false),
    StructField("is_dark", BooleanType, nullable = false),
    StructField("is_bright", BooleanType, nullable = false)))

  /** Image QUALITY FILTER features — the image-corpus curation pass
    * (LAION-class pipelines drop by resolution/aspect, exposure
    * extremes, and flat/low-information rasters): per image, aspect
    * ratio (ppm by integer division), exact gray sum, the exact
    * variance NUMERATOR n·Σg² − (Σg)² (variance = num / n², but the
    * numerator is the integer that needs no division), min/max, and
    * the three drop verdicts — flat (zero variance), dark (mean < 32
    * ⟺ Σg < 32·n, exact), bright (mean ≥ 224). Real PNG decode in the
    * batched mapPartitions seam; every column is an exact integer or
    * a boolean derived from integer compares, so the closed-form
    * oracle matches with zero tolerance.
    */
  def imageQualityStats(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { row =>
            val (w, h, sg, sg2, mn, mx) =
              decodePngQuality(row.getAs[Array[Byte]](1))
            val n = w.toLong * h
            val varNum = n * sg2 - sg * sg
            Row(row.getLong(0), w, h, w.toLong * 1000000L / h, sg, varNum,
              mn, mx, varNum == 0L, sg < 32L * n, sg >= 224L * n)
          }
        }
      }
    spark.createDataFrame(out, imageQualitySchema)
  }

  private val audioQualitySchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("n_silent", LongType, nullable = false),
    StructField("n_clipped", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("silence_ppm", LongType, nullable = false),
    StructField("clip_ppm", LongType, nullable = false)))

  /** Audio QUALITY FILTER features — the speech-corpus curation pass
    * (silence-dominated and clipped recordings are the two standard
    * drop rules): per clip, silence fraction (|s| < `silenceThresh`),
    * clipping fraction (|s| ≥ `clipThresh`), total energy, peak. Real
    * WAV decode in batched mapPartitions (the [[audioDecodeStats]]
    * seam — binary payloads never shuffle, stats are a narrow pass);
    * every output is an exact integer (fractions as ppm via integer
    * division), so the oracle recomputes the whole frame from the
    * closed-form generator with zero float tolerance.
    */
  def audioQualityStats(media: DataFrame, silenceThresh: Int = 256,
                        clipThresh: Int = 2040,
                        batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { row =>
            val (n, silent, clipped, energy, peak) =
              decodeWavQuality(row.getAs[Array[Byte]](1), silenceThresh, clipThresh)
            Row(row.getLong(0), n, silent, clipped, energy, peak,
              silent * 1000000L / n, clipped * 1000000L / n)
          }
        }
      }
    spark.createDataFrame(out, audioQualitySchema)
  }

  private val frameStatSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_gray", DoubleType, nullable = false)))

  def frameSampleStats(media: DataFrame, stride: Int = 2, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload"))
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { row =>
            val id = row.getLong(0)
            sampleFrames(row.getAs[Array[Byte]](1), stride).map { case (f, w, h, sum) =>
              Row(id, f, w, h, sum.toDouble / (w.toLong * h))
            }
          }
        }
      }
    spark.createDataFrame(out, frameStatSchema)
  }
}
