package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * IMAGE decode is REAL: q179 encodes a deterministic grayscale PNG per
  * document (payload bytes as pixels) and decodes it with the pure-JVM
  * `javax.imageio` codec inside mapPartitions — an actual compressed-
  * format round trip on executors. PNG being lossless, the decoded
  * pixel stats re-derive in DuckDB from the ASCII source text, so even
  * the codec stage is oracle-checked end to end. Audio/video codecs
  * don't exist in this container, so the generic `StubDecoder` stands
  * in for those modalities — everything around it is real Spark: the
  * asset schema, the typed Dataset stages, mapPartitions batching (one
  * decoder instance per partition, the same shape a JNI/codec binding
  * needs), and the binary slicing used for frame sampling. Assets are
  * derived deterministically from the `documents` fixture (utf-8 bytes
  * as payload) so tests are stable.
  *
  * Scale notes: binary payloads ride the scan; decode is a narrow
  * mapPartitions (no shuffle); per-partition decoder reuse amortizes
  * codec init; metadata predicates (mime, n_bytes) are plain pushable
  * column filters because metadata lives OUTSIDE the blob.
  */
object Multimodal {

  final case class Asset(doc_id: Long, mime: String, content: Array[Byte])
  final case class AssetFeatures(doc_id: Long, mime: String, n_bytes: Long,
      n_frames: Int, mean_byte: Double, first_frame_hash: Long)

  /** Deterministic stand-in for a real codec: "decodes" a payload into
    * fixed-size frames and per-frame stats. Swap for a real binding
    * without touching the pipeline shape. The first-frame hash is the
    * 60-bit md5 prefix — portable, so even this mapPartitions stage is
    * oracle-checkable in DuckDB (fixture payloads are ASCII text). */
  object StubDecoder {
    val FrameSize = 64
    def frames(content: Array[Byte]): Iterator[Array[Byte]] =
      content.grouped(FrameSize)
    def md5_60(bytes: Array[Byte]): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    def decode(a: Asset): AssetFeatures = {
      val fs = frames(a.content).toArray
      val mean =
        if (a.content.isEmpty) 0.0
        else a.content.map(b => (b & 0xff).toDouble).sum / a.content.length
      val h = fs.headOption.map(md5_60).getOrElse(0L)
      AssetFeatures(a.doc_id, a.mime, a.content.length.toLong, fs.length, mean, h)
    }
  }

  /** Binary asset table derived from documents: content = utf-8 payload,
    * metadata as real columns next to the opaque blob. */
  def assets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents").select(
      col("doc_id"),
      concat(lit("application/x-"), col("source")).as("mime"),
      encode(col("text"), "UTF-8").as("content"))

  /** q21 — metadata + content hash over the binary column (oracle-able:
    * sha2 over the blob == sha256 over the source text's utf-8 bytes). */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    assets(spark, sfDir).select(
      col("doc_id"), col("mime"),
      length(col("content")).cast("long").as("n_bytes"),
      sha2(col("content"), 256).as("sha256"))
      .orderBy("doc_id")

  val binaryMetaSql: String =
    """SELECT doc_id, 'application/x-' || source AS mime,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       sha256(text) AS sha256
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q32 — frame sampling, fully declarative: every `FrameStride`-th
    * fixed-size frame is sliced straight out of the binary column with
    * `substring` (binary-safe) and fingerprinted. No UDF, no shuffle —
    * one narrow projection with an explode, so it rides whole-stage
    * codegen and scales with the scan. Oracle: the asset payload is the
    * fixture text's utf-8 bytes and the fixture is pure ASCII, so DuckDB
    * reproduces the frames with substr over characters. */
  val FrameStride = 2

  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val nFrames = ceil(length(col("content")).cast("double") /
      StubDecoder.FrameSize).cast("int")
    assets(spark, sfDir)
      // empty payloads have no frames; without this filter sequence()
      // would fault on start > stop with a positive stride (the oracle's
      // generate_series drops such rows the same way)
      .filter(nFrames > 0)
      .select(col("doc_id"), col("content"),
        explode(sequence(lit(0), nFrames - 1, lit(FrameStride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(col("content").substr(
          col("frame_idx") * StubDecoder.FrameSize + 1,
          lit(StubDecoder.FrameSize))).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  val frameSampleSql: String = {
    val fs = StubDecoder.FrameSize
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |         unnest(generate_series(0,
       |           CAST(ceil(length(text) / $fs.0) AS INT) - 1, $FrameStride)) AS frame_idx
       |  FROM documents)
       |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |       md5(substr(text, frame_idx * $fs + 1, $fs)) AS frame_md5
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** q51 — the RESIZE stage, fully declarative: crop every frame to its
    * first `ThumbBytes` bytes and re-concatenate — the binary-plumbing
    * shape of a thumbnailer (a real codec binding would swap the slice
    * for an interpolating kernel inside the same fold). One narrow
    * projection per row (a higher-order `aggregate` over frame indices
    * with binary-safe substr/concat), no UDF, no shuffle; metadata
    * (sizes, hash) rides as plain columns. Oracle: ASCII payloads let
    * DuckDB rebuild the same bytes with string_agg over substr. */
  val ThumbBytes = 16

  def resizeThumbs(spark: SparkSession, sfDir: String): DataFrame = {
    val fs = StubDecoder.FrameSize
    val nFrames = ceil(length(col("content")).cast("double") / fs).cast("int")
    // empty payload → zero frames → empty thumb (guarded: sequence()
    // with start > stop would otherwise run descending)
    val thumb = when(nFrames <= 0, typedlit(Array.empty[Byte])).otherwise(
      aggregate(
        sequence(lit(0), nFrames - 1),
        typedlit(Array.empty[Byte]),
        (acc, i) => concat(acc, col("content").substr(i * fs + 1, lit(ThumbBytes)))))
    assets(spark, sfDir)
      .select(col("doc_id"), col("mime"),
        length(col("content")).cast("long").as("n_bytes"),
        thumb.as("thumb"))
      .select(col("doc_id"), col("mime"), col("n_bytes"),
        length(col("thumb")).cast("long").as("n_bytes_resized"),
        md5(col("thumb")).as("thumb_md5"))
      .orderBy("doc_id")
  }

  val resizeThumbsSql: String = {
    val fs = StubDecoder.FrameSize
    s"""WITH t AS (
       |  SELECT doc_id, 'application/x-' || source AS mime, text,
       |         CAST(length(text) AS BIGINT) AS n_bytes,
       |         CAST(ceil(length(text) / $fs.0) AS INT) AS nf
       |  FROM documents
       |), f AS (
       |  SELECT doc_id, mime, n_bytes,
       |         COALESCE(list_aggregate([substr(text, i * $fs + 1, $ThumbBytes)
       |           for i in generate_series(0, nf - 1)], 'string_agg', ''), '') AS thumb
       |  FROM t
       |)
       |SELECT doc_id, mime, n_bytes,
       |       CAST(length(thumb) AS BIGINT) AS n_bytes_resized,
       |       md5(thumb) AS thumb_md5
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** q22 — the decode/feature stage: typed Dataset through mapPartitions
    * with a per-partition decoder. Fully oracle-checked: every output
    * stat re-derives in DuckDB from the ASCII source text. */
  def features(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Asset] = assets(spark, sfDir).as[Asset]
    ds.mapPartitions { it =>
      // one decoder per partition — where a real codec would init once
      it.map(StubDecoder.decode)
    }.toDF().orderBy("doc_id")
  }

  val featuresSql: String = {
    val fs = StubDecoder.FrameSize
    s"""SELECT doc_id,
       |       'application/x-' || source AS mime,
       |       CAST(length(text) AS BIGINT) AS n_bytes,
       |       CAST(ceil(length(text) / $fs.0) AS INT) AS n_frames,
       |       list_aggregate([CAST(unicode(c) AS DOUBLE)
       |         for c in string_split_regex(text, '')], 'avg') AS mean_byte,
       |       ('0x'||substr(md5(substr(text, 1, $fs)),1,15))::BIGINT AS first_frame_hash
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Raster geometry for the PNG stage: fixed width, height = however
    * many 32-byte rows the payload fills (zero-padded). */
  val ImgWidth = 32

  final case class PngAsset(doc_id: Long, png: Array[Byte])
  final case class PngFeatures(doc_id: Long, width: Int, height: Int,
      n_px: Long, nonzero_px: Long, mean_px: Double)

  /** Per-document grayscale PNG, built from the utf-8 payload bytes laid
    * out row-major into an ImgWidth-wide raster. Runs on executors (a
    * narrow mapPartitions); the PNG bytes are a REAL compressed image
    * column — the thing a 100 TB multimodal table stores. */
  def pngAssets(spark: SparkSession, sfDir: String): Dataset[PngAsset] = {
    import spark.implicits._
    assets(spark, sfDir).select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // memory-only codec: ImageIO defaults to a DISK-backed stream
        // cache — a temp file created and deleted per image — which
        // degrades ~4x in a long suite with heavy tmp churn (measured:
        // q179 2.4s standalone vs 9.9s in-suite before this)
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val h = math.max(1, (bytes.length + ImgWidth - 1) / ImgWidth)
          val img = new java.awt.image.BufferedImage(
            ImgWidth, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var i = 0
          while (i < bytes.length) {
            raster.setSample(i % ImgWidth, i / ImgWidth, 0, bytes(i) & 0xff)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          PngAsset(id, bos.toByteArray)
        }
      }
  }

  /** q179 — REAL image decode: `javax.imageio` parses the PNG column on
    * executors and the features come off the decoded raster, not the
    * source bytes. Lossless codec ⇒ the oracle re-derives every stat
    * from the ASCII text (byte value == code point), which checks the
    * whole encode→decode→feature pipeline, not just the plumbing.
    *
    * Scale shape: narrow mapPartitions (no shuffle), one codec context
    * per partition, features are fixed-width columns; the wide binary
    * never leaves the stage. */
  def imageDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    pngAssets(spark, sfDir).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no per-image temp file
      it.map { a =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.png))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var sum = 0L
        var nz = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v
            if (v != 0) nz += 1
            x += 1
          }
          y += 1
        }
        PngFeatures(a.doc_id, w, h, w.toLong * h, nz,
          sum.toDouble / (w.toLong * h))
      }
    }.toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_px"),
        col("nonzero_px"), round(col("mean_px"), 6).as("mean_px"))
      .orderBy("doc_id")
  }

  /** q183 — perceptual image hash (dHash) off the DECODED raster: the
    * image-modality near-dup primitive. For each document's PNG, decode
    * with `javax.imageio`, then compare horizontally-adjacent pixels in
    * the top-left 8×9 window (out-of-raster reads are zero, matching
    * the encoder's padding) — 64 brightness-gradient bits, the standard
    * difference-hash. Identical hashes = perceptually-identical
    * thumbnails; the output also reports each doc's phash cluster size,
    * the multimodal twin of q10's exact text dedup.
    *
    * Scale shape: decode + hash is one narrow mapPartitions; the
    * cluster-size attach is a hash groupBy on the 64-bit phash (one
    * register-width shuffle key, never pixels). Oracle: PNG is
    * lossless and the fixture is ASCII, so every pixel re-derives from
    * the text's code points — the 64-term comparison unrolls into the
    * DuckDB twin from the same constants. */
  def imagePhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hashes = pngAssets(spark, sfDir).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no per-image temp file
      it.map { a =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.png))
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        def px(r: Int, c: Int): Int =
          if (r < h && c < w) raster.getSample(c, r, 0) else 0
        var bits = 0L
        var k = 0
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            if (px(r, c) < px(r, c + 1)) bits |= (1L << k)
            k += 1
            c += 1
          }
          r += 1
        }
        (a.doc_id, bits)
      }
    }.toDF("doc_id", "phash")
    val sizes = hashes.groupBy("phash")
      .agg(count(lit(1)).as("phash_cluster_size"))
    hashes.join(sizes, Seq("phash"))
      .select(col("doc_id"), col("phash"), col("phash_cluster_size"))
      .orderBy("doc_id")
  }

  val imagePhashSql: String = {
    def byteAt(i: Int): String =
      s"(CASE WHEN $i < length(text) THEN unicode(substr(text, ${i + 1}, 1)) ELSE 0 END)"
    val terms = (for { r <- 0 until 8; c <- 0 until 8 } yield {
      val k = r * 8 + c
      s"(CASE WHEN ${byteAt(r * ImgWidth + c)} < ${byteAt(r * ImgWidth + c + 1)} " +
        s"THEN ${1L << k} ELSE 0 END)"
    }).mkString(" + ")
    s"""WITH h AS (
       |  SELECT doc_id, CAST($terms AS BIGINT) AS phash FROM documents
       |), s AS (
       |  SELECT phash, CAST(COUNT(*) AS BIGINT) AS phash_cluster_size
       |  FROM h GROUP BY 1
       |)
       |SELECT h.doc_id, h.phash, s.phash_cluster_size
       |FROM h JOIN s USING (phash)
       |ORDER BY doc_id""".stripMargin
  }

  val imageDecodeSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, length(text) AS len,
       |         greatest(CAST(ceil(length(text) / $ImgWidth.0) AS INT), 1) AS h,
       |         COALESCE(list_aggregate([CAST(unicode(c) AS BIGINT)
       |           for c in string_split_regex(text, '')], 'sum'), 0) AS px_sum
       |  FROM documents
       |)
       |SELECT doc_id, $ImgWidth AS width, h AS height,
       |       CAST($ImgWidth * h AS BIGINT) AS n_px,
       |       CAST(len AS BIGINT) AS nonzero_px,
       |       round(CAST(px_sum AS DOUBLE) / ($ImgWidth * h), 6) AS mean_px
       |FROM t ORDER BY doc_id""".stripMargin

  /** PCM geometry for the WAV stage: mono 16-bit little-endian at
    * [[SampleRate]] Hz; sample i = (payload byte i − [[SampleBias]])
    * × 256, so ASCII payloads (codes 32-126) swing both signs and the
    * decoded stats are closed-form from the text's code points. */
  val SampleRate = 8000
  val SampleBias = 64

  final case class WavAsset(doc_id: Long, wav: Array[Byte])
  final case class WavFeatures(doc_id: Long, sample_rate: Int,
      n_samples: Long, sum_amp: Long, peak: Long, n_zero_cross: Long,
      mean_amp: Double)

  /** Per-document RIFF/WAVE file (real header + PCM16LE data chunk)
    * built from the utf-8 payload on executors — the audio twin of
    * [[pngAssets]]: a genuine container-format binary column, not a
    * stub. */
  def wavAssets(spark: SparkSession, sfDir: String): Dataset[WavAsset] = {
    import spark.implicits._
    assets(spark, sfDir).select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val buf = java.nio.ByteBuffer.allocate(44 + n * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1)                    // PCM, mono
            .putInt(SampleRate).putInt(SampleRate * 2)  // byte rate
            .putShort(2).putShort(16)                   // block, bits
            .put("data".getBytes("US-ASCII")).putInt(n * 2)
          var i = 0
          while (i < n) {
            buf.putShort((((bytes(i) & 0xff) - SampleBias) * 256).toShort)
            i += 1
          }
          WavAsset(id, buf.array())
        }
      }
  }

  /** q238 — REAL audio decode: `javax.sound.sampled.AudioSystem`
    * parses the WAV column on executors (container + format
    * negotiation, the actual pure-JVM audio path) and the features
    * come off the DECODED frame stream — exact integer sample sums,
    * peak amplitude, and zero-crossing count (the classic cheap
    * voiced/unvoiced signal feature), plus the 6-dp mean. PCM being
    * lossless, every stat re-derives in DuckDB from the ASCII code
    * points, so the synth→container→decode→feature pipeline is
    * oracle-checked end to end — the audio twin of q179.
    *
    * Scale shape: narrow mapPartitions (no shuffle), one decoder
    * context per partition, fixed-width feature columns; the wide
    * binary never leaves the stage. */
  /** Feature pass over a decoded 16-bit PCM buffer: exact integer
    * sample sum, peak |amplitude|, and zero-crossing count. b0/b1 are
    * each frame's two raw bytes in stream order; `bigEndian` decides
    * which carries the sign — that byte is sign-EXTENDED (plain
    * toInt), the other zero-extended. */
  private[ext] def pcm16Features(
      data: Array[Byte], n: Int, bigEndian: Boolean): (Long, Long, Long) = {
    var (sum, peak, zc) = (0L, 0L, 0L)
    var prev = 0
    var i = 0
    while (i < n) {
      val b0 = data(i * 2).toInt
      val b1 = data(i * 2 + 1).toInt
      val s = if (bigEndian) (b0 << 8) | (b1 & 0xff)
              else (b1 << 8) | (b0 & 0xff)
      sum += s
      if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
      if (i > 0 && s.toLong * prev < 0) zc += 1
      prev = s
      i += 1
    }
    (sum, peak, zc)
  }

  def audioDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    wavAssets(spark, sfDir).mapPartitions { it =>
      it.map { a =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.wav))
        val fmt = ais.getFormat
        val n = ais.getFrameLength.toInt
        val data = ais.readAllBytes()
        ais.close()
        val (sum, peak, zc) = pcm16Features(data, n, fmt.isBigEndian)
        WavFeatures(a.doc_id, fmt.getSampleRate.toInt, n.toLong, sum, peak,
          zc, if (n == 0) 0.0 else sum.toDouble / n)
      }
    }.toDF()
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("sum_amp"), col("peak"), col("n_zero_cross"),
        round(col("mean_amp"), 6).as("mean_amp"))
      .orderBy("doc_id")
  }

  val audioDecodeSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CASE WHEN length(text) = 0 THEN []
       |              ELSE [(unicode(c) - $SampleBias) * 256
       |                    for c in string_split_regex(text, '')]
       |         END AS s
       |  FROM documents
       |)
       |SELECT doc_id, $SampleRate AS sample_rate,
       |       CAST(len(s) AS BIGINT) AS n_samples,
       |       CAST(COALESCE(list_aggregate(s, 'sum'), 0) AS BIGINT)
       |         AS sum_amp,
       |       CAST(COALESCE(list_aggregate([abs(x) for x in s], 'max'), 0)
       |            AS BIGINT) AS peak,
       |       CAST(COALESCE(list_aggregate(
       |              [CASE WHEN s[i] * s[i + 1] < 0 THEN 1 ELSE 0 END
       |               for i in generate_series(1, len(s) - 1)], 'sum'), 0)
       |            AS BIGINT) AS n_zero_cross,
       |       round(CASE WHEN len(s) > 0
       |             THEN CAST(list_aggregate(s, 'sum') AS DOUBLE) / len(s)
       |             ELSE 0.0 END, 6) AS mean_amp
       |FROM t ORDER BY doc_id""".stripMargin
}
