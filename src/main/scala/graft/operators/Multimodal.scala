package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines (builder prompt §beyond-reference).
  *
  * Media travel as opaque `binary` columns + a typed metadata struct;
  * decode/feature steps run per-partition so per-batch codec setup
  * amortizes (the Scala analog of `mapInPandas` batch processing).
  *
  * Image decode is REAL: [[ImageIoDecoder]] parses PNG/JPEG/BMP/GIF
  * payloads with `javax.imageio` (ships in the JDK — no external
  * codec library needed) and extracts true dimensions, channel count,
  * frame count and pixel statistics. Only video/audio remain behind
  * the deterministic [[StubDecoder]] (this container has no av codec
  * libraries); swapping in an ffmpeg-backed Decoder is a one-class
  * change because the Spark-side contracts (schema, batching,
  * partitioning, null passthrough) are shared and tested.
  */
object Multimodal {

  /** Typed metadata carried with every media payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // "image" | "audio" | "video"
    StructField("format", StringType),       // container/codec tag
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))    // md5 of payload

  /** Decoded-feature schema appended by [[decodeFeatures]]. */
  val FeatureType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("channels", IntegerType),
    StructField("px_mean", DoubleType),       // mean over all samples
    StructField("feature", ArrayType(FloatType)))) // fixed-dim embedding

  /** One decoded media payload. `pxMean` is the mean over every
    * sample of every band of the first frame; `feature` is a
    * fixed-dim embedding (for images: a normalized intensity
    * histogram — the cheap downstream-dedup signal).
    */
  final case class Decoded(width: Int, height: Int, nFrames: Int,
                           channels: Int, pxMean: Double,
                           feature: Array[Float])

  /** Pluggable decoder: payload bytes → [[Decoded]]. One instance is
    * reused across a whole partition, so stateful codecs amortize
    * their init cost.
    */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): Decoded
  }

  /** REAL image decoder backed by `javax.imageio` (JDK built-in):
    * handles PNG, JPEG, BMP, GIF and WBMP. Width/height/channels come
    * from the decoded raster; `n_frames` counts sub-images (animated
    * GIF frames); `px_mean` averages every sample of every band of
    * frame 0; `feature` is a `featDim`-bin intensity histogram over
    * band 0, L1-normalized. Throws on undecodable bytes — feed video
    * payloads to [[StubDecoder]] instead.
    */
  final class ImageIoDecoder(featDim: Int = 8) extends Decoder {
    override def decode(p: Array[Byte]): Decoded = {
      // ImageIO's default stream cache is DISK-backed (a temp file per
      // payload — silent file churn per row at scale); payloads are
      // already in memory, so force the memory cache in this task's JVM
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "undecodable image payload (no ImageIO reader)")
        val reader = readers.next()
        reader.setInput(iis, false, true)
        try {
          // allowSearch=true: exact frame count (animated GIF); for
          // single-frame formats this returns 1 without extra IO.
          val nFrames = math.max(1, reader.getNumImages(true))
          val img = reader.read(0)
          val raster = img.getRaster
          val w = img.getWidth; val h = img.getHeight
          val bands = raster.getNumBands
          val hist = new Array[Float](featDim)
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < bands) {
                val s = raster.getSample(x, y, b)
                sum += s
                if (b == 0) {
                  val bin = math.min(featDim - 1, s * featDim / 256)
                  hist(bin) += 1f
                }
                b += 1
              }
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h * bands
          var i = 0
          while (i < featDim) { hist(i) /= (w.toLong * h); i += 1 }
          Decoded(w, h, nFrames, bands, if (n == 0) 0.0 else sum / n, hist)
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /** Deterministic FAKE decoder for formats with no codec in this
    * container (video/audio): dimensions derived from payload length,
    * feature = first `dim` bytes scaled — exercises schema/partition/
    * batch behavior end-to-end. Clearly a stub; images should use
    * [[ImageIoDecoder]].
    */
  final class StubDecoder(dim: Int = 8) extends Decoder {
    override def decode(p: Array[Byte]): Decoded = {
      val w = 16 + (p.length % 64); val h = 16 + ((p.length / 64) % 64)
      val f = new Array[Float](dim)
      var i = 0
      while (i < dim) { f(i) = (if (p.length > i) p(i) & 0xFF else 0) / 255.0f; i += 1 }
      var sum = 0L; var j = 0
      while (j < p.length) { sum += (p(j) & 0xFF); j += 1 }
      Decoded(w, h, 1, 1, if (p.length == 0) 0.0 else sum.toDouble / p.length, f)
    }
  }

  /** Encode a grayscale image as PNG bytes (lossless, so a decode
    * round-trip recovers the exact pixel values). Driver- or
    * executor-side; used by [[synthesizeGrayPng]] and tests.
    */
  def pngBytes(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixels length ${pixels.length} != $width*$height")
    javax.imageio.ImageIO.setUseCache(false) // no temp file per encode
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, pixels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Append a `payload` column holding a real grayscale PNG whose
    * pixels cycle through the ASCII codes of `hexCol` (an md5 hex
    * string) — a deterministic, SQL-replayable image corpus for
    * exercising the real decode path at any scale. Encoding runs
    * per-partition (no shuffle); the PNG bytes are genuinely
    * compressed, so the decode step downstream does real work.
    */
  def synthesizeGrayPng(df: DataFrame, hexCol: String, wCol: String,
                        hCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("payload", BinaryType))
    val hi = df.schema.fieldIndex(hexCol)
    val wi = df.schema.fieldIndex(wCol)
    val hti = df.schema.fieldIndex(hCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        // degenerate inputs (null, empty hex, non-positive dims)
        // degrade to a null payload like the null case — a poison row
        // must not abort the stage
        val payload: Any =
          if (r.isNullAt(hi) || r.isNullAt(wi) || r.isNullAt(hti) ||
              r.getString(hi).isEmpty || r.getInt(wi) <= 0 || r.getInt(hti) <= 0)
            null
          else {
            val hex = r.getString(hi)
            val w = r.getInt(wi); val h = r.getInt(hti)
            val px = new Array[Byte](w * h)
            var i = 0
            while (i < px.length) { px(i) = hex.charAt(i % hex.length).toByte; i += 1 }
            pngBytes(w, h, px)
          }
        Row.fromSeq(r.toSeq :+ payload)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Attach the typed metadata struct to a binary payload column —
    * pure column expressions, no decode needed (codegen'd; this is
    * the cheap always-on path at 100 TB).
    */
  def withMediaMeta(df: DataFrame, payloadCol: String, mediaType: String,
                    format: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      lit(format).as("format"),
      length(col(payloadCol)).cast("long").as("n_bytes"),
      md5(col(payloadCol)).as("checksum")))

  /** Run the decoder per partition, appending [[FeatureType]] columns.
    * Null AND undecodable payloads degrade to null features — at
    * 100 TB a single poison row (truncated upload, mislabeled bytes)
    * must never fail the task 4× and kill the job; filter
    * `width IS NULL` downstream to audit the bad rows. One decoder
    * instance per partition — the real cost model for codec init.
    * Defaults to the REAL [[ImageIoDecoder]]; pass a [[StubDecoder]]
    * for payload types with no codec in the JDK.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String,
                     decoder: Decoder = new ImageIoDecoder()): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ FeatureType.fields)
    val idx = df.schema.fieldIndex(payloadCol)
    val nulls: Seq[Any] = Seq(null, null, null, null, null, null)
    val rdd = df.rdd.mapPartitions { it =>
      // decoder is reused across the whole partition (init amortized)
      it.map { r =>
        val payload = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val extra: Seq[Any] = if (payload == null) nulls
        else try {
          val d = decoder.decode(payload)
          Seq(d.width, d.height, d.nFrames, d.channels, d.pxMean, d.feature.toSeq)
        } catch { case scala.util.control.NonFatal(_) => nulls }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling plan for video payloads: emit (frame_no, byte
    * range) rows per media row WITHOUT decoding — the shuffle-free
    * fan-out that downstream per-frame decoders consume. `stride`
    * picks every k-th frame.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, frameBytes: Int,
                   stride: Int): DataFrame = {
    val nFrames = (length(col(payloadCol)) / frameBytes).cast("int")
    df.withColumn("frame_no",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
      .withColumn("frame_start", col("frame_no").cast("long") * frameBytes)
      .withColumn("frame_bytes",
        least(lit(frameBytes.toLong),
          length(col(payloadCol)).cast("long") - col("frame_start")))
  }

  /** Chunk an oversized payload into ≤ chunkBytes pieces for storage
    * systems with cell-size limits; reassembly key = (id, chunk_no).
    */
  def chunkPayload(df: DataFrame, idCol: String, payloadCol: String,
                   chunkBytes: Int): DataFrame =
    df.select(col(idCol),
        explode(sequence(lit(0),
          ceil(length(col(payloadCol)) / lit(chunkBytes.toDouble)).cast("int") - 1))
          .as("chunk_no"),
        col(payloadCol))
      .select(col(idCol), col("chunk_no"),
        col(payloadCol).substr(col("chunk_no") * chunkBytes + 1, lit(chunkBytes))
          .as("chunk"))
}
