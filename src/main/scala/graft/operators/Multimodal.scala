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
  * The DECODERS themselves are deliberately stubbed — this container
  * has no image/audio libraries — behind [[Decoder]]; the Spark-side
  * contracts (schema, batching, partitioning, null passthrough) are
  * real and tested, so swapping in a javacv/ffmpeg-backed Decoder is
  * a one-class change.
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
    StructField("feature", ArrayType(FloatType)))) // fixed-dim embedding

  /** Pluggable decoder: payload bytes → (width, height, nFrames,
    * feature vector). The default is a DETERMINISTIC FAKE (clearly a
    * stub): dimensions derived from payload length, feature = first
    * `dim` bytes scaled — enough to exercise schema/partition/batch
    * behavior end-to-end without any codec library.
    */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float])
  }

  final class StubDecoder(dim: Int = 8) extends Decoder {
    override def decode(p: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val w = 16 + (p.length % 64); val h = 16 + ((p.length / 64) % 64)
      val f = new Array[Float](dim)
      var i = 0
      while (i < dim) { f(i) = (if (p.length > i) p(i) & 0xFF else 0) / 255.0f; i += 1 }
      (w, h, 1, f)
    }
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
    * Null payloads pass through as null features (never crash the
    * batch). One decoder instance per partition — the real cost model
    * for codec init.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String,
                     decoder: Decoder = new StubDecoder()): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ FeatureType.fields)
    val idx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      // decoder is reused across the whole partition (init amortized)
      it.map { r =>
        val payload = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val extra: Seq[Any] = if (payload == null) Seq(null, null, null, null)
        else {
          val (w, h, nf, feat) = decoder.decode(payload)
          Seq(w, h, nf, feat.toSeq)
        }
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
