package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque BINARY payloads plus typed metadata, with decode / feature-extract
  * / resize / frame-sample stages (LLM-pipeline extension; no reference
  * analog — capability superset per BASELINE.json north star).
  *
  * The Spark-side plumbing is real: schemas, batch-iterator processing
  * (`mapPartitions` over typed rows — the JVM analog of `mapInPandas` Arrow
  * batches: one partition = a stream of batched records, constant memory),
  * partition-count preservation, and codegen'd metadata projections. The
  * actual media codecs are STUBBED with deterministic byte-derived fakes —
  * this container has no image/audio libraries — behind `MediaCodec`, the
  * single seam a real build would swap for JNI/FFI codecs.
  */
object Multimodal {

  /** Typed decoded-metadata record. */
  final case class MediaMeta(
      mediaId: Long, kind: String, bytes: Long,
      width: Int, height: Int, durationMs: Long, channels: Int)

  final case class MediaFeature(mediaId: Long, feature: Array[Float])

  final case class MediaFrame(mediaId: Long, frameIdx: Int, frame: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("payload", BinaryType, nullable = false),  // opaque encoded media
    StructField("meta_json", StringType, nullable = true)))

  /** STUB media codec — deterministic byte-derived fakes standing in for
    * real decoders (libjpeg/ffmpeg/...). Every function is pure in the
    * payload bytes so results are reproducible and oracle-checkable; a real
    * deployment implements this trait over native codecs.
    */
  trait MediaCodec extends Serializable {
    def decodeMeta(kind: String, payload: Array[Byte]): (Int, Int, Long, Int)
    def feature(payload: Array[Byte], dim: Int): Array[Float]
  }

  object StubCodec extends MediaCodec {
    // STUB: "dimensions" derived from payload length; a real codec parses
    // the container format here.
    def decodeMeta(kind: String, payload: Array[Byte]): (Int, Int, Long, Int) = {
      val n = payload.length.toLong
      kind match {
        case "image" => (((n % 1024) + 1).toInt, ((n * 7 % 768) + 1).toInt, 0L, 3)
        case "audio" => (0, 0, n * 8, 2)
        case _       => (((n % 1920) + 1).toInt, ((n * 3 % 1080) + 1).toInt, n * 40, 3)
      }
    }
    // STUB: hash-derived embedding; a real codec runs a vision/audio model.
    def feature(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      var j = 0
      while (j < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(j) = (h >>> 11).toFloat / (1L << 53).toFloat - 0.5f
        j += 1
      }
      out
    }
  }

  /** Decode metadata for every media row — batch-iterator processing, one
    * pass per partition, no per-row UDF dispatch.
    */
  def decodeMeta(media: DataFrame, codec: MediaCodec = StubCodec): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val (w, h, d, c) = codec.decodeMeta(kind, payload)
          MediaMeta(id, kind, payload.length.toLong, w, h, d, c)
        }
      }
  }

  /** Feature extraction (fake embedding) — the mapInPandas-shaped stage. */
  def extractFeatures(media: DataFrame, dim: Int,
      codec: MediaCodec = StubCodec): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => MediaFeature(id, codec.feature(p, dim)) })
  }

  /** Resize = payload truncation stub (keeps the byte-budget contract a
    * real transcoder would honor).
    */
  def resize(media: DataFrame, maxBytes: Int): DataFrame = {
    media.withColumn("payload",
      expr(s"CASE WHEN octet_length(payload) > $maxBytes THEN substring(payload, 1, $maxBytes) ELSE payload END"))
  }

  /** Frame sampling: split a video payload into fixed-size pseudo-frames,
    * every `stride`-th frame kept — the explode-shaped stage.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    // validate eagerly: frameBytes=0 throws Range's "step cannot be 0" and
    // stride=0 an ArithmeticException, both deep inside an executor task
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        (0 until p.length by frameBytes).zipWithIndex
          .collect { case (off, idx) if idx % stride == 0 =>
            MediaFrame(id, idx, p.slice(off, math.min(off + frameBytes, p.length)))
          }
      }
  }

  /** Derive a media table from the documents fixture (payload = UTF-8
    * bytes; kind round-robins) — drivers test media plumbing on real
    * driver-provided data without synthesizing new tables.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    graft.sources.Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      to_json(struct(col("lang"), col("source"), col("n_chars"))).as("meta_json"))
  }
}
