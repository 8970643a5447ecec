package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus partition-wise decode / feature-extract /
  * resize / frame-sample operators (north-star extension; no reference
  * counterpart).
  *
  * The actual codec calls are STUBBED — this container has no image/audio
  * libraries — behind `decodeStub`, a deterministic fake that derives
  * "features" from the bytes themselves. Everything Spark-side is real and
  * tested: the schema, the `mapPartitions` batch shape (decoder state is
  * constructed once per partition, not per row — the expensive part at
  * scale), partition sizing, and the typed output columns.
  */
object Multimodal {

  /** Typed metadata for a media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("format", StringType, nullable = false),     // png|wav|mp4|...
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** A media table schema: id + opaque bytes + metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", mediaMetaSchema, nullable = false)))

  final case class MediaFeatures(media_id: Long, n_bytes: Long,
                                 features: Array[Float])

  /** Deterministic fake "decode + feature extraction": a real pipeline
    * would decode the image/audio here (??? in this container). The fake
    * derives `dim` floats from a rolling byte hash — stable across runs,
    * so tests can assert exact values. The *shape* (per-partition decoder
    * init, streaming iterator, no materialization of the whole partition)
    * is the production shape. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec call goes here (e.g. ImageIO / ffmpeg binding)
    val out = new Array[Float](dim)
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L // LCG step
      out(j) = ((h >>> 33).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Feature extraction over a media DataFrame: one decoder per partition,
    * rows streamed through it (mapPartitions — the iterator is lazy, so a
    * 10 GB partition never materializes). Output: (media_id, n_bytes,
    * features[dim]). */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      // per-partition decoder/session init happens HERE (once), not per row
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        MediaFeatures(r.getLong(idIdx), bytes.length.toLong,
          decodeStub(bytes, dim))
      }
    }
  }

  /** Frame sampling plumbing for video blobs: emits `n` (frame_no, offset
    * fraction) stubs per video row — the explode shape of a real frame
    * sampler (each frame row would carry decoded bytes). Deterministic. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    media
      .filter(col("meta.media_type") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("frame_idx", "_")))
      .drop("_")
      .withColumn("offset_ms",
        (col("frame_idx").cast("double") / n * col("duration_ms")).cast("long"))
      .select("media_id", "frame_idx", "offset_ms")
  }

  /** Deterministic synthetic media table for tests/demos: `rows` blobs of
    * pseudo-random bytes with metadata, built distributed from
    * spark.range (no driver-side data). */
  def syntheticMedia(spark: SparkSession, rows: Int): DataFrame = {
    val types = array(lit("image"), lit("audio"), lit("video"))
    spark.range(rows.toLong).toDF("media_id")
      .withColumn("content",
        unhex(repeat(substring(md5(col("media_id").cast("string")), 1, 16), 4)))
      .withColumn("media_type", element_at(types, (col("media_id") % 3 + 1).cast("int")))
      .withColumn("meta", struct(
        col("media_type"),
        when(col("media_type") === "image", lit("png"))
          .when(col("media_type") === "audio", lit("wav"))
          .otherwise(lit("mp4")).as("format"),
        when(col("media_type") === "image", lit(64)).otherwise(lit(null).cast("int")).as("width"),
        when(col("media_type") === "image", lit(64)).otherwise(lit(null).cast("int")).as("height"),
        when(col("media_type") =!= "image", col("media_id") * 1000 + 1000)
          .otherwise(lit(null).cast("long")).as("duration_ms")))
      .select("media_id", "content", "meta")
  }
}
