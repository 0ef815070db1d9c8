package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus the decode / feature-extract / resize /
  * frame-sample operator plumbing.
  *
  * The decode kernels themselves are STUBS — this container ships no
  * image/audio codecs — implemented as deterministic byte-hash fakes so
  * the Spark-side contract (schema, batch shape, partition-wise
  * execution, null handling) is real and testable. Swapping in a real
  * codec changes only the function body marked STUB below.
  *
  * Scale design: media rows are processed per partition in bounded
  * batches (the Scala analogue of Arrow-batched pandas UDFs), so
  * executor memory is bounded by `batchSize × max media size`, not by
  * partition row count; binary payloads never pass through a shuffle —
  * features are extracted first and only the (key, features) projection
  * moves.
  */
object Multimodal {

  /** Canonical media row: opaque payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),       // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha_prefix: String,
      features: Array[Float])

  /** STUB decode: a real implementation would decode the image/audio and
    * produce pixel/waveform tensors. The fake derives a deterministic
    * feature vector from the content hash so downstream plumbing
    * (similarity search, dedup on `features`) is exercised end-to-end. */
  private[graft] def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(
      if (content == null) Array.emptyByteArray else content)
    Array.tabulate(dim) { i =>
      val b = md(i % md.length)
      (b.toInt * (i + 1) % 251) / 251.0f
    }
  }

  /** STUB resize: records the request; a codec would rescale pixels. */
  private[graft] def resizeStub(content: Array[Byte], w: Int, h: Int): Array[Byte] =
    content // identity — dimensions live in metadata until a codec exists

  /** Feature extraction over a media DataFrame: partition-wise, bounded
    * batches, binary never shuffled. Output: (media_id, kind, n_bytes,
    * sha_prefix, features). */
  def extractFeatures(media: DataFrame, dim: Int = 16,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaFeatures] = media
      .select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = the memory bound; a real codec would also
          // amortize model/codec init across the batch here.
          batch.iterator.map { case (id, kind, content) =>
            val bytes = if (content == null) 0L else content.length.toLong
            val feats = decodeStub(content, dim)
            val sha = feats.take(2).map(f => f"$f%.3f").mkString(",")
            MediaFeatures(id, kind, bytes, sha, feats)
          }
        }
      }
    ds.toDF()
  }

  /** Frame sampling contract for video rows: emits `everyNth` synthetic
    * frame references per video (a codec would emit decoded frames). */
  def sampleFrames(media: DataFrame, everyNth: Int = 10): DataFrame =
    media.where(col("kind") === "video")
      .withColumn("frame_no",
        explode(sequence(lit(0),
          greatest((coalesce(col("meta.duration_ms"), lit(0L)) / 1000).cast("int"), lit(0)),
          lit(everyNth))))
      .select(col("media_id"), col("frame_no"))

  /** Synthesize a deterministic media table from the documents testdata
    * (text bytes as payload) — lets every multimodal operator run and be
    * asserted on without codecs. */
  def syntheticMediaFromDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        lit(64).as("width"), lit(64).as("height"),
        (col("n_chars") * 100).cast("long").as("duration_ms")).as("meta"))
  }
}
