package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata (BASELINE.json north star). The actual media decode
  * is STUBBED (no image/audio libs in this container — see
  * [[FakeDecoder]]); everything Spark-side — schema, batching, partition
  * shape, UDF signature — is real and tested.
  *
  * Scale notes: media bytes ride in the row (parquet binary), so
  * `spark.sql.files.maxPartitionBytes` governs batch memory; decode runs in
  * mapPartitions so any per-partition init (a real codec handle) happens
  * once per task, not once per row — the JVM analog of a Pandas-UDF batch.
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata, the cross-modality schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),   // image/video
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true) // audio/video
  ))

  final case class MediaFeatures(media_id: Long, modality: String, n_bytes: Long,
                                 byte_mean: Double, byte_entropy: Double,
                                 feature: Array[Float])

  /** STUB decoder — deterministic fake standing in for a real codec
    * (??? boundary). A real deployment swaps `decodeFeature` for e.g. a
    * JPEG decode + resize + CNN embed; signature and batch shape stay.
    */
  object FakeDecoder {
    val FeatureDim = 8
    /** Deterministic "feature": byte-histogram moments folded to FeatureDim. */
    def decodeFeature(bytes: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) { f(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
      f.map(x => if (bytes.isEmpty) 0f else x / bytes.length * FeatureDim)
    }
    def entropy(bytes: Array[Byte]): Double = {
      if (bytes.isEmpty) return 0.0
      val counts = new Array[Long](256)
      bytes.foreach(b => counts(b & 0xff) += 1)
      counts.filter(_ > 0).map { c =>
        val p = c.toDouble / bytes.length; -p * math.log(p) / math.log(2)
      }.sum
    }
  }

  /** Batch feature extraction over the opaque binary column. mapPartitions:
    * one (stub) decoder per partition, streamed row-by-row — constant
    * memory per task regardless of partition row count.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select("media_id", "modality", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: val codec = Codec.open(...) — once per partition
        rows.map { case (id, modality, content) =>
          val bytes = Option(content).getOrElse(Array.emptyByteArray)
          MediaFeatures(
            id, modality, bytes.length.toLong,
            if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length,
            FakeDecoder.entropy(bytes),
            FakeDecoder.decodeFeature(bytes)
          )
        }
      }
  }

  /** Frame-sample stub for video: pick every `stride`-th chunk of the
    * payload as a "frame" (real impl: demux + decode keyframes). Shows the
    * explode-to-frames shape: one media row → N frame rows.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 1024, stride: Int = 4): DataFrame =
    media
      .withColumn("n_frames",
        greatest(lit(1), (length(col("content")) / lit(frameBytes * stride)).cast("int")))
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
      .withColumn("frame",
        col("content").substr(col("frame_idx") * frameBytes * stride + 1, lit(frameBytes)))
      .select("media_id", "modality", "frame_idx", "frame")

  /** Build a media table from documents (text bytes as the opaque payload) —
    * the fixture generator used by tests and the rows-only query.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // deterministic modality assignment
      element_at(array(lit("image"), lit("audio"), lit("video")),
                 (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms")
    )
}
