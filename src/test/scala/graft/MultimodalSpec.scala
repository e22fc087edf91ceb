package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.io.Tables

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFromDocuments(spark, Tables.table(spark, sf, "documents"))

  test("media table carries opaque binary + typed metadata per the schema") {
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("modality").dataType.typeName == "string")
    val mods = media.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("extractFeatures: deterministic, bounded feature dim, entropy in [0,8]") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.byte_entropy).toSeq == f2.map(_.byte_entropy).toSeq, "deterministic stub decode")
    assert(f1.forall(f => f.feature.length == Multimodal.FakeDecoder.FeatureDim))
    assert(f1.forall(f => f.byte_entropy >= 0 && f.byte_entropy <= 8))
    assert(f1.forall(f => f.n_bytes > 0))
  }

  test("extractFeatures handles null/empty payloads without crashing") {
    import spark.implicits._
    val withNull = media.limit(2).withColumn("content",
      when(col("media_id") % 2 === 0, col("content")).otherwise(lit(null)))
    val out = Multimodal.extractFeatures(withNull).collect()
    assert(out.length == 2 && out.exists(_.n_bytes == 0))
  }

  test("sampleFrames: one media row explodes to ≥1 bounded frames") {
    val frames = Multimodal.sampleFrames(media)
    val counts = frames.groupBy("media_id").count()
    assert(counts.filter(col("count") < 1).count() == 0)
    val maxLen = frames.select(max(length(col("frame")))).head().getInt(0)
    assert(maxLen <= 1024)
  }
}
