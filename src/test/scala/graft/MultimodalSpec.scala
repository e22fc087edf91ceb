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

  test("extractFeatures: byte stats always computed; undecodable payloads get null feature") {
    // the documents-derived fixture carries TEXT bytes — none of it is
    // valid PNG/WAV/GFTV, so every feature must be null while the
    // modality-independent byte stats stay populated and deterministic
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.byte_entropy).toSeq == f2.map(_.byte_entropy).toSeq, "deterministic byte stats")
    assert(f1.forall(_.feature == null), "text bytes must not decode as media")
    assert(f1.forall(f => f.byte_entropy >= 0 && f.byte_entropy <= 8))
    assert(f1.forall(f => f.n_bytes > 0))
  }

  test("extractFeatures routes each modality through its real codec") {
    import spark.implicits._
    val ids = Seq(0L, 3L, 11L).toDF("doc_id")
    val real = Multimodal.pngMedia(ids).withColumn("modality", lit("image"))
      .union(Multimodal.wavMedia(ids).withColumn("modality", lit("audio")))
      .union(Multimodal.videoMedia(ids).withColumn("modality", lit("video")))
    val out = Multimodal.extractFeatures(real).collect()
    assert(out.length == 9)
    assert(out.forall(_.feature != null), "real payloads must decode")
    assert(out.forall(_.feature.length == Multimodal.FeatureDim))
    // image: luma histogram is a pixel-fraction distribution (sums to 1)
    out.filter(_.modality == "image").foreach { f =>
      assert(math.abs(f.feature.map(_.toDouble).sum - 1.0) < 1e-5) }
    // audio: envelope of the ±1000-amplitude synthetic wave stays well
    // inside (0, 1000/32768 + eps]
    out.filter(_.modality == "audio").foreach { f =>
      assert(f.feature.forall(v => v > 0f && v <= 1000f / 32768f + 1e-4f)) }
    // video: 2 + id%3 frames → leading entries populated, the rest 0
    out.filter(_.modality == "video").foreach { f =>
      val nf = (2 + (f.media_id % 3)).toInt
      assert(f.feature.take(nf).forall(_ > 0f))
      assert(f.feature.drop(nf).forall(_ == 0f)) }
    // cross-modality decode must fail cleanly, not mislabel: an image
    // payload tagged audio is corrupt media, null feature
    val cross = Multimodal.pngMedia(ids).withColumn("modality", lit("audio"))
    assert(Multimodal.extractFeatures(cross).collect().forall(_.feature == null))
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

  test("real codec: javax.imageio PNG encode → decode recovers every pixel end-to-end") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 42L, 255L).toDF("doc_id")
    val decoded = Multimodal.decodeImages(Multimodal.pngMedia(ids))
      .collect().map(d => d.media_id -> d).toMap
    assert(decoded.size == 5, "every PNG must decode")
    decoded.values.foreach { d =>
      val w = 4 + (d.media_id % 5).toInt
      val h = 3 + (d.media_id % 4).toInt
      assert(d.width == w && d.height == h,
        s"id ${d.media_id}: codec reported ${d.width}x${d.height}, encoded ${w}x$h")
      // driver-side replay of the gradient: PNG is lossless, the decode
      // must recover the exact integer pixel sum
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w)
        expect += ((x * 7 + y * 11 + d.media_id * 13) % 256)
      assert(d.sum_luma == expect,
        s"id ${d.media_id}: pixel sum ${d.sum_luma} != encoded $expect")
      assert(d.n_pixels == w.toLong * h)
      assert(d.mean_luma == expect.toDouble / (w.toLong * h))
    }
  }

  test("real codec: corrupt and null payloads are dropped, not crashed on") {
    import spark.implicits._
    val good = Multimodal.pngMedia(Seq(1L).toDF("doc_id"))
    val bad = Seq((100L, Array[Byte](1, 2, 3)), (101L, null: Array[Byte]))
      .toDF("media_id", "content")
    val out = Multimodal.decodeImages(good.unionByName(bad)).collect()
    assert(out.map(_.media_id).toSeq == Seq(1L),
      s"only the decodable payload may survive: ${out.map(_.media_id).toSeq}")
  }

  test("real audio codec: decoded WAV recovers the exact waveform; corrupt payloads dropped") {
    import spark.implicits._
    val good = Multimodal.wavMedia(Seq(3L).toDF("doc_id"))
    val bad  = Seq((200L, Array[Byte](82, 73, 70)), (201L, null: Array[Byte]))
      .toDF("media_id", "content")
    val out = Multimodal.decodeAudio(good.unionByName(bad)).collect()
    assert(out.map(_.media_id).toSeq == Seq(3L))
    val d = out.head
    // driver-side waveform replay: id=3 → n = 53, s_i = ((93 + 17i) % 2001) − 1000
    val samples = (0 until 53).map(i => ((3L * 31 + i * 17) % 2001) - 1000)
    assert(d.n_samples == 53L && d.sample_rate == 8000)
    assert(d.peak_abs == samples.map(math.abs).max)
    assert(d.sum_sq == samples.map(v => v * v).sum)
    assert(d.rms == math.sqrt(d.sum_sq.toDouble / 53))
  }

  test("real video demux: sampled frames recover exact pixels; bad magic and truncation dropped") {
    import spark.implicits._
    val good = Multimodal.videoMedia(Seq(4L).toDF("doc_id"))
    val full = Multimodal.syntheticVideo(4L)
    val bad = Seq(
      (300L, "NOPE".getBytes("US-ASCII") ++ full.drop(4)), // wrong magic
      (301L, full.take(full.length - 3)),                  // truncated last frame
      (302L, null: Array[Byte])
    ).toDF("media_id", "content")
    val out = Multimodal.demuxVideo(good.unionByName(bad)).collect()
      .sortBy(_.frame_idx)
    // id=4 → 2 + 4%3 = 3 frames, stride 2 samples frames 0 and 2
    assert(out.map(_.media_id).distinct.toSeq == Seq(4L))
    assert(out.map(_.frame_idx).toSeq == Seq(0, 2))
    out.foreach { fr =>
      val w = 4 + ((4 + fr.frame_idx) % 5)
      val h = 3 + ((4 + fr.frame_idx) % 4)
      val expect = (for { y <- 0 until h; x <- 0 until w }
        yield (x * 7 + y * 11 + 4 * 13 + fr.frame_idx * 17) % 256).sum.toLong
      assert(fr.width == w && fr.height == h)
      assert(fr.sum_luma == expect, s"frame ${fr.frame_idx}")
    }
  }
}
