package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  private def media = Multimodal.synthesize(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
    "doc_id", "text")

  test("synthesized media table has the canonical schema") {
    val df = media
    assert(df.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "content", "source"))
    assert(df.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(df.count() > 0)
  }

  test("decodeMeta adds deterministic width/height/channels/n_bytes") {
    def run() = Multimodal.decodeMeta(media)
      .drop("content").orderBy("media_id").collect()
    val (d1, d2) = (run(), run())
    assert(d1.map(_.toString).toSeq == d2.map(_.toString).toSeq)
    val r = Multimodal.decodeMeta(media).orderBy("media_id").head()
    assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("channels") == 3)
    assert(r.getAs[Long]("n_bytes") > 0)
  }

  test("extractFeatures yields fixed-dim embeddings feeding ANN ops") {
    val feats = Multimodal.extractFeatures(media, dim = 32)
    assert(feats.schema.fieldNames.toSeq == Seq("media_id", "embedding"))
    val sizes = feats.select(size(col("embedding"))).distinct().collect()
    assert(sizes.map(_.getInt(0)).toSeq == Seq(32))
    // embeddings are usable by the similarity operators
    val topk = graft.operators.Similarity.bruteForceTopK(
      feats, feats.filter(col("media_id") < 2), "media_id", "embedding", 3)
    assert(topk.count() == 6)
  }

  test("sampleFrames explodes per-frame rows partition-locally") {
    val frames = Multimodal.sampleFrames(media, everyNth = 1)
    assert(frames.count() >= media.count())
    assert(frames.schema.fieldNames.contains("frame_idx"))
  }
}
