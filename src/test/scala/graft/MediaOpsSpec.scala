package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaOps
import graft.sources.Tables

class MediaOpsSpec extends SparkSpec {

  test("attachBlobs preserves byte length and schema") {
    val m = MediaOps.attachBlobs(Tables.documents(spark, sfDir))
    val r = m.select(col("n_bytes"), length(col("blob")).cast("long").as("bl")).collect()
    assert(r.nonEmpty && r.forall(x => x.getLong(0) == x.getLong(1)))
    assert(m.schema("blob").dataType.typeName == "binary")
  }

  test("frameSample emits fixed-width frames with the right stride") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 1000)).toDF("doc_id", "text")
    val frames = MediaOps.frameSample(MediaOps.attachBlobs(docs), everyK = 2).collect()
    // 1000 bytes → 4 frames (256-wide); every 2nd → idx 0, 2
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.sameElements(Array(0, 2)))
    val f0 = frames.find(_.getAs[Int]("frame_idx") == 0).get.getAs[Array[Byte]]("frame")
    assert(f0.length == MediaOps.FrameBytes)
  }

  test("decode stub is deterministic, fixed-dim, and distributed via mapPartitions") {
    val media = MediaOps.attachBlobs(Tables.documents(spark, sfDir))
    val f1 = MediaOps.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    val f2 = MediaOps.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(f1.length == media.count())
    assert(f1.forall(_.features.length == MediaOps.FeatureDim))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
  }
}
