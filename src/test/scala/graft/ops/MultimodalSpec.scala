package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media plumbing: payload bytes survive, features deterministic") {
    val docs = Seq((0L, "abc"), (1L, "a longer payload " * 10)).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val expectedChecksum = "abc".getBytes("UTF-8").map(_ & 0xff).sum.toLong
    val f0 = Multimodal.features(spark, docs).filter($"doc_id" === 0)
      .as[Multimodal.MediaFeatures].head()
    assert(f0.n_bytes == 3)
    assert(f0.checksum == expectedChecksum)
    assert(f0.frames_sampled == 0)
    val f1 = Multimodal.features(spark, docs).filter($"doc_id" === 1)
      .as[Multimodal.MediaFeatures].head()
    assert(f1.n_bytes == "a longer payload ".length * 10)
    assert(f1.frames_sampled == math.min(8, f1.n_bytes / 64))
  }

  test("metadata derivation is stable per doc_id") {
    val docs = Seq((7L, "x")).toDF("doc_id", "text")
    val row = Multimodal.asMediaTable(docs).head()
    assert(row.getAs[Int]("width") == (7 % 640 + 64))
    assert(row.getAs[Int]("height") == (7 % 480 + 48))
    assert(Set("jpeg", "png", "webp").contains(row.getAs[String]("format")))
  }
}
