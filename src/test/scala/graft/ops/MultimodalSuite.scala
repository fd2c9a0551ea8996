package graft.ops

import graft.fm.SparkSessionSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType}

class MultimodalSuite extends SparkSessionSuite {

  private def docs = {
    val s = spark
    import s.implicits._
    (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
  }

  test("synthetic media: binary payload + typed metadata schema") {
    val m = Multimodal.syntheticMedia(docs)
    m.schema("payload").dataType shouldBe BinaryType
    m.schema("meta").dataType.typeName shouldBe "struct"
    val kinds = m.select(col("kind")).distinct().collect().map(_.getString(0))
    kinds.toSet shouldBe Set("image", "audio", "video")
  }

  test("decode stub round-trips the planted header through real bytes") {
    val dec = Multimodal.decodeStub(Multimodal.syntheticMedia(docs))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    dec(0L) shouldBe ((16, 16))
    dec(5L) shouldBe ((21, 16 + (5 * 7) % 32))
  }

  test("feature extraction is deterministic and partition-invariant") {
    val media = Multimodal.syntheticMedia(docs)
    def run(parts: Int) = Multimodal
      .extractFeatures(media.repartition(parts), batchSize = 4)
      .collect()
      .map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](1).toList)
      .toMap
    val a = run(1)
    val b = run(7)
    a.keySet shouldBe b.keySet
    a.foreach { case (k, v) => b(k) shouldBe v }
    a(0L).length shouldBe 8
  }

  test("frame sampling explodes 4 frames per video with full coverage") {
    val fr = Multimodal.frameSample(Multimodal.syntheticMedia(docs))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n"), sum(col("frame_len")).as("total"))
      .collect()
    fr.foreach { r =>
      r.getAs[Long]("n") shouldBe 4L
      r.getAs[Long]("total") shouldBe 1024L
    }
  }

  test("resize stub rewrites header and truncates payload") {
    val resized = Multimodal.resizeStub(
      Multimodal.syntheticMedia(docs).filter(col("kind") === "image"), 8, 8)
    val dec = Multimodal.decodeStub(resized).collect()
    dec.foreach { r =>
      r.getAs[Int]("width") shouldBe 8
      r.getAs[Int]("height") shouldBe 8
      r.getAs[Int]("body_len") shouldBe 64
    }
  }

  test("fuzzy dedup finds every planted corruption; exact dedup misses them") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Multimodal.fuzzyDedup.fn(spark, dir).collect()
    graft.InternalCaches.releaseAll()

    // all 50 planted single-byte corruptions surface within hamming 1
    val planted = pairs.filter(r => r.getLong(1) == r.getLong(0) + 10000L)
    planted.length shouldBe 50
    all(planted.map(_.getLong(2))) should be <= 1L

    // the non-planted survivors are the mod-251 body-duplicate pairs —
    // byte-identical BODIES under different headers, which the md5-exact
    // path (over the whole payload) structurally cannot match
    val extra = pairs.filterNot(r => r.getLong(1) == r.getLong(0) + 10000L)
    extra should not be empty
    all(extra.map(_.getLong(2))) should be <= 1L
    val exact = Multimodal.binaryDedup.fn(spark, dir).collect()
      .flatMap(_.getString(2).split(",").map(_.toLong)).toSet
    extra.foreach { r =>
      // at least one side of each extra pair is absent from every exact
      // group (headers differ => different md5)
      assert(!(exact.contains(r.getLong(0)) && exact.contains(r.getLong(1))))
    }
  }
}
