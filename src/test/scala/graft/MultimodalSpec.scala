package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "alpha beta gamma delta", "en", "web", 22L),
    (1L, "the quick brown fox jumps", "en", "web", 25L),
    (2L, "ein zwei drei", "de", "book", 13L),
    (3L, "x", "en", "web", 1L),
    (4L, "hello world hello again", "en", "chat", 23L),
    (5L, "un deux trois quatre", "fr", "web", 20L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("mediaTable: binary content column + typed metadata struct") {
    val m = Multimodal.mediaTable(docs)
    m.schema("content").dataType shouldBe BinaryType
    val rows = m.orderBy("doc_id").collect()
    rows.map(_.getString(1)) shouldBe Array(
      "image", "audio", "video", "image", "audio", "video")
    // content is the UTF-8 bytes of the text
    new String(rows(0).getAs[Array[Byte]]("content"), "UTF-8") shouldBe
      "alpha beta gamma delta"
    // audio rows have no visual dims, images no duration
    val meta1 = rows(1).getStruct(3)
    meta1.getInt(0) shouldBe 0 // width
    meta1.getLong(2) should be > 0L // duration_ms
    meta1.getInt(3) should be > 0 // sample_rate
    val meta0 = rows(0).getStruct(3)
    meta0.getInt(0) should be > 0
    meta0.getLong(2) shouldBe 0L
  }

  test("decodeBatched: mapPartitions plumbing preserves rows and partitioning; " +
    "codec features match the pure-column mirror bit-for-bit") {
    val m = Multimodal.mediaTable(docs).repartition(3)
    val dec = Multimodal.decodeBatched(m, Multimodal.StubCodec, batchSize = 2)
    dec.rdd.getNumPartitions shouldBe 3 // narrow map, no shuffle
    dec.count() shouldBe 6

    val mirror = m.select(
      col("doc_id") +:
        (0 until Multimodal.FeatureDim)
          .map(i => Multimodal.featureCol(col("content"), i).as(s"f$i")): _*)
    val joined = dec
      .select(col("doc_id"), col("features"))
      .join(mirror, "doc_id")
      .collect()
    joined should have length 6
    joined.foreach { r =>
      val fs = r.getSeq[Double](1)
      (0 until Multimodal.FeatureDim).foreach { i =>
        fs(i) shouldBe r.getDouble(2 + i) // exact equality, no tolerance
      }
      all(fs) should (be >= -1.0 and be < 1.0)
    }
  }

  test("resizeFit: exact integer aspect-fit, never upscales, 0-dims pass through") {
    val dims = Seq(
      (1L, 640, 360),  // wide: fit to 128 → 128x72
      (2L, 360, 640),  // tall: → 72x128
      (3L, 100, 50),   // already fits → unchanged
      (4L, 0, 0),      // non-visual → 0x0
      (5L, 500, 500)   // square → 128x128
    ).toDF("doc_id", "width", "height")
    val out = Multimodal.resizeFit(dims, 128, 128)
      .orderBy("doc_id")
      .select("out_w", "out_h")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    out shouldBe Array((128, 72), (72, 128), (100, 50), (0, 0), (128, 128))
  }

  test("frameSample: duration/interval + 1 frames per timed row, images excluded") {
    val m = Multimodal.mediaTable(docs)
    val frames = Multimodal.frameSample(m, 2000)
    frames.filter(col("media_type") === "image").count() shouldBe 0
    val perDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durations = m.filter(col("meta.duration_ms") > 0)
      .select(col("doc_id"), col("meta.duration_ms")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    durations.foreach { case (id, d) =>
      perDoc(id) shouldBe (d / 2000 + 1)
    }
    // frame timestamps are the sample grid
    val f1 = frames.filter(col("doc_id") === 1L).orderBy("frame_idx")
      .select("frame_ts_ms").collect().map(_.getLong(0))
    f1 shouldBe Array.tabulate(f1.length)(i => i * 2000L)
  }

  test("codec contract: batch shape reaches the codec intact") {
    val batchSizes = spark.sparkContext.collectionAccumulator[Int]("batches")
    val recording = new Multimodal.MediaCodec {
      override def decodeBatch(batch: Seq[MediaRow]): Seq[Multimodal.DecodedRow] = {
        batchSizes.add(batch.size)
        Multimodal.StubCodec.decodeBatch(batch)
      }
    }
    val m = Multimodal.mediaTable(docs).coalesce(1)
    Multimodal.decodeBatched(m, recording, batchSize = 4).count() shouldBe 6
    // 6 rows in one partition, batch size 4 → batches of 4 and 2
    import scala.jdk.CollectionConverters._
    batchSizes.value.asScala.toVector.sorted shouldBe Vector(2, 4)
  }
}
