package graft.multimodal

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing is real (schema, typed Dataset, per-partition
  * batch shape); image decode is real `javax.imageio`, non-image payloads
  * take the deterministic stub path. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 7 + y * 13) & 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeMeta really decodes PNG and JPEG payloads via javax.imageio") {
    val jpegOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      new java.awt.image.BufferedImage(5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB),
      "jpg", jpegOut)
    val payloads = Seq(
      (1L, pngBytes(2, 2)),
      (2L, pngBytes(17, 9)),
      (3L, jpegOut.toByteArray),
      (4L, "not an image at all".getBytes("UTF-8")))
    val df = payloads.toDF("media_id", "payload")
    val metas = Multimodal.decodeMeta(spark, df).collect().map(m => m.media_id -> m).toMap
    assert(metas(1L).width == 2 && metas(1L).height == 2 && metas(1L).format == "png")
    assert(metas(1L).channels == 3)
    assert(metas(2L).width == 17 && metas(2L).height == 9 && metas(2L).format == "png")
    assert(metas(3L).width == 5 && metas(3L).height == 3 && metas(3L).format == "jpeg")
    assert(metas(4L).format == "stub", "non-image payloads take the stub path")
  }

  private def media = Multimodal.toMediaTable(
    Tables(spark, TestSpark.sfDir, "documents"), "doc_id", "text")

  test("binary payload table has the declared schema") {
    val df = media
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("media_id", "long"), ("payload", "binary")))
    assert(df.count() == 500L)
  }

  test("decodeMeta emits one typed meta row per payload, deterministically") {
    val meta = Multimodal.decodeMeta(spark, media)
    val rows = meta.collect()
    assert(rows.length == 500)
    assert(rows.forall(m => m.width >= 0 && m.width < 640 && m.height >= 0 && m.height < 480))
    assert(rows.forall(_.channels == 3))
    // n_bytes equals the text length (ASCII fixture)
    val expected = Tables(spark, TestSpark.sfDir, "documents")
      .select($"doc_id", length($"text").cast("int").as("len"))
      .as[(Long, Int)].collect().toMap
    assert(rows.forall(m => m.n_bytes == expected(m.media_id)))
    // determinism: second run bit-identical
    val again = Multimodal.decodeMeta(spark, media).collect()
    assert(rows.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("frame sampling fans out rows without shuffling payloads") {
    val frames = Multimodal.sampleFrames(spark, media, everyK = 4)
    val df = frames.toDF()
    assert(df.count() > 500L) // multiple frames per doc
    assert(df.groupBy($"media_id").count().filter($"count" < 1).count() == 0L)
    // narrow plan: no Exchange before the flatMap
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("resize bounds payload size, keeping binary-in/binary-out shape") {
    val resized = Multimodal.resizePayload(spark, media, maxBytes = 100)
    val maxLen = resized.select(max(length($"payload"))).as[Int].head()
    assert(maxLen <= 100)
    assert(resized.schema("payload").dataType.typeName == "binary")
  }
}
