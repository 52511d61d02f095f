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

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    d / (na * nb)
  }

  test("imageEmbedding: near-identical images land at cosine ~1, unrelated decorrelate") {
    def gradientPng(flip: Boolean, blemish: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 32; y <- 0 until 32) {
        val v = if (flip) 255 - (x * 8 + y) % 256 else (x * 8 + y) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      if (blemish) img.setRGB(5, 5, 0xff0000) // one-pixel edit
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = Seq(
      (1L, gradientPng(flip = false, blemish = false)),
      (2L, gradientPng(flip = false, blemish = true)), // near-dup of 1
      (3L, gradientPng(flip = true, blemish = false))  // inverted: unrelated
    ).toDF("media_id", "payload")
    val embs = Multimodal.imageEmbedding(spark, df, grid = 8)
      .collect().map(e => e.media_id -> e.embedding).toMap
    assert(embs.values.forall(_.length == 64))
    assert(embs.values.forall(v =>
      math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-4),
      "embeddings must be L2-normalized")
    val near = cos(embs(1L), embs(2L))
    val far = cos(embs(1L), embs(3L))
    assert(near > 0.999, s"one-pixel edit must stay near-identical: $near")
    assert(near > far + 0.05, s"inverted image must decorrelate: near=$near far=$far")
  }

  test("imageEmbedding edge inputs: truncated payloads fall to the stub, black images stay unit-norm") {
    val truncated = pngBytes(32, 32).take(60) // valid magic, dies mid-decode
    val black = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val embs = Multimodal.imageEmbedding(spark,
        Seq((1L, truncated), (2L, black)).toDF("media_id", "payload"))
      .collect().map(e => e.media_id -> e.embedding).toMap
    // One damaged file must never kill the job — and EVERY embedding,
    // including the zero-luminance image's, honors the unit-norm contract
    // (a zero vector would NaN-poison downstream cosines).
    for ((id, v) <- embs) {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"media $id norm $n")
    }
  }

  test("image bytes → embedding → PQ encode → IVFADC: the binary-to-code-search bridge") {
    // E110 × E139/E142 end-to-end (round 13): the opaque-binary column
    // decodes to the 64-float embedding, the embedding quantizes to PQ
    // codes, and a code-domain IVFADC search finds each image's
    // near-identical twin — the full path a 100 TB image lake takes
    // from bytes on disk to searchable codes, with the ADC stage
    // value-checked against a local recompute (the oracle arithmetic on
    // the deterministic decode tier).
    import graft.operators.{KmeansOps, PqOps}
    def patternPng(a: Int, b: Int, blemish: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 32; y <- 0 until 32) {
        val v = (x * a + y * b) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      if (blemish) img.setRGB(3, 3, 0xff0000)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val patterns = Seq((3, 11), (7, 2), (13, 5), (1, 17))
    val media = patterns.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i, patternPng(a, b, blemish = false)),
        (2L * i + 1, patternPng(a, b, blemish = true))) // near-dup twin
    }.toDF("media_id", "payload")
    val embs = Multimodal.imageEmbedding(spark, media, grid = 8)
      .toDF().withColumnRenamed("media_id", "vec_id")
    val coarse = KmeansOps.fit(embs, "embedding", "vec_id", k = 2, iters = 2)
    val model = PqOps.fitPq(embs, "embedding", "vec_id", m = 4, kCodes = 4, iters = 2)
    val codes = PqOps.attachCells(
      PqOps.encode(embs, "embedding", "vec_id", model),
      coarse.assignments.select($"vec_id", $"cluster"), "vec_id")
    val queries = embs.filter($"vec_id" % 2 === 0)
      .select($"vec_id".as("qid"), $"embedding")
    val got = PqOps.ivfAdcSearch(codes, "cell", "vec_id", queries, "qid",
        "embedding", model, coarse.centroids, topN = 3, nprobe = 2)
      .as[(Long, Int, Long, Double)].collect()
    // Each base image's blemished twin quantizes into its neighborhood:
    // the twin must appear in the code-domain top-3.
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._3).contains(qid + 1),
        s"query $qid did not retrieve its near-identical twin: ${rows.toSeq}")
    }
    // ADC exactness on the decoded tier: every returned score equals the
    // local sum of squared 6-dp subspace lookups.
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val books = model.codebooks.as[(Int, Int, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val subv = PqOps.subvectors(embs, "embedding", "vec_id", 4)
      .as[(Long, Int, Seq[Double])].collect().map(r => (r._1, r._2) -> r._3).toMap
    val codeOf = codes.select($"vec_id", $"sub", $"code")
      .as[(Long, Int, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    def l2(a: Seq[Double], b: Seq[Double]) =
      r6(math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum))
    got.foreach { case (qid, _, vid, adc) =>
      val want = r6((0 until 4).map { s =>
        val d = l2(subv((qid, s)), books((s, codeOf((vid, s))))); d * d
      }.sum)
      assert(adc == want, s"ADC($qid, $vid) = $adc, local recompute $want")
    }
  }

  test("audioEnvelope decodes wider PCM than 16-bit (24-bit must not read as silence)") {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 24, 1, true, false)
    // 2000 frames of a loud 24-bit square wave, little-endian.
    val pcm = new Array[Byte](2000 * 3)
    for (i <- 0 until 2000) {
      val v = if ((i / 8) % 2 == 0) 6000000 else -6000000
      pcm(3 * i) = (v & 0xff).toByte
      pcm(3 * i + 1) = ((v >> 8) & 0xff).toByte
      pcm(3 * i + 2) = ((v >> 16) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 2000L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val meta = Multimodal.audioEnvelope(spark,
        Seq((1L, out.toByteArray)).toDF("media_id", "payload"), bins = 4)
      .collect().head
    assert(meta.format == "wav" && meta.sample_rate == 8000)
    assert(meta.envelope.forall(_ > 0.5),
      s"a loud 24-bit file must not read as silence: ${meta.envelope.toSeq}")
  }

  test("imageEmbedding feeds the native vector operators (the ANN bridge)") {
    val img1 = pngBytes(16, 16)
    val df = Seq((1L, img1), (2L, img1), (3L, "other payload".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val embs = Multimodal.imageEmbedding(spark, df).toDF("media_id", "embedding")
    // Exact-duplicate payloads must be cosine-1 under the NATIVE expression
    // — the handshake the SRP/KNN/SemDeDup family consumes.
    val c = embs.as("a").join(embs.as("b"),
        $"a.media_id" === 1L && $"b.media_id" === 2L)
      .select(graft.functions.VectorFunctions.cosine(
        $"a.embedding", $"b.embedding").as("c"))
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-6, s"identical images must be cosine 1, got $c")
  }

  test("image embeddings flow through SemDeDup end to end (binary -> vector -> purge)") {
    // Two byte-identical renders of the same scene + one unrelated image:
    // the full multimodal curation path — decode, embed, cluster, purge
    // the semantic duplicate — with the near-dup's LARGER id dropped.
    def scene(invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 16; y <- 0 until 16) {
        val v = if (invert) 255 - x * 16 else x * 16
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      (1L, scene(invert = false)),
      (2L, scene(invert = false)),
      (3L, scene(invert = true))).toDF("media_id", "payload")
    val embs = Multimodal.imageEmbedding(spark, media)
      .toDF("media_id", "embedding")
    val verdicts = graft.operators.KmeansOps.semanticPurge(
        embs, "embedding", "media_id", k = 2, iters = 2, minCos = 0.999)
      .select($"media_id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(verdicts == Map(1L -> true, 2L -> false, 3L -> true),
      s"the duplicate render's larger id must purge, got $verdicts")
  }

  test("audio bytes → envelope → SRP near-dup: the second codec tier bridges to dedup") {
    // E111 × E90 end-to-end (round 14), mirroring the image → PQ chain:
    // real WAV payloads decode to the amplitude envelope, the envelope
    // IS a vector the banded-SRP near-dup consumes directly — a tone
    // and its near-identical twin (same temporal shape, 2 % quieter)
    // collide in a band and verify at cosine ≈ 1, while tones with
    // disjoint temporal support stay apart. Frequency alone can't
    // separate envelopes (mean |amplitude| is frequency-blind), so the
    // fixtures differ in WHERE the energy sits over time.
    import graft.operators.SrpOps
    def wavBytes(samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // 16 bins × 1000 samples; mask says which bins carry the square tone.
    def tone(mask: Int => Boolean, amp: Short): Array[Short] =
      Array.tabulate[Short](16000) { i =>
        if (!mask(i / 1000)) 0
        else if ((i / 8) % 2 == 0) amp else (-amp).toShort
      }
    val shapes: Seq[Int => Boolean] = Seq(
      b => b < 8,            // energy in the first half
      b => b >= 8,           // energy in the second half (disjoint)
      b => b % 2 == 0)       // alternating bins (cos 0.5 to each half)
    val media = shapes.zipWithIndex.flatMap { case (mask, i) =>
      Seq((2L * i, wavBytes(tone(mask, 30000))),
        (2L * i + 1, wavBytes(tone(mask, 29400)))) // 2 % quieter twin
    }.toDF("media_id", "payload")
    val envs = Multimodal.audioEnvelope(spark, media, bins = 16)
      .toDF().select($"media_id".as("vec_id"), $"envelope".as("embedding"))
    val banded = SrpOps.bandedSrp(envs, "embedding", "vec_id",
      nBands = 4, bitsPerBand = 8)
    val pairs = SrpOps.neardupPairs(banded.bands, "embedding", "vec_id", 0.99)
      .select($"vid_a", $"vid_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (2L, 3L), (4L, 5L)),
      s"each tone must near-dup exactly its quieter twin, got $pairs")
  }

  test("audioEnvelope really decodes WAV via javax.sound: header + silence/tone envelope") {
    def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // 8000 samples at 8 kHz: first half silence, second half a loud square.
    val samples = Array.tabulate[Short](8000)(i =>
      if (i < 4000) 0 else if ((i / 8) % 2 == 0) 30000 else -30000)
    val df = Seq(
      (1L, wavBytes(8000, samples)),
      (2L, "definitely not audio".getBytes("UTF-8"))).toDF("media_id", "payload")
    val metas = Multimodal.audioEnvelope(spark, df, bins = 8)
      .collect().map(m => m.media_id -> m).toMap
    val wav = metas(1L)
    assert(wav.format == "wav" && wav.sample_rate == 8000 && wav.channels == 1)
    assert(wav.n_frames == 8000L)
    val env = wav.envelope
    assert(env.length == 8)
    assert(env.take(4).forall(_ < 0.01), s"first half must be silence: ${env.toSeq}")
    assert(env.drop(4).forall(_ > 0.8), s"second half must be loud: ${env.toSeq}")
    assert(metas(2L).format == "stub", "non-audio payloads take the stub path")
  }
}
