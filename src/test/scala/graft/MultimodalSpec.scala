package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

/** Multimodal plumbing with a REAL decode step: BMP header build/parse
  * round-trips, malformed payloads fail like a production decode stage,
  * and the batch mapPartitions shape produces fixed-dim features.
  */
class MultimodalSpec extends SparkFixture {

  test("media table exposes a binary payload with typed metadata") {
    val m = Multimodal.media(spark, sfTiny)
    assert(m.schema("payload").dataType == BinaryType)
    assert(m.schema("meta").dataType.isInstanceOf[StructType])
    val row = m.orderBy("media_id").limit(1).collect()(0)
    val payload = row.getAs[Array[Byte]]("payload")
    assert(payload.nonEmpty)
  }

  test("BMP encode/decode round-trips header fields and pixel bytes") {
    val data = "the quick brown fox jumps over the lazy dog " * 5 // 220 bytes
    val bytes = data.getBytes("UTF-8")
    val bmp = Multimodal.encodeBmpGray(bytes)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val img = Multimodal.decodeBmpGray(bmp)
    assert(img.width == Multimodal.BmpWidth)
    assert(img.height == (bytes.length + img.width - 1) / img.width) // 4 rows
    assert(img.bitsPerPixel == 8)
    // pixels = original bytes + zero padding to the row boundary
    assert(img.pixels.take(bytes.length).toSeq == bytes.toSeq)
    assert(img.pixels.drop(bytes.length).forall(_ == 0))
    // empty input still yields a valid 1-row image
    val empty = Multimodal.decodeBmpGray(Multimodal.encodeBmpGray(Array.empty[Byte]))
    assert(empty.width == Multimodal.BmpWidth && empty.height == 1)
    assert(empty.pixels.forall(_ == 0))
  }

  test("malformed payloads raise IllegalArgumentException, not garbage") {
    val bmp = Multimodal.encodeBmpGray("hello".getBytes("UTF-8"))
    intercept[IllegalArgumentException] { // bad magic
      Multimodal.decodeBmpGray("not a bitmap at all".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] { // truncated pixel array
      Multimodal.decodeBmpGray(bmp.take(bmp.length - 10))
    }
    val wrongBpp = bmp.clone()
    wrongBpp(28) = 24 // claim 24-bit
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmpGray(wrongBpp)
    }
  }

  test("feature extraction decodes for real: dims from the header, fixed-dim features") {
    val f = Multimodal.decodeFeatures(spark, Multimodal.mediaBmp(spark, sfTiny))
    val rows = f.orderBy("media_id").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Int]("width") == Multimodal.BmpWidth)
      assert(r.getAs[Int]("height") >= 1)
      // decoded dims must cover the original byte count from the metadata
      val nBytes = r.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes")
      assert(r.getAs[Int]("width").toLong * r.getAs[Int]("height") >= nBytes)
      val feats: scala.collection.Seq[Float] = r.getSeq[Float](r.fieldIndex("features"))
      assert(feats.length == Multimodal.FeatureDim)
      assert(math.abs(feats.sum - 1.0f) < 1e-3, s"not normalized: ${feats.sum}")
      val argmax = r.getAs[Int]("dominant_bucket")
      assert(feats(argmax) == feats.max)
    }
  }

  test("histogram of known bytes") {
    val h = Multimodal.histogram("aaab".getBytes("UTF-8"))
    // 'a' = 97 → bucket 97 % 16 = 1 ; 'b' = 98 → bucket 2
    assert(h(1) == 0.75f && h(2) == 0.25f)
  }

  test("qmm_meta byte lengths equal n_chars for the ASCII corpus") {
    val m = graft.etl.Registry.byName("qmm_meta").build(spark, sfTiny)
    val mismatch = m.join(graft.etl.Tables.documents(spark, sfTiny),
        col("media_id") === col("doc_id"))
      .filter(col("n_bytes") =!= col("n_chars"))
    assert(mismatch.count() == 0)
  }

  test("resizeHalf: block means, halved dims, edge clamping on odd heights") {
    // 4x2 image: blocks {1,2,5,6} -> 3 (14/4) and {3,4,7,8} -> 5 (22/4)
    val img = graft.multimodal.BmpImage(4, 2, 8, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    val half = Multimodal.resizeHalf(img)
    assert(half.width == 2 && half.height == 1)
    assert(half.pixels.toSeq == Seq(3.toByte, 5.toByte))
    // odd height: 4x3 -> 2x1; the clamped second block row is dropped by
    // h/2 but the remaining block still averages only existing pixels
    val odd = graft.multimodal.BmpImage(4, 3, 8,
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
    val oh = Multimodal.resizeHalf(odd)
    assert(oh.width == 2 && oh.height == 1 && oh.pixels.toSeq == Seq(3.toByte, 5.toByte))
    // 1x1 floor: never collapses to zero size
    val tiny = Multimodal.resizeHalf(graft.multimodal.BmpImage(1, 1, 8, Array[Byte](42)))
    assert(tiny.width == 1 && tiny.height == 1 && tiny.pixels.head == 42.toByte)
  }

  test("qmm_resize round-trips: re-encoded payload decodes to the halved image") {
    val data = Array.tabulate[Byte](Multimodal.BmpWidth * 4)(i => (i % 251).toByte)
    val img = Multimodal.decodeBmpGray(Multimodal.encodeBmpGray(data))
    val half = Multimodal.resizeHalf(img)
    val re = Multimodal.decodeBmpGray(
      Multimodal.encodeBmpGray(half.pixels, half.width))
    assert(re.width == half.width && re.height == half.height)
    assert(re.pixels.toSeq == half.pixels.toSeq)
    // and the declared query produces consistent dims at sfTiny
    val out = graft.etl.Registry.byName("qmm_resize").build(spark, sfTiny)
    assert(out.filter(col("new_width") =!= col("width") / 2).count() == 0)
    assert(out.filter(col("pixel_sum") < 0).count() == 0)
  }

  test("encode handles non-multiple-of-4 widths via the spec stride (resize of width 36 → 18)") {
    // a width-36 source halves to 18 — encodeBmpGray must pad rows to the
    // 4-byte stride (20) instead of rejecting the width, and the decoder
    // must drop the padding on the way back
    for (w <- Seq(18, 1, 3, 5, 33)) {
      val data = Array.tabulate[Byte](w * 3)(i => ((i * 7) % 251).toByte)
      val re = Multimodal.decodeBmpGray(Multimodal.encodeBmpGray(data, w))
      assert(re.width == w && re.height == 3)
      assert(re.pixels.toSeq == data.toSeq)
    }
    val img = Multimodal.decodeBmpGray(
      Multimodal.encodeBmpGray(Array.tabulate[Byte](36 * 4)(_.toByte), 36))
    val half = Multimodal.resizeHalf(img)
    assert(half.width == 18)
    val re = Multimodal.decodeBmpGray(
      Multimodal.encodeBmpGray(half.pixels, half.width))
    assert(re.width == half.width && re.pixels.toSeq == half.pixels.toSeq)
  }

  test("video container: frame 0 is the base image, stride samples the right frames") {
    val data = Array.tabulate[Byte](200)(i => ((i * 3) % 250).toByte)
    val video = Multimodal.encodeVideoGray(data, nFrames = 6)
    // stride 1 = every frame; frame 0 decodes to exactly the base pixels
    val all = Multimodal.sampleFrames(video, stride = 1)
    assert(all.map(_._1) == Seq(0, 1, 2, 3, 4, 5))
    assert(all.head._2.pixels.take(data.length).toSeq == data.toSeq)
    // frame f = base + 7f mod 256, checked pixel-for-pixel on a later frame
    val f3 = all(3)._2.pixels
    data.indices.foreach { i =>
      assert((f3(i) & 0xFF) == ((data(i) & 0xFF) + 21) % 256, s"pixel $i")
    }
    // stride 2 samples exactly frames 0, 2, 4
    assert(Multimodal.sampleFrames(video, stride = 2).map(_._1) == Seq(0, 2, 4))
    // skipped-frame independence: sampled frames are byte-identical whether
    // or not the frames between them were ever touched
    val sparse = Multimodal.sampleFrames(video, stride = 2).map(_._2.pixels.toSeq)
    val dense = all.filter(_._1 % 2 == 0).map(_._2.pixels.toSeq)
    assert(sparse == dense)
  }

  test("video container: malformed magic and truncated frame data raise") {
    val data = Array.tabulate[Byte](64)(_.toByte)
    val video = Multimodal.encodeVideoGray(data, nFrames = 2)
    val badMagic = video.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.sampleFrames(badMagic, 1))
    intercept[IllegalArgumentException](
      Multimodal.sampleFrames(java.util.Arrays.copyOfRange(video, 0, video.length - 5), 1))
    intercept[IllegalArgumentException](Multimodal.sampleFrames(video, 0))
  }

  test("pcm container: encode/decode round trip, negative samples, empty, malformed") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 1234, -4321)
    val pcm = Multimodal.encodePcm(samples, rate = 8000)
    val (rate, back) = Multimodal.decodePcm(pcm)
    assert(rate == 8000 && back.toSeq == samples.toSeq)
    // empty payload is valid (zero samples)
    assert(Multimodal.decodePcm(Multimodal.encodePcm(Array.empty[Short]))._2.isEmpty)
    val badMagic = pcm.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.decodePcm(badMagic))
    intercept[IllegalArgumentException](
      Multimodal.decodePcm(java.util.Arrays.copyOfRange(pcm, 0, pcm.length - 1)))
    // the synth formula matches its documented closed form
    assert(Multimodal.pcmSample(0L, 0) == -32768)
    assert(Multimodal.pcmSample(7L, 3) == ((7 * 31 + 3 * 17) % 65536 - 32768).toShort)
  }

  test("qmm_audio windows match a direct no-container recomputation") {
    // The window fold is hand-rolled (primitive accumulators, round 8);
    // pin its output against the obvious per-index recomputation from the
    // pcmSample formula so a fold bug can't hide behind the driver oracle.
    val docs = graft.etl.Tables.documents(spark, sfTiny)
      .selectExpr("doc_id", "cast(least(n_chars, 1200) as int) as n")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val expected = docs.flatMap { case (id, n) =>
      (0 until n).groupBy(_ / 256).toSeq.map { case (w, idxs) =>
        val vs = idxs.map(i => Multimodal.pcmSample(id, i).toLong)
        (id, w.toLong, vs.size.toLong, vs.sum, vs.map(v => v * v).sum)
      }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = SparkEntry.queries("qmm_audio")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  test("phash: block bits match a direct no-BMP computation; halves stay in 32-bit range") {
    // compute the aHash directly from the formula (no encode/decode), then
    // through the BMP round trip the query uses — they must agree, or the
    // encoder/decoder corrupted pixel placement
    def direct(id: Long): (Long, Long, Long) = {
      val px = Array.tabulate(32 * 32)(i => Multimodal.phashPixel(id, i / 32, i % 32))
      val total = px.map(_.toLong).sum
      var lo = 0L; var hi = 0L; var ones = 0L
      for (by <- 0 until 8; bx <- 0 until 8) {
        var bsum = 0L
        for (dy <- 0 until 4; dx <- 0 until 4) bsum += px((by * 4 + dy) * 32 + (bx * 4 + dx))
        if (bsum * 64 > total) {
          val idx = by * 8 + bx
          if (idx < 32) lo += 1L << idx else hi += 1L << (idx - 32)
          ones += 1
        }
      }
      (lo, hi, ones)
    }
    def viaBmp(id: Long): (Long, Long, Long) = {
      val data = Array.tabulate(32 * 32)(i => Multimodal.phashPixel(id, i / 32, i % 32).toByte)
      val img = Multimodal.decodeBmpGray(Multimodal.encodeBmpGray(data, w = 32))
      val px = img.pixels.map(_ & 0xFF)
      val total = px.map(_.toLong).sum
      var lo = 0L; var hi = 0L; var ones = 0L
      for (by <- 0 until 8; bx <- 0 until 8) {
        var bsum = 0L
        for (dy <- 0 until 4; dx <- 0 until 4) bsum += px((by * 4 + dy) * 32 + (bx * 4 + dx))
        if (bsum * 64 > total) {
          val idx = by * 8 + bx
          if (idx < 32) lo += 1L << idx else hi += 1L << (idx - 32)
          ones += 1
        }
      }
      (lo, hi, ones)
    }
    for (id <- Seq(0L, 1L, 7L, 123L, 99999L)) {
      val d = direct(id); val b = viaBmp(id)
      assert(d == b, s"id $id: direct $d != bmp $b")
      val (lo, hi, ones) = d
      assert(lo >= 0 && lo < (1L << 32) && hi >= 0 && hi < (1L << 32))
      assert(ones == java.lang.Long.bitCount(lo) + java.lang.Long.bitCount(hi))
    }
  }

  test("qmm_histogram: per-image bins sum to 1024 and match the pixel formula") {
    val rows = graft.etl.Registry.byName("qmm_histogram")
      .build(spark, sfTiny).collect()
    val byId = rows.groupBy(_.getLong(0))
    assert(byId.nonEmpty)
    for ((id, g) <- byId.take(20)) {
      assert(g.map(_.getLong(2)).sum == 1024L, s"id $id bins must cover all pixels")
      val expect = new Array[Long](16)
      for (y <- 0 until 32; x <- 0 until 32)
        expect(graft.multimodal.Multimodal.phashPixel(id, y, x) >> 4) += 1L
      for (r <- g) assert(r.getLong(2) == expect(r.getLong(1).toInt),
        s"id $id bin ${r.getLong(1)}")
    }
  }

  test("qmm_silence: tail counts match a direct fold over the sample formula") {
    val rows = graft.etl.Registry.byName("qmm_silence")
      .build(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    for (r <- rows.take(30)) {
      val id = r.getLong(0); val n = r.getLong(1).toInt
      val samples = Array.tabulate(n)(i => graft.multimodal.Multimodal.pcmSample(id, i))
      assert(r.getLong(2) == samples.count(v => math.abs(v.toLong) < 1000L))
      assert(r.getLong(3) == samples.count(v => math.abs(v.toLong) > 32000L))
      assert(r.getLong(4) == samples.map(_.toLong).min)
      assert(r.getLong(5) == samples.map(_.toLong).max)
    }
  }
}
