package graft

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{MediaFeatures, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = MultimodalOps.syntheticMedia(spark, 30)

  test("extractFeatures is deterministic, partition-local, schema-stable") {
    val f1 = MultimodalOps.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = MultimodalOps.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length == 30)
    // repartitioning must not change any value (pure per-row codec)
    assert(f1.zip(f2).forall { case (a, b) =>
      a.media_id == b.media_id && a.checksum == b.checksum &&
        a.n_bytes == b.n_bytes && a.feature.sameElements(b.feature)
    })
    assert(f1.forall(_.feature.length == 8))
    assert(f1.forall(f => f.feature.forall(v => v >= 0f && v <= 1f)))
  }

  test("a custom codec plugs into the same seam") {
    object CountingCodec extends MultimodalOps.Codec {
      override def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
        rows.map(r => MediaFeatures(r.media_id, r.kind, 0L, 42L, Array(1f)))
    }
    val out = MultimodalOps.extractFeatures(media, CountingCodec).collect()
    assert(out.forall(_.checksum == 42L))
  }

  test("sampleFrames emits one row per spacing interval, media rows only") {
    val frames = MultimodalOps.sampleFrames(media.toDF(), everyMs = 500L)
    val byId = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    // images (duration 0) excluded
    val images = media.filter(_.kind == "image").map(_.media_id).collect()
    assert(images.forall(id => !byId.contains(id)))
    // audio/video: ceil(duration/500) frames
    val durations = media.filter(m => m.kind != "image")
      .map(m => (m.media_id, m.duration_ms)).collect().toMap
    durations.foreach { case (id, dur) =>
      val expected = (dur + 499) / 500
      assert(byId(id) == expected, s"media $id: ${byId(id)} != $expected")
    }
    // frame timestamps are the arithmetic grid
    val f0 = frames.filter($"media_id" === 1).orderBy("frame_no")
      .select("frame_ts_ms").as[Long].collect()
    assert(f0.toSeq == (0L until durations(1L) by 500L).toSeq)
  }

  test("mediaStats never needs payload bytes (column pruning path)") {
    val stats = MultimodalOps.mediaStats(media.toDF())
    val rows = stats.collect().map(r => r.getAs[String]("kind") -> r.getAs[Long]("n_items")).toMap
    assert(rows.values.sum == 30)
    assert(rows.keySet == Set("image", "audio", "video"))
  }

  test("ImageIoCodec decodes a generated PNG byte array back to its exact pixels") {
    // single image encoded locally, decoded through the codec seam
    val img = MultimodalOps.syntheticImages(spark, 3).filter(_.media_id == 2L).head()
    assert(img.payload.take(8).map(_ & 0xff).sameElements(
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))) // real PNG magic
    val feat = MultimodalOps.ImageIoCodec.decodeBatch(Iterator(img)).next()
    // expected channel means from the pixel formula
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until MultimodalOps.SynthH; x <- 0 until MultimodalOps.SynthW) {
      val (r, g, b) = MultimodalOps.synthPixel(2L, x, y)
      sr += r; sg += g; sb += b
    }
    val n = MultimodalOps.SynthW.toLong * MultimodalOps.SynthH
    assert(feat.feature(0) == sr.toFloat / n / 255f)
    assert(feat.feature(1) == sg.toFloat / n / 255f)
    assert(feat.feature(2) == sb.toFloat / n / 255f)
    assert(feat.feature(3) == MultimodalOps.SynthW / 4096f)
    // a corrupt payload degrades, never throws
    val bad = img.copy(payload = Array[Byte](1, 2, 3))
    assert(MultimodalOps.ImageIoCodec.decodeBatch(Iterator(bad)).next().feature.sum == 0f)
  }

  test("decodeImageStats: distributed decode matches the pixel formula; real resize roundtrips") {
    val stats = MultimodalOps.decodeImageStats(MultimodalOps.syntheticImages(spark, 10), 8, 6)
      .as[(Long, Int, Int, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats.size == 10)
    val s3 = stats(3L)
    var sr = 0L
    for (y <- 0 until 24; x <- 0 until 32) sr += MultimodalOps.synthPixel(3L, x, y)._1
    var srr = 0L
    for (ry <- 0 until 6; rx <- 0 until 8) srr += MultimodalOps.synthPixel(3L, rx * 4, ry * 4)._1
    assert(s3._2 == 32 && s3._3 == 24 && s3._4 == 768L)
    assert(s3._5 == sr && s3._8 == srr)
    // resizeImagesReal: re-encoded payload decodes to the sampled grid
    val resized = MultimodalOps.resizeImagesReal(MultimodalOps.syntheticImages(spark, 4), 8, 6)
      .filter(_.media_id == 1L).head()
    assert(resized.width == 8 && resized.height == 6)
    val rimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized.payload))
    assert(rimg.getWidth == 8 && rimg.getHeight == 6)
    val (er, eg, eb) = MultimodalOps.synthPixel(1L, 2 * 4, 3 * 4)
    val p = rimg.getRGB(2, 3)
    assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) == ((er, eg, eb)))
  }

  test("decodeAudioStats: javax.sound decode of generated WAVs matches the sample formula") {
    val wav = MultimodalOps.syntheticWavs(spark, 3).filter(_.media_id == 2L).head()
    assert(new String(wav.payload.take(4), "US-ASCII") == "RIFF") // real RIFF magic
    // direct decode through the same JDK codec the operator uses
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav.payload))
    assert(in.getFormat.getSampleRate == 8000f && in.getFormat.getChannels == 1)

    val stats = MultimodalOps.decodeAudioStats(MultimodalOps.syntheticWavs(spark, 10))
      .as[(Long, Int, Long, Long, Long, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats.size == 10)
    val s7 = stats(7L)
    val ns = 64 + 7 % 64
    val samples = (0 until ns).map(i => MultimodalOps.synthSample(7L, i))
    assert(s7._2 == 8000 && s7._3 == ns.toLong)
    assert(s7._4 == samples.map(_.toLong).sum)
    assert(s7._5 == samples.map(s => math.abs(s).toLong).sum)
    assert(s7._6 == samples.min && s7._7 == samples.max)
    // junk payload is dropped, not an error
    val junk = Seq(MultimodalOps.MediaRow(99L, "audio", null,
      Array[Byte](1, 2, 3, 4), 0, 0, 0L, 8000)).toDS()
    assert(MultimodalOps.decodeAudioStats(junk).count() == 0)
  }

  test("decodeVideoFrameStats: demux + per-frame PNG decode matches the pixel formula") {
    val stats = MultimodalOps.decodeVideoFrameStats(MultimodalOps.syntheticVideos(spark, 8))
      .as[(Long, Int, Long, Long, Long)].collect()
    // clip id has 2 + id%4 frames
    val byClip = stats.groupBy(_._1)
    assert(byClip.keySet == (0L until 8L).toSet)
    byClip.foreach { case (id, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0 until (2 + (id % 4).toInt)))
    }
    // spot-check one frame's channel sums against the formula
    // (clip 6 has 2 + 6%4 = 4 frames, so frame 3 exists)
    val r63 = stats.find(s => s._1 == 6L && s._2 == 3).get
    var (er, eg, eb) = (0L, 0L, 0L)
    for (y <- 0 until MultimodalOps.VideoH; x <- 0 until MultimodalOps.VideoW) {
      val (r, g, b) = MultimodalOps.videoPixel(6L, 3, x, y)
      er += r; eg += g; eb += b
    }
    assert((r63._3, r63._4, r63._5) == ((er, eg, eb)))
    // truncated/corrupt containers are dropped, not errors
    val bad = Seq(
      MultimodalOps.MediaRow(90L, "video", null, "GFV1".getBytes("US-ASCII"), 0, 0, 0L, 0),
      MultimodalOps.MediaRow(91L, "video", null, Array[Byte](1, 2), 0, 0, 0L, 0)
    ).toDS()
    assert(MultimodalOps.decodeVideoFrameStats(bad).count() == 0)
  }

  test("dHash: perturbed re-encode pairs with its original, distinct images don't") {
    def img(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) b.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", bos)
      bos.toByteArray
    }
    // strong horizontal gradient -> well-defined dHash bits
    val base = img(32, 24)((x, y) => ((x * 8) << 16) | ((y * 10) << 8) | (x * y % 256))
    // tiny perturbation: one pixel changed — hamming stays near 0
    val near = img(32, 24)((x, y) =>
      if (x == 31 && y == 23) 0 else ((x * 8) << 16) | ((y * 10) << 8) | (x * y % 256))
    // reversed gradient -> most bits flip
    val far = img(32, 24)((x, y) => (((31 - x) * 8) << 16) | ((y * 10) << 8) | 0)
    val rows = Seq(
      MediaRow(1L, "image", null, base, 32, 24, 0L, 0),
      MediaRow(2L, "image", null, near, 32, 24, 0L, 0),
      MediaRow(3L, "image", null, far, 32, 24, 0L, 0)).toDS()
    val hashes = MultimodalOps.imageDHashes(rows)
    val pairs = MultimodalOps.imageNearDupPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    // the kernel equals a driver-side recompute on the decoded image
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val h1 = hashes.filter($"media_id" === 1L).select("dhash").as[Long].head()
    assert(h1 == MultimodalOps.dHash64(decoded))
  }

  test("audio fingerprint: decode equals the sample-arithmetic recompute") {
    val wavs = MultimodalOps.syntheticWavs(spark, 20)
    val got = MultimodalOps.audioFingerprints(wavs)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 20)
    (0L until 20L).foreach { id =>
      val n = 64 + (id % 64).toInt
      val samples = Array.tabulate(n)(i => MultimodalOps.synthSample(id, i))
      assert(got(id) == MultimodalOps.audioGradientHash64(samples), s"clip $id")
    }
  }

  test("video frame dHashes: one hash per demuxed frame, stable across partitionings") {
    val vids = MultimodalOps.syntheticVideos(spark, 12)
    val got = MultimodalOps.videoFrameDHashes(vids)
      .as[(Long, Int, Long)].collect().sortBy(t => (t._1, t._2))
    assert(got.length == (0L until 12L).map(id => 2 + (id % 4).toInt).sum)
    val reparted = MultimodalOps.videoFrameDHashes(vids.repartition(5))
      .as[(Long, Int, Long)].collect().sortBy(t => (t._1, t._2))
    assert(got.sameElements(reparted))
  }

  test("sceneChanges agrees with pairwise dHash deltas and plans zero shuffles") {
    // the frame term shifts all pixels by a constant, which only flips
    // a gradient bit when mod-256 wraps — needs ids large enough to wrap
    val vids = MultimodalOps.syntheticVideos(spark, 60)
    // reference: pair consecutive hashes from the proven demux path
    val hashes = MultimodalOps.videoFrameDHashes(vids)
      .as[(Long, Int, Long)].collect().sortBy(t => (t._1, t._2))
    val want = hashes.groupBy(_._1).flatMap { case (id, fs) =>
      fs.sortBy(_._2).sliding(2).collect {
        case Array((_, _, a), (_, f, b))
          if java.lang.Long.bitCount(a ^ b) >= 4 =>
            (id, f, java.lang.Long.bitCount(a ^ b).toLong)
      }
    }.toSet
    val scenes = MultimodalOps.sceneChanges(vids, minHamming = 4)
    val got = scenes.as[(Long, Int, Long)].collect().toSet
    assert(got == want && got.nonEmpty)

    val plan = scenes.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"consecutive-frame pairing lives in the demux — no shuffle:\n$plan")
  }

  test("videoNearDupPairs: a re-posted clip pairs at containment 1.0") {
    val vids = MultimodalOps.syntheticVideos(spark, 6)
    // clip 100 = byte-identical re-post of clip 2's container
    val repost = vids.filter(_.media_id == 2L).head().copy(media_id = 100L)
    val all = vids.union(Seq(repost).toDS())
    // small-id synthetic frames share one dHash per clip (constant
    // shift), so the re-post overlaps in exactly 1 distinct hash
    val pairs = MultimodalOps.videoNearDupPairs(
        MultimodalOps.videoFrameDHashes(all), minShared = 1L)
      .as[(Long, Long, Long, Double)].collect()
    val hit = pairs.find(p => p._1 == 2L && p._2 == 100L)
    assert(hit.isDefined, s"re-post not found in ${pairs.toList}")
    assert(hit.get._4 == 1.0, s"containment should be exactly 1.0: $hit")
    // the capBuckets guard kills the join when every clip shares a hash
    val capped = MultimodalOps.videoNearDupPairs(
      MultimodalOps.videoFrameDHashes(all), minShared = 1L, bucketCap = 1L)
    assert(capped.count() == 0L)
  }

  test("resizeImages rewrites image dimensions, passes other modalities through") {
    val out = MultimodalOps.resizeImages(media, 224, 224).collect()
    assert(out.length == 30)
    out.foreach { r =>
      if (r.kind == "image") assert(r.width == 224 && r.height == 224)
      else assert(r.width == 0 && r.height == 0) // untouched
      assert(r.payload != null && r.payload.nonEmpty) // payload carried through
    }
  }
}
