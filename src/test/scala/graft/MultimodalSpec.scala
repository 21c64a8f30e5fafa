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
