package graft.ext

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaRow(id: Long, kind: String, size: Int): MediaRow =
    MediaRow(id, kind, Array.tabulate(size)(i => ((i * 31 + id) % 256).toByte),
      "stub", 0, 0, 16000, 0L)

  private lazy val media = Seq(
    mediaRow(1, "image", 1000), mediaRow(2, "video", 2048),
    mediaRow(3, "audio", 512), mediaRow(4, "video", 700)
  ).toDS()

  test("decode is deterministic, projects blob away, keeps typed features") {
    val out = decode(media).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.forall(d => d.width >= 64 && d.height >= 64))
    assert(out.forall(_.features.length == 8))
    assert(out.forall(d => math.abs(d.features.sum - 1.0) < 1e-9),
      "features are an L1-normalized histogram")
    // deterministic: second run identical
    val again = decode(media).collect().sortBy(_.media_id)
    assert(out.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("frame sampling explodes only video rows, stepping everyN") {
    val frames = sampleFrames(media, everyN = 2).collect()
    assert(frames.map(_.media_id).toSet == Set(2L, 4L))
    // video 2: 2048 bytes → 8 frames → sampled 0,2,4,6
    assert(frames.filter(_.media_id == 2L).map(_.frame_no).sorted.toSeq == Seq(0, 2, 4, 6))
    assert(frames.forall(_.frame_bytes.nonEmpty))
  }

  test("resize touches only images and updates metadata") {
    val out = resize(media, 128, 128).collect().sortBy(_.media_id)
    val img = out.find(_.media_id == 1L).get
    assert(img.width == 128 && img.height == 128)
    assert(out.find(_.media_id == 3L).get.width == 0, "audio untouched")
  }

  test("size-aware repartition sizes from plan statistics, not a data scan") {
    val df = media.toDF()
    val statBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = repartitionBySize(df, targetBytes = (statBytes / 2).toLong)
    // target = half the estimated size → 2 partitions; all rows retained
    assert(parts.rdd.getNumPartitions == 2)
    assert(parts.count() == 4)
    // sizing must not inject an extra aggregate/scan into the plan: the
    // repartition output is the input plan + exactly one exchange
    val plan = parts.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("aggregate"), s"unexpected aggregate in:\n$plan")
  }

  test("pipeline plan reads the media table exactly once") {
    val out = multimodalQuery(spark, sf("sf0.001"))
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1, s"expected a single scan, got: $leaves")
  }

  test("pipeline query over fixture-derived media returns per-kind stats") {
    val out = multimodalQuery(spark, sf("sf0.001"))
    val rows = out.collect()
    assert(rows.map(_.getAs[String]("kind")).toSet == Set("image", "audio", "video"))
    assert(rows.map(_.getAs[Long]("n_media")).sum == 500L)
  }
}
