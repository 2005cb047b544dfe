package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def packed = Multimodal.pack(
    Seq((1L, "hello world"), (2L, "a" * 1000)).toDF("id", "data"),
    "id", "data", "text/plain")

  test("pack: binary payload + typed metadata struct") {
    val rows = packed.collect()
    assert(packed.schema("payload").dataType.typeName == "binary")
    val metaFields = packed.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == Multimodal.MetaType.fields.map(f => (f.name, f.dataType)).toSeq)
    val m = rows.find(_.getLong(0) == 2L).get.getStruct(2)
    assert(m.getAs[String]("mime") == "text/plain")
    assert(m.getAs[Int]("n_bytes") == 1000)
    assert(m.getAs[String]("content_sha").length == 64)
  }

  test("extractFeatures: mapPartitions batch decode with fixed-dim output") {
    val feats = Multimodal.extractFeatures(packed, dim = 16)
    assert(feats.schema("feature").dataType.typeName == "array")
    val byId = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(byId(1L).length == 16 && byId(2L).length == 16)
    // deterministic: same payload → same features
    val again = Multimodal.extractFeatures(packed, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(byId == again)
    // no shuffle: feature extraction preserves partitioning
    val plan = Multimodal.extractFeatures(packed, 16).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("resize: integer box-filter downsample, same narrow batch shape") {
    val resized = Multimodal.resize(packed, k = 3)
    val byId = resized.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val src = packed.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    byId.foreach { case (id, out) =>
      val in = src(id)
      assert(out.length == (in.length + 2) / 3)
      out.zipWithIndex.foreach { case (b, i) =>
        val w = in.slice(i * 3, math.min(in.length, i * 3 + 3))
        assert((b & 0xff) == w.map(_ & 0xff).sum / w.length)
      }
    }
    val plan = Multimodal.resize(packed, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("resizeBox: known byte pattern, every input byte contributes") {
    // [10,20,30,40,50] k=2 → windows [10,20]→15, [30,40]→35, tail [50]→50
    val out = Multimodal.resizeBox(Array[Byte](10, 20, 30, 40, 50), 2)
    assert(out.toSeq == Seq[Byte](15, 35, 50))
    // unsigned arithmetic: 0xFF (255) and 0x01 average to 128, not -0x7F
    val hi = Multimodal.resizeBox(Array[Byte](-1, 1), 2) // 255,1 unsigned
    assert((hi(0) & 0xff) == 128)
    // a pure decimation stub would return input(0)=10 for window 1 — the
    // box filter provably mixes: bytes the stub IGNORED change the output
    val a = Multimodal.resizeBox(Array[Byte](10, 99, 10), 3)
    val b = Multimodal.resizeBox(Array[Byte](10, 0, 10), 3)
    assert(a.toSeq != b.toSeq)
  }

  test("frameFeatures: strided integer per-frame byte-sum buckets, exact") {
    val feats = Multimodal.frameFeatures(packed, frameBytes = 64, stride = 2, dim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Long](2)).toMap
    val src = packed.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // recompute one frame by hand: id=2, frame 2 (stride keeps 0,2,...)
    val in = src(2L)
    val expect = new Array[Long](8)
    (128 until math.min(192, in.length)).foreach { j =>
      expect((j - 128) % 8) += (in(j) & 0xff).toLong
    }
    assert(feats((2L, 2)) == expect.toSeq)
    // odd frames never emitted
    assert(!feats.keySet.exists(_._2 % 2 == 1))
  }

  test("sampleFrames: strided fixed-size binary windows") {
    val frames = Multimodal.sampleFrames(packed, frameBytes = 256, stride = 2).collect()
    // id=2 payload is 1000 bytes → 4 frames, stride 2 keeps frames 0 and 2
    val f2 = frames.filter(_.getLong(0) == 2L)
    assert(f2.length == 2)
    assert(f2.map(_.getInt(1)).toSet == Set(0, 1)) // posexplode renumbers kept frames
    assert(f2.head.getAs[Array[Byte]](2).length == 256)
  }
}
