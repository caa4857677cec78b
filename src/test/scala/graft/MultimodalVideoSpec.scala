package graft

import graft.multimodal.Multimodal

/** The closed video seam: a length-indexed container of REAL PNG
  * frames, parsed with index-skip for unsampled frames and decoded
  * with javax.imageio for sampled ones.
  */
class MultimodalVideoSpec extends SparkSpec {

  test("container round-trip: every sampled frame decodes to the planted luma") {
    (0L to 25L).foreach { id =>
      val frames = Multimodal.decodeSampledFrames(Multimodal.synthVideo(id), step = 2)
      val expectedCount = (1 + id % 6 + 1) / 2 // ceil(n/2)
      assert(frames.size.toLong === expectedCount, s"doc $id")
      frames.foreach { case (f, w, h, luma) =>
        assert(f % 2 === 0)
        assert(w === 64L && h === 64L)
        assert(luma === Multimodal.frameLuma(id, f.toInt).toLong, s"doc $id frame $f")
      }
    }
  }

  test("step=1 decodes every frame; a corrupt magic refuses loudly") {
    val all = Multimodal.decodeSampledFrames(Multimodal.synthVideo(9L), step = 1)
    assert(all.size === (1 + 9 % 6))
    val bad = Multimodal.synthVideo(3L)
    bad(0) = 0x00
    intercept[IllegalArgumentException] {
      Multimodal.decodeSampledFrames(bad, step = 1)
    }
  }

  test("entry matches the arithmetic on the test corpus") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.videoFrames(spark, sf())
    val bad = out.filter(
      col("mean_luma") =!= (lit(16) + (col("doc_id") * 31 + col("frame_idx") * 17) % 224) ||
        col("width") =!= 64 || col("height") =!= 64)
    assert(bad.count() === 0)
    assert(out.count() > 0)
  }
}
