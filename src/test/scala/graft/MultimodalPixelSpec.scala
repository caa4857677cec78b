package graft

import graft.multimodal.Multimodal

/** Real-image-decode seam (VERDICT r9 item 8): the synthetic PNGs are
  * genuine images javax.imageio decodes, the pixel hash is invariant
  * to the planted zero-sum noise and divergent across base ids, and
  * the distributed pipeline finds exactly the planted pairs.
  */
class MultimodalPixelSpec extends SparkSpec {

  test("synthPng produces decodable PNGs of the declared geometry") {
    val png = Multimodal.synthPng(42L)
    // PNG magic: a real container, not a fake header
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == Multimodal.ImgSide &&
      img.getHeight == Multimodal.ImgSide)
  }

  test("planted noise is hash-invariant; distinct base ids diverge") {
    // 41 is a planted dup of 40: different bytes, identical pixel hash
    val h40 = Multimodal.pixelPHash(Multimodal.synthPng(40L))
    val h41 = Multimodal.pixelPHash(Multimodal.synthPng(41L))
    assert(!java.util.Arrays.equals(Multimodal.synthPng(40L), Multimodal.synthPng(41L)))
    assert(h40 == h41)
    // non-dup neighbors differ far beyond the verify threshold
    val h42 = Multimodal.pixelPHash(Multimodal.synthPng(42L))
    assert(java.lang.Long.bitCount(h40 ^ h42) > 3)
  }

  test("pipeline finds exactly the planted pairs from decoded pixels") {
    val got = Multimodal.phashPixelNearDup(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ids = graft.sources.Tables.load(spark, sf(), "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = ids.filter(d => d % 10 == 1 && ids.contains(d - 1))
      .map(d => (d - 1, d, 0L))
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }
}
