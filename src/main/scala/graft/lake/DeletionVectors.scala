package graft.lake

import java.nio.{ByteBuffer, ByteOrder}

import org.roaringbitmap.RoaringBitmap

/** Delta-protocol deletion vectors (PROTOCOL.md "Deletion Vectors"):
  * the per-data-file bitmap of deleted row indexes that lets a Delta
  * log express merge-on-read positional deletes WITHOUT rewriting
  * data files — the wire format for [[DeltaInterop]]'s export of a
  * graft table with pending MoR deletes (VERDICT r16 task 4).
  *
  * Serialized shape is Delta's "RoaringBitmapArray" portable format:
  * a 4-byte little-endian magic (1681511377), an 8-byte little-endian
  * bitmap count, then that many standard-portable-format 32-bit
  * RoaringBitmaps back to back — a DENSE array where bitmap i holds
  * the low 32 bits of row indexes whose high 32 bits equal i
  * (delta-io RoaringBitmapArray.scala, public source). Inline DVs
  * (storageType "i") carry exactly these bytes Base85-encoded in the
  * add action's `pathOrInlineDv`, with `sizeInBytes` = payload length
  * and `cardinality` = deleted-row count; the Base85 alphabet is RFC
  * 1924 (Delta's Base85Codec), zero-padded to 4-byte groups with the
  * true length carried by sizeInBytes.
  *
  * RoaringBitmap itself rides Spark's own classpath (map-status
  * compression uses it) — no new dependency.
  */
object DeletionVectors {

  private val Magic = 1681511377

  /** Serialize sorted-or-not row indexes (≥ 0) to the portable
    * RoaringBitmapArray payload (magic included).
    */
  def serialize(positions: Seq[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "row indexes must be non-negative")
    val byHigh = positions.groupBy(p => (p >>> 32).toInt)
    val n = if (byHigh.isEmpty) 0 else byHigh.keys.max + 1
    val bitmaps = (0 until n).map { k =>
      val rb = new RoaringBitmap()
      byHigh.getOrElse(k, Nil).foreach(p => rb.add(p.toInt))
      rb.runOptimize()
      rb
    }
    val size = 4 + 8 + bitmaps.map(_.serializedSizeInBytes().toLong).sum
    val buf = ByteBuffer.allocate(size.toInt).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(n.toLong)
    bitmaps.foreach(_.serialize(buf))
    buf.array()
  }

  /** Inverse of [[serialize]]. */
  def deserialize(bytes: Array[Byte]): Seq[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == Magic, s"not a RoaringBitmapArray payload (magic $magic)")
    val n = buf.getLong()
    // the count rides UNTRUSTED payloads (DeltaInterop.readLogState
    // decodes inline DVs from foreign _delta_log content): bound it by
    // what the remaining buffer could plausibly hold — each serialized
    // bitmap is at least one byte — so a corrupt or hostile count
    // refuses loudly instead of looping 2^63 empty-bitmap allocations
    require(n >= 0 && n <= bytes.length,
      s"not a RoaringBitmapArray payload (bitmap count $n " +
        s"exceeds ${bytes.length}-byte payload)")
    (0L until n).flatMap { k =>
      val rb = new RoaringBitmap()
      // RoaringBitmap.deserialize(ByteBuffer) is documented not to
      // advance the buffer position (it reads through a duplicate);
      // advance manually, defensively tolerating a version that does
      val before = buf.position()
      rb.deserialize(buf)
      if (buf.position() == before)
        buf.position(before + rb.serializedSizeInBytes())
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      rb.forEach((i: Int) => { out += (k << 32) | (i.toLong & 0xffffffffL); () })
      out.toSeq
    }
  }

  // ----- Base85 (RFC 1924 alphabet — Delta's Base85Codec) -----------

  private val Alphabet =
    ("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz" +
      "!#$%&()*+-;<=>?@^_`{|}~").toCharArray
  private val Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Encode bytes, zero-padding to a 4-byte multiple (the true length
    * rides the DV descriptor's sizeInBytes).
    */
  def base85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ Array.fill[Byte](4 - bytes.length % 4)(0)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      (0 until 4).foreach(j => v = (v << 8) | (padded(i + j) & 0xffL))
      val group = new Array[Char](5)
      (4 to 0 by -1).foreach { j =>
        group(j) = Alphabet((v % 85).toInt); v /= 85
      }
      sb.appendAll(group)
      i += 4
    }
    sb.result()
  }

  /** Decode to exactly `len` bytes (padding dropped). */
  def base85Decode(s: String, len: Int): Array[Byte] = {
    require(s.length % 5 == 0, s"base85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      (0 until 5).foreach { j =>
        val c = s.charAt(i + j)
        val d = if (c < 128) Decode(c.toInt) else -1
        require(d >= 0, s"invalid base85 character '$c'")
        v = v * 85 + d
      }
      val o = i / 5 * 4
      (3 to 0 by -1).foreach { j => out(o + j) = (v & 0xff).toByte; v >>= 8 }
      i += 5
    }
    require(len <= out.length && len > out.length - 4,
      s"declared size $len inconsistent with ${out.length} decoded bytes")
    out.take(len)
  }
}
