package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document-hashing expressions for the dedup family.
  *
  * Design for 100 TB: each expression is ONE pass over the document —
  * the naive Spark-SQL formulation (explode shingles × k hash
  * functions) multiplies the shuffle input by |shingles|×k; these keep
  * everything row-local so only the fixed-size signature (k longs, or
  * one long) ever reaches an exchange. Per-document linear work, so
  * CodegenFallback costs one virtual call per row against a
  * multi-microsecond eval body — the codegen win lives in the pairwise
  * hot path (VectorExprs), not here.
  */
private[functions] object Tokenize {
  def tokens(s: String): Array[String] = {
    val raw = s.split("\\s+")
    var n = 0
    raw.foreach(t => if (t.nonEmpty) n += 1)
    if (n == raw.length) raw
    else {
      val out = new Array[String](n)
      var i = 0
      raw.foreach(t => if (t.nonEmpty) { out(i) = t; i += 1 })
      out
    }
  }

  /** Rolling word n-gram base hashes (one 64-bit hash per shingle). */
  def shingleHashes(s: String, n: Int): Array[Long] = {
    val toks = tokens(s)
    if (toks.length < n) Array(HashUtil.hashString(toks.mkString(" ")))
    else {
      val out = new Array[Long](toks.length - n + 1)
      var i = 0
      while (i + n <= toks.length) {
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + n) {
          val b = toks(j).getBytes("UTF-8")
          var p = 0
          while (p < b.length) { h = (h ^ (b(p) & 0xffL)) * 0x100000001b3L; p += 1 }
          h = (h ^ ' '.toLong) * 0x100000001b3L
          j += 1
        }
        out(i) = HashUtil.mix64(h)
        i += 1
      }
      out
    }
  }
}

/** MinHash signature: k unsigned-min values of a 2-universal hash
  * family applied to word n-gram shingle hashes. One pass; output is
  * `array<bigint>` of length k.
  */
case class MinHashSignature(child: Expression, k: Int, shingle: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private lazy val as: Array[Long] = Array.tabulate(k)(j => HashUtil.mix64(2L * j + 1) | 1L)
  private lazy val bs: Array[Long] = Array.tabulate(k)(j => HashUtil.mix64(2L * j))

  override def nullSafeEval(v: Any): Any = {
    val hashes = Tokenize.shingleHashes(v.asInstanceOf[UTF8String].toString, shingle)
    val mins = Array.fill(k)(-1L) // unsigned max
    var s = 0
    while (s < hashes.length) {
      val h = hashes(s)
      var j = 0
      while (j < k) {
        val hj = as(j) * h + bs(j)
        if (java.lang.Long.compareUnsigned(hj, mins(j)) < 0) mins(j) = hj
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** splitmix64 finalizer as a SQL-callable scalar — the reproducible
  * id hash behind deterministic train/valid/test splits
  * ([[graft.text.TextAnalysis.trainSplit]]). A custom expression
  * rather than Column arithmetic because the mixing multiplications
  * deliberately wrap mod 2^64, which ANSI-mode Spark (4.x default)
  * rejects as overflow in built-in operators.
  */
case class Mix64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mix64"

  override def nullSafeEval(v: Any): Any =
    HashUtil.mix64(v.asInstanceOf[Number].longValue())

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over whitespace tokens (sign of per-bit vote sums). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(v: Any): Any = {
    val toks = Tokenize.tokens(v.asInstanceOf[UTF8String].toString)
    val votes = new Array[Int](64)
    toks.foreach { t =>
      val h = HashUtil.hashString(t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact word n-gram Jaccard similarity of two documents (used to
  * verify LSH candidate pairs — runs on candidates only, never all
  * pairs).
  */
case class NgramJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ngram_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = Tokenize.shingleHashes(a.asInstanceOf[UTF8String].toString, n)
    val sb = Tokenize.shingleHashes(b.asInstanceOf[UTF8String].toString, n)
    val setA = new java.util.HashSet[java.lang.Long]()
    sa.foreach(setA.add(_))
    val setB = new java.util.HashSet[java.lang.Long]()
    sb.foreach(setB.add(_))
    var inter = 0
    val it = setA.iterator()
    while (it.hasNext) if (setB.contains(it.next())) inter += 1
    val union = setA.size() + setB.size() - inter
    if (union == 0) 1.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Z-order value: interleaves the low 32 bits of two non-negative
  * integer keys so multi-dimensional range queries map to compact
  * 1-D ranges — the clustering key behind Delta/Iceberg OPTIMIZE
  * ZORDER, used by the lake's cluster-rewrite op.
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  private def spread(v0: Long): Long = {
    // spread the low 32 bits of v into the even bit positions
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Number].longValue()
    val y = b.asInstanceOf[Number].longValue()
    spread(x) | (spread(y) << 1)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Rolling-hash document fingerprint: minimum mix64 of all byte
  * k-gram polynomial window hashes (winnowing with a global window).
  * Equal fingerprints ⇒ documents share their minimal k-gram.
  */
case class RollingFingerprint(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  private val Base = 0x100000001b3L
  private lazy val basePowK: Long = {
    var p = 1L
    (0 until k).foreach(_ => p *= Base)
    p
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].toString.getBytes("UTF-8")
    if (bytes.length <= k) HashUtil.hashBytes(bytes, 0, bytes.length)
    else {
      var h = 0L
      var i = 0
      while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
      var min = HashUtil.mix64(h)
      while (i < bytes.length) {
        h = h * Base + (bytes(i) & 0xffL) - basePowK * (bytes(i - k) & 0xffL)
        val m = HashUtil.mix64(h)
        if (java.lang.Long.compareUnsigned(m, min) < 0) min = m
        i += 1
      }
      min
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
