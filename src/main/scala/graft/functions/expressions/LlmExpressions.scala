package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Expressions backing the LLM-data-pipeline operators (SURVEY §7.2
  * step 5). The reference only gestures at this space via its
  * unimplemented COSINE_SIMILARITY (`filter.rs:3306-3308`); these are
  * new capability, designed scale-first: every one is a pure per-row
  * kernel (no shuffle, no state), so the distributed story is just the
  * surrounding joins/aggregations.
  */
object StableHash {
  /** FNV-1a 64-bit — tiny, stable across JVMs/platforms, public domain. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xff; h *= 0x100000001b3L; i += 1 }
    h
  }
  def fnv1a64(s: String): Long = fnv1a64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  /** Seed-mixed variant for hash families (minhash/LSH). */
  def seeded(s: String, seed: Long): Long = {
    var h = fnv1a64(s) ^ (seed * 0x9e3779b97f4a7c15L)
    // splitmix64 finalizer
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
}

/** FNV1A64(binary) — the FNV-1a 64-bit hash as a column expression
  * (same kernel as StableHash.fnv1a64). Per-row, zero-shuffle; lets the
  * multimodal decode stub stay a pure projection instead of a
  * mapPartitions + join-back, and is DuckDB-reconstructible (hex-nibble
  * list_reduce), so queries using it stay oracle-checkable. */
case class Fnv1a64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    StableHash.fnv1a64(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "fnv1a64"
}

/** SIMHASH64(tokens) — Charikar's similarity hash over a token array:
  * per token a stable 64-bit hash votes ±1 on each bit; the sign of each
  * bit-sum forms the fingerprint. Near-duplicate texts differ in few
  * bits. One pass per row, no shuffle. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = StableHash.fnv1a64(arr.getUTF8String(i).toString)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** MINHASH_SIGNATURE(shingles, k) — k independent min-hashes of a
  * shingle array (seeded FNV family). Returns array<bigint> of length k. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var j = 0
        while (j < k) {
          val h = StableHash.seeded(s, j.toLong)
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** HYPERPLANE_LSH(vec, numBits, seed) — random-hyperplane signature for
  * cosine LSH (Charikar SimHash for real vectors): bit i = sign of the
  * dot product with a pseudo-random hyperplane. Planes are RADEMACHER
  * (±1) weights — sign-random-projection keeps the Charikar collision
  * guarantee with ±1 entries (Achlioptas-style sign projections) —
  * derived from MD5 of `(seed, bit, dim)` only, so every executor
  * generates identical planes with zero coordination (no broadcast
  * weight matrix), and so an INDEPENDENT engine can re-derive them:
  * the `ann_lsh_topk` DuckDB oracle rebuilds the exact planes with
  * SQL `md5()` and reproduces the banded candidate set bit-for-bit
  * (±1·x products are exact, sums run in the same order). */
case class HyperplaneLsh(child: Expression, numBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  @transient private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // plane weights cached per (dim) on first use — deterministic in (seed,bit,dim)
  @transient private var planes: Array[Array[Double]] = _

  private def planeWeights(dim: Int): Array[Array[Double]] = {
    if (planes == null || planes(0).length != dim) {
      val md = java.security.MessageDigest.getInstance("MD5")
      planes = Array.tabulate(numBits) { b =>
        Array.tabulate(dim) { i =>
          // +1 when the digest's first byte is even — the same parity
          // the oracle reads off md5()'s second hex character
          val d = md.digest(s"graft-lsh:$seed:$b:$i".getBytes("UTF-8"))
          if ((d(0) & 1) == 0) 1.0 else -1.0
        }
      }
    }
    planes
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val w = planeWeights(dim)
    var sig = 0L
    var b = 0
    while (b < numBits) {
      var dot = 0.0
      var i = 0
      val wb = w(b)
      while (i < dim) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * wb(i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "hyperplane_lsh"
}

/** BYTE_HISTOGRAM(binary, bins) — L1-normalized byte-value histogram as
  * array<float>. The deterministic stand-in for a real image/audio
  * feature extractor (multimodal STUB path): exercises the exact
  * Spark-side plumbing — binary in, fixed-width float vector out. */
case class ByteHistogram(child: Expression, bins: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val counts = new Array[Float](bins)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xff) * bins / 256) += 1f
      i += 1
    }
    if (bytes.length > 0) {
      var b = 0
      while (b < bins) { counts(b) /= bytes.length; b += 1 }
    }
    new GenericArrayData(counts)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "byte_histogram"
}

/** ROLLING_FINGERPRINT(text) — polynomial rolling hash (Rabin-Karp
  * style) of the whole string: base-31 accumulation mod 1e9+7.
  * Order-sensitive (unlike a bag-of-words md5), cheap, stable.
  * h < 2^30 keeps h*31+c comfortably inside a Long. */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  private val Mod = 1000000007L
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31 + s.charAt(i)) % Mod
      i += 1
    }
    h
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "rolling_fingerprint"
}
