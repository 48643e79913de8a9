package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter as a typed `Aggregator` — the MEMBERSHIP member of the
  * sketch family ([[KmvSketch]] = distinct count, [[CmsSketch]] =
  * frequency): a fixed m-bit set where item x raises k bits (hash_j(x))
  * and a query answers "definitely absent" or "present with false-
  * positive rate ≈ fill^k" (Bloom 1970). The 100 TB use-case is exactly
  * the q61/q74 incremental story: the nightly seen-set membership probe
  * — ship a few MB of bits to every executor and pre-filter the batch
  * against the corpus BEFORE any join, so only possible-duplicates reach
  * the shuffle (false positives are re-checked by the exact path; false
  * negatives cannot happen, so no duplicate is ever missed).
  *
  * The buffer is a flat Array[Long] of ⌈m/64⌉ words; `reduce` sets k
  * bits, `merge` is bitwise OR — associative, commutative and IDEMPOTENT,
  * so the sketch flows through partial aggregation, is partitioning/
  * order invariant (spec-proven), and filters built on different days
  * union exactly like any algebraic aggregate (OR of the bitsets IS the
  * filter of the union — the property that makes the at-rest corpus
  * filter appendable).
  *
  * Hash family: h_j(x) = ((a_j·x + b_j) mod P) mod m over the same
  * pairwise-independent multipliers as the MinHash/CMS families —
  * deterministic across engines and runs.
  */
class BloomSketch(mBits: Int, k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(mBits >= 64 && mBits % 64 == 0, "Bloom wants m >= 64, a multiple of 64")
  require(k >= 1 && k <= 8, "Bloom wants 1 <= k <= 8 hash functions")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(b: Array[Long], x: Long): Array[Long] = {
    var j = 0
    while (j < k) {
      val bit = BloomSketch.bitOf(j, x, mBits)
      b(bit >>> 6) |= 1L << (bit & 63)
      j += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  /** The finished sketch IS the bitset — query with [[BloomSketch.contains]]. */
  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomSketch {
  // the shared MinHash/CMS hash family (single source of truth)
  private val P = graft.operators.Dedup.P
  private val A = graft.operators.Dedup.A.take(8).toArray
  private val B = graft.operators.Dedup.B.take(8).toArray

  private[functions] def bitOf(j: Int, x: Long, mBits: Int): Int = {
    val xm = ((x % P) + P) % P
    (((A(j) * xm + B(j)) % P) % mBits).toInt
  }

  /** Typed-column form over a `Dataset[Long]` of hash values. */
  def filter(mBits: Int, k: Int): org.apache.spark.sql.TypedColumn[Long, Array[Long]] =
    new BloomSketch(mBits, k).toColumn

  /** Membership probe: false ⇒ definitely never inserted; true ⇒
    * inserted OR a false positive (rate ≈ [[fillFraction]]^k).
    */
  def contains(bits: Array[Long], x: Long, k: Int): Boolean = {
    val m = bits.length * 64
    var j = 0
    while (j < k) {
      val bit = bitOf(j, x, m)
      if ((bits(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      j += 1
    }
    true
  }

  /** Fraction of set bits — the observed load; fp rate ≈ fill^k. */
  def fillFraction(bits: Array[Long]): Double = {
    var ones = 0L
    var i = 0
    while (i < bits.length) { ones += java.lang.Long.bitCount(bits(i)); i += 1 }
    ones.toDouble / (bits.length * 64L)
  }
}
