package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` /
  * `ExpressionUtils` are `private[sql]` — the standard placement for
  * third-party expression libraries.
  *
  * [[CosineSimilarity]] fuses the three `aggregate(zip_with(...))` folds
  * (dot, |a|², |b|²) of the declarative formulation into one codegen'd
  * loop over the two arrays — no lambda interpretation, no intermediate
  * arrays, one pass. The accumulation order is the same left-to-right
  * per-accumulator order as the HOF folds and the DuckDB oracle's
  * `list_reduce`, so results stay BIT-IDENTICAL (property-tested in
  * VectorExprsSpec) — a faster plan for the same semantics, the (b)-tier
  * extension path: custom Expression before custom physical operator.
  *
  * Degenerate-input contract matches the declarative form exactly:
  * zero-norm vectors yield NULL (Spark's `Divide` and DuckDB both return
  * NULL for x/0 — a raw Java division would produce NaN, which sorts
  * ABOVE every real score and would corrupt top-k), and length-mismatched
  * arrays yield NULL (`zip_with` pads with null, nulling the fold).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // a NULL element nulls the whole score — exact parity with the
      // declarative aggregate(zip_with(...)) fold, whose sum goes null
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = xs.getDouble(i); val y = ys.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $x = $a.getDouble($i);
            double $y = $b.getDouble($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          if (!${ev.isNull}) {
            double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
            if ($denom == 0.0) {
              ${ev.isNull} = true;
            } else {
              ${ev.value} = $dot / $denom;
            }
          }
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native rolling polynomial hash: acc = (acc*31 + ascii(char)) mod 1e9+7
  * over the string's characters — the q19 fingerprint primitive. The
  * declarative form (`aggregate(sequence(1, length(text)), ...)` with a
  * per-character `ascii(substr(...))`) materializes an index array and
  * interprets the lambda per character — measured as q19's dominant cost.
  * This expression is one codegen'd walk over the UTF-8 bytes.
  *
  * Bit-parity contract with the HOF form (differential-tested): Spark's
  * `ascii` returns the character's full Unicode CODE POINT (probed:
  * ascii('ñ')=241, ascii('北')=21271, ascii('😀')=128512) and `substr`/
  * `length` step by code point — so the walk decodes each UTF-8 sequence
  * to its code point. The empty string hashes to 0 in both forms.
  *
  * Malformed UTF-8 (possible via binary→string casts — Spark never
  * validates): parity is guaranteed for VALID input only; on invalid
  * bytes the walk is best-effort — a continuation byte in lead position
  * advances one byte, and a truncated trailing sequence is clamped to
  * the array bound — it never reads out of bounds or crashes (the HOF
  * form substitutes U+FFFD via String conversion, a semantics not worth
  * replicating byte-for-byte).
  */
case class PolyHash(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val u = bytes(i) & 0xFF
      var cp = 0
      var len = 0
      if (u < 0xC0) { cp = u; len = 1 } // ASCII, or invalid lead: 1 byte
      else if (u < 0xE0) { len = 2 } else if (u < 0xF0) { len = 3 } else { len = 4 }
      if (len > 1) {
        if (i + len > bytes.length) { cp = u; len = bytes.length - i } // truncated
        else if (len == 2) cp = ((u & 0x1F) << 6) | (bytes(i + 1) & 0x3F)
        else if (len == 3) cp = ((u & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F)
        else cp = ((u & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F)
      }
      acc = (acc * 31L + cp) % 1000000007L
      i += len
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val u = ctx.freshName("u")
      val cp = ctx.freshName("cp")
      val len = ctx.freshName("len")
      s"""
        byte[] $bytes = $s.getBytes();
        long $acc = 0L;
        int $i = 0;
        while ($i < $bytes.length) {
          int $u = $bytes[$i] & 0xFF;
          int $cp = 0; int $len;
          if ($u < 0xC0) { $cp = $u; $len = 1; }
          else if ($u < 0xE0) { $len = 2; } else if ($u < 0xF0) { $len = 3; } else { $len = 4; }
          if ($len > 1) {
            if ($i + $len > $bytes.length) { $cp = $u; $len = $bytes.length - $i; }
            else if ($len == 2) { $cp = (($u & 0x1F) << 6) | ($bytes[$i + 1] & 0x3F); }
            else if ($len == 3) {
              $cp = (($u & 0x0F) << 12) | (($bytes[$i + 1] & 0x3F) << 6) |
                ($bytes[$i + 2] & 0x3F);
            } else {
              $cp = (($u & 0x07) << 18) | (($bytes[$i + 1] & 0x3F) << 12) |
                (($bytes[$i + 2] & 0x3F) << 6) | ($bytes[$i + 3] & 0x3F);
            }
          }
          $acc = ($acc * 31L + $cp) % 1000000007L;
          $i += $len;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Bloom membership probe against a FIXED bitset — the q84 hot
  * path. The declarative form (`bit_get(element_at(typedLit(32k longs),
  * …))` × k probes) drags a 32 768-element array literal through the
  * generated code and evaluates four element_at/bit_get chains per row —
  * measured at ~1.2 s of pure filter cost at sf0.1. Here the bitset is a
  * plan REFERENCE OBJECT (`ctx.addReferenceObj` — one `long[]` shared by
  * every row, never re-materialized), and the probe is k direct
  * array-index/mask tests, bit-for-bit the same hash family and word
  * layout as [[graft.functions.BloomSketch]] (delegates to its
  * `contains` in interpreted eval; agreement is spec'd in the q84 spec
  * and VectorExprsSpec).
  *
  * `bits`/`k` are construction-time constants, not children: membership
  * against a trained filter is inherently a literal-closure expression
  * (the same shape as the literal-centroid argmin, just behind a native
  * doGenCode because the bitset is too big to inline as a literal).
  *
  * The bitset is held as an `IndexedSeq[Long]` (element-wise
  * `equals`/`hashCode`), NOT a raw `long[]` (reference equality): two
  * probes built from equal-but-distinct bitsets must compare equal so
  * canonicalized-plan matching, subexpression elimination, and
  * CacheManager lookup can unify them. The `long[]` exists only as the
  * transient eval/codegen-time view.
  */
case class BloomContains(child: Expression, bits: IndexedSeq[Long], k: Int)
  extends UnaryExpression with ExpectsInputTypes {
  // mirror BloomSketch's bound: beyond k=8 the A/B hash family diverges
  // from the Aggregator's take(8) and the two eval paths would disagree
  require(k >= 1 && k <= 8, "bloom_contains wants 1 <= k <= 8 hash functions")

  @transient private lazy val bitsArr: Array[Long] = bits.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(input: Any): Any =
    graft.functions.BloomSketch.contains(bitsArr, input.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bitsArr, "long[]")
    val aRef = ctx.addReferenceObj("bloomA",
      graft.operators.Dedup.A.take(k).toArray, "long[]")
    val bRef = ctx.addReferenceObj("bloomB",
      graft.operators.Dedup.B.take(k).toArray, "long[]")
    val p = graft.operators.Dedup.P
    nullSafeCodeGen(ctx, ev, x => {
      val xm = ctx.freshName("xm")
      val j = ctx.freshName("j")
      val bit = ctx.freshName("bit")
      s"""
        long $xm = (($x % ${p}L) + ${p}L) % ${p}L;
        ${ev.value} = true;
        for (int $j = 0; $j < $k; $j++) {
          long $bit = (($aRef[$j] * $xm + $bRef[$j]) % ${p}L) % ${bits.length * 64L}L;
          if (($bitsRef[(int) ($bit >>> 6)] & (1L << (int) ($bit & 63L))) == 0L) {
            ${ev.value} = false;
            break;
          }
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {
  /** Column API for the native cosine. Inputs must be array<double>. */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for the native Bloom probe. Input must be long. The
    * array is wrapped (not copied) into a value-equal IndexedSeq; the
    * caller must not mutate it after this point.
    */
  def bloomContains(x: Column, bits: Array[Long], k: Int): Column =
    ExpressionUtils.column(BloomContains(ExpressionUtils.expression(x),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bits), k))

  /** Column API for the native rolling hash. Input must be string. */
  def polyHash(s: Column): Column =
    ExpressionUtils.column(PolyHash(ExpressionUtils.expression(s)))

  /** Register the native functions on the session (the
    * SparkSessionExtensions-style injection, callable from spark.sql).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs(0)), "built-in")
  }
}
