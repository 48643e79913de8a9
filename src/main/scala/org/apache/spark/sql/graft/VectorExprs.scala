package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

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

object VectorExprs {
  /** Column API for the native cosine. Inputs must be array<double>. */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Register `cosine_sim` as a SQL function on the session (the
    * SparkSessionExtensions-style injection, callable from spark.sql).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
}
