package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarity, PolyHash}

/** The (c)-tier extension entry point (SURVEY.md §2.2 build stance):
  * `SparkSessionExtensions` injection, so the engine's native expressions
  * are available to PURE-SQL users with zero code — either
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or programmatically:
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Unlike [[org.apache.spark.sql.graft.VectorExprs.register]] (a per-
  * session temp function), injected functions are part of session
  * BUILD-time state: present in every derived session (`newSession()`),
  * visible to thrift/SQL-only clients, and resolvable during view
  * analysis. This class is also where custom `Rule[LogicalPlan]` /
  * `SparkStrategy` injections would go; the engine deliberately needs
  * none (SURVEY.md §4) — every operator resolves to built-in plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        // arity-check here: without it, extra args are silently ignored
        // and missing args surface as an internal IndexOutOfBounds
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"cosine_sim requires exactly 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"poly_hash requires exactly 1 argument, got ${exprs.length}")
        PolyHash(exprs.head)
      }))
  }
}
