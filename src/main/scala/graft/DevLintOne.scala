package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}

/** Dev-only: replicate the PlanLintSpec walk for named queries (in
  * sorted-registry order, executing each like the lint does) and print
  * every counted ShuffleExchangeExec with one line of context.
  *
  * Usage: DevLintOne <upToQuery> [sfDir]
  */
object DevLintOne {
  private def descend(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case s: QueryStageExec => Seq(s.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
    case other => other.children
  }
  private def nodes(root: SparkPlan): Seq[SparkPlan] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def go(p: SparkPlan): Seq[SparkPlan] =
      if (!seen.add(p)) Nil
      else p +: (descend(p) ++ p.subqueries).flatMap(go)
    go(root)
  }
  def main(args: Array[String]): Unit = {
    val upTo = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .takeWhile(_._1 <= upTo)
      .foreach { case (name, f) =>
        val df = f(spark, sfDir)
        df.collect()
        val ex = nodes(df.queryExecution.executedPlan)
          .collect { case s: ShuffleExchangeExec => s }
        println(s"== $name: ${ex.size} shuffles")
        if (name == upTo)
          ex.foreach(s => println("  EXCHANGE " + s.outputPartitioning +
            " <- " + s.child.getClass.getSimpleName + " " +
            s.child.simpleStringWithNodeId()))
      }
    spark.stop()
  }
}
