package graft

import java.nio.file.Files

import graft.pipelines.Warehouse
import org.apache.spark.sql.functions._

/** Bucketed tables must make the co-located join shuffle-free: joining
  * two tables bucketed on the join key plans NO exchange on either side.
  * Partitioned tables must prune untouched partitions at planning time.
  */
class BucketingSpec extends SparkSpec {

  test("date-partitioned table prunes partitions at planning time") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft-part").toString)
    val dir = "/root/testdata/sf0.001"
    val ledger = Tables.ledger(spark, dir)
      .withColumn("dia", to_date(col("fecha")))
    wh.writePartitioned("part_ledger", ledger, Seq("dia"))

    val oneDay = ledger.agg(min(col("dia"))).head().getDate(0).toString
    val read = wh.read("part_ledger").filter(col("dia") === oneDay)
    val scan = read.queryExecution.executedPlan.collectLeaves().head
    val scanStr = scan.toString

    // the date predicate must land in PartitionFilters (planning-time
    // pruning), NOT in PushedFilters/DataFilters (per-row evaluation)
    assert(scanStr.contains("PartitionFilters") &&
      scanStr.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("dia"),
      s"expected dia in PartitionFilters:\n$scanStr")
    // and the scan must actually select fewer partition directories than
    // the table has (inputFiles ignores partition filters, so ask the
    // FileSourceScanExec itself)
    val fsScan = read.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val allParts = ledger.select(col("dia")).distinct().count()
    assert(fsScan.selectedPartitions.partitionCount == 1 && allParts > 1,
      s"expected 1 of $allParts partitions selected, " +
        s"got ${fsScan.selectedPartitions.partitionCount}")
    // correctness: matches the flat filter
    assert(read.count() === ledger.filter(col("dia") === oneDay).count())
  }

  test("join of two tables bucketed on the key has no shuffle exchange") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft-bkt").toString)
    val dir = "/root/testdata/sf0.001"
    wh.writeBucketed("bkt_orders",
      Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"), "o_orderkey", 4)
    wh.writeBucketed("bkt_lineitem",
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"), "l_orderkey", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // sanity: it still computes the right thing
      assert(joined.count() ==
        Tables.lineitem(spark, dir).join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key is also shuffle-free") {
    val agg = spark.table("bkt_lineitem").groupBy("l_orderkey")
      .agg(sum("l_quantity"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed agg must not shuffle:\n$plan")
  }
}
