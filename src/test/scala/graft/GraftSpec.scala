package graft

import java.nio.file.Files

/** The facade's nightly cycle runs end-to-end and is idempotent. */
class GraftSpec extends SparkSpec {

  test("Graft.nightly seeds an empty warehouse and is a no-op when re-run") {
    val wh = Graft.warehouse(spark, Files.createTempDirectory("graft-e2e").toString)
    val dir = "/root/testdata/sf0.001"

    val (s1, l1, p1) = Graft.nightly(wh, dir)
    assert(s1 > 0 && l1 > 0 && p1 > 0)
    assert(wh.exists("ventas_limpias") && wh.exists("raw_stock_movements")
      && wh.exists("stock_points"))

    val before = wh.read("stock_points").collect().map(_.mkString("|")).toSet
    val (s2, l2, _) = Graft.nightly(wh, dir)
    assert(s2 == 0 && l2 == 0)
    assert(wh.read("stock_points").collect().map(_.mkString("|")).toSet == before)
  }
}
