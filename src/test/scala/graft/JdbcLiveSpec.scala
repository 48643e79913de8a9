package graft

import java.time.LocalDate

import graft.sources.Jdbc
import org.apache.spark.sql.functions._

/** LIVE JDBC round-trips against a REAL database — embedded Apache
  * Derby, which ships in Spark's own jar set, so the previously
  * "harness-bound" S2/S3/S7/S9 wiring is now exercised end to end
  * in-process: Spark's jdbc reader/writer, real SQL execution, real
  * PRIMARY KEY constraints, a real server-side MERGE. (S1's per-DB
  * read and the S8 row-statement sink stay MySQL-dialect — backtick
  * quoting / ON DUPLICATE KEY UPDATE — and keep their statement-builder
  * unit tests; the staged-merge sink is the ANSI twin and runs here.)
  *
  * The in-memory Derby URL works because local[*] executors share the
  * driver JVM; a cluster deployment points the same code at a server
  * URL — nothing else changes.
  */
class JdbcLiveSpec extends SparkSpec {

  private val src = Jdbc.Source(
    url = "jdbc:derby:memory:graftlive;create=true",
    user = "app", password = "app",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  private def exec(sql: String): Unit = Jdbc.execute(src, sql)

  private def tryExec(sql: String): Unit =
    try exec(sql) catch { case _: java.sql.SQLException => () }

  test("S2/S4 live: monthly-windowed parallel jdbc read is a disjoint cover of a real table") {
    tryExec("DROP TABLE RAW_MOVES")
    exec("CREATE TABLE RAW_MOVES (ID BIGINT NOT NULL PRIMARY KEY, FECHA DATE NOT NULL, QTY INT NOT NULL)")
    // 75 daily rows spanning three calendar months, written over JDBC
    val from = LocalDate.parse("2026-01-15")
    val rows = (0 until 75).map(i => (i.toLong, from.plusDays(i), i % 7))
    val conn = java.sql.DriverManager.getConnection(src.url, src.properties)
    try {
      val st = conn.prepareStatement("INSERT INTO RAW_MOVES VALUES (?, ?, ?)")
      rows.foreach { case (id, d, q) =>
        st.setLong(1, id); st.setDate(2, java.sql.Date.valueOf(d)); st.setInt(3, q)
        st.addBatch()
      }
      st.executeBatch(); ()
    } finally conn.close()

    val windows = Jdbc.monthlyWindows(from, from.plusDays(74))
    assert(windows.size == 3, s"75 days from Jan 15 must cover 3 months: $windows")
    val df = Jdbc.read(spark, src, "RAW_MOVES", "FECHA", windows)
    // one partition per window — the reference's serial per-month loop
    // turned into one parallel read
    assert(df.rdd.getNumPartitions == windows.size)
    val got = df.select(col("ID")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == rows.map(_._1), "windowed read must be a disjoint, complete cover")

    // S5 daily windows over a sub-range: exact half-open semantics live
    val sub = Jdbc.read(spark, src, "RAW_MOVES", "FECHA",
      Jdbc.dailyWindows(from.plusDays(10), from.plusDays(19)))
    assert(sub.rdd.getNumPartitions == 10)
    assert(sub.count() == 10)
  }

  test("S7 live: executor-parallel jdbc append lands exactly the frame") {
    val sql = spark.sqlContext
    import sql.implicits._
    tryExec("DROP TABLE \"landed\"")
    exec("CREATE TABLE \"landed\" (\"k\" BIGINT NOT NULL, \"v\" VARCHAR(16) NOT NULL)")
    val df = (1L to 500L).map(i => (i, s"v$i")).toDF("k", "v").repartition(8)
    Jdbc.append(df, src, "\"landed\"", batchSize = 100)
    val back = spark.read.jdbc(src.url, "\"landed\"", src.properties)
    assert(back.count() == 500)
    assert(back.agg(sum(col("k"))).head().getLong(0) == (1L to 500L).sum)
  }

  test("S9 live: staged MERGE sink upserts last-wins against a real PRIMARY KEY, replays are no-ops") {
    val sql = spark.sqlContext
    import sql.implicits._
    tryExec("DROP TABLE \"inv\"")
    tryExec("DROP TABLE \"inv_stg\"")
    exec("CREATE TABLE \"inv\" (\"art_id\" BIGINT NOT NULL PRIMARY KEY, \"qty\" BIGINT NOT NULL, \"ver\" BIGINT NOT NULL, \"seq\" BIGINT NOT NULL)")
    exec("CREATE TABLE \"inv_stg\" (\"art_id\" BIGINT NOT NULL, \"qty\" BIGINT NOT NULL, \"ver\" BIGINT NOT NULL, \"seq\" BIGINT NOT NULL)")
    val sink = new Jdbc.JdbcStagedMergeSink(src, batchSize = 50)
    def table(): Map[Long, (Long, Long, Long)] =
      spark.read.jdbc(src.url, "\"inv\"", src.properties).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // night 1: seed 100 articles
    sink.upsert("inv",
      (1L to 100L).map(i => (i, i * 10, 1L, i)).toDF("art_id", "qty", "ver", "seq"),
      keys = Seq("art_id"), versionCol = "ver", tiebreakCol = "seq")
    assert(table().size == 100 && table()(7L) == ((70L, 1L, 7L)))

    // night 2: update half, insert new, and carry an IN-BATCH duplicate
    // key — the last-wins pre-dedup must pick (ver, seq)-max BEFORE the
    // merge (a real MERGE with duplicate source keys is an error)
    val night2 = ((1L to 50L).map(i => (i, i * 100, 2L, i)) ++
      Seq((7L, 999L, 2L, 1000L)) ++ // the in-batch duplicate, higher seq
      (101L to 120L).map(i => (i, i, 1L, i)))
      .toDF("art_id", "qty", "ver", "seq")
    sink.upsert("inv", night2, Seq("art_id"), "ver", "seq")
    val t2 = table()
    assert(t2.size == 120)
    assert(t2(7L) == ((999L, 2L, 1000L)), "in-batch dup must resolve last-wins")
    assert(t2(30L) == ((3000L, 2L, 30L)), "matched rows must update")
    assert(t2(60L) == ((600L, 1L, 60L)), "untouched rows must survive")
    assert(t2(110L) == ((110L, 1L, 110L)), "new keys must insert")

    // at-least-once: replaying night 2 verbatim converges to the same
    // table (truncate-staging + keyed MERGE = pure function of batch)
    sink.upsert("inv", night2, Seq("art_id"), "ver", "seq")
    assert(table() == t2, "a replayed night must be a no-op")

    // stale version arriving late does NOT win (last-wins is by the
    // version column the MERGE applies, not arrival order)... the sink
    // contract is last-wins WITHIN a batch; cross-batch staleness is the
    // caller's watermark discipline, same as the parquet sink — assert
    // the documented behavior: a later merge overwrites.
    sink.upsert("inv",
      Seq((7L, 1L, 1L, 1L)).toDF("art_id", "qty", "ver", "seq"),
      Seq("art_id"), "ver", "seq")
    assert(table()(7L) == ((1L, 1L, 1L)))
  }

  test("S9 live: staging reset takes the TRUNCATE path on Derby (no DELETE fallback)") {
    val sql = spark.sqlContext
    import sql.implicits._
    tryExec("DROP TABLE \"trunc_probe\"")
    exec("CREATE TABLE \"trunc_probe\" (\"k\" BIGINT NOT NULL)")
    Jdbc.append((1L to 50L).toDF("k"), src, "\"trunc_probe\"")
    // the exact statement the sink issues first — must succeed live
    // (DELETE row-logs the whole table; TRUNCATE is the O(1) reset every
    // ANSI target the sink's scaladoc names supports)
    exec("TRUNCATE TABLE \"trunc_probe\"")
    assert(spark.read.jdbc(src.url, "\"trunc_probe\"", src.properties).count() == 0)
  }

  test("nightly sales cycle live: seed + catch-up + replay through the staged-merge sink against a real PK") {
    import graft.pipelines.{SalesPipeline, Warehouse}
    import graft.operators.Sales
    val dir = "/root/testdata/sf0.001"
    // schema owned by the deployment, as the sink contract says: the
    // waterfallClean frame is (BIGINT, TIMESTAMP, DOUBLE x4)
    tryExec("DROP TABLE \"ventas_limpias\"")
    tryExec("DROP TABLE \"ventas_limpias_stg\"")
    val cols = "\"ven_id\" BIGINT NOT NULL, \"fecha_hora\" TIMESTAMP, " +
      "\"efectivo\" DOUBLE, \"tarjeta\" DOUBLE, \"otros\" DOUBLE, " +
      "\"total_venta\" DOUBLE"
    exec(s"""CREATE TABLE "ventas_limpias" ($cols, PRIMARY KEY ("ven_id"))""")
    exec(s"""CREATE TABLE "ventas_limpias_stg" ($cols)""")
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-derby-wh").toString)
    val sink = Some(new Jdbc.JdbcStagedMergeSink(src, batchSize = 200)
      : graft.pipelines.UpsertSink)
    val full = Sales.waterfallClean(spark, dir)
    val midId = full.agg(expr("percentile_approx(ven_id, 0.5)")).first().getLong(0)

    // the PipelinesSpec nightly cycle, landing in Derby instead of
    // parquet: seed half, catch up, then a no-op night — checkpoints
    // stay in the parquet warehouse, the sink is the only moving part
    val n1 = SalesPipeline.update(wh, dir, upToId = Some(midId), landing = sink)
    val n2 = SalesPipeline.update(wh, dir, landing = sink)
    val n3 = SalesPipeline.update(wh, dir, landing = sink)
    assert(n1 > 0 && n2 > 0 && n3 == 0)
    def landed(): Seq[String] =
      spark.read.jdbc(src.url, "\"ventas_limpias\"", src.properties)
        .collect().map(_.mkString("|")).toSeq.sorted
    val want = full.collect().map(_.mkString("|")).toSeq.sorted
    assert(landed() == want,
      "incremental nights through the live merge sink != the full rebuild")

    // crash-window replay: re-merge night 2's whole window verbatim
    // (checkpoint not yet advanced) — the keyed MERGE makes it a no-op
    new Jdbc.JdbcStagedMergeSink(src, batchSize = 200).upsert(
      "ventas_limpias", full.filter(col("ven_id") > midId),
      Seq("ven_id"), "ven_id", "ven_id")
    assert(landed() == want, "a replayed window must be a no-op on the DB")
  }

  test("statement builders: ANSI merge quotes and validates like the MySQL twin") {
    val m = Jdbc.stagedMergeSql("inv", "inv_stg",
      Seq("art_id", "qty", "ver"), Seq("art_id"))
    assert(m.contains("MERGE INTO \"inv\" t USING \"inv_stg\" s"))
    assert(m.contains("ON t.\"art_id\" = s.\"art_id\""))
    assert(m.contains("WHEN MATCHED THEN UPDATE SET \"qty\" = s.\"qty\", \"ver\" = s.\"ver\""))
    assert(m.contains("WHEN NOT MATCHED THEN INSERT (\"art_id\", \"qty\", \"ver\")"))
    intercept[IllegalArgumentException](
      Jdbc.stagedMergeSql("t", "s", Seq("k"), Seq("k")))
    intercept[IllegalArgumentException](
      Jdbc.stagedMergeSql("t", "s", Seq("a", "b"), Seq("missing")))
  }
}
