package graft.pipelines

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem helpers that go through Spark's Hadoop filesystem layer, so
  * warehouse roots on hdfs:// or s3a:// behave the same as local paths
  * (`java.nio.file.Files` would silently answer "does not exist" for any
  * non-local URI and downstream logic would overwrite instead of merge).
  */
object Fs {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Replace `target` with whatever `write` produces: write to a fresh
    * sibling tmp dir (readers of `target` are NOT disturbed — this is
    * what makes read-merge-rewrite of the same table safe without
    * materializing), then delete old + rename tmp into place.
    *
    * The delete+rename pair is not a single atomic commit (a crash
    * between them leaves the data recoverable in the tmp dir but the
    * target missing) — the honest production answer is a table format
    * with atomic commits (Delta/Iceberg MERGE); this is the best plain
    * filesystem layout can do, and strictly better than Overwrite mode's
    * delete-target-then-write, which loses the old data the moment the
    * write starts.
    */
  /** Recursive delete, existence-tolerant — the demolition half of a
    * delete-then-rebuild (e.g. [[CorpusPipeline.refreshFull]] retiring
    * stale live indexes before reseeding them).
    */
  def delete(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  def replaceWith(spark: SparkSession, target: String)(write: String => Unit): Unit = {
    val tmp = target + ".tmp-" + java.util.UUID.randomUUID().toString.take(8)
    write(tmp)
    val p = new Path(target)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(new Path(tmp), p)
    ()
  }
}
