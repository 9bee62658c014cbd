package graft.cdc

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** One writer's attempt to advance a maintained table by one version —
  * the staging/install/commit mechanics shared by [[Compaction]],
  * [[Scd2]] and [[AggView]], made safe for CONCURRENT writers:
  *
  *  - the staging directory is writer-unique (`.staging-<txn>`), so
  *    two in-flight merges never overwrite each other's staged data
  *    (the old shared `.staging` made any second writer destructive);
  *  - the installed generation directory is writer-unique
  *    (`g<V>-<txn>`), so two writers racing to the same next version
  *    install side by side and the manifest CAS in [[TxLog.commit]]
  *    picks the winner — the loser's install can never collide with,
  *    or be mistaken for, the winner's;
  *  - on losing the CAS the loser reclaims its own generation and
  *    staging immediately (it provably owns them — no manifest ever
  *    named them) and rethrows [[TxLog.CommitConflict]] for
  *    [[TxLog.withOcc]] to retry against the new snapshot.
  *
  * This is the minimal optimistic-concurrency-control loop an ACID
  * table format runs under multi-writer load; conflict resolution is
  * "recompute against latest" (always correct) rather than bucket-
  * disjointness rebasing (an optimization a real cluster deployment
  * could add on top without changing the commit protocol).
  */
private[cdc] final class TableTxn(spark: SparkSession, dir: String,
    baseVersion: Long) {

  val id: String = java.util.UUID.randomUUID().toString.take(8)
  val newVersion: Long = baseVersion + 1L
  val staging: String = s"$dir/.staging-$id"
  private val genName: String = s"g$newVersion-$id"
  private val fs: FileSystem = TxLog.fs(spark, dir)

  /** Manifest-relative path for a bucket staged by this transaction. */
  def bucketRel(b: Int): String = s"$genName/bucket=$b"

  /** Bucket ids the staged write actually produced (a bucket whose
    * rows all vanished stages no partition).
    */
  def stagedBucketIds(sub: String = "data"): Seq[Int] = {
    val p = new Path(s"$staging/$sub")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("bucket=") => s.drop(7).toInt }
  }

  /** Move the staged data (if any) under its unique generation name —
    * invisible to readers until the manifest commit that follows —
    * then CAS-commit the manifest. The ONLY mutation of committed
    * state is the commit rename inside [[TxLog.commit]].
    */
  def installAndCommit(newBuckets: Map[Int, String],
      props: Map[String, String]): TxLog.Snapshot = {
    val stagedData = new Path(s"$staging/data")
    if (fs.exists(stagedData)) {
      fs.mkdirs(new Path(s"$dir/data"))
      val dst = new Path(s"$dir/data/$genName")
      require(fs.rename(stagedData, dst),
        s"install rename failed: $stagedData -> $dst")
      // the rename PRESERVES the staging dir's mtime, which dates from
      // the START of the staging write — a staging phase longer than
      // the orphan grace would make this just-installed (live!)
      // generation immediately sweep-eligible in the install-to-commit
      // window. Re-stamp both the generation and the surviving staging
      // dir (it still holds the un-published feed batch) to NOW so the
      // grace clock measures from install, not from staging start.
      TxLog.hygiene {
        val now = System.currentTimeMillis()
        fs.setTimes(dst, now, -1)
        fs.setTimes(new Path(staging), now, -1)
      }
    }
    try TxLog.commit(spark, dir, newVersion,
      props ++ TxLog.bucketProps(newBuckets))
    catch {
      case e: TxLog.CommitConflict =>
        fs.delete(new Path(s"$dir/data/$genName"), true)
        cleanup()
        throw e
    }
  }

  /** Drop this transaction's staging directory (idempotent). */
  def cleanup(): Unit = fs.delete(new Path(staging), true)
}
