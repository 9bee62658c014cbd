package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction (the `OPTIMIZE` maintenance operator): bin-pack
  * a parquet directory's under-sized files into ~target-sized ones,
  * touching NOTHING else. Streaming sinks, incremental merges and
  * per-batch appends all shed small files continuously; at 100 TB the
  * resulting listing/footer/task overhead — every query pays a task per
  * file regardless of file size — is one of the dominant real-world
  * slowdowns, and the fix must not cost a full-table rewrite.
  *
  * Contract:
  *  - only files with size < `smallBytes` are candidates; every file at
  *    or above the threshold is never read, rewritten, or moved
  *    (asserted byte-for-byte in OptimizeSpec);
  *  - candidates are packed per PARENT DIRECTORY — a partitioned layout
  *    (`bucket=N/`, `date=D/`) keeps rows inside their partition, so
  *    partition pruning is unaffected;
  *  - packing is first-fit-decreasing into `targetBytes` bins; a
  *    directory contributing a single small file is left alone (a
  *    rewrite that cannot reduce the file count is pure churn);
  *  - each bin is rewritten read → temp file → move into place → delete
  *    originals. Plain-parquet caveat, stated not hidden: a crash
  *    between the move and the deletes leaves BOTH old and new files
  *    visible (duplicate rows) until re-run; closing that window needs
  *    a transaction log (Delta/Iceberg's job), so run compaction from a
  *    single maintenance process, like every non-transactional table.
  *
  * Cost: O(small-file bytes) read+write and O(files) listing — never
  * O(table). Row content is preserved exactly (same rows, new layout);
  * readers see identical query results before and after.
  */
object Optimize {

  final case class Stats(
      filesConsidered: Int,
      filesCompacted: Int,
      bytesCompacted: Long,
      filesWritten: Int)

  /** First-fit-decreasing bin packing of (file, size) into bins whose
    * sizes sum to <= `targetBytes` (a single file larger than the
    * target gets its own bin — can't split). Pure and deterministic;
    * exposed for OptimizeSpec.
    */
  private[sources] def planBins(files: Seq[(String, Long)],
      targetBytes: Long): Seq[Seq[(String, Long)]] = {
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[(String, Long)], Long)]
    // sort by size desc, path asc — deterministic plan for equal sizes
    files.sortBy { case (p, sz) => (-sz, p) }.foreach { f =>
      val i = bins.indexWhere(_._2 + f._2 <= targetBytes)
      if (i >= 0) { bins(i)._1 += f; bins(i) = (bins(i)._1, bins(i)._2 + f._2) }
      else bins += ((scala.collection.mutable.ArrayBuffer(f), f._2))
    }
    bins.map(_._1.toSeq).toSeq
  }

  /** Compact `dir` (recursively, per parent directory). Returns what
    * was done. `smallBytes` defaults to half the target: a file above
    * that already amortizes its per-file overhead reasonably, and
    * repacking near-target files would churn bytes for marginal count
    * reduction.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
      smallBytes: Long = -1L): Stats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val small = if (smallBytes > 0) smallBytes else targetBytes / 2
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)

    val all = listParquet(fs, root)
    val candidates = all.filter(_.getLen < small)
    val byParent = candidates.groupBy(_.getPath.getParent.toString)

    var compacted = 0
    var bytes = 0L
    var written = 0
    byParent.foreach { case (parent, files) =>
      // single small file in a directory: repacking can't shrink the
      // file count there — skip (churn guard)
      if (files.size >= 2) {
        val bins = planBins(
          files.map(f => (f.getPath.toString, f.getLen)), targetBytes)
        bins.filter(_.size >= 2).foreach { bin =>
          val paths = bin.map(_._1)
          val tmp = new Path(parent,
            s".compact-tmp-${java.util.UUID.randomUUID().toString}")
          // one output file per bin: the bin was sized to the target
          spark.read.parquet(paths: _*).coalesce(1)
            .write.mode("overwrite").parquet(tmp.toString)
          val outFiles = listParquet(fs, tmp, includeTmp = true)
          require(outFiles.nonEmpty, s"compaction produced no output in $tmp")
          outFiles.zipWithIndex.foreach { case (of, i) =>
            val dest = new Path(parent,
              s"compacted-${java.util.UUID.randomUUID().toString}-$i.parquet")
            require(fs.rename(of.getPath, dest), s"rename failed: $dest")
            written += 1
          }
          fs.delete(tmp, true)
          // originals go last: a crash before this point leaves the old
          // files authoritative plus orphaned new ones (see object doc)
          paths.foreach(p => fs.delete(new Path(p), false))
          compacted += bin.size
          bytes += bin.map(_._2).sum
        }
      }
    }
    Stats(all.size, compacted, bytes, written)
  }

  /** `includeTmp = false` (candidate listing) skips `.compact-tmp-*`
    * staging dirs — a crashed run's leftovers must not be packed as if
    * they were table data; `true` lists a staging dir's own output.
    */
  private def listParquet(fs: org.apache.hadoop.fs.FileSystem,
      p: Path, includeTmp: Boolean = false): Seq[FileStatus] = {
    if (!fs.exists(p)) return Nil
    val it = fs.listFiles(p, true)
    val buf = Seq.newBuilder[FileStatus]
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && !n.startsWith("_") && !n.startsWith(".") &&
          n.endsWith(".parquet") &&
          (includeTmp || !f.getPath.toString.contains("/.compact-tmp-")))
        buf += f
    }
    buf.result()
  }
}
