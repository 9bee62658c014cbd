package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Feed-driven replica maintenance with consumer-side resume — the
  * complete CDC chain (source merge → change feed → replica merge)
  * closed over the engine's own operators, plus the piece
  * [[Compaction.feedAsChangelog]] leaves to the caller: REMEMBERING
  * where the consumer is.
  *
  * The offset lives in a [[TxLog]] manifest under `<replica>/_sync`
  * (`last_batch`), committed only AFTER the replica merge: a crash in
  * between replays the same feed slice, and the merge's (key, version)
  * semantics make the replay a no-op — at-least-once apply, exactly-
  * once state. Catch-up applies the whole unseen batch range in ONE
  * partition-pruned feed read + ONE merge (version order resolves
  * cross-batch winners; a later re-insert outranks an earlier delete
  * by version exactly as it did at the source).
  *
  * This is the consumer-side mirror of the reference's watermark
  * discipline (`/root/reference/app/services/watermark.py` — advance
  * only after the export landed), at table scale.
  */
object Replicator {

  private def syncDir(replicaDir: String) = s"$replicaDir/_sync"

  /** Highest feed batch the source has published (−1 if none). */
  private[graft] def sourceHead(spark: SparkSession, sourceDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$sourceDir/feed")
    val fs = TxLog.fs(spark, sourceDir)
    val fromDirs = if (!fs.exists(p)) -1L
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("batch=") => s.drop(6).toLong }
      .foldLeft(-1L)(math.max)
    math.max(fromDirs, TxLog.latest(spark, sourceDir)
      .map(_.counter("next_feed_batch") - 1L).getOrElse(-1L))
  }

  /** The replica's last applied feed batch (−1 before the first sync). */
  def lastApplied(spark: SparkSession, replicaDir: String): Long =
    TxLog.latest(spark, syncDir(replicaDir))
      .flatMap(_.prop("last_batch")).map(_.toLong).getOrElse(-1L)

  /** Highest batch in (from, upTo] whose directory is PUBLISHED,
    * walking contiguously: a committed-but-unpublished batch (a writer
    * that crashed between its commit and the feed publish) stops the
    * walk, so a consumer can never skip it — catch-up resumes once the
    * publish is repaired ([[Compaction.repairFeed]], or the sweep
    * after the orphan grace). O(new batches) existence probes; no
    * listing.
    */
  private[graft] def publishedThrough(spark: SparkSession,
      sourceDir: String, from: Long, upTo: Long): Long = {
    val fs = TxLog.fs(spark, sourceDir)
    var h = from
    while (h < upTo && fs.exists(new org.apache.hadoop.fs.Path(
        s"$sourceDir/feed/batch=${h + 1}"))) h += 1
    h
  }

  /** Clone the source's CURRENT state into a fresh replica table and
    * fence the consumer at the source's published head: batches whose
    * effects the snapshot already contains are never re-applied.
    */
  def init(spark: SparkSession, sourceDir: String, replicaDir: String,
      nBuckets: Int = 0): Unit = {
    val (key, versionCol, deleteCol, srcBuckets) =
      Compaction.readMeta(spark, sourceDir)
    // ORDER MATTERS: the epoch is read FIRST, then the head, then the
    // state copy. A RESTORE landing after the epoch read makes the
    // first sync refuse (source epoch advanced past the recorded one)
    // — the conservative direction. Reading the epoch AFTER the head
    // would be the unsound order: a restore between the two would
    // record the post-restore epoch with a pre-restore head, and the
    // first sync would replay the rewound batches onto the restored
    // snapshot with no fence ever firing. A plain merge landing
    // between head and the state copy stays convergent (the batch
    // replays into a keyed merge).
    val epoch = Compaction.feedEpoch(spark, sourceDir)
    val head = sourceHead(spark, sourceDir)
    // readMeta joins a composite key with commas; decode so the
    // replica inherits the source's key TUPLE, not one bogus column
    Compaction.init(Compaction.read(spark, sourceDir), replicaDir,
      Bucketing.decodeKeys(key), versionCol, deleteCol,
      if (nBuckets > 0) nBuckets else srcBuckets)
    TxLog.fs(spark, replicaDir)
      .delete(new org.apache.hadoop.fs.Path(syncDir(replicaDir)), true)
    TxLog.invalidate(syncDir(replicaDir))
    TxLog.commit(spark, syncDir(replicaDir), 0L,
      Map("last_batch" -> head.toString,
        "feed_epoch" -> epoch.toString))
  }

  /** Apply every feed batch the replica has not seen; returns the new
    * consumer position (−1 ⇒ source never published). Idempotent: a
    * crashed sync's replay converges, and a sync with nothing new is
    * a metadata-only no-op.
    *
    * `upTo` bounds the drain: only batches ≤ it are merged and the
    * offset advances no further. This is how a rate-limited streaming
    * consumer ([[graft.streaming.StreamingReplicator]]'s
    * `maxBatchesPerTrigger`) makes its admission control bound APPLIED
    * work, not just stream offsets — each micro-batch merges exactly
    * its admitted feed slice instead of the first one draining the
    * whole backlog.
    */
  def sync(spark: SparkSession, sourceDir: String, replicaDir: String,
      upTo: Long = Long.MaxValue): Long = {
    val last = lastApplied(spark, replicaDir)
    // RESTORE fence (r12), checked FIRST — even a sync with nothing
    // new to apply must refuse: the source state moved BACKWARD under
    // this consumer, and a version-ordered merge cannot converge
    // through that (a restored row's version is older than the
    // delete/update it undoes, so the replica's stale winner keeps
    // winning). Re-init (Replicator.init) re-seeds from the restored
    // snapshot and re-fences at the new epoch.
    val srcEpoch = Compaction.feedEpoch(spark, sourceDir)
    val seenEpoch = TxLog.latest(spark, syncDir(replicaDir))
      .map(_.counter("feed_epoch")).getOrElse(0L)
    if (srcEpoch != seenEpoch)
      throw new IllegalStateException(
        s"source at $sourceDir was RESTOREd to an earlier version " +
          s"(feed epoch $srcEpoch; this replica initialized at epoch " +
          s"$seenEpoch) — incremental sync cannot converge through a " +
          "backward state move; re-initialize the replica from the " +
          "current source snapshot (Replicator.init)")
    val committedHead = math.min(sourceHead(spark, sourceDir), upTo)
    if (committedHead <= last) return last
    // retention fence: maintain(maxFeedAge)/vacuum(feedBefore) delete
    // the expired batch prefix at the source. Applying across the gap
    // would silently skip those changes and the replica would diverge
    // forever — fail loudly instead; the operator re-inits the
    // replica from a fresh snapshot (Replicator.init re-fences).
    // the RECORDED horizon is authoritative when present (retention
    // stamps it before deleting and never crosses a recoverable lost
    // publish); oldest-surviving-dir is the pre-marker legacy fallback
    // — classifying by dirs alone would misread a repairable crashed
    // publish below the oldest dir as a permanent retention gap
    val (hz, minDir) = Compaction.feedFloor(spark, sourceDir)
    val minAvail =
      if (hz > 0L) hz else minDir.getOrElse(committedHead + 1L)
    if (last + 1L < minAvail)
      throw new IllegalStateException(
        s"source feed batches ${last + 1}..${minAvail - 1} were " +
          "removed by retention; the replica cannot catch up " +
          "incrementally — re-initialize it from the current source " +
          "snapshot (Replicator.init)")
    // never apply past (or across) an unpublished batch: a committed
    // batch whose dir is missing is a crashed publish, and skipping it
    // would diverge silently — stop BEFORE it and report no progress
    // until repairFeed/the sweep finishes the publish
    val head = publishedThrough(spark, sourceDir, last, committedHead)
    if (head <= last) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"feed batch ${last + 1} of $sourceDir is committed but not " +
          "published (writer crashed between commit and publish?); " +
          "sync is blocked until graft.cdc.Compaction.repairFeed " +
          "republishes it")
      return last
    }
    val (_, _, deleteCol, _) = Compaction.readMeta(spark, replicaDir)
    val slice = Compaction.readFeed(spark, sourceDir)
      .filter(col("batch") > last && col("batch") <= head) // partition-pruned
    Compaction.merge(spark, replicaDir,
      Compaction.feedAsChangelog(slice, deleteCol))
    // the offset advances only after the merge committed: the crash
    // window between the two replays, never skips
    val state = TxLog.latest(spark, syncDir(replicaDir))
    val v = state.map(_.version + 1L).getOrElse(0L)
    TxLog.commit(spark, syncDir(replicaDir), v,
      Map("last_batch" -> head.toString,
        // the epoch this sync verified against carries forward (it
        // equals srcEpoch — the fence above passed)
        "feed_epoch" -> seenEpoch.toString))
    TxLog.vacuum(spark, syncDir(replicaDir), v)
    head
  }
}
