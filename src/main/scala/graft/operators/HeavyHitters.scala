package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters (Misra & Gries '82; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * A capacity-m summary processed over n items retains EVERY item with
  * true frequency > n/(m+1) (underestimating each count by at most
  * n/(m+1)), and the PODS'12 merge — pointwise sum, then subtract the
  * (m+1)-th largest count and drop non-positives — preserves that
  * guarantee across Spark's partial/final aggregation, which is what
  * makes this usable as a distributed `udaf`: each map task keeps an
  * m-bounded buffer, so the shuffle carries m entries per partition
  * instead of one row per distinct key.
  *
  * The production two-pass pattern (`exactHeavyHitters`): pass 1 runs
  * the sketch (bounded memory, superset of candidates guaranteed);
  * pass 2 re-scans counting ONLY candidates (a broadcast semi-join —
  * the exact-count aggregation state is m keys, not |vocabulary|).
  * Output = provably exact heavy hitters above any threshold ≥ the
  * sketch guarantee, with exact counts — so a plain GROUP BY/HAVING
  * oracle can check the whole pipeline, sketch included.
  */
object HeavyHitters {

  final case class Buf(m: Int, counts: mutable.Map[String, Long]) {
    def add(key: String): Buf = {
      counts.get(key) match {
        case Some(c) => counts(key) = c + 1
        case None if counts.size < m => counts(key) = 1L
        case None => // decrement-all step, drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          counts.keysIterator.foreach { k =>
            val c = counts(k) - 1
            if (c <= 0) dead += k else counts(k) = c
          }
          dead.foreach(counts.remove)
      }
      this
    }
  }

  final class MisraGries(m: Int)
      extends Aggregator[String, Buf, Map[String, Long]] {
    override def zero: Buf = Buf(m, mutable.Map.empty)
    override def reduce(b: Buf, key: String): Buf = b.add(key)
    override def merge(b1: Buf, b2: Buf): Buf = {
      b2.counts.foreach { case (k, c) =>
        b1.counts(k) = b1.counts.getOrElse(k, 0L) + c
      }
      if (b1.counts.size > m) {
        // subtract the (m+1)-th largest count from everything
        val cut = b1.counts.values.toSeq.sorted(Ordering[Long].reverse)(m)
        val dead = mutable.ArrayBuffer.empty[String]
        b1.counts.keysIterator.foreach { k =>
          val c = b1.counts(k) - cut
          if (c <= 0) dead += k else b1.counts(k) = c
        }
        dead.foreach(b1.counts.remove)
      }
      b1
    }
    override def finish(b: Buf): Map[String, Long] = b.counts.toMap
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]()
  }

  def misraGriesUdaf(m: Int): UserDefinedFunction =
    udaf(new MisraGries(m), Encoders.STRING)

  /** Exact heavy hitters: every `keyCol` value whose count × denom >
    * total count, with exact counts — sketch pass (capacity m) for
    * candidates, then an exact count of candidates only. Requires
    * m + 1 ≥ denom so the sketch guarantee covers the threshold.
    */
  /** Maintained MG state on disk: <= m (key, cnt) rows plus the
    * running total, merged per batch with the PODS'12 rule (pointwise
    * sum, then subtract the (m+1)-th largest and drop non-positives).
    * The state stays a SUPERSET of every key with true frequency >
    * n/(m+1) over everything ever folded in, each count understated
    * by at most n/(m+1). The merge is monotone but NOT idempotent:
    * an at-least-once replayed batch inflates counts — the superset
    * guarantee survives (counts only grow), with bounds relative to
    * the total actually streamed (replays included).
    */
  def initMgState(items: DataFrame, keyCol: String, dir: String,
      m: Int): Unit = {
    val spark = items.sparkSession
    val sk = sketchRows(items, keyCol, m)
    val n = items.count()
    writeState(spark, dir, sk, n, m)
  }

  def mergeMgState(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch: DataFrame, keyCol: String): Unit = {
    val meta = spark.read.parquet(dir)
    val m = meta.select(max(col("m"))).head().getInt(0)
    val prevTotal = meta.select(max(col("n_total"))).head().getLong(0)
    val stored = meta.select(col("key"), col("cnt"))
      .filter(col("key").isNotNull).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val batchSketch = sketchRows(batch, keyCol, m)
    val summed = mutable.Map[String, Long](stored: _*)
    batchSketch.foreach { case (k, c) =>
      summed(k) = summed.getOrElse(k, 0L) + c
    }
    val trimmed: Seq[(String, Long)] =
      if (summed.size <= m) summed.toSeq
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(m)
        summed.toSeq.map { case (k, c) => k -> (c - cut) }
          .filter(_._2 > 0)
      }
    writeState(spark, dir, trimmed, prevTotal + batch.count(), m)
  }

  private def sketchRows(items: DataFrame, keyCol: String,
      m: Int): Seq[(String, Long)] =
    items.agg(misraGriesUdaf(m)(col(keyCol)).as("mg"))
      .select(explode(col("mg")).as(Seq("key", "cnt")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  private def writeState(spark: org.apache.spark.sql.SparkSession,
      dir: String, rows: Seq[(String, Long)], nTotal: Long,
      m: Int): Unit = {
    import spark.implicits._
    // a null-key sentinel keeps (n_total, m) readable when the sketch
    // is empty (empty corpus / all counts cancelled at the cut)
    val padded = if (rows.nonEmpty) rows else Seq((null: String, 0L))
    padded.map { case (k, c) => (k, c, nTotal, m) }
      .toDF("key", "cnt", "n_total", "m")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def exactHeavyHitters(items: DataFrame, keyCol: String, m: Int,
      denom: Long): DataFrame = {
    require(m + 1 >= denom, s"capacity $m cannot guarantee 1/$denom hitters")
    val cand = items
      .agg(misraGriesUdaf(m)(col(keyCol)).as("mg"))
      .select(explode(map_keys(col("mg"))).as(keyCol))
    val total = items.agg(count(lit(1)).as("n_total"))
    items.join(broadcast(cand), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * denom > col("n_total"))
      .withColumn("freq_bp", expr("(10000 * cnt) div n_total"))
      .select(col(keyCol), col("cnt"), col("freq_bp"))
  }
}
