package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Typed aggregator: top-k (score, id) pairs per group, ordered by
  * (score DESC, id ASC) — deterministic under ties.
  *
  * Scale rationale: the window-rank formulation of per-query top-k
  * shuffles EVERY scored candidate row to the query's partition before
  * sorting. As an aggregate, Spark runs it partial+final: each map task
  * keeps a k-bounded buffer per query, so only |queries|·k rows per
  * partition cross the shuffle — the difference between shipping
  * |corpus| rows and shipping k rows, per query.
  */
object TopK {

  type Entry = (Double, Long) // (score, id)

  /** k-bounded buffer; trimming is amortized (sort+cut at 2k). */
  final case class Buf(k: Int, entries: mutable.ArrayBuffer[Entry]) {
    def add(e: Entry): Buf = {
      entries += e
      if (entries.length >= 2 * k) trim() else this
    }
    def trim(): Buf = {
      if (entries.length > k) {
        val kept = entries.sorted(ord).take(k)
        entries.clear()
        entries ++= kept
      }
      this
    }
  }

  // score DESC with Spark's TOTAL double order (Double.compare ranks
  // NaN greatest), id ASC tiebreak: `-s` under IEEE ordering would
  // sort a NaN score (zero-norm embedding cosine) LAST and silently
  // drop it from the buffer, while the window-rank formulation ranks
  // it FIRST — the two "identical contract" paths would diverge
  private def ord: Ordering[Entry] = (a: Entry, b: Entry) => {
    val byScore = java.lang.Double.compare(b._1, a._1)
    if (byScore != 0) byScore else java.lang.Long.compare(a._2, b._2)
  }

  final class TopKAggregator(k: Int)
      extends Aggregator[Entry, Buf, Seq[Entry]] {
    override def zero: Buf = Buf(k, mutable.ArrayBuffer.empty)
    override def reduce(b: Buf, a: Entry): Buf = b.add(a)
    override def merge(b1: Buf, b2: Buf): Buf = {
      b1.entries ++= b2.entries
      b1.trim()
    }
    override def finish(b: Buf): Seq[Entry] =
      b.entries.sorted(ord).take(k).toSeq
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Untyped DataFrame entry point:
    * `df.groupBy("q_id").agg(TopK.topKUdaf(5)(col("score"), col("id")))`
    * → `array<struct<_1:double,_2:bigint>>`, best first.
    */
  def topKUdaf(k: Int): UserDefinedFunction =
    udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
}
