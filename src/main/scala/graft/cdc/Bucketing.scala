package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod, xxhash64}

/** THE bucketing function of the maintained-table family. One copy on
  * purpose: Compaction, Scd2 and AggView all derive partition
  * directories from it, and any drift between writers and readers (or
  * between init and a later merge) would silently split a key across
  * buckets — the corruption no spec of a single operator can catch.
  */
private[cdc] object Bucketing {
  def bucketOf(key: Column, nBuckets: Int): Column =
    pmod(xxhash64(key), lit(nBuckets.toLong)).cast("int")

  /** The bucket a literal key hashes into, folded DRIVER-side through
    * the same Catalyst `xxhash64` expression [[bucketOf]] partitions
    * by — point lookups pay zero Spark jobs for the constant.
    */
  def bucketOfValue(v: Any, nBuckets: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Pmod, XxHash64}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    Cast(Pmod(new XxHash64(Seq(Literal(v))),
      Literal(nBuckets.toLong, LongType)), IntegerType)
      .eval().asInstanceOf[Int]
  }
}
