package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod, xxhash64}

/** THE bucketing function of the maintained-table family. One copy on
  * purpose: Compaction, Scd2 and AggView all derive partition
  * directories from it, and any drift between writers and readers (or
  * between init and a later merge) would silently split a key across
  * buckets — the corruption no spec of a single operator can catch.
  *
  * Composite keys hash ALL key columns through one `xxhash64` call in
  * the table's declared key order; the single-column form is the
  * one-element case of the same function, so pre-composite tables'
  * layouts are unchanged byte-for-byte.
  */
private[graft] object Bucketing {
  def bucketOf(keys: Seq[Column], nBuckets: Int): Column =
    pmod(xxhash64(keys: _*), lit(nBuckets.toLong)).cast("int")

  def bucketOf(key: Column, nBuckets: Int): Column =
    bucketOf(Seq(key), nBuckets)

  /** The bucket a tuple of literal key values hashes into, folded
    * DRIVER-side through the same Catalyst `xxhash64` expression
    * [[bucketOf]] partitions by — point lookups pay zero Spark jobs
    * for the constant.
    */
  def bucketOfValues(vs: Seq[Any], nBuckets: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Pmod, XxHash64}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    Cast(Pmod(new XxHash64(vs.map(Literal(_))),
      Literal(nBuckets.toLong, LongType)), IntegerType)
      .eval().asInstanceOf[Int]
  }

  def bucketOfValue(v: Any, nBuckets: Int): Int =
    bucketOfValues(Seq(v), nBuckets)

  /** Manifest encoding of the key column list (comma-joined — init
    * rejects commas in key names so the round-trip is unambiguous).
    */
  def encodeKeys(keys: Seq[String]): String = {
    require(keys.nonEmpty, "at least one key column required")
    keys.foreach(k => require(!k.contains(","),
      s"key column name '$k' may not contain a comma"))
    require(keys.distinct.size == keys.size,
      s"duplicate key columns: ${keys.mkString(", ")}")
    keys.mkString(",")
  }

  def decodeKeys(prop: String): Seq[String] =
    prop.split(",").toSeq.filter(_.nonEmpty)
}
