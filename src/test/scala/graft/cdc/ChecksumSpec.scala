package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Table fingerprints must be pure content functions: invariant under
  * partitioning and row order, sensitive to any row change, and the
  * sum component must catch the duplicated-pair case XOR cancels.
  */
class ChecksumSpec extends SparkSpec {

  import spark.implicits._

  private def fp(df: DataFrame): (Long, Long, Long) =
    Checksum.fingerprint(df,
        Seq(col("id").cast("string"), col("payload")))
      .as[(Long, Long, Long)].head()

  private def table(n: Int): DataFrame =
    spark.range(1, n + 1).select(col("id"),
      concat(lit("row-"), col("id")).as("payload"))

  test("invariant under repartitioning and ordering") {
    val base = fp(table(500))
    assert(fp(table(500).repartition(13)) == base)
    assert(fp(table(500).orderBy(col("id").desc)) == base)
    assert(fp(table(500).repartitionByRange(7, col("payload"))) == base)
  }

  test("any single-row mutation moves the fingerprint") {
    val base = fp(table(100))
    val mutated = table(100).withColumn("payload",
      when(col("id") === 42, lit("row-42-corrupted"))
        .otherwise(col("payload")))
    val m = fp(mutated)
    assert(m._1 == base._1 && (m._2 != base._2 || m._3 != base._3))
    val dropped = fp(table(100).filter(col("id") =!= 42))
    assert(dropped._1 == base._1 - 1)
  }

  test("sum_fp catches the duplicated pair XOR is blind to") {
    val base = table(50)
    // add TWO extra copies of rows 7 and 8: the extra copies xor away
    // pairwise (x ⊕ x = 0), so xor_fp cannot see the corruption —
    // n_rows and sum_fp must
    val extra = base.filter(col("id").isin(7, 8))
    val dupPair = base.union(extra).union(extra)
    val (bn, bx, bs) = fp(base)
    val (dn, dx, ds) = fp(dupPair)
    assert(dx == bx, "xor is expected-blind here")
    assert(dn != bn && ds != bs)
  }
}
