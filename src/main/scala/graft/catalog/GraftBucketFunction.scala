package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The maintained tables' bucketing function exposed through the
  * catalog's `FunctionCatalog` surface — the identity storage-
  * partitioned joins (SPJ) match on: two scans whose
  * `KeyGroupedPartitioning` carries `bucket(n, key)` resolved to THIS
  * function (same canonical name, same argument list) are co-
  * partitioned, and Spark joins them WITHOUT a shuffle.
  *
  * The evaluation is bit-identical to [[graft.cdc.Bucketing]] —
  * `pmod(xxhash64(keys…), n)` with Catalyst's chained seed-42 xxhash —
  * so a partition value Spark computes (e.g. for partially-clustered
  * distribution) can never disagree with where the writers actually
  * placed a row.
  */
private[catalog] object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(nBuckets, key...): the maintained tables' hash bucket " +
      "(pmod(xxhash64(key...), nBuckets))"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      "bucket takes (nBuckets, key column(s))")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the literal bucket count (int), " +
        s"got ${inputType.fields(0).dataType.simpleString}")
    val types = inputType.fields.map(_.dataType)
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = types
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        // Catalyst XxHash64 over the key columns: fold the running
        // hash as the next column's seed, starting at 42
        var h = 42L
        var i = 1
        while (i < types.length) {
          val v = if (input.isNullAt(i)) null else input.get(i, types(i))
          if (v != null) h = XxHash64Function.hash(v, types(i), h)
          i += 1
        }
        (((h % n) + n) % n).toInt
      }
    }
  }
}
