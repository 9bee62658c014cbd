package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: interleave the bits of two columns
  * so range-partitioned files get tight bounding boxes in BOTH
  * dimensions — parquet min/max stats then skip files for predicates
  * on either column, where a single-column sort only skips on its
  * leading column. The standard multi-dimensional data-skipping
  * layout (Delta/Iceberg OPTIMIZE ZORDER does exactly this).
  *
  * The interleave is pure bitwise Column algebra — shifts and masks,
  * whole-stage-codegen'd, no UDF.
  */
object ZOrder {

  /** Spread the low 32 bits of `c` so bit i lands at position 2i
    * (classic magic-mask bit dilation).
    */
  private def spread(c: Column): Column = {
    var v = c.cast("long").bitwiseAND(lit(0xffffffffL))
    v = (shiftleft(v, 16).bitwiseOR(v)).bitwiseAND(lit(0x0000ffff0000ffffL))
    v = (shiftleft(v, 8).bitwiseOR(v)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    v = (shiftleft(v, 4).bitwiseOR(v)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    v = (shiftleft(v, 2).bitwiseOR(v)).bitwiseAND(lit(0x3333333333333333L))
    v = (shiftleft(v, 1).bitwiseOR(v)).bitwiseAND(lit(0x5555555555555555L))
    v
  }

  /** 64-bit Morton code of two non-negative 32-bit columns: x in the
    * even bits, y in the odd bits.
    */
  def mortonCode(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Write parquet z-ordered on (xCol, yCol): range-partition by the
    * Morton code into `numFiles` files, sort within each — every file
    * covers a compact curve segment, i.e. a small rectangle in (x, y)
    * space, so min/max stats prune on either column.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String,
      yCol: String, numFiles: Int): Unit = {
    val z = mortonCode(col(xCol), col(yCol)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
