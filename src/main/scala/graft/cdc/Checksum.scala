package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-insensitive table fingerprinting for export validation — the
  * scaled analog of the reference's per-export accounting
  * (`rowsExported`, `/root/reference/app/main.py:46-53`): after a CDC
  * export or compaction lands, source and destination must agree on
  * content, not just row count, and re-reading either side in a
  * different partition order must not change the answer.
  *
  * Each row canonicalizes to a '|'-joined string, hashes to a 60-bit
  * value (top 15 hex digits of md5 — the cross-engine-safe width, see
  * dedup_simhash), and the table folds to three scalars:
  *
  *  - `n_rows`    — plain count;
  *  - `xor_fp`    — XOR of row hashes: commutative/associative, so any
  *    partitioning, ordering, or merge tree yields the same value;
  *  - `sum_fp`    — sum of hashes mod a prime: also order-free, and
  *    catches the duplicated-pair rows XOR is blind to (x ⊕ x = 0).
  *
  * All three are algebraic aggregates with map-side partials — one
  * shuffle of 3 scalars per partition regardless of table size.
  */
object Checksum {

  /** 60-bit row hash of the given (already stringified) columns. */
  def rowHash(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", cols: _*)), 1, 15), 16, 10)
      .cast("long")

  /** One-row (n_rows, xor_fp, sum_fp) fingerprint of `df` over the
    * canonicalized `cols`. Callers must stringify non-string columns
    * deterministically first (timestamps via date_format, doubles via
    * a DECIMAL cast) — raw double rendering differs across engines.
    */
  def fingerprint(df: DataFrame, cols: Seq[Column]): DataFrame =
    df.select(rowHash(cols).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_fp"),
        sum(col("h") % lit(1000000007L)).as("sum_fp"))
}
