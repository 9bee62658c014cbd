package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot CDC derivation: given two keyed snapshots of
  * the same table, emit the changelog that transforms the old one into
  * the new one (INSERT / UPDATE / DELETE per key).
  *
  * This is the inverse direction of the reference's export pipeline
  * (which *applies* per-row `operation` tags downstream,
  * /root/reference/app/services/export_service.py:64-82): when a
  * source cannot produce a changelog, diffing consecutive snapshots
  * reconstructs one. Standard warehouse technique (a.k.a. snapshot
  * CDC); at 100 TB the plan is exactly one co-partitioned full-outer
  * sort-merge join on the key — both sides shuffle once on `key`, and
  * if the snapshots are written bucketed-by-key (see
  * `CorpusSink`/`Compaction` layouts) the exchange disappears
  * entirely. No window functions, no driver state.
  *
  * Null semantics: a value column changing to/from NULL must count as
  * an UPDATE, so value comparison uses null-safe equality (`<=>`)
  * per column, not a struct equality (struct `=` would make the whole
  * comparison NULL when any side holds a NULL).
  */
object SnapshotDiff {

  /** Diff `oldSnap` → `newSnap` on `key`; `valueCols` are the compared
    * payload columns (both inputs must carry them). Returns one row
    * per key present in either snapshot, tagged `op` ∈
    * INSERT/DELETE/UPDATE/UNCHANGED, with `old_<c>`/`new_<c>` pairs.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           key: String, valueCols: Seq[String]): DataFrame = {
    // Explicit aliases: both snapshots routinely derive from the SAME
    // source relation (two filters over one table), which makes bare
    // df(key) references ambiguous under Spark's self-join analysis.
    val o = oldSnap
      .select(col(key) +: valueCols.map(c => col(c).as(s"old_$c")): _*)
      .as("snap_old")
    val n = newSnap
      .select(col(key) +: valueCols.map(c => col(c).as(s"new_$c")): _*)
      .as("snap_new")
    // Presence flags must come from the join keys, not payload nulls:
    // a present row whose payload is entirely NULL is still present.
    val oldKey = col(s"snap_old.$key")
    val newKey = col(s"snap_new.$key")
    val joined = o.join(n, oldKey === newKey, "full_outer")
    val same: Column = valueCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    // One select, no withColumn: the joined frame holds TWO columns
    // named `key`, so positional/qualified references are the only
    // unambiguous way to address them.
    joined.select(
      coalesce(oldKey, newKey).as(key) +:
        when(oldKey.isNull, "INSERT")
          .when(newKey.isNull, "DELETE")
          .when(same, "UNCHANGED")
          .otherwise("UPDATE").as("op") +:
        valueCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** The changelog view: drop UNCHANGED keys (the overwhelming bulk at
    * real scale — CDC output size is O(changes), not O(table)).
    */
  def changelog(oldSnap: DataFrame, newSnap: DataFrame,
                key: String, valueCols: Seq[String]): DataFrame =
    diff(oldSnap, newSnap, key, valueCols).filter(col("op") =!= "UNCHANGED")
}
