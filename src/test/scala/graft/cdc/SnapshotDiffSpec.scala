package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot-to-snapshot CDC derivation (graft.cdc.SnapshotDiff):
  * classification correctness including the null-payload traps, plus
  * the round-trip property that justifies the operator — applying the
  * derived changelog to the old snapshot reproduces the new one.
  */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  private def oldSnap = Seq(
    (1L, Some(10.0), Some("a")),   // unchanged
    (2L, Some(20.0), Some("b")),   // price update
    (3L, Some(30.0), Some("c")),   // deleted
    (4L, None: Option[Double], Some("d")),  // null -> value update
    (5L, Some(50.0), None: Option[String])  // payload all-null survives
  ).toDF("id", "price", "status")

  private def newSnap = Seq(
    (1L, Some(10.0), Some("a")),
    (2L, Some(21.0), Some("b")),
    (4L, Some(40.0), Some("d")),
    (5L, Some(50.0), None: Option[String]),
    (6L, Some(60.0), Some("f"))    // inserted
  ).toDF("id", "price", "status")

  test("classifies insert/update/delete; null-safe compare") {
    val ops = SnapshotDiff.diff(oldSnap, newSnap, "id",
        Seq("price", "status"))
      .select("id", "op").as[(Long, String)].collect().toMap
    assert(ops === Map(1L -> "UNCHANGED", 2L -> "UPDATE",
      3L -> "DELETE", 4L -> "UPDATE", 5L -> "UNCHANGED", 6L -> "INSERT"))
  }

  test("changelog drops UNCHANGED and nothing else") {
    val ops = SnapshotDiff.changelog(oldSnap, newSnap, "id",
        Seq("price", "status"))
      .select("op").as[String].collect()
    assert(ops.sorted === Array("DELETE", "INSERT", "UPDATE", "UPDATE"))
  }

  test("applying the changelog to old reproduces new (round trip)") {
    val log = SnapshotDiff.changelog(oldSnap, newSnap, "id",
      Seq("price", "status"))
    val applied = oldSnap
      .join(log.select(col("id"), col("op"),
        col("new_price"), col("new_status")), Seq("id"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "DELETE")
      .select(col("id"),
        when(col("op").isNull, col("price")).otherwise(col("new_price"))
          .as("price"),
        when(col("op").isNull, col("status")).otherwise(col("new_status"))
          .as("status"))
    val got = applied.as[(Long, Option[Double], Option[String])]
      .collect().sortBy(_._1)
    val want = newSnap.as[(Long, Option[Double], Option[String])]
      .collect().sortBy(_._1)
    assert(got === want)
  }
}
