package graft.cdc

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property tests for the op classifier (SURVEY.md §5c): the
  * {DELETE, INSERT, UPDATE} partition is total and mutually exclusive for
  * all (is_deleted, created_at, updated_at) combinations, with DELETE
  * taking precedence (`/root/reference/app/services/exports.py:40-45`).
  * Evaluated through the real Catalyst expression, not a Scala re-model.
  */
class OpsPropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop, minTests: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  private val tsGen: Gen[Timestamp] =
    Gen.choose(1700000000000L, 1800000000000L).map(new Timestamp(_))

  private val rowGen: Gen[UserRow] = for {
    id <- Gen.choose(1L, 1000000L)
    created <- tsGen
    // bias towards the created==updated edge case
    updated <- Gen.frequency(1 -> Gen.const(created), 2 -> tsGen)
    deleted <- Gen.oneOf(true, false)
  } yield UserRow(id, s"n$id", s"e$id@x.com", created, updated, deleted)

  test("operation classifier is total, exclusive, and DELETE-precedent") {
    check(Prop.forAll(Gen.listOfN(20, rowGen)) { rows =>
      rows.isEmpty || {
        val out = Ops.withOperation(rows.toDF())
          .select("operation", "id", "is_deleted", "created_at", "updated_at")
          .collect()
        out.forall { r =>
          val op = r.getString(0)
          val del = r.getBoolean(2)
          val ins = r.getTimestamp(3) == r.getTimestamp(4)
          if (del) op == "DELETE"
          else if (ins) op == "INSERT"
          else op == "UPDATE"
        }
      }
    })
  }

  test("watermark monotonicity: after a successful export wm' = max(batch)") {
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val expected = rows.map(_.updated_at.getTime).max
      Ops.maxUpdatedAt(rows.toDF()).map(_.getTime).contains(expected)
    })
  }
}
