package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Validate._

/** Violation counts must be exact per check: planted nulls,
  * out-of-range values, duplicate keys (ALL rows of a >1 group count),
  * dangling foreign keys, and null semantics (a null value fails a
  * range/accepted check, but a null FK value is exempt per SQL FK
  * semantics).
  */
class ValidateSpec extends SparkSpec {

  import spark.implicits._

  private val dim = Seq(1L, 2L, 3L).toDF("id")

  private val rows = Seq(
    // (key, sub, value, flag, fk)
    (1L, 1, 5.0, "A", Some(1L)),
    (1L, 1, 7.0, "N", Some(2L)),   // duplicate (key, sub)
    (2L, 1, -1.0, "R", Some(3L)),  // out of range
    (3L, 1, 5.0, "X", Some(9L)),   // bad flag, dangling fk
    (4L, 1, 5.0, null, None),      // null flag fails; null fk exempt
  ).toDF("key", "sub", "value", "flag", "fk")

  test("exact violation counts per check") {
    val got = report(rows, Seq(
        notNull("flag"),
        inRange("value", 0.0, 10.0),
        acceptedValues("flag", Seq("A", "N", "R")),
        Unique("unique(key,sub)", Seq("key", "sub")),
        ForeignKey("fk(fk)", "fk", dim, "id")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got("not_null(flag)") == ((1L, false)))
    assert(got("in_range(value)") == ((1L, false)))
    assert(got("accepted_values(flag)") == ((2L, false))) // X and null
    assert(got("unique(key,sub)") == ((2L, false)))       // both dup rows
    assert(got("fk(fk)") == ((1L, false)))                // 9 dangles, null exempt
  }

  test("clean table passes every check") {
    val clean = Seq((1L, 1, 5.0, "A", Some(1L)))
      .toDF("key", "sub", "value", "flag", "fk")
    val got = report(clean, Seq(
        notNull("flag"), inRange("value", 0.0, 10.0),
        Unique("u", Seq("key", "sub")),
        ForeignKey("fk", "fk", dim, "id")))
      .collect()
    assert(got.forall(_.getBoolean(2)))
    assert(got.forall(_.getLong(1) == 0L))
  }

  test("custom predicate checks compose") {
    val got = report(rows, Seq(
        Predicate("value_vs_key", col("value") > col("key"))))
      .head()
    // rows where value <= key: (2,-1), (3,5>3 ok)... violations:
    // key=1 v=5 ok, key=1 v=7 ok, key=2 v=-1 BAD, key=3 v=5 ok, key=4 v=5 ok
    assert(got.getLong(1) == 1L)
  }
}
