package graft.catalog

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources

import graft.SparkSpec

/** The catalog scan's filter translation must be EXACT wherever it
  * claims a translation (translated predicates reduce data inside the
  * inner plan; Spark re-applies everything above, so a wrong
  * translation would silently DROP rows, not add them — this pins
  * equivalence on data).
  */
class GraftScanTranslateSpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq(
    (1L, "alpha", Some(10)), (2L, "beta", None),
    (3L, "alphabet", Some(30)), (4L, "gamma", Some(40)))
    .toDF("id", "name", "score")

  private def rows(f: sources.Filter): Option[Set[Long]] =
    GraftScanBuilder.translate(f).map(p =>
      df.filter(p).select($"id").as[Long].collect().toSet)

  test("translated predicates match Spark-native evaluation") {
    assert(rows(sources.EqualTo("name", "alpha")) == Some(Set(1L)))
    assert(rows(sources.GreaterThan("score", 10)) == Some(Set(3L, 4L)))
    assert(rows(sources.GreaterThanOrEqual("score", 30)) == Some(Set(3L, 4L)))
    assert(rows(sources.LessThan("id", 3L)) == Some(Set(1L, 2L)))
    assert(rows(sources.In("id", Array(1L, 4L))) == Some(Set(1L, 4L)))
    assert(rows(sources.IsNull("score")) == Some(Set(2L)))
    assert(rows(sources.IsNotNull("score")) == Some(Set(1L, 3L, 4L)))
    assert(rows(sources.StringStartsWith("name", "alpha")) ==
      Some(Set(1L, 3L)))
    assert(rows(sources.StringEndsWith("name", "a")) ==
      Some(Set(1L, 2L, 4L)))
    assert(rows(sources.StringContains("name", "et")) == Some(Set(2L, 3L)))
    assert(rows(sources.And(sources.GreaterThan("id", 1L),
      sources.LessThan("id", 4L))) == Some(Set(2L, 3L)))
    assert(rows(sources.Or(sources.EqualTo("id", 1L),
      sources.EqualTo("id", 4L))) == Some(Set(1L, 4L)))
    assert(rows(sources.Not(sources.EqualTo("name", "beta"))) ==
      Some(Set(1L, 3L, 4L)))
    // null-safe equality
    assert(rows(sources.EqualNullSafe("name", "beta")) == Some(Set(2L)))
  }

  test("untranslatable filters (and composites containing one) decline") {
    assert(GraftScanBuilder.translate(
      sources.AlwaysTrue).isEmpty)
    assert(GraftScanBuilder.translate(sources.And(
      sources.EqualTo("id", 1L), sources.AlwaysTrue)).isEmpty)
    assert(GraftScanBuilder.translate(sources.Not(
      sources.AlwaysFalse)).isEmpty)
  }
}
