package graft.catalog

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Compaction

/** Property coverage for metadata-only RENAME chains: over arbitrary
  * sequences of renames interleaved with merges, every read resolves
  * each generation directory's physical names correctly — the final
  * table contents equal the model (a plain map updated in lockstep),
  * regardless of how many epochs the files span.
  */
class AlterRenamePropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  // a step is either a rename of the current data column or a merge
  // writing a batch under the CURRENT name
  private val genSteps: Gen[List[Int]] =
    Gen.listOfN(6, Gen.choose(0, 2)) // 0 = rename, 1/2 = merge flavors

  test("rename/merge interleavings read back the model") {
    var round = 0
    check(Prop.forAll(genSteps) { steps =>
      round += 1
      val dir = tmpDir(s"alter-prop-$round")
      val init = (0L until 30L).map(i => (i, s"v0-$i", 0L, false))
        .toDF("id", "data0", "ver", "gone")
      Compaction.init(init, dir, Seq("id"), "ver", "gone", 4, Nil)
      val model = scala.collection.mutable.Map(
        (0L until 30L).map(i => i -> s"v0-$i"): _*)
      var col0 = "data0"
      var gen = 0
      var ver = 0L
      steps.foreach {
        case 0 =>
          val next = s"data${gen + 1}"
          Compaction.alterSchema(spark, dir, Seq(
            Compaction.SchemaChange.RenameColumn(col0, next)))
          col0 = next
          gen += 1
        case flavor =>
          ver += 1
          val ids = (0L until 30L).filter(_ % (flavor + 2) == 0)
          val batch = ids.map(i => (i, s"v$ver-$i", ver, false))
            .toDF("id", col0, "ver", "gone")
          Compaction.merge(spark, dir, batch,
            mergeOnRead = flavor == 2, retainHistory = true)
          ids.foreach(i => model(i) = s"v$ver-$i")
      }
      val got = Compaction.read(spark, dir)
        .select(col("id"), col(col0))
        .as[(Long, String)].collect().toMap
      got == model.toMap
    }, minTests = 8)
  }
}
