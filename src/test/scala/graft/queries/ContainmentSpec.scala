package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of `dedup_containment` (TextQueries): asymmetric
  * shingle-containment must flag a document EMBEDDED inside a longer
  * one — the case symmetric Jaccard dilutes below threshold — and the
  * df-cap stop-shingle guard must keep boilerplate from generating
  * candidate pairs.
  */
class ContainmentSpec extends SparkSpec {

  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)], prefix: String): String = {
    val dir = tmpDir(prefix)
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String) =
    TextQueries.queries("dedup_containment")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("embedded document is flagged with full containment, host is not") {
    val inner = (1 to 20).map(i => s"w$i").mkString(" ")
    val host = "preamble tokens here first " + inner +
      " and a long trailing section " +
      (1 to 30).map(i => s"t$i").mkString(" ")
    val other = (1 to 25).map(i => s"z$i").mkString(" ")
    val dir = writeDocs(Seq((1L, inner), (2L, host), (3L, other)), "containment")
    val pairs = run(dir)
    // every 5-shingle of doc 1 appears verbatim in doc 2
    assert(pairs.get((1L, 2L)).contains(10000L))
    // the host is NOT contained in the embedded doc, and the unrelated
    // doc pairs with nothing
    assert(!pairs.contains((2L, 1L)))
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
    // symmetric Jaccard on word sets would NOT reach the 0.6 bar here —
    // the asymmetric measure is what catches the embedding
    val ws = Set(inner.split(" "): _*)
    val wh = Set(host.split(" "): _*)
    val jac = (ws & wh).size.toDouble / (ws | wh).size
    assert(jac < 0.6)
  }

  test("stop-shingle guard drops boilerplate shared by >100 docs") {
    val boiler = "common header shared by all"
    // 120 docs: identical 5-token boilerplate + unique 10-token bodies.
    // Without the df-cap every doc pair would share the boilerplate
    // shingle and the candidate join would be ~120² rows.
    val docs = (1L to 120L).map { i =>
      (i, boiler + " " + (1 to 10).map(j => s"u${i}x$j").mkString(" "))
    }
    val dir = writeDocs(docs, "containment-boiler")
    assert(run(dir).isEmpty)
  }
}
