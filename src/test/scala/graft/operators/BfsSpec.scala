package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bounded BFS must produce exact minimum hop counts: chains, cycles
  * (shortest way around), multiple sources (min over sources),
  * unreachable nodes absent, hop budget respected, and partition
  * invariance.
  */
class BfsSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
      k: Int): Map[Long, Int] =
    Bfs.hops(edges.toDF("src", "dst"), sources.toDF("node"), k)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("chain: dist = position; budget cuts the tail") {
    val chain = (0L until 6L).map(i => (i, i + 1))
    assert(run(chain, Seq(0L), 6) ==
      (0L to 6L).map(i => i -> i.toInt).toMap)
    assert(run(chain, Seq(0L), 2) == Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("cycle: shortest way around (directed)") {
    val cycle = (0L until 5L).map(i => (i, (i + 1) % 5))
    assert(run(cycle, Seq(0L), 10) ==
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
    val sym = cycle ++ cycle.map(_.swap)
    assert(run(sym, Seq(0L), 10) ==
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 1))
  }

  test("multiple sources take the minimum; unreachable stay absent") {
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 6L), (8L, 9L))
    val got = run(edges, Seq(0L, 5L), 3)
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 5L -> 0, 6L -> 1))
  }

  test("ssspRounds: bounded Bellman-Ford == reference relaxation") {
    // cheap long way round vs expensive direct edge; a 2-edge path
    // only reachable with enough rounds
    val edges = Seq(
      (0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 2L), // 0->1 direct 10, via 2 = 3
      (1L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    def run(r: Int): Map[Long, Long] =
      Bfs.ssspRounds(edges, Seq(0L).toDF("node"), r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(1) == Map(0L -> 0L, 1L -> 10L, 2L -> 1L))
    assert(run(2) == Map(0L -> 0L, 1L -> 3L, 2L -> 1L, 3L -> 11L))
    assert(run(4) == Map(0L -> 0L, 1L -> 3L, 2L -> 1L, 3L -> 4L, 4L -> 5L))
    // reference Bellman-Ford, same round budget
    val es = edges.as[(Long, Long, Long)].collect()
    var ref = Map(0L -> 0L)
    for (_ <- 1 to 4) {
      val relaxed = es.flatMap { case (s0, d0, w0) =>
        ref.get(s0).map(ds => d0 -> (ds + w0))
      }
      ref = (ref.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    assert(run(4) == ref)
  }

  test("partition invariance") {
    val edges = (for (a <- 0L until 25L; b <- 0L until 25L
      if a != b && (a * 31 + b) % 7 == 0) yield (a, b)).toVector
    val one = Bfs.hops(edges.toDF("src", "dst").repartition(1),
      Seq(0L).toDF("node"), 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val many = Bfs.hops(edges.toDF("src", "dst").repartition(9),
      Seq(0L).toDF("node"), 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(one == many)
  }
}
