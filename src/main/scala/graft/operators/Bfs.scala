package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bounded-depth BFS: exact hop distances (0..maxHops) from a source
  * set over a directed edge list — the k-hop neighborhood/shortest-
  * path-length primitive (impact radius, supply-chain reach, fraud
  * rings).
  *
  * Each round is one frontier⋈edges equi-join plus a left_anti against
  * the settled set — the Pregel superstep expressed declaratively, so
  * AQE splits skewed hubs. State carried round-to-round is (node,
  * dist), persisted once per round; no window, no driver collection,
  * and the hop budget bounds the job count (production k-hop queries
  * fix k; full-graph BFS would add a convergence probe like
  * Dedup.connectedComponents').
  */
object Bfs {

  /** `edges`: (src, dst) directed pairs. `sources`: frame with a
    * `node` column, dist 0. Returns (node, dist) = minimum hop count,
    * for every node within `maxHops`.
    */
  /** Bounded Bellman-Ford: exact minimum-WEIGHT distances over paths
    * of <= `rounds` edges (integer weights — the min-plus semiring
    * analog of [[hops]]). Each round is one relax join plus a
    * map-side-combined `min` groupBy: a hub's candidate distances
    * collapse before the shuffle, and the round budget bounds the job
    * count exactly like the hop budget. Negative weights are fine
    * (it's Bellman-Ford); negative CYCLES are the caller's problem,
    * as everywhere.
    */
  def ssspRounds(edges: DataFrame, sources: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 0)
    val e = edges.select(col("src"), col("dst"), col("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, col("node") === col("src"))
        .select(col("dst").as("node"),
          (col("dist") + col("w")).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before releasing the parent lineage
      dist.unpersist()
      dist = next
    }
    dist
  }

  def hops(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    // probed once per hop: materialize the caller's edge lineage once
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var settled = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = settled
    for (k <- 1 to maxHops if !frontier.isEmpty) {
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
        .withColumn("dist", lit(k))
        .persist(StorageLevel.MEMORY_AND_DISK)
      settled = settled.unionAll(next)
        .persist(StorageLevel.MEMORY_AND_DISK)
      frontier = next
    }
    settled
  }
}
