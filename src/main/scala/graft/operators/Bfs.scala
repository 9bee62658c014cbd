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
