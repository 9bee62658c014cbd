package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank in exact integer arithmetic.
  *
  * Rank mass is carried as BIGINT units of `totalMass` (default 1e12),
  * and every per-iteration op — the out-degree split `r div deg`, the
  * damping `(85·Σ) div 100`, the teleport base `(15·M div 100) div N`
  * — is integer division, so the per-node inbox sum is an associative
  * BIGINT sum: the result is bit-identical across engines, partition
  * counts, and shuffle orders, which is what lets a SQL oracle replay
  * the iterations verbatim. (Float PageRank sums in nondeterministic
  * order; truncation here leaks ≤1 unit of mass per node per round —
  * irrelevant at 1e12 scale and fully deterministic.)
  *
  * Scale shape: each iteration is one join of the edge list with the
  * current ranks on `src` (partial-aggregated groupBy on `dst`) — the
  * classic Pregel/GraphX superstep expressed declaratively, so AQE
  * handles skewed hub nodes by splitting the probe side. Edges and
  * degrees persist once; K is fixed and small (PageRank converges
  * geometrically, and a fixed budget is the production norm).
  *
  * Callers must ensure every node has ≥1 out-edge (feed a symmetrized
  * edge list, as the dangling-mass redistribution term is deliberately
  * not modeled — it would need a per-round driver scalar).
  */
object PageRank {

  /** `edges`: directed (src, dst) pairs, pre-deduplicated. Returns
    * (node, rank_scaled) with Σ rank_scaled ≈ totalMass.
    */
  def ranks(edges: DataFrame, iterations: Int,
            totalMass: Long = 1000000000000L,
            dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && dampingPct > 0 && dampingPct < 100)
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    val basePct = 100 - dampingPct
    var ranks = deg.crossJoin(broadcast(n))
      .select(col("node"), col("deg"),
        expr(s"$totalMass div n_nodes").as("r"))
    for (_ <- 1 to iterations) {
      val contrib = ranks
        .select(col("node").as("src"), expr("r div deg").as("c"))
      val inbox = e.join(contrib, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      ranks = deg.crossJoin(broadcast(n))
        .join(inbox, col("node") === col("dst"), "left")
        .select(col("node"), col("deg"),
          (expr(s"($basePct * $totalMass div 100) div n_nodes") +
            expr(s"($dampingPct * coalesce(in_sum, 0)) div 100")).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }
}
