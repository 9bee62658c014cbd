package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered orientation
  * (the MapReduce form of Schank's node-iterator — Suri & Vassilvitskii,
  * "Counting Triangles and the Curse of the Last Reducer", WWW 2011).
  *
  * The naive wedge join — E ⋈ E on the shared endpoint, probe E for
  * the closing edge — generates deg(v)² wedges at node v: one celebrity
  * hub produces more wedges than the rest of the graph combined (the
  * "last reducer" curse). Orienting every edge from its (degree, id)-
  * smaller endpoint to its larger one fixes this: each triangle is
  * generated exactly once (from its smallest corner), and the oriented
  * out-degree is O(√m) for ANY graph — a hub's wedges are split across
  * the many low-degree nodes pointing at it. Wedge volume drops from
  * Σ deg² to O(m^1.5), and every step is an equi-join or a map-side-
  * combined groupBy — no windows, no driver state.
  */
object Triangles {

  /** `edges`: undirected edge list (columns `src`, `dst`), self-loops
    * and duplicate/reversed copies tolerated. Returns one row per
    * node that closes >= 1 triangle: (node, n_triangles).
    */
  def perNode(edges: DataFrame): DataFrame = {
    // canon and oriented each feed multiple joins below; persist so
    // the caller's edge-building lineage (often an expensive
    // similarity join) runs once, not once per consumer
    val canon = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // (degree, id)-order: a total order, so orientation is acyclic;
    // both endpoints come from one explode (single pass over canon)
    val deg = canon
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    val withDeg = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // wedges from each smallest corner u: pick the (deg,id)-ordered
    // pair of out-neighbors once, then close with the oriented edge
    // v -> w (v precedes w in orientation order by construction)
    val ord = oriented
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    val e1 = ord.select(col("u"), col("v"), col("dv"))
    val e2 = ord.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("u"), col("v"), col("w"))
    val tris = wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))

    tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }
}
