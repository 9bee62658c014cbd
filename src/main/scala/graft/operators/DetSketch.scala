package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-replayable sketches: HyperLogLog
  * registers (Flajolet et al. '07) and Count-Min counters (Cormode &
  * Muthukrishnan '05) built from md5-derived hashes instead of an
  * engine-private hash.
  *
  * The point: sketch CONTENTS become oracle-checkable. Spark's
  * `approx_count_distinct` / datasketches aggregates are correct but
  * engine-specific — no other system can reproduce their state, so a
  * correctness harness can only check rows-exist. With a fixed public
  * hash, every register/counter is an integer any engine derives
  * independently (DuckDB replays the identical md5 fold), while the
  * ESTIMATE's error bounds stay a ScalaTest property. At scale both
  * sketches are one map-side-combined groupBy over constant-size
  * state: registers/counters are the ONLY shuffled rows — m (resp.
  * depth×width) rows regardless of input size — and merging shards =
  * max (resp. sum) per cell, which is exactly the groupBy.
  */
object DetSketch {

  /** 60-bit non-negative hash of a column's string form (identical to
    * DuckDB's ('0x' || substr(md5(v), 1, 15))::BIGINT).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** HLL registers with m=2^p buckets: bucket = h mod m, and the
    * register is max over rows of rho(h div m) = leading-zero count
    * (within the remaining 60-p bits) + 1. `length(bin(w))` is the
    * bit length — exact integer arithmetic in both engines. Only
    * non-empty buckets are emitted (absent bucket = register 0).
    */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16)
    val m = 1 << p
    val bits = 60 - p
    val h = df.select(hash60(col(keyCol)).as("h"))
    h.select((col("h") % m).as("bucket"),
        when(expr(s"h div $m") === 0, lit(bits + 1))
          .otherwise(lit(bits + 1) - length(bin(expr(s"h div $m"))))
          .cast("long").as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("register"))
  }

  /** Standard HLL estimate from `hllRegisters` output (driver-side,
    * for specs/consumers): alpha_m * m^2 / sum(2^-M_j), empty buckets
    * counted at 2^0, with the small-range linear-counting correction.
    */
  def hllEstimate(registers: Seq[(Long, Long)], p: Int = 6): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val present = registers.toMap
    val zeros = m - present.size
    val z = (0 until m).map(b =>
      math.pow(2.0, -present.getOrElse(b.toLong, 0L).toDouble)).sum
    val e = alpha * m * m / z
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Count-Min counters: depth hash rows, width buckets each; counter
    * = number of input rows landing in (d, w). Point estimate = min
    * over depth of the key's counters — never an underestimate, over
    * by at most ~n/width w.h.p. The depth hashes are disjoint 8-hex
    * (32-bit) lanes of ONE md5 digest — one hash per row, not depth
    * (measured 2.25s -> one md5 per row at sf0.1), and 32 bits is
    * ample for any practical width.
    */
  def cmsCounters(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 64): DataFrame = {
    require(depth >= 1 && depth <= 4 && width >= 2)
    val dig = df.select(md5(col(keyCol).cast("string").cast("binary"))
      .as("dig"))
    dig.select(posexplode(array((1 to depth).map(d =>
        conv(substring(col("dig"), (d - 1) * 8 + 1, 8), 16, 10)
          .cast("long") % width): _*)).as(Seq("d0", "w")))
      .select((col("d0") + 1).cast("long").as("d"), col("w"))
      .groupBy(col("d"), col("w")).agg(count(lit(1)).as("cnt"))
  }

  /** Per-group HLL registers — the production shape (distinct users
    * per segment/day/type): one map-side-combined groupBy whose state
    * is m registers per group, shuffling |groups|·m rows however many
    * input rows exist.
    */
  def hllRegistersBy(df: DataFrame, groupCols: Seq[String], keyCol: String,
      p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16)
    val m = 1 << p
    val bits = 60 - p
    val h = df.select((groupCols.map(col) :+
      hash60(col(keyCol)).as("h")): _*)
    h.select((groupCols.map(col) :+ (col("h") % m).as("bucket") :+
        when(expr(s"h div $m") === 0, lit(bits + 1))
          .otherwise(lit(bits + 1) - length(bin(expr(s"h div $m"))))
          .cast("long").as("rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("register"))
  }

  /** KMV (bottom-k minimum values / theta-sketch ancestor): the k
    * smallest distinct md5-60bit hashes of the key column. Fully
    * deterministic and ORDER-FREE — bottom-k of a set is partition-
    * invariant, and merging shards is bottom-k of the union — so the
    * sketch state itself is oracle-exact (ORDER BY hash LIMIT k in any
    * engine). Distinct-count estimate: (k-1) · 2^60 / h_k. Plan shape:
    * map-side-combined distinct on 8-byte hashes, then
    * TakeOrderedAndProject (per-partition k-bounded heads + k-way
    * merge — never a global sort); the rank window runs over k rows.
    */
  def kmvBottomK(df: DataFrame, keyCol: String, k: Int = 32): DataFrame = {
    require(k >= 2)
    import org.apache.spark.sql.expressions.Window
    val bottom = df.select(hash60(col(keyCol)).as("h"))
      .distinct().orderBy(col("h")).limit(k)
    bottom.withColumn("rank",
        row_number().over(Window.orderBy(col("h"))).cast("long"))
      .select(col("rank"), col("h"))
  }

  /** Distinct-count estimate from `kmvBottomK` output (driver-side,
    * for specs): (k-1)/U(h_k) with U = h_k / 2^60; if fewer than k
    * distinct hashes exist the sketch IS the exact distinct set.
    */
  def kmvEstimate(bottom: Seq[Long], k: Int = 32): Double =
    if (bottom.size < k) bottom.size.toDouble
    else (k - 1).toDouble * math.pow(2.0, 60) / bottom.max.toDouble

  /** Theta-style SET OPERATIONS on two KMV sketches (the reason KMV
    * beats HLL when you need more than one set): sketch A and B to
    * bottom-k, then
    *  - |A∪B| from the bottom-k of the merged sketch (KMV union is
    *    closed: bottom-k of a union ≡ bottom-k of the two bottom-ks);
    *  - |A∩B| theta-style (Dasgupta et al., the DataSketches theta
    *    sketch): θ = min(θ_A, θ_B); the common hashes ≤ θ are a
    *    uniform sample of A∩B at rate θ/2^60, so the estimate is
    *    n_common · 2^60 / θ.
    * Everything is derived from the deterministic md5-60bit hash, so
    * the entire one-row output — sketch sizes, thetas, sample counts
    * AND double estimates — replays exactly in the DuckDB oracle.
    * Plan: two map-side-combined distincts + TakeOrdered(k) each, then
    * k-row-frame joins; the shuffle never carries more than k rows per
    * partition regardless of input size, and the sketches are the only
    * state a streaming/incremental caller would persist.
    */
  def kmvSetOps(a: DataFrame, b: DataFrame, keyCol: String,
      k: Int = 128): DataFrame = {
    require(k >= 2)
    val pow60 = lit(1152921504606846976L).cast("double") // 2^60 exact
    def bottom(df: DataFrame) =
      df.select(hash60(col(keyCol)).as("h")).distinct()
        .orderBy(col("h")).limit(k)
    val ka = bottom(a)
    val kb = bottom(b)
    val aStats = ka.agg(count(lit(1)).as("n_a"), max(col("h")).as("theta_a"))
    val bStats = kb.agg(count(lit(1)).as("n_b"), max(col("h")).as("theta_b"))
    val uStats = ka.union(kb).distinct().orderBy(col("h")).limit(k)
      .agg(count(lit(1)).as("n_union_k"), max(col("h")).as("theta_u"))
    val common = ka.join(kb, "h")
    val joined = aStats.crossJoin(bStats).crossJoin(uStats)
      .withColumn("theta", least(col("theta_a"), col("theta_b")))
    val inter = common.crossJoin(
        joined.select(col("theta").as("theta_cut")))
      .filter(col("h") <= col("theta_cut"))
      .agg(count(lit(1)).as("n_inter"))
    joined.crossJoin(inter)
      .select(col("n_a"), col("theta_a"), col("n_b"), col("theta_b"),
        col("theta"), col("n_union_k"), col("theta_u"), col("n_inter"),
        when(col("n_union_k") < k, col("n_union_k").cast("double"))
          .otherwise(lit((k - 1).toDouble) * pow60
            / col("theta_u").cast("double")).as("union_est"),
        (col("n_inter").cast("double") * pow60
          / col("theta").cast("double")).as("inter_est"))
  }

  /** One-pass grouped HLL as a typed Aggregator: the aggregation
    * STATE is the m-long register buffer itself, merged pointwise —
    * so a grouped sketch shuffles ONE 2^p-long array per (partition,
    * group) instead of 2^p (bucket, rho) rows per group
    * ([[hllRegistersBy]]'s shape). Same md5 fold, so exploding the
    * array reproduces `hllRegistersBy` exactly (spec-pinned) and the
    * same SQL oracle applies. p <= 12 keeps the buffer <= 32 KB.
    */
  final class HllAggregator(p: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Array[Long], Seq[Long]] {
    private val m = 1 << p
    private val bits = 60 - p
    override def zero: Array[Long] = new Array[Long](m)
    override def reduce(b: Array[Long], key: String): Array[Long] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      val bucket = (h % m).toInt
      val w = h / m
      val rho =
        if (w == 0L) bits + 1
        else bits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > b(bucket)) b(bucket) = rho.toLong
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.Encoders.kryo[Array[Long]]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def hllUdaf(p: Int = 6): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllAggregator(p),
      org.apache.spark.sql.Encoders.STRING)

  /** Maintained HLL register state on disk: `init` writes the
    * registers of a first batch; `merge` folds a new batch in —
    * union + groupBy max, the HLL merge rule — and rewrites the
    * state. The state is <= 2^p rows regardless of how much data has
    * ever flowed through, which is the point: a streaming
    * distinct-count whose checkpointable footprint is constant.
    */
  def initHllState(df: DataFrame, keyCol: String, dir: String,
      p: Int = 6): Unit =
    hllRegisters(df, keyCol, p)
      .withColumn("p", lit(p))
      .coalesce(1).write.mode("overwrite").parquet(dir)

  def mergeHllState(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch: DataFrame, keyCol: String): Unit = {
    val stored = spark.read.parquet(dir)
    val p = stored.select(max(col("p"))).head().getInt(0)
    val merged = stored.select(col("bucket"), col("register"))
      .unionByName(hllRegisters(batch, keyCol, p))
      .groupBy(col("bucket")).agg(max(col("register")).as("register"))
      .withColumn("p", lit(p))
    // registers are <= 2^p rows: stage through a local array rather
    // than a self-referential overwrite of the directory being read
    val rows = merged.collect()
    import spark.implicits._
    rows.map(r => (r.getLong(0), r.getLong(1), p))
      .toSeq.toDF("bucket", "register", "p")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Point-estimate a key's frequency from `cmsCounters` output
    * (driver-side, for specs): min over depth rows.
    */
  def cmsEstimate(counters: Seq[(Int, Long, Long)], key: String,
      depth: Int = 4, width: Int = 64): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (1 to depth).map { d =>
      val w = java.lang.Long.parseLong(
        hex.substring((d - 1) * 8, d * 8), 16) % width
      counters.collectFirst { case (`d`, `w`, c) => c }.getOrElse(0L)
    }.min
  }
}
