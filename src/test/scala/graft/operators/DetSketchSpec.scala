package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The deterministic sketches must (a) compute registers/counters a
  * reference Scala md5 fold reproduces exactly, (b) merge by plain
  * groupBy (max / sum per cell — partition invariance), and (c) honor
  * the published error bounds: HLL within a few standard errors,
  * Count-Min never underestimating and over by <= eps*n w.h.p.
  */
class DetSketchSpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private val keys = (1 to 5000).map(i => (i % 1200).toLong) // 1200 distinct

  test("HLL registers match a reference md5 fold exactly") {
    val df = keys.toDF("k")
    val got = DetSketch.hllRegisters(df, "k", p = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = keys.distinct
      .map(k => h60(k.toString))
      .groupBy(_ % 64)
      .map { case (b, hs) =>
        b -> hs.map { h =>
          val w = h / 64
          if (w == 0) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        }.max
      }
    assert(got == expected)
  }

  test("HLL estimate within 3 standard errors (m=64 -> ~13% sigma)") {
    val df = keys.toDF("k")
    val regs = DetSketch.hllRegisters(df, "k", p = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val est = DetSketch.hllEstimate(regs, p = 6)
    assert(math.abs(est - 1200.0) / 1200.0 < 3 * 1.04 / 8,
      s"estimate $est vs true 1200")
  }

  test("registers are partition-invariant (merge = groupBy max)") {
    val a = DetSketch.hllRegisters(keys.toDF("k").repartition(1), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = DetSketch.hllRegisters(keys.toDF("k").repartition(13), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("Count-Min never underestimates; point estimates bounded") {
    // skewed frequencies: key i appears i times
    val rows = (1 to 80).flatMap(i => Seq.fill(i)(i.toLong))
    val n = rows.size
    val counters = DetSketch.cmsCounters(rows.toDF("k"), "k").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2))).toSeq
    assert(counters.map(_._3).sum == 4L * n) // every row in every depth
    for (i <- Seq(1, 10, 40, 80)) {
      val est = DetSketch.cmsEstimate(counters, i.toString)
      assert(est >= i, s"key $i underestimated: $est")
      // CM bound: overestimate <= 2n/width with prob 1-(1/2)^depth;
      // allow the full e*n/width slack to keep the test robust
      assert(est <= i + 3.0 * n / 64, s"key $i overestimate: $est")
    }
    // an absent key's estimate is bounded by collision mass, not zero
    assert(DetSketch.cmsEstimate(counters, "absent") <= 3 * n / 64)
  }

  test("grouped registers: each group's sketch equals its solo sketch") {
    val rows = (1 to 3000).map(i => (s"g${i % 3}", (i % (100 * (i % 3 + 1))).toLong))
    val grouped = DetSketch.hllRegistersBy(rows.toDF("g", "k"), Seq("g"), "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val solo = Seq("g0", "g1", "g2").flatMap { g =>
      DetSketch.hllRegisters(
          rows.filter(_._1 == g).map(_._2).toDF("k"), "k")
        .collect().map(r => (g, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(grouped == solo)
  }

  test("HllAggregator state form == hllRegistersBy rows, any partitioning") {
    val rows = (1 to 2000).map(i => (s"g${i % 3}", (i % 321).toLong))
    val hll = DetSketch.hllUdaf(6)
    def viaAgg(parts: Int) = rows.toDF("g", "k").repartition(parts)
      .groupBy(col("g")).agg(hll(col("k").cast("string")).as("regs"))
      .select(col("g"), posexplode(col("regs")).as(Seq("bucket", "register")))
      .filter(col("register") > 0)
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
      .toSet
    val viaRows = DetSketch.hllRegistersBy(rows.toDF("g", "k"), Seq("g"), "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg(1) == viaRows)
    assert(viaAgg(13) == viaRows)
  }

  test("KMV: bottom-k matches reference; merge = bottom-k of union") {
    val a = (1 to 700).map(i => s"a$i")
    val b = (1 to 700).map(i => s"b$i")
    val refBottom = (a ++ b).distinct.map(h60).sorted.take(32)
    val got = DetSketch.kmvBottomK((a ++ b).toDF("k"), "k", 32)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(got == refBottom)
    // mergeability: bottom-k of (sketch(a) U sketch(b)) == sketch(a U b)
    val sa = DetSketch.kmvBottomK(a.toDF("k"), "k", 32)
      .collect().map(_.getLong(1)).toSeq
    val sb = DetSketch.kmvBottomK(b.toDF("k"), "k", 32)
      .collect().map(_.getLong(1)).toSeq
    assert((sa ++ sb).distinct.sorted.take(32) == refBottom)
  }

  test("KMV estimate within 3 standard errors; small sets exact") {
    val n = 1400
    val keys = (1 to n).map(i => s"k$i")
    val bottom = DetSketch.kmvBottomK(keys.toDF("k"), "k", 32)
      .collect().map(_.getLong(1)).toSeq
    val est = DetSketch.kmvEstimate(bottom, 32)
    val sigma = 1.0 / math.sqrt(30)
    assert(math.abs(est - n) / n < 3 * sigma, s"estimate $est vs $n")
    val tiny = DetSketch.kmvBottomK((1 to 7).map(i => s"t$i").toDF("k"), "k", 32)
      .collect().map(_.getLong(1)).toSeq
    assert(DetSketch.kmvEstimate(tiny, 32) == 7.0)
  }

  test("counters are partition-invariant (merge = groupBy sum)") {
    val rows = (1 to 500).map(i => (i % 37).toLong)
    val a = DetSketch.cmsCounters(rows.toDF("k").repartition(1), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = DetSketch.cmsCounters(rows.toDF("k").repartition(11), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
