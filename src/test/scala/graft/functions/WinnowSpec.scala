package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The winnowing guarantee, property-tested at the kernel level: for
  * ANY two token sequences sharing a run of length ≥ w + k − 1, both
  * select at least one ALIGNED (same k-gram) fingerprint inside the
  * run — the invariant ExactSpans' recall rests on.
  */
class WinnowSpec extends AnyFunSuite {

  private def winnowed(toks: Seq[String], k: Int,
      w: Int): Seq[(Int, Long)] = {
    val arr = new GenericArrayData(
      toks.map(t => UTF8String.fromString(t)).toArray[Any])
    val out = Winnow.compute(arr, k, w)
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 2)
      (r.getInt(0), r.getLong(1))
    }
  }

  test("guarantee: every shared run >= w+k-1 has an aligned selected anchor") {
    val k = 4
    val w = 5
    val minLen = w + k - 1 // 8
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { trial =>
      val runLen = minLen + rnd.nextInt(6)
      val run = Seq.fill(runLen)(s"r${rnd.nextInt(50)}")
      val offA = rnd.nextInt(8)
      val offB = rnd.nextInt(8)
      val a = Seq.fill(offA)(s"a${rnd.nextInt(1000)}") ++ run ++
        Seq.fill(rnd.nextInt(8))(s"x${rnd.nextInt(1000)}")
      val b = Seq.fill(offB)(s"b${rnd.nextInt(1000)}") ++ run ++
        Seq.fill(rnd.nextInt(8))(s"y${rnd.nextInt(1000)}")
      val selA = winnowed(a, k, w).toMap // pos -> fp
      val selB = winnowed(b, k, w).toMap
      // an aligned anchor: position p in [0, runLen-k] selected in
      // BOTH docs at the same run offset with the same fingerprint
      val aligned = (0 to runLen - k).exists { p =>
        (selA.get(offA + p), selB.get(offB + p)) match {
          case (Some(fa), Some(fb)) => fa == fb
          case _ => false
        }
      }
      assert(aligned,
        s"trial $trial: no aligned anchor (runLen=$runLen offA=$offA offB=$offB)")
    }
  }

  test("selection density ~ 2/(w+1), never empty at length >= k") {
    val toks = (1 to 500).map(i => s"t${i % 97}")
    val sel = winnowed(toks, 8, 9)
    assert(sel.nonEmpty)
    val density = sel.size.toDouble / (toks.size - 7)
    assert(density < 0.5, s"density $density")
    // deterministic
    assert(winnowed(toks, 8, 9) == sel)
  }

  test("short inputs: below k yields nothing; at k yields one anchor") {
    assert(winnowed(Seq("a", "b"), 4, 5).isEmpty)
    val one = winnowed(Seq("a", "b", "c", "d"), 4, 5)
    assert(one.size == 1 && one.head._1 == 0)
  }
}
