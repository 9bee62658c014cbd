package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: when one join key carries a
  * disproportionate share of rows (the classic hot-user / hot-item
  * problem at 100 TB), a plain shuffle join sends the whole hot key to
  * one reducer. Salting splits it `saltFactor` ways:
  *
  *  - the skewed (large) side gets a random salt in [0, saltFactor);
  *  - the other side is replicated once per salt value;
  *  - the join key becomes (key, salt) — uniform partitions.
  *
  * AQE's skew-join handles moderate skew automatically (and stays on
  * by default in this engine); explicit salting is for the pathological
  * keys AQE's split thresholds don't reach, and as the building block
  * when the small side is too big to broadcast.
  */
object SkewJoin {

  /** Inner equi-join of `skewed` with `other` on `key`, salted
    * `saltFactor` ways. Result columns = skewed's ++ other's (minus the
    * duplicate key), exactly as `skewed.join(other, key)`.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = skewed.withColumn("__salt",
      (rand(42L) * saltFactor).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
