package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual skew guard for the
  * cases AQE's runtime skew-join can't rewrite (stream-static joins,
  * joins feeding a co-partitioned aggregation, or engines pinned to a
  * fixed partitioning). A hot key's fact rows all hash to one shuffle
  * partition in a plain join; salting scatters each fact row across
  * `salt` sub-keys (deterministic row hash — reruns place every row
  * identically) and replicates the dim side ×salt, so the hot key's
  * work spreads over `salt` tasks at the cost of a salt-times larger
  * dim shuffle. Same contract as `fact.join(dim, Seq(key))` with dim
  * keys unique; pick salt ≈ hot-key volume / healthy-partition volume.
  * (In-plan cousins already shipped elsewhere in this engine: the
  * simhash band salt and the seq-pack shard key.) */
object SkewJoin {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    val s = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(salt)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    s.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
