package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual skew guard for the
  * cases AQE's runtime skew-join can't rewrite (stream-static joins,
  * joins feeding a co-partitioned aggregation, or engines pinned to a
  * fixed partitioning). A hot key's fact rows all hash to one shuffle
  * partition in a plain join; salting scatters each fact row across
  * `salt` sub-keys and replicates the dim side ×salt, so the hot key's
  * work spreads over `salt` tasks at the cost of a salt-times larger
  * dim shuffle. Same contract as `fact.join(dim, Seq(key))` with dim
  * keys unique; pick salt ≈ hot-key volume / healthy-partition volume.
  * (In-plan cousins already shipped elsewhere in this engine: the
  * simhash band salt and the seq-pack shard key.) */
object SkewJoin {

  /** The per-row sub-key: content hash + the row's partition-local
    * ordinal (monotonically_increasing_id = partition_id·2³³ + ordinal).
    * The ordinal term is what makes BYTE-IDENTICAL duplicate rows — the
    * log-spam shape, a hot key whose rows are all the same — round-robin
    * across sub-keys instead of collapsing onto one (a pure content
    * hash sends every copy to the same sub-partition, resurrecting the
    * skew the operator exists to kill). Placement is deterministic for
    * a deterministic input partitioning+order (true of file scans, so
    * reruns of the same plan place rows identically); after an upstream
    * shuffle only the DISTRIBUTION is guaranteed, which is the property
    * the join needs — any salt value is correct, dim carries all of
    * them. */
  def saltCol(df: DataFrame, salt: Int): Column =
    pmod(hash(df.columns.map(col): _*) + monotonically_increasing_id(),
      lit(salt.toLong))

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    val s = fact.withColumn("__salt", saltCol(fact, salt))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    s.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
