package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join and scatters the hot key") {
    import spark.implicits._
    // 90% of fact rows share one key — the shape that melts one task
    val fact = spark.range(10000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100)
        .as("k"), col("id").as("payload"))
    val dim = spark.range(100).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("attr"))
    val plain = fact.join(dim, Seq("k"))
    val salted = SkewJoin.saltedJoin(fact, dim, "k", 8)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getString(2))
    assert(salted.collect().map(key).sorted.toSeq
      === plain.collect().map(key).sorted.toSeq)
    // the join really runs on (k, __salt): the hot key occupies up to
    // `salt` distinct sub-keys instead of one
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
    val spread = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(8)))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(spread === 8)
  }
}
