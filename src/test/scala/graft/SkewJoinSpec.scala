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
    val spread = fact.withColumn("__salt", SkewJoin.saltCol(fact, 8))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(spread === 8)
  }

  test("byte-identical duplicate hot rows still scatter (log-spam shape)") {
    import spark.implicits._
    // every hot row IDENTICAL in all columns — a content-only salt
    // hashes them to ONE sub-key and the skew survives; the ordinal
    // term must round-robin them near-uniformly instead
    val fact = spark.range(8000)
      .select(lit(1L).as("k"), lit("same-payload").as("payload"))
      .union(spark.range(100).select(col("id").as("k"),
        concat(lit("p"), col("id")).as("payload")))
    val dim = spark.range(100).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("attr"))
    val sizes = fact.withColumn("__salt", SkewJoin.saltCol(fact, 8))
      .filter(col("k") === 1).groupBy("__salt").count()
      .collect().map(_.getLong(1))
    assert(sizes.length === 8,
      s"identical rows collapsed onto ${sizes.length} sub-key(s)")
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.max <= 1.5 * mean,
      s"duplicate hot rows unbalanced: ${sizes.mkString(",")}")
    // and the join contract is unchanged by the ordinal salt
    val plain = fact.join(dim, Seq("k")).count()
    assert(SkewJoin.saltedJoin(fact, dim, "k", 8).count() === plain)
  }

  test("salting balances the hot key's task input on the registered query's fact") {
    // the infra_skew_join relation: ~75% of events collapse onto user 0.
    // After salting, the hot key's rows must spread near-uniformly over
    // the 8 sub-keys — each join task gets ~1/8 of the hot volume, the
    // whole point of the operator (bound: no sub-key above 2x the mean).
    val fact = graft.queries.InfraQueries.skewedFact(spark, Sf)
    val hot = fact.filter(col("user_id") === 0)
    val sizes = hot.withColumn("__salt", SkewJoin.saltCol(fact, 8))
      .groupBy("__salt").count()
      .collect().map(_.getLong(1))
    assert(sizes.length === 8)
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.max <= 2 * mean,
      s"hot-key sub-partitions unbalanced: ${sizes.mkString(",")}")
  }
}
