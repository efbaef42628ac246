package graft

import org.apache.spark.sql.functions._

/** The runtime-filter story: at 100 TB the dominant join cost is
  * shuffling fact rows that the dim side will discard anyway. Spark's
  * InjectRuntimeFilter rewrites `fact ⋈ (selective dim)` to probe a
  * bloom filter BUILT FROM THE DIM KEYS at the fact scan, cutting the
  * shuffle to rows that can possibly match. The engine's bucketed /
  * broadcast / salted join faces each dodge the shuffle a different
  * way; this spec pins that the OPTIMIZER-driven way activates on this
  * build too — the thresholds are conf, not code, so the property to
  * pin is "the rewrite fires when profitable" on a representative
  * selective join. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim join injects a bloom runtime filter into the fact scan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test-scale stand-in for the 10 GB default: the rewrite only
      // pays off when the fact scan is big, which testdata isn't
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join — broadcast joins don't need the filter
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // raw scans rather than the Tables loaders: the loader's
      // test-scale parallelism repartition sits between scan and join
      // and blocks InjectRuntimeFilter's scan-side pattern. At real
      // scale the loader emits no Repartition (many-file scans
      // parallelize natively), so production plans look like this one.
      val fact = spark.read.parquet(s"$Sf/lineitem.parquet")
      val dim = spark.read.parquet(s"$Sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilter"),
        s"expected an injected bloom runtime filter in:\n$optimized")
      // and the filtered plan still computes the right answer
      val n = joined.collect().head.getLong(1)
      val expected = fact.join(
        spark.read.parquet(s"$Sf/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n === expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
