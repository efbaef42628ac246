package graft

import graft.operators.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 additions: the shared distributed global-rank/ntile
  * primitive and the queries it repaired. */
class Round12Spec extends SparkSpec {

  test("GlobalRank.withRank equals a single-task row_number") {
    import spark.implicits._
    // keys deliberately skewed + colliding on the sort metric so the
    // (metric, id) tie-break and range boundaries both get exercised
    val df = (1L to 997L).map(i => (i, i % 13)).toDF("id", "m")
    val got = GlobalRank.withRank(df, Seq(col("m").desc, col("id")), "r", 7)
      .select("id", "r")
    val want = df.withColumn("r",
      row_number().over(Window.orderBy(col("m").desc, col("id"))).cast("long"))
      .select("id", "r")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("GlobalRank.withNtile reproduces Window.ntile exactly, incl. ragged splits") {
    import spark.implicits._
    // N=103, n=5 → q=20, r=3: three 21-row buckets then two 20-row —
    // the floor/ceil split ntile is defined by; also N<n (N=3, n=5)
    for ((rows, n) <- Seq((103, 5), (3, 5), (100, 4), (1, 3))) {
      val df = (1 to rows).map(i => (i.toLong, (i * 37) % 11)).toDF("id", "m")
      val got = GlobalRank.withNtile(df, n, Seq(col("m"), col("id")), "b", 7)
        .select("id", "b")
      val want = df.withColumn("b",
        ntile(n).over(Window.orderBy(col("m"), col("id"))))
        .select("id", "b")
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile mismatch at rows=$rows n=$n")
    }
  }

  test("GlobalRank ranks are a gapless 1..N sequence (cross-branch id consistency)") {
    // the rank core derives ids from monotonically_increasing_id in TWO
    // plan branches (data + offsets) of one reused exchange; any
    // branch-order divergence would surface as duplicate or missing
    // ranks. Skewed keys + 13 partitions stress the range boundaries.
    import spark.implicits._
    val df = (1 to 5000).map(i => ((i * 2654435761L) % 97, i.toLong))
      .toDF("m", "id")
    val r = graft.operators.GlobalRank
      .withRank(df, Seq(col("m"), col("id")), "r", 13)
    val n = r.count()
    assert(n == 5000L)
    assert(r.select("r").distinct().count() == n, "duplicate ranks")
    val mm = r.agg(min("r"), max("r")).head()
    assert(mm.getLong(0) == 1L && mm.getLong(1) == n, s"rank range $mm")
  }

  test("GlobalRank.withNtilePerGroup: every group's bands equal per-group Window.ntile") {
    import spark.implicits._
    // deterministic LCG data: heavy ties within groups, ragged group
    // sizes (37 / 101 / 3 rows), n > size for the tiny group
    var seed = 42L
    def nxt(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed >>> 33 }
    val rows = (Seq.fill(37)("a") ++ Seq.fill(101)("b") ++ Seq.fill(3)("c"))
      .zipWithIndex.map { case (g, i) => (i.toLong, g, (nxt() % 7).toInt) }
    val df = rows.toDF("id", "g", "m")
    val got = graft.operators.GlobalRank
      .withNtilePerGroup(df, 5, "g", Seq(col("m"), col("id")), "b", 7)
      .select("id", "b")
    val want = df.withColumn("b", ntile(5).over(
      Window.partitionBy("g").orderBy(col("m"), col("id"))))
      .select("id", "b")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("audio fingerprint: planted byte-identical reposts collide at Hamming 0") {
    import graft.pipeline.{DupCorpus, MultimodalQueries}
    val corpus = DupCorpus.corpus(spark, Sf)
    // the dup corpus plants byte-identical reposts at doc_id+10000 for
    // doc_id % 7 == 0; any such track with ≥2 frames MUST pair with its
    // source at Hamming 0 unless its bucket blew the hot-bucket cap
    val pairs = SparkEntry.queries("multimodal_audio_dedup")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val zeroPairs = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    val planted = corpus.filter(col("doc_id") % 7 === 0 &&
        col("doc_id") < 10000 && length(col("text")) >= 32)
      .select("doc_id").collect().map(_.getLong(0))
    val caught = planted.count(id => zeroPairs.contains((id, id + 10000)))
    assert(caught > 0, "no planted audio repost was caught at Hamming 0")
    // capped-bucket blocking: candidate volume must stay far below the
    // all-pairs square of the corpus
    val n = corpus.count()
    assert(pairs.length < n * 20,
      s"${pairs.length} pairs for $n docs — banding is not bounding volume")
  }

  test("clamped balance streams groups via secondary sort, never buffers a group") {
    // the non-associative fold must ride repartition+sortWithinPartitions
    // with a boundary-scan iterator (O(1) state per group) — a MapGroups
    // node would mean a whole user history materializes on one task
    val plan = SparkEntry.queries("events_clamped_balance")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), "expected a mapPartitions fold")
    assert(!plan.contains("MapGroups"), "group-materializing MapGroups found")
    assert(plan.contains("Sort ["), "secondary sort missing from the plan")
  }

  test("every exact per-group order statistic names a registered approx sibling") {
    // The house rule VERDICT r7 asked to pin: an exact order statistic
    // over data-sized groups is only acceptable as the exact half of a
    // declared exact/approx pair — the approx sibling is the mergeable
    // sketch path a 100 TB incremental pipeline prefers. (The exact
    // faces themselves now band via GlobalRank.withNtilePerGroup, so
    // no full group ever sorts on one task — the pairing survives as
    // an exact-cost/sketch-cost choice, not a correctness escape.) A
    // new such query ships by adding its pair here; the assertions
    // keep both halves registered and oracle-backed.
    val pairs = Map(
      "events_deciles" -> "events_quantiles_approx",
      "events_quantiles" -> "events_quantiles_approx")
    pairs.foreach { case (exact, approx) =>
      assert(SparkEntry.queries.contains(exact), s"$exact unregistered")
      assert(SparkEntry.queries.contains(approx),
        s"$exact's declared approx sibling $approx is not registered")
      assert(SparkEntry.oracleSql.contains(approx),
        s"approx sibling $approx has no oracle")
    }
  }

  test("rfm plan has no eager action and no single-partition data window") {
    // construction must be action-free (the anchor is a broadcast
    // 1-row aggregate now) — pin by asserting no Spark job runs while
    // building the plan. First touch of a table pays a one-time parquet
    // footer-read job (Tables' schema cache); warm it before counting.
    SparkEntry.queries("events_rfm")(spark, Sf).queryExecution.executedPlan
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val df = SparkEntry.queries("events_rfm")(spark, Sf)
    df.queryExecution.executedPlan // force planning
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "events_rfm ran a job during plan construction")
  }
}
