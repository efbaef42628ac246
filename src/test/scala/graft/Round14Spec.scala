package graft

import org.apache.spark.sql.functions._

/** Round-14 feature pins: the DoReMi-style domain reweighting loop as
  * a pure-function unit (direction, conservation, determinism — the
  * oracle catches cross-engine divergence; this catches
  * shared-wrong-on-both-faces bugs in the hand-mirrored update rule)
  * and the BPE fertility readout's arithmetic invariants. */
class Round14Spec extends SparkSpec {

  // ------------------------------------------------- drwLoop properties
  test("drwLoop: symmetric domains stay uniform") {
    import graft.pipeline.TextQueries.drwLoop
    // two domains with IDENTICAL token distributions → every round's
    // masses are equal and smoothing keeps the weights exactly uniform
    val counts = Seq(("a", "x", 30L), ("a", "y", 10L),
      ("b", "x", 30L), ("b", "y", 10L))
    val hist = drwLoop(counts, 4)
    assert(hist.size == 8)
    hist.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.size == 1, "masses must be equal")
      assert(rows.map(_._4).distinct.size == 1, "alphas must be equal")
      assert(rows.head._4 == BigInt(500000))
    }
  }

  test("drwLoop: underrepresented domain is upweighted") {
    import graft.pipeline.TextQueries.drwLoop
    // domain `rare`'s tokens are mostly absent from the mixture mass
    // (dominated by `bulk`'s distribution) → lower mass → higher alpha
    val counts = Seq(("bulk", "x", 100L),
      ("rare", "x", 10L), ("rare", "z", 90L))
    val hist = drwLoop(counts, 3)
    for (r <- 1 to 3) {
      val byDom = hist.filter(_._1 == r).map(t => t._2 -> (t._3, t._4)).toMap
      assert(byDom("rare")._1 < byDom("bulk")._1,
        s"round $r: rare domain must have lower mixture mass")
      assert(byDom("rare")._2 > byDom("bulk")._2,
        s"round $r: rare domain must be upweighted")
    }
    // and the trajectory MOVES: round-3 weights differ from round-1
    // (the mixture shift feeds back into the next round's masses)
    val a1 = hist.filter(h => h._1 == 1 && h._2 == "rare").head._4
    val a3 = hist.filter(h => h._1 == 3 && h._2 == "rare").head._4
    assert(a1 != a3, "weights must keep moving while masses differ")
  }

  test("drwLoop: ppm conservation and determinism") {
    import graft.pipeline.TextQueries.drwLoop
    val counts = Seq(("a", "x", 7L), ("a", "y", 3L), ("b", "x", 11L),
      ("c", "z", 5L), ("c", "x", 1L))
    val k = 3
    val hist = drwLoop(counts, 8)
    hist.groupBy(_._1).foreach { case (r, rows) =>
      val tot = rows.map(_._4).sum
      // each normalize/smooth floor loses < 1 ppm per domain
      assert(tot <= BigInt(1000000) && tot >= BigInt(1000000 - 5 * k),
        s"round $r: alpha total $tot out of ppm-conservation band")
      rows.foreach(t => assert(t._4 >= 0 && t._4 <= BigInt(1000000)))
    }
    assert(drwLoop(counts, 8) == hist, "pure function must be deterministic")
  }

  // ------------------------------------- text_domain_reweight end-to-end
  test("text_domain_reweight: one trajectory row per round per language") {
    val df = SparkEntry.queries("text_domain_reweight")(spark, Sf)
    val rows = df.collect()
    val langs = rows.map(_.getString(1)).distinct.length
    assert(langs >= 2, "corpus must have multiple domains")
    assert(rows.length == 8 * langs)
    val byRound = rows.groupBy(_.getInt(0))
    assert(byRound.keySet == (1 to 8).toSet)
    byRound.foreach { case (r, rs) =>
      val tot = rs.map(_.getLong(3)).sum
      assert(tot <= 1000000L && tot >= 1000000L - 5L * langs,
        s"round $r: alpha_ppm total $tot")
      rs.foreach(row => assert(row.getLong(2) > 0L, "mass must be positive"))
    }
    // memo-free determinism: a second planning+collect replays identically
    val again = SparkEntry.queries("text_domain_reweight")(spark, Sf).collect()
    assert(again.map(_.toString).toSeq == rows.map(_.toString).toSeq)
  }

  // ---------------------------------------------- drw scale contract
  test("drw trainer: whole trajectory costs ONE collect, zero per-round jobs") {
    // fresh memo key (the other tests train on sf0.001): the job count
    // must not scale with DrwRounds — the count-fold collect is the
    // only action, so 8 rounds must cost far fewer than 8 jobs (AQE
    // splits the one collect into a handful of stage-jobs)
    val d = SfMid // shared fixture config + cancel-if-absent: ADVICE r10
    requireFixture(d)
    // job counting SCOPED to a per-measurement job group: suites run
    // concurrently in one SparkContext, and the unscoped
    // getJobIdsForGroup(null) counter picks up another suite's jobs
    // landing inside the measured window (observed flake once the
    // suite grew past ~250 tests). The group is thread-local, so only
    // jobs submitted by THIS body are counted; both sides of the
    // comparison are measured the same way.
    val tracker = spark.sparkContext.statusTracker
    var grp = 0
    def jobsOf(body: => Unit): Int = {
      grp += 1
      val g = s"r14-drw-jobs-$grp"
      spark.sparkContext.setJobGroup(g, g)
      try body finally spark.sparkContext.clearJobGroup()
      tracker.getJobIdsForGroup(g).length
    }
    // cold pass pays one-off file-listing jobs — warm the FileIndex
    // first so the comparison sees identical plans
    graft.pipeline.TextQueries.drwCounts(spark, d).collect()
    val scanJobs = jobsOf {
      graft.pipeline.TextQueries.drwCounts(spark, d).collect() }
    var hist: Seq[(Int, String, BigInt, BigInt)] = Nil
    val trainJobs = jobsOf {
      hist = graft.pipeline.TextQueries.drwTrained(spark, d) }
    assert(hist.size % 8 == 0 && hist.nonEmpty)
    // RELATIVE claim (exact equality was AQE-version sensitive —
    // ADVICE r10): every training job belongs to the count-fold
    // collect, so the 8 rounds add ZERO jobs on top of the bare scan
    // measured in the SAME session moments earlier — a per-round
    // action would add ≥ DrwRounds jobs
    assert(trainJobs <= scanJobs,
      s"training ran $trainJobs jobs vs $scanJobs for the bare count " +
        "scan — rounds must run on the collected model table")
    // memo hit: a second call costs zero jobs
    assert(jobsOf { graft.pipeline.TextQueries.drwTrained(spark, d) } == 0)
  }

  // ------------------------------------ text_domain_resample composition
  test("text_domain_resample: copies follow the learned multipliers") {
    val weights = SparkEntry.queries("text_domain_reweight")(spark, Sf)
      .filter(col("round") === 8).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    val u = 1000000L / weights.size
    val res = SparkEntry.queries("text_domain_resample")(spark, Sf).collect()
    // the multiplier column IS the final-round alpha scaled by uniform
    res.foreach { r =>
      assert(r.getLong(2) == weights(r.getString(1)) * 1000000L / u,
        s"${r.getString(1)}: mult_ppm must equal alpha*1e6/u")
    }
    // per-lang copy volume is bounded by the whole/fractional split
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    res.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      val m = weights(lang) * 1000000L / u
      val n = docs(lang)
      val lo = n * (m / 1000000L); val hi = n * (m / 1000000L + 1)
      assert(rows.length >= lo && rows.length <= hi,
        s"$lang: ${rows.length} copies outside [$lo, $hi] for mult $m")
    }
    // copy_id is dense per doc
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == (0 until rows.length))
    }
  }

  // ----------------------------------------- text_bpe_fertility invariants
  test("text_bpe_fertility: per-lang ratios respect subword arithmetic") {
    val rows = SparkEntry.queries("text_bpe_fertility")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, ns, nc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ns >= nw, s"${r.getString(0)}: a word is >=1 subword")
      assert(nc >= ns, s"${r.getString(0)}: a subword is >=1 char")
      assert(r.getLong(4) == ns * 1000000L / nw, "fertility_ppm arithmetic")
      assert(r.getLong(5) == nc * 1000000L / ns, "chars_per_subword arithmetic")
      assert(r.getLong(4) >= 1000000L)
    }
  }
}
