package graft

import org.apache.spark.sql.functions._

/** Round-13 feature pins: the classifier training loop re-derived
  * locally (the oracle catches cross-engine divergence; this catches
  * shared-wrong-on-both-faces bugs in the hand-mirrored trainer), the
  * BPE anti-chain selection rule as a unit property, and the BPE scale
  * contract (`bpeStats`' ≥64-merges-from-≤16-collects claim) asserted
  * against a fresh training run. */
class Round13Spec extends SparkSpec {

  // ------------------------------------------------- bpeSelect properties
  test("bpeSelect: anti-chain vs ALL predecessors, cap respected") {
    import graft.pipeline.TextQueries.bpeSelect
    val cands = Seq(
      ("a", "b", 10L), // kept
      ("b", "c", 9L),  // blocked: shares b with (a,b)
      ("c", "d", 8L),  // blocked: shares c with the UNPICKED (b,c)
      ("e", "f", 7L),  // kept
      ("a", "e", 6L),  // blocked: shares a with (a,b), e with (e,f)
      ("g", "h", 5L))  // kept
    val picked = bpeSelect(cands, 12)
    assert(picked == Seq(("a", "b", 10L), ("e", "f", 7L), ("g", "h", 5L)),
      "selection must block on every earlier candidate, picked or not " +
        "(the oracle's NOT-EXISTS-over-predecessors rule)")
    // pairwise symbol-disjoint (the anti-chain invariant merges rely on)
    for (pair <- picked.combinations(2)) {
      val Seq((l1, r1, _), (l2, r2, _)) = pair
      assert(Set(l1, r1).intersect(Set(l2, r2)).isEmpty,
        s"picked pairs share a symbol: $pair")
    }
    // the cap takes the FIRST m keepers, not any m
    assert(bpeSelect(cands, 2) == Seq(("a", "b", 10L), ("e", "f", 7L)))
    assert(bpeSelect(Nil, 12).isEmpty)
    // self-overlap inside one pair (l == r, e.g. "x x") must not block
    // DIFFERENT-symbol successors, but does block any pair sharing x
    val rep = Seq(("x", "x", 5L), ("x", "y", 4L), ("p", "q", 3L))
    assert(bpeSelect(rep, 12) == Seq(("x", "x", 5L), ("p", "q", 3L)))
    // the round-10 spelling guard: a candidate whose SYMBOL equals an
    // earlier candidate's merged spelling l2+r2 is blocked — its
    // occurrences of that symbol did not exist at count time
    val spell = Seq(("a", "b", 10L), ("ab", "c", 9L), ("d", "ab", 8L),
      ("p", "q", 7L))
    assert(bpeSelect(spell, 12) == Seq(("a", "b", 10L), ("p", "q", 7L)),
      "candidates spelling a predecessor's merge must be blocked")
  }

  // ------------------------------------------------ BPE scale contract
  test("BPE trainer: >=64 effective merges from <=16 collects (sf0.01)") {
    // fresh memo key (tests otherwise train on sf0.001): this is the
    // corpus CORRECTNESS runs against, and the one the scale claim in
    // TextQueries.bpeStats' doc comment is stated for (shared fixture
    // config + cancel-if-absent: ADVICE r10)
    val d = SfMid
    requireFixture(d)
    // group-scoped job counting (see Round14Spec): concurrent suites'
    // jobs must not leak into this window
    val g = "r13-bpe-jobs"
    spark.sparkContext.setJobGroup(g, g)
    val (merges, collects) =
      try graft.pipeline.TextQueries.bpeStats(spark, d)
      finally spark.sparkContext.clearJobGroup()
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(g).length
    assert(merges >= 64, s"effective merges = $merges (contract: >=64)")
    assert(collects <= 16, s"driver collects = $collects (contract: <=16)")
    // RELATIVE bound, not an absolute ceiling (absolute job counts are
    // AQE-version sensitive — ADVICE r10): the contract is that jobs
    // scale with the ≤16 driver collects, never with the ≥64 merges —
    // a regression to one-driver-action-per-merge costs at least one
    // job per merge and must trip this
    assert(jobs < merges,
      s"training ran $jobs Spark jobs for $merges merges — job count " +
        "must track the bounded collects, not the merge count")
  }

  // --------------------------------------- classifier local re-derivation
  test("classifier trainer: trajectory and pocket re-derive from features") {
    val d = Sf
    val hd = 16 // HashEmbD
    val feats = graft.pipeline.TextQueries.clfFeatures(spark, d).collect()
      .map(r => (r.getLong(1), Array.tabulate(hd)(j => r.getLong(2 + j))))
    val (hist, pocket) = graft.pipeline.TextQueries.clfTrained(spark, d)
    val t = hist.size
    val w = Array.fill(hd)(0L)
    var best = (Long.MaxValue, w.toSeq)
    hist.foreach { case (r, n, nw, wAfter) =>
      assert(n == feats.length, s"round $r: n")
      val wrong = feats.filter { case (y, v) =>
        y * (0 until hd).map(j => w(j) * v(j)).sum <= 0L }
      assert(nw == wrong.length, s"round $r: n_wrong")
      if (wrong.length < best._1) best = (wrong.length.toLong, w.toSeq)
      val step = 1L << (t - r)
      (0 until hd).foreach { j =>
        w(j) += wrong.map { case (y, v) => y * v(j) }.sum * step }
      assert(w.toSeq == wAfter, s"round $r: weights")
    }
    assert(pocket == best._2, "pocket weights = best round's starting weights")
    // and the trained-score face serves exactly the pocket model
    val scored = SparkEntry.queries("text_classifier_score_trained")(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val featById = graft.pipeline.TextQueries.clfFeatures(spark, d).collect()
      .map(r => r.getLong(0) ->
        Array.tabulate(hd)(j => r.getLong(2 + j))).toMap
    assert(scored.keySet == featById.keySet)
    featById.foreach { case (id, v) =>
      val sc = (0 until hd).map(j => pocket(j) * v(j)).sum
      assert(scored(id) == ((sc, sc > 0L)), s"doc $id trained score")
    }
  }

  test("GlobalRank: null group keys rank (null-safe offset join)") {
    // ADVICE r9 #1: the Seq-form offset join dropped null-keyed rows
    // silently. The null group is a group like any other.
    import spark.implicits._
    import graft.operators.GlobalRank
    val df = Seq((Option("a"), 1), (Option.empty[String], 2),
      (Option.empty[String], 1), (Option("a"), 3), (Option("a"), 2))
      .toDF("g", "x")
    val r = GlobalRank.withRankAndCountPerGroup(
      df, "g", Seq(col("x")), "rk", "cnt", parts = 2)
    assert(r.count() == 5, "no rows may be dropped")
    val nulls = r.filter(col("g").isNull).orderBy("x")
      .select("rk", "cnt").as[(Long, Long)].collect().toSeq
    assert(nulls == Seq((1L, 2L), (2L, 2L)), s"null group ranks: $nulls")
    val as = r.filter(col("g") === "a").orderBy("x")
      .select("rk", "cnt").as[(Long, Long)].collect().toSeq
    assert(as == Seq((1L, 3L), (2L, 3L), (3L, 3L)), s"'a' group ranks: $as")
  }

  test("sql_waiting_suppliers_fast equals the literal Q21 face row-for-row") {
    // ADVICE r9 #4: the hand-decorrelation's equivalence was asserted
    // only in prose; hash_match proves engine parity on the shared
    // text, not equivalence BETWEEN the two texts.
    val lit = SparkEntry.queries("sql_waiting_suppliers")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    val fast = SparkEntry.queries("sql_waiting_suppliers_fast")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    assert(lit == fast,
      s"decorrelated face diverges from the literal Q21:\n$lit\nvs\n$fast")
  }

  test("ivfProbeRanks: contiguous self-free ranks, candidates from probed cells only") {
    import graft.pipeline.SimilarityQueries
    val queries = Tables.embeddings(spark, Sf).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
    val (cents, table) = SimilarityQueries.ivfIndex(spark, Sf)
    val got = SimilarityQueries.ivfProbeRanks(spark, Sf, queries, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    // per query: ranks are exactly 1..n (n <= 20), no self-match
    got.groupBy(_._1).foreach { case (q, rows) =>
      val ranks = rows.map(_._3).sorted.toSeq
      assert(ranks == (1 to rows.length), s"query $q ranks: $ranks")
      assert(rows.length <= 20)
      assert(!rows.exists(_._2 == q), s"query $q returned itself")
    }
    // every candidate lies in one of the query's nprobe=2 probed cells —
    // re-derive the probe set from the centroids (same squared-L2
    // expansion, cid tie-break) and the cell of each returned doc from
    // the persisted store
    val cellOf = graft.sources.BucketedStore.read(spark, table)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qv = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    got.foreach { case (q, doc, _) =>
      val probed = cents
        .map { case (cid, cv) => (dot(cv, cv) - 2 * dot(qv(q), cv), cid) }
        .sorted.take(2).map(_._2).toSet
      assert(probed.contains(cellOf(doc)),
        s"query $q doc $doc cell ${cellOf(doc)} not in probed $probed")
    }
  }

  test("ann_index_upsert: census conserves both corpora, delta never retrains") {
    val rows = SparkEntry.queries("ann_index_upsert")(spark, Sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val e = Tables.embeddings(spark, Sf)
    val total = e.count()
    val nNew = e.filter(col("vec_id") % 10 === 9).count()
    assert(rows.map(_._2).sum == total - nNew, "base vectors conserved")
    assert(rows.map(_._3).sum == nNew, "delta vectors conserved")
    // quantization distance is non-negative, and zero only for cells
    // that received no delta
    rows.foreach { case (cid, _, nn, d2) =>
      assert(d2 >= 0.0, s"cell $cid d2")
      if (nn == 0) assert(d2 == 0.0, s"cell $cid empty-delta d2")
    }
  }

  test("search_batch_ivf_recall: internally consistent with the two faces") {
    val brute = SparkEntry.queries("search_hybrid_rrf_batch")(spark, Sf)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val ivf = SparkEntry.queries("search_hybrid_rrf_batch_ivf")(spark, Sf)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val recall = SparkEntry.queries("search_batch_ivf_recall")(spark, Sf)
      .collect().map(r => (r.getInt(0).toLong,
        (r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(recall.map(_._1).toSeq == (0L until 10L))
    recall.foreach { case (q, (nExact, nHits, permille)) =>
      val b = brute.getOrElse(q, Array.empty).map(_._2).toSet
      val i = ivf.getOrElse(q, Array.empty).map(_._2).toSet
      assert(nExact == b.size, s"query $q n_exact")
      assert(nHits == b.intersect(i).size, s"query $q n_hits")
      assert(nHits <= nExact)
      assert(permille == nHits * 1000 / math.max(nExact, 1), s"query $q permille")
    }
  }

  test("GlobalRank: gapless ranks even with exchange reuse DISABLED") {
    // the round-10 structural guarantee: rank-id consistency across the
    // stats/probe branches must NOT depend on AQE deduplicating the
    // range exchange (RangePartitioner's sample seed is rdd-id-derived,
    // so two materializations draw different boundaries) — the keyed
    // cache pins one materialization regardless of optimizer courtesy
    import spark.implicits._
    val key = "spark.sql.exchange.reuse"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "false")
      val df = (1 to 4000).map(i => ((i * 2654435761L) % 89, i.toLong))
        .toDF("m", "id")
      val r = graft.operators.GlobalRank
        .withRank(df, Seq(col("m"), col("id")), "r", 11)
      assert(r.count() == 4000L)
      assert(r.select("r").distinct().count() == 4000L, "duplicate ranks")
      val mm = r.agg(min("r"), max("r")).head()
      assert(mm.getLong(0) == 1L && mm.getLong(1) == 4000L)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("classifier held-out eval: splits partition the corpus, ratios consistent") {
    val row = SparkEntry.queries("text_classifier_eval")(spark, Sf).head()
    val (nTr, nTe, trW, teW, trAcc, teAcc) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    val total = Tables.documents(spark, Sf).count()
    // 80/10/10 hash split: train + test < total (val bucket reserved),
    // and both splits non-trivial on 500 docs
    assert(nTr + nTe < total && nTr > 0 && nTe > 0)
    assert(trW <= nTr && teW <= nTe)
    assert(trAcc == (nTr - trW) * 1000000L / nTr)
    assert(teAcc == (nTe - teW) * 1000000L / nTe)
  }

  test("classifier trainer: learned model beats the zero model") {
    // not a tautology: a broken update rule that never improves on
    // w = 0 (all-wrong) would fail here
    val (hist, _) = graft.pipeline.TextQueries.clfTrained(spark, Sf)
    val firstWrong = hist.head._3 // n_wrong under w = 0
    val bestWrong = hist.map(_._3).min
    assert(bestWrong < firstWrong,
      s"training never improved: best=$bestWrong first=$firstWrong")
  }
}
