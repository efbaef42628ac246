package graft

import graft.pipeline.{DedupQueries, EventQueries, TextQueries}
import graft.queries.InfraQueries
import org.apache.spark.sql.functions._

/** Properties of the round-9 additions the oracle compare can't see:
  * the prefix-filter join's exact-recall guarantee and candidate-volume
  * bound, the AUC identity's integer bounds, and autocorrelation's
  * mathematical range. */
class Round9Spec extends SparkSpec {

  test("prefix jaccard: exact recall ⊇ LSH result, candidates stay bounded") {
    val exactPairs = DedupQueries.queries("dedup_jaccard_prefix")(spark, Sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = DedupQueries.queries("dedup_ngram_jaccard")(spark, Sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // prefix filtering is lossless at the threshold: every pair the
    // probabilistic LSH bands surface must also be found here
    assert(lshPairs.subsetOf(exactPairs),
      s"prefix join missed LSH pairs: ${lshPairs -- exactPairs}")
    assert(exactPairs.nonEmpty)
    // the scale property: candidate volume tracks true overlap, not
    // corpus² (docs² at sf0.001 would be ~570² ≈ 325k)
    val nCand = DedupQueries.prefixCandidates(spark, Sf).count()
    val corpus = graft.pipeline.DupCorpus.corpus(spark, Sf).count()
    assert(nCand < corpus * 10,
      s"$nCand candidates for $corpus docs — prefix blocking degenerated")
    assert(exactPairs.size <= nCand)
  }

  test("classifier auc: rank-sum identity bounds hold") {
    val r = TextQueries.queries("text_classifier_auc")(spark, Sf).collect()
    assert(r.length == 1)
    val (nPos, nNeg, u2, auc) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getDouble(3))
    assert(nPos > 0 && nNeg > 0)
    // U is bounded by the pair count; AUC is its normalization
    assert(u2 >= 0 && u2 <= 2 * nPos * nNeg)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(auc - u2.toDouble / (2.0 * nPos * nNeg)) < 1e-6)
  }

  test("bucketed as-of: joins with zero exchanges and zero sorts, rows match native") {
    val df = EventQueries.asofBucketedJoined(spark, Sf)
    df.collect() // force execution so the (possibly adaptive) plan is final
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"native operator must plan:\n$plan")
    // the whole point of the layout: the scans advertise bucketing +
    // in-bucket order, so the merge needs NO exchange and NO sort
    assert(!plan.contains("Exchange"), s"exchange in layout-served plan:\n$plan")
    assert(!"Sort \\[".r.findFirstIn(plan).isDefined,
      s"sort in layout-served plan:\n$plan")
    // and the layout changes nothing about the answer
    val fromLayout = df.collect().map(_.toSeq).toSet
    val fromRuntime = EventQueries.queries("events_asof_native")(spark, Sf)
      .collect().map(_.toSeq).toSet
    assert(fromLayout == fromRuntime)
  }

  test("basket lift: pair space bounded by type vocabulary, ratios valid") {
    val rows = EventQueries.queries("events_basket_lift")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // pair key space is C(|types|, 2), never corpus-sized
    val types = rows.flatMap(r => Seq(r._1, r._2)).distinct.length
    assert(rows.length <= types * (types - 1) / 2)
    rows.foreach { case (a, b, nab, sup, conf, lift) =>
      assert(a < b, s"unordered pair $a/$b")
      assert(nab > 0)
      assert(sup > 0 && sup <= 1.0)
      assert(conf > 0 && conf <= 1.0)
      assert(lift > 0)
    }
  }

  test("seasonal anomaly: only >3σ spikes surface, and few of them") {
    val flagged = EventQueries.queries("events_seasonal_anomaly")(spark, Sf)
      .collect()
    // the gate can only emit positive z beyond the threshold
    flagged.foreach(r => assert(r.getDouble(4) > 3.0))
    // spikes are the tail, not the body: far fewer than the cell count
    val nCells = graft.Tables.events(spark, Sf)
      .selectExpr("event_type",
        "unix_millis(date_trunc('day', ts)) div 86400000 AS d",
        "hour(ts) AS hr")
      .distinct().count()
    assert(flagged.length < nCells / 10,
      s"${flagged.length} anomalies over $nCells cells — gate too loose")
  }

  test("recall eval: common pairs bound both sides, ratios consistent") {
    val r = DedupQueries.queries("dedup_recall_eval")(spark, Sf).collect()
    assert(r.length == 1)
    val (nEx, nLsh, nCom, pm, rec) = (r(0).getLong(0), r(0).getLong(1),
      r(0).getLong(2), r(0).getLong(3), r(0).getDouble(4))
    assert(nEx > 0)
    assert(nCom <= math.min(nEx, nLsh))
    // the LSH bands are tuned to catch nearly everything at J>=0.5 on
    // this corpus — an eval reporting poor recall means the composition
    // (not the bands) broke
    assert(rec > 0.9 && rec <= 1.0, s"recall $rec")
    assert(pm == nCom * 1000 / nEx)
    assert(math.abs(rec - nCom.toDouble / nEx) < 1e-6)
  }

  test("type corr: full C(|types|,2) matrix, r within [-1,1]") {
    val rows = EventQueries.queries("events_type_corr")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val types = rows.flatMap(r => Seq(r._1, r._2)).distinct.length
    assert(rows.length == types * (types - 1) / 2)
    rows.foreach { case (a, b, r) =>
      assert(a < b, s"unordered pair $a/$b")
      r.foreach(v => assert(v >= -1.0 && v <= 1.0, s"$a/$b r=$v"))
    }
  }

  test("two-phase ranks stay distributed in the AUC and pareto plans") {
    import org.apache.spark.sql.execution.window.WindowExec
    // same pin as SurprisalSpec, applied to the pattern's other users:
    // the data-sized window must partition by pid; any partitionless
    // window may only ride the ≤32-row per-partition-counts relation
    // events_pareto checkpoints its ranked relation (an eager barrier
    // that hides the window from the final plan), so the pin inspects
    // the exposed pre-checkpoint relation instead.
    val plans = Seq(
      "text_classifier_auc" ->
        SparkEntry.queries("text_classifier_auc")(spark, Sf),
      "events_pareto" ->
        graft.pipeline.EventQueries.paretoRanked(spark, Sf))
    for ((q, df) <- plans) {
      val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, s"$q: expected window operators")
      assert(wins.exists(_.partitionSpec.exists(
        _.references.exists(_.name == "pid"))),
        s"$q: the data-sized window must partition by pid")
      val offenders = wins.filter(w => w.partitionSpec.isEmpty &&
        !w.child.output.exists(a => a.name == "pc" || a.name == "pnn"))
      assert(offenders.isEmpty,
        s"$q: partitionless window over data-sized input:\n" +
          offenders.mkString("\n"))
    }
  }

  test("pq recall eval: per-query identities hold, loss is real but not total") {
    val rows = graft.pipeline.SimilarityQueries
      .queries("ann_recall_eval_pq")(spark, Sf)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, hit, rec) =>
      assert(hit >= 0 && hit <= k)
      assert(math.abs(rec - hit.toDouble / k) < 1e-6)
    }
    // 4x16 PQ on 16-dim vectors loses real recall (that's the point of
    // the eval) but must still beat random: some queries hit
    assert(rows.map(_._2).sum > 0, "PQ search found nothing at all")
  }

  test("cc sizes: census sums back to the labeled node count") {
    val census = DedupQueries.queries("graph_cc_sizes")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(census.nonEmpty)
    census.foreach { case (sz, n) => assert(sz >= 2 && n > 0) }
    val nodes = DedupQueries.queries("dedup_cluster")(spark, Sf).count()
    assert(census.map { case (sz, n) => sz * n }.sum == nodes)
  }

  test("WAP: clean snapshot publishes, planted violation blocks the publish") {
    val ok = InfraQueries.queries("infra_wap_publish")(spark, Sf).collect()
    assert(ok(0).getBoolean(0) && ok(0).getBoolean(1))
    assert(ok(0).getLong(2) > 0 && ok(0).getLong(3) > 0)
    // a snapshot carrying a null key must NOT reach consumers — the
    // audit blocks the rename and the report says so
    val bad = InfraQueries.wapRun(spark, Sf, plant = true).collect()
    assert(!bad(0).getBoolean(0) && !bad(0).getBoolean(1))
    assert(bad(0).getLong(2) == 0)
  }

  test("substring clean: removal agrees with the accounting face per doc") {
    val clean = DedupQueries.queries("dedup_substring_clean")(spark, Sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val acct = DedupQueries.queries("dedup_substring")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(clean.nonEmpty)
    // exactly the accounted docs are rewritten
    assert(clean.keySet == acct.keySet)
    clean.foreach { case (doc, (before, after)) =>
      assert(after < before, s"doc $doc removed nothing")
      // tokens_removed (span accounting) == tokens actually excised
      assert(before - after == acct(doc),
        s"doc $doc: excised ${before - after}, accounted ${acct(doc)}")
    }
  }

  test("lifecycle: classes partition each day's actives, churn identity holds") {
    val rows = EventQueries.queries("events_user_lifecycle")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val byDay = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (d, active, nw, ret, res, churn) =>
      // new + retained + resurrected IS the day's active set
      assert(nw + ret + res == active, s"day $d")
      assert(churn >= 0, s"day $d churn $churn")
      // churn identity: churned(d) = active(d-1) - retained(d)
      byDay.get(d - 1).foreach { prev =>
        assert(churn == prev._2 - ret, s"day $d churn identity")
      }
    }
    // day one has no history: everyone is new
    val first = rows.minBy(_._1)
    assert(first._3 == first._2 && first._4 == 0 && first._5 == 0)
  }

  test("snapshot diff: the planted edits are counted exactly") {
    val r = InfraQueries.queries("infra_snapshot_diff")(spark, Sf).collect()
    val (added, removed, changed, unchanged) = (r(0).getLong(0),
      r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    // v2 restores the mod-10 keys v1 dropped and drops mod-10-1 keys
    assert(added > 0 && removed > 0 && changed > 0 && unchanged > 0)
    val totalOrders = graft.Tables.orders(spark, Sf).count()
    // every order lands in exactly one diff class (keys in either side)
    val keysEitherSide = totalOrders // v1 ∪ v2 covers all keys
    assert(added + removed + changed + unchanged == keysEitherSide)
  }

  test("funnel time: latency percentiles ordered and bounded") {
    val r = EventQueries.queries("events_funnel_time")(spark, Sf).collect()
    assert(r.length == 1)
    val (n, p50, p90, mx) = (r(0).getLong(0), r(0).getDouble(1),
      r(0).getDouble(2), r(0).getLong(3))
    assert(n > 0, "no conversions in testdata")
    // latency is defined as at-or-after the first click: non-negative,
    // and the distribution must be internally ordered
    assert(p50 >= 0.0 && p50 <= p90 && p90 <= mx.toDouble,
      s"p50=$p50 p90=$p90 max=$mx")
  }

  test("pareto: gini in range, top decile carries at least its share") {
    val r = EventQueries.queries("events_pareto")(spark, Sf).collect()
    assert(r.length == 1)
    val (n, s, gini, topPm) = (r(0).getLong(0), r(0).getLong(1),
      r(0).getDouble(2), r(0).getLong(3))
    assert(n > 0 && s >= n)
    assert(gini >= 0.0 && gini < 1.0, s"gini $gini")
    // the HEAVIEST decile can never carry less than a uniform decile
    // (floor rounding of n/10 users and the permille div allow ~1‰ slack)
    assert(topPm >= 1000 * (n / 10) / n - 1, s"top decile $topPm‰ of $n users")
  }

  test("curation funnel: stages partition the corpus, every stage does work") {
    val rows = DedupQueries.queries("dedup_curation")(spark, Sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4))
    // first-failing-stage charging partitions the corpus exactly
    val corpus = graft.pipeline.DupCorpus.corpus(spark, Sf).count()
    assert(rows.map(_._3).sum == corpus)
    // the synthetic corpus plants exact AND near dups — a curation
    // report that can't catch them proves nothing
    val byStage = rows.map(r => r._2 -> r._3).toMap
    assert(byStage("exact_dup") > 0)
    assert(byStage("near_dup") > 0)
    // at sf0.001 the quality gates bite hard (short docs); the pin is
    // that a real gold corpus survives, not a specific share
    assert(byStage("kept") > 0, s"kept ${byStage("kept")} of $corpus")
    // permille shares are the exact integer division of the counts
    rows.foreach { case (_, _, n, pm) => assert(pm == n * 1000 / corpus) }
  }

  test("trend: one row per type over a shared spine, finite fit") {
    val rows = EventQueries.queries("events_trend")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // the zero-filled spine gives every type the SAME day count
    assert(rows.map(_._2).distinct.length == 1)
    assert(rows.head._2 >= 2)
    rows.foreach { case (t, _, slope, icpt) =>
      assert(!slope.isNaN && !slope.isInfinite, s"$t slope $slope")
      assert(!icpt.isNaN && !icpt.isInfinite, s"$t intercept $icpt")
    }
  }

  test("column profile: one scan's stats are internally consistent") {
    val rows = InfraQueries.queries("infra_column_profile")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(rows.length == 4)
    // every row reports the same scan's cardinality
    assert(rows.map(_._2).distinct.length == 1)
    rows.foreach { case (c, n, nNull, nd, mn, mx) =>
      assert(nNull >= 0 && nNull <= n, c)
      assert(nd >= 1 && nd <= n - nNull, c)
      assert(mn != null && mx != null, c)
    }
    // the PK column must be near-unique, the flag column tiny-domain
    val byName = rows.map(r => r._1 -> r._4).toMap
    assert(byName("l_returnflag") <= 3)
    assert(byName("l_orderkey") > byName("l_returnflag"))
  }

  test("autocorr: r within [-1,1], all requested lags per type") {
    val rows = EventQueries.queries("events_autocorr")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.foreach { case (t, lag, r) =>
      assert(Set(1, 2, 24).contains(lag), s"$t lag $lag")
      r.foreach(v => assert(v >= -1.0 && v <= 1.0, s"$t lag $lag r=$v"))
    }
    // every type present must carry all three lags (hourly series at
    // sf0.001 spans a month — no lag can be empty)
    rows.groupBy(_._1).foreach { case (t, g) =>
      assert(g.map(_._2).toSet == Set(1, 2, 24), s"$t lags ${g.map(_._2)}")
    }
  }
}
