package graft.streaming

import graft.pipeline.EventQueries
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming face of the windowed event analytics (SURVEY.md §2.10):
  * the batch operators in [[graft.pipeline.EventQueries]] are written as
  * Structured-Streaming-shaped aggregations, and this wrapper runs the
  * SAME expression tree over an unbounded source with an event-time
  * watermark bounding the aggregation state.
  *
  * Semantics under append output: a window's row is emitted exactly
  * once, when the watermark (max observed event time − delay) passes
  * the window end — late events inside the delay are incorporated
  * before emission, later ones are dropped. State size is
  * O(open windows × group keys), independent of stream length — the
  * property that lets this run forever on a 100 TB/day event stream.
  */
object StreamingEvents {

  /** Watermark release discipline shared by every buffer-then-replay
    * face below: a row already beyond the watermark AT ARRIVAL
    * (event time < watermark in its first micro-batch, i.e. more than
    * `delay` behind the stream's high-water mark) is DROPPED — the
    * standard Structured Streaming stateful-operator contract for
    * beyond-delay lateness. Folding such a row post-hoc would replay
    * it out of (ts, id) order against state that has already folded
    * LATER timestamps (a velocity window would count accepted future
    * peers as trailing history), silently breaking the documented
    * batch parity. Within-delay rows buffer in `pending` until the
    * watermark passes their event time, then release in order; the
    * parity pin therefore holds exactly for within-delay lateness,
    * matching the batch result on the accepted subset. */
  private def release[E](prevPending: List[E], incoming: List[E],
      wm: Long)(ts: E => Long): (List[E], List[E]) = {
    val fresh = incoming.filter(ts(_) >= wm)
    (prevPending ++ fresh).partition(ts(_) < wm)
  }

  /** Event-time tumbling 1-hour aggregate over a streaming `events`
    * relation (needs `ts: timestamp`, `event_type`, `value` columns).
    * `delay` is the max accepted event-time lateness. */
  def tumblingStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    EventQueries.tumblingAgg(events.withWatermark("ts", delay))

  /** Sliding 1-hour/15-minute windows over a streaming `events`
    * relation — same expression tree as the batch `events_sliding`
    * query; each event lands in 4 open windows, and state is
    * O(open windows × event types) like the tumbling face (a window
    * closes when the watermark passes its end). */
  def slidingStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    EventQueries.slidingAgg(events.withWatermark("ts", delay))

  /** Per-user session windows (6-hour gap) over a streaming relation
    * (needs `ts: timestamp`, `user_id`, `value`). Session state merges
    * across micro-batches until the watermark passes last-event + gap,
    * then the session emits once (append). */
  def sessionStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    EventQueries.sessionAgg(events.withWatermark("ts", delay))

  /** Streaming exact dedup — the unbounded face of `dedup_exact`: keep
    * the first document seen per md5(text), where "first" is arrival
    * order (a stream has no total order to take min doc_id over, unlike
    * the batch form). `dropDuplicatesWithinWatermark` bounds the dedup
    * state: a key is remembered only until the watermark passes its
    * event time + delay, so state is O(docs per watermark window) —
    * the trade a forever-running 100 TB/day ingest needs, and exactly
    * how production dedup-at-ingest behaves (a re-crawl months later
    * re-admits the page; the batch dedup downstream catches it).
    * Needs `ts: timestamp` and `text` columns. */
  def dedupStream(docs: DataFrame, delay: String = "2 hours"): DataFrame =
    docs.withWatermark("ts", delay)
      .withColumn("text_md5", md5(col("text")))
      .dropDuplicatesWithinWatermark("text_md5")

  case class CurRow(doc_id: Long, stage: String)

  /** Streaming ingest curation — the live face of `dedup_curation`'s
    * quality and exact-dup stages: each arriving document is charged
    * to its first failing stage AS IT LANDS (quality gate → exact
    * dedup → kept), which is how filter-at-ingest actually deploys.
    * The quality predicate is the batch funnel's own expression
    * ([[graft.pipeline.DedupQueries.qualityFailExpr]] — the live
    * filter and the nightly report cannot drift); exact dedup is
    * first-arrival-wins per md5 (arrival order, like [[dedupStream]] —
    * a stream has no total order to take min doc_id over) with state
    * expiring once the watermark passes last sighting + delay — the
    * `dropDuplicatesWithinWatermark` TTL, hand-rolled because dropped
    * duplicates must be LABELED, not silently vanish. Near-dup stays
    * an index concern (`dedup_minhash_incremental` probes the
    * persisted band index per batch) — the documented split. State is
    * O(distinct docs per watermark window); needs ts / doc_id / text /
    * n_chars columns. */
  def curationStream(docs: DataFrame, delayMs: Long = 7200000L): Dataset[CurRow] = {
    val spark = docs.sparkSession
    graft.functions.VectorExpressions.register(spark)
    import spark.implicits._
    docs.withWatermark("ts", s"$delayMs milliseconds")
      .select(col("doc_id"), col("ts"), md5(col("text")).as("k"),
        graft.pipeline.DedupQueries.qualityFailExpr.as("qf"))
      .as[(Long, java.sql.Timestamp, String, Boolean)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Long, CurRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // state = max event-time seen for this key (kept or dup):
            // the TTL must be anchored to the LATEST sighting, so a
            // late-but-in-delay duplicate with an OLDER timestamp can
            // never pull the expiry earlier than stored-max + delay
            // (ADVICE r9 #2 — the 1L-state version re-derived the
            // anchor from the current batch only)
            val rows = it.toList.sortBy(e => (e._2.getTime, e._1))
            val out = rows.map { case (id, ts, _, qf) =>
              if (qf) CurRow(id, "quality")
              else if (state.exists) {
                state.update(math.max(state.get, ts.getTime))
                CurRow(id, "exact_dup")
              } else { state.update(ts.getTime); CurRow(id, "kept") }
            }
            if (state.exists)
              state.setTimeoutTimestamp(math.max(
                state.get + delayMs,
                state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Streaming quality-classifier scoring — the train-batch /
    * score-stream split ([[seasonalAnomalyStream]]'s discipline)
    * applied to the trained linear model: the 16 learned weights
    * arrive as LITERALS, and scoring is a PURE per-row fold over the
    * token array (the same signed 16-bucket hashed features the batch
    * trainer aggregates, computed per document with `aggregate()`
    * instead of explode+groupBy — identical integer sums, order-free),
    * so the stream needs NO state, no watermark, no shuffle: each
    * arriving document is gated the moment it lands. Bucket modulus
    * and sign bit derive from [[graft.pipeline.TextQueries.HashEmbD]]
    * (`shiftright(h, log₂ D)` is the integral `h div D` for the
    * power-of-two D; h is a non-negative 60-bit hash), so bucket and
    * sign match the batch featurizer bit-for-bit at ANY D
    * (StreamingSpec pins the parity). Needs doc_id / text columns. */
  def classifierScoreStream(docs: DataFrame, w: Seq[Long]): DataFrame = {
    // geometry DERIVED from the batch featurizer's dimensionality, not
    // hard-coded (ADVICE r10: a literal 16/shift-4 here would silently
    // break train/serve parity if HashEmbD ever moved): the modulus is
    // HashEmbD itself and the sign bit is h div HashEmbD — realized as
    // a shift, which requires the power-of-two geometry the batch side
    // documents
    val d = graft.pipeline.TextQueries.HashEmbD
    require(w.length == d, s"expected the $d-bucket weight vector")
    require((d & (d - 1)) == 0 && d > 0,
      s"HashEmbD=$d must be a power of two (sign bit is a shift)")
    val shift = java.lang.Integer.numberOfTrailingZeros(d)
    val toks = split(lower(col("text")), " ")
    val warr = typedlit(w)
    def contrib(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val hv = conv(substring(md5(concat(lit("emb:"), t)), 1, 15), 16, 10)
        .cast("long")
      val sgn = when(pmod(shiftright(hv, shift), lit(2L)) === 0L, 1L)
        .otherwise(-1L)
      element_at(warr, (pmod(hv, lit(d.toLong)) + 1L).cast("int")) * sgn
    }
    docs.select(col("doc_id"),
        aggregate(toks, lit(0L), (acc, t) => acc + contrib(t)).as("score"))
      .withColumn("keep", col("score") > 0L)
  }

  /** Streaming ingest resampling under the TRAINED domain mixture —
    * [[classifierScoreStream]]'s train-batch/apply-stream split for
    * the DoReMi weights: the ≤|domains| learned multipliers (ppm,
    * 10⁶ = 1×) arrive as LITERALS and every arriving document is
    * expanded to its whole copies plus the salted-h60 fractional-copy
    * gate — the exact per-row arithmetic of the batch
    * `text_domain_resample` face, as a pure projection + array
    * explode: no state, no watermark, no shuffle. A domain absent
    * from the map gets 0 copies (dropped — same as a 0 multiplier).
    * Parity vs the batch face is pinned in StreamingSpec. Needs
    * doc_id / lang columns. */
  def resampleStream(docs: DataFrame, mult: Map[String, Long]): DataFrame = {
    val multCol = mult.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (lg, m)) => when(col("lang") === lg, lit(m)).otherwise(acc) }
    val gate = (pmod(graft.pipeline.DupCorpus.h60(concat(lit("rw:"),
      col("doc_id").cast("string"))), lit(1000000L))
      < col("mult_ppm") % 1000000L).cast("long")
    docs.select(col("doc_id"), col("lang"), multCol.as("mult_ppm"))
      .withColumn("n_copies", expr("mult_ppm div 1000000") + gate)
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"), col("mult_ppm"),
        explode(sequence(lit(0), (col("n_copies") - 1).cast("int")))
          .as("copy_id"))
  }

  /** Streaming BPE tokenization under the TRAINED merge table — the
    * round-10 deferred face, [[classifierScoreStream]]'s stateless
    * train-batch/apply-stream discipline for the tokenizer: the stored
    * merges arrive as LITERALS (loaded once from the
    * [[graft.pipeline.TextQueries.bpeModelTable]] catalog table by the
    * serving job), and each arriving document's words map through the
    * char-split + replay-replaces fold with the subword counts summed
    * by `aggregate()` — a pure projection, no state, no watermark, no
    * shuffle. The replayed per-word sequences are deterministic string
    * ops, identical to the batch vocabulary's training-end symseq, so
    * per-doc counts equal `text_bpe_apply`'s exactly (StreamingSpec
    * pins the parity). Docs with no non-empty words are dropped, the
    * batch face's inner-join semantics.
    *
    * OOV contract (ADVICE r12): a word the trainer never saw is
    * tokenized by the SAME replay — its char-split sequence folded
    * through whatever stored merges apply (none apply → one subword
    * per character). This is the intended serving semantics, and it is
    * what the catalog-served batch face computes too
    * ([[graft.pipeline.TextQueries]]' `text_bpe_apply_stored` replays
    * over the vocabulary of the corpus being TOKENIZED, not the
    * training vocabulary — both serving paths are total on unseen
    * words and agree by construction; StreamingSpec pins the OOV
    * case). Only the training-session readout `text_bpe_apply` joins
    * its own training vocabulary — total on its own corpus by
    * definition, so no face ever drops a word in practice.
    * Needs doc_id / text columns. */
  def bpeApplyStream(docs: DataFrame,
                     merges: Seq[(String, String)]): DataFrame = {
    val words = filter(split(lower(col("text")), " "),
      w => w =!= lit(""))
    def nSyms(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val replayed = merges.foldLeft(
        concat(lit(" "), regexp_replace(w, "(.)", "$1 "))) {
          case (e, (l, r)) => replace(e, lit(s" $l $r "), lit(s" $l$r ")) }
      size(split(trim(replayed), " ")).cast("long")
    }
    docs.select(col("doc_id"),
        size(words).cast("long").as("n_tokens"),
        aggregate(words, lit(0L), (acc, w) => acc + nSyms(w))
          .as("n_bpe_tokens"))
      .filter(col("n_tokens") > 0L)
      .withColumn("bpe_per_word",
        round(col("n_bpe_tokens").cast("double") / col("n_tokens"), 6))
  }

  case class AnnHit(query_id: Long, doc_id: Long, rank: Int, sim: Double)
  case class AnnState(tsMs: Long, top: List[(Long, Double)])

  /** Streaming ANN serving — the ONLINE face of the IVF retrieval
    * tier: query vectors arrive as a stream, probe the PERSISTED
    * bucketed cell index ([[graft.pipeline.SimilarityQueries.ivfIndex]],
    * built once, frozen), and each query's exact-cosine top-k over its
    * nprobe cells is emitted when the watermark closes the query.
    * The probe-cell selection is a PURE projection (the k coarse
    * centroids ride a broadcast consumed by the native
    * `graft_probe_cells` expression — O(1) plan size in nlist, same
    * ‖c‖²−2·q·c expansion and cid tie-break as the
    * batch probe, so the probed set is identical); candidates come
    * from ONE stream-static equi-join against the cell table (the
    * bucket-pruned scan at rest — stateless); only the top-k
    * accumulator is stateful: ≤ k (doc, sim) pairs per open query,
    * emitted once at `query ts + delay` (watermark+1 guard — the
    * curation discipline) and removed. State is O(open queries × k),
    * never candidates. Parity vs the batch
    * [[graft.pipeline.SimilarityQueries.ivfProbeRanks]] is pinned in
    * StreamingSpec. Needs query_id / ts / qv columns. */
  def annServeStream(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession, d: String,
      k: Int = 5, delayMs: Long = 7200000L): Dataset[AnnHit] = {
    val (cents, table) = graft.pipeline.SimilarityQueries.ivfIndex(s, d)
    annServeCore(queries, s, cents,
      graft.sources.BucketedStore.read(s, table), k, delayMs)
  }

  /** The online face of the UPSERTED retrieval tier — [[annServeStream]]
    * probing the frozen base-trained quantizer with candidates from
    * base ∪ delta cell tables, so a vector upserted between re-clusters
    * is servable to live queries too (parity vs the batch
    * `upsertedServe`, pinned in StreamingSpec). Same bounded state:
    * ≤ k (doc, sim) pairs per open query. */
  def annServeUpsertedStream(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession, d: String,
      k: Int = 5, delayMs: Long = 7200000L): Dataset[AnnHit] = {
    val (cents, tBase, tDelta) =
      graft.pipeline.SimilarityQueries.upsertedIndex(s, d)
    annServeCore(queries, s, cents,
      graft.sources.BucketedStore.read(s, tBase)
        .unionByName(graft.sources.BucketedStore.read(s, tDelta)),
      k, delayMs)
  }

  /** The online face served THROUGH THE GENERATION POINTER — what an
    * ANN serving job that restarted after a re-cluster actually runs:
    * resolve the pointer at boot (one catalog row), load the named
    * quantizer from its model table, and probe the named base ∪ delta
    * bucketed tables — nothing references the training memos, and a
    * maintenance publish (`ann_recluster_serve`'s atomic pointer flip)
    * is picked up by the next restart without code or config changes.
    * Same bounded state as every ANN stream: ≤ k (doc, sim) pairs per
    * open query. Parity vs the batch pointer serving is pinned in
    * StreamingSpec. Requires the pointer to exist (a serving job boots
    * AFTER its first index build — callers run
    * [[graft.pipeline.SimilarityQueries.reclusterExecute]] or any
    * maintenance cycle first). */
  def annServePtrStream(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession, d: String,
      k: Int = 5, delayMs: Long = 7200000L): Dataset[AnnHit] =
    annServePtrStreamAt(queries, s,
      graft.pipeline.SimilarityQueries.reclusterPtr(d), k, delayMs)

  /** [[annServePtrStream]] for an ARBITRARY generation pointer — the
    * online tier of the full maintenance LIFECYCLE: whatever
    * generation the pointer names at boot (g1, g2 after the first
    * re-cluster, g3 after the second — `ann_recluster_cycle`'s walk)
    * is the one served, and a reaped generation is unreachable
    * because the pointer by definition no longer names it. Restart =
    * re-resolve; StreamingSpec pins post-cycle parity against the
    * batch [[graft.pipeline.SimilarityQueries.serveVia]] tier. */
  def annServePtrStreamAt(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession, ptrTable: String,
      k: Int = 5, delayMs: Long = 7200000L): Dataset[AnnHit] = {
    val (cents, tb, td) =
      graft.pipeline.SimilarityQueries.ptrModelAt(s, ptrTable)
    annServeCore(queries, s, cents,
      graft.sources.BucketedStore.read(s, tb)
        .unionByName(graft.sources.BucketedStore.read(s, td)),
      k, delayMs)
  }

  private def annServeCore(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession,
      cents: Seq[(Int, Seq[Double])], cells: DataFrame,
      k: Int, delayMs: Long): Dataset[AnnHit] = {
    import s.implicits._
    graft.functions.VectorExpressions.register(s)
    val nprobe = graft.pipeline.SimilarityQueries.KmProbe
    val probed = queries.withWatermark("ts", s"$delayMs milliseconds")
      .select(col("query_id"), col("ts"), col("qv"),
        explode(graft.functions.CentroidModels.probes(
          s, cents, col("qv"), nprobe)).as("probe_cid"))
    probed.join(cells,
        col("probe_cid") === col("cid") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("ts"), col("vec_id").as("doc_id"),
        call_function("graft_cosine", col("qv"), col("v")).as("sim"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnnState, AnnHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (qid, it, state) =>
          if (state.hasTimedOut) {
            val out = state.get.top.sortBy { case (doc, sim) => (-sim, doc) }
              .zipWithIndex.map { case ((doc, sim), i) =>
                AnnHit(qid, doc, i + 1, sim) }
            state.remove()
            out.iterator
          } else {
            val prev = state.getOption.getOrElse(AnnState(0L, Nil))
            var (ts, top) = (prev.tsMs, prev.top)
            it.foreach { case (_, t, doc, sim) =>
              ts = math.max(ts, t.getTime)
              top = ((doc, sim) :: top)
                .sortBy { case (dc, sm) => (-sm, dc) }.take(k)
            }
            state.update(AnnState(ts, top))
            state.setTimeoutTimestamp(math.max(
              ts + delayMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming INGEST near-dup filtering — the online face of
    * `dedup_minhash_incremental` (the production shape: history is
    * indexed once; arriving documents are deduped against it without
    * ever re-reading history text). Boot reads two catalog stores
    * ([[graft.pipeline.DedupQueries.historyStoresExecute]]): the
    * banded signature index and the per-doc shingle sketch store.
    *
    * Per arriving document everything is computed IN ROW — 3-gram
    * shingles, h60 hashes, the 8 permutation minima, the 4 LSH band
    * keys, and the [[graft.pipeline.DedupQueries.SketchK]]-smallest
    * sketch — as array lambdas (no window, no aggregation: a
    * signature is a per-doc fold, so the batch face's groupBy is
    * replaced by `array_min`/`array_sort` over the doc's own shingle
    * array; HOFs run interpreted, an acceptable per-arriving-doc
    * cost). Candidates come from ONE stream-static equi-join against
    * the band index (bucket-co-located at rest), verification is the
    * batch `graft_intersect` sketch Jaccard against the stored
    * history sketches, and multi-band collisions collapse via
    * `dropDuplicatesWithinWatermark` on the pair key — the only
    * stateful operator, bounded by the watermark. Emits
    * (doc_a, doc_b, jaccard) exactly like the batch face; parity vs
    * its cross (new-vs-history) pairs is pinned in StreamingSpec.
    * In-batch new-vs-new duplicates are the batch face applied to the
    * accumulated batch at checkpoint time — the same division of
    * labor as the incremental face itself. Needs doc_id / ts / text
    * columns. */
  def dedupProbeStream(docs: DataFrame,
      s: org.apache.spark.sql.SparkSession, d: String,
      delayMs: Long = 7200000L): DataFrame = {
    import graft.pipeline.{DedupQueries, DupCorpus}
    graft.functions.VectorExpressions.register(s)
    val (bandsT, skT) = DedupQueries.historyStores(d)
    val histBands = graft.sources.BucketedStore.read(s, bandsT)
      .select(col("band_idx"), col("k1"), col("k2"),
        col("doc_id").as("hist_doc"))
    val histSk = graft.sources.BucketedStore.read(s, skT)
      .select(col("doc_id").as("hist_doc"),
        col("hs").as("hb"), col("n").as("nb"))
    // project the token array ONCE before the shingle lambda: an
    // interpreted HOF re-evaluates its argument subtree per element,
    // so element_at over the raw split() would re-split the text
    // O(L) times (the shingleRows comment's measured 10×+ trap,
    // quadratic here) — over an attribute it's an array index
    val toks = split(lower(col("text")), " ")
    val shingles = array_distinct(transform(
      sequence(lit(0), size(col("toks")) - 3),
      i => concat_ws(" ", element_at(col("toks"), i + 1),
        element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))))
    val row = docs.withWatermark("ts", s"$delayMs milliseconds")
      .filter(size(toks) >= 3)
      .select(col("doc_id"), col("ts"), toks.as("toks"))
      .select(col("doc_id"), col("ts"),
        transform(shingles, sg => DupCorpus.h60(sg)).as("hst"))
    val sigCols = Seq(col("doc_id"), col("ts"),
      slice(array_sort(col("hst")), 1, DedupQueries.SketchK).as("ha"),
      least(size(col("hst")), lit(DedupQueries.SketchK)).cast("long")
        .as("na")) ++
      (0 to 7).map(i =>
        array_min(transform(col("hst"), h => DupCorpus.perm(i, h)))
          .as(s"m$i"))
    val banded = row.select(sigCols: _*)
      .select(col("doc_id"), col("ts"), col("ha"), col("na"), expr(
        """inline(array(
        struct(0 as band_idx, m0 as k1, m1 as k2),
        struct(1 as band_idx, m2 as k1, m3 as k2),
        struct(2 as band_idx, m4 as k1, m5 as k2),
        struct(3 as band_idx, m6 as k1, m7 as k2)))"""))
    val j = col("ni").cast("double") / (col("na") + col("nb") - col("ni"))
    // doc_id ≠ hist_doc (ADVICE r13): under at-least-once delivery a
    // redelivered document — or any arriving id already indexed in
    // history — collides with its own bands; without the guard it
    // emits a spurious self-pair (doc_a == doc_b, jaccard 1.0)
    banded.join(histBands, Seq("band_idx", "k1", "k2"))
      .filter(col("doc_id") =!= col("hist_doc"))
      .join(histSk, "hist_doc")
      .withColumn("ni",
        call_function("graft_intersect", col("ha"), col("hb")))
      .filter(j >= 0.4)
      .select(col("ts"),
        least(col("doc_id"), col("hist_doc")).as("doc_a"),
        greatest(col("doc_id"), col("hist_doc")).as("doc_b"),
        round(j, 6).as("jaccard"))
      .dropDuplicatesWithinWatermark("doc_a", "doc_b")
      .select("doc_a", "doc_b", "jaccard")
  }

  case class PqHit(query_id: Long, neighbor_id: Long, rank: Int, adc: Double)
  case class PqState(tsMs: Long, top: List[(Long, Double)])

  /** Streaming ADC serving — the stored-codes tier's online face
    * (VERDICT r13 #4): query vectors arrive as a stream and are
    * answered from the PERSISTED IVF-PQ layout exactly like the batch
    * `ann_topk_ivfpq_stored`. Boot discipline = the batch face's:
    * coarse quantizer and subspace codebooks load from their
    * [[graft.pipeline.SimilarityQueries.pqModelTables]] catalog tables
    * (ensure-trained read side — a serving job neither trains nor
    * touches the raw corpus), candidates come from the persisted code
    * table's probed buckets via ONE stream-static equi-join on cid
    * (bucket-co-located at rest, stateless).
    *
    * ADC at runtime: the batch face knows its queries and folds each
    * per-query distance table into literals driver-side; here the
    * query vector is a COLUMN, so the m per-subspace 16-slot tables
    * are projected per query row BEFORE the join —
    * `‖qs‖² − 2·qs·cv + ‖cv‖²` per codebook entry, with `qs·qs` /
    * `qs·cv` as the same sequential-fold `graft_dot` and `‖cv‖²`
    * pre-folded on the driver, so every slot is the bit-identical
    * IEEE sequence of [[graft.pipeline.SimilarityQueries.pqAdc]]'s
    * literals (an emptied codebook slot stays Double.MaxValue). Each
    * candidate then costs m `element_at` lookups — never an O(dim)
    * dot — which is the ADC property carried into the stream. Only
    * the per-query top-k accumulator is stateful: ≤ k (doc, adc)
    * pairs per open query, emitted once with batch tie-breaks
    * (adc asc, neighbor asc) and `round(adc, 6)` at event-time close.
    * Parity vs the batch stored-codes face is pinned in Round18Spec.
    * Needs query_id / ts / qv columns. */
  def annServePqStream(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession, d: String,
      k: Int = 5, delayMs: Long = 7200000L): Dataset[PqHit] = {
    val sq = graft.pipeline.SimilarityQueries
    val (cents, books) = sq.storedPqModels(s, d)
    annServePqCore(queries, s, cents, books,
      graft.sources.BucketedStore.read(s, sq.ivfPqTable(s, d)), k, delayMs)
  }

  /** Streaming ADC through an arbitrary PQ-carrying GENERATION POINTER
    * — the online tier of the PQ lifecycle (the [[annServePtrStreamAt]]
    * discipline applied to the stored-codes family): resolve the
    * pointer at boot, load the published generation's coarse quantizer
    * and codebooks from their catalog tables, and serve from ITS
    * base ∪ delta code tables. A reaped generation is unreachable
    * because the pointer no longer names it; a maintenance publish is
    * picked up by the next restart. Parity vs the batch cycle face is
    * pinned in Round18Spec. */
  def annServePqPtrStreamAt(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession, ptrTable: String,
      k: Int = 5, delayMs: Long = 7200000L): Dataset[PqHit] = {
    val sq = graft.pipeline.SimilarityQueries
    val (cents, books, pqbT, pqdT) = sq.ptrPqModelAt(s, ptrTable)
    annServePqCore(queries, s, cents, books,
      graft.sources.BucketedStore.read(s, pqbT)
        .unionByName(graft.sources.BucketedStore.read(s, pqdT)),
      k, delayMs)
  }

  /** Streaming RESIDUAL-ADC serving (VERDICT r14 #1 "missing": the
    * residual tier — the recall winner — had no serving plumbing):
    * query vectors stream in and are answered from the PERSISTED
    * residual layout ([[graft.pipeline.SimilarityQueries.pqrTables]])
    * exactly like the batch `ann_topk_ivfpq_residual_stored`. Same
    * boot discipline as [[annServePqStream]] — coarse quantizer,
    * residual codebooks, and code table are all catalog reads — with
    * ONE structural difference carried into the plan: the ADC table
    * keys on the (query, probed cell) pair, so the per-subspace slots
    * fold over the query RESIDUAL q − c_probe, computed as a COLUMN
    * (centroid literal-map lookup + codegen'd `graft_sub`) after the
    * probe explode rather than the batch face's driver-side literal
    * CASE. Candidates still cost m `element_at` lookups each. */
  def annServePqrStream(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession, d: String,
      k: Int = 5, delayMs: Long = 7200000L): Dataset[PqHit] = {
    val sq = graft.pipeline.SimilarityQueries
    val (cents, _) = sq.storedPqModels(s, d)
    val (booksT, codesT) = sq.pqrTables(s, d)
    annServePqCore(queries, s, cents, sq.booksFrom(s, booksT),
      graft.sources.BucketedStore.read(s, codesT), k, delayMs,
      residual = true)
  }

  /** Streaming residual ADC through the cycled GENERATION POINTER —
    * the residual analog of [[annServePqPtrStreamAt]]: resolve the
    * pointer at boot, serve from the published generation's residual
    * codebooks and base ∪ delta residual-code tables. */
  def annServePqrPtrStreamAt(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession, ptrTable: String,
      k: Int = 5, delayMs: Long = 7200000L): Dataset[PqHit] = {
    val sq = graft.pipeline.SimilarityQueries
    val (cents, books, pqrbT, pqrdT) = sq.ptrPqrModelAt(s, ptrTable)
    annServePqCore(queries, s, cents, books,
      graft.sources.BucketedStore.read(s, pqrbT)
        .unionByName(graft.sources.BucketedStore.read(s, pqrdT)),
      k, delayMs, residual = true)
  }

  /** Streaming PER-CELL residual ADC — the serving face of
    * `ann_topk_ivfpq_residual_cell_stored`: boots from the catalog
    * (coarse quantizer, per-cell families via
    * [[graft.pipeline.SimilarityQueries.pqrcTables]], bucketed
    * per-cell codes), computes the query residual per probe with
    * `graft_cell_vec` + `graft_sub`, and projects each subspace's
    * 16-slot table with `graft_group_adc` — the probed CELL's own
    * codebook resolved from the one-broadcast family, so the plan is
    * O(1) in nlist even though every cell carries distinct books.
    * Candidates still cost m `element_at` lookups. Parity vs the
    * batch stored face is pinned in Round19Spec. */
  def annServePqrCellStream(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession, d: String,
      k: Int = 5, delayMs: Long = 7200000L): Dataset[PqHit] = {
    val sq = graft.pipeline.SimilarityQueries
    val (cents, _) = sq.storedPqModels(s, d)
    val (booksT, codesT) = sq.pqrcTables(s, d)
    annServePqCore(queries, s, cents, Nil,
      graft.sources.BucketedStore.read(s, codesT), k, delayMs,
      residual = true, cellBooks = sq.cellBooksFrom(s, booksT))
  }

  /** Streaming PER-CELL residual ADC through the cycled GENERATION
    * POINTER — the per-cell analog of [[annServePqrPtrStreamAt]],
    * completing the tier's lifecycle online face (VERDICT r15 #2):
    * resolve the pointer at boot, load the published generation's
    * coarse quantizer and per-cell families from their catalog
    * tables, and serve from ITS base ∪ delta per-cell code tables.
    * A reaped generation is unreachable because the pointer no longer
    * names it; a maintenance publish is picked up at the next
    * restart. */
  def annServePqrcPtrStreamAt(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession, ptrTable: String,
      k: Int = 5, delayMs: Long = 7200000L): Dataset[PqHit] = {
    val sq = graft.pipeline.SimilarityQueries
    val (cents, cellBooks, pqrcbT, pqrcdT) = sq.ptrPqrcModelAt(s, ptrTable)
    annServePqCore(queries, s, cents, Nil,
      graft.sources.BucketedStore.read(s, pqrcbT)
        .unionByName(graft.sources.BucketedStore.read(s, pqrcdT)),
      k, delayMs, residual = true, cellBooks = cellBooks)
  }

  private def annServePqCore(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession,
      cents: Seq[(Int, Seq[Double])],
      books: Seq[Seq[(Int, Seq[Double])]],
      codes: DataFrame, k: Int, delayMs: Long,
      residual: Boolean = false,
      cellBooks: Seq[Seq[(Int, Seq[(Int, Seq[Double])])]] = null)
      : Dataset[PqHit] = {
    import s.implicits._
    import graft.pipeline.SimilarityQueries.{PqM, PqW, PqK, foldDot}
    graft.functions.VectorExpressions.register(s)
    val sq = graft.pipeline.SimilarityQueries
    def gdot(a: Column, b: Column) = call_function("graft_dot", a, b)
    // explode probes FIRST: for residual PQ the ADC table keys on the
    // (query, probed cell) PAIR — the query-side vector the slots fold
    // over is the RESIDUAL q − c_probe, so the table is a per
    // (query row, probe) projection; for shared-codebook PQ the same
    // post-explode projection computes the identical IEEE sequence it
    // did pre-explode (nprobe duplicate evaluations of a tiny fold —
    // model-sized work, not corpus-sized)
    val exploded = queries.withWatermark("ts", s"$delayMs milliseconds")
      .select(col("query_id"), col("ts"), col("qv"),
        explode(graft.functions.CentroidModels.probes(
          s, cents, col("qv"), sq.KmProbe)).as("probe_cid"))
    // the query-side vector the ADC slots derive from: raw query for
    // shared-codebook PQ; the residual against the probed cell's
    // centroid for residual PQ — the centroid comes from the BROADCAST
    // model via graft_cell_vec (one plan node and an O(log nlist)
    // per-row lookup; a literal cid→array map here would be
    // O(nlist·dim) plan nodes, the exact plan-size failure the
    // broadcast argmin eliminated) and the subtraction is the
    // codegen'd graft_sub — bit-identical to the batch face's
    // driver-side per-dimension subtraction
    val qb =
      if (residual)
        call_function("graft_sub", col("qv"),
          graft.functions.CentroidModels.cellVec(s, cents, col("probe_cid")))
      else col("qv")
    // per-subspace 16-slot ADC table, projected per (query row, probe):
    // shared-family books inline as bounded literal slots (PqM·PqK·PqW
    // doubles — codebook-sized, constant in nlist); PER-CELL families
    // resolve the probed cell's own book from the one-broadcast family
    // via graft_group_adc (a literal encoding would be O(nlist·PqK·PqW)
    // plan nodes)
    val adts = (0 until PqM).map { sub =>
      val qs = slice(col("qb"), sub * PqW + 1, PqW)
      if (cellBooks != null)
        graft.functions.GroupedCentroidModels.adcTable(
          s, cellBooks(sub), qs, col("probe_cid"), PqK).as(s"adt$sub")
      else {
        val bm = books(sub).toMap
        val slots = (0 until PqK).map(cid => bm.get(cid)
          .map(cv => gdot(qs, qs) - lit(2.0) * gdot(qs, typedLit(cv)) +
            lit(foldDot(cv, cv)))
          .getOrElse(lit(Double.MaxValue)))
        array(slots: _*).as(s"adt$sub")
      }
    }
    val probed = exploded.withColumn("qb", qb)
      .select(col("query_id") +: col("ts") +: col("probe_cid") +: adts: _*)
    val adc = (0 until PqM)
      .map(sub => element_at(col(s"adt$sub"), col(s"code$sub") + 1))
      .reduce(_ + _)
    probed.join(codes,
        col("probe_cid") === col("cid") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("ts"), col("vec_id").as("doc_id"),
        adc.as("adc"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PqState, PqHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (qid, it, state) =>
          if (state.hasTimedOut) {
            val out = state.get.top.sortBy { case (doc, a) => (a, doc) }
              .zipWithIndex.map { case ((doc, a), i) =>
                PqHit(qid, doc, i + 1, java.math.BigDecimal.valueOf(a)
                  .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()) }
            state.remove()
            out.iterator
          } else {
            val prev = state.getOption.getOrElse(PqState(0L, Nil))
            var (ts, top) = (prev.tsMs, prev.top)
            it.foreach { case (_, t, doc, a) =>
              ts = math.max(ts, t.getTime)
              top = ((doc, a) :: top)
                .sortBy { case (dc, ac) => (ac, dc) }.take(k)
            }
            state.update(PqState(ts, top))
            state.setTimeoutTimestamp(math.max(
              ts + delayMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Append `df` to a managed parquet table, creating it on first use.
    * The create branch rides [[graft.sources.BucketedStore.clearTable]]
    * — the ONE place that knows how to clear a managed table name
    * (catalog entry + a surviving LOCATION a restarted session's
    * catalog forgot) before recreating it (VERDICT r14 #5: this was a
    * second, slightly drifted copy of that preamble). */
  private def appendTable(df: DataFrame, table: String): Unit = {
    val s = df.sparkSession
    if (s.catalog.tableExists(table))
      df.write.mode("append").format("parquet").saveAsTable(table)
    else {
      graft.sources.BucketedStore.clearTable(s, table)
      df.write.mode("overwrite").format("parquet").saveAsTable(table)
    }
  }

  /** Streaming ingest dedup with a GROWING history (VERDICT r13 #3):
    * [[dedupProbeStream]] probes a boot-frozen index, so a
    * cross-micro-batch duplicate pair — batch-2 near-dup of a batch-1
    * document, neither in history — is missed forever. This face
    * applies the upsert discipline in `foreachBatch` (the
    * [[StreamingEtl]] merge shape): each batch's signatures are
    * computed once, probed against base ∪ delta (the boot-time
    * bucketed history PLUS every previously accepted document), the
    * batch's own in-batch collisions are self-joined, verified pairs
    * land in the pairs table, and ONLY THEN the batch's band rows and
    * sketches are appended to the delta — so a crash replays the probe
    * (at-least-once pairs, deduped at read by [[dedupIngestPairs]])
    * rather than losing it, and a REDELIVERED document is a no-op (its
    * id is anti-joined out against the already-indexed set before
    * probing — a Bloom sidecar over the base ids gates the exact
    * check, so known-id state is O(Bloom bits), not O(|base|) — and
    * each delta append is individually idempotent against its own
    * target table: no self-pairs, no double-append, even for a crash
    * BETWEEN the two appends). Per-batch cost is O(batch collisions):
    * the base join reads co-located buckets, the delta side is
    * ∝ accepted stream volume and is folded into the bucketed base by
    * the sink itself past [[IngestCompactAtDocs]] (crash-safe staged
    * swap — [[graft.pipeline.DedupQueries.compactIngestHistory]]).
    * Parity: streaming the new slice through this sink in ANY batching
    * yields exactly `dedup_minhash_incremental`'s pair relation
    * (Round18Spec; Round19Spec adds the mid-stream self-compaction and
    * crash-shaped replays). */
  /** Delta-size threshold at which [[dedupIngestBatch]] folds the
    * ingest delta into the bucketed base ITSELF (VERDICT r14 #3 —
    * previously compaction was purely manual, so the un-bucketed delta
    * grew without bound between maintenance invocations). The end of a
    * foreachBatch body is a safe point: no probe is mid-flight, the
    * batch's appends have committed, and a crash during the fold
    * replays the batch against the idempotent appends + idempotent
    * fold. Sized so the delta stays a small fraction of any base worth
    * bucketing; tests pass a tiny value to force mid-stream folds. */
  private[graft] val IngestCompactAtDocs = 50000L

  /** Driver-bounded exact confirmation: up to this many Bloom-hit ids
    * are confirmed via `isin` on the bucket key (bucket pruning — only
    * the hit ids' buckets are read); past it, a bucket-co-located
    * semi-join that never materializes ids on the driver. */
  private val MaxIsinHits = 1000

  def dedupIngestBatch(s: org.apache.spark.sql.SparkSession, d: String,
      ns: String = "", compactAtDeltaDocs: Long = IngestCompactAtDocs)(
      batch: DataFrame, batchId: Long): Unit = {
    import graft.pipeline.DedupQueries
    graft.functions.VectorExpressions.register(s)
    val (bandsT, skT) = DedupQueries.historyStores(d, ns)
    val (dBandsT, dSkT, pairsT) = DedupQueries.ingestTables(d, ns)
    val rows = batch.select(col("doc_id"), col("text"))
    if (rows.isEmpty) return
    // running delta-size counter (VERDICT r15 #7: the fold trigger was
    // a count() job on the delta TABLE every batch, forever). Seeded
    // once per (session, namespace) — from the surviving table only
    // when a restarted process inherits one — then maintained by the
    // accepted-doc counts the sink computes anyway; any fold path
    // resets it via compactIngestHistory's memoDrop.
    val deltaDocs = graft.pipeline.CachePool.memoized(("mhDeltaDocs", d, ns)) {
      new java.util.concurrent.atomic.AtomicLong(
        if (s.catalog.tableExists(dSkT)) s.table(dSkT).count() else 0L)
    }
    val sh = DedupQueries.shingleRowsOf(rows).cache()
    val nbAll = DedupQueries.bandRows(sh)
    try {
      val histBands = graft.sources.BucketedStore.read(s, bandsT)
        .unionByName(
          if (s.catalog.tableExists(dBandsT)) s.table(dBandsT)
          else graft.sources.BucketedStore.read(s, bandsT).limit(0))
      val histSk = graft.sources.BucketedStore.read(s, skT)
        .unionByName(
          if (s.catalog.tableExists(dSkT)) s.table(dSkT)
          else graft.sources.BucketedStore.read(s, skT).limit(0))
      // idempotence set, Bloom-bounded (VERDICT r14 #3: the previous
      // exact base-id cache pinned |base| longs in executor memory —
      // a cluster-sized set at 100 TB). A Bloom sidecar over the base
      // ids (built once per compaction generation, O(bits) on the
      // driver, shipped once as a broadcast) gates the exact check:
      // ids that MISS the Bloom are definitely not in the base — the
      // common case for genuinely new documents, costing zero base
      // reads — and only Bloom HITS (redeliveries + ~1% false
      // positives) are confirmed against the bucketed store, reading
      // just their ids' buckets. The growing delta's ids are exact
      // either way (∝ accepted stream volume between folds).
      val bloomBc = graft.pipeline.CachePool.memoized(("mhBaseBloom", d, ns)) {
        val base = graft.sources.BucketedStore.read(s, skT)
        s.sparkContext.broadcast(
          base.stat.bloomFilter("doc_id", math.max(base.count(), 64L), 0.01))
      }
      // per-arriving-row lambda, not a corpus-side UDF: the hot stored
      // side is never touched by it
      val mightKnow = udf((id: Long) => bloomBc.value.mightContain(id))
      val hits = rows.select("doc_id").filter(mightKnow(col("doc_id")))
      val hitIds = hits.limit(MaxIsinHits + 1).collect().map(_.getLong(0))
      val baseIds = graft.sources.BucketedStore.read(s, skT).select("doc_id")
      val confirmedBase =
        if (hitIds.isEmpty) baseIds.limit(0)
        else if (hitIds.length <= MaxIsinHits)
          baseIds.filter(col("doc_id").isin(
            hitIds.map(java.lang.Long.valueOf).toIndexedSeq: _*))
        else baseIds.join(hits, Seq("doc_id"), "left_semi")
      val knownIds = confirmedBase.unionByName(
        if (s.catalog.tableExists(dSkT)) s.table(dSkT).select("doc_id")
        else baseIds.limit(0))
      // novel documents only: a redelivered (or already-history) id
      // re-probing would self-collide and re-append
      val nb = nbAll.join(knownIds, Seq("doc_id"), "left_anti").cache()
      val nsk = DedupQueries.shingleSketches(sh)
        .join(knownIds, Seq("doc_id"), "left_anti").cache()
      try {
        val cross = nb.as("a").join(histBands.as("b"),
            col("a.band_idx") === col("b.band_idx") &&
            col("a.k1") === col("b.k1") && col("a.k2") === col("b.k2"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        // defense in depth (ADVICE r14): a doc whose bands landed but
        // whose sketch append crashed is not in knownIds, re-probes,
        // and collides with its own delta bands — drop the self-pair
        // before verification (jaccardVerify's doc_a < doc_b guard is
        // the second layer)
        val cand = cross.union(DedupQueries.bandPairs(nb)).distinct()
          .filter(col("doc_a") =!= col("doc_b"))
        appendTable(DedupQueries.jaccardVerify(
          cand, histSk.unionByName(nsk), 0.4), pairsT)
        // accept AFTER the probe committed: crash ⇒ replay re-probes.
        // Each append is INDIVIDUALLY idempotent (ADVICE r14): the
        // shared knownIds gate is derived from the sketch tables only,
        // so a crash between the two appends leaves a doc's bands
        // landed but its id unknown — the replay re-probes it, and the
        // per-TARGET-table anti-join keeps the bands from landing twice
        // while the sketch lands for the first time.
        val dBandIds =
          if (s.catalog.tableExists(dBandsT))
            s.table(dBandsT).select("doc_id").distinct()
          else nb.select("doc_id").limit(0)
        appendTable(nb.join(dBandIds, Seq("doc_id"), "left_anti"), dBandsT)
        appendTable(nsk, dSkT)
        // O(batch) count over the cached accepted relation — never a
        // job on the growing delta table (VERDICT r15 #7). A replayed
        // batch's redelivered docs were anti-joined out above, so the
        // counter tracks genuinely accepted docs only.
        deltaDocs.addAndGet(nsk.count())
      } finally { nb.unpersist(); nsk.unpersist() }
    } finally sh.unpersist()
    // self-driving maintenance (VERDICT r14 #3): past the threshold,
    // fold the delta into the bucketed base here — the safe point —
    // via the staged-swap compaction, which also invalidates its own
    // dependent caches (base-id Bloom, cached base reads) and resets
    // the counter
    if (deltaDocs.get() >= compactAtDeltaDocs &&
        s.catalog.tableExists(dSkT))
      DedupQueries.compactIngestHistory(s, d, ns)
  }

  /** The `writeStream` wiring of [[dedupIngestBatch]]: checkpointed
    * foreachBatch, exactly like [[StreamingEtl.runStream]]. Needs
    * doc_id / text columns. */
  def dedupIngestStream(docs: DataFrame,
      s: org.apache.spark.sql.SparkSession, d: String,
      checkpoint: String,
      compactAtDeltaDocs: Long = IngestCompactAtDocs)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch(dedupIngestBatch(s, d, "", compactAtDeltaDocs) _)
      .start()

  /** Read side of the ingest pair log: the folded bucketed base
    * (distinct by construction — a PLAIN scan, no per-read distinct)
    * unioned with the append-shaped delta when one exists. The delta
    * side still needs distinct, because crash replays may append a
    * batch's pairs twice (the probe is re-run so the VALUES are
    * identical); rows stranded in BOTH halves by a crash between the
    * fold's replace and its delta-drop are removed by anti-joining
    * the (small) delta against the base on the pair key — never by a
    * distinct over the union, which would re-aggregate the FULL base
    * on every crash-window read (VERDICT r16 #6). The base side
    * therefore stays aggregate-free in EVERY state: the anti-join
    * probes the bucketed (doc_a, doc_b) layout without exchanging
    * the base, and the jaccard value is deterministic per pair (the
    * replayed probe recomputes it bit-equal), so key-based removal
    * loses nothing. Post-fold — the steady state
    * [[graft.pipeline.DedupQueries.compactIngestHistory]] restores —
    * the read is just the bucketed scan. */
  def dedupIngestPairs(s: org.apache.spark.sql.SparkSession,
      d: String, ns: String = ""): DataFrame = {
    import graft.pipeline.DedupQueries
    val (_, _, pairsT) = DedupQueries.ingestTables(d, ns)
    val pb = DedupQueries.pairsBaseTable(d, ns)
    val hasBase = s.catalog.tableExists(pb)
    val hasDelta = s.catalog.tableExists(pairsT)
    if (hasBase && hasDelta) {
      val base = graft.sources.BucketedStore.read(s, pb)
      base.unionByName(
        s.table(pairsT).distinct()
          .join(base.select("doc_a", "doc_b"),
            Seq("doc_a", "doc_b"), "left_anti"))
    }
    else if (hasBase) graft.sources.BucketedStore.read(s, pb)
    else s.table(pairsT).distinct()
  }

  case class HybHit(query_id: Long, doc_id: Long, lex_rank: Option[Int],
    vec_rank: Option[Int], rrf: Double)
  case class HybIn(query_id: Long, ts: java.sql.Timestamp,
    doc_id: Long, tag: Int, lexc: BigDecimal, sim: Double)
  case class HybState(tsMs: Long, lex: List[(Long, BigDecimal)],
    vecTop: List[(Long, Double)])

  /** The lexical arm keeps its top-[[LexKeep]] docs only — the fused
    * output needs each arm's top-20, so any state past that is waste. */
  private[graft] val LexKeep = 20

  /** Bounded per-batch fold of lexical BM25 contributions (VERDICT r13
    * top item): sum the batch's contributions per doc — complete
    * sums, because every posting contribution of a query is derived
    * from the query's own arriving row and therefore lands in the SAME
    * micro-batch — merge with the ≤[[LexKeep]] docs already kept, and
    * keep the top [[LexKeep]] by the exact-decimal (score desc, doc
    * asc) order the batch face ranks with. State is O(LexKeep)
    * regardless of posting-list length: a stop-word query whose terms
    * match the whole corpus still holds 20 (doc, decimal) pairs, never
    * O(distinct matching docs). The prune is EXACT for the fused
    * output: per-batch sums are complete (above), decimal comparison
    * has no ties beyond identical scores — which the doc_id tie-break
    * orders deterministically — so the kept 20 are the arm's true
    * top-20 after every batch. (Block-max/WAND admission would bound
    * the PRE-aggregation flow too; here the per-batch flow is already
    * bounded by the micro-batch, so fold-to-top-K is the exact and
    * simpler bound.) */
  private[graft] def foldLexTop(kept: List[(Long, BigDecimal)],
      batch: Iterable[(Long, BigDecimal)]): List[(Long, BigDecimal)] = {
    val sums = scala.collection.mutable.Map.empty[Long, BigDecimal]
    batch.foreach { case (doc, c) =>
      sums.update(doc, sums.get(doc).map(_ + c).getOrElse(c)) }
    kept.foreach { case (doc, c) =>
      sums.update(doc, sums.get(doc).map(_ + c).getOrElse(c)) }
    sums.toList.sortWith { case ((d1, s1), (d2, s2)) =>
      val c = s1.compare(s2); if (c != 0) c > 0 else d1 < d2 }
      .take(LexKeep)
  }

  /** Streaming HYBRID retrieval — the online face of the RRF tier
    * (VERDICT r12 missing #3): queries arrive as (query_id, ts, terms,
    * qv) and are answered exactly like the batch `search_hybrid_stored`
    * face, from the catalog alone. Boot discipline =
    * [[annServePtrStream]]'s applied to the whole tier: resolve the
    * ANN generation pointer (one catalog row), and read the persisted
    * lexical index tables ([[graft.pipeline.SearchQueries
    * .searchIndexExecute]]'s postings/df/dl/stats) — a serving job
    * that neither tokenized nor trained.
    *
    * Dataflow: both arms are STATELESS stream-static joins — BM25
    * partial scores from the stored postings (the shared
    * `bm25Contrib` projection, so each contribution is the identical
    * DECIMAL(25,15) the batch plan casts — exact decimal accumulation
    * is what makes micro-batch arrival order invisible) and
    * exact-cosine candidates from the pointer-named cells — tagged
    * and unioned into ONE stateful top-k/fusion operator keyed by
    * query. State per open query is BOUNDED on both arms: ≤[[LexKeep]]
    * (doc, exact-decimal score) lexical pairs ([[foldLexTop]] — the
    * per-batch fold is complete because a query's posting
    * contributions all derive from its own arriving row, so pruning to
    * the arm's top-20 after each batch is exact, and a stop-word query
    * streaming postings 100× the bound still holds 20 entries) plus
    * ≤20 (doc, sim) vector pairs; at event-time close the arms are
    * ranked (top-20 each, batch tie-breaks), RRF-fused (absent arm →
    * rank NULL, contribution 0), rounded like the batch `round(…, 6)`,
    * and the top-10 emitted once. Parity vs the batch face and the
    * state bound are pinned in StreamingSpec/Round18Spec.
    * Requires the index + a published pointer (callers run
    * `searchIndexExecute` and a maintenance cycle first).
    *
    * STATE-SCHEMA BREAK (ADVICE r14): [[HybState]].lex changed from
    * `Map[Long, BigDecimal]` to the bounded `List[(Long, BigDecimal)]`
    * when the top-[[LexKeep]] fold landed, which changes the
    * flatMapGroupsWithState state encoder schema — a stream restarted
    * from a checkpoint written BEFORE that change cannot restore its
    * state; start such a deployment from a fresh checkpoint directory
    * (the stored indexes and pointer are unaffected). */
  def hybridServeStream(queries: DataFrame,
      s: org.apache.spark.sql.SparkSession, d: String,
      delayMs: Long = 7200000L): Dataset[HybHit] = {
    import s.implicits._
    graft.functions.VectorExpressions.register(s)
    val rrfK = graft.pipeline.SearchQueries.RrfK
    val wm = queries.withWatermark("ts", s"$delayMs milliseconds")
    val (cents, tb, td) = graft.pipeline.SimilarityQueries.ptrModel(s, d)
    val cells = graft.sources.BucketedStore.read(s, tb)
      .unionByName(graft.sources.BucketedStore.read(s, td))
    val vecIn = wm.select(col("query_id"), col("ts"), col("qv"),
        explode(graft.functions.CentroidModels.probes(
          s, cents, col("qv"),
          graft.pipeline.SimilarityQueries.KmProbe)).as("probe_cid"))
      .join(cells,
        col("probe_cid") === col("cid") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("ts"), col("vec_id").as("doc_id"),
        lit(1).as("tag"), lit(null).cast("decimal(25,15)").as("lexc"),
        call_function("graft_cosine", col("qv"), col("v")).as("sim"))
    val lexIn = graft.pipeline.SearchQueries.lexContribStored(s, d,
        wm.select(col("query_id"), col("ts"),
          explode(col("terms")).as("token")))
      .select(col("query_id"), col("ts"), col("doc_id"),
        lit(0).as("tag"), col("c").as("lexc"), lit(0.0).as("sim"))
    lexIn.unionByName(vecIn).as[HybIn]
      .groupByKey(_.query_id)
      .flatMapGroupsWithState[HybState, HybHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (qid, it, state) =>
          if (state.hasTimedOut) {
            val st = state.get
            // st.lex is already the sorted top-LexKeep (foldLexTop's
            // invariant); ranks are its positions
            val lexR = st.lex.zipWithIndex
              .map { case ((doc, _), i) => doc -> (i + 1) }.toMap
            val vecR = st.vecTop.sortBy { case (doc, sm) => (-sm, doc) }
              .zipWithIndex.map { case ((doc, _), i) => doc -> (i + 1) }.toMap
            val out = (lexR.keySet ++ vecR.keySet).toList.map { doc =>
              val (lr, vr) = (lexR.get(doc), vecR.get(doc))
              val raw = lr.map(r => 1.0 / (rrfK + r)).getOrElse(0.0) +
                vr.map(r => 1.0 / (rrfK + r)).getOrElse(0.0)
              HybHit(qid, doc, lr, vr, java.math.BigDecimal.valueOf(raw)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
            }.sortBy(h => (-h.rrf, h.doc_id)).take(10)
            state.remove()
            out.iterator
          } else {
            val prev = state.getOption.getOrElse(HybState(0L, Nil, Nil))
            var ts = prev.tsMs
            var top = prev.vecTop
            val lexBatch = List.newBuilder[(Long, BigDecimal)]
            it.foreach { r =>
              ts = math.max(ts, r.ts.getTime)
              if (r.tag == 0) lexBatch += ((r.doc_id, r.lexc))
              else
                top = ((r.doc_id, r.sim) :: top)
                  .sortBy { case (dc, sm) => (-sm, dc) }.take(20)
            }
            state.update(HybState(ts,
              foldLexTop(prev.lex, lexBatch.result()), top))
            state.setTimeoutTimestamp(math.max(
              ts + delayMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming interval (time-band) join — the unbounded face of
    * `events_interval_join`, and Spark's canonical watermarked
    * stream-stream join: clicks and purchases are both streams, the
    * equi-key (user_id) plus the band condition on the two event-time
    * columns let the engine bound each side's join state (a click can
    * be dropped once the watermark proves no purchase within an hour
    * after it can still arrive; a purchase once its band has passed).
    * State is O(in-flight band windows × delay), independent of stream
    * length. Same expression tree as the batch operator
    * ([[EventQueries.intervalPairs]]) — parity by construction. */
  def intervalJoinStream(events: DataFrame, delay: String = "2 hours"): DataFrame = {
    val wm = events.withWatermark("ts", delay)
    EventQueries.intervalPairs(
      wm.filter(col("event_type") === "click"),
      wm.filter(col("event_type") === "purchase"))
  }

  /** Streaming pivot — the unbounded face of `events_pivot_hourly`:
    * one wide row per closed hour, one count column per event type.
    * A pivot with an explicit value list compiles to conditional
    * aggregation, and that form is written directly here because the
    * streaming aggregate must key on the event-time `window` (not a
    * derived hour column) for the watermark to finalize each row once.
    * Same explicit [[EventQueries.PivotTypes]] list — the schema is
    * identical to the batch face and stable when an hour carries no
    * traffic for a type (count of an empty predicate set is 0, so no
    * null fill is needed). Parity proven in StreamingSpec. */
  def pivotHourlyStream(events: DataFrame, delay: String = "2 hours"): DataFrame = {
    val counts = EventQueries.PivotTypes.map(t =>
      count(when(col("event_type") === t, 1)).as(t))
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(counts.head, counts.tail: _*)
      .select(unix_millis(col("w.start")).as("hour_ms") +:
        EventQueries.PivotTypes.map(col): _*)
  }

  /** Stream-static enrichment join — the remaining Structured
    * Streaming join flavor next to the stream-stream interval join:
    * live events flagged against BATCH-computed per-type moments
    * ([[EventQueries.anomalyStats]] over yesterday's data — global
    * statistics are not computable inside an unbounded stream, so
    * production anomaly detection is exactly this shape). The static
    * side broadcasts; each micro-batch is a map-side hash probe with no
    * state and no watermark requirement. Same
    * [[EventQueries.flagAnomalies]] expression as the batch face —
    * parity by construction. */
  def anomalyStream(events: DataFrame, stats: DataFrame): DataFrame =
    EventQueries.flagAnomalies(events, stats)

  /** Streaming point-in-time enrichment — the feature-store serving
    * face of `events_scd2_join`: live facts are joined to the
    * BATCH-BUILT SCD2 dimension (validity intervals) on
    * `valid_from ≤ ts < valid_to`, so each fact picks up exactly the
    * version that was true when it happened — never is_current, which
    * would leak future states into the stream. Stream-static regime
    * (the dimension broadcasts like [[anomalyStream]]'s stats): the
    * join is stateless per micro-batch, and dimension refreshes swap
    * the static side between restarts, which is precisely how a
    * feature store versions its features. Facts before any version
    * emit with a null state (left join) — the caller decides the
    * default. */
  def scd2JoinStream(facts: DataFrame, versions: DataFrame): DataFrame =
    facts.join(versions,
      facts("user_id") === versions("user_id") &&
        versions("valid_from_ms") <= unix_millis(facts("ts")) &&
        (versions("valid_to_ms").isNull ||
          unix_millis(facts("ts")) < versions("valid_to_ms")),
      "left_outer")
      .select(facts("user_id"), facts("event_id"), facts("ts"),
        facts("value"), versions("event_type").as("state"))

  /** Streaming SEASONAL anomaly — the deseasonalized spike gate's
    * stream face (batch: `events_seasonal_anomaly`): live events fold
    * into watermarked 1-hour count cells; each CLOSED cell probes the
    * batch-trained hour-of-day profile (a broadcast stream-static
    * join, same regime as [[anomalyStream]]) and appends only >3σ
    * spikes. Train-batch/score-stream is exactly how seasonal anomaly
    * detection deploys: the profile cannot be learned inside the
    * unbounded stream, the scoring is stateless beyond the windowed
    * count. Shares [[EventQueries.flagSeasonalCells]] with the batch
    * face — parity by construction. */
  def seasonalAnomalyStream(events: DataFrame, profile: DataFrame,
                            delay: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.functions._
    val cells = events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"),
        expr("unix_millis(w.start) div 86400000").as("day_num"),
        hour(col("w.start")).as("hr"), col("cnt"))
    EventQueries.flagSeasonalCells(cells, profile)
  }

  /** Streaming first/last-touch attribution — the unbounded face of
    * `events_attribution`. min_by/max_by partials merge associatively
    * across micro-batches like any combinable aggregate, so this is a
    * PLAIN streaming aggregation: no custom state, no buffer-replay.
    * The semantics are lifetime-scoped per user, so no watermark
    * applies and state is one (first, last, count, min-ts, max-ts) row
    * per user — O(users), emitted in update/complete mode. Shares
    * [[EventQueries.attributionAggs]] with the batch face — parity by
    * construction. */
  /** Streaming windowed quantiles — the percentile family's stream
    * face: `approx_percentile` partials (mergeable rank summaries)
    * combine associatively across micro-batches like any combinable
    * aggregate, so the latency/spend-distribution report runs as a
    * PLAIN watermarked windowed aggregation — no custom state. State
    * is one bounded sketch per (open window, event type), emitted once
    * when the watermark closes the window; an exact windowed
    * percentile would have to hold every value of every open window.
    * Shares [[EventQueries.windowedQuantilesAgg]] with the batch path
    * — parity by construction, proven in StreamingSpec. */
  def quantilesStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    EventQueries.windowedQuantilesAgg(events.withWatermark("ts", delay))

  /** Streaming experiment readout — the unbounded face of
    * `events_ab_test`: the Welch moments (per-cohort count and exact
    * DECIMAL first/second moments, [[EventQueries.abTestAggs]] shared
    * verbatim with the batch query) are a plain streaming aggregation
    * keyed by event_type — BOUNDED state (|event types| rows), no
    * watermark needed — and every micro-batch folds into them
    * order-insensitively because the sums are decimal. The stateless
    * [[EventQueries.abTestFinish]] projection turns the live moments
    * into means/t-stat at read time, so a dashboard watches the
    * experiment significance converge as traffic arrives. */
  def abTestStream(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(EventQueries.abTestAggs.head, EventQueries.abTestAggs.tail: _*)

  def attributionStream(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(EventQueries.attributionAggs.head,
        EventQueries.attributionAggs.tail: _*)

  /** Streaming CUPED maintenance — the unbounded face of
    * `events_cuped`: per-user pre/post decimal moments
    * ([[EventQueries.cupedUserAggs]], shared verbatim with the batch
    * query) as a plain streaming aggregation keyed by user_id. The
    * split point is the KNOWN experiment start (`midMs`) — in batch it
    * has to be inferred from the data range; a live experiment carries
    * it as configuration. State is one (x, y) decimal pair per
    * enrolled user — the experiment population, bounded by design —
    * and each micro-batch folds in order-insensitively because the
    * sums are decimal. [[cupedServe]] turns the live state into the
    * variance-reduced readout at query time, so the dashboard watches
    * the CUPED-adjusted effect converge as traffic arrives. */
  def cupedStream(events: DataFrame, midMs: Long): DataFrame =
    events.withColumn("mid_ms", lit(midMs))
      .groupBy("user_id")
      .agg(EventQueries.cupedUserAggs.head,
        EventQueries.cupedUserAggs.tail: _*)

  /** Query-time CUPED finish over the streamed per-user moments —
    * the stateless 9-sum + closed-form θ/ρ² projection, shared
    * verbatim with the batch query. */
  def cupedServe(perUser: DataFrame): DataFrame =
    EventQueries.cupedFinish(perUser)

  /** Streaming audience-distinct maintenance — the unbounded face of
    * `events_audience_overlap`: the distinct (event_type, user_id)
    * relation kept as streaming `dropDuplicates` state (one row per
    * distinct pair — the SAME reduction the batch query starts from,
    * and the honest state cost of an all-time distinct; it is bounded
    * by |types|·|users|, not by traffic). Each pair is emitted exactly
    * once, on first sight, in append mode — the store accretes the
    * distinct relation incrementally. [[audienceOverlapServe]] folds
    * the accreted store into the pairwise Jaccard matrix at query
    * time (the dauMau store/serve split). */
  def audienceDistinctStream(events: DataFrame): DataFrame =
    events.select("event_type", "user_id")
      .dropDuplicates("event_type", "user_id")

  /** Query-time overlap matrix over the accreted distinct store —
    * shared verbatim with the batch query. */
  def audienceOverlapServe(du: DataFrame): DataFrame =
    EventQueries.audienceOverlapOf(du)

  /** Streaming summary maintenance — the unbounded face of
    * `infra_summary_incremental`: each micro-batch folds its rows into
    * the keyed partial states ([[graft.queries.InfraQueries.summaryAggs]],
    * shared verbatim with the batch fold), so the reporting summary the
    * [[graft.plans.SummaryRewrite]] rule serves is continuously
    * current instead of rebuilt per cycle. No watermark and no window:
    * the key space is the summary's grouping keys — BOUNDED by design
    * (a summary whose key cardinality grows with the data is not a
    * summary) — so state is O(|groups|) forever and update mode emits
    * each touched group's new partials per micro-batch. Decimal sums
    * make the fold order-insensitive: any micro-batch arrival order
    * yields bit-identical state (parity vs the batch aggregate pinned
    * in StreamingSpec). */
  def summaryStream(lineitems: DataFrame): DataFrame =
    graft.queries.InfraQueries.summaryPartials(lineitems)

  case class RtEv(tsMs: Long, eventId: Long, value: Double)
  case class RtState(pending: List[RtEv], sumUnscaled: Long, seq: Int)
  case class RtRow(user_id: Long, event_id: Long, ts_ms: Long,
    running_value: Double, event_seq: Int)

  /** Streaming per-user running total — the unbounded face of
    * `events_running_total`. The batch form's cumulative window needs
    * the whole partition sorted; the stream replays each user's events
    * in (ts, event_id) order once the watermark releases them (same
    * buffer-then-replay skeleton as [[asofStream]]) and carries the
    * accumulator across micro-batches. The accumulator is the EXACT
    * decimal(18,6) sum held as its unscaled long — bit-identical to the
    * batch window's decimal arithmetic (a double accumulator would
    * drift: batch sums in decimal precisely to keep results
    * order-independent), overflowing only past 10^12 in summed value,
    * where the batch decimal overflows too. State per user after the
    * buffer drains: one long + one int — O(active users) forever. */
  def runningTotalStream(events: DataFrame, delay: String = "2 hours"): Dataset[RtRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    import java.math.{BigDecimal => JBD, BigInteger, RoundingMode}
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RtState, RtRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state) =>
          val prev = state.getOption.getOrElse(RtState(Nil, 0L, 0))
          val incoming = it.map(e => RtEv(e._2.getTime, e._3, e._4)).toList
          val wm = state.getCurrentWatermarkMs()
          // strictly-before: Spark only DROPS rows strictly older than
          // the watermark, so an event timestamped exactly at wm may
          // still arrive in a later micro-batch — it stays pending
          // until the watermark passes it (the timeout below re-fires
          // this group when that happens)
          val (ready, pending) = release(prev.pending, incoming, wm)(_.tsMs)
          var sum = prev.sumUnscaled
          var seq = prev.seq
          val out = List.newBuilder[RtRow]
          ready.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
            // value -> decimal(18,6) exactly as Spark's cast (HALF_UP)
            sum = math.addExact(sum, JBD.valueOf(e.value)
              .setScale(6, RoundingMode.HALF_UP).unscaledValue().longValueExact())
            seq += 1
            val run = new JBD(BigInteger.valueOf(sum), 6).doubleValue()
            // display rounding exactly as Spark's round(double, 4)
            out += RtRow(user, e.eventId, e.tsMs,
              JBD.valueOf(run).setScale(4, RoundingMode.HALF_UP).doubleValue(), seq)
          }
          state.update(RtState(pending, sum, seq))
          if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_.tsMs).min)
          out.result().iterator
      }
  }

  case class CbEv(tsMs: Long, eventId: Long, etype: String, value: Double)
  case class CbState(pending: List[CbEv], balUnscaled9: Long,
    nFloor: Long, nCap: Long, seq: Long)
  case class CbRow(user_id: Long, event_id: Long, ts_ms: Long,
    balance: Double, n_floor: Long, n_cap: Long, event_seq: Long)

  /** Streaming clamped balance — the unbounded face of
    * `events_clamped_balance`, and the op whose natural home IS the
    * stream (a token bucket / credit limit is enforced live, not in
    * nightly batch). Same buffer-then-replay skeleton as
    * [[runningTotalStream]]: the watermark releases each user's events
    * in (ts, event_id) order and the non-associative clamp fold runs
    * exactly as the batch mapGroups body. The balance is carried as
    * its EXACT unscaled scale-9 long (the 1/8 debit is ×125 on the
    * scale-6 unscaled value — integer-exact, and the clamp bounds the
    * accumulator at 5·10¹¹ so it can never overflow); emitted rows
    * show the post-event balance, so the LAST row per user equals the
    * batch query's final state (parity-pinned). State per user after
    * the buffer drains: three longs — O(active users) forever. */
  def clampedBalanceStream(events: DataFrame,
      delay: String = "2 hours"): Dataset[CbRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    import java.math.{BigDecimal => JBD, RoundingMode}
    val CapUnscaled = 500L * 1000000000L
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CbState, CbRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state) =>
          val prev = state.getOption.getOrElse(CbState(Nil, 0L, 0L, 0L, 0L))
          val incoming = it.map(e => CbEv(e._2.getTime, e._3, e._4, e._5)).toList
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) =
            release(prev.pending, incoming, wm)(_.tsMs)
          var bal = prev.balUnscaled9
          var (nF, nC, seq) = (prev.nFloor, prev.nCap, prev.seq)
          val out = List.newBuilder[CbRow]
          ready.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
            // value → decimal(18,6) exactly as Spark's cast, then to
            // unscaled scale-9: ×1000 credit, ×125 (= 0.125) debit
            val u6 = JBD.valueOf(e.value)
              .setScale(6, RoundingMode.HALF_UP).unscaledValue().longValueExact()
            val delta = if (e.etype == "purchase") u6 * 1000L else -u6 * 125L
            bal += delta
            if (bal < 0L) { bal = 0L; nF += 1 }
            else if (bal > CapUnscaled) { bal = CapUnscaled; nC += 1 }
            seq += 1
            out += CbRow(user, e.eventId, e.tsMs,
              new JBD(java.math.BigInteger.valueOf(bal), 9).doubleValue(),
              nF, nC, seq)
          }
          state.update(CbState(pending, bal, nF, nC, seq))
          if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_.tsMs).min)
          out.result().iterator
      }
  }

  case class VfEv(tsMs: Long, eventId: Long)
  case class VfState(pending: List[VfEv], recent: List[Long])
  case class VfFlag(user_id: Long, event_id: Long, ts_ms: Long, n_hour: Long)

  /** Streaming velocity rule — the face `events_velocity_flags`
    * actually deploys as: fraud velocity is worthless nightly, the
    * alert has to fire AS the third event lands. Watermark-ordered
    * replay (the [[clampedBalanceStream]] skeleton); state per user is
    * the accepted timestamps within the trailing hour — pruned every
    * step, so it is bounded by the per-user hourly rate, not history.
    * Tie semantics match the batch RANGE frame exactly: events
    * sharing a timestamp are processed as one group and each counts
    * the WHOLE group (RANGE includes peers), so the streamed flags
    * are set-identical to the batch window's (parity-pinned). Emits
    * one row per event whose trailing-hour count reaches K=3. */
  def velocityFlagsStream(events: DataFrame,
      delay: String = "2 hours"): Dataset[VfFlag] = {
    val spark = events.sparkSession
    import spark.implicits._
    val K = 3
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[VfState, VfFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state) =>
          val prev = state.getOption.getOrElse(VfState(Nil, Nil))
          val incoming = it.map(e => VfEv(e._2.getTime, e._3)).toList
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) =
            release(prev.pending, incoming, wm)(_.tsMs)
          var recent = prev.recent
          val out = List.newBuilder[VfFlag]
          // process equal-timestamp events as one peer group: the
          // batch RANGE frame counts the whole group for each member
          ready.sortBy(e => (e.tsMs, e.eventId))
            .groupBy(_.tsMs).toSeq.sortBy(_._1)
            .foreach { case (t, group) =>
              recent = recent.filter(_ >= t - 3600000L)
              val n = recent.size + group.size
              if (n >= K)
                group.foreach(e => out += VfFlag(user, e.eventId, t, n))
              recent = recent ++ group.map(_.tsMs)
            }
          state.update(VfState(pending, recent))
          if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_.tsMs).min)
          out.result().iterator
      }
  }

  case class AsofEv(tsMs: Long, tag: Int, eventId: Long, value: Double)
  case class AsofState(pending: List[AsofEv], clickId: Long, clickMs: Long,
    clickValue: Double, hasClick: Boolean)
  case class AsofMatch(purchase_id: Long, user_id: Long, purchase_ms: Long,
    click_id: Long, click_ms: Long, click_value: Double)

  /** Streaming as-of join (the unbounded face of
    * [[EventQueries]]'s `events_asof_join`): each purchase matched to
    * the same user's latest click at-or-before it, over an out-of-order
    * event stream. The batch form's carry-forward window needs the
    * whole partition sorted, which a stream never has — so this is the
    * custom-state case SURVEY §2.10 reserves for
    * `flatMapGroupsWithState`:
    *
    *  - events buffer per user until the watermark passes their event
    *    time (every click that could precede them has then arrived);
    *  - ready events replay in (ts, click-before-purchase, id) order
    *    against the carried last-click, emitting matches append-only;
    *  - state is the in-flight buffer (bounded by the watermark delay ×
    *    per-user rate) plus ONE remembered click — O(1) per user after
    *    the buffer drains, so a forever-running stream holds state
    *    proportional to active users, not history.
    *
    * An event-time timeout on the earliest pending event guarantees
    * buffered events emit even if the user's traffic stops.
    *
    * Note the watermark is effectively derived from the click/purchase
    * sub-stream: Catalyst pushes the type filter below the watermark
    * node (the predicate doesn't touch `ts`), so other event types
    * never advance it — conservative (no premature emission), and a
    * stream of only-other-types holds results rather than corrupting
    * them. */
  def asofStream(events: DataFrame, delay: String = "2 hours"): Dataset[AsofMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", delay)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"),
        col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Int, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state) =>
          val prev = state.getOption.getOrElse(
            AsofState(Nil, 0L, 0L, 0.0, hasClick = false))
          val incoming = it.map(e => AsofEv(e._2.getTime, e._3, e._4, e._5)).toList
          val wm = state.getCurrentWatermarkMs()
          // strictly-before: Spark only DROPS rows strictly older than
          // the watermark, so an event timestamped exactly at wm may
          // still arrive in a later micro-batch — it stays pending
          // until the watermark passes it (the timeout below re-fires
          // this group when that happens)
          val (ready, pending) = release(prev.pending, incoming, wm)(_.tsMs)
          var (cid, cms, cv, has) =
            (prev.clickId, prev.clickMs, prev.clickValue, prev.hasClick)
          val out = List.newBuilder[AsofMatch]
          ready.sortBy(e => (e.tsMs, e.tag, e.eventId)).foreach { e =>
            if (e.tag == 0) { cid = e.eventId; cms = e.tsMs; cv = e.value; has = true }
            else if (has) out += AsofMatch(e.eventId, user, e.tsMs, cid, cms, cv)
          }
          state.update(AsofState(pending, cid, cms, cv, has))
          if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_.tsMs).min)
          out.result().iterator
      }
  }

  /** Streaming count-min sketch — the unbounded face of
    * `events_heavy_hitters`: the CMS counter grid is an associative,
    * commutative merge (cell-wise addition with shared hash params),
    * so the sketch builds as a PLAIN streaming aggregation — no custom
    * state, state size the fixed ε×δ grid regardless of stream length
    * or key cardinality. Emitted per event-type group in complete
    * mode; the caller probes the collected grid exactly like the batch
    * face. Grid addition is order-independent, so the streamed sketch
    * is BYTE-IDENTICAL to the batch sketch over the same rows
    * (StreamingSpec pins this). */
  /** Streaming distinct-count partials — the unbounded face of the
    * `events_dau_mau` family: each 1-day event-time window aggregates
    * its users into one fixed-size HLL sketch
    * ([[EventQueries.dayUserSketch]], shared verbatim with the batch
    * approx query), emitted once when the watermark closes the day.
    * State is O(open days) × ≤16 KB — the layer an exact trailing
    * DISTINCT cannot provide on an unbounded stream. The emitted
    * partials accrete into a store; [[dauMauServe]] answers DAU and
    * trailing-30-day MAU over them at query time, which is exactly the
    * production mergeable-sketch serving split (store per-day partials,
    * union ≤30 on read). */
  def dauMauStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    EventQueries.dayUserSketch(events.withWatermark("ts", delay))

  /** Query-time fold over stored day partials (streamed or
    * batch-built — register-max merge makes the estimates identical):
    * (day_ms, dau_est, mau_est, stickiness_permille_est). */
  def dauMauServe(partials: DataFrame): DataFrame =
    EventQueries.dauMauFold(partials)
      .select(col("day_ms"), col("dau_est"), col("mau_est"),
        floor(col("dau_est") * 1000 / col("mau_est"))
          .cast("long").as("stickiness_permille_est"))

  def cmsStream(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sketch"))

  /** Query-time heavy-hitters serve over the streamed CMS store — the
    * store/serve split of [[retentionStore]]/[[dauMauServe]] applied
    * to the sketch family: [[cmsStream]]'s per-event-type grids are
    * the store; serving merges them into ONE grid (the same
    * associative cell-wise addition that builds them — shared hash
    * params, so merge is exact) and probes a CANDIDATE-KEY relation
    * distributedly: the ~23 KB merged grid is broadcast, each
    * partition deserializes it once, and every candidate costs d hash
    * probes — the candidate relation may therefore be data-sized
    * ("all keys seen today") without any driver loop. Top-k is
    * (est desc, user_id) via orderBy+limit — TakeOrderedAndProject,
    * never a global sort. The only collect is the constant-size
    * sketch rows. Each estimate inherits the CMS contract
    * est ≥ true ∧ est ≤ true + ⌈ε·N⌉ w.p. 1−δ — the same contract
    * `events_heavy_hitters` pins on the batch face (StreamingSpec
    * asserts it against exact batch counts). */
  def cmsServe(stored: DataFrame, candidates: DataFrame,
               k: Int = 5): DataFrame = {
    val spark = stored.sparkSession
    import spark.implicits._
    val grids = stored.select(col("sketch")).as[Array[Byte]].collect()
    require(grids.nonEmpty, "cmsServe: empty sketch store")
    val merged = grids
      .map(b => org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    val bos = new java.io.ByteArrayOutputStream()
    merged.writeTo(bos)
    val bc = spark.sparkContext.broadcast(bos.toByteArray)
    candidates.select(col("user_id")).as[Long]
      .mapPartitions { it =>
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bc.value))
        it.map(uid => (uid, cms.estimateCount(uid)))
      }
      .toDF("user_id", "est_count")
      .orderBy(col("est_count").desc, col("user_id")).limit(k)
  }

  case class ShEv(tsMs: Long, eventId: Long, etype: String)
  case class ShState(pending: List[ShEv], curType: String, fromMs: Long,
                     n: Long, has: Boolean)
  case class ShClosed(user_id: Long, event_type: String,
                      valid_from_ms: Long, valid_to_ms: Long, n_events: Long)

  /** Streaming SCD-Type-2 maintenance — the unbounded face of
    * `events_state_history`: per user, the CURRENT run lives in state
    * (type, start, count — exactly the is_current row a dimension
    * store keeps hot) and each state CHANGE appends the closed
    * interval [valid_from, valid_to) downstream, which is precisely
    * how warehouse SCD2 history accretes. Watermark-release discipline
    * as in [[runningTotalStream]] (strict-< release, (ts, event_id)
    * order); state per user is the in-delay buffer plus one run
    * descriptor. The open run never emits in append mode — it is
    * state, not history — so the streamed output is the batch query's
    * rows with non-null valid_to_ms, which StreamingSpec pins. */
  def stateHistoryStream(events: DataFrame, delay: String = "2 hours"): Dataset[ShClosed] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ShState, ShClosed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state) =>
          val prev = state.getOption.getOrElse(ShState(Nil, "", 0L, 0L, false))
          val incoming = it.map(e => ShEv(e._2.getTime, e._3, e._4)).toList
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) =
            release(prev.pending, incoming, wm)(_.tsMs)
          var (cur, from, n, has) =
            (prev.curType, prev.fromMs, prev.n, prev.has)
          val out = List.newBuilder[ShClosed]
          ready.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
            if (!has) { cur = e.etype; from = e.tsMs; n = 1; has = true }
            else if (e.etype == cur) n += 1
            else {
              out += ShClosed(user, cur, from, e.tsMs, n)
              cur = e.etype; from = e.tsMs; n = 1
            }
          }
          state.update(ShState(pending, cur, from, n, has))
          if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_.tsMs).min)
          out.result().iterator
      }
  }

  case class LcState(pending: List[Long], lastDay: Long, hasLast: Boolean)
  case class LcClass(user_id: Long, day_num: Long, cls: String)

  /** Streaming growth-accounting classification — the unbounded face
    * of `events_user_lifecycle`'s per-(user, day) classed relation:
    * per user, remember the LAST released active day and classify each
    * newly released day as new / retained / resurrected; the batch
    * ledger is then a plain downstream count per (day, class). Same
    * watermark-release discipline as [[markovStream]] (buffer until
    * the watermark strictly passes, release in order); state per user
    * is the pending buffer plus ONE remembered day — the lifetime
    * scope is inherent to the metric (a user's first-ever day defines
    * `new`), exactly like [[attributionStream]]'s lifetime argmin. */
  def lifecycleStream(events: DataFrame, delay: String = "2 hours"): Dataset[LcClass] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LcState, LcClass](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state) =>
          val prev = state.getOption.getOrElse(LcState(Nil, 0L, false))
          val incoming = it.map(_._2.getTime).toList
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) =
            release(prev.pending, incoming, wm)(identity)
          var last = prev.lastDay
          var has = prev.hasLast
          val out = List.newBuilder[LcClass]
          ready.map(_ / 86400000L).distinct.sorted.foreach { d =>
            if (!has) { out += LcClass(user, d, "new"); last = d; has = true }
            else if (d > last) {
              out += LcClass(user, d,
                if (d == last + 1) "retained" else "resurrected")
              last = d
            } // d <= last: the day already released in an earlier batch
          }
          state.update(LcState(pending, last, has))
          if (pending.nonEmpty) state.setTimeoutTimestamp(pending.min)
          out.result().iterator
      }
  }

  case class MkEv(tsMs: Long, eventId: Long, etype: String)
  case class MkState(pending: List[MkEv], lastType: String, hasLast: Boolean)
  case class MkTransition(user_id: Long, event_id: Long,
                          from_type: String, to_type: String)

  /** Streaming event-transition extraction — the unbounded face of
    * `events_markov`: per user, remember the last released event's type
    * and emit a (from_type, to_type) pair for each newly released
    * event; the batch query's transition matrix is then a plain
    * downstream count over these pairs. Ordering needs the same
    * watermark-release discipline as [[runningTotalStream]]: events
    * buffer until the watermark passes them STRICTLY (an event stamped
    * exactly at the watermark can still arrive in a later micro-batch),
    * then release in (ts, event_id) order. State per user is the
    * in-delay pending buffer plus ONE remembered type — O(users ×
    * delay-window), independent of stream length. */
  def markovStream(events: DataFrame, delay: String = "2 hours"): Dataset[MkTransition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MkState, MkTransition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state) =>
          val prev = state.getOption.getOrElse(MkState(Nil, "", false))
          val incoming = it.map(e => MkEv(e._2.getTime, e._3, e._4)).toList
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) =
            release(prev.pending, incoming, wm)(_.tsMs)
          var last = prev.lastType
          var has = prev.hasLast
          val out = List.newBuilder[MkTransition]
          ready.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
            if (has) out += MkTransition(user, e.eventId, last, e.etype)
            last = e.etype; has = true
          }
          state.update(MkState(pending, last, has))
          if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_.tsMs).min)
          out.result().iterator
      }
  }

  case class FnEv(tsMs: Long, eventId: Long, etype: String)
  case class FnState(pending: List[FnEv], sgn: Long, clk: Long, pur: Long)
  case class FnStage(user_id: Long, stage: String, stage_ms: Long)

  /** Streaming conversion funnel — the unbounded face of
    * `events_funnel`, and the first streaming ask on any event
    * platform ("live funnel conversion"): per user, emit a row the
    * moment a stage is REACHED — signup, then the first click
    * at-or-after it, then the first purchase at-or-after that click.
    * The append-only stage log pivots downstream into exactly the
    * batch query's (signup_ms, click_ms, purchase_ms) row per
    * converted user (parity-pinned in StreamingSpec).
    *
    * Watermark-release discipline as everywhere ([[release]]); within
    * a released batch, equal-timestamp events replay in stage-priority
    * order (signup < click < purchase), which reproduces the batch
    * face's RANGE-frame peer semantics — a click at the SAME
    * millisecond as the signup qualifies, a purchase at the same
    * millisecond as its qualifying click converts. State per user
    * after the buffer drains: three longs (the reached-stage
    * timestamps, -1 = not reached) — O(active users) forever. */
  def funnelStream(events: DataFrame, delay: String = "2 hours"): Dataset[FnStage] = {
    val spark = events.sparkSession
    import spark.implicits._
    val prio = Map("signup" -> 0, "click" -> 1, "purchase" -> 2)
    events.withWatermark("ts", delay)
      .filter(col("event_type").isin("signup", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FnState, FnStage](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state) =>
          val prev = state.getOption.getOrElse(FnState(Nil, -1L, -1L, -1L))
          val incoming = it.map(e => FnEv(e._2.getTime, e._3, e._4)).toList
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = release(prev.pending, incoming, wm)(_.tsMs)
          var (sgn, clk, pur) = (prev.sgn, prev.clk, prev.pur)
          val out = List.newBuilder[FnStage]
          ready.sortBy(e => (e.tsMs, prio(e.etype), e.eventId)).foreach { e =>
            e.etype match {
              case "signup" if sgn < 0 =>
                sgn = e.tsMs; out += FnStage(user, "signup", sgn)
              case "click" if sgn >= 0 && clk < 0 && e.tsMs >= sgn =>
                clk = e.tsMs; out += FnStage(user, "click", clk)
              case "purchase" if clk >= 0 && pur < 0 && e.tsMs >= clk =>
                pur = e.tsMs; out += FnStage(user, "purchase", pur)
              case _ => // already reached, or stage prerequisites unmet
            }
          }
          state.update(FnState(pending, sgn, clk, pur))
          if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_.tsMs).min)
          out.result().iterator
      }
  }

  /** Streaming day-active store — the store half of the retention
    * store/serve split (the [[dauMauStream]] pattern): one row per
    * closed (day, user), emitted append-mode when the watermark passes
    * day end + delay. The stored relation is exactly the batch
    * query's distinct (user_id, day_ms) active set — day buckets from
    * `window(ts, "1 day")` coincide with the batch face's
    * `date_trunc('day')` in the UTC session. State is O(open days ×
    * active users that day), bounded by the watermark. */
  def retentionStore(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_millis(col("w.start")).as("day_ms"),
        col("n_events"))

  /** Query-time retention finish over the stored day-active partials —
    * the SAME [[EventQueries.retentionOf]] lead-window fold the batch
    * query runs, so stored-then-served equals batch by construction
    * (parity-pinned in StreamingSpec). */
  def retentionServe(stored: DataFrame): DataFrame =
    EventQueries.retentionOf(stored.select("user_id", "day_ms"))

  /** Cohort-matrix serve over the day-active store — the same store
    * that answers retention also renders the full acquisition×offset
    * triangle ([[EventQueries.cohortMatrixOf]], identical batch
    * finish; the serve-side localCheckpoint also keeps memory-sink
    * reads safe for the matrix's self-join). Lifetime caveat as
    * [[lifecycleStream]]: cohort day is the first STORED day. */
  def cohortMatrixServe(stored: DataFrame): DataFrame =
    EventQueries.cohortMatrixOf(stored.select(col("user_id"),
      expr("day_ms div 86400000").as("day_num")))

  /** Streak-histogram serve over the same day-active store
    * ([[EventQueries.streaksOf]]) — the fourth metric one store
    * answers (retention, cohort matrix, streaks; DAU rides the
    * sketch store). */
  def streaksServe(stored: DataFrame): DataFrame =
    EventQueries.streaksOf(stored.select(col("user_id"),
      expr("day_ms div 86400000").as("day_num")))

  /** Streaming cohort-LTV store — the revenue sibling of
    * [[retentionStore]]: one row per closed (day, user) with that
    * day's decimal-exact purchase revenue and purchase count (rev 0
    * rows still emit — activity days feed acquisition-day state even
    * without spend). Append-mode at the watermark; mergeable partials,
    * so replays re-emit identical rows. Lifetime caveat as
    * [[lifecycleStream]]: acquisition day is correct provided the
    * store has run since the user's first event — inherent to the
    * metric, not the implementation. */
  def ltvStore(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,6)"))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("rev"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .select(col("user_id"),
        expr("unix_millis(w.start) div 86400000").as("day_num"),
        col("rev"), col("n_purchases"))

  /** Query-time LTV finish over the stored partials — the SAME
    * [[EventQueries.ltvOf]] cohort fold the batch query runs
    * (parity-pinned in StreamingSpec). */
  def ltvServe(stored: DataFrame): DataFrame =
    EventQueries.ltvOf(
      stored.select("user_id", "day_num", "rev", "n_purchases"))
}
