package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Explicit lifecycle for the MB-scale relations the dedup/ANN family
  * pins in memory (dedup corpus, shingle rows, simhash fingerprints).
  *
  * Within one query — and across queries in one bench/verify run —
  * the caches are load-bearing: subplans referenced several times are
  * otherwise recomputed per reference, and CacheManager dedupes the
  * cached copies by canonical plan. But a cache pinned forever is a
  * leak in a long-lived session: a 100 TB deployment running many
  * corpora through the same SparkSession would accrete cached
  * relations until eviction pressure hurts unrelated queries. Every
  * `.cache()` on those paths therefore registers here, and the session
  * owner calls [[release]] at corpus-lifecycle boundaries (end of a
  * verify/bench suite, corpus switch). Registration is deduped by
  * canonicalized plan (ADVICE r10: planning-only sweeps construct the
  * same queries repeatedly and must not grow the pool), and the
  * two-phase rank pattern's scaffold cache has its own shorter
  * lifecycle — see [[cachedPair]].
  */
object CachePool {
  private val pool = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val seen = scala.collection.mutable.HashSet.empty[LogicalPlan]
  // (scaffold, derived) pairs from [[cachedPair]]: the scaffold is
  // unpersisted as soon as the derived cache is observed materialized
  private val pairs =
    scala.collection.mutable.ArrayBuffer.empty[(DataFrame, DataFrame)]

  /** Cache `df` and register it for a later [[release]]. Re-caching a
    * plan this pool already holds returns the fresh handle (storage is
    * shared — CacheManager dedupes by canonical plan) without growing
    * the pool. */
  def cached(df: DataFrame): DataFrame = synchronized {
    reapPairs()
    val c = df.cache()
    if (seen.add(c.queryExecution.analyzed.canonicalized)) pool += c
    c
  }

  /** The GlobalRank double-cache with the scaffold's shorter
    * lifecycle (ADVICE r10: rankCore pinned TWO corpus-scale
    * relations until release, though the input cache only exists to
    * keep `repartitionByRange`'s sampling pass + shuffle write from
    * executing the input pipeline twice during the DERIVED cache's
    * first materialization). The input is cached WITHOUT pool
    * registration; once the derived relation's column buffers are
    * observed loaded — checked lazily at the next [[cached]] /
    * [[memoized]] touch, i.e. between queries in a bench/verify
    * sweep — the scaffold is unpersisted: every later read hits the
    * derived cache, and even a derived-partition recompute re-reads
    * the already-written range-shuffle output, never the scaffold.
    * Dropping the scaffold early is thus always CORRECT (worst case:
    * a never-materialized derived plan pays the input twice, exactly
    * the single-cache behavior). */
  def cachedPair(input: DataFrame)(build: DataFrame => DataFrame)
      : DataFrame = synchronized {
    val in = input.cache()
    val out = cached(build(in))
    pairs += ((in, out))
    out
  }

  /** True once the derived cache's buffers exist (or its cache entry
    * is gone) — the point after which the scaffold is dead weight. */
  private def materialized(out: DataFrame): Boolean =
    out.queryExecution.optimizedPlan.collectFirst {
      case r: InMemoryRelation => r.cacheBuilder.isCachedColumnBuffersLoaded
    }.getOrElse(true)

  private def reapPairs(): Unit = {
    val (done, live) = pairs.partition { case (_, out) => materialized(out) }
    if (done.nonEmpty) {
      done.foreach(_._1.unpersist(false))
      pairs.clear()
      pairs ++= live
    }
  }

  /** Unpersist the pooled cached relations but KEEP the memoized
    * model state — the family-boundary lifecycle for memory-
    * constrained suites (VERDICT r11 #5): the pool holds the
    * corpus-scale relations whose accretion pressures unrelated
    * queries' memory, while memo entries are trained models
    * (centroids, merges, weights, built index-table names) that are
    * expensive to retrain and mostly driver-sized. A memoized value
    * that referenced a pooled cache recomputes lazily — correctness
    * is unaffected, only the cache cost is re-paid on next touch.
    * NOT the bench default: measured at sf0.1/local[32] the rebuilds
    * cost +11% wall vs accretion (see Bench.scala's finding). */
  def releaseCaches(): Unit = synchronized {
    pairs.foreach(_._1.unpersist(false))
    pairs.clear()
    pool.foreach(_.unpersist(false))
    pool.clear()
    seen.clear()
  }

  /** Unpersist every registered relation (non-blocking) and forget it,
    * models included — the corpus-lifecycle boundary. */
  def release(): Unit = synchronized {
    releaseCaches()
    memo.clear()
  }

  // Memoized model state (trained once per (owner, dataset), reused by
  // every query that serves it — the stored-model analog of the
  // bucketed indexes). Cleared with [[release]] at the same corpus
  // lifecycle boundaries; entries hold localCheckpointed relations
  // whose blocks the ContextCleaner frees once dereferenced.
  private val memo = scala.collection.mutable.HashMap.empty[Any, Any]

  /** Build-once lookup: returns the cached value for `key`, building
    * and remembering it on first touch. */
  def memoized[T](key: Any)(build: => T): T = synchronized {
    reapPairs()
    memo.getOrElseUpdate(key, build).asInstanceOf[T]
  }

  /** Forget ONE memo entry — the targeted lifecycle boundary for a
    * maintenance job that rewrote the tables a build-once key stands
    * for (e.g. the ingest-history compaction), where a full
    * [[release]] would needlessly drop every other trained model. */
  def memoDrop(key: Any): Unit = synchronized { memo.remove(key); () }

  /** Diagnostic counts for the suite-residency probe (VERDICT r16
    * #4): how much pooled/memoized state a long-lived session has
    * accreted — recorded as covariates next to end-of-suite vs
    * cold-session timings so residency cost is a measurement, not a
    * hypothesis. */
  def poolSize: Int = synchronized { pool.size }
  def memoSize: Int = synchronized { memo.size }
}
