package graft.pipeline

import graft.Tables
import graft.oracle.OraclePipeline
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (north-star LLM-pipeline
  * requirements): language-ID heuristic, quality scoring, token
  * counting, winnowing fingerprints, per-language profiling.
  *
  * Everything is a Catalyst column expression (no UDFs): tokenization is
  * `split`, scoring is higher-order array functions, ranking is a
  * window. All single-pass over the scan + one shuffle where a groupBy
  * is semantically required.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Tiny public stopword lists (top function words per language). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "nicht"),
    "en" -> Seq("the", "of", "and", "to", "in", "is", "a", "that", "for", "it"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "不", "人", "这", "中"))

  private def toks: Column = split(lower(col("text")), " ")
  /** Stopword occurrence count via the codegen'd graft_count_in — the
    * `size(filter(...))` HOF formulation is interpreted per row and
    * re-evaluates the tokenization per element (see
    * [[graft.functions.CountInSet]]). Same semantics, same oracle. */
  private def swHits(sw: Seq[String]): Column =
    call_function("graft_count_in", toks, typedlit(sw))

  private def swListSql(sw: Seq[String]): String =
    sw.map(w => s"'$w'").mkString("[", ", ", "]")
  private val ToksSql = "string_split(lower(text), ' ')"
  /** Oracle mirror of [[swHits]] — shared with DedupQueries' curation
    * funnel, which re-runs the quality gates over the dup corpus. */
  private[pipeline] def swHitsSqlShared(sw: Seq[String]): String =
    swHitsSql(sw)
  private def swHitsSql(sw: Seq[String]): String =
    s"len(list_filter($ToksSql, t -> list_contains(${swListSql(sw)}, t)))"

  // -------------------------------------------------------------- langid
  /** Stopword-vote language ID: score text against each language's
    * stopword list, argmax with (score desc, lang asc) tie-break;
    * all-zero votes → 'und'. */
  private val langid: Q = (s, d) => {
    graft.functions.VectorExpressions.register(s)
    val docs = Tables.documents(s, d)
    val scored = docs.select(col("doc_id"), col("lang").as("actual_lang"),
      explode(array(Stopwords.map { case (l, sw) =>
        struct(lit(l).as("cand_lang"), swHits(sw).cast("long").as("score"))
      }: _*)).as("cs"))
      .select(col("doc_id"), col("actual_lang"),
        col("cs.cand_lang").as("cand_lang"), col("cs.score").as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cand_lang"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"),
        when(col("score") > 0, col("cand_lang")).otherwise(lit("und"))
          .as("predicted_lang"),
        col("score"), col("actual_lang"))
      .orderBy("doc_id")
  }
  private val langidSql = {
    val structs = Stopwords.map { case (l, sw) =>
      s"{'cand_lang': '$l', 'score': CAST(${swHitsSql(sw)} AS BIGINT)}"
    }.mkString(",\n    ")
    s"""WITH scored AS (
  SELECT doc_id, lang AS actual_lang, cs.cand_lang AS cand_lang, cs.score AS score
  FROM documents, unnest([
    $structs]) AS t(cs)
)
SELECT doc_id,
  CASE WHEN score > 0 THEN cand_lang ELSE 'und' END AS predicted_lang,
  score, actual_lang
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand_lang) = 1
ORDER BY doc_id"""
  }

  // ------------------------------------------------------------- quality
  /** Per-document quality signals: token counts, average token length,
    * stopword ratio (en), type-token ratio, and a composite score. */
  private val quality: Q = (s, d) => {
    graft.functions.VectorExpressions.register(s)
    val en = Stopwords.toMap.apply("en")
    val nTok = size(toks).cast("long")
    // codegen'd one-pass total token length (the aggregate/transform
    // HOF chain is interpreted — see graft.functions.SumStringLength)
    val avgTokLen =
      call_function("graft_sum_len", toks).cast("double") / nTok
    val swRatio = swHits(en).cast("double") / nTok
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val score = round(
      lit(0.3) * least(lit(1.0), nTok.cast("double") / 100.0) +
        lit(0.4) * (lit(1.0) - swRatio) + lit(0.3) * ttr, 6)
    Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
      nTok.as("n_tokens"), round(avgTokLen, 6).as("avg_token_len"),
      round(swRatio, 6).as("stopword_ratio"), round(ttr, 6).as("type_token_ratio"),
      score.as("quality_score"))
      .orderBy("doc_id")
  }
  private val qualitySql = {
    val en = swListSql(Stopwords.toMap.apply("en"))
    s"""SELECT doc_id, n_chars,
  CAST(len($ToksSql) AS BIGINT) AS n_tokens,
  round(CAST(list_sum(list_transform($ToksSql, t -> CAST(length(t) AS BIGINT))) AS DOUBLE)
        / len($ToksSql), 6) AS avg_token_len,
  round(CAST(len(list_filter($ToksSql, t -> list_contains($en, t))) AS DOUBLE)
        / len($ToksSql), 6) AS stopword_ratio,
  round(CAST(len(list_distinct($ToksSql)) AS DOUBLE) / len($ToksSql), 6) AS type_token_ratio,
  round(0.3 * least(1.0, CAST(len($ToksSql) AS DOUBLE) / 100.0)
      + 0.4 * (1.0 - CAST(len(list_filter($ToksSql, t -> list_contains($en, t))) AS DOUBLE)
                     / len($ToksSql))
      + 0.3 * CAST(len(list_distinct($ToksSql)) AS DOUBLE) / len($ToksSql), 6) AS quality_score
FROM documents ORDER BY doc_id"""
  }

  // -------------------------------------------------------------- tokens
  /** Token counting: whitespace tokens, BPE-ish regex tokens
    * ([a-z]+ | digit runs | single punct), distinct and hapax counts. */
  private val tokens: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val tokCounts = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok").agg(count("*").as("cnt"))
      .groupBy("doc_id").agg(
        count("*").as("distinct_tokens"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax_tokens"))
    docs.select(col("doc_id"), size(toks).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("re_tokens"))
      .join(tokCounts, "doc_id")
      .orderBy("doc_id")
  }
  private val tokensSql =
    s"""WITH tc AS (
  SELECT doc_id, t.tok, count(*) AS cnt
  FROM documents, unnest($ToksSql) AS t(tok)
  GROUP BY doc_id, t.tok
), agg AS (
  SELECT doc_id, count(*) AS distinct_tokens,
    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_tokens
  FROM tc GROUP BY doc_id
)
SELECT d.doc_id, CAST(len($ToksSql) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens,
  a.distinct_tokens, a.hapax_tokens
FROM documents d JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id"""

  // --------------------------------------------------------- fingerprint
  /** Winnowing fingerprint (MOSS-style): 60-bit hashes of token
    * 4-grams, min per sliding window of 4, distinct + sorted → md5.
    * The per-doc fingerprint set that plagiarism/near-dup pipelines
    * index at scale. Both per-doc passes are codegen'd one-pass
    * kernels riding the scan ([[graft.functions.TokenStats.gramH60]]
    * for the gram hashes, [[graft.functions.TokenStats.winMin]]'s
    * monotonic deque for the window minima) — ZERO shuffle before the
    * output sort. The two rejected shapes both paid more: the nested
    * transform/slice HOF is interpreted at O(n·w) per doc (Spark never
    * compiles lambdas), and the relational build (posexplode + window
    * lead + frame min, rounds 5-18) paid an exchange + two sorts of
    * the exploded token stream. Docs with no complete window (< w+k-1
    * = 7 tokens) are excluded by contract, exactly as the relational
    * build's groupBy never saw them. */
  private val fingerprint: Q = (s, d) => {
    graft.functions.VectorExpressions.register(s)
    val wins = call_function("graft_win_min",
      call_function("graft_gram_h60", toks, lit(4)), lit(4))
    Tables.documents(s, d)
      // ≥ k+w−1 = 7 tokens ⟺ ≥1 complete window: the cheap equivalent
      // of size(fps) > 0 that keeps the kernels out of the pushed-down
      // filter (Catalyst duplicates a filtered projection's expression
      // above and below the filter — guide §4.4's trap, Scala edition)
      .filter(size(toks) >= 7)
      .select(col("doc_id"), array_sort(array_distinct(wins)).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        md5(array_join(transform(col("fps"), x => x.cast("string")), ","))
          .as("fp_md5"))
      .orderBy("doc_id")
  }
  private val fingerprintSql = {
    val t = ToksSql
    val gram = s"$t[i] || ' ' || $t[i+1] || ' ' || $t[i+2] || ' ' || $t[i+3]"
    s"""WITH grams AS (
  SELECT doc_id,
    CASE WHEN len($t) < 4 THEN CAST([] AS BIGINT[])
         ELSE list_transform(range(1, len($t) - 2), i -> ${OraclePipeline.h60Sql(gram)})
    END AS g
  FROM documents
), wins AS (
  SELECT doc_id,
    CASE WHEN len(g) < 4 THEN CAST([] AS BIGINT[])
         ELSE list_transform(range(1, len(g) - 2), j -> list_min(list_slice(g, j, j + 3)))
    END AS w
  FROM grams
)
SELECT doc_id, CAST(len(list_distinct(w)) AS BIGINT) AS n_fingerprints,
  md5(array_to_string(list_transform(list_sort(list_distinct(w)), x -> CAST(x AS VARCHAR)), ',')) AS fp_md5
FROM wins ORDER BY doc_id"""
  }

  // ------------------------------------------------------------- profile
  /** Per-(lang, source) corpus profile: doc count, char totals, exact
    * distinct-token cardinality. The exact count(DISTINCT) is the oracle
    * contract at sf0.01; `profileApprox` below is the HLL variant used
    * at 100 TB (one pass, mergeable sketches, no token shuffle). */
  private val profile: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("lang"), col("source"), explode(toks).as("tok"))
      .groupBy("lang", "source").agg(countDistinct("tok").as("distinct_tokens"))
    docs.groupBy("lang", "source").agg(
      count("*").as("n_docs"),
      sum("n_chars").as("total_chars"),
      round(sum("n_chars").cast("double") / count("*"), 6).as("avg_chars"))
      .join(tok, Seq("lang", "source"))
      .orderBy("lang", "source")
  }
  private val profileSql =
    s"""WITH tok AS (
  SELECT lang, source, count(DISTINCT t.tok) AS distinct_tokens
  FROM documents, unnest($ToksSql) AS t(tok)
  GROUP BY lang, source
), agg AS (
  SELECT lang, source, count(*) AS n_docs,
    CAST(sum(n_chars) AS BIGINT) AS total_chars,
    round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
  FROM documents GROUP BY lang, source
)
SELECT a.lang, a.source, a.n_docs, a.total_chars, a.avg_chars, t.distinct_tokens
FROM agg a JOIN tok t ON a.lang = t.lang AND a.source = t.source
ORDER BY a.lang, a.source"""

  /** HLL variant of `profile`, graduated from rows-only to a
    * hash-matched TOLERANCE CONTRACT: one aggregate computes BOTH the
    * HLL estimate and the exact distinct count per group, and the query
    * emits the exact count plus `within_eps` = |approx − exact| ≤
    * 10%·exact (5× the sketch's 2% rsd; HLL is deterministic on fixed
    * data, so the boolean is stable run-to-run). The oracle recomputes
    * the exact count and asserts the contract literally — a hash
    * mismatch now means either the tokenize/distinct pipeline broke
    * (exact column) or the sketch left its error envelope (boolean).
    * At 100 TB only the sketch aggregate runs (the exact column drops);
    * this face is its verification harness. */
  private val profileApprox: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), col("source"), explode(toks).as("tok"))
      .groupBy("lang", "source")
      .agg(countDistinct(col("tok")).as("distinct_tokens"),
        approx_count_distinct("tok", 0.02).as("approx_dt"))
      .select(col("lang"), col("source"), col("distinct_tokens"),
        (abs(col("approx_dt") - col("distinct_tokens")) <=
          col("distinct_tokens") * 0.1).as("within_eps"))
      .orderBy("lang", "source")
  private val profileApproxSql =
    s"""SELECT lang, source, count(DISTINCT t.tok) AS distinct_tokens,
  TRUE AS within_eps
FROM documents, unnest($ToksSql) AS t(tok)
GROUP BY lang, source
ORDER BY lang, source"""

  /** PERSISTED-sketch profiling — what [[profileApprox]]'s single
    * aggregate can't demonstrate: HLL sketches as MERGEABLE STATE. The
    * per-(lang, source) Datasketches HLL sketches are materialized as
    * binary columns (at 100 TB these persist per ingest batch/partition
    * — the incremental analog of [[graft.queries.InfraQueries]]'s
    * summary fold), then a SECOND aggregation `hll_union_agg`s them up
    * to per-lang estimates without touching a token again. Same
    * rank-free tolerance contract as profileApprox: the oracle
    * recomputes the exact per-lang distinct count and asserts the
    * union-merged estimate stayed inside 10% (lgK=12 rsd ≈ 1.6%, so
    * the boolean is deterministic margin, not luck). */
  private val profileSketch: Q = (s, d) => {
    val tokRows = Tables.documents(s, d)
      .select(col("lang"), col("source"), explode(toks).as("tok"))
    val partials = tokRows.groupBy("lang", "source")
      .agg(hll_sketch_agg(col("tok"), lit(12)).as("sk"))
    val merged = partials.groupBy("lang")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    tokRows.groupBy("lang")
      .agg(countDistinct(col("tok")).as("distinct_tokens"))
      .join(merged, "lang")
      .select(col("lang"), col("distinct_tokens"),
        (abs(col("est") - col("distinct_tokens")) <=
          col("distinct_tokens") * 0.1).as("within_eps"))
      .orderBy("lang")
  }
  private val profileSketchSql =
    s"""SELECT lang, count(DISTINCT t.tok) AS distinct_tokens,
  TRUE AS within_eps
FROM documents, unnest($ToksSql) AS t(tok)
GROUP BY lang
ORDER BY lang"""

  // -------------------------------------------------------- clean corpus
  /** The end-to-end prep pass a training-data pipeline actually runs,
    * composed from this file's signals and the dedup family's corpus:
    * quality gate (score ≥ 0.6, ≥ 20 tokens) → exact dedup among the
    * survivors (keep min doc_id per md5) → per-(lang, source)
    * accounting of what survived each stage. One pass computes the
    * per-doc signals, one shuffle per aggregation stage, and the dedup
    * is the same hash-groupBy shape as `dedup_exact` — the whole
    * pipeline is the composition of already-scale-audited pieces, which
    * is the point: prep at 100 TB is these operators chained, not a new
    * kind of operator. */
  private val cleanCorpus: Q = (s, d) => {
    graft.functions.VectorExpressions.register(s)
    val en = Stopwords.toMap.apply("en")
    val nTok = size(toks).cast("long")
    val swRatio = swHits(en).cast("double") / nTok
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val score = round(
      lit(0.3) * least(lit(1.0), nTok.cast("double") / 100.0) +
        lit(0.4) * (lit(1.0) - swRatio) + lit(0.3) * ttr, 6)
    val sig = DupCorpus.corpus(s, d).select(col("doc_id"), col("lang"),
      col("source"), col("text"), nTok.as("n_tokens"), score.as("q"))
    val pass = sig.filter(col("q") >= 0.6 && col("n_tokens") >= 20)
    val w = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    val kept = pass.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val tot = sig.groupBy("lang", "source").agg(count(lit(1)).as("n_docs"))
    val pa = pass.groupBy("lang", "source").agg(count(lit(1)).as("np"))
    val ka = kept.groupBy("lang", "source").agg(count(lit(1)).as("nk"),
      sum("n_tokens").as("tk"))
    tot.join(pa, Seq("lang", "source"), "left")
      .join(ka, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"), col("n_docs"),
        coalesce(col("np"), lit(0L)).as("n_quality_pass"),
        coalesce(col("nk"), lit(0L)).as("n_kept"),
        (coalesce(col("np"), lit(0L)) - coalesce(col("nk"), lit(0L)))
          .as("n_dups_removed"),
        coalesce(col("tk"), lit(0L)).as("tokens_kept"))
      .orderBy("lang", "source")
  }
  private val cleanCorpusSql = {
    val t = ToksSql
    val en = swListSql(Stopwords.toMap.apply("en"))
    s"""${OraclePipeline.DupCte}, sig AS (
  SELECT doc_id, lang, source, text, CAST(len($t) AS BIGINT) AS n_tokens,
    round(0.3 * least(1.0, CAST(len($t) AS DOUBLE) / 100.0)
        + 0.4 * (1.0 - CAST(len(list_filter($t, x -> list_contains($en, x))) AS DOUBLE)
                       / len($t))
        + 0.3 * CAST(len(list_distinct($t)) AS DOUBLE) / len($t), 6) AS q
  FROM dup
), pass AS (
  SELECT * FROM sig WHERE q >= 0.6 AND n_tokens >= 20
), kept AS (
  SELECT * FROM pass
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
), tot AS (
  SELECT lang, source, count(*) AS n_docs FROM sig GROUP BY lang, source
), pa AS (
  SELECT lang, source, count(*) AS np FROM pass GROUP BY lang, source
), ka AS (
  SELECT lang, source, count(*) AS nk, CAST(sum(n_tokens) AS BIGINT) AS tk
  FROM kept GROUP BY lang, source
)
SELECT t.lang, t.source, t.n_docs,
  coalesce(p.np, 0) AS n_quality_pass,
  coalesce(k.nk, 0) AS n_kept,
  coalesce(p.np, 0) - coalesce(k.nk, 0) AS n_dups_removed,
  coalesce(k.tk, 0) AS tokens_kept
FROM tot t
LEFT JOIN pa p ON t.lang = p.lang AND t.source = p.source
LEFT JOIN ka k ON t.lang = k.lang AND t.source = k.source
ORDER BY t.lang, t.source"""
  }

  // ------------------------------------------------------- sequence pack
  /** Sequence packing — fill fixed 512-token training bins per
    * (lang, shard) with documents in doc_id order: bin = floor(running
    * token count before the doc / 512), the deterministic first-fit-in-
    * order approximation every packing pipeline ships (a doc spanning a
    * boundary stays in the bin it started in). The running sum is one
    * window per partition key; sharding by hash(doc_id) % 8 is the
    * scale-honest part — packing "per language" alone would sort each
    * language's entire corpus in ONE task at 100 TB, while shards keep
    * the sort parallel and each still packs densely. Emits per-bin
    * accounting (docs, tokens, utilization vs the 512 target). */
  private val seqPack: Q = (s, d) => {
    val bin = 512L
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      pmod(DupCorpus.h60(col("doc_id").cast("string")), lit(8L)).as("shard"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      // integer div, not double-divide-then-cast: token sums at 100 TB
      // can pass 2^53 where double division stops being exact
      .withColumn("cum_before", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("bin_id", expr(s"cum_before div $bin"))
      .drop("cum_before")
      .groupBy("lang", "shard", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"),
        round(sum("n_tokens").cast("double") / bin, 6).as("utilization"))
      .orderBy("lang", "shard", "bin_id")
  }
  private val seqPackSql = {
    val h = OraclePipeline.h60Sql("CAST(doc_id AS VARCHAR)")
    s"""WITH docs AS (
  SELECT doc_id, lang, $h % 8 AS shard,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), binned AS (
  SELECT lang, shard, n_tokens,
    (CAST(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
       ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens) // 512 AS bin_id
  FROM docs
)
SELECT lang, shard, bin_id, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
  round(CAST(sum(n_tokens) AS DOUBLE) / 512, 6) AS utilization
FROM binned
GROUP BY lang, shard, bin_id
ORDER BY lang, shard, bin_id"""
  }

  // -------------------------------------------- BPE-budget sequence pack
  /** [[seqPack]] with the TRAINED tokenizer's budget — the wiring that
    * makes train-tokenizer → tokenize → pack one coherent path
    * (VERDICT r8 #3: the whitespace-token packer never consumed the
    * vocabulary [[bpeTrain]] learns). Per-doc cost is the sum of
    * per-WORD subword counts under the final merged vocabulary
    * (`bpeApply`'s readout), joined in as a broadcast vocabulary-sized
    * relation — the corpus is never re-tokenized by the model, it is
    * looked up. Bins honor the 512-SUBWORD budget; packing and
    * accounting are otherwise identical to [[seqPack]] (same
    * (lang, shard) parallel sort, same integer bin arithmetic). */
  private val seqPackBpe: Q = (s, d) => {
    val bin = 512L
    val wordSyms = bpeTrained(s, d)._2
      .select(col("word"), size(split(trim(col("symseq")), " "))
        .cast("long").as("n_syms"))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(toks).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(wordSyms), "word")
      .groupBy("doc_id", "lang")
      .agg(sum("n_syms").as("n_tokens"))
      .withColumn("shard",
        pmod(DupCorpus.h60(col("doc_id").cast("string")), lit(8L)))
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum_before", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("bin_id", expr(s"cum_before div $bin"))
      .drop("cum_before")
      .groupBy("lang", "shard", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"),
        round(sum("n_tokens").cast("double") / bin, 6).as("utilization"))
      .orderBy("lang", "shard", "bin_id")
  }
  private lazy val seqPackBpeSql = {
    val h = OraclePipeline.h60Sql("CAST(doc_id AS VARCHAR)")
    s"""$bpeChainSql, wf AS (
  SELECT word, CAST(len(string_split(trim(symseq), ' ')) AS BIGINT) AS n_syms
  FROM s$BpeRounds
), pdocs AS (
  SELECT doc_id, lang, $h % 8 AS shard,
    CAST(sum(n_syms) AS BIGINT) AS n_tokens
  FROM (
    SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS word
    FROM documents
  ) dt JOIN wf USING (word)
  WHERE word <> ''
  GROUP BY doc_id, lang, shard
), binned AS (
  SELECT lang, shard, n_tokens,
    (CAST(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
       ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens) // 512 AS bin_id
  FROM pdocs
)
SELECT lang, shard, bin_id, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
  round(CAST(sum(n_tokens) AS DOUBLE) / 512, 6) AS utilization
FROM binned
GROUP BY lang, shard, bin_id
ORDER BY lang, shard, bin_id"""
  }

  // ------------------------------------------------------ BPE fertility
  /** Tokenizer-quality readout under the TRAINED vocabulary — per-
    * language fertility (subwords per word) and compression (chars per
    * subword), the standard tokenizer evaluation (Rust et al. 2021's
    * fertility metric, public): a vocabulary trained mostly on one
    * language tokenizes the others into more, shorter pieces, and this
    * face is where that shows up. Ratios are integer ppm (`div`, no
    * doubles), so both engines agree bit-for-bit. Same broadcast
    * word→subword-count lookup as [[seqPackBpe]] — the corpus is
    * scanned once and never re-tokenized by the model; output is one
    * row per language. */
  private val bpeFertility: Q = (s, d) => {
    val wordSyms = bpeTrained(s, d)._2
      .select(col("word"),
        size(split(trim(col("symseq")), " ")).cast("long").as("n_syms"))
    Tables.documents(s, d)
      .select(col("lang"), explode(toks).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(wordSyms), "word")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum("n_syms").as("n_subwords"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_subwords"), col("n_chars"),
        expr("n_subwords * 1000000 div n_words").as("fertility_ppm"),
        expr("n_chars * 1000000 div n_subwords").as("chars_per_subword_ppm"))
      .orderBy("lang")
  }
  private lazy val bpeFertilitySql =
    s"""$bpeChainSql, wf AS (
  SELECT word, CAST(len(string_split(trim(symseq), ' ')) AS BIGINT) AS n_syms
  FROM s$BpeRounds
), fwords AS (
  SELECT lang, word FROM (
    SELECT lang, unnest(string_split(lower(text), ' ')) AS word
    FROM documents)
  WHERE word <> ''
), fj AS (
  SELECT lang, n_syms, CAST(length(word) AS BIGINT) AS wlen
  FROM fwords JOIN wf USING (word)
)
SELECT lang, count(*) AS n_words,
  CAST(sum(n_syms) AS BIGINT) AS n_subwords,
  CAST(sum(wlen) AS BIGINT) AS n_chars,
  CAST(sum(n_syms) * 1000000 // count(*) AS BIGINT) AS fertility_ppm,
  CAST(sum(wlen) * 1000000 // sum(n_syms) AS BIGINT) AS chars_per_subword_ppm
FROM fj GROUP BY lang ORDER BY lang"""

  // -------------------------------------------------------- shard plan
  /** Token-balanced output-shard planning — the step that turns a
    * curated corpus into the N physical training shards the writer job
    * emits: docs are ranked globally by token count (desc, doc_id
    * tie-break) and dealt round-robin over [[NShards]], the classic
    * sorted-greedy balancing whose per-shard excess over the ideal is
    * bounded by one max-document regardless of the size distribution
    * (contrast hash-sharding, whose imbalance grows with doc-length
    * variance — [[seqPack]]'s shards balance COUNTS, not tokens).
    * The rank is [[graft.operators.GlobalRank.withRank]] — two-phase
    * range partition, no single-task corpus sort, no unpartitioned
    * Window — and the readout is per-shard docs, tokens, and absolute
    * deviation from the exact ideal in ppm (integer `div`: token
    * totals at 100 TB can pass 2^53 where double division stops being
    * exact). At scale: one corpus scan + the rank's range exchange,
    * then an N-row aggregate. Oracle: window row_number mirror. */
  private val NShards = 16L
  private val shardPlan: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val ranked = graft.operators.GlobalRank.withRank(docs,
      Seq(col("n_tokens").desc, col("doc_id").asc), "rk")
    val per = CachePool.cached(ranked
      .withColumn("shard", expr(s"(rk - 1) % $NShards").cast("int"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens")))
    val tot = per.agg(sum("shard_tokens").as("t"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("shard_tokens"),
        expr(s"abs(shard_tokens * $NShards - t) * 1000000 div t")
          .as("imbalance_ppm"))
      .orderBy("shard")
  }
  private val shardPlanSql =
    s"""WITH sdocs AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), ranked AS (
  SELECT n_tokens,
    row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rk
  FROM sdocs
), per AS (
  SELECT CAST((rk - 1) % $NShards AS INT) AS shard, count(*) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
  FROM ranked GROUP BY 1
), stot AS (SELECT CAST(sum(shard_tokens) AS BIGINT) AS t FROM per)
SELECT shard, n_docs, shard_tokens,
  CAST(abs(shard_tokens * $NShards - t) * 1000000 // t AS BIGINT)
    AS imbalance_ppm
FROM per, stot ORDER BY shard"""

  // -------------------------------------------------------- shard write
  /** The shard plan EXECUTED (VERDICT r11 #7: `text_shard_plan` plans
    * token-balanced shards, `text_shuffle_shards` writes count-balanced
    * ones — unify): the planned GlobalRank round-robin assignment is
    * materialized with `write.partitionBy(shard)` into a real
    * partitioned parquet store (the training-shard layout a reader
    * job consumes shard-by-shard), and the emitted manifest is
    * computed FROM THE WRITTEN STORE — per-shard doc/token counts,
    * the plan's imbalance_ppm carried through, and a content checksum
    * (sum of salted 60-bit doc hashes mod 2⁶¹ — order-free, exact
    * int64 on both engines, the `text_shuffle_shards` discipline), so
    * a dropped or duplicated row between plan and disk flips the hash
    * match. All aggregates are O(1) per-group state; at 100 TB the
    * cost is the rank's range exchange + one partitioned write + one
    * manifest scan of the written store. */
  private val shardWrite: Q = (s, d) => {
    val path = s.sessionState.conf.warehousePath +
      "/graft_shards_" + (d.hashCode & 0x7fffffff)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val ranked = graft.operators.GlobalRank.withRank(docs,
      Seq(col("n_tokens").desc, col("doc_id").asc), "rk")
    ranked.withColumn("shard", expr(s"(rk - 1) % $NShards").cast("int"))
      .select(col("shard"), col("doc_id"), col("n_tokens"), col("text"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val per = CachePool.cached(s.read.parquet(path)
      .groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("shard_tokens"),
        (sum(DupCorpus.h60(concat(lit("pos:"),
          col("doc_id").cast("string"))).cast("decimal(38,0)"))
          % lit(2305843009213693952L)).cast("long").as("checksum")))
    val tot = per.agg(sum("shard_tokens").as("t"))
    per.crossJoin(broadcast(tot))
      .select(col("shard").cast("int").as("shard"), col("n_docs"),
        col("shard_tokens"),
        expr(s"abs(shard_tokens * $NShards - t) * 1000000 div t")
          .as("imbalance_ppm"),
        col("checksum"))
      .orderBy("shard")
  }
  private val shardWriteSql = {
    val hp = OraclePipeline.h60Sql("'pos:' || CAST(doc_id AS VARCHAR)")
    s"""WITH sdocs AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), ranked AS (
  SELECT doc_id, n_tokens,
    row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rk
  FROM sdocs
), per AS (
  SELECT CAST((rk - 1) % $NShards AS INT) AS shard, count(*) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
    CAST(sum(CAST($hp AS HUGEINT)) % 2305843009213693952 AS BIGINT)
      AS checksum
  FROM ranked GROUP BY 1
), stot AS (SELECT CAST(sum(shard_tokens) AS BIGINT) AS t FROM per)
SELECT shard, n_docs, shard_tokens,
  CAST(abs(shard_tokens * $NShards - t) * 1000000 // t AS BIGINT)
    AS imbalance_ppm,
  checksum
FROM per, stot ORDER BY shard"""
  }

  // -------------------------------------------------------- sample split
  /** Deterministic train/val/test split (80/10/10) by content-free id
    * hash — the split op a training pipeline needs at 100 TB: no RNG
    * (reruns and backfills land every doc in the same split), no
    * sampling shuffle (the split is a projected column, computed at
    * scan), and salting the hash input ("split:" prefix) decorrelates
    * it from every other doc_id-derived hash in the pipeline. Emits
    * per-(split, lang) accounting. */
  private val sampleSplit: Q = (s, d) => {
    val bucket = pmod(DupCorpus.h60(concat(lit("split:"),
      col("doc_id").cast("string"))), lit(100L))
    Tables.documents(s, d)
      .select(col("lang"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
          .as("split"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .orderBy("split", "lang")
  }
  private val sampleSplitSql = {
    val h = OraclePipeline.h60Sql("'split:' || CAST(doc_id AS VARCHAR)")
    s"""WITH docs AS (
  SELECT lang,
    CASE WHEN $h % 100 < 80 THEN 'train'
         WHEN $h % 100 < 90 THEN 'val' ELSE 'test' END AS split,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT split, lang, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM docs GROUP BY split, lang ORDER BY split, lang"""
  }

  // ------------------------------------------------------- decontaminate
  /** Benchmark decontamination — the prep step every LLM training run
    * needs: flag corpus documents sharing any token 8-gram with a held
    * eval set (here a deterministic doc_id slice standing in for the
    * benchmark suite). Both sides hash their 8-grams to 60-bit ints
    * (same posexplode + window-lead build as [[fingerprint]], kept
    * codegen'd); the eval side is distinct per (gram, eval_doc) and
    * BROADCAST — benchmark suites are MBs while the corpus is TBs, so
    * the contamination check is a map-side hash probe per corpus gram,
    * no corpus shuffle before the per-doc count. Output: contaminated
    * doc → how many distinct grams leaked and from how many eval docs. */
  private val GramLen = 8
  /** Per-doc 8-gram hashes via the codegen'd [[
    * graft.functions.TokenStats.gramH60]] kernel (bit-identical h60 of
    * the space-joined gram) riding the scan — the relational build
    * (posexplode + 7 window leads) paid a full exchange + sort of the
    * exploded token stream per side just to line up the leads
    * (round 19; guide §2.4). */
  private def grams8(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      explode(call_function("graft_gram_h60", toks, lit(GramLen))).as("gh"))
  /** Core contamination check over any (doc_id, text) relation — the
    * registered query binds it to `documents` with a doc_id-slice eval
    * set; specs bind it to planted fixtures. */
  def contamination(docs: DataFrame, isEval: Column): DataFrame = {
    graft.functions.VectorExpressions.register(docs.sparkSession)
    val evalGrams = grams8(docs.filter(isEval))
      .select(col("doc_id").as("eval_id"), col("gh")).distinct()
    grams8(docs.filter(!isEval))
      .join(broadcast(evalGrams), "gh")
      .groupBy("doc_id")
      .agg(count_distinct(col("gh")).as("n_shared_grams"),
        count_distinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("doc_id")
  }
  private val decontaminate: Q = (s, d) =>
    contamination(Tables.documents(s, d), col("doc_id") % 23 === 0)
  private val decontaminateSql = {
    val t = ToksSql
    val gram = (0 until GramLen).map(j => s"$t[i+$j]").mkString(" || ' ' || ")
    s"""WITH g AS (
  SELECT doc_id, unnest(
    CASE WHEN len($t) < $GramLen THEN CAST([] AS BIGINT[])
         ELSE list_transform(range(1, len($t) - ${GramLen - 2}),
                             i -> ${OraclePipeline.h60Sql(gram)})
    END) AS gh
  FROM documents
), ev AS (
  SELECT DISTINCT doc_id AS eval_id, gh FROM g WHERE doc_id % 23 = 0
), corpus AS (
  SELECT doc_id, gh FROM g WHERE doc_id % 23 <> 0
)
SELECT c.doc_id,
  count(DISTINCT c.gh) AS n_shared_grams,
  count(DISTINCT e.eval_id) AS n_eval_docs
FROM corpus c JOIN ev e USING (gh)
GROUP BY c.doc_id ORDER BY c.doc_id"""
  }

  // --------------------------------------------------------- ngram top-k
  /** Per-language top-3 bigrams by corpus frequency — the n-gram
    * statistics pass (vocabulary drift, boilerplate detection) a corpus
    * pipeline runs per snapshot. The bigram build is the codegen'd
    * arrays_zip-of-shifted-slices from [[collocations]] riding the
    * scan (round 19 — the posexplode + window-lead build paid an
    * exchange + sort of the exploded token stream per face), then ONE
    * shuffle on (lang, bigram) with map-side partial counts — the
    * aggregate sees |distinct bigrams| rows, not |tokens| — and a
    * tiny per-language top-k window over the counted relation. */
  private def langBigrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), toks.as("tk"))
      .select(col("lang"), explode(arrays_zip(
        expr("slice(tk, 1, size(tk) - 1)"),
        expr("slice(tk, 2, size(tk) - 1)")).cast(
        "array<struct<a:string,b:string>>")).as("p"))
      .select(col("lang"), concat_ws(" ", col("p.a"), col("p.b")).as("bigram"))
  private val ngramTopk: Q = (s, d) => {
    val counts = langBigrams(s, d)
      .groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
    val rank = Window.partitionBy("lang").orderBy(col("n").desc, col("bigram"))
    counts.withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= 3)
      .orderBy("lang", "rank")
  }
  private val ngramTopkSql = {
    val t = ToksSql
    s"""WITH b AS (
  SELECT lang, unnest(
    CASE WHEN len($t) < 2 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(range(1, len($t)), i -> $t[i] || ' ' || $t[i+1])
    END) AS bigram
  FROM documents
), c AS (
  SELECT lang, bigram, count(*) AS n FROM b GROUP BY lang, bigram
)
SELECT lang, bigram, n, CAST(row_number() OVER w AS INT) AS rank
FROM c
WINDOW w AS (PARTITION BY lang ORDER BY n DESC, bigram)
QUALIFY row_number() OVER w <= 3
ORDER BY lang, rank"""
  }

  // ------------------------------------------------- ngram top-k (heap)
  /** Same result as [[ngramTopk]] through the typed-Aggregator path:
    * per-language top-3 via [[graft.operators.TopKAgg]] — a bounded
    * k-element buffer through ObjectHashAggregate instead of a
    * row_number window. The window form sorts every language's FULL
    * bigram distribution before discarding all but 3 rows; this plan's
    * map-side partials are already ≤ k per language, so the final
    * shuffle ships |langs|·k rows. Registered against the IDENTICAL
    * oracle SQL as the window form — two physical strategies, one
    * semantics, both hash-checked (parity also spec-pinned with a
    * no-Window plan assertion). */
  private val ngramTopkAgg: Q = (s, d) => {
    import org.apache.spark.sql.functions.udaf
    val counts = langBigrams(s, d)
      .groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
    val top3 = udaf(new graft.operators.TopKAgg(3))
    counts.groupBy("lang").agg(top3(col("bigram"), col("n")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "kv")))
      .select(col("lang"), col("kv._1").as("bigram"), col("kv._2").as("n"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("lang", "rank")
  }

  // ----------------------------------------------------- vocabulary build
  /** Corpus vocabulary with document-frequency pruning — the tokenizer
    * -training / feature-hashing prerequisite: per-token corpus
    * frequency (tf) and document frequency (df), min-df ≥ 5 floor,
    * top-50 by (tf desc, token asc). ONE shuffle on token carries both
    * aggregates (count is map-side partial; the distinct-doc count is
    * Spark's standard two-phase distinct aggregate). The global top-50
    * is orderBy+limit — Catalyst plans TakeOrderedAndProject, a
    * distributed per-partition top-k + driver merge of 50-row heaps,
    * NOT a single-partition window sort, so a 100 TB vocabulary never
    * funnels through one task; the rank column is then a window over
    * the surviving 50 rows only. */
  // ------------------------------------------------- vocab coverage
  /** Vocabulary coverage curve — the tokenizer-sizing readout: what
    * fraction of all token OCCURRENCES does a top-k vocabulary cover,
    * for k = 100 / 1 000 / 10 000. The Zipf head means coverage
    * saturates fast; this curve is how a vocab budget (and the OOV
    * rate the [[oovRate]] eval then measures) gets chosen. The global
    * frequency rank uses the distributed two-phase machinery
    * (range-partition on (tf desc, token) → per-partition row_number →
    * broadcast partition-count offsets — the [[surprisal]] vocabulary
    * rank, never a single-task sort); coverage is then one
    * conditional-sum aggregate against the ≤3-row k dimension. Exact
    * integers to the final permille division. */
  private val CoverageKs = Seq(100, 1000, 10000)
  private val vocabCoverage: Q = (s, d) => {
    import s.implicits._
    val counts = Tables.documents(s, d)
      .select(explode(toks).as("token"))
      .groupBy("token").agg(count(lit(1)).as("tf"))
    // cached for the same two reasons as GlobalRank.rankCore: the range
    // sampler otherwise executes the input twice, and the two branches
    // below (local ranks + per-pid counts) must see ONE materialization
    // of the partitioning (RangePartitioner's sample seed is rdd-id-
    // derived, so re-materialization can shift boundaries)
    val parted = graft.pipeline.CachePool.cached(
      counts
        .repartitionByRange(
          s.sessionState.conf.numShufflePartitions, col("tf").desc, col("token"))
        .withColumn("pid", spark_partition_id()))
    val wP = Window.partitionBy("pid")
      .orderBy(col("tf").desc, col("token"))
    val local = parted.withColumn("rn", row_number().over(wP).cast("long"))
    val wOff = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parted.groupBy("pid").agg(count(lit(1)).as("pc"))
      .select(col("pid"), coalesce(sum("pc").over(wOff), lit(0L)).as("off"))
    val ranked = local.join(broadcast(offs), "pid")
      .select(col("tf"), (col("rn") + col("off")).as("rank"))
    val tot = broadcast(ranked.agg(sum("tf").as("n_tok"),
      count(lit(1)).as("n_types")))
    val ks = broadcast(CoverageKs.toDF("k"))
    ranked.crossJoin(ks)
      .groupBy("k")
      .agg(sum(when(col("rank") <= col("k"), col("tf"))
        .otherwise(0L)).as("covered"))
      .crossJoin(tot)
      .select(col("k"), col("covered"), col("n_tok"), col("n_types"),
        expr("(1000 * covered) div n_tok").as("coverage_permille"))
      .orderBy("k")
  }
  private val vocabCoverageSql =
    s"""WITH c AS (
  SELECT token, count(*) AS tf FROM (
    SELECT unnest($ToksSql) AS token FROM documents
  ) GROUP BY token
), r AS (
  SELECT tf, CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT)
    AS rank
  FROM c
), tot AS (
  SELECT CAST(sum(tf) AS BIGINT) AS n_tok, count(*) AS n_types FROM r
), ks AS (SELECT unnest([${CoverageKs.mkString(", ")}]) AS k)
SELECT CAST(ks.k AS INT) AS k,
  CAST(sum(CASE WHEN r.rank <= ks.k THEN tf ELSE 0 END) AS BIGINT)
    AS covered,
  tot.n_tok, tot.n_types,
  (1000 * CAST(sum(CASE WHEN r.rank <= ks.k THEN tf ELSE 0 END)
    AS BIGINT)) // tot.n_tok AS coverage_permille
FROM r, ks, tot
GROUP BY ks.k, tot.n_tok, tot.n_types ORDER BY k"""

  // ---------------------------------------------------- collocations
  /** Collocation extraction — the keyphrase-mining primitive: adjacent
    * token pairs ranked by LIFT, n·c(ab) / (c(a)·c(b)), which orders
    * IDENTICALLY to PMI (log is monotone) while staying
    * transcendental-free: the ranking key is one IEEE division on
    * exact integer counts, so the cross-engine order can't flap. One
    * tokenize pass feeds both the unigram and the adjacent-bigram
    * counts (posexplode + a self-join on (doc, pos+1) — per-doc
    * position join, never a corpus-wide shuffle explosion); a minimum
    * pair count gates noise exactly as a keyphrase extractor would.
    * Top 20 via TakeOrderedAndProject. */
  private val collocations: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val uni = docs.select(explode(toks).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c1"))
      .localCheckpoint() // n_tok and both dims of the pair join read it
    val n = broadcast(uni.agg(sum("c1").as("n_tok")))
    // adjacent pairs as a zip of the array with its own 1-shifted
    // slice — no positional self-join, the pair relation falls out of
    // the scan
    val big = docs
      .select(col("doc_id"), toks.as("tk"))
      .select(explode(arrays_zip(
        expr("slice(tk, 1, size(tk) - 1)"),
        expr("slice(tk, 2, size(tk) - 1)")).cast(
        "array<struct<a:string,b:string>>")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 25)
    big
      .join(uni.toDF("a", "ca"), "a")
      .join(uni.toDF("b", "cb"), "b")
      .crossJoin(n)
      .select(col("a"), col("b"), col("cab"),
        round((col("n_tok") * col("cab")).cast("double")
          / (col("ca") * col("cb")), 6).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b")).limit(20)
  }
  private val collocationsSql =
    s"""WITH tk AS (
  SELECT doc_id, $ToksSql AS toks, len($ToksSql) AS n FROM documents
), uni AS (
  SELECT t, count(*) AS c1 FROM (
    SELECT unnest(toks) AS t FROM tk
  ) GROUP BY t
), nt AS (SELECT CAST(sum(c1) AS BIGINT) AS n_tok FROM uni),
big AS (
  SELECT toks[CAST(pos + 1 AS INT)] AS a,
    toks[CAST(pos + 2 AS INT)] AS b, count(*) AS cab
  FROM (
    SELECT toks, unnest(range(0, greatest(n - 1, 0))) AS pos FROM tk
  ) GROUP BY 1, 2 HAVING count(*) >= 25
)
SELECT a, b, cab,
  round(CAST(nt.n_tok * cab AS DOUBLE) / (ua.c1 * ub.c1), 6) AS lift
FROM big JOIN uni ua ON ua.t = a JOIN uni ub ON ub.t = b, nt
ORDER BY lift DESC, a, b LIMIT 20"""

  // ------------------------------------------------------ burstiness
  /** Token burstiness — the variance-to-mean (Fano) ratio of each
    * token's per-document counts: function words scatter evenly
    * (VMR ≈ 1, Poisson-like) while topical words CLUMP (VMR ≫ 1,
    * all occurrences in few docs) — the dispersion signal keyword
    * extractors and stopword inducers split on, complementing
    * [[tfidf]]'s df-only view with the within-doc clumping. Exactly
    * integer until the single closed-form division: per token the
    * exact (Σx, Σx², df) over one tokenize pass, n docs as a 1-row
    * broadcast, VMR = (n·Σx² − (Σx)²) / (n·Σx) — overflow-safe to
    * ~10⁹ occurrences of one token. Top 20 by (VMR, token) via the
    * rank-free TakeOrderedAndProject path. */
  private val burstiness: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val nd = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    docs.select(col("doc_id"), explode(toks).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("x"))
      .groupBy("token")
      .agg(sum("x").as("tf"), sum(col("x") * col("x")).as("sq"),
        count(lit(1)).as("df"))
      .filter(col("df") >= 5)
      .crossJoin(nd)
      .select(col("token"), col("tf"), col("df"),
        round((col("n_docs") * col("sq") - col("tf") * col("tf"))
          .cast("double") / (col("n_docs") * col("tf")), 6)
          .as("burstiness"))
      .orderBy(col("burstiness").desc, col("token")).limit(20)
  }
  private val burstinessSql =
    s"""WITH nd AS (SELECT count(*) AS n_docs FROM documents),
dx AS (
  SELECT doc_id, token, count(*) AS x FROM (
    SELECT doc_id, unnest($ToksSql) AS token FROM documents
  ) GROUP BY doc_id, token
), t AS (
  SELECT token, CAST(sum(x) AS BIGINT) AS tf,
    CAST(sum(x * x) AS BIGINT) AS sq,
    count(*) AS df
  FROM dx GROUP BY token
)
SELECT token, tf, df,
  round(CAST(n_docs * sq - tf * tf AS DOUBLE) / (n_docs * tf), 6)
    AS burstiness
FROM t, nd WHERE df >= 5
ORDER BY burstiness DESC, token LIMIT 20"""

  // ------------------------------------------------------ Heaps curve
  /** Vocabulary-growth (Heaps-law) curve — the corpus-planning readout
    * behind "how much NEW vocabulary does the next slice of data buy":
    * docs are split into 16 equal doc_id buckets (the ingestion-order
    * proxy), each token is charged to the bucket where it FIRST
    * appears (one min-aggregate over the tokenized corpus — no
    * per-prefix rescans), and the running sums give the (cumulative
    * tokens, cumulative types) pairs whose log-log slope is Heaps' β.
    * Sublinear growth here is what justifies [[vocab]]'s df-pruning
    * and the surprisal table's size at 100×. All exact integers; the
    * only windows ride the 16-row bucket spine (constant — never
    * data-sized, per the two-phase-rank house rule). */
  private val heapsCurve: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val mx = broadcast(docs.agg((max("doc_id") + 1).as("n_ids")))
    val tk = docs.crossJoin(mx)
      .select(expr("(doc_id * 16) div n_ids").as("bucket"),
        explode(toks).as("token"))
    val newTypes = tk.groupBy("token").agg(min("bucket").as("first_b"))
      .groupBy(col("first_b").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val tokCnt = tk.groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokCnt.join(newTypes, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("cum_types", sum("new_types").over(w))
      .orderBy("bucket")
  }
  private val heapsCurveSql =
    s"""WITH mx AS (SELECT max(doc_id) + 1 AS n_ids FROM documents),
tk AS (
  SELECT (doc_id * 16) // n_ids AS bucket, unnest($ToksSql) AS token
  FROM documents, mx
), nt AS (
  SELECT first_b AS bucket, count(*) AS new_types FROM (
    SELECT token, min(bucket) AS first_b FROM tk GROUP BY token
  ) GROUP BY first_b
), tc AS (
  SELECT bucket, count(*) AS n_tokens FROM tk GROUP BY bucket
)
SELECT tc.bucket AS bucket, tc.n_tokens,
  coalesce(nt.new_types, 0) AS new_types,
  CAST(sum(tc.n_tokens) OVER w AS BIGINT) AS cum_tokens,
  CAST(sum(coalesce(nt.new_types, 0)) OVER w AS BIGINT) AS cum_types
FROM tc LEFT JOIN nt ON tc.bucket = nt.bucket
WINDOW w AS (ORDER BY tc.bucket
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY tc.bucket"""

  private val vocab: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      .filter(col("df") >= 5)
    val top = counts.orderBy(col("tf").desc, col("token")).limit(50)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("tf").desc, col("token"))))
      .select("rank", "token", "tf", "df")
      .orderBy("rank") // pin output order (collapses into the rank sort)
  }
  private val vocabSql =
    s"""WITH t AS (
  SELECT doc_id, unnest($ToksSql) AS token FROM documents
), c AS (
  SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
  FROM t GROUP BY token
)
SELECT CAST(row_number() OVER w AS INT) AS rank, token, tf, df
FROM c WHERE df >= 5
WINDOW w AS (ORDER BY tf DESC, token)
QUALIFY row_number() OVER w <= 50
ORDER BY rank"""

  // ------------------------------------------------------ OOV rate
  /** Vocabulary-coverage eval — the OOV-rate readout a tokenizer /
    * vocabulary decision ships with: against the df ≥ 5 pruned
    * vocabulary (the [[vocab]] criterion, unlimited — not the top-50
    * report slice), what fraction of each language's token
    * OCCURRENCES fall outside it. High OOV = the vocab underserves
    * that language (the multilingual-fairness check). Counts exact;
    * the rate ships as integer permille. Scale: the vocabulary
    * relation is Heaps-law-bounded (≪ corpus) and the membership
    * probe is one equi-join on the token — the same shape a real
    * subword-vocab coverage pass takes. */
  private val oovRate: Q = (s, d) => {
    val inVocab = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy("token").agg(count_distinct(col("doc_id")).as("df"))
      .filter(col("df") >= 5)
      .select(col("token"), lit(true).as("iv"))
    Tables.documents(s, d)
      .select(col("lang"), explode(toks).as("token"))
      .join(inVocab, Seq("token"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("lang"), col("n_tokens"), col("n_oov"),
        expr("(n_oov * 1000) div n_tokens").as("oov_permille"))
      .orderBy("lang")
  }
  private val oovRateSql =
    s"""WITH t AS (
  SELECT doc_id, lang, unnest($ToksSql) AS token FROM documents
), v AS (
  SELECT token FROM (
    SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY token
  ) WHERE df >= 5
), j AS (
  SELECT t.lang, CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
  FROM t LEFT JOIN v ON t.token = v.token
)
SELECT lang, count(*) AS n_tokens, CAST(sum(oov) AS BIGINT) AS n_oov,
  CAST((sum(oov) * 1000) // count(*) AS BIGINT) AS oov_permille
FROM j GROUP BY lang ORDER BY lang"""

  // ------------------------------------------- language confusion
  /** Language-ID confusion matrix — [[langid]]'s eval face: predicted
    * vs actual label cells with exact counts, the error-analysis
    * artifact behind every classifier deployment (which languages leak
    * into 'und'? which pairs confuse?). Pure composition: the langid
    * prediction relation re-aggregated to the (actual, predicted)
    * grid — ≤ (|langs|+1)² rows, one extra map-side-combinable
    * aggregate over the per-doc predictions. */
  private val langConfusion: Q = (s, d) =>
    langid(s, d)
      .groupBy("actual_lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("actual_lang", "predicted_lang")
  private lazy val langConfusionSql =
    s"""SELECT actual_lang, predicted_lang, count(*) AS n_docs
FROM ($langidSql)
GROUP BY actual_lang, predicted_lang
ORDER BY actual_lang, predicted_lang"""

  // ------------------------------------------------- tf-idf top terms
  /** Per-document top-3 distinctive terms by tf·idf — the keyword /
    * topic-signal pass a corpus pipeline runs for routing and quality
    * filters. One explode feeds both aggregates: per-(doc, token) tf
    * and per-token df; they meet in an equi-join on token (the df side
    * is |vocabulary|, bounded, and shrinks further at higher corpus
    * scale relative to the tf side). idf = ln(N/df) with N a 1-row
    * broadcast count. The per-doc rank orders by the INTEGER triple
    * (tf desc, df asc, token asc) — monotone in tf/df like tf·idf but
    * immune to cross-engine double-log ulp skew; the reported tfidf
    * double is display-only, rounded to 6. */
  private val tfidfTop: Q = (s, d) => {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // df derives from tf — each (doc, token) row IS one document
    // containing the token — so the corpus is tokenized ONCE; the
    // second aggregate shuffles the (much smaller) tf relation, not a
    // second full scan of the text column
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "token").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df"), col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "token", "tf", "df", "tfidf")
      .orderBy("doc_id", "rank")
  }
  private val tfidfTopSql =
    s"""WITH t AS (
  SELECT doc_id, unnest($ToksSql) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM t GROUP BY doc_id, token
), df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY token
), n AS (
  SELECT count(*) AS n_docs FROM documents
)
SELECT doc_id, CAST(row_number() OVER w AS INT) AS rank, token, tf, df,
  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
FROM tf JOIN df USING (token) CROSS JOIN n
WINDOW w AS (PARTITION BY doc_id ORDER BY tf DESC, df, token)
QUALIFY row_number() OVER w <= 3
ORDER BY doc_id, rank"""

  // --------------------------------------------------- stratified sample
  /** Deterministic per-language stratified sample — the corpus-mix
    * rebalancing step (upsample scarce languages, downsample dominant
    * ones) done the 100 TB way: membership is a salted content-free
    * hash of doc_id against a per-stratum keep-rate, so it's a
    * projected column computed at scan (no RNG, no sampling shuffle,
    * rerun-stable) and the "strat:" salt decorrelates it from the
    * train/val/test split hash. Emits per-language accounting:
    * population, kept count, and kept char volume. */
  private val StratRates: Seq[(String, Int)] = // keep-rate per 1000
    Seq("en" -> 300, "es" -> 800, "de" -> 800, "fr" -> 800, "zh" -> 500)
  private val stratifiedSample: Q = (s, d) => {
    val bucket = pmod(DupCorpus.h60(concat(lit("strat:"),
      col("doc_id").cast("string"))), lit(1000L))
    val rate = StratRates.foldLeft(lit(100)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc) }
    Tables.documents(s, d)
      .select(col("lang"), col("n_chars"),
        (bucket < rate).cast("int").as("kept"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("kept").as("n_kept"),
        sum(when(col("kept") === 1, col("n_chars")).otherwise(lit(0L)))
          .as("kept_chars"))
      .orderBy("lang")
  }
  private val stratifiedSampleSql = {
    val h = graft.oracle.OraclePipeline.h60Sql("'strat:' || CAST(doc_id AS VARCHAR)")
    val rate = StratRates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", " ELSE 100 END")
    s"""WITH docs AS (
  SELECT lang, n_chars,
    CASE WHEN $h % 1000 < $rate THEN 1 ELSE 0 END AS kept
  FROM documents
)
SELECT lang, count(*) AS n_docs, CAST(sum(kept) AS BIGINT) AS n_kept,
  CAST(sum(CASE WHEN kept = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM docs GROUP BY lang ORDER BY lang"""
  }

  // -------------------------------------------------- repetition filter
  /** Gopher-style repetition gating (Rae et al. 2021 §A1.1: excess
    * single-token and repeated-n-gram mass marks boilerplate/spam):
    * per-document top-token frequency and duplicate-bigram count, each
    * computed by a one-pass codegen'd kernel
    * ([[graft.functions.TokenStats]]) so the gate is a pure projection
    * riding the scan — no tokenized-corpus shuffle, no O(n²)
    * interpreted HOF. The keep gate compares in integer space
    * (`top_freq·8 ≤ n_tokens`, `dup_bigrams·16 ≤ n_bigrams`), so no
    * cross-engine double rounding can flap it. */
  private val repetitionFilter: Q = (s, d) => {
    graft.functions.VectorExpressions.register(s)
    val nTok = size(toks).cast("long")
    val topFreq = call_function("graft_top_freq", toks).cast("long")
    val dupBig = call_function("graft_dup_bigrams", toks).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), nTok.as("n_tokens"), topFreq.as("top_freq"),
        dupBig.as("dup_bigram_cnt"),
        (topFreq * 8 <= nTok && dupBig * 16 <= nTok - 1).as("keep"))
      .orderBy("doc_id")
  }
  private val repetitionFilterSql =
    s"""WITH tok AS (
  SELECT doc_id, $ToksSql AS toks FROM documents
), freq AS (
  SELECT doc_id, max(c) AS top_freq FROM (
    SELECT doc_id, t, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY 1, 2
  ) GROUP BY 1
), big AS (
  SELECT doc_id, len(toks) AS n_tokens,
    (len(toks) - 1) - len(list_distinct(
      list_transform(list_zip(toks[1:-2], toks[2:-1]),
                     p -> p[1] || ' ' || p[2]))) AS dup_bigram_cnt
  FROM tok
)
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
  CAST(f.top_freq AS BIGINT) AS top_freq,
  CAST(b.dup_bigram_cnt AS BIGINT) AS dup_bigram_cnt,
  (f.top_freq * 8 <= b.n_tokens AND b.dup_bigram_cnt * 16 <= b.n_tokens - 1)
    AS keep
FROM big b JOIN freq f USING (doc_id) ORDER BY doc_id"""

  // --------------------------------------------------------- PII scrub
  /** PII redaction over the corpus — the compliance pass every
    * training-data pipeline runs before packing. The synthetic corpus
    * carries no PII, so (partsupp pattern, `queries/PartSuppQueries`)
    * PII-shaped tokens are DERIVED deterministically from `doc_id` and
    * appended identically in both engines; the scrub then redacts them
    * back out. Regexes stay inside the Java∩RE2 dialect subset (no
    * backreferences/lookaround) so Spark and DuckDB agree; equivalence
    * is pinned end-to-end by md5 of the scrubbed text. The whole query
    * is a pure projection riding the scan — counts via `regexp_count`,
    * redaction via chained `regexp_replace` — zero shuffles, which is
    * the only shape that survives scrubbing a 100 TB corpus. */
  private val PiiEmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PiiPhoneRe = "\\+1-555-[0-9]{4}"
  private val PiiIpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private val piiScrub: Q = (s, d) => {
    val id = col("doc_id")
    def str(c: Column): Column = c.cast("string")
    val raw = concat(col("text"),
      when(id % 3 === 0, concat(lit(" contact user"), str(id),
        lit("@example"), str(id % 5), lit(".com"))).otherwise(lit("")),
      when(id % 4 === 0, concat(lit(" call +1-555-"),
        lpad(str(id % 10000), 4, "0"))).otherwise(lit("")),
      when(id % 5 === 0, concat(lit(" from 10."), str(id % 256), lit("."),
        str((id * 7) % 256), lit("."), str((id * 13) % 256)))
        .otherwise(lit("")))
    val clean = regexp_replace(regexp_replace(regexp_replace(col("raw"),
      PiiEmailRe, "[EMAIL]"), PiiPhoneRe, "[PHONE]"), PiiIpRe, "[IP]")
    Tables.documents(s, d).select(id, raw.as("raw"))
      .select(col("doc_id"),
        regexp_count(col("raw"), lit(PiiEmailRe)).cast("long").as("n_emails"),
        regexp_count(col("raw"), lit(PiiPhoneRe)).cast("long").as("n_phones"),
        regexp_count(col("raw"), lit(PiiIpRe)).cast("long").as("n_ips"),
        length(clean).cast("long").as("clean_len"),
        md5(clean).as("clean_md5"))
      .orderBy("doc_id")
  }
  private val piiScrubSql = {
    // single-backslash escapes: DuckDB regular strings pass them through
    val (em, ph, ip) =
      ("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "\\+1-555-[0-9]{4}",
        "([0-9]{1,3}\\.){3}[0-9]{1,3}")
    s"""WITH raw AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
            || '@example' || CAST(doc_id % 5 AS VARCHAR) || '.com' ELSE '' END
    || CASE WHEN doc_id % 4 = 0 THEN ' call +1-555-'
            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
            || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
            || '.' || CAST((doc_id * 13) % 256 AS VARCHAR) ELSE '' END
    AS raw FROM documents
), scrub AS (
  SELECT doc_id, raw,
    regexp_replace(regexp_replace(regexp_replace(raw,
      '$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g'), '$ip', '[IP]', 'g')
      AS clean
  FROM raw
)
SELECT doc_id,
  CAST(len(regexp_extract_all(raw, '$em')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(raw, '$ph')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(raw, '$ip')) AS BIGINT) AS n_ips,
  CAST(length(clean) AS BIGINT) AS clean_len,
  md5(clean) AS clean_md5
FROM scrub ORDER BY doc_id"""
  }

  // -------------------------------------------------------- domain mix
  /** Deterministic domain-mixture resampling — reweighting sources to
    * target proportions (the "data mixing" stage of corpus assembly:
    * upsample high-quality domains, downsample bulk crawl). Target
    * multiplier per source group: 0.5× / 1× / 1.5× / 2.5×. Whole
    * copies come from `explode(sequence(...))` riding the scan;
    * the fractional copy is a salted-hash gate (same h60 discipline as
    * `text_sample_split` — no RNG, so re-runs and both engines agree
    * exactly). Upsampling-by-explode at the scan is the 100 TB shape:
    * no shuffle, output size = Σ multiplier·|domain|, and every copy
    * carries `copy_id` so downstream packing can salt by it. */
  private val domainMix: Q = (s, d) => {
    val srcNum = regexp_extract(col("source"), "([0-9]+)", 1).cast("int")
    val grp = pmod(srcNum, lit(4))
    val whole = when(grp === 0, 0).when(grp === 3, 2).otherwise(1)
    val frac = when(grp === 1, 0).otherwise(500)
    val gate = (pmod(DupCorpus.h60(concat(lit("mix:"),
      col("doc_id").cast("string"))), lit(1000L)) < frac).cast("int")
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (whole + gate).as("n_copies"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("n_chars"),
        explode(sequence(lit(0), col("n_copies") - 1)).as("copy_id"))
      .orderBy("doc_id", "copy_id")
  }
  private val domainMixSql = {
    val h = OraclePipeline.h60Sql("'mix:' || CAST(doc_id AS VARCHAR)")
    s"""WITH mix AS (
  SELECT doc_id, source, n_chars,
    CASE WHEN grp = 0 THEN 0 WHEN grp = 3 THEN 2 ELSE 1 END
    + CASE WHEN $h % 1000 < (CASE WHEN grp = 1 THEN 0 ELSE 500 END)
           THEN 1 ELSE 0 END AS n_copies
  FROM (SELECT *, CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4
          AS grp FROM documents)
), ex AS (
  SELECT doc_id, source, n_chars, unnest(range(0, n_copies)) AS copy_id
  FROM mix
)
SELECT doc_id, source, n_chars, CAST(copy_id AS INT) AS copy_id
FROM ex ORDER BY doc_id, copy_id"""
  }

  // ---------------------------------------------- CCNet quality buckets
  /** CCNet-style quality bucketing (Wenzek et al. 2020): documents are
    * split per LANGUAGE into head/middle/tail terciles of LM score,
    * and downstream training mixes sample by bucket. Composes
    * [[lmScore]] unchanged; the tercile is
    * [[graft.operators.GlobalRank.withNtilePerGroup]] over lang — the
    * range partition spreads every language's sort across all tasks,
    * so the dominant language of a 100 TB corpus cannot land on one
    * task (the plain per-lang window would). The ordering key is
    * (score, doc_id), so the tercile boundary cannot flap on sub-ulp
    * score differences cross-engine. Output volume = corpus; at 100 TB
    * the bucket id becomes the partition column the mix-sampler
    * prunes on. */
  private val qualityBuckets: Q = (s, d) => {
    val scores = lmScore(s, d).select(col("doc_id"), col("mean_inv_p"))
    val langs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    graft.operators.GlobalRank.withNtilePerGroup(
      langs.join(scores, "doc_id"), 3, "lang",
      Seq(col("mean_inv_p"), col("doc_id")), "bucket")
      .select(col("doc_id"), col("lang"), col("mean_inv_p"), col("bucket"))
      .orderBy("doc_id")
  }
  // lazy: lmScoreSql is defined further down the file, and a strict val
  // here would capture null at object init
  private lazy val qualityBucketsSql =
    s"""WITH scores AS (
  SELECT * FROM ($lmScoreSql)
)
SELECT d.doc_id, d.lang, s.mean_inv_p,
  CAST(ntile(3) OVER (PARTITION BY d.lang
    ORDER BY s.mean_inv_p, d.doc_id) AS INT) AS bucket
FROM documents d JOIN scores s ON s.doc_id = d.doc_id
ORDER BY d.doc_id"""

  // -------------------------------------------------- hash embedding
  /** Feature-hashed document embeddings — the deterministic
    * no-model-needed vectorizer (Weinberger et al.'s hashing trick,
    * fastText's input layer): each token hashes to one of 16 buckets
    * with a ±1 sign bit, per-doc bucket sums form the raw vector, and
    * L2 normalization makes it cosine-ready. Everything up to the
    * final divide is EXACT integer arithmetic (signed counts, sum of
    * squares), so the oracle hash-matches without tolerance; the plan
    * is one explode + ONE per-doc aggregate with 16 conditional sums
    * (no pivot, no second shuffle), riding the scan's partitioning. At
    * 100 TB this replaces the "call the embedding model" step for
    * cheap dedup/clustering passes, and downstream ANN/k-means consume
    * d0..d15 unchanged. All-cancelling docs emit the zero vector. */
  /** Hashed-feature dimensionality, shared by the batch featurizer,
    * the trainers, and the STREAMING scorer
    * ([[graft.streaming.StreamingEvents.classifierScoreStream]]
    * derives its bucket modulus and sign-bit shift from this — a
    * change here must not silently break train/serve parity, so keep
    * it a power of two or the streaming face's require trips). */
  private[graft] val HashEmbD = 16
  private val hashEmbedding: Q = (s, d) => {
    val ex = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"),
        DupCorpus.h60(concat(lit("emb:"), col("tok"))).as("h"))
      .select(col("doc_id"), pmod(col("h"), lit(HashEmbD.toLong)).as("bucket"),
        when(pmod(expr(s"h div $HashEmbD"), lit(2)) === 0, 1L)
          .otherwise(-1L).as("sgn"))
    val sums = (0 until HashEmbD).map(j =>
      sum(when(col("bucket") === j, col("sgn")).otherwise(0L)).as(s"v$j"))
    val raw = ex.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    val ss = (0 until HashEmbD).map(j => col(s"v$j") * col(s"v$j"))
      .reduce(_ + _)
    val outs = (0 until HashEmbD).map(j =>
      round(when(col("ss") === 0L, lit(0.0))
        .otherwise(col(s"v$j").cast("double") / sqrt(col("ss").cast("double"))), 6)
        .as(s"d$j"))
    raw.withColumn("ss", ss)
      .select((col("doc_id") +: outs): _*)
      .orderBy("doc_id")
  }
  private val hashEmbeddingSql = {
    val h = OraclePipeline.h60Sql("'emb:' || tok")
    val vs = (0 until HashEmbD).map(j =>
      s"sum(CASE WHEN bucket = $j THEN sgn ELSE 0 END) AS v$j")
      .mkString(",\n    ")
    val ssSql = (0 until HashEmbD).map(j => s"v$j * v$j").mkString(" + ")
    val ds = (0 until HashEmbD).map(j =>
      s"""round(CASE WHEN ss = 0 THEN CAST(0 AS DOUBLE)
      ELSE CAST(v$j AS DOUBLE) / sqrt(CAST(ss AS DOUBLE)) END, 6) AS d$j""")
      .mkString(",\n  ")
    s"""WITH tok AS (
  SELECT doc_id, unnest($ToksSql) AS tok FROM documents
), f AS (
  SELECT doc_id, h % $HashEmbD AS bucket,
    CASE WHEN (h // $HashEmbD) % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM (SELECT doc_id, $h AS h FROM tok)
), v AS (
  SELECT doc_id,
    $vs
  FROM f GROUP BY doc_id
), withss AS (
  SELECT *, $ssSql AS ss FROM v
)
SELECT doc_id,
  $ds
FROM withss ORDER BY doc_id"""
  }

  // ------------------------------------------------------- bigram LM
  /** Bigram MLE language model — the n-gram LM estimation pass (the
    * model behind CCNet-style perplexity filters and the classical
    * next-token baseline): corpus-wide bigram counts, min-count
    * pruning, conditional probability P(next|head) = c(head,next) /
    * c(head,·), and the top-3 continuations per surviving head. Bigram
    * extraction is a per-row `transform(sequence)` riding the scan
    * (no self-join, no shuffle until the count aggregate); the
    * continuation rank partitions by head token — never global. The
    * probability divides two exact longs (the head total is the sum of
    * its SURVIVING continuations, so the ratio is a closed-vocabulary
    * conditional — deterministic and self-consistent under pruning).
    * At 100 TB this is the standard two-aggregate LM-count shape with
    * map-side combine on (head, next). */
  private val LmMinCount = 5
  private def lmBigrams: Column = transform(
    sequence(lit(1), size(col("toks")) - 1),
    i => struct(element_at(col("toks"), i).as("head"),
      element_at(col("toks"), i + 1).as("next")))
  /** Pruned bigram counts with per-head totals — the LM's parameter
    * relation, shared by the [[bigramLm]] report and the
    * [[perplexityEval]] scorer. */
  private def lmCounts(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(toks.as("toks"))
      // single-token docs emit no bigrams; also dodges the descending-
      // sequence(1,0) trap on degenerate rows (mirrors the oracle's
      // empty range(1,1))
      .filter(size(col("toks")) >= 2)
      .select(explode(lmBigrams).as("bg"))
      .select(col("bg.head").as("head"), col("bg.next").as("next"))
      .groupBy("head", "next").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= LmMinCount)
    val w = Window.partitionBy("head")
    pairs.withColumn("head_cnt", sum("cnt").over(w))
  }
  private val bigramLm: Q = (s, d) => {
    val wr = Window.partitionBy("head")
      .orderBy(col("cnt").desc, col("next"))
    lmCounts(s, d)
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= 3)
      .select(col("head"), col("next"), col("cnt"),
        col("rank").cast("int").as("rank"),
        round(col("cnt").cast("double") / col("head_cnt"), 6).as("prob"))
      .orderBy("head", "rank")
  }
  private val lmCtes =
    s"""WITH t AS (
  SELECT doc_id, $ToksSql AS toks FROM documents
), bg AS (
  SELECT doc_id, toks[i] AS head, toks[i + 1] AS next
  FROM t, unnest(range(1, greatest(len(toks), 1))) AS u(i)
), cnts AS (
  SELECT head, next, count(*) AS cnt FROM bg GROUP BY head, next
  HAVING count(*) >= $LmMinCount
), model AS (
  SELECT head, next, cnt,
    sum(cnt) OVER (PARTITION BY head) AS head_cnt
  FROM cnts
)"""
  private val bigramLmSql =
    s"""$lmCtes, ranked AS (
  SELECT head, next, cnt, head_cnt,
    row_number() OVER (PARTITION BY head ORDER BY cnt DESC, next) AS rank
  FROM model
)
SELECT head, next, CAST(cnt AS BIGINT) AS cnt, CAST(rank AS INT) AS rank,
  round(CAST(cnt AS DOUBLE) / head_cnt, 6) AS prob
FROM ranked WHERE rank <= 3
ORDER BY head, rank"""

  // -------------------------------------------------------- LM scoring
  /** Corpus scoring under the trained bigram LM — the second half of
    * the LM-filter loop ([[bigramLm]] trains, this scores): every
    * document's bigrams LEFT-join the pruned model and the document
    * gets (bigram count, out-of-vocabulary count, mean inverse
    * conditional probability). The metric is the ARITHMETIC mean of
    * 1/P(next|head) with a fixed 10⁶ penalty for OOV bigrams — an
    * exact-arithmetic stand-in for perplexity's geometric mean (same
    * ordering on the quality tail, but every term is a ratio of two
    * exact longs, no log/pow whose last-ulp behavior differs between
    * engines — the same integer-exact-contract discipline as
    * text_surprisal). The model is vocabulary-sized → broadcast; the
    * scoring join rides the per-doc bigram fan-out; one per-doc
    * aggregate ends it. A real neural LM swaps in as the same
    * broadcast score table. */
  private val lmScore: Q = (s, d) => {
    val model = lmCounts(s, d)
      .select(col("head"), col("next"),
        (col("head_cnt").cast("double") / col("cnt")).as("inv_p"))
    val docBg = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(lmBigrams).as("bg"))
      .select(col("doc_id"), col("bg.head").as("head"),
        col("bg.next").as("next"))
    docBg.join(broadcast(model), Seq("head", "next"), "left")
      .select(col("doc_id"),
        when(col("inv_p").isNull, 1L).otherwise(0L).as("oov"),
        coalesce(col("inv_p"), lit(1000000.0)).as("inv_p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("oov").cast("long").as("n_oov"),
        round(sum(col("inv_p").cast("decimal(25,15)")).cast("double")
          / count(lit(1)), 6).as("mean_inv_p"))
      .orderBy("doc_id")
  }
  private val lmScoreSql =
    s"""$lmCtes, scored AS (
  SELECT bg.doc_id,
    CASE WHEN m.cnt IS NULL THEN 1 ELSE 0 END AS oov,
    coalesce(CAST(m.head_cnt AS DOUBLE) / m.cnt,
      CAST(1000000 AS DOUBLE)) AS inv_p
  FROM bg LEFT JOIN model m ON m.head = bg.head AND m.next = bg.next
)
SELECT doc_id, count(*) AS n_bigrams,
  CAST(sum(oov) AS BIGINT) AS n_oov,
  round(CAST(sum(CAST(inv_p AS DECIMAL(25,15))) AS DOUBLE) / count(*), 6)
    AS mean_inv_p
FROM scored GROUP BY doc_id ORDER BY doc_id"""

  // ----------------------------------------------- diversity profile
  /** Per-domain lexical-diversity report — the curation dashboard
    * number that catches template farms and boilerplate-heavy sources
    * before they flood the mix: for each source, document count, token
    * volume, vocabulary size, and type-token ratio (a low TTR at high
    * volume is the machine-generated-content signature). One tokenize
    * pass → two combinable aggregates ((source, token) then source) —
    * the same two-phase distinct shape as the vocab query, never a
    * global window; all counts exact integers, the ratio one IEEE
    * divide. At 100 TB: shuffle volume is |vocab per domain|, and the
    * same report rides a sampled corpus unchanged. */
  private val diversityProfile: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val perTok = docs
      .select(col("source"), explode(toks).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
    val lex = perTok.groupBy("source")
      .agg(sum("cnt").cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"))
    val nd = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    nd.join(lex, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"))
      .orderBy("source")
  }
  private val diversityProfileSql =
    s"""WITH tok AS (
  SELECT source, unnest($ToksSql) AS tok FROM documents
), per AS (
  SELECT source, tok, count(*) AS cnt FROM tok GROUP BY source, tok
), lex AS (
  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
    count(*) AS n_types
  FROM per GROUP BY source
), nd AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
)
SELECT nd.source, nd.n_docs, lex.n_tokens, lex.n_types,
  round(CAST(lex.n_types AS DOUBLE) / lex.n_tokens, 6) AS ttr
FROM nd JOIN lex USING (source)
ORDER BY source"""

  // ----------------------------------------------- temperature sample
  /** Temperature-scaled domain sampling — the multilingual-mix recipe
    * (Conneau & Lample's p^α reweighting): domain share p_d is raised
    * to T=0.5, renormalized, and a fixed token budget (half the corpus
    * here) is allocated ∝ the flattened weights, so tail domains are
    * upsampled relative to their raw share and head domains capped.
    * Per-domain keep rate = min(1, budget·w_d / (Σw · cnt_d)); the
    * per-doc keep decision is the same salted-hash gate as
    * [[domainMix]] — no RNG, both engines agree exactly. Determinism:
    * √(cnt/total) is a single IEEE op; the Σw normalizer sums through
    * DECIMAL(25,15) (order-free exact addition); the gate threshold is
    * ⌊rate·10⁶⌋ on the raw double. Scale: domain stats are a
    * |domains|-row broadcast, the gate rides the scan — one pass, no
    * shuffle on the corpus. */
  private val tempSample: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    // |domains| rows, materialized once: the rate derivation below
    // branches over these stats 3× (total, normalizer, rates), and
    // without the checkpoint each branch re-scans the corpus.
    val cnts = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tot = broadcast(cnts.agg(sum("cnt").cast("long").as("total")))
    val w = cnts.crossJoin(tot)
      .withColumn("w", sqrt(col("cnt").cast("double") / col("total")))
    val nrm = broadcast(w.agg(
      sum(col("w").cast("decimal(25,15)")).cast("double").as("norm")))
    val rates = w.crossJoin(nrm)
      .withColumn("rate",
        least(lit(1.0), col("w") / col("norm")
          * expr("total div 2").cast("double") / col("cnt")))
      .select(col("source"), col("rate"))
    val gate = pmod(DupCorpus.h60(concat(lit("tsamp:"),
      col("doc_id").cast("string"))), lit(1000000L))
    docs.join(broadcast(rates), "source")
      .filter(gate < floor(col("rate") * 1000000.0))
      .select(col("doc_id"), col("source"), round(col("rate"), 6).as("rate"))
      .orderBy("doc_id")
  }
  private val tempSampleSql = {
    val h = OraclePipeline.h60Sql("'tsamp:' || CAST(doc_id AS VARCHAR)")
    s"""WITH cnts AS (
  SELECT source, count(*) AS cnt FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cnts
), w AS (
  SELECT source, cnt, sqrt(CAST(cnt AS DOUBLE) / total) AS w FROM cnts, tot
), nrm AS (
  SELECT CAST(sum(CAST(w AS DECIMAL(25,15))) AS DOUBLE) AS norm FROM w
), rates AS (
  SELECT source,
    least(CAST(1 AS DOUBLE),
      w / norm * CAST(total // 2 AS DOUBLE) / cnt) AS rate
  FROM w, nrm, tot
)
SELECT d.doc_id, d.source, round(r.rate, 6) AS rate
FROM documents d JOIN rates r USING (source)
WHERE $h % 1000000 < CAST(floor(r.rate * 1000000.0) AS BIGINT)
ORDER BY doc_id"""
  }

  // ----------------------------------------------------- chunk overlap
  /** Sliding-window document chunking with overlap — the RAG/context-
    * window prep op (split every document into C-token chunks that
    * start every S tokens, so consecutive chunks share C−S tokens of
    * context). Chunk starts are `explode(sequence(0, ⌊(n−1)/S⌋))·S`
    * riding the scan — pure per-row fan-out, no shuffle, output size
    * Σ⌈nᵢ/S⌉ — and each chunk carries its md5 so downstream exact
    * chunk-dedup (identical boilerplate chunks collapse across docs)
    * needs no re-tokenization. Tail chunks are clipped, never padded;
    * every doc emits ≥1 chunk (chunk 0 always starts at token 0). */
  private val ChunkC = 32; private val ChunkS = 24
  private val chunkOverlap: Q = (s, d) => {
    val nTok = size(toks).cast("long")
    val chunkToks = slice(col("toks"), (col("start_tok") + 1).cast("int"),
      lit(ChunkC))
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"), nTok.as("n_tokens"))
      .select(col("doc_id"), col("toks"), col("n_tokens"),
        explode(sequence(lit(0L),
          greatest(lit(0L),
            floor((col("n_tokens") - 1) / lit(ChunkS)).cast("long"))))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * ChunkS).as("start_tok"), col("toks"),
        col("n_tokens"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(chunkToks).cast("long").as("chunk_len"),
        md5(concat_ws(" ", chunkToks)).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }
  private val chunkOverlapSql =
    s"""WITH tok AS (
  SELECT doc_id, $ToksSql AS toks, len($ToksSql) AS n FROM documents
), st AS (
  SELECT doc_id, toks, n,
    unnest(range(0, greatest(CAST(0 AS BIGINT),
      CAST(floor((n - 1) / $ChunkS) AS BIGINT)) + 1))
      AS chunk_id
  FROM tok
), ch AS (
  SELECT doc_id, chunk_id, chunk_id * $ChunkS AS start_tok,
    list_slice(toks, chunk_id * $ChunkS + 1,
      least(chunk_id * $ChunkS + $ChunkC, n)) AS ctoks
  FROM st
)
SELECT doc_id, chunk_id, start_tok,
  CAST(len(ctoks) AS BIGINT) AS chunk_len,
  md5(array_to_string(ctoks, ' ')) AS chunk_md5
FROM ch ORDER BY doc_id, chunk_id"""

  // ------------------------------------------------------- chunk dedup
  /** Cross-document chunk dedup — the boilerplate-collapse pass that
    * runs right after chunking in a RAG/pretraining pipeline (license
    * headers, navigation chrome, and templated intros appear as
    * identical chunks across many documents; they should index once).
    * Composes [[chunkOverlap]]'s md5 with an exact-dedup aggregate:
    * one shuffle on the 16-byte chunk hash (never the text), map-side
    * partial agg, and only hashes that actually repeat survive. */
  private val chunkDedup: Q = (s, d) =>
    chunkOverlap(s, d)
      .groupBy("chunk_md5")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct("doc_id").as("n_docs"),
        min("doc_id").as("first_doc"))
      .filter(col("n_copies") > 1)
      .orderBy("chunk_md5")
  private val chunkDedupSql =
    s"""WITH tok AS (
  SELECT doc_id, $ToksSql AS toks, len($ToksSql) AS n FROM documents
), st AS (
  SELECT doc_id, toks, n,
    unnest(range(0, greatest(CAST(0 AS BIGINT),
      CAST(floor((n - 1) / $ChunkS) AS BIGINT)) + 1))
      AS chunk_id
  FROM tok
), ch AS (
  SELECT doc_id, chunk_id,
    md5(array_to_string(list_slice(toks, chunk_id * $ChunkS + 1,
      least(chunk_id * $ChunkS + $ChunkC, n)), ' ')) AS chunk_md5
  FROM st
)
SELECT chunk_md5, count(*) AS n_copies,
  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
  min(doc_id) AS first_doc
FROM ch GROUP BY chunk_md5 HAVING count(*) > 1
ORDER BY chunk_md5"""

  // ----------------------------------------------------- surprisal
  /** Unigram-surprisal quality proxy — the LM-based quality filter
    * shape (CCNet/KenLM-style: score each document against a reference
    * language model, drop the tails) with the model reduced to what an
    * engine can verify exactly: the "LM" is the corpus unigram table
    * ranked by (count desc, token), and a document's score is its MEAN
    * TOKEN RANK — common-word text scores low (fluent), rare-token
    * soup scores high (noise). Ranks are integers, so the per-doc sum
    * is exact and nothing floats until the final fixed-point division;
    * swapping in a real LM changes only the broadcast scoring table.
    * Scale: the rank table is vocabulary-sized (broadcast), the
    * per-doc sum is one map-side-combinable aggregate over the
    * exploded tokens, and the gate compares in integer space
    * (rank_sum·5 vs n·vocab — flag the worst ~quintile band). */
  private val surprisal: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val toksE = docs.select(col("doc_id"), explode(toks).as("tok"))
    val vocab = toksE.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // Distributed two-phase global rank — NO single-task sort. Phase 1:
    // range-partition the vocabulary on the rank order (ranges are
    // non-overlapping and emitted in partition order, so partition i's
    // rows all precede partition i+1's) and rank WITHIN each partition.
    // Phase 2: shift each partition's local ranks by the total count of
    // all earlier partitions. The offset relation is one row per
    // partition (constant-size, NOT data-sized), so its cumulative-sum
    // window is over one row per partition; the vocabulary itself is never sorted on
    // one task. (cnt, tok) is unique per vocab row, so ranks are total
    // and deterministic regardless of partition boundaries.
    // cached for the same two reasons as GlobalRank.rankCore: the range
    // sampler otherwise executes the input twice, and the two branches
    // below (local ranks + per-pid counts) must see ONE materialization
    // of the partitioning (RangePartitioner's sample seed is rdd-id-
    // derived, so re-materialization can shift boundaries)
    val parted = graft.pipeline.CachePool.cached(
      vocab
        .repartitionByRange(
          s.sessionState.conf.numShufflePartitions, col("cnt").desc, col("tok"))
        .withColumn("pid", spark_partition_id()))
    val wP = Window.partitionBy("pid").orderBy(col("cnt").desc, col("tok"))
    val local = parted.withColumn("rn", row_number().over(wP).cast("long"))
    val counts = parted.groupBy("pid").agg(count(lit(1)).as("pc"))
    val wOff = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.select(col("pid"),
      coalesce(sum("pc").over(wOff), lit(0L)).as("off"))
    val ranked = local.join(broadcast(offsets), "pid")
      .select(col("tok"), (col("rn") + col("off")).as("rank"))
    // Vocabulary size as a broadcast 1-row aggregate (the Q11/Q22
    // pattern) instead of an eager count() at construction: plan-only
    // consumers (hygiene sweeps, bench warm-up) stay action-free and
    // the vocabulary is not computed twice per execution.
    val nv = counts.agg(sum("pc").cast("long").as("n_vocab"))
    toksE.join(broadcast(ranked), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("rank").as("rank_sum"))
      .crossJoin(broadcast(nv))
      .select(col("doc_id"), col("n_tokens"), col("rank_sum"),
        (col("rank_sum") * 5 > col("n_tokens") * col("n_vocab"))
          .as("high_surprisal"))
      .orderBy("doc_id")
  }
  private val surprisalSql =
    s"""WITH tok AS (
  SELECT doc_id, unnest($ToksSql) AS tok FROM documents
), vocab AS (
  SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
), ranked AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT)
    AS rank
  FROM vocab
), nv AS (SELECT count(*) AS n_vocab FROM ranked)
SELECT t.doc_id, count(*) AS n_tokens,
  CAST(sum(r.rank) AS BIGINT) AS rank_sum,
  (CAST(sum(r.rank) AS BIGINT) * 5 > count(*) * (SELECT n_vocab FROM nv))
    AS high_surprisal
FROM tok t JOIN ranked r ON t.tok = r.tok
GROUP BY t.doc_id ORDER BY t.doc_id"""

  // ------------------------------------------------------ filter funnel
  /** Corpus-curation funnel — the C4/Gopher-style multi-gate filter
    * chain with per-stage drop accounting, the report every curation
    * run ships with its output. Four gates in order (a document is
    * charged to its FIRST failing stage): `length` (≥25 tokens, ≤20k
    * chars), `langid` (some stopword list must vote — the [[langid]]
    * 'und' rule), `repetition` (the [[repetitionFilter]] Gopher gate),
    * `diversity` (type-token ratio ≥ 0.4, compared in integer space
    * as nDistinct·10 ≥ nTokens·4 so no rounding flaps the boolean).
    * Scale: all four gates are codegen'd projections riding the one
    * corpus scan (the same kernels the standalone queries use), the
    * first-fail CASE collapses to a ≤5-group map-side-combinable
    * aggregate, and the funnel arithmetic (cumulative drops → n_in /
    * n_out per stage) runs on a CONSTANT 4-row stage dimension — its
    * unpartitioned window is over that 4-row literal relation, never
    * over data. */
  private val filterFunnel: Q = (s, d) => {
    graft.functions.VectorExpressions.register(s)
    import s.implicits._
    val nTok = size(toks).cast("long")
    val maxVote = greatest(Stopwords.map { case (_, sw) =>
      swHits(sw).cast("long") }: _*)
    val topFreq = call_function("graft_top_freq", toks).cast("long")
    val dupBig = call_function("graft_dup_bigrams", toks).cast("long")
    val nDist = size(array_distinct(toks)).cast("long")
    val firstFail = when(nTok < 25 || col("n_chars") > 20000, 1)
      .when(maxVote === 0, 2)
      .when(topFreq * 8 > nTok || dupBig * 16 > nTok - 1, 3)
      .when(nDist * 10 < nTok * 4, 4)
      .otherwise(0)
    val byStage = Tables.documents(s, d)
      .select(firstFail.as("ff"))
      .groupBy("ff").agg(count(lit(1)).as("n"))
    val stageDim = Seq((1, "length"), (2, "langid"),
      (3, "repetition"), (4, "diversity")).toDF("stage_ord", "stage")
    val total = byStage.agg(sum("n").as("n_total"))
    val drops = stageDim
      .join(broadcast(byStage), col("stage_ord") === col("ff"), "left")
      .select(col("stage_ord"), col("stage"),
        coalesce(col("n"), lit(0L)).as("n_drop"))
    val wBefore = Window.orderBy("stage_ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    drops.crossJoin(broadcast(total))
      .withColumn("n_in",
        col("n_total") - coalesce(sum("n_drop").over(wBefore), lit(0L)))
      .select(col("stage_ord"), col("stage"), col("n_in"), col("n_drop"),
        (col("n_in") - col("n_drop")).as("n_out"))
      .orderBy("stage_ord")
  }
  private val filterFunnelSql = {
    val votes = Stopwords.map { case (_, sw) => swHitsSql(sw) }.mkString(", ")
    s"""WITH tok AS (
  SELECT doc_id, n_chars, text, $ToksSql AS toks FROM documents
), freq AS (
  SELECT doc_id, max(c) AS top_freq FROM (
    SELECT doc_id, t, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY 1, 2
  ) GROUP BY 1
), feat AS (
  SELECT t.doc_id, t.n_chars, len(t.toks) AS n_tok,
    greatest($votes) AS max_vote, f.top_freq,
    (len(t.toks) - 1) - len(list_distinct(
      list_transform(list_zip(t.toks[1:-2], t.toks[2:-1]),
                     p -> p[1] || ' ' || p[2]))) AS dup_big,
    len(list_distinct(t.toks)) AS n_dist
  FROM tok t JOIN freq f USING (doc_id)
), ff AS (
  SELECT CASE WHEN n_tok < 25 OR n_chars > 20000 THEN 1
              WHEN max_vote = 0 THEN 2
              WHEN top_freq * 8 > n_tok OR dup_big * 16 > n_tok - 1 THEN 3
              WHEN n_dist * 10 < n_tok * 4 THEN 4
              ELSE 0 END AS ff
  FROM feat
), byff AS (SELECT ff, count(*) AS n FROM ff GROUP BY ff),
stages(stage_ord, stage) AS (
  VALUES (1, 'length'), (2, 'langid'), (3, 'repetition'), (4, 'diversity')
), drops AS (
  SELECT stage_ord, stage, COALESCE(n, 0) AS n_drop
  FROM stages LEFT JOIN byff ON stage_ord = ff
), tot AS (SELECT sum(n) AS n_total FROM byff)
SELECT stage_ord, stage,
  CAST(n_total - COALESCE(sum(n_drop) OVER (ORDER BY stage_ord
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_in,
  CAST(n_drop AS BIGINT) AS n_drop,
  CAST(n_total - COALESCE(sum(n_drop) OVER (ORDER BY stage_ord
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) - n_drop AS BIGINT)
    AS n_out
FROM drops, tot ORDER BY stage_ord"""
  }

  // -------------------------------------------------- classifier score
  /** Hashed-feature linear classifier inference — the fastText-style
    * quality-model scoring pass (Joulin et al. 2016: bag of unigram +
    * bigram features, hashing trick, linear layer), with the trained
    * weights replaced by a deterministic integer weight table so both
    * engines hold the identical "model". The DATAFLOW is the point and
    * is exactly production-shaped: featurize (explode unigrams +
    * zip_with bigrams) → hash into 4096 buckets (shared h60 → pmod) →
    * broadcast-join the constant-size weight relation → one map-side-
    * combinable sum per document → sign gate. Swapping in real learned
    * weights changes only the 4096-row broadcast table. Everything is
    * integer-exact (weights in [-2048, 2047], |score| ≤ n_feat·2048),
    * so the gate cannot flap cross-engine. At 100 TB: the model is a
    * broadcast constant, the only shuffle is the per-doc aggregate. */
  private val ClassifierBuckets = 4096L
  private val classifierScore: Q = (s, d) => {
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1),
      slice(toks, lit(2), n - 1), (a, b) => concat_ws(" ", a, b))
    val feats = Tables.documents(s, d)
      .select(col("doc_id"), explode(concat(toks, bigrams)).as("f"))
      .select(col("doc_id"),
        pmod(DupCorpus.h60(col("f")), lit(ClassifierBuckets)).as("bucket"))
    val model = s.range(0, ClassifierBuckets).select(
      col("id").as("bucket"),
      (col("id") * 2654435761L % ClassifierBuckets - 2048L).as("w"))
    feats.join(broadcast(model), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_features"), sum("w").as("score_raw"))
      .select(col("doc_id"), col("n_features"), col("score_raw"),
        (col("score_raw") > 0).as("keep"))
      .orderBy("doc_id")
  }
  private val classifierScoreSql =
    s"""WITH tok AS (
  SELECT doc_id, $ToksSql AS toks FROM documents
), feats AS (
  SELECT doc_id, unnest(list_concat(toks,
    list_transform(list_zip(toks[1:-2], toks[2:-1]),
                   p -> p[1] || ' ' || p[2]))) AS f
  FROM tok
), model AS (
  SELECT i AS bucket, (i * 2654435761) % ${ClassifierBuckets} - 2048 AS w
  FROM range(0, ${ClassifierBuckets}) t(i)
), b AS (
  SELECT doc_id, ${OraclePipeline.h60Sql("f")} % ${ClassifierBuckets} AS bucket
  FROM feats
)
SELECT doc_id, count(*) AS n_features,
  CAST(sum(w) AS BIGINT) AS score_raw, (sum(w) > 0) AS keep
FROM b JOIN model USING (bucket)
GROUP BY doc_id ORDER BY doc_id"""

  // -------------------------------------------------- classifier AUC
  /** Classifier evaluation — ROC AUC of [[classifierScore]]'s hashed
    * linear score against a reference binary label (`lang = 'en'`,
    * standing in for the held-out human label an eval harness would
    * join in), computed EXACTLY via the Mann-Whitney rank-sum identity
    * AUC = [#(pos>neg pairs) + ½·#ties] / (n_pos·n_neg) — no trapezoid
    * sweep, no sampled thresholds. Everything until the final division
    * is integer: group docs by distinct score into (n_pos, n_neg)
    * cells, prefix-sum the negatives in ascending-score order, and
    * fold u2 = Σ n_pos·(2·cum_neg_below + n_neg) (the ×2 keeps tie
    * half-credit integral). The prefix sum is the DISTRIBUTED
    * two-phase pattern (range-partition on score → per-partition
    * running sum → broadcast per-partition offsets, one-row-per-partition offset
    * relation) — same machinery as text_surprisal's vocabulary rank;
    * the score relation never sorts on one task. At 100 TB: two
    * map-side-combinable aggregates over the scoring join plus a
    * constant-size offset broadcast — AUC over any corpus for the
    * price of a groupBy. */
  private val classifierAuc: Q = (s, d) => {
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1),
      slice(toks, lit(2), n - 1), (a, b) => concat_ws(" ", a, b))
    val feats = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(concat(toks, bigrams)).as("f"))
      .select(col("doc_id"), col("lang"),
        pmod(DupCorpus.h60(col("f")), lit(ClassifierBuckets)).as("bucket"))
    val model = s.range(0, ClassifierBuckets).select(
      col("id").as("bucket"),
      (col("id") * 2654435761L % ClassifierBuckets - 2048L).as("w"))
    val scored = feats.join(broadcast(model), "bucket")
      .groupBy("doc_id", "lang").agg(sum("w").as("score"))
    val cells = scored.groupBy("score").agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("np"),
      sum(when(col("lang") === "en", 0L).otherwise(1L)).as("nn"))
    // cached for the same two reasons as GlobalRank.rankCore: the range
    // sampler otherwise executes the input twice, and the two branches
    // below (local ranks + per-pid counts) must see ONE materialization
    // of the partitioning (RangePartitioner's sample seed is rdd-id-
    // derived, so re-materialization can shift boundaries)
    val parted = graft.pipeline.CachePool.cached(
      cells.repartitionByRange(
          s.sessionState.conf.numShufflePartitions, col("score"))
        .withColumn("pid", spark_partition_id()))
    val wP = Window.partitionBy("pid").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted
      .withColumn("loc", coalesce(sum("nn").over(wP), lit(0L)))
    val ptot = parted.groupBy("pid").agg(sum("nn").as("pnn"))
    val wOff = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ptot.select(col("pid"),
      coalesce(sum("pnn").over(wOff), lit(0L)).as("off"))
    local.join(broadcast(offs), "pid")
      .withColumn("cnb", col("loc") + col("off"))
      .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
        sum(col("np") * (col("cnb") * 2 + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        round(col("u2").cast("double") /
          (col("n_pos") * col("n_neg") * 2).cast("double"), 6).as("auc"))
  }
  private val classifierAucSql =
    s"""WITH tok AS (
  SELECT doc_id, lang, $ToksSql AS toks FROM documents
), feats AS (
  SELECT doc_id, lang, unnest(list_concat(toks,
    list_transform(list_zip(toks[1:-2], toks[2:-1]),
                   p -> p[1] || ' ' || p[2]))) AS f
  FROM tok
), model AS (
  SELECT i AS bucket, (i * 2654435761) % ${ClassifierBuckets} - 2048 AS w
  FROM range(0, ${ClassifierBuckets}) t(i)
), b AS (
  SELECT doc_id, lang,
    ${OraclePipeline.h60Sql("f")} % ${ClassifierBuckets} AS bucket
  FROM feats
), scored AS (
  SELECT doc_id, lang, sum(w) AS score
  FROM b JOIN model USING (bucket) GROUP BY doc_id, lang
), g AS (
  SELECT score,
    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np,
    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS nn
  FROM scored GROUP BY score
), c AS (
  SELECT score, np, nn,
    coalesce(sum(nn) OVER (ORDER BY score
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
  FROM g
)
SELECT CAST(sum(np) AS BIGINT) AS n_pos,
  CAST(sum(nn) AS BIGINT) AS n_neg,
  CAST(sum(np * (2 * cnb + nn)) AS BIGINT) AS u2,
  round(CAST(sum(np * (2 * cnb + nn)) AS DOUBLE)
        / (2.0 * sum(np) * sum(nn)), 6) AS auc
FROM c"""

  // ---------------------------------------------- classifier training
  /** Fixed-round linear-classifier TRAINING — the learning half of the
    * fastText-style quality-filter story ([[classifierScore]] is
    * inference against a fixed model; this trains one): full-batch
    * perceptron rounds (Rosenblatt's update, the public fixed-round
    * distributed form) over the [[hashEmbedding]] signed 16-bucket
    * hashed features, label y = +1 iff `lang = 'en'` (the
    * [[classifierAuc]] convention). Every round is ONE
    * map-side-combinable aggregate over the feature relation —
    * n_wrong plus the 16 gradient sums Σ_wrong y·x_j — collected as a
    * single 18-column row: the Lloyd/BPE driver-held-model discipline
    * (model state is 16 longs on the driver; the corpus never
    * shuffles, one scan of the checkpointed feature relation per
    * round). All arithmetic is INTEGER (signed counts × integer
    * weights), so the margin test y·⟨w,x⟩ ≤ 0, the gradients, and the
    * learned trajectory are order-free and bit-identical cross-engine
    * — no learning-rate float, no tolerance. Two classic refinements,
    * both integer-exact: the step DECAYS as the multiplier
    * 2^(T−r) (large early jumps, unit-step refinement at the end —
    * the damping that stops full-batch perceptron's two-basin
    * oscillation; multipliers keep everything in ℤ where a divided
    * learning rate would floor differently across engines), and the
    * SHIPPED model is the POCKET (Gallant 1990): the starting weights
    * of the round with the fewest mistakes (tie → earliest round),
    * not the last iterate. On this corpus the pocket lands within a
    * point of the least-squares linear probe's accuracy — the 16-dim
    * hashed features' actual ceiling. The oracle replays the
    * identical rounds as chained MATERIALIZED CTEs with a 1-row
    * weight relation (w_r = w_{r−1} + 2^(T−r)·g_r — the
    * [[bpeChainSql]] discipline without scalar subqueries) and picks
    * the pocket from the tagged union of the weight relations. At
    * 100 TB: [[ClfRounds]] combinable aggregates over a persisted
    * vocabulary-hashed feature table — the cost shape of any corpus
    * profile, with O(buckets) driver state. */
  private val ClfRounds = 8
  /** Per-doc training row: (doc_id, y, v0..v15) — the signed
    * [[hashEmbedding]] bucket counts pre-normalization (integers; the
    * L2 normalize is inference-side cosmetics the margin test does
    * not need). Shared by the trainer and the trained-score face. */
  private[graft] def clfFeatures(s: SparkSession, d: String): DataFrame = {
    val ex = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(toks).as("tok"))
      .select(col("doc_id"), col("lang"),
        DupCorpus.h60(concat(lit("emb:"), col("tok"))).as("h"))
      .select(col("doc_id"), col("lang"),
        pmod(col("h"), lit(HashEmbD.toLong)).as("bucket"),
        when(pmod(expr(s"h div $HashEmbD"), lit(2)) === 0, 1L)
          .otherwise(-1L).as("sgn"))
    val sums = (0 until HashEmbD).map(j =>
      sum(when(col("bucket") === j, col("sgn")).otherwise(0L)).as(s"v$j"))
    ex.groupBy("doc_id", "lang").agg(sums.head, sums.tail: _*)
      .select(col("doc_id") +:
        when(col("lang") === "en", 1L).otherwise(-1L).as("y") +:
        (0 until HashEmbD).map(j => col(s"v$j")): _*)
  }
  /** Memoized training run: per round (n, n_wrong under the round's
    * STARTING weights, cumulative weight vector AFTER the update),
    * plus the pocket weights (starting weights of the
    * fewest-mistakes round, tie → earliest). Exactly
    * [[ClfRounds]] + 1 driver actions (the feature checkpoint + one
    * 18-column aggregate row per round). */
  private def clfTrainLoop(feat0: DataFrame)
      : (Seq[(Int, Long, Long, Seq[Long])], Seq[Long]) = {
    val feat = feat0.localCheckpoint()
    val w = Array.fill(HashEmbD)(0L)
    val hist = Seq.newBuilder[(Int, Long, Long, Seq[Long])]
    var pocket = (Long.MaxValue, w.toSeq)
    // Overflow discipline (ADVICE r10): Spark's sum(long) WRAPS
    // silently while the DuckDB oracle's sum() promotes to HUGEINT and
    // errors on the final BIGINT cast — a silent one-sided divergence
    // at corpora where n·|v|·2^T leaves 64 bits. Margins and gradient
    // sums therefore run in DECIMAL(38,0) (exact at any corpus size),
    // and the driver-side fold back to the Long weight vector uses
    // *Exact conversions, so growth past 64 bits fails LOUDLY on both
    // engines instead of wrapping on one.
    val d0 = lit(0).cast("decimal(38,0)")
    for (r <- 1 to ClfRounds) {
      val score = (0 until HashEmbD).map(j =>
        lit(w(j)).cast("decimal(38,0)") * col(s"v$j")).reduce(_ + _)
      val wrong = col("y") * score <= d0
      val aggs = count(lit(1)).as("n") +:
        sum(when(wrong, 1L).otherwise(0L)).as("nw") +:
        (0 until HashEmbD).map(j =>
          sum(when(wrong, (col("y") * col(s"v$j")).cast("decimal(38,0)"))
            .otherwise(d0)).as(s"g$j"))
      val row = feat.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(0); val nw = row.getLong(1)
      if (nw < pocket._1) pocket = (nw, w.toSeq)
      val step = 1L << (ClfRounds - r)
      (0 until HashEmbD).foreach { j =>
        val g = row.getDecimal(2 + j).toBigIntegerExact.longValueExact()
        w(j) = math.addExact(w(j), math.multiplyExact(g, step))
      }
      hist += ((r, n, nw, w.toSeq))
    }
    (hist.result(), pocket._2)
  }
  private[graft] def clfTrained(s: SparkSession, d: String)
      : (Seq[(Int, Long, Long, Seq[Long])], Seq[Long]) =
    CachePool.memoized(("clf", d, ClfRounds)) {
      clfTrainLoop(clfFeatures(s, d))
    }
  private val classifierTrain: Q = (s, d) => {
    val rows = clfTrained(s, d)._1.map { case (r, n, nw, w) =>
      org.apache.spark.sql.Row.fromSeq(
        r +: nw +: ((n - nw) * 1000000L / n) +: w)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("train_round",
        org.apache.spark.sql.types.IntegerType) +:
      org.apache.spark.sql.types.StructField("n_wrong",
        org.apache.spark.sql.types.LongType) +:
      org.apache.spark.sql.types.StructField("acc_ppm",
        org.apache.spark.sql.types.LongType) +:
      (0 until HashEmbD).map(j =>
        org.apache.spark.sql.types.StructField(s"w$j",
          org.apache.spark.sql.types.LongType)))
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      .orderBy("train_round")
  }
  /** Inference under the TRAINED model (the pocket weights) —
    * [[classifierScore]]'s exact dataflow with the learned 16-weight
    * vector as the literal model (a broadcast-free codegen'd
    * projection: 16 multiplies per doc). Closes the train→score loop
    * the way [[seqPackBpe]] closes train→tokenize→pack. The output
    * score stays BIGINT by contract; if pocket weights ever grew to
    * where Σ wⱼ·vⱼ leaves 64 bits, the trainer's *Exact driver fold
    * fails first (see [[clfTrainLoop]]) and the DuckDB mirror errors
    * on its HUGEINT→BIGINT cast — never a silent wrap on one side. */
  private val classifierScoreTrained: Q = (s, d) => {
    val w = clfTrained(s, d)._2
    val score = (0 until HashEmbD).map(j => lit(w(j)) * col(s"v$j"))
      .reduce(_ + _)
    clfFeatures(s, d)
      .select(col("doc_id"), score.as("score"), (score > 0L).as("keep"))
      .orderBy("doc_id")
  }
  /** The `text_sample_split` hash gate (same "split:" salt), as the
    * 0–99 bucket: <80 train, 80–89 val (reserved, untouched), ≥90
    * held-out test. */
  private[graft] def clfSplitBucket: Column =
    pmod(DupCorpus.h60(concat(lit("split:"),
      col("doc_id").cast("string"))), lit(100L))
  /** Trainer fitted on the TRAIN split only — the model the held-out
    * eval scores. Memoized separately from [[clfTrained]] (different
    * training corpus → different weights). */
  private[graft] def clfEvalTrained(s: SparkSession, d: String)
      : (Seq[(Int, Long, Long, Seq[Long])], Seq[Long]) =
    CachePool.memoized(("clfEval", d, ClfRounds)) {
      clfTrainLoop(clfFeatures(s, d)
        .withColumn("bucket", clfSplitBucket)
        .filter(col("bucket") < 80).drop("bucket"))
    }
  /** Held-out generalization eval — the train/test discipline an
    * actual quality-filter deployment needs ([[classifierTrain]]'s
    * accuracy is TRAIN accuracy; an overfit filter looks perfect
    * there and still mislabels fresh crawl): fit the same
    * integer-exact trainer on the 80% hash split, then score BOTH
    * splits with the pocket model in one aggregate — train vs
    * held-out accuracy side by side is the overfitting readout. The
    * 80–89 val bucket stays untouched (reserved for model selection).
    * Margin ≤ 0 counts wrong, matching the trainer. One extra corpus
    * aggregate on top of the training rounds; the oracle refits the
    * split model as its own chained-CTE replay. */
  private val classifierEval: Q = (s, d) => {
    val w = clfEvalTrained(s, d)._2
    val score = (0 until HashEmbD).map(j => lit(w(j)) * col(s"v$j"))
      .reduce(_ + _)
    val wrong = col("y") * score <= 0L
    val isTr = col("bucket") < 80
    val isTe = col("bucket") >= 90
    clfFeatures(s, d).withColumn("bucket", clfSplitBucket)
      .agg(
        sum(when(isTr, 1L).otherwise(0L)).as("n_train"),
        sum(when(isTe, 1L).otherwise(0L)).as("n_test"),
        sum(when(isTr && wrong, 1L).otherwise(0L)).as("train_wrong"),
        sum(when(isTe && wrong, 1L).otherwise(0L)).as("test_wrong"))
      .select(col("n_train"), col("n_test"),
        col("train_wrong"), col("test_wrong"),
        expr("(n_train - train_wrong) * 1000000 div greatest(n_train, 1)")
          .as("train_acc_ppm"),
        expr("(n_test - test_wrong) * 1000000 div greatest(n_test, 1)")
          .as("test_acc_ppm"))
  }

  /** Persist the trained classifier through a parquet MODEL TABLE
    * (VERDICT r10 gap #3: every trained model was session-memoized,
    * but at 100 TB training and serving are different jobs — the
    * serving job must read a table, not a driver memo). The pocket
    * weight vector lands as 16 (j, w) rows via
    * [[graft.sources.ModelStore]]; built once per (session, dataset)
    * and overwritten per retrain. */
  private[graft] def clfModelTable(s: SparkSession, d: String): String =
    CachePool.memoized(("clfModelTable", d, ClfRounds)) {
      import s.implicits._
      val table = "graft_clf_model_" + (d.hashCode & 0x7fffffff)
      val rows = clfTrained(s, d)._2.zipWithIndex
        .map { case (wj, j) => (j, wj) }
      graft.sources.ModelStore.write(rows.toDF("j", "w"), table)
      table
    }
  /** The stored model read back — the round-trip half of the
    * write-model face: hash-matching the oracle's re-derived pocket
    * proves train → write parquet → catalog read loses nothing. */
  private val classifierModelStore: Q = (s, d) => {
    val table = clfModelTable(s, d)
    graft.sources.ModelStore.read(s, table).orderBy("j")
  }
  /** Inference from the STORED model: the serving job's dataflow —
    * load the 16-row model table (constant-size model state, the one
    * `.collect()` a serving tier performs at startup) and score with
    * the same codegen'd 16-multiply projection as
    * [[classifierScoreTrained]]. Identical output by construction
    * (same oracle text); what changed is the model's source of truth:
    * the catalog table, not the training memo. */
  private val classifierScoreStored: Q = (s, d) => {
    val table = clfModelTable(s, d)
    val wm = graft.sources.ModelStore.read(s, table)
      .orderBy("j").collect().map(_.getLong(1))
    require(wm.length == HashEmbD, s"model table $table holds ${wm.length} weights")
    val score = (0 until HashEmbD).map(j => lit(wm(j)) * col(s"v$j"))
      .reduce(_ + _)
    clfFeatures(s, d)
      .select(col("doc_id"), score.as("score"), (score > 0L).as("keep"))
      .orderBy("doc_id")
  }

  /** Model selection on the RESERVED 80–89 val bucket (VERDICT r10
    * gap #2: `text_classifier_eval` reserved it and nothing used it):
    * the candidate set is the starting weight vector of every training
    * round of the train-split trainer — exactly the relation the
    * oracle's `wall` CTE tags — and the selected model is the one with
    * fewest VAL mistakes (tie → earliest round), the classic
    * early-stopping-by-validation discipline. The readout puts the
    * val-selected TEST accuracy next to the train-pocket's TEST
    * accuracy: when the pocket overfits its own training signal, the
    * val-selected number is the honest one a deployment would quote.
    * Cost: ONE extra corpus aggregate scoring all [[ClfRounds]]
    * candidates at once (2 + 2·T conditional sums, margins in the
    * same overflow-exact decimal as the trainer), then pure driver
    * arithmetic on the 18-value row — no per-candidate jobs. */
  private def clfSelected(s: SparkSession, d: String)
      : (Int, Int, Long, Long, Long, Long, Long) =
    CachePool.memoized(("clfSelect", d, ClfRounds)) {
      val (hist, _) = clfEvalTrained(s, d)
      val starts: Seq[(Int, Seq[Long])] = (1 to ClfRounds).map { r =>
        r -> (if (r == 1) Seq.fill(HashEmbD)(0L) else hist(r - 2)._4)
      }
      val pocketRound = hist.minBy(h => (h._3, h._1))._1
      val d0 = lit(0).cast("decimal(38,0)")
      def wrongUnder(w: Seq[Long]): Column = {
        val score = (0 until HashEmbD).map(j =>
          lit(w(j)).cast("decimal(38,0)") * col(s"v$j")).reduce(_ + _)
        col("y") * score <= d0
      }
      val isVal = col("bucket") >= 80 && col("bucket") < 90
      val isTe = col("bucket") >= 90
      val aggs = sum(when(isVal, 1L).otherwise(0L)).as("n_val") +:
        sum(when(isTe, 1L).otherwise(0L)).as("n_test") +:
        starts.flatMap { case (r, w) => Seq(
          sum(when(isVal && wrongUnder(w), 1L).otherwise(0L)).as(s"vw$r"),
          sum(when(isTe && wrongUnder(w), 1L).otherwise(0L)).as(s"tw$r")) }
      val row = clfFeatures(s, d).withColumn("bucket", clfSplitBucket)
        .agg(aggs.head, aggs.tail: _*).head()
      val nVal = row.getLong(0); val nTest = row.getLong(1)
      val perR = starts.map { case (r, _) =>
        (r, row.getLong(2 * r), row.getLong(2 * r + 1)) } // (r, vw, tw)
      val (selRound, vwSel, twSel) = perR.minBy { case (r, vw, _) => (vw, r) }
      val twPocket = perR.find(_._1 == pocketRound).get._3
      (selRound, pocketRound, nVal, nTest, vwSel, twSel, twPocket)
    }
  private val classifierSelect: Q = (s, d) => {
    val (selRound, pocketRound, nVal, nTest, vw, twSel, twPocket) =
      clfSelected(s, d)
    def acc(n: Long, wrong: Long): Long =
      (n - wrong) * 1000000L / math.max(n, 1L)
    val row = org.apache.spark.sql.Row(selRound, pocketRound, nVal, nTest,
      vw, twSel, twPocket, acc(nVal, vw), acc(nTest, twSel),
      acc(nTest, twPocket))
    val it = org.apache.spark.sql.types.IntegerType
    val lt = org.apache.spark.sql.types.LongType
    val schema = org.apache.spark.sql.types.StructType(
      Seq("sel_round" -> it, "pocket_round" -> it, "n_val" -> lt,
        "n_test" -> lt, "val_wrong" -> lt, "test_wrong_sel" -> lt,
        "test_wrong_pocket" -> lt, "val_acc_ppm" -> lt,
        "test_acc_sel_ppm" -> lt, "test_acc_pocket_ppm" -> lt)
        .map { case (n, t) =>
          org.apache.spark.sql.types.StructField(n, t) })
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.List.of(row)), schema)
  }

  /** Shared oracle head: the per-doc labeled feature relation. */
  private def clfFeatSql: String = {
    val h = OraclePipeline.h60Sql("'emb:' || tok")
    val vs = (0 until HashEmbD).map(j =>
      s"sum(CASE WHEN bucket = $j THEN sgn ELSE 0 END) AS v$j")
      .mkString(",\n    ")
    s"""tok AS (
  SELECT doc_id, lang, unnest($ToksSql) AS tok FROM documents
), fh AS (
  SELECT doc_id, lang, h % $HashEmbD AS bucket,
    CASE WHEN (h // $HashEmbD) % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM (SELECT doc_id, lang, $h AS h FROM tok)
), feat AS MATERIALIZED (
  SELECT doc_id,
    ${OraclePipeline.h60Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100
      AS bucket,
    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
    $vs
  FROM fh GROUP BY doc_id, lang
)"""
  }
  /** The [[ClfRounds]] training rounds as chained MATERIALIZED CTEs:
    * s_i scores every doc under w_{i−1} (1-row cross join), g_i is
    * the round's 18-column aggregate, w_i = w_{i−1} + 2^(T−i)·g_i;
    * `pocket` re-derives the fewest-mistakes starting weights from
    * the tagged union of the weight relations. */
  /** The training rounds + pocket CTEs over the named feature source
    * (`feat` for the full-corpus trainer, `tfeat` for the held-out
    * eval's train-split trainer). */
  private def clfRoundsSql(src: String): String = {
    val w0 = (0 until HashEmbD).map(j => s"CAST(0 AS BIGINT) AS w$j")
      .mkString(", ")
    val rounds = (1 to ClfRounds).map { i =>
      val score = (0 until HashEmbD).map(j => s"w.w$j * f.v$j")
        .mkString(" + ")
      val gs = (0 until HashEmbD).map(j =>
        s"sum(CASE WHEN m <= 0 THEN y * v$j ELSE 0 END) AS g$j")
        .mkString(",\n    ")
      val step = 1L << (ClfRounds - i)
      val ws = (0 until HashEmbD).map(j => s"w.w$j + g.g$j * $step AS w$j")
        .mkString(", ")
      s"""s$i AS MATERIALIZED (
  SELECT f.*, f.y * ($score) AS m FROM $src f, w${i - 1} w
), g$i AS MATERIALIZED (
  SELECT count(*) AS n, sum(CASE WHEN m <= 0 THEN 1 ELSE 0 END) AS n_wrong,
    $gs
  FROM s$i
), w$i AS MATERIALIZED (
  SELECT $ws FROM w${i - 1} w, g$i g
)"""
    }
    // pocket: round r's n_wrong measures w_{r-1} — tag each weight
    // relation with the round it STARTS, pick the best (fewest wrong,
    // earliest) round's starting weights
    val wall = (1 to ClfRounds).map(i =>
      s"SELECT $i AS r, * FROM w${i - 1}").mkString("\n  UNION ALL\n  ")
    val metrics = (1 to ClfRounds).map(i =>
      s"SELECT $i AS r, n_wrong FROM g$i").mkString("\n  UNION ALL\n  ")
    s"""w0 AS (SELECT $w0), ${rounds.mkString(", ")},
wall AS (
  $wall
), best AS (
  SELECT r FROM (
  $metrics
  ) ORDER BY n_wrong, r LIMIT 1
), pocket AS MATERIALIZED (
  SELECT wall.* FROM wall, best WHERE wall.r = best.r
)"""
  }
  private def clfChainSql: String =
    s"""WITH $clfFeatSql, ${clfRoundsSql("feat")}"""
  private val classifierTrainSql = {
    val wsel = (0 until HashEmbD).map(j => s"CAST(w.w$j AS BIGINT) AS w$j")
      .mkString(", ")
    val sel = (1 to ClfRounds).map(i =>
      s"""SELECT CAST($i AS INT) AS train_round,
    CAST(g.n_wrong AS BIGINT) AS n_wrong,
    CAST(((g.n - g.n_wrong) * 1000000) // g.n AS BIGINT) AS acc_ppm,
    $wsel
  FROM g$i g, w$i w""").mkString("\n  UNION ALL\n  ")
    s"""$clfChainSql
SELECT * FROM (
  $sel
)
ORDER BY train_round"""
  }
  private val classifierScoreTrainedSql = {
    val score = (0 until HashEmbD).map(j => s"w.w$j * f.v$j").mkString(" + ")
    s"""$clfChainSql
SELECT doc_id, CAST(score AS BIGINT) AS score, (score > 0) AS keep
FROM (SELECT f.doc_id, ($score) AS score FROM feat f, pocket w)
ORDER BY doc_id"""
  }
  private val classifierEvalSql = {
    val score = (0 until HashEmbD).map(j => s"w.w$j * f.v$j").mkString(" + ")
    s"""WITH $clfFeatSql, tfeat AS MATERIALIZED (
  SELECT * FROM feat WHERE bucket < 80
), ${clfRoundsSql("tfeat")}, sc AS (
  SELECT f.bucket, f.y * ($score) AS m FROM feat f, pocket w
)
SELECT
  CAST(sum(CASE WHEN bucket < 80 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
  CAST(sum(CASE WHEN bucket >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
  CAST(sum(CASE WHEN bucket < 80 AND m <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS train_wrong,
  CAST(sum(CASE WHEN bucket >= 90 AND m <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS test_wrong,
  CAST((sum(CASE WHEN bucket < 80 THEN 1 ELSE 0 END)
      - sum(CASE WHEN bucket < 80 AND m <= 0 THEN 1 ELSE 0 END)) * 1000000
    // greatest(sum(CASE WHEN bucket < 80 THEN 1 ELSE 0 END), 1) AS BIGINT)
    AS train_acc_ppm,
  CAST((sum(CASE WHEN bucket >= 90 THEN 1 ELSE 0 END)
      - sum(CASE WHEN bucket >= 90 AND m <= 0 THEN 1 ELSE 0 END)) * 1000000
    // greatest(sum(CASE WHEN bucket >= 90 THEN 1 ELSE 0 END), 1) AS BIGINT)
    AS test_acc_ppm
FROM sc"""
  }
  /** Oracle mirror of [[classifierSelect]]: the candidate weight
    * relation is `wall` (round r's STARTING weights) from the
    * train-split rounds chain; per-candidate val/test mistakes come
    * from one feat × wall margin relation restricted to buckets ≥ 80,
    * selection is fewest-val-wrong (tie → earliest), and the pocket
    * round is the chain's own `best` CTE. */
  private val classifierSelectSql = {
    val score = (0 until HashEmbD).map(j => s"w.w$j * f.v$j").mkString(" + ")
    s"""WITH $clfFeatSql, tfeat AS MATERIALIZED (
  SELECT * FROM feat WHERE bucket < 80
), ${clfRoundsSql("tfeat")}, cm AS MATERIALIZED (
  SELECT w.r, f.bucket, f.y * ($score) AS m
  FROM feat f, wall w WHERE f.bucket >= 80
), cnt AS MATERIALIZED (
  SELECT r,
    sum(CASE WHEN bucket < 90 AND m <= 0 THEN 1 ELSE 0 END) AS vw,
    sum(CASE WHEN bucket >= 90 AND m <= 0 THEN 1 ELSE 0 END) AS tw
  FROM cm GROUP BY r
), nn AS (
  SELECT
    sum(CASE WHEN bucket >= 80 AND bucket < 90 THEN 1 ELSE 0 END) AS n_val,
    sum(CASE WHEN bucket >= 90 THEN 1 ELSE 0 END) AS n_test
  FROM feat
), sel AS (
  SELECT r AS sel_round, vw, tw FROM cnt ORDER BY vw, r LIMIT 1
)
SELECT CAST(sel.sel_round AS INT) AS sel_round,
  CAST(best.r AS INT) AS pocket_round,
  CAST(nn.n_val AS BIGINT) AS n_val,
  CAST(nn.n_test AS BIGINT) AS n_test,
  CAST(sel.vw AS BIGINT) AS val_wrong,
  CAST(sel.tw AS BIGINT) AS test_wrong_sel,
  CAST(pc.tw AS BIGINT) AS test_wrong_pocket,
  CAST((nn.n_val - sel.vw) * 1000000 // greatest(nn.n_val, 1) AS BIGINT)
    AS val_acc_ppm,
  CAST((nn.n_test - sel.tw) * 1000000 // greatest(nn.n_test, 1) AS BIGINT)
    AS test_acc_sel_ppm,
  CAST((nn.n_test - pc.tw) * 1000000 // greatest(nn.n_test, 1) AS BIGINT)
    AS test_acc_pocket_ppm
FROM sel, best, nn, cnt pc WHERE pc.r = best.r"""
  }
  /** Oracle mirror of the stored model table: the re-derived pocket
    * weights unpivoted to (j, w) — a mismatch means the parquet
    * round-trip corrupted the model. */
  private val classifierModelStoreSql = {
    val rows = (0 until HashEmbD).map(j =>
      s"SELECT CAST($j AS INT) AS j, CAST(w.w$j AS BIGINT) AS w FROM pocket w")
      .mkString("\n  UNION ALL\n  ")
    s"""$clfChainSql
SELECT j, w FROM (
  $rows
)
ORDER BY j"""
  }

  // -------------------------------------------------- DSIR importance weight
  /** Data Selection via Importance Resampling (Xie et al. 2023): score
    * every document by how much more likely its hashed n-gram features
    * are under a target-domain feature distribution than under the raw
    * corpus distribution, then gate on weight > 1. The feature space is
    * the classifier's unigram+bigram hash, folded to 256 buckets so the
    * per-bucket counts are dense; the target slice is the `lang = 'en'`
    * corpus (standing in for the curated domain DSIR resamples toward).
    * The published method ranks by the log-likelihood ratio
    * Σ log p_t(f)/p_c(f); we keep the ordering decision INTEGER-exact
    * instead: per-doc feature-count sums under each distribution,
    * cross-multiplied against the global totals, so
    *   weight_ppm = ⌊10⁶ · (Σ tgt(f) · N_c) / (Σ cor(f) · N_t)⌋
    * is pure integer arithmetic (decimal(38,0)/HUGEINT intermediates —
    * no doubles, no ln(), no cross-engine ulp risk) with add-1
    * smoothing on every bucket. At 100 TB: the 256-row bucket table and
    * the 1-row totals are broadcast constants (map-side-combinable
    * pre-passes over the same scan); the per-doc aggregate is the only
    * data shuffle. */
  private val DsirBuckets = 256L
  private val dsirWeights: Q = (s, d) => {
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), n - 1),
      slice(toks, lit(2), n - 1), (a, b) => concat_ws(" ", a, b))
    val feats = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(concat(toks, bigrams)).as("f"))
      .select(col("doc_id"), col("lang"),
        pmod(DupCorpus.h60(col("f")), lit(DsirBuckets)).as("bucket"))
    val buckets = feats.groupBy("bucket").agg(
      (count(lit(1)) + lit(1L)).as("cor"),
      (count(when(col("lang") === "en", 1)) + lit(1L)).as("tgt"))
    val totals = buckets.agg(sum("cor").as("n_c"), sum("tgt").as("n_t"))
    feats.join(broadcast(buckets), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_features"),
        sum("tgt").cast("decimal(38,0)").as("sum_t"),
        sum("cor").cast("decimal(38,0)").as("sum_c"))
      .crossJoin(broadcast(totals))
      .withColumn("weight_ppm",
        expr("(sum_t * n_c * 1000000) div (sum_c * n_t)").cast("long"))
      .select(col("doc_id"), col("n_features"), col("weight_ppm"),
        (col("weight_ppm") > lit(1000000L)).as("keep"))
      .orderBy("doc_id")
  }
  private val dsirWeightsSql =
    s"""WITH tok AS (
  SELECT doc_id, lang, $ToksSql AS toks FROM documents
), feats AS (
  SELECT doc_id, lang, unnest(list_concat(toks,
    list_transform(list_zip(toks[1:-2], toks[2:-1]),
                   p -> p[1] || ' ' || p[2]))) AS f
  FROM tok
), b AS (
  SELECT doc_id, lang,
    ${OraclePipeline.h60Sql("f")} % $DsirBuckets AS bucket
  FROM feats
), buckets AS (
  SELECT bucket, count(*) + 1 AS cor,
    count(*) FILTER (WHERE lang = 'en') + 1 AS tgt
  FROM b GROUP BY bucket
), totals AS (
  SELECT CAST(sum(cor) AS HUGEINT) AS n_c, CAST(sum(tgt) AS HUGEINT) AS n_t
  FROM buckets
), per_doc AS (
  SELECT doc_id, count(*) AS n_features,
    CAST(sum(tgt) AS HUGEINT) AS sum_t, CAST(sum(cor) AS HUGEINT) AS sum_c
  FROM b JOIN buckets USING (bucket) GROUP BY doc_id
)
SELECT doc_id, n_features,
  CAST((sum_t * n_c * 1000000) // (sum_c * n_t) AS BIGINT) AS weight_ppm,
  ((sum_t * n_c * 1000000) // (sum_c * n_t) > 1000000) AS keep
FROM per_doc, totals
ORDER BY doc_id"""

  // ------------------------------------------ DoReMi domain reweighting
  /** DoReMi-style domain-mixture optimization (Xie et al. 2023's
    * multiplicative-weights Group-DRO loop, public): [[DrwRounds]]
    * rounds over the per-domain token distributions, each round
    * upweighting the domains whose tokens the CURRENT mixture covers
    * worst and smoothing toward uniform — the iterative answer to the
    * question [[domainMix]] hard-codes ("how much of each domain should
    * the training mix sample?"). Domains here are the language slices.
    *
    * Deviation from the published exp(η·excess-loss) update, same
    * discipline as [[dsirWeights]]' log-free weight: the per-domain
    * signal is the mean mixture-mass of the domain's tokens
    *   mass_k = (Σ_w n_k(w) · Σ_j α_j·rate_j(w)) div N_k
    * (low mass = underrepresented = the high-excess-loss side of DRO),
    * the update is the inverse-proportional α_k·10¹⁸ div (mass_k+1)
    * normalized to ppm, and the uniform-smoothing step is
    * (4·α + u) div 5 — all integer arithmetic (BigInt / HUGEINT), so
    * both engines replay the trajectory bit-for-bit.
    *
    * Scale shape: ONE corpus-sized scan builds the per-(domain, token)
    * count table, folded to the global top-[[DrwVocab]] tokens plus an
    * OOV bucket — ≤ |domains|·(V+1) rows of model state regardless of
    * corpus size (the kmeans-centroid idiom; the top-V is a
    * TakeOrdered, not a full sort). The round loop then runs on that
    * collected model table in exact BigInt on the driver: zero
    * per-round Spark jobs, one action total. At 100 TB only the count
    * scan grows; the trajectory is replayed on ≤ a few thousand rows. */
  private val DrwRounds = 8
  private val DrwVocab = 256
  /** Per-(domain, token) counts folded to top-V ∪ {OOV}. The raw
    * (lang, tok) aggregate feeds BOTH the top-V branch and the fold
    * join; caching it makes the single corpus materialization
    * structural rather than exchange-reuse-dependent (the
    * RangePartitioner lesson — reuse can silently break under cache
    * interactions), and the cached relation is vocabulary-sized, not
    * corpus-sized. */
  private[graft] def drwCounts(s: SparkSession, d: String): DataFrame = {
    val sc0 = CachePool.cached(Tables.documents(s, d)
      .select(col("lang"), explode(toks).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("n")))
    val topv = sc0.groupBy("tok").agg(sum("n").as("t"))
      .orderBy(col("t").desc, col("tok")).limit(DrwVocab)
      .select(col("tok"), lit(1).as("inv"))
    sc0.join(broadcast(topv), Seq("tok"), "left")
      .select(col("lang"),
        when(col("inv").isNotNull, col("tok"))
          .otherwise(lit("\u0001")).as("tok"),
        col("n"))
      .groupBy("lang", "tok").agg(sum("n").as("n"))
  }
  /** The pure driver loop over the folded count table — exact BigInt,
    * no RNG, no doubles; unit-testable in isolation. Returns one
    * (round, domain, mass, alpha_ppm) row per round per domain. */
  private[graft] def drwLoop(counts: Seq[(String, String, Long)],
      rounds: Int): Seq[(Int, String, BigInt, BigInt)] = {
    val Scale = BigInt(1000000000L)
    val Ppm = BigInt(1000000L)
    val Big = BigInt("1000000000000000000")
    val doms = counts.map(_._1).distinct.sorted
    val k = doms.size
    val nTot = counts.groupBy(_._1)
      .map { case (dm, rs) => dm -> rs.map(r => BigInt(r._3)).sum }
    val ratesByTok = counts.groupBy(_._2).map { case (w, rs) =>
      w -> rs.map { case (dm, _, n) => (dm, BigInt(n) * Scale / nTot(dm)) } }
    val countsByDom = counts.groupBy(_._1).map { case (dm, rs) =>
      dm -> rs.map { case (_, w, n) => (w, BigInt(n)) } }
    var alpha = doms.map(_ -> Ppm / k).toMap
    val out = Seq.newBuilder[(Int, String, BigInt, BigInt)]
    for (t <- 1 to rounds) {
      val mix = ratesByTok.map { case (w, rs) =>
        w -> rs.map { case (dm, r) => alpha(dm) * r }.sum }
      val mass = doms.map { dm =>
        dm -> countsByDom(dm).map { case (w, n) => n * mix(w) }.sum / nTot(dm)
      }.toMap
      val raw = doms.map(dm => dm -> alpha(dm) * Big / (mass(dm) + 1)).toMap
      val rawSum = raw.values.sum
      alpha = doms.map(dm =>
        dm -> (raw(dm) * Ppm / rawSum * 4 + Ppm / k) / 5).toMap
      doms.foreach(dm => out += ((t, dm, mass(dm), alpha(dm))))
    }
    out.result()
  }
  /** Memoized training run (one collect of the folded count table +
    * the driver-side trajectory), shared by the readout and the
    * resampling face. */
  private[graft] def drwTrained(s: SparkSession, d: String)
      : Seq[(Int, String, BigInt, BigInt)] =
    CachePool.memoized(("drw", d, DrwRounds, DrwVocab)) {
      val folded = drwCounts(s, d).collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      drwLoop(folded, DrwRounds)
    }
  private val domainReweight: Q = (s, d) => {
    import s.implicits._
    drwTrained(s, d)
      .map { case (t, dm, mass, a) => (t, dm, mass.toLong, a.toLong) }
      .toDF("round", "lang", "mix_mass", "alpha_ppm")
      .orderBy("round", "lang")
  }
  /** The count-fold + [[DrwRounds]] training rounds as chained
    * MATERIALIZED CTEs (the `bpeChainSql`/`clfRoundsSql` idiom) —
    * shared prefix of the trajectory readout and the resampling
    * face's oracles. */
  private def drwChainSql: String = {
    val rounds = (1 to DrwRounds).map { i =>
      val p = i - 1
      s"""mix$i AS MATERIALIZED (
  SELECT r.tok, sum(a.alpha * r.r) AS mix
  FROM drates r JOIN a$p a USING (lang) GROUP BY r.tok
), f$i AS MATERIALIZED (
  SELECT c.lang, sum(c.n * m.mix) // t.nn AS mass
  FROM dcounts c JOIN mix$i m USING (tok) JOIN dtots t USING (lang)
  GROUP BY c.lang, t.nn
), r$i AS MATERIALIZED (
  SELECT f.lang, f.mass,
    (a.alpha * CAST('1000000000000000000' AS HUGEINT)) // (f.mass + 1) AS raw
  FROM f$i f JOIN a$p a USING (lang)
), a$i AS MATERIALIZED (
  SELECT lang,
    ((raw * 1000000) // (SELECT sum(raw) FROM r$i) * 4
     + (SELECT u FROM unif)) // 5 AS alpha
  FROM r$i
)"""
    }.mkString(", ")
    s"""WITH dtok AS (
  SELECT lang, unnest($ToksSql) AS tok FROM documents
), dsc AS MATERIALIZED (
  SELECT lang, tok, count(*) AS n FROM dtok GROUP BY lang, tok
), dtopv AS MATERIALIZED (
  SELECT tok FROM (SELECT tok, sum(n) AS t FROM dsc GROUP BY tok)
  ORDER BY t DESC, tok LIMIT $DrwVocab
), dcounts AS MATERIALIZED (
  SELECT lang,
    CASE WHEN tok IN (SELECT tok FROM dtopv) THEN tok ELSE chr(1) END AS tok,
    CAST(sum(n) AS HUGEINT) AS n
  FROM dsc GROUP BY 1, 2
), dtots AS MATERIALIZED (
  SELECT lang, sum(n) AS nn FROM dcounts GROUP BY lang
), unif AS (SELECT 1000000 // count(*) AS u FROM dtots),
drates AS MATERIALIZED (
  SELECT c.lang, c.tok, (c.n * 1000000000) // t.nn AS r
  FROM dcounts c JOIN dtots t USING (lang)
), a0 AS (
  SELECT lang, CAST((SELECT u FROM unif) AS HUGEINT) AS alpha FROM dtots
),
$rounds"""
  }
  private val domainReweightSql = {
    val sel = (1 to DrwRounds).map(i =>
      s"""SELECT CAST($i AS INT) AS round, f.lang,
    CAST(f.mass AS BIGINT) AS mix_mass, CAST(a.alpha AS BIGINT) AS alpha_ppm
  FROM f$i f JOIN a$i a USING (lang)""").mkString("\n  UNION ALL\n  ")
    s"""$drwChainSql
SELECT * FROM (
  $sel
)
ORDER BY round, lang"""
  }
  /** Resampling under the LEARNED mixture — [[domainMix]]'s
    * explode+gate machinery driven by [[drwTrained]]'s final-round
    * weights instead of hard-coded targets: closes train→apply for
    * the mixture the way [[seqPackBpe]] closes it for the tokenizer.
    * The per-domain multiplier is α_k·10⁶ div u (uniform weight → 1×
    * exactly): whole copies ride the scan via explode(sequence), the
    * fractional copy is the salted-h60 gate, so the output IS the
    * reweighted training corpus with copy_id for downstream packing
    * salt. The learned weights enter the plan as ≤|domains| literals —
    * at 100 TB this face is one corpus scan with zero shuffles. */
  /** The learned per-domain multipliers (ppm, 10⁶ = 1×) — α_k·10⁶
    * div u, uniform weight → exactly 1×. Shared by the memo-served
    * resample face and the model-table writer. */
  private def drwMultipliers(s: SparkSession, d: String): Seq[(String, Long)] = {
    val last = drwTrained(s, d).filter(_._1 == DrwRounds)
    val u = BigInt(1000000L) / last.size
    last.map { case (_, lang, _, a) => (lang, (a * 1000000 / u).toLong) }
  }
  /** The resample dataflow under a given multiplier set: whole copies
    * ride the scan via explode(sequence), the fractional copy is the
    * salted-h60 gate — one corpus scan, zero shuffles at any scale. */
  private def resampleWith(s: SparkSession, d: String,
      mult: Seq[(String, Long)]): DataFrame = {
    val multCol = mult.foldLeft(lit(null).cast("long")) {
      case (acc, (lg, m)) => when(col("lang") === lg, lit(m)).otherwise(acc) }
    val gate = (pmod(DupCorpus.h60(concat(lit("rw:"),
      col("doc_id").cast("string"))), lit(1000000L))
      < col("mult_ppm") % 1000000L).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), multCol.as("mult_ppm"))
      .withColumn("n_copies", expr("mult_ppm div 1000000") + gate)
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"), col("mult_ppm"),
        explode(sequence(lit(0), (col("n_copies") - 1).cast("int")))
          .as("copy_id"))
      .orderBy("doc_id", "copy_id")
  }
  private val domainResample: Q = (s, d) =>
    resampleWith(s, d, drwMultipliers(s, d))
  /** The learned mixture persisted as a parquet model table
    * ([[clfModelTable]]'s discipline applied to the DoReMi weights):
    * ≤|domains| (lang, mult_ppm) rows, the whole model a resampling
    * job needs. */
  private[graft] def drwModelTable(s: SparkSession, d: String): String =
    CachePool.memoized(("drwModelTable", d, DrwRounds, DrwVocab)) {
      import s.implicits._
      val table = "graft_drw_model_" + (d.hashCode & 0x7fffffff)
      graft.sources.ModelStore.write(
        drwMultipliers(s, d).toDF("lang", "mult_ppm"), table)
      table
    }
  private val domainMixtureStore: Q = (s, d) =>
    graft.sources.ModelStore.read(s, drwModelTable(s, d)).orderBy("lang")
  /** Resampling with the model TABLE as the source of truth — the
    * serving-job dataflow: load ≤|domains| rows from the catalog,
    * then the identical explode+gate projection. Same oracle text as
    * the memo-served face: the stored mixture IS the learned one. */
  private val domainResampleStored: Q = (s, d) => {
    val mult = graft.sources.ModelStore.read(s, drwModelTable(s, d))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    resampleWith(s, d, mult)
  }
  private val domainResampleSql = {
    val h = OraclePipeline.h60Sql("'rw:' || CAST(doc_id AS VARCHAR)")
    s"""$drwChainSql, dmult AS (
  SELECT lang, (alpha * 1000000) // (SELECT u FROM unif) AS mult_ppm
  FROM a$DrwRounds
), dres AS (
  SELECT doc_id, d.lang, mult_ppm,
    mult_ppm // 1000000
    + CASE WHEN $h % 1000000 < mult_ppm % 1000000 THEN 1 ELSE 0 END
      AS n_copies
  FROM documents d JOIN dmult USING (lang)
), dex AS (
  SELECT doc_id, lang, mult_ppm,
    unnest(range(0, CAST(n_copies AS BIGINT))) AS copy_id
  FROM dres WHERE n_copies > 0
)
SELECT doc_id, lang, CAST(mult_ppm AS BIGINT) AS mult_ppm,
  CAST(copy_id AS INT) AS copy_id
FROM dex ORDER BY doc_id, copy_id"""
  }
  /** Oracle mirror of the stored mixture table: the final-round
    * alphas scaled to multipliers — a mismatch means the parquet
    * round-trip corrupted the model. */
  private val domainMixtureStoreSql =
    s"""$drwChainSql
SELECT lang,
  CAST((alpha * 1000000) // (SELECT u FROM unif) AS BIGINT) AS mult_ppm
FROM a$DrwRounds ORDER BY lang"""

  // -------------------------------------------------- training shards
  /** Deterministic global shuffle into training shards — the "write the
    * training set" op: every doc gets a shard (16 here) and a
    * within-shard position from two independent salted hashes (RNG-free,
    * so re-runs and both engines place every row identically), and the
    * output is the per-shard MANIFEST: doc count, byte (char) total,
    * the head doc under the shard order, and a content checksum (sum of
    * the order keys). Every aggregate is O(1) per-group state — no
    * collect_list of the member ids, which at 100 TB would hold whole
    * shards in memory; the head-of-order is a min over a scalar
    * composite key (pos·2²⁰ + doc_id — the struct-free form DuckDB's
    * arg_min needs, exact in decimal(38,0)/HUGEINT). In production the
    * same projection feeds `write.partitionBy(shard)` and this manifest
    * is the verification face of the written shards. */
  private val ShardN = 16L
  private val shuffleShards: Q = (s, d) => {
    val a = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
      pmod(DupCorpus.h60(concat(lit("shard:"), col("doc_id").cast("string"))),
        lit(ShardN)).as("shard"),
      DupCorpus.h60(concat(lit("pos:"), col("doc_id").cast("string"))).as("pos"))
    a.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum("n_chars").as("n_chars_total"),
      expr("CAST(min(CAST(pos AS DECIMAL(38,0)) * 1048576 + doc_id) % 1048576 AS BIGINT)")
        .as("head_doc"),
      // Modular checksum: the raw 60-bit position-hash sum overflows BIGINT
      // (and DuckDB's DECIMAL→pandas path degrades to float64), so both
      // engines fold it mod 2^61 — exact int64 either way.
      expr("CAST(sum(CAST(pos AS DECIMAL(38,0))) % 2305843009213693952 AS BIGINT)")
        .as("checksum"))
      .orderBy("shard")
  }
  private val shuffleShardsSql = {
    val hs = OraclePipeline.h60Sql("'shard:' || CAST(doc_id AS VARCHAR)")
    val hp = OraclePipeline.h60Sql("'pos:' || CAST(doc_id AS VARCHAR)")
    s"""WITH a AS (
  SELECT doc_id, n_chars, $hs % $ShardN AS shard, $hp AS pos
  FROM documents
)
SELECT shard, count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
  CAST(min(CAST(pos AS HUGEINT) * 1048576 + doc_id) % 1048576 AS BIGINT)
    AS head_doc,
  CAST(sum(CAST(pos AS HUGEINT)) % 2305843009213693952 AS BIGINT) AS checksum
FROM a GROUP BY shard ORDER BY shard"""
  }

  // ------------------------------------------------------- BPE trainer
  /** Fixed-round BPE pair-merge training — the trainable subword
    * tokenizer the seq-pack / vocab-coverage family sizes for
    * (Sennrich et al.'s algorithm, public): start from the
    * character-split word vocabulary weighted by corpus frequency,
    * then K times count adjacent symbol pairs and merge the most
    * frequent one ((count desc, left, right) tie-break — total order,
    * so training is deterministic in both engines).
    *
    * Scale shape: every round touches only the DISTINCT-WORD relation
    * (vocabulary-sized, bounded — never the corpus; the corpus is
    * scanned once to build word frequencies), the per-round model
    * state is a ≤[[BpeCand]]-row candidate table (the kmeans-centroid
    * idiom), and the per-round plan stays flat via the [[DedupQueries]]
    * cluster-loop `localCheckpoint` discipline.
    *
    * MULTI-MERGE rounds (VERDICT r8 #2 — a real tokenizer needs
    * thousands of merges, and one driver round-trip per merge is a
    * driver-side bottleneck by construction): each round counts pairs
    * ONCE, collects the top-[[BpeCand]] candidates, and applies up to
    * [[BpeBatch]] of them in one pass. A candidate is applied iff it
    * shares NO symbol with any higher-ranked candidate (checked
    * against all predecessors in (count desc, l, r) order, picked or
    * not — a deterministic anti-chain, expressible as a NOT EXISTS
    * self-join in the oracle, unlike greedy pick-conditional
    * selection), and additionally iff no earlier candidate's merged
    * spelling l2+r2 equals one of its symbols (round 10, closing
    * ADVICE r9 #3's residual interaction: a merged symbol colliding
    * with a later pick's spelling could otherwise merge occurrences
    * that did not exist at count time). With both guards, same-batch
    * merges can neither create nor destroy each other's pair
    * occurrences — counts are exact and the batch is fully
    * order-insensitive; the replaces are still APPLIED in rank order
    * on both engines (cosmetic once non-interacting). Effective
    * merges per driver action: ~[[BpeBatch]]/2 instead of 1/2.
    *
    * Merge semantics (documented deviation, ADVICE r8 #3): the
    * space-sentinel `replace(' l r ', ' lr ')` is leftmost
    * NON-OVERLAPPING — abutting repeats ("A B A B") merge every other
    * occurrence per round, not greedily left-to-right as in Sennrich's
    * reference loop. Both engines share the semantics exactly; rounds
    * that find no pair are no-ops on both (the SQL chain's scalar
    * subqueries are COALESCE-guarded to a never-matching sentinel, so
    * an exhausted corpus no longer NULLs the chain).
    *
    * Training is memoized per dataset ([[CachePool.memoized]]), shared
    * by [[bpeTrain]] (the merge table) and [[bpeApply]] (per-doc
    * token-count compression readout over the final vocabulary). */
  private val BpeRounds = 16
  /** Candidates collected per round (driver model state, bounded). */
  private val BpeCand = 48
  /** Max merges applied per round. */
  private val BpeBatch = 12
  /** Checkpoint cadence: the un-checkpointed tail is ≤ this many
    * rounds of nested replaces — plan stays flat while halving the
    * checkpoint actions. */
  private val BpeCkptEvery = 2
  private def bpeWords(s: SparkSession, d: String): DataFrame =
    bpeWordsOver(Tables.documents(s, d))
  /** (word, freq, char-split symseq) over an arbitrary document
    * relation — the trainer's input, and the apply faces' replay
    * domain (always the corpus being TOKENIZED, which is what makes
    * serving total on words the trainer never saw). */
  private def bpeWordsOver(docs: DataFrame): DataFrame =
    docs
      .select(explode(toks).as("word")).filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("symseq",
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")))
  /** Anti-chain selection over the ranked candidate list: keep a
    * candidate iff no EARLIER candidate (by rank, selected or not)
    * shares a symbol with it OR spells, as its concatenation l2+r2, one
    * of this candidate's symbols (ADVICE r9 #3: without the spelling
    * guard, a higher-ranked pick whose merged symbol equals an existing
    * symbol lets a lower-ranked pick merge occurrences that did not
    * exist at count time). Take the first `m` keepers. With both
    * guards, same-batch merges can neither create nor destroy each
    * other's pair occurrences — counts are exact, order-insensitive.
    * Mirrors the oracle's NOT-EXISTS-over-predecessors exactly. */
  private[graft] def bpeSelect(cands: Seq[(String, String, Long)],
      m: Int): Seq[(String, String, Long)] =
    cands.zipWithIndex.filter { case ((l, r, _), i) =>
      !cands.take(i).exists { case (l2, r2, _) =>
        l2 == l || l2 == r || r2 == l || r2 == r ||
          (l2 + r2) == l || (l2 + r2) == r }
    }.map(_._1).take(m)
  private def bpeTrained(s: SparkSession, d: String)
      : (Seq[(Int, Int, String, String, Long)], DataFrame, Int) =
    bpeTrainedOver(s, ("bpe", d), bpeWords(s, d))
  /** The K driver-round trainer over an arbitrary word relation —
    * shared by the full-corpus trainer and the held-out-half trainer
    * of the OOV face. */
  private def bpeTrainedOver(s: SparkSession, memoKey: (String, String),
      input: DataFrame)
      : (Seq[(Int, Int, String, String, Long)], DataFrame, Int) =
    CachePool.memoized((memoKey, BpeRounds, BpeCand, BpeBatch)) {
      var words = input.localCheckpoint()
      var roundTrips = 0 // driver model round-trips (collects)
      val merges = Seq.newBuilder[(Int, Int, String, String, Long)]
      for (round <- 1 to BpeRounds) {
        val syms = split(trim(col("symseq")), " ")
        val prs = zip_with(slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))
        val top = words.select(col("freq"), explode(prs).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(BpeCand).collect()
        roundTrips += 1
        val picked = bpeSelect(top.toSeq.map(r =>
          (r.getString(0), r.getString(1), r.getLong(2))), BpeBatch)
        if (picked.nonEmpty) {
          picked.zipWithIndex.foreach { case ((l, r, c), j) =>
            merges += ((round, j + 1, l, r, c)) }
          words = words.withColumn("symseq",
            picked.foldLeft(col("symseq")) { case (e, (l, r, _)) =>
              replace(e, lit(s" $l $r "), lit(s" $l$r ")) })
          // checkpoint every BpeCkptEvery rounds (and at the end) —
          // the tail between checkpoints is ≤ 2 rounds of vocabulary-
          // sized nested replaces, re-run once by the next collect
          if (round % BpeCkptEvery == 0 || round == BpeRounds)
            words = words.localCheckpoint()
        }
      }
      (merges.result(), words, roundTrips)
    }
  /** Total effective merges + driver round-trips of the memoized
    * training run — the scale variables Round13Spec pins
    * (≥64 merges from ≤16 collects on the sf0.01 corpus). */
  private[graft] def bpeStats(s: SparkSession, d: String): (Int, Int) = {
    val t = bpeTrained(s, d); (t._1.size, t._3)
  }
  private val bpeTrain: Q = (s, d) => {
    import s.implicits._
    bpeTrained(s, d)._1
      .toDF("merge_round", "pick_rank", "lhs", "rhs", "pair_count")
      .orderBy("merge_round", "pick_rank")
  }
  private val bpeApply: Q = (s, d) =>
    bpeApplyOver(s, d, bpeTrained(s, d)._2
      .select(col("word"), size(split(trim(col("symseq")), " "))
        .cast("long").as("n_syms")))
  /** The learned subword vocabulary — the artifact a trained tokenizer
    * actually ships (subword → corpus occurrences + distinct words
    * containing it): explode the final merged symbol sequences,
    * weight by word frequency. Vocabulary-sized end to end. */
  private val bpeVocab: Q = (s, d) => {
    bpeTrained(s, d)._2
      .select(col("freq"),
        explode(split(trim(col("symseq")), " ")).as("subword"))
      .groupBy("subword")
      .agg(sum("freq").as("occurrences"), count(lit(1)).as("n_words"))
      .orderBy(col("occurrences").desc, col("subword"))
  }

  // ------------------------------------------- BPE model persistence
  /** The trained merge table persisted as a catalog model table
    * (VERDICT r11 #3: BPE was the last model family living only in a
    * session memo) — (merge_round, pick_rank, lhs, rhs, pair_count),
    * i.e. the WHOLE shipped tokenizer: replaying the merges in
    * (merge_round, pick_rank) order over a char-split word
    * reconstructs its subword sequence exactly. ~[[BpeRounds]]×
    * [[BpeBatch]] rows; atomic retrains via [[graft.sources.ModelStore]]. */
  private[graft] def bpeModelTable(s: SparkSession, d: String): String =
    CachePool.memoized(("bpeModelTable", d, BpeRounds, BpeCand, BpeBatch)) {
      import s.implicits._
      val table = "graft_bpe_merges_" + (d.hashCode & 0x7fffffff)
      graft.sources.ModelStore.write(
        bpeTrained(s, d)._1
          .toDF("merge_round", "pick_rank", "lhs", "rhs", "pair_count"),
        table)
      table
    }
  /** Round-trip face: hash-matching [[bpeTrain]]'s oracle text proves
    * train → parquet → catalog read loses nothing. */
  private val bpeModelStore: Q = (s, d) =>
    graft.sources.ModelStore.read(s, bpeModelTable(s, d))
      .orderBy("merge_round", "pick_rank")

  /** The stored merges in global apply order — the ≤[[BpeRounds]]×
    * [[BpeBatch]]-row model state a serving/tokenizing job loads at
    * startup (the classifier's 16-weight collect, for BPE). */
  private[graft] def bpeStoredMerges(s: SparkSession, d: String)
      : Seq[(String, String)] = {
    import s.implicits._
    graft.sources.ModelStore.read(s, bpeModelTable(s, d))
      .select(col("merge_round"), col("pick_rank"), col("lhs"), col("rhs"))
      .as[(Int, Int, String, String)].collect().toSeq
      .sortBy(t => (t._1, t._2)).map(t => (t._3, t._4))
  }

  /** The shared readout finish of the apply faces: per-doc token and
    * subword counts from a (word, n_syms) lookup joined in as a
    * broadcast vocabulary-sized relation. */
  private def bpeApplyOver(s: SparkSession, d: String,
                           words: DataFrame): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(words), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("n_syms").as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_tokens"), 6)
          .as("bpe_per_word"))
      .orderBy("doc_id")

  /** The `symseq` column REPLAYED under the stored merges — one
    * vocabulary-sized projection of chained replaces; deterministic
    * string ops, so the replayed sequences equal the training-end ones
    * exactly. Shared by every served-from-catalog tokenizer face. */
  private def bpeReplayed(s: SparkSession, d: String): Column =
    bpeStoredMerges(s, d).foldLeft(col("symseq")) { case (e, (l, r)) =>
      replace(e, lit(s" $l $r "), lit(s" $l$r ")) }

  /** Tokenization served FROM the catalog — the path a process that
    * did NOT train runs: load the stored merges (driver model state),
    * replay them over the char-split vocabulary, and emit the same
    * per-doc readout as [[bpeApply]]. Same oracle text as
    * `text_bpe_apply`: the hash match proves the stored model IS the
    * trained tokenizer end-to-end. */
  private val bpeApplyStored: Q = (s, d) =>
    bpeApplyOver(s, d, bpeWords(s, d).select(col("word"),
      size(split(trim(bpeReplayed(s, d)), " ")).cast("long").as("n_syms")))

  /** The shipped subword vocabulary re-derived FROM the catalog —
    * [[bpeVocab]]'s artifact produced by a serving job that only holds
    * the merge table (same oracle text as `text_bpe_vocab`), completing
    * the stored-tokenizer set: model ↔ apply ↔ vocabulary. */
  private val bpeVocabStored: Q = (s, d) =>
    bpeWords(s, d)
      .select(col("freq"),
        explode(split(trim(bpeReplayed(s, d)), " ")).as("subword"))
      .groupBy("subword")
      .agg(sum("freq").as("occurrences"), count(lit(1)).as("n_words"))
      .orderBy(col("occurrences").desc, col("subword"))

  /** The OOV serving contract ORACLE-GATED (ADVICE r12 follow-through:
    * the spec pins replay-on-unseen; this face makes the oracle prove
    * it): train the tokenizer under a RESTRICTED training vocabulary —
    * words lexicographically below [[BpeOovSplit]], a deterministic
    * stand-in for any train/serve domain shift (a doc-level split
    * can't produce OOV here: the synthetic corpus's 31-word vocabulary
    * is covered by any half) — then tokenize the WHOLE corpus by
    * replaying the restricted merges over the full vocabulary. Every
    * held-out word decomposes through whatever merges still apply
    * (trained merges fire on shared character pairs, so replay on
    * unseen words is real merging, not just char counting — pinned in
    * Round17Spec), exactly like the streaming face. The oracle
    * re-derives the restricted training chain AND the full-vocabulary
    * replay itself, so the hash match proves the cross-domain apply
    * semantics end to end (an inner-join-on-training-vocab
    * implementation drops the held-out words from every doc and
    * hash-mismatches). */
  private[graft] val BpeOovSplit = "n"
  /** The `symseq` column replayed under the RESTRICTED-vocabulary
    * merges (trained on words < [[BpeOovSplit]] only). */
  private def bpeOovReplayed(s: SparkSession, d: String): Column =
    bpeTrainedOver(s, ("bpeOov", d),
      bpeWords(s, d).filter(col("word") < BpeOovSplit))._1
      .sortBy(t => (t._1, t._2))
      .foldLeft(col("symseq")) { case (e, (_, _, l, r, _)) =>
        replace(e, lit(s" $l $r "), lit(s" $l$r ")) }
  private val bpeApplyOov: Q = (s, d) =>
    bpeApplyOver(s, d, bpeWords(s, d).select(col("word"),
      size(split(trim(bpeOovReplayed(s, d)), " ")).cast("long")
        .as("n_syms")))
  /** Round17Spec probe: (held-out vocabulary size, held-out words on
    * which at least one restricted-trained merge fired) — the proof
    * the OOV face exercises real cross-domain replay, not just char
    * counting. */
  private[graft] def bpeOovStats(s: SparkSession, d: String): (Long, Long) = {
    val held = bpeWords(s, d).filter(col("word") >= BpeOovSplit)
      .select(col("word"),
        size(split(trim(bpeOovReplayed(s, d)), " ")).as("n_syms"),
        length(col("word")).as("n_chars"))
    (held.count(),
      held.filter(col("n_syms") < col("n_chars")).count())
  }

  /** The K training rounds unrolled as chained CTEs (the oracle
    * re-derives the merges itself — nothing learned leaks into the
    * SQL): s0 = char-split vocab; each round r = pair count over
    * s(r-1) via lateral unnest, top-[[BpeCand]] candidates by
    * (cnt desc, l, r), the NOT-EXISTS anti-chain pick of up to
    * [[BpeBatch]], and the rank-ordered replace chain. Every scalar
    * subquery is COALESCE-guarded to the never-occurring chr(1)
    * sentinel, so a round with fewer than [[BpeBatch]] picks (or
    * none) degrades to no-op replaces instead of NULLing the chain. */
  private def bpeChainSql: String = bpeChainSqlFor("")

  /** One round's COALESCE-guarded replace chain against k\$i — shared
    * by the training chain and the OOV face's apply chain. */
  private def bpeRepsSql(i: Int): String =
    (1 to BpeBatch).foldLeft("symseq") { (e, j) =>
      s"""replace($e,
    COALESCE((SELECT ' ' || l || ' ' || r || ' ' FROM k$i WHERE pk = $j), chr(1)),
    COALESCE((SELECT ' ' || l || r || ' ' FROM k$i WHERE pk = $j), chr(1)))"""
    }

  private def bpeChainSqlFor(wordWhere: String): String = {
    val rounds = (1 to BpeRounds).map { i =>
      val reps = bpeRepsSql(i)
      s"""p$i AS MATERIALIZED (
  SELECT syms[g.i] AS l, syms[g.i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, string_split(trim(symseq), ' ') AS syms FROM s${i - 1}),
    unnest(range(1, len(syms))) AS g(i)
  GROUP BY 1, 2
), c$i AS MATERIALIZED (
  SELECT l, r, cnt, row_number() OVER (ORDER BY cnt DESC, l, r) AS rk
  FROM p$i QUALIFY rk <= $BpeCand
), k$i AS MATERIALIZED (
  SELECT l, r, cnt, row_number() OVER (ORDER BY rk) AS pk
  FROM c$i c
  WHERE NOT EXISTS (SELECT 1 FROM c$i c2 WHERE c2.rk < c.rk
    AND (c2.l = c.l OR c2.l = c.r OR c2.r = c.l OR c2.r = c.r
         OR c2.l || c2.r = c.l OR c2.l || c2.r = c.r))
  QUALIFY pk <= $BpeBatch
), s$i AS MATERIALIZED (
  SELECT word, freq, $reps AS symseq
  FROM s${i - 1}
)"""
    }
    s"""WITH w0 AS MATERIALIZED (
  SELECT word, count(*) AS freq FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
  ) WHERE word <> '' $wordWhere GROUP BY word
), s0 AS MATERIALIZED (
  SELECT word, freq,
    ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS symseq
  FROM w0
), ${rounds.mkString(", ")}"""
  }
  private val bpeTrainSql = {
    val sel = (1 to BpeRounds).map(i =>
      s"SELECT $i AS merge_round, pk, l, r, cnt FROM k$i")
      .mkString("\n  UNION ALL\n  ")
    s"""$bpeChainSql
SELECT CAST(merge_round AS INT) AS merge_round, CAST(pk AS INT) AS pick_rank,
  l AS lhs, r AS rhs, cnt AS pair_count
FROM (
  $sel
)
ORDER BY merge_round, pick_rank"""
  }
  private val bpeVocabSql =
    s"""$bpeChainSql
SELECT subword, CAST(sum(freq) AS BIGINT) AS occurrences,
  count(*) AS n_words
FROM (
  SELECT freq, unnest(string_split(trim(symseq), ' ')) AS subword
  FROM s$BpeRounds
)
GROUP BY subword ORDER BY occurrences DESC, subword"""
  private val bpeApplySql =
    s"""$bpeChainSql, wf AS (
  SELECT word, CAST(len(string_split(trim(symseq), ' ')) AS BIGINT) AS n_syms
  FROM s$BpeRounds
)
SELECT doc_id, count(*) AS n_tokens,
  CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens,
  round(CAST(sum(n_syms) AS DOUBLE) / count(*), 6) AS bpe_per_word
FROM (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
) dt JOIN wf USING (word)
WHERE word <> ''
GROUP BY doc_id ORDER BY doc_id"""

  /** OOV-face oracle: the training chain runs over the restricted
    * vocabulary only (w0's predicate), then the FULL corpus vocabulary replays
    * the same k\$i merge tables round by round (a0..aK — chained
    * MATERIALIZED CTEs like the trainer's own s-chain) before the
    * per-doc join. Unseen words simply pass through rounds whose
    * merges never match. */
  private val bpeApplyOovSql = {
    val applyRounds = (1 to BpeRounds).map { i =>
      s""", a$i AS MATERIALIZED (
  SELECT word, ${bpeRepsSql(i)} AS symseq FROM a${i - 1}
)"""
    }.mkString
    s"""${bpeChainSqlFor(s"AND word < '$BpeOovSplit'")}, a0 AS MATERIALIZED (
  SELECT word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS symseq
  FROM (
    SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS word
    FROM documents
  ) WHERE word <> ''
)$applyRounds, wf AS MATERIALIZED (
  SELECT word, CAST(len(string_split(trim(symseq), ' ')) AS BIGINT) AS n_syms
  FROM a$BpeRounds
)
SELECT doc_id, count(*) AS n_tokens,
  CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens,
  round(CAST(sum(n_syms) AS DOUBLE) / count(*), 6) AS bpe_per_word
FROM (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
) dt JOIN wf USING (word)
WHERE word <> ''
GROUP BY doc_id ORDER BY doc_id"""
  }

  val queries: Map[String, Q] = Map(
    "text_bpe_train" -> bpeTrain,
    "text_bpe_apply" -> bpeApply,
    "text_bpe_model_store" -> bpeModelStore,
    "text_bpe_apply_stored" -> bpeApplyStored,
    "text_bpe_apply_oov" -> bpeApplyOov,
    "text_bpe_vocab" -> bpeVocab,
    "text_bpe_vocab_stored" -> bpeVocabStored,
    "text_langid" -> langid,
    "text_quality" -> quality,
    "text_tokens" -> tokens,
    "text_fingerprint" -> fingerprint,
    "text_profile" -> profile,
    "text_profile_approx" -> profileApprox,
    "text_profile_sketch" -> profileSketch,
    "text_clean_corpus" -> cleanCorpus,
    "text_seq_pack" -> seqPack,
    "text_seq_pack_bpe" -> seqPackBpe,
    "text_shard_plan" -> shardPlan,
    "text_shard_write" -> shardWrite,
    "text_bpe_fertility" -> bpeFertility,
    "text_sample_split" -> sampleSplit,
    "text_decontaminate" -> decontaminate,
    "text_ngram_topk" -> ngramTopk,
    "text_ngram_topk_agg" -> ngramTopkAgg,
    "text_vocab" -> vocab,
    "text_heaps_curve" -> heapsCurve,
    "text_burstiness" -> burstiness,
    "text_collocations" -> collocations,
    "text_vocab_coverage" -> vocabCoverage,
    "text_oov_rate" -> oovRate,
    "text_lang_confusion" -> langConfusion,
    "text_tfidf_top" -> tfidfTop,
    "text_stratified_sample" -> stratifiedSample,
    "text_repetition_filter" -> repetitionFilter,
    "text_pii_scrub" -> piiScrub,
    "text_domain_mix" -> domainMix,
    "text_domain_reweight" -> domainReweight,
    "text_domain_resample" -> domainResample,
    "text_temperature_sample" -> tempSample,
    "text_diversity_profile" -> diversityProfile,
    "text_bigram_lm" -> bigramLm,
    "text_lm_score" -> lmScore,
    "text_hash_embedding" -> hashEmbedding,
    "text_quality_buckets" -> qualityBuckets,
    "text_chunk_overlap" -> chunkOverlap,
    "text_chunk_dedup" -> chunkDedup,
    "text_surprisal" -> surprisal,
    "text_filter_funnel" -> filterFunnel,
    "text_classifier_score" -> classifierScore,
    "text_classifier_auc" -> classifierAuc,
    "text_classifier_train" -> classifierTrain,
    "text_classifier_score_trained" -> classifierScoreTrained,
    "text_classifier_eval" -> classifierEval,
    "text_classifier_select" -> classifierSelect,
    "text_classifier_model_store" -> classifierModelStore,
    "text_domain_mixture_store" -> domainMixtureStore,
    "text_domain_resample_stored" -> domainResampleStored,
    "text_classifier_score_stored" -> classifierScoreStored,
    "text_dsir_weights" -> dsirWeights,
    "text_shuffle_shards" -> shuffleShards)

  val oracle: Map[String, String] = Map(
    "text_bpe_train" -> bpeTrainSql,
    "text_bpe_apply" -> bpeApplySql,
    // stored faces share the trained faces' oracle text verbatim: the
    // hash match proves the catalog round-trip loses nothing
    "text_bpe_model_store" -> bpeTrainSql,
    "text_bpe_apply_stored" -> bpeApplySql,
    "text_bpe_apply_oov" -> bpeApplyOovSql,
    "text_bpe_vocab" -> bpeVocabSql,
    "text_bpe_vocab_stored" -> bpeVocabSql,
    "text_langid" -> langidSql,
    "text_quality" -> qualitySql,
    "text_tokens" -> tokensSql,
    "text_fingerprint" -> fingerprintSql,
    "text_profile" -> profileSql,
    "text_profile_approx" -> profileApproxSql,
    "text_profile_sketch" -> profileSketchSql,
    "text_clean_corpus" -> cleanCorpusSql,
    "text_seq_pack" -> seqPackSql,
    "text_seq_pack_bpe" -> seqPackBpeSql,
    "text_shard_plan" -> shardPlanSql,
    "text_shard_write" -> shardWriteSql,
    "text_bpe_fertility" -> bpeFertilitySql,
    "text_sample_split" -> sampleSplitSql,
    "text_decontaminate" -> decontaminateSql,
    "text_ngram_topk" -> ngramTopkSql,
    // same math, different physical path (bounded-buffer aggregate)
    "text_ngram_topk_agg" -> ngramTopkSql,
    "text_vocab" -> vocabSql,
    "text_heaps_curve" -> heapsCurveSql,
    "text_burstiness" -> burstinessSql,
    "text_collocations" -> collocationsSql,
    "text_vocab_coverage" -> vocabCoverageSql,
    "text_oov_rate" -> oovRateSql,
    "text_lang_confusion" -> langConfusionSql,
    "text_tfidf_top" -> tfidfTopSql,
    "text_stratified_sample" -> stratifiedSampleSql,
    "text_repetition_filter" -> repetitionFilterSql,
    "text_pii_scrub" -> piiScrubSql,
    "text_domain_mix" -> domainMixSql,
    "text_domain_reweight" -> domainReweightSql,
    "text_domain_resample" -> domainResampleSql,
    "text_temperature_sample" -> tempSampleSql,
    "text_diversity_profile" -> diversityProfileSql,
    "text_bigram_lm" -> bigramLmSql,
    "text_lm_score" -> lmScoreSql,
    "text_hash_embedding" -> hashEmbeddingSql,
    "text_quality_buckets" -> qualityBucketsSql,
    "text_chunk_overlap" -> chunkOverlapSql,
    "text_chunk_dedup" -> chunkDedupSql,
    "text_surprisal" -> surprisalSql,
    "text_filter_funnel" -> filterFunnelSql,
    "text_classifier_score" -> classifierScoreSql,
    "text_classifier_auc" -> classifierAucSql,
    "text_classifier_train" -> classifierTrainSql,
    "text_classifier_score_trained" -> classifierScoreTrainedSql,
    "text_classifier_eval" -> classifierEvalSql,
    "text_classifier_select" -> classifierSelectSql,
    "text_classifier_model_store" -> classifierModelStoreSql,
    "text_domain_mixture_store" -> domainMixtureStoreSql,
    // same text as the memo-served resample: the stored mixture IS the
    // learned one, so serving from the table must reproduce it exactly
    "text_domain_resample_stored" -> domainResampleSql,
    // same text as the trained-score face: the stored model IS the
    // pocket, so serving from the table must reproduce it exactly
    "text_classifier_score_stored" -> classifierScoreTrainedSql,
    "text_dsir_weights" -> dsirWeightsSql,
    "text_shuffle_shards" -> shuffleShardsSql)
}
