package graft.pipeline

import graft.oracle.OraclePipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table (north-star
  * LLM-data-pipeline requirements; the reference itself has no dedup —
  * these extend its surface per SURVEY.md §7.2 M6).
  *
  * All run over [[DupCorpus.corpus]] (documents + synthetic exact/near
  * dups) so the operators have real duplicates to find. Scale posture:
  * every join here is an equi-join on a bounded-fanout key (hash bucket,
  * LSH band, or blocking key) — no cross joins, no theta joins.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Distinct word-3-gram shingles per doc, built relationally
    * (posexplode + window lead): every operator here is whole-stage
    * codegen'd. The equivalent transform(sequence(...)) lambda is a
    * higher-order function, which Spark always interprets — and the
    * interpreter re-evaluates the split() subtree per element (measured
    * 10×+ slower on the bench). */
  private def shingleRows(corpus: DataFrame): DataFrame = {
    val toks = corpus.select(col("doc_id"),
      posexplode(split(lower(col("text")), " ")).as(Seq("idx", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("idx")
    toks
      .withColumn("t1", lead("tok", 1).over(w))
      .withColumn("t2", lead("tok", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
      .distinct()
  }

  // ---------------------------------------------------------------- exact
  /** Exact dedup: hash-groupBy on md5(text), keep min doc_id. One
    * shuffle on the hash — the 100 TB plan (map-side partial agg on
    * md5 keys; no text column survives past the projection). */
  private val exact: Q = (s, d) =>
    DupCorpus.corpus(s, d)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min("doc_id").as("keeper_doc_id"), count("*").as("dup_count"))
      .orderBy("keeper_doc_id")
  private val exactSql =
    s"""$DupCte SELECT md5(text) AS text_md5, min(doc_id) AS keeper_doc_id,
  count(*) AS dup_count
FROM dup GROUP BY md5(text) ORDER BY keeper_doc_id"""

  // -------------------------------------------------------------- minhash
  /** MinHash(k=8) + banded LSH (b=4, r=2) near-dup pairs, verified with
    * exact shingle Jaccard ≥ 0.4. The candidate join is an equi-join on
    * (band_idx, k1, k2) — pairs never materialize beyond LSH collisions,
    * which is the property that survives 100 TB. */
  private val minhash: Q = (s, d) => {
    val sh = shingleRows(DupCorpus.corpus(s, d))
    val minAggs = (0 to 7).map(i =>
      min(DupCorpus.h60Seeded(i, col("shingle"))).as(s"m$i"))
    val sig = sh.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    val bands = sig.select(col("doc_id"), expr(
      """inline(array(
        struct(0 as band_idx, m0 as k1, m1 as k2),
        struct(1 as band_idx, m2 as k1, m3 as k2),
        struct(2 as band_idx, m4 as k1, m5 as k2),
        struct(3 as band_idx, m6 as k1, m7 as k2)))"""))
    val a = bands.as("a"); val b = bands.as("b")
    val cand = a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.k1") === col("b.k1") && col("a.k2") === col("b.k2") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val nsh = sh.groupBy("doc_id").agg(count("*").as("n"))
    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy("doc_a", "doc_b").agg(count("*").as("ni"))
    val j = col("ni").cast("double") /
      (col("na.n") + col("nb.n") - col("ni"))
    inter
      .join(nsh.as("na"), col("doc_a") === col("na.doc_id"))
      .join(nsh.as("nb"), col("doc_b") === col("nb.doc_id"))
      .filter(j >= 0.4)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }
  private val minhashSql = {
    val mins = (0 to 7).map(i =>
      s"    min(${h60SeededSql(i, "shingle")}) AS m$i").mkString(",\n")
    s"""$DupCte$ShingleCtes, sig AS (
  SELECT doc_id,
$mins
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id, b.band_idx,
    CASE b.band_idx WHEN 0 THEN m0 WHEN 1 THEN m2 WHEN 2 THEN m4 ELSE m6 END AS k1,
    CASE b.band_idx WHEN 0 THEN m1 WHEN 1 THEN m3 WHEN 2 THEN m5 ELSE m7 END AS k2
  FROM sig, (SELECT unnest([0,1,2,3]) AS band_idx) b
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.k1 = b.k1 AND a.k2 = b.k2
   AND a.doc_id < b.doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
  round(CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni), 6) AS jaccard
FROM inter i
JOIN nsh na ON na.doc_id = i.doc_a
JOIN nsh nb ON nb.doc_id = i.doc_b
WHERE CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni) >= 0.4
ORDER BY doc_a, doc_b"""
  }

  // -------------------------------------------------------------- simhash
  /** SimHash(60-bit) near-dup pairs: per-token 60-bit hashes vote per
    * bit (majority with multiplicity), banded by 4×15-bit chunks for the
    * candidate equi-join, verified with hamming distance ≤ 10. */
  private val simhash: Q = (s, d) => {
    val toks = DupCorpus.corpus(s, d)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("tok"))
      .select(col("doc_id"), DupCorpus.h60(col("tok")).as("h"))
    val ntok = toks.groupBy("doc_id").agg(count("*").as("n"))
    val bitcnt = toks
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(59))).as("j"))
      .select(col("doc_id"), col("j"),
        expr("(h div shiftleft(cast(1 as bigint), j)) % 2").as("bit"))
      .groupBy("doc_id", "j").agg(sum("bit").as("cnt"))
    val fp = bitcnt.join(ntok, "doc_id")
      .select(col("doc_id"),
        when(col("cnt") * 2 > col("n"),
          expr("shiftleft(cast(1 as bigint), j)")).otherwise(0L).as("bv"))
      .groupBy("doc_id").agg(sum("bv").as("fp"))
    val chunks = fp.select(col("doc_id"), col("fp"),
      explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk",
        expr("(fp div shiftleft(cast(1 as bigint), c * 15)) % 32768"))
    val a = chunks.as("a"); val b = chunks.as("b")
    a.join(b,
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 10)
      .orderBy("doc_a", "doc_b")
  }
  private val simhashSql =
    s"""$DupCte, toks AS (
  SELECT doc_id, ${h60Sql("t.tok")} AS h
  FROM dup, unnest(string_split(lower(text), ' ')) AS t(tok)
), ntok AS (
  SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
), bitcnt AS (
  SELECT doc_id, j.j, sum((h // (CAST(1 AS BIGINT) << j.j)) % 2) AS cnt
  FROM toks, (SELECT unnest(range(0, 60)) AS j) j
  GROUP BY doc_id, j.j
), fp AS (
  SELECT b.doc_id,
    CAST(sum(CASE WHEN b.cnt * 2 > n.n THEN CAST(1 AS BIGINT) << b.j ELSE 0 END) AS BIGINT) AS fp
  FROM bitcnt b JOIN ntok n ON b.doc_id = n.doc_id
  GROUP BY b.doc_id
), chunks AS (
  SELECT doc_id, fp, c.c, (fp // (CAST(1 AS BIGINT) << (c.c * 15))) % 32768 AS chunk
  FROM fp, (SELECT unnest([0,1,2,3]) AS c) c
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
FROM chunks a JOIN chunks b
  ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= 10
ORDER BY doc_a, doc_b"""

  // ------------------------------------------------------- ngram jaccard
  /** Exact n-gram Jaccard over blocked candidates: block on (lang,
    * n_chars÷200 bucket ±1) via an exploded-bucket equi-join, then exact
    * distinct-shingle Jaccard ≥ 0.5. The blocked equi-join is the
    * scale-safe alternative to the |Δbucket|≤1 theta join. */
  private val ngramJaccard: Q = (s, d) => {
    val corpus = DupCorpus.corpus(s, d)
    val docs = corpus.select(col("doc_id"), col("lang"),
      expr("n_chars div 200").as("bucket"))
    val bexp = docs.select(col("doc_id").as("doc_b_id"), col("lang"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
    val cand = docs.as("a")
      .join(bexp.as("b"),
        col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_b_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_b_id").as("doc_b"))
    val sh = shingleRows(corpus)
    val nsh = sh.groupBy("doc_id").agg(count("*").as("n"))
    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy("doc_a", "doc_b").agg(count("*").as("ni"))
    val j = col("ni").cast("double") / (col("na.n") + col("nb.n") - col("ni"))
    inter
      .join(nsh.as("na"), col("doc_a") === col("na.doc_id"))
      .join(nsh.as("nb"), col("doc_b") === col("nb.doc_id"))
      .filter(j >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }
  private val ngramJaccardSql =
    s"""$DupCte$ShingleCtes, docs AS (
  SELECT doc_id, lang, n_chars // 200 AS bucket FROM dup
), bexp AS (
  SELECT doc_id AS doc_b_id, lang, unnest([bucket - 1, bucket, bucket + 1]) AS bucket
  FROM docs
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_b_id AS doc_b
  FROM docs a JOIN bexp b
    ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_b_id
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
  round(CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni), 6) AS jaccard
FROM inter i
JOIN nsh na ON na.doc_id = i.doc_a
JOIN nsh nb ON nb.doc_id = i.doc_b
WHERE CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni) >= 0.5
ORDER BY doc_a, doc_b"""

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> exact,
    "dedup_minhash" -> minhash,
    "dedup_simhash" -> simhash,
    "dedup_ngram_jaccard" -> ngramJaccard)

  val oracle: Map[String, String] = Map(
    "dedup_exact" -> exactSql,
    "dedup_minhash" -> minhashSql,
    "dedup_simhash" -> simhashSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql)
}
