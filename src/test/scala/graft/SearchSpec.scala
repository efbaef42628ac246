package graft

import graft.pipeline.SearchQueries
import org.apache.spark.sql.functions._

/** Properties of the search/retrieval family the oracle compare can't
  * see: fuzzy-linkage recall against the planted corruption pairs,
  * bounded candidate volume under the blocking cap, posting-prefix
  * boundedness, and search's scan-level term pushdown. */
class SearchSpec extends SparkSpec {

  test("edit-distance linkage: finds every planted corruption pair, nothing wild") {
    val pairs = SearchQueries.queries("dedup_edit_distance")(spark, Sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Tables.documents(spark, Sf)
      .filter(col("doc_id") % 13 === 0).select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 30000)).toSet
    val missed = planted -- pairs
    assert(missed.isEmpty, s"planted corruption pairs missed: $missed")
    // anything extra must be a genuine same-prefix low-distance pair —
    // and there should be few of them relative to the planted set
    assert(pairs.size <= planted.size * 3,
      s"${pairs.size} pairs vs ${planted.size} planted — blocking too loose")
  }

  test("edit-distance linkage: candidate volume tracks corruption, not corpus²") {
    // pairs sharing a (lang, prefix16) block, pre-verify: the quadratic
    // risk surface. With the content-bearing prefix key it stays within
    // a small multiple of the planted-pair count.
    val docs = Tables.documents(spark, Sf).count()
    val planted = Tables.documents(spark, Sf)
      .filter(col("doc_id") % 13 === 0).count()
    val verified = SearchQueries.queries("dedup_edit_distance")(spark, Sf).count()
    assert(verified >= planted, "verified pairs below planted count")
    assert(verified < docs, // ≪ n·(n−1)/2 — linkage output is corruption-scale
      s"$verified pairs vs $docs docs — pair volume not corruption-bound")
  }

  test("inverted index: postings capped at PostK, df/tf consistent with corpus") {
    val idx = SearchQueries.queries("text_inverted_index")(spark, Sf)
    val bad = idx.filter(
      size(split(col("postings"), ",")) > SearchQueries.PostK).count()
    assert(bad === 0L, s"$bad tokens exceed the $SearchQueries posting cap")
    // df ≤ corpus size; postings length = min(df, PostK)
    val n = Tables.documents(spark, Sf).count()
    val rows = idx.select(col("df"),
      size(split(col("postings"), ",")).as("np")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) <= n)
      assert(r.getInt(1) == math.min(r.getLong(0), SearchQueries.PostK.toLong),
        s"posting prefix length ${r.getInt(1)} != min(df=${r.getLong(0)}, cap)")
    }
  }

  test("keyword search: conjunctive semantics and integer ranking") {
    val hits = SearchQueries.queries("text_keyword_search")(spark, Sf).collect()
    assert(hits.nonEmpty, "no conjunctive matches at sf0.001")
    // every hit really contains all query terms
    val ids = hits.map(_.getLong(0))
    val docs = Tables.documents(spark, Sf)
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    hits.foreach { h =>
      val t = docs(h.getLong(0))
      SearchQueries.Terms.foreach(term =>
        assert(t.contains(term), s"doc ${h.getLong(0)} missing '$term'"))
    }
    // scores are non-increasing in output order (integer rank contract)
    val scores = hits.map(_.getLong(2))
    assert(scores.sameElements(scores.sortBy(-_)), "scores not ranked desc")
  }

  test("search faces push the term filter into the tf derivation (no full-index scan)") {
    val plan = SearchQueries.queries("text_keyword_search")(spark, Sf)
      .queryExecution.executedPlan.toString
    // the IN-filter must sit below the aggregate: the only generate
    // (explode) feeds a filter on token before any exchange
    assert(plan.contains("vector"), "term literal absent from physical plan")
    val noCartesian = !plan.contains("CartesianProduct")
    assert(noCartesian)
  }

  test("bm25: scores positive, top-1 beats bottom ranked, matches brute recompute for one doc") {
    val r = SearchQueries.queries("text_bm25_topk")(spark, Sf).collect()
    assert(r.length > 1)
    val scores = r.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.head >= scores.last)
    // brute recompute for the top doc via first principles
    val docId = r.head.getLong(0)
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), split(lower(col("text")), " ").as("t")).collect()
      .map(x => x.getLong(0) -> x.getSeq[String](1)).toMap
    val n = docs.size
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val expected = SearchQueries.Terms.map { term =>
      val tfd = docs(docId).count(_ == term)
      if (tfd == 0) 0.0 else {
        val df = docs.values.count(_.contains(term))
        val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        val dl = docs(docId).size
        idf * tfd * (SearchQueries.BmK1 + 1) /
          (tfd + SearchQueries.BmK1 *
            (1 - SearchQueries.BmB + SearchQueries.BmB * dl / avgdl))
      }
    }.sum
    assert(math.abs(r.head.getDouble(1) - expected) < 1e-4,
      s"bm25 ${r.head.getDouble(1)} vs brute $expected")
  }
}
