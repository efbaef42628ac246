package graft

import graft.pipeline.TextQueries
import org.apache.spark.sql.functions._

/** Semantic invariants of the prep compositions — the oracle compare
  * proves Spark ≡ DuckDB, these pin that the pipelines mean what they
  * claim on any corpus. */
class PrepSpec extends SparkSpec {

  test("clean corpus: stage counts are a filtration") {
    val r = TextQueries.queries("text_clean_corpus")(spark, Sf)
      .agg(sum("n_docs"), sum("n_quality_pass"), sum("n_kept"),
        sum("n_dups_removed"), min("n_kept")).head
    val (docs, pass, kept, dups) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(docs >= pass && pass >= kept, "each stage only removes docs")
    assert(dups === pass - kept)
    assert(kept > 0 && dups > 0, "both stages must actually fire on the corpus")
    assert(r.getLong(4) >= 0)
  }

  test("seq pack: bins partition the corpus and never overflow by more than one doc") {
    val docs = Tables.documents(spark, Sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
    val (nDocs, nTokens, maxDoc) = {
      val r = docs.agg(count(lit(1)), sum("n"), max("n")).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val bins = TextQueries.queries("text_seq_pack")(spark, Sf)
    val b = bins.agg(sum("n_docs"), sum("bin_tokens"), max("bin_tokens")).head
    assert(b.getLong(0) === nDocs, "every doc lands in exactly one bin")
    assert(b.getLong(1) === nTokens, "token mass is conserved")
    // a bin spans one 512 range of the cumulative line plus at most the
    // doc that crossed its boundary
    assert(b.getLong(2) <= 512 + maxDoc)
    // density: bins are occupied ranges of a contiguous cumulative
    // line, so a group never uses more bins than the ceil(tokens/512)
    // a perfect packer would need
    val over = bins.groupBy("lang", "shard")
      .agg(count(lit(1)).as("n_bins"), sum("bin_tokens").as("tot"))
      .filter(col("n_bins") > ceil(col("tot").cast("double") / 512.0))
    assert(over.count() === 0)
  }

  test("filter funnel: stage accounting is a conserved filtration over the corpus") {
    val rows = TextQueries.queries("text_filter_funnel")(spark, Sf)
      .collect().sortBy(_.getAs[Int]("stage_ord"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ===
      Seq("length", "langid", "repetition", "diversity"))
    val nDocs = spark.read
      .parquet(s"$Sf/documents.parquet").count()
    assert(rows.head.getAs[Long]("n_in") === nDocs,
      "stage 1 sees the whole corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_drop") ===
        r.getAs[Long]("n_out"), s"conservation at ${r.getAs[String]("stage")}")
      assert(r.getAs[Long]("n_drop") >= 0L)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_out") === b.getAs[Long]("n_in"),
        "funnel chains: each stage's survivors feed the next")
    }
    assert(rows.last.getAs[Long]("n_out") > 0, "the funnel keeps something")
  }

  test("classifier score: model join is broadcast, gate is non-degenerate, score bounded") {
    val df = TextQueries.queries("text_classifier_score")(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the 4096-row weight relation must join as a broadcast, not a shuffle")
    val r = df.agg(
      sum(when(col("keep"), 1L).otherwise(0L)),
      sum(when(!col("keep"), 1L).otherwise(0L)),
      max(abs(col("score_raw")) - col("n_features") * 2048L)).head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0,
      "both classes must occur on the corpus")
    assert(r.getLong(2) <= 0L, "|score| <= n_features * max|w|")
  }
}
