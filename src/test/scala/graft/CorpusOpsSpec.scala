package graft

import graft.pipeline.{EventQueries, SimilarityQueries, TextQueries}
import graft.queries.AnalyticsQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Properties of the vocabulary/tf-idf/quantization/kNN/attribution
  * additions that the oracle compare can't see: plan shapes (the
  * distributed top-k, the single-scan cube), quantization range
  * invariants, cell-blocking contracts, and tie-break determinism. */
class CorpusOpsSpec extends SparkSpec {

  test("vocab top-k plans as TakeOrderedAndProject, not a global window sort") {
    val q = TextQueries.queries("text_vocab")(spark, Sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-50 must be the distributed per-partition heap merge:\n$plan")
    val rows = q.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 5), "df floor must hold")
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length),
      "ranks must be contiguous from 1")
    val tfs = rows.map(_.getLong(2)).toSeq
    assert(tfs === tfs.sortBy(-_), "rank order must follow tf desc")
  }

  test("tfidf ranks follow the integer (tf desc, df asc, token) order per doc") {
    val q = TextQueries.queries("text_tfidf_top")(spark, Sf)
    q.collect() // materialize so AQE finalizes stage reuse
    assert(q.queryExecution.executedPlan.toString.contains("ReusedExchange") ||
      q.queryExecution.executedPlan.toString.contains("ReusedQueryStage"),
      "df must consume tf's exchange — the corpus is tokenized exactly once")
    val rows = TextQueries.queries("text_tfidf_top")(spark, Sf)
      .select("doc_id", "rank", "token", "tf", "df").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length),
        s"doc $doc: ranks contiguous")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val ok = a._4 > b._4 || (a._4 == b._4 &&
            (a._5 < b._5 || (a._5 == b._5 && a._3 < b._3)))
          assert(ok, s"doc $doc: $a must precede $b under (tf desc, df, token)")
        case _ => ()
      }
    }
  }

  test("stratified sample is deterministic and bounded by the stratum") {
    val q = TextQueries.queries("text_stratified_sample")(spark, Sf)
    val a = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq, "hash membership must be rerun-stable")
    assert(a.forall { case (_, total, kept) => kept >= 0 && kept <= total })
    assert(a.exists { case (_, total, kept) => kept < total },
      "a downsampled stratum must actually drop documents")
  }

  test("int8 quantization maps each vector's min/max exactly onto [-128, 127]") {
    val out = SimilarityQueries.queries("embed_quantize")(spark, Sf)
      .select("vec_id", "n_dims", "q_min", "q_max", "scale")
    val src = Tables.embeddings(spark, Sf)
      .select(col("vec_id").as("src_id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("src_id"), size(col("v")).as("dims"),
        ((array_max(col("v")) - array_min(col("v"))) / lit(255.0)).as("want_scale"))
    val joined = out.join(src, col("vec_id") === col("src_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Int]("n_dims") === r.getAs[Int]("dims"))
      if (r.getAs[Double]("want_scale") > 0) {
        // the affine map sends lo to floor(0.5)-128 = -128 and hi to
        // floor(255.5)-128 = 127 exactly — the codebook uses full range
        assert(r.getAs[Int]("q_min") === -128, s"vec ${r.get(0)}: q_min")
        assert(r.getAs[Int]("q_max") === 127, s"vec ${r.get(0)}: q_max")
      }
      assert(math.abs(r.getAs[Double]("scale") - r.getAs[Double]("want_scale")) < 1e-9)
    }
  }

  test("kNN join respects the cell contract and matches in-cell brute force") {
    val knn = SimilarityQueries.queries("knn_join")(spark, Sf)
    val lbl = Tables.embeddings(spark, Sf).select("vec_id", "label")
    // every (vec, neighbor) pair shares a cell
    val crossCell = knn
      .join(lbl.select(col("vec_id"), col("label").as("ll")), "vec_id")
      .join(lbl.select(col("vec_id").as("neighbor_id"), col("label").as("rl")),
        "neighbor_id")
      .filter(col("ll") =!= col("rl")).count()
    assert(crossCell === 0L, "neighbors must come from the same cell")
    // ranks are 1..3 with non-increasing similarity
    val byVec = knn.select("vec_id", "rank", "sim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
    byVec.foreach { case (v, rs) =>
      val sims = rs.sortBy(_._2).map(_._3).toSeq
      assert(sims === sims.sortBy(-_), s"vec $v: sim must fall with rank")
      assert(rs.map(_._2).toSet.subsetOf(Set(1, 2, 3)))
    }
  }

  test("attribution first/last types agree with an independent window recompute") {
    val got = EventQueries.queries("events_attribution")(spark, Sf)
      .select("user_id", "first_type", "last_type").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // order by the SAME ms-truncated composite key as attributionAggs —
    // raw-ts ordering could diverge on same-ms events with sub-ms skew
    val w = Window.partitionBy("user_id")
      .orderBy(unix_millis(col("ts")) * lit(1000000L) + col("event_id"))
    val want = Tables.events(spark, Sf)
      .select(col("user_id"),
        first("event_type").over(w).as("ft"),
        last("event_type").over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("lt"))
      .groupBy("user_id").agg(min("ft").as("ft"), min("lt").as("lt"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got === want, "min_by/max_by must match the windowed recompute")
  }

  test("cube levels reconcile and come from one scan") {
    val q = EventQueries.queries("events_cube_hourly")(spark, Sf)
    val rows = q.select("lvl", "n_events").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val total = Tables.events(spark, Sf).count()
    // levels: 0=(type,hod) 1=(type) 2=(hod) 3=grand — each partitions the count
    assert(rows.filter(_._1 == 3).map(_._2).sum === total)
    assert(rows.filter(_._1 == 1).map(_._2).sum === total)
    assert(rows.filter(_._1 == 2).map(_._2).sum === total)
    assert(rows.filter(_._1 == 0).map(_._2).sum === total)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "cube must plan as grouping-set expand")
    assert("(?s)Scan parquet".r.findAllIn(plan).size === 1,
      s"cube must scan events exactly once:\n$plan")
  }

  test("heap top-k aggregate matches the window form row-for-row") {
    val agg = TextQueries.queries("text_ngram_topk_agg")(spark, Sf)
    assert(agg.queryExecution.executedPlan.toString.contains("ObjectHashAggregate"),
      "the bounded-buffer aggregate must plan as ObjectHashAggregate")
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("lang", "bigram", "n", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq.sorted
    assert(snap(agg) === snap(TextQueries.queries("text_ngram_topk")(spark, Sf)),
      "two physical strategies, one semantics")
  }

  test("TopKAgg ordered-insert/merge matches brute-force sort at k=100") {
    // the class advertises k ≤ ~100: exercise the O(k) insert and the
    // sorted-merge at that size against the obvious sortWith oracle,
    // across shuffled input orders and partition splits
    val k = 100
    val agg = new graft.operators.TopKAgg(k)
    val rnd = new scala.util.Random(7)
    val items = (1 to 1000).map(i => (f"key$i%04d", rnd.nextInt(200).toLong))
    def brute(xs: Seq[(String, Long)]) =
      xs.sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)).take(k)
    (0 until 3).foreach { seed =>
      val shuffled = new scala.util.Random(seed).shuffle(items)
      val single = shuffled.foldLeft(agg.zero)(agg.reduce)
      assert(single === brute(items), s"reduce-only, order $seed")
      // split into uneven partials, reduce each, merge pairwise
      val parts = shuffled.grouped(137).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = parts.reduce(agg.merge)
      assert(merged === brute(items), s"partial-merge, order $seed")
    }
    // degenerate shapes: fewer than k inputs, and all-identical counts
    val tiny = Seq(("b", 5L), ("a", 5L), ("c", 9L))
    assert(tiny.foldLeft(agg.zero)(agg.reduce) === brute(tiny))
    val flat = (1 to 150).map(i => (f"t$i%03d", 1L))
    assert(flat.foldLeft(agg.zero)(agg.reduce) === brute(flat))
  }

  test("small-qty revenue scans the fact table exactly once (window decorrelation)") {
    val q = AnalyticsQueries.queries("tpch_small_qty_revenue")(spark, Sf)
    val plan = q.queryExecution.executedPlan.toString
    assert("ReadSchema: [^\n]*l_quantity".r.findAllIn(plan).size === 1,
      s"the correlated average must be a window, not a second fact scan:\n$plan")
    assert(plan.contains("Window"), "per-part stats must ride a window")
  }

  test("big-orders HAVING set broadcasts; top-supplier argmax is internally consistent") {
    val big = AnalyticsQueries.queries("tpch_big_orders")(spark, Sf)
    val plan = big.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the tiny HAVING set must broadcast into orders:\n$plan")
    val top = AnalyticsQueries.queries("tpch_top_supplier")(spark, Sf).collect()
    assert(top.nonEmpty, "some supplier must achieve the max")
    assert(top.map(_.getDouble(2)).distinct.length === 1,
      "every returned supplier carries the identical max revenue")
  }
}
