package graft

import graft.pipeline.SimilarityQueries
import org.apache.spark.sql.functions._

/** Round-16 pins: the IVF geometry SCALE CONTRACT (VERDICT r11 top
  * item — nlist was a fixture constant, making the corpus-scale kNN
  * graph quadratic on an 8-key join) and this round's loop-closers. */
class Round16Spec extends SparkSpec {

  test("nlistOf: sqrt growth with the KmK floor") {
    assert(SimilarityQueries.nlistOf(1) == 8, "floor below 64 vectors")
    assert(SimilarityQueries.nlistOf(64) == 8)
    assert(SimilarityQueries.nlistOf(500) == 23)   // sf0.001 / sf0.01
    assert(SimilarityQueries.nlistOf(2000) == 45)  // sf0.1
    assert(SimilarityQueries.nlistOf(1000000000L) == 31623)
    // the property the candidate-volume bound rides on: nlist >= sqrt(N)
    for (n <- Seq(100L, 10000L, 123456L, 7654321L))
      assert(SimilarityQueries.nlistOf(n).toDouble >= math.sqrt(n.toDouble))
  }

  test("IVF candidate volume is O(nprobe * N^1.5), never N^2/const") {
    // ann_probe_cost's n_candidates IS knn_graph_ivf's per-query
    // candidate fetch (every corpus vector queries its nprobe cells).
    // With nlist = ceil(sqrt(N)) the total is ~nprobe * N^1.5; the
    // old fixed nlist=8 gave N^2/4 (at N=500: 62.5k — the 3*N^1.5
    // ceiling of 33.5k would already catch the regression here, and
    // the gap widens with N).
    val n = Tables.embeddings(spark, Sf).count()
    val cand = SparkEntry.queries("ann_probe_cost")(spark, Sf)
      .agg(sum("n_candidates")).collect()(0).getLong(0)
    val bound = 3.0 * math.pow(n.toDouble, 1.5)
    assert(cand.toDouble <= bound,
      s"candidate volume $cand exceeds 3*N^1.5 = $bound at N=$n")
    // and the cid equi-join's parallelism scales with the corpus: the
    // live cell count (distinct join keys) stays within a factor of
    // the derived nlist, never a handful of reduce tasks
    val cells = graft.sources.BucketedStore
      .read(spark, SimilarityQueries.ivfIndex(spark, Sf)._2)
      .select("cid").distinct().count()
    assert(cells >= SimilarityQueries.nlistOf(n) / 2,
      s"live cells $cells collapsed vs nlist ${SimilarityQueries.nlistOf(n)}")
  }

  test("probe cost_ppm FALLS as the corpus grows (sf0.001 -> sf0.1)") {
    // the serving-scale operating point: cost_ppm ~ nprobe/nlist * 1e6
    // = nprobe * 1e6 / sqrt(N), strictly falling in N. Under the old
    // fixed geometry this was a constant 250k ppm at every SF.
    val big = s"$TestData/sf0.1"
    requireFixture(big)
    def meanPpm(d: String): Double = {
      val r = SparkEntry.queries("ann_probe_cost")(spark, d)
        .agg(avg("cost_ppm")).collect()(0)
      r.getDouble(0)
    }
    val (small, large) = (meanPpm(Sf), meanPpm(big))
    assert(large < small,
      s"cost_ppm must fall with N: sf0.001=$small sf0.1=$large")
    // and both sit far below the fixed-geometry 250k operating point
    assert(small < 150000.0 && large < 80000.0,
      s"operating point regressed: sf0.001=$small sf0.1=$large")
  }
}
