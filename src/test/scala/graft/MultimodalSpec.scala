package graft

import graft.pipeline.MultimodalQueries
import org.apache.spark.sql.functions._

/** Perceptual-hash dedup: the oracle compare proves Spark ≡ DuckDB, but
  * both engines could agree on a blocking scheme that finds nothing or
  * everything — this spec pins that the dHash signature is
  * content-bearing over the planted corpus ([[graft.pipeline.DupCorpus]]).
  *
  * Exact copies have byte-identical payloads → identical 9×8 samples →
  * hamming 0, so recall on them must be total. The near-text dups
  * (first 6 words dropped) shift the whole character stream, which moves
  * EVERY position-sampled "pixel" — under the stub codec they are not
  * image-similar, and phash must NOT match them (a scheme that did would
  * be matching on length, not content). Measured at sf0.001:
  * 122 candidates / 68 planted exact / 0 near collisions; at sf0.01 the
  * candidate count is 118 — flat across 10× corpus growth because the
  * [[MultimodalQueries.PhashBucketCap]] stop-bucket guard sheds the
  * degenerate-raster buckets that grow with the corpus. */
class MultimodalSpec extends SparkSpec {

  private lazy val cand = MultimodalQueries.phashCandidates(spark, Sf)

  private lazy val plantedExact =
    Tables.documents(spark, Sf)
      .filter(col("doc_id") % 7 === 0 && length(col("text")) >= 72)
      .count()

  test("phash candidate volume tracks planted dups, not corpus size") {
    // 122 measured at sf0.001 (1.8x planted); quadratic band blocking
    // would be ~500²/2 pairs and blow the bound by orders of magnitude
    assert(cand.count() <= 2 * plantedExact)
  }

  test("phash finds every planted exact copy at hamming 0") {
    val found = cand
      .filter(col("hamming") === 0 &&
        col("doc_b") - col("doc_a") === 10000 && col("doc_a") % 7 === 0)
      .count()
    assert(found === plantedExact)
  }

  test("phash does not match the shifted near-text dups") {
    // discrimination: the +20000 near dups are content-shifted, so
    // every sampled pixel moves — a verified match on one would mean
    // the signature keys on something other than payload content
    val nearHits = MultimodalQueries.queries("multimodal_phash_dedup")(spark, Sf)
      .filter(col("doc_b") >= 20000 && col("doc_b") < 30000)
      .count()
    assert(nearHits === 0)
  }
}
