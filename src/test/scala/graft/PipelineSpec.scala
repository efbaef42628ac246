package graft

import graft.etl.Corpus
import org.apache.spark.sql.functions._

/** O1 routing truth table + A2/A3 order stability + dedup corpus
  * sanity (SURVEY.md §5 items 2-3). */
class PipelineSpec extends SparkSpec {

  test("O1 router truth table: 6 document types -> 3 routes, default=polizas") {
    // workflow_orchestator.py:61-71: REGISTRATION->inscripción,
    // APPRAISAL->tasación, everything else->póliza
    val got = Corpus.requests(spark, Sf)
      .select("document_type", "route").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "POLICY" -> "polizas", "DEFAULT" -> "polizas",
      "REGULATORY" -> "polizas", "INTERNAL" -> "polizas",
      "REGISTRATION" -> "inscripciones", "APPRAISAL" -> "tasaciones"))
  }

  test("P6 truncation: defaults to the reference's 20 pages; fixture override observable") {
    // textract_extractor_document.py:59-60 truncates to the FIRST 20
    // pages. Testdata docs have <=3 pages, so with the default the
    // truncated md5 must equal the full md5 on every row...
    val dflt = graft.queries.EtlQueries.pageAggTrunc()(spark, Sf)
      .select("record_id", "n_pages", "full_md5", "first_pages_md5").collect()
    assert(dflt.nonEmpty)
    assert(graft.queries.EtlQueries.PageTruncateDefault === 20)
    dflt.foreach(r => assert(r.getString(2) === r.getString(3)))
    // ...and the registered N=2 variant must differ exactly on 3-page docs
    val two = graft.queries.EtlQueries.queries("etl_page_agg")(spark, Sf)
      .select("record_id", "n_pages", "full_md5", "first_pages_md5").collect()
    two.foreach { r =>
      if (r.getInt(1) <= 2) assert(r.getString(2) === r.getString(3))
      else assert(r.getString(2) !== r.getString(3))
    }
  }

  test("A2/A3 order stability: page_agg identical under different partitioning") {
    def run(parts: String): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try graft.queries.EtlQueries.queries("etl_page_agg")(spark, Sf)
        .collect().map(_.mkString("|")).sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(run("2") === run("13"))
  }

  test("dedup corpus: exact dup groups are exactly the doc_id%7 copies") {
    val exact = graft.pipeline.DedupQueries.queries("dedup_exact")(spark, Sf)
      .collect()
    val dupGroups = exact.filter(_.getLong(2) == 2).map(_.getLong(1)).sorted
    val expected = (0L until 500L).filter(_ % 7 == 0).sorted
    assert(dupGroups.toSeq === expected)
    // near dups (+20000) have different text -> their own group of 1
    assert(exact.forall(_.getLong(2) <= 2))
  }

  test("J2 closure covers the full page tree") {
    val r = graft.pipeline.BlockQueries.queries("etl_block_closure")(spark, Sf)
      .filter(col("doc_id") === 1 && col("page_id") === "d1-p1")
      .collect().head
    // doc 1 page 1: nl=(1+1)%3+2=4 lines, 4*2+1 words, +key+value+page=16
    assert(r.getAs[Long]("n_blocks") === 16)
    assert(r.getAs[Long]("n_lines") === 4)
    assert(r.getAs[Long]("n_words") === 9)
  }
}
