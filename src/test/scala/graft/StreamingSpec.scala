package graft

import graft.streaming.StreamingEtl
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** K2 merge idempotence + the S1/K4 streaming wrapper (SURVEY.md §5
  * items 4-5): replaying a batch must leave the metadata store
  * unchanged — the property that makes the reference's at-most-once
  * delivery and double-execute defect harmless in this engine. */
class StreamingSpec extends SparkSpec {

  private def kv(rows: Seq[(String, String, String)]) = {
    import spark.implicits._
    rows.toDF("id", "mkey", "mvalue")
  }

  test("K2 mergeKv: last-writer-wins and idempotent") {
    val store = kv(Seq(("a", "lang", "en"), ("a", "status", "ingested"),
      ("b", "lang", "es")))
    val upd = kv(Seq(("a", "status", "loaded"), ("a", "date", "01/02/2023")))
    def snap(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val once = StreamingEtl.mergeKv(store, upd)
    assert(snap(once) === Set(
      ("a", "lang", "en"), ("a", "status", "loaded"), ("a", "date", "01/02/2023"),
      ("b", "lang", "es")))
    val twice = StreamingEtl.mergeKv(once, upd)
    assert(snap(twice) === snap(once))
  }

  test("S1/K4 streaming wrapper: MemoryStream -> foreachBatch merge, replay-idempotent") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream").toString
    val store = new StreamingEtl.ParquetMetadataStore(spark, s"$dir/meta")

    val mem = MemoryStream[String]
    val raw = mem.toDF().select(col("value"))
    val q = StreamingEtl.runStream(spark, raw, store, s"$dir/ckpt")
    def msg(i: Int) =
      s"""{"recordId":"rec-$i","parentId":"p","sessionId":"s","documentType":"APPRAISAL","key":"Tasaciones/doc_$i.pdf"}"""
    try {
      mem.addData(msg(1), msg(2), "not json")
      q.processAllAvailable()
      val s1 = store.read().collect().map(_.mkString("|")).sorted.toSeq
      assert(s1.nonEmpty)
      assert(s1.exists(_.startsWith("item-rec-1|document_type|APPRAISAL")))
      // invalid JSON row was quarantined, not merged
      assert(!s1.exists(_.contains("null")))

      // replay the same payload (second delivery of the same messages)
      mem.addData(msg(1), msg(2))
      q.processAllAvailable()
      val s2 = store.read().collect().map(_.mkString("|")).sorted.toSeq
      assert(s2 === s1)
    } finally q.stop()
  }
}
