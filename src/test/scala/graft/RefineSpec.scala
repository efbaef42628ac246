package graft

import graft.etl.Refine
import org.apache.spark.sql.functions._

/** C1-C3 scalar semantics vs the reference
  * (workflow_service.py:8-14,16-36,38-44). Property tests use a seeded
  * generator (no scalatest/scalacheck bridge in the offline cache). */
class RefineSpec extends SparkSpec {

  private def eval1(input: Seq[String], c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Option[String]] = {
    import spark.implicits._
    input.toDF("s").select(c(col("s")).as("r")).collect().toSeq
      .map(r => Option(r.getString(0)))
  }

  test("C1 refine_dates: first dd/MM/yyyy else null") {
    val in = Seq("Vigencia desde 01/02/2023 hasta 28/02/2024",
      "no date here", "", "1/2/2023", "x 31/12/1999", null)
    assert(eval1(in, Refine.refineDates) === Seq(
      Some("01/02/2023"), None, None, None, Some("31/12/1999"), None))
  }

  test("C1 property: result is null or a dd/MM/yyyy substring of input") {
    val rnd = new scala.util.Random(42)
    val samples = (1 to 200).map { _ =>
      val base = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      rnd.nextInt(3) match {
        case 0 => base
        case 1 => base + f" ${rnd.nextInt(99)}%02d/06/2021 tail"
        case _ => base + "99/99/9999"
      }
    }
    val results = eval1(samples, Refine.refineDates)
    samples.zip(results).foreach {
      case (_, None) => ()
      case (s, Some(d)) =>
        assert(d.matches("\\d{2}/\\d{2}/\\d{4}"), s"input=$s")
        assert(s.contains(d), s"input=$s got=$d")
    }
  }

  test("C2 refine_month: total over the 12 Spanish names, any case; unknown -> null") {
    val names = graft.etl.Corpus.MonthNames
    val got = eval1(names ++ names.map(_.toUpperCase) ++ Seq("notamonth", ""),
      Refine.refineMonth)
    val expect = (1 to 12).map(i => Some(i.toString))
    assert(got === expect ++ expect ++ Seq(None, None))
  }

  test("C3 refine_year: trimmed 4-digit only") {
    val in = Seq(" 2023 ", "2023", "202", "20233", "abcd", "", null)
    assert(eval1(in, Refine.refineYear) === Seq(
      Some("2023"), Some("2023"), None, None, None, None, None))
  }

  test("C8 deterministic id: stable and distinct per business key") {
    import spark.implicits._
    val df = Seq(("r1", "p1", "s1"), ("r1", "p1", "s1"), ("r2", "p1", "s1"))
      .toDF("r", "p", "s")
      .select(Refine.deterministicId(col("r"), col("p"), col("s")).as("id"))
    val ids = df.collect().map(_.getString(0)).toSeq
    assert(ids(0) === ids(1))
    assert(ids(0) !== ids(2))
    assert(ids.forall(_.matches("[0-9a-f]{64}")))
  }
}
