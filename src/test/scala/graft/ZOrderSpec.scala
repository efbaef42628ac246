package graft

import graft.operators.ZOrder
import graft.queries.InfraQueries
import org.apache.spark.sql.functions._

/** The three contracts that make a Z-order layout worth writing:
  * prefix-pins-a-tile, quadrant ordering, and the end-to-end locality
  * a range partitioning on the z-value actually delivers. */
class ZOrderSpec extends SparkSpec {

  private def grid(n: Int) = {
    import spark.implicits._
    (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
  }

  test("zvalue is a bijection on the grid and orders quadrants block-wise") {
    val g = grid(32).withColumn("z", ZOrder.zvalue(col("x"), col("y")))
    assert(g.select("z").distinct().count() === 32L * 32, "interleave is 1:1")
    // low quadrant (both < 16) occupies exactly z in [0, 256) — the
    // prefix property that makes min/max stats prune 2-D boxes
    val lowQuad = g.filter(col("x") < 16 && col("y") < 16)
      .agg(max("z")).head.getLong(0)
    val rest = g.filter(col("x") >= 16 || col("y") >= 16)
      .agg(min("z")).head.getLong(0)
    assert(lowQuad === 255L && rest === 256L,
      s"quadrant must be a contiguous z-range: lowMax=$lowQuad restMin=$rest")
  }

  test("every z-bucket of the layout query is one 64x64 tile") {
    val rows = InfraQueries.queries("infra_zorder_layout")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xs, ys) = (r.getAs[Long]("x_max") - r.getAs[Long]("x_min"),
        r.getAs[Long]("y_max") - r.getAs[Long]("y_min"))
      assert(xs <= 63 && ys <= 63,
        s"bucket ${r.get(0)}: spans ($xs, $ys) must fit the 64x64 tile")
    }
  }

  test("range-partitioning on zvalue clusters BOTH dimensions") {
    // uniform 256x256 grid: 64 z-range partitions should carve ~32x32
    // tiles, shrinking BOTH per-partition spans far below the global
    // 255 — a 1-D sort on either coordinate leaves the OTHER
    // dimension's span at ~the global span. (The events table at
    // sf0.001 only spans 15 users, too narrow to cut in x — the
    // 64x64-tile contract on real data is the previous test.)
    val pts = grid(256)
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y")).as("z"))
    val spans = pts.repartitionByRange(64, col("z"))
      .select(col("x"), col("y"), spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg((max("x") - min("x")).as("xspan"),
        (max("y") - min("y")).as("yspan"))
      .collect()
    val avgX = spans.map(_.getAs[Long]("xspan")).sum.toDouble / spans.length
    val avgY = spans.map(_.getAs[Long]("yspan")).sum.toDouble / spans.length
    assert(avgX < 0.5 * 255, s"x locality: avg $avgX vs global 255")
    assert(avgY < 0.5 * 255, s"y locality: avg $avgY vs global 255")
  }
}
