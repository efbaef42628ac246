package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave — the multi-dimensional clustering key
  * behind 100 TB data-skipping layouts: sort/range-partition a table by
  * `zvalue(x, y)` and points close in BOTH dimensions land in the same
  * files, so per-file min/max stats prune a 2-D box predicate the way a
  * 1-D sort key only can for its leading column (the OPTIMIZE ZORDER
  * primitive of the lakehouse formats, as a plain column expression).
  *
  * Built from shift/mask/or column arithmetic only — the whole key
  * stays inside whole-stage codegen; no UDF, no custom expression
  * needed. Bit i of x lands at position 2i, bit i of y at 2i+1, so a
  * prefix of the z-value pins a square tile in (x, y) space:
  * `z >> 2k` constant ⇔ both coordinates agree above their low k bits.
  */
object ZOrder {
  /** Interleave the low `bits` bits of two non-negative long columns.
    * Caller clamps/buckets inputs into [0, 2^bits) — out-of-range high
    * bits would alias across tiles. */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
}
