package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * At 100 TB, range-partitioning by ONE column makes predicates on any
  * other column scan everything. Interleaving the bits of two (or more)
  * bucketed dimensions into a single z-value and range-partitioning /
  * sorting files by it gives every dimension locality at once: any
  * aligned run of 4^k consecutive z-values is a 2^k × 2^k tile, so
  * min/max footer stats prune scans on either dimension. This is the
  * layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY` — here it is
  * a pure Catalyst column expression (shift/and/or arithmetic, fully
  * codegen'd), usable with `repartitionByRange(zvalue)` before a write.
  *
  * Reference scope: the streamer has no layout control at all (it
  * forwards to ClickHouse, SURVEY §2.5); this is E1-family extension
  * surface — the write-side counterpart of partition pruning.
  */
object ZOrder {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions): z = Σ_b ((x>>b)&1)<<2b | ((y>>b)&1)<<(2b+1).
    * Columns must already be bucketed into [0, 2^bits).
    */
  def zvalue(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)

  /** The same formula as a SQL expression string (DuckDB/ANSI bit
    * operators) — lets an external engine reproduce the z-value
    * exactly, which is how the oracle verifies the layout op.
    */
  def zvalueSql(x: String, y: String, bits: Int = 8): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) | ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", " | ", ")")
}
