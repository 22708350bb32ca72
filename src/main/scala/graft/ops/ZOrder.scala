package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) multi-dimensional clustering key — the layout
  * lever that makes zone maps selective on MORE THAN ONE column at
  * once. Range-bucketing a table by the interleaved key tiles the
  * (a, b) domain into an aligned grid: every bucket covers a small
  * contiguous square, so its per-bucket min/max stats are tight in
  * BOTH dimensions and `MergeSink.readRange` prunes on either column
  * (the single-column range layout of q105 prunes on exactly one).
  * This is the standard public technique behind multi-dimensional
  * OPTIMIZE/clustering commands in lakehouse table formats.
  *
  * All pure long arithmetic (5 mask/shift steps per dimension —
  * classic bit-spreading), fully codegen'd; no UDF, no expression
  * fallback.
  */
object ZOrder {

  /** Spread the low 16 bits of a non-negative long into the even bit
    * positions of a 32-bit value (b15..b0 -> bit positions 30,28,..,0).
    */
  private def spread16(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton-interleave two pre-normalized [0, 65535] columns into one
    * 32-bit z-value (a on even bits, b on odd). Adjacent z ranges are
    * adjacent grid squares — bucket = zvalue div 2^26 tiles the domain
    * into an 8x8 grid of 64 buckets.
    */
  def zvalue16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Rank-normalize a non-negative long column into [0, 65535] given
    * the column's max (floor scaling; maxVal 0 maps everything to 0).
    * At 100 TB the max comes from table stats or a known domain, not a
    * per-write scan.
    */
  def rank16(c: Column, maxVal: Long): Column =
    if (maxVal <= 0L) lit(0L)
    else (c.cast("long") * lit(65535L) / lit(maxVal)).cast("long")
}
