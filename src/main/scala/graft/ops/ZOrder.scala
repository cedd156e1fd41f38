package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-column layout for write locality.
  *
  * Interleaving the bits of two (or k) key columns gives a single sort key
  * whose ranges are small hyper-rectangles in key space: writing a table
  * `repartitionByRange + sortWithinPartitions` on the z-value makes EVERY
  * file narrow in ALL interleaved dimensions at once, so parquet min/max
  * file pruning works for predicates on any of them — the standard layout
  * trick for 100 TB tables queried on more than one column. All math is
  * plain bitwise ops on longs (whole-stage codegen'd; no UDF), and the
  * identical formula runs in any SQL engine (the q_zorder oracle).
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions 0,2,..,30
    * (magic-number spreading — 5 bitwise steps).
    */
  def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(65535L))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(16711935L))   // 0x00FF00FF
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(252645135L))  // 0x0F0F0F0F
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(858993459L))  // 0x33333333
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(1431655765L))         // 0x55555555
  }

  /** 32-bit Morton code of two 16-bit values (x gets the even bits). */
  def interleave2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Generic k-column interleave: bit `i` of column `j` lands at position
    * `i*k + j`. Linear-size expression tree (bits × k shift-mask terms);
    * use [[interleave2]] for the common 2-column case.
    */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    val k = cols.length
    require(k >= 1 && bits * k <= 62, s"$bits bits x $k cols exceeds a long")
    cols.zipWithIndex.flatMap { case (x, j) =>
      (0 until bits).map(i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * k + j))
    }.reduce(_ bitwiseOR _)
  }

  /** The same spread16 formula as a SQL string over expression `e` —
    * emitted into oracle SQL so the oracle re-derives z bit-for-bit.
    */
  def spreadSql(e: String): String = {
    val a = s"($e & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val c = s"(($b | ($b << 4)) & 252645135)"
    val d = s"(($c | ($c << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  /** Linear-scale a numeric column into [0, 2^bits): for keys that aren't
    * already small non-negative ints. min/max come from one bounded
    * aggregate (two scalars per column).
    */
  def scaleToBits(v: Column, min: Double, max: Double, bits: Int): Column = {
    val n = (1L << bits).toDouble
    val span = math.max(max - min, java.lang.Double.MIN_NORMAL)
    least(floor((v.cast("double") - lit(min)) / lit(span) * lit(n)),
      lit(n - 1)).cast("long")
  }

  /** Rewrite `df` in z-order on two key columns: one range shuffle on the
    * z-value, in-partition sort, z column dropped. Each output partition
    * (= output file, when written) is a small rectangle in (x, y) space.
    */
  def layoutZOrder(df: DataFrame, x: Column, y: Column,
                   numPartitions: Int): DataFrame =
    layoutBy(df, interleave2(x, y), numPartitions)

  /** Hilbert-curve index (native codegen'd quadrant walk — see
    * [[graft.functions.HilbertIndexExpr]]): tighter per-file rectangles
    * than Morton at the same file count because consecutive indices are
    * always unit-distance neighbours.
    */
  def hilbertIndex(x: Column, y: Column, order: Int = 16): Column =
    graft.functions.HilbertIndex.hilbert(x.cast("long").bitwiseAND(lit((1L << order) - 1)),
      y.cast("long").bitwiseAND(lit((1L << order) - 1)), order)

  /** [[layoutZOrder]] with the Hilbert index as the linearization. */
  def layoutHilbert(df: DataFrame, x: Column, y: Column,
                    numPartitions: Int, order: Int = 16): DataFrame =
    layoutBy(df, hilbertIndex(x, y, order), numPartitions)

  private def layoutBy(df: DataFrame, key: Column, numPartitions: Int): DataFrame =
    df.withColumn("__z", key)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
