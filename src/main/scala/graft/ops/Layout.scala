package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical-layout operators — the data-skipping levers that matter at
  * 100 TB: a parquet/Iceberg scan prunes row groups by min/max column
  * stats, and those stats are only tight if the WRITE laid related rows
  * together. Sorting by one column gives perfect skipping on it and none
  * on any other; a Z-order (Morton) curve interleaves the bits of two
  * columns so a range partition by the curve value bounds BOTH columns
  * per output file — point/range queries on either column touch
  * O(√P) of P files instead of all of them (the layout behind Delta
  * `OPTIMIZE ZORDER BY` / Iceberg sort orders).
  */
object Layout {

  /** Morton/Z-order value: interleave the low `bits` bits of two
    * NON-NEGATIVE long columns — bit i of `x` lands at position 2i, bit i
    * of `y` at 2i+1. Pure builtin column arithmetic (shifts + masked adds
    * over disjoint bit positions), fully codegen'd and constant-folded;
    * mirrors 1:1 into a SQL twin as `Σ ((x//2^i)%2)·2^(2i) + …`.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms =
      (0 until bits).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      } ++ (0 until bits).map { i =>
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }
    // negative coordinates would sign-extend through the shifts into a
    // garbage curve value — malformed input → NULL, the repo contract
    when(x < 0 || y < 0, lit(null: java.lang.Long))
      .otherwise(terms.reduce(_ + _)) // disjoint bit positions: + == OR
  }

  /** Cluster `df` for two-column skipping: range-partition on the Z-order
    * value into `numFiles` output partitions and sort each partition by
    * it, so every written file covers one compact Z-range — an
    * axis-aligned rectangle-ish region whose min/max stats are tight in
    * BOTH `x` and `y`.
    *
    * Scale notes: `repartitionByRange` samples the curve values to pick
    * balanced boundaries (skew-proof — a hot key region just gets more,
    * smaller files); the per-partition sort is partition-local, never
    * global. The sampled boundaries make the partition ASSIGNMENT
    * run-dependent, so this op feeds a WRITE, not an oracled result — the
    * deterministic surface is [[zValue]] itself (oracled) plus the
    * bounded-extent law (spec-measured).
    */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
                 bits: Int, numFiles: Int): DataFrame = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val withZ = df.withColumn("_z", zValue(x, y, bits))
    withZ.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Small-file compaction planner — the table-maintenance pass every
    * lakehouse runs (Iceberg `rewrite_data_files` / Delta `OPTIMIZE` bin
    * packing): assign each data file to a merge group so group sizes land
    * near `targetBytes`.
    *
    * Deterministic distributed analog of sequential first-fit: within each
    * table partition, files order by (bytes DESC, name) and group id =
    * `floor(exclusive-cumsum(bytes) / targetBytes)` — one window over the
    * FILE INVENTORY (metadata-sized: rows = files, never data), so the
    * plan costs nothing at 100 TB and each group's total is ≤ targetBytes
    * + one file (the bounded overshoot of next-fit; descending order puts
    * big files first so the tail groups pack the small ones). Files
    * already ≥ targetBytes get their own group by construction.
    */
  def compactionGroups(files: DataFrame, part: Column, file: Column,
                       bytes: Column, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, "targetBytes must be >= 1")
    val w = Window.partitionBy(col("part")).orderBy(col("bytes").desc, col("file"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files.select(part.as("part"), file.as("file"), bytes.as("bytes"))
      .withColumn("_before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("grp", floor(col("_before") / targetBytes.toDouble).cast("long"))
      .drop("_before")
  }
}
