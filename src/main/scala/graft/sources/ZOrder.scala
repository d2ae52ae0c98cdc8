package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write layout — the storage-side answer to
  * "my scans filter on TWO correlated dimensions". A plain sort
  * clusters one column perfectly and scatters the other; interleaving
  * the bits of both keys makes every parquet row group a small
  * rectangle in (x, y) space, so min/max footer statistics prune row
  * groups for filters on EITHER dimension (or both). This is the
  * standard lakehouse technique for multi-dimensional data skipping;
  * here it is built from codegen'd column expressions only — the
  * bit-spread is the classic magic-mask Morton sequence, no UDF.
  *
  * Scale shape: one tiny min/max aggregation (broadcast back as
  * scalars), then `repartitionByRange` + `sortWithinPartitions` on the
  * z-value — a single range shuffle, the same cost as any global sort
  * the writer would already pay, after which pruning is free forever on
  * the read side.
  */
object ZOrder {

  private val Bits = 21 // 21 bits per dimension → 42-bit z-values

  /** Morton z-value of two dimension keys already normalized into
    * [0, 2^21). Bit i of x lands at z-bit 2i, bit i of y at 2i+1.
    * Delegates to the native `ZValue` Catalyst expression (also on the
    * SQL surface as `zvalue(x, y)` via `GraftExtensions`): one codegen'd
    * static call per row instead of the ~40-node shift-and-mask Column
    * cascade this used to build — same bits, pinned by the round-trip
    * spec against an independent per-bit reference.
    */
  def zvalue(x: Column, y: Column): Column =
    org.apache.spark.sql.graft.ZValue(x.cast("long"), y.cast("long"))

  /** Write `df` to parquet clustered along the z-curve of two numeric
    * columns. Each column is affine-normalized into the 21-bit domain
    * from its global min/max (one scalar aggregation, joined back as a
    * broadcast — never a driver-side constant), so arbitrary numeric
    * ranges z-order correctly. Degenerate columns (min = max) normalize
    * to 0 and simply drop out of the curve.
    */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      partitions: Int = 8): Unit = {
    val maxCode = (1L << Bits) - 1
    // Bounds columns carry the internal __graft_ prefix so a user frame
    // that itself has a "min1"/"max1" column can't collide (ambiguous
    // reference in norm()) or be silently dropped below.
    val bounds = df.agg(
      min(col(c1)).cast("double").as("__graft_min1"),
      max(col(c1)).cast("double").as("__graft_max1"),
      min(col(c2)).cast("double").as("__graft_min2"),
      max(col(c2)).cast("double").as("__graft_max2"))
    def norm(c: String, lo: Column, hi: Column): Column =
      when(hi > lo,
        ((col(c).cast("double") - lo) / (hi - lo) * maxCode).cast("long"))
        .otherwise(lit(0L))
    val z = df.crossJoin(broadcast(bounds))
      .withColumn("__graft_z",
        zvalue(norm(c1, col("__graft_min1"), col("__graft_max1")),
          norm(c2, col("__graft_min2"), col("__graft_max2"))))
    z.repartitionByRange(partitions, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z", "__graft_min1", "__graft_max1", "__graft_min2", "__graft_max2")
      .write.mode("overwrite").parquet(path)
  }
}
