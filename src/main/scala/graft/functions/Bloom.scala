package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's own bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair the
  * optimizer's runtime-filter injection uses; neither is registered
  * for SQL, so a library surface is the sanctioned way to reach them).
  *
  * Build/probe are CONSISTENT by construction: the aggregate inserts
  * the long child value and the probe tests the same long — callers
  * feed both sides the same `xxhash64(...)`.
  *
  * `BloomFilterMightContain` requires its bloom input to be a constant
  * or scalar subquery (it deserializes the sketch ONCE per task off
  * the foldable input, not per row), so [[buildBytes]] materializes
  * the one-row aggregate on the driver. That is a bounded collect —
  * the sketch is `numBits/8` bytes regardless of input size, the same
  * class as a parquet-footer statistic, never data-sized. The literal
  * ships with the stage like a broadcast would; for sketches past a
  * few hundred MB, register the bloom as a proper broadcast variable
  * and probe through a custom expression instead.
  */
object Bloom {

  /** Aggregate column: bloom filter (binary) over long values.
    *
    * @param h            long-typed column to insert (use xxhash64)
    * @param expectedItems sizing estimate (from a metadata statistic,
    *                      not a counting scan)
    * @param numBits      sketch size; ~10 bits/item ≈ 1% false
    *                     positives, ~16 bits/item ≈ 0.05%
    */
  def filterAgg(h: Column, expectedItems: Long, numBits: Long): Column =
    ColumnShim.column(new BloomFilterAggregate(
      ColumnShim.expression(h),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: true if `h` may be in the sketch; false is EXACT
    * (no false negatives). `bloomBytes` must be foldable — pass
    * `lit(buildBytes(...))`. */
  def mightContain(bloomBytes: Column, h: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      ColumnShim.expression(bloomBytes), ColumnShim.expression(h)))

  /** Build the sketch over `df`'s column `h` and return its serialized
    * bytes (one distributed partial-agg pass; driver receives only the
    * fixed-size sketch). */
  def buildBytes(df: DataFrame, h: Column,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val row = df.agg(filterAgg(h, expectedItems, numBits).as("bf")).head()
    // empty input ⇒ the aggregate yields null: an EMPTY set, not an
    // error — callers get a probe that rejects everything
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** Probe column against prebuilt bytes; an empty sketch (empty build
    * input) rejects everything, matching exact-set semantics. */
  def mightContainBytes(bloomBytes: Array[Byte], h: Column): Column =
    if (bloomBytes.isEmpty) lit(false)
    else mightContain(
      ColumnShim.column(Literal.create(bloomBytes, BinaryType)), h)
}
