package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared Catalyst column helpers for the operator library. Everything
  * here is pure `functions._` composition (whole-stage codegen; no
  * UDFs), and every construct has an exact DuckDB-SQL equivalent so
  * the driver's oracle can replay it column-for-column.
  */
object Fn {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Small single-file tables scan as ONE partition; any query that
    * fans out per row (cross join, explode × seeds/bits/grams) would
    * then run on a single task. Spread the rows first — the shuffle
    * is tiny (it moves the small side), the downstream fan-out gets
    * full parallelism. This is exactly the "repartition the small
    * driver table before the expensive flatMap" pattern from the
    * at-scale playbook. */
  def spread(spark: SparkSession, dir: String, name: String): DataFrame =
    table(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)

  /** lowercase whitespace tokens, empties removed — matches DuckDB
    * `list_filter(string_split_regex(lower(text),'\s+'), x -> x <> '')`. */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** word 3-gram shingles (distinct) over a token array; callers must
    * guard `size(toks) >= 3`. */
  def shinglesCol(toks: Column): Column =
    array_distinct(transform(
      sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ",
        element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))

  /** numeric value of one lowercase hex char at 1-based position `j`
    * of `h`: '0'-'9' → 0-9, 'a'-'f' → 10-15. Matches the DuckDB
    * formulation `strpos('0123456789abcdef', substr(h, j, 1)) - 1`. */
  def hexDigit(h: Column, j: Column): Column = {
    val a = ascii(h.substr(j, lit(1)))
    when(a >= 97, a - 87).otherwise(a - 48).cast("long")
  }

  /** Portable 32-bit hash: numeric value of the first 8 hex chars of
    * md5(s). Identical integer to the DuckDB formulation
    * `list_sum(list_transform(range(1,9), j -> (strpos('0123456789abcdef', substr(md5(s),j,1))-1) * CAST(pow(16, 8-j) AS BIGINT)))`.
    * Implemented with `conv` (one md5 evaluation) rather than a
    * digit fold: Catalyst does not CSE a subexpression referenced
    * from every step of an `aggregate` lambda, so the fold form
    * recomputed the md5 per digit — 8× the cost in the hot dedup
    * paths. */
  def md5Prefix32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** bit `b` (0-based, MSB-first within each hex digit) of the hex
    * string `h`: digit = hexval(h[1 + b/4]); bit = (digit >> (3-b%4)) & 1.
    * Written as floor/pow/% so the DuckDB oracle can mirror it exactly. */
  def hexBit(h: Column, b: Column): Column = {
    val digit = hexDigit(h, lit(1) + (b / lit(4)).cast("int"))
    floor(digit.cast("double") / pow(lit(2.0), (lit(3) - (b % lit(4))).cast("double")))
      .cast("long") % 2
  }
}
