package graft

import graft.operators.Fn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column/helper library correctness: the scalable two-level ordered
  * index and the footer-statistic row count. */
class FnSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fn-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("WARN") }

  private val sfDir = "/root/testdata/sf0.001"

  test("orderedIndex equals the global sort index (incl. duplicate keys, any partitioning)") {
    // scrambled keys with duplicates (mod collisions) across many
    // input partitions — the index must be a 0..n-1 permutation whose
    // order is a global sort by key
    val df = spark.range(10000).repartition(13).select(
      concat(lit("k"), lpad(pmod(col("id") * 2654435761L, lit(4000L))
        .cast("string"), 5, "0")).as("k"))
    val got = Fn.orderedIndex(df, col("k"), buckets = 16)
      .select(col("k"), col("idx")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.length == 10000)
    assert(got.map(_._2).sorted.toSeq == (0L until 10000L))
    val keysByIdx = got.sortBy(_._2).map(_._1).toSeq
    assert(keysByIdx == keysByIdx.sorted, "index order must be key order")
  }

  test("orderedIndex's only unpartitioned window is over the bucket counts, not data rows") {
    val df = spark.range(1000).select(col("id").cast("string").as("k"))
    val plan = Fn.orderedIndex(df, col("k"), buckets = 16)
      .queryExecution.executedPlan.toString
    // the data-row window must be partitioned (by _pid); plan therefore
    // contains a windowspec with a partition clause referencing _pid
    assert(plan.contains("_pid"))
  }

  test("rowCountStat (parquet footers) equals the scanned count") {
    for (t <- Seq("embeddings", "documents", "supplier"))
      assert(Fn.rowCountStat(spark, sfDir, t) ==
        spark.read.parquet(s"$sfDir/$t.parquet").count(), t)
  }

  test("rowCountStat launches no Spark job (metadata read only)") {
    val sc = spark.sparkContext
    Thread.sleep(300) // let earlier tests' async job events drain
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    Fn.rowCountStat(spark, sfDir, "embeddings")
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "footer statistic must not run a Spark job")
  }
}
