package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected SparkEntry queries —
  * the scale audit: filters pushed to the scan, pruned ReadSchema,
  * broadcast (not shuffle) joins for small sides, wide
  * WholeStageCodegen spans.
  *
  * Usage: runMain graft.tools.PlanDump [sfDir] [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
    else Seq("q1_agg", "p1_filter_trim", "j1_best_match", "d2_ngram_jaccard",
      "ann_topk_cosine", "x_bom_rows")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"\n══════ $n ══════")
      println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
