package graft.gen

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Writes the deterministic synthetic corpus as parquet tables
  * (transcripts / drawings / conv_meta) in an Iceberg-compatible
  * layout — the sandbox stand-in for the Iceberg transcript tables
  * (FIXTURES.md; no Iceberg jar offline).
  *
  * Usage: runMain graft.gen.WriteCorpus <outDir> [nConvs]
  */
object WriteCorpus {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_corpus")
    val nConvs = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-gen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, outDir, nConvs)
    spark.stop()
  }

  def write(spark: SparkSession, outDir: String, nConvs: Int): Unit = {
    import spark.implicits._
    val corpus = TranscriptGen.corpus(nConvs)
    // keep generator order (already shuffled) so the stored table does
    // NOT arrive pre-sorted — the pipeline must not rely on input order
    spark.createDataset(corpus.turns)
      .repartition(8)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/transcripts")
    spark.createDataset(corpus.drawings)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/drawings")
    spark.createDataset(corpus.convMeta)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/conv_meta")
    println(s"[gen] wrote ${corpus.turns.size} turns, " +
      s"${corpus.drawings.size} drawings, ${corpus.convMeta.size} conv_meta → $outDir")
  }
}
