package graft.streaming

import graft.kernel.Extractor
import graft.model.{ExtractedTurn, Turn}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming lift of the extraction pipeline (SURVEY §2.10):
  * every per-turn operator is stateless, so the batch kernel runs
  * unchanged under `readStream` — `Trigger.AvailableNow` turns the
  * same job into an incremental, checkpointed catch-up run over new
  * transcript files (the streaming analog of the lineage-bucket
  * resume; on a cluster the source would be an Iceberg streaming
  * read).
  */
object StreamingExtract {

  val turnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  /** Streaming per-turn extraction over a parquet directory source. */
  def extractStream(spark: SparkSession, inDir: String): Dataset[ExtractedTurn] = {
    import spark.implicits._
    spark.readStream
      .schema(turnSchema)
      .option("maxFilesPerTrigger", "16")
      .parquet(inDir)
      .as[Turn]
      .mapPartitions { it =>
        val ctr = new Extractor.Counters // pooled per partition
        it.map(t => Extractor.extract(t, ctr))
      }
  }

  /** Event-time windowed extraction metrics with a watermark: counts
    * of turns and extracted cells per (1-minute window, tool), late
    * data beyond 10 minutes dropped — the stateful-streaming shape
    * (watermark + tumbling window) over the same extraction kernel. */
  def windowedMetrics(spark: SparkSession, inDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.readStream
      .schema(turnSchema)
      .option("maxFilesPerTrigger", "16")
      .parquet(inDir)
      .as[Turn]
      .mapPartitions { it =>
        val ctr = new Extractor.Counters
        it.map { t =>
          val e = Extractor.extract(t, ctr)
          (t.ts, e.tool, e.n_cells)
        }
      }
      .toDF("ts", "tool", "n_cells")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("tool"))
      .agg(count(lit(1)).as("turns"), sum(col("n_cells")).as("cells"))
  }

  /** Run an AvailableNow catch-up: process every file not yet in the
    * checkpoint, write parquet, stop. Re-invoking later processes only
    * new files — idempotent incremental extraction. */
  def runAvailableNow(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    extractStream(spark, inDir).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
