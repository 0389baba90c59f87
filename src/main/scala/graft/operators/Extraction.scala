package graft.operators

import graft.gen.TranscriptGen
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship transcript-extraction queries (BASELINE.json
  * north_rule). Input is the deterministic synthetic corpus
  * (FIXTURES.md §1) synthesized in-memory at small scale — no
  * external data; the `sfDir` parameter is unused by design (the
  * transcript table is the mandated input shape, not the TPC-H-ish
  * tables). No DuckDB oracle exists for these (the extraction
  * semantics are not ANSI-SQL-expressible); correctness is gated by
  * the in-repo per-turn equality suite (OracleSpec / KernelEquality /
  * PipelineSpec) instead, and the driver records a rows-only check.
  */
object Extraction {

  type Q = (SparkSession, String) => DataFrame

  private def nConvs: Int =
    sys.env.getOrElse("GRAFT_XCONVS", "120").toInt

  private def corpusDs(s: SparkSession) = {
    import s.implicits._
    val c = TranscriptGen.corpus(nConvs)
    (s.createDataset(c.turns),
      s.createDataset(c.drawings).toDF(),
      s.createDataset(c.convMeta).toDF())
  }

  /** Flagship: full per-turn extraction over the synthetic corpus. */
  def extractAll(s: SparkSession): DataFrame = {
    val (turns, _, _) = corpusDs(s)
    val metrics = new ExtractPipeline.Metrics(s)
    ExtractPipeline.extract(turns, metrics, partitions = 32)
      .toDF()
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        col("extracted_text"), col("n_boxes"), col("n_cells"))
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(

    ("x_extract_turns", (s: SparkSession, _: String) =>
      extractAll(s), None),

    ("x_extract_cells", (s: SparkSession, _: String) => {
      val (turns, _, _) = corpusDs(s)
      val metrics = new ExtractPipeline.Metrics(s)
      ExtractPipeline.extract(turns, metrics, partitions = 32)
        .toDF()
        .select(col("conv_id"), col("turn_idx"),
          posexplode(col("cells")).as(Seq("pos", "cell")))
        .select(col("conv_id"), col("turn_idx"), col("pos"),
          col("cell.text").as("text"),
          col("cell.confidence").as("confidence"))
    }: DataFrame, None),

    ("x_bom_rows", (s: SparkSession, _: String) => {
      val (turns, drawings, convMeta) = corpusDs(s)
      val metrics = new ExtractPipeline.Metrics(s)
      val extracted = ExtractPipeline.extract(turns, metrics, partitions = 32)
      ExtractPipeline.routed(
        ExtractPipeline.assembleBom(extracted, drawings, convMeta))
    }: DataFrame, None),

    // C4 validation gate as data: per-conversation missing/invalid
    // flags (the pre-write assertion the reference shows as a popup,
    // frontend/index.html:2304-2315)
    ("x_validation_flags", (s: SparkSession, _: String) => {
      val (turns, drawings, convMeta) = corpusDs(s)
      val metrics = new ExtractPipeline.Metrics(s)
      val assembled = ExtractPipeline.assembleBom(
        ExtractPipeline.extract(turns, metrics, partitions = 32),
        drawings, convMeta)
      assembled.groupBy(col("conv_id")).agg(
        max(when(array_contains(col("missing"), "Type"), 1).otherwise(0)).as("missing_type"),
        max(when(array_contains(col("missing"), "Part Number"), 1).otherwise(0)).as("missing_part"),
        max(when(array_contains(col("missing"), "Quantity"), 1).otherwise(0)).as("missing_qty"),
        max(when(col("invalid_qty"), 1).otherwise(0)).as("invalid_qty"),
        sum(when(col("emit"), 1).otherwise(0)).as("emittable_rows"))
    }: DataFrame, None),

    ("x_html_main", (s: SparkSession, _: String) => {
      val (turns, _, _) = corpusDs(s)
      import s.implicits._
      val metrics = new ExtractPipeline.Metrics(s)
      ExtractPipeline.extract(
          turns.filter(col("tool") === graft.model.Tool.HtmlMain).as[graft.model.Turn],
          metrics, partitions = 16)
        .toDF()
        .select(col("conv_id"), col("turn_idx"), col("extracted_text"))
    }: DataFrame, None)
  )
}
