package graft.operators

import graft.gen.TranscriptGen
import graft.model.Tool
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship transcript-extraction queries (BASELINE.json
  * north_rule), in two tiers:
  *
  *  1. DRIVER-ORACLE tier (`x_extract_turns`, `x_quick_text`,
  *     `x_extract_cells`): input is a deterministic box corpus derived
  *     from the driver's `documents` table by pure integer arithmetic
  *     on `doc_id` — regenerable bit-identically in DuckDB SQL. The
  *     Spark side round-trips it through the REAL production path
  *     (payload JSON → FastScan/jackson decode → kernel simple/quick
  *     extraction inside mapPartitions — nothing is special-cased),
  *     while the oracle implements the reference semantics
  *     (P1 trim-drop → P2 fix_diameter → P4 truncating midpoints →
  *     O1 stable y sort → K1 "\n"-join; backend/main.py:64-100, 557)
  *     in plain SQL. This makes the north-rule kernel itself
  *     driver-checkable on rows+schema+hash.
  *  2. SYNTHETIC tier (`x_synth_turns`, `x_bom_rows`,
  *     `x_validation_flags`, `x_html_main`): the full TranscriptGen
  *     corpus (FIXTURES.md §1) covering the band/rect/HTML paths and
  *     BOM assembly; not ANSI-SQL-expressible, gated by the in-repo
  *     per-turn equality suite — the driver records rows-only.
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

  /** The SQL-derivable box corpus (tier 1). Every box attribute is a
    * pure function of (doc_id, i): both engines regenerate the same
    * set with no data exchange. Covers the reference traps: empty and
    * whitespace-only texts (P1), convertible and non-convertible
    * diameter tokens (P2 — "x O5" converts, leading "O5" must not),
    * equal-y ties across distinct i (O1 stability), 2-dp confidences.
    */
  object SqlCorpus {
    private val Wd = 800
    private val Ht = 600

    def turns(s: SparkSession, dir: String): Dataset[graft.model.Turn] = {
      import s.implicits._
      val d = col("doc_id")
      val nb = lit(5L) + pmod(d, lit(13L))
      def boxJson(i: Column): Column = {
        val sel = pmod(d * 31 + i * 7, lit(8L))
        val txt = when(sel === 0, lit(""))
          .when(sel === 1, lit("  "))
          .when(sel === 2, concat(lit("x O"), pmod(d + i, lit(10L)).cast("string")))
          .when(sel === 3, concat(lit("O"), pmod(d + i, lit(10L)).cast("string")))
          .when(sel === 4, concat(lit("w"), pmod(d * 7 + i, lit(100L)).cast("string")))
          .when(sel === 5, concat(lit("QTY "), pmod(i, lit(10L)).cast("string")))
          .when(sel === 6, lit("PLATE"))
          .otherwise(concat(lit("M8 O"), pmod(i, lit(10L)).cast("string")))
        val yc = pmod(d * 131 + i * 37, lit(19L)) * 10 + 7
        val x0 = (lit(10L) + i * 5).cast("string")
        val x2 = (lit(50L) + i * 5).cast("string")
        val y0 = (yc - 7).cast("string")
        val y2 = (yc + 7).cast("string")
        // k ∈ 50..99 ⇒ always two digits ⇒ "0.5x".."0.99" literal JSON
        val k = (lit(50L) + pmod(d + i * 3, lit(50L))).cast("string")
        concat(lit("{\"q\":[["), x0, lit(","), y0, lit("],["), x2, lit(","), y0,
          lit("],["), x2, lit(","), y2, lit("],["), x0, lit(","), y2,
          lit("]],\"t\":\""), txt, lit("\",\"c\":0."), k, lit("}"))
      }
      val payload = concat(lit("{\"boxes\":["),
        array_join(transform(sequence(lit(0L), nb - 1), i => boxJson(i)), ","),
        lit("],\"w\":" + Wd + ",\"h\":" + Ht + ",\"lines\":[],\"rects\":[]}"))
      Fn.spread(s, dir, "documents").select(col("doc_id")).select(
        concat(lit("doc-"), d.cast("string")).as("conv_id"),
        lit(0).as("turn_idx"),
        lit("tool").as("role"),
        payload.as("text"),
        when(pmod(d, lit(2L)) === 0, Tool.Quick)
          .otherwise(Tool.TableSimple).as("tool"),
        lit(new java.sql.Timestamp(1767225600000L)).as("ts")
      ).as[graft.model.Turn]
    }

    /** identical box regeneration + simple-path semantics in DuckDB
      * (`kept` = P1 trim-drop then P2 fix_diameter; the lookaround-free
      * `(\s)O([0-9])` rewrite is match-equivalent because a match's
      * consumed chars can never overlap another's). `yc` IS the
      * truncating midpoint: boxes are built with y0 = yc-7, y2 = yc+7,
      * so int((y0+y2)/2) = yc exactly (P4). */
    val sqlBoxes: String = """
      WITH docs AS (
        SELECT doc_id, 5 + doc_id % 13 AS nb,
               CASE WHEN doc_id % 2 = 0 THEN 'quick' ELSE 'table_simple' END AS tool
        FROM documents),
      bx AS (SELECT doc_id, nb, tool, unnest(range(nb)) AS i FROM docs),
      tb AS (
        SELECT doc_id, nb, tool, i,
          CASE (doc_id*31 + i*7) % 8
            WHEN 0 THEN ''
            WHEN 1 THEN '  '
            WHEN 2 THEN 'x O' || CAST((doc_id + i) % 10 AS VARCHAR)
            WHEN 3 THEN 'O' || CAST((doc_id + i) % 10 AS VARCHAR)
            WHEN 4 THEN 'w' || CAST((doc_id*7 + i) % 100 AS VARCHAR)
            WHEN 5 THEN 'QTY ' || CAST(i % 10 AS VARCHAR)
            WHEN 6 THEN 'PLATE'
            ELSE 'M8 O' || CAST(i % 10 AS VARCHAR) END AS t,
          ((doc_id*131 + i*37) % 19) * 10 + 7 AS yc,
          50 + (doc_id + i*3) % 50 AS k
        FROM bx),
      kept AS (
        SELECT doc_id, nb, tool, i, yc, k,
               regexp_replace(trim(t), '(\s)O([0-9])', '\1Ø\2', 'g') AS txt
        FROM tb WHERE trim(t) <> '')"""
  }

  private def extractSqlCorpus(s: SparkSession, dir: String): DataFrame = {
    val metrics = new ExtractPipeline.Metrics(s)
    ExtractPipeline.extract(SqlCorpus.turns(s, dir), metrics, partitions = 32)
      .toDF()
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // ── tier 1: driver-oracle extraction (real kernel vs DuckDB) ────
    ("x_extract_turns", (s: SparkSession, dir: String) =>
      extractSqlCorpus(s, dir)
        .select(col("conv_id"), col("turn_idx"), col("tool"),
          col("extracted_text"), col("n_boxes"), col("n_cells")): DataFrame,
      Some(s"""
      ${SqlCorpus.sqlBoxes},
      agg AS (
        SELECT doc_id,
               string_agg(txt, chr(10) ORDER BY yc, i) AS qt,
               count(*) AS n_cells
        FROM kept GROUP BY doc_id)
      SELECT 'doc-' || CAST(d.doc_id AS VARCHAR) AS conv_id,
             0 AS turn_idx, d.tool AS tool,
             CASE WHEN d.tool = 'quick' THEN coalesce(a.qt, '') ELSE '' END
               AS extracted_text,
             d.nb AS n_boxes, coalesce(a.n_cells, 0) AS n_cells
      FROM docs d LEFT JOIN agg a USING (doc_id)""")),

    ("x_quick_text", (s: SparkSession, dir: String) =>
      extractSqlCorpus(s, dir)
        .filter(col("tool") === Tool.Quick)
        .select(col("conv_id"), col("extracted_text")): DataFrame,
      Some(s"""
      ${SqlCorpus.sqlBoxes}
      SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS conv_id,
             string_agg(txt, chr(10) ORDER BY yc, i) AS extracted_text
      FROM kept WHERE tool = 'quick' GROUP BY doc_id""")),

    ("x_extract_cells", (s: SparkSession, dir: String) =>
      extractSqlCorpus(s, dir)
        .select(col("conv_id"), posexplode(col("cells")).as(Seq("pos", "cell")))
        .select(col("conv_id"), col("pos"),
          col("cell.text").as("text"),
          round(col("cell.confidence") * 100).cast("int").as("conf_x100")): DataFrame,
      Some(s"""
      ${SqlCorpus.sqlBoxes}
      SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS conv_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY yc, i) - 1 AS pos,
             txt AS text, k AS conf_x100
      FROM kept""")),

    // ── tier 2: full synthetic corpus (in-repo equality gate) ───────
    ("x_synth_turns", (s: SparkSession, _: String) =>
      extractAll(s): DataFrame, None),

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
