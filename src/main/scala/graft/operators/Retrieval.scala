package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ranked-retrieval operators over the `documents` table — the query
  * side of a training-data pipeline (mining a corpus for documents
  * relevant to a probe set: benchmark decontamination's "retrieve
  * before you judge" stage, targeted-domain mining, eval-set
  * neighborhood audits).
  *
  * `r1_bm25_topk` is BM25 (Robertson–Spärck Jones; the Okapi form
  * with k1 = 1.2, b = 0.75) with one deliberate, documented variation:
  * a LINEAR idf `(N - df + 0.5) / (df + 0.5)` — the argument of BM25's
  * log — instead of the log itself. Same precedent as t10's linear
  * tf-idf: `ln` is the one place the two engines' float kernels may
  * disagree in the last ulp (Spark uses java.lang.Math, DuckDB libm),
  * and the linear form is a monotone transform of the log form, so
  * single-term rankings are identical and the cross-engine hash oracle
  * stays exact. Everything else (tf saturation, length normalization)
  * is the standard formula evaluated in IEEE doubles with identical
  * expression trees on both engines, then fixed to a ×1e4 integer
  * BEFORE ranking, so a sub-1e-4 float divergence can never flip an
  * ordering that the doc_id tie-break doesn't resolve identically.
  *
  * Scale shape (the 100 TB audit):
  *  - the postings aggregate `(doc_id, term) → tf` is one hash-agg on
  *    the exploded scan (map-side partial combine applies);
  *  - the df table is VOCAB-sized (vocab grows ~log corpus);
  *  - the probe/query term set is selected by a distributed
  *    `TakeOrderedAndProject` (sort+limit — never a global window over
  *    the vocab) and then BROADCAST to the postings, so the only
  *    corpus-sized join is a broadcast-hash semi-filter;
  *  - corpus statistics (N, Σdl) are a one-row aggregate;
  *  - top-k per query is TWO-LEVEL: partial top-5 inside
  *    (query, doc_id mod 64) buckets, then final top-5 per query over
  *    ≤ 64·5 survivors — the final window sees a bounded input, never
  *    a corpus-sized single partition per query.
  */
object Retrieval {

  type Q = (SparkSession, String) => DataFrame

  private def sqlToks =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // ── BM25 top-5 per query: 10 deterministic two-term queries drawn
    //    from the corpus's own df ranking (ranks 11-30 by df DESC,
    //    term ASC — past the near-stopword head, still frequent enough
    //    to have rich candidate sets at every sf) ────────────────────
    ("r1_bm25_topk", (s: SparkSession, dir: String) => {
      val docs = Fn.spread(s, dir, "documents")
        .select(col("doc_id"), Fn.tokensCol(col("text")).as("t"))
        .withColumn("dl", size(col("t")).cast("long"))
        .filter(col("dl") > 0)
      // cached: the df table, the corpus stats, and the scoring join
      // all read the postings — uncached, the tokenize+explode+agg
      // chain ran once per consumer
      val posting = Fn.track(docs
        .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .cache())
      val dfTab = posting.groupBy(col("term")).agg(count(lit(1)).as("df"))
      // distributed top-30 (TakeOrdered), THEN a 30-row window for the
      // rank — the global sort never materializes the vocab on one task
      val top30 = dfTab.orderBy(col("df").desc, col("term")).limit(30)
      val qterms = top30
        .withColumn("r",
          row_number().over(Window.orderBy(col("df").desc, col("term"))))
        .filter(col("r") >= 11 && col("r") <= 30)
        .select((floor((col("r") - 11) / 2) + 1).cast("long").as("query_id"),
          col("term"), col("df"))
      // corpus stats from the CACHED postings, not a fresh tokenize
      // pass: (doc_id, dl) is unique per doc and every dl>0 doc owns
      // ≥1 posting row, so the distinct projection is exactly `docs` —
      // identical n_docs and sum_dl
      val stats = posting.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      def d(c: Column) = c.cast("double")
      val scored = posting.join(broadcast(qterms), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          (d(col("n_docs")) - d(col("df")) + lit(0.5)) / (d(col("df")) + lit(0.5)))
        .withColumn("tscore",
          col("idf") * (d(col("tf")) * lit(2.2)) /
            (d(col("tf")) + lit(1.2) *
              (lit(0.25) + lit(0.75) * (d(col("dl")) /
                (d(col("sum_dl")) / d(col("n_docs")))))))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(floor(sum(col("tscore")) * 10000 + lit(0.5)).cast("long")
          .as("score_x1e4"))
      // two-level top-5: ranking on the INTEGER fixpoint means a
      // sub-1e-4 cross-engine float divergence cannot flip an order
      val pre = scored
        .withColumn("b", pmod(col("doc_id"), lit(64)))
        .withColumn("pr", row_number().over(
          Window.partitionBy(col("query_id"), col("b"))
            .orderBy(col("score_x1e4").desc, col("doc_id"))))
        .filter(col("pr") <= 5).drop("b", "pr")
      pre
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("score_x1e4").desc, col("doc_id"))).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("doc_id"), col("score_x1e4"))
    }: DataFrame, Some(s"""
      WITH toks AS (SELECT doc_id, $sqlToks AS t FROM documents),
      docs AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl
               FROM toks WHERE len(t) > 0),
      posting AS (
        SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, dl, unnest(t) AS term FROM docs)
        GROUP BY 1, 2, 3),
      dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM posting GROUP BY 1),
      ranked AS (SELECT term, df,
                        row_number() OVER (ORDER BY df DESC, term) AS r
                 FROM dft),
      qterms AS (SELECT CAST(floor((r - 11) / 2) + 1 AS BIGINT) AS query_id,
                        term, df
                 FROM ranked WHERE r BETWEEN 11 AND 30),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(dl) AS BIGINT) AS sum_dl FROM docs),
      scored AS (
        SELECT q.query_id, p.doc_id,
               CAST(floor(sum(
                 ((CAST(n_docs AS DOUBLE) - CAST(q.df AS DOUBLE)
                     + CAST(0.5 AS DOUBLE))
                   / (CAST(q.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                 * (CAST(p.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
                 / (CAST(p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
                     * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
                        * (CAST(p.dl AS DOUBLE)
                           / (CAST(sum_dl AS DOUBLE)
                              / CAST(n_docs AS DOUBLE)))))
               ) * 10000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS score_x1e4
        FROM posting p JOIN qterms q USING (term) CROSS JOIN stats
        GROUP BY 1, 2),
      topk AS (SELECT query_id, doc_id, score_x1e4,
                      CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score_x1e4 DESC, doc_id) AS BIGINT) AS rank
               FROM scored)
      SELECT query_id, rank, doc_id, score_x1e4
      FROM topk WHERE rank <= 5""")),

    // ── hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    //    SIGIR'09, k=60): the modern two-channel mining shape — a DENSE
    //    leg (embedding cosine) and a SPARSE leg (distinct-token
    //    Jaccard) each rank candidates for the same 10 probe documents
    //    (fixture convention: embeddings row i is the embedding of
    //    documents row i — the tables share the 0..N-1 id domain at
    //    every sf), then RRF fuses the two top-20 pools:
    //    score = Σ_legs 1/(60 + rank_leg). Neither raw score needs to
    //    be calibrated against the other — only ranks enter — which is
    //    exactly why RRF is the standard fusion for dense+BM25 hybrids.
    //
    //    Scale shape: both legs broadcast the 10-probe side and stream
    //    the corpus (the per-batch scoring pattern of ann_topk_cosine);
    //    the rank windows carry a rank<=20 filter, so Spark plans a
    //    WindowGroupLimit partial below the exchange — every map task
    //    forwards at most 20 rows per probe, never a corpus-sized
    //    partition. The fusion join then sees ≤ 2·20 rows per probe.
    //    Ranks are computed over integer fixpoints (cos rounded to
    //    4 dp, Jaccard ×1e4) with id tie-breaks, and the RRF sum of
    //    two correctly-rounded divisions is evaluated with identical
    //    expression trees on both engines, so the cross-engine hash
    //    oracle stays exact. ──────────────────────────────────────────
    ("r2_rrf_fusion", (s: SparkSession, dir: String) => {
      def dot(a: Column, b: Column) = graft.functions.ArrayDot.dot(a, b)
      val emb = Fn.spread(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .withColumn("norm", sqrt(dot(col("e"), col("e"))))
      val qv = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("norm").as("qn"))
      val dense = emb.join(broadcast(qv), col("vec_id") =!= col("qid"))
        .withColumn("cos",
          round(dot(col("qe"), col("e")) / (col("qn") * col("norm")), 4))
        .withColumn("rank_d", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("cos").desc, col("vec_id"))).cast("long"))
        .filter(col("rank_d") <= 20)
        .select(col("qid"), col("vec_id").as("id"), col("rank_d"))
      val toks = Fn.spread(s, dir, "documents")
        .select(col("doc_id"),
          array_distinct(Fn.tokensCol(col("text"))).as("t"))
        .filter(size(col("t")) > 0)
      val qt = toks.filter(col("doc_id") < 10)
        .select(col("doc_id").as("qid"), col("t").as("qt"))
      val sparse = toks.join(broadcast(qt), col("doc_id") =!= col("qid"))
        .withColumn("inter",
          size(array_intersect(col("t"), col("qt"))).cast("long"))
        .filter(col("inter") > 0)
        .withColumn("j_x1e4", floor(
          col("inter").cast("double") * 10000 /
            (size(col("t")) + size(col("qt")) - col("inter")).cast("double")
            + lit(0.5)).cast("long"))
        .withColumn("rank_s", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("j_x1e4").desc, col("doc_id"))).cast("long"))
        .filter(col("rank_s") <= 20)
        .select(col("qid"), col("doc_id").as("id"), col("rank_s"))
      def leg(rank: Column): Column = coalesce(
        lit(1.0) / (rank + lit(60)).cast("double"), lit(0.0))
      dense.join(sparse, Seq("qid", "id"), "full_outer")
        .withColumn("rrf_x1e6",
          floor((leg(col("rank_d")) + leg(col("rank_s"))) * 1000000
            + lit(0.5)).cast("long"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("rrf_x1e6").desc, col("id"))).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("qid").as("query_id"), col("rank"),
          col("id").as("doc_id"), col("rrf_x1e6"))
    }: DataFrame, Some(s"""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      n AS (
        SELECT vec_id, e,
               sqrt(list_sum(list_transform(e, x -> x * x))) AS norm
        FROM v),
      dense0 AS (
        SELECT q.vec_id AS qid, t.vec_id AS id,
               round(list_sum(list_transform(range(1, 65),
                       i -> q.e[i] * t.e[i])) / (q.norm * t.norm), 4) AS cos
        FROM n q JOIN n t ON q.vec_id < 10 AND t.vec_id <> q.vec_id),
      dense AS (
        SELECT qid, id, rank_d FROM (
          SELECT qid, id, CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, id) AS BIGINT) AS rank_d
          FROM dense0) WHERE rank_d <= 20),
      toks AS (
        SELECT doc_id, list_distinct($sqlToks) AS t FROM documents),
      toks2 AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
      sparse0 AS (
        SELECT q.doc_id AS qid, c.doc_id AS id,
               CAST(len(list_intersect(c.t, q.t)) AS BIGINT) AS inter,
               CAST(len(c.t) + len(q.t)
                    - len(list_intersect(c.t, q.t)) AS BIGINT) AS uni
        FROM toks2 c JOIN toks2 q
          ON q.doc_id < 10 AND c.doc_id <> q.doc_id),
      sparse AS (
        SELECT qid, id, rank_s FROM (
          SELECT qid, id, CAST(row_number() OVER (PARTITION BY qid
                   ORDER BY j_x1e4 DESC, id) AS BIGINT) AS rank_s
          FROM (SELECT qid, id,
                       CAST(floor(CAST(inter AS DOUBLE) * 10000
                         / CAST(uni AS DOUBLE)
                         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS j_x1e4
                FROM sparse0 WHERE inter > 0)) WHERE rank_s <= 20),
      fused AS (
        SELECT qid, id,
               CAST(floor((
                 coalesce(CAST(1 AS DOUBLE)
                   / CAST(60 + rank_d AS DOUBLE), CAST(0 AS DOUBLE))
                 + coalesce(CAST(1 AS DOUBLE)
                   / CAST(60 + rank_s AS DOUBLE), CAST(0 AS DOUBLE))
               ) * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rrf_x1e6
        FROM dense FULL OUTER JOIN sparse USING (qid, id)),
      ranked AS (
        SELECT qid, id, rrf_x1e6,
               CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY rrf_x1e6 DESC, id) AS BIGINT) AS rank
        FROM fused)
      SELECT qid AS query_id, rank, id AS doc_id, rrf_x1e6
      FROM ranked WHERE rank <= 5"""))
  )
}
