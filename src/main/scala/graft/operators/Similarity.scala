package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, dim 64).
  *
  *  - `ann_topk_cosine`: brute-force cosine top-k for a query set —
  *    the correctness baseline. Broadcast the (small) query side; the
  *    big side streams. At 100 TB this is the per-batch scoring
  *    pattern (queries ≪ corpus).
  *  - `ann_lsh_topk`: the scale path — random-hyperplane (SimHash)
  *    LSH buckets from 8 deterministic integer hyperplanes; candidate
  *    pairs only form inside a bucket (equi-join on the bucket key, a
  *    plain shuffle join, sub-quadratic).
  *
  * Scores are rounded to 4 dp and ranked on the rounded value with a
  * vec_id tie-break, so ordering is insensitive to float-summation
  * order across engines.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  // native codegen dot product (graft.functions.ArrayDot): the HOF
  // formulation (aggregate ∘ zip_with) is interpreted per element and
  // dominated the all-pairs scans; same left-to-right summation order
  private def dotCol(a: Column, b: Column): Column =
    graft.functions.ArrayDot.dot(a, b)

  private def normCol(a: Column): Column = sqrt(dotCol(a, a))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // ── brute-force cosine top-5 for queries vec_id < 10 ────────────
    ("ann_topk_cosine", (s: SparkSession, dir: String) => {
      val emb = Fn.spread(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("e"))
        .withColumn("norm", normCol(col("e")))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("norm").as("qn"))
      val scored = emb.join(broadcast(queries), col("vec_id") =!= col("qid"))
        .withColumn("cos",
          round(dotCol(col("qe"), col("e")) / (col("qn") * col("norm")), 4))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("vec_id").as("nid"), col("cos"), col("rank"))
    }: DataFrame, Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      n AS (
        SELECT vec_id, e,
               sqrt(list_sum(list_transform(e, x -> x * x))) AS norm
        FROM v),
      scored AS (
        SELECT q.vec_id AS qid, t.vec_id AS nid,
               round(list_sum(list_transform(range(1, 65),
                       i -> q.e[i] * t.e[i])) / (q.norm * t.norm), 4) AS cos
        FROM n q JOIN n t ON q.vec_id < 10 AND t.vec_id <> q.vec_id),
      ranked AS (
        SELECT qid, nid, cos,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos DESC, nid ASC) AS rank
        FROM scored)
      SELECT qid, nid, cos, rank FROM ranked WHERE rank <= 5""")),

    // ── embedding-cosine near-duplicate pairs (all-pairs ≥ threshold;
    //    at corpus scale the LSH buckets below pre-filter candidates) ─
    ("d6_embed_neardup", (s: SparkSession, dir: String) => {
      val emb = Fn.spread(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("e"))
        .withColumn("norm", normCol(col("e")))
      val b = emb.select(col("vec_id").as("vb"), col("e").as("eb"),
        col("norm").as("nb"))
      emb.join(broadcast(b), col("vec_id") < col("vb"))
        .withColumn("cos",
          round(dotCol(col("e"), col("eb")) / (col("norm") * col("nb")), 4))
        .filter(col("cos") >= 0.3)
        .select(col("vec_id").as("vec_a"), col("vb").as("vec_b"), col("cos"))
    }: DataFrame, Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      n AS (
        SELECT vec_id, e,
               sqrt(list_sum(list_transform(e, x -> x * x))) AS norm
        FROM v)
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_sum(list_transform(range(1, 65),
                     i -> a.e[i] * b.e[i])) / (a.norm * b.norm), 4) AS cos
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE round(list_sum(list_transform(range(1, 65),
              i -> a.e[i] * b.e[i])) / (a.norm * b.norm), 4) >= 0.3""")),

    // ── LSH-bucketed cosine top-3 (random-hyperplane buckets) ───────
    ("ann_lsh_topk", (s: SparkSession, dir: String) => {
      val emb = Fn.spread(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("e"))
        .withColumn("norm", normCol(col("e")))
      // hyperplane h (0..7), dim i (1..64): w = ((h*31 + i*17) % 7) - 3
      // — weights are data-independent, so they inline as literal
      // arrays and the projection is one native dot product
      def planeBit(h: Int): Column = {
        val w = (1 to 64).map(i => (((h * 31 + i * 17) % 7) - 3).toDouble)
        val proj = dotCol(col("e"), typedlit(w))
        when(round(proj, 6) >= 0, "1").otherwise("0")
      }
      val bucketed = emb.withColumn("bucket",
        concat((0 until 8).map(planeBit): _*))
      val probes = bucketed
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("norm").as("qn"), col("bucket"))
      val scored = bucketed.join(probes, Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos",
          round(dotCol(col("qe"), col("e")) / (col("qn") * col("norm")), 4))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("vec_id").as("nid"), col("bucket"),
          col("cos"), col("rank"))
    }: DataFrame, Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      n AS (
        SELECT vec_id, e,
               sqrt(list_sum(list_transform(e, x -> x * x))) AS norm
        FROM v),
      bits AS (
        SELECT vec_id,
               CASE WHEN round(list_sum(list_transform(range(1, 65),
                      i -> e[i] * (((h * 31 + i * 17) % 7) - 3))), 6) >= 0
                    THEN '1' ELSE '0' END AS bit, h
        FROM n CROSS JOIN (SELECT unnest(range(8)) AS h)),
      bk AS (
        SELECT vec_id, string_agg(bit, '' ORDER BY h) AS bucket
        FROM bits GROUP BY vec_id),
      b AS (
        SELECT n.vec_id, e, norm, bucket FROM n JOIN bk USING (vec_id)),
      scored AS (
        SELECT q.vec_id AS qid, t.vec_id AS nid, q.bucket AS bucket,
               round(list_sum(list_transform(range(1, 65),
                       i -> q.e[i] * t.e[i])) / (q.norm * t.norm), 4) AS cos
        FROM b q JOIN b t ON q.bucket = t.bucket AND t.vec_id <> q.vec_id),
      ranked AS (
        SELECT qid, nid, bucket, cos,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos DESC, nid ASC) AS rank
        FROM scored)
      SELECT qid, nid, bucket, cos, rank FROM ranked WHERE rank <= 3"""))
  )
}
