package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}

/** SURVEY.md §2.11 — similarity search over the embedding column
  * (`ArrayType(FloatType)`, dim 64).
  *
  * Cosine is composed from codegen'd higher-order functions (zip_with +
  * aggregate) — a left fold in both engines, so results are
  * bit-comparable after round(6). Brute-force top-k is the baseline;
  * `sim_ann_ivf` is the scale path (coarse-quantize to per-label
  * centroids, search only the probed cluster — IVF-style).
  *
  * Scale posture: probes/centroids are always the broadcast side; the
  * corpus never shuffles. At 100 TB, corpus × probes is a broadcast
  * nested-loop over a small probe set — embarrassingly parallel over
  * corpus partitions.
  */
object Sim {

  /** Cosine similarity between two array columns, computed as
    * dot(a,b) / sqrt(dot(a,a) * dot(b,b)) with double accumulators.
    *
    * Backed by the codegen'd Catalyst expression
    * [[graft.ext.CosineSimilarity]] (registered as `cosine_sim`), which
    * runs the identical left fold in one fused loop — bit-identical to
    * the composed zip_with/aggregate form and to the DuckDB oracle
    * spelling, but ~an order of magnitude cheaper per pair (no lambda
    * dispatch or boxing). Callers must Ext.register the session first.
    */
  def cosine(a: String, b: String): Column = expr(s"cosine_sim($a, $b)")

  /** DuckDB spelling of [[cosine]] — same formula, same fold order. */
  def cosineSql(a: String, b: String): String = {
    def norm(x: String) =
      s"list_aggregate(list_transform($x, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum')"
    s"""(list_aggregate(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')
       | / sqrt(${norm(a)} * ${norm(b)}))""".stripMargin
  }

  /** User API: brute-force cosine top-k of `corpus` for each probe row. */
  def topK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    graft.ext.Ext.register(probes.sparkSession)
    val joined = corpus.as("b").crossJoin(broadcast(probes.as("a")))
      .select(col("a.vec_id").as("probe_id"), col("b.vec_id").as("vec_id"),
        round(cosine("a.embedding", "b.embedding"), 6).as("cos_r"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos_r").desc, col("vec_id"))
    joined.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  val NumPlanes = 8

  /** (vec_id, label, bucket): sign-bit signature of the vector against
    * NumPlanes pseudo-random hyperplanes (components hashed from
    * (plane, dim) — deterministic, no stored model).
    */
  def lshBuckets(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val planes = s.range(NumPlanes).select(col("id").as("j"))
      .crossJoin(s.range(64).select(col("id").as("pos")))
      .withColumn("p",
        pmod(xxhash64(col("j"), col("pos")), lit(1000)).cast("double") / 1000.0 - 0.5)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .join(broadcast(planes), "pos")
      .groupBy(col("vec_id"), col("label"), col("j"))
      .agg(sum(col("v") * col("p")).as("dot"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(when(col("dot") > 0, expr("CAST(pow(2, j) AS BIGINT)")).otherwise(0L))
        .as("bucket"))
  }

  /** IVF nearest-centroid assignment: (vec_id, label, embedding,
    * c_label). Centroids = per-label mean vectors (broadcast, tiny);
    * the corpus side never shuffles for the assignment.
    */
  private def ivfAssigned(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    graft.ext.Ext.register(s)
    val emb = Tables.embeddings(s, d)
    val centroids = emb
      .select(col("label").as("c_label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("c_label"), col("pos"))
      .agg(avg(col("v").cast("double")).as("c"))
      .groupBy(col("c_label"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, c))), s -> s.c)").as("centroid"))
    val w = Window.partitionBy("vec_id")
      .orderBy(round(cosine("embedding", "centroid"), 6).desc, col("c_label"))
    emb.crossJoin(broadcast(centroids))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(emb("vec_id"), emb("label"), emb("embedding"), col("c_label"))
  }

  /** DuckDB spelling of [[ivfAssigned]] as WITH-clause body (ends with
    * a `cl` CTE = one row per vector with its cluster).
    */
  private val IvfClSql: String =
    s"""cent_long AS (
       |  SELECT label AS c_label, u.pos AS pos, avg(u.v) AS c FROM
       |    (SELECT label, unnest(list_transform(generate_series(1, len(embedding)),
       |       i -> {'pos': i, 'v': CAST(embedding[i] AS DOUBLE)})) AS u
       |     FROM embeddings)
       |  GROUP BY c_label, pos),
       |cent AS (SELECT c_label, list(c ORDER BY pos) AS centroid FROM cent_long GROUP BY c_label),
       |assign AS (
       |  SELECT e.vec_id, e.label, e.embedding, c.c_label,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(${cosineSql("e.embedding", "c.centroid")}, 6) DESC, c.c_label) AS rk
       |  FROM embeddings e CROSS JOIN cent c),
       |cl AS (SELECT vec_id, label, embedding, c_label FROM assign WHERE rk = 1)""".stripMargin

  def defs: Seq[(String, Q)] = Seq(
    "sim_cosine_topk" -> Q(
      s"""WITH sims AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS vec_id,
         |    round(${cosineSql("a.embedding", "b.embedding")}, 6) AS cos_r
         |  FROM embeddings a, embeddings b WHERE a.vec_id < 10)
         |SELECT probe_id, vec_id, cos_r, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos_r DESC, vec_id) AS rk
         |  FROM sims) WHERE rk <= 3
         |ORDER BY probe_id, rk""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      topK(emb.filter(col("vec_id") < 10), emb, 3)
        .select("probe_id", "vec_id", "cos_r", "rk")
        .orderBy("probe_id", "rk")
    },

    "sim_pairs_threshold" -> Q(
      s"""SELECT a.vec_id AS id1, b.vec_id AS id2, a.label,
         |  round(${cosineSql("a.embedding", "b.embedding")}, 6) AS cos_r
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.35
         |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      // similarity self-join blocked on `label` (the blocking key bounds
      // the pair count; at scale replace with LSH buckets)
      graft.ext.Ext.register(s)
      val emb = Tables.embeddings(s, d)
      val a = emb.as("a")
      val b = emb.as("b")
      a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos", cosine("a.embedding", "b.embedding"))
        .filter(col("cos") >= 0.35)
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
          col("a.label").as("label"), round(col("cos"), 6).as("cos_r"))
        .orderBy("id1", "id2")
    },

    "knn_centroid" -> Q(
      """SELECT label, u.pos - 1 AS pos, round(avg(u.v), 6) AS c FROM
        |  (SELECT label, unnest(list_transform(generate_series(1, len(embedding)),
        |     i -> {'pos': i, 'v': CAST(embedding[i] AS DOUBLE)})) AS u
        |   FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin) { (s, d) =>
      // per-label centroid in long form (label, dim, mean) — a single
      // two-phase aggregation over the exploded vectors
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("v").cast("double")), 6).as("c"))
        .orderBy("label", "pos")
    },

    // random-hyperplane LSH buckets — the other ANN scale path next to
    // IVF. Planes are derived deterministically from xxhash64 (no DuckDB
    // twin → property-tested in LlmSpec); the formulation is fully
    // relational/codegen'd: explode dims, broadcast-join the tiny plane
    // table, two-phase sum for the dots, fold sign bits to a bucket id.
    // Search then probes only the matching bucket.
    "sim_ann_lsh" -> Q.noOracle { (s, d) =>
      lshBuckets(s, d)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vectors"),
          countDistinct(col("label")).as("n_labels"))
        .orderBy("bucket")
    },

    // the LSH SEARCH path (rows-only: xxhash64-derived planes have no
    // DuckDB twin): probe → same sign-signature bucket → top-3 by exact
    // cosine within the bucket. Candidates per probe ≈ corpus/2^planes;
    // probes broadcast, corpus never shuffles. LlmSpec asserts self-
    // match-first; deterministic output (bucket ids and cosines are
    // pure functions of the data).
    "sim_ann_lsh_search" -> Q.noOracle { (s, d) =>
      graft.ext.Ext.register(s)
      val emb = Tables.embeddings(s, d)
      val bk = lshBuckets(s, d).select(col("vec_id"), col("bucket"))
      val withB = emb.join(bk, "vec_id")
      val probes = withB.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"), col("bucket"))
      val w = Window.partitionBy("probe_id").orderBy(col("cos_r").desc, col("vec_id"))
      withB.join(broadcast(probes), "bucket")
        .select(col("probe_id"), col("vec_id"),
          round(cosine("p_emb", "embedding"), 6).as("cos_r"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select("probe_id", "vec_id", "cos_r", "rk")
        .orderBy("probe_id", "rk")
    },

    // IVF coarse quantizer: centroids = per-label means; every vector is
    // assigned to its nearest centroid (broadcast 10×64 table — the
    // corpus side never shuffles). Output: cluster occupancy + label
    // agreement.
    "sim_ann_ivf" -> Q(
      s"""WITH $IvfClSql
         |SELECT c_label, count(*) AS n_assigned,
         |  count(CASE WHEN label = c_label THEN 1 END) AS n_matching_label
         |FROM cl GROUP BY c_label ORDER BY c_label""".stripMargin) { (s, d) =>
      ivfAssigned(s, d)
        .groupBy(col("c_label"))
        .agg(count(lit(1)).as("n_assigned"),
          count(when(col("label") === col("c_label"), 1)).as("n_matching_label"))
        .orderBy("c_label")
    },

    // the IVF SEARCH path: each probe scans ONLY its assigned cluster
    // (1/nlist of the corpus) instead of the full corpus — the ANN scale
    // play. Probes broadcast; the corpus-side candidates never shuffle.
    // Approximate by construction (a true neighbor in another cluster is
    // missed) — LlmSpec measures recall against the brute-force path.
    "sim_ann_ivf_search" -> Q(
      s"""WITH $IvfClSql,
         |sims AS (
         |  SELECT p.vec_id AS probe_id, b.vec_id AS vec_id,
         |    round(${cosineSql("p.embedding", "b.embedding")}, 6) AS cos_r
         |  FROM cl p JOIN cl b ON p.c_label = b.c_label
         |  WHERE p.vec_id < 10)
         |SELECT probe_id, vec_id, cos_r, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos_r DESC, vec_id) AS rk
         |  FROM sims) WHERE rk <= 3
         |ORDER BY probe_id, rk""".stripMargin) { (s, d) =>
      val cl = ivfAssigned(s, d)
      val probes = cl.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"), col("c_label"))
      val cand = cl.select(col("vec_id"), col("embedding").as("b_emb"), col("c_label"))
      val w = Window.partitionBy("probe_id").orderBy(col("cos_r").desc, col("vec_id"))
      cand.join(broadcast(probes), "c_label")
        .select(col("probe_id"), col("vec_id"),
          round(cosine("p_emb", "b_emb"), 6).as("cos_r"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select("probe_id", "vec_id", "cos_r", "rk")
        .orderBy("probe_id", "rk")
    }
  )
}
