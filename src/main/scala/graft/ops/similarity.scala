package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>` dim-64, `label`) — SURVEY.md §2.3
  * `sim_topk_cosine` + the IVF-style scale path.
  *
  * All vector arithmetic is Catalyst higher-order functions
  * (`zip_with` dot product, `aggregate` norm) over doubles — float inputs
  * are widened exactly, the fold order is the array order in both engines,
  * and every cosine is rounded to 4 decimals BEFORE ranking so the two
  * engines rank identical values (ranking on raw doubles would let a
  * last-ulp summation difference flip a tie across engines).
  *
  * Scale notes (100 TB posture):
  *  - `sim_topk_cosine` is the brute-force baseline: corpus × queries with
  *    the bounded query side BROADCAST, so the corpus never shuffles — the
  *    right shape when queries ≪ corpus. A full self-join at corpus scale
  *    is intentionally NOT the contract; that's what the IVF variant is for.
  *  - `sim_ann_ivf` probes only the query's own cell (here: the
  *    pre-assigned `label`, standing in for a nearest-centroid assignment
  *    computed at ingest). One hash shuffle on the cell id co-locates each
  *    cell; pair formation is per-cell, so cost is Σ|cell|², not n².
  *    Recall is bounded by cell assignment quality, exactly as in IVF.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** vec_id + embedding widened to double + precomputed L2 norm.
    *
    * The corpus is rebalanced across the cluster width before the
    * CPU-dense pair compute: a small parquet table arrives as one split,
    * and a broadcast-NLJ streams the probe side over *input* partitions —
    * without the repartition the entire O(n·q·dim) dot-product work runs
    * in a single task regardless of executor count.
    */
  private def vecs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      // explicit count: AQE would coalesce this byte-small shuffle back to
      // one task, serializing the compute-bound pair stage
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .withColumn("nrm", sqrt(graft.expr.VectorExprs.dot(col("v"), col("v"))))

  // fused codegen'd dot product (graft.expr.DotProduct) — the HOF
  // composition aggregate(zip_with(·,·,*),+) computes the same fold but
  // interpreted, with an intermediate array per pair
  private def cosine(av: Column, bv: Column, an: Column, bn: Column): Column =
    round(graft.expr.VectorExprs.dot(av, bv) / (an * bn), 4)

  val queries: Map[String, Q] = Map(
    // Brute-force top-5 cosine neighbors for every vector. The probe side
    // is broadcast (bounded query set); the corpus side streams.
    "sim_topk_cosine" -> ((s, d) => {
      val corpus = vecs(s, d)
      val probes = broadcast(vecs(s, d)
        .select(col("vec_id").as("nbr_id"), col("v").as("bv"),
                col("nrm").as("bn")))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("nbr_id"))
      corpus.join(probes, col("vec_id") =!= col("nbr_id"))
        .select(col("vec_id"), col("nbr_id"),
          cosine(col("v"), col("bv"), col("nrm"), col("bn")).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("vec_id"), col("rn"), col("nbr_id"), col("cos"))
        .orderBy("vec_id", "rn")
    }),

    // Embedding-cosine near-dup: pairs whose rounded cosine clears the
    // threshold. Test-scale plan is the broadcast pair sweep (corpus is
    // bounded); the 100 TB path buckets first — exactly `sim_ann_ivf`'s
    // cell restriction — before the pair compute. Filter runs on the
    // ROUNDED value so both engines cut on identical numbers.
    "dedup_near_embedding" -> ((s, d) => {
      val a = vecs(s, d)
      val b = broadcast(vecs(s, d).select(col("vec_id").as("b"),
        col("v").as("bv"), col("nrm").as("bn")))
      a.join(b, col("vec_id") < col("b"))
        .select(col("vec_id").as("a"), col("b"),
          cosine(col("v"), col("bv"), col("nrm"), col("bn")).as("cos"))
        .filter(col("cos") >= 0.45)
        .orderBy("a", "b")
    }),

    // LSH-bucketed ANN — the hash-based alternative to the IVF cell
    // restriction: a 64-bit hyperplane sign sketch per vector (codegen'd,
    // graft.expr.SignSketch64), 8-bit bands as bucket keys, candidates
    // only within a shared band bucket, then exact rounded cosine + top-3
    // per query. Per-bit collision P is 1 − θ/π, so an 8-bit band passes
    // near-orthogonal noise with P ≈ 0.5⁸ ≈ 0.4% (×8 bands ≈ 3% of all
    // pairs — a 30× candidate cut) while a true near-dup at cos ≥ 0.95
    // collides somewhere with P ≈ 0.99. The band width is the
    // selectivity/recall dial: narrower bands (4-bit) chase moderate-cos
    // neighbors but admit most of the corpus — at THAT point use
    // `sim_ann_ivf`, which partitions by data clusters instead of hash
    // geometry. Rows-only driver check (hash hyperplanes aren't
    // expressible in the oracle); recall law in AccuracySpec.
    "sim_ann_lsh" -> ((s, d) => {
      val v = vecs(s, d)
      // coalesce pins the sketch non-nullable: embedding is nullable in
      // the parquet schema, and a nullable band key would demote the
      // bucket join's HashedRelation probe to its slow path (PlanSpec)
      val sk = v.select(col("vec_id"),
        coalesce(graft.expr.VectorExprs.signSketch64(col("v")), lit(0L))
          .as("sk"))
      val bands = sk.select(col("vec_id"),
          posexplode(array((0 until 8).map(j =>
            shiftrightunsigned(col("sk"), j * 8).bitwiseAND(255)): _*)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "bval")
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") &&
          col("x.bval") === col("y.bval") &&
          col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nbr_id"))
        .distinct()
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("nbr_id"))
      cand
        .join(v.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
        .join(v.select(col("vec_id").as("nbr_id"), col("v").as("bv"),
          col("nrm").as("bn")), "nbr_id")
        .select(col("vec_id"), col("nbr_id"),
          cosine(col("v"), col("bv"), col("nrm"), col("bn")).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("vec_id"), col("rn"), col("nbr_id"), col("cos"))
        .orderBy("vec_id", "rn")
    }),

    // IVF-style ANN: restrict the search to the query's own cell (label),
    // top-3 per query. Pairs form only within a cell after one shuffle on
    // the cell id — the plan shape that survives a 1000× corpus.
    "sim_ann_ivf" -> ((s, d) => {
      val a = vecs(s, d)
      val b = vecs(s, d).select(col("label").as("blabel"),
        col("vec_id").as("nbr_id"), col("v").as("bv"), col("nrm").as("bn"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("nbr_id"))
      a.join(b, col("label") === col("blabel")
          && col("vec_id") =!= col("nbr_id"))
        .select(col("vec_id"), col("label"), col("nbr_id"),
          cosine(col("v"), col("bv"), col("nrm"), col("bn")).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("vec_id"), col("label"), col("rn"), col("nbr_id"),
          col("cos"))
        .orderBy("vec_id", "rn")
    })
  )

  val oracle: Map[String, String] = Map(
    "dedup_near_embedding" ->
      """WITH e AS (
        |  SELECT vec_id, [x::DOUBLE for x in embedding] AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm
        |      FROM e),
        |p AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b,
        |    round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v)+1)])
        |          / (a.nrm * b.nrm), 4) AS cos
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT a, b, cos FROM p WHERE cos >= 0.45 ORDER BY a, b""".stripMargin,
    "sim_topk_cosine" ->
      """WITH e AS (
        |  SELECT vec_id, [x::DOUBLE for x in embedding] AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm
        |      FROM e),
        |p AS (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
        |    round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v)+1)])
        |          / (a.nrm * b.nrm), 4) AS cos
        |  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, nbr_id, cos,
        |        row_number() OVER (PARTITION BY vec_id
        |          ORDER BY cos DESC, nbr_id) AS rn
        |      FROM p)
        |SELECT vec_id, CAST(rn AS INTEGER) AS rn, nbr_id, cos
        |FROM r WHERE rn <= 5 ORDER BY vec_id, rn""".stripMargin,
    "sim_ann_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, label, [x::DOUBLE for x in embedding] AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |        sqrt(list_sum([x*x for x in v])) AS nrm
        |      FROM e),
        |p AS (
        |  SELECT a.vec_id AS vec_id, a.label AS label, b.vec_id AS nbr_id,
        |    round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v)+1)])
        |          / (a.nrm * b.nrm), 4) AS cos
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, label, nbr_id, cos,
        |        row_number() OVER (PARTITION BY vec_id
        |          ORDER BY cos DESC, nbr_id) AS rn
        |      FROM p)
        |SELECT vec_id, label, CAST(rn AS INTEGER) AS rn, nbr_id, cos
        |FROM r WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin
  )
}
