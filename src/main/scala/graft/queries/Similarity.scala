package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{expressions => F}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over `embeddings` (SURVEY §2.E).
  *
  * E1 (brute force) is the correctness baseline and the oracle anchor:
  * broadcast the query set, scan the corpus once, native CosineSim in
  * whole-stage codegen, per-query top-k via window rank. At 100 TB the
  * corpus scan is embarrassingly parallel (no shuffle before the final
  * tiny top-k exchange) but reads everything — that's what E2/E3 prune.
  *
  * E2 (SRP-LSH) buckets the corpus into 16 tables of 8-bit seeded
  * signed-random-projection signatures; a query searches, per table,
  * every bucket within hamming radius 2 of its own (multiprobe). E3
  * (IVF) assigns each vector to its nearest of 16 deterministic
  * centroids; a query searches its nProbe=6 nearest lists. Both cut
  * the scanned fraction to buckets/probes over total — the 100 TB
  * path — and are recall-≥0.9-checked against E1 by spec.
  */
object Similarity {

  private val K = 5
  private val NQueries = 10
  private val LshTables = 16  // L independent hash tables of LshBits each,
  private val LshBits = 8     // carved from ceil(L*B/64) seeded SRP sigs
  private val LshProbeRadius = 2 // probe all buckets within hamming ≤ r
  private val NCentroids = 16
  private val NProbe = 6

  /** Shared DuckDB cosine: strict left-fold in double — bit-identical
    * to graft.functions.CosineSim (SURVEY §5).
    */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(list_zip($a, $b),
       |                   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))),
       |    (x, y) -> x + y)
       | / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |      (x, y) -> x + y))
       |  * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |      (x, y) -> x + y)))""".stripMargin

  private def queriesDf(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  /** Rank candidate (query_id, vec_id, ea/qe) rows → top-K per query. */
  private def topK(cands: DataFrame): DataFrame =
    cands
      .withColumn("cosine", F.cosine_sim(col("qe"), col("ea")))
      // a zero-norm vector's NaN cosine would rank first (NaN sorts
      // above all numbers in Spark and DuckDB) — drop degenerates
      .filter(!isnan(col("cosine")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cosine"))
      .orderBy(col("query_id"), col("rank"))

  // --- E1: brute-force top-k (oracled) ------------------------------------
  val bruteForce = QueryDef.oracled(
    "knn_bruteforce",
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
      |           FROM embeddings WHERE vec_id < $NQueries),
      |s AS (SELECT query_id, vec_id, ${cosSql("qe", "embedding")} AS cosine
      |      FROM q JOIN embeddings ON vec_id <> query_id),
      |sf AS (SELECT * FROM s WHERE NOT isnan(cosine)),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |               ORDER BY cosine DESC, vec_id) AS rank FROM sf)
      |SELECT query_id, rank, vec_id AS neighbor_id, cosine
      |FROM r WHERE rank <= $K ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val corpus = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("ea"))
    topK(broadcast(queriesDf(s, d))
      .join(corpus, col("vec_id") =!= col("query_id")))
  }

  // --- E2: SRP-LSH bucketed search (recall-checked vs E1 by spec) ---------
  // L=16 tables × B=8 bits carved from two seeded 64-bit SRP
  // signatures; a query probes, per table, every bucket within hamming
  // radius r=2 of its own (1 + 8 + 28 = 37 probes/table) — multiprobe
  // LSH (Lv et al. VLDB'07) buys recall without extra tables.
  // Candidates = union over tables; recall ≥ 0.9 asserted by spec —
  // the standard recall/cost dial (Gionis/Indyk/Motwani VLDB'99):
  // more tables or probes → higher recall, more of the corpus touched.
  val lsh = QueryDef.rowsOnly("knn_lsh") { (s, d) =>
    val mask = (1 << LshBits) - 1
    // bit carving is the shared F.srpSigsArray/srpBandExpr contract
    val corpus = Tables.embeddings(s, d)
      .withColumn("sigs", F.srpSigsArray(col("embedding"), LshTables, LshBits))
      .select(col("vec_id"),
        explode(expr(F.srpBandBucketsExpr("sigs", LshTables, LshBits)))
          .as("bucket"))
    // all XOR masks of hamming weight ≤ r over LshBits bits,
    // precomputed driver-side (37 ints for B=8, r=2)
    val probeMasks = (0 until (1 << LshBits))
      .filter(m => Integer.bitCount(m) <= LshProbeRadius)
    val probes = queriesDf(s, d)
      .withColumn("sigs", F.srpSigsArray(col("qe"), LshTables, LshBits))
      .select(col("query_id"), col("qe"), explode(expr(
        s"""flatten(transform(sequence(0, ${LshTables - 1}), t ->
           |  transform(array(${probeMasks.mkString(",")}),
           |    m -> t * ${mask + 1} + (${F.srpBandExpr("sigs", "t", LshBits)} ^ m))))""".stripMargin))
        .as("bucket"))
    // probe rows join the bucketed corpus on the int bucket key; the
    // corpus side carries only (vec_id, bucket) — vectors are fetched
    // after dedup so the 37× probe fan-out never amplifies vector bytes
    val cand = broadcast(probes.select(col("query_id"), col("bucket")))
      .join(corpus, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    topK(cand
      .join(queriesDf(s, d), Seq("query_id"))
      .join(Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").as("ea")), Seq("vec_id")))
  }

  // --- E3: IVF with one Lloyd refinement (recall-checked vs E1) -----------
  // Seeds = first NCentroids vectors (deterministic); one k-means step
  // re-centers them with the vector_avg TypedImperativeAggregate (the
  // map-side-combined centroid path — further iterations repeat these
  // two stages unchanged). Lists and probes then use the refined
  // centroids.
  val ivf = QueryDef.rowsOnly("knn_ivf") { (s, d) =>
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val emb = Tables.embeddings(s, d)
    val seeds = broadcast(emb.filter(col("vec_id") < NCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce")))
    val seedAssign = emb.crossJoin(seeds)
      .withColumn("csim", F.cosine_sim(col("embedding"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))))
      .filter(col("crk") === 1)
    val centroids = broadcast(seedAssign
      .groupBy(col("cid"))
      .agg(graft.functions.VectorAvgAgg.vector_avg(col("embedding")).as("cd"))
      .select(col("cid"), col("cd").cast(ArrayType(FloatType)).as("ce")))
    // invert: every vector → nearest refined-centroid list
    val assigned = emb.crossJoin(centroids)
      .withColumn("csim", F.cosine_sim(col("embedding"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))))
      .filter(col("crk") === 1)
      .select(col("cid"), col("vec_id"), col("embedding").as("ea"))
    // query → nProbe nearest lists
    val probes = queriesDf(s, d).crossJoin(centroids)
      .withColumn("csim", F.cosine_sim(col("qe"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cid"))))
      .filter(col("crk") <= NProbe)
      .select(col("query_id"), col("qe"), col("cid"))
    topK(broadcast(probes).join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qe"), col("vec_id"), col("ea")))
  }

  // --- E4: per-label centroids (custom TypedImperativeAggregate) ----------
  // vector_avg ships one (count, sums) buffer per group per partition
  // through the shuffle — the map-side-combined centroid computation a
  // k-means/IVF refinement loop runs every iteration. Spec-checked
  // against a driver-side average (on the raw array form below).
  /** Raw centroid frame with the `centroid` array column — the library
    * surface and the spec subject. The driver-facing query projects it
    * to scalars because the harness canonicalizer cannot sort array
    * cells.
    */
  def centroidsRaw(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .groupBy(col("label"))
      .agg(graft.functions.VectorAvgAgg.vector_avg(col("embedding"))
        .as("centroid"),
        count(lit(1)).as("n_vectors"))

  val centroids = QueryDef.rowsOnly("embedding_centroids") { (s, d) =>
    centroidsRaw(s, d)
      .select(col("label"), col("n_vectors"),
        size(col("centroid")).as("dim"),
        sqrt(aggregate(col("centroid"), lit(0.0), (acc, x) => acc + x * x))
          .as("centroid_norm"),
        md5(concat_ws(",",
          expr("transform(centroid, x -> CAST(round(x, 6) AS STRING))")))
          .as("centroid_digest"))
      .orderBy(col("label"))
  }

  // --- E5: int8-quantized brute force (the memory/bandwidth dial) ---------
  // Corpus stored 4× smaller (array<tinyint>); scoring is pure integer
  // dot/norm accumulation (CosineSimI8). At 100 TB this is the
  // difference between an in-memory and a disk-bound corpus scan.
  // Scale 0.5 covers the synthetic embedding range (|x| ≲ 0.5);
  // recall vs the float baseline is spec-checked.
  private val QuantScale = 0.5f
  val quantized = QueryDef.rowsOnly("knn_quantized") { (s, d) =>
    val corpus = Tables.embeddings(s, d)
      .select(col("vec_id"), F.quantize_i8(col("embedding"), QuantScale).as("qa"))
    val qs = Tables.embeddings(s, d).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"),
        F.quantize_i8(col("embedding"), QuantScale).as("qq"))
    broadcast(qs).join(corpus, col("vec_id") =!= col("query_id"))
      .withColumn("cosine", F.cosine_sim_i8(col("qq"), col("qa")))
      .filter(!isnan(col("cosine")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // --- E6: near-identical user activity profiles (behavioral twins) ------
  // Similarity search over DERIVED features: each user's 24-dim
  // hour-of-day activity histogram (exact integer counts, float-exact
  // below 2²⁴), pairs with cosine ≥ 0.9 — the bot/sockpuppet-detection
  // shape. All-positive count profiles make the background DENSE
  // (median pair cosine ≈ 0.75 — everyone is awake in the daytime;
  // centering only lowers the median, not the tail), which defeats
  // similarity hashing: SRP bands sized to not miss τ=0.9 pairs still
  // pass >99% of pairs (measured at sf0.01), i.e. LSH here is pure
  // overhead, not pruning. The honest scale shape is a BLOCK-GRID
  // exact pair join over the aggregated profile DIMENSION (one row
  // per user, ≪ the fact table): group-pair equi-join keys spread the
  // unavoidable quadratic work evenly across the cluster with bounded
  // per-task memory — no broadcast of the profile frame, no
  // nested-loop join, and the grid width is the parallelism dial.
  private val ActTau = 0.9
  private val ActGrid = 8
  val activityPairs = QueryDef.oracled(
    "user_activity_pairs",
    s"""WITH prof AS (
      |  SELECT user_id,
      |    [${(0 until 24).map(h =>
             s"CAST(count(*) FILTER (WHERE hour(ts) = $h) AS FLOAT)")
             .mkString(",\n      |     ")}] AS p
      |  FROM events GROUP BY user_id),
      |s AS (SELECT a.user_id AS user_a, b.user_id AS user_b,
      |        ${cosSql("a.p", "b.p")} AS cosine
      |      FROM prof a JOIN prof b ON a.user_id < b.user_id)
      |SELECT user_a, user_b, cosine FROM s
      |WHERE cosine >= $ActTau AND NOT isnan(cosine)
      |ORDER BY user_a, user_b""".stripMargin) { (s, d) =>
    val counts = (0 until 24).map(h =>
      sum(when(hour(col("ts")) === h, 1).otherwise(0)).cast("float").as(s"c$h"))
    // tiny (one row of 24 floats per user) — materialize once, feed
    // both join sides (three lazy copies would re-scan events 3×)
    val prof = Tables.events(s, d).groupBy(col("user_id"))
      .agg(counts.head, counts.tail: _*)
      .select(col("user_id"),
        array((0 until 24).map(h => col(s"c$h")): _*).as("p"))
      .localCheckpoint()
    import s.implicits._
    // the grid: one row per unordered group pair (gi ≤ gj)
    val gridPairs = (for { i <- 0 until ActGrid; j <- i until ActGrid }
      yield (i, j)).toDF("ga", "gb")
    val a = prof.select(col("user_id").as("user_a"), col("p").as("pa"),
      pmod(col("user_id"), lit(ActGrid)).cast("int").as("ga"))
    val b = prof.select(col("user_id").as("user_b"), col("p").as("pb"),
      pmod(col("user_id"), lit(ActGrid)).cast("int").as("gb"))
    a.join(broadcast(gridPairs), Seq("ga"))
      .join(b, Seq("gb"))
      // cross-group pairs appear exactly once (min group drives ga);
      // same-group pairs appear in both orders — keep one
      .filter(col("ga") < col("gb") || col("user_a") < col("user_b"))
      .withColumn("cosine", F.cosine_sim(col("pa"), col("pb")))
      .filter(col("cosine") >= ActTau && !isnan(col("cosine")))
      // normalize to user_a < user_b (cosine is symmetric)
      .select(least(col("user_a"), col("user_b")).as("user_a"),
        greatest(col("user_a"), col("user_b")).as("user_b"),
        col("cosine"))
  }

  def all: Seq[QueryDef] = Seq(
    bruteForce, lsh, ivf, centroids, quantized, activityPairs)
}
