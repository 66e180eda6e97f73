package graft

import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  private def neighbors(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }

  lazy val exact: Map[Long, Set[Long]] = neighbors("knn_bruteforce")

  test("knn_bruteforce: 10 queries x 5 ranked neighbors, no self-match") {
    val rows = SparkEntry.queries("knn_bruteforce")(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id"))
      assert(r.getAs[Double]("cosine") <= 1.0 + 1e-9)
    }
    val ranks = rows.groupBy(_.getAs[Long]("query_id"))
      .values.map(_.map(_.getAs[Int]("rank")).sorted.toSeq)
    ranks.foreach(r => assert(r == (1 to 5)))
  }

  test("knn_lsh recall vs brute force >= 0.9") {
    val got = neighbors("knn_lsh")
    val hits = exact.map { case (q, n) => (got.getOrElse(q, Set.empty) & n).size }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    info(s"SRP-LSH (16 tables x 8 bits, multiprobe r<=2) recall@5 = $recall")
    assert(recall >= 0.9, s"recall $recall too low")
  }

  test("knn_pq recall vs brute force >= 0.95") {
    val got = neighbors("knn_pq")
    val hits = exact.map { case (q, n) => (got.getOrElse(q, Set.empty) & n).size }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    info(s"PQ (16x16 codebooks, ADC, rerank 128) recall@5 = $recall")
    assert(recall >= 0.95, s"recall $recall too low")
    // re-ranked rows are EXACT: cosine of every emitted pair matches the
    // brute-force value for pairs brute force also ranked
    val exactCos = SparkEntry.queries("knn_bruteforce")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    SparkEntry.queries("knn_pq")(spark, sf).collect().foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exactCos.get(k).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
  }

  test("embedding_centroids equals driver-side element-wise average") {
    import org.apache.spark.sql.functions._
    val got = queries.Similarity.centroidsRaw(spark, sf)
      .collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[scala.collection.Seq[Double]]("centroid"), r.getAs[Long]("n_vectors")))
      .toMap
    val raw = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[scala.collection.Seq[Float]]("embedding"))
    raw.groupBy(_._1).foreach { case (label, vs) =>
      val dims = vs.head._2.length
      val expected = (0 until dims).map(i =>
        vs.map(_._2(i).toDouble).sum / vs.size)
      val (centroid, n) = got(label)
      assert(n == vs.size)
      expected.zip(centroid).foreach { case (e, g) =>
        assert(math.abs(e - g) < 1e-9, s"label $label")
      }
    }
  }

  test("driver-facing embedding_centroids output has no array columns") {
    import org.apache.spark.sql.types.ArrayType
    val df = SparkEntry.queries("embedding_centroids")(spark, sf)
    assert(!df.schema.exists(_.dataType.isInstanceOf[ArrayType]))
    val rows = df.collect()
    assert(rows.length == queries.Similarity.centroidsRaw(spark, sf).count())
    rows.foreach(r => assert(r.getAs[Long]("norm_micro") > 0L))
  }

  test("srpBandBucketsExpr carves exactly the bits srpSigSeeded lays out") {
    import org.apache.spark.sql.functions._
    import graft.functions.{expressions => F}
    val (nTables, bandBits) = (24, 4) // non-trivial: 1.5 sigs worth
    val got = Tables.embeddings(spark, sf).limit(20)
      .withColumn("sigs", F.srpSigsArray(col("embedding"), nTables, bandBits))
      .select(col("sigs"),
        expr(F.srpBandBucketsExpr("sigs", nTables, bandBits)).as("buckets"))
      .collect()
    got.foreach { r =>
      val sigs = r.getAs[scala.collection.Seq[Long]]("sigs")
      val buckets = r.getAs[scala.collection.Seq[Int]]("buckets")
      assert(buckets.length == nTables)
      val perSig = 64 / bandBits
      (0 until nTables).foreach { t =>
        val band = ((sigs(t / perSig) >>> (bandBits * (t % perSig)))
          & ((1 << bandBits) - 1)).toInt
        assert(buckets(t) == t * (1 << bandBits) + band, s"table $t")
      }
    }
  }

  test("quantize boundary: oracle's double half-up replay == Math.round exactly at n+0.5 ulp edges") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val scale = 0.5f
    // JVM replay of the DuckDB oracle's quantizer: scaled value held in
    // FLOAT op-for-op, rounding in DOUBLE (floor(double(f) + 0.5))
    def oracleDouble(x: Float): Long = {
      val scaled = (x * 127.0f) / scale
      math.max(-127L, math.min(127L, math.floor(scaled.toDouble + 0.5).toLong))
    }
    // the pre-Java-7 emulation the oracle used before round 6: + 0.5 held
    // in FLOAT — disagrees by 1 for floats one ulp below n + 0.5
    def oracleFloat(x: Float): Long = {
      val scaled = (x * 127.0f) / scale
      math.max(-127L, math.min(127L, math.floor((scaled + 0.5f).toDouble).toLong))
    }
    def sparkQuantize(x: Float): Long = {
      val arr = graft.functions.HashImpl.quantizeI8(
        new GenericArrayData(Array[Any](x)), scale)
      arr.getByte(0).toLong
    }
    // engineer inputs whose SCALED value lands exactly one ulp below
    // n + 0.5 (the JDK-6430675 boundary): invert scaled = (x*127f)/0.5f
    // and scan x's neighboring ulps until the float pipeline reproduces
    // the target bit pattern
    var boundaryHits = 0
    var floatEmulationDiverges = 0
    for (n <- 0 to 126) {
      val target = java.lang.Math.nextDown((n + 0.5).toFloat)
      val approx = (target.toDouble * scale / 127.0).toFloat
      val start = (0 until 300).foldLeft(approx)((a, _) => java.lang.Math.nextDown(a))
      val hit = Iterator.iterate(start)(java.lang.Math.nextUp(_))
        .take(600)
        .find(x => (x * 127.0f) / scale == target)
      hit.foreach { x =>
        boundaryHits += 1
        assert(sparkQuantize(x) == oracleDouble(x),
          f"boundary x=$x%.9g scaled=$target: Spark ${sparkQuantize(x)} != oracle ${oracleDouble(x)}")
        if (oracleFloat(x) != sparkQuantize(x)) floatEmulationDiverges += 1
      }
    }
    assert(boundaryHits > 50, s"only $boundaryHits boundary values constructed")
    info(s"$boundaryHits boundary values, $floatEmulationDiverges diverge under FLOAT-held emulation")
    // the divergence class is real (JDK-6430675's own witness): for the
    // float one ulp below 0.5, Math.round is 0 but the FLOAT-held + 0.5
    // ties up to 1.0 — the double-held replay matches Math.round. (Among
    // n + 0.5 edges only n = 0 can diverge: for n >= 1 the float sum
    // n + 1 - ulp is exactly representable in scaled's own binade, so
    // the spec asserts the witness directly rather than requiring the
    // quantize pipeline to land on that single reachable-or-not input.)
    val witness = java.lang.Math.nextDown(0.5f)
    assert(math.round(witness) === 0)
    assert(math.floor((witness + 0.5f).toDouble).toLong === 1L,
      "FLOAT-held emulation no longer diverges on the canonical witness")
    assert(math.floor(witness.toDouble + 0.5).toLong === 0L)
    // and away from boundaries the three agree on a dense sweep
    for (i <- -20000 to 20000) {
      val x = i / 20000.0f * scale
      assert(sparkQuantize(x) == oracleDouble(x), s"sweep x=$x")
    }
  }

  test("knn_quantized (int8) recall vs float brute force is near-perfect") {
    val got = neighbors("knn_quantized")
    val hits = exact.map { case (q, n) => (got.getOrElse(q, Set.empty) & n).size }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    info(s"int8 recall@5 = $recall")
    assert(recall >= 0.8, s"recall $recall too low")
  }

  test("knn_ivf recall vs brute force >= 0.9") {
    val got = neighbors("knn_ivf")
    val hits = exact.map { case (q, n) => (got.getOrElse(q, Set.empty) & n).size }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    info(s"IVF nProbe=12/16 recall@5 = $recall")
    assert(recall >= 0.9, s"recall $recall too low")
  }

  test("knn_graph: per-node recall vs driver-side exact graph >= 0.9, cosines exact") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      .filter { case (_, v) =>
        v.foldLeft(0.0)((s, x) => s + x.toDouble * x) > 0 }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // exact top-5 per node, same (cosine desc, vec_id) tiebreak
    val exactGraph = vecs.map { case (id, v) =>
      id -> vecs.filter(_._1 != id)
        .map { case (oid, ov) => (oid, cos(v, ov)) }
        .sortBy { case (oid, c) => (-c, oid) }.take(5)
    }.toMap
    val rows = SparkEntry.queries("knn_graph")(spark, sf).collect()
    val got = rows.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    // every non-degenerate node appears in the graph
    assert(got.keySet == exactGraph.keySet,
      s"graph covers ${got.size} of ${exactGraph.size} nodes")
    val hits = exactGraph.map { case (q, n) =>
      (got(q) & n.map(_._1).toSet).size }.sum
    val recall = hits.toDouble / exactGraph.values.map(_.size).sum
    info(s"knn_graph (16 tables x 8 bits, multiprobe r<=2) recall@5 = $recall")
    assert(recall >= 0.9, s"recall $recall too low")
    // re-ranked cosines are exact (same left-fold the kernel computes)
    val exactCos = exactGraph.iterator.flatMap { case (q, ns) =>
      ns.iterator.map { case (oid, c) => (q, oid) -> c } }.toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exactCos.get(k).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
  }

  test("knn_ivfpq recall vs brute force >= 0.9, emitted cosines exact") {
    val got = neighbors("knn_ivfpq")
    val hits = exact.map { case (q, n) => (got.getOrElse(q, Set.empty) & n).size }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    info(s"IVFADC (nProbe=12/16, residual PQ 16x16, rerank 128) recall@5 = $recall")
    assert(recall >= 0.9, s"recall $recall too low")
    val exactCos = SparkEntry.queries("knn_bruteforce")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    SparkEntry.queries("knn_ivfpq")(spark, sf).collect().foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exactCos.get(k).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
  }

  // sf0.01: the smallest SF with qualifying pairs (28), so both the
  // pruning measurement and the lossless-bound check have teeth
  test("user_activity_pairs: CS bound prunes >50% of pairs yet loses none") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val prof = queries.Similarity.activityProfiles(spark, dir)
    val n = prof.count()
    val total = n * (n - 1) / 2
    val cand = queries.Similarity.activityCandidatePairs(spark, prof).count()
    info(s"cheap-bound candidates: $cand of $total pairs " +
      f"(${cand.toDouble / total * 100}%.1f%% fully scored)")
    assert(cand.toDouble / total < 0.5,
      s"bound no longer prunes: $cand of $total pairs fully scored")
    // losslessness: query output == unpruned all-pairs reference
    val got = SparkEntry.queries("user_activity_pairs")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b"))).toSet
    val ref = prof.select(col("user_id").as("ua"), col("p").as("pa"))
      .join(prof.select(col("user_id").as("ub"), col("p").as("pb")),
        col("ua") < col("ub"))
      .withColumn("cos", graft.functions.expressions.cosine_sim(col("pa"), col("pb")))
      .filter(col("cos") >= 0.9 && !isnan(col("cos")))
      .collect().map(r => (r.getAs[Long]("ua"), r.getAs[Long]("ub"))).toSet
    assert(got == ref, s"pruned result diverges from all-pairs reference")
    assert(got.size == 28)
  }

  test("jacobiTopK returns an orthonormal basis (bound validity)") {
    // symmetric PSD test matrix with a known dominant structure
    val d = 24
    val m = Array.tabulate(d, d)((i, j) =>
      1.0 / (1.0 + i + j) + (if (i == j) 2.0 + 0.1 * i else 0.0))
    val v = queries.Similarity.jacobiTopK(m, 12)
    for (a <- v.indices; b <- a until v.length) {
      val dot = (0 until d).map(i => v(a)(i).toDouble * v(b)(i)).sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-6, s"rows $a,$b dot=$dot")
    }
  }

  test("embedding_outliers: rank-based flags, micro-unit score replay") {
    val rows = SparkEntry.queries("embedding_outliers")(spark, sf).collect()
    val emb = Tables.embeddings(spark, sf).collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[scala.collection.Seq[Float]]("embedding")))
    assert(rows.length == emb.length)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("score")) <= 1.0 + 1e-9))
    // per label: exactly floor(n * 0.05) flagged, and they are the lowest
    rows.groupBy(_.getAs[Int]("label")).foreach { case (label, rs) =>
      val flagged = rs.filter(_.getAs[Boolean]("is_outlier"))
      assert(flagged.length == (rs.length * 0.05).toInt, s"label $label")
      val un = rs.filterNot(_.getAs[Boolean]("is_outlier"))
      if (flagged.nonEmpty && un.nonEmpty)
        assert(flagged.map(_.getAs[Double]("score")).max
          <= un.map(_.getAs[Double]("score")).min, s"label $label")
    }
    // driver replay of the micro-unit centroid score
    val gotScores = rows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("score")).toMap
    emb.groupBy(_._2).foreach { case (_, vs) =>
      val dims = vs.head._3.length
      val cm = (0 until dims).map(i =>
        math.round(vs.map(_._3(i).toDouble).sum / vs.size * 1e6))
      vs.foreach { case (id, _, e) =>
        val vm = e.map(x => math.round(x.toDouble * 1e6))
        val dot = vm.zip(cm).map { case (a, b) => a * b }.sum
        val na = vm.map(x => x * x).sum
        val nc = cm.map(x => x * x).sum
        val score = dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nc.toDouble))
        assert(math.abs(gotScores(id) - score) < 1e-9, s"vec $id")
      }
    }
  }

  test("knn_maxip: ranked by raw dot product, matches driver brute force") {
    val rows = SparkEntry.queries("knn_maxip")(spark, sf).collect()
    val emb = Tables.embeddings(spark, sf).collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[scala.collection.Seq[Float]]("embedding")).toMap
    def dot(a: scala.collection.Seq[Float], b: scala.collection.Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val qs = emb.keys.filter(_ < 10).toSeq.sorted
    assert(rows.length == qs.size * 5)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    qs.foreach { q =>
      val expected = emb.toSeq.filter(_._1 != q)
        .map { case (id, e) => (id, dot(emb(q), e)) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
      val got = byQ(q).sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("dot")))
      assert(got.toSeq == expected, s"query $q")
    }
  }

  test("knn_maxip_lsh recall vs exact MIPS >= 0.9") {
    val got = SparkEntry.queries("knn_maxip_lsh")(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val ref = neighbors("knn_maxip")
    val hits = ref.map { case (q, n) => (got.getOrElse(q, Set.empty) & n).size }.sum
    val recall = hits.toDouble / ref.values.map(_.size).sum
    info(s"norm-augmented SRP-LSH MIPS recall@5 = $recall")
    assert(recall >= 0.9, s"recall $recall too low")
  }

  test("knn_binary: deterministic output, exact cosines, measured recall") {
    // knn_binary is ORACLED (the candidate set is a pure function of
    // the data) — recall vs brute force is a quality property, not the
    // correctness contract; measure it and hold a floor.
    val rows = SparkEntry.queries("knn_binary")(spark, sf).collect()
    val got = rows.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val hits = exact.map { case (q, n) => (got.getOrElse(q, Set.empty) & n).size }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    info(s"binary quantization (64 sign bits, rerank 64) recall@5 = $recall")
    assert(recall >= 0.6, s"recall $recall too low")
    // re-ranked cosines are EXACT where brute force ranked the same pair
    val exactCos = SparkEntry.queries("knn_bruteforce")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exactCos.get(k).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
  }

  test("embedding_clusters equals a driver-side assignment replay") {
    import org.apache.spark.sql.functions._
    val cents = queries.Similarity.trainedCentroids(spark, sf)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .filter { case (_, e) => dot(e, e) > 0 }
    // replay: argmax cosine, first-lowest-index on strict >
    val assigned = vecs.map { case (_, e) =>
      var best = 0; var bestC = Double.NegativeInfinity
      cents.zipWithIndex.foreach { case (c, i) =>
        val cc = cos(e, c); if (cc > bestC) { bestC = cc; best = i } }
      (best.toLong, // micro-unit HALF_UP — exactly Spark SQL round
        scala.math.BigDecimal(bestC * 1000000)
          .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val expect = assigned.groupBy(_._1).map { case (cid, xs) =>
      cid -> (xs.length.toLong,
        xs.map(_._2).sum.toDouble / 1000000.0 / xs.length,
        xs.map(_._2).min.toDouble / 1000000.0)
    }
    val got = SparkEntry.queries("embedding_clusters")(spark, sf).collect()
    assert(got.map(_.getAs[Long]("n_vecs")).sum == vecs.length.toLong)
    got.foreach { r =>
      val (n, mean, mn) = expect(r.getAs[Long]("cid"))
      assert(r.getAs[Long]("n_vecs") == n)
      assert(math.abs(r.getAs[Double]("mean_cos") - mean) < 1e-12)
      assert(r.getAs[Double]("min_cos") == mn)
    }
    assert(got.length == expect.size)
  }

  test("knn_range: complete and sound at tau (cross-checked vs brute force)") {
    val tau = 0.35
    val got = SparkEntry.queries("knn_range")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    assert(got.nonEmpty)
    // sound: every emitted pair clears tau
    got.values.foreach(c => assert(c >= tau && c <= 1.0 + 1e-9))
    // complete: every brute-force TOP-K pair above tau must appear with
    // the identical cosine (range output ⊇ thresholded top-k)
    SparkEntry.queries("knn_bruteforce")(spark, sf).collect().foreach { r =>
      val c = r.getAs[Double]("cosine")
      if (c >= tau) {
        val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        assert(got.get(k).contains(c),
          s"range search missed thresholded top-k pair $k @ $c")
      }
    }
  }

  test("knn_hybrid: RRF arithmetic replays, vector side consistent with E1") {
    val fused = SparkEntry.queries("knn_hybrid")(spark, sf).collect()
    assert(fused.nonEmpty)
    val brute = SparkEntry.queries("knn_bruteforce")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Number]("rank").longValue) ->
        r.getAs[Long]("neighbor_id")).toMap
    fused.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
      // scores non-increasing in fused rank
      val scores = sorted.map(_.getAs[Double]("rrf_score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"q=$q")
      sorted.foreach { r =>
        val lex = Option(r.getAs[java.lang.Long]("lex_rank")).map(_.toLong)
        val vec = Option(r.getAs[java.lang.Long]("vec_rank")).map(_.toLong)
        assert(lex.nonEmpty || vec.nonEmpty)
        val expected = (lex, vec) match {
          case (Some(l), Some(v)) => (120.0 + l + v) / ((60.0 + l) * (60.0 + v))
          case (Some(l), None)    => 1.0 / (60.0 + l)
          case (None, Some(v))    => 1.0 / (60.0 + v)
          case _                  => fail("rankless fused row")
        }
        assert(r.getAs[Double]("rrf_score") == expected, s"q=$q row=$r")
        // a fused row claiming vector rank <= 5 must BE that E1 neighbor
        vec.filter(_ <= 5).foreach { v =>
          assert(brute((q, v)) == r.getAs[Long]("doc_id"),
            s"vec_rank $v of q=$q disagrees with knn_bruteforce")
        }
      }
    }
  }

  test("knn_mmr: first pick is the cosine argmax; picks are distinct pool members") {
    val brute = SparkEntry.queries("knn_bruteforce")(spark, sf).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val mmr = SparkEntry.queries("knn_mmr")(spark, sf).collect()
    val byQ = mmr.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      val ranked = rows.sortBy(_.getAs[Long]("mmr_rank"))
      assert(ranked.map(_.getAs[Long]("mmr_rank")).toSeq == (1L to 5L),
        s"query $q ranks")
      // with an empty selected set MMR reduces to relevance: pick 1 ==
      // the brute-force nearest neighbor
      assert(ranked.head.getAs[Long]("neighbor_id") == brute(q), s"query $q")
      val ids = ranked.map(_.getAs[Long]("neighbor_id"))
      assert(ids.distinct.length == ids.length, s"query $q dup picks")
    }
  }

  test("knn_classify: majority vote of the brute-force neighbor labels") {
    import org.apache.spark.sql.functions._
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nn = SparkEntry.queries("knn_bruteforce")(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(r => labels(r.getAs[Long]("neighbor_id")))).toMap
    val expected = nn.map { case (q, ls) =>
      val (pred, votes) = ls.groupBy(identity).view.mapValues(_.length)
        .toSeq.sortBy { case (l, c) => (-c, l) }.head
      q -> ((labels(q), pred, votes.toLong, pred == labels(q)))
    }
    val got = SparkEntry.queries("knn_classify")(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Int]("true_label"), r.getAs[Int]("pred_label"),
          r.getAs[Long]("n_votes"), r.getAs[Boolean]("correct")))).toMap
    assert(got == expected, s"classification diverges: $got vs $expected")
  }

  test("embedding_label_affinity equals a driver-side centroid-cosine replay") {
    import org.apache.spark.sql.functions._
    val byLabel = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def centroid(vs: Array[Array[Float]]): Array[Double] = {
      val dim = vs.head.length
      val s = new Array[Double](dim)
      vs.foreach(v => (0 until dim).foreach(i => s(i) += v(i)))
      s.map(_ / vs.length)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (a.indices).foreach { i =>
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = byLabel.view.mapValues(centroid).toMap
    val labels = cents.keys.toSeq.sorted
    val expected = (for {
      a <- labels; b <- labels if a < b
      c = cos(cents(a), cents(b)) if !c.isNaN
    } yield (a, b) -> ((byLabel(a).length.toLong, byLabel(b).length.toLong,
      math.round(c * 1000000)))).toMap
    val got = SparkEntry.queries("embedding_label_affinity")(spark, sf).collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("cos_micro")))).toMap
    assert(got.nonEmpty && got == expected,
      s"label affinity diverges: $got vs $expected")
  }

  test("knn_reciprocal: exactly the mutual pairs of the exact kNN graph") {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      .toMap
    // strict left-fold double cosine — the CosineSim kernel's op order
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def knn(q: Long): Seq[(Long, Int, Double)] = {
      val qe = vecs(q)
      vecs.toSeq.filter(_._1 != q)
        .map { case (v, e) => (v, cos(qe, e)) }
        .filterNot(_._2.isNaN)
        .sortBy { case (v, c) => (-c, v) }
        .take(5).zipWithIndex.map { case ((v, c), i) => (v, i + 1, c) }
    }
    val expect = (for {
      q <- vecs.keys.filter(_ < 10).toSeq
      (n, rq, c) <- knn(q)
      rn <- knn(n).find(_._1 == q).map(_._2).toSeq
    } yield (q, n) -> ((rq, rn, c))).toMap
    val got = SparkEntry.queries("knn_reciprocal")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        ((r.getAs[Int]("rank_qn"), r.getAs[Int]("rank_nq"),
          r.getAs[Double]("cosine")))).toMap
    assert(got.nonEmpty && got == expect,
      s"reciprocal pairs diverge: got ${got.size}, expected ${expect.size}")
  }

  test("knn_recall_report reproduces the per-method recalls the suite " +
      "computes independently") {
    val report = SparkEntry.queries("knn_recall_report")(spark, sf).collect()
      .map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("n_exact"),
          r.getAs[Long]("n_hits"), r.getAs[Double]("recall")))).toMap
    assert(report.keySet == Set("knn_lsh", "knn_ivf", "knn_pq", "knn_ivfpq",
      "knn_quantized", "knn_binary", "knn_graph", "knn_maxip_lsh"))
    val nExact = exact.values.map(_.size).sum.toLong
    // each method scores against ITS anchor: the cosine six (and the
    // graph's query-node rows) vs knn_bruteforce, maxip_lsh vs the
    // exact-MIPS top-K — the same pairings the standalone specs pin
    val exactMip = neighbors("knn_maxip")
    report.foreach { case (m, (nq, ne, nh, rec)) =>
      val (anchor, got) = m match {
        case "knn_maxip_lsh" => (exactMip, neighbors(m))
        case "knn_graph" =>
          (exact, neighbors(m).filter { case (q, _) => exact.contains(q) })
        case _ => (exact, neighbors(m))
      }
      val anchorN = anchor.values.map(_.size).sum.toLong
      val hits = anchor.map { case (q, n) =>
        (got.getOrElse(q, Set.empty) & n).size }.sum.toLong
      assert(nq == anchor.size.toLong && ne == anchorN,
        s"$m denominator wrong: $nq/$ne")
      assert(nh == hits && rec == hits.toDouble / anchorN,
        s"$m recall diverges from the suite's: $nh vs $hits")
    }
    // the report is the index-swap gate: every method must clear its
    // standalone recall contract here too (quantized/binary have
    // looser standalone contracts; see their specs)
    assert(report("knn_lsh")._4 >= 0.9 && report("knn_ivf")._4 >= 0.9 &&
      report("knn_pq")._4 >= 0.95 && report("knn_ivfpq")._4 >= 0.9 &&
      report("knn_graph")._4 >= 0.9 && report("knn_maxip_lsh")._4 >= 0.9)
    assert(nExact > 0)
  }

  test("knn_probe_sweep: recall is monotone in nProbe, the full-probe " +
      "point is exact, and the operating point matches knn_ivf") {
    val rows = SparkEntry.queries("knn_probe_sweep")(spark, sf).collect()
      .map(r => r.getAs[Int]("n_probe") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Double]("recall")))).toMap
    assert(rows.keySet == Set(1, 2, 4, 8, 12, 16))
    val byProbe = rows.toSeq.sortBy(_._1).map(_._2._2)
    assert(byProbe.zip(byProbe.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in nProbe: $byProbe")
    // nProbe = nLists probes every list: the candidate set IS the
    // corpus (minus self), so the sweep endpoint must be exact
    assert(rows(16)._2 == 1.0, s"full-probe recall ${rows(16)._2} != 1.0")
    // the configured operating point reproduces the suite's knn_ivf
    // recall (the same number E23 reports)
    val ivfHits = exact.map { case (q, n) =>
      (neighbors("knn_ivf").getOrElse(q, Set.empty) & n).size }.sum.toLong
    assert(rows(12)._1 == ivfHits,
      s"sweep@12 hits ${rows(12)._1} != knn_ivf's $ivfHits")
  }

  test("knn_rerank_sweep: recall is monotone in rerank depth and the " +
      "operating point reproduces knn_pq exactly") {
    val rows = SparkEntry.queries("knn_rerank_sweep")(spark, sf).collect()
      .map(r => r.getAs[Int]("rerank_depth") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Double]("recall")))).toMap
    assert(rows.keySet == Set(8, 16, 32, 64, 128, 256),
      s"sweep depths ${rows.keySet}")
    val byDepth = rows.toSeq.sortBy(_._1).map(_._2._2)
    // monotone BY CONSTRUCTION (deeper rerank re-ranks a candidate
    // superset; a true hit is only ever displaced by another true hit)
    // — so pin equality-or-growth exactly, no tolerance
    assert(byDepth.zip(byDepth.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in rerank depth: $byDepth")
    // the configured operating point runs the literal knn_pq plan
    val pqHits = exact.map { case (q, n) =>
      (neighbors("knn_pq").getOrElse(q, Set.empty) & n).size }.sum.toLong
    assert(rows(128)._1 == pqHits,
      s"sweep@128 hits ${rows(128)._1} != knn_pq's $pqHits")
  }

  test("the eval layer shares ONE staged exact anchor: recall report, " +
      "probe sweep, and rerank sweep add no FrameCache entries after " +
      "the first run") {
    SparkEntry.queries("knn_recall_report")(spark, sf).count()
    SparkEntry.queries("knn_probe_sweep")(spark, sf).count()
    SparkEntry.queries("knn_rerank_sweep")(spark, sf).count()
    val frames1 = FrameCache.size(spark)
    SparkEntry.queries("knn_probe_sweep")(spark, sf).count()
    SparkEntry.queries("knn_rerank_sweep")(spark, sf).count()
    SparkEntry.queries("knn_recall_report")(spark, sf).count()
    // (no persisted-RDD census here: each eval invocation
    // localCheckpoints its |queries|-sized denominators by design —
    // the anchor itself is pinned by the stable FrameCache entry set)
    assert(FrameCache.size(spark) == frames1,
      "FrameCache entry count grew — an eval query re-staged the anchor")
  }

  test("knn_ivf and knn_ivfpq prune on a planted CLUSTERED corpus: " +
      "recall >= 0.9 at nProbe = 4 of 16 lists") {
    // the positive twin of the standing honest note on the registered
    // queries (structureless synthetic embeddings -> recall ~ scan
    // fraction, so NProbe=12/16 there): plant 8 well-separated Gaussian
    // clusters (64 dims = PqM x PqSub, so the IVFADC subspace slicing
    // applies unchanged) and pin that the same k-means++/Lloyd
    // machinery reaches the recall contract while scanning only ~4/16
    // of the corpus — probe-count pruning works exactly when structure
    // exists
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val vecs = (0L until 512L).map { v =>
      val c = centers((v % 8).toInt)
      val rv = new scala.util.Random(1000 + v) // per-vector, deterministic
      (v, c.map(x => x + 0.03f * rv.nextGaussian().toFloat).toSeq,
        (v % 8).toInt)
    }
    val dir = java.nio.file.Files.createTempDirectory("ivfplanted").toString
    vecs.toDF("vec_id", "embedding", "label").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    try {
      val exact = SparkEntry.queries("knn_bruteforce")(spark, dir).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
      def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.collect().groupBy(_.getAs[Long]("query_id"))
          .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
        exact.map { case (q, n) => (got.getOrElse(q, Set.empty) & n).size }
          .sum.toDouble / exact.values.map(_.size).sum
      }
      val rIvf = recallOf(queries.Similarity.ivfFrame(spark, dir, nProbe = 4))
      val rIvfPq = recallOf(queries.Similarity.ivfPqFrame(spark, dir, nProbe = 4))
      info(s"planted-cluster recall@5 at nProbe=4/16: IVF $rIvf, IVFADC $rIvfPq")
      assert(exact.size == 10 && rIvf >= 0.9,
        s"IVF failed to prune a clustered corpus: recall $rIvf")
      assert(rIvfPq >= 0.9,
        s"IVFADC failed to prune a clustered corpus: recall $rIvfPq")
    } finally {
      FrameCache.evictMatching(spark, dir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ann_index_health: totals and canary line up with the suite's own " +
      "measurements, and a planted drifted cohort is detected") {
    import org.apache.spark.sql.functions._
    val Sim = queries.Similarity
    val report = SparkEntry.queries("ann_index_health")(spark, sf).collect()
    val summary = report.filter(_.getAs[Long]("cid") == -1L)
    assert(summary.length === 1, "exactly one summary row")
    val lists = summary.map(_ => report.filter(_.getAs[Long]("cid") >= 0L)).head
    assert(lists.nonEmpty && report.length === lists.length + 1)
    // totals: n_now sums the per-list rows; n_build + appended = n_now
    val sm = summary.head
    assert(lists.map(_.getAs[Long]("n_now")).sum === sm.getAs[Long]("n_now"))
    assert(lists.map(_.getAs[Long]("n_build")).sum === sm.getAs[Long]("n_build"))
    // n_now = the non-degenerate corpus (the lists artifact minus
    // zero-norm rows, which carry no cosine signal)
    val nonDegenerate = Tables.embeddings(spark, sf)
      .filter(graft.functions.expressions.l2norm(col("embedding")) > 0)
      .count()
    assert(sm.getAs[Long]("n_now") === nonDegenerate)
    // the recall canary IS the suite's own knn_ivf-vs-exact recall
    val got = neighbors("knn_ivf")
    val hits = exact.map { case (q, n) =>
      (got.getOrElse(q, Set.empty) & n).size }.sum
    val expectMicro = math.round(
      hits.toDouble / exact.values.map(_.size).sum * 1e6)
    assert(sm.getAs[Long]("recall_canary_micro") === expectMicro,
      s"canary ${sm.getAs[Long]("recall_canary_micro")} != suite recall " +
        s"$expectMicro")
    // per-list drift arithmetic: drift = cos_build - cos_new micros
    lists.filter(r => !r.isNullAt(r.fieldIndex("drift_micro"))).foreach { r =>
      assert(r.getAs[Long]("drift_micro") ===
        r.getAs[Long]("cos_own_build_micro") - r.getAs[Long]("cos_own_new_micro"))
    }
    // planted drift: 2 orthogonal centroids; build rows sit ON their
    // centroids (cos 1), appended rows at a known angle — the report
    // must price the decay exactly, and a build-only list reports no
    // new-cohort stats
    import spark.implicits._
    val c0 = Array(1f, 0f, 0f, 0f)
    val c1 = Array(0f, 1f, 0f, 0f)
    val invSqrt2 = (1.0 / math.sqrt(2.0)).toFloat
    val planted = Seq(
      (0L, 100L, c0.toSeq), (0L, 101L, c0.toSeq),          // build, list 0
      (1L, 102L, c1.toSeq),                                 // build, list 1
      (0L, 200L, Seq(invSqrt2, invSqrt2, 0f, 0f))           // appended, 45 deg
    ).toDF("cid", "vec_id", "ea")
    val anchor = Seq((0L, 1L)).toDF("query_id", "neighbor_id")
    val planted_report = Sim.indexHealthOver(spark, planted,
      IndexedSeq(c0, c1), col("vec_id") >= 200L,
      anchor, anchor)   // canary 1.0: approx == exact
      .collect().map(r => r.getAs[Long]("cid") -> r).toMap
    val l0 = planted_report(0L)
    assert(l0.getAs[Long]("n_build") === 2L && l0.getAs[Long]("n_now") === 3L)
    assert(l0.getAs[Long]("cos_own_build_micro") === 1000000L)
    // cos(45 deg) = 0.7071068 -> drift 292893 micro
    assert(l0.getAs[Long]("cos_own_new_micro") === 707107L)
    assert(l0.getAs[Long]("drift_micro") === 292893L,
      s"planted 45-degree drift mispriced: ${l0.getAs[Long]("drift_micro")}")
    // occupancy skew: list 0 went from 2/3 of the build to 3/4 of the
    // index -> (0.75 / 0.666..) = 1.125
    assert(l0.getAs[Long]("skew_micro") === 1125000L)
    val l1 = planted_report(1L)
    assert(l1.isNullAt(l1.fieldIndex("cos_own_new_micro")) &&
      l1.isNullAt(l1.fieldIndex("drift_micro")),
      "build-only list invented new-cohort stats")
    assert(planted_report(-1L).getAs[Long]("recall_canary_micro") === 1000000L)
  }

  test("IVF/IVFADC probe IO is partition-pruned AT THE SCAN: with the " +
      "artifact store on, the lists/codes scans carry the literal " +
      "probed-list filter and read only the probed lists' partitions — " +
      "and the pruned results equal the session-mode run row-for-row") {
    val Sim = queries.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_prune").toString
    val s = spark.newSession()
    s.conf.set(FrameCache.IndexDirConf, dir)
    try {
      def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
          ((r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine")))).toMap
      // IVF at nProbe=1: the probed-cid union over 10 queries is at most
      // 10 of 16 lists BY CONSTRUCTION, so pruning is always observable
      // (at nProbe=2 the tiny suite corpus can spread the union over
      // all 16)
      val ivfPruned = Sim.ivfFrame(s, sf, nProbe = 1)
      val (ivfRows, readIvf) = PruneCheck.checkPruned(ivfPruned,
        "sim.ivf.lists", 16)
      // the probed set, recomputed through the SAME probe ranking the
      // plan runs — partitions read must be exactly the probed lists
      val expected = Sim.probedCidUnion(s, sf, nProbe = 1).size
      assert(readIvf === expected,
        s"IVF scan read $readIvf partitions, probed-list union is $expected")
      // pruning changed no row: equal to the session-mode (unpartitioned,
      // in-memory) run of the same probe count
      assert(keyed(ivfRows) ===
        keyed(Sim.ivfFrame(spark, sf, nProbe = 1).collect()),
        "partition-pruned IVF diverges from the session-mode run")
      // IVFADC, one level down: codes scan pruned to probed lists
      val ivfPqPruned = Sim.ivfPqFrame(s, sf, nProbe = 1)
      val (pqRows, _) = PruneCheck.checkPruned(ivfPqPruned,
        "sim.ivfpq.codes", 16)
      assert(keyed(pqRows) ===
        keyed(Sim.ivfPqFrame(spark, sf, nProbe = 1).collect()),
        "partition-pruned IVFADC diverges from the session-mode run")
    } finally {
      FrameCache.evict(s)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ann_generation_log: the registered demo store reports exactly a " +
      "serving 2-list delta over a full base, base-linked, with the " +
      "base holding every staged list partition") {
    val Sim = queries.Similarity
    val rows = SparkEntry.queries("ann_generation_log")(spark, sf).collect()
    assert(rows.length === 2, s"expected full + delta, got ${rows.toSeq}")
    val bySeq = rows.map(r => r.getAs[Long]("gen_seq") -> r).toMap
    val nLists = Sim.ivfLists(spark, sf)
      .select(org.apache.spark.sql.functions.col("cid"))
      .distinct().count().toInt
    val full = bySeq(1L)
    assert(full.getAs[String]("kind") === "full" &&
      full.getAs[Int]("depth") === 0 &&
      full.getAs[Int]("partitions") === nLists &&
      full.getAs[Int]("touched") === 0 &&
      full.isNullAt(full.fieldIndex("base_seq")) &&
      !full.getAs[Boolean]("serving"), s"full row wrong: $full")
    val delta = bySeq(2L)
    assert(delta.getAs[String]("kind") === "delta" &&
      delta.getAs[Int]("depth") === 1 &&
      delta.getAs[Int]("partitions") === 2 &&
      delta.getAs[Int]("touched") === 2 &&
      delta.getAs[Long]("base_seq") === 1L &&
      delta.getAs[Boolean]("serving"), s"delta row wrong: $delta")
  }
}
